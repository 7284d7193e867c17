"""Behavioral probes mirroring the reference's engine tests
(SURVEY.md §5 / mrapps B3-B8):

- mtiming/rtiming ≙ task parallelism probe (>= 2 concurrent tasks)
- jobcount ≙ exactly-once task accounting
- early_exit ≙ atomic job commit (_SUCCESS marker, no partial output)
- crash ≙ chaos: induced task failures must still yield the golden
  output (run in a subprocess so local[N, maxFailures] can differ)
"""

from __future__ import annotations

import pytest

import os
import subprocess
import sys
import tempfile
import textwrap
import time


def test_task_parallelism(spark):
    # mrapps/mtiming.go:64-79 analogue: 8 sleeping tasks must overlap
    def probe(split_idx, it):
        start = time.time()
        time.sleep(0.5)
        yield (split_idx, start, time.time())

    spans = (
        spark.sparkContext.parallelize(range(8), 8)
        .mapPartitionsWithIndex(probe)
        .collect()
    )
    assert len(spans) == 8
    max_concurrent = max(
        sum(1 for _, s, e in spans if s <= t < e)
        for t in [s for _, s, _ in spans]
    )
    assert max_concurrent >= 2, spans


def test_exactly_once_task_accounting(spark):
    # mrapps/jobcount.go analogue: each partition's work runs exactly once
    acc = spark.sparkContext.accumulator(0)

    def count_invocations(it):
        acc.add(1)
        yield sum(1 for _ in it)

    total = (
        spark.sparkContext.parallelize(range(80), 8)
        .mapPartitions(count_invocations)
        .sum()
    )
    assert total == 80
    assert acc.value == 8  # no duplicate successful task commits


def test_atomic_job_commit(spark, sf_dir):
    # mrapps/early_exit.go analogue: output visible only when complete
    from mapreduce_distributed_systems_spark.operators.wordcount import word_count
    from mapreduce_distributed_systems_spark.sources import load_table

    out = tempfile.mkdtemp(prefix="atomic_commit_") + "/wc_out"
    word_count(load_table(spark, sf_dir, "documents")).write.parquet(out)
    files = os.listdir(out)
    assert "_SUCCESS" in files  # commit marker: all-or-nothing visibility
    assert not any(f.startswith("_temporary") for f in files)
    assert spark.read.parquet(out).count() > 0


CHAOS_SCRIPT = """
import sys
sys.path.insert(0, {repo!r})
from pyspark import TaskContext
from pyspark.sql import functions as F
from mapreduce_distributed_systems_spark.session import get_spark
from mapreduce_distributed_systems_spark.operators.mr_apps import nocrash_payload
from mapreduce_distributed_systems_spark.sources import load_table

# local[8, 4]: 8 threads, 4 task-failure retries (mr's 10s re-execution
# analogue, mr/coordinator.go:44,58)
spark = get_spark("chaos", master="local[8,4]")
docs = load_table(spark, {sf_dir!r}, "documents")

def crashy(it):
    ctx = TaskContext.get()
    if ctx.attemptNumber() == 0 and ctx.partitionId() % 3 == 0:
        raise RuntimeError("injected crash (mrapps/crash.go analogue)")
    yield from it

golden = sorted((r["key"], r["out"]) for r in nocrash_payload(docs).collect())
crashed_docs = docs.repartition(6).rdd.mapPartitions(crashy).toDF(docs.schema)
got = sorted((r["key"], r["out"]) for r in nocrash_payload(crashed_docs).collect())
assert got == golden, "chaos output diverged from golden"
print("CHAOS_OK")
"""


@pytest.mark.slow  # driver-budget profile, see pytest.ini
def test_chaos_retries_match_golden(sf_dir):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = textwrap.dedent(CHAOS_SCRIPT).format(repo=repo, sf_dir=sf_dir)
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=300,
        env={**os.environ, "SPARK_GRAFT_CPUS": "8"},
    )
    assert "CHAOS_OK" in proc.stdout, proc.stderr[-3000:]
