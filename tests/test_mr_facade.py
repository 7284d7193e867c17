"""The RDD map_reduce facade must agree with the optimized DataFrame
twins — the reference's sequential-vs-distributed differential test
(main/test-mr.sh:103-111) in miniature.

Map/Reduce callables are defined inside the tests (closures) so
cloudpickle ships them by value — on a real cluster, module-level
functions would need the module on the executors' PYTHONPATH.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_distributed_systems_spark.operators.mr import map_reduce
from mapreduce_distributed_systems_spark.operators.wordcount import word_count
from mapreduce_distributed_systems_spark.sources import load_table


def test_map_reduce_wc_matches_dataframe(spark, sf_dir):
    def wc_map(filename: str, contents: str):
        # exact reference tokenization: runs of unicode letters
        out, cur = [], []
        for ch in contents:
            if ch.isalpha():
                cur.append(ch)
            elif cur:
                out.append(("".join(cur), "1"))
                cur = []
        if cur:
            out.append(("".join(cur), "1"))
        return out

    def wc_reduce(key: str, values: list[str]) -> str:
        return str(len(values))

    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("key"), F.col("text").alias("value")
    )
    facade = map_reduce(spark, docs, wc_map, wc_reduce, n_reduce=10)
    got = {(r["key"], int(r["value"])) for r in facade.collect()}

    df = word_count(load_table(spark, sf_dir, "documents"))
    want = {(r["word"], r["cnt"]) for r in df.collect()}
    assert got == want


def test_map_reduce_partitioning(spark, sf_dir):
    # n_reduce buckets ≙ mr/worker.go:175-190 nReduce hash partitioning
    def ident_map(k, v):
        return [(k, "1")]

    def count_reduce(key, values):
        return str(len(values))

    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("key"), F.col("text").alias("value")
    )
    out = map_reduce(spark, docs, ident_map, count_reduce, n_reduce=4)
    assert out.count() == docs.count()
