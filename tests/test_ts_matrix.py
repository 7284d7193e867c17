"""Timestamp-representation hardening (VERDICT r3 item 5).

The driver's events parquet has presented `ts` three different ways
across rounds:

  r1: TIMESTAMP(NANOS)  -> int64 ns under nanosAsLong ("bigint")
  r2: TIMESTAMP (LTZ)   -> isAdjustedToUTC=true µs
  r3: TIMESTAMP_NTZ     -> naive µs (broke watermarks + unix_micros)

normalize_ts (sources/tables.py) is the single compatibility layer.
This matrix writes the SAME events data in all three physical
representations and asserts every ts-consuming query family — batch
events windows, sessionization, the KV replay/compaction family, and
both streaming twins — produces identical results on each, so any
future representation drift fails here before the driver sees it.
"""

from __future__ import annotations

# driver-budget profile (pytest.ini): dual ts-representation robustness replays (~35 s); content covered by test_parity

import os
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mapreduce_distributed_systems_spark.plans.registry import get_spec

# one query per ts-consuming family; streaming twins carry the
# watermark path that TIMESTAMP_NTZ broke in round 3
QUERIES = [
    "events_tumbling_hourly",
    "events_sessionize",
    "kv_replay_final",
    "kv_snapshot_compaction",
    "events_tumbling_streaming",
    "events_sessionize_streaming",
    # sorts raw ts inside its applyInPandasWithState fold — ordering
    # must agree across int64-ns / naive / tz-aware pandas dtypes
    "kv_replay_streaming",
]

REPRESENTATIONS = ("ntz_us", "ltz_us", "nanos")


pytestmark = pytest.mark.slow  # see pytest.ini driver-budget profile


def _write_repr(table: pa.Table, repr_name: str, dest: str) -> None:
    idx = table.schema.get_field_index("ts")
    ts = table.column("ts")
    if repr_name == "ntz_us":
        ts = ts.cast(pa.timestamp("us"))
    elif repr_name == "ltz_us":
        ts = ts.cast(pa.timestamp("us")).cast(pa.timestamp("us", tz="UTC"))
    elif repr_name == "nanos":
        ts = ts.cast(pa.timestamp("ns"))
    out = table.set_column(idx, pa.field("ts", ts.type), ts)
    pq.write_table(out, dest)


@pytest.fixture(scope="module")
def repr_dirs(sf_dir):
    """One sf_dir per ts representation: events.parquet rewritten,
    every other table symlinked from the real testdata."""
    src = pq.read_table(f"{sf_dir}/events.parquet")
    dirs = {}
    for rep in REPRESENTATIONS:
        d = tempfile.mkdtemp(prefix=f"ts_matrix_{rep}_")
        _write_repr(src, rep, f"{d}/events.parquet")
        for name in os.listdir(sf_dir):
            if name != "events.parquet" and not os.path.exists(f"{d}/{name}"):
                os.symlink(f"{sf_dir}/{name}", f"{d}/{name}")
        dirs[rep] = d
    return dirs


def _normalize(df):
    # stringified sorted rows with columns sorted by name — the same
    # comparison shape the grading driver uses
    cols = sorted(df.columns)
    return sorted(tuple(str(row[c]) for c in cols) for row in df.collect())


@pytest.mark.parametrize("qname", QUERIES)
def test_query_invariant_across_ts_representations(spark, repr_dirs, qname):
    spec = get_spec(qname)
    results = {}
    for rep, d in repr_dirs.items():
        results[rep] = _normalize(spec.fn(spark, d))
    baseline = results["ntz_us"]
    assert baseline, f"{qname} produced no rows on the ntz representation"
    for rep in REPRESENTATIONS:
        assert results[rep] == baseline, (
            f"{qname} differs between ts representations ntz_us vs {rep}"
        )


def test_spark_reads_each_representation_as_expected(spark, repr_dirs):
    """Pin the dtype Spark actually surfaces for each physical form —
    if a Spark upgrade changes inference, this points at the cause."""
    from mapreduce_distributed_systems_spark.session import ensure_session_compat
    from mapreduce_distributed_systems_spark.sources.tables import normalize_ts

    ensure_session_compat(spark)
    expected = {"ntz_us": "timestamp_ntz", "ltz_us": "timestamp", "nanos": "bigint"}
    for rep, d in repr_dirs.items():
        raw = spark.read.parquet(f"{d}/events.parquet")
        assert dict(raw.dtypes)["ts"] == expected[rep], rep
        norm = normalize_ts(raw)
        assert dict(norm.dtypes)["ts"] == "timestamp", rep
