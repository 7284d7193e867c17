"""Structured Streaming twin of the event-time tumbling window
aggregation (the batch form lives in operators/events.py).

`readStream` over the same events parquet -> 2h watermark -> tumbling
1h window x event_type aggregate -> memory sink, driven to completion
with an availableNow trigger. Output mode is COMPLETE: on a finite
replay, append mode can never emit the trailing windows (they stay
inside the watermark horizon when the source runs dry), so complete
mode is the correct finite-stream dual — and the result is gated
against the SAME DuckDB oracle as `events_tumbling_hourly`. In a real
24/7 deployment the same plan runs in append mode, where the
watermark closes windows continuously.

Scale note (100 TB/day stream): state is O(open windows x event
types), bounded by the watermark horizon — the watermark both bounds
state and defines the late-data drop contract
(tests/test_streaming.py::test_watermark_drops_late_data pins the
semantics). The shuffle is on (window, event_type), partial-aggregated
map-side exactly like the batch plan.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_distributed_systems_spark.operators.events import (
    SESSION_ORACLE,
    TUMBLING_ORACLE,
)
from mapreduce_distributed_systems_spark.plans.registry import register
from mapreduce_distributed_systems_spark.sources.tables import normalize_ts

# Nominal sentinel offset: far enough past max(ts) that the sentinel
# can never merge into a real 30-minute session, in every ts
# representation the driver data has shipped (bigint ns / TIMESTAMP /
# TIMESTAMP_NTZ).
_FAR_FUTURE_DAYS = 30


def _far_future(df) -> F.Column:
    """`ts + 30 days` in whatever domain the raw frame presents ts."""
    if dict(df.dtypes).get("ts") == "bigint":
        return F.col("ts") + F.lit(_FAR_FUTURE_DAYS * 86400 * 10**9)
    return F.col("ts") + F.expr(f"INTERVAL {_FAR_FUTURE_DAYS} DAYS")


def _write_sentinel(raw: DataFrame, src_dir: str, event_type: str) -> None:
    """Write the one far-future watermark-flush row (user_id = -1) as
    a sibling parquet in the RAW ts representation, so the stream's
    schema matches every file it reads. Append-mode finite replays
    need it: the watermark only passes a window/session's end once a
    later event arrives, so without the sentinel the trailing state
    would never be emitted."""
    schema = raw.schema
    sentinel = (
        raw.agg(F.max("ts").alias("ts"))
        .select(
            F.lit(-1).cast("long").alias("event_id"),
            _far_future(raw).alias("ts"),
            F.lit(-1).cast("long").alias("user_id"),
            F.lit(event_type).alias("event_type"),
            F.lit(0.0).alias("value"),
            F.lit("{}").alias("props"),
        )
        .select(*[f.name for f in schema.fields])
    )
    sentinel.write.mode("overwrite").parquet(f"{src_dir}/zz-sentinel.dir")


@register(
    "events_tumbling_streaming",
    oracle=TUMBLING_ORACLE,  # identical oracle to the batch twin
    tags=("events", "window-agg", "streaming"),
    doc="Streaming tumbling 1-hour window aggregation with a 2h "
    "watermark (readStream -> window agg -> append memory sink, "
    "availableNow), gated against the identical batch oracle.",
)
def events_tumbling_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    # the file source requires a directory; expose the single events
    # file through a temp dir of symlinks (zero-copy)
    src_dir = tempfile.mkdtemp(prefix="ev_stream_src_")
    os.symlink(f"{sf_dir}/events.parquet", f"{src_dir}/events.parquet")
    # normalize_ts: watermarks require TIMESTAMP (LTZ) — covers the
    # bigint-ns and TIMESTAMP_NTZ parquet representations alike
    stream = normalize_ts(spark.readStream.schema(batch.schema).parquet(src_dir))
    stream = stream.withWatermark("ts", "2 hours")
    agg = (
        stream.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n", "total_value"
        )
    )
    name = f"ev_stream_{uuid.uuid4().hex[:8]}"
    query = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ev_stream_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table(name)


@register(
    "events_tumbling_streaming_append",
    oracle=TUMBLING_ORACLE,  # identical oracle to the batch twin
    tags=("events", "window-agg", "streaming", "append"),
    bench=True,  # r14 (VERDICT r13 #7): first bench row for a streaming
    # path — measures the readStream/watermark/append-sink overhead the
    # batch twins never exercise. Additions-only harness change: a new
    # `queries` key, nothing removed or renamed.
    doc="APPEND-mode streaming tumbling window — the 24/7 production "
    "path where the watermark closes and emits each window exactly "
    "once. A far-future sentinel row (event_type sentinel, filtered "
    "from the output) advances the watermark past every real window "
    "so the finite replay emits them all; gated on the identical "
    "batch oracle, certifying the append/watermark close path that "
    "the complete-mode twin (events_tumbling_streaming) does not "
    "exercise.",
)
def events_tumbling_streaming_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    src_dir = tempfile.mkdtemp(prefix="evap_stream_src_")
    os.symlink(f"{sf_dir}/events.parquet", f"{src_dir}/events.parquet")
    _write_sentinel(raw, src_dir, event_type="zz-sentinel")
    stream = normalize_ts(
        spark.readStream.schema(raw.schema)
        .option("recursiveFileLookup", "true")
        .parquet(src_dir)
    )
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n", "total_value"
        )
    )
    name = f"evap_stream_{uuid.uuid4().hex[:8]}"
    query = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="evap_stream_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table(name).where(F.col("event_type") != "zz-sentinel")


@register(
    "events_sessionize_streaming",
    oracle=SESSION_ORACLE,  # identical oracle to the batch twin
    tags=("events", "session", "streaming"),
    doc="Streaming sessionization (session_window under readStream, "
    "append mode): a far-future sentinel row closes every real "
    "session so the finite replay flushes complete state; output is "
    "gated against the identical batch-sessionize oracle. In a 24/7 "
    "deployment the watermark closes sessions continuously and no "
    "sentinel is needed.",
)
def events_sessionize_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    src_dir = tempfile.mkdtemp(prefix="sess_stream_src_")
    os.symlink(f"{sf_dir}/events.parquet", f"{src_dir}/events.parquet")
    # sentinel flushes all sessions out of append-mode state
    # (user_id = -1, filtered from the output)
    _write_sentinel(raw, src_dir, event_type="view")
    stream = normalize_ts(
        spark.readStream.schema(raw.schema)
        .option("recursiveFileLookup", "true")
        .parquet(src_dir)
    )
    agg = (
        stream.withWatermark("ts", "0 seconds")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("last_event_ts"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            "user_id", "session_start", "last_event_ts", "n_events", "total_value"
        )
    )
    name = f"sess_stream_{uuid.uuid4().hex[:8]}"
    query = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="sess_stream_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table(name).where(F.col("user_id") != -1)


ATTRIBUTION_ORACLE = """
SELECT v.event_id AS view_id, p.event_id AS purchase_id,
       v.user_id AS user_id
FROM events v JOIN events p
  ON p.user_id = v.user_id
 AND v.event_type = 'view' AND p.event_type = 'purchase'
 AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
"""


@register(
    "events_attribution_streaming",
    oracle=ATTRIBUTION_ORACLE,
    tags=("events", "streaming", "stream-stream-join", "attribution"),
    doc="STREAM-STREAM interval join — the attribution shape: each "
    "purchase joins the same user's views from the preceding hour, "
    "both sides watermarked so join state expires once the watermark "
    "passes the interval bound (the condition that makes a 24/7 "
    "stream-stream join runnable at all — without the time bound both "
    "sides' state grows forever). Inner-join matches emit as soon as "
    "both rows have arrived, so the finite availableNow replay needs "
    "no sentinel; the oracle is the identical batch interval join.",
)
def events_attribution_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    src_dir = tempfile.mkdtemp(prefix="evattr_stream_src_")
    os.symlink(f"{sf_dir}/events.parquet", f"{src_dir}/events.parquet")
    stream = normalize_ts(spark.readStream.schema(raw.schema).parquet(src_dir))
    views = (
        stream.where(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", "2 hours")
    )
    purchases = (
        stream.where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "2 hours")
    )
    joined = views.join(
        purchases,
        F.expr(
            "user_id = p_user AND purchase_ts >= view_ts "
            "AND purchase_ts <= view_ts + INTERVAL 1 HOUR"
        ),
    ).select("view_id", "purchase_id", "user_id")
    name = f"evattr_stream_{uuid.uuid4().hex[:8]}"
    query = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="evattr_stream_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table(name)


DEDUP_STREAM_ORACLE = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(value), 2) AS total_value
FROM events GROUP BY event_type
"""


@register(
    "events_dedup_streaming",
    oracle=DEDUP_STREAM_ORACLE,
    tags=("events", "streaming", "dedup", "exactly-once"),
    doc="Streaming ingestion dedup under at-least-once delivery: the "
    "stream reads the events file TWICE (every record redelivered), "
    "and dropDuplicatesWithinWatermark on event_id must restore "
    "exactly-once counts — the oracle is the single-copy batch "
    "aggregate, so any duplicate leaking through doubles a count and "
    "fails the hash. Watermark-scoped dedup state is the production "
    "contract: state is bounded by the redelivery horizon (the "
    "watermark delay), not by stream lifetime — the unbounded-state "
    "dropDuplicates variant cannot run 24/7 at 100 TB/day.",
)
def events_dedup_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    src_dir = tempfile.mkdtemp(prefix="evdd_stream_src_")
    # at-least-once delivery: the same file visible twice
    os.symlink(f"{sf_dir}/events.parquet", f"{src_dir}/events-a.parquet")
    os.symlink(f"{sf_dir}/events.parquet", f"{src_dir}/events-b.parquet")
    stream = normalize_ts(spark.readStream.schema(raw.schema).parquet(src_dir))
    deduped = stream.withWatermark("ts", "2 hours").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    agg = (
        deduped.groupBy("event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
    )
    name = f"evdd_stream_{uuid.uuid4().hex[:8]}"
    query = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="evdd_stream_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table(name)


# --------------------------------------------------------------------------
# Streaming count-min sketch (round 5). The existing streaming aggs
# keep one state row PER KEY (event_type, window, event_id...) — fine
# while key cardinality is bounded, but a 100 TB/day stream of
# arbitrary ids (users, IPs, urls) grows that state without bound.
# The CMS turns frequency tracking into O(D x W) counters REGARDLESS
# of key cardinality: each event increments D (row, bucket) cells,
# and the streaming state is just the cell array. Because the sketch
# is linear and the cells are md5-derived (operators/sketches.py),
# the full streamed state is certifiable: a finite availableNow
# replay must produce bit-for-bit the cells the batch oracle computes,
# and the candidate probe on top is the same min-over-rows estimate.
# --------------------------------------------------------------------------

from mapreduce_distributed_systems_spark.operators.sketches import (  # noqa: E402
    CMS_D,
    CMS_TOP,
    _cms_bucket_duck,
    _cms_bucket_spark,
)

EVENTS_CMS_ORACLE = f"""
WITH cnt AS (
  SELECT CAST(user_id AS VARCHAR) AS w, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1
),
hrows AS (SELECT unnest(range({CMS_D})) AS r),
cells AS (
  SELECT r, {_cms_bucket_duck("w", "r")} AS b, sum(c) AS cell
  FROM cnt, hrows GROUP BY 1, 2
),
cand AS (SELECT w, c FROM cnt ORDER BY c DESC, w LIMIT {CMS_TOP}),
probe AS (
  SELECT w, c, r, {_cms_bucket_duck("w", "r")} AS b FROM cand, hrows
)
SELECT CAST(p.w AS BIGINT) AS user_id, any_value(p.c) AS n_exact,
       CAST(min(cells.cell) AS BIGINT) AS n_est,
       CAST(min(cells.cell) - any_value(p.c) AS BIGINT) AS overestimate
FROM probe p JOIN cells ON cells.r = p.r AND cells.b = p.b
GROUP BY p.w
"""


@register(
    "events_cms_streaming",
    oracle=EVENTS_CMS_ORACLE,
    tags=("events", "streaming", "sketch", "frequency"),
    doc=f"Streaming count-min sketch over user_id: every event fans "
    f"out to {CMS_D} md5-derived (row, bucket) cells and the streaming "
    "aggregate maintains ONLY the cell counters — state is O(D x W) "
    "no matter how many distinct users the stream carries, the "
    "bounded-state answer to high-cardinality frequency tracking that "
    "per-key streaming state cannot give. The replayed cell array is "
    "certified bit-for-bit against the batch-built sketch (CMS is "
    "linear, so increment-as-you-go == aggregate-then-insert), then "
    f"probed for the top-{CMS_TOP} users next to their exact counts "
    "and the one-sided overestimate.",
)
def events_cms_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    src_dir = tempfile.mkdtemp(prefix="evcms_stream_src_")
    os.symlink(f"{sf_dir}/events.parquet", f"{src_dir}/events.parquet")
    stream = spark.readStream.schema(raw.schema).parquet(src_dir)
    uid = F.col("user_id").cast("string")
    fan = stream.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).cast("int").alias("r"),
                        _cms_bucket_spark(uid, F.lit(r)).alias("b"),
                    )
                    for r in range(CMS_D)
                ]
            )
        ).alias("rc")
    ).select("rc.r", "rc.b")
    cells_q = fan.groupBy("r", "b").agg(F.count("*").alias("cell"))
    name = f"evcms_stream_{uuid.uuid4().hex[:8]}"
    query = (
        cells_q.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="evcms_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    cells = spark.table(name)
    # batch side: exact counts for the candidate probe (calibration
    # column, exactly as in the batch CMS query)
    cnt = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy(F.col("user_id").cast("string").alias("w"))
        .agg(F.count("*").alias("c"))
    )
    cand = cnt.orderBy(F.col("c").desc(), "w").limit(CMS_TOP)
    hrows = F.broadcast(
        spark.range(CMS_D).select(F.col("id").cast("int").alias("r"))
    )
    probe = cand.crossJoin(hrows).select(
        "w", "c", "r", _cms_bucket_spark(F.col("w"), F.col("r")).alias("b")
    )
    return (
        probe.join(F.broadcast(cells), ["r", "b"])
        .groupBy(F.col("w").cast("long").alias("user_id"))
        .agg(
            F.any_value("c").alias("n_exact"),
            F.min("cell").alias("n_est"),
            (F.min("cell") - F.any_value("c")).alias("overestimate"),
        )
    )
