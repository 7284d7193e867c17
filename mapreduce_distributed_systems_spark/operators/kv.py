"""KV op-log semantics (SURVEY.md §2.C, build plan M4) — batch replay.

The reference's declared KV surface (kvraft/client.go:37-60, model
models/kv.go:40-54) is: Get(key) -> current value ('' if absent),
Put(key,v) overwrites, Append(key,v) concatenates, ops applied
exactly once in raft-log commit order despite client retries
(kvraft/test_test.go:138-179). In batch form the commit order is an
explicit total order column and "the state" is a replay:

    final(key) = payload(last put) ++ payloads(appends after it)

Op log derivation from `events` (FIXTURES.md §3):
  key      = cast(user_id % 20 as string)
  op       = signup|purchase -> put, click|view -> append, error -> get
  payload  = cast(value as string)
  order    = (ts, event_id)           # ≙ raft commit order
  client   = user_id, seq = props.k   # retry-dedup identity (C4)

Scale note: the replay is one shuffle on key; per-key state is built
with array_sort(collect_list(struct(seq,payload))) — bounded by writes
per key. For 100 TB op logs the same plan holds because the heavy
filter (seq >= last_put_seq) drops all superseded history before the
collect; a raft-style snapshot (C6) is exactly a materialized
checkpoint of this query at a cutoff seq.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from mapreduce_distributed_systems_spark.plans.registry import register
from mapreduce_distributed_systems_spark.sources import load_table

OP_CASE_SQL = """
CASE WHEN event_type IN ('signup', 'purchase') THEN 'put'
     WHEN event_type IN ('click', 'view') THEN 'append'
     ELSE 'get' END
"""


def op_log(events: DataFrame) -> DataFrame:
    """Derive the ordered KV op log from the events table."""
    return events.select(
        F.col("user_id").cast("long").alias("client_id"),
        (F.col("user_id") % 20).cast("string").alias("key"),
        F.expr(OP_CASE_SQL).alias("op"),
        F.col("value").cast("string").alias("payload"),
        F.get_json_object("props", "$.k").cast("int").alias("client_seq"),
        "ts",
        "event_id",
    )


def replay(ops: DataFrame) -> DataFrame:
    """Fold the op log into final per-key state (models/kv.go:40-54)."""
    w = W.partitionBy("key").orderBy("ts", "event_id")
    writes = (
        ops.where(F.col("op") != "get")
        .withColumn("seq", F.row_number().over(w))
    )
    last_put = (
        writes.where(F.col("op") == "put")
        .groupBy("key")
        .agg(F.max("seq").alias("last_put_seq"))
    )
    live = writes.join(last_put, "key", "left").where(
        F.col("seq") >= F.coalesce(F.col("last_put_seq"), F.lit(0))
    )
    ordered_concat = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("seq", "payload"))),
            lambda s: s.payload,
        ),
        "",
    )
    return live.groupBy("key").agg(
        ordered_concat.alias("final_value"),
        F.count("*").alias("n_effective_ops"),
    )


KV_REPLAY_ORACLE = f"""
WITH ops AS (
  SELECT CAST(user_id % 20 AS VARCHAR) AS key,
         {OP_CASE_SQL} AS op,
         CAST(value AS VARCHAR) AS payload,
         ts, event_id
  FROM events
),
writes AS (
  SELECT key, op, payload,
         row_number() OVER (PARTITION BY key ORDER BY ts, event_id) AS seq
  FROM ops WHERE op <> 'get'
),
lp AS (SELECT key, max(seq) AS last_put_seq FROM writes WHERE op = 'put' GROUP BY key)
SELECT w.key,
       string_agg(w.payload, '' ORDER BY w.seq) AS final_value,
       count(*) AS n_effective_ops
FROM writes w LEFT JOIN lp ON w.key = lp.key
WHERE w.seq >= coalesce(lp.last_put_seq, 0)
GROUP BY w.key
"""


@register(
    "kv_replay_final",
    oracle=KV_REPLAY_ORACLE,
    tags=("kv", "stateful"),
    bench=True,
    doc="KV op-log replay to final state (C1-C3 batch semantics).",
)
def kv_replay_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    return replay(op_log(load_table(spark, sf_dir, "events")))


KV_DEDUP_ORACLE = f"""
WITH raw AS (
  SELECT user_id AS client_id,
         CAST(user_id % 20 AS VARCHAR) AS key,
         {OP_CASE_SQL} AS op,
         CAST(value AS VARCHAR) AS payload,
         CAST(json_extract_string(props, '$.k') AS INTEGER) AS client_seq,
         ts, event_id
  FROM events
),
deduped AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
      PARTITION BY client_id, client_seq ORDER BY ts, event_id) AS dup_rn
    FROM raw
  ) WHERE dup_rn = 1
),
writes AS (
  SELECT key, op, payload,
         row_number() OVER (PARTITION BY key ORDER BY ts, event_id) AS seq
  FROM deduped WHERE op <> 'get'
),
lp AS (SELECT key, max(seq) AS last_put_seq FROM writes WHERE op = 'put' GROUP BY key)
SELECT w.key,
       string_agg(w.payload, '' ORDER BY w.seq) AS final_value,
       count(*) AS n_effective_ops
FROM writes w LEFT JOIN lp ON w.key = lp.key
WHERE w.seq >= coalesce(lp.last_put_seq, 0)
GROUP BY w.key
"""


@register(
    "kv_replay_dedup",
    oracle=KV_DEDUP_ORACLE,
    tags=("kv", "stateful", "dedup"),
    doc="Replay with client-retry suppression first (C4 exactly-once: "
    "keep first occurrence of each (client_id, client_seq)).",
)
def kv_replay_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ops = op_log(load_table(spark, sf_dir, "events"))
    dw = W.partitionBy("client_id", "client_seq").orderBy("ts", "event_id")
    deduped = (
        ops.withColumn("dup_rn", F.row_number().over(dw))
        .where(F.col("dup_rn") == 1)
        .drop("dup_rn")
    )
    return replay(deduped)


KV_GET_ORACLE = f"""
WITH ops AS (
  SELECT CAST(user_id % 20 AS VARCHAR) AS key,
         {OP_CASE_SQL} AS op,
         CAST(value AS VARCHAR) AS payload,
         ts, event_id
  FROM events
),
writes AS (
  SELECT key, op, payload,
         row_number() OVER (PARTITION BY key ORDER BY ts, event_id) AS seq
  FROM ops WHERE op <> 'get'
),
lp AS (SELECT key, max(seq) AS last_put_seq FROM writes WHERE op = 'put' GROUP BY key),
state AS (
  SELECT w.key, string_agg(w.payload, '' ORDER BY w.seq) AS final_value
  FROM writes w LEFT JOIN lp ON w.key = lp.key
  WHERE w.seq >= coalesce(lp.last_put_seq, 0)
  GROUP BY w.key
),
universe AS (SELECT CAST(x AS VARCHAR) AS key FROM generate_series(0, 24) t(x))
SELECT u.key, coalesce(s.final_value, '') AS value
FROM universe u LEFT JOIN state s ON u.key = s.key
"""


@register(
    "kv_get_lookup",
    oracle=KV_GET_ORACLE,
    tags=("kv", "lookup"),
    doc="Get over a key universe incl. absent keys -> '' "
    "(kvraft/client.go:27-28 absent-key contract).",
)
def kv_get_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    state = replay(op_log(load_table(spark, sf_dir, "events"))).select(
        "key", "final_value"
    )
    # 25-key universe: 20 live keys + 5 absent, exercising the ''-default
    universe = spark.range(25).select(F.col("id").cast("string").alias("key"))
    return universe.join(F.broadcast(state), "key", "left").select(
        "key", F.coalesce("final_value", F.lit("")).alias("value")
    )


KV_GET_ASOF_ORACLE = f"""
WITH ops AS (
  SELECT CAST(user_id % 20 AS VARCHAR) AS key,
         {OP_CASE_SQL} AS op,
         CAST(value AS VARCHAR) AS payload,
         ts, event_id,
         row_number() OVER (PARTITION BY user_id % 20 ORDER BY ts, event_id) AS seq
  FROM events
),
anchored AS (
  SELECT *,
         coalesce(max(CASE WHEN op = 'put' THEN seq END) OVER (
           PARTITION BY key ORDER BY seq
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS last_put_seq
  FROM ops
),
gets AS (SELECT key, seq AS get_seq, last_put_seq FROM anchored WHERE op = 'get'),
writes AS (SELECT key, seq, payload FROM ops WHERE op <> 'get')
SELECT g.key, g.get_seq,
       coalesce(string_agg(w.payload, '' ORDER BY w.seq), '') AS value_at_get
FROM gets g
LEFT JOIN writes w
  ON w.key = g.key AND w.seq < g.get_seq AND w.seq >= g.last_put_seq
GROUP BY g.key, g.get_seq
"""


@register(
    "kv_get_asof",
    oracle=KV_GET_ASOF_ORACLE,
    tags=("kv", "lookup", "linearizability"),
    doc="Point-in-time Get: the value every 'get' op observes under the "
    "serial model (models/kv.go) — the batch form of the reference's "
    "porcupine linearizability check (C5): each read is derived from, "
    "and therefore consistent with, the total op order.",
)
def kv_get_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    ops = op_log(load_table(spark, sf_dir, "events"))
    w = W.partitionBy("key").orderBy("ts", "event_id")
    seqd = ops.withColumn("seq", F.row_number().over(w))
    anchored = seqd.withColumn(
        "last_put_seq",
        F.coalesce(
            F.max(F.when(F.col("op") == "put", F.col("seq"))).over(
                w.rowsBetween(W.unboundedPreceding, 0)
            ),
            F.lit(0),
        ),
    )
    gets = anchored.where(F.col("op") == "get").select(
        "key", F.col("seq").cast("long").alias("get_seq"), "last_put_seq"
    )
    writes = seqd.where(F.col("op") != "get").select(
        F.col("key").alias("wkey"), "seq", "payload"
    )
    joined = gets.join(
        writes,
        (F.col("wkey") == F.col("key"))
        & (F.col("seq") < F.col("get_seq"))
        & (F.col("seq") >= F.col("last_put_seq")),
        "left",
    )
    ordered_concat = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.when(
                        F.col("payload").isNotNull(), F.struct("seq", "payload")
                    )
                )
            ),
            lambda s: s.payload,
        ),
        "",
    )
    return joined.groupBy("key", "get_seq").agg(
        ordered_concat.alias("value_at_get")
    )


def merge_snapshot_and_tail(snap: DataFrame, tail: DataFrame) -> DataFrame:
    """Apply a tail of writes on top of a materialized per-key snapshot
    (`snap`: key, final_value, n_effective_ops). A tail put supersedes
    the snapshot for its key; otherwise tail appends concatenate onto
    the snapshot value. One per-key join — the 100 TB refresh shape."""
    snap_named = snap.select(
        "key",
        F.col("final_value").alias("sv"),
        F.col("n_effective_ops").alias("se"),
    )
    # replay(tail) already yields, per key: concat-from-last-put when
    # the tail has a put, else the ordered concat of ALL tail appends
    tail_state = replay(tail).select(
        "key",
        F.col("final_value").alias("tv"),
        F.col("n_effective_ops").alias("te"),
    )
    tail_put = (
        tail.where(F.col("op") == "put")
        .select("key")
        .distinct()
        .withColumn("tail_has_put", F.lit(True))
    )
    j = snap_named.join(tail_state, "key", "full").join(tail_put, "key", "left")
    final_value = F.when(F.col("tail_has_put"), F.col("tv")).otherwise(
        F.concat(
            F.coalesce(F.col("sv"), F.lit("")),
            F.coalesce(F.col("tv"), F.lit("")),
        )
    )
    final_eff = F.when(F.col("tail_has_put"), F.col("te")).otherwise(
        F.coalesce(F.col("se"), F.lit(0)) + F.coalesce(F.col("te"), F.lit(0))
    )
    return j.select(
        "key",
        final_value.alias("final_value"),
        final_eff.cast("long").alias("n_effective_ops"),
    )


def compacted_replay(ops: DataFrame, head_filter: F.Column) -> DataFrame:
    """Snapshot-compaction composition (C6, kvraft snapshots): fold the
    ops matching `head_filter` into a per-key snapshot, then apply the
    remaining tail on top. Compaction must be semantically invisible:
    for ANY split the result equals `replay(ops)` — which is exactly
    what the shared oracle checks.

    Scale note: this is the 100 TB op-log shape — the head fold runs
    once (the materialized checkpoint), and incremental refreshes
    replay only the tail; state merge is a per-key join, one shuffle.
    """
    writes = ops.where(F.col("op") != "get")
    return merge_snapshot_and_tail(
        replay(writes.where(head_filter)), writes.where(~head_filter)
    )


@register(
    "kv_snapshot_compaction",
    oracle=KV_REPLAY_ORACLE,  # compaction must be invisible: == full replay
    tags=("kv", "stateful", "compaction"),
    doc="C6 snapshot/compaction as a query: fold the op log up to the "
    "epoch-midpoint cutoff into a snapshot, replay only the tail on "
    "top, merge. Gated against the FULL-replay oracle, proving the "
    "compaction is semantically invisible (kvraft/server.go snapshot "
    "contract; the cutoff is arbitrary by construction).",
)
def kv_snapshot_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    ops = op_log(load_table(spark, sf_dir, "events"))
    bounds = ops.agg(F.min("ts").alias("t0"), F.max("ts").alias("t1"))
    with_cut = ops.crossJoin(F.broadcast(bounds)).withColumn(
        "cutoff",
        F.expr("timestamp_micros((unix_micros(t0) + unix_micros(t1)) div 2)"),
    )
    return compacted_replay(with_cut, F.col("ts") <= F.col("cutoff"))


# --------------------------------------------------------------------------
# SCD Type-2 version table (round 5). kv_get_asof answers point-in-
# time lookups by replaying; a warehouse serves the same question from
# a MATERIALIZED slowly-changing-dimension table: one row per (key,
# version) with a [valid_from, valid_to) interval, valid_to = the next
# put's timestamp (NULL while current). Any as-of read becomes a
# range predicate on the version table instead of a replay — the
# standard dimension-build shape every warehouse load runs.
# --------------------------------------------------------------------------

KV_SCD2_ORACLE = f"""
WITH ops AS (
  SELECT CAST(user_id % 20 AS VARCHAR) AS key,
         {OP_CASE_SQL} AS op,
         CAST(value AS VARCHAR) AS payload,
         ts, event_id
  FROM events
),
v AS (
  SELECT key, payload AS value, ts, event_id,
         row_number() OVER w AS version_no,
         lead(ts) OVER w AS valid_to
  FROM ops WHERE op = 'put'
  WINDOW w AS (PARTITION BY key ORDER BY ts, event_id)
)
SELECT key, CAST(version_no AS BIGINT) AS version_no, value,
       ts AS valid_from, valid_to, valid_to IS NULL AS is_current
FROM v
"""


@register(
    "kv_scd2_versions",
    oracle=KV_SCD2_ORACLE,
    tags=("kv", "stateful", "scd2", "versioning"),
    doc="SCD Type-2 dimension build from the put stream: one row per "
    "(key, version) with version_no (row_number), value, and the "
    "[valid_from, valid_to) validity interval from lead(ts) over the "
    "per-key commit order — valid_to NULL marks the current version. "
    "Materializes what kv_get_asof recomputes per query: an as-of "
    "read becomes `valid_from <= t AND (valid_to IS NULL OR "
    "valid_to > t)` against this table. Both windows partition on "
    "key (commit order is per-key), so the build is one shuffle at "
    "any scale; semantics anchor: kvraft overwrite-put "
    "(models/kv.go:44-46) — each put supersedes the previous, which "
    "is exactly a version interval close.",
)
def kv_scd2_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    puts = op_log(load_table(spark, sf_dir, "events")).where(
        F.col("op") == "put"
    )
    return scd2_versions(puts)


def scd2_versions(puts: DataFrame) -> DataFrame:
    """Core SCD2 build over (key, payload, ts, event_id) put rows —
    separated from the registered query so the hypothesis model test
    can drive it with arbitrary op logs."""
    w = W.partitionBy("key").orderBy("ts", "event_id")
    return puts.select(
        "key",
        F.row_number().over(w).cast("long").alias("version_no"),
        F.col("payload").alias("value"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.lead("ts").over(w).isNull().alias("is_current"),
    )
