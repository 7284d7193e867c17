"""Event-time analytics over the `events` stream table (build plan M3,
batch form; the streaming twins live in streaming/).

Tumbling / sliding windows use Spark's `window()`, sessionization uses
`session_window()` — these are the batch duals of the Structured
Streaming operators, so the same plans run under readStream with a
watermark (see streaming/kv_stream.py for the stateful variant).

Window-start semantics pinned for the oracle:
- tumbling 1 h  == date_trunc('hour', ts)
- sliding 1 h / 30 min: an event belongs to windows starting at
  floor(epoch/1800)*1800 and that minus 1800 (epoch-aligned, the same
  alignment Spark uses);
- session (30 min gap): events merge while gap < 30 min strictly
  (Spark merges overlapping [ts, ts+gap) windows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_distributed_systems_spark.plans.registry import register
from mapreduce_distributed_systems_spark.sources import load_table

TUMBLING_ORACLE = """
SELECT date_trunc('hour', ts) AS window_start,
       event_type,
       count(*) AS n,
       round(sum(value), 2) AS total_value
FROM events
GROUP BY 1, 2
"""


@register(
    "events_tumbling_hourly",
    oracle=TUMBLING_ORACLE,
    tags=("events", "window-agg"),
    bench=True,
    doc="Tumbling 1-hour event-time windows per event_type.",
)
def events_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n", "total_value"
        )
    )


SLIDING_ORACLE = """
SELECT make_timestamp(((CAST(floor(epoch(ts) / 1800) AS BIGINT) - k) * 1800) * 1000000)
         AS window_start,
       count(*) AS n,
       round(sum(value), 2) AS total_value
FROM events, (SELECT unnest([0, 1]) AS k)
GROUP BY 1
"""


@register(
    "events_sliding_1h_30m",
    oracle=SLIDING_ORACLE,
    tags=("events", "window-agg"),
    bench=True,
    doc="Sliding 1-hour windows every 30 min (each event in 2 windows).",
)
def events_sliding_1h_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "n", "total_value")
    )


SESSION_ORACLE = """
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   >= INTERVAL 30 MINUTE
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sessions AS (
  SELECT user_id, ts, value,
         sum(new_session) OVER (
           PARTITION BY user_id ORDER BY ts
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) AS last_event_ts,
       count(*) AS n_events,
       round(sum(value), 2) AS total_value
FROM sessions
GROUP BY user_id, session_id
"""


@register(
    "events_sessionize",
    oracle=SESSION_ORACLE,
    tags=("events", "session"),
    bench=True,
    doc="Sessionization: 30-min-gap sessions per user via session_window.",
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("last_event_ts"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select("user_id", "session_start", "last_event_ts", "n_events", "total_value")
    )


JSON_ORACLE = """
SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS k_bucket,
       count(*) AS n,
       round(sum(value), 2) AS total_value
FROM events
GROUP BY 1
"""


@register(
    "events_json_props",
    oracle=JSON_ORACLE,
    tags=("events", "json"),
    doc="Semi-structured: JSON prop extraction + bucket aggregation.",
)
def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            (F.get_json_object("props", "$.k").cast("int") % 10).alias("k_bucket"),
            "value",
        )
        .groupBy("k_bucket")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
    )


RANGE_JOIN_ORACLE = """
WITH e AS (
  SELECT event_id, user_id, event_type,
         -- floor, not cast: CAST(double AS BIGINT) ROUNDS in DuckDB,
         -- Spark's unix_timestamp truncates sub-second parts
         CAST(floor(epoch(ts)) AS BIGINT) AS sec
  FROM events
),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b
  FROM e a JOIN e b
    ON b.sec BETWEEN a.sec - 60 AND a.sec + 60
   AND a.user_id < b.user_id
)
SELECT type_a, type_b, count(*) AS n_pairs
FROM pairs GROUP BY type_a, type_b
"""


@register(
    "events_range_join_concurrent",
    oracle=RANGE_JOIN_ORACLE,
    tags=("events", "range-join"),
    doc="Non-equi RANGE JOIN, banded: pairs of events from different "
    "users within 60s of each other, counted per type pair. The naive "
    "form is a cartesian filtered by |Δt|<=60; the scale form buckets "
    "time into 60s bands and equi-joins each event to its own and "
    "adjacent bands, then applies the exact range filter — join "
    "fan-out bounded by events-per-2-minutes, never O(n^2).",
)
def events_range_join_concurrent(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_timestamp("ts").alias("sec"),
    )
    BAND = 60
    a = ev.select(
        F.col("user_id").alias("ua"),
        F.col("event_type").alias("type_a"),
        F.col("sec").alias("sec_a"),
        F.floor(F.col("sec") / BAND).alias("band"),
    )
    # each right-side event registers in its own band and both
    # neighbors, so every |Δt| <= BAND pair shares a band key
    b = ev.select(
        F.col("user_id").alias("ub"),
        F.col("event_type").alias("type_b"),
        F.col("sec").alias("sec_b"),
        F.explode(
            F.array(
                F.floor(F.col("sec") / BAND) - 1,
                F.floor(F.col("sec") / BAND),
                F.floor(F.col("sec") / BAND) + 1,
            )
        ).alias("band"),
    )
    # no dedup needed: the left side carries ONE band per event, and
    # the right side's three exploded bands are distinct — a
    # qualifying pair joins exactly once (on the left event's band)
    pairs = a.join(b, "band").where(
        (F.col("sec_b") >= F.col("sec_a") - BAND)
        & (F.col("sec_b") <= F.col("sec_a") + BAND)
        & (F.col("ua") < F.col("ub"))
    )
    return pairs.groupBy("type_a", "type_b").agg(F.count("*").alias("n_pairs"))


FUNNEL_ORACLE = """
WITH s AS (
  SELECT user_id, min(ts) AS signup_ts
  FROM events WHERE event_type = 'signup' GROUP BY user_id
),
p AS (
  SELECT s.user_id, min(e.ts) AS first_purchase_ts, any_value(s.signup_ts) AS signup_ts
  FROM s JOIN events e
    ON e.user_id = s.user_id AND e.event_type = 'purchase'
   AND e.ts >= s.signup_ts
  GROUP BY s.user_id
)
SELECT (SELECT count(*) FROM s) AS n_signed_up,
       count(*) AS n_converted,
       CAST(sum(CASE WHEN first_purchase_ts <= signup_ts + INTERVAL 7 DAY
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_converted_7d
FROM p
"""


@register(
    "events_funnel_conversion",
    oracle=FUNNEL_ORACLE,
    tags=("events", "funnel"),
    doc="Funnel analysis: users who signed up, converted (purchase at "
    "or after first signup), and converted within 7 days — min-ts "
    "anchors + one ordered join, all single-shuffle aggregates. The "
    "signup denominator is a crossJoined 1-row aggregate, so the whole "
    "funnel is ONE Catalyst plan / one job — no driver-side count() "
    "action mid-pipeline (round-3 fix, VERDICT r2 item 5).",
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    s = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    p = (
        s.join(
            ev.where(F.col("event_type") == "purchase").select(
                "user_id", F.col("ts").alias("pts")
            ),
            "user_id",
        )
        .where(F.col("pts") >= F.col("signup_ts"))
        .groupBy("user_id")
        .agg(
            F.min("pts").alias("first_purchase_ts"),
            F.first("signup_ts").alias("signup_ts"),
        )
    )
    n_signed = s.agg(F.count("*").cast("long").alias("n_signed_up"))
    conv = p.agg(
        F.count("*").alias("n_converted"),
        F.sum(
            (
                F.col("first_purchase_ts")
                <= F.col("signup_ts") + F.expr("INTERVAL 7 DAYS")
            ).cast("long")
        ).alias("n_converted_7d"),
    )
    # both sides are 1-row aggregates; the crossJoin is a broadcast
    # nested loop over a single row — no extra job, no recompute of `s`
    # outside this plan
    return n_signed.crossJoin(conv).select(
        "n_signed_up", "n_converted", "n_converted_7d"
    )


RETENTION_ORACLE = """
WITH first_seen AS (
  -- cast: DuckDB date_trunc('week') yields DATE, Spark a TIMESTAMP
  SELECT user_id, CAST(date_trunc('week', min(ts)) AS TIMESTAMP) AS cohort_week
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT e.user_id, f.cohort_week,
         CAST(date_diff('week', f.cohort_week, date_trunc('week', e.ts)) AS BIGINT)
           AS week_offset
  FROM events e JOIN first_seen f ON f.user_id = e.user_id
)
SELECT cohort_week, week_offset,
       CAST(count(*) AS BIGINT) AS n_active_users
FROM activity
WHERE week_offset <= 8
GROUP BY cohort_week, week_offset
"""


@register(
    "events_weekly_retention",
    oracle=RETENTION_ORACLE,
    tags=("events", "retention", "cohort"),
    doc="Cohort retention: users grouped by first-seen week, distinct "
    "active users per (cohort, week offset) for 8 weeks — the classic "
    "retention triangle; one join + distinct + aggregate.",
)
def events_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = (
        ev.select("user_id", F.date_trunc("week", "ts").alias("w"))
        .join(first_seen, "user_id")
        .select(
            "user_id",
            "cohort_week",
            ((F.unix_timestamp("w") - F.unix_timestamp("cohort_week")) / (7 * 86400))
            .cast("long")
            .alias("week_offset"),
        )
        .distinct()
    )
    return (
        activity.where(F.col("week_offset") <= 8)
        .groupBy("cohort_week", "week_offset")
        .agg(F.count("*").alias("n_active_users"))
    )


# --------------------------------------------------------------------------
# Time-series densification: hourly spine + forward fill (round 5).
# Feature pipelines need gap-free per-entity series (training windows,
# rate comparisons, staleness features); raw event streams have holes.
# The operator shape: per-user hourly aggregate -> per-user dense hour
# spine (sequence/explode between that user's own min and max hour) ->
# left join -> last-non-null forward fill. Everything is keyed by
# user_id: the spine explode, the join, and the fill window all
# partition on the entity, so a 100 TB stream densifies at full
# cluster width — no global spine, no SinglePartition window, and the
# spine length is bounded by each entity's own active span.
# --------------------------------------------------------------------------

GAP_FILL_ORACLE = """
WITH hourly AS (
  SELECT user_id, date_trunc('hour', ts) AS h,
         CAST(count(*) AS BIGINT) AS n_events,
         round(sum(value), 2) AS hour_value
  FROM events GROUP BY 1, 2
),
bounds AS (
  SELECT user_id, min(h) AS lo, max(h) AS hi FROM hourly GROUP BY 1
),
spine AS (
  SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
  FROM bounds
)
SELECT s.user_id, s.h AS hour_start,
       coalesce(hy.n_events, 0) AS n_events,
       last_value(hy.hour_value IGNORE NULLS) OVER (
         PARTITION BY s.user_id ORDER BY s.h
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS filled_value,
       hy.n_events IS NULL AS was_gap
FROM spine s LEFT JOIN hourly hy ON hy.user_id = s.user_id AND hy.h = s.h
"""


@register(
    "events_gap_fill_hourly",
    oracle=GAP_FILL_ORACLE,
    tags=("events", "time-series", "densify", "window"),
    doc="Per-user hourly densification with forward fill: build each "
    "user's dense hour spine between their own first and last active "
    "hour (sequence + explode — no global calendar), left-join the "
    "hourly aggregate, and carry the last non-null hour_value forward "
    "(last_value IGNORE NULLS). Gap hours emit n_events = 0, "
    "was_gap = true, and the previous observed value — the "
    "training-feature shape (staleness/carry-forward) that raw event "
    "streams can't provide. Spine, join, and fill window are all "
    "partitioned by user_id; hour sums are rounded in-query in both "
    "engines before the fill copies them around.",
)
def events_gap_fill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("h")
    ).agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("hour_value"),
    )
    bounds = hourly.groupBy("user_id").agg(
        F.min("h").alias("lo"), F.max("h").alias("hi")
    )
    spine = bounds.select(
        "user_id",
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("h"),
    )
    joined = spine.join(hourly, ["user_id", "h"], "left")
    fill_w = (
        W.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return joined.select(
        "user_id",
        F.col("h").alias("hour_start"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.last("hour_value", ignorenulls=True).over(fill_w).alias(
            "filled_value"
        ),
        F.col("n_events").isNull().alias("was_gap"),
    )


# --------------------------------------------------------------------------
# Multi-grain time rollup (round 5): hour/day/week aggregates of the
# same measure in ONE scan via grouping sets — the OLAP time-hierarchy
# materialization. The alternative (three separate groupBys) scans
# 100 TB three times; Catalyst's Expand produces the three grain rows
# per input row and one shuffle aggregates all grains together.
# --------------------------------------------------------------------------

MULTI_GRAIN_ORACLE = """
SELECT grain, bucket_start, event_type,
       CAST(n AS BIGINT) AS n, total_value
FROM (
  SELECT 'hour' AS grain, date_trunc('hour', ts) AS bucket_start,
         event_type, count(*) AS n, round(sum(value), 2) AS total_value
  FROM events GROUP BY 2, 3
  UNION ALL
  SELECT 'day', date_trunc('day', ts), event_type,
         count(*), round(sum(value), 2)
  FROM events GROUP BY 2, 3
  UNION ALL
  SELECT 'week', date_trunc('week', ts), event_type,
         count(*), round(sum(value), 2)
  FROM events GROUP BY 2, 3
)
"""


@register(
    "events_multi_grain_rollup",
    oracle=MULTI_GRAIN_ORACLE,
    tags=("events", "aggregate", "grouping-sets", "time-hierarchy"),
    doc="Hour/day/week rollup of (count, sum) per event_type in ONE "
    "pass: precompute the three truncations as columns, aggregate "
    "over GROUPING SETS ((hour, type), (day, type), (week, type)), "
    "and collapse the grain columns with coalesce + a grouping()-"
    "derived label. One scan + one Expand(3x) + one shuffle replaces "
    "three full scans — the standard way to materialize a time "
    "hierarchy over 100 TB. The oracle spells out the equivalent "
    "3-way union for DuckDB.",
)
def events_multi_grain_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "value",
        F.date_trunc("hour", "ts").alias("h"),
        F.date_trunc("day", "ts").alias("d"),
        F.date_trunc("week", "ts").alias("w"),
    )
    ev.createOrReplaceTempView("ev_grains")
    # grain derives from grouping() — which grouping set produced the
    # row — NOT from column nullness: a NULL ts (hence NULL h/d/w)
    # would make a nullness CASE label every grain's row 'week' and
    # diverge from the oracle's 3-way union
    return ev.sparkSession.sql(
        """
        SELECT CASE WHEN grouping(h) = 0 THEN 'hour'
                    WHEN grouping(d) = 0 THEN 'day'
                    ELSE 'week' END AS grain,
               coalesce(h, d, w) AS bucket_start,
               event_type,
               count(*) AS n,
               round(sum(value), 2) AS total_value
        FROM ev_grains
        GROUP BY GROUPING SETS ((h, event_type), (d, event_type),
                                (w, event_type))
        """
    )


# --------------------------------------------------------------------------
# Rolling 7-day active users (round 5): for every calendar day, the
# distinct users active in the trailing 7-day window — the WAU curve.
# A naive RANGE-interval window with COUNT(DISTINCT) doesn't exist in
# either engine (distinct over moving frames); the scale shape is:
# collapse the stream to distinct (user, day) pairs FIRST (the only
# corpus-sized aggregate, map-side combined), then explode each pair
# to the <=7 window-end days it contributes to, and count distinct
# per day. The explode multiplies the already-tiny (user, day) table
# by 7, never the raw stream.
# --------------------------------------------------------------------------

ROLLING_WINDOW_DAYS = 7

ROLLING_ACTIVE_ORACLE = f"""
WITH ud AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS d
  FROM events
),
days AS (SELECT DISTINCT d FROM ud),
contrib AS (
  SELECT ud.user_id, days.d AS window_end
  FROM ud JOIN days
    ON days.d >= ud.d
   AND days.d < ud.d + INTERVAL {ROLLING_WINDOW_DAYS} DAY
)
SELECT window_end, CAST(count(DISTINCT user_id) AS BIGINT) AS active_users
FROM contrib GROUP BY 1
"""


@register(
    "events_rolling_7d_active_users",
    oracle=ROLLING_ACTIVE_ORACLE,
    tags=("events", "time-series", "rolling-distinct"),
    doc=f"Rolling {ROLLING_WINDOW_DAYS}-day active users per day (the "
    "WAU curve): distinct (user, day) pairs first — the only "
    "stream-sized aggregate, map-side combined — then each pair "
    f"explodes to the <= {ROLLING_WINDOW_DAYS} observed window-end "
    "days it covers and a distinct count folds per day. Neither "
    "engine can COUNT(DISTINCT) over a moving RANGE frame; this "
    "explode-then-count formulation multiplies only the collapsed "
    "pair table by the window length, never the raw events. Window "
    "ends are restricted to days that actually appear (the oracle "
    "joins the same observed-days set).",
)
def events_rolling_7d_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select(
        "user_id", F.date_trunc("day", "ts").alias("d")
    ).distinct()
    days = F.broadcast(ud.select("d").distinct().withColumnRenamed("d", "wd"))
    contrib = ud.join(
        days,
        (F.col("wd") >= F.col("d"))
        & (
            F.col("wd")
            < F.col("d") + F.expr(f"INTERVAL {ROLLING_WINDOW_DAYS} DAYS")
        ),
    )
    return contrib.groupBy(F.col("wd").alias("window_end")).agg(
        F.count_distinct("user_id").alias("active_users")
    )


# --------------------------------------------------------------------------
# Winsorized statistics (round 5): robust per-group scaling — clip
# value to its group's [p05, p95] before aggregating, the standard
# outlier-taming step before features/metrics. The percentile pair is
# a per-group aggregate (exact interpolated, same function pair
# agg_percentiles certifies: Spark percentile() == DuckDB
# quantile_cont()), broadcast back onto the stream; percentiles are
# rounded in-query in BOTH engines before the clip compare so a value
# sitting on the boundary classifies identically.
# --------------------------------------------------------------------------

WINSOR_ORACLE = """
WITH pct AS (
  SELECT event_type,
         round(quantile_cont(value, 0.05), 6) AS lo,
         round(quantile_cont(value, 0.95), 6) AS hi
  FROM events GROUP BY 1
)
SELECT e.event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN value < lo THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clipped_low,
       CAST(sum(CASE WHEN value > hi THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clipped_high,
       round(sum(least(greatest(value, lo), hi)), 2) AS winsorized_sum,
       round(sum(value), 2) AS raw_sum
FROM events e JOIN pct USING (event_type)
GROUP BY e.event_type
"""


@register(
    "events_winsorized_stats",
    oracle=WINSOR_ORACLE,
    tags=("events", "robust-stats", "feature-prep"),
    doc="Per-type winsorization: clip value into the group's exact "
    "interpolated [p05, p95] (percentiles rounded in-query in both "
    "engines before the compare, so boundary values classify "
    "identically), then aggregate clipped vs raw sums and the clip "
    "counts. The percentile table is one row per group — a broadcast "
    "join back onto the stream — and the final aggregate is map-side "
    "combined; two passes total, the minimum for a data-dependent "
    "threshold.",
)
def events_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    pct = ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.05)"), 6).alias("lo"),
        F.round(F.expr("percentile(value, 0.95)"), 6).alias("hi"),
    )
    return (
        ev.join(F.broadcast(pct), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("value") < F.col("lo"), 1).otherwise(0))
            .cast("long")
            .alias("n_clipped_low"),
            F.sum(F.when(F.col("value") > F.col("hi"), 1).otherwise(0))
            .cast("long")
            .alias("n_clipped_high"),
            F.round(
                F.sum(F.least(F.greatest("value", F.col("lo")), F.col("hi"))),
                2,
            ).alias("winsorized_sum"),
            F.round(F.sum("value"), 2).alias("raw_sum"),
        )
    )


# --------------------------------------------------------------------------
# Daily trend via exact-arithmetic OLS (round 5). regr_slope exists in
# both engines but sums doubles in engine-dependent order, so its last
# ulps can't hash-certify. Instead: daily totals are rounded to cents
# and cast to BIGINT, the day index is a small integer, and every OLS
# moment (n, Sx, Sy, Sxy, Sxx) is then an EXACT integer aggregate —
# order-independent in any engine — with one final double division.
# The integer-moment trick is the same discipline that made the IVF
# k-means quantizer certifiable.
# --------------------------------------------------------------------------

TREND_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
         CAST(round(round(sum(value), 2) * 100) AS BIGINT) AS yc
  FROM events GROUP BY 1, 2
),
idx AS (
  SELECT event_type, yc,
         CAST((epoch(d) - min(epoch(d)) OVER (PARTITION BY event_type))
              / 86400 AS BIGINT) AS x
  FROM daily
),
m AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         sum(x) AS sx, sum(yc) AS sy,
         sum(x * yc) AS sxy, sum(x * x) AS sxx
  FROM idx GROUP BY 1
)
SELECT event_type, n,
       round(CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE) / 100, 6)
         AS slope_per_day,
       round((CAST(sy AS DOUBLE) - CAST(n * sxy - sx * sy AS DOUBLE)
              / CAST(n * sxx - sx * sx AS DOUBLE)
              * CAST(sx AS DOUBLE) / n) / n / 100, 6)
         AS intercept
FROM m
"""


@register(
    "events_daily_trend",
    oracle=TREND_ORACLE,
    tags=("events", "regression", "exact-arithmetic"),
    doc="Per-type OLS trend of daily value totals: daily sums rounded "
    "to cents and cast to BIGINT, day index a small integer, so every "
    "OLS moment (n, Sx, Sy, Sxy, Sxx) is an exact integer aggregate — "
    "order-independent, hence hash-certifiable where the built-in "
    "regr_slope's double summation is not — with one final double "
    "division (identical IEEE op on identical integers) rounded for "
    "emission. Two map-side-combined aggregates and a per-group "
    "window over day counts; nothing corpus-sized past the daily "
    "rollup.",
)
def events_daily_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("d")
    ).agg(
        F.round(F.round(F.sum("value"), 2) * 100)
        .cast("long")
        .alias("yc")
    )
    w = W.partitionBy("event_type")
    idx = daily.select(
        "event_type",
        "yc",
        (
            (F.unix_timestamp("d") - F.min(F.unix_timestamp("d")).over(w))
            / 86400
        )
        .cast("long")
        .alias("x"),
    )
    m = idx.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("yc").alias("sy"),
        F.sum(F.col("x") * F.col("yc")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    slope = num / den
    return m.select(
        "event_type",
        "n",
        F.round(slope / 100, 6).alias("slope_per_day"),
        F.round(
            (
                F.col("sy").cast("double")
                - slope * F.col("sx").cast("double") / F.col("n")
            )
            / F.col("n")
            / 100,
            6,
        ).alias("intercept"),
    )


# --------------------------------------------------------------------------
# Robust anomaly detection (round 5): median/MAD outlier flags per event
# type. Mean/stddev break under the very outliers being hunted; the
# median absolute deviation estimator doesn't. Exact-arithmetic
# discipline as events_daily_trend: values go to integer cents first,
# so both medians interpolate identical integers ((a+b)/2 — exact in
# a double at these magnitudes) and every comparison sees bitwise-equal
# operands in both engines.
# --------------------------------------------------------------------------

MAD_K = 3.0  # flag beyond 3 scaled MADs
MAD_SCALE = 1.4826  # consistency constant vs sigma under normality

ANOMALY_MAD_ORACLE = f"""
WITH c AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS vc FROM events
),
med AS (
  SELECT event_type, quantile_cont(vc, 0.5) AS med
  FROM c GROUP BY event_type
),
dev AS (
  SELECT c.event_type, m.med, abs(c.vc - m.med) AS dv
  FROM c JOIN med m USING (event_type)
),
mad AS (
  SELECT event_type, quantile_cont(dv, 0.5) AS mad
  FROM dev GROUP BY event_type
)
SELECT d.event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(max(d.med) / 100, 4) AS median_value,
       round(max(m2.mad) / 100, 4) AS mad_value,
       CAST(sum(CASE WHEN d.dv > {MAD_K} * {MAD_SCALE} * m2.mad
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       round(CAST(sum(CASE WHEN d.dv > {MAD_K} * {MAD_SCALE} * m2.mad
                           THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 4)
         AS outlier_frac,
       round(max(d.dv) / 100, 4) AS max_abs_dev
FROM dev d JOIN mad m2 USING (event_type)
GROUP BY d.event_type
"""


@register(
    "events_anomaly_mad",
    oracle=ANOMALY_MAD_ORACLE,
    tags=("events", "robust-stats", "anomaly"),
    doc="Median/MAD outlier detection per event type: values to integer "
    "cents, exact interpolated median, MAD from a second exact median "
    "over deviations, flags at 3x1.4826xMAD. Both median tables are "
    "one row per type and broadcast back onto the stream; the final "
    "aggregate is map-side combined. The exact medians buffer each "
    "group's values (ObjectHashAggregate) — the price of a "
    "hash-certifiable estimator; a 100 TB deployment would swap in "
    "approx_percentile and keep the identical plan shape.",
)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("vc"),
    )
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(vc, 0.5)").alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", "med", F.abs(F.col("vc") - F.col("med")).alias("dv")
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(dv, 0.5)").alias("mad")
    )
    is_out = F.col("dv") > F.lit(MAD_K) * F.lit(MAD_SCALE) * F.col("mad")
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.max("med") / 100, 4).alias("median_value"),
            F.round(F.max("mad") / 100, 4).alias("mad_value"),
            F.sum(F.when(is_out, 1).otherwise(0)).cast("long").alias(
                "n_outliers"
            ),
            F.round(
                F.sum(F.when(is_out, 1).otherwise(0)).cast("double")
                / F.count("*"),
                4,
            ).alias("outlier_frac"),
            F.round(F.max("dv") / 100, 4).alias("max_abs_dev"),
        )
    )
