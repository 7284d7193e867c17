"""Extended scalar-function library (SURVEY.md §2.D: the reference has
no function library at all — apps call Go stdlib directly; a complete
engine needs the standard string/date surface).

Cross-engine semantic pins worth noting:
- dayofweek: Spark is 1=Sunday..7; DuckDB dow is 0=Sunday..6 — the
  oracle adds 1 explicitly;
- levenshtein returns int32 in Spark, BIGINT in DuckDB — cast;
- split_part / regexp_extract exist under the same names in both.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_distributed_systems_spark.plans.registry import register
from mapreduce_distributed_systems_spark.sources import load_table

STRING_EXT_ORACLE = """
SELECT c_custkey,
       split_part(c_name, '#', 2) AS cust_num,
       regexp_extract(c_name, '([0-9]+)', 1) AS digits,
       lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS key_padded,
       rpad(c_mktsegment, 12, '.') AS seg_padded,
       reverse(c_mktsegment) AS seg_rev,
       translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_lowvowel,
       repeat('*', CAST(c_custkey % 4 AS INTEGER)) AS stars,
       CAST(levenshtein(c_mktsegment, 'MACHINERY') AS BIGINT) AS seg_dist,
       CAST(strpos(c_name, '#') AS BIGINT) AS hash_pos,
       trim('C' FROM c_mktsegment) AS seg_trimmed
FROM customer
"""


@register(
    "string_funcs_ext",
    oracle=STRING_EXT_ORACLE,
    tags=("relational", "scalar", "string"),
    doc="Extended string library: split_part, regexp_extract, pads, "
    "reverse, translate, repeat, levenshtein, strpos, char-trim.",
)
def string_funcs_ext(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.expr("split_part(c_name, '#', 2)").alias("cust_num"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("digits"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("key_padded"),
        F.rpad("c_mktsegment", 12, ".").alias("seg_padded"),
        F.reverse("c_mktsegment").alias("seg_rev"),
        F.translate("c_mktsegment", "AEIOU", "aeiou").alias("seg_lowvowel"),
        F.expr("repeat('*', cast(c_custkey % 4 as int))").alias("stars"),
        F.levenshtein("c_mktsegment", F.lit("MACHINERY")).cast("long").alias(
            "seg_dist"
        ),
        F.instr("c_name", "#").cast("long").alias("hash_pos"),
        F.expr("trim(BOTH 'C' FROM c_mktsegment)").alias("seg_trimmed"),
    )


DATE_EXT_ORACLE = """
SELECT o_orderkey,
       CAST(quarter(o_orderdate) AS BIGINT) AS q,
       CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow,
       CAST(dayofyear(o_orderdate) AS BIGINT) AS doy,
       CAST(weekofyear(o_orderdate) AS BIGINT) AS iso_week,
       last_day(o_orderdate::DATE) AS month_end,
       (o_orderdate::DATE + INTERVAL 3 MONTH)::DATE AS plus3m,
       date_trunc('quarter', o_orderdate)::TIMESTAMP AS quarter_start
FROM orders
"""


@register(
    "date_funcs_ext",
    oracle=DATE_EXT_ORACLE,
    tags=("relational", "scalar", "date"),
    doc="Extended date library: quarter, day-of-week (convention pinned "
    "to Spark's 1=Sunday), day/week-of-year, last_day, add_months, "
    "quarter truncation.",
)
def date_funcs_ext(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        F.quarter("o_orderdate").cast("long").alias("q"),
        F.dayofweek("o_orderdate").cast("long").alias("dow"),
        F.dayofyear("o_orderdate").cast("long").alias("doy"),
        F.weekofyear("o_orderdate").cast("long").alias("iso_week"),
        F.last_day(d).alias("month_end"),
        F.add_months(d, 3).alias("plus3m"),
        F.date_trunc("quarter", "o_orderdate").alias("quarter_start"),
    )


PERCENTILES_ORACLE = """
SELECT o_orderstatus,
       count(*) AS n,
       round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
       round(quantile_cont(o_totalprice, 0.50), 4) AS p50,
       round(quantile_cont(o_totalprice, 0.90), 4) AS p90,
       round(quantile_cont(o_totalprice, 0.99), 4) AS p99
FROM orders GROUP BY o_orderstatus
"""


@register(
    "agg_percentiles",
    oracle=PERCENTILES_ORACLE,
    tags=("relational", "aggregate", "percentiles"),
    doc="Exact interpolated multi-percentile profile (p25/p50/p90/p99) "
    "per order status — one `percentile(col, array(...))` aggregate "
    "computes all four in a single pass. At 100 TB the documented "
    "trade is approx_percentile (t-digest, mergeable, fixed memory); "
    "tests/test_registry_gate.py pins the accuracy comparison.",
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    pcts = F.expr(
        "percentile(o_totalprice, array(0.25D, 0.50D, 0.90D, 0.99D))"
    ).alias("ps")
    agged = o.groupBy("o_orderstatus").agg(F.count("*").alias("n"), pcts)
    return agged.select(
        "o_orderstatus",
        "n",
        *[
            F.round(F.element_at("ps", i + 1), 4).alias(name)
            for i, name in enumerate(["p25", "p50", "p90", "p99"])
        ],
    )


# map-typed column surface: the oracle checks SEMANTICS (same scalars
# from the same inputs); map construction/inspection is Spark-side
MAP_OPS_ORACLE = """
SELECT event_id,
       3 AS n_entries,
       'k,kb,sq' AS keys_sorted,
       CAST(k * k AS BIGINT) AS sq_val,
       CAST(k + (k % 10) + k * k AS BIGINT) AS val_sum,
       CAST(CASE WHEN k >= 50 THEN 1 ELSE 0 END
            + CASE WHEN k % 10 >= 50 THEN 1 ELSE 0 END
            + CASE WHEN k * k >= 50 THEN 1 ELSE 0 END AS BIGINT) AS n_big
FROM (
  SELECT event_id,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events
)
"""


@register(
    "map_ops",
    oracle=MAP_OPS_ORACLE,
    tags=("functions", "map"),
    doc="Map-typed column operations: map_from_arrays construction, "
    "map_keys (sorted), element_at lookup, aggregate over map_values, "
    "map_filter count — all codegen expressions over a per-row map "
    "built from the JSON props.",
)
def map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )
    m = F.map_from_arrays(
        F.array(F.lit("k"), F.lit("kb"), F.lit("sq")),
        F.array(F.col("k"), F.col("k") % 10, F.col("k") * F.col("k")),
    )
    withm = ev.withColumn("m", m)
    return withm.select(
        "event_id",
        F.size("m").alias("n_entries"),
        F.array_join(F.array_sort(F.map_keys("m")), ",").alias("keys_sorted"),
        F.element_at("m", F.lit("sq")).alias("sq_val"),
        F.expr("aggregate(map_values(m), 0L, (a, x) -> a + x)").alias("val_sum"),
        F.expr("cast(size(map_filter(m, (kk, v) -> v >= 50)) as bigint)").alias(
            "n_big"
        ),
    )


UNPIVOT_ORACLE = """
WITH p AS (
  SELECT o_orderstatus,
         CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS urgent,
         CAST(sum(CASE WHEN o_orderpriority = '2-HIGH'   THEN 1 ELSE 0 END) AS BIGINT) AS high,
         CAST(sum(CASE WHEN o_orderpriority = '5-LOW'    THEN 1 ELSE 0 END) AS BIGINT) AS low
  FROM orders GROUP BY o_orderstatus
)
SELECT o_orderstatus, priority, n_orders
FROM p UNPIVOT (n_orders FOR priority IN (urgent, high, low))
"""


@register(
    "unpivot_status_priority",
    oracle=UNPIVOT_ORACLE,
    tags=("relational", "unpivot"),
    doc="Unpivot (melt): wide per-priority count columns back to long "
    "(status, priority, n) rows — DataFrame unpivot() vs SQL UNPIVOT. "
    "The inverse of pivot_status_by_priority.",
)
def unpivot_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    wide = o.groupBy("o_orderstatus").agg(
        F.sum((F.col("o_orderpriority") == "1-URGENT").cast("long")).alias("urgent"),
        F.sum((F.col("o_orderpriority") == "2-HIGH").cast("long")).alias("high"),
        F.sum((F.col("o_orderpriority") == "5-LOW").cast("long")).alias("low"),
    )
    return wide.unpivot(
        ["o_orderstatus"], ["urgent", "high", "low"], "priority", "n_orders"
    )
