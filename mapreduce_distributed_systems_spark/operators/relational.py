"""Relational operator inventory over the star schema (SURVEY.md §2.D,
build plan M3).

The reference has NO relational operators beyond
scan→flatMap→partition→group→sort→reduce (SURVEY.md §2.D); this module
supplies the equivalent capability a user of a general engine needs,
all as Catalyst-optimizable DataFrame plans:

- joins: inner multi-way, broadcast dims, left/full outer, semi, anti,
  non-equi as-of;
- aggregation: hash agg, distinct agg, stats, rollup, cube;
- set ops: union/intersect/except (distinct semantics);
- scalar function library: string/date/math/conditional/array.

Scale notes (100 TB): every join below keys on the natural join column
so the shuffle is the minimum required; region/nation are
always-broadcast (5/25 rows at any SF); fact-fact joins
(lineitem⋈orders) shuffle on orderkey — at 1000 executors that is the
intended co-partitioning, and AQE handles skew/coalescing. Filters are
expressed on the scan side so parquet pushdown prunes row groups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_distributed_systems_spark.plans.registry import register
from mapreduce_distributed_systems_spark.sources import load_table, load_tables


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# TPC-H-style multi-way joins + aggregation
# --------------------------------------------------------------------------

Q1_ORACLE = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                                        AS sum_qty,
       round(sum(l_extendedprice), 2)                                   AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 4)                                        AS avg_qty,
       round(avg(l_extendedprice), 4)                                   AS avg_price,
       round(avg(l_discount), 4)                                        AS avg_disc,
       count(*)                                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


@register(
    "q1_pricing_summary",
    oracle=Q1_ORACLE,
    tags=("relational", "aggregate"),
    bench=True,
    doc="TPC-H Q1-style pricing summary: scan-side filter + hash agg.",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc), 2).alias("sum_disc_price"),
            F.round(F.sum(disc * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


Q3_ORACLE = """
SELECT o_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate  > TIMESTAMP '1998-01-01'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


@register(
    "q3_shipping_priority",
    oracle=Q3_ORACLE,
    tags=("relational", "join", "topk"),
    bench=True,
    doc="TPC-H Q3-style: 3-way join + agg + deterministic top-10.",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


Q5_ORACLE = """
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY n_name
"""


@register(
    "q5_local_supplier",
    oracle=Q5_ORACLE,
    tags=("relational", "join"),
    bench=True,
    doc="TPC-H Q5-style 6-way join; nation/region explicitly broadcast.",
)
def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    region = F.broadcast(_t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(nation, supp.s_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


# --------------------------------------------------------------------------
# Outer / semi / anti / as-of joins
# --------------------------------------------------------------------------

LEFT_OUTER_ORACLE = """
SELECT c_custkey, c_name, count(o_orderkey) AS n_orders,
       round(coalesce(sum(o_totalprice), 0), 2) AS total_spent
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_name
"""


@register(
    "join_left_outer",
    oracle=LEFT_OUTER_ORACLE,
    tags=("relational", "join"),
    doc="Left outer join preserving customers with zero orders.",
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias(
                "total_spent"
            ),
        )
    )


FULL_OUTER_ORACLE = """
WITH c AS (SELECT c_nationkey AS nk, count(*) AS n_cust FROM customer GROUP BY 1),
     s AS (SELECT s_nationkey AS nk, count(*) AS n_supp FROM supplier GROUP BY 1)
SELECT coalesce(c.nk, s.nk) AS nationkey,
       coalesce(n_cust, 0) AS n_cust,
       coalesce(n_supp, 0) AS n_supp
FROM c FULL OUTER JOIN s ON c.nk = s.nk
"""


@register(
    "join_full_outer",
    oracle=FULL_OUTER_ORACLE,
    tags=("relational", "join"),
    doc="Full outer join of per-nation customer vs supplier counts.",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        _t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count("*").alias("n_cust"))
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count("*").alias("n_supp"))
    )
    return c.join(s, "nk", "full").select(
        F.col("nk").alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


SEMI_ORACLE = """
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
)
"""


@register(
    "join_semi_customers",
    oracle=SEMI_ORACLE,
    tags=("relational", "join", "semi"),
    doc="Left-semi join: customers with at least one 400k+ order.",
)
def join_semi_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    big = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 400000)
    return cust.join(
        big, cust.c_custkey == big.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


ANTI_ORACLE = """
SELECT p_partkey, p_name FROM part p
WHERE NOT EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_partkey = p.p_partkey AND l.l_quantity > 45
)
"""


@register(
    "join_anti_parts",
    oracle=ANTI_ORACLE,
    tags=("relational", "join", "anti"),
    doc="Left-anti join: parts never ordered in bulk (qty > 45).",
)
def join_anti_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    bulk = _t(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 45)
    return part.join(bulk, part.p_partkey == bulk.l_partkey, "left_anti").select(
        "p_partkey", "p_name"
    )


ASOF_ORACLE = """
SELECT p.event_id,
       (SELECT max(v.ts) FROM events v
        WHERE v.user_id = p.user_id AND v.event_type = 'view' AND v.ts <= p.ts
       ) AS last_view_ts
FROM events p WHERE p.event_type = 'purchase'
"""


@register(
    "asof_purchase_view",
    oracle=ASOF_ORACLE,
    tags=("relational", "join", "asof"),
    doc="As-of (non-equi) join: latest prior view per purchase, per user.",
)
def asof_purchase_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join via union + running max over an event-time window —
    a single shuffle on user_id, no correlated subquery / broadcast
    needed, which is the formulation that survives 100 TB (the naive
    conditional join is O(views×purchases) per user)."""
    ev = _t(spark, sf_dir, "events")
    from pyspark.sql import Window as W

    tagged = ev.where(F.col("event_type").isin("purchase", "view")).select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.when(F.col("event_type") == "view", F.col("ts")).alias("view_ts"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("event_id"))
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        tagged.withColumn("last_view_ts", F.max("view_ts").over(w))
        .where(F.col("event_type") == "purchase")
        .select("event_id", "last_view_ts")
    )


# --------------------------------------------------------------------------
# Aggregations: distinct, stats, rollup, cube
# --------------------------------------------------------------------------

AGG_DISTINCT_ORACLE = """
SELECT o_orderpriority,
       count(*) AS n_orders,
       count(DISTINCT o_custkey) AS n_customers,
       round(sum(o_totalprice), 2) AS total,
       min(o_orderdate) AS first_order,
       max(o_orderdate) AS last_order
FROM orders GROUP BY o_orderpriority
"""


@register(
    "agg_distinct_priority",
    oracle=AGG_DISTINCT_ORACLE,
    tags=("relational", "aggregate", "distinct"),
    doc="Hash aggregate with a distinct aggregate (expand + two-phase agg).",
)
def agg_distinct_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
            F.min("o_orderdate").alias("first_order"),
            F.max("o_orderdate").alias("last_order"),
        )
    )


AGG_STATS_ORACLE = """
SELECT c_mktsegment,
       count(*) AS n,
       round(avg(c_acctbal), 4) AS avg_bal,
       round(stddev_samp(c_acctbal), 4) AS sd_bal,
       round(min(c_acctbal), 2) AS min_bal,
       round(max(c_acctbal), 2) AS max_bal,
       round(quantile_cont(c_acctbal, 0.5), 4) AS median_bal
FROM customer GROUP BY c_mktsegment
"""


@register(
    "agg_stats_segment",
    oracle=AGG_STATS_ORACLE,
    tags=("relational", "aggregate", "stats"),
    doc="Statistical aggregates incl. exact interpolated median.",
)
def agg_stats_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("c_acctbal"), 4).alias("avg_bal"),
            F.round(F.stddev_samp("c_acctbal"), 4).alias("sd_bal"),
            F.round(F.min("c_acctbal"), 2).alias("min_bal"),
            F.round(F.max("c_acctbal"), 2).alias("max_bal"),
            F.round(F.expr("percentile(c_acctbal, 0.5)"), 4).alias("median_bal"),
        )
    )


ROLLUP_ORACLE = """
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n, round(sum(o_totalprice), 2) AS total
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


@register(
    "rollup_status_priority",
    oracle=ROLLUP_ORACLE,
    tags=("relational", "aggregate", "rollup"),
    doc="ROLLUP grouping sets incl. grand total.",
)
def rollup_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
    )


CUBE_ORACLE = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


@register(
    "cube_returnflag_linestatus",
    oracle=CUBE_ORACLE,
    tags=("relational", "aggregate", "cube"),
    doc="CUBE grouping sets over lineitem flags.",
)
def cube_returnflag_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count("*").alias("n"))
    )


# --------------------------------------------------------------------------
# Set operations (distinct semantics, matching SQL UNION/INTERSECT/EXCEPT)
# --------------------------------------------------------------------------

SET_UNION_ORACLE = """
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
UNION
SELECT c_custkey FROM customer WHERE c_acctbal > 8000
"""

SET_INTERSECT_ORACLE = """
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
INTERSECT
SELECT c_custkey FROM customer WHERE c_acctbal > 8000
"""

SET_EXCEPT_ORACLE = """
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
EXCEPT
SELECT c_custkey FROM customer WHERE c_acctbal > 8000
"""


def _set_sides(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    cust = _t(spark, sf_dir, "customer")
    return (
        cust.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey"),
        cust.where(F.col("c_acctbal") > 8000).select("c_custkey"),
    )


@register("set_union", oracle=SET_UNION_ORACLE, tags=("relational", "set"),
          doc="UNION (distinct).")
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _set_sides(spark, sf_dir)
    return a.union(b).distinct()


@register("set_intersect", oracle=SET_INTERSECT_ORACLE, tags=("relational", "set"),
          doc="INTERSECT.")
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _set_sides(spark, sf_dir)
    return a.intersect(b)


@register("set_except", oracle=SET_EXCEPT_ORACLE, tags=("relational", "set"),
          doc="EXCEPT.")
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _set_sides(spark, sf_dir)
    return a.exceptAll(b).distinct()


# --------------------------------------------------------------------------
# Scalar function library (string / date / math / conditional / array)
# --------------------------------------------------------------------------

SCALAR_ORACLE = """
SELECT o_orderkey,
       upper(substring(o_orderpriority, 3)) AS prio_name,
       concat(o_orderstatus, '-', substring(o_orderpriority, 1, 1)) AS status_code,
       CAST(length(o_orderpriority) AS BIGINT) AS prio_len,
       CAST(year(o_orderdate) AS BIGINT) AS y,
       CAST(month(o_orderdate) AS BIGINT) AS m,
       CAST(day(o_orderdate) AS BIGINT) AS d,
       (o_orderdate::DATE + 30) AS due_date,
       CAST(DATE '2002-01-01' - o_orderdate::DATE AS BIGINT) AS days_to_2002,
       round(o_totalprice / 7, 3) AS price_div,
       CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
       round(sqrt(o_totalprice), 6) AS price_sqrt,
       o_orderkey % 7 AS key_mod,
       CASE WHEN o_totalprice < 100000 THEN 'low'
            WHEN o_totalprice < 250000 THEN 'mid'
            ELSE 'high' END AS price_band,
       coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status_decoded
FROM orders
"""


@register(
    "scalar_funcs",
    oracle=SCALAR_ORACLE,
    tags=("relational", "scalar"),
    doc="Scalar string/date/math/conditional functions, whole-stage-codegen'd.",
)
def scalar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        F.upper(F.expr("substring(o_orderpriority, 3)")).alias("prio_name"),
        F.concat(
            F.col("o_orderstatus"), F.lit("-"), F.substring("o_orderpriority", 1, 1)
        ).alias("status_code"),
        F.length("o_orderpriority").cast("long").alias("prio_len"),
        F.year("o_orderdate").cast("long").alias("y"),
        F.month("o_orderdate").cast("long").alias("m"),
        F.dayofmonth("o_orderdate").cast("long").alias("d"),
        F.date_add(d, 30).alias("due_date"),
        F.datediff(F.lit("2002-01-01").cast("date"), d).cast("long").alias("days_to_2002"),
        F.round(F.col("o_totalprice") / 7, 3).alias("price_div"),
        F.floor("o_totalprice").cast("bigint").alias("price_floor"),
        F.round(F.sqrt("o_totalprice"), 6).alias("price_sqrt"),
        (F.col("o_orderkey") % 7).alias("key_mod"),
        F.when(F.col("o_totalprice") < 100000, "low")
        .when(F.col("o_totalprice") < 250000, "mid")
        .otherwise("high")
        .alias("price_band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING")).alias(
            "status_decoded"
        ),
    )


ARRAY_ORACLE = """
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
       toks[1] AS first_tok,
       toks[-1] AS last_tok,
       list_contains(toks, 'the') AS has_the,
       array_to_string(list_sort(list_distinct(toks))[1:5], ',') AS first5_sorted
FROM (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '[^\\p{L}]+'), x -> x <> '') AS toks
  FROM documents
)
"""


@register(
    "array_ops",
    oracle=ARRAY_ORACLE,
    tags=("relational", "array"),
    doc="Array functions: size/distinct/indexing/contains/sort/slice/join.",
)
def array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce_distributed_systems_spark.functions.text import words

    # materialize the token array once (see text_analysis.text_quality)
    docs = _t(spark, sf_dir, "documents").withColumn("toks", words("text"))
    toks = F.col("toks")
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
        F.element_at(toks, 1).alias("first_tok"),
        F.element_at(toks, -1).alias("last_tok"),
        F.array_contains(toks, "the").alias("has_the"),
        F.concat_ws(",", F.slice(F.array_sort(F.array_distinct(toks)), 1, 5)).alias(
            "first5_sorted"
        ),
    )


# --------------------------------------------------------------------------
# Pivot / grouping sets / skew-salted aggregation / bag set ops
# --------------------------------------------------------------------------

PIVOT_ORACLE = """
SELECT o_orderpriority,
       round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2) AS O,
       round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2) AS F,
       round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2) AS P
FROM orders GROUP BY o_orderpriority
"""


@register(
    "pivot_status_by_priority",
    oracle=PIVOT_ORACLE,
    tags=("relational", "pivot"),
    doc="Pivot order status into columns (explicit value list keeps the "
    "schema static — required for both scale and oracle parity).",
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.round(F.sum("o_totalprice"), 2))
    )


GROUPING_SETS_ORACLE = """
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n, round(sum(o_totalprice), 2) AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


@register(
    "grouping_sets_orders",
    oracle=GROUPING_SETS_ORACLE,
    tags=("relational", "aggregate", "grouping-sets"),
    doc="Explicit GROUPING SETS via the SQL API (same Catalyst Expand "
    "operator as rollup/cube).",
)
def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    return spark.sql(GROUPING_SETS_ORACLE)


SALTED_ORACLE = """
SELECT user_id, count(*) AS n_events, round(sum(value), 2) AS total_value
FROM events GROUP BY user_id
"""


@register(
    "skew_salted_agg",
    oracle=SALTED_ORACLE,
    tags=("relational", "aggregate", "skew"),
    doc="Skew-safe aggregation: explicit salt -> two-phase agg. Same "
    "result as the plain groupBy (the oracle); the salted plan bounds "
    "any single reducer's share of a hot key to 1/N_SALT.",
)
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    n_salt = 8
    ev = _t(spark, sf_dir, "events")
    partial = (
        ev.withColumn("salt", (F.col("event_id") % n_salt))
        .groupBy("user_id", "salt")
        .agg(F.count("*").alias("pn"), F.sum("value").alias("pv"))
    )
    return partial.groupBy("user_id").agg(
        F.sum("pn").alias("n_events"),
        F.round(F.sum("pv"), 2).alias("total_value"),
    )


SET_EXCEPT_ALL_ORACLE = """
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
EXCEPT ALL
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
"""


@register(
    "set_except_all",
    oracle=SET_EXCEPT_ALL_ORACLE,
    tags=("relational", "set"),
    doc="EXCEPT ALL (bag semantics — multiplicity-aware difference).",
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderstatus") == "O").select("o_custkey")
    b = o.where(F.col("o_orderstatus") == "F").select("o_custkey")
    return a.exceptAll(b)


SET_INTERSECT_ALL_ORACLE = """
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
INTERSECT ALL
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
"""


@register(
    "set_intersect_all",
    oracle=SET_INTERSECT_ALL_ORACLE,
    tags=("relational", "set"),
    doc="INTERSECT ALL (bag semantics).",
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderstatus") == "O").select("o_custkey")
    b = o.where(F.col("o_orderstatus") == "F").select("o_custkey")
    return a.intersectAll(b)


MAXBY_ORACLE = """
SELECT c_mktsegment,
       max_by(c_custkey, CAST(round(c_acctbal * 100) AS BIGINT) * 1000000 + c_custkey)
         AS top_customer,
       min_by(c_custkey, CAST(round(c_acctbal * 100) AS BIGINT) * 1000000 + c_custkey)
         AS bottom_customer,
       round(max(c_acctbal), 2) AS top_bal
FROM customer GROUP BY c_mktsegment
"""


@register(
    "agg_max_by",
    oracle=MAXBY_ORACLE,
    tags=("relational", "aggregate", "argmax"),
    doc="max_by/min_by argmax aggregates — per-group top-1 WITHOUT a "
    "window (single agg pass; ties broken via a composite bigint key "
    "so both engines pick the same row).",
)
def agg_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    ord_key = F.expr(
        "cast(round(c_acctbal * 100) as bigint) * 1000000 + c_custkey"
    )
    return c.groupBy("c_mktsegment").agg(
        F.max_by("c_custkey", ord_key).alias("top_customer"),
        F.min_by("c_custkey", ord_key).alias("bottom_customer"),
        F.round(F.max("c_acctbal"), 2).alias("top_bal"),
    )


SALTED_JOIN_ORACLE = """
SELECT o_orderstatus,
       count(*) AS n_items,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderstatus
"""


@register(
    "skew_salted_join",
    oracle=SALTED_JOIN_ORACLE,
    tags=("relational", "join", "skew"),
    doc="Skew-safe JOIN pattern: the big (skewed) side gets a random-"
    "free deterministic salt, the small side is replicated once per "
    "salt value, and the join key becomes (key, salt) — a hot key's "
    "rows spread over N_SALT reducers instead of one straggler. "
    "Result is identical to the plain join (the oracle). AQE skew "
    "splitting does this adaptively; the explicit form is for when "
    "stats arrive too late or the key is pathological.",
)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    n_salt = 8
    li = _t(spark, sf_dir, "lineitem").withColumn(
        "salt", (F.col("l_linenumber") % n_salt)
    )
    o = _t(spark, sf_dir, "orders").crossJoin(
        spark.range(n_salt).select(F.col("id").cast("int").alias("salt"))
    )
    joined = li.join(
        o,
        (li.l_orderkey == o.o_orderkey) & (li.salt == o.salt),
    )
    return joined.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_items"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
    )
