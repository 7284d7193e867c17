"""TPC-H coverage completion: the remaining standard query shapes
(Q7, Q8, Q9, Q12, Q13, Q15, Q16, Q17, Q20, Q21) over the driver's
star schema. The testdata has no `partsupp` table and no
commit/receipt dates, so the queries that need them are FAITHFULLY
ADAPTED (same operator shape, different column bindings), each noted
in its docstring:

- Q9  cost side: 0.6 * p_retailprice * l_quantity stands in for
  ps_supplycost * l_quantity;
- Q12 lateness: l_shipdate > o_orderdate + 90 days stands in for the
  receipt/commit comparison, bucketed by order priority;
- Q16 part-supplier relation: DISTINCT (l_partkey, l_suppkey) pairs
  from lineitem stand in for partsupp;
- Q20 availability: a supplier's 1997 shipped quantity per part vs
  half the part's total stands in for ps_availqty vs half demand;
- Q21 waiting: late = shipped > 60 days after order date; the EXISTS /
  NOT EXISTS pair over other suppliers' lines is the standard shape.

Scale notes: every dimension join (nation, region, supplier at this
schema's cardinality) is broadcast; fact-fact joins shuffle on the
join key only after filters are pushed to the scan; Q21's double
correlated EXISTS compiles to one semi + one anti join over a shared
late-lines projection, not nested loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_distributed_systems_spark.plans.registry import register
from mapreduce_distributed_systems_spark.sources import load_table

def _rev() -> F.Column:
    # built lazily: column construction needs an active SparkContext
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Q7 — volume shipping between two nations, by direction and year
# --------------------------------------------------------------------------

Q7_ORACLE = """
SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
FROM (
  SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
         CAST(year(l_shipdate) AS BIGINT) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation ns ON s_nationkey = ns.n_nationkey
  JOIN nation nc ON c_nationkey = nc.n_nationkey
  WHERE ((ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
      OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1'))
    AND l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1998-01-01'
)
GROUP BY supp_nation, cust_nation, l_year
"""


@register(
    "q7_volume_shipping",
    oracle=Q7_ORACLE,
    tags=("relational", "join", "multi-dim"),
    doc="TPC-H Q7: bidirectional nation-pair trade volume by ship year "
    "(two roles of the same dimension, both broadcast).",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    ns = F.broadcast(
        _t(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
        )
    )
    nc = F.broadcast(
        _t(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("nc_key"), F.col("n_name").alias("cust_nation")
        )
    )
    j = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(ns, F.col("s_nationkey") == F.col("ns_key"))
        .join(nc, F.col("c_nationkey") == F.col("nc_key"))
        .where(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        j.select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
            _rev().alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum("volume"), 2).alias("revenue"))
    )


# --------------------------------------------------------------------------
# Q8 — national market share inside a region for one part type
# --------------------------------------------------------------------------

Q8_ORACLE = """
SELECT o_year,
       round(sum(CASE WHEN nation = 'NATION_2' THEN volume ELSE 0 END)
             / sum(volume), 4) AS mkt_share
FROM (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n2.n_name AS nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region   ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
    AND o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate <  TIMESTAMP '1998-01-01'
)
GROUP BY o_year
"""


@register(
    "q8_market_share",
    oracle=Q8_ORACLE,
    tags=("relational", "join", "conditional-agg"),
    doc="TPC-H Q8: one nation's share of a region's ECONOMY-part revenue "
    "per order year (8-table join, conditional-sum ratio).",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    j = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
    )
    vol = j.select(
        F.year("o_orderdate").cast("long").alias("o_year"),
        _rev().alias("volume"),
        "nation",
    )
    return vol.groupBy("o_year").agg(
        F.round(
            F.sum(F.when(F.col("nation") == "NATION_2", F.col("volume")).otherwise(0.0))
            / F.sum("volume"),
            4,
        ).alias("mkt_share")
    )


# --------------------------------------------------------------------------
# Q9 — product-type profit by supplier nation and year (adapted cost)
# --------------------------------------------------------------------------

# profit is summed in integer cents: amounts mix signs, so a plain
# double sum is summation-order-sensitive at the 2-decimal boundary
# (Spark and DuckDB reduce in different orders); integer addition is
# exact and order-independent.
Q9_ORACLE = """
SELECT nation, o_year,
       round(CAST(sum(amount_cents) AS DOUBLE) / 100.0, 2) AS sum_profit
FROM (
  SELECT n_name AS nation,
         CAST(year(o_orderdate) AS BIGINT) AS o_year,
         CAST(round((l_extendedprice * (1 - l_discount)
           - 0.6 * p_retailprice * l_quantity) * 100, 0) AS BIGINT)
           AS amount_cents
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE p_name LIKE '%gear%'
)
GROUP BY nation, o_year
"""


@register(
    "q9_product_profit",
    oracle=Q9_ORACLE,
    tags=("relational", "join", "multi-dim"),
    doc="TPC-H Q9 (adapted: no partsupp in the schema, so cost = 0.6 * "
    "p_retailprice * l_quantity stands in for ps_supplycost * "
    "l_quantity): profit on '%gear%' parts by supplier nation and year.",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").where(F.col("p_name").like("%gear%"))
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    amount = _rev() - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
    j = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return (
        j.select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            # integer cents: order-independent exact sum (see oracle note)
            F.round(amount * 100, 0).cast("long").alias("amount_cents"),
        )
        .groupBy("nation", "o_year")
        .agg(
            F.round(F.sum("amount_cents").cast("double") / 100.0, 2).alias(
                "sum_profit"
            )
        )
    )


# --------------------------------------------------------------------------
# Q12 — shipping lateness by priority class (adapted: no ship mode)
# --------------------------------------------------------------------------

Q12_ORACLE = """
SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
            THEN 'high' ELSE 'low' END AS prio_class,
       count(*) AS n_items,
       CAST(sum(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_late
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY prio_class
"""


@register(
    "q12_ship_priority",
    oracle=Q12_ORACLE,
    tags=("relational", "join", "conditional-agg"),
    doc="TPC-H Q12 (adapted: lateness = shipped > 90 days after order "
    "date, standing in for the receipt/commit comparison; bucketed by "
    "priority class instead of the absent ship mode).",
)
def q12_ship_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    late = (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    ).cast("long")
    prio_class = F.when(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "high"
    ).otherwise("low")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(prio_class.alias("prio_class"), late.alias("late"))
        .groupBy("prio_class")
        .agg(F.count("*").alias("n_items"), F.sum("late").alias("n_late"))
    )


# --------------------------------------------------------------------------
# Q13 — distribution of orders per customer (left join + double group)
# --------------------------------------------------------------------------

Q13_ORACLE = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
  GROUP BY c_custkey
)
GROUP BY c_count
"""


@register(
    "q13_customer_distribution",
    oracle=Q13_ORACLE,
    tags=("relational", "join", "outer", "histogram"),
    doc="TPC-H Q13: orders-per-customer histogram — left outer join with "
    "an extra join-side predicate, then a second aggregation over the "
    "first's results (customers with zero orders stay, count = 0).",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "5-LOW"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


# --------------------------------------------------------------------------
# Q15 — top supplier by quarterly revenue (scalar-max join-back)
# --------------------------------------------------------------------------

Q15_ORACLE = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
"""


@register(
    "q15_top_supplier",
    oracle=Q15_ORACLE,
    tags=("relational", "subquery", "scalar-max"),
    doc="TPC-H Q15: quarterly revenue per supplier, keep the max via a "
    "scalar-subquery join-back (broadcast 1-row max, no window).",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(_rev()), 2).alias("total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    s = _t(spark, sf_dir, "supplier")
    return (
        revenue.join(F.broadcast(mx), F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# --------------------------------------------------------------------------
# Q16 — supplier count per part group (adapted part-supplier relation)
# --------------------------------------------------------------------------

Q16_ORACLE = """
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#3' AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
GROUP BY p_brand, p_type, p_size
"""


@register(
    "q16_part_supplier_cnt",
    oracle=Q16_ORACLE,
    tags=("relational", "distinct-agg"),
    doc="TPC-H Q16 (adapted: DISTINCT (l_partkey, l_suppkey) pairs from "
    "lineitem stand in for the absent partsupp table): distinct "
    "supplier count per (brand, type, size) group with exclusions.",
)
def q16_part_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = (
        _t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    p = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#3")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    )
    return (
        ps.join(F.broadcast(p), ps.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


# --------------------------------------------------------------------------
# Q17 — small-quantity order revenue (per-part average threshold)
# --------------------------------------------------------------------------

Q17_ORACLE = """
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly,
       count(*) AS n_items
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#5'
  AND l_quantity < (
    SELECT 0.5 * avg(l_quantity) FROM lineitem l2
    WHERE l2.l_partkey = lineitem.l_partkey
  )
"""


@register(
    "q17_small_qty_revenue",
    oracle=Q17_ORACLE,
    tags=("relational", "subquery", "correlated"),
    doc="TPC-H Q17: lines below half their part's average quantity — the "
    "correlated scalar subquery becomes a per-part aggregate joined "
    "back (one shuffle on partkey, reused by both sides).",
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#5")
    avg_q = li.groupBy(F.col("l_partkey").alias("ap_key")).agg(
        (0.5 * F.avg("l_quantity")).alias("half_avg")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(avg_q, li.l_partkey == F.col("ap_key"))
        .where(F.col("l_quantity") < F.col("half_avg"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count("*").alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
# Q20 — excess suppliers for a part type (adapted availability)
# --------------------------------------------------------------------------

Q20_ORACLE = """
WITH shipped AS (
  SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1998-01-01'
  GROUP BY l_partkey, l_suppkey
),
tot AS (SELECT l_partkey, sum(qty) AS tq FROM shipped GROUP BY l_partkey)
SELECT DISTINCT s_suppkey, s_name
FROM shipped
JOIN tot USING (l_partkey)
JOIN part ON p_partkey = l_partkey AND p_type = 'SMALL'
JOIN supplier ON s_suppkey = l_suppkey
WHERE qty > 0.5 * tq
"""


@register(
    "q20_excess_suppliers",
    oracle=Q20_ORACLE,
    tags=("relational", "join", "threshold"),
    doc="TPC-H Q20 (adapted: a supplier's 1997 shipped quantity per part "
    "vs half the part's total stands in for ps_availqty vs half "
    "demand): suppliers dominating supply of any SMALL-type part.",
)
def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    shipped = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("qty")
    )
    tot = shipped.groupBy("l_partkey").agg(F.sum("qty").alias("tq"))
    p = _t(spark, sf_dir, "part").where(F.col("p_type") == "SMALL")
    s = _t(spark, sf_dir, "supplier")
    return (
        shipped.join(tot, "l_partkey")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .where(F.col("qty") > 0.5 * F.col("tq"))
        .select("s_suppkey", "s_name")
        .distinct()
    )


# --------------------------------------------------------------------------
# Q21 — suppliers who kept multi-supplier orders waiting
# --------------------------------------------------------------------------

LATE_DAYS = 60

Q21_ORACLE = f"""
SELECT s_name, count(*) AS numwait
FROM supplier, lineitem l1, orders
WHERE s_suppkey = l1.l_suppkey
  AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL {LATE_DAYS} DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o_orderdate + INTERVAL {LATE_DAYS} DAY
  )
GROUP BY s_name
"""


@register(
    "q21_waiting_suppliers",
    oracle=Q21_ORACLE,
    tags=("relational", "semi", "anti", "correlated"),
    doc="TPC-H Q21 (adapted: late = shipped > 60 days after order date, "
    "standing in for receipt > commit): sole-late suppliers on "
    "multi-supplier finished orders. The EXISTS / NOT EXISTS pair "
    "compiles to one left-semi + one left-anti join over a shared "
    "late-lines projection.",
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    lined = li.join(o, li.l_orderkey == o.o_orderkey)
    late_rows = lined.where(
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr(f"INTERVAL {LATE_DAYS} DAYS")
    ).select("l_orderkey", "l_suppkey")
    late_pairs = late_rows.distinct()
    all_pairs = li.select("l_orderkey", "l_suppkey").distinct()

    a = late_rows.alias("a")
    exists_other = a.join(
        all_pairs.alias("m"),
        (F.col("a.l_orderkey") == F.col("m.l_orderkey"))
        & (F.col("a.l_suppkey") != F.col("m.l_suppkey")),
        "left_semi",
    )
    blamed = exists_other.alias("a").join(
        late_pairs.alias("b"),
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_suppkey") != F.col("b.l_suppkey")),
        "left_anti",
    )
    s = _t(spark, sf_dir, "supplier")
    return (
        blamed.join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


# --------------------------------------------------------------------------
# Q2 — minimum-cost supplier (adapted supply cost)
# --------------------------------------------------------------------------

Q2_ORACLE = """
WITH ps AS (
  SELECT l_partkey, l_suppkey,
         min(l_extendedprice / l_quantity) AS cost
  FROM lineitem GROUP BY l_partkey, l_suppkey
),
rps AS (
  SELECT l_partkey, l_suppkey, cost, s_acctbal, s_name, n_name
  FROM ps
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  JOIN region ON r_regionkey = n_regionkey AND r_name = 'ASIA'
)
SELECT round(s_acctbal, 2) AS s_acctbal, s_name, n_name, p_partkey,
       floor(cost * 100 + 0.5) / 100 AS supply_cost
FROM rps
JOIN part ON p_partkey = l_partkey
WHERE p_type = 'LARGE'
  AND cost = (
    SELECT min(cost) FROM rps r2 WHERE r2.l_partkey = rps.l_partkey
  )
"""


@register(
    "q2_min_cost_supplier",
    oracle=Q2_ORACLE,
    tags=("relational", "subquery", "correlated", "argmin"),
    doc="TPC-H Q2 (adapted: a (part, supplier)'s observed minimum unit "
    "price min(l_extendedprice / l_quantity) from lineitem stands in "
    "for ps_supplycost): for every LARGE-type part, the ASIA-region "
    "supplier(s) offering it at the region-wide minimum cost. The "
    "correlated scalar-min subquery becomes a per-part min aggregate "
    "joined back on (partkey, cost) — one shuffle on partkey shared "
    "by both sides; region/nation/supplier/part dims all broadcast. "
    "min() is selection (order-independent) and the per-row division "
    "is identical IEEE arithmetic in both engines, so the cost "
    "equality join is exact. The emitted cost is 2-decimal-ized with "
    "floor(x*100 + 0.5)/100 — pure IEEE ops on bit-identical inputs — "
    "rather than round(): quotients of 2-decimal prices by small "
    "quantities routinely land on exact decimal half-boundaries, where "
    "Spark (rounds the double's shortest decimal string) and DuckDB "
    "(rounds the binary value) disagree.",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("cost")
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    rps = (
        ps.join(F.broadcast(s), ps.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .select("l_partkey", "cost", "s_acctbal", "s_name", "n_name")
    )
    min_cost = rps.groupBy(F.col("l_partkey").alias("mk")).agg(
        F.min("cost").alias("mc")
    )
    p = _t(spark, sf_dir, "part").where(F.col("p_type") == "LARGE")
    return (
        rps.join(
            min_cost,
            (rps.l_partkey == F.col("mk")) & (rps.cost == F.col("mc")),
        )
        .join(F.broadcast(p), rps.l_partkey == p.p_partkey)
        .select(
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            (F.floor(F.col("cost") * 100 + 0.5) / 100).alias("supply_cost"),
        )
    )


# --------------------------------------------------------------------------
# Q11 — important stock identification (adapted inventory value)
# --------------------------------------------------------------------------

Q11_ORACLE = """
WITH val AS (
  SELECT l_partkey,
         CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                       AS BIGINT)) AS BIGINT) AS pv_cents
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  JOIN region ON r_regionkey = n_regionkey AND r_name = 'EUROPE'
  GROUP BY l_partkey
)
SELECT l_partkey, pv_cents / 100.0 AS part_value
FROM val
WHERE 2 * pv_cents * (SELECT count(*) FROM val)
      > 3 * (SELECT CAST(sum(pv_cents) AS BIGINT) FROM val)
"""


@register(
    "q11_important_stock",
    oracle=Q11_ORACLE,
    tags=("relational", "subquery", "scalar-agg", "exact-arithmetic"),
    doc="TPC-H Q11 (adapted: per-part revenue supplied through "
    "EUROPE-region suppliers stands in for ps_supplycost * "
    "ps_availqty, and the threshold is 1.5x the average part value — "
    "scale-free where the original's FRACTION hardcodes 1/SF): parts "
    "whose supplied value exceeds 1.5x the mean. Integer-cents "
    "discipline (the events_daily_trend pattern): each lineitem term "
    "is rounded to cents per ROW (deterministic — the product of two "
    "doubles is bit-identical in both engines), per-part values are "
    "exact BIGINT sums, and the threshold compare is the cross-"
    "multiplied integer inequality 2*n*pv > 3*sum(pv) — no double "
    "average is ever formed, so summation order cannot flip a "
    "borderline part in either engine. The scalar (sum, count) "
    "aggregate broadcasts as a 1-row join.",
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    val = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .groupBy("l_partkey")
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                ).cast("long")
            )
            .cast("long")
            .alias("pv_cents")
        )
    )
    thresh = val.agg(
        F.sum("pv_cents").cast("long").alias("tot"),
        F.count("*").cast("long").alias("n"),
    )
    return (
        val.join(
            F.broadcast(thresh),
            F.col("pv_cents") * 2 * F.col("n") > F.col("tot") * 3,
        )
        .select("l_partkey", (F.col("pv_cents") / 100.0).alias("part_value"))
    )
