"""Iterative graph analytics: integer-exact PageRank (round 5).

Third member of the iterative family (k-means: operators/kmeans.py,
connected components: operators/components.py). Classic PageRank sums
doubles in engine-dependent order, so it can't hash-certify; this one
applies the same integer-moment discipline as the IVF quantizer and
events_daily_trend — ranks live on an integer scale (SCALE = 1e12) and
the recurrence

    r'(v) = (15 * (SCALE // N)) // 100
            + sum over in-edges u->v of (85 * r(u)) // (100 * deg(u))

is pure BIGINT arithmetic: floor divisions are deterministic, the sum
is an associative integer aggregate, so the fixed-point values are
bit-identical in any engine and any execution order. (The floors leak
a few units of mass per iteration — documented semantics, not an
approximation bug; the ordering this produces is PageRank's.)

Graph: the part-supplier bipartite graph from lineitem, each distinct
(l_partkey, l_suppkey) pair an undirected edge (two directed edges).
Node ids pack into one BIGINT: part p -> 2p, supplier s -> 2s+1.

Scale shape: each iteration is ONE shuffle — the edge table joins the
(nodes-sized) rank table on src and re-aggregates by dst with map-side
combine; degree is computed once and rides along the edge rows. N and
the teleport constant come from a 1-row broadcast aggregate (the
documented O(1)-row crossJoin idiom), so there is no driver-side
action at all. ITER is fixed (3) so the oracle unrolls exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_distributed_systems_spark.plans.registry import register
from mapreduce_distributed_systems_spark.sources import load_table

PR_SCALE = 10**12
PR_ITER = 3


def _pr_iter_sql(prev: str, cur: str) -> str:
    """One unrolled PageRank step: r_{i+1} from r_i (DuckDB CTE body)."""
    return (
        f"{cur} AS (\n"
        f"  SELECT d.dst AS id,\n"
        f"         CAST((SELECT t FROM tele)\n"
        f"              + sum((85 * r.r) // (100 * d.deg)) AS BIGINT) AS r\n"
        f"  FROM ed d JOIN {prev} r ON r.id = d.src\n"
        f"  GROUP BY d.dst\n"
        f")"
    )


PAGERANK_ORACLE = f"""
WITH e AS (
  SELECT DISTINCT l_partkey * 2 AS a, l_suppkey * 2 + 1 AS b FROM lineitem
),
ed0 AS (
  SELECT a AS src, b AS dst FROM e
  UNION ALL
  SELECT b AS src, a AS dst FROM e
),
deg AS (
  SELECT src, CAST(count(*) AS BIGINT) AS deg FROM ed0 GROUP BY src
),
ed AS (
  SELECT d.src, d.dst, g.deg FROM ed0 d JOIN deg g USING (src)
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM deg),
tele AS (
  SELECT CAST((15 * ({PR_SCALE} // n)) // 100 AS BIGINT) AS t FROM nn
),
r0 AS (
  SELECT src AS id, CAST({PR_SCALE} // (SELECT n FROM nn) AS BIGINT) AS r
  FROM deg
),
{_pr_iter_sql("r0", "r1")},
{_pr_iter_sql("r1", "r2")},
{_pr_iter_sql("r2", "r3")}
SELECT id,
       CASE WHEN id % 2 = 0 THEN 'part' ELSE 'supplier' END AS node_type,
       r AS rank_scaled
FROM r3
"""


@register(
    "graph_pagerank_bipartite",
    oracle=PAGERANK_ORACLE,
    tags=("graph", "iterative", "exact-arithmetic"),
    doc="Integer-exact PageRank over the part-supplier bipartite graph "
    "(3 unrolled iterations, SCALE=1e12): floor-division contributions "
    "and integer sums make every rank value order-independent, hence "
    "hash-certifiable where double PageRank is not. One shuffle per "
    "iteration (edges join ranks on src, re-aggregate by dst, map-side "
    "combined); degree rides on the edge table; N and the teleport "
    "constant are a 1-row broadcast.",
)
def graph_pagerank_bipartite(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    e = li.select(
        (F.col("l_partkey") * 2).alias("a"),
        (F.col("l_suppkey") * 2 + 1).alias("b"),
    ).distinct()
    ed0 = e.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionByName(
        e.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    deg = ed0.groupBy("src").agg(F.count("*").cast("long").alias("deg"))
    ed = ed0.join(deg, "src")
    nn = deg.agg(F.count("*").cast("long").alias("n"))
    consts = nn.select(
        "n",
        F.expr(f"CAST(div(15 * div({PR_SCALE}, n), 100) AS BIGINT)").alias(
            "t"
        ),
    )
    ranks = deg.crossJoin(F.broadcast(consts)).select(
        F.col("src").alias("id"),
        F.expr(f"CAST(div({PR_SCALE}, n) AS BIGINT)").alias("r"),
    )
    for _ in range(PR_ITER):
        msgs = ed.join(ranks.withColumnRenamed("id", "src"), "src").select(
            "dst", F.expr("div(85 * r, 100 * deg)").alias("c")
        )
        ranks = (
            msgs.groupBy("dst")
            .agg(F.sum("c").alias("s"))
            .crossJoin(F.broadcast(consts))
            .select(
                F.col("dst").alias("id"),
                (F.col("t") + F.col("s")).cast("long").alias("r"),
            )
        )
    return ranks.select(
        "id",
        F.when(F.col("id") % 2 == 0, "part").otherwise("supplier").alias(
            "node_type"
        ),
        F.col("r").alias("rank_scaled"),
    )


# ---------------------------------------------------------------------------
# Triangle counting (round 5). The supplier co-purchase graph: two
# suppliers are adjacent iff they supply a common part; a triangle is
# a mutually-adjacent triple. Exact and integer-only, so it
# hash-certifies directly.
#
# Scale shape — the two standard tricks, both load-bearing at 100 TB:
# 1. Projection fan-out is C(k, 2) per part, where k = suppliers per
#    part; k is bounded by the SUPPLIER DIMENSION (not the fact
#    table), and the pair join runs part-local before a distinct on
#    (supplier, supplier) edges.
# 2. Degree ORIENTATION: each undirected edge points low-degree ->
#    high-degree (ties by id), turning triangle enumeration into a
#    join of out-wedges against oriented edges. Every wedge center
#    has out-degree <= O(sqrt(|E|)) in any graph, which is what keeps
#    the wedge join from exploding on hubs — the reason this exact
#    plan (not the naive 3-way self-join) is the production one.
# ---------------------------------------------------------------------------

TRIANGLE_PART_CAP = 256  # max suppliers per part entering the pair join

TRIANGLE_ORACLE = f"""
WITH ps0 AS (
  SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem
),
pk AS (
  SELECT p, count(*) AS k FROM ps0 GROUP BY p
),
ps AS (
  SELECT ps0.p, ps0.s FROM ps0 JOIN pk USING (p)
  WHERE pk.k <= {TRIANGLE_PART_CAP}
),
edges AS (
  SELECT DISTINCT a.s AS u, b.s AS v
  FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s
),
deg AS (
  SELECT u AS node, CAST(count(*) AS BIGINT) AS d
  FROM (SELECT u FROM edges UNION ALL SELECT v FROM edges)
  GROUP BY u
),
oriented AS (
  SELECT CASE WHEN du.d < dv.d OR (du.d = dv.d AND e.u < e.v)
              THEN e.u ELSE e.v END AS src,
         CASE WHEN du.d < dv.d OR (du.d = dv.d AND e.u < e.v)
              THEN e.v ELSE e.u END AS dst
  FROM edges e
  JOIN deg du ON du.node = e.u
  JOIN deg dv ON dv.node = e.v
),
wedges AS (
  SELECT a.src AS c, a.dst AS x, b.dst AS y
  FROM oriented a JOIN oriented b
    ON a.src = b.src AND a.dst < b.dst
),
tri AS (
  SELECT w.c, w.x, w.y
  FROM wedges w JOIN oriented o
    ON ((o.src = w.x AND o.dst = w.y) OR (o.src = w.y AND o.dst = w.x))
)
SELECT CAST(count(*) AS BIGINT) AS n_triangles,
       (SELECT CAST(count(*) AS BIGINT) FROM edges) AS n_edges,
       (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
       (SELECT CAST(count(*) AS BIGINT) FROM pk
        WHERE k > {TRIANGLE_PART_CAP}) AS n_parts_dropped
FROM tri
"""


@register(
    "graph_triangle_count",
    oracle=TRIANGLE_ORACLE,
    tags=("graph", "exact-arithmetic", "capped"),
    doc=f"Triangle count of the supplier co-purchase graph (suppliers "
    "adjacent iff they share a part) — EXACT over the capped "
    "subgraph: parts whose fan-out exceeds the hot-part cap are "
    "excluded from edge formation and counted in n_parts_dropped, so "
    "the arithmetic is integer-exact but the count is scoped to the "
    "kept parts (identical to uncapped at the synthetic SFs, "
    "truncated-but-accounted at scale). Degree-oriented enumeration: "
    "edges point low-degree -> high-degree, out-wedges join against "
    "oriented edges — the out-degree bound O(sqrt(|E|)) per wedge "
    "center is what keeps hubs from exploding the join, which is why "
    "this exact plan (not the naive 3-way self-join) is the one that "
    "survives scale. Orientation bounds the WEDGE join only; the "
    "upstream PROJECTION fans out C(suppliers-per-part, 2) per part, "
    "and one 'the'-like hot part (10^5 suppliers) would explode it "
    "before orientation can help. So hot parts are CAPPED "
    f"(k <= {TRIANGLE_PART_CAP} suppliers, the LSH_BUCKET_CAP "
    "pattern): parts above the cap are excluded from edge formation "
    "and ACCOUNTED in n_parts_dropped — bounded loss, reported, never "
    "silent. At the synthetic SFs max k is ~52, so nothing drops and "
    "the certified count equals the uncapped one; the cap is the "
    "100 TB lever.",
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    ps = li.select(
        F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s")
    ).distinct()
    return triangle_count_projected(ps, part_cap=TRIANGLE_PART_CAP)


def triangle_count_projected(
    ps: DataFrame, part_cap: int = TRIANGLE_PART_CAP
) -> DataFrame:
    """Project (p, s) membership pairs to the s-s co-occurrence graph
    with a per-part fan-out cap, then count triangles. Parts with more
    than `part_cap` members are dropped BEFORE the pair join (their
    C(k, 2) fan-out is the projection's only unbounded term) and
    reported in n_parts_dropped. Exposed separately so unit tests can
    drive a synthetic hot part over the cap."""
    pk = ps.groupBy("p").agg(F.count("*").alias("k"))
    kept = ps.join(
        pk.where(F.col("k") <= part_cap).select("p"), "p", "left_semi"
    )
    n_dropped = pk.where(F.col("k") > part_cap).agg(
        F.count("*").cast("long").alias("n_parts_dropped")
    )
    a = kept.select("p", F.col("s").alias("u"))
    b = kept.select("p", F.col("s").alias("v"))
    edges = (
        a.join(b, "p").where(F.col("u") < F.col("v")).select("u", "v").distinct()
    )
    return triangle_count_edges(edges).crossJoin(F.broadcast(n_dropped))


def triangle_count_edges(edges: DataFrame) -> DataFrame:
    """Degree-oriented triangle enumeration over an undirected edge
    list (columns u < v, already distinct). Exposed separately so the
    unit tests can drive sparse synthetic graphs — the lineitem
    co-purchase projection is complete (every supplier pair shares
    some part) at the synthetic SFs, which exercises the count but
    not the orientation's hub behavior."""
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionByName(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("d"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    fwd = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = (
        edges.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("dst"),
        )
    )
    wa = oriented.select(F.col("src").alias("c"), F.col("dst").alias("x"))
    wb = oriented.select(F.col("src").alias("c"), F.col("dst").alias("y"))
    wedges = wa.join(wb, "c").where(F.col("x") < F.col("y"))
    o2 = oriented.select(F.col("src").alias("x"), F.col("dst").alias("y"))
    # the wedge's closing edge may be oriented either way between x, y
    closed = wedges.join(o2, ["x", "y"], "left_semi").unionByName(
        wedges.join(
            o2.select(F.col("x").alias("y"), F.col("y").alias("x")),
            ["x", "y"],
            "left_semi",
        )
    )
    n_tri = closed.agg(F.count("*").cast("long").alias("n_triangles"))
    n_edges = edges.agg(F.count("*").cast("long").alias("n_edges"))
    n_nodes = deg.agg(F.count("*").cast("long").alias("n_nodes"))
    return n_tri.crossJoin(F.broadcast(n_edges)).crossJoin(
        F.broadcast(n_nodes)
    )
