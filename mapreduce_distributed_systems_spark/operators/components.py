"""Near-duplicate CLUSTERING: connected components over the
SimHash64 near-dup pair graph — the step that turns pairwise matches
into dedup groups (keep one doc per component). The canonical label
is the component's minimum doc_id.

Spark side: iterative min-label propagation (driver loop over
DataFrame steps, like k-means): each round every node takes the min
of its own label and its neighbors' labels; converged when no label
changes. Rounds needed = graph diameter — near-dup components are
tiny cliques/chains, so this converges in 2-3 rounds.

Oracle: DuckDB recursive CTE computing min reachable node per doc —
an independent formulation of the same fixpoint.

Scale design (100 TB): each round is one shuffle (edge join + min
aggregate); the edge list is the LSH/SimHash candidate output, which
is orders of magnitude smaller than the corpus. For adversarial
diameters the production upgrade is the large-star/small-star
algorithm (same join primitive, O(log n) rounds); plain propagation
is exact and sufficient for near-dup cliques.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_distributed_systems_spark.operators.simhash64 import (
    SIMHASH64_ORACLE,
    dedup_simhash64,
)
from mapreduce_distributed_systems_spark.plans.registry import register

MAX_ROUNDS = 12

# CTE chain shared by the components query and its consumers
# (dedup_canonical_pick): pairs -> symmetric edges -> recursive
# closure -> comp(doc_id, cluster_id).
_CLUSTER_CTES = f"""
WITH RECURSIVE pairs AS ({SIMHASH64_ORACLE}),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION
  SELECT doc_b AS a, doc_a AS b FROM pairs
),
nodes AS (SELECT DISTINCT a AS doc_id FROM edges),
reach(src, dst) AS (
  SELECT doc_id, doc_id FROM nodes
  UNION
  SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.dst
),
comp AS (
  SELECT src AS doc_id, min(dst) AS cluster_id
  FROM reach GROUP BY src
)"""

CLUSTER_ORACLE = _CLUSTER_CTES + """
SELECT doc_id, cluster_id FROM comp
"""


def connected_components(pairs: DataFrame) -> DataFrame:
    """(doc_id, cluster_id = min doc_id in component) for every doc
    appearing in at least one pair. `pairs` has doc_a < doc_b."""
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).union(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
    edges = edges.cache()
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("label", F.col("doc_id"))
    )
    for _ in range(MAX_ROUNDS):
        neigh = (
            edges.join(labels, edges.dst == labels.doc_id)
            .select(F.col("src").alias("doc_id"), "label")
        )
        prop = (
            labels.select("doc_id", "label")
            .union(neigh)
            .groupBy("doc_id")
            .agg(F.min("label").alias("label"))
        )
        # pointer jump: l(x) <- min(l(x), l(l(x))). Plain neighbor
        # propagation needs diameter rounds — the 10x scale probe's
        # chained near-dup copies exceeded MAX_ROUNDS — while the jump
        # halves the remaining pointer depth each round (O(log
        # diameter), the Shiloach-Vishkin / large-star move). Labels
        # are always member doc_ids, so the label-keyed self-join hits
        # a row for every label; cost is one extra bounded-size join
        # per round.
        a, b = prop.alias("a"), prop.alias("b")
        new_labels = (
            a.join(b, F.col("a.label") == F.col("b.doc_id"), "left")
            .select(
                F.col("a.doc_id").alias("doc_id"),
                F.least(
                    F.col("a.label"), F.coalesce(F.col("b.label"), F.col("a.label"))
                ).alias("label"),
            )
        )
        # localCheckpoint, not cache: caching truncates EXECUTION but
        # the logical plan still grows every round, and per-round
        # analysis cost compounds ~3x/round (1s -> 150s by round 6).
        # Checkpointing truncates the lineage itself — constant-cost
        # rounds. (On a cluster use reliable checkpoint() so executor
        # loss can recompute; localCheckpoint is the single-node form.)
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            labels.alias("o")
            .join(new_labels.alias("n"), "doc_id")
            .where(F.col("o.label") != F.col("n.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"label propagation did not converge in {MAX_ROUNDS} rounds"
        )
    return labels.select("doc_id", F.col("label").alias("cluster_id"))


@register(
    "dedup_cluster_components",
    oracle=CLUSTER_ORACLE,
    tags=("dedup", "graph", "iterative"),
    doc="Connected components over the SimHash64 near-dup pair graph: "
    "(doc_id, cluster_id = min doc_id in component). Iterative "
    "min-label propagation on Spark vs a recursive-CTE fixpoint in "
    "the oracle — two independent formulations of the same closure.",
)
def dedup_cluster_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = dedup_simhash64(spark, sf_dir).select("doc_a", "doc_b")
    return connected_components(pairs)


# --------------------------------------------------------------------------
# Canonical selection (round 5): the END PRODUCT of near-dup dedup. A
# cluster of near-duplicates keeps exactly one survivor; the pick must
# be deterministic and content-driven or reruns/backfills keep
# different docs. Policy: keep the doc with the most tokens (near-dups
# differ by truncation/boilerplate — longest retains the most
# content), tiebreak lowest doc_id.
# --------------------------------------------------------------------------

CANONICAL_ORACLE = _CLUSTER_CTES + """,
tok AS (
  SELECT doc_id,
         CAST(len(list_filter(regexp_split_to_array(text, '[^\\p{L}]+'),
                              x -> x <> '')) AS BIGINT) AS n_tokens
  FROM documents
),
j AS (
  SELECT c.cluster_id, c.doc_id, t.n_tokens
  FROM comp c JOIN tok t USING (doc_id)
),
r AS (
  SELECT *, row_number() OVER (
    PARTITION BY cluster_id ORDER BY n_tokens DESC, doc_id) AS rn
  FROM j
),
g AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_docs
      FROM j GROUP BY cluster_id)
SELECT r.cluster_id, r.doc_id AS canonical_doc_id,
       r.n_tokens AS canonical_tokens, g.n_docs,
       g.n_docs - 1 AS n_dropped
FROM r JOIN g USING (cluster_id) WHERE r.rn = 1
"""


@register(
    "dedup_canonical_pick",
    oracle=CANONICAL_ORACLE,
    tags=("dedup", "graph", "canonical", "pipeline"),
    doc="Canonical-survivor selection per near-dup cluster — the end "
    "product of the dedup stack (pairs -> components -> ONE kept doc "
    "per cluster). Deterministic content-driven policy: most tokens, "
    "tiebreak lowest doc_id; emits the survivor plus the cluster's "
    "doc/drop counts. The per-cluster window sees only cluster "
    "members (near-dup cliques, a handful of rows each), so the pick "
    "costs one bounded window over the components output — the "
    "corpus-sized work already happened in the banded pair join.",
)
def dedup_canonical_pick(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from mapreduce_distributed_systems_spark.functions.text import words
    from mapreduce_distributed_systems_spark.sources import load_table

    pairs = dedup_simhash64(spark, sf_dir).select("doc_a", "doc_b")
    comp = connected_components(pairs)
    tok = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(words("text")).cast("long").alias("n_tokens")
    )
    j = comp.join(tok, "doc_id")
    w = W.partitionBy("cluster_id").orderBy(F.desc("n_tokens"), F.asc("doc_id"))
    ranked = j.withColumn("rn", F.row_number().over(w))
    g = j.groupBy("cluster_id").agg(F.count("*").alias("n_docs"))
    return (
        ranked.where(F.col("rn") == 1)
        .join(g, "cluster_id")
        .select(
            "cluster_id",
            F.col("doc_id").alias("canonical_doc_id"),
            F.col("n_tokens").alias("canonical_tokens"),
            "n_docs",
            (F.col("n_docs") - 1).alias("n_dropped"),
        )
    )


# --------------------------------------------------------------------------
# Soft dedup (round 5): instead of dropping near-duplicates, DOWN-WEIGHT
# them — every doc gets training weight 1/cluster_size, so a cluster of
# near-dups contributes one document's worth of gradient in expectation.
# The standard alternative to hard removal when near-dups carry signal
# (boilerplate variants, translations); singletons keep weight 1.0.
# --------------------------------------------------------------------------

SOFT_WEIGHTS_ORACLE = _CLUSTER_CTES + """,
sizes AS (
  SELECT cluster_id, CAST(count(*) AS BIGINT) AS n
  FROM comp GROUP BY cluster_id
)
SELECT d.doc_id,
       coalesce(c.cluster_id, d.doc_id) AS cluster_id,
       CAST(coalesce(s.n, 1) AS BIGINT) AS cluster_size,
       round(1.0 / coalesce(s.n, 1), 6) AS weight
FROM documents d
LEFT JOIN comp c ON c.doc_id = d.doc_id
LEFT JOIN sizes s ON s.cluster_id = c.cluster_id
"""


@register(
    "dedup_soft_weights",
    oracle=SOFT_WEIGHTS_ORACLE,
    tags=("dedup", "graph", "sampling", "soft-dedup"),
    doc="Soft dedup: per-doc training weight 1/cluster_size over the "
    "near-dup components (weight 1.0 for singletons) — the "
    "down-weighting alternative to hard removal. Scale shape: the "
    "components table is bounded by docs-appearing-in-pairs (orders "
    "of magnitude below the corpus), so both the membership and "
    "cluster-size joins broadcast against the corpus scan — the "
    "corpus itself is never shuffled.",
)
def dedup_soft_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce_distributed_systems_spark.sources import load_table

    pairs = dedup_simhash64(spark, sf_dir).select("doc_a", "doc_b")
    # comp feeds the membership join AND the size agg — bounded rows
    comp = connected_components(pairs).cache()
    sizes = comp.groupBy("cluster_id").agg(F.count("*").alias("n"))
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return (
        docs.join(F.broadcast(comp), "doc_id", "left")
        .join(F.broadcast(sizes), "cluster_id", "left")
        .select(
            "doc_id",
            F.coalesce("cluster_id", "doc_id").alias("cluster_id"),
            F.coalesce("n", F.lit(1)).cast("long").alias("cluster_size"),
            F.round(F.lit(1.0) / F.coalesce("n", F.lit(1)), 6).alias("weight"),
        )
    )


# --------------------------------------------------------------------------
# Dedup-aware sampling: inclusion probability == the soft-dedup weight,
# with an INTEGER-exact threshold. A doc is kept iff
# md5_bucket(doc_id) * cluster_size < 65536, so each member of an
# n-cluster survives with ~1/n probability and every cluster
# contributes ~one expected document — sampling and dedup in a single
# content-addressed filter (reproducible across engines, runs,
# partitionings, and corpus growth; no RNG, no floats).
# --------------------------------------------------------------------------

SOFT_SAMPLE_ORACLE = _CLUSTER_CTES + """,
sizes AS (
  SELECT cluster_id, CAST(count(*) AS BIGINT) AS n
  FROM comp GROUP BY cluster_id
),
w AS (
  SELECT d.doc_id,
         coalesce(c.cluster_id, d.doc_id) AS cluster_id,
         CAST(coalesce(s.n, 1) AS BIGINT) AS cluster_size
  FROM documents d
  LEFT JOIN comp c ON c.doc_id = d.doc_id
  LEFT JOIN sizes s ON s.cluster_id = c.cluster_id
)
SELECT doc_id, cluster_id, cluster_size
FROM w
WHERE ((strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096 +
       (strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256 +
       (strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16 +
       (strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1))
      * cluster_size < 65536
"""

_BUCKET_SPARK_DOC = (
    "(instr('0123456789abcdef', substring(md5(cast(doc_id as string)), 1, 1)) - 1) * 4096 + "
    "(instr('0123456789abcdef', substring(md5(cast(doc_id as string)), 2, 1)) - 1) * 256 + "
    "(instr('0123456789abcdef', substring(md5(cast(doc_id as string)), 3, 1)) - 1) * 16 + "
    "(instr('0123456789abcdef', substring(md5(cast(doc_id as string)), 4, 1)) - 1)"
)


@register(
    "sample_weighted_softdedup",
    oracle=SOFT_SAMPLE_ORACLE,
    tags=("sampling", "dedup", "soft-dedup", "pipeline"),
    doc="Dedup-aware deterministic sampling: keep a doc iff "
    "md5_bucket(doc_id) x cluster_size < 65536 — inclusion "
    "probability equals the soft-dedup weight (1/cluster_size), so "
    "each near-dup cluster contributes ~one expected survivor while "
    "singletons all pass. Integer-exact (no RNG, no float "
    "thresholds): the sample is reproducible across engines, runs, "
    "partitionings, and corpus growth. Same broadcast shape as "
    "dedup_soft_weights — the corpus is never shuffled.",
)
def sample_weighted_softdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = dedup_soft_weights(spark, sf_dir)
    return (
        w.where(F.expr(_BUCKET_SPARK_DOC) * F.col("cluster_size") < 65536)
        .select("doc_id", "cluster_id", "cluster_size")
    )
