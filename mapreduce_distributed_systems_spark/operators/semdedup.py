"""SemDeDup — semantic deduplication over embedding k-means cells
(Abbas et al., arXiv:2303.09540): cluster the corpus' embeddings,
form near-duplicate groups only WITHIN a cell (cosine >= tau), and
keep exactly one document per group — the paper's keep-rule retains
the example with the LOWEST similarity to its cell centroid (keeping
"outliers" preserves diversity; §3.1 of the paper).

Staged r10/r11 (code + oracle + dual-fixture parity tests, no
@register while the gate windows were full); REGISTERED round 12 per
the plans/registry.py rotation note.

Relationship to the existing dedup stack: dedup_embedding_cosine_ivf
emits the near-dup PAIRS inside learned cells; dedup_cluster_* turns
global pair sets into components with a min-id canonical pick. This
operator is the SemDeDup end-to-end decision — and because SemDeDup
defines duplicates only within a cell, the component computation is
CELL-LOCAL: each cell's graph resolves in one in-memory union-find
inside the same Arrow batch that scored it, with no iterative global
pointer-jumping phase and no extra shuffle after the assignment.

Integer-exact certification: the quantizer is the shared int8 Lloyd
fit (operators/kmeans.py) whose every learned quantity is an integer,
cosines come from exact int64 Gram products, the tau gate compares
the raw double (both engines compute bit-identical IEEE doubles from
identical integers), and the keep-rule orders by the exact int64
centroid dot — so the full fit -> assign -> group -> survivor
pipeline is hash-certifiable against the DuckDB replay.

Scale shape: pair work exists only inside cells whose expected size
ivf_k_for holds ~constant as the corpus grows; the survivor rule
needs one int64 dot per vector; output is one row per vector. The
only corpus-sized exchanges are the quantized-vector repartition and
the cell-keyed repartition the IVF dedup already pays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_distributed_systems_spark.operators.kmeans import (
    kmeans_fit_int8,
)
from mapreduce_distributed_systems_spark.operators.similarity import (
    DIM,
    IVF_KMEANS_ITER,
    IVF_KMEANS_K,
    _kmeans_cells_sql,
    ivf_k_for,
)
from mapreduce_distributed_systems_spark.plans.registry import register
from mapreduce_distributed_systems_spark.sources import load_table

# Same bar as dedup_embedding_cosine_ivf's label-blocked twin: the
# fixtures' synthetic embeddings are near-orthogonal, so a paper-grade
# 0.95 would make every cell all-singletons and certify nothing.
SEMDEDUP_TAU = 0.3

# Memory guard on the cell-local dense Gram (ADVICE r10): one cell of
# n rows costs two n x n matrices (int64 dots + float64 cos) in a
# single Arrow batch. ivf_k_for targets ~IVF_TARGET_CELL(=250) rows,
# but a COLLAPSED quantizer fit can funnel thousands of vectors into
# one cell (the r7 starved-fit probe measured max cell 7944 — ~1 GB
# of Gram). 4096 gives 16x headroom over the target while keeping the
# worst batch ~270 MB; beyond it the operator fails LOUDLY with the
# refit instruction instead of silently OOMing an executor.
SEMDEDUP_CELL_CAP = 4096


def _semdedup_oracle() -> str:
    prev = f"cents{IVF_KMEANS_ITER}"
    base = _kmeans_cells_sql(k=IVF_KMEANS_K, n_iter=IVF_KMEANS_ITER, dim=DIM)
    # the component fixpoint needs WITH RECURSIVE on the shared chain
    base = base.replace("WITH e AS", "WITH RECURSIVE e AS", 1)
    return base + f""",
pairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM af a JOIN af b ON a.cell = b.cell AND a.vec_id < b.vec_id
  JOIN q8 qa ON qa.vec_id = a.vec_id
  JOIN q8 qb ON qb.vec_id = b.vec_id
  WHERE list_dot_product(qa.qv, qa.qv) > 0
    AND list_dot_product(qb.qv, qb.qv) > 0
    AND CAST(list_dot_product(qa.qv, qb.qv) AS DOUBLE) /
          (sqrt(CAST(list_dot_product(qa.qv, qa.qv) AS DOUBLE)) *
           sqrt(CAST(list_dot_product(qb.qv, qb.qv) AS DOUBLE)))
        >= {SEMDEDUP_TAU}
),
edges AS (
  SELECT vec_a AS a, vec_b AS b FROM pairs
  UNION
  SELECT vec_b AS a, vec_a AS b FROM pairs
),
nodes AS (SELECT DISTINCT a AS vec_id FROM edges),
reach(src, dst) AS (
  SELECT vec_id, vec_id FROM nodes
  UNION
  SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.dst
),
comp AS (SELECT src AS vec_id, min(dst) AS rep FROM reach GROUP BY src),
allv AS (
  SELECT a.vec_id, a.cell, coalesce(c.rep, a.vec_id) AS cluster_rep
  FROM af a LEFT JOIN comp c USING (vec_id)
),
cd AS (
  SELECT v.vec_id, v.cell, v.cluster_rep,
         CAST(list_dot_product(q.qv, ct.cv) AS BIGINT) AS cdot
  FROM allv v
  JOIN q8 q ON q.vec_id = v.vec_id
  JOIN {prev} ct ON ct.cell = v.cell
),
ranked AS (
  SELECT vec_id, cell, cluster_rep,
         row_number() OVER (PARTITION BY cluster_rep
                            ORDER BY cdot ASC, vec_id ASC) AS rn
  FROM cd
)
SELECT vec_id, CAST(cell AS INTEGER) AS cell, cluster_rep,
       (rn = 1) AS keep
FROM ranked
"""


SEMDEDUP_ORACLE = _semdedup_oracle()


def semdedup_frame(ids, m, cent, tau: float = SEMDEDUP_TAU):
    """Cell-local SemDeDup decision (pure numpy, unit-testable):
    union-find over the cos>=tau graph of the int64 row-vectors `m`,
    cluster_rep = min vec_id per component, keep = lowest exact
    centroid dot (tie -> min vec_id). Returns (rep, keep) arrays."""
    import numpy as np

    ids = np.asarray(ids, dtype=np.int64)
    m = np.asarray(m, dtype=np.int64)
    cent = np.asarray(cent, dtype=np.int64)
    cdot = m @ cent
    n_rows = len(ids)
    if n_rows > SEMDEDUP_CELL_CAP:
        raise RuntimeError(
            f"SemDeDup cell holds {n_rows} vectors "
            f"(> SEMDEDUP_CELL_CAP={SEMDEDUP_CELL_CAP}); the quantizer "
            "fit has collapsed — refit with a larger sample or raise k "
            "(ivf_k_for) instead of densifying an O(n^2) Gram batch"
        )
    parent = np.arange(n_rows)

    def find(i: int) -> int:
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    if n_rows > 1:
        dots = m @ m.T
        nrm = np.sqrt(np.diag(dots).astype(np.float64))
        # zero-norm rows (all-zero quantized vectors) are non-dups BY
        # DEFINITION on both sides (ADVICE r10): numpy would yield
        # NaN cosines (NaN >= tau is False) while DuckDB's total order
        # puts NaN above tau — so both the kernel and the SQL oracle
        # exclude them explicitly instead of leaning on NaN semantics.
        with np.errstate(divide="ignore", invalid="ignore"):
            cos = dots.astype(np.float64) / np.outer(nrm, nrm)
        zero = nrm == 0.0
        if zero.any():
            cos[zero, :] = -np.inf
            cos[:, zero] = -np.inf
        iu, ju = np.nonzero(np.triu(cos >= tau, k=1))
        for i, j in zip(iu, ju):
            ri, rj = find(int(i)), find(int(j))
            if ri != rj:
                parent[max(ri, rj)] = min(ri, rj)

    roots = np.array([find(i) for i in range(n_rows)])
    rep = np.empty(n_rows, dtype=np.int64)
    keep = np.zeros(n_rows, dtype=bool)
    for r in np.unique(roots):
        members = np.nonzero(roots == r)[0]
        rep[members] = ids[members].min()
        order = np.lexsort((ids[members], cdot[members]))
        keep[members[order[0]]] = True
    return rep, keep


@register(
    "dedup_semantic_semdedup",
    oracle=SEMDEDUP_ORACLE,
    tags=("dedup", "embedding"),
    bench=True,
    doc="SemDeDup (arXiv:2303.09540) end-to-end keep decision: int8 "
    "k-means cells, cell-LOCAL union-find inside the scoring Arrow "
    "batch (no global pointer-jumping phase), lowest-centroid-dot "
    "survivor. Pair work bounded by ivf_k_for's ~constant cell size; "
    "SEMDEDUP_CELL_CAP turns a silent O(cell^2) blowup into a loud "
    "refit error.",
    # VERDICT r13 #1c: the quantizer fit lives in the shared
    # kmeans_fit_int8 (r13 driver-fit gate) — its source is part of
    # this query's certified definition
    helpers=(kmeans_fit_int8,),
)
def dedup_semantic_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered r12 (oracle: SEMDEDUP_ORACLE): one row per vector
    with its cell, its within-cell near-dup cluster representative
    (min vec_id), and the SemDeDup keep decision (lowest centroid
    similarity survives; exact int64 dot, tie -> min vec_id)."""
    import numpy as np
    import pandas as pd

    from mapreduce_distributed_systems_spark.operators.kmeans import (
        assign_carry_int8,
        kmeans_fit_int8,
        quantize_int8,
    )

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    # same staging discipline as dedup_embedding_cosine_ivf (the
    # rationale comments live there): width for the compute-bound
    # assignment, metadata-cheap n, corpus-scaled cell count
    q8 = quantize_int8(emb).repartition(spark.sparkContext.defaultParallelism)
    n = emb.count()
    k = ivf_k_for(n)
    cents = kmeans_fit_int8(q8, k=k, n_iter=IVF_KMEANS_ITER, n=n)
    assigned = assign_carry_int8(q8, cents)
    assigned_p = assigned.repartition(
        spark.sparkContext.defaultParallelism, F.col("cell")
    )

    bc = np.asarray(cents, dtype=np.int64)

    def semdedup_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["vec_id"].to_numpy()
        cell = int(pdf["cell"].iloc[0])
        m = np.array(list(pdf["qv"]), dtype=np.int64)
        rep, keep = semdedup_frame(ids, m, bc[cell])
        return pd.DataFrame(
            {
                "vec_id": ids,
                "cell": np.full(len(ids), cell, dtype=np.int32),
                "cluster_rep": rep,
                "keep": keep,
            }
        )

    return assigned_p.groupBy("cell").applyInPandas(
        semdedup_cell,
        schema="vec_id long, cell int, cluster_rep long, keep boolean",
    )
