"""Deterministic Lloyd's k-means over the embeddings table — the
engine's iterative-algorithm capability (driver-side loop over
DataFrame steps, state persisted between iterations).

Everything is deterministic and engine-portable:
- init: the k vectors with the smallest md5(vec_id) (content-addressed
  seeding, no RNG);
- fixed N_ITER Lloyd steps; distance ties broken by cell id;
- empty cells keep their previous centroid.

No SQL oracle (iterative; SURVEY.md §2.D has no Catalyst analogue) —
the driver records a rows-only check and tests/test_kmeans.py pins:
determinism, monotone non-increasing inertia, assignment completeness.

Scale: each iteration is one broadcast (k x dim centroids, driver
side) + one narrow pass computing argmin + one groupBy(cell) shuffle
of partial sums — O(n·k·d) compute, O(k·d) state, independent of
partition layout. This is exactly how MLlib's k-means iterates.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_distributed_systems_spark.plans.registry import register
from mapreduce_distributed_systems_spark.sources import load_table

K = 8
N_ITER = 3


def _init_centroids(emb: DataFrame) -> np.ndarray:
    seeds = (
        emb.select("vec_id", "v", F.md5(F.col("vec_id").cast("string")).alias("h"))
        .orderBy("h", "vec_id")
        .limit(K)
        .collect()
    )
    return np.array([r.v for r in seeds], dtype=np.float64)


def _assign(emb: DataFrame, cents: np.ndarray) -> DataFrame:
    """Narrow pass: argmin_{c} ||v - cent_c||^2, ties -> lower cell id."""
    import pandas as pd

    bc = cents  # shipped in the task closure (k x d, tiny)

    def assign_batch(batches):
        for pdf in batches:
            m = np.array(list(pdf["v"]), dtype=np.float64)
            d2 = ((m[:, None, :] - bc[None, :, :]) ** 2).sum(axis=2)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "cell": d2.argmin(axis=1).astype("int32"),
                    "dist2": d2.min(axis=1),
                }
            )

    return emb.mapInPandas(
        assign_batch, schema="vec_id long, cell int, dist2 double"
    )


def kmeans_fit(emb: DataFrame) -> tuple[DataFrame, np.ndarray, list[float]]:
    """Run N_ITER Lloyd steps; returns (assignments, centroids,
    per-iteration inertia)."""
    cents = _init_centroids(emb)
    inertia: list[float] = []
    assigned = None
    for _ in range(N_ITER):
        assigned = _assign(emb, cents)
        stats = (
            assigned.join(emb, "vec_id")
            .select("cell", "dist2", "v")
            .groupBy("cell")
            .agg(
                F.count("*").alias("n"),
                F.sum("dist2").alias("sse"),
                F.array(
                    *[
                        F.sum(F.element_at("v", i + 1)).alias(f"s{i}")
                        for i in range(cents.shape[1])
                    ]
                ).alias("sums"),
            )
            .collect()
        )
        inertia.append(float(sum(r.sse for r in stats)))
        new = cents.copy()  # empty cells keep previous centroid
        for r in stats:
            new[r.cell] = np.array(r.sums, dtype=np.float64) / r.n
        cents = new
    return assigned, cents, inertia


@register(
    "kmeans_cells",
    oracle=None,  # iterative algorithm; invariants in tests/test_kmeans.py
    tags=("similarity", "iterative", "kmeans"),
    doc="Deterministic Lloyd k-means (k=8, 3 iterations, md5-seeded "
    "init): per-vector cell assignment — the coarse quantizer a real "
    "IVF index would use.",
)
def kmeans_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    assigned, _, _ = kmeans_fit(emb)
    return assigned.select("vec_id", "cell")
