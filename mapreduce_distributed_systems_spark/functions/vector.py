"""Shared integer-vector expressions for the int8-quantized paths
(ann_cosine_int8, ann_ivf_kmeans, dedup_embedding_cosine_ivf).

All arithmetic stays in bigint until the final cosine division, so
the values — and therefore the DuckDB oracles — are bit-exact. These
are codegen array expressions (aggregate / zip_with / transform), no
Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def int_dot(a: str, b: str) -> Column:
    """Exact integer dot product of two array<bigint> columns."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0L, (acc, x) -> acc + x)"
    )


def int_norm(a: str) -> Column:
    """sqrt of the exact integer self-dot (double, exactly rounded)."""
    return F.expr(
        f"sqrt(cast(aggregate(transform({a}, x -> x * x), 0L, "
        f"(acc, x) -> acc + x) as double))"
    )


def int_cosine(a: str, b: str) -> Column:
    """Cosine over integer vectors: exact int dot / float norms.
    Deterministic across engines because every input to the float ops
    is an exact integer."""
    return int_dot(a, b).cast("double") / (int_norm(a) * int_norm(b))
