"""Measure the two-level (coarse-quantizer) IVF assignment against the
flat argmin at a post-gate cell count (ROADMAP round-7 backlog #0).

    python tools/probe_two_level.py [--n 100000] [--k 8192] [--dim 32]

Synthesizes a clustered int8 corpus (points = centroid + small noise,
the IVF regime) and runs the REAL Spark assignment pass
(kmeans.assign_int8) twice over the same DataFrame:

  exact     — gate forced open (TWO_LEVEL_MIN_K = inf): flat
              O(n x k x d) argmin, the pre-round-7 plan;
  two-level — default gate (k > TWO_LEVEL_MIN_K): coarse routing with
              g ~ sqrt(k) groups, w = COARSE_PROBE_W probes,
              O(n x d x sqrt(k) x (1 + w)).

Reports wall-clock for each and the assignment agreement rate (the
recall the approximation trades for the sqrt(k) scan). Evidence lands
in BENCH_NOTES.md; the bit-identity of the w = g case is pinned by
tests/test_kmeans.py, not here.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import mapreduce_distributed_systems_spark.operators.kmeans as km  # noqa: E402
from mapreduce_distributed_systems_spark.session import get_spark  # noqa: E402


def synth_corpus(spark, n: int, k: int, dim: int, seed: int = 13):
    """Deterministic clustered int8 corpus as a DataFrame
    (vec_id, qv array<bigint>): vec i belongs to planted cluster
    i % k with noise derived from a per-row RandomState — no global
    RNG state crosses executors."""
    rng = np.random.RandomState(seed)
    cents = rng.randint(-120, 121, size=(k, dim)).astype(np.int64)

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            ids = pdf["id"].to_numpy()
            base = cents[ids % k]
            noise = np.stack(
                [
                    np.random.RandomState(seed ^ int(i)).randint(
                        -4, 5, size=dim
                    )
                    for i in ids
                ]
            )
            v = np.clip(base + noise, -127, 127)
            yield pd.DataFrame({"vec_id": ids, "qv": list(v)})

    df = spark.range(n).mapInPandas(gen, schema="vec_id long, qv array<bigint>")
    return df, cents


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--k", type=int, default=8192)
    ap.add_argument("--dim", type=int, default=32)
    args = ap.parse_args()

    spark = get_spark("probe_two_level")
    q8, cents = synth_corpus(spark, args.n, args.k, args.dim)
    q8 = q8.cache()
    q8.count()  # materialize so both passes read the same cached input

    assert args.k > km.TWO_LEVEL_MIN_K, "probe is meant for a post-gate k"

    # exact flat pass (gate forced open)
    old_gate = km.TWO_LEVEL_MIN_K
    km.TWO_LEVEL_MIN_K = 10**9
    try:
        t0 = time.monotonic()
        exact = km.assign_int8(q8, cents).cache()
        exact.count()
        t_exact = time.monotonic() - t0
    finally:
        km.TWO_LEVEL_MIN_K = old_gate

    # two-level pass (default gate)
    t0 = time.monotonic()
    tl = (
        km.assign_int8(q8, cents)
        .withColumnRenamed("cell", "cell_tl")
        .cache()
    )
    tl.count()
    t_tl = time.monotonic() - t0

    from pyspark.sql import functions as F

    agree = (
        exact.join(tl, "vec_id")
        .select(F.avg((F.col("cell") == F.col("cell_tl")).cast("double")))
        .head()[0]
    )
    g = int(np.ceil(np.sqrt(args.k)))
    print(
        f"n={args.n} k={args.k} dim={args.dim} g={g} w={km.COARSE_PROBE_W}\n"
        f"exact flat assign: {t_exact:.2f} s\n"
        f"two-level assign:  {t_tl:.2f} s  ({t_exact / t_tl:.2f}x)\n"
        f"assignment agreement: {agree:.4f}"
    )


if __name__ == "__main__":
    main()
