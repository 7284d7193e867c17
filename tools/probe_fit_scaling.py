"""Fit-time attribution across corpus decades (VERDICT r7 task 4).

    python tools/probe_fit_scaling.py [--legs sf0.1,x10,x100]

The quantizer fit costs O(sample x route x d) per Lloyd iteration with
sample = FIT_PER_CELL x k and k = ivf_k_for(n) corpus-proportional —
flat routing (route = k) makes that window quadratic in the corpus.
Round 8 engages the two-level router inside the fit above
TWO_LEVEL_MIN_FIT_K (route = sqrt(k) x (1 + w)), and THIS probe is the
evidence: for each decade it times kmeans_fit_int8 over the real
embeddings table twice in one warmed session (cached q8, count
materialized first, fit the ONLY timed work):

  flat    — two_level_gate forced open (the pre-round-8 fit)
  routed  — the default TWO_LEVEL_MIN_FIT_K gate

and reports walls plus the assignment-relevant outcome (how many
fitted centroids differ, p50/max cell size of a final assignment under
each) so the approximation's effect on the learned index is measured
next to its speedup, the same discipline as the LSH recall-next-to-
occupancy tables. Results land in BENCH_NOTES.md.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

import mapreduce_distributed_systems_spark.operators.kmeans as km  # noqa: E402
from mapreduce_distributed_systems_spark.operators.similarity import (  # noqa: E402
    ivf_k_for,
)
from mapreduce_distributed_systems_spark.session import get_spark  # noqa: E402
from mapreduce_distributed_systems_spark.sources import load_table  # noqa: E402

LEGS = {
    "sf0.1": "/root/testdata/sf0.1",
    "x10": "/tmp/scale_probe_x10",
    "x100": "/tmp/scale_probe_x100",
}


def cell_profile(q8, cents) -> tuple[int, int]:
    sizes = (
        km.assign_int8(q8, cents)
        .groupBy("cell")
        .agg(F.count("*").alias("n"))
        .select(
            F.expr("percentile_approx(n, 0.5)").alias("p50"),
            F.max("n").alias("mx"),
        )
        .collect()[0]
    )
    return int(sizes["p50"]), int(sizes["mx"])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--legs", default="sf0.1,x10,x100")
    args = ap.parse_args()

    spark = get_spark("probe_fit_scaling")
    print("leg | n | k | gate | fit flat s | fit routed s | speedup | "
          "cents diff | p50/max cell (flat) | p50/max cell (routed)")
    for leg in args.legs.split(","):
        sf = LEGS[leg]
        emb = load_table(spark, sf, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        )
        q8 = km.quantize_int8(emb).repartition(
            spark.sparkContext.defaultParallelism
        ).cache()
        n = q8.count()
        k = ivf_k_for(n)

        # warmup: an untimed throwaway fit so JIT/Arrow/python-worker
        # startup doesn't land on whichever variant runs first
        km.kmeans_fit_int8(q8, k=8, n=n, n_iter=1)

        t0 = time.monotonic()
        flat = km.kmeans_fit_int8(q8, k=k, n=n, two_level_gate=10**9)
        t_flat = time.monotonic() - t0

        t0 = time.monotonic()
        routed = km.kmeans_fit_int8(q8, k=k, n=n)  # default fit gate
        t_routed = time.monotonic() - t0

        diff = int((np.asarray(flat) != np.asarray(routed)).any(axis=1).sum())
        pf = cell_profile(q8, flat)
        pr = cell_profile(q8, routed) if diff else pf
        print(
            f"{leg} | {n} | {k} | "
            f"{'flat' if k <= km.TWO_LEVEL_MIN_FIT_K else 'routed'} | "
            f"{t_flat:.2f} | {t_routed:.2f} | {t_flat / t_routed:.2f}x | "
            f"{diff}/{k} | {pf[0]}/{pf[1]} | {pr[0]}/{pr[1]}",
            flush=True,
        )
        q8.unpersist()


if __name__ == "__main__":
    main()
