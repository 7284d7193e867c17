"""End-to-end two-level IVF probe: run the REAL dedup pipeline
(dedup_embedding_cosine_ivf) on a corpus big enough that
ivf_k_for(n) > TWO_LEVEL_MIN_K, once with the gate forced open (exact
flat assignment everywhere) and once with the default gate (two-level
routing in fit AND full-corpus assignment), and compare:

  - wall-clock of the full pipeline,
  - the duplicate-pair sets: recall |B∩A|/|A| and precision |B∩A|/|B|
    of the two-level run's pairs vs the exact run's.

    python tools/probe_two_level_pipeline.py [--n 1050000] [--dim 64]

The corpus is written ONCE to parquet (planted clusters of
~IVF_TARGET_CELL vectors — the IVF regime, and the regime where
near-dup pairs exist to find); both runs read identical bytes, so
every difference is attributable to the assignment path. This is the
last link of the two-level story: tools/probe_two_level.py measures
the assignment pass in isolation; this measures what the dedup
CONSUMER sees."""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import mapreduce_distributed_systems_spark.operators.kmeans as km  # noqa: E402
from mapreduce_distributed_systems_spark.operators.similarity import (  # noqa: E402
    IVF_TARGET_CELL,
    ivf_k_for,
)
from mapreduce_distributed_systems_spark.session import get_spark  # noqa: E402


def build_corpus(spark, dest: str, n: int, dim: int, seed: int = 29) -> None:
    """Planted-cluster float corpus written once to
    dest/embeddings.parquet: cluster count = ivf_k_for(n) so expected
    cell size ~IVF_TARGET_CELL, vector = unit-ish centroid + small
    noise (same-cluster cosine >> threshold, cross-cluster ~0)."""
    c = ivf_k_for(n)
    rng = np.random.RandomState(seed)
    cents = rng.standard_normal((c, dim)).astype(np.float32)

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            ids = pdf["id"].to_numpy()
            r = np.random.RandomState(seed ^ int(ids[0]))
            base = cents[ids % c]
            v = base + 0.05 * r.standard_normal((len(ids), dim)).astype(
                np.float32
            )
            yield pd.DataFrame({"vec_id": ids, "embedding": list(v)})

    (
        spark.range(n)
        .repartition(spark.sparkContext.defaultParallelism)
        .mapInPandas(gen, schema="vec_id long, embedding array<float>")
        .write.mode("overwrite")
        .parquet(os.path.join(dest, "embeddings.parquet"))
    )


def run_pipeline(spark, sf_dir: str, tag: str):
    from mapreduce_distributed_systems_spark.plans.registry import get_spec

    t0 = time.monotonic()
    pairs = get_spec("dedup_embedding_cosine_ivf").fn(spark, sf_dir)
    out = f"/tmp/two_level_pairs_{tag}"
    shutil.rmtree(out, ignore_errors=True)
    pairs.select("vec_a", "vec_b").write.mode("overwrite").parquet(out)
    wall = time.monotonic() - t0
    n_pairs = spark.read.parquet(out).count()
    return out, wall, n_pairs


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_050_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--dest", default="/tmp/two_level_corpus")
    ap.add_argument(
        "--gate",
        type=int,
        default=None,
        help="override TWO_LEVEL_MIN_K (smoke-testing the probe itself "
        "at small n; headline numbers use the default gate)",
    )
    args = ap.parse_args()
    if args.gate is not None:
        km.TWO_LEVEL_MIN_K = args.gate

    spark = get_spark("probe_two_level_pipeline")
    k = ivf_k_for(args.n)
    assert k > km.TWO_LEVEL_MIN_K, (
        f"k={k} does not engage the gate; raise --n above "
        f"{(km.TWO_LEVEL_MIN_K + 1) * IVF_TARGET_CELL}"
    )
    if not os.path.exists(os.path.join(args.dest, "embeddings.parquet")):
        print(f"building corpus n={args.n} dim={args.dim} k={k} ...")
        build_corpus(spark, args.dest, args.n, args.dim)

    # exact run: gate forced open
    old = km.TWO_LEVEL_MIN_K
    km.TWO_LEVEL_MIN_K = 10**9
    try:
        exact_out, exact_wall, exact_n = run_pipeline(
            spark, args.dest, "exact"
        )
        print(f"exact   : {exact_wall:.1f} s, {exact_n} pairs", flush=True)
    finally:
        km.TWO_LEVEL_MIN_K = old

    tl_out, tl_wall, tl_n = run_pipeline(spark, args.dest, "twolevel")
    print(f"twolevel: {tl_wall:.1f} s, {tl_n} pairs", flush=True)

    a = spark.read.parquet(exact_out)
    b = spark.read.parquet(tl_out)
    inter = a.join(b, ["vec_a", "vec_b"]).count()
    print(
        f"n={args.n} k={k} g~{int(np.ceil(np.sqrt(k)))} "
        f"w={km.COARSE_PROBE_W}\n"
        f"speedup: {exact_wall / tl_wall:.2f}x\n"
        f"pair recall |B∩A|/|A| = {inter / max(exact_n, 1):.4f}\n"
        f"pair precision |B∩A|/|B| = {inter / max(tl_n, 1):.4f}"
    )


if __name__ == "__main__":
    main()
