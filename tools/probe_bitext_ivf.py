"""Claim audit (round 8): bitext_margin_mine's docstring hands off to
"the persisted IVF probe with the same margin tail" at production
anchor counts. This probe BUILDS that path and measures it against the
brute kernel at the decades, so the hand-off is evidence, not prose.

    python tools/probe_bitext_ivf.py [--legs sf0.1,x10,x100] [--n-probe 2]

Per leg: split the embeddings by label parity (the registered query's
sides), build one IVF-SQ8 index per side (corpus-scaled k via
ivf_k_for, the certified fit path), then run the SAME two-pass margin
pipeline with each scan replaced by a cell probe:

  pass 1: anchors route to their n_probe nearest side-B cells; top-k +
          avgk over the probed members only;
  pass 2: the bounded distinct-best set routes into side-A cells the
          same way;
  tail:   identical margin arithmetic (scaled-int cosines).

Reports wall (brute vs IVF) and PAIR AGREEMENT: |kept_ivf ∩ kept_brute|
/ |kept_brute| — the recall the n_probe dial trades, measured next to
the speedup (the LSH recall-next-to-occupancy discipline).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window as W  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from mapreduce_distributed_systems_spark.operators.bitext import (  # noqa: E402
    ANCHOR_CAP,
    ANCHOR_FILTER,
    KNN_K,
    MARGIN_SCALED,
    bitext_margin_mine,
)
from mapreduce_distributed_systems_spark.operators.kmeans import (  # noqa: E402
    assign_carry_int8,
    kmeans_fit_int8,
    quantize_int8,
)
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

_COS6 = (
    "cast(round(aggregate(zip_with(qu, nv, (x, y) -> x * y), 0L,"
    " (a, x) -> a + x) * 1e6 /"
    " (sqrt(aggregate(transform(qu, x -> x * x), 0L, (a, x) -> a + x)) *"
    "  sqrt(aggregate(transform(nv, x -> x * x), 0L, (a, x) -> a + x)))"
    ") as bigint)"
)


def _ivf_side(spark, side):
    """Index one side: (codes-with-cells DataFrame, centroid table)."""
    q8 = quantize_int8(side)
    n = side.count()
    cents = kmeans_fit_int8(q8, k=ivf_k_for(n), n=n)
    codes = assign_carry_int8(q8, cents)
    cells = spark.createDataFrame(
        [(int(c), [int(x) for x in cents[c]]) for c in range(len(cents))],
        "cell int, cv array<bigint>",
    )
    return codes.cache(), cells


def _probe_knn(spark, qblock, codes, cells, n_probe):
    """qblock (query_id, qu) -> per-query knn_sum/knn_n/best via the
    probed cells only. Same shape as similarity._ivf_probe_topk with a
    caller-supplied query block."""
    qd = qblock.crossJoin(F.broadcast(cells)).withColumn(
        "dist2",
        F.expr(
            "aggregate(zip_with(qu, cv, (x, y) -> (x - y) * (x - y)), "
            "0L, (a, x) -> a + x)"
        ),
    )
    cw = W.partitionBy("query_id").orderBy(F.asc("dist2"), F.asc("cell"))
    probed = (
        qd.withColumn("r", F.row_number().over(cw))
        .where(F.col("r") <= n_probe)
        .select("query_id", "cell", "qu")
    )
    cand = (
        F.broadcast(probed)
        .join(codes, "cell")
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.expr(_COS6.replace("nv", "qv")).alias("cos6"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos6"), F.asc("neighbor_id"))
    ranked = cand.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= KNN_K
    )
    return ranked.groupBy("query_id").agg(
        F.sum("cos6").alias("knn_sum"),
        F.count("*").alias("knn_n"),
        F.max(F.when(F.col("rank") == 1, F.col("neighbor_id"))).alias("best_id"),
        F.max(F.when(F.col("rank") == 1, F.col("cos6"))).alias("best_cos6"),
    )


def ivf_margin_mine(spark, sf_dir, n_probe):
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"), "label"
    )
    side_a = emb.where(F.col("label") % 2 == 0).select("vec_id", "v")
    side_b = emb.where(F.col("label") % 2 == 1).select("vec_id", "v")
    codes_b, cells_b = _ivf_side(spark, side_b)
    codes_a, cells_a = _ivf_side(spark, side_a)

    anchors = (
        quantize_int8(side_a)
        .where(F.expr(ANCHOR_FILTER))
        .orderBy("vec_id")
        .limit(ANCHOR_CAP)
        .select(F.col("vec_id").alias("query_id"), F.col("qv").alias("qu"))
    )
    kx = _probe_knn(spark, anchors, codes_b, cells_b, n_probe)
    kx.cache().count()
    yblock = (
        kx.select(F.col("best_id").alias("vec_id"))
        .distinct()
        .join(codes_b.select("vec_id", "qv"), "vec_id")
        .select(F.col("vec_id").alias("query_id"), F.col("qv").alias("qu"))
    )
    ky = (
        _probe_knn(spark, yblock, codes_a, cells_a, n_probe)
        .select(
            F.col("query_id").alias("yid"),
            F.col("knn_sum").alias("knn_sum_y"),
            F.col("knn_n").alias("knn_n_y"),
        )
    )
    margin6 = F.round(
        F.col("best_cos6") * F.lit(1e6)
        / (0.5 * (F.col("knn_sum") / F.col("knn_n")
                  + F.col("knn_sum_y") / F.col("knn_n_y"))),
        0,
    ).cast("long")
    return (
        kx.join(F.broadcast(ky), kx["best_id"] == ky["yid"])
        .select(
            F.col("query_id").alias("anchor_id"),
            F.col("best_id").alias("pair_id"),
            margin6.alias("margin6"),
        )
        .where(F.col("margin6") >= MARGIN_SCALED)
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--legs", default="sf0.1,x10,x100")
    ap.add_argument("--n-probe", type=int, default=2)
    args = ap.parse_args()
    spark = get_spark("probe_bitext_ivf")
    print("leg | brute s | ivf s | kept brute | kept ivf | pair agreement")
    for leg in args.legs.split(","):
        sf = LEGS[leg]
        t0 = time.monotonic()
        brute = {
            (r.anchor_id, r.pair_id)
            for r in bitext_margin_mine(spark, sf).collect()
        }
        t_brute = time.monotonic() - t0
        t0 = time.monotonic()
        ivf = {
            (r.anchor_id, r.pair_id)
            for r in ivf_margin_mine(spark, sf, args.n_probe).collect()
        }
        t_ivf = time.monotonic() - t0
        agree = len(brute & ivf) / len(brute) if brute else float("nan")
        print(
            f"{leg} | {t_brute:.2f} | {t_ivf:.2f} | {len(brute)} | "
            f"{len(ivf)} | {agree:.3f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
