"""Zipf-parts probe for the triangle-count projection cap (VERDICT r5
"what's wrong" item 1): one 'the'-like hot part whose member count
dwarfs every other part's. Uncapped, the projection's C(k, 2) fan-out
on that single part dominates the whole query; with the default
TRIANGLE_PART_CAP the hot part is excluded-and-accounted and wall
stays flat no matter how hot the part gets.

    python tools/probe_triangle_cap.py [--hot 5000] [--parts 2000]
                                       [--uncapped-hot 500]

Deterministic synthetic membership: `--parts` normal parts with 8
members each over a 500-supplier pool (id arithmetic, no RNG), plus
one hot part with `--hot` members. The capped leg runs at full heat;
the uncapped leg runs at `--uncapped-hot` (bounded — at hot=5000 the
uncapped projection emits 12.5M pair edges whose triangle enumeration
spills until the DISK is exhausted; observed r6: >70 GB of shuffle
spill then job abort with "No space left on device") and any failure
is caught and reported as the result rather than crashing the probe.
Results land in BENCH_NOTES.md per round.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mapreduce_distributed_systems_spark.operators.graph import (  # noqa: E402
    TRIANGLE_PART_CAP,
    triangle_count_projected,
)
from mapreduce_distributed_systems_spark.session import get_spark  # noqa: E402


def membership(spark, n_parts: int, hot: int):
    # normal parts: 8 members each via id arithmetic over a 500-pool
    normal = spark.range(n_parts).selectExpr("id + 1 AS p").select(
        "p",
        F.explode(
            F.array(*[F.expr(f"CAST(pmod(p * {m}, 500) AS BIGINT)")
                      for m in (7, 13, 29, 31, 37, 41, 47, 53)])
        ).alias("s"),
    )
    # the hot part: members 10_000 .. 10_000 + hot (disjoint id range
    # so its fan-out cannot piggyback on normal-part edges)
    hot_df = spark.range(hot).select(
        F.lit(0).cast("long").alias("p"), (F.col("id") + 10_000).alias("s")
    )
    ps = normal.unionByName(hot_df).distinct()
    ps.count()  # warm
    return ps


def timed(ps, cap: int):
    t0 = time.perf_counter()
    row = triangle_count_projected(ps, part_cap=cap).collect()[0]
    return time.perf_counter() - t0, row


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hot", type=int, default=5000)
    ap.add_argument("--parts", type=int, default=2000)
    ap.add_argument("--uncapped-hot", type=int, default=500)
    args = ap.parse_args()

    spark = get_spark("probe_triangle_cap")

    ps = membership(spark, args.parts, args.hot)
    wall_cap, row_cap = timed(ps, TRIANGLE_PART_CAP)
    print(
        f"capped   hot={args.hot}: {wall_cap:.2f}s "
        f"triangles={row_cap.n_triangles} edges={row_cap.n_edges} "
        f"dropped={row_cap.n_parts_dropped}",
        flush=True,
    )

    ps_small = membership(spark, args.parts, args.uncapped_hot)
    wall_cs, row_cs = timed(ps_small, TRIANGLE_PART_CAP)
    print(
        f"capped   hot={args.uncapped_hot}: {wall_cs:.2f}s "
        f"triangles={row_cs.n_triangles} edges={row_cs.n_edges} "
        f"dropped={row_cs.n_parts_dropped}",
        flush=True,
    )
    try:
        wall_unc, row_unc = timed(ps_small, 10**9)
        print(
            f"uncapped hot={args.uncapped_hot}: {wall_unc:.2f}s "
            f"triangles={row_unc.n_triangles} edges={row_unc.n_edges} "
            f"dropped={row_unc.n_parts_dropped}",
            flush=True,
        )
    except Exception as e:  # noqa: BLE001 — the abort IS the result
        print(f"uncapped hot={args.uncapped_hot}: FAILED ({type(e).__name__}: "
              f"{str(e).splitlines()[0][:200]})", flush=True)


if __name__ == "__main__":
    main()
