"""Scaling probe: synthesize an N-fold copy of an existing sf dir
(key-shifted so cardinalities grow realistically instead of creating
pathological 100% duplicates), then run the bench headline set on it.

    python tools/scale_probe.py [--mult 10] [--src /root/testdata/sf0.1]
    python tools/scale_probe.py --mult 10 --skew zipf        # skewed events
    python tools/scale_probe.py --measure-skew /tmp/scale_probe_x10_zipf

Fact tables (events, lineitem, orders, documents, embeddings) are
replicated with per-copy key shifts; dimension tables (region, nation,
customer, supplier, part) are left at their original size — exactly
how a real star schema scales. Document text gets a per-copy suffix so
exact/near-dup structure grows linearly instead of multiplying every
text by N (which would turn the dedup queries into a different,
dup-saturated workload).

--skew zipf (VERDICT r4 item 7) remaps events.user_id onto a
Zipf-flavored head deterministically (event_id buckets: 50% of rows
to one hot user, 20% to a second, 10% to a third, rest unchanged) so
the salted-agg machinery can be measured against an actually skewed
distribution instead of the uniform replication the probe otherwise
produces.

--measure-skew DIR times the salted two-phase aggregation
(skew_salted_agg) against the plain single-phase groupBy on DIR's
events table, both through the noop sink in one warmed session —
the relative number is the evidence the salting claim rests on.

Purpose: measured evidence for the 100 TB design claims — if a plan's
wall-clock grows superlinearly between 1x and Nx, its scale story is
wrong no matter what the sf0.1 number says. Results are recorded in
BENCH_NOTES.md per round.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mapreduce_distributed_systems_spark.session import get_spark  # noqa: E402
from mapreduce_distributed_systems_spark.sources import TABLES, load_table  # noqa: E402

DIMS = ("region", "nation", "customer", "supplier", "part")

# per-copy shifts for the key columns that must stay unique-ish
KEY_SHIFTS = {
    "events": {"event_id": 100_000_000, "user_id": 100_000},
    "orders": {"o_orderkey": 1_000_000_000},
    "lineitem": {"l_orderkey": 1_000_000_000},
    "documents": {"doc_id": 100_000_000},
    "embeddings": {"vec_id": 100_000_000},
}


def scaled_copy(df, name: str, copy_idx: int):
    if copy_idx == 0:
        return df
    out = df
    for col, shift in KEY_SHIFTS.get(name, {}).items():
        out = out.withColumn(col, F.col(col) + F.lit(copy_idx * shift))
    if name == "documents":
        out = out.withColumn(
            "text", F.concat(F.col("text"), F.lit(f" copyvariant{copy_idx}"))
        )
    if name == "embeddings":
        # rotate each copy's vector by copy_idx positions: norm- and
        # near-dup-structure-preserving WITHIN a copy, decorrelated
        # ACROSS copies. Without this, every vector has mult-1 exact
        # duplicates, the IVF cells hold mult x the intended density,
        # and the pair join measures a dup-saturated workload instead
        # of a scaled one (round-7: the unrotated x100 leg OOM-killed
        # the JVM — ~10,000x pairs, not 100x; same reasoning as the
        # per-copy text suffix above)
        d = F.size("embedding")
        r = F.lit(copy_idx) % d
        out = out.withColumn(
            "embedding",
            F.when(r == 0, F.col("embedding")).otherwise(
                F.concat(
                    F.slice(F.col("embedding"), r + 1, d - r),
                    F.slice(F.col("embedding"), F.lit(1), r),
                )
            ),
        )
    return out


def zipf_user_skew(ev):
    """Deterministic Zipf-flavored head on events.user_id: 50% of rows
    collapse onto user 1, 20% onto user 2, 10% onto user 3; the tail
    keeps its original (shifted) user_id. pmod(event_id, 10) decides,
    so the mapping is reproducible and engine-independent."""
    b = F.pmod(F.col("event_id"), F.lit(10))
    return ev.withColumn(
        "user_id",
        F.when(b < 5, F.lit(1))
        .when(b < 7, F.lit(2))
        .when(b < 8, F.lit(3))
        .otherwise(F.col("user_id")),
    )


def measure_skew(sf_dir: str) -> None:
    """Skew microbenchmarks on sf_dir's events.

    Aggregation: salted two-phase vs plain groupBy. Expected (and
    measured) outcome: for ALGEBRAIC aggregates the plain plan wins
    even on a 50%-hot-key distribution, because Catalyst's map-side
    partial aggregation reduces each task's contribution to one row
    per key BEFORE the shuffle — the hot key never funnels. Salting
    algebraic aggs is pure overhead; record it so the claim has a
    number.

    Join: the real skew hazard. A shuffle join keys the EXCHANGE on
    the join key, so a hot key's rows genuinely land on one reducer.
    Three plans over the same fact-to-dim join, broadcast disabled to
    model the fact-to-fact case where neither side fits: plain
    sort-merge (the funnel), AQE skew-split (the first-line
    mitigation — OptimizeSkewedJoin splits oversized partitions at
    runtime), and the manual (key, salt) rewrite (the fallback when
    stats arrive too late). All three produce identical results.
    """
    import time

    spark = get_spark("skew_measure")
    ev = load_table(spark, sf_dir, "events")
    ev.count()  # warm scan

    def timed(df):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # -- aggregation: plain vs salted ---------------------------------
    def agg_salted():
        n_salt = 8
        partial = (
            ev.withColumn("salt", F.col("event_id") % n_salt)
            .groupBy("user_id", "salt")
            .agg(F.count("*").alias("pn"), F.sum("value").alias("pv"))
        )
        return partial.groupBy("user_id").agg(
            F.sum("pn").alias("n_events"),
            F.round(F.sum("pv"), 2).alias("total_value"),
        )

    def agg_plain():
        return ev.groupBy("user_id").agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )

    agg = {}
    for label, fn in [("plain", agg_plain), ("salted", agg_salted)] * 2:
        agg[label] = min(agg.get(label, float("inf")), timed(fn()))
    print(
        f"agg: events={ev.count()} plain={agg['plain']:.3f}s "
        f"salted={agg['salted']:.3f}s "
        f"(map-side partial agg absorbs the hot key; salting an "
        f"algebraic agg is overhead)"
    )

    # -- join: plain SMJ vs AQE skew-split vs manual salt -------------
    dim = ev.groupBy("user_id").agg(F.avg("value").alias("u_avg"))

    def join_plain():
        return (
            ev.join(dim, "user_id")
            .groupBy("event_type")
            .agg(
                F.count("*").alias("n"),
                F.round(F.sum(F.col("value") - F.col("u_avg")), 2).alias("dev"),
            )
        )

    def join_salted():
        n_salt = 8
        big = ev.withColumn("salt", (F.col("event_id") % n_salt).cast("int"))
        small = dim.crossJoin(
            spark.range(n_salt).select(F.col("id").cast("int").alias("salt"))
        )
        return (
            big.join(small, ["user_id", "salt"])
            .groupBy("event_type")
            .agg(
                F.count("*").alias("n"),
                F.round(F.sum(F.col("value") - F.col("u_avg")), 2).alias("dev"),
            )
        )

    conf = spark.conf
    saved = {
        k: conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.forceOptimizeSkewedJoin",
        )
    }
    try:
        # model fact-to-fact: neither side broadcastable
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        # thresholds sized so the probe's ~15 MB hot partition counts
        # as skewed (production defaults: 256 MB / factor 5)
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1m"
        )
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
        join = {}
        for _ in range(2):
            conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
            conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "false")
            join["plain_smj"] = min(
                join.get("plain_smj", float("inf")), timed(join_plain())
            )
            conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
            # the join feeds an aggregation, so OptimizeSkewedJoin is
            # skipped (it would break the reusable output partitioning)
            # unless forced — exactly the production knob to document
            conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
            join["aqe_skew"] = min(
                join.get("aqe_skew", float("inf")), timed(join_plain())
            )
            join["salted"] = min(
                join.get("salted", float("inf")), timed(join_salted())
            )
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)
    print(
        f"join: plain_smj={join['plain_smj']:.3f}s "
        f"aqe_skew={join['aqe_skew']:.3f}s salted={join['salted']:.3f}s"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dest", default=None)
    ap.add_argument("--skew", choices=["none", "zipf"], default="none")
    ap.add_argument(
        "--measure-skew",
        metavar="DIR",
        default=None,
        help="skip synthesis; time salted vs plain user_id agg on DIR",
    )
    args = ap.parse_args()
    if args.measure_skew:
        measure_skew(args.measure_skew)
        return
    suffix = "" if args.skew == "none" else f"_{args.skew}"
    dest = args.dest or f"/tmp/scale_probe_x{args.mult}{suffix}"
    os.makedirs(dest, exist_ok=True)

    spark = get_spark("scale_probe")
    for name in TABLES:
        df = load_table(spark, args.src, name)
        if name in DIMS:
            out = df
        else:
            out = df
            for i in range(1, args.mult):
                out = out.unionByName(scaled_copy(df, name, i))
            if name == "events" and args.skew == "zipf":
                out = zipf_user_skew(out)
        out.write.mode("overwrite").parquet(f"{dest}/{name}.parquet")
        print(f"{name}: {'dim (1x)' if name in DIMS else f'{args.mult}x'}")
    print(dest)


if __name__ == "__main__":
    main()
