"""Scaling probe: synthesize an N-fold copy of an existing sf dir
(key-shifted so cardinalities grow realistically instead of creating
pathological 100% duplicates), then run the bench headline set on it.

    python tools/scale_probe.py [--mult 10] [--src /root/testdata/sf0.1]

Fact tables (events, lineitem, orders, documents, embeddings) are
replicated with per-copy key shifts; dimension tables (region, nation,
customer, supplier, part) are left at their original size — exactly
how a real star schema scales. Document text gets a per-copy suffix so
exact/near-dup structure grows linearly instead of multiplying every
text by N (which would turn the dedup queries into a different,
dup-saturated workload).

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
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dest", default=None)
    args = ap.parse_args()
    dest = args.dest or f"/tmp/scale_probe_x{args.mult}"
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
        out.write.mode("overwrite").parquet(f"{dest}/{name}.parquet")
        print(f"{name}: {'dim (1x)' if name in DIMS else f'{args.mult}x'}")
    print(dest)


if __name__ == "__main__":
    main()
