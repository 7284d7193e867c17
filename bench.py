"""Benchmark harness (driver contract).

Runs the registry's headline (bench=True) queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec",
 "queries": {name: sec}, "sf": ...}.

Each query is executed through a `noop` sink so the full physical
plan runs (scan -> transforms -> exchange -> agg) without paying a
collect or a real write.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mapreduce_distributed_systems_spark.plans.registry import bench_specs
from mapreduce_distributed_systems_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)/?$", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark(app_name="bench")
    specs = bench_specs()

    # warm the JVM + parquet footers once so per-query numbers measure
    # the plans, not first-touch JIT/IO
    for name in ("region", "nation"):
        spark.read.parquet(f"{sf_dir}/{name}.parquet").count()

    timings: dict[str, float] = {}
    for name, spec in specs.items():
        df = spec.fn(spark, sf_dir)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
