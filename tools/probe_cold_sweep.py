"""Cold single-pass suite sweep — the bench protocol's cross-check
(one warm SESSION per leg, every bench query executed exactly ONCE,
session startup excluded, caches evicted between queries). The
per-query fresh-session bench measures plan cost in isolation; this
protocol measures the suite the way a long-lived session would run
it, so together they bracket the decade ratios (the r11/r12 close
evidence pairs both).

    python tools/probe_cold_sweep.py SF_DIR [SF_DIR ...]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from mapreduce_distributed_systems_spark.plans.registry import bench_specs  # noqa: E402
from mapreduce_distributed_systems_spark.session import get_spark  # noqa: E402


def main() -> None:
    legs = sys.argv[1:] or ["/root/testdata/sf0.1"]
    specs = bench_specs()
    for sf in legs:
        spark = get_spark("cold_sweep")
        # touch footers so leg wall excludes first-touch file IO
        for t in ("region", "nation"):
            spark.read.parquet(f"{sf}/{t}.parquet").count()
        total = 0.0
        worst = ("", 0.0)
        for name, spec in specs.items():
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            spec.fn(spark, sf).write.format("noop").mode("overwrite").save()
            w = time.perf_counter() - t0
            total += w
            if w > worst[1]:
                worst = (name, w)
        print(
            f"cold single-pass {sf}: {total:7.1f} s over {len(specs)} "
            f"queries (worst {worst[0]} {worst[1]:.1f} s)",
            flush=True,
        )
        spark.stop()


if __name__ == "__main__":
    main()
