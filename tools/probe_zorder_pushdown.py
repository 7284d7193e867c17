"""Does min/max row-group skipping ACTUALLY engage on the z-ordered
events layout at 10x? (ROADMAP r8 backlog #7.)

tests/test_storage_layout.py proves the footer GEOMETRY at the test
SF: the z-layout's per-file min-max boxes intersect a 2-D predicate
box in fewer files than a time-linear layout. This probe closes the
remaining gap — that Spark's parquet reader actually converts those
narrower boxes into skipped IO on a corpus big enough to matter —
by reading the executed scan node's own SQLMetrics on the 10x events
replica (1M rows):

  * numOutputRows on the SCAN (before the residual Filter): rows
    that survived row-group statistics pushdown. Skipped row groups
    never produce rows here, so scan_rows << total proves engagement.
  * scanTime / filesSize for the IO-side corroboration.

Both layouts are written with several row groups per file (small
parquet.block.size) so skipping is visible WITHIN files too — at
100 TB a file holds many row groups and that is the granularity the
reader skips at.

    python tools/probe_zorder_pushdown.py [--dir /tmp/scale_probe_x10]

Expected shape (recorded in BENCH_NOTES.md): under a 2-D box
predicate both layouts skip heavily on time, but under the user-only
predicate the linear layout must scan ~everything while the z-order
scan emits a small fraction — that asymmetry is the z-order claim.
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mapreduce_distributed_systems_spark.operators.layout import (  # noqa: E402
    _NB,
    write_zordered,
)
from mapreduce_distributed_systems_spark.session import get_spark  # noqa: E402


def _scan_metrics(df) -> dict[str, int]:
    """Execute df and return the leaf parquet scan's SQLMetrics
    (profile_query.py's AQE-unwrapping walk, scan-only)."""
    df.collect()
    out: dict[str, int] = {}

    def walk(n):
        cls = n.getClass().getSimpleName()
        if cls == "AdaptiveSparkPlanExec":
            return walk(n.executedPlan())
        if cls.endswith("QueryStageExec"):
            return walk(n.plan())
        if "Scan parquet" in n.nodeName():
            it = n.metrics().iterator()
            while it.hasNext():
                e = it.next()
                out[e._1()] = e._2().value()
        ch = n.children().iterator()
        while ch.hasNext():
            walk(ch.next())

    walk(df._jdf.queryExecution().executedPlan())
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/scale_probe_x10")
    ap.add_argument("--files", type=int, default=16)
    args = ap.parse_args()

    spark = get_spark("probe_zorder")
    # several row groups per file: block.size is a hadoop write conf
    spark._jsc.hadoopConfiguration().set("parquet.block.size", str(256 * 1024))

    ev = spark.read.parquet(f"{args.dir}/events.parquet").select(
        "event_id",
        "user_id",
        F.unix_timestamp("ts").cast("long").alias("ts_s"),
    )
    total = ev.count()
    lo_u, hi_u, lo_t, hi_t = ev.agg(
        F.min("user_id"), F.max("user_id"), F.min("ts_s"), F.max("ts_s")
    ).collect()[0]

    base = tempfile.mkdtemp(prefix="zorder_push_")
    (
        ev.repartitionByRange(args.files, "ts_s")
        .sortWithinPartitions("ts_s")
        .write.mode("overwrite")
        .parquet(f"{base}/linear")
    )
    ub = f"(((user_id - {lo_u}) * {_NB}) div ({hi_u - lo_u} + 1))"
    tb = f"(((ts_s - {lo_t}) * {_NB}) div ({hi_t - lo_t} + 1))"
    write_zordered(ev, f"{base}/zorder", a=ub, b=tb, n_files=args.files)

    u1, u2 = lo_u, lo_u + max((hi_u - lo_u) // 8, 1)
    t1, t2 = lo_t, lo_t + max((hi_t - lo_t) // 8, 1)
    preds = {
        "2d_box": f"user_id BETWEEN {u1} AND {u2} AND ts_s BETWEEN {t1} AND {t2}",
        "user_only": f"user_id BETWEEN {u1} AND {u2}",
    }

    print(f"rows={total}  files={args.files}  (row groups per file: several; "
          f"block.size=256KiB)")
    for pname, pred in preds.items():
        for layout in ("linear", "zorder"):
            df = spark.read.parquet(f"{base}/{layout}").where(pred)
            t0 = time.time()
            m = _scan_metrics(df.groupBy().count())
            wall = time.time() - t0
            srows = m.get("numOutputRows", -1)
            print(
                f"{pname:10s} {layout:7s} scan_rows={srows:>9,} "
                f"({srows / total:6.1%} of table)  wall={wall:.2f}s"
            )
    print("engaged = zorder user_only scan_rows fraction << linear's 100%")


if __name__ == "__main__":
    main()
