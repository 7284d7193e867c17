"""Operator-level profile of a registered query: execute it and dump
the FINAL adaptive physical plan with each operator's SQLMetrics
(rows, shuffle bytes/records, spill, sort/agg time, scan stats).

    python tools/profile_query.py dedup_minhash_lsh [more ...]
    python tools/profile_query.py --sf /root/testdata/sf0.1 --json q1_pricing_summary

This is the per-operator complement to bench.py's per-query io deltas:
bench answers "how much does this query shuffle", this answers "WHICH
exchange/aggregate/join carries it, and did anything spill". The
executed-plan walk unwraps AQE query stages and reused exchanges, so
the tree printed is the plan that actually ran (post coalesce / skew
split / broadcast demotion), not the static estimate — the difference
is exactly what matters when auditing a plan for 100 TB behavior.

Execution is a collect() (not the noop sink): SQLMetrics live on the
DataFrame's own QueryExecution, and only a direct action runs that
instance. Profile at SFs where the result is collect-safe (every
registered query returns an aggregate/report-sized result).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduce_distributed_systems_spark.plans.registry import get_spec  # noqa: E402
from mapreduce_distributed_systems_spark.session import get_spark  # noqa: E402

# metrics worth reading in a profile; everything else (fetch-wait
# breakdowns, merged-shuffle plumbing) is noise at local[32]
_KEEP = (
    "numOutputRows",
    "shuffleRecordsWritten",
    "dataSize",
    "localBytesRead",
    "remoteBytesRead",
    "spillSize",
    "sortTime",
    "aggTime",
    "pipelineTime",
    "scanTime",
    "numFiles",
    "filesSize",
    "broadcastTime",
    "collectTime",
    "numPartitions",
    "numSkewedPartitions",
    "numCoalescedPartitions",
)


def _metrics(node) -> dict[str, int]:
    out: dict[str, int] = {}
    it = node.metrics().iterator()
    while it.hasNext():
        kv = it.next()
        name, val = kv._1(), kv._2().value()
        if val and name in _KEEP:
            out[name] = val
    return out


def walk(node, depth: int = 0, out: list | None = None) -> list:
    """Flatten the executed plan into (depth, nodeName, metrics) rows,
    descending through AQE wrappers and query stages."""
    if out is None:
        out = []
    cls = node.getClass().getSimpleName()
    if cls == "AdaptiveSparkPlanExec":
        return walk(node.executedPlan(), depth, out)
    if cls.endswith("QueryStageExec"):
        return walk(node.plan(), depth, out)
    if cls == "ReusedExchangeExec":
        out.append((depth, "ReusedExchange", {}))
        return out
    out.append((depth, node.nodeName(), _metrics(node)))
    it = node.children().iterator()
    while it.hasNext():
        walk(it.next(), depth + 1, out)
    return out


def profile(spark, name: str, sf_dir: str, as_json: bool) -> None:
    df = get_spec(name).fn(spark, sf_dir)
    n = len(df.collect())
    rows = walk(df._jdf.queryExecution().executedPlan())
    if as_json:
        print(
            json.dumps(
                {
                    "query": name,
                    "result_rows": n,
                    "plan": [
                        {"depth": d, "node": nm, **m} for d, nm, m in rows
                    ],
                }
            )
        )
        return
    print(f"== {name} ({n} result rows) ==")
    for d, nm, m in rows:
        mtxt = ", ".join(f"{k}={v}" for k, v in m.items())
        print("  " * d + nm + (f"  [{mtxt}]" if mtxt else ""))
    spills = [(nm, m["spillSize"]) for _, nm, m in rows if m.get("spillSize")]
    if spills:
        print("!! spills:", spills)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()
    spark = get_spark(app_name="profile_query")
    for name in args.queries:
        profile(spark, name, args.sf, args.json)


if __name__ == "__main__":
    main()
