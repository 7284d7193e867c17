"""Regenerate PLANS.md: physical-plan feature summary for the bench
set at sf0.01 —

    python -m mapreduce_distributed_systems_spark.plans.dump_plans

For each headline query: exchange count (shuffles), broadcast joins,
whole-stage-codegen spans, single-partition exchanges (should be rare
and O(1)-row), and pushed parquet filters. The numbers are extracted
from `executedPlan`, so the doc is evidence, not narrative; the
invariants worth enforcing live in tests/test_plans.py.
"""

from __future__ import annotations

import os
import re

from mapreduce_distributed_systems_spark.plans.registry import bench_specs
from mapreduce_distributed_systems_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def render() -> str:
    spark = get_spark("dump-plans")
    lines = [
        "# PLANS — physical-plan features of the bench set",
        "",
        f"Auto-generated from `executedPlan` at {SF_DIR}. Regenerate with",
        "`python -m mapreduce_distributed_systems_spark.plans.dump_plans`.",
        "",
        "- **exchanges**: DISTINCT shuffle boundaries, deduped by",
        "  partitioning expression with ids stripped (tree printing",
        "  repeats shared subtrees, and AQE's exchange-reuse race",
        "  decides nondeterministically whether a shared shuffle",
        "  prints once or twice — the deduped count is a function of",
        "  plan shape only). Known UNDERCOUNT for repeated-key plans:",
        "  genuinely distinct shuffles with identical id-stripped keys",
        "  collapse to one (an iterative query that re-shuffles on the",
        "  same column every round — e.g. PageRank's per-iteration",
        "  hashpartitioning(dst) — reads as 1); the column is a",
        "  distinct-shuffle-KEY count, not a stage count. Lower = less",
        "  data over the network at 100 TB; 0 = fuses into the scan.",
        "- **bcast**: BroadcastHashJoin count (dims never shuffle the",
        "  fact side).",
        "- **codegen**: WholeStageCodegen spans (JVM-compiled pipelines).",
        "- **1-part**: Exchange SinglePartition count — legitimate only",
        "  for O(1)-row scalars (global aggregates, TakeOrdered merge).",
        "- **sortagg**: SortAggregate count in the final plan — a",
        "  non-hashable aggregate buffer (min/max over strings or",
        "  structs) falls out of hash aggregation; the bench set is",
        "  kept at ZERO (r5 and r13 both paid for one), so any new",
        "  SortAggregate is a reviewed decision, not an accident.",
        "- **pushed**: parquet-level pushed filters present.",
        "",
        "| Query | exchanges | bcast | codegen | 1-part | sortagg | pushed |",
        "|---|---|---|---|---|---|---|",
    ]
    for name, spec in bench_specs().items():
        # cache-cold per query: a cache left by a previous query (or,
        # when called from the test suite, by an earlier test) changes
        # how cached subtrees print and with them the feature counts —
        # the table must be a function of the CODE, not session history
        spark.catalog.clearCache()
        df = spec.fn(spark, SF_DIR)
        # execute THIS DataFrame's own query execution (collect, not a
        # noop write — a write is a separate execution and would leave
        # this plan's AQE un-finalized): only the final plan carries
        # codegen spans and runtime join choices
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        # an executed AdaptiveSparkPlan prints "== Final Plan ==" then
        # "== Initial Plan ==" — count features in the final section
        # only (truncate at the first initial marker; nested cached
        # plans beyond it contribute a small undercount, never double)
        plan_full = plan
        plan = plan.split("== Initial Plan ==")[0]
        # exchanges are counted over the FULL string (final + initial
        # sections), as DISTINCT partitioning expressions with ids
        # stripped. Two sources of nondeterminism in the final section
        # forced this: tree printing repeats shared subtrees, and
        # AQE's exchange-reuse race decides at runtime whether a
        # shared subtree prints in full or collapses to a one-line
        # ReusedExchange reference (which hides the shuffles inside
        # it) — ann_lsh_bucketed flipped 6<->7 (raw) and 4<->5
        # (deduped-final) across otherwise identical sessions. The
        # initial plan is pure Catalyst output — every planned shuffle
        # boundary, deterministically — so the deduped union is a
        # function of plan shape only; runtime join conversions remain
        # visible in the bcast column, which reads the final plan.
        ex_lines = re.findall(
            r"Exchange (?:hashpartitioning|rangepartitioning)\([^\n]*",
            plan_full,
        )
        n_ex = len({re.sub(r"#\d+L?|plan_id=\d+", "", ln) for ln in ex_lines})
        n_bc = plan.count("BroadcastHashJoin")
        # codegen spans deduped by id-stripped CONTENT, same trick as
        # the exchange column: tree printing repeats shared subtrees
        # (two InMemoryTableScans of one cached relation print its
        # child plan twice, with fresh codegen ids the second time, or
        # collapse — an AQE print race observed flipping the raw
        # distinct-id count 10<->11 across otherwise identical
        # sessions on retrieval_rrf_fusion_ivf after its r13 cache
        # materialization). Distinct REAL spans with byte-identical
        # stripped content collapse to one — the same documented
        # undercount class as repeated-key exchanges.
        cg_spans: dict[str, list[str]] = {}
        for ln in plan.splitlines():
            m = re.search(r"\*\((\d+)\)", ln)
            if m:
                cg_spans.setdefault(m.group(1), []).append(
                    re.sub(r"#\d+L?|plan_id=\d+|\*\(\d+\)", "", ln)
                )
        n_cg = len({"\n".join(v) for v in cg_spans.values()})
        n_sp = plan.count("Exchange SinglePartition")
        n_sa = plan.count("SortAggregate")
        pushed = "yes" if "PushedFilters: [" in plan and "PushedFilters: []" not in plan else ""
        lines.append(
            f"| `{name}` | {n_ex} | {n_bc} | {n_cg} | {n_sp} | {n_sa} "
            f"| {pushed} |"
        )
    return "\n".join(lines) + "\n"


if __name__ == "__main__":
    with open("PLANS.md", "w") as f:
        f.write(render())
    print("PLANS.md regenerated")
