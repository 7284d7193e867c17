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
    "mapreduce_distributed_systems_spark.operators.retrieval",
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
    "mapreduce_distributed_systems_spark.operators.dup_spans",
    "mapreduce_distributed_systems_spark.operators.semdedup",
    "mapreduce_distributed_systems_spark.operators.chunking",
    "mapreduce_distributed_systems_spark.storage.snapshots",
    "mapreduce_distributed_systems_spark.storage.vector_index",
    "mapreduce_distributed_systems_spark.storage.lexical_index",
    "mapreduce_distributed_systems_spark.streaming.index_stream",
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
    # Callables whose SOURCE participates in fn_fingerprint alongside
    # the registered callable's own (ADVICE r12 #2): when a query's
    # certified semantics live partly in a shared module-level helper
    # (the r12 _rrf_fuse factoring), declare it here so an edit to the
    # helper drifts the fingerprint and the staleness gate demands a
    # re-cert — instead of silently bypassing the machinery the old
    # inline body protected. Opt-in: helpers covered by test_parity.py
    # alone stay outside, exactly as before.
    helpers: tuple[Callable, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, QuerySpec] = {}
_LOADED = False


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    bench: bool = False,
    doc: str = "",
    helpers: tuple[Callable, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, tags=tuple(tags), bench=bench,
            doc=doc or (fn.__doc__ or ""), helpers=tuple(helpers),
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
# prefix of queries() (50 entries observed in rounds 1-13), so ordering
# decides which queries get the hard external oracle signal. The window
# ROTATES per round. Round-14 composition (computed mechanically by
# tools/plan_window.py from the folded r1-r13 evidence; RE-PLANNED
# after this second optimization round's fn-source/helper changes —
# VERDICT r13 #1c demanded the shared helpers whose edits relocated
# behavior in r13 (kmeans_fit_int8, _train_merges, write_bm25_index /
# build_and_commit_bm25, _bm25_relations) be DECLARED on their
# consumers' specs, which drifts those fingerprints into the window):
#   (a) the 7 r9-cohort names that spilled at r13 and cross the hard
#       >3-stale floor (stratified_sample_per_lang, text_quality,
#       text_token_rarity, token_count_methods, wc, wc_mr_facade,
#       window_ntile_pctrank) head the window;
#   (b) changed-fingerprint queries: every consumer of the r13/r14
#       optimization helpers now declared in `helpers=` — the BM25
#       single-pass build family (doc_bm25_serve, doc_bm25_serve_post_gc,
#       bm25_index_version_diff, retrieval_phrase_match, doc_bm25_topk,
#       retrieval_quality_*), the kmeans driver-fit consumers
#       (dedup_semantic_semdedup, dedup_embedding_cosine_ivf,
#       kmeans_cells(+two_level), ann_ivf_*, retrieval_rrf_fusion_ivf),
#       the BPE pair (bpe_train_merges, bpe_encode_corpus), and the KV
#       literal-cutoff trio (kv_snapshot_manifest_replay,
#       kv_get_time_travel, kv_version_diff);
#   (c) planning-cohort (exactly-3-old r10 names) fill the remaining
#       slots alphabetically; the spill heads r15.
# Everything outside the window stays covered by tests/test_parity.py,
# which runs the same DuckDB oracles every session. Certified-by-round
# map: COVERAGE.md / QUERIES.md.
GATE_ORDER = (
    # -- changed-fingerprint (24) --
    "ann_ivf_index_append",
    "ann_ivf_kmeans",
    "ann_ivf_persisted",
    "ann_recall_curve",
    "bm25_index_streaming_append",
    "bm25_index_version_diff",
    "bpe_encode_corpus",
    "bpe_train_merges",
    "curation_top_quality_per_source",
    "dedup_embedding_cosine_ivf",
    "dedup_semantic_semdedup",
    "doc_bm25_serve",
    "doc_bm25_serve_post_gc",
    "doc_bm25_topk",
    "ivf_index_cell_stats",
    "kmeans_cells",
    "kmeans_cells_two_level",
    "kv_get_time_travel",
    "kv_snapshot_manifest_replay",
    "kv_version_diff",
    "retrieval_phrase_match",
    "retrieval_quality_bm25_rrf",
    "retrieval_quality_sampled",
    "retrieval_rrf_fusion_ivf",
    # -- hard-stale (7) --
    "stratified_sample_per_lang",
    "text_quality",
    "text_token_rarity",
    "token_count_methods",
    "wc",
    "wc_mr_facade",
    "window_ntile_pctrank",
    # -- planning refresh (19) --
    "agg_percentiles",
    "ann_cosine_int8",
    "corpus_bigram_topk",
    "corpus_decontamination_fuzzy",
    "data_quality_audit",
    "dedup_exact_hash",
    "dedup_exact_normalized",
    "dedup_simhash",
    "dedup_soft_weights",
    "doc_tfidf_topterms",
    "early_exit",
    "events_anomaly_mad",
    "events_attribution_streaming",
    "events_cms_streaming",
    "events_daily_trend",
    "events_dedup_streaming",
    "events_gap_fill_hourly",
    "events_multi_grain_rollup",
    "events_range_join_concurrent",
)

# Round-15 rotation note: the r14 spill (planning-cohort names listed
# by tools/plan_window.py at the r14 close) heads the r15 window,
# followed by whatever r14 fingerprints the r15 build moves. Recompute
# from cert_state at r15 open (fold CORRECTNESS_r14.json first —
# round-open checklist step 1), then run tools/plan_window.py and
# paste.
#
# The ROUND-15 registration candidate (staged r13 with code + oracle
# + dual-fixture parity tests, the discipline every registration has
# followed since r10; NOT registered at r14 — an optimization round
# adds no new query scope):
#   pipeline_chunk_index       operators/chunk_index.py
#                              (chunk relation -> deterministic
#                              embedding -> IVF frozen-centroid
#                              append — the chunk->ANN ingest
#                              composition VERDICT r12 #4 asked for)
#
# REGISTRY-SIZE CEILING (steady-state arithmetic): the driver window
# refreshes 50 rows/round and the enforced staleness floor
# (tests/test_registry_gate.py
# test_stale_certifications_queued_in_window) allows a row to age at
# most 4 rounds, so the registry can sustain AT MOST 50 x 4 = 200
# registered queries. Trajectory: 194 after the r11 merge, +3 (r12
# trio) -1 (r12 merge) = 196, +2 at r13 (dedup_span_rewrite +
# doc_chunking — the r12-staged chunking PAIR landed as one rel-keyed
# query, the THIRD executed merge, decided before either half
# registered exactly as the ceiling policy demands) = 198 now; +1
# (r14 chunk->ANN composition) = 199 — AT the practical ceiling.
# No further merges are pre-identified; prefer deepening existing
# certified families over net-new registrations, and identify the
# next merge before registering past 199 (candidate: doc_tfidf_topterms
# ranks by the same tf/df statistics the BM25 index persists — it
# could re-key through the index tables if a slot is ever needed).

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

    def _fn_src(fn) -> str:
        src_lines = inspect.getsource(fn).splitlines(keepends=True)
        first_def = next(
            i for i, ln in enumerate(src_lines)
            if ln.lstrip().startswith("def ")
        )
        return "".join(src_lines[first_def:])

    src = _fn_src(spec.fn)
    # declared helpers (ADVICE r12 #2): their source is part of the
    # certified definition — an edit must drift the fingerprint
    for helper in spec.helpers:
        src += "\x00" + _fn_src(helper)
    return hashlib.sha256(
        (src + "\x00" + (spec.oracle or "")).encode()
    ).hexdigest()
