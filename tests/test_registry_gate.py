"""Driver-gate composition guard.

The driver's CORRECTNESS check verifies a prefix of queries() (50
entries observed in rounds 1-4). These tests pin that every query the
round-5 rotation owes a driver row sits inside that window, and that
reordering never drops or duplicates a registered query.
"""

from mapreduce_distributed_systems_spark.plans.registry import (
    GATE_ORDER,
    all_specs,
)

DRIVER_GATE_WINDOW = 50

# Round-5 gate policy (VERDICT r4 item 1 + the registry's r4 rotation
# note): head = queries whose code or oracle changed after their newest
# driver row, then the round-4 additions with no driver row, then the
# r2-only stale slice. Everything here MUST sit inside the driver's
# 50-entry window.
CHANGED_AFTER_NEWEST_ROW = {
    "dedup_exact",            # r4 md5 re-key; newest row r3
    "pipeline_clean_corpus",  # r4 md5 re-key; newest row r3
    "dedup_repeated_passages",       # r5 oracle window-stop fix
    "corpus_decontamination_ngram",  # r5 oracle window-stop fix
    "kmeans_cells",           # r5 rows-only -> integer-exact hash oracle
}

NO_DRIVER_ROW_YET = {
    # round-4 additions certified only by pytest parity so far
    "kv_get_time_travel", "dedup_minhash_estimate",
    "events_tumbling_streaming_append", "corpus_decontamination",
    "sketch_kmv_distinct", "dedup_embedding_cosine_ivf",
    # round-5 additions — first external row this round
    "ann_recall_at_k", "sketch_kmv_merge",
    "dedup_canonical_pick", "chunk_documents",
}

STALE_R2_ONLY = {
    # newest driver row is r2 (pre-NTZ environment)
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier",
    "wc_mr_facade", "dataset_split_assign", "dedup_lsh_bucket_stats",
    "doc_fingerprint", "embedding_centroids", "embedding_quantize_int8",
    "lang_id_confusion", "profile_orders", "sample_deterministic_10pct",
    "shard_pruned_read", "skew_salted_agg", "token_count_methods",
    "window_ntile_pctrank",
}

MUST_GATE = CHANGED_AFTER_NEWEST_ROW | NO_DRIVER_ROW_YET | STALE_R2_ONLY


def test_gate_order_names_are_registered():
    specs = all_specs()
    unknown = [n for n in GATE_ORDER if n not in specs]
    assert unknown == [], f"GATE_ORDER references unregistered queries: {unknown}"


def test_gate_order_has_no_duplicates():
    assert len(GATE_ORDER) == len(set(GATE_ORDER))


def test_gate_order_fills_the_window():
    assert len(GATE_ORDER) == DRIVER_GATE_WINDOW, (
        f"GATE_ORDER has {len(GATE_ORDER)} entries; the driver window is "
        f"{DRIVER_GATE_WINDOW} — every slot should carry a query that "
        "needs a fresh row"
    )


def test_all_must_gate_queries_inside_driver_window():
    window = list(all_specs())[:DRIVER_GATE_WINDOW]
    missing = MUST_GATE - set(window)
    assert missing == set(), (
        f"round-5 certification debt outside the driver's first "
        f"{DRIVER_GATE_WINDOW} entries: {sorted(missing)}"
    )


def test_reordering_preserves_full_registry():
    specs = all_specs()
    assert len(specs) == len(set(specs)), "duplicate names after reorder"
    # prefix is exactly GATE_ORDER
    assert list(specs)[: len(GATE_ORDER)] == list(GATE_ORDER)


def test_driver_queries_wrapper_isolates_cache(spark, sf_dir):
    """The driver runs 133 queries back-to-back in one session; some
    cache bounded intermediates they cannot unpersist before returning
    (the caller materializes after the function returns). The contract
    shim must therefore evict leftover blocks at each query's entry so
    caches never accumulate across the session (ADVICE r4)."""
    import importlib

    entry_mod = importlib.import_module("__spark_entry__")
    leftover = spark.range(100).cache()
    leftover.count()  # materialize so storage actually holds blocks
    df = entry_mod.queries()["wc"](spark, sf_dir)
    # is_cached is a stale python-side flag after clearCache; the
    # authoritative signal is the storage level losing memory+disk
    lvl = leftover.storageLevel
    assert not (lvl.useMemory or lvl.useDisk), "previous query's cache survived"
    assert df.count() > 0
