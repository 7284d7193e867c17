"""Driver-gate composition guard.

The driver's CORRECTNESS check verifies a prefix of queries() (50
entries observed in round 1). These tests pin that every north-star
operator family and every §2.A/B/C query sits inside that window, and
that reordering never drops or duplicates a registered query.
"""

from mapreduce_distributed_systems_spark.plans.registry import (
    GATE_ORDER,
    all_specs,
)

DRIVER_GATE_WINDOW = 50

# Round-4 gate policy (VERDICT r3 items 1-2): head = the three queries
# broken by the r3 TIMESTAMP_NTZ environment change and fixed in r4,
# plus ann_ivf_kmeans (output reworked to hash-checkable); then the
# stale-cert slice — queries whose only driver row predates the NTZ
# environment change. Everything here MUST sit inside the driver's
# 50-entry window.
BROKEN_FIXED_R4 = {
    "events_tumbling_streaming", "events_sessionize_streaming",
    "kv_snapshot_compaction",
}

CHANGED_R4 = {
    # output/plan changed this round — must be re-certified
    "ann_ivf_kmeans",
}

STALE_R1_ONLY = {
    # only driver row is r1 (pre-NTZ environment): the §2.D
    # relational/window/set/function certification set
    "q4_order_priority", "q6_forecast_revenue", "q10_returned_items",
    "q14_promo_effect", "q18_large_orders", "q19_discounted_revenue",
    "q22_sales_opportunity",
    "agg_distinct_priority", "agg_max_by", "agg_stats_segment",
    "cube_returnflag_linestatus", "grouping_sets_orders",
    "rollup_status_priority", "pivot_status_by_priority", "top_k_orders",
    "join_anti_parts", "join_semi_customers", "join_left_outer",
    "join_full_outer", "asof_purchase_view",
    "set_union", "set_intersect", "set_intersect_all",
    "set_except", "set_except_all",
    "window_lag_lead", "window_rank_top3", "window_running_total",
    "window_range_30d", "window_value_picks",
    "scalar_funcs", "string_funcs_ext", "date_funcs_ext", "array_ops",
    "events_json_props", "events_tumbling_hourly", "events_sliding_1h_30m",
}

STALE_R2_PRIORITY = {
    # only driver row is r2; highest-value members claim the remaining
    # window slots (the rest rotate in round 5)
    "events_sessionize", "kv_get_lookup", "dedup_ngram_jaccard",
    "inverted_index_bucketed", "dedup_embedding_cosine",
}

NEW_R4_GATED = {
    # round-4 §2-completion queries whose first driver row lands now:
    # C14, the golden-oracle controller upgrades, C6 at storage
    "shard_serve_during_migration", "shard_rebalance_history",
    "shard_migration_moves", "kv_snapshot_manifest_replay",
}

MUST_GATE = (
    BROKEN_FIXED_R4 | CHANGED_R4 | STALE_R1_ONLY | STALE_R2_PRIORITY
    | NEW_R4_GATED
)


def test_gate_order_names_are_registered():
    specs = all_specs()
    unknown = [n for n in GATE_ORDER if n not in specs]
    assert unknown == [], f"GATE_ORDER references unregistered queries: {unknown}"


def test_gate_order_has_no_duplicates():
    assert len(GATE_ORDER) == len(set(GATE_ORDER))


def test_all_must_gate_queries_inside_driver_window():
    window = list(all_specs())[:DRIVER_GATE_WINDOW]
    missing = MUST_GATE - set(window)
    assert missing == set(), (
        f"north-star/core queries outside the driver's first "
        f"{DRIVER_GATE_WINDOW} entries: {sorted(missing)}"
    )


def test_reordering_preserves_full_registry():
    specs = all_specs()
    assert len(specs) == len(set(specs)), "duplicate names after reorder"
    # prefix is exactly GATE_ORDER
    assert list(specs)[: len(GATE_ORDER)] == list(GATE_ORDER)
