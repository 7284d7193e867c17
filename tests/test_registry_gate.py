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

# Round-3 gate policy (VERDICT r2 item 1): the window head is every
# query that has never had a driver CORRECTNESS row (the 24 round-2
# additions), followed by a re-certification slice led by the queries
# whose code changed in round 3. Everything here MUST sit inside the
# driver's 50-entry window.
NEVER_CHECKED_R2 = {
    "q7_volume_shipping", "q8_market_share", "q9_product_profit",
    "q12_ship_priority", "q13_customer_distribution", "q15_top_supplier",
    "q16_part_supplier_cnt", "q17_small_qty_revenue",
    "q20_excess_suppliers", "q21_waiting_suppliers",
    "agg_percentiles", "map_ops", "unpivot_status_priority",
    "skew_salted_join",
    "events_range_join_concurrent", "events_funnel_conversion",
    "events_weekly_retention", "events_sessionize_streaming",
    "dedup_simhash", "dedup_repeated_passages", "text_token_rarity",
    "corpus_bigram_topk", "ann_cosine_int8", "ann_ivf_kmeans",
}

CHANGED_R3 = {
    # code changed this round — must be re-certified by the driver
    "mixture_weighted_sample", "stratified_sample_per_lang",
    "dedup_exact_hash", "text_token_rarity", "kv_replay_final",
}

NEW_R3 = {
    # registered for the first time in round 3 — a gate slot or they
    # inherit the round-2 never-checked disease
    "dedup_exact_normalized",
}

MUST_GATE = NEVER_CHECKED_R2 | CHANGED_R3 | NEW_R3


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
