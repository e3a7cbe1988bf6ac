"""Pre-staged round-10 ``_PRIORITY`` window (the window_r9.py
pattern, VERDICT r7 ask #8 lineage).

Computed by scripts/rotate_window.suggest_window against the committed
CORRECTNESS_r01..r08 history PLUS a simulated all-green round 9 over
the final round-9 window (20 never-checked mid-r8 registrations, 10
mid-r9 registrations, 20 r3 refreshes). After a green r9 the
never-checked backlog is zero for the first time, so every slot is a
round-robin refresh: the 50 entries whose latest green is OLDEST, in
(latest_green, registration) order.

At round-10 start the rotation is a one-commit act:

    from rotate_window import amend_window
    _PRIORITY = amend_window(PRIORITY_R10, <real r9 misses>)

``amend_window`` moves any real CORRECTNESS_r09 misses to the front
and drops displaced refresh fills from the tail. Entries registered
mid-r9 AFTER this file was staged (there are none — all ten mid-r9
additions are inside window_r9 itself) would be never-checked at r10
start; if any exist, prepend them after the misses — ``suggest_window``
over the then-current catalog reproduces the exact list.
tests/test_entry_contract.py verifies this list under both simulated
histories (all-green r9, and r9-with-misses amended via amend_window).
"""

PRIORITY_R10 = [
    "events_cohort_retention",  # green r3
    "a_percentiles",  # green r3
    "a_pivot_status_priority",  # green r3
    "events_json_typed",  # green r3
    "dedup_exact_groups",  # green r3
    "dedup_ngram_jaccard",  # green r3
    "dedup_simhash_pairs",  # green r3
    "text_quality_stats",  # green r3
    "text_token_counts",  # green r3
    "text_lang_id",  # green r3
    "text_fingerprint",  # green r3
    "sim_topk_lsh_bucketed",  # green r3
    "mm_binary_metadata",  # green r3
    "p_hash_sample",  # green r3
    "curate_documents",  # green r3
    "x_lookup_replace",  # green r3
    "x_name_parsing",  # green r3
    "events_sliding_window",  # green r3
    "flagship_reconcile",  # green r4
    "j_outer_provenance_counts",  # green r4
    "a_distinct_values",  # green r4
    "so_union_distinct",  # green r4
    "so_except",  # green r4
    "so_intersect",  # green r4
    "text_wordcount",  # green r4
    "j_salted_skew_join",  # green r4
    "v_count_gates",  # green r4
    "tpch_q1_pricing_summary",  # green r4
    "tpch_q3_shipping_priority",  # green r4
    "tpch_q3_bucketed",  # green r4
    "tpch_q5_local_volume",  # green r4
    "tpch_q6_forecast_revenue",  # green r4
    "tpch_q4_order_priority",  # green r4
    "tpch_q18_large_orders",  # green r4
    "tpch_q10_returned_items",  # green r4
    "tpch_q16_supplier_variety",  # green r4
    "tpch_q7_nation_volume",  # green r4
    "tpch_q13_order_distribution",  # green r4
    "tpch_q14_promo_share",  # green r4
    "tpch_q15_top_supplier",  # green r4
    "tpch_q17_small_quantity",  # green r4
    "tpch_q19_or_of_ands",  # green r4
    "tpch_q22_idle_rich",  # green r4
    "tpch_q2_min_cost_supplier",  # green r4
    "tpch_q8_market_share",  # green r4
    "tpch_q9_profit_by_nation",  # green r4
    "tpch_q11_important_stock",  # green r4
    "tpch_q12_late_shipments",  # green r4
    "tpch_q20_excess_suppliers",  # green r4
    "tpch_q21_waiting_suppliers",  # green r4
]
