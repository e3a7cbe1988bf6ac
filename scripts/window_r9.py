"""Pre-staged round-9 ``_PRIORITY`` window (VERDICT r7 ask #8).

Computed by scripts/rotate_window.suggest_window against the committed
CORRECTNESS_r01..r07 history PLUS a simulated all-green round 8 over
the round-8 window. After r8 drains the never-checked backlog to zero,
every slot is a round-robin refresh: the 50 entries whose latest green
is OLDEST (r3/r4 vintage), in (latest_green, registration) order.

At round-9 start the rotation is a one-commit act:

    from rotate_window import amend_window
    _PRIORITY = amend_window(PRIORITY_R9, <real r8 misses>)

``amend_window`` moves any real CORRECTNESS_r08 misses to the front
and drops displaced refresh fills from the tail — so a real miss does
NOT invalidate this list the way it invalidated window_r8.py's
(VERDICT r7 What's-wrong #1b). tests/test_entry_contract.py verifies
the list under BOTH simulated histories: an all-green r8 AND an r8
with misses present (amended via amend_window).

Entries registered mid-r8 (after this file was staged) are
never-checked at r9 start; if any exist, prepend them after the misses
— ``suggest_window`` over the then-current catalog reproduces the
exact list.
"""

PRIORITY_R9 = [
    "j_left_semi_matched",  # green r3
    "j_cross_product",  # green r3
    "j_broadcast_dims",  # green r3
    "p_transform_chain",  # green r3
    "f_filter_chain",  # green r3
    "x_string_functions",  # green r3
    "p_rownum_synth",  # green r3
    "a_bool_all_guard",  # green r3
    "a_collect_set_per_group",  # green r3
    "x_hierarchy_closure",  # green r3
    "a_hierarchy_levels",  # green r3
    "layout_zorder_prune",  # green r3
    "layout_compacted_scan",  # green r3
    "events_interval_join",  # green r3
    "events_range_join_left",  # green r3
    "x_hierarchy_deep_levels",  # green r3
    "w_window_suite",  # green r3
    "events_gapfill",  # green r3
    "events_funnel",  # green r3
    "events_cohort_retention",  # green r3
    "events_asof_join",  # green r3
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
]
