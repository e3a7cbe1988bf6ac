"""Pre-staged round-13 ``_PRIORITY`` window (the window_r9..r12
pattern, VERDICT r7 ask #8 lineage).

Computed by scripts/rotate_window.suggest_window against the committed
CORRECTNESS_r01..r11 history PLUS a simulated all-green round 12 over
the LIVE round-12 window — PRIORITY_R12 amended with the mid-r12
flagship_reconcile_bucketed registration, which took the front slot
and displaced x_math_functions (green r6).  With the never-checked
backlog otherwise zero, every slot is again a round-robin refresh:
the 50 entries whose latest green is OLDEST — x_math_functions, the
r6 remainder, then the earliest r7 cohort — in (latest_green,
registration) order.

At round-13 start the rotation is a one-commit act:

    from rotate_window import amend_window
    _PRIORITY = amend_window(PRIORITY_R13, <real r12 misses> +
                             <mid-r12 entries never driver-checked>)

``amend_window`` moves any real CORRECTNESS_r12 misses to the front
and drops displaced refresh fills from the tail.  Entries registered
mid-r12 AFTER this file was staged would be never-checked at r13
start; prepend them after the misses — ``suggest_window`` over the
then-current catalog reproduces the exact list.
tests/test_entry_contract.py verifies this list under both simulated
histories (all-green r12, and r12-with-misses amended via
amend_window).
"""

PRIORITY_R13 = [
    "x_math_functions",  # green r6
    "x_null_semantics",  # green r6
    "events_anomaly_zscore",  # green r6
    "so_union_schema_evolution",  # green r6
    "source_schema_merge_read",  # green r6
    "x_array_functions",  # green r6
    "a_corr_covar",  # green r6
    "x_regex_functions",  # green r6
    "a_filtered_agg",  # green r6
    "x_map_functions",  # green r6
    "x_edit_distance",  # green r6
    "a_histogram_bins",  # green r6
    "a_mode_per_group",  # green r6
    "events_max_concurrency",  # green r6
    "x_scd2_history",  # green r6
    "events_transition_matrix",  # green r6
    "a_rfm_scores",  # green r6
    "a_profile_columns",  # green r6
    "dq_expectations",  # green r6
    "text_sentence_split",  # green r6
    "events_ewma_trailing",  # green r6
    "a_benford_first_digit",  # green r7
    "a_quantile_buckets",  # green r7
    "a_entropy_per_group",  # green r7
    "events_interarrival_stats",  # green r7
    "a_monthly_growth",  # green r7
    "events_range_frame_sum",  # green r7
    "events_path_analysis",  # green r7
    "events_ohlc_bars",  # green r7
    "events_active_users",  # green r7
    "a_key_skew_report",  # green r7
    "source_fixed_width",  # green r7
    "a_audience_overlap",  # green r7
    "a_market_basket",  # green r7
    "x_try_cast_tolerant",  # green r7
    "a_group_ols",  # green r7
    "layout_dpp_prune",  # green r7
    "a_autocorr_lag",  # green r7
    "graph_triangle_count",  # green r7
    "graph_bfs_distances",  # green r7
    "graph_link_prediction",  # green r7
    "graph_label_propagation",  # green r7
    "graph_degree_assortativity",  # green r7
    "graph_modularity",  # green r7
    "stream_hourly_counts",  # green r7
    "stream_distinct_user_types",  # green r7
    "stream_latest_state_upsert",  # green r7
    "stream_session_windows",  # green r7
    "stream_static_enrich_join",  # green r7
    "a_heavy_hitters_cms",  # green r7
]
