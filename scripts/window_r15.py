"""Pre-staged round-15 ``_PRIORITY`` window (the window_r9..r14
pattern, VERDICT r7 ask #8 lineage).

Computed by scripts/rotate_window.suggest_window against the committed
CORRECTNESS_r01..r13 history PLUS a simulated all-green round 14 over
the LIVE round-14 window — PRIORITY_R14 amended with the two mid-r14
registrations (flagship_reconcile_mutated then
flagship_reconcile_streamed took the front slots;
a_order_to_ship_latency and sink_snapshot_diff, both green r8, were
displaced to this list).  With the never-checked backlog otherwise
zero, every slot is again a round-robin refresh: the 50 entries whose
latest green is OLDEST — the two displaced r8 fills, then the rest of
the r8 cohort and the earliest r9 cohort — in (latest_green,
registration) order.

At round-15 start the rotation is a one-commit act:

    from rotate_window import amend_window
    _PRIORITY = amend_window(PRIORITY_R15, <real r14 misses> +
                             <mid-r14 entries never driver-checked>)

``amend_window`` moves any real CORRECTNESS_r14 misses to the front
and drops displaced refresh fills from the tail.  Entries registered
mid-r14 AFTER this file was staged would be never-checked at r15
start; prepend them after the misses — ``suggest_window`` over the
then-current catalog reproduces the exact list.
tests/test_entry_contract.py verifies this list under both simulated
histories (all-green r14, and r14-with-misses amended via
amend_window).
"""

PRIORITY_R15 = [
    "a_order_to_ship_latency",  # green r8 (displaced r14 refresh fill)
    "sink_snapshot_diff",  # green r8
    "x_largest_remainder_alloc",  # green r8
    "a_spearman_corr",  # green r8
    "a_runs_test",  # green r8
    "events_haar_energy",  # green r8
    "a_laspeyres_price_index",  # green r8
    "a_skyline_pareto_2d",  # green r8
    "dq_referential_integrity",  # green r8
    "a_wasserstein_1d",  # green r8
    "a_did_estimate",  # green r8
    "events_circular_hour_stats",  # green r8
    "a_simpsons_detector",  # green r8
    "events_entropy_rate",  # green r8
    "events_user_streaks",  # green r8
    "a_hhi_concentration",  # green r8
    "source_parquet_metadata",  # green r8
    "x_fiscal_445_calendar",  # green r8
    "a_abc_xyz_matrix",  # green r8
    "events_lead_lag_xcorr",  # green r8
    "x_interval_coalesce",  # green r8
    "a_mann_kendall",  # green r8
    "source_csv_corrupt_recovery",  # green r8
    "a_kruskal_wallis",  # green r8
    "j_left_semi_matched",  # green r9
    "j_cross_product",  # green r9
    "j_broadcast_dims",  # green r9
    "p_transform_chain",  # green r9
    "f_filter_chain",  # green r9
    "x_string_functions",  # green r9
    "p_rownum_synth",  # green r9
    "a_bool_all_guard",  # green r9
    "a_collect_set_per_group",  # green r9
    "x_hierarchy_closure",  # green r9
    "a_hierarchy_levels",  # green r9
    "layout_zorder_prune",  # green r9
    "layout_compacted_scan",  # green r9
    "events_interval_join",  # green r9
    "events_range_join_left",  # green r9
    "x_hierarchy_deep_levels",  # green r9
    "w_window_suite",  # green r9
    "events_gapfill",  # green r9
    "events_funnel",  # green r9
    "events_asof_join",  # green r9
    "mm_jpeg_decode",  # green r9
    "mm_jpeg_color_420",  # green r9
    "mm_jpeg_progressive",  # green r9
    "text_ngram_novelty",  # green r9
    "mm_jpeg_thumbnail",  # green r9
    "mm_gif_decode",  # green r9
]
