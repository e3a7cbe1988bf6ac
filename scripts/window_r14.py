"""Pre-staged round-14 ``_PRIORITY`` window (the window_r9..r13
pattern, VERDICT r7 ask #8 lineage).

Computed by scripts/rotate_window.suggest_window against the committed
CORRECTNESS_r01..r12 history PLUS a simulated all-green round 13 over
the LIVE round-13 window — PRIORITY_R13 amended with the two mid-r13
registrations (flagship_reconcile_healed + j_skew_aware took the front
slots; a_heavy_hitters_cms and stream_static_enrich_join, both green
r7, were displaced to this list).  With the never-checked backlog
otherwise zero, every slot is again a round-robin refresh: the 50
entries whose latest green is OLDEST — the two displaced r7 fills,
then the rest of the r7 cohort — in (latest_green, registration)
order.

At round-14 start the rotation is a one-commit act:

    from rotate_window import amend_window
    _PRIORITY = amend_window(PRIORITY_R14, <real r13 misses> +
                             <mid-r13 entries never driver-checked>)

``amend_window`` moves any real CORRECTNESS_r13 misses to the front
and drops displaced refresh fills from the tail.  Entries registered
mid-r13 AFTER this file was staged would be never-checked at r14
start; prepend them after the misses — ``suggest_window`` over the
then-current catalog reproduces the exact list.
tests/test_entry_contract.py verifies this list under both simulated
histories (all-green r13, and r13-with-misses amended via
amend_window).
"""

PRIORITY_R14 = [
    "stream_static_enrich_join",  # green r7
    "a_heavy_hitters_cms",  # green r7
    "j_fuzzy_blocked",  # green r7
    "events_hypertable_rollup",  # green r7
    "a_ab_test_ztest",  # green r7
    "a_mad_outliers",  # green r7
    "a_abc_pareto",  # green r7
    "events_resample_interpolate",  # green r7
    "ts_sax_symbols",  # green r7
    "ts_similarity_topk",  # green r7
    "a_forecast_seasonal_naive",  # green r7
    "dq_table_checksums",  # green r7
    "source_xml_records",  # green r7
    "a_dow_seasonality",  # green r7
    "a_growth_accounting",  # green r7
    "a_decile_lift",  # green r7
    "events_slo_error_budget",  # green r7
    "a_contingency_chisq",  # green r7
    "dq_pseudonymize",  # green r7
    "a_weighted_median",  # green r7
    "events_cusum_changepoint",  # green r7
    "events_sma_crossover",  # green r7
    "j_left_anti_unmatched",  # green r8
    "mm_audio_zero_crossings",  # green r8
    "mm_image_edge_density",  # green r8
    "text_bpe_merges",  # green r8
    "text_bpe_tokenize",  # green r8
    "graph_pagerank_dangling",  # green r8
    "graph_kcore",  # green r8
    "graph_harmonic_centrality",  # green r8
    "stream_late_data_drop",  # green r8
    "stream_stream_interval_join",  # green r8
    "stream_threshold_crossings",  # green r8
    "x_decimal_money_exact",  # green r8
    "a_adoption_curve",  # green r8
    "a_repeat_purchase_rate",  # green r8
    "a_kmv_distinct_sketch",  # green r8
    "a_hll_registers",  # green r8
    "a_mannwhitney_u",  # green r8
    "a_gini_concentration",  # green r8
    "dq_functional_deps",  # green r8
    "a_poisson_bootstrap_ci",  # green r8
    "dq_psi_drift",  # green r8
    "a_ks_two_sample",  # green r8
    "events_theilsen_trend",  # green r8
    "events_attribution_credit",  # green r8
    "a_ab_cuped_adjust",  # green r8
    "a_ab_power_analysis",  # green r8
    "a_order_to_ship_latency",  # green r8
    "sink_snapshot_diff",  # green r8
]
