"""Pre-staged round-8 ``_PRIORITY`` window (VERDICT r6 ask #7).

Computed by scripts/rotate_window.py policy against the committed
CORRECTNESS_r01..r06 history PLUS a simulated all-green round 7 over
the round-7 window: the 48 entries that will still be never-driver-
checked after r7 — 34 pre-r7 registrations in registration order plus
the fourteen mid-r7 registrations (``graph_pagerank_dangling`` per
VERDICT r6 ask #8, ``text_bpe_merges``, ``mm_audio_zero_crossings``,
``mm_image_edge_density``, ``graph_kcore``, ``stream_late_data_drop``,
``text_bpe_tokenize``, ``x_interval_coalesce``,
``graph_harmonic_centrality``, ``stream_stream_interval_join``,
``a_mann_kendall``, ``stream_threshold_crossings``,
``source_csv_corrupt_recovery``, ``a_kruskal_wallis``) — then 2
oldest-green entries (last green in r3) as round-robin refresh fills.
After r8, NOTHING is left never-driver-checked
(tests/test_entry_contract.py asserts it).

At round-8 start the rotation is a one-commit act: copy
``PRIORITY_R8`` into ``__spark_entry__._PRIORITY`` (and, if the real
CORRECTNESS_r07.json shows misses, move those to the front first).
DONE at r8 start: the real r7 miss was ``x_decimal_money_exact``, so
the live window is ``rotate_window.amend_window(PRIORITY_R8,
["x_decimal_money_exact"])`` — verified by tests/test_entry_contract.py
::test_current_window_is_the_amended_prestaged_r8_list. The r9 window
is pre-staged in scripts/window_r9.py.
"""

PRIORITY_R8 = [
    "mm_audio_zero_crossings",  # never-checked
    "mm_image_edge_density",  # never-checked
    "text_bpe_merges",  # never-checked
    "text_bpe_tokenize",  # never-checked
    "graph_pagerank_dangling",  # never-checked
    "graph_kcore",  # never-checked
    "graph_harmonic_centrality",  # never-checked
    "stream_late_data_drop",  # never-checked
    "stream_stream_interval_join",  # never-checked
    "stream_threshold_crossings",  # never-checked
    "a_adoption_curve",  # never-checked
    "a_repeat_purchase_rate",  # never-checked
    "a_kmv_distinct_sketch",  # never-checked
    "a_hll_registers",  # never-checked
    "a_mannwhitney_u",  # never-checked
    "a_gini_concentration",  # never-checked
    "dq_functional_deps",  # never-checked
    "a_poisson_bootstrap_ci",  # never-checked
    "dq_psi_drift",  # never-checked
    "a_ks_two_sample",  # never-checked
    "events_theilsen_trend",  # never-checked
    "events_attribution_credit",  # never-checked
    "a_ab_cuped_adjust",  # never-checked
    "a_ab_power_analysis",  # never-checked
    "a_order_to_ship_latency",  # never-checked
    "sink_snapshot_diff",  # never-checked
    "x_largest_remainder_alloc",  # never-checked
    "a_spearman_corr",  # never-checked
    "a_runs_test",  # never-checked
    "events_haar_energy",  # never-checked
    "a_laspeyres_price_index",  # never-checked
    "a_skyline_pareto_2d",  # never-checked
    "dq_referential_integrity",  # never-checked
    "a_wasserstein_1d",  # never-checked
    "a_did_estimate",  # never-checked
    "events_circular_hour_stats",  # never-checked
    "a_simpsons_detector",  # never-checked
    "events_entropy_rate",  # never-checked
    "events_user_streaks",  # never-checked
    "a_hhi_concentration",  # never-checked
    "source_parquet_metadata",  # never-checked
    "x_fiscal_445_calendar",  # never-checked
    "a_abc_xyz_matrix",  # never-checked
    "events_lead_lag_xcorr",  # never-checked
    "x_interval_coalesce",  # never-checked
    "a_mann_kendall",  # never-checked
    "source_csv_corrupt_recovery",  # never-checked
    "a_kruskal_wallis",  # never-checked
    "j_left_anti_unmatched",  # green r3 refresh
    "j_left_semi_matched",  # green r3 refresh
]
