"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship reconciliation query at sf0.001;
``queries()`` exposes the full operator catalog (one entry per
implemented operator family from SURVEY.md §2, plus the LLM-pipeline
extensions); ``oracle_sql()`` gives the DuckDB-equivalent ANSI SQL for
the differential correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from graphql_api_etl_spark.queries import QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    fn, _ = QUERIES["flagship_reconcile"]
    return fn(spark, "/root/testdata/sf0.001")


# The driver's correctness gate checks the FIRST 50 catalog entries.
# Round-8 window: the pre-staged scripts/window_r8.py list AMENDED per
# its own round-start policy (rotate_window.amend_window) with the one
# real r7 miss — x_decimal_money_exact (hash-fail in CORRECTNESS_r07,
# reshaped this round to representation-proof BIGINT fixed-point per
# VERDICT r7 ask #2) moves to the FRONT and the last refresh fill
# (j_left_semi_matched, green r3) drops from the tail. The other 49
# slots are the 48 entries that had never been driver-checked (34
# pre-r7 registrations + 14 mid-r7 additions) plus one r3 refresh
# fill; after this round, EVERY catalog entry has a driver row
# (tests/test_entry_contract.py asserts the invariant against the
# committed CORRECTNESS_r01..r07 history). Entries outside the window
# stay green on the local driver-replica gate
# (tests/test_oracle_diff.py) at sf0.01 before each commit.
_PRIORITY = [
    "x_decimal_money_exact",  # MISS r7 (re-check the fix first)
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
]
def _ordered() -> list[str]:
    front = [n for n in _PRIORITY if n in QUERIES]
    rest = [n for n in QUERIES if n not in set(front)]
    return front + rest


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: QUERIES[name][0] for name in _ordered()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query. Callable oracles are built
    lazily here (they embed data-derived literals — e.g. the IVF
    oracle's trained centroids). A callable that fails to build must
    cost only ITS entry (omitted → that one records no_oracle), never
    the whole gate."""
    out: dict[str, str] = {}
    for name in _ordered():
        oracle = QUERIES[name][1]
        if oracle is None:
            continue
        if callable(oracle):
            try:
                out[name] = oracle()
            except Exception:  # noqa: BLE001 — degrade to a single-entry miss
                continue
        else:
            out[name] = oracle
    return out
