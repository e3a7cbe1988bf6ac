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
# Round-10 window: CORRECTNESS_r09 had ZERO misses (50/50 green), so
# the round-start act was `amend_window(PRIORITY_R10, [])` — the
# pre-staged scripts/window_r10.py suggestion verbatim (an all-refresh
# window: after the green r9 the never-checked backlog hit zero for
# the first time, so every slot went to the entries whose latest green
# is OLDEST — 18 r3 + 32 r4, the TPC-H suite and the earliest
# dedup/text/flagship entries, in (latest_green, registration) order).
# The TWO entries registered mid-r10 (j_shuffle_hash_join,
# x_try_arithmetic) are prepended per the documented mid-round policy
# (scripts/window_r10.py:18-21), displacing the two tail refresh
# fills; tests/test_entry_contract.py's
# test_current_window_is_the_amended_prestaged_r10_list verifies the
# live window equals amend_window(PRIORITY_R10, misses +
# never-checked) exactly. Entries outside the window stay green on
# the local driver-replica gate (tests/test_oracle_diff.py) at sf0.01
# before each commit.
_PRIORITY = [
    "j_shuffle_hash_join",  # never-checked (NEW mid-r10: SHJ strategy lever)
    "x_try_arithmetic",  # never-checked (NEW mid-r10: error-safe scalars)
    "events_cohort_retention",  # green r3 refresh
    "a_percentiles",  # green r3 refresh
    "a_pivot_status_priority",  # green r3 refresh
    "events_json_typed",  # green r3 refresh
    "dedup_exact_groups",  # green r3 refresh
    "dedup_ngram_jaccard",  # green r3 refresh
    "dedup_simhash_pairs",  # green r3 refresh
    "text_quality_stats",  # green r3 refresh
    "text_token_counts",  # green r3 refresh
    "text_lang_id",  # green r3 refresh
    "text_fingerprint",  # green r3 refresh
    "sim_topk_lsh_bucketed",  # green r3 refresh
    "mm_binary_metadata",  # green r3 refresh
    "p_hash_sample",  # green r3 refresh
    "curate_documents",  # green r3 refresh
    "x_lookup_replace",  # green r3 refresh
    "x_name_parsing",  # green r3 refresh
    "events_sliding_window",  # green r3 refresh
    "flagship_reconcile",  # green r4 refresh
    "j_outer_provenance_counts",  # green r4 refresh
    "a_distinct_values",  # green r4 refresh
    "so_union_distinct",  # green r4 refresh
    "so_except",  # green r4 refresh
    "so_intersect",  # green r4 refresh
    "text_wordcount",  # green r4 refresh
    "j_salted_skew_join",  # green r4 refresh
    "v_count_gates",  # green r4 refresh
    "tpch_q1_pricing_summary",  # green r4 refresh
    "tpch_q3_shipping_priority",  # green r4 refresh
    "tpch_q3_bucketed",  # green r4 refresh
    "tpch_q5_local_volume",  # green r4 refresh
    "tpch_q6_forecast_revenue",  # green r4 refresh
    "tpch_q4_order_priority",  # green r4 refresh
    "tpch_q18_large_orders",  # green r4 refresh
    "tpch_q10_returned_items",  # green r4 refresh
    "tpch_q16_supplier_variety",  # green r4 refresh
    "tpch_q7_nation_volume",  # green r4 refresh
    "tpch_q13_order_distribution",  # green r4 refresh
    "tpch_q14_promo_share",  # green r4 refresh
    "tpch_q15_top_supplier",  # green r4 refresh
    "tpch_q17_small_quantity",  # green r4 refresh
    "tpch_q19_or_of_ands",  # green r4 refresh
    "tpch_q22_idle_rich",  # green r4 refresh
    "tpch_q2_min_cost_supplier",  # green r4 refresh
    "tpch_q8_market_share",  # green r4 refresh
    "tpch_q9_profit_by_nation",  # green r4 refresh
    "tpch_q11_important_stock",  # green r4 refresh
    "tpch_q12_late_shipments",  # green r4 refresh
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
