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
# Round-6 window (VERDICT r5 ask #1): rotated via scripts/rotate_window.py
# immediately after CORRECTNESS_r05.json landed (50/50 green). 134 of the
# 273 catalog entries had never been inside the driver's 50-slot window;
# this round's window is 100% never-driver-checked entries, drawn in
# registration order. All 139 previously-windowed entries carry a green
# latest driver row; every entry not in the window stays green on the
# local driver-replica gate (tests/test_oracle_diff.py) at
# sf0.001/0.01/0.1 before each commit.
_PRIORITY = [
    "a_grouping_sets",  # never-checked
    "events_markov_transitions",  # never-checked
    "events_json_variant",  # never-checked
    "sim_topk_pq",  # never-checked
    "sim_topk_ivfpq",  # never-checked
    "dedup_panel_report",  # never-checked
    "curate_split_leakage",  # never-checked
    "text_jsd_by_lang",  # never-checked
    "text_rake_keyphrases",  # never-checked
    "text_pmi_collocations",  # never-checked
    "text_word_burstiness",  # never-checked
    "text_langid_eval",  # never-checked
    "curate_gate_ablation",  # never-checked
    "curate_ccnet_buckets",  # never-checked
    "emb_class_separation",  # never-checked
    "sim_mmr_rerank",  # never-checked
    "curate_dsir_weights",  # never-checked
    "mm_image_ahash_dedup",  # never-checked
    "mm_audio_silence_segments",  # never-checked
    "curate_quality_auc",  # never-checked
    "curate_f1_threshold",  # never-checked
    "dedup_yield_curve",  # never-checked
    "text_langid_kappa",  # never-checked
    "text_readability_flesch",  # never-checked
    "events_latest_per_user",  # never-checked
    "source_text_lines",  # never-checked
    "sink_scd2_history",  # never-checked
    "x_datetime_functions",  # never-checked
    "curate_dataset_card",  # never-checked
    "x_math_functions",  # never-checked
    "x_null_semantics",  # never-checked
    "events_anomaly_zscore",  # never-checked
    "so_union_schema_evolution",  # never-checked
    "source_schema_merge_read",  # never-checked
    "x_array_functions",  # never-checked
    "a_corr_covar",  # never-checked
    "x_regex_functions",  # never-checked
    "a_filtered_agg",  # never-checked
    "x_map_functions",  # never-checked
    "x_edit_distance",  # never-checked
    "a_histogram_bins",  # never-checked
    "a_mode_per_group",  # never-checked
    "events_max_concurrency",  # never-checked
    "x_scd2_history",  # never-checked
    "events_transition_matrix",  # never-checked
    "a_rfm_scores",  # never-checked
    "a_profile_columns",  # never-checked
    "dq_expectations",  # never-checked
    "text_sentence_split",  # never-checked
    "events_ewma_trailing",  # never-checked
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
