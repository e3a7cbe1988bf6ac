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
# Round-11 window: CORRECTNESS_r10 had ZERO misses (50/50 green) and
# no entries were registered after scripts/window_r11.py was staged,
# so the round-start act is `amend_window(PRIORITY_R11, [])` — the
# pre-staged scripts/window_r11.py suggestion verbatim (an all-refresh
# window: the never-checked backlog has been zero since r9, so every
# slot goes to the entries whose latest green is OLDEST — the two r4
# entries the mid-r10 registrations displaced (tpch_q20/q21), the
# remaining r4 cohort, then the earliest r5 cohort, in
# (latest_green, registration) order).
# tests/test_entry_contract.py's
# test_current_window_is_the_prestaged_r11_list verifies the live
# window equals amend_window(PRIORITY_R11, misses + never-checked)
# exactly. Entries outside the window stay green on the local
# driver-replica gate (tests/test_oracle_diff.py) at sf0.01 before
# each commit.
_PRIORITY = [
    "tpch_q20_excess_suppliers",  # refresh: green r4
    "tpch_q21_waiting_suppliers",  # refresh: green r4
    "a_rollup_counts",  # refresh: green r4
    "events_tumbling_window",  # refresh: green r4
    "events_sessionize",  # refresh: green r4
    "a_cube_counts",  # refresh: green r4
    "a_unpivot_measures",  # refresh: green r4
    "x_posexplode_tokens",  # refresh: green r4
    "events_json_props",  # refresh: green r4
    "a_approx_count_distinct",  # refresh: green r4
    "a_approx_percentiles",  # refresh: green r4
    "dedup_minhash_lsh",  # refresh: green r4
    "dedup_cluster_components",  # refresh: green r4
    "sim_topk_bruteforce",  # refresh: green r4
    "sim_topk_ivf",  # refresh: green r4
    "mm_extract_features",  # refresh: green r4
    "mm_thumbnails",  # refresh: green r4
    "mm_frame_sample",  # refresh: green r4
    "dedup_embedding_cosine",  # refresh: green r4
    "text_winnowing",  # refresh: green r4
    "a_two_phase_agg",  # refresh: green r5
    "source_jsonl_roundtrip",  # refresh: green r5
    "source_orc_roundtrip",  # refresh: green r5
    "dedup_cluster_keepers",  # refresh: green r5
    "text_repetition_stats",  # refresh: green r5
    "text_pii_scrub",  # refresh: green r5
    "curate_stratified_best",  # refresh: green r5
    "curate_decontaminate",  # refresh: green r5
    "emb_quantize_int8",  # refresh: green r5
    "curate_winsorize",  # refresh: green r5
    "curate_domain_mixture",  # refresh: green r5
    "curate_token_packing",  # refresh: green r5
    "dedup_span_exact",  # refresh: green r5
    "curate_global_shuffle",  # refresh: green r5
    "curate_bloom_decontaminate",  # refresh: green r5
    "text_unigram_logprob",  # refresh: green r5
    "curate_quality_logit",  # refresh: green r5
    "curate_embedding_outliers",  # refresh: green r5
    "sim_topk_matmul",  # refresh: green r5
    "curate_training_manifest",  # refresh: green r5
    "text_hash_embedding",  # refresh: green r5
    "curate_text_clusters",  # refresh: green r5
    "curate_mixture_temperature",  # refresh: green r5
    "dedup_url_canonicalize",  # refresh: green r5
    "curate_code_filter",  # refresh: green r5
    "text_tfidf_topterms",  # refresh: green r5
    "curate_train_split",  # refresh: green r5
    "text_chunk_windows",  # refresh: green r5
    "emb_pca_project",  # refresh: green r5
    "sim_knn_classify",  # refresh: green r5
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
