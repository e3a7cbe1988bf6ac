"""Pre-staged round-11 ``_PRIORITY`` window (the window_r9/r10
pattern, VERDICT r7 ask #8 lineage).

Computed by scripts/rotate_window.suggest_window against the committed
CORRECTNESS_r01..r09 history PLUS a simulated all-green round 10 over
the final round-10 window (the 2 mid-r10 registrations +
48 oldest-green r3/r4 refreshes). With the never-checked backlog at
zero since r9, every slot is again a round-robin refresh: the 50
entries whose latest green is OLDEST — the two r4 refresh fills the
mid-r10 registrations displaced (tpch_q20/q21), the remaining r4
greens, then the earliest r5 cohort — in (latest_green, registration)
order.

At round-11 start the rotation is a one-commit act:

    from rotate_window import amend_window
    _PRIORITY = amend_window(PRIORITY_R11, <real r10 misses> + <mid-r10
                             entries never driver-checked>)

``amend_window`` moves any real CORRECTNESS_r10 misses to the front
and drops displaced refresh fills from the tail. Entries registered
mid-r10 AFTER this file was staged would be never-checked at r11
start; prepend them after the misses — ``suggest_window`` over the
then-current catalog reproduces the exact list.
tests/test_entry_contract.py verifies this list under both simulated
histories (all-green r10, and r10-with-misses amended via
amend_window).
"""

PRIORITY_R11 = [
    "tpch_q20_excess_suppliers",  # green r4
    "tpch_q21_waiting_suppliers",  # green r4
    "a_rollup_counts",  # green r4
    "events_tumbling_window",  # green r4
    "events_sessionize",  # green r4
    "a_cube_counts",  # green r4
    "a_unpivot_measures",  # green r4
    "x_posexplode_tokens",  # green r4
    "events_json_props",  # green r4
    "a_approx_count_distinct",  # green r4
    "a_approx_percentiles",  # green r4
    "dedup_minhash_lsh",  # green r4
    "dedup_cluster_components",  # green r4
    "sim_topk_bruteforce",  # green r4
    "sim_topk_ivf",  # green r4
    "mm_extract_features",  # green r4
    "mm_thumbnails",  # green r4
    "mm_frame_sample",  # green r4
    "dedup_embedding_cosine",  # green r4
    "text_winnowing",  # green r4
    "a_two_phase_agg",  # green r5
    "source_jsonl_roundtrip",  # green r5
    "source_orc_roundtrip",  # green r5
    "dedup_cluster_keepers",  # green r5
    "text_repetition_stats",  # green r5
    "text_pii_scrub",  # green r5
    "curate_stratified_best",  # green r5
    "curate_decontaminate",  # green r5
    "emb_quantize_int8",  # green r5
    "curate_winsorize",  # green r5
    "curate_domain_mixture",  # green r5
    "curate_token_packing",  # green r5
    "dedup_span_exact",  # green r5
    "curate_global_shuffle",  # green r5
    "curate_bloom_decontaminate",  # green r5
    "text_unigram_logprob",  # green r5
    "curate_quality_logit",  # green r5
    "curate_embedding_outliers",  # green r5
    "sim_topk_matmul",  # green r5
    "curate_training_manifest",  # green r5
    "text_hash_embedding",  # green r5
    "curate_text_clusters",  # green r5
    "curate_mixture_temperature",  # green r5
    "dedup_url_canonicalize",  # green r5
    "curate_code_filter",  # green r5
    "text_tfidf_topterms",  # green r5
    "curate_train_split",  # green r5
    "text_chunk_windows",  # green r5
    "emb_pca_project",  # green r5
    "sim_knn_classify",  # green r5
]
