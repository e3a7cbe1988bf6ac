"""Pre-staged round-12 ``_PRIORITY`` window (the window_r9..r11
pattern, VERDICT r7 ask #8 lineage).

Computed by scripts/rotate_window.suggest_window against the committed
CORRECTNESS_r01..r10 history PLUS a simulated all-green round 11 over
the live round-11 window (PRIORITY_R11 verbatim — r10 had zero misses
and zero post-staging registrations).  With the never-checked backlog
at zero since r9 and no r11 registrations, every slot is again a
round-robin refresh: the 50 entries whose latest green is OLDEST —
the r5 remainder, then the earliest r6 cohort — in
(latest_green, registration) order.

At round-12 start the rotation is a one-commit act:

    from rotate_window import amend_window
    _PRIORITY = amend_window(PRIORITY_R12, <real r11 misses> +
                             <mid-r11 entries never driver-checked>)

``amend_window`` moves any real CORRECTNESS_r11 misses to the front
and drops displaced refresh fills from the tail.  Entries registered
mid-r11 AFTER this file was staged would be never-checked at r12
start; prepend them after the misses — ``suggest_window`` over the
then-current catalog reproduces the exact list.
tests/test_entry_contract.py verifies this list under both simulated
histories (all-green r11, and r11-with-misses amended via
amend_window).
"""

PRIORITY_R12 = [
    "text_zipf_fit",  # green r5
    "curate_weighted_sample",  # green r5
    "mm_audio_rms",  # green r5
    "mm_image_histogram",  # green r5
    "text_bm25_topk",  # green r5
    "text_lm_score",  # green r5
    "dedup_semdedup",  # green r5
    "sim_rrf_hybrid",  # green r5
    "curate_stratified_sample",  # green r5
    "sim_topk_hamming",  # green r5
    "dedup_containment_pairs",  # green r5
    "dedup_lsh_recall_eval",  # green r5
    "mm_video_scene_cut",  # green r5
    "sim_ann_recall_eval",  # green r5
    "sim_matryoshka_recall",  # green r5
    "emb_triplet_mining",  # green r5
    "curate_vocab_coverage",  # green r5
    "sink_merge_upsert",  # green r5
    "graph_pagerank",  # green r5
    "a_survival_km",  # green r5
    "a_grouping_sets",  # green r6
    "events_markov_transitions",  # green r6
    "events_json_variant",  # green r6
    "sim_topk_pq",  # green r6
    "sim_topk_ivfpq",  # green r6
    "dedup_panel_report",  # green r6
    "curate_split_leakage",  # green r6
    "text_jsd_by_lang",  # green r6
    "text_rake_keyphrases",  # green r6
    "text_pmi_collocations",  # green r6
    "text_word_burstiness",  # green r6
    "text_langid_eval",  # green r6
    "curate_gate_ablation",  # green r6
    "curate_ccnet_buckets",  # green r6
    "emb_class_separation",  # green r6
    "sim_mmr_rerank",  # green r6
    "curate_dsir_weights",  # green r6
    "mm_image_ahash_dedup",  # green r6
    "mm_audio_silence_segments",  # green r6
    "curate_quality_auc",  # green r6
    "curate_f1_threshold",  # green r6
    "dedup_yield_curve",  # green r6
    "text_langid_kappa",  # green r6
    "text_readability_flesch",  # green r6
    "events_latest_per_user",  # green r6
    "source_text_lines",  # green r6
    "sink_scd2_history",  # green r6
    "x_datetime_functions",  # green r6
    "curate_dataset_card",  # green r6
    "x_math_functions",  # green r6
]
