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
# Round-9 window: CORRECTNESS_r08 had ZERO misses (50/50 green), so
# rotate_window.amend_window is a no-op this round; the window is the
# scripts/rotate_window.py suggestion over the real r1–r8 history:
# the 20 entries registered mid-r8 (after window_r8 froze) that have
# never been driver-checked — JPEG/GIF/G.711 codecs, HITS, Kendall
# tau-b, null-aware anti join, multiLine JSON, dynamic partition
# overwrite, max drawdown, bitmap distinct, hostile-CSV roundtrip,
# n-gram novelty, append-mode closed windows, ordered string_agg,
# compression codecs, as-of tolerance — prepended per
# scripts/window_r9.py:21-24's own policy, plus the ten mid-r9
# registrations (mm_jpeg_progressive/SOF2, dropDuplicatesWithinWatermark,
# mojibake repair, Kaplan-Meier, ORC temporal roundtrip, Adam7
# interlaced PNG, stream-stream LEFT OUTER + FULL OUTER joins,
# forward + nearest as-of), then 20
# oldest-green (r3) round-robin refresh fills. After this round, EVERY
# one of the 317 catalog entries has a driver CORRECTNESS row
# (tests/test_entry_contract.py asserts the invariant). Entries
# outside the window stay green on the local driver-replica gate
# (tests/test_oracle_diff.py) at sf0.01 before each commit.
_PRIORITY = [
    "mm_jpeg_decode",  # never-checked (mid-r8)
    "mm_jpeg_color_420",  # never-checked (mid-r8)
    "text_ngram_novelty",  # never-checked (mid-r8)
    "mm_jpeg_thumbnail",  # never-checked (mid-r8)
    "mm_gif_decode",  # never-checked (mid-r8)
    "mm_audio_ulaw",  # never-checked (mid-r8)
    "mm_gif_frame_sample",  # never-checked (mid-r8)
    "mm_audio_alaw",  # never-checked (mid-r8)
    "graph_hits",  # never-checked (mid-r8)
    "stream_append_closed_windows",  # never-checked (mid-r8)
    "a_kendall_tau",  # never-checked (mid-r8)
    "source_json_multiline",  # never-checked (mid-r8)
    "sink_dynamic_partition_overwrite",  # never-checked (mid-r8)
    "events_max_drawdown",  # never-checked (mid-r8)
    "a_bitmap_distinct",  # never-checked (mid-r8)
    "sink_csv_roundtrip",  # never-checked (mid-r8)
    "j_null_aware_anti",  # never-checked (mid-r8)
    "a_string_agg_ordered",  # never-checked (mid-r8)
    "layout_compression_codecs",  # never-checked (mid-r8)
    "events_asof_tolerance",  # never-checked (mid-r8)
    "mm_jpeg_progressive",  # never-checked (NEW mid-r9: SOF2 decode)
    "stream_dedup_within_watermark",  # never-checked (NEW mid-r9)
    "text_mojibake_repair",  # never-checked (NEW mid-r9)
    "events_kaplan_meier",  # never-checked (NEW mid-r9)
    "sink_orc_roundtrip",  # never-checked (NEW mid-r9)
    "mm_png_interlaced",  # never-checked (NEW mid-r9: Adam7)
    "stream_stream_left_outer_join",  # never-checked (NEW mid-r9)
    "events_asof_forward",  # never-checked (NEW mid-r9)
    "events_asof_nearest",  # never-checked (NEW mid-r9)
    "stream_stream_full_outer_join",  # never-checked (NEW mid-r9)
    "j_left_semi_matched",  # green r3 refresh
    "j_cross_product",  # green r3 refresh
    "j_broadcast_dims",  # green r3 refresh
    "p_transform_chain",  # green r3 refresh
    "f_filter_chain",  # green r3 refresh
    "x_string_functions",  # green r3 refresh
    "p_rownum_synth",  # green r3 refresh
    "a_bool_all_guard",  # green r3 refresh
    "a_collect_set_per_group",  # green r3 refresh
    "x_hierarchy_closure",  # green r3 refresh
    "a_hierarchy_levels",  # green r3 refresh
    "layout_zorder_prune",  # green r3 refresh
    "layout_compacted_scan",  # green r3 refresh
    "events_interval_join",  # green r3 refresh
    "events_range_join_left",  # green r3 refresh
    "x_hierarchy_deep_levels",  # green r3 refresh
    "w_window_suite",  # green r3 refresh
    "events_gapfill",  # green r3 refresh
    "events_funnel",  # green r3 refresh
    "events_asof_join",  # green r3 refresh
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
