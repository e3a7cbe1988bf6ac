"""Streaming event-time aggregation (engine-native extension; the
reference has no streaming constructs — SURVEY.md §2.10. Its cursor
pagination loop at ETL:194–210 is the only incremental-shaped thing,
and sources/graphql.py gives that a micro-batch treatment).

These transformations are written against an unbounded DataFrame and
work identically on a bounded one — the batch queries in queries.py
(events_tumbling_window, events_sessionize) are the bounded shapes of
these, which is what the oracle checks. Tests drive the streaming
path with a file source + ``availableNow`` trigger and a memory sink.

Watermarking bounds state: at 100 TB/day of events the window state
store only retains watermark-depth windows per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "10 minutes",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Tumbling (or sliding, if ``slide``) watermarked window aggregate:
    count + value sum per (window, key)."""
    win = F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(win.alias("w"), key_col)
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            "n_events",
            "total_value",
        )
    )


def sessionized(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Session-window aggregation with an inactivity gap
    (``session_window`` — the streaming-native equivalent of the batch
    lag+cumsum sessionizer in queries.events_sessionize)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("w"), key_col)
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            key_col,
            "n_events",
            "total_value",
        )
    )


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    within: str = "30 minutes",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Event-time stream-stream INNER join: right-side events matched
    to left-side events of the same key that happened in
    ``[l_ts, l_ts + within]``. Both sides carry a watermark and the
    join condition carries the time bound — together they let the
    engine expire buffered rows once the watermark passes
    ``l_ts + within``, so join state is bounded by (key cardinality ×
    interval depth), never the stream length. Works identically on
    bounded frames, which is what the batch twin in the test asserts.
    """
    iv = F.expr(f"INTERVAL {within}")
    l = left.select(
        F.col(key_col).alias("l_user"),
        F.col(ts_col).alias("l_ts"),
        F.col("event_id").alias("l_event"),
    ).withWatermark("l_ts", watermark)
    r = right.select(
        F.col(key_col).alias("r_user"),
        F.col(ts_col).alias("r_ts"),
        F.col("event_id").alias("r_event"),
    ).withWatermark("r_ts", watermark)
    return l.join(
        r,
        (F.col("l_user") == F.col("r_user"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + iv),
        "inner",
    )
