"""Structured Streaming variants: file source → windowed/session aggs
→ memory sink, driven with availableNow (bounded replay of the events
table through the streaming engine)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphql_api_etl_spark.sources.registry import load_table
from graphql_api_etl_spark.streaming.windows import sessionized, windowed_counts


@pytest.fixture(scope="module")
def events_stream(spark, sf_dir, tmp_path_factory):
    # Re-land events as micro-batch-readable parquet (normalized
    # timestamps — the raw driver file is nanos, handled in load_table).
    path = str(tmp_path_factory.mktemp("events_stream"))
    load_table(spark, sf_dir, "events").write.mode("overwrite").parquet(path)
    batch = spark.read.parquet(path)
    return spark.readStream.schema(batch.schema).parquet(path), batch


def _run_available_now(stream_df, name: str):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_windowed_counts_matches_batch(spark, events_stream):
    stream, batch = events_stream
    q = _run_available_now(windowed_counts(stream, window="1 hour"), "win_counts")
    try:
        got = {
            (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
            for r in spark.sql("SELECT * FROM win_counts").collect()
        }
        expected = {
            (r["w"], r["event_type"]): (r["n"], r["v"])
            for r in batch.groupBy(
                F.date_trunc("hour", "ts").alias("w"), "event_type"
            )
            .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("v"))
            .collect()
        }
        assert got == expected
        assert len(got) > 0
    finally:
        q.stop()


def test_session_windows_stream(spark, events_stream):
    stream, batch = events_stream
    q = _run_available_now(sessionized(stream, gap="30 minutes"), "sess")
    try:
        rows = spark.sql("SELECT * FROM sess").collect()
        assert len(rows) > 0
        # every session's event count is positive and bounded by the
        # user's total events
        totals = {r["user_id"]: r["cnt"] for r in batch.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt")).collect()}
        by_user: dict[int, int] = {}
        for r in rows:
            assert r["n_events"] > 0
            assert r["session_start"] <= r["session_end"]
            by_user[r["user_id"]] = by_user.get(r["user_id"], 0) + r["n_events"]
        assert by_user == totals
    finally:
        q.stop()
