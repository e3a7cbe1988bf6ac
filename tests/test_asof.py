"""Unit tests for the as-of join (union + ordered-window technique)."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from graphql_api_etl_spark.operators.asof import asof_join


def _ts(s):
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def quotes_trades(spark):
    trades = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01T10:00:05"), 1),
            ("A", _ts("2024-01-01T10:01:30"), 2),
            ("B", _ts("2024-01-01T10:00:10"), 3),
            ("C", _ts("2024-01-01T10:00:00"), 4),  # no quotes for C
        ],
        "sym string, ts timestamp, trade_id int",
    )
    quotes = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01T10:00:00"), 100.0),
            ("A", _ts("2024-01-01T10:01:00"), 101.0),
            ("A", _ts("2024-01-01T10:02:00"), 102.0),  # after all trades
            ("B", _ts("2024-01-01T10:00:10"), 200.0),  # exactly at trade ts
        ],
        "sym string, ts timestamp, px double",
    )
    return trades, quotes


def test_asof_backward_latest(quotes_trades):
    trades, quotes = quotes_trades
    out = asof_join(trades, quotes, on="ts", by="sym")
    got = {r["trade_id"]: r["px_right"] for r in out.collect()}
    assert got == {1: 100.0, 2: 101.0, 3: 200.0, 4: None}
    assert out.count() == trades.count()  # left-outer semantics


def test_asof_tie_uses_right_at_same_ts(quotes_trades):
    trades, quotes = quotes_trades
    out = asof_join(trades, quotes, on="ts", by="sym")
    assert out.filter(F.col("trade_id") == 3).first()["px_right"] == 200.0


def test_asof_tolerance(quotes_trades):
    trades, quotes = quotes_trades
    out = asof_join(
        trades, quotes, on="ts", by="sym", tolerance=F.expr("INTERVAL 30 SECONDS")
    )
    got = {r["trade_id"]: r["px_right"] for r in out.collect()}
    # trade 2 at 10:01:30 matches quote at 10:01:00 (30s — within);
    # trade 1 at 10:00:05 matches 10:00:00 (5s); others unchanged
    assert got == {1: 100.0, 2: 101.0, 3: 200.0, 4: None}
    tight = asof_join(trades, quotes, on="ts", by="sym", tolerance=F.expr("INTERVAL 3 SECONDS"))
    got_tight = {r["trade_id"]: r["px_right"] for r in tight.collect()}
    assert got_tight == {1: None, 2: None, 3: 200.0, 4: None}


def test_asof_payload_columns_come_from_one_right_row(spark):
    """A newer right row with NULL in one payload column must NOT have
    that column back-filled from an older right row (per-column last()
    would stitch two different rows together)."""
    left = spark.createDataFrame([("A", 30, 1)], "sym string, ts int, trade_id int")
    right = spark.createDataFrame(
        [("A", 10, 100.0, 5.0), ("A", 20, 101.0, None)],
        "sym string, ts int, px double, sz double",
    )
    row = asof_join(left, right, on="ts", by="sym").first()
    assert row["px_right"] == 101.0
    assert row["sz_right"] is None  # from the SAME (ts=20) right row


def test_asof_tolerance_uses_matched_row_ts(spark):
    """Tolerance is judged against the timestamp of the right row the
    payload actually came from — a stale match nulls ALL its columns."""
    left = spark.createDataFrame([("A", 100, 1)], "sym string, ts int, trade_id int")
    right = spark.createDataFrame(
        [("A", 10, 100.0, 5.0), ("A", 95, None, None)],
        "sym string, ts int, px double, sz double",
    )
    # latest right row (ts=95, within 10) is all-NULL payload; the
    # within-tolerance match must not resurrect ts=10's stale values
    row = asof_join(left, right, on="ts", by="sym", tolerance=F.lit(10)).first()
    assert row["px_right"] is None and row["sz_right"] is None


def test_asof_no_by_key(spark):
    left = spark.createDataFrame([(10, "l1"), (25, "l2")], "ts int, lv string")
    right = spark.createDataFrame([(5, "r1"), (20, "r2"), (30, "r3")], "ts int, rv string")
    out = asof_join(left, right, on="ts")
    got = {r["lv"]: r["rv_right"] for r in out.collect()}
    assert got == {"l1": "r1", "l2": "r2"}


def test_asof_forward_and_nearest_directions(spark):
    """pandas merge_asof's direction axis: forward pairs the earliest
    right row at-or-after (ties inclusive), nearest picks the closer
    side with backward winning exact ties; tolerance bounds the gap on
    the chosen side in every direction."""
    from pyspark.sql import functions as F

    from graphql_api_etl_spark.operators.asof import asof_join

    l = spark.createDataFrame([(1, 10), (1, 18), (1, 20), (1, 35), (2, 5)], "k int, ts int")
    r = spark.createDataFrame([(1, 15, 100), (1, 20, 200), (1, 50, 500)], "k int, ts int, v int")

    fwd = {
        (row["k"], row["ts"]): row["v_right"]
        for row in asof_join(l, r, on="ts", by="k", right_cols=["v"], direction="forward").collect()
    }
    assert fwd == {(1, 10): 100, (1, 18): 200, (1, 20): 200, (1, 35): 500, (2, 5): None}

    near = {
        (row["k"], row["ts"]): row["v_right"]
        for row in asof_join(l, r, on="ts", by="k", right_cols=["v"], direction="nearest").collect()
    }
    # 18: back gap 3 vs fwd gap 2 -> 200; 35: back 15 vs fwd 15 TIE -> backward 200
    assert near == {(1, 10): 100, (1, 18): 200, (1, 20): 200, (1, 35): 200, (2, 5): None}

    near_tol = {
        (row["k"], row["ts"]): row["v_right"]
        for row in asof_join(
            l, r, on="ts", by="k", right_cols=["v"], direction="nearest", tolerance=F.lit(4)
        ).collect()
    }
    assert near_tol == {(1, 10): None, (1, 18): 200, (1, 20): 200, (1, 35): None, (2, 5): None}

    fwd_tol = {
        (row["k"], row["ts"]): row["v_right"]
        for row in asof_join(
            l, r, on="ts", by="k", right_cols=["v"], direction="forward", tolerance=F.lit(5)
        ).collect()
    }
    assert fwd_tol == {(1, 10): 100, (1, 18): 200, (1, 20): 200, (1, 35): None, (2, 5): None}


def test_asof_nearest_microsecond_tie_is_exact_on_timestamps(spark):
    """r10 ADVICE (medium): nearest-direction gaps on TIMESTAMP columns
    must diff as integer epoch micros, not fractional-second doubles.
    At epoch 1704067200.000008 the double ulp (~0.24 µs) rounds the two
    1 µs gaps to 1.19e-6 vs 0.95e-6 s — cast('double') arithmetic flips
    the exact tie to the FORWARD match, breaking the documented
    backward-wins pandas convention (and the events_asof_nearest oracle,
    which compares exact integer epoch_us)."""
    from datetime import timezone

    t = datetime.fromtimestamp(1704067200.0, tz=timezone.utc).replace(tzinfo=None)
    mid = t.replace(microsecond=8)
    back = t.replace(microsecond=7)
    fwd = t.replace(microsecond=9)
    left = spark.createDataFrame([("A", mid, 1)], "sym string, ts timestamp, trade_id int")
    right = spark.createDataFrame(
        [("A", back, 100.0), ("A", fwd, 200.0)], "sym string, ts timestamp, px double"
    )
    row = asof_join(
        left, right, on="ts", by="sym", right_cols=["px"], direction="nearest"
    ).first()
    assert row["px_right"] == 100.0  # backward wins the exact 1 µs tie


def test_asof_ntz_axis_is_session_timezone_independent(spark):
    """r10 ADVICE (low): the TIMESTAMP_NTZ axis must be the NTZ wall
    clock itself, not a cast("timestamp") detour that reinterprets it
    in the session zone.  Across the 2024-03-10 America/Los_Angeles
    spring-forward (02:00→03:00 skipped), left 03:30 sits 2h wall-clock
    after right 01:30 and 1.5h before right 05:00 — nearest must pick
    FORWARD (1.5h < 2h).  The cast detour compresses the backward gap
    to 1h of epoch time (the skipped hour), flipping the pick."""
    tz_key = "spark.sql.session.timeZone"
    old_tz = spark.conf.get(tz_key)
    spark.conf.set(tz_key, "America/Los_Angeles")
    try:
        mk = lambda h, m: datetime(2024, 3, 10, h, m)  # noqa: E731
        left = spark.createDataFrame(
            [("A", mk(3, 30), 1)], "sym string, ts timestamp_ntz, trade_id int"
        )
        right = spark.createDataFrame(
            [("A", mk(1, 30), 100.0), ("A", mk(5, 0), 200.0)],
            "sym string, ts timestamp_ntz, px double",
        )
        row = asof_join(
            left, right, on="ts", by="sym", right_cols=["px"], direction="nearest"
        ).first()
        assert row["px_right"] == 200.0  # forward: 1.5h wall-clock < 2h
    finally:
        spark.conf.set(tz_key, old_tz)


def test_asof_ntz_axis_keeps_microsecond_precision(spark):
    """The field-built NTZ axis (day ordinal + µs-of-day via
    extract(SECOND)'s DECIMAL(8,6)) must still resolve 1 µs ties the
    backward-wins way, like the TIMESTAMP axis."""
    t = datetime(2024, 1, 1, 0, 0, 0)
    left = spark.createDataFrame(
        [("A", t.replace(microsecond=8), 1)], "sym string, ts timestamp_ntz, trade_id int"
    )
    right = spark.createDataFrame(
        [("A", t.replace(microsecond=7), 100.0), ("A", t.replace(microsecond=9), 200.0)],
        "sym string, ts timestamp_ntz, px double",
    )
    row = asof_join(
        left, right, on="ts", by="sym", right_cols=["px"], direction="nearest"
    ).first()
    assert row["px_right"] == 100.0  # backward wins the exact 1 µs tie


def test_asof_direction_validation():
    import pytest as _pytest

    from graphql_api_etl_spark.operators.asof import asof_join

    with _pytest.raises(ValueError, match="backward|forward|nearest"):
        asof_join(None, None, on="ts", direction="sideways")
