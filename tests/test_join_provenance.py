"""Unit + property tests for the join/provenance library — the
reference's signature full-outer + ``_merge`` pattern (ETL:391–425)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphql_api_etl_spark.operators.join import (
    MERGE_BOTH,
    MERGE_LEFT,
    MERGE_RIGHT,
    anti,
    cross,
    left_merge,
    lookup_replace,
    outer_merge,
    semi,
    split_by_provenance,
)


@pytest.fixture(scope="module")
def lr(spark):
    left = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (None, "null-key")], "k int, lv string"
    )
    right = spark.createDataFrame(
        [(2, "x"), (3, "y"), (4, "z"), (None, "null-key")], "k int, rv string"
    )
    return left, right


def test_outer_merge_provenance(lr):
    left, right = lr
    m = outer_merge(left, right, on="k")
    got = {(r["k_x"], r["k_y"], r["_merge"]) for r in m.collect()}
    assert got == {
        (1, None, MERGE_LEFT),
        (2, 2, MERGE_BOTH),
        (3, 3, MERGE_BOTH),
        (None, None, MERGE_LEFT),  # NULL key never matches (SQL semantics)
        (None, None, MERGE_RIGHT),
        (None, 4, MERGE_RIGHT),
    }


def test_outer_merge_counts_partition(lr):
    """|both| + |left_only| + |right_only| == |full outer| (SURVEY §5)."""
    left, right = lr
    m = outer_merge(left, right, on="k")
    both, lo, ro = split_by_provenance(m)
    assert both.count() + lo.count() + ro.count() == m.count()
    # inner slice ≡ inner join
    assert both.count() == left.join(right, "k", "inner").count()


def test_outer_merge_disjoint_keys(spark):
    m = outer_merge(
        spark.createDataFrame([(1, "a")], "lk int, v string"),
        spark.createDataFrame([(9, "z")], "rk int, w string"),
        left_on="lk",
        right_on="rk",
    )
    assert {r["_merge"] for r in m.collect()} == {MERGE_LEFT, MERGE_RIGHT}
    assert set(m.columns) == {"lk", "v", "rk", "w", "_merge"}


def test_left_merge_broadcast(lr):
    left, right = lr
    m = left_merge(left, right, on="k")
    assert m.count() == left.count()
    got = {(r["k_x"], r["_merge"]) for r in m.collect()}
    assert got == {(1, MERGE_LEFT), (2, MERGE_BOTH), (3, MERGE_BOTH), (None, MERGE_LEFT)}
    assert "BroadcastHashJoin" in m._jdf.queryExecution().executedPlan().toString()


def test_anti_semi_cross(lr):
    left, right = lr
    assert {r["k"] for r in anti(left, right, on="k").collect()} == {1, None}
    assert {r["k"] for r in semi(left, right, on="k").collect()} == {2, 3}
    assert cross(left.select("lv"), right.select("rv")).count() == 16


def test_lookup_replace(spark):
    df = spark.createDataFrame([("alice",), ("bob",), ("carol",)], "name string")
    mapping = spark.createDataFrame(
        [("alice", "a@x.com"), ("bob", "b@x.com")], "k string, v string"
    )
    out = lookup_replace(df, "name", mapping, "k", "v")
    assert {r["name"] for r in out.collect()} == {"a@x.com", "b@x.com", "carol"}


def test_outer_merge_multi_key(spark):
    left = spark.createDataFrame([(1, "r1", "a"), (1, "r2", "b")], "k int, sub string, v string")
    right = spark.createDataFrame([(1, "r1", "x"), (2, "r1", "y")], "k int, sub string, w string")
    m = outer_merge(left, right, on=["k", "sub"])
    got = {(r["k_x"], r["sub_x"], r["_merge"]) for r in m.collect()}
    assert got == {(1, "r1", MERGE_BOTH), (1, "r2", MERGE_LEFT), (None, None, MERGE_RIGHT)}


def test_provenance_property_on_star_tables(spark, sf_dir):
    """Property on real data: outer = inner + left-anti + right-anti."""
    from graphql_api_etl_spark.sources.registry import load_table

    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    m = outer_merge(c, o, left_on="c_custkey", right_on="o_custkey").cache()
    try:
        both, lo, ro = split_by_provenance(m)
        inner = c.join(o, c.c_custkey == o.o_custkey).count()
        l_anti = anti(c, o.select(F.col("o_custkey").alias("c_custkey")), on="c_custkey").count()
        r_anti = anti(o, c.select(F.col("c_custkey").alias("o_custkey")), on="o_custkey").count()
        assert both.count() == inner
        assert lo.count() == l_anti
        assert ro.count() == r_anti
    finally:
        m.unpersist()


def test_left_merge_auto_broadcast_respects_size(spark):
    """left_merge's "auto" default (r12) hints broadcast only when
    Catalyst's size estimate fits the session threshold — a fact-scale
    right side must NOT be force-broadcast (the pre-r12 always-True
    default was an OOM hazard)."""
    from graphql_api_etl_spark.plans import executed_plan

    left = spark.range(1000).select(F.col("id").alias("k"), F.lit("l").alias("a"))
    right = spark.range(100).select(F.col("id").alias("k"), F.lit("r").alias("b"))
    # small right: auto broadcasts
    p_small = executed_plan(left_merge(left, right, on="k"))
    assert "BroadcastHashJoin" in p_small
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # simulate a fact-scale right side: with the threshold off,
        # auto must NOT hint broadcast (forced True still would).
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        p_big = executed_plan(left_merge(left, right, on="k"))
        assert "BroadcastHashJoin" not in p_big, p_big
        p_forced = executed_plan(left_merge(left, right, on="k", broadcast_right=True))
        assert "BroadcastHashJoin" in p_forced
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_broadcast_threshold_resolves_unit_suffixed_values(spark):
    """r12 ADVICE: 'auto' mode must honor unit-suffixed thresholds
    ('10m', '100k') — the old int() parse raised and silently fell
    back to 64 MiB, so auto could force-broadcast frames far over the
    configured budget. Resolution goes through the JVM conf reader
    (the same parser Spark's planner uses)."""
    from graphql_api_etl_spark.operators.join import _broadcast_threshold_bytes

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        for raw, expected in [
            ("10m", 10 * 1024 * 1024),
            ("100k", 100 * 1024),
            ("1048576", 1048576),
            ("-1", -1),
        ]:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", raw)
            assert _broadcast_threshold_bytes(spark) == expected, raw
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
