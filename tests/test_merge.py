"""sinks/merge.py: copy-on-write MERGE semantics and the atomic
directory swap."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from graphql_api_etl_spark.sinks.merge import merge_frames, merge_upsert


def _frames(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k long, s string, v double"
    )
    changes = spark.createDataFrame(
        [
            (2, "b2", 22.0, "U"),   # update
            (4, "d", 40.0, "I"),    # insert
            (3, "c", 30.0, "D"),    # delete
            (1, "x", 99.0, "U"),    # update...
            (1, "a", 10.0, "D"),    # ...but delete wins on the same key
        ],
        "k long, s string, v double, op string",
    )
    return target, changes


def test_merge_frames_upsert_delete_semantics(spark):
    target, changes = _frames(spark)
    got = sorted(tuple(r) for r in merge_frames(target, changes, ["k"]).collect())
    assert got == [(2, "b2", 22.0), (4, "d", 40.0)]


def test_merge_upsert_atomic_swap_roundtrip(spark, tmp_path):
    target, changes = _frames(spark)
    path = str(tmp_path / "tbl")
    target.write.parquet(path)
    merge_upsert(spark, path, changes, ["k"])
    got = sorted(tuple(r) for r in spark.read.parquet(path).collect())
    assert got == [(2, "b2", 22.0), (4, "d", 40.0)]
    # no stale tmp/old dirs left behind
    leftovers = [d for d in os.listdir(tmp_path) if d != "tbl"]
    assert leftovers == []


def test_merge_frames_noop_changeset(spark):
    target, _ = _frames(spark)
    empty = spark.createDataFrame([], "k long, s string, v double, op string")
    got = sorted(tuple(r) for r in merge_frames(target, empty, ["k"]).collect())
    assert got == sorted(tuple(r) for r in target.collect())


def test_merge_frames_broadcasts_change_side(spark):
    target, changes = _frames(spark)
    plan = merge_frames(target, changes, ["k"])._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
