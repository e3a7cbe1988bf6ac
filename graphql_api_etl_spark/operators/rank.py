"""Scalable global ordering: rank / row_number / running aggregates
over a TOTAL order without the single-partition funnel.

A bare ``Window.orderBy(...)`` (no ``partitionBy``) makes Spark move
EVERY row to one partition (WindowExec warns "No Partition Defined"):
fine over a frame already reduced to a bounded domain (4 segments, 100
bins), fatal over fact-scale rows at 100 TB.  The engine-wide rule
(enforced by tests/test_global_windows.py) is that every bare
``W.orderBy`` site either carries a ``global-window-ok`` justification
comment naming the bounded input, or routes through this module:

- ``top_k_ranked``: the dominant pattern — rank by a total order, keep
  the top k.  ``orderBy().limit(k)`` lets Spark run
  TakeOrderedAndProject (per-partition partial top-k, no global
  shuffle, no window), and the rank is then assigned over the ≤k
  surviving rows, where a global window is O(k).
- ``global_row_number`` / ``global_running_sum``: the general case —
  range-repartition on the order columns (Spark's distributed sort
  partitioning), compute per-partition ranks/sums, then add each
  partition's offset = the running total of the partitions BEFORE it.
  The offsets frame has exactly one row per partition, so its own
  global window is bounded by ``spark.sql.shuffle.partitions``; it is
  broadcast back onto the data.  Total cost: ONE range shuffle — the
  same price any engine pays for a total order — and no single-task
  bottleneck.

Determinism (r12 — structural, no longer a caller precondition): the
offsets branch and the data branch are two reads of the SAME
range-shuffled frame, and correctness requires ``spark_partition_id()``
to assign each row the same partition in both.  Exchange/stage reuse
is NOT a safe foundation for that: ``repartitionByRange`` samples its
boundaries from the input in shuffle-fetch order — non-deterministic
whenever any exchange sits upstream — so two independent evaluations
can draw different boundaries (AQE's stage reuse masked this; with
AQE disabled, three rank-statistics entries returned corrupt sums).
Every operator here therefore pins the ranged frame with a LAZY
``localCheckpoint`` (see ``_pin``): computed once, cached
MEMORY_AND_DISK, lineage truncated — correct under any AQE /
exchange-reuse / upstream-determinism combination.

Plan-shape note: the checkpoint also truncates the plan, so chaining
these operators no longer doubles the upstream subtree per link (the
pre-r12 two-read form measured 253 pre-AQE exchanges on a three-deep
ntile chain; a_rfm_scores' independent-branches-over-a-checkpointed-
base layout remains the cleanest shape for many ranks over one base).

The reference has no global-ranking operator (it is single-process
pandas; ETL:1–6), so these are engine-native scale mechanics.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

_PART = "__rank_part__"
_LOCAL = "__rank_local__"
_OFFSET = "__rank_offset__"


def _order_cols(order_by: Sequence[Column | str]) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in order_by]


def _pin(ranged: DataFrame) -> DataFrame:
    """Pin the range-shuffled frame with a LAZY localCheckpoint so the
    data branch and the offsets branch read the SAME materialized
    partitioning — unconditionally, because the two-read pattern is
    not safe otherwise (r12 finding, surfaced by an AQE-off
    differential sweep): repartitionByRange samples its boundaries
    from the input in SHUFFLE-FETCH order, which is non-deterministic
    whenever any exchange sits upstream, so two independent
    evaluations of the "same" range exchange can draw different
    boundaries and silently mis-assign offsets.  AQE's stage reuse
    masked this (one materialized stage served both branches); with
    AQE disabled three rank-statistics entries returned corrupt sums.
    The checkpoint computes the shuffle once, caches it
    MEMORY_AND_DISK on the executors, truncates lineage (so chained
    rank operators no longer double the upstream plan), and makes the
    result independent of AQE, exchange-reuse rules, and upstream
    determinism.  Lazy (eager=False): no job is triggered at build
    time; the first action materializes each partition exactly once.

    Fault-tolerance trade (r12 ADVICE, recorded): localCheckpoint
    truncates lineage, so a rank job becomes UNRECOVERABLE on executor
    loss — Spark cannot recompute a lost pinned block and fails the
    job (a re-run recomputes from source; no silent corruption).  For
    a long-lived multi-executor deployment where executor churn is
    expected, prefer a RELIABLE checkpoint instead: set
    ``spark.sparkContext.setCheckpointDir(<hdfs/s3 path>)`` and swap
    ``localCheckpoint`` for ``checkpoint`` at this one site — same
    semantics, blocks survive executor loss at the cost of a
    distributed-FS write.  The pinned blocks persist on executors
    until the DataFrame is GC'd driver-side; a session that chains
    MANY rank calls over large frames should release them promptly —
    :func:`unpin` is the explicit hook (the returned frame's results
    must be fully consumed first)."""
    return ranged.localCheckpoint(eager=False)


def unpin(pinned: DataFrame) -> None:
    """Release the executor-side blocks of a checkpointed frame (the
    `_pin` localCheckpoint cache).  Optional — driver-side GC reclaims
    the blocks eventually — but explicit release bounds cache growth
    in long sessions that chain many rank calls over large frames.
    The frame (and anything lazily derived from it that has not been
    materialized) must not be used after.

    A checkpointed Dataset's analyzed plan is a LogicalRDD wrapping
    the pinned internal RDD — unpersist THAT (``DataFrame.rdd`` would
    build a fresh conversion RDD whose unpersist releases nothing)."""
    try:
        pinned._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass  # not a checkpointed frame, or blocks already released


def top_k_ranked(
    df: DataFrame,
    order_by: Sequence[Column | str],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Top-k by a TOTAL order, with 1-based ranks.

    Identical rows to ``row_number().over(W.orderBy(*order_by)) <= k``
    (the order must be total — include a unique tie-break column), but
    the plan is TakeOrderedAndProject (each partition keeps its own
    top k, the driver merges k·partitions rows) followed by a window
    over only the k survivors.
    """
    cols = _order_cols(order_by)
    kept = df.orderBy(*cols).limit(k)
    # global-window-ok: input is the limit(k) frame — ≤ k rows
    return kept.withColumn(rank_col, F.row_number().over(W.orderBy(*cols)))


def global_row_number(
    df: DataFrame,
    order_by: Sequence[Column | str],
    out_col: str = "row_number",
) -> DataFrame:
    """1-based row_number over a TOTAL order, distributed.

    Range-repartition on the order columns, per-partition row_number,
    plus the count of all earlier partitions (a one-row-per-partition
    offsets frame, broadcast back).  One range shuffle, no
    single-partition WindowExec over the data.
    """
    cols = _order_cols(order_by)
    ranged = _pin(
        df.repartitionByRange(*cols).withColumn(_PART, F.spark_partition_id())
    )
    local = ranged.withColumn(
        _LOCAL, F.row_number().over(W.partitionBy(_PART).orderBy(*cols))
    )
    counts = local.groupBy(_PART).agg(F.count(F.lit(1)).alias("__n"))
    # global-window-ok: one row per shuffle partition (bounded by conf)
    offsets = counts.withColumn(
        _OFFSET,
        F.coalesce(
            F.sum("__n").over(
                W.orderBy(_PART).rowsBetween(W.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).select(_PART, _OFFSET)
    return (
        local.join(F.broadcast(offsets), _PART)
        .withColumn(out_col, (F.col(_LOCAL) + F.col(_OFFSET)).cast("int"))
        .drop(_PART, _LOCAL, _OFFSET)
    )


def global_running_sums(
    df: DataFrame,
    order_by: Sequence[Column | str],
    sums: dict[str, Column | str],
    inclusive: bool = True,
) -> DataFrame:
    """Running sums of several columns over one TOTAL order,
    distributed — the two-phase form of
    ``sum(x).over(W.orderBy(...).rowsBetween(unboundedPreceding,
    currentRow))`` (or ``-1`` when ``inclusive=False``) for each
    ``out_col: x`` in ``sums``, sharing ONE range shuffle.

    Same mechanics as global_row_number: per-partition running sums
    after a range repartition, plus each partition's offset = the sum
    of all EARLIER partitions' totals.
    """
    cols = _order_cols(order_by)
    hi = 0 if inclusive else -1
    keys = list(sums)
    ranged = _pin(
        df.repartitionByRange(*cols).withColumn(_PART, F.spark_partition_id())
    )
    for i, k in enumerate(keys):
        x = sums[k]
        ranged = ranged.withColumn(
            f"__x{i}__", F.col(x) if isinstance(x, str) else x
        )
    win = (
        W.partitionBy(_PART)
        .orderBy(*cols)
        .rowsBetween(W.unboundedPreceding, hi)
    )
    local = ranged
    for i in range(len(keys)):
        local = local.withColumn(
            f"{_LOCAL}{i}",
            F.coalesce(F.sum(f"__x{i}__").over(win), F.lit(0)),
        )
    totals = local.groupBy(_PART).agg(
        *[F.sum(f"__x{i}__").alias(f"__t{i}") for i in range(len(keys))]
    )
    # global-window-ok: one row per shuffle partition (bounded by conf)
    owin = W.orderBy(_PART).rowsBetween(W.unboundedPreceding, -1)
    offsets = totals.select(
        _PART,
        *[
            F.coalesce(F.sum(f"__t{i}").over(owin), F.lit(0)).alias(f"{_OFFSET}{i}")
            for i in range(len(keys))
        ],
    )
    joined = local.join(F.broadcast(offsets), _PART)
    for i, k in enumerate(keys):
        joined = joined.withColumn(k, F.col(f"{_LOCAL}{i}") + F.col(f"{_OFFSET}{i}"))
    drop = [_PART] + [
        c
        for i in range(len(keys))
        for c in (f"__x{i}__", f"{_LOCAL}{i}", f"{_OFFSET}{i}")
    ]
    return joined.drop(*drop)


def global_running_sum(
    df: DataFrame,
    order_by: Sequence[Column | str],
    sum_col: Column | str,
    out_col: str = "running_sum",
    inclusive: bool = True,
) -> DataFrame:
    """Single-column convenience wrapper over global_running_sums."""
    return global_running_sums(df, order_by, {out_col: sum_col}, inclusive)


def global_ntile(
    df: DataFrame,
    order_by: Sequence[Column | str],
    n_tiles: int,
    out_col: str = "ntile",
) -> DataFrame:
    """``ntile(k)`` over a TOTAL order, distributed: a
    global_row_number plus the exact floor-balanced tile arithmetic
    (n = base·k + rem rows → the first ``rem`` tiles hold ``base+1``
    rows, the rest ``base``), which is the ANSI semantics both Spark's
    and DuckDB's window ntile implement.  One range shuffle instead of
    the single-partition window."""
    k = int(n_tiles)
    if k <= 0:
        # Match F.ntile, which rejects non-positive buckets at analysis
        # time; without this the integer div-by-zero below would yield
        # silent NULL tiles instead of an error.
        raise ValueError(f"global_ntile requires n_tiles >= 1, got {n_tiles}")
    rn_df = global_row_number(df, order_by, out_col="__ntile_rn__")
    n_row = rn_df.agg(F.max("__ntile_rn__").cast("long").alias("__ntile_n__"))
    staged = (
        rn_df.crossJoin(F.broadcast(n_row))
        .withColumn("__b__", F.expr(f"__ntile_n__ div {k}"))
        .withColumn("__r__", F.col("__ntile_n__") % k)
        .withColumn("__cut__", F.col("__r__") * (F.col("__b__") + 1))
    )
    # ceil(a/b) over positive longs = (a + b - 1) div b (exact integer
    # `div`, no double detour); the otherwise branch guards base with
    # greatest(1) — it is only reached when base >= 1 (rn > cut is
    # impossible at base = 0, where cut = n).
    tile = F.when(
        F.col("__ntile_rn__") <= F.col("__cut__"),
        F.expr("(__ntile_rn__ + __b__) div (__b__ + 1)"),
    ).otherwise(
        F.col("__r__")
        + F.expr(
            "(__ntile_rn__ - __cut__ + greatest(__b__, 1L) - 1) "
            "div greatest(__b__, 1L)"
        )
    )
    return staged.withColumn(out_col, tile).drop(
        "__ntile_rn__", "__ntile_n__", "__b__", "__r__", "__cut__"
    )


def global_running_min(
    df: DataFrame,
    order_by: Sequence[Column | str],
    min_col: Column | str,
    out_col: str = "running_min",
    inclusive: bool = False,
) -> DataFrame:
    """Running MIN over a TOTAL order, distributed — the two-phase
    form of ``min(x).over(W.orderBy(...).rowsBetween(
    unboundedPreceding, -1))`` (default EXCLUSIVE, matching the
    skyline/dominance use; the first row's exclusive min is NULL,
    preserved here because ``F.least`` skips nulls)."""
    cols = _order_cols(order_by)
    x = F.col(min_col) if isinstance(min_col, str) else min_col
    hi = 0 if inclusive else -1
    ranged = _pin(
        df.repartitionByRange(*cols).withColumn(_PART, F.spark_partition_id())
    ).withColumn("__x__", x)
    local = ranged.withColumn(
        _LOCAL,
        F.min("__x__").over(
            W.partitionBy(_PART)
            .orderBy(*cols)
            .rowsBetween(W.unboundedPreceding, hi)
        ),
    )
    totals = local.groupBy(_PART).agg(F.min("__x__").alias("__t"))
    # global-window-ok: one row per shuffle partition (bounded by conf)
    offsets = totals.select(
        _PART,
        F.min("__t")
        .over(W.orderBy(_PART).rowsBetween(W.unboundedPreceding, -1))
        .alias(_OFFSET),
    )
    return (
        local.join(F.broadcast(offsets), _PART)
        .withColumn(out_col, F.least(F.col(_LOCAL), F.col(_OFFSET)))
        .drop(_PART, _LOCAL, _OFFSET, "__x__")
    )
