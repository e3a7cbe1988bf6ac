"""Sequence / interval / history operators over event streams.

Reusable DataFrame-in → DataFrame-out building blocks behind the
catalog's sequence-analytics entries (``events_max_concurrency``,
``x_scd2_history``, ``events_transition_matrix``,
``events_ewma_trailing``). Reference relationship: the reference's
pipeline is batch-relational only (ETL:371–574); these extend the
engine to the event-time family a training-data platform needs
(session load, state history, sequence models, rolling features).

Every operator is one or two windows over a single key shuffle — no
self-joins, no Python rows — so the plans scale to arbitrarily many
keys: Spark's exchange distributes keys across executors and each
window sorts only its partition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def max_concurrency(
    intervals: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Per-key maximum number of simultaneously-open half-open
    intervals ``[start, end)`` — the sweep-line pattern distributed.

    Each interval contributes a +1 boundary at ``start`` and a -1 at
    ``end``; a running sum over boundaries ordered by ``(t, d)`` is
    the live-concurrency curve. Ends sort before starts at equal t
    (d=-1 < +1), so touching intervals never count as overlapping.
    Among equal ``(t, d)`` rows the prefix sum depends on row order,
    but the per-key MAX does not: all deltas in a tie group share a
    sign, so the extremum sits at a tie-group boundary regardless of
    order within the group — the output is deterministic without a
    unique tie-break column.

    One shuffle (the key partition); the window sort is per-partition.
    Returns ``(key, n_intervals, max_concurrency)``.
    """
    iv = intervals.select(
        F.col(key_col).alias("k"),
        F.col(start_col).alias("s"),
        F.col(end_col).alias("e"),
    )
    b = iv.select("k", F.col("s").alias("t"), F.lit(1).alias("d")).unionAll(
        iv.select("k", F.col("e").alias("t"), F.lit(-1).alias("d"))
    )
    w = W.partitionBy("k").orderBy("t", "d").rowsBetween(W.unboundedPreceding, W.currentRow)
    r = b.select("k", F.sum("d").over(w).alias("conc"))
    return (
        r.groupBy("k")
        .agg(
            (F.count(F.lit(1)) / 2).cast("bigint").alias("n_intervals"),
            F.max("conc").cast("bigint").alias("max_concurrency"),
        )
        .withColumnRenamed("k", key_col)
    )


def scd2_history(
    df: DataFrame,
    key_col: str,
    state_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Slowly-changing-dimension Type-2 history from an append-only
    change stream: keep only change points (``lag(state) ≠ state``
    under the ``(ts, tiebreak)`` total order), then close each version
    with the next change's timestamp via ``lead``. Open versions have
    ``next_ts`` NULL (callers render the sentinel date). Both windows
    partition by the key, so Catalyst reuses one exchange.

    Returns ``(key, state, version, ts, next_ts)`` with ``version``
    numbering change points 1..n per key.
    """
    w = W.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    changes = (
        df.withColumn("__prev", F.lag(state_col).over(w))
        .filter(F.col("__prev").isNull() | (F.col("__prev") != F.col(state_col)))
        .select(key_col, state_col, ts_col)
    )
    w2 = W.partitionBy(key_col).orderBy(ts_col)
    return changes.select(
        key_col,
        F.col(state_col).alias("state"),
        F.row_number().over(w2).cast("bigint").alias("version"),
        F.col(ts_col).alias("ts"),
        F.lead(ts_col).over(w2).alias("next_ts"),
    )


def transition_matrix(
    df: DataFrame,
    key_col: str,
    state_col: str,
    order_cols: list[str],
) -> DataFrame:
    """First-order Markov transition counts and row-conditional
    probabilities over per-key state sequences. One key-partitioned
    window forms (prev → next) bigrams; a groupBy counts them
    (cardinality |states|² regardless of data size), and outflow
    normalization joins the two tiny aggregates.

    Returns ``(prev_state, next_state, n, p)`` with p rounded to 4.
    """
    w = W.partitionBy(key_col).orderBy(*order_cols)
    pairs = (
        df.select(
            F.col(state_col).alias("next_state"),
            F.lag(state_col).over(w).alias("prev_state"),
        )
        .filter(F.col("prev_state").isNotNull())
    )
    c = pairs.groupBy("prev_state", "next_state").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    tot = c.groupBy("prev_state").agg(F.sum("n").cast("bigint").alias("n_from"))
    return c.join(tot, "prev_state").select(
        "prev_state",
        "next_state",
        "n",
        F.round(F.col("n").cast("double") / F.col("n_from"), 4).alias("p"),
    )


def ewma_trailing_cents(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    cents_col: str,
    depth: int = 20,
) -> tuple[DataFrame, Column]:
    """Trailing exponentially-weighted moving average (half-life one
    step, window = last ``depth`` rows) as ONE window pass: the decayed
    terms are ``lag(cents, d)`` calls sharing a single window, so all
    of them are computed in one sort inside one shuffle — no self-join.

    Determinism is engineered: the input is integer (cents) and the
    weights are powers of two (``2^(depth-1-d)``), so numerator and
    denominator are exact BIGINT sums immune to floating-point
    summation order; the caller performs the single final division.

    Returns ``(frame, ewma_column)`` where frame carries exact BIGINT
    ``__num``/``__den`` columns and ``ewma_column`` is the rounded
    ratio ``round(__num/__den, 4)`` (cents scale divided out via the
    denominator's 100× factor).
    """
    w = W.partitionBy(key_col).orderBy(*order_cols)
    num = None
    den = None
    for d in range(depth):
        lagged = F.lag(cents_col, d).over(w)
        n_term = F.coalesce(lagged, F.lit(0)) * F.lit(1 << (depth - 1 - d))
        d_term = (
            F.when(lagged.isNotNull(), F.lit(100 * (1 << (depth - 1 - d)))).otherwise(0)
        )
        num = n_term if num is None else num + n_term
        den = d_term if den is None else den + d_term
    out = df.withColumn("__num", num).withColumn("__den", den)
    ewma = F.round(F.col("__num").cast("double") / F.col("__den").cast("double"), 4)
    return out, ewma
