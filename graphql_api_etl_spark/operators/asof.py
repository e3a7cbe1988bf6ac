"""As-of join: for each left row, the latest right row with
``right.ts <= left.ts`` (per key) — the standard event-stream/
dimension-history alignment operator (engine-native; the reference has
no temporal operators, SURVEY §2.10).

Spark has no native ASOF JOIN. The scalable formulation here is the
**union + ordered window** technique:

1. tag both inputs and union them on (key, ts);
2. one window per key ordered by (ts, side-priority) carries the last
   seen right-side payload forward (``last(..., ignorenulls)``);
3. keep only left rows — each now annotated with the most recent
   right row at-or-before its timestamp.

Cost: ONE shuffle of |L|+|R| rows on the key (the same partitioning
serves the window sort), versus the naive range-join which explodes to
|L|×|R| pairs per key before filtering. No per-key state lives on the
driver, and skewed keys fall under AQE's shuffle handling. A
backward-only tolerance (max staleness) is a post-filter.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

_SIDE = "__side__"  # 0 = right (wins ties: value AT ts is visible), 1 = left


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | Sequence[str] | None = None,
    right_cols: Sequence[str] | None = None,
    tolerance: Column | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Backward as-of join.

    ``on``: timestamp column name present in both inputs.
    ``by``: equi-key column(s) present in both (optional).
    ``right_cols``: right payload columns to carry (default: all except
    ``on``/``by``).
    ``tolerance``: max ``left.ts - right.ts`` as an interval column
    (e.g. ``F.expr("INTERVAL 1 HOUR")``); matches older than this
    become NULL.
    """
    by = [by] if isinstance(by, str) else list(by or [])
    if right_cols is None:
        right_cols = [c for c in right.columns if c != on and c not in by]
    payload = [f"{c}{suffix}" for c in right_cols]

    lhs = left.select(
        *left.columns,
        F.lit(1).alias(_SIDE),
        *[F.lit(None).cast(right.schema[c].dataType).alias(p) for c, p in zip(right_cols, payload)],
    )
    rhs = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c != on and c not in by],
        F.col(on),
        *[F.col(c) for c in by],
        F.lit(0).alias(_SIDE),
        *[F.col(c).alias(p) for c, p in zip(right_cols, payload)],
    ).select(*lhs.columns)  # align column order

    unioned = lhs.unionByName(rhs)
    w = (
        W.partitionBy(*by).orderBy(F.col(on).asc(), F.col(_SIDE).asc())
        if by
        else W.orderBy(F.col(on).asc(), F.col(_SIDE).asc())
    ).rowsBetween(W.unboundedPreceding, W.currentRow)

    # Carry the WHOLE right row as one struct: per-column last() would
    # stitch values from different right rows when a newer right row is
    # NULL in one payload column (and its tolerance check would use a
    # timestamp the value didn't come from). A right row's struct is
    # non-null even when its members are null, so last(struct) always
    # selects one consistent right row.
    rstruct = F.when(
        F.col(_SIDE) == 0,
        F.struct(F.col(on).alias("__rts__"), *[F.col(p).alias(p) for p in payload]),
    )
    carried = unioned.select(
        *[c for c in unioned.columns if c not in payload],
        F.last(rstruct, ignorenulls=True).over(w).alias("__r__"),
    )
    out = carried.filter(F.col(_SIDE) == 1).drop(_SIDE)
    match = F.col("__r__")
    if tolerance is not None:
        stale = match.isNull() | (F.col(on) - tolerance > match["__rts__"])
        match = F.when(stale, F.lit(None)).otherwise(match)
    for p in payload:
        out = out.withColumn(p, match[p])
    return out.drop("__r__")
