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


def _exact_axis(dtype):
    """Exact distance axis for the nearest-direction tie rule: integer
    epoch micros for timestamps, integer day ordinals for dates —
    BIGINTs whose differences are exactly representable — with
    cast("double") only as the fallback for numeric ``on`` columns."""
    from pyspark.sql.types import DateType, TimestampNTZType, TimestampType

    if isinstance(dtype, TimestampType):
        return F.unix_micros
    if isinstance(dtype, TimestampNTZType):
        # Session-tz-INDEPENDENT axis built from the NTZ fields
        # directly: day ordinal × µs/day + µs-of-day.  A
        # cast("timestamp") detour would reinterpret the wall-clock in
        # the session zone, so two NTZ values straddling a DST
        # transition would get their gap shifted by the offset change
        # (possibly flipping the nearest-direction pick), and values
        # inside a spring-forward gap would be ambiguous (ADVICE r10).
        def _ntz_micros(c: Column) -> Column:
            day = F.unix_date(c.cast("date")).cast("long") * F.lit(86_400_000_000)
            minute_of_day = (F.hour(c) * 60 + F.minute(c)).cast("long") * F.lit(60_000_000)
            # extract(SECOND) keeps the fraction as DECIMAL(8,6) —
            # ×1e6 is exact, covering the full micro precision.
            micros = (F.date_part(F.lit("SECOND"), c) * 1_000_000).cast("long")
            return day + minute_of_day + micros

        return _ntz_micros
    if isinstance(dtype, DateType):
        return lambda c: F.unix_date(c).cast("long")
    return lambda c: c.cast("double")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | Sequence[str] | None = None,
    right_cols: Sequence[str] | None = None,
    tolerance: Column | None = None,
    suffix: str = "_right",
    direction: str = "backward",
) -> DataFrame:
    """As-of join, backward (default) or forward.

    ``on``: timestamp column name present in both inputs.
    ``by``: equi-key column(s) present in both (optional).
    ``right_cols``: right payload columns to carry (default: all except
    ``on``/``by``).
    ``tolerance``: max staleness as an interval column (e.g.
    ``F.expr("INTERVAL 1 HOUR")``) — backward: ``left.ts - right.ts``;
    forward: ``right.ts - left.ts``; matches beyond it become NULL.
    ``direction``: ``"backward"`` pairs each left row with the LATEST
    right row at-or-before it; ``"forward"`` with the EARLIEST right
    row at-or-after it; ``"nearest"`` with whichever of the two is
    closer in time, backward winning exact-distance ties (pandas
    merge_asof's direction axis, all three values). Forward is
    backward under time reversal, so it reuses the same one-shuffle
    union + ordered-window plan with the sort order flipped; nearest
    evaluates BOTH carries over the same union — one shuffle, two
    window sorts on the same partitioning — then picks per row.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"asof direction {direction!r}: backward|forward|nearest")
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
    # Backward scans time ascending (carry the last right row seen);
    # forward scans time DESCENDING — the same "last seen" carry then
    # yields the earliest right row at-or-after each left row. Side
    # priority 0-first in both: a right row AT the left row's timestamp
    # is visible to it.
    def window(asc: bool):
        order = (F.col(on).asc() if asc else F.col(on).desc(), F.col(_SIDE).asc())
        # global-window-ok: only the keyless (by=None) variant — a keyless as-of IS a single global merge by definition; the catalog entries all pass by=
        base = W.partitionBy(*by).orderBy(*order) if by else W.orderBy(*order)
        return base.rowsBetween(W.unboundedPreceding, W.currentRow)

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
    keep = [c for c in unioned.columns if c not in payload]
    if direction in ("backward", "forward"):
        carried = unioned.select(
            *keep,
            F.last(rstruct, ignorenulls=True)
            .over(window(asc=direction == "backward"))
            .alias("__r__"),
        )
        out = carried.filter(F.col(_SIDE) == 1).drop(_SIDE)
        match = F.col("__r__")
        if tolerance is not None:
            if direction == "backward":
                stale = match.isNull() | (F.col(on) - tolerance > match["__rts__"])
            else:
                stale = match.isNull() | (F.col(on) + tolerance < match["__rts__"])
            match = F.when(stale, F.lit(None)).otherwise(match)
    else:  # nearest: both carries over the same union — one shuffle,
        # two window sorts on the same hash partitioning — then pick
        # the closer side per row (backward wins exact ties, pandas
        # convention). Tolerance bounds |gap| on the chosen side.
        carried = unioned.select(
            *keep,
            F.last(rstruct, ignorenulls=True).over(window(asc=True)).alias("__b__"),
            F.last(rstruct, ignorenulls=True).over(window(asc=False)).alias("__f__"),
        )
        out = carried.filter(F.col(_SIDE) == 1).drop(_SIDE)
        back, fwd = F.col("__b__"), F.col("__f__")
        # Gap arithmetic must be EXACT: the backward-wins tie rule
        # compares distances, and a double holds fractional epoch
        # seconds whose ulp (~0.24 µs at current epochs) can flip an
        # exact-distance tie to the forward match. Timestamps (and
        # dates) therefore diff as integer micros/days; cast("double")
        # remains only for genuinely numeric `on` columns.
        axis = _exact_axis(left.schema[on].dataType)
        back_gap = axis(F.col(on)) - axis(back["__rts__"])
        fwd_gap = axis(fwd["__rts__"]) - axis(F.col(on))
        match = (
            F.when(back.isNull(), fwd)
            .when(fwd.isNull(), back)
            .when(back_gap <= fwd_gap, back)
            .otherwise(fwd)
        )
        if tolerance is not None:
            stale = (
                match.isNull()
                | (match["__rts__"] > F.col(on) + tolerance)
                | (match["__rts__"] < F.col(on) - tolerance)
            )
            match = F.when(stale, F.lit(None)).otherwise(match)
    for p in payload:
        out = out.withColumn(p, match[p])
    if direction == "nearest":
        return out.drop("__b__", "__f__")
    return out.drop("__r__")
