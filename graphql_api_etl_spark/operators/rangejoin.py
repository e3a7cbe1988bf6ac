"""Interval / range join: pair left rows with right INTERVALS that
contain them (``l.ts BETWEEN r.start AND r.end``), optionally per key
— sessions×events, price windows, validity-period dimension joins.

Engine-native extension beyond the reference (no temporal operators
there; SURVEY §2.10).

Spark's naive plan for a pure range predicate is a broadcast
nested-loop (or cartesian) join — |L|·|R| comparisons. The scalable
formulation here is **chunk bucketing** (the same trick Databricks'
range-join hints implement natively):

1. pick a chunk width w;
2. each left row maps to chunk ``floor(ts / w)``;
3. each right interval EXPLODES to every chunk it overlaps
   (``sequence(floor(start/w), floor(end/w))``) — short intervals hit
   1-2 chunks;
4. equi-join on (key, chunk) + re-check the exact predicate;
5. dedup is unnecessary: a (row, interval) pair collides exactly once
   because the row lives in ONE chunk.

Cost: Σ_chunk |L_c|·|R_c| instead of |L|·|R|, with plain shuffle
machinery (AQE/skew handling apply). Pick w ≈ median interval length:
much smaller explodes intervals into many chunks, much larger packs
unrelated rows into the same chunk.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_CHUNK = "__chunk__"
_RID = "__rid__"


def interval_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    by: list[str] | str | None = None,
    chunk: float = 3600.0,
    how: str = "inner",
    suffix: str = "_right",
) -> DataFrame:
    """Join rows to containing intervals (inclusive bounds) via chunked
    equi-join. ``ts/start/end`` are NUMERIC columns (cast timestamps
    with ``unix_timestamp``/``unix_millis`` upstream, which keeps the
    chunk arithmetic engine-portable). ``how`` may be ``inner`` or
    ``left`` (unmatched left rows surface with null right columns).
    Right non-``by`` columns whose names collide with left columns are
    renamed with ``suffix`` (same contract as asof_join)."""
    if how not in ("inner", "left"):
        raise ValueError(f"interval_join supports inner/left, got {how!r}")
    by = [by] if isinstance(by, str) else list(by or [])
    collisions = {c for c in right.columns if c not in by and c in left.columns}
    if collisions:
        right = right.select(
            *[
                F.col(c).alias(f"{c}{suffix}") if c in collisions else F.col(c)
                for c in right.columns
            ]
        )
        if start_col in collisions:
            start_col = f"{start_col}{suffix}"
        if end_col in collisions:
            end_col = f"{end_col}{suffix}"
    if how == "left":
        # unique per-row tag so duplicate left rows keep their
        # multiplicity through the miss branch's groupBy
        left = left.withColumn(_RID, F.monotonically_increasing_id())
    lc = left.withColumn(_CHUNK, F.floor(F.col(ts_col) / F.lit(chunk)).cast("bigint"))
    rc = right.withColumn(
        _CHUNK,
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / F.lit(chunk)).cast("bigint"),
                F.floor(F.col(end_col) / F.lit(chunk)).cast("bigint"),
            )
        ),
    )
    on = by + [_CHUNK]
    contained = (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) <= F.col(end_col))
    if how == "inner":
        return lc.join(rc, on).filter(contained).drop(_CHUNK)
    # left: keep every left row; null out non-containing matches, then
    # collapse to one row for unmatched lefts
    joined = lc.join(rc, on, "left_outer").withColumn(
        "__hit__", F.when(contained, F.lit(1)).otherwise(F.lit(0))
    )
    right_cols = [c for c in right.columns if c not in by]
    nulled = joined.select(
        *[c for c in left.columns],
        *[F.when(F.col("__hit__") == 1, F.col(c)).otherwise(F.lit(None)).alias(c) for c in right_cols],
        "__hit__",
    )
    w_cols = [c for c in left.columns]  # includes _RID → unique per left row
    # a left row may join several chunks' worth of non-matching rows —
    # keep all real hits, and exactly one null row when there are none
    # (grouping by the unique row id preserves duplicate-left-row
    # multiplicity that grouping by value columns alone would collapse)
    hits = nulled.filter(F.col("__hit__") == 1).drop("__hit__")
    misses = (
        nulled.groupBy(*w_cols)
        .agg(F.max("__hit__").alias("__any__"))
        .filter(F.col("__any__") == 0)
        .drop("__any__")
        .select(*w_cols, *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in right_cols])
    )
    return hits.unionByName(misses).drop(_RID)
