"""Custom stateful streaming operator via ``applyInPandasWithState``
(engine-native; SURVEY §2.10 — the reference has no streaming).

``threshold_alerts`` is the canonical can't-do-with-windows shape: per
key, keep a LIFETIME running total and emit one alert row each time it
crosses another multiple of ``threshold``. Built-in windowed aggs
can't express it (no window bounds the state; the output depends on
all history), and ``session_window`` has no user-defined emission
rule — this is exactly what the arbitrary-state API exists for.

Scale design: state is one double per key (GroupState, checkpointed by
the engine, partitioned with the shuffle); each micro-batch touches
only keys present in the batch, Arrow-batched per group. Alert volume
is bounded by value growth, not event count.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

OUT_SCHEMA = "user_id string, crossed bigint, total double"
STATE_SCHEMA = "total double"


def threshold_alerts(
    events: DataFrame,
    threshold: float = 100.0,
    key_col: str = "user_id",
    val_col: str = "value",
) -> DataFrame:
    """One output row per (key, crossed multiple of ``threshold``),
    with the running total at the batch where the crossing happened."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        total = state.get[0] if state.exists else 0.0
        before = int(total // threshold)
        for pdf in pdfs:
            total += float(pdf[val_col].sum())
        state.update((total,))
        after = int(total // threshold)
        if after > before:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * (after - before),
                    "crossed": list(range(before + 1, after + 1)),  # level index
                    "total": [total] * (after - before),
                }
            )

    return events.groupBy(key_col).applyInPandasWithState(
        fn, OUT_SCHEMA, STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
    )
