"""Streaming first-seen deduplication via Spark 4's
``transformWithStateInPandas`` (the successor to
``applyInPandasWithState``; SURVEY §2.10 — the reference has no
streaming).

``first_seen`` is the streaming form of exact dedup: per key (e.g. a
content hash), emit the payload the FIRST time the key appears and
drop every later occurrence — across micro-batches, forever.
``dropDuplicates`` on a stream needs a watermark and forgets keys when
it expires; unbounded first-seen semantics need user state, which is
exactly what the arbitrary-state API provides.

Scale design: state is one boolean per distinct key, hash-partitioned
with the groupBy shuffle and checkpointed by the engine (RocksDB state
store in production). Each micro-batch touches only the keys present
in that batch, Arrow-batched per group. For bounded retention pass
``ttlDurationMs`` to ``getValueState`` — the semantic contract of this
operator stays the same.

Environment note: transformWithStateInPandas talks protobuf to
Spark's state server; ``google.protobuf`` is not installed in this
container, so the e2e test skips here (the operator is exercised on
clusters that ship protobuf, which stock Spark 4 distributions do).
``streaming/stateful.py``'s applyInPandasWithState path carries the
in-container e2e coverage for arbitrary-state streaming.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame


def first_seen(
    stream: DataFrame,
    key_col: str = "content_hash",
    payload_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """Emit exactly the first row seen per key; drop all later ones.

    Output schema: (key_col, *payload_cols) with the payload taken
    from the first row of the first batch containing the key
    (within-batch order = arrival order in the Arrow batch).
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    out_schema = ", ".join(
        [f"{key_col} string"] + [f"{c} string" for c in payload_cols]
    )

    class FirstSeen(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._seen = handle.getValueState("seen", "seen boolean")

        def handleInputRows(self, key, rows: Iterator[pd.DataFrame], timer_values):
            if self._seen.exists():
                return
            first = None
            for pdf in rows:
                if len(pdf):
                    first = pdf.iloc[0]
                    break
            if first is None:
                return
            self._seen.update((True,))
            yield pd.DataFrame(
                {key_col: [str(key[0])]}
                | {c: [str(first[c])] for c in payload_cols}
            )

        def close(self) -> None:
            pass

    return stream.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=FirstSeen(),
        outputStructType=out_schema,
        outputMode="append",
        timeMode="none",
    )
