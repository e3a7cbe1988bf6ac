"""Incremental streaming reconciliation — the streaming twin of the
reference's serial re-fetch pass (ETL:474–506, ``ETL:NNN`` ≡
``/root/reference/weekly alignments GQL API.py``).

The batch pipeline reconciles by re-fetching EVERYTHING and running one
full outer merge. Here each micro-batch of newly-landed connection
pages is outer-merged (via the SAME ``operators.join.outer_merge`` the
batch pipeline uses) into a versioned keyed state table:

- ``both``       → the batch's (newer) values win — an update;
- ``left_only``  → existing state persists unchanged;
- ``right_only`` → a new row inserts.

State version ``v{batch_id}`` is a pure function of (previous state,
batch). ``foreachBatch`` is at-least-once; a retried batch_id reads
the version BEFORE it and deterministically rewrites its own version
directory, so the upsert is idempotent — effectively exactly-once.
Only `_SUCCESS`-marked versions are ever read, so a crashed partial
write is invisible.

Scale shape: the per-batch merge is a key-partitioned join of
|state|+|batch| rows with no driver-side state. For in-place upserts
swap the versioned parquet state for an ACID table format
(Delta/Iceberg MERGE INTO) — the logical plan is unchanged.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from graphql_api_etl_spark.operators.join import (
    MERGE_BOTH,
    MERGE_RIGHT,
    outer_merge,
)


def _versions(state_dir: str, prefix: str = "v") -> list[int]:
    """Committed (_SUCCESS-marked) state versions, ascending."""
    if not os.path.isdir(state_dir):
        return []
    out = []
    n = len(prefix)
    for d in os.listdir(state_dir):
        if d.startswith(prefix) and d[n:].isdigit() and os.path.exists(os.path.join(state_dir, d, "_SUCCESS")):
            out.append(int(d[n:]))
    return sorted(out)


class IncrementalReconciler:
    """Keyed upsert state maintained by ``foreachBatch`` outer-merges.

    ``key``: merge key column(s) present in every batch.
    ``state_dir``: versioned parquet state root.
    ``transform``: optional per-batch DataFrame transform (e.g. parse
    the connection's ``value`` JSON and flatten) applied before the
    merge. Batches may repeat a key; the last occurrence in page order
    wins (within-batch dedup below).
    """

    _version_prefix = "v"  # state version directory prefix

    def __init__(
        self,
        state_dir: str,
        key: str | list[str],
        transform: Callable[[DataFrame], DataFrame] | None = None,
    ):
        self.state_dir = state_dir
        self.key = [key] if isinstance(key, str) else list(key)
        self.transform = transform

    # -- state access --------------------------------------------------

    def current_state(self, spark: SparkSession, before: int | None = None) -> DataFrame | None:
        """Latest committed state (optionally: latest BEFORE a given
        batch_id — what a retried batch must re-read)."""
        versions = [
            v
            for v in _versions(self.state_dir, self._version_prefix)
            if before is None or v < before
        ]
        if not versions:
            return None
        return spark.read.parquet(
            os.path.join(self.state_dir, f"{self._version_prefix}{versions[-1]}")
        )

    # -- the foreachBatch hook -----------------------------------------

    def _dedup_batch(self, batch: DataFrame) -> DataFrame:
        """Within-batch dedup: keep each key's LAST occurrence (pages
        arrive in cursor order; a later page's node supersedes)."""
        w = W.partitionBy(*self.key).orderBy(F.col("__ord__").desc())
        return (
            batch.withColumn("__ord__", F.monotonically_increasing_id())
            .withColumn("__rn__", F.row_number().over(w))
            .filter(F.col("__rn__") == 1)
            .drop("__ord__", "__rn__")
        )

    def _merge_into_state(self, state: DataFrame | None, batch: DataFrame) -> DataFrame:
        """The upsert as one outer merge: both → batch wins, left_only
        → state persists, right_only → insert."""
        if state is None:
            return batch
        m = outer_merge(state, batch, on=self.key, lsuffix="_state", rsuffix="_new")
        take_new = F.col("_merge").isin(MERGE_BOTH, MERGE_RIGHT)
        cols = []
        for c in batch.columns:
            suffixed = f"{c}_new" in m.columns
            if c in self.key:
                # outer_merge keeps both sides' keys, suffixed
                cols.append(
                    F.coalesce(F.col(f"{c}_new"), F.col(f"{c}_state")).alias(c)
                    if suffixed
                    else F.col(c)
                )
            else:
                cols.append(
                    F.when(take_new, F.col(f"{c}_new")).otherwise(F.col(f"{c}_state")).alias(c)
                    if suffixed
                    else F.col(c)
                )
        return m.select(*cols)

    def _write_version(self, merged: DataFrame, batch_id: int) -> None:
        merged.write.mode("overwrite").parquet(
            os.path.join(self.state_dir, f"v{batch_id}")
        )

    def _retire(self, batch_id: int) -> None:
        """Retention: keep this version and its input (the input of a
        potential retry of the NEXT batch is THIS version)."""
        for v in _versions(self.state_dir, self._version_prefix):
            if v < batch_id - 1:
                shutil.rmtree(
                    os.path.join(self.state_dir, f"{self._version_prefix}{v}"),
                    ignore_errors=True,
                )

    def upsert_batch(self, batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        if self.transform is not None:
            batch = self.transform(batch)
        batch = self._dedup_batch(batch)
        state = self.current_state(spark, before=batch_id)
        merged = self._merge_into_state(state, batch)
        self._write_version(merged, batch_id)
        self._retire(batch_id)

    # -- wiring --------------------------------------------------------

    def attach(self, stream: DataFrame, checkpoint: str, available_now: bool = True):
        """Start the reconciliation query on a streaming DataFrame."""
        writer = (
            stream.writeStream.foreachBatch(self.upsert_batch)
            .option("checkpointLocation", checkpoint)
            .outputMode("update")
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()


class BucketedIncrementalReconciler(IncrementalReconciler):
    """IncrementalReconciler whose state lives in the ReconcileStaging
    bucketed layout (VERDICT r12 ask #7: unify the batch and streaming
    deployment stories) — each committed state version is a catalog
    table landed via ``sinks.tables.stage_bucketed`` (bucketed on the
    merge key, bucket-sorted, one file per bucket), so:

    - the per-batch upsert merge reads the state side EXCHANGE-FREE
      off its bucketed scan (only the micro-batch, ≪ state, shuffles)
      — at 100 TB the state never re-shuffles, the dominant per-batch
      cost becomes the state scan + the batch-sized exchange;
    - every DOWNSTREAM reconcile join against the live state on the
      key (the batch pipeline's full-outer diff, enrichments, gated
      reports) is exchange-free too — the same layout contract
      ReconcileStaging gives the weekly job.

    Idempotency protocol unchanged from the parent (versioned state;
    a retried batch_id re-reads the version BEFORE it and rewrites its
    own version — ``stage_bucketed``'s overwrite + orphan-directory
    recovery make the rewrite safe after crashes mid-landing).  After
    a session restart the in-memory catalog forgets the tables while
    their managed directories survive; ``current_state`` falls back to
    reading the committed directory as plain parquet (the bucket spec
    is re-established at the next landed version).
    """

    _version_prefix = "state_v"  # managed bucketed-table directory names

    def __init__(
        self,
        database: str,
        location: str,
        key: str | list[str],
        num_buckets: int = 32,
        transform: Callable[[DataFrame], DataFrame] | None = None,
    ):
        super().__init__(state_dir=location, key=key, transform=transform)
        self.database = database
        self.num_buckets = num_buckets

    def _table(self, version: int) -> str:
        return f"{self.database}.state_v{version}"

    def current_state(self, spark: SparkSession, before: int | None = None) -> DataFrame | None:
        versions = [
            v
            for v in _versions(self.state_dir, self._version_prefix)
            if before is None or v < before
        ]
        if not versions:
            return None
        name = self._table(versions[-1])
        if spark.catalog.tableExists(name):
            return spark.table(name)
        # session restart: catalog forgot the table, the committed
        # directory survives — plain-parquet fallback (bucket spec
        # returns at the next landed version).
        return spark.read.parquet(
            os.path.join(self.state_dir, f"{self._version_prefix}{versions[-1]}")
        )

    def _write_version(self, merged: DataFrame, batch_id: int) -> None:
        from graphql_api_etl_spark.sinks.tables import (
            ensure_bucket_database,
            stage_bucketed,
        )

        spark = merged.sparkSession
        ensure_bucket_database(spark, self.database, self.state_dir)
        stage_bucketed(
            spark,
            merged,
            self._table(batch_id),
            self.key,
            num_buckets=self.num_buckets,
        )

    def _retire(self, batch_id: int) -> None:
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        for v in _versions(self.state_dir, self._version_prefix):
            if v < batch_id - 1:
                if spark is not None:
                    spark.sql(f"DROP TABLE IF EXISTS {self._table(v)}")
                shutil.rmtree(
                    os.path.join(self.state_dir, f"{self._version_prefix}{v}"),
                    ignore_errors=True,
                )
