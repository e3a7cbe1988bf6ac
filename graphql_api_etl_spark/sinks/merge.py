"""Copy-on-write MERGE (upsert + delete) for parquet tables — the
Delta/Iceberg ``MERGE INTO`` semantics re-expressed as plain DataFrame
ops plus an atomic directory swap (plain parquet has no transaction
log, so the unit of atomicity is the published directory, same
contract as the layout publishers).

Reference parity: the reference's sync loop deletes rows then re-posts
updated ones per entity (ETL:930-1018 ≡ ``/root/reference/weekly
alignments GQL API.py``); ``merge_frames`` is that delete+upsert
contract as one declarative set operation.

Scale design: the merged frame is
``target ⟕̸ change_keys  ∪  (changes minus deletes)`` — one left-anti
join where the change side (typically ≪ target) broadcasts, so the
target scan is map-only: no target-side shuffle at any scale. A real
lakehouse deployment restricts the rewrite to files whose min/max key
stats overlap the change keys (copy-on-write file pruning); the
directory-swap publisher here rewrites the whole (small) table but
keeps the identical merge plan.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def merge_frames(
    target: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    op_col: str = "op",
) -> DataFrame:
    """Apply a changeset to ``target``: rows with op 'U'/'I' replace or
    add (by key), rows with op 'D' are removed. Delete wins when a key
    carries both an upsert and a delete. ``changes`` must contain the
    target's columns plus ``op_col``."""
    deletes = changes.filter(F.col(op_col) == "D").select(*key_cols).distinct()
    upserts = (
        changes.filter(F.col(op_col) != "D")
        .join(F.broadcast(deletes), key_cols, "left_anti")
        .drop(op_col)
    )
    change_keys = changes.select(*key_cols).distinct()
    untouched = target.join(F.broadcast(change_keys), key_cols, "left_anti")
    return untouched.unionByName(upserts.select(*target.columns))


def merge_upsert(
    spark: SparkSession,
    target_path: str,
    changes: DataFrame,
    key_cols: list[str],
    op_col: str = "op",
) -> None:
    """Merge ``changes`` into the parquet table at ``target_path`` and
    atomically republish it (build in a sibling tmp dir, ``os.replace``
    into place — readers see the old or the new version, never a
    partial write)."""
    target = spark.read.parquet(target_path)
    merged = merge_frames(target, changes, key_cols, op_col)
    tmp = f"{target_path}.tmp-{os.getpid()}-{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(tmp)
    old = f"{target_path}.old-{uuid.uuid4().hex[:8]}"
    os.rename(target_path, old)
    os.rename(tmp, target_path)
    shutil.rmtree(old, ignore_errors=True)
