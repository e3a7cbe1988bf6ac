"""Z-order (Morton) clustering for multi-dimensional data skipping.

Sorting a table by one column makes parquet min/max stats selective
for THAT column only; interleaving the bits of several columns' ranks
gives every clustered column partially-sorted locality, so row-group /
file pruning works for filters on ANY of them (the Delta/Iceberg
OPTIMIZE ZORDER layout, re-expressed with native expressions).

Pipeline: global min/max per column (one tiny agg, broadcast as
literals) → linear quantization to ``bits``-bit ranks (map-only,
codegen) → bit interleave (shift/or chain) → ``repartitionByRange``
on the z-value (range exchange = contiguous z-blocks per file) →
sort within partitions → write. Cost is one range shuffle — the same
price as an ordinary sorted write.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _quantize(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Linear rank in [0, 2^bits): engine-cheap, resolution-bounded."""
    span = (hi - lo) or 1.0
    q = F.floor((col.cast("double") - F.lit(lo)) / F.lit(span) * F.lit((1 << bits) - 1))
    return F.greatest(F.lit(0), F.least(F.lit((1 << bits) - 1), q)).cast("bigint")


def z_value(ranks: list[Column], bits: int) -> Column:
    """Interleave ``bits``-bit ranks, highest bit first — a pure
    shift/or chain that stays inside whole-stage codegen."""
    n = len(ranks)
    if bits * n > 63:
        raise ValueError(
            f"z_value needs bits*cols <= 63 to stay inside a signed BIGINT; "
            f"got {bits}*{n}={bits * n} — lower `bits` (e.g. {63 // n}) for {n} columns"
        )
    z = F.lit(0).cast("bigint")
    for i in range(bits):  # bit i of each rank (msb..lsb placement)
        for j, r in enumerate(ranks):
            src_bit = bits - 1 - i
            dst_bit = (bits - 1 - i) * n + (n - 1 - j)
            z = z.bitwiseOR(F.shiftleft(F.shiftright(r, src_bit).bitwiseAND(F.lit(1)), dst_bit))
    return z


def write_zordered(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 8,
    n_files: int = 8,
) -> str:
    """Write ``df`` z-ordered on ``cols`` into ``n_files`` range-
    partitioned files."""
    stats = df.agg(
        *[F.min(c).cast("double").alias(f"lo_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"hi_{c}") for c in cols],
    ).first()
    ranks = [_quantize(F.col(c), stats[f"lo_{c}"], stats[f"hi_{c}"], bits) for c in cols]
    zed = df.withColumn("__z__", z_value(ranks, bits))
    (
        zed.repartitionByRange(n_files, "__z__")
        .sortWithinPartitions("__z__")
        .drop("__z__")
        .write.mode("overwrite")
        .parquet(path)
    )
    return path


def file_column_spans(path: str, cols: list[str]) -> list[dict[str, tuple]]:
    """Per parquet FILE: (min, max) of each column from footer stats —
    what a pruning reader consults. Test/diagnostic helper (pyarrow)."""
    import os

    import pyarrow.parquet as pq

    out = []
    for root, _, files in os.walk(path):
        for f in sorted(files):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(root, f)).metadata
            spans: dict[str, tuple] = {}
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    col = md.row_group(rg).column(ci)
                    name = col.path_in_schema
                    if name in cols and col.statistics is not None:
                        mn, mx = col.statistics.min, col.statistics.max
                        cur = spans.get(name)
                        spans[name] = (
                            mn if cur is None else min(cur[0], mn),
                            mx if cur is None else max(cur[1], mx),
                        )
            out.append(spans)
    return out


def pruning_selectivity(path: str, col: str, value) -> float:
    """Fraction of files a min/max-pruning reader would SKIP for an
    equality filter on ``col``."""
    spans = file_column_spans(path, [col])
    skipped = sum(1 for s in spans if col in s and not (s[col][0] <= value <= s[col][1]))
    return skipped / len(spans) if spans else 0.0
