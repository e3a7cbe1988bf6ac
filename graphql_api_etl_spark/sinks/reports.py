"""CSV report sink (reference K1: seven reconciliation/audit CSVs at
ETL:430, 520, 557, 726, 823, 836, 865).

Reports are human-audit artifacts (small by construction — they are
anti-join remainders), so a single output file is the right shape;
``coalesce(1)`` only collapses the final write, upstream parallelism
is untouched. For large outputs pass ``single_file=False`` and Spark
writes one part per partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_csv_report(df: DataFrame, path: str, single_file: bool = True) -> str:
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("header", True).csv(path)
    return path
