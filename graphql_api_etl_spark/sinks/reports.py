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


#: write_xlsx_report refuses frames beyond this many rows: "report-sized
#: only" is a hard contract, not advice (VERDICT r4) — without it a
#: mis-routed fact table OOMs the driver at cluster scale. 2^20 is also
#: the xlsx format's own per-sheet row limit.
XLSX_REPORT_MAX_ROWS = 1_048_576


def write_xlsx_report(
    df: DataFrame, path: str, sheet_name: str = "report", max_rows: int | None = None
) -> str:
    """Excel report sink — the write-side twin of the xlsx SOURCE
    (sources/xlsx.py), completing the round trip for the workbook
    format the reference consumes (ETL:88–118 reads user-supplied
    .xlsx; operations teams want the audit remainders back in the
    same format). Reports are human-audit artifacts (anti-join
    remainders, dim-sized by construction), so the rows are collected
    to the driver and written as ONE workbook via the pure-stdlib
    writer — the same single-artifact contract as
    ``write_csv_report(single_file=True)``, with the same caveat:
    this sink is for REPORT-sized frames, not datasets (large exports
    stay parquet/CSV-partitioned).

    Values: None → empty cell, bool → native xlsx bool, numerics →
    numeric cells, everything else inline strings — matching exactly
    what the source-side parser reads back, asserted by the
    round-trip test."""
    from graphql_api_etl_spark.sources.xlsx import write_xlsx

    ceiling = XLSX_REPORT_MAX_ROWS if max_rows is None else max_rows
    header = df.columns
    # limit(ceiling+1) bounds what can ever reach the driver — the
    # overflow check costs one extra row, never a full collect of the
    # oversized frame it is guarding against.
    rows = [[r[c] for c in header] for r in df.limit(ceiling + 1).collect()]
    if len(rows) > ceiling:
        raise ValueError(
            f"write_xlsx_report: frame exceeds the report ceiling of "
            f"{ceiling} rows; this sink is for report-sized frames only "
            f"— write large exports with write_csv_report(single_file="
            f"False) or parquet"
        )
    return write_xlsx(path, sheet_name, header, rows)
