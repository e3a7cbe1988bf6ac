"""Local replica of the driver's oracle-differential gate.

Runs each ``queries()`` entry on Spark and its ``oracle_sql()`` on
DuckDB over the same parquet tables, then compares row count, column
names, and an order-insensitive value comparison (columns sorted by
name, rows sorted by their stringified tuple). Used by
tests/test_oracle_diff.py and runnable standalone:

    python tests/oracle_harness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duckdb_run(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


def _norm_cell(v):
    import datetime

    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<NaN>"
        return f"{v:.6f}".rstrip("0").rstrip(".")
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def _normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


def compare(name: str, spark_df, oracle_cols, oracle_rows) -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    problems: list[str] = []
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    if sorted(s_cols) != sorted(oracle_cols):
        problems.append(f"{name}: columns differ spark={sorted(s_cols)} oracle={sorted(oracle_cols)}")
        return problems
    if len(s_rows) != len(oracle_rows):
        problems.append(f"{name}: row count spark={len(s_rows)} oracle={len(oracle_rows)}")
    nc, ns = _normalize(s_cols, s_rows)
    no, os_ = _normalize(oracle_cols, oracle_rows)
    if ns != os_:
        diff_at = next((i for i, (a, b) in enumerate(zip(ns, os_)) if a != b), None)
        detail = ""
        if diff_at is not None:
            detail = f" first diff row {diff_at}: spark={ns[diff_at]} oracle={os_[diff_at]}"
        problems.append(f"{name}: value mismatch ({len(ns)} vs {len(os_)} rows){detail}")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod
    from graphql_api_etl_spark.session import get_spark

    spark = get_spark(app_name="oracle_harness", shuffle_partitions=8)
    qs = entrymod.queries()
    # Callable oracles embed data-derived literals (trained centroids)
    # — they must be built against the SAME sf the Spark side reads.
    # The driver's own gate runs at sf0.01, where the default already
    # matches; this makes the standalone harness correct at any scale.
    import os

    prev = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR")
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir
    try:
        oracles = entrymod.oracle_sql()
    finally:
        if prev is None:
            os.environ.pop("SPARK_GRAFT_ORACLE_SF_DIR", None)
        else:
            os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = prev
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        import time

        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            if name not in oracles:
                n = df.count()
                print(f"  {name}: rows-only check, {n} rows ({time.time()-t0:.1f}s)")
                continue
            ocols, orows = duckdb_run(oracles[name], sf_dir)
            problems = compare(name, df, ocols, orows)
        except Exception as exc:  # noqa: BLE001
            problems = [f"{name}: EXCEPTION {type(exc).__name__}: {exc}"]
        if problems:
            failed.append(name)
            for p in problems:
                print(f"FAIL {p}")
        else:
            print(f"  ok {name} ({time.time()-t0:.1f}s)")
    n_ran = len([q for q in qs if not only or q in only])
    print(f"\n{n_ran - len(failed)}/{n_ran} passed")
    if failed:
        print("failed:", failed)
        sys.exit(1)


if __name__ == "__main__":
    main()
