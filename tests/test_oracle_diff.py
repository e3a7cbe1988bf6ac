"""Local replica of the driver's oracle-differential gate, as pytest.

Every catalog entry with an oracle runs on Spark AND DuckDB at sf0.01
— the driver's contractual comparison scale — and must match on
columns, row count, and normalized values, so new entries get
differential coverage the moment they are registered, BEFORE the
driver's 50-entry rotation window reaches them (ADVICE r3: the 7
post-check TPC-H entries shipped with no automated oracle run).
sf0.01 and not sf0.001 because rounding boundaries are data-dependent:
the percentile entries interpolate to ...245 exactly at sf0.001 and
the two engines' float summation order rounds it apart, a boundary the
driver's scale never crosses.

Entries whose oracle is a callable are built under
$SPARK_GRAFT_ORACLE_SF_DIR pointing at the SAME sf dir the Spark side
reads (the lazily built oracles embed data-derived literals, e.g.
trained IVF centroids, so oracle and query must see one dataset).
"""

from __future__ import annotations

import os

import pytest

from graphql_api_etl_spark.queries import QUERIES

from oracle_harness import compare, duckdb_run

SF_DIR = "/root/testdata/sf0.01"

WITH_ORACLE = [name for name, (_, oracle) in QUERIES.items() if oracle is not None]


def test_catalog_is_fully_oracle_backed():
    """The driver records `err: no_oracle` for oracle-less entries
    (three rounds of CORRECTNESS evidence) — never register one."""
    missing = [name for name, (_, oracle) in QUERIES.items() if oracle is None]
    assert missing == []


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_diff(name, spark):
    fn, oracle = QUERIES[name]
    if callable(oracle):
        os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = SF_DIR
        try:
            oracle = oracle()
        finally:
            os.environ.pop("SPARK_GRAFT_ORACLE_SF_DIR", None)
    df = fn(spark, SF_DIR)
    ocols, orows = duckdb_run(oracle, SF_DIR)
    problems = compare(name, df, ocols, orows)
    assert problems == [], "\n".join(problems)
