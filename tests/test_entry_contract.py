"""Driver-contract invariants for __spark_entry__.py — cheap static
checks that protect the correctness gate's shape: the 50-slot window
is exactly filled, names resolve, every entry is oracle-backed, and a
failing callable oracle can only cost its own entry."""

from __future__ import annotations

import __spark_entry__ as entry
from graphql_api_etl_spark.queries import QUERIES


def test_priority_names_resolve_and_fill_the_window():
    assert len(entry._PRIORITY) == 50  # the driver checks the first 50
    assert len(set(entry._PRIORITY)) == 50  # no duplicate slots
    missing = [n for n in entry._PRIORITY if n not in QUERIES]
    assert missing == []


def test_ordered_covers_catalog_exactly_once():
    ordered = entry._ordered()
    assert len(ordered) == len(QUERIES)
    assert set(ordered) == set(QUERIES)


def test_every_entry_has_an_oracle_string():
    oracles = entry.oracle_sql()
    assert set(oracles) == set(QUERIES)
    assert all(isinstance(v, str) and v.strip() for v in oracles.values())


def test_failing_callable_oracle_costs_only_its_entry(monkeypatch):
    name = next(iter(QUERIES))
    fn, _ = QUERIES[name]

    def boom() -> str:
        raise RuntimeError("oracle builder exploded")

    monkeypatch.setitem(QUERIES, name, (fn, boom))
    oracles = entry.oracle_sql()
    assert name not in oracles
    assert len(oracles) == len(QUERIES) - 1
