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


def test_priority_window_spends_slots_where_evidence_is_weakest():
    """Freshness invariant (VERDICT r4 ask #7): fails when the first-50
    window burns slots on already-green entries while never-checked
    entries wait, leaves a fresh miss un-rechecked, or starves a stale
    entry — so each round's rotation stays mechanical and the backlog
    provably drains."""
    import os
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "scripts"))
    from rotate_window import check_window, load_history

    import __spark_entry__ as entry

    names = list(entry.queries())
    reg_order = {n: i for i, n in enumerate(names)}
    latest_green, newest_misses, newest_round = load_history(repo, reg_order)
    problems = check_window(names[:50], names, latest_green, newest_misses, newest_round)
    assert problems == [], "\n".join(problems)


def test_duplicate_registration_raises():
    """Catalog names are unique by construction (VERDICT r5 ask #4):
    re-registering a name raises instead of silently shadowing the
    first definition (dict semantics would hide the dead twin from the
    plan audit and the oracle differential)."""
    import pytest

    from graphql_api_etl_spark.queries import QUERIES, _q

    existing = next(iter(QUERIES))
    with pytest.raises(ValueError, match="registered twice"):
        _q(existing, "SELECT 1")(lambda spark, sf_dir: None)
