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
    """Freshness invariant (VERDICT r4 ask #7, restructured r7 per
    VERDICT r6 ask #1): fails when the first-50 window burns slots on
    STALE already-green entries (first proven green before the newest
    round) while never-checked entries wait, leaves a fresh miss
    un-rechecked, or starves a stale entry.  A window whose slots all
    went green for the FIRST time in the newest round is a completed
    round and passes — the driver lands CORRECTNESS_r{N}.json before
    the suite is re-run, so that is the expected post-round state."""
    import os
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "scripts"))
    from rotate_window import check_window, load_history

    import __spark_entry__ as entry

    names = list(entry.queries())
    reg_order = {n: i for i, n in enumerate(names)}
    latest_green, first_green, newest_misses, newest_round = load_history(repo, reg_order)
    problems = check_window(
        names[:50], names, latest_green, first_green, newest_misses, newest_round
    )
    assert problems == [], "\n".join(problems)


def test_window_invariant_green_with_and_without_untracked_newest_results(tmp_path):
    """VERDICT r6 ask #1 'done' criterion: the invariant must hold BOTH
    mid-round (no newest results yet) AND the moment the driver's
    newest CORRECTNESS file lands (tracked or not) — the two states the
    repo actually sits in.  Simulated against the real catalog: state A
    has history through r(N); state B adds r(N+1) where every current
    window slot goes green for the first time."""
    import json
    import os
    import shutil
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "scripts"))
    from rotate_window import check_window, load_history

    import __spark_entry__ as entry

    names = list(entry.queries())
    reg_order = {n: i for i, n in enumerate(names)}

    import glob as _glob

    for f in _glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        shutil.copy(f, tmp_path / os.path.basename(f))

    # State A: history as committed — the window is freshly rotated.
    latest_green, first_green, misses, newest = load_history(str(tmp_path), reg_order)
    problems_a = check_window(names[:50], names, latest_green, first_green, misses, newest)
    assert problems_a == [], "pre-results state red:\n" + "\n".join(problems_a)

    # State B: the driver's next-round file lands — all window slots
    # green for the first time in round newest+1.
    green_row = {"rows_match": True, "schema_match": True, "hash_match": True,
                 "spark_rows": 1, "oracle_rows": 1, "err": None}
    nxt = {n: dict(green_row) for n in names[:50]}
    (tmp_path / f"CORRECTNESS_r{newest + 1:02d}.json").write_text(json.dumps(nxt))
    latest_green, first_green, misses, newest_b = load_history(str(tmp_path), reg_order)
    assert newest_b == newest + 1
    problems_b = check_window(names[:50], names, latest_green, first_green, misses, newest_b)
    assert problems_b == [], "post-results state red:\n" + "\n".join(problems_b)


def test_window_invariant_catches_unrotated_window_one_round_late(tmp_path):
    """The first-green grace must NOT let a never-rotated window stay
    green forever: if the same 50 slots are re-checked a SECOND round
    while never-checked entries wait, their first green predates the
    newest round and the invariant trips."""
    import json
    import os

    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "scripts"))
    from rotate_window import check_window, load_history

    names = [f"q{i:03d}" for i in range(80)]
    reg_order = {n: i for i, n in enumerate(names)}
    green_row = {"rows_match": True, "hash_match": True}
    window = names[:50]
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({n: green_row for n in window}))
    (tmp_path / "CORRECTNESS_r02.json").write_text(
        json.dumps({n: green_row for n in window}))
    latest_green, first_green, misses, newest = load_history(str(tmp_path), reg_order)
    problems = check_window(window, names, latest_green, first_green, misses, newest)
    assert problems, "un-rotated window re-checked a second round must trip the invariant"
    assert any("stale already-green" in p for p in problems)


def test_prestaged_r8_window_is_valid():
    """VERDICT r6 ask #7: the pre-staged r8 window (scripts/window_r8.py)
    must satisfy the freshness invariant against a simulated history in
    which round 7 turned every current window slot green — so the next
    rotation is a one-commit copy, verified before it's needed."""
    import os
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "scripts"))
    from rotate_window import check_window, load_history
    from window_r8 import PRIORITY_R8

    import __spark_entry__ as entry

    names = list(entry.queries())
    reg_order = {n: i for i, n in enumerate(names)}
    assert len(PRIORITY_R8) == 50 and len(set(PRIORITY_R8)) == 50
    assert all(n in reg_order for n in PRIORITY_R8)

    latest_green, first_green, misses, newest = load_history(repo, reg_order)
    for n in names[:50]:  # simulate the r7 driver run going all-green
        latest_green[n] = newest + 1
        first_green.setdefault(n, newest + 1)
    problems = check_window(
        PRIORITY_R8, names, latest_green, first_green, misses, newest + 1
    )
    assert problems == [], "\n".join(problems)
    # After r8, nothing is left never-checked.
    never_after = [n for n in names
                   if n not in latest_green and n not in set(PRIORITY_R8)]
    assert never_after == []


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
