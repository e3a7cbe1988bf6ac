"""Suggest the next round's ``_PRIORITY`` window from CORRECTNESS history.

The grading driver checks only the FIRST 50 ``queries()`` entries, so
each round the window must be spent where evidence is weakest. Policy
(docs/ROUND_NOTES.md, "Open items"):

1. current-round misses (non-green rows in the NEWEST correctness file)
   — rotate failures to the front so the fix gets checked immediately;
2. entries with NO driver row in any round (new registrations) —
   oldest-registered first;
3. everything else by oldest latest-green round (round-robin refresh);
4. ties keep registration order.

Usage:  python scripts/rotate_window.py [window_size]
Prints the suggested ``_PRIORITY`` list as Python source.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    window = int(sys.argv[1]) if len(sys.argv) > 1 else 50

    from graphql_api_etl_spark.queries import QUERIES

    reg_order = {name: i for i, name in enumerate(QUERIES)}
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest_green, _first_green, newest_misses, _newest_round = load_history(
        repo_root, reg_order
    )
    suggestion, tags = suggest_window(reg_order, latest_green, newest_misses, window)

    n_miss = sum(1 for t in tags.values() if t == "MISS")
    n_never = sum(1 for t in tags.values() if t == "never-checked")
    print(f"# window={window}: {n_miss} misses, {n_never} never-checked, "
          f"green oldest-first fills the rest")
    print("_PRIORITY = [")
    for n in suggestion:
        print(f'    "{n}",  # {tags[n]}')
    print("]")


def suggest_window(
    reg_order: dict[str, int],
    latest_green: dict[str, int],
    newest_misses: list[str],
    window: int = 50,
) -> tuple[list[str], dict[str, str]]:
    """Apply the rotation policy: misses first, then never-checked in
    registration order, then greens oldest-first (round-robin refresh).
    Returns (window_names, {name: tag}) so callers can render or test
    the suggestion."""

    def reg(n: str) -> int:
        return reg_order[n]

    never_checked = [
        n for n in reg_order if n not in latest_green and n not in newest_misses
    ]
    tier1 = sorted({n for n in newest_misses if n in reg_order}, key=reg)
    tier2 = sorted(never_checked, key=reg)
    tier3 = sorted(
        (n for n in latest_green if n not in set(tier1)),
        key=lambda n: (latest_green[n], reg(n)),
    )
    suggestion = (tier1 + tier2 + tier3)[:window]
    tags = {
        n: ("MISS" if n in set(tier1)
            else "never-checked" if n in set(tier2)
            else f"green r{latest_green[n]}")
        for n in suggestion
    }
    return suggestion, tags


def amend_window(priority: list[str], newest_misses: list[str]) -> list[str]:
    """Amend a pre-staged window with the real newest-round misses (the
    round-start one-commit act, scripts/window_r8.py:20 policy): misses
    move to the FRONT in their given order, slots they displace drop
    from the TAIL (the tail holds the round-robin refresh fills, the
    lowest-value slots). Misses already inside the list are promoted,
    not duplicated; the result keeps the original length."""
    size = len(priority)
    front = list(dict.fromkeys(newest_misses))
    rest = [n for n in priority if n not in set(front)]
    return (front + rest)[:size]


def load_history(repo_root: str, reg_order: dict[str, int]):
    """(latest_green, first_green, newest_misses, newest_round) from
    CORRECTNESS_r*.json.  ``first_green`` is the round an entry FIRST
    went green in — ``check_window`` uses it to tell a just-completed
    window (every slot green for the first time in the newest round,
    the expected post-driver state) from a stale one that burned its
    slots re-checking entries already proven in earlier rounds."""
    files = sorted(
        glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json")),
        key=lambda p: int(re.search(r"r(\d+)", p).group(1)),
    )
    latest_green: dict[str, int] = {}
    first_green: dict[str, int] = {}
    newest_misses: list[str] = []
    newest_round = 0
    for path in files:
        rnd = int(re.search(r"r(\d+)", path).group(1))
        newest_round = max(newest_round, rnd)
        data = json.load(open(path))
        misses = []
        for name, row in data.items():
            if name not in reg_order:
                continue
            ok = bool(row.get("rows_match")) and bool(row.get("hash_match") is not False)
            if ok:
                latest_green[name] = max(latest_green.get(name, -1), rnd)
                first_green.setdefault(name, rnd)
            else:
                misses.append(name)
        if path == files[-1]:
            newest_misses = misses
    return latest_green, first_green, newest_misses, newest_round


def check_window(
    window_names: list[str],
    all_names: list[str],
    latest_green: dict[str, int],
    first_green: dict[str, int],
    newest_misses: list[str],
    newest_round: int,
    core_allowance: int = 8,
) -> list[str]:
    """Freshness invariant (VERDICT r4 ask #7, restructured per VERDICT
    r6 ask #1): the driver's 50-slot window must be SPENT where
    evidence is weakest, every round, or the never-checked backlog
    never drains. Violations:

    1. a newest-round MISS left outside the window (fix must be
       re-checked immediately);
    2. more than ``core_allowance`` window slots hold STALE greens —
       entries first proven green in a round BEFORE the newest — while
       never-driver-checked entries wait outside.  A slot whose FIRST
       green is the newest round is a *completed* check, not a wasted
       slot: the driver lands each round's CORRECTNESS file before the
       suite is re-run, so the expected post-round state is "every
       window slot freshly green".  An un-rotated window is still
       caught one round later: its slots then carry greens from two
       rounds, making ``first_green`` older than the newest round.
    3. an entry whose latest green is older than ``ceil(N/window)+2``
       rounds sits outside the window (round-robin starvation).
    """
    window = set(window_names)
    problems: list[str] = []
    for n in newest_misses:
        if n not in window:
            problems.append(f"newest-round miss {n!r} not in the window")
    never = [n for n in all_names if n not in latest_green and n not in newest_misses]
    waiting = [n for n in never if n not in window]
    if waiting:
        stale_greens = [
            n for n in window_names
            if n in first_green and first_green[n] < newest_round
        ]
        if len(stale_greens) > core_allowance:
            problems.append(
                f"{len(stale_greens)} window slots hold stale already-green entries "
                f"(first green before r{newest_round}; allowance {core_allowance}) "
                f"while {len(waiting)} never-checked entries wait outside — "
                f"re-run scripts/rotate_window.py"
            )
    if latest_green:
        import math

        max_age = math.ceil(len(all_names) / max(len(window_names), 1)) + 2
        for n, rnd in latest_green.items():
            if newest_round + 1 - rnd > max_age and n not in window:
                problems.append(
                    f"{n!r} last green in r{rnd} (> {max_age} rounds stale) and not in the window"
                )
    return problems


if __name__ == "__main__":
    main()
