"""Global-window guard (r11 sweep): a bare ``W.orderBy(...)`` window
(no partitionBy) moves EVERY input row to one partition — WindowExec's
"No Partition Defined" warning — which is fine over a provably bounded
frame and fatal over anything that grows with the data.  The r11 sweep
rewrote the unbounded sites onto operators/rank (distributed
row_number / running sums / ntile) or limit-before-rank, and tagged
every justified remainder with a ``global-window-ok: <reason>``
comment naming the bounded input.

This test keeps the class from regrowing: every bare-orderBy site in
the package must carry the tag within its preceding lines (or live in
operators/rank.py, whose two tagged sites ARE the bounded
one-row-per-partition offset frames)."""

from __future__ import annotations

import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "graphql_api_etl_spark")
BARE = re.compile(r"\bW(?:indow)?\.orderBy\(")
TAG = "global-window-ok"
LOOKBACK = 8


def _sites():
    for dirpath, _dirs, names in os.walk(PKG):
        for name in names:
            if not name.endswith(".py"):
                continue
            if name == "rank.py":  # the distributed implementations
                # themselves: their two bare windows run over the
                # one-row-per-partition offset frames (tagged in-file)
                continue
            path = os.path.join(dirpath, name)
            lines = open(path, encoding="utf-8").read().splitlines()
            for i, line in enumerate(lines):
                if BARE.search(line):
                    yield path, i, lines


def test_every_bare_global_window_is_tagged_or_in_rank():
    untagged = []
    for path, i, lines in _sites():
        context = "\n".join(lines[max(0, i - LOOKBACK) : i + 1])
        if TAG not in context:
            untagged.append(f"{os.path.relpath(path, REPO)}:{i + 1}: {lines[i].strip()}")
    assert untagged == [], (
        "bare W.orderBy windows without a 'global-window-ok: <reason>' tag "
        "within the preceding lines — either justify the bounded input or "
        "rewrite via operators/rank (global_row_number / global_running_sums "
        "/ global_ntile / top_k_ranked):\n" + "\n".join(untagged)
    )


def test_guard_sees_the_sites_it_protects():
    """The regex must actually match the package's window idiom — a
    silent zero-site pass would mean the guard rotted."""
    assert sum(1 for _ in _sites()) >= 20
