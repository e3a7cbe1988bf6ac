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

    files = sorted(
        glob.glob(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                               "CORRECTNESS_r*.json")),
        key=lambda p: int(re.search(r"r(\d+)", p).group(1)),
    )
    latest_green: dict[str, int] = {}
    newest_misses: list[str] = []
    for path in files:
        rnd = int(re.search(r"r(\d+)", path).group(1))
        data = json.load(open(path))
        misses = []
        for name, row in data.items():
            if name not in reg_order:
                continue  # renamed/retired entry
            ok = bool(row.get("rows_match")) and bool(row.get("hash_match") is not False)
            if ok:
                latest_green[name] = max(latest_green.get(name, -1), rnd)
            else:
                misses.append(name)
        if path == files[-1]:
            newest_misses = [n for n in misses]

    never_checked = [n for n in reg_order if n not in latest_green and n not in newest_misses]

    def reg(n: str) -> int:
        return reg_order[n]

    tier1 = sorted(set(newest_misses), key=reg)
    tier2 = sorted(never_checked, key=reg)
    tier3 = sorted(
        (n for n in latest_green if n not in set(tier1)),
        key=lambda n: (latest_green[n], reg(n)),
    )
    suggestion = (tier1 + tier2 + tier3)[:window]

    print(f"# window={window}: {len(tier1)} misses, {len(tier2)} never-checked, "
          f"{len(tier3)} green (oldest-first fills the rest)")
    print("_PRIORITY = [")
    for n in suggestion:
        tag = ("MISS" if n in set(tier1)
               else "never-checked" if n in set(tier2)
               else f"green r{latest_green[n]}")
        print(f'    "{n}",  # {tag}')
    print("]")


if __name__ == "__main__":
    main()
