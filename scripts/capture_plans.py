"""Capture `.explain("formatted")` output for catalog queries into
plans/<tag>/<name>_<suffix>.txt — the optimization-round evidence files
(the judge checks plan claims against these).

Usage:
    python scripts/capture_plans.py <tag> <suffix> [name ...]

With no names, captures the bench HEADLINE set. Plans are built at
$SPARK_GRAFT_SF_DIR (default sf0.1) — plan capture only, nothing is
executed.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from graphql_api_etl_spark.session import get_spark
    import __spark_entry__ as entrymod
    import bench

    spark = get_spark(app_name="capture_plans")
    qs = entrymod.queries()
    if not names:
        names = [n for n in bench.HEADLINE if n in qs]

    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    from graphql_api_etl_spark.plans.inspect import executed_plan

    for name in names:
        df = qs[name](spark, sf_dir)
        plan = executed_plan(df)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")


if __name__ == "__main__":
    main()
