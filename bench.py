"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q": sec, ...}, "sf": <sf>,
     "duckdb_queries": {"q": sec, ...}, "ratio_vs_duckdb": <x>}

Methodology (round-over-round comparability on a noisy VM):
- best-of-3 per query with INTERLEAVED order (q1..qN, q1..qN, ...) so
  a noisy-neighbor window hits different queries in different rounds
  instead of all samples of one query;
- each Spark query is forced end-to-end with a noop write (full plan
  executes on executors, nothing collected) after one warm-up query so
  JVM/codegen startup isn't billed to the first measured query;
- the DuckDB oracle for every headline query runs in the SAME process
  and window, also best-of-3 interleaved, so the reported ratio
  compares like against like rather than against a different-noise
  BASELINE.md measurement.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline set: the engine's flagship + scan/join/agg benchmarks +
# window/session + the LLM-pipeline operators. Keep this list in sync
# with the catalog (every name must exist in queries()).
HEADLINE = [
    "flagship_reconcile",
    "j_outer_provenance_counts",
    "j_broadcast_dims",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_volume",
    "events_tumbling_window",
    "events_sessionize",
    "events_sliding_window",
    "events_asof_join",
    "tpch_q6_forecast_revenue",
    "tpch_q18_large_orders",
    "dedup_exact_groups",
    "dedup_minhash_lsh",
    "dedup_embedding_cosine",
    "text_quality_stats",
    "sim_topk_bruteforce",
]

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

ROUNDS = 3


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from graphql_api_etl_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark(app_name="bench")
    qs = entrymod.queries()
    names = [n for n in HEADLINE if n in qs]

    # Warm-up: JVM, codegen, parquet footer caches.
    qs["tpch_q1_pricing_summary"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    best: dict[str, float] = {}
    for _ in range(ROUNDS):
        for name in names:
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            if name not in best or dt < best[name]:
                best[name] = dt
    timings = {n: round(best[n], 3) for n in names}

    # DuckDB oracles, same process/window, same interleaved best-of-N.
    duck: dict[str, float] = {}
    try:
        import duckdb

        oracles = entrymod.oracle_sql()
        con = duckdb.connect()
        for t in TABLES:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        with_oracle = [n for n in names if oracles.get(n)]
        for _ in range(ROUNDS):
            for name in with_oracle:
                t0 = time.time()
                con.execute(oracles[name]).fetchall()
                dt = time.time() - t0
                if name not in duck or dt < duck[name]:
                    duck[name] = dt
        duck = {n: round(v, 3) for n, v in duck.items()}
    except Exception:
        duck = {}

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    if duck:
        common = [n for n in duck if n in timings]
        s_total = sum(timings[n] for n in common)
        d_total = sum(duck[n] for n in common)
        out["duckdb_queries"] = duck
        out["ratio_vs_duckdb"] = round(s_total / d_total, 2) if d_total else None
    print(json.dumps(out))


if __name__ == "__main__":
    main()
