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
  executes on executors, nothing collected) after one unmeasured
  warm-up pass over EVERY headline query (JMH style, r7) so JVM/janino
  /JIT startup isn't billed to any query's first measured sample;
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
    # sim_topk_bruteforce retired from the headline (VERDICT r4 ask #2):
    # it is the deliberate all-pairs |Q|·|C| baseline, kept in the
    # catalog + floor probes; the scale path (Arrow/BLAS matmul with
    # per-batch partial top-k) is what a cluster job would run.
    "sim_topk_matmul",
    "dedup_span_exact",
    "curate_bloom_decontaminate",
]

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

ROUNDS = 3

# Marginal-throughput probes (BASELINE.md "structural read", emitted as
# data): the same portable SQL runs on BOTH engines at 1x and REP x the
# fact table (replication via cross-join against a tiny range, so both
# engines multiply rows out of a single scan).  marginal_rows_per_sec =
# extra rows / extra seconds isolates per-row cost from the fixed
# job/codegen floor that dominates sub-second timings at sf0.1.
PROBE_REP = 8
PROBE_ROUNDS = 2
PROBES = [
    {
        "name": "scan_agg",  # TPC-H Q1 shape
        "fact": "lineitem",
        "sql": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(avg(l_discount), 2) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
    },
    {
        "name": "filter_agg",  # TPC-H Q6 shape
        "fact": "lineitem",
        "sql": """
            SELECT coalesce(round(sum(l_extendedprice * l_discount), 2), 0.0) AS revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
              AND l_discount >= 0.05 AND l_discount <= 0.07
              AND l_quantity < 24
        """,
    },
    {
        "name": "window_agg",  # events hourly rollup shape
        "fact": "events",
        "sql": """
            SELECT date_trunc('hour', ts) AS window_start, event_type,
                   count(*) AS n_events, round(sum(value), 2) AS total_value
            FROM events
            GROUP BY 1, 2
        """,
    },
    {
        "name": "join_agg",  # fact-dim hash join shape
        "fact": "orders",
        "sql": """
            SELECT c_mktsegment AS seg, count(*) AS n_orders,
                   round(sum(o_totalprice), 2) AS total_price
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment
        """,
    },
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from graphql_api_etl_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark(app_name="bench")
    qs = entrymod.queries()
    names = [n for n in HEADLINE if n in qs]

    # Warm-up: one unmeasured pass over EVERY headline query (JMH
    # style), so janino compilation and first-tier JIT of each query's
    # generated stages aren't billed to its first measured sample.
    # A single-query warm-up (the pre-r7 scheme) only covered the
    # stages that query shares with the others; queries with unique
    # stage shapes (the LSH band joins) were still paying multi-second
    # compile in sample 1 and partially-interpreted code in samples
    # 2-3, which best-of-3 then reported. DuckDB gets the same
    # treatment below for symmetry.
    for name in names:
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()

    samples: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(ROUNDS):
        for name in names:
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples[name].append(round(time.time() - t0, 3))
    timings = {n: min(samples[n]) for n in names}

    # DuckDB oracles, same process/window, same interleaved best-of-N.
    duck: dict[str, float] = {}
    duck_samples: dict[str, list[float]] = {}
    try:
        import duckdb

        oracles = entrymod.oracle_sql()
        con = duckdb.connect()
        for t in TABLES:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        with_oracle = [n for n in names if oracles.get(n)]
        duck_samples = {n: [] for n in with_oracle}
        for name in with_oracle:  # warm-up pass, symmetric with Spark's
            con.execute(oracles[name]).fetchall()
        for _ in range(ROUNDS):
            for name in with_oracle:
                t0 = time.time()
                con.execute(oracles[name]).fetchall()
                duck_samples[name].append(round(time.time() - t0, 3))
        duck = {n: min(v) for n, v in duck_samples.items()}
    except Exception as exc:  # noqa: BLE001 — a silent {} would read
        # as "no DuckDB available"; record what actually broke
        duck = {}
        duck_samples = {}
        duck_error = repr(exc)
    else:
        duck_error = None

    marginal = _probe_marginal(spark, sf_dir)
    floors = _probe_floors(spark, sf_dir)
    floors.update(_probe_relational_floors(spark, sf_dir))
    floors.update(_probe_codec_floors())

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
    if duck_error:
        out["duckdb_error"] = duck_error
    # All interleaved samples (not just best-of-N): lets a reader
    # separate real round-over-round movement from noisy-neighbor
    # windows — r3's minhash "regression" was sample noise that a
    # spread field would have settled immediately (VERDICT r3 ask #6).
    out["samples"] = samples
    if duck_samples:
        out["duckdb_samples"] = duck_samples
    if marginal:
        out["marginal_rows_per_sec"] = marginal
    if floors:
        out["floors"] = floors
    print(json.dumps(out))
    # FINAL line: compact summary (VERDICT r5 ask #3). The driver's
    # BENCH_r*.json keeps only the LAST 2000 chars of stdout, which
    # used to preserve the detailed line's tail (floors, duckdb
    # samples) but drop the Spark headline map. This line carries the
    # full contract keys (metric/value/unit/queries/sf + ratio) in
    # under 2000 chars so the recorded artifact always has the Spark
    # numbers; the detailed line above keeps samples/floors/probes.
    def med(vals: list[float]) -> float:
        s = sorted(vals)
        mid = len(s) // 2
        return s[mid] if len(s) % 2 else (s[mid - 1] + s[mid]) / 2

    compact = {
        "metric": "headline_queries_total_sec",
        "compact": True,  # tag so a stdout scanner can tell the two
        # same-metric lines apart (ADVICE r6) — the detailed line above
        # has no "compact" key.
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    # Per-query spread (VERDICT r7 ask #7): best-of-N alone can't tell
    # a real regression from a noisy-neighbor window (r7: q5 "+32%"
    # builder-side, reversed in the judge's run). Each entry is
    # [spark_med, spark_max, duck_best, duck_med] — spark best is in
    # "queries"; a number is adjudicable when med ≈ best and unstable
    # when max >> med. duck_best/duck_med cover VERDICT r6 ask #3's
    # per-query DuckDB times AND make a median-based envelope readable
    # straight off the artifact.
    compact["spread"] = {
        n: [round(med(samples[n]), 3), round(max(samples[n]), 3)]
        + ([duck[n], round(med(duck_samples[n]), 3)] if n in duck else [])
        for n in names
    }
    if "ratio_vs_duckdb" in out:
        compact["ratio_vs_duckdb"] = out["ratio_vs_duckdb"]
        common = [n for n in duck if n in timings]
        compact["duckdb_total_sec"] = round(sum(duck[n] for n in common), 3)
        d_med_total = sum(med(duck_samples[n]) for n in common)
        compact["ratio_med_vs_duckdb"] = (
            round(sum(med(samples[n]) for n in common) / d_med_total, 2)
            if d_med_total else None
        )
    blob = json.dumps(compact)
    # The driver keeps only the LAST 2000 chars of stdout; an
    # over-budget line would truncate the recorded artifact from the
    # front. Degrade deterministically instead (ADVICE r8): drop
    # spread entries for the FASTEST queries first (least adjudicable
    # loss) and record which were dropped; if the line still doesn't
    # fit with zero spread entries, the contract keys themselves are
    # over budget — fail loud.
    if len(blob) >= 2000 and "spread" in compact:
        by_speed = sorted(compact["spread"], key=lambda n: timings.get(n, 0.0))
        dropped: list[str] = []
        while len(blob) >= 2000 and by_speed:
            dropped.append(by_speed.pop(0))
            compact["spread"] = {
                n: v for n, v in compact["spread"].items() if n not in dropped
            }
            compact["spread_dropped"] = dropped
            blob = json.dumps(compact)
    if len(blob) >= 2000:
        sys.stderr.write(
            f"bench: compact summary line is {len(blob)} chars (>= 2000) "
            "even with every spread entry dropped; trim HEADLINE\n"
        )
        print(blob)
        sys.exit(1)
    print(blob)


def _noop_best(df, n: int = 3) -> float:
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    return best


def _probe_floors(spark, sf_dir: str) -> dict:
    """Floor decomposition for the two perf-weak queries (VERDICT r3
    asks #3/#4): where does the sub-second sf0.1 gap vs DuckDB live,
    and does it amortize at scale?

    - ``empty_plan_sec``: the identical plan over a 0-row (but not
      known-empty-at-plan-time) scan — generic plan+schedule floor.
      NOTE this UNDERSTATES total fixed cost: stages whose scan prunes
      to zero partitions never JIT their generated code.
    - ``sim_topk_bruteforce``: corpus replicated 8× with remapped ids
      (pair count scales linearly for a |Q|·|C| scorer), giving
      per-corpus-row marginal cost and the fixed intercept
      ``sec_1x − n·marginal``.
    - ``dedup_embedding_cosine``: replication is invalid (candidate
      pairs grow quadratically), so the linear map-only bucket stage
      (r5+: the 48-plane Arrow kernel) is timed alone; it carries a
      fixed plan+schedule intercept plus a per-row cost that
      parallelizes, so neither survives a 1000× scale-up as a
      bottleneck. (r7: the historical ~0.5 s intercept was mostly the
      100-entry codegen-class cache thrashing under the multi-query
      bench — see session.py's cache.maxEntries note.)
    """
    out: dict[str, dict] = {}
    try:
        from pyspark.sql import functions as F

        from graphql_api_etl_spark.operators import similarity as S
        from graphql_api_etl_spark.queries_llm import _emb_cosine_dedup
        from graphql_api_etl_spark.sources.registry import load_table

        emb = load_table(spark, sf_dir, "embeddings")
        n = emb.count()
        empty = emb.filter(F.col("vec_id") < 0)
        rep = 8
        emb8 = emb.crossJoin(spark.range(rep).select(F.col("id").alias("__r"))).select(
            (F.col("vec_id") + F.col("__r") * (n + 1)).alias("vec_id"), "embedding"
        )

        def construct_best(mk, n_tries: int = 3) -> tuple[float, object]:
            # plan CONSTRUCTION (py4j + parse + eager analysis) is a
            # real, fixed, scale-free part of each headline sample —
            # reported separately so the spark-vs-duckdb gap at sf0.1
            # attributes to the right place
            best, df = float("inf"), None
            for _ in range(n_tries):
                t0 = time.time()
                df = mk()
                best = min(best, time.time() - t0)
            return best, df

        q = emb.filter(F.col("vec_id") < 10)
        c1, df1 = construct_best(lambda: S.topk_bruteforce(q, emb, k=5, dim=64))
        s1 = _noop_best(df1)
        s8 = _noop_best(S.topk_bruteforce(q, emb8, k=5, dim=64))
        se = _noop_best(S.topk_bruteforce(q, empty, k=5, dim=64))
        marginal_us = (s8 - s1) / (n * (rep - 1)) * 1e6 if s8 > s1 else None
        out["sim_topk_bruteforce"] = {
            "construct_sec": round(c1, 3),
            "sec_1x": round(s1, 3),
            "sec_8x_corpus": round(s8, 3),
            "empty_plan_sec": round(se, 3),
            "marginal_us_per_corpus_row": round(marginal_us, 2) if marginal_us is not None else None,
            "fixed_overhead_sec": round(s1 - (marginal_us or 0) * 1e-6 * n, 3),
        }

        # matmul variant of the same top-k: marginal per-pair cost of
        # the Arrow/BLAS path vs the scalar-codegen brute force — the
        # number that decides which one a 1000-executor job should run
        qm = emb.filter(F.col("vec_id") < 50)
        m1 = _noop_best(S.topk_matmul(qm, emb, k=5))
        m8 = _noop_best(S.topk_matmul(qm, emb8, k=5))
        b1s = _noop_best(S.topk_bruteforce(qm, emb, k=5, dim=64))
        b8s = _noop_best(S.topk_bruteforce(qm, emb8, k=5, dim=64))
        # two-engine side (r10): the committed oracle (brute cosine via
        # list_dot_product — DuckDB has no ANN) on the same 1x/8x
        # corpus. View replication (not materialized files) is fair
        # HERE: the work is the 50x|corpus| dot products, not the scan
        # — same rationale as the cosine probe below.
        import duckdb as _ddb

        from graphql_api_etl_spark.queries_llm import _MATMUL_ORACLE

        def _mm_duck(view_sql: str, n_tries: int = 2) -> float:
            con = _ddb.connect()
            con.execute(f"CREATE VIEW embeddings AS {view_sql}")
            best = float("inf")
            for _ in range(n_tries):
                t0 = time.time()
                con.execute(_MATMUL_ORACLE).fetchall()
                best = min(best, time.time() - t0)
            con.close()
            return best

        md1 = _mm_duck(f"SELECT * FROM read_parquet('{sf_dir}/embeddings.parquet')")
        md8 = _mm_duck(
            f"SELECT e.vec_id + r.range * ({n} + 1) AS vec_id, e.embedding "
            f"FROM read_parquet('{sf_dir}/embeddings.parquet') e CROSS JOIN range({rep}) r"
        )
        mm_m = (m8 - m1) / (n * (rep - 1)) * 1e6 if m8 > m1 else None
        mm_d = (md8 - md1) / (n * (rep - 1)) * 1e6 if md8 > md1 else None
        out["sim_topk_matmul_vs_brute"] = {
            "matmul_sec_1x": round(m1, 3),
            "matmul_sec_8x": round(m8, 3),
            "brute_sec_1x": round(b1s, 3),
            "brute_sec_8x": round(b8s, 3),
            "duck_sec_1x": round(md1, 3),
            "duck_sec_8x": round(md8, 3),
            "matmul_marginal_us_per_row": round(mm_m, 2) if mm_m is not None else None,
            "brute_marginal_us_per_row": round((b8s - b1s) / (n * (rep - 1)) * 1e6, 2)
            if b8s > b1s else None,
            "duck_marginal_us_per_row": round(mm_d, 2) if mm_d is not None else None,
            "marginal_ratio_vs_duckdb": round(mm_m / mm_d, 3) if mm_m is not None and mm_d else None,
        }

        from graphql_api_etl_spark.queries_llm import _EC_PLANES

        cd, dfd = construct_best(lambda: _emb_cosine_dedup(emb))
        d1 = _noop_best(dfd)
        de = _noop_best(_emb_cosine_dedup(empty))
        # bucket stage alone (the linear, map-only part of the plan —
        # r5: the 48-plane Arrow-vectorized code, same as the query)
        b1 = _noop_best(S.with_hyperplane_bucket(emb, n_planes=_EC_PLANES, dim=64))
        # 8x-corpus marginal vs DuckDB (VERDICT r8 ask #3): run the
        # SAME query in BOTH engines on the same 8x-replicated corpus
        # (remapped ids; replicas collide in every band, so candidates
        # grow quadratically — identical extra work for both engines)
        # and compare per-extra-row marginals. Settles whether the
        # sub-second sf0.1 gap is fixed cost: measured r9, Spark
        # 0.68 s -> 1.99 s while DuckDB went 0.49 s -> 14.5 s —
        # marginal ratio ~0.09x, i.e. Spark is ~10x FASTER per row
        # once the corpus is big enough to dominate the ~0.6 s
        # plan+schedule intercept. Best-of-2 (the 8x DuckDB run alone
        # is ~14 s; the 7x signal dwarfs sample noise).
        s8 = _noop_best(_emb_cosine_dedup(emb8), n=2)
        import duckdb

        from graphql_api_etl_spark.queries_llm import _emb_cosine_dedup_sql

        ec_sql = _emb_cosine_dedup_sql(0.4)

        def _duck_best(view_sql: str, n_tries: int = 2) -> float:
            con = duckdb.connect()
            con.execute(f"CREATE VIEW embeddings AS {view_sql}")
            best = float("inf")
            for _ in range(n_tries):
                t0 = time.time()
                con.execute(ec_sql).fetchall()
                best = min(best, time.time() - t0)
            con.close()
            return best

        src = f"SELECT * FROM read_parquet('{sf_dir}/embeddings.parquet')"
        dk1 = _duck_best(src)
        dk8 = _duck_best(
            f"SELECT e.vec_id + r.range * ({n} + 1) AS vec_id, e.embedding "
            f"FROM read_parquet('{sf_dir}/embeddings.parquet') e CROSS JOIN range({rep}) r"
        )
        extra = n * (rep - 1)
        sm = (s8 - d1) / extra * 1e6 if s8 > d1 else None
        dm = (dk8 - dk1) / extra * 1e6 if dk8 > dk1 else None
        out["dedup_embedding_cosine"] = {
            "construct_sec": round(cd, 3),
            "sec": round(d1, 3),
            "empty_plan_sec": round(de, 3),
            "bucket_stage_sec": round(b1, 3),
            "sec_8x_corpus": round(s8, 3),
            "duck_sec": round(dk1, 3),
            "duck_sec_8x_corpus": round(dk8, 3),
            "marginal_us_per_row": round(sm, 2) if sm is not None else None,
            "duck_marginal_us_per_row": round(dm, 2) if dm is not None else None,
            "marginal_ratio_vs_duckdb": round(sm / dm, 3) if sm is not None and dm else None,
        }
    except Exception as exc:  # noqa: BLE001
        out["_error"] = repr(exc)
    return out


def _probe_relational_floors(spark, sf_dir: str) -> dict:
    """Two-engine replicated-input marginal probes for the RELATIONAL
    core (VERDICT r9 ask #2) — the same method that settled the
    dedup_embedding_cosine envelope in r9, applied to the join-shape
    and scan-agg-shape headline representatives:

    - ``flagship_reconcile``: customer and orders each replicated 24x
      with join keys offset per replica (replica i of customer joins
      ONLY replica i of orders, so join work grows linearly, matching
      a real 24x data-scale), through the entry's OWN plan builder
      (queries._flagship_report) and its committed oracle SQL on
      DuckDB over identically-remapped views.
    - ``tpch_q1_pricing_summary``: lineitem replicated 24x (pure
      scan-agg — group count is replication-invariant), through
      queries._q1_summary and the entry's oracle SQL.

    ``marginal_ratio_vs_duckdb`` = (spark_repx − spark_1x) /
    (duck_repx − duck_1x): per-extra-row cost once the data dominates
    the fixed plan/schedule intercept — the number that decides
    whether a nominal sub-second sf0.1 gap survives a 100x scale-up.

    Unlike the cosine probe (where the work is the candidate join and
    crossJoin-replication is fine), these two queries are SCAN-bound,
    so the replicated input is MATERIALIZED as real parquet once per
    run and both engines scan the same files — a crossJoin replica
    would bill Spark's row-multiplication machinery as if it were
    query work.
    """
    out: dict[str, dict] = {}
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp(prefix="bench_rel_floors_")
    try:
        import duckdb

        from pyspark.sql import functions as F

        from graphql_api_etl_spark.queries import (
            _FLAGSHIP_SQL,
            _asof_clicks_report,
            _broadcast_dims_report,
            _flagship_report,
            _q1_summary,
            _sessionize_report,
            _tumbling_report,
            QUERIES,
        )
        from graphql_api_etl_spark.sources.registry import load_table

        # 24x, not PROBE_REP=8: at 8x the engine deltas are ~0.3/0.15 s
        # against a ±30% run-to-run noise band on this VM; tripling the
        # replica count triples the signal for one extra parquet write.
        rep = 24
        K = 100_000_000  # key offset per replica; >> any key at any test SF

        cust = load_table(spark, sf_dir, "customer")
        orders = load_table(spark, sf_dir, "orders")
        li = load_table(spark, sf_dir, "lineitem")
        n_c, n_o, n_l = cust.count(), orders.count(), li.count()

        def materialize(df, name: str, key_cols: tuple[str, ...] = (), rep_n: int | None = None) -> str:
            path = f"{tmp}/{name}"
            (
                df.crossJoin(spark.range(rep_n or rep).select(F.col("id").alias("__r")))
                .select(
                    *[
                        (F.col(c) + F.col("__r") * K).alias(c)
                        if c in key_cols
                        else F.col(c)
                        for c in df.columns
                    ]
                )
                .write.mode("overwrite")
                .parquet(path)
            )
            return path

        li8 = materialize(li, "lineitem8")
        cust8 = materialize(cust, "customer8", ("c_custkey",))
        ord8 = materialize(orders, "orders8", ("o_custkey", "o_orderkey"))

        con = duckdb.connect()

        def duck_best(sql: str, n_tries: int = 2) -> float:
            best = float("inf")
            for _ in range(n_tries):
                t0 = time.time()
                con.execute(sql).fetchall()
                best = min(best, time.time() - t0)
            return best

        # --- tpch_q1: scan-agg shape --------------------------------
        q1_sql = QUERIES["tpch_q1_pricing_summary"][1]
        s1 = _noop_best(_q1_summary(li))
        s8 = _noop_best(_q1_summary(spark.read.parquet(li8)), n=2)
        con.execute(
            f"CREATE OR REPLACE VIEW lineitem AS "
            f"SELECT * FROM read_parquet('{sf_dir}/lineitem.parquet')"
        )
        d1 = duck_best(q1_sql)
        con.execute(
            f"CREATE OR REPLACE VIEW lineitem AS "
            f"SELECT * FROM read_parquet('{li8}/*.parquet')"
        )
        d8 = duck_best(q1_sql)
        extra = n_l * (rep - 1)
        sm = (s8 - s1) / extra * 1e6 if s8 - s1 > 0.02 else None
        dm = (d8 - d1) / extra * 1e6 if d8 - d1 > 0.02 else None
        out["tpch_q1_pricing_summary"] = {
            "rows_base": n_l,
            "rep": rep,
            "sec_1x": round(s1, 3),
            "sec_repx": round(s8, 3),
            "duck_sec_1x": round(d1, 3),
            "duck_sec_repx": round(d8, 3),
            "marginal_us_per_row": round(sm, 3) if sm is not None else None,
            "duck_marginal_us_per_row": round(dm, 3) if dm is not None else None,
            "marginal_ratio_vs_duckdb": round(sm / dm, 3) if sm is not None and dm else None,
        }

        # --- flagship: full-outer join + agg shape ------------------
        cust_f = cust.filter(F.col("c_acctbal") > 0)
        ord_f = orders.filter(F.col("o_totalprice") > 50000)
        cust8_f = spark.read.parquet(cust8).filter(F.col("c_acctbal") > 0)
        ord8_f = spark.read.parquet(ord8).filter(F.col("o_totalprice") > 50000)
        f1 = _noop_best(_flagship_report(cust_f, ord_f))
        f8 = _noop_best(_flagship_report(cust8_f, ord8_f))
        # The named alternative (kept OUT of the entry: full-outer
        # shuffled-hash builds a per-partition map — faster single-node,
        # but SMJ is the spill-safe 100 TB default): quantified here so
        # the artifact carries the fix's measured value, not a guess.
        h1 = _noop_best(_flagship_report(cust_f.hint("SHUFFLE_HASH"), ord_f))
        h8 = _noop_best(_flagship_report(cust8_f.hint("SHUFFLE_HASH"), ord8_f))
        con.execute(
            f"CREATE OR REPLACE VIEW customer AS "
            f"SELECT * FROM read_parquet('{sf_dir}/customer.parquet')"
        )
        con.execute(
            f"CREATE OR REPLACE VIEW orders AS "
            f"SELECT * FROM read_parquet('{sf_dir}/orders.parquet')"
        )
        fd1 = duck_best(_FLAGSHIP_SQL)
        con.execute(
            f"CREATE OR REPLACE VIEW customer AS "
            f"SELECT * FROM read_parquet('{cust8}/*.parquet')"
        )
        con.execute(
            f"CREATE OR REPLACE VIEW orders AS "
            f"SELECT * FROM read_parquet('{ord8}/*.parquet')"
        )
        fd8 = duck_best(_FLAGSHIP_SQL)
        extra = (n_c + n_o) * (rep - 1)
        sm = (f8 - f1) / extra * 1e6 if f8 - f1 > 0.02 else None
        dm = (fd8 - fd1) / extra * 1e6 if fd8 - fd1 > 0.02 else None
        hm = (h8 - h1) / extra * 1e6 if h8 - h1 > 0.02 else None
        out["flagship_reconcile"] = {
            "rows_base": n_c + n_o,
            "rep": rep,
            "sec_1x": round(f1, 3),
            "sec_repx": round(f8, 3),
            "duck_sec_1x": round(fd1, 3),
            "duck_sec_repx": round(fd8, 3),
            "marginal_us_per_row": round(sm, 3) if sm is not None else None,
            "duck_marginal_us_per_row": round(dm, 3) if dm is not None else None,
            "marginal_ratio_vs_duckdb": round(sm / dm, 3) if sm is not None and dm else None,
            "shj_hint_marginal_us_per_row": round(hm, 3) if hm else None,
            "shj_hint_ratio_vs_duckdb": round(hm / dm, 3) if hm and dm else None,
        }

        # --- j_broadcast_dims: broadcast-hash-join shape -------------
        # (the third nominal-ratio headline shape VERDICT r9 named:
        # 36x best-of at sf0.1 on a 0.1 s absolute). The fact side is
        # the replicated customer8 files (the custkey remap is inert —
        # this join keys on c_nationkey); dims stay 1x, as they would
        # at any scale.
        nation = load_table(spark, sf_dir, "nation")
        region = load_table(spark, sf_dir, "region")
        # customer is the SMALLEST fact (15 k at sf0.1): at 24x both
        # engines' deltas sit under the 20 ms noise floor, so this
        # shape replicates 800x (12 M rows — the write is still cheap).
        # Even then the Spark delta rides a ±0.15 s scheduling band
        # (measured: 12 M rows took LESS wall time than 3 M in one
        # window), so read this row as an upper bound on the marginal,
        # not a point estimate — the shape's absolute cost is fixed-
        # dominated at any SF this harness can materialize.
        rep_bd = 800
        cust_bd = materialize(cust, "customer_bd", rep_n=rep_bd)
        g1 = _noop_best(_broadcast_dims_report(cust, nation, region))
        g8 = _noop_best(
            _broadcast_dims_report(spark.read.parquet(cust_bd), nation, region), n=2
        )
        bd_sql = QUERIES["j_broadcast_dims"][1]
        con.execute(
            f"CREATE OR REPLACE VIEW nation AS "
            f"SELECT * FROM read_parquet('{sf_dir}/nation.parquet')"
        )
        con.execute(
            f"CREATE OR REPLACE VIEW region AS "
            f"SELECT * FROM read_parquet('{sf_dir}/region.parquet')"
        )
        con.execute(
            f"CREATE OR REPLACE VIEW customer AS "
            f"SELECT * FROM read_parquet('{sf_dir}/customer.parquet')"
        )
        gd1 = duck_best(bd_sql)
        con.execute(
            f"CREATE OR REPLACE VIEW customer AS "
            f"SELECT * FROM read_parquet('{cust_bd}/*.parquet')"
        )
        gd8 = duck_best(bd_sql)
        extra = n_c * (rep_bd - 1)
        sm = (g8 - g1) / extra * 1e6 if g8 - g1 > 0.02 else None
        dm = (gd8 - gd1) / extra * 1e6 if gd8 - gd1 > 0.02 else None
        out["j_broadcast_dims"] = {
            "rows_base": n_c,
            "rep": rep_bd,
            "sec_1x": round(g1, 3),
            "sec_repx": round(g8, 3),
            "duck_sec_1x": round(gd1, 3),
            "duck_sec_repx": round(gd8, 3),
            "marginal_us_per_row": round(sm, 3) if sm is not None else None,
            "duck_marginal_us_per_row": round(dm, 3) if dm is not None else None,
            "marginal_ratio_vs_duckdb": round(sm / dm, 3) if sm is not None and dm else None,
        }
        # --- events_asof_join: union + ordered-window shape ----------
        # (the 4th plan family: no Spark-native ASOF JOIN, so the
        # operator is one |L|+|R| shuffle on user_id + a window sort;
        # DuckDB runs its NATIVE ASOF LEFT JOIN — engine-native vs
        # composed operator, the fairest possible comparison). Users
        # and event ids offset per replica so per-user as-of work
        # scales linearly, like real 24x data.
        ev = load_table(spark, sf_dir, "events")
        n_e = ev.count()
        ev24 = materialize(ev, "events24", ("user_id", "event_id"))
        a1 = _noop_best(_asof_clicks_report(ev))
        a8 = _noop_best(_asof_clicks_report(spark.read.parquet(ev24)), n=2)
        asof_sql = QUERIES["events_asof_join"][1]
        con.execute(
            f"CREATE OR REPLACE VIEW events AS "
            f"SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
        )
        ad1 = duck_best(asof_sql)
        con.execute(
            f"CREATE OR REPLACE VIEW events AS "
            f"SELECT * FROM read_parquet('{ev24}/*.parquet')"
        )
        ad8 = duck_best(asof_sql)
        extra = n_e * (rep - 1)
        sm = (a8 - a1) / extra * 1e6 if a8 - a1 > 0.02 else None
        dm = (ad8 - ad1) / extra * 1e6 if ad8 - ad1 > 0.02 else None
        out["events_asof_join"] = {
            "rows_base": n_e,
            "rep": rep,
            "sec_1x": round(a1, 3),
            "sec_repx": round(a8, 3),
            "duck_sec_1x": round(ad1, 3),
            "duck_sec_repx": round(ad8, 3),
            "marginal_us_per_row": round(sm, 3) if sm is not None else None,
            "duck_marginal_us_per_row": round(dm, 3) if dm is not None else None,
            "marginal_ratio_vs_duckdb": round(sm / dm, 3) if sm is not None and dm else None,
        }

        # --- events_tumbling_window: time-bucket agg shape -----------
        # and events_sessionize: per-key window (lag + running sum)
        # shape — the last two headline plan families; both reuse the
        # materialized events24 (the id remap is inert for tumbling
        # and gives sessionize linear per-user work, like real data).
        ev24_df = spark.read.parquet(ev24)
        for label, builder in (
            ("events_tumbling_window", _tumbling_report),
            ("events_sessionize", _sessionize_report),
        ):
            t1 = _noop_best(builder(ev))
            t8 = _noop_best(builder(ev24_df), n=2)
            q_sql = QUERIES[label][1]
            con.execute(
                f"CREATE OR REPLACE VIEW events AS "
                f"SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
            )
            td1 = duck_best(q_sql)
            con.execute(
                f"CREATE OR REPLACE VIEW events AS "
                f"SELECT * FROM read_parquet('{ev24}/*.parquet')"
            )
            td8 = duck_best(q_sql)
            extra = n_e * (rep - 1)
            sm = (t8 - t1) / extra * 1e6 if t8 - t1 > 0.02 else None
            dm = (td8 - td1) / extra * 1e6 if td8 - td1 > 0.02 else None
            out[label] = {
                "rows_base": n_e,
                "rep": rep,
                "sec_1x": round(t1, 3),
                "sec_repx": round(t8, 3),
                "duck_sec_1x": round(td1, 3),
                "duck_sec_repx": round(td8, 3),
                "marginal_us_per_row": round(sm, 3) if sm is not None else None,
                "duck_marginal_us_per_row": round(dm, 3) if dm is not None else None,
                "marginal_ratio_vs_duckdb": round(sm / dm, 3) if sm is not None and dm else None,
            }

        con.close()
    except Exception as exc:  # noqa: BLE001
        out["_relational_floors_error"] = repr(exc)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def _probe_codec_floors() -> dict:
    """Throughput quantification for the pure-Python multimodal codec
    interiors (VERDICT r9 ask #4): single-core decode MB/s over an
    8x replica of the mm entries' own corpus shape, plus one larger
    image where per-image overhead amortizes. No Spark involved — the
    Arrow boundary is already plan-audited; the open question was the
    bytes/sec of the interpreted interiors, i.e. WHERE the documented
    libjpeg-turbo/libpng integration boundary (operators/jpeg.py:11)
    starts to matter. Both payload MB/s (what a scan reads) and output
    pixel MB/s (what the decode produces) are reported."""
    out: dict[str, dict] = {}
    try:
        from graphql_api_etl_spark.operators.jpeg import (
            decode_jpeg,
            synthesize_jpeg_gray,
        )
        from graphql_api_etl_spark.operators.multimodal import (
            decode_png_stream,
            synthesize_png,
        )

        rep, n_ids = 8, 250

        def jpeg_corpus(i: int) -> tuple[bytes, int]:
            # mm_jpeg_decode's builder shape: 16-wide, 8*(1..3)-tall
            # gray, constant closed-form tiles, odd ids with restarts
            bw, bh = 2, 1 + i % 3
            w, h = bw * 8, bh * 8
            px = bytearray(w * h)
            for blk in range(bw * bh):
                lvl = (((i * 13 + blk * 29) * 2654435761) % 4294967296) >> 24
                bx, by = blk % bw, blk // bw
                for y in range(8):
                    base = (by * 8 + y) * w + bx * 8
                    px[base : base + 8] = bytes([lvl]) * 8
            return (
                synthesize_jpeg_gray(w, h, bytes(px), restart_interval=2 if i % 2 else 0),
                w * h,
            )

        def png_corpus(i: int) -> tuple[bytes, int]:
            # mm_png_interlaced's builder shape: Adam7 truecolor
            bw, bh = 2, 1 + i % 3
            w, h = bw * 8, bh * 8
            px = bytearray(w * h * 3)
            for blk in range(bw * bh):
                lvl = (((i * 23 + blk * 41) * 2654435761) % 4294967296) >> 24
                bx, by = blk % bw, blk // bw
                for y in range(8):
                    base = ((by * 8 + y) * w + bx * 8) * 3
                    px[base : base + 24] = bytes([lvl]) * 24
            return synthesize_png(w, h, bytes(px), interlace=True), w * h * 3

        def measure(build, decode, label: str, large) -> None:
            corpus = [build(i) for i in range(n_ids)] * rep
            payload_b = sum(len(p) for p, _ in corpus)
            pixel_b = sum(n for _, n in corpus)
            t0 = time.time()
            for p, _ in corpus:
                decode(p)
            sec = time.time() - t0
            row = {
                "corpus_images": len(corpus),
                "corpus_payload_mb": round(payload_b / 1e6, 3),
                "decode_sec_one_core": round(sec, 3),
                "payload_mb_per_sec_core": round(payload_b / 1e6 / sec, 3),
                "pixel_mb_per_sec_core": round(pixel_b / 1e6 / sec, 3),
            }
            lp, lpix = large
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                decode(lp)
                best = min(best, time.time() - t0)
            row["large_image_pixel_mb_per_sec_core"] = round(lpix / 1e6 / best, 3)
            out[label] = row

        side = 192
        grad = bytes(((x * 31 + y * 57) % 256) for y in range(side) for x in range(side))
        large_jpeg = synthesize_jpeg_gray(side, side, grad, restart_interval=4)
        rgb = bytes(
            ((x * c1 + y * c2) % 256)
            for y in range(side)
            for x in range(side)
            for c1, c2 in ((31, 57), (17, 43), (7, 29))
        )
        large_png = synthesize_png(side, side, rgb, interlace=True)
        measure(jpeg_corpus, decode_jpeg, "mm_jpeg_decode", (large_jpeg, side * side))
        measure(
            png_corpus,
            decode_png_stream,
            "mm_png_interlaced",
            (large_png, side * side * 3),
        )
    except Exception as exc:  # noqa: BLE001
        out["_codec_floors_error"] = repr(exc)
    return out


def _probe_marginal(spark, sf_dir: str) -> dict:
    """Per-row throughput for both engines: best-of-N at 1x and at
    PROBE_REP x the fact table; extra rows / extra seconds."""
    out: dict[str, dict] = {}
    probe_views: set[str] = set()
    try:
        import duckdb

        from pyspark.sql import functions as F

        from graphql_api_etl_spark.sources.registry import load_table

        con = duckdb.connect()
        for t in TABLES:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

        for p in PROBES:
            fact, sql = p["fact"], p["sql"]
            base = load_table(spark, sf_dir, fact)
            n = base.count()
            rep = base.crossJoin(spark.range(PROBE_REP).select(F.lit(1).alias("__r"))).drop("__r")

            def spark_time(view_df) -> float:
                view_df.createOrReplaceTempView(fact)
                best = float("inf")
                for _ in range(PROBE_ROUNDS):
                    t0 = time.time()
                    spark.sql(sql).write.format("noop").mode("overwrite").save()
                    best = min(best, time.time() - t0)
                return best

            def duck_time(rep_view: bool) -> float:
                if rep_view:
                    con.execute(
                        f"CREATE OR REPLACE VIEW {fact} AS "
                        f"SELECT f.* FROM '{sf_dir}/{fact}.parquet' f CROSS JOIN range({PROBE_REP})"
                    )
                else:
                    con.execute(
                        f"CREATE OR REPLACE VIEW {fact} AS SELECT * FROM '{sf_dir}/{fact}.parquet'"
                    )
                best = float("inf")
                for _ in range(PROBE_ROUNDS):
                    t0 = time.time()
                    con.execute(sql).fetchall()
                    best = min(best, time.time() - t0)
                return best

            # Spark also reads the probe SQL against temp views so both
            # engines execute the IDENTICAL statement on identical data
            # (via load_table so the NTZ-timestamp pin applies).
            for t in TABLES:
                if t != fact:
                    load_table(spark, sf_dir, t).createOrReplaceTempView(t)
                    probe_views.add(t)
            probe_views.add(fact)
            extra_rows = n * (PROBE_REP - 1)
            s1, sk = spark_time(base), spark_time(rep)
            d1, dk = duck_time(False), duck_time(True)
            out[p["name"]] = {
                "rows_base": n,
                "rep": PROBE_REP,
                # null when the repx-1x delta is under 20 ms: that's
                # scheduling noise, not per-row cost (sf too small).
                "spark": round(extra_rows / (sk - s1)) if sk - s1 > 0.02 else None,
                "duckdb": round(extra_rows / (dk - d1)) if dk - d1 > 0.02 else None,
                "spark_sec_1x": round(s1, 3),
                "spark_sec_repx": round(sk, 3),
                "duckdb_sec_1x": round(d1, 3),
                "duckdb_sec_repx": round(dk, 3),
            }
    except Exception as exc:  # noqa: BLE001 — partial output is still
        # useful, but the failure must be visible, not swallowed
        out["_error"] = repr(exc)
    finally:
        # drop every view the probe registered: leaving them shadows
        # table names for the rest of the session
        for v in probe_views:
            try:
                spark.catalog.dropTempView(v)
            except Exception:  # noqa: BLE001
                pass
    return out


if __name__ == "__main__":
    main()
