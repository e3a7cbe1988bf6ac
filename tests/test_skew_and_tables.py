"""Skew utilities and table-layout sinks: correctness row-for-row, and
the PLAN effects that justify them (no exchange on bucketed joins,
partition pruning on partitioned layout)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphql_api_etl_spark.operators.skew import salted_join, two_phase_agg
from graphql_api_etl_spark.plans import executed_plan
from graphql_api_etl_spark.sinks.tables import (
    read_table,
    write_bucketed_table,
    write_partitioned,
)
from graphql_api_etl_spark.sources.registry import load_table


@pytest.fixture(scope="module")
def skewed(spark):
    # one hot key (90% of rows) + a tail
    rows = [(1, i) for i in range(900)] + [(k, k) for k in range(2, 102)]
    return spark.createDataFrame(rows, "k int, v int")


def test_salted_join_matches_plain_join(spark, skewed):
    dim = spark.createDataFrame([(k, f"d{k}") for k in range(1, 50)], "k int, name string")
    plain = skewed.join(dim, "k").select("k", "v", "name")
    salted = salted_join(skewed, dim, on="k", n_buckets=8).select("k", "v", "name")
    assert plain.count() == salted.count()
    assert plain.exceptAll(salted).isEmpty() and salted.exceptAll(plain).isEmpty()


def test_salted_join_left_outer(spark, skewed):
    dim = spark.createDataFrame([(1, "one")], "k int, name string")
    out = salted_join(skewed, dim, on="k", n_buckets=4, how="left")
    assert out.count() == skewed.count()
    assert out.filter(F.col("name").isNull()).count() == 100  # tail keys unmatched


def test_salted_join_rejects_right_and_full(spark, skewed):
    dim = spark.createDataFrame([(1, "one")], "k int, name string")
    for how in ("right", "full", "outer", "full_outer"):
        with pytest.raises(ValueError, match="inner/left"):
            salted_join(skewed, dim, on="k", how=how)


def test_two_phase_agg_equals_direct(spark, skewed):
    direct = {
        (r["k"]): (r["n"], r["s"], r["mn"], r["mx"])
        for r in skewed.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("s"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    salted = {
        (r["k"]): (r["n_rows"], r["sum_v"], r["min_v"], r["max_v"])
        for r in two_phase_agg(skewed, ["k"], sums=["v"], mins=["v"], maxs=["v"]).collect()
    }
    assert direct == salted


def test_partitioned_layout_prunes(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "events_by_type")
    write_partitioned(ev, path, ["event_type"])
    back = spark.read.parquet(path).filter(F.col("event_type") == "click")
    plan = executed_plan(back)
    assert "PartitionFilters" in plan and "event_type" in plan.split("PartitionFilters", 1)[1][:200]
    assert back.count() == ev.filter(F.col("event_type") == "click").count()


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    write_bucketed_table(o, "orders_b", ["o_orderkey"], num_buckets=8, sort_cols=["o_orderkey"])
    write_bucketed_table(li, "lineitem_b", ["l_orderkey"], num_buckets=8, sort_cols=["l_orderkey"])
    ob, lb = read_table(spark, "orders_b"), read_table(spark, "lineitem_b")
    # disable broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:

        def key_exchanges(df):
            # formatted explain lists Exchange partitioning in an
            # "Arguments: hashpartitioning(<key>…" detail line
            p = executed_plan(df)
            return p.count("hashpartitioning(o_orderkey") + p.count("hashpartitioning(l_orderkey")

        joined = ob.join(lb, ob.o_orderkey == lb.l_orderkey).groupBy("o_orderstatus").count()
        plain = o.join(li, o.o_orderkey == li.l_orderkey).groupBy("o_orderstatus").count()
        assert key_exchanges(joined) == 0  # co-bucketed: no shuffle for the join
        assert key_exchanges(plain) == 2  # unbucketed: both sides shuffle
        n = joined.count()
        assert n == o.select("o_orderstatus").distinct().count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_tpch_q3_bucketed_join_and_agg_have_no_key_exchange(spark, sf_dir):
    """The catalog's co-bucketed Q3: the fact-fact join runs on bucket
    layout and the aggregate reuses it — zero orderkey hash exchanges
    in the executed plan (and the rows match the plain Q3)."""
    import graphql_api_etl_spark.queries as Q

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = Q.QUERIES["tpch_q3_bucketed"][0](spark, sf_dir)
        plan = executed_plan(df)
        assert (
            plan.count("hashpartitioning(o_orderkey") + plan.count("hashpartitioning(l_orderkey")
            == 0
        )
        plain = Q.QUERIES["tpch_q3_shipping_priority"][0](spark, sf_dir)
        assert [tuple(r) for r in df.collect()] == [tuple(r) for r in plain.collect()]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_compact_parquet_merges_small_files(spark, sf_dir, tmp_path):
    from graphql_api_etl_spark.sinks.maintenance import compact_parquet, parquet_file_sizes

    path = str(tmp_path / "fragmented")
    o = load_table(spark, sf_dir, "orders")
    o.repartition(40).write.parquet(path)  # 40 shards of a small table
    before = parquet_file_sizes(path)
    assert len(before) == 40
    n_rows = spark.read.parquet(path).count()

    compact_parquet(spark, path, target_bytes=sum(before))  # fits in ONE file
    after = parquet_file_sizes(path)
    assert len(after) == 1
    assert spark.read.parquet(path).count() == n_rows
    # out-of-place mode
    out = compact_parquet(spark, path, target_bytes=1, out_path=str(tmp_path / "resharded"))
    assert len(parquet_file_sizes(out)) >= 2  # 1-byte target → per-partition files


def test_collect_table_stats_one_pass(spark, sf_dir):
    from graphql_api_etl_spark.sinks.maintenance import collect_table_stats

    o = load_table(spark, sf_dir, "orders")
    stats = collect_table_stats(o, ["o_orderstatus", "o_custkey"])
    assert stats["n_rows"] == o.count()
    assert stats["o_orderstatus_nulls"] == 0
    exact_status = o.select("o_orderstatus").distinct().count()
    assert abs(stats["o_orderstatus_ndv"] - exact_status) <= max(1, 0.15 * exact_status)
    exact_cust = o.select("o_custkey").distinct().count()
    assert abs(stats["o_custkey_ndv"] - exact_cust) <= 0.15 * exact_cust


def test_zorder_rejects_bit_overflow(spark):
    # 8 columns at bits=8 would shift into the BIGINT sign bit and
    # silently corrupt the ordering — must raise instead
    import pytest

    from graphql_api_etl_spark.sinks.zorder import z_value

    with pytest.raises(ValueError, match="63"):
        z_value([F.lit(i).cast("bigint") for i in range(8)], bits=8)
    z_value([F.lit(i).cast("bigint") for i in range(7)], bits=9)  # 63: ok


def test_zorder_layout_prunes_on_both_columns(spark, sf_dir, tmp_path):
    """Z-ordering on (custkey, totalprice) must let a min/max-pruning
    reader skip files for filters on EITHER column; a single-column
    sort only prunes its own column."""
    from graphql_api_etl_spark.sinks.zorder import pruning_selectivity, write_zordered

    o = load_table(spark, sf_dir, "orders")
    z_path = str(tmp_path / "orders_z")
    write_zordered(spark, o, z_path, ["o_custkey", "o_totalprice"], bits=8, n_files=8)
    lin_path = str(tmp_path / "orders_lin")
    o.repartitionByRange(8, "o_custkey").sortWithinPartitions("o_custkey").write.parquet(lin_path)

    # median probes: extremes are pruned by ANY layout (the global max
    # lives in exactly one file); mid-range values only prune when the
    # layout actually clusters that column
    probe_cust = o.agg(F.expr("percentile(o_custkey, 0.5)")).first()[0]
    probe_price = o.agg(F.expr("percentile(o_totalprice, 0.5)")).first()[0]

    # both layouts hold identical rows
    assert spark.read.parquet(z_path).count() == o.count()

    z_cust = pruning_selectivity(z_path, "o_custkey", probe_cust)
    z_price = pruning_selectivity(z_path, "o_totalprice", probe_price)
    lin_cust = pruning_selectivity(lin_path, "o_custkey", probe_cust)
    lin_price = pruning_selectivity(lin_path, "o_totalprice", probe_price)

    # linear: strong on its sort column, blind on the other
    assert lin_cust >= 0.8 and lin_price <= 0.2, (lin_cust, lin_price)
    # z-order: meaningful skipping on BOTH columns
    assert z_cust >= 0.3, z_cust
    assert z_price >= 0.3, z_price


def test_dpp_prunes_fact_partitions(spark, sf_oracle_dir):
    """layout_dpp_prune's fact scan must carry a runtime
    dynamic-pruning predicate on the partition column: the region
    filter reaches the partitioned lineitem copy through the nation
    dim at execution time, not as a static PartitionFilter."""
    from graphql_api_etl_spark.queries import QUERIES

    df = QUERIES["layout_dpp_prune"][0](spark, sf_oracle_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan, plan
    # the pruning subquery must hang off the broadcast dim, not a
    # re-scan of the fact
    assert "SubqueryAdaptiveBroadcast" in plan or "SubqueryBroadcast" in plan, plan


def test_skew_aware_join_picks_measured_strategies(spark, sf_dir):
    """skew_aware_join encodes the measured r11 decision table
    (VERDICT r11 ask #8): broadcast when the dim fits; SHUFFLE_HASH
    when a skew signal exists but sits under AQE's split threshold
    (where the splitter stays dormant); plain SMJ when the hot key is
    past the threshold (AQE fires at runtime) and for outer joins to
    the dim side."""
    from graphql_api_etl_spark.operators.skew import skew_aware_join
    from graphql_api_etl_spark.sources.registry import load_table

    fact = load_table(spark, sf_dir, "orders")
    dim = load_table(spark, sf_dir, "customer").withColumnsRenamed(
        {"c_custkey": "o_custkey"}
    )

    # 1: dim fits -> broadcast, no shuffle on either side.
    p1 = executed_plan(skew_aware_join(fact, dim, "o_custkey"))
    assert "BroadcastHashJoin" in p1

    # 3: dim declared over-budget + hot key under AQE threshold -> SHJ.
    p3 = executed_plan(
        skew_aware_join(
            fact, dim, "o_custkey",
            dim_size_bytes=1 << 40, hot_partition_bytes=64 << 20,
        )
    )
    assert "ShuffledHashJoin" in p3 and "BroadcastHashJoin" not in p3

    # 2: hot key past the AQE threshold -> plain SMJ (AQE splits at
    # runtime); no hint, no broadcast.  The helper returns an unhinted
    # join here ON PURPOSE — at test scale Catalyst's own stats would
    # still auto-broadcast the tiny dim, so simulate the
    # over-threshold dim by disabling the session auto-broadcast.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        p2 = executed_plan(
            skew_aware_join(
                fact, dim, "o_custkey",
                dim_size_bytes=1 << 40, hot_partition_bytes=1 << 30,
            )
        )
        assert "SortMergeJoin" in p2 and "BroadcastHashJoin" not in p2

        # outer join to the dim side can never broadcast the dim.
        p4 = executed_plan(
            skew_aware_join(fact, dim, "o_custkey", how="full_outer")
        )
        assert "SortMergeJoin" in p4 and "BroadcastHashJoin" not in p4
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_estimate_hot_partition_bytes_tracks_the_exact_share(spark, skewed):
    """The sampled skew diagnosis (the 100 TB alternative to a full
    per-key histogram) must land near the exact hot-key share on a
    genuinely skewed input, be deterministic for a fixed seed, and
    read an even key distribution as no-signal-worth-acting-on."""
    from graphql_api_etl_spark.operators.skew import (
        estimate_hot_partition_bytes,
        plan_size_bytes,
    )

    # 'skewed' fixture: one key owns 90% of 1000 rows. Use a high
    # fraction so the test is tight at this tiny scale; at real scale
    # 1% gives the same relative error for hot keys.
    big = skewed.crossJoin(
        skewed.sparkSession.range(64).select(F.col("id").alias("rep"))
    )
    est = estimate_hot_partition_bytes(big, "k", fraction=0.2, seed=7)
    exact_share = 0.9
    size = plan_size_bytes(big)
    assert 0.7 * exact_share * size <= est <= 1.2 * exact_share * size, (
        est,
        size,
    )
    # deterministic for a fixed (fraction, seed)
    assert est == estimate_hot_partition_bytes(big, "k", fraction=0.2, seed=7)

    even = skewed.sparkSession.range(64000).select((F.col("id") % 6400).alias("k"))
    est_even = estimate_hot_partition_bytes(even, "k", fraction=0.2, seed=7)
    # an even distribution's hottest key holds ~1/6400 of the rows —
    # far under any split threshold at this size
    assert est_even < plan_size_bytes(even) * 0.01


def test_diagnose_size_switch_sample_and_exact_pick_same_branch(spark, skewed):
    """diagnose_hot_partition_bytes (VERDICT r13 ask #1) switches
    estimator on Catalyst's fact size — exact per-key histogram under
    the threshold, seeded sample above. The switch must be faithful
    (each side returns ITS estimator's number) and strategy-safe: on
    the skewed fixture both estimates land on the same side of every
    skew_aware_join decision boundary, so sample-vs-exact produce the
    SAME executed join strategy."""
    from graphql_api_etl_spark.operators.skew import (
        diagnose_hot_partition_bytes,
        estimate_hot_partition_bytes,
        exact_hot_partition_bytes,
        skew_aware_join,
    )

    big = skewed.crossJoin(
        skewed.sparkSession.range(64).select(F.col("id").alias("rep"))
    )
    exact = exact_hot_partition_bytes(big, "k")
    sampled = estimate_hot_partition_bytes(big, "k", fraction=0.2, seed=7)
    # the switch routes faithfully: threshold forced above the fact's
    # Catalyst estimate → the exact number; forced under (0) → the
    # sampled number. (The crossJoin fixture's Catalyst estimate is a
    # multiplied upper bound in the zettabyte range, so the DEFAULT
    # threshold also routes it to the sampled branch — the 100 TB
    # behavior, exercised by the seed/fraction pass-through below.)
    assert diagnose_hot_partition_bytes(big, "k", exact_max_bytes=1 << 80) == exact
    assert (
        diagnose_hot_partition_bytes(
            big, "k", exact_max_bytes=0, fraction=0.2, seed=7
        )
        == sampled
    )
    assert (
        diagnose_hot_partition_bytes(big, "k", fraction=0.2, seed=7) == sampled
    )
    # both estimates classify identically against the decision
    # boundary that picks SHJ vs plain SMJ...
    aqe_thr = 256 << 20
    assert (exact <= aqe_thr) == (sampled <= aqe_thr), (exact, sampled)
    # ...and produce the same executed strategy with the dim declared
    # over the broadcast budget (the branch where the skew number
    # actually decides the plan). On this fixture both sides scale
    # Catalyst's multiplied crossJoin bound, so both say the hot key
    # is FAR past the AQE split threshold → plain SMJ (AQE splits at
    # runtime), branch 2 of the decision table.
    dim = big.select("k").distinct().withColumn("attr", F.col("k") * 2)
    strategies = []
    for hot in (exact, sampled):
        plan = executed_plan(
            skew_aware_join(
                big, dim, "k", dim_size_bytes=1 << 40, hot_partition_bytes=hot
            )
        )
        strategies.append(
            "SHJ" if "ShuffledHashJoin" in plan
            else "SMJ" if "SortMergeJoin" in plan
            else "BHJ"
        )
    assert strategies[0] == strategies[1] == "SMJ", strategies
    # and with the hot estimates scaled down to the REAL (tiny) data
    # size — as they would be on honestly-sized parquet input — both
    # sit under the split threshold and pick SHJ together.
    for hot in (1 << 20, 2 << 20):
        plan = executed_plan(
            skew_aware_join(
                big, dim, "k", dim_size_bytes=1 << 40, hot_partition_bytes=hot
            )
        )
        assert "ShuffledHashJoin" in plan, plan


def test_j_skew_aware_entry_takes_the_branch_its_inputs_call_for(spark, sf_dir):
    """The j_skew_aware CATALOG entry (VERDICT r12 ask #1: the strategy
    router needs an end-to-end consumer under the driver gate) must
    take the decision-table branch its actual inputs call for: at test
    scale the filtered orders dim is far under the 64 MB broadcast
    budget and lineitem's orderkey histogram is near-uniform, so the
    router must choose branch 1 — broadcast, no exchange on the dim.
    The other three branches stay covered by
    test_skew_aware_join_picks_measured_strategies."""
    from graphql_api_etl_spark.queries import QUERIES

    df = QUERIES["j_skew_aware"][0](spark, sf_dir)
    plan = executed_plan(df)
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan


def test_j_fuzzy_blocked_blocking_join_routes_through_the_router(spark, sf_dir):
    """j_fuzzy_blocked's blocking join now routes through
    skew_aware_join (the r12 VERDICT's named adopter): the clean
    register fits the broadcast budget at test scale, so the candidate
    generation must be a broadcast hash join on the block key — no
    shuffle of the dirty side just to generate candidates."""
    from graphql_api_etl_spark.queries import QUERIES

    df = QUERIES["j_fuzzy_blocked"][0](spark, sf_dir)
    plan = executed_plan(df)
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_bucketed_scan_order_claim_requires_single_file_per_bucket(spark, sf_dir, tmp_path):
    """The session enables spark.sql.legacy.bucketedTableScan.
    outputOrdering for the one-file-per-bucket landing layout; Spark
    must KEEP the Sort below the SMJ when a bucket holds multiple
    files (per-file runs are sorted, the concatenation is not — a
    falsely claimed order would silently corrupt merge-join output).
    This pins the guard the session conf relies on."""
    from graphql_api_etl_spark.sinks.tables import (
        ensure_bucket_database,
        write_bucketed_table,
    )
    from graphql_api_etl_spark.sources.registry import load_table

    ensure_bucket_database(spark, "graft_multi_file", str(tmp_path / "mf"))
    cust = load_table(spark, sf_dir, "customer").repartition(8)
    orders = load_table(spark, sf_dir, "orders").repartition(8)
    # NO one_file_per_bucket: 8 write tasks x 4 buckets -> multi-file buckets
    write_bucketed_table(cust, "graft_multi_file.c", ["c_custkey"],
                         num_buckets=4, sort_cols=["c_custkey"])
    write_bucketed_table(orders, "graft_multi_file.o", ["o_custkey"],
                         num_buckets=4, sort_cols=["o_custkey"])
    import glob

    files = glob.glob(str(tmp_path / "mf" / "c" / "*.parquet"))
    assert len(files) > 4, "fixture must produce multi-file buckets"
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = spark.table("graft_multi_file.c").join(
            spark.table("graft_multi_file.o"),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        plan = executed_plan(j)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    import re as _re

    assert "SortMergeJoin" in plan
    # bucketing still kills the exchanges...
    assert len(_re.findall(r"\(\d+\) Exchange", plan)) == 0, plan
    # ...but the order claim must NOT survive multi-file buckets.
    assert len(_re.findall(r"\(\d+\) Sort\b", plan)) == 2, plan
    spark.sql("DROP DATABASE IF EXISTS graft_multi_file CASCADE")


def test_bucket_warehouse_path_env_injection(monkeypatch, tmp_path):
    """VERDICT r13 ask #6: the bucketed staging root must be
    deployment-injectable via SPARK_GRAFT_BUCKET_WAREHOUSE, with the
    repo-local default unchanged when the variable is unset/empty."""
    import os

    from graphql_api_etl_spark.sinks.tables import bucket_warehouse_path

    monkeypatch.delenv("SPARK_GRAFT_BUCKET_WAREHOUSE", raising=False)
    default = bucket_warehouse_path(".bucket_warehouse")
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    assert default == os.path.join(repo_root, ".bucket_warehouse")

    monkeypatch.setenv("SPARK_GRAFT_BUCKET_WAREHOUSE", str(tmp_path))
    assert bucket_warehouse_path(".bucket_warehouse_heal", "sf0_01") == os.path.join(
        str(tmp_path), ".bucket_warehouse_heal", "sf0_01"
    )
    # empty string falls back to the default (unset-equivalent)
    monkeypatch.setenv("SPARK_GRAFT_BUCKET_WAREHOUSE", "")
    assert bucket_warehouse_path(".bucket_warehouse") == default


def test_stage_bucketed_requires_qualified_name_and_idempotent_db(spark, tmp_path):
    """stage_bucketed refuses an unqualified table name (the orphan
    cleanup needs the database location), and ensure_bucket_database
    is idempotent for repeated landings."""
    from graphql_api_etl_spark.sinks.tables import (
        ensure_bucket_database,
        stage_bucketed,
    )

    df = spark.range(4).select(F.col("id").cast("string").alias("k"))
    with pytest.raises(ValueError, match="qualified"):
        stage_bucketed(spark, df, "unqualified_table", ["k"])
    loc = str(tmp_path / "idem")
    ensure_bucket_database(spark, "graft_stage_idem", loc)
    ensure_bucket_database(spark, "graft_stage_idem", loc)  # no error
    out = stage_bucketed(spark, df, "graft_stage_idem.t", ["k"], num_buckets=2)
    assert out.count() == 4
    # re-land over the existing table (the recurring-run path)
    out2 = stage_bucketed(spark, df, "graft_stage_idem.t", ["k"], num_buckets=2)
    assert out2.count() == 4
    spark.sql("DROP DATABASE IF EXISTS graft_stage_idem CASCADE")


def test_bucket_file_names_carry_the_bucket_id_of_their_rows(spark, tmp_path):
    """Pins the bucket-file naming contract every exchange-free read —
    and any future bucket-local compaction (ROUND_NOTES r15 candidate
    #3) — depends on: each data file of a bucketed table (original land
    AND delta appends) embeds its bucket id as the ``_NNNNN`` filename
    suffix, and every row inside the file hashes to exactly that
    bucket (``pmod(hash(cols), num_buckets)`` — Spark's Murmur3 bucket
    routing IS the SQL hash function). A Spark upgrade changing either
    the naming or the routing would break bucket-file surgery silently;
    this test makes it loud."""
    import os
    import re

    from graphql_api_etl_spark.sinks.tables import (
        append_bucketed_delta,
        ensure_bucket_database,
        stage_bucketed,
    )

    loc = str(tmp_path / "wh")
    ensure_bucket_database(spark, "graft_bucket_contract", loc)
    base = spark.range(40).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    stage_bucketed(spark, base, "graft_bucket_contract.t", ["k"], num_buckets=4)
    delta = spark.range(40, 60).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    append_bucketed_delta(spark, "graft_bucket_contract.t", delta, ["k"], num_buckets=4)

    table_dir = os.path.join(loc, "t")
    files = [
        f for f in os.listdir(table_dir)
        if f.endswith(".parquet") and not f.startswith((".", "_"))
    ]
    assert len(files) > 4  # land + append: touched buckets hold >1 file
    pat = re.compile(r"_(\d{5})\.")
    seen_buckets = set()
    for f in files:
        m = pat.search(f)
        assert m, f"bucketed data file without a bucket-id suffix: {f}"
        bucket_id = int(m.group(1))
        seen_buckets.add(bucket_id)
        rows = spark.read.parquet(os.path.join(table_dir, f))
        got = {
            r[0]
            for r in rows.select(
                F.pmod(F.hash(F.col("k")), F.lit(4)).alias("b")
            ).distinct().collect()
        }
        assert got == {bucket_id}, (f, got)
    assert seen_buckets == {0, 1, 2, 3}  # 60 keys cover all 4 buckets
    spark.sql("DROP DATABASE IF EXISTS graft_bucket_contract CASCADE")


def _land_with_appends(spark, db, loc, n_buckets=4):
    """Bucketed table + two delta appends concentrated in a key range
    (hot buckets) — the post-streaming shape compaction targets."""
    from graphql_api_etl_spark.sinks.tables import (
        append_bucketed_delta,
        ensure_bucket_database,
        stage_bucketed,
    )

    ensure_bucket_database(spark, db, loc)
    base = spark.range(40).select(F.col("id").alias("k"), (F.col("id") * 10).alias("v"))
    stage_bucketed(spark, base, f"{db}.src", ["k"], num_buckets=n_buckets)
    for lo, hi in ((40, 50), (50, 57)):
        delta = spark.range(lo, hi).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("v")
        )
        append_bucketed_delta(spark, f"{db}.src", delta, ["k"], num_buckets=n_buckets)
    return spark.table(f"{db}.src")


def test_compact_bucketed_table_rewrites_only_hot_buckets(spark, tmp_path):
    """Bucket-local compaction (the r15 candidate, built standalone):
    row multiset identical to the appended source, every bucket back to
    ONE file, cold buckets byte-identical copies (never decoded), and
    the compacted table still joins exchange-free against a co-bucketed
    twin."""
    import os

    from graphql_api_etl_spark.sinks.maintenance import compact_bucketed_table

    loc = str(tmp_path / "wh")
    src = _land_with_appends(spark, "graft_compact", loc)
    src_rows = sorted(tuple(r) for r in src.collect())

    src_dir = os.path.join(loc, "src")
    pre = {
        f: os.path.getsize(os.path.join(src_dir, f))
        for f in os.listdir(src_dir)
        if f.endswith(".parquet") and not f.startswith((".", "_"))
    }
    import re as _re

    pre_by_bucket: dict[int, list[str]] = {}
    for f in pre:
        pre_by_bucket.setdefault(int(_re.search(r"_(\d{5})\.", f).group(1)), []).append(f)
    cold_names = {fs[0] for fs in pre_by_bucket.values() if len(fs) == 1}
    assert any(len(fs) > 1 for fs in pre_by_bucket.values())  # appends made hot buckets

    out = compact_bucketed_table(spark, "graft_compact.src", "graft_compact.dst", ["k"], 4)
    assert sorted(tuple(r) for r in out.collect()) == src_rows

    dst_dir = os.path.join(loc, "dst")
    post = [
        f for f in os.listdir(dst_dir)
        if f.endswith(".parquet") and not f.startswith((".", "_"))
    ]
    post_buckets = [int(_re.search(r"_(\d{5})\.", f).group(1)) for f in post]
    assert sorted(post_buckets) == sorted(set(post_buckets))  # ≤1 file per bucket
    assert os.path.exists(os.path.join(dst_dir, "_SUCCESS"))
    # cold buckets were byte-copied, not rewritten: same name, same size
    for f in cold_names:
        assert os.path.exists(os.path.join(dst_dir, f)), f
        assert os.path.getsize(os.path.join(dst_dir, f)) == pre[f]

    # layout contract intact: exchange-free join against the source
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = out.join(src, "k").groupBy().count()
        assert "hashpartitioning(k" not in executed_plan(j)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    spark.sql("DROP DATABASE IF EXISTS graft_compact CASCADE")


def test_compact_bucketed_table_all_cold_is_pure_copy(spark, tmp_path):
    """No hot buckets → the build is copies only (no INSERT job ever
    runs: every dst data file keeps its src name and size) and _SUCCESS
    still lands."""
    import os

    from graphql_api_etl_spark.sinks.maintenance import compact_bucketed_table
    from graphql_api_etl_spark.sinks.tables import (
        ensure_bucket_database,
        stage_bucketed,
    )

    loc = str(tmp_path / "wh")
    ensure_bucket_database(spark, "graft_compact_cold", loc)
    base = spark.range(30).select(F.col("id").alias("k"), F.col("id").alias("v"))
    stage_bucketed(spark, base, "graft_compact_cold.src", ["k"], num_buckets=4)
    src_dir = os.path.join(loc, "src")
    pre = {
        f: os.path.getsize(os.path.join(src_dir, f))
        for f in os.listdir(src_dir)
        if f.endswith(".parquet") and not f.startswith((".", "_"))
    }
    out = compact_bucketed_table(
        spark, "graft_compact_cold.src", "graft_compact_cold.dst", ["k"], 4
    )
    assert out.count() == 30
    dst_dir = os.path.join(loc, "dst")
    post = {
        f: os.path.getsize(os.path.join(dst_dir, f))
        for f in os.listdir(dst_dir)
        if f.endswith(".parquet") and not f.startswith((".", "_"))
    }
    assert post == pre  # identical names and sizes: byte copies
    assert os.path.exists(os.path.join(dst_dir, "_SUCCESS"))
    spark.sql("DROP DATABASE IF EXISTS graft_compact_cold CASCADE")
