"""Hand-graph unit tests for the graph-analytics entries: triangle
counting (degree-ordered node-iterator) and integer PageRank — closed
forms on graphs small enough to verify by eye, complementing the
oracle differential that checks them on the derived fact-table graphs.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _tri_count(spark, edge_pairs):
    """Run the same oriented-wedge pipeline as graph_triangle_count on
    an explicit undirected edge list (u < v enforced here)."""
    edges = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edge_pairs], "u bigint, v bigint"
    ).distinct()
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = (
        edges.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        )
    )
    e1, e2 = oriented.alias("e1"), oriented.alias("e2")
    wedges = e1.join(e2, F.col("e1.dst") == F.col("e2.src")).select(
        F.col("e1.src").alias("a"), F.col("e2.dst").alias("c")
    )
    return wedges.join(
        edges,
        (F.least("a", "c") == F.col("u")) & (F.greatest("a", "c") == F.col("v")),
    ).count()


def test_triangle_known_graphs(spark):
    # K4: C(4,3) = 4 triangles; counted once each under orientation.
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    assert _tri_count(spark, k4) == 4
    # 4-cycle: no triangles.
    assert _tri_count(spark, [(0, 1), (1, 2), (2, 3), (0, 3)]) == 0
    # Two triangles sharing an edge (bowtie on an edge).
    assert _tri_count(spark, [(0, 1), (1, 2), (0, 2), (1, 3), (2, 3)]) == 2


def test_triangle_star_has_none(spark):
    # A hub with 6 leaves: max degree but zero triangles — the case
    # degree-ordering exists for (hub emits no wedges as a source).
    star = [(0, i) for i in range(1, 7)]
    assert _tri_count(spark, star) == 0


def test_pagerank_mass_and_order(spark, sf_oracle_dir):
    """On the derived trade graph: total integer mass is conserved up
    to floor losses (each of the n base terms and each edge
    contribution floors once), and ranks are strictly positive with
    the base term as the exact lower bound."""
    from graphql_api_etl_spark.queries import QUERIES
    from graphql_api_etl_spark.queries_graph import PR_SCALE

    out = QUERIES["graph_pagerank"][0](spark, sf_oracle_dir).collect()
    n = len(out)
    assert n > 1
    base = (15 * PR_SCALE) // (100 * n)
    total = sum(r["rank_scaled"] for r in out)
    assert all(r["rank_scaled"] >= base for r in out)
    # dampened mass: ≥ base·n, ≤ SCALE (floors only ever lose mass;
    # dangling nodes additionally leak their 0.85 share)
    assert base * n <= total <= PR_SCALE
    # the graph is asymmetric by construction: ranks must not be uniform
    assert len({r["rank_scaled"] for r in out}) > 1
