"""Plan-shape assertions: the engine's 100 TB efficiency contract.

Correctness says the rows are right; these tests say the PLAN is right
— filters pushed to the parquet scan, columns pruned, dimension joins
broadcast, no Python evaluation in native operator paths (SURVEY.md
§4). A regression here is a performance bug even while every oracle
still matches.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphql_api_etl_spark.plans import (
    executed_plan,
    has_broadcast_join,
    has_python_eval,
    pushed_filters,
    read_schema_columns,
)
from graphql_api_etl_spark.queries import QUERIES
from graphql_api_etl_spark.sources.registry import load_table


def _run(name, spark, sf_dir):
    fn, _ = QUERIES[name]
    return fn(spark, sf_dir)


def test_filters_reach_parquet_scan(spark, sf_dir):
    df = _run("f_filter_chain", spark, sf_dir)
    pushed = " ".join(pushed_filters(df))
    assert "l_quantity" in pushed and "l_shipdate" in pushed and "l_returnflag" in pushed


def test_column_pruning(spark, sf_dir):
    df = _run("f_filter_chain", spark, sf_dir)
    (scan_cols,) = read_schema_columns(df)
    # 11-column lineitem pruned to the 5 referenced columns
    assert set(scan_cols) == {"l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_shipdate"}


def test_q1_scan_prunes_to_agg_inputs(spark, sf_dir):
    df = _run("tpch_q1_pricing_summary", spark, sf_dir)
    (scan_cols,) = read_schema_columns(df)
    assert set(scan_cols) == {
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate",
    }


def test_dim_joins_broadcast(spark, sf_dir):
    for name in ("j_broadcast_dims", "tpch_q3_shipping_priority", "tpch_q5_local_volume"):
        assert has_broadcast_join(_run(name, spark, sf_dir)), name


def test_native_paths_have_no_python_eval(spark, sf_dir):
    native = [
        "flagship_reconcile", "p_transform_chain", "x_string_functions",
        "tpch_q1_pricing_summary", "events_sessionize",
        "dedup_exact_groups", "dedup_minhash_lsh", "dedup_simhash_pairs",
        "text_quality_stats", "text_lang_id", "sim_topk_bruteforce",
        "mm_binary_metadata",
        # r4 curation additions — all native expressions
        "text_repetition_stats", "text_pii_scrub",
        "curate_stratified_best", "curate_decontaminate",
        "text_winnowing", "curate_winsorize",
        "curate_domain_mixture", "curate_token_packing",
        "emb_quantize_int8", "j_salted_skew_join", "a_two_phase_agg",
    ]
    for name in native:
        assert not has_python_eval(_run(name, spark, sf_dir)), name


def test_multimodal_is_the_only_python_path(spark, sf_dir):
    assert has_python_eval(_run("mm_extract_features", spark, sf_dir))


def test_full_outer_fact_join_is_sort_merge(spark, sf_dir):
    """Full-outer can't broadcast; expect sort-merge (+AQE skew) —
    the right shape for fact×fact at scale."""
    plan = executed_plan(_run("j_outer_provenance_counts", spark, sf_dir))
    assert "SortMergeJoin" in plan and "FullOuter" in plan


def test_whole_stage_codegen_in_agg_path(spark, sf_dir):
    df = _run("tpch_q1_pricing_summary", spark, sf_dir)
    df.collect()  # finalize THIS plan's AQE (count() builds a separate QueryExecution)
    assert "codegen id" in executed_plan(df)


def test_topk_orders_with_limit_not_global_sort(spark, sf_dir):
    """Top-k must be TakeOrderedAndProject (per-partition heap + merge),
    never a full global sort followed by limit."""
    df = _run("tpch_q3_shipping_priority", spark, sf_dir)
    assert "TakeOrderedAndProject" in executed_plan(df)


def test_partial_aggregation_before_shuffle(spark, sf_dir):
    """Map-side combine: HashAggregate(partial) under the exchange."""
    plan = executed_plan(_run("tpch_q1_pricing_summary", spark, sf_dir))
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_broadcast_threshold_respected_for_fact_join(spark, sf_dir):
    """orders⋈lineitem (fact×fact) must NOT be broadcast at bench scale
    — both sides grow with the data."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    joined = li.join(o, li.l_orderkey == o.o_orderkey).groupBy("o_orderstatus").count()
    # at sf0.001 AQE may legitimately broadcast (orders is tiny);
    # assert only that the join exists and produces a plan — the
    # at-scale property is covered by j_outer_provenance_counts'
    # full-outer SMJ assertion which no size can convert to broadcast.
    assert "Join" in executed_plan(joined)


def test_wordcount_is_partial_topk(spark, sf_dir):
    plan = executed_plan(_run("text_wordcount", spark, sf_dir))
    assert "TakeOrderedAndProject" in plan  # per-partition heaps, no global sort
    assert not has_python_eval(_run("text_wordcount", spark, sf_dir))


def test_interval_join_is_equi_not_nested_loop(spark, sf_dir):
    plan = executed_plan(_run("events_interval_join", spark, sf_dir))
    # the chunk trick must produce an equi-join, never a pair explosion
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert not has_python_eval(_run("events_interval_join", spark, sf_dir))


def test_closure_joins_stay_native(spark, sf_dir):
    assert not has_python_eval(_run("x_hierarchy_closure", spark, sf_dir))


def test_curation_keeper_join_broadcasts(spark, sf_dir):
    df = _run("curate_documents", spark, sf_dir)
    assert has_broadcast_join(df)  # keeper set is dim-sized at any SF share
    assert not has_python_eval(df)
