"""Query catalog: every operator from SURVEY.md §2 as a named query over
the driver's star schema, paired with an ANSI-SQL oracle for DuckDB.

Each entry maps a reference operator family (cites ``ETL:NNN`` ≡
``/root/reference/weekly alignments GQL API.py:NNN``) onto the driver's
tables. Conventions that make the oracle-differential hash stable:

- every computed column is aliased identically in Spark and SQL;
- double aggregates are rounded (2 decimals) on both sides;
- timestamps in outputs are formatted as strings (UTC both sides);
- collected arrays are sorted and null-free on both sides.

Catalog shape: ``QUERIES[name] = (fn, oracle)`` where ``fn`` takes
``(spark, sf_dir)`` and ``oracle`` is the DuckDB SQL string, a
zero-arg callable returning it (lazily built oracles that embed
data-derived literals, e.g. trained IVF centroids), or ``None``.
``None`` → the driver records ``err: no_oracle`` (NOT a rows-only
check — demonstrated by three rounds of CORRECTNESS files), so every
entry that can carry an oracle must.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from graphql_api_etl_spark.operators.join import anti, cross, outer_merge, semi
from graphql_api_etl_spark.sources.registry import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]
Oracle = str | Callable[[], str] | None
QUERIES: dict[str, tuple[QueryFn, Oracle]] = {}


def _q(name: str, oracle: Oracle):
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(
                f"catalog entry {name!r} registered twice — dict semantics would "
                "silently shadow the first definition, hiding it from the plan "
                "audit and the oracle differential"
            )
        QUERIES[name] = (fn, oracle)
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# A. Reference-parity relational core
# ---------------------------------------------------------------------------

_FLAGSHIP_SQL = """
WITH lhs AS (SELECT * FROM customer WHERE c_acctbal > 0),
     rhs AS (SELECT * FROM orders WHERE o_totalprice > 50000),
     m AS (
       SELECT c_mktsegment, o_orderkey, o_orderpriority,
              CASE WHEN c_custkey IS NOT NULL AND o_custkey IS NOT NULL THEN 'both'
                   WHEN c_custkey IS NOT NULL THEN 'left_only'
                   ELSE 'right_only' END AS _merge
       FROM lhs FULL OUTER JOIN rhs ON c_custkey = o_custkey
     )
SELECT c_mktsegment, _merge,
       count(*) AS n_rows,
       count(o_orderkey) AS n_orders,
       coalesce(array_to_string(list_sort(list(DISTINCT o_orderpriority)
                                          FILTER (WHERE o_orderpriority IS NOT NULL)), '|'),
                '') AS priorities
FROM m
GROUP BY c_mktsegment, _merge
"""


def _flagship_report(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """The flagship plan on ALREADY-FILTERED inputs — shared by the
    catalog entry and bench.py's replicated marginal-floor probe so
    the probe times the identical code path, not a hand-copied twin.

    Plan note (r11): eager aggregation below the join — pre-grouping
    orders per custkey so the SMJ sorts |custkeys| instead of |orders|
    rows, the rewrite that fixed j_broadcast_dims in r10 — was BUILT
    AND MEASURED here and is ~2x SLOWER at 48x replication (median
    6.6 s vs 3.5 s, interleaved A/B): orders arrive randomly
    distributed over custkeys, so map-side combine gets ~no reduction
    (~1.2 rows/key/task) and the pre-agg adds a full extra shuffle of
    collect_set object rows before the join's own exchange.  Eager-agg
    pays only when the big side is clustered on the key or the final
    agg keys are join-side (j_broadcast_dims); the full-outer SMJ on
    raw orders stays the right plan here at any scale."""
    merged = outer_merge(customer, orders, left_on="c_custkey", right_on="o_custkey")
    return merged.groupBy("c_mktsegment", "_merge").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("o_orderkey").alias("n_orders"),
        # '|'-joined string, not array<string>: the driver's pandas
        # canonicalizer cannot sort_values on list cells (round-1 ERR).
        F.array_join(F.array_sort(F.collect_set("o_orderpriority")), "|").alias("priorities"),
    )


@_q("flagship_reconcile", _FLAGSHIP_SQL)
def flagship_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship (SURVEY §3.3 / §7.2): full-outer join with ``_merge``
    provenance (reference J1/J2, ETL:391–425) consumed as a grouped
    reconciliation report with a collected set (A1, ETL:563–569).

    Inputs are filtered asymmetrically so all three provenance slices
    are non-empty, mirroring the file-vs-API drift the reference
    reconciles. One shuffle for the join, one for the agg; the agg
    gets map-side partial aggregation for the counts.
    """
    customer = _t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0)
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 50000)
    return _flagship_report(customer, orders)


@_q(
    "j_outer_provenance_counts",
    """
WITH lhs AS (SELECT * FROM orders WHERE o_orderstatus = 'O'),
     m AS (
       SELECT CASE WHEN o_orderkey IS NOT NULL AND l_orderkey IS NOT NULL THEN 'both'
                   WHEN o_orderkey IS NOT NULL THEN 'left_only'
                   ELSE 'right_only' END AS _merge
       FROM lhs FULL OUTER JOIN lineitem ON o_orderkey = l_orderkey
     )
SELECT _merge, count(*) AS n FROM m GROUP BY _merge
""",
)
def j_outer_provenance_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-way provenance split cardinalities over the fact-fact outer
    join (F2/F9: ``_merge`` slices + ``shape[0]`` gates, ETL:422–429).
    The |both|+|left_only|+|right_only| partition invariant (SURVEY §5)
    is property-tested in tests/test_join_provenance.py."""
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    lineitem = _t(spark, sf_dir, "lineitem")
    merged = outer_merge(orders, lineitem, left_on="o_orderkey", right_on="l_orderkey")
    return merged.groupBy("_merge").agg(F.count(F.lit(1)).alias("n"))


@_q(
    "j_left_anti_unmatched",
    """
SELECT c_custkey, c_name
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 100000)
""",
)
def j_left_anti_unmatched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join (J8/J9: ``not in`` ETL:957–960, index-isin negation
    ETL:889–891): customers with no big-ticket order. Spark broadcasts
    the right side of left-anti when it fits."""
    customer = _t(spark, sf_dir, "customer")
    big = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000).select(
        F.col("o_custkey").alias("c_custkey")
    )
    return anti(customer, big, on="c_custkey").select("c_custkey", "c_name")


@_q(
    "j_left_semi_matched",
    """
SELECT c_custkey, c_mktsegment
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
""",
)
def j_left_semi_matched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join (F4 membership filters at scale, ETL:441, 943–945):
    IN-list becomes a left-semi join instead of a driver-collected list."""
    customer = _t(spark, sf_dir, "customer")
    urgent = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return semi(customer, urgent, on="c_custkey").select("c_custkey", "c_mktsegment")


@_q(
    "j_cross_product",
    "SELECT r_name, n_name FROM region CROSS JOIN nation",
)
def j_cross_product(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product (J6/J7 nested Python loops, ETL:881–886,
    948–955): small×small; Spark broadcasts one side automatically."""
    return cross(
        _t(spark, sf_dir, "region").select("r_name"),
        _t(spark, sf_dir, "nation").select("n_name"),
    )


@_q(
    "j_broadcast_dims",
    """
SELECT r_name, count(*) AS n_customers, round(sum(c_acctbal), 2) AS total_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
""",
)
def j_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension lookup joins (J10 name→email map, ETL:636–647) with
    the aggregate pushed BELOW the join (r10 eager aggregation): the
    report's group key (r_name) is a function of the join key
    (c_nationkey), so the fact side partial-aggregates to |nation|
    rows FIRST — one map-side combine + a 25-group exchange — and only
    that tiny frame probes the broadcast nation⋈region dim. The fact
    rows never shuffle for the join and never touch a probe at all;
    measured at 800× customer (12 M rows) this is 25% faster than the
    probe-then-aggregate plan and turns the per-row cost into pure
    narrow-scan + partial-agg."""
    return _broadcast_dims_report(
        _t(spark, sf_dir, "customer"),
        _t(spark, sf_dir, "nation"),
        _t(spark, sf_dir, "region"),
    )


def _broadcast_dims_report(customer: DataFrame, nation: DataFrame, region: DataFrame) -> DataFrame:
    """The broadcast-dims plan on caller-provided frames — shared by
    the catalog entry and bench.py's replicated marginal-floor probe
    (one code path, no hand-copied twin)."""
    per_nation = customer.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("c_acctbal").alias("__bal"),
    )
    dim = nation.join(region, nation.n_regionkey == region.r_regionkey).select(
        F.col("n_nationkey").alias("c_nationkey"), "r_name"
    )
    return (
        per_nation.join(F.broadcast(dim), "c_nationkey")
        .groupBy("r_name")
        .agg(
            F.sum("__n").cast("bigint").alias("n_customers"),
            F.round(F.sum("__bal"), 2).alias("total_acctbal"),
        )
    )


# ---------------------------------------------------------------------------
# B. Projections / transforms / filters / scalar functions
# ---------------------------------------------------------------------------


@_q(
    "p_transform_chain",
    """
SELECT CAST(CAST(c_custkey AS BIGINT) AS VARCHAR) AS unit_str,
       lower(trim(c_name)) AS name_norm,
       CASE WHEN c_acctbal < 0 THEN 'negative' ELSE 'ok' END AS balance_flag,
       round(c_acctbal, 2) AS acctbal,
       coalesce(c_mktsegment, '') AS segment_filled
FROM customer
""",
)
def p_transform_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + derived columns + conditional update + null fill
    (P1/P4/P5/X1/X2/X5/X7: Unit int→str ETL:262–263, masked backfill
    ETL:759–771, NaN→"" ETL:349). Pure narrow projection — no shuffle,
    whole-stage codegen, column-pruned scan."""
    return _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("bigint").cast("string").alias("unit_str"),
        F.lower(F.trim(F.col("c_name"))).alias("name_norm"),
        F.when(F.col("c_acctbal") < 0, F.lit("negative")).otherwise(F.lit("ok")).alias("balance_flag"),
        F.round(F.col("c_acctbal"), 2).alias("acctbal"),
        F.coalesce(F.col("c_mktsegment"), F.lit("")).alias("segment_filled"),
    )


@_q(
    "f_filter_chain",
    """
SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-06-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-06-01 00:00:00'
  AND l_quantity IS NOT NULL
  AND l_returnflag IN ('A', 'R')
  AND l_quantity > 25
""",
)
def f_filter_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound predicate (F1 dropna ETL:257, F4 isin ETL:441, range +
    null tests): every conjunct reaches the parquet scan as a pushed
    filter (verified in tests/test_plans.py)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.na.drop(subset=["l_quantity"])
        .filter(
            (F.col("l_shipdate") >= F.lit("1995-06-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-06-01").cast("timestamp"))
            & F.col("l_returnflag").isin("A", "R")
            & (F.col("l_quantity") > 25)
        )
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    )


@_q(
    "x_string_functions",
    """
SELECT p_partkey,
       lower(p_name) AS name_lower,
       string_split(p_type, ' ')[1] AS type_head,
       contains(p_type, 'BRASS') AS is_brass,
       CAST(split_part(CAST(p_retailprice AS VARCHAR), '.', 1) AS VARCHAR) AS price_int_str,
       concat(p_brand, '/', p_type) AS brand_type
FROM part
""",
)
def x_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function battery (X1–X4, X7–X8: lower ETL:642, split-take
    ETL:332/351, contains ETL:331, f-string concat ETL:633). The
    float→int-string truncation reproduces the reference's zip/remoteId
    handling (``str.split(".").str[0]``, ETL:351)."""
    return _t(spark, sf_dir, "part").select(
        "p_partkey",
        F.lower(F.col("p_name")).alias("name_lower"),
        F.split(F.col("p_type"), " ").getItem(0).alias("type_head"),
        F.col("p_type").contains("BRASS").alias("is_brass"),
        F.split(F.col("p_retailprice").cast("string"), "\\.").getItem(0).alias("price_int_str"),
        F.concat(F.col("p_brand"), F.lit("/"), F.col("p_type")).alias("brand_type"),
    )


@_q(
    "p_rownum_synth",
    """
SELECT c_mktsegment,
       concat('user+', CAST((row_number() OVER (ORDER BY c_mktsegment) - 1) * 100 AS VARCHAR),
              '@example.com') AS synth_email
FROM (SELECT DISTINCT c_mktsegment FROM customer)
""",
)
def p_rownum_synth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-synthesized value per distinct key (P7: enumerate distinct
    names → ``f"...+{i*100}@..."`` ETL:631–634) via a window row_number
    — the distributed replacement for pandas' implicit row index."""
    seg = _t(spark, sf_dir, "customer").select("c_mktsegment").distinct()
    # global-window-ok: input is distinct c_mktsegment — ≤5 rows at any SF
    w = W.orderBy("c_mktsegment")
    return seg.withColumn(
        "synth_email",
        F.concat(
            F.lit("user+"),
            ((F.row_number().over(w) - 1) * 100).cast("string"),
            F.lit("@example.com"),
        ),
    )


@_q(
    "a_bool_all_guard",
    """
SELECT bool_and(o_totalprice > 0) AS all_positive,
       bool_and(o_orderpriority = '1-URGENT') AS all_urgent,
       count(*) AS n
FROM orders
""",
)
def a_bool_all_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-column ALL() predicate (F8/A6: ``(remoteId=="").all()``
    ETL:390 — the runtime plan-switch input). One partial-aggregated
    boolean per partition, one tiny final reduce."""
    return _t(spark, sf_dir, "orders").agg(
        F.bool_and(F.col("o_totalprice") > 0).alias("all_positive"),
        F.bool_and(F.col("o_orderpriority") == "1-URGENT").alias("all_urgent"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# C. Aggregates / set ops / hierarchy
# ---------------------------------------------------------------------------


@_q(
    "a_collect_set_per_group",
    """
SELECT n_name,
       coalesce(array_to_string(list_sort(list(DISTINCT c_mktsegment)
                                          FILTER (WHERE c_mktsegment IS NOT NULL)), '|'),
                '') AS segments,
       count(DISTINCT c_custkey) AS n_customers
FROM nation LEFT JOIN customer ON c_nationkey = n_nationkey
GROUP BY n_name
""",
)
def a_collect_set_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-by + collect-distinct-set (A1: locations per district,
    ``groupby(...)["..."].unique()`` ETL:563–569). Arrays sorted for
    order-insensitive comparison."""
    nation = _t(spark, sf_dir, "nation")
    customer = _t(spark, sf_dir, "customer")
    joined = nation.join(customer, nation.n_nationkey == customer.c_nationkey, "left_outer")
    return joined.groupBy("n_name").agg(
        # string-serialized set (driver canon can't hash list cells)
        F.array_join(F.array_sort(F.collect_set("c_mktsegment")), "|").alias("segments"),
        F.countDistinct("c_custkey").alias("n_customers"),
    )


@_q(
    "x_hierarchy_closure",
    """
WITH RECURSIVE edges AS (
  SELECT 'c' || CAST(c_custkey AS VARCHAR) AS child,
         'n' || CAST(c_nationkey AS VARCHAR) AS parent
  FROM customer
  UNION ALL
  SELECT 'n' || CAST(n_nationkey AS VARCHAR),
         'r' || CAST(n_regionkey AS VARCHAR)
  FROM nation
), walk AS (
  SELECT child, parent, 1 AS depth FROM edges
  UNION ALL
  SELECT w.child, e.parent, w.depth + 1
  FROM walk w JOIN edges e ON w.parent = e.child
)
SELECT child AS node_id, parent AS root_id, CAST(depth AS BIGINT) AS depth
FROM walk
WHERE parent NOT IN (SELECT child FROM edges)
""",
)
def x_hierarchy_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive parent-chain closure (deep generalization of the
    reference's two-level hierarchy, A4/K5 ETL:526–573): every node's
    terminal ancestor + depth over the customer→nation→region forest.
    Spark has no recursive CTE; operators/graph.closure_roots resolves
    a depth-d chain in ⌈log₂ d⌉ pointer-doubling self-joins, hash-
    checked here against DuckDB's textbook WITH RECURSIVE walk."""
    from graphql_api_etl_spark.operators.graph import closure_roots

    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    edges = customer.select(
        F.concat(F.lit("c"), F.col("c_custkey").cast("string")).alias("child"),
        F.concat(F.lit("n"), F.col("c_nationkey").cast("string")).alias("parent"),
    ).unionByName(
        nation.select(
            F.concat(F.lit("n"), F.col("n_nationkey").cast("string")).alias("child"),
            F.concat(F.lit("r"), F.col("n_regionkey").cast("string")).alias("parent"),
        )
    )
    return closure_roots(edges)


@_q(
    "a_distinct_values",
    "SELECT DISTINCT o_orderpriority, o_orderstatus FROM orders",
)
def a_distinct_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct rows / distinct column values (A2/A3: drop_duplicates
    ETL:781, ``.unique()`` ETL:438). Partial-agg dedup before shuffle."""
    return _t(spark, sf_dir, "orders").select("o_orderpriority", "o_orderstatus").distinct()


@_q(
    "a_hierarchy_levels",
    """
SELECT r_name AS group_name, CAST(NULL AS VARCHAR) AS parent_name, 1 AS level, TRUE AS is_top
FROM (SELECT DISTINCT r_name FROM region)
UNION ALL
SELECT n_name AS group_name, r_name AS parent_name, 2 AS level, FALSE AS is_top
FROM (SELECT DISTINCT n_name, r_name FROM nation JOIN region ON n_regionkey = r_regionkey)
""",
)
def a_hierarchy_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchy (parent/child) modeling with parent-before-child dedup
    (A4: one row per Region, one per (Region, District), Regions first —
    ETL:283–308). Ordering is a sink-protocol concern: the ``level``
    column drives level-phased writes (SURVEY §7 hard part 2), so no
    global sort is needed."""
    region = _t(spark, sf_dir, "region")
    nation = _t(spark, sf_dir, "nation")
    top = (
        region.select("r_name")
        .dropDuplicates(["r_name"])
        .select(
            F.col("r_name").alias("group_name"),
            F.lit(None).cast("string").alias("parent_name"),
            F.lit(1).alias("level"),
            F.lit(True).alias("is_top"),
        )
    )
    child = (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("n_name", "r_name")
        .dropDuplicates(["n_name", "r_name"])
        .select(
            F.col("n_name").alias("group_name"),
            F.col("r_name").alias("parent_name"),
            F.lit(2).alias("level"),
            F.lit(False).alias("is_top"),
        )
    )
    return top.unionByName(child)


@_q(
    "so_union_distinct",
    """
SELECT n_nationkey AS nationkey FROM customer JOIN nation ON c_nationkey = n_nationkey
UNION
SELECT n_nationkey AS nationkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
""",
)
def so_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION distinct of two reshaped frames (SO1/SO2: concat +
    drop_duplicates ETL:799–800)."""
    nation = _t(spark, sf_dir, "nation")
    cust_nations = (
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(F.col("n_nationkey").alias("nationkey"))
    )
    supp_nations = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(F.col("n_nationkey").alias("nationkey"))
    )
    return cust_nations.unionByName(supp_nations).distinct()


@_q(
    "so_except",
    """
SELECT DISTINCT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT DISTINCT s_nationkey AS nationkey FROM supplier
""",
)
def so_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference (SO4: pair-list ``not in`` ETL:957–960) as
    EXCEPT DISTINCT."""
    cust = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey")).distinct()
    supp = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey")).distinct()
    return cust.subtract(supp)


@_q(
    "so_intersect",
    """
SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
INTERSECT
SELECT o_custkey FROM orders WHERE o_totalprice > 100000
""",
)
def so_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (set-op family SO1–SO4 completeness): customers with
    both an urgent order and a big-ticket order. Spark plans it as a
    left-semi over deduped sides — partial-agg dedup before the
    shuffle, same scale shape as union-distinct."""
    o = _t(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    big = o.filter(F.col("o_totalprice") > 100000).select("o_custkey")
    return urgent.intersect(big)


@_q(
    "text_wordcount",
    r"""
WITH toks AS (SELECT string_split_regex(lower(trim(text)), '\s+') AS t FROM documents),
counts AS (SELECT tok, count(*) AS n
           FROM (SELECT unnest(t) AS tok FROM toks) GROUP BY tok)
SELECT tok, n FROM counts
ORDER BY n DESC, tok
LIMIT 50
""",
)
def text_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical corpus wordcount, top-50: explode normalized
    tokens → hash-agg → TakeOrderedAndProject (per-partition heaps, no
    global sort). Deterministic via the (count, token) tie-break.
    Scale: partial aggregation absorbs token frequency skew before the
    shuffle; the exchange carries |vocab| partial counts, not tokens."""
    from graphql_api_etl_spark.operators.text import tokens

    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokens(F.lower(F.col("text")))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("tok"))
        .limit(50)
    )


@_q(
    "j_salted_skew_join",
    """
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_items,
       round(sum(l_extendedprice), 2) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderstatus = 'F'
GROUP BY o_orderpriority
""",
)
def j_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/skew.salted_join under the driver's hash gate: the
    fact side salted over 16 buckets, the joined side replicated ×16,
    so no task ever owns a whole hot key — and the oracle is the PLAIN
    join, proving row-for-row equivalence. This is the explicit lever
    for the case AQE's runtime skew split can't fix (hot keys on a
    build side too big to broadcast). Equivalence is also
    property-tested in tests/test_skew_and_tables.py."""
    from graphql_api_etl_spark.operators.skew import salted_join

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority")
    )
    joined = salted_join(li, o, on="l_orderkey", n_buckets=16)
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
    )


@_q(
    "a_two_phase_agg",
    """
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n_rows,
       round(sum(l_quantity), 2) AS sum_qty,
       round(min(l_extendedprice), 2) AS min_price,
       round(max(l_extendedprice), 2) AS max_price
FROM lineitem GROUP BY l_returnflag
""",
)
def a_two_phase_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/skew.two_phase_agg under the driver's hash gate:
    partial aggregation on (key, salt) then final combine on key —
    l_returnflag has 3 values over all of lineitem, a genuinely hot
    grouping. The oracle is the plain GROUP BY, proving the two-phase
    decomposition is value-identical for algebraic aggregates (sums
    rounded: re-associating double addition moves the last bits)."""
    from graphql_api_etl_spark.operators.skew import two_phase_agg

    li = _t(spark, sf_dir, "lineitem")
    agg = two_phase_agg(
        li,
        keys=["l_returnflag"],
        sums=["l_quantity"],
        mins=["l_extendedprice"],
        maxs=["l_extendedprice"],
        n_buckets=16,
    )
    return agg.select(
        "l_returnflag",
        "n_rows",
        F.round("sum_l_quantity", 2).alias("sum_qty"),
        F.round("min_l_extendedprice", 2).alias("min_price"),
        F.round("max_l_extendedprice", 2).alias("max_price"),
    )


@_q(
    "v_count_gates",
    """
SELECT (SELECT count(*) FROM customer) AS n_customer,
       (SELECT count(*) FROM orders) AS n_orders,
       (SELECT count(*) FROM lineitem) AS n_lineitem,
       (SELECT count(*) FROM orders) = (SELECT count(DISTINCT o_orderkey) FROM orders) AS orders_key_unique
""",
)
def v_count_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Validation-gate arithmetic (A5/A7/V1: ``shape[0]`` checks
    ETL:20/38–42/429): row counts + a key-uniqueness reconciliation
    check, as one tiny DataFrame."""
    c = _t(spark, sf_dir, "customer").count()
    o_df = _t(spark, sf_dir, "orders")
    o = o_df.count()
    li = _t(spark, sf_dir, "lineitem").count()
    o_distinct = o_df.select("o_orderkey").distinct().count()
    return spark.createDataFrame(
        [(c, o, li, o == o_distinct)],
        "n_customer bigint, n_orders bigint, n_lineitem bigint, orders_key_unique boolean",
    )


# ---------------------------------------------------------------------------
# D. Analytical benchmarks (TPC-H-shaped; the engine's headline queries)
# ---------------------------------------------------------------------------


@_q(
    "tpch_q1_pricing_summary",
    """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 2) AS avg_qty,
       round(avg(l_extendedprice), 2) AS avg_price,
       round(avg(l_discount), 2) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary: the canonical scan→filter→agg plan.
    Eight aggregates in one pass, partial-aggregated map-side; at 100 TB
    this is scan-bound with a tiny shuffle (|groups| ≈ 6)."""
    return _q1_summary(_t(spark, sf_dir, "lineitem"))


def _q1_summary(li: DataFrame) -> DataFrame:
    """The Q1 plan on a caller-provided lineitem frame — shared by the
    catalog entry and bench.py's 8x-replicated marginal-floor probe so
    the probe times the identical code path."""
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 2).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@_q(
    "tpch_q3_shipping_priority",
    """
SELECT o_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-06-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1995-06-15 00:00:00'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 10
""",
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → two joins → agg → top-k.
    The customer filter prunes before the join; top-k ordering
    tie-breaks on o_orderkey so the LIMIT is deterministic across
    engines."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1995-06-15").cast("timestamp"))
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1995-06-15").cast("timestamp"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select(
            "o_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@_q(
    "tpch_q3_bucketed",
    """
SELECT o_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-06-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1995-06-15 00:00:00'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 10
""",
)
def tpch_q3_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 over CO-BUCKETED orders⋈lineitem (sinks.tables
    layout): both facts bucketed 8-way on their orderkey, so the
    fact-fact join has NO shuffle exchange on either side, and the
    following aggregate reuses the same partitioning (bucket key is a
    subset of the grouping key) — the docs/PLANS.md "zero key
    exchanges" claim as an oracle-checked query instead of a plan
    assertion. First call per session lays the tables down under the
    repo-local bucket warehouse; the in-memory catalog forgets between
    sessions, so every driver round rebuilds from the current parquet."""
    import os as _os

    from graphql_api_etl_spark.sinks.tables import write_bucketed_table

    wh = _os.path.join(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))), ".bucket_warehouse")
    tag = "".join(ch if ch.isalnum() else "_" for ch in sf_dir.strip("/").split("/")[-1])
    spark.sql(f"CREATE DATABASE IF NOT EXISTS graft_buckets LOCATION '{wh}'")
    tables = {
        "orders": ("o_orderkey", ["o_orderkey"]),
        "lineitem": ("l_orderkey", ["l_orderkey"]),
    }
    for base, (key, sort) in tables.items():
        name = f"graft_buckets.{base}_b_{tag}"
        if not spark.catalog.tableExists(name):
            # the in-memory catalog forgets between sessions but the
            # managed location survives on disk — clear it or
            # saveAsTable refuses with LOCATION_ALREADY_EXISTS
            import shutil as _shutil

            _shutil.rmtree(_os.path.join(wh, f"{base}_b_{tag}"), ignore_errors=True)
            write_bucketed_table(_t(spark, sf_dir, base), name, [key], num_buckets=8, sort_cols=sort)
    o = spark.table(f"graft_buckets.orders_b_{tag}").filter(
        F.col("o_orderdate") < F.lit("1995-06-15").cast("timestamp")
    )
    li = spark.table(f"graft_buckets.lineitem_b_{tag}").filter(
        F.col("l_shipdate") > F.lit("1995-06-15").cast("timestamp")
    )
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select(
            "o_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


def _layout_cache_path(
    sf_dir: str, name: str, src_tables: list[str], version: int = 1
) -> tuple[str, bool]:
    """Cache dir for a derived-layout copy, keyed by the sf tag AND a
    fingerprint (mtime_ns + size) of the source parquet files — so
    regenerated testdata can never silently reuse a stale copy (r3
    ADVICE: the _SUCCESS-only check survived a testdata regen). Other
    fingerprints of the same (name, tag) are garbage-collected.
    ``version`` salts the fingerprint with the BUILDER's revision:
    source-data fingerprints can't see a code change in the writer
    (hit live in r7 — the corrupt-CSV writer fix kept serving the old
    copy until a manual purge), so bump the caller's version whenever
    its build_fn changes what it writes.
    Returns (path, is_valid_cached_copy)."""
    import glob as _glob
    import hashlib as _hashlib
    import os as _os
    import shutil as _shutil

    root = _os.path.join(
        _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))), ".layout_cache"
    )
    tag = "".join(ch if ch.isalnum() else "_" for ch in sf_dir.strip("/").split("/")[-1])
    h = _hashlib.md5(f"v{version};".encode())
    for t in src_tables:
        st = _os.stat(_os.path.join(sf_dir, f"{t}.parquet"))
        h.update(f"{t}:{st.st_mtime_ns}:{st.st_size};".encode())
    fp = h.hexdigest()[:10]
    path = _os.path.join(root, f"{name}_{tag}_{fp}")
    for stale in _glob.glob(_os.path.join(root, f"{name}_{tag}_*")):
        if stale != path and not stale.startswith(path + ".tmp"):
            _shutil.rmtree(stale, ignore_errors=True)
    return path, _os.path.exists(_os.path.join(path, "_SUCCESS"))


def _publish_layout(build_fn, path: str) -> None:
    """Build into a pid-suffixed sibling and atomically rename into
    place: a concurrent session either wins the rename or discards its
    build — readers can never observe a half-written copy (r3 ADVICE
    first-call write race)."""
    import os as _os
    import shutil as _shutil

    tmp = f"{path}.tmp.{_os.getpid()}"
    _shutil.rmtree(tmp, ignore_errors=True)
    build_fn(tmp)
    try:
        _os.rename(tmp, path)
    except OSError:
        _shutil.rmtree(tmp, ignore_errors=True)  # lost the race; a valid copy exists


@_q(
    "layout_zorder_prune",
    """
SELECT l_partkey,
       CAST(count(*) AS BIGINT) AS n_items,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
WHERE l_partkey BETWEEN 50 AND 150 AND l_suppkey BETWEEN 2 AND 7
GROUP BY l_partkey
""",
)
def layout_zorder_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-aggregate over the Z-ORDERED copy of lineitem
    (sinks.zorder.write_zordered, clustered on l_partkey+l_suppkey)
    while the oracle reads the RAW table: a hash match proves the
    Morton-interleave → range-partition → sorted write is lossless,
    the same way tpch_q3_bucketed oracle-checks the bucketed layout.
    The scan itself is the payoff case — both filter columns are
    z-clustered, so parquet footer min/max stats prune most files for
    either predicate (selectivity asserted in tests/test_skew_and_tables.py).
    First call lays the copy down under the repo-local layout dir,
    keyed by a fingerprint of the source parquet (stale copies from
    regenerated testdata are collected) and published atomically."""
    from graphql_api_etl_spark.sinks.zorder import write_zordered

    path, cached = _layout_cache_path(sf_dir, "lineitem_z", ["lineitem"])
    if not cached:
        _publish_layout(
            lambda tmp: write_zordered(
                spark, _t(spark, sf_dir, "lineitem"), tmp,
                ["l_partkey", "l_suppkey"], bits=8, n_files=16,
            ),
            path,
        )
    z = spark.read.parquet(path)
    return (
        z.filter(F.col("l_partkey").between(50, 150) & F.col("l_suppkey").between(2, 7))
        .groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
        )
    )


@_q(
    "layout_compacted_scan",
    """
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(o_totalprice), 2) AS total_price
FROM orders
WHERE o_orderstatus = 'F'
GROUP BY o_orderpriority
""",
)
def layout_compacted_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate over the COMPACTED rewrite of a deliberately
    fragmented orders copy (64 shards → sinks.maintenance.compact_parquet)
    while the oracle reads the raw table: hash match proves the
    small-file compaction pass is lossless. The fragmented copy
    simulates what streaming sinks / per-batch upserts leave behind;
    compaction is the maintenance op that keeps 100 TB scans at one
    task per ~128 MB instead of one task per micro-file."""
    import shutil as _shutil

    from graphql_api_etl_spark.sinks.maintenance import compact_parquet

    compacted, cached = _layout_cache_path(sf_dir, "orders_compact", ["orders"])
    if not cached:

        def _build(tmp: str) -> None:
            frag = f"{tmp}_frag"
            _t(spark, sf_dir, "orders").repartition(64).write.mode("overwrite").parquet(frag)
            compact_parquet(spark, frag, target_bytes=32 * 1024 * 1024, out_path=tmp)
            _shutil.rmtree(frag, ignore_errors=True)

        _publish_layout(_build, compacted)
    o = spark.read.parquet(compacted)
    return (
        o.filter(F.col("o_orderstatus") == "F")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


@_q(
    "source_jsonl_roundtrip",
    """
SELECT doc_id, lang, source, CAST(n_chars AS BIGINT) AS n_chars, md5(text) AS text_md5
FROM documents
""",
)
def source_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-Lines source — THE interchange format of LLM corpora: the
    documents table is written once as JSONL (fingerprint-cached,
    atomically published like the layout entries), read back with a
    DECLARED schema (no inference scan — at 100 TB schema inference is
    a full extra pass), and hash-matched against the parquet oracle
    including an md5 of the text payload, so JSON string escaping must
    round-trip byte-exactly. Line-splittable → parallel scan."""
    from pyspark.sql import types as T

    path, cached = _layout_cache_path(sf_dir, "documents_jsonl", ["documents"])
    docs = _t(spark, sf_dir, "documents")
    if not cached:
        _publish_layout(lambda tmp: docs.write.mode("overwrite").json(tmp), path)
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    j = spark.read.schema(schema).json(path)
    return j.select(
        "doc_id", "lang", "source", F.col("n_chars").cast("bigint").alias("n_chars"),
        F.md5("text").alias("text_md5"),
    )


@_q(
    "source_orc_roundtrip",
    """
SELECT doc_id, lang, source, CAST(n_chars AS BIGINT) AS n_chars, md5(text) AS text_md5
FROM documents
""",
)
def source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC source/sink — the other columnar interchange format Spark
    ships natively (Hive-ecosystem corpora arrive as ORC). The
    documents table is written once as ORC (fingerprint-cached,
    atomically published), read back, and hash-matched against the
    parquet oracle including an md5 of the text payload — so type
    mapping and string encoding must round-trip byte-exactly. ORC is
    splittable with stripe-level predicate pushdown, so the scan
    parallelizes like parquet at 100 TB."""
    path, cached = _layout_cache_path(sf_dir, "documents_orc", ["documents"])
    docs = _t(spark, sf_dir, "documents")
    if not cached:
        _publish_layout(lambda tmp: docs.write.mode("overwrite").orc(tmp), path)
    o = spark.read.orc(path)
    return o.select(
        "doc_id", "lang", "source", F.col("n_chars").cast("bigint").alias("n_chars"),
        F.md5("text").alias("text_md5"),
    )


@_q(
    "tpch_q5_local_volume",
    """
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'
GROUP BY n_name
""",
)
def tpch_q5_local_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table join with region pruning. Dim tables
    broadcast; the fact-fact orders⋈lineitem is the only real shuffle."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


@_q(
    "tpch_q6_forecast_revenue",
    """
SELECT coalesce(round(sum(l_extendedprice * l_discount), 2), 0.0) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
""",
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure filter→scalar-agg. Every predicate reaches
    the parquet scan (range + equality pushdown); zero shuffle beyond
    the single-row final reduce — at 100 TB this is I/O-bound and
    row-group statistics prune most of the scan."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.coalesce(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2), F.lit(0.0)).alias(
            "revenue"
        )
    )


@_q(
    "tpch_q4_order_priority",
    """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1995-04-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1995-07-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
""",
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS → left-semi join with a non-equi conjunct
    (l_shipdate > o_orderdate). Semi joins never duplicate the probe
    side, so the count is per-order regardless of lineitem fan-out."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-04-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-07-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        o.join(li, (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@_q(
    "tpch_q18_large_orders",
    """
SELECT c_name, o_orderkey, round(o_totalprice, 2) AS totalprice, round(sum_qty, 2) AS sum_qty
FROM (SELECT l_orderkey, sum(l_quantity) AS sum_qty FROM lineitem
      GROUP BY l_orderkey HAVING sum(l_quantity) > 300) big
JOIN orders   ON o_orderkey = big.l_orderkey
JOIN customer ON c_custkey = o_custkey
""",
)
def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: agg-then-join with HAVING. The heavy groupBy
    runs FIRST and shrinks lineitem to qualifying orders before any
    join; the tiny survivor set then broadcasts against orders."""
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        F.broadcast(big)
        .join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            F.round("sum_qty", 2).alias("sum_qty"),
        )
    )


@_q(
    "tpch_q10_returned_items",
    """
SELECT c_custkey, c_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'
GROUP BY c_custkey, c_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue top-k. Top-k is
    TakeOrderedAndProject (per-partition heaps), never a global sort."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@_q(
    "tpch_q16_supplier_variety",
    """
SELECT p_type, count(DISTINCT l_suppkey) AS supplier_cnt
FROM part JOIN lineitem ON l_partkey = p_partkey
GROUP BY p_type
""",
)
def tpch_q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: COUNT(DISTINCT) per group — Spark expands to a
    two-phase partial-distinct aggregate (dedup before the final
    shuffle), no driver-side set building."""
    p = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@_q(
    "tpch_q7_nation_volume",
    """
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE (sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
   OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1')
GROUP BY sn.n_name, cn.n_name, l_year
""",
)
def tpch_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: cross-nation shipping volume by year — the
    two-fact five-dim join. Dimension sides (supplier, customer,
    nation×2) broadcast; lineitem streams through once; the one
    exchange is the final (nation, nation, year) group-by."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    sn = F.broadcast(n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")))
    cn = F.broadcast(n.select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(sn, F.col("s_nationkey") == F.col("sn_key"))
        .join(cn, F.col("c_nationkey") == F.col("cn_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("bigint").alias("l_year"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


@_q(
    "tpch_q13_order_distribution",
    """
WITH co AS (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
SELECT c_count, count(*) AS custdist FROM co GROUP BY c_count
""",
)
def tpch_q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: orders-per-customer distribution — left outer
    preserving zero-order customers, then a second aggregation over the
    first's output (the re-aggregation reuses nothing and shuffles only
    |customers| pre-aggregated rows)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    co = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return co.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@_q(
    "tpch_q14_promo_share",
    """
SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount)
                              ELSE 0.0 END)
             / sum(l_extendedprice * (1 - l_discount)), 2) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
""",
)
def tpch_q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-revenue share — one broadcast join,
    two conditional sums in a single pass, shipdate pushed to the
    scan."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(F.round(100.0 * F.sum(promo) / F.sum(rev), 2).alias("promo_revenue_pct"))
    )


@_q(
    "tpch_q15_top_supplier",
    """
WITH rev AS (
  SELECT l_suppkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_rev
FROM supplier JOIN rev ON s_suppkey = l_suppkey
WHERE total_rev = (SELECT max(total_rev) FROM rev)
""",
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: derived revenue view consumed twice (rows +
    scalar max) — the view is computed once and reused; the max is a
    broadcast scalar, not a sort. Revenue rounded BEFORE the equality
    so the float comparison is engine-portable."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = (
        li.groupBy("l_suppkey")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("total_rev"))
    )
    best = rev.agg(F.max("total_rev").alias("best"))
    s = _t(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(best), rev.total_rev == best.best)
        .join(F.broadcast(s), rev.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_rev")
    )


@_q(
    "tpch_q17_small_quantity",
    """
WITH pa AS (
  SELECT l_partkey AS pk, 0.2 * avg(l_quantity) AS qty_floor
  FROM lineitem GROUP BY l_partkey
)
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey JOIN pa ON pk = l_partkey
WHERE p_brand = 'Brand#1' AND l_quantity < qty_floor
""",
)
def tpch_q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery (per-part average
    quantity) DE-CORRELATED into an aggregate + equi-join — the
    standard rewrite; the per-part averages shuffle once and join on
    the same key as the fact filter."""
    li = _t(spark, sf_dir, "lineitem")
    pa = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (0.2 * F.avg("l_quantity")).alias("qty_floor")
    )
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(pa, li.l_partkey == pa.pk)
        .filter(F.col("l_quantity") < F.col("qty_floor"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@_q(
    "tpch_q19_or_of_ands",
    """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
""",
)
def tpch_q19_or_of_ands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs predicate across both join sides.
    Catalyst extracts the common single-side conjuncts (quantity range
    union on lineitem, brand/size union on part) and pushes them below
    the join, so both scans prune before pairing."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    clause = lambda brand, smax, qlo, qhi: (
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, smax)
        & F.col("l_quantity").between(qlo, qhi)
    )
    return j.filter(
        clause("Brand#1", 5, 1, 11) | clause("Brand#2", 10, 10, 20) | clause("Brand#3", 15, 20, 30)
    ).agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))


@_q(
    "tpch_q22_idle_rich",
    """
WITH ab AS (SELECT avg(c_acctbal) AS bal_floor FROM customer WHERE c_acctbal > 0.0),
rich AS (
  SELECT c_custkey, c_nationkey, c_acctbal FROM customer, ab WHERE c_acctbal > bal_floor
)
SELECT c_nationkey, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
FROM rich
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = rich.c_custkey)
GROUP BY c_nationkey
""",
)
def tpch_q22_idle_rich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: global scalar aggregate as a filter (broadcast
    scalar, no driver round trip) + NOT EXISTS as a left-anti join —
    customers above the positive-balance average who never ordered."""
    c = _t(spark, sf_dir, "customer")
    floor_ = c.filter(F.col("c_acctbal") > 0.0).agg(F.avg("c_acctbal").alias("bal_floor"))
    rich = c.join(F.broadcast(floor_), c.c_acctbal > floor_.bal_floor).select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return (
        anti(rich, o, on="c_custkey")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("numcust"), F.round(F.sum("c_acctbal"), 2).alias("totacctbal"))
    )


@_q(
    "tpch_q2_min_cost_supplier",
    """
WITH cost AS (
  SELECT l_partkey AS pk, l_suppkey AS sk, min(l_extendedprice) AS unit_cost
  FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
                JOIN nation   ON n_nationkey = s_nationkey
                JOIN region   ON r_regionkey = n_regionkey
  WHERE r_name = 'EUROPE'
  GROUP BY l_partkey, l_suppkey
), best AS (SELECT pk, min(unit_cost) AS best_cost FROM cost GROUP BY pk)
SELECT p_partkey, p_name, s_name, n_name, round(s_acctbal, 2) AS acctbal,
       round(unit_cost, 2) AS unit_cost
FROM cost JOIN best USING (pk)
     JOIN part ON p_partkey = pk
     JOIN supplier ON s_suppkey = sk
     JOIN nation ON n_nationkey = s_nationkey
WHERE unit_cost = best_cost AND p_type = 'PROMO'
""",
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (no partsupp in the driver schema, so unit cost
    derives from lineitem): per-part MIN-cost supplier within a region
    — the correlated scalar-min subquery, de-correlated into a
    per-part min aggregate joined back on the part key. min() is
    exact on doubles (no summation-order hazard), so the equality
    match is engine-portable. Dims broadcast; the cost table shuffles
    once on (part, supplier) and its per-part min reuses the same
    exchange prefix."""
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    euro_sup = (
        sup.join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cost = (
        li.join(F.broadcast(euro_sup.select("s_suppkey")), li.l_suppkey == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk"))
        .agg(F.min("l_extendedprice").alias("unit_cost"))
    )
    best = cost.groupBy("pk").agg(F.min("unit_cost").alias("best_cost"))
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    return (
        cost.join(best, "pk")
        .filter(F.col("unit_cost") == F.col("best_cost"))
        .join(F.broadcast(p), F.col("pk") == p.p_partkey)
        .join(F.broadcast(euro_sup), F.col("sk") == euro_sup.s_suppkey)
        .select(
            "p_partkey", "p_name", "s_name", "n_name",
            F.round("s_acctbal", 2).alias("acctbal"),
            F.round("unit_cost", 2).alias("unit_cost"),
        )
    )


@_q(
    "tpch_q8_market_share",
    """
SELECT o_year,
       round(sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END) / sum(volume), 4)
         AS mkt_share
FROM (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n2.n_name AS nation
  FROM lineitem
  JOIN part     ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON n1.n_nationkey = c_nationkey
  JOIN region   ON r_regionkey = n1.n_regionkey
  JOIN nation n2 ON n2.n_nationkey = s_nationkey
  WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
    AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
) t
GROUP BY o_year
""",
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): conditional-fraction
    aggregation over a 7-table star. Every dimension broadcasts; the
    two fact tables (lineitem⋈orders) are the only shuffle pair, and
    the supplier-nation vs customer-nation roles use two aliased
    broadcast copies of nation — the classic role-playing-dimension
    plan."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    sup = _t(spark, sf_dir, "supplier")
    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n1 = nat.alias("n1")
    n2 = nat.alias("n2")
    joined = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(cust), o.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), cust.c_nationkey == F.col("n1.n_nationkey"))
        .join(F.broadcast(reg), F.col("n1.n_regionkey") == reg.r_regionkey)
        .join(F.broadcast(n2), sup.s_nationkey == F.col("n2.n_nationkey"))
        .select(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
            F.col("n2.n_name").alias("nation"),
        )
    )
    return joined.groupBy("o_year").agg(
        F.round(
            F.sum(F.when(F.col("nation") == "NATION_3", F.col("volume")).otherwise(F.lit(0.0)))
            / F.sum("volume"),
            4,
        ).alias("mkt_share")
    )


@_q(
    "tpch_q9_profit_by_nation",
    """
SELECT nation, o_year, round(sum(amount), 2) AS sum_profit
FROM (
  SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
         l_extendedprice * (1 - l_discount) - 0.1 * p_retailprice * l_quantity AS amount
  FROM lineitem
  JOIN part     ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN nation   ON n_nationkey = s_nationkey
  WHERE p_name LIKE '%red%'
) t
GROUP BY nation, o_year
""",
)
def tpch_q9_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product-type profit; ps_supplycost stands in as
    10% of p_retailprice — no partsupp in the driver schema): LIKE
    filter on the part dimension pruned BEFORE the fact join, then a
    two-fact join and a (nation, year) rollup. Part/supplier/nation
    broadcast; lineitem⋈orders is the one real shuffle."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").contains("red"))
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            (
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
                - 0.1 * F.col("p_retailprice") * F.col("l_quantity")
            ).alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("amount"), 2).alias("sum_profit"))
    )


@_q(
    "tpch_q11_important_stock",
    """
WITH val AS (
  SELECT l_partkey AS p_partkey, sum(l_extendedprice * (1 - l_discount)) AS value
  FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
                JOIN nation   ON n_nationkey = s_nationkey
  WHERE n_name = 'NATION_7'
  GROUP BY l_partkey
)
SELECT p_partkey, round(value, 2) AS value
FROM val
WHERE value > (SELECT 0.005 * sum(value) FROM val)
""",
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock): per-part value vs a FRACTION of
    the global total — the uncorrelated scalar subquery in a HAVING.
    The per-part aggregate computes once; the global total is a second
    aggregate over the SAME frame (Catalyst reuses the exchange) and
    reaches the filter as a broadcast 1-row cross join, never a
    re-scan."""
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    nat_sup = sup.join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey).select("s_suppkey")
    val = (
        li.join(F.broadcast(nat_sup), li.l_suppkey == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("value"))
    )
    threshold = val.agg((0.005 * F.sum("value")).alias("__thr__"))
    return (
        val.crossJoin(F.broadcast(threshold))
        .filter(F.col("value") > F.col("__thr__"))
        .select("p_partkey", F.round("value", 2).alias("value"))
    )


@_q(
    "tpch_q12_late_shipments",
    """
SELECT l_returnflag AS shipclass,
       CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT)
         AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority <> '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT)
         AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
GROUP BY l_returnflag
""",
)
def tpch_q12_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (no l_shipmode/receiptdate in the driver
    schema: 'late' = shipped >60 days after order date, classes from
    l_returnflag): the two-way CASE-sum pivot over a fact-fact join.
    The join-side date comparison can't push below the join, but both
    scans still prune to the three referenced columns each."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy(F.col("l_returnflag").alias("shipclass"))
        .agg(
            F.sum(F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0))
            .cast("bigint")
            .alias("high_line_count"),
            F.sum(F.when(F.col("o_orderpriority") != "1-URGENT", 1).otherwise(0))
            .cast("bigint")
            .alias("low_line_count"),
        )
    )


@_q(
    "tpch_q20_excess_suppliers",
    """
WITH small_parts AS (SELECT p_partkey FROM part WHERE p_name LIKE 'small%'),
     qty AS (
       SELECT l_suppkey AS sk, sum(l_quantity) AS total_qty
       FROM lineitem
       WHERE l_partkey IN (SELECT p_partkey FROM small_parts)
         AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
       GROUP BY l_suppkey
     )
SELECT s_name, round(s_acctbal, 2) AS acctbal
FROM supplier JOIN nation ON n_nationkey = s_nationkey
WHERE n_name = 'NATION_3'
  AND s_suppkey IN (SELECT sk FROM qty WHERE total_qty > 50)
""",
)
def tpch_q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (partsupp availability folded into shipped
    quantity): nested IN subqueries lowered to left-semi joins — parts
    filter SEMI-joins the fact, the per-supplier quantity gate
    SEMI-joins the supplier dimension. No row ever duplicates through
    either membership test."""
    li = _t(spark, sf_dir, "lineitem")
    p_small = _t(spark, sf_dir, "part").filter(F.col("p_name").startswith("small")).select("p_partkey")
    qty = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(F.broadcast(p_small), li.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy(F.col("l_suppkey").alias("sk"))
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 50)
        .select("sk")
    )
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    return (
        sup.join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(qty), sup.s_suppkey == F.col("sk"), "left_semi")
        .select("s_name", F.round("s_acctbal", 2).alias("acctbal"))
    )


@_q(
    "tpch_q21_waiting_suppliers",
    """
WITH late AS (
  SELECT DISTINCT l_orderkey, l_suppkey
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY AND o_orderstatus = 'F'
),
 all_sup AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM late l1 JOIN supplier ON s_suppkey = l1.l_suppkey
WHERE EXISTS (SELECT 1 FROM all_sup a
              WHERE a.l_orderkey = l1.l_orderkey AND a.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM late l2
                  WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
GROUP BY s_name
""",
)
def tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting; 'late' = shipped
    >90 days after an 'F'-status order's date): the EXISTS / NOT
    EXISTS pair lowered to a left-semi + left-anti join on the order
    key with a supplier-inequality condition — the one TPC-H query
    whose plan is two correlated existentials over the same derived
    table. `late` is computed once and reused on both sides."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    late = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    all_sup = li.select("l_orderkey", "l_suppkey").distinct()
    l1 = late.alias("l1")
    other = all_sup.alias("a")
    other_late = late.alias("l2")
    waiting = (
        l1.join(
            other,
            (F.col("l1.l_orderkey") == F.col("a.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("a.l_suppkey")),
            "left_semi",
        )
        .join(
            other_late,
            (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
            "left_anti",
        )
    )
    sup = _t(spark, sf_dir, "supplier")
    return (
        waiting.join(F.broadcast(sup), F.col("l1.l_suppkey") == sup.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
    )


@_q(
    "a_rollup_counts",
    """
SELECT coalesce(n_name, '<all>') AS nation,
       coalesce(c_mktsegment, '<all>') AS segment,
       count(*) AS n, round(sum(c_acctbal), 2) AS total_bal
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY ROLLUP (n_name, c_mktsegment)
""",
)
def a_rollup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical ROLLUP aggregate (engine-native; the reference has
    no grouping sets — SURVEY §2.6). One shuffle computes all three
    grouping levels; NULL group markers coalesced for the comparison."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .rollup("n_name", "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("c_acctbal"), 2).alias("total_bal"))
        .select(
            F.coalesce("n_name", F.lit("<all>")).alias("nation"),
            F.coalesce("c_mktsegment", F.lit("<all>")).alias("segment"),
            "n",
            "total_bal",
        )
    )


@_q(
    "a_grouping_sets",
    """
SELECT coalesce(n_name, '<all>') AS nation,
       coalesce(c_mktsegment, '<all>') AS segment,
       count(*) AS n, round(sum(c_acctbal), 2) AS total_bal
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY GROUPING SETS ((n_name), (c_mktsegment), ())
""",
)
def a_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the slices ROLLUP/CUBE can't express
    (here: per-nation, per-segment, and grand total WITHOUT the
    (nation, segment) cross cells that CUBE would add). One shuffle
    computes all three groupings via the same Expand operator the
    rollup/cube entries use — the row stream is replicated once per
    grouping set map-side, then a single exchange aggregates, so at
    scale the cost is (#sets)× the map output of one GROUP BY, never
    one job per slice."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupingSets([["n_name"], ["c_mktsegment"], []], "n_name", "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("c_acctbal"), 2).alias("total_bal"))
        .select(
            F.coalesce("n_name", F.lit("<all>")).alias("nation"),
            F.coalesce("c_mktsegment", F.lit("<all>")).alias("segment"),
            "n",
            "total_bal",
        )
    )


# ---------------------------------------------------------------------------
# E. Event streams: windows, sessions, JSON props
# ---------------------------------------------------------------------------


@_q(
    "events_tumbling_window",
    """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       count(*) AS n_events,
       round(sum(value), 2) AS total_value
FROM events
GROUP BY 1, 2
""",
)
def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time window aggregate (engine-native extension;
    the reference has no temporal operators — SURVEY §2.10). Batch shape
    of the Structured Streaming windowed agg in streaming/windows.py."""
    return _tumbling_report(_t(spark, sf_dir, "events"))


def _tumbling_report(ev: DataFrame) -> DataFrame:
    """The tumbling-window plan on a caller-provided events frame —
    shared by the catalog entry and bench.py's marginal-floor probe."""
    return (
        ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.date_format("w", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@_q(
    "events_sessionize",
    """
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > 30 * 60 * 1000
              THEN 1 ELSE 0 END AS new_sess
  FROM events
), numbered AS (
  SELECT user_id, ts, event_id,
         CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS session_idx
  FROM flagged
)
SELECT user_id, session_idx,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(epoch_ms(max(ts)) - epoch_ms(min(ts)) AS BIGINT) AS duration_ms
FROM numbered
GROUP BY user_id, session_idx
""",
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with a 30-minute inactivity gap via lag + running
    sum (engine-native; streaming variant uses session_window). One
    shuffle on user_id serves both window functions and the final agg
    (same partitioning — Catalyst reuses the exchange)."""
    return _sessionize_report(_t(spark, sf_dir, "events"))


def _sessionize_report(ev: DataFrame) -> DataFrame:
    """The sessionization plan on a caller-provided events frame —
    shared by the catalog entry and bench.py's marginal-floor probe."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ms = F.unix_millis(F.col("ts"))
    flagged = ev.withColumn(
        "new_sess",
        F.when(ms - F.lag(ms).over(w) > 30 * 60 * 1000, F.lit(1)).otherwise(F.lit(0)),
    )
    numbered = flagged.withColumn(
        "session_idx",
        # BIGINT pinned on both sides: DuckDB's sum() OVER returns
        # HUGEINT, which the driver canon renders differently (r01
        # hash mismatch with matching rows+schema).
        F.sum("new_sess").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)).cast("bigint"),
    )
    return numbered.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        (F.unix_millis(F.max("ts")) - F.unix_millis(F.min("ts"))).cast("bigint").alias("duration_ms"),
    )


@_q(
    "events_interval_join",
    """
WITH c AS (SELECT user_id, event_id AS click_id, epoch_ms(ts) AS t
           FROM events WHERE event_type = 'click'),
     p AS (SELECT user_id, event_id AS purchase_id, epoch_ms(ts) AS s,
                  epoch_ms(ts) + 1800000 AS e
           FROM events WHERE event_type = 'purchase')
SELECT c.user_id, click_id, purchase_id, CAST(c.t - p.s AS BIGINT) AS lag_ms
FROM c JOIN p ON c.user_id = p.user_id AND c.t BETWEEN p.s AND p.e
""",
)
def events_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval containment join (engine-native; SURVEY §2.10): clicks
    within 30 min AFTER each purchase, per user. Spark's naive plan for
    a range predicate is nested-loop; operators/rangejoin.interval_join
    buckets time into chunks and equi-joins on (user, chunk) — cost
    Σ_c |L_c|·|R_c| with plain shuffle machinery. The oracle is the
    direct BETWEEN join, so the chunking trick is hash-checked."""
    from graphql_api_etl_spark.operators.rangejoin import interval_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.unix_millis("ts").alias("t")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.unix_millis("ts").alias("s"),
        (F.unix_millis("ts") + 1800000).alias("e"),
    )
    joined = interval_join(
        clicks, purchases, ts_col="t", start_col="s", end_col="e", by="user_id", chunk=1800000.0
    )
    return joined.select(
        "user_id", "click_id", "purchase_id", (F.col("t") - F.col("s")).cast("bigint").alias("lag_ms")
    )


@_q(
    "events_range_join_left",
    """
WITH c AS (SELECT user_id, event_id AS click_id, epoch_ms(ts) AS t
           FROM events WHERE event_type = 'click'),
     p AS (SELECT user_id, event_id AS purchase_id, epoch_ms(ts) AS s,
                  epoch_ms(ts) + 1800000 AS e
           FROM events WHERE event_type = 'purchase')
SELECT c.user_id, click_id, purchase_id, CAST(c.t - p.s AS BIGINT) AS lag_ms
FROM c LEFT JOIN p ON c.user_id = p.user_id AND c.t BETWEEN p.s AND p.e
""",
)
def events_range_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT-mode interval join: every click row survives, matched or
    not (unmatched → null purchase columns), with duplicate-left
    multiplicity preserved via a per-row id through the miss branch
    (operators/rangejoin.py:70-112 — the r2 ADVICE fix, now
    oracle-checked against DuckDB's direct LEFT JOIN ... BETWEEN)."""
    from graphql_api_etl_spark.operators.rangejoin import interval_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.unix_millis("ts").alias("t")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.unix_millis("ts").alias("s"),
        (F.unix_millis("ts") + 1800000).alias("e"),
    )
    joined = interval_join(
        clicks, purchases, ts_col="t", start_col="s", end_col="e",
        by="user_id", chunk=1800000.0, how="left",
    )
    return joined.select(
        "user_id", "click_id", "purchase_id", (F.col("t") - F.col("s")).cast("bigint").alias("lag_ms")
    )


@_q(
    "x_hierarchy_deep_levels",
    """
SELECT 'r' || CAST(n_regionkey AS VARCHAR) AS group_name,
       CAST(NULL AS VARCHAR) AS parent_name,
       CAST(1 AS BIGINT) AS level, true AS is_top
FROM (SELECT DISTINCT n_regionkey FROM nation)
UNION ALL
SELECT 'n' || CAST(n_nationkey AS VARCHAR), 'r' || CAST(n_regionkey AS VARCHAR),
       CAST(2 AS BIGINT), false
FROM nation
UNION ALL
SELECT 'c' || CAST(c_custkey AS VARCHAR), 'n' || CAST(c_nationkey AS VARCHAR),
       CAST(3 AS BIGINT), false
FROM customer
UNION ALL
SELECT 'o' || CAST(o_orderkey AS VARCHAR), 'c' || CAST(o_custkey AS VARCHAR),
       CAST(4 AS BIGINT), false
FROM orders
""",
)
def x_hierarchy_deep_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary-depth hierarchy leveling from a parent-pointer edge
    list (orders→customer→nation→region, a 4-level tree): the >2-level
    generalization of the reference's hard-coded Region→District DDL
    (A4/K5, ETL:145–166, 283–308). The Spark side derives each node's
    level with operators/graph.hierarchy_from_edges (closure_roots
    pointer doubling — nothing in the plan knows the depth); the
    oracle reconstructs the same rows schema-aware, so a hash match
    proves the generic edge-driven leveling reproduces the known-depth
    answer. Feeds write_level_phased for parent-before-child writes at
    any depth."""
    from graphql_api_etl_spark.operators.graph import hierarchy_from_edges

    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    edges = (
        orders.select(
            F.concat(F.lit("o"), F.col("o_orderkey").cast("string")).alias("child"),
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("parent"),
        )
        .unionByName(
            customer.select(
                F.concat(F.lit("c"), F.col("c_custkey").cast("string")).alias("child"),
                F.concat(F.lit("n"), F.col("c_nationkey").cast("string")).alias("parent"),
            )
        )
        .unionByName(
            nation.select(
                F.concat(F.lit("n"), F.col("n_nationkey").cast("string")).alias("child"),
                F.concat(F.lit("r"), F.col("n_regionkey").cast("string")).alias("parent"),
            )
        )
    )
    return hierarchy_from_edges(edges)


@_q(
    "w_window_suite",
    """
SELECT o_custkey, o_orderkey,
       CAST(row_number() OVER w AS BIGINT) AS rn,
       CAST(ntile(4) OVER w AS BIGINT) AS quartile,
       round(lag(o_totalprice) OVER w, 2) AS prev_price,
       round(sum(o_totalprice) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
         AS running_total,
       round(max(o_totalprice) OVER (PARTITION BY o_custkey), 2) AS cust_max
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
)
def w_window_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function breadth on one ordered pass: row_number, ntile,
    lag, running sum, and an unordered per-partition max — ONE shuffle
    on o_custkey feeds every frame (Catalyst reuses the exchange; the
    unordered max adds a second window node, not a second exchange).
    Deterministic via the (o_orderdate, o_orderkey) tie-break."""
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.round(F.lag("o_totalprice").over(w), 2).alias("prev_price"),
        F.round(
            F.sum("o_totalprice").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)), 2
        ).alias("running_total"),
        F.round(F.max("o_totalprice").over(W.partitionBy("o_custkey")), 2).alias("cust_max"),
    )


@_q(
    "a_cube_counts",
    """
SELECT coalesce(o_orderstatus, '<all>') AS status,
       coalesce(o_orderpriority, '<all>') AS priority,
       count(*) AS n
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
)
def a_cube_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority): all four grouping sets in one
    pass with partial aggregation (the Expand operator multiplies rows
    by grouping-set count BEFORE the shuffle, so the exchange carries
    |groups|·4, not |input|·4). Subtotal NULLs are labeled so the hash
    canon can't confuse them with real null values."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("<all>")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("<all>")).alias("priority"),
            "n",
        )
    )


@_q(
    "a_unpivot_measures",
    """
SELECT l_returnflag, measure, round(val, 2) AS val
FROM (
  SELECT l_returnflag,
         round(sum(l_quantity), 2) AS qty,
         round(sum(l_extendedprice), 2) AS price,
         round(sum(l_discount), 2) AS discount
  FROM lineitem GROUP BY l_returnflag
) UNPIVOT (val FOR measure IN (qty, price, discount))
""",
)
def a_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide→long, the inverse of a_pivot): three aggregate
    measures melted into (measure, val) rows — Spark's ``unpivot`` is
    a zero-shuffle Expand over the already-aggregated frame."""
    li = _t(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        F.round(F.sum("l_quantity"), 2).alias("qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("price"),
        F.round(F.sum("l_discount"), 2).alias("discount"),
    )
    return wide.unpivot("l_returnflag", ["qty", "price", "discount"], "measure", "v").select(
        "l_returnflag", "measure", F.round("v", 2).alias("val")
    )


@_q(
    "x_posexplode_tokens",
    r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents WHERE doc_id < 20
)
SELECT doc_id, CAST(unnest(range(len(t))) AS BIGINT) AS pos, unnest(t) AS tok
FROM toks
""",
)
def x_posexplode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordinal explode (posexplode ≡ UNNEST WITH ORDINALITY): token
    stream with positions — the lateral-view shape every sequence
    model's data prep needs. Generate node, no shuffle."""
    from graphql_api_etl_spark.operators.text import tokens

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    return docs.select(
        "doc_id", F.posexplode(tokens(F.col("text"))).alias("pos", "tok")
    ).select("doc_id", F.col("pos").cast("bigint").alias("pos"), "tok")


@_q(
    "events_gapfill",
    """
WITH b AS (
  SELECT user_id, date_trunc('hour', ts) AS h, round(sum(value), 2) AS v
  FROM events WHERE user_id < 20 GROUP BY user_id, date_trunc('hour', ts)
),
spans AS (SELECT user_id, min(h) AS lo, max(h) AS hi FROM b GROUP BY user_id),
grid AS (
  SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM spans
),
joined AS (
  SELECT g.user_id, g.h, b.v,
         count(b.v) OVER (PARTITION BY g.user_id ORDER BY g.h
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
  FROM grid g LEFT JOIN b ON b.user_id = g.user_id AND b.h = g.h
)
SELECT user_id, strftime(h, '%Y-%m-%d %H:%M:%S') AS hour,
       coalesce(v, max(v) OVER (PARTITION BY user_id, grp)) AS value_ffill,
       CAST(v IS NULL AS BOOLEAN) AS was_gap
FROM joined
""",
)
def events_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling: dense hourly grid per user (sequence
    between each user's min/max hour) left-joined to actual buckets,
    missing hours forward-filled with the last observation
    (last(ignorenulls) over the grid order). The grid explode is
    |users|·span rows but never wider than the final result; the fill
    is one window over the same partitioning as the join."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    b = ev.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(F.round(F.sum("value"), 2).alias("v"))
    spans = b.groupBy("user_id").agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
    grid = spans.select(
        "user_id",
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("h"),
    )
    joined = grid.join(b, ["user_id", "h"], "left_outer")
    w = W.partitionBy("user_id").orderBy("h").rowsBetween(W.unboundedPreceding, W.currentRow)
    return joined.select(
        "user_id",
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        F.coalesce(F.col("v"), F.last("v", ignorenulls=True).over(w)).alias("value_ffill"),
        F.col("v").isNull().alias("was_gap"),
    )


@_q(
    "events_funnel",
    """
WITH steps AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
         min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events GROUP BY user_id
)
SELECT count(*) AS n_users,
       count(t_view) AS step_view,
       count(CASE WHEN t_click > t_view THEN 1 END) AS step_click,
       count(CASE WHEN t_purchase > t_click AND t_click > t_view THEN 1 END) AS step_purchase
FROM steps
""",
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (view → click → purchase, strictly
    in sequence by FIRST occurrence): the sequential-pattern workload,
    computed as conditional-min aggregates + ordering comparisons —
    one shuffle on user_id, no self-joins, no pattern-automaton state."""
    ev = _t(spark, sf_dir, "events")
    first_of = lambda t: F.min(F.when(F.col("event_type") == t, F.col("ts")))
    steps = ev.groupBy("user_id").agg(
        first_of("view").alias("t_view"),
        first_of("click").alias("t_click"),
        first_of("purchase").alias("t_purchase"),
    )
    return steps.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("t_view").alias("step_view"),
        F.count(F.when(F.col("t_click") > F.col("t_view"), 1)).alias("step_click"),
        F.count(
            F.when((F.col("t_purchase") > F.col("t_click")) & (F.col("t_click") > F.col("t_view")), 1)
        ).alias("step_purchase"),
    )


@_q(
    "events_cohort_retention",
    """
WITH firsts AS (
  SELECT user_id, min(date_trunc('day', ts)) AS cohort_day FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT e.user_id, f.cohort_day,
         datediff('day', f.cohort_day, date_trunc('day', e.ts)) AS day_offset
  FROM events e JOIN firsts f ON e.user_id = f.user_id
)
SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort,
       CAST(day_offset AS BIGINT) AS day_offset,
       count(*) AS active_users
FROM activity
WHERE day_offset <= 7
GROUP BY cohort_day, day_offset
""",
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen day, distinct
    activity counted per day offset for the first week. The firsts
    aggregate and the activity join share the user_id partitioning
    (one exchange reused); DISTINCT dedups (user, offset) before the
    small final group-by."""
    ev = _t(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts"))
    firsts = ev.groupBy("user_id").agg(F.min(day).alias("cohort_day"))
    activity = (
        ev.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff(day, F.col("cohort_day")).alias("day_offset"),
        )
        .distinct()
    )
    return (
        activity.filter(F.col("day_offset") <= 7)
        .groupBy(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort"),
            F.col("day_offset").cast("bigint").alias("day_offset"),
        )
        .agg(F.count(F.lit(1)).alias("active_users"))
    )


@_q(
    "events_markov_transitions",
    """
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
  FROM events
), pairs AS (
  SELECT event_type AS from_type, next_type AS to_type, CAST(count(*) AS BIGINT) AS n
  FROM seq WHERE next_type IS NOT NULL
  GROUP BY event_type, next_type
), tot AS (
  SELECT from_type, sum(n) AS row_total FROM pairs GROUP BY from_type
)
SELECT p.from_type, p.to_type, p.n,
       round(p.n / t.row_total, 4) AS p_transition
FROM pairs p JOIN tot t USING (from_type)
""",
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences — the behavioural-modelling primitive under churn
    prediction, next-action recommendation, and anomaly scoring
    (improbable transition chains). One window pass builds the
    (state, next-state) pair stream (lead over the per-user ordering,
    ties broken by event_id so pairing is engine-exact), then two
    integer aggregates; the row-normalized probability divides two
    exact integers once at output, so the only float op is shared and
    identical across engines. Scales as one shuffle on user_id plus
    one on the (25-ish)-cell state-pair key."""
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    pairs = (
        seq.select(F.col("event_type").alias("from_type"), F.col("next_type").alias("to_type"))
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    tot = pairs.groupBy("from_type").agg(F.sum("n").alias("row_total"))
    return pairs.join(tot, "from_type").select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n") / F.col("row_total"), 4).alias("p_transition"),
    )


@_q(
    "events_json_props",
    """
SELECT event_type,
       count(*) AS n,
       round(avg(CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS BIGINT)), 2) AS avg_k
FROM events
GROUP BY event_type
""",
)
def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured prop extraction (S4's JSON flattening applied to
    a payload column): regexp path keeps it engine-portable; the engine
    also exposes get_json_object/from_json for real JSON."""
    ev = _t(spark, sf_dir, "events")
    k = F.regexp_extract(F.col("props"), r'"k":\s*(\d+)', 1).cast("bigint")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg(k), 2).alias("avg_k"),
    )


@_q(
    "events_json_variant",
    """
SELECT event_type,
       CAST(count(CASE WHEN json_extract(props, '$.k') IS NOT NULL THEN 1 END) AS BIGINT) AS n_with_k,
       CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
       CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
FROM events
GROUP BY event_type
""",
)
def events_json_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props through Spark 4's VARIANT type —
    parse_json once into the binary-encoded open type, then typed
    path extraction with try_variant_get. At 100 TB this is the
    modern plan for ragged payloads: VARIANT parses the JSON text
    ONCE at ingest into a shreddable binary encoding, and every
    downstream path access is a cheap binary probe instead of a
    per-query string parse (get_json_object re-parses the full text
    per call; three extractions = three parses). Aggregates are
    integer-exact so the differential is ulp-free; DuckDB replays via
    its native JSON extraction."""
    ev = _t(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json("props"), "$.k", "bigint")
    return ev.select("event_type", k.alias("k")).groupBy("event_type").agg(
        F.count("k").cast("bigint").alias("n_with_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
        F.sum("k").alias("sum_k"),
    )


@_q(
    "events_asof_join",
    """
WITH l AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'),
     r AS (SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase')
SELECT l.user_id,
       strftime(l.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
       l.event_id AS click_id,
       r.event_id AS purchase_id,
       round(r.value, 2) AS purchase_value
FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
""",
)
def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (engine-native; Spark has no ASOF JOIN): for each
    click, the user's latest purchase at-or-before it. Implemented via
    operators/asof.py's union+ordered-window technique — one shuffle of
    |L|+|R| on user_id, no range-join pair explosion. The oracle is
    DuckDB's native ASOF LEFT JOIN."""
    return _asof_clicks_report(_t(spark, sf_dir, "events"))


def _asof_clicks_report(ev: DataFrame) -> DataFrame:
    """The as-of plan on a caller-provided events frame — shared by the
    catalog entry and bench.py's replicated marginal-floor probe (one
    code path, no hand-copied twin)."""
    from graphql_api_etl_spark.operators.asof import asof_join

    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    joined = asof_join(clicks, purchases, on="ts", by="user_id", right_cols=["event_id", "value"])
    return joined.select(
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        F.col("event_id").alias("click_id"),
        F.col("event_id_right").alias("purchase_id"),
        F.round("value_right", 2).alias("purchase_value"),
    )


@_q(
    "a_percentiles",
    """
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.5), 2) AS p50,
       round(quantile_cont(l_extendedprice, 0.9), 2) AS p90,
       round(quantile_cont(l_extendedprice, 0.99), 2) AS p99
FROM lineitem GROUP BY l_returnflag
""",
)
def a_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (engine-native;
    ``percentile`` is sort-based within groups — for sketch-sized
    state at scale, swap in approx_percentile at a declared error
    bound, which this exact form is the oracle for)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 2).alias("p50"),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 2).alias("p90"),
        F.round(F.expr("percentile(l_extendedprice, 0.99)"), 2).alias("p99"),
    )


@_q(
    "a_approx_count_distinct",
    """
SELECT o_orderpriority,
       count(DISTINCT o_custkey) AS exact_custkeys,
       count(*) AS n_orders,
       CAST(1 AS BIGINT) AS approx_ok
FROM orders GROUP BY o_orderpriority
""",
)
def a_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct counts per group (rsd 2%): the 100 TB
    form of ``tpch_q16``'s exact count-distinct — sketch state is
    O(kB) per group and merges associatively across partitions, vs the
    exact form's shuffle of every distinct value.

    HLL estimates are engine-specific, so the oracle-checked output is
    engine-independent: the exact count (both engines compute it) plus
    ``approx_ok`` — whether the sketch landed within 5× its declared
    rsd of the exact value (the estimator's 3σ is ~3×rsd; 5× leaves
    slack for small-group bias). The oracle asserts the same columns
    with ``approx_ok`` literally true, so a drifting sketch breaks the
    hash match. Tighter per-group error stats live in
    tests/test_operators.py."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("exact_custkeys"),
        F.count(F.lit(1)).alias("n_orders"),
        (
            F.abs(
                F.approx_count_distinct("o_custkey", rsd=0.02)
                - F.countDistinct("o_custkey")
            )
            <= F.greatest(F.countDistinct("o_custkey") * 0.10, F.lit(5.0))
        )
        .cast("bigint")
        .alias("approx_ok"),
    )


@_q(
    "a_approx_percentiles",
    """
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.5), 2) AS p50,
       round(quantile_cont(l_extendedprice, 0.9), 2) AS p90,
       round(quantile_cont(l_extendedprice, 0.99), 2) AS p99,
       CAST(1 AS BIGINT) AS ap50_ok,
       CAST(1 AS BIGINT) AS ap90_ok,
       CAST(1 AS BIGINT) AS ap99_ok
FROM lineitem GROUP BY l_returnflag
""",
)
def a_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile per group (accuracy 10000): the sketch-sized
    companion to ``a_percentiles`` — per-group state is a bounded
    histogram instead of the exact form's full sort, so groups of any
    cardinality aggregate in one pass.

    Sketch split points are engine-specific, so the oracle-checked
    output is engine-independent: the exact interpolated percentiles
    (both engines) plus ``apXX_ok`` — whether each approx value lies
    between the exact percentiles at p±0.01. approx_percentile's
    guarantee is rank error ≤ n/accuracy = 0.01% of rows, so the ±1pp
    window is a 100× margin; the oracle pins the booleans to 1, making
    an out-of-band sketch a hash mismatch."""
    li = _t(spark, sf_dir, "lineitem")
    probes = "array(0.49, 0.5, 0.51, 0.89, 0.9, 0.91, 0.98, 0.99, 1.0)"
    agg = li.groupBy("l_returnflag").agg(
        F.expr(f"percentile(l_extendedprice, {probes})").alias("ex"),
        F.expr("approx_percentile(l_extendedprice, array(0.5, 0.9, 0.99), 10000)").alias("ap"),
    )
    ok = lambda lo, ap, hi: (  # noqa: E731
        (F.col("ex")[lo] <= F.col("ap")[ap]) & (F.col("ap")[ap] <= F.col("ex")[hi])
    ).cast("bigint")
    return agg.select(
        "l_returnflag",
        F.round(F.col("ex")[1], 2).alias("p50"),
        F.round(F.col("ex")[4], 2).alias("p90"),
        F.round(F.col("ex")[7], 2).alias("p99"),
        ok(0, 0, 2).alias("ap50_ok"),
        ok(3, 1, 5).alias("ap90_ok"),
        ok(6, 2, 8).alias("ap99_ok"),
    )


@_q(
    "a_pivot_status_priority",
    """
SELECT o_orderpriority,
       count(*) FILTER (WHERE o_orderstatus = 'F') AS status_f,
       count(*) FILTER (WHERE o_orderstatus = 'O') AS status_o,
       count(*) FILTER (WHERE o_orderstatus = 'P') AS status_p
FROM orders GROUP BY o_orderpriority
""",
)
def a_pivot_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (engine-native): one pass, conditional-count columns per
    pivot value. Explicit value list keeps it single-stage (Spark's
    value-discovering pivot adds a distinct pre-pass)."""
    o = _t(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return piv.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).alias("status_f"),
        F.coalesce(F.col("O"), F.lit(0)).alias("status_o"),
        F.coalesce(F.col("P"), F.lit(0)).alias("status_p"),
    )


@_q(
    "events_json_typed",
    """
SELECT event_type,
       count(*) AS n,
       round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 2) AS avg_k,
       count(DISTINCT json_extract_string(props, '$.tag')) AS n_tags
FROM events GROUP BY event_type
""",
)
def events_json_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON path extraction (S4's flattening applied to a payload
    column): ``from_json`` with a declared schema — parsed once, both
    fields from the same parse, columnar downstream."""
    from pyspark.sql import types as T

    ev = _t(spark, sf_dir, "events")
    schema = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("tag", T.StringType())]
    )
    parsed = ev.withColumn("p", F.from_json("props", schema))
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg(F.col("p.k")), 2).alias("avg_k"),
        F.countDistinct(F.col("p.tag")).alias("n_tags"),
    )


# LLM-data-pipeline catalog entries register themselves into QUERIES on
# import (bottom import avoids the circular _q dependency).
from graphql_api_etl_spark import queries_llm  # noqa: E402,F401


@_q(
    "events_latest_per_user",
    """
WITH ranked AS (
  SELECT user_id, event_id, event_type, value, ts,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT user_id, event_id, event_type, round(value, 2) AS value,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS latest_ts
FROM ranked WHERE rn = 1
""",
)
def events_latest_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-style keep-latest-per-key compaction: each user's most
    recent event ((ts, event_id) DESC tie-break) — the dedup that
    turns an append-only change stream into current state. One
    shuffle on the key; the window's rank=1 filter is applied
    streaming within each sorted partition, and at 100 TB this is the
    same plan a MERGE-on-read compaction job runs. Reference parity:
    drop_duplicates-keep-latest (ETL:781) with explicit ordering."""
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id", "event_id", "event_type",
            F.round("value", 2).alias("value"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("latest_ts"),
        )
    )


@_q(
    "source_text_lines",
    """
SELECT doc_id, md5(text) AS text_md5
FROM documents
""",
)
def source_text_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain-text line source (spark.read.text) — raw corpora arrive
    as one-record-per-line text files. The documents table is written
    once as TSV-ish lines (doc_id<TAB>text; the corpus is single-line
    so the framing is lossless), read back as raw lines, and re-parsed
    with native substring ops. Hash-matching the text against the
    parquet oracle proves the line framing round-trips byte-exactly.
    Newline-splittable → parallel scan at 100 TB."""
    path, cached = _layout_cache_path(sf_dir, "documents_txt", ["documents"])
    docs = _t(spark, sf_dir, "documents")
    if not cached:
        _publish_layout(
            lambda tmp: docs.select(
                F.concat_ws("\t", F.col("doc_id").cast("string"), F.col("text"))
            ).write.mode("overwrite").text(tmp),
            path,
        )
    lines = spark.read.text(path)
    tab = F.instr(F.col("value"), "\t")
    return lines.select(
        F.substring(F.col("value"), 1, tab - 1).cast("bigint").alias("doc_id"),
        F.md5(F.expr("substring(value, instr(value, '\t') + 1)")).alias("text_md5"),
    )


@_q(
    "sink_merge_upsert",
    """
WITH t AS (SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders),
upd AS (SELECT o_orderkey, o_totalprice + 1000.0 AS o_totalprice, o_orderpriority
        FROM orders WHERE o_orderkey % 97 = 0),
ins AS (SELECT o_orderkey + 10000000 AS o_orderkey, o_totalprice, o_orderpriority
        FROM orders WHERE o_orderkey % 997 = 0),
del AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 499 = 0),
chg_keys AS (
  SELECT o_orderkey FROM upd
  UNION SELECT o_orderkey FROM ins
  UNION SELECT o_orderkey FROM del
),
merged AS (
  SELECT * FROM t WHERE o_orderkey NOT IN (SELECT o_orderkey FROM chg_keys)
  UNION ALL
  SELECT * FROM upd WHERE o_orderkey NOT IN (SELECT o_orderkey FROM del)
  UNION ALL
  SELECT * FROM ins
)
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_rows,
       round(sum(o_totalprice), 2) AS total_price
FROM merged GROUP BY o_orderpriority
""",
)
def sink_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics on plain parquet (sinks/merge.merge_frames):
    a deterministic changeset — updates (+1000.00 on keys ≡ 0 mod 97;
    tie-free arithmetic, since scaling 2-decimal prices creates .xx5
    rounding boundaries where Spark's decimal HALF_UP and DuckDB's
    double rounding disagree), inserts (key-shifted copies, mod 997)
    and deletes (mod 499,
    delete-wins on collision) — applied as one left-anti + union plan
    where the change side broadcasts, so the target scan never
    shuffles. The differential aggregates the MERGED state per
    priority, so a row lost, duplicated, or mis-updated anywhere
    breaks the match. The file-level atomic-swap variant
    (merge_upsert) is pytest-covered."""
    from graphql_api_etl_spark.sinks.merge import merge_frames

    o = _t(spark, sf_dir, "orders")
    t = o.select("o_orderkey", "o_totalprice", "o_orderpriority")
    upd = (
        o.filter(F.col("o_orderkey") % 97 == 0)
        .select(
            "o_orderkey",
            (F.col("o_totalprice") + 1000.0).alias("o_totalprice"),
            "o_orderpriority",
        )
        .withColumn("op", F.lit("U"))
    )
    ins = (
        o.filter(F.col("o_orderkey") % 997 == 0)
        .select(
            (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
            "o_totalprice",
            "o_orderpriority",
        )
        .withColumn("op", F.lit("I"))
    )
    dele = (
        o.filter(F.col("o_orderkey") % 499 == 0)
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
        .withColumn("op", F.lit("D"))
    )
    merged = merge_frames(t, upd.unionByName(ins).unionByName(dele), ["o_orderkey"])
    return merged.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )


@_q(
    "sink_scd2_history",
    """
WITH ordered AS (
  SELECT user_id, event_type, ts, event_id,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
), flagged AS (
  SELECT user_id, event_type, ts,
         CASE WHEN prev_type IS NULL OR prev_type != event_type THEN 1 ELSE 0 END AS chg,
         event_id
  FROM ordered
), runs AS (
  SELECT user_id, event_type, ts,
         sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
  FROM flagged
), intervals AS (
  SELECT user_id, event_type, run_id,
         min(ts) AS valid_from, CAST(count(*) AS BIGINT) AS n_events
  FROM runs GROUP BY user_id, event_type, run_id
)
SELECT user_id, event_type, valid_from,
       lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from) AS valid_to,
       n_events,
       lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from) IS NULL AS is_current
FROM intervals
""",
)
def sink_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension Type-2 history build: per key,
    consecutive runs of an attribute value collapse into validity
    intervals [valid_from, valid_to) with the open interval flagged
    current — the standard warehouse dimension-versioning sink,
    derived here from the event stream (user_id's event_type as the
    tracked attribute). Three window passes over ONE partitioning
    (user_id, ordered by ts/event_id — change flags, run ids, then
    interval chaining via lead), so the whole build is a single
    shuffle on the key plus per-partition sorts; at scale that is the
    minimum for any order-dependent history reconstruction. Ties at
    equal ts break on event_id in both engines, making run boundaries
    engine-exact."""
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    w_ord = W.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.withColumn(
        "chg",
        F.when(
            F.lag("event_type").over(w_ord).isNull()
            | (F.lag("event_type").over(w_ord) != F.col("event_type")),
            1,
        ).otherwise(0),
    )
    runs = flagged.withColumn(
        "run_id", F.sum("chg").over(w_ord.rowsBetween(W.unboundedPreceding, W.currentRow))
    )
    intervals = runs.groupBy("user_id", "event_type", "run_id").agg(
        F.min("ts").alias("valid_from"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )
    w_iv = W.partitionBy("user_id").orderBy("valid_from")
    return intervals.select(
        "user_id",
        "event_type",
        "valid_from",
        F.lead("valid_from").over(w_iv).alias("valid_to"),
        "n_events",
        F.lead("valid_from").over(w_iv).isNull().alias("is_current"),
    )


@_q(
    "x_datetime_functions",
    """
SELECT o_orderkey,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
       CAST(extract(year FROM o_orderdate) AS BIGINT) AS order_year,
       CAST(extract(quarter FROM o_orderdate) AS BIGINT) AS order_quarter,
       CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow_sun1,
       strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d %H:%M:%S') AS plus_3_months,
       CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS BIGINT) AS days_since_95,
       strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end
FROM orders WHERE o_orderkey % 32 = 0
""",
)
def x_datetime_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime function breadth (X-family extension; the reference's
    only temporal op is the weekly date arithmetic in ETL:186-204):
    truncation, field extraction, interval arithmetic, day diffs and
    month-end — all native Catalyst expressions, map-only, with
    cross-engine convention bridges spelled out in the oracle (DuckDB
    dayofweek is 0=Sunday vs Spark's 1=Sunday; dates formatted as
    strings so DATE vs TIMESTAMP renderings can't drift)."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 32 == 0)
    return o.select(
        "o_orderkey",
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_start"),
        F.year("o_orderdate").cast("bigint").alias("order_year"),
        F.quarter("o_orderdate").cast("bigint").alias("order_quarter"),
        F.dayofweek("o_orderdate").cast("bigint").alias("dow_sun1"),
        F.date_format(F.col("o_orderdate") + F.expr("INTERVAL 3 MONTH"), "yyyy-MM-dd HH:mm:ss").alias("plus_3_months"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")).cast("bigint").alias("days_since_95"),
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
    )


@_q(
    "curate_dataset_card",
    """
WITH toks AS (SELECT doc_id, lang, source, text,
                     len(string_split_regex(trim(text), '\\s+')) AS n_tok
              FROM documents),
lang_counts AS (SELECT lang, count(*) AS c FROM documents GROUP BY lang)
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS total_tokens,
       CAST((SELECT count(*) FROM lang_counts) AS BIGINT) AS n_langs,
       (SELECT lang FROM lang_counts ORDER BY c DESC, lang LIMIT 1) AS top_lang,
       CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
       round(avg(length(text)), 2) AS mean_chars
FROM toks
""",
)
def curate_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-card summary: the one-row corpus profile (doc/token
    totals, language spread and winner, source count, mean length)
    every released training set ships with. One partial-aggregated
    pass plus a tiny language rollup — at 100 TB the expensive part is
    the token count, which rides the same scan as every other per-doc
    stat."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.withColumn("n_tok", F.size(F.split(F.trim("text"), r"\s+")))
    lang_counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("c"))
    top = (
        lang_counts.orderBy(F.col("c").desc(), F.col("lang"))
        .limit(1)
        .select(F.col("lang").alias("top_lang"))
    )
    n_langs = lang_counts.agg(F.count(F.lit(1)).cast("bigint").alias("n_langs"))
    card = toks.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("total_tokens"),
        F.count_distinct("source").cast("bigint").alias("n_sources"),
        F.round(F.avg(F.length("text")), 2).alias("mean_chars"),
    )
    return (
        card.crossJoin(F.broadcast(n_langs))
        .crossJoin(F.broadcast(top))
        .select("n_docs", "total_tokens", "n_langs", "top_lang", "n_sources", "mean_chars")
    )


@_q(
    "x_math_functions",
    """
SELECT l_orderkey, l_linenumber,
       round(abs(l_discount - 0.05), 4) AS abs_dev,
       CAST(sign(l_discount - 0.05) AS BIGINT) AS dev_sign,
       CAST(ceil(l_quantity / 7.0) AS BIGINT) AS qty_ceil7,
       CAST(floor(l_extendedprice / 1000.0) AS BIGINT) AS price_k_floor,
       round(power(1.0 + l_discount, 3), 6) AS compound3,
       round(log10(l_extendedprice), 6) AS price_log10,
       round(sqrt(l_quantity), 6) AS qty_sqrt,
       CAST(CAST(l_orderkey AS BIGINT) % 7 AS BIGINT) AS key_mod7,
       round(greatest(l_tax, l_discount), 2) AS max_rate,
       round(least(l_tax, l_discount), 2) AS min_rate
FROM lineitem WHERE l_orderkey % 64 = 0
""",
)
def x_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric scalar-function breadth (§2.8 extension; the reference's
    only numeric op is the percentage division of ETL:1044):
    abs/sign/ceil/floor/power/log10/sqrt/mod/greatest/least as native
    Catalyst expressions — map-only, pushdown intact, transcendentals
    rounded to 6 so 1-ulp libm differences can't split the hash."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 64 == 0)
    d = F.col("l_discount")
    return li.select(
        "l_orderkey", "l_linenumber",
        F.round(F.abs(d - 0.05), 4).alias("abs_dev"),
        F.signum(d - 0.05).cast("bigint").alias("dev_sign"),
        F.ceil(F.col("l_quantity") / 7.0).cast("bigint").alias("qty_ceil7"),
        F.floor(F.col("l_extendedprice") / 1000.0).cast("bigint").alias("price_k_floor"),
        F.round(F.pow(F.lit(1.0) + d, 3), 6).alias("compound3"),
        F.round(F.log10("l_extendedprice"), 6).alias("price_log10"),
        F.round(F.sqrt("l_quantity"), 6).alias("qty_sqrt"),
        (F.col("l_orderkey") % 7).cast("bigint").alias("key_mod7"),
        F.round(F.greatest("l_tax", "l_discount"), 2).alias("max_rate"),
        F.round(F.least("l_tax", "l_discount"), 2).alias("min_rate"),
    )


@_q(
    "x_null_semantics",
    """
WITH s AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 5 = 0 THEN NULL ELSE c_acctbal END AS bal,
         CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_mktsegment END AS seg
  FROM customer
)
SELECT c_custkey,
       round(coalesce(bal, 0.0), 2) AS bal_or_zero,
       nullif(seg, 'BUILDING') AS seg_not_building,
       CASE WHEN bal IS NOT NULL THEN 'has_bal' ELSE 'no_bal' END AS nvl2_tag,
       (bal IS NOT DISTINCT FROM NULL) AS bal_null_safe_eq_null,
       (seg IS DISTINCT FROM 'MACHINERY') AS seg_differs_machinery,
       CAST(count(bal) OVER () AS BIGINT) AS n_nonnull_bal,
       CAST(count(*) OVER () AS BIGINT) AS n_rows
FROM s
""",
)
def x_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-handling semantics (§2.8 extension; the reference leans on
    pandas NaN coercion, e.g. the fillna at ETL:756): coalesce, nullif,
    nvl2-style tagging, null-safe (dis)equality (Spark's <=> ≡ SQL
    IS NOT DISTINCT FROM), and the count(col)-skips-nulls contract —
    the exact places engines historically diverge. Map-only plus one
    1-row aggregate broadcast back for the table-wide counts — the
    events_asof_tolerance pattern; the former count().over(window
    with no PARTITION BY) funneled the whole table through a single
    task, the one plan shape that cannot survive a 100x scale-up
    (VERDICT r9)."""
    c = _t(spark, sf_dir, "customer")
    s = c.select(
        "c_custkey",
        F.when(F.col("c_custkey") % 5 == 0, None).otherwise(F.col("c_acctbal")).alias("bal"),
        F.when(F.col("c_custkey") % 7 == 0, None).otherwise(F.col("c_mktsegment")).alias("seg"),
    )
    totals = s.agg(
        F.count("bal").cast("bigint").alias("n_nonnull_bal"),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
    )
    return s.crossJoin(F.broadcast(totals)).select(
        "c_custkey",
        F.round(F.coalesce(F.col("bal"), F.lit(0.0)), 2).alias("bal_or_zero"),
        F.nullif(F.col("seg"), F.lit("BUILDING")).alias("seg_not_building"),
        F.when(F.col("bal").isNotNull(), F.lit("has_bal")).otherwise(F.lit("no_bal")).alias("nvl2_tag"),
        F.col("bal").eqNullSafe(F.lit(None).cast("double")).alias("bal_null_safe_eq_null"),
        (~F.col("seg").eqNullSafe(F.lit("MACHINERY"))).alias("seg_differs_machinery"),
        "n_nonnull_bal",
        "n_rows",
    )


@_q(
    "events_anomaly_zscore",
    """
WITH w AS (
  SELECT event_id, event_type, ts, value,
         avg(value) OVER win AS mu,
         stddev_samp(value) OVER win AS sigma,
         count(*) OVER win AS n_window
  FROM events
  WINDOW win AS (PARTITION BY event_type ORDER BY ts, event_id
                 ROWS BETWEEN 50 PRECEDING AND 1 PRECEDING)
)
SELECT event_id, event_type,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
       round(value, 2) AS value,
       CAST(n_window AS BIGINT) AS n_window,
       CASE WHEN n_window >= 10 AND sigma > 0
            THEN abs(value - mu) > 3.0 * sigma ELSE FALSE END AS is_anomaly
FROM w
""",
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection: each event judged against
    the mean/stddev of its type's 50 PRECEDING events (the trailing
    frame excludes the current row — no self-contamination), flagged
    at |z| > 3 once the window has ≥10 samples. A bounded-frame
    running aggregate: ONE shuffle on event_type, then a single sorted
    pass with an O(1)-per-row sliding frame — the batch shape of a
    streaming anomaly monitor at any scale. The boolean is computed
    from the same doubles on both engines (comparison, not rounding,
    so a >3σ outlier is orders of magnitude away from float noise);
    mu/sigma stay internal to dodge summation-order hash drift."""
    ev = _t(spark, sf_dir, "events")
    win = (
        W.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-50, -1)
    )
    mu = F.avg("value").over(win)
    sigma = F.stddev_samp("value").over(win)
    n_w = F.count(F.lit(1)).over(win)
    return ev.select(
        "event_id",
        "event_type",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        F.round("value", 2).alias("value"),
        n_w.cast("bigint").alias("n_window"),
        F.when(
            (n_w >= 10) & (sigma > 0), F.abs(F.col("value") - mu) > 3.0 * sigma
        ).otherwise(F.lit(False)).alias("is_anomaly"),
    )


@_q(
    "so_union_schema_evolution",
    """
SELECT o_orderkey AS id, o_orderpriority AS priority,
       round(o_totalprice, 2) AS price, NULL AS segment
FROM orders WHERE o_orderkey % 128 = 0
UNION ALL BY NAME
SELECT c_custkey + 100000000 AS id, NULL AS priority,
       NULL AS price, c_mktsegment AS segment
FROM customer WHERE c_custkey % 16 = 0
""",
)
def so_union_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union: two sources with partially overlapping
    columns combined by NAME with missing columns null-filled
    (unionByName(allowMissingColumns=True) ≡ DuckDB's UNION ALL BY
    NAME) — the append path when a feed adds or drops columns
    mid-stream. Position-based UNION would silently misalign here;
    name-based alignment is the schema-drift-safe contract. Map-only,
    both scans pushed and pruned."""
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 128 == 0)
        .select(
            F.col("o_orderkey").alias("id"),
            F.col("o_orderpriority").alias("priority"),
            F.round("o_totalprice", 2).alias("price"),
        )
    )
    c = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 16 == 0)
        .select(
            (F.col("c_custkey") + 100_000_000).alias("id"),
            F.col("c_mktsegment").alias("segment"),
        )
    )
    return o.unionByName(c, allowMissingColumns=True).select(
        "id", "priority", "price", "segment"
    )


@_q(
    "source_schema_merge_read",
    """
SELECT doc_id,
       lang,
       CASE WHEN doc_id % 2 = 1 THEN CAST(n_chars AS BIGINT) END AS n_chars,
       CAST(doc_id % 2 AS BIGINT) AS batch
FROM documents
""",
)
def source_schema_merge_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution at the SOURCE: two parquet batches written at
    different pipeline generations — batch 0 (doc_id, lang), batch 1
    adds an n_chars column — read as one table with
    ``mergeSchema=true``; rows from the old batch surface NULL for the
    new column. This is the data-lake reality of long-lived feeds
    (columns appear mid-stream); footer-level schema union costs one
    metadata pass, the data scan stays columnar and partition-pruned
    on the batch directory key."""
    import os as _os

    path, cached = _layout_cache_path(sf_dir, "documents_evolved", ["documents"])
    docs = _t(spark, sf_dir, "documents")
    if not cached:

        def _build(tmp: str) -> None:
            docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "lang").write.parquet(
                f"{tmp}/batch=0"
            )
            docs.filter(F.col("doc_id") % 2 == 1).select(
                "doc_id", "lang", "n_chars"
            ).write.parquet(f"{tmp}/batch=1")
            open(_os.path.join(tmp, "_SUCCESS"), "w").close()

        _publish_layout(_build, path)
    m = spark.read.option("mergeSchema", "true").parquet(path)
    return m.select(
        "doc_id", "lang",
        F.col("n_chars").cast("bigint").alias("n_chars"),
        F.col("batch").cast("bigint").alias("batch"),
    )


@_q(
    "x_array_functions",
    r"""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents
),
a AS (
  SELECT doc_id,
         toks[1:5] AS head5,
         list_sort(list_distinct(toks[1:10])) AS head10_distinct
  FROM t
)
SELECT doc_id,
       array_to_string(head5, '|') AS head5_str,
       CAST(len(head10_distinct) AS BIGINT) AS n_distinct10,
       array_to_string(list_sort(list_intersect(head5, head10_distinct)), '|') AS inter_str,
       coalesce(array_to_string(list_sort(list_filter(head5, x -> x >= 'm')), '|'), '') AS late_alpha,
       array_to_string(list_transform(head5, x -> upper(x)), '|') AS head5_upper,
       array_to_string(flatten([head5, ['<END>']]), '|') AS head5_terminated
FROM a
""",
)
def x_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function breadth (§2.8 extension): slice, distinct, sort,
    intersect, filter, transform, flatten/concat — the collection
    algebra behind every shingle/token pipeline, as native Catalyst
    array expressions (map-only). Results are serialized with
    array_to_string so element ORDER is part of the hash: sort
    stability and slice bounds must agree across engines, not just
    set membership. DuckDB twins: list_* functions with 1-based
    inclusive slices ≡ Spark's slice(col, 1, n)."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.split(F.trim("text"), r"\s+")
    a = docs.select(
        "doc_id",
        F.slice(toks, 1, 5).alias("head5"),
        F.array_sort(F.array_distinct(F.slice(toks, 1, 10))).alias("head10_distinct"),
    )
    return a.select(
        "doc_id",
        F.array_join("head5", "|").alias("head5_str"),
        F.size("head10_distinct").cast("bigint").alias("n_distinct10"),
        F.array_join(
            # intersect ORDER is engine-specific (Spark keeps the left
            # array's order, DuckDB's is unspecified) -> sort both sides
            F.array_sort(F.array_intersect("head5", "head10_distinct")), "|"
        ).alias("inter_str"),
        F.array_join(
            F.array_sort(F.filter("head5", lambda x: x >= F.lit("m"))), "|"
        ).alias("late_alpha"),
        F.array_join(F.transform("head5", lambda x: F.upper(x)), "|").alias("head5_upper"),
        F.array_join(
            F.flatten(F.array(F.col("head5"), F.array(F.lit("<END>")))), "|"
        ).alias("head5_terminated"),
    )


@_q(
    "a_corr_covar",
    """
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n,
       round(corr(l_quantity, l_extendedprice), 4) AS qty_price_corr,
       round(covar_samp(l_quantity, l_discount), 6) AS qty_disc_covar,
       round(stddev_samp(l_quantity), 4) AS qty_std,
       round(var_samp(l_discount), 6) AS disc_var
FROM lineitem GROUP BY l_returnflag
""",
)
def a_corr_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical-aggregate breadth: correlation, sample covariance,
    stddev and variance per group — the profiling moments a feature
    store computes per slice. All are single-pass partial-aggregable
    (sum/sum²/sum-of-products accumulators), so the shuffle carries a
    handful of doubles per group at any scale. Rounded at 4-6 decimals
    (both engines accumulate in double; summation order differs only
    below that)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("qty_price_corr"),
        F.round(F.covar_samp("l_quantity", "l_discount"), 6).alias("qty_disc_covar"),
        F.round(F.stddev_samp("l_quantity"), 4).alias("qty_std"),
        F.round(F.var_samp("l_discount"), 6).alias("disc_var"),
    )


@_q(
    "x_regex_functions",
    r"""
SELECT p_partkey,
       regexp_extract(p_name, '^([a-z]+) ', 1) AS first_word,
       CAST(len(regexp_extract_all(p_name, '[aeiou]+')) AS BIGINT) AS n_vowel_runs,
       regexp_replace(p_name, '^([a-z]+) ([a-z]+)', '\2 \1') AS swapped_words,
       regexp_matches(p_name, '(red|green|blue)') AS has_color,
       regexp_extract(p_type, '([A-Z]+)$', 1) AS type_last_caps
FROM part WHERE p_partkey % 16 = 0
""",
)
def x_regex_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex-function breadth: group extraction, match-all counting,
    backreference replacement, boolean matching — with the
    dialect bridges spelled out: group refs in the REPLACEMENT are
    $1 in Java vs \\1 in RE2/DuckDB, and RE2 supports NO backrefs in
    the PATTERN at all (a ([a-z])\\1 pattern silently never matches on
    DuckDB — caught by the differential), so patterns here stay
    backref- and lookahead-free, the same discipline as the PII
    scrubber."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_partkey") % 16 == 0)
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", r"^([a-z]+) ", 1).alias("first_word"),
        F.size(F.regexp_extract_all("p_name", F.lit(r"[aeiou]+"), 0)).cast("bigint").alias("n_vowel_runs"),
        F.regexp_replace("p_name", r"^([a-z]+) ([a-z]+)", r"$2 $1").alias("swapped_words"),
        F.col("p_name").rlike(r"(red|green|blue)").alias("has_color"),
        F.regexp_extract("p_type", r"([A-Z]+)$", 1).alias("type_last_caps"),
    )


@_q(
    "a_filtered_agg",
    """
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(count(*) FILTER (WHERE o_totalprice > 150000) AS BIGINT) AS n_big,
       round(coalesce(sum(o_totalprice) FILTER (WHERE o_totalprice > 150000), 0), 2) AS big_revenue,
       round(avg(o_totalprice) FILTER (WHERE o_orderstatus = 'O'), 2) AS avg_open_price,
       round(coalesce(max(o_totalprice) FILTER (WHERE o_orderstatus = 'F'), 0), 2) AS max_closed_price
FROM orders GROUP BY o_orderpriority
""",
)
def a_filtered_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional / filtered aggregation breadth (§2.6 extension):
    the SQL ``FILTER (WHERE ...)`` clause as Spark ``count_if`` +
    ``agg(when(...))`` (null-skipping aggregates make the two forms
    equivalent). One hash aggregate, every conditional branch
    partial-aggregable map-side — the shuffle carries 5 accumulators
    per group regardless of scale, same profile as a plain GROUP BY."""
    o = _t(spark, sf_dir, "orders")
    big = F.col("o_totalprice") > 150000
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.count_if(big).cast("bigint").alias("n_big"),
        F.round(F.coalesce(F.sum(F.when(big, F.col("o_totalprice"))), F.lit(0)), 2).alias("big_revenue"),
        F.round(F.avg(F.when(F.col("o_orderstatus") == "O", F.col("o_totalprice"))), 2).alias("avg_open_price"),
        F.round(
            F.coalesce(F.max(F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice"))), F.lit(0)), 2
        ).alias("max_closed_price"),
    )


@_q(
    "x_map_functions",
    """
SELECT p_partkey,
       'brand|name|type' AS keys_str,
       p_type AS type_val,
       coalesce(array_to_string(list_sort(list_concat(
         CASE WHEN len(p_brand) > 8 THEN ['brand=' || p_brand] ELSE CAST([] AS VARCHAR[]) END,
         list_concat(
           CASE WHEN len(p_name) > 8 THEN ['name=' || p_name] ELSE CAST([] AS VARCHAR[]) END,
           CASE WHEN len(p_type) > 8 THEN ['type=' || p_type] ELSE CAST([] AS VARCHAR[]) END))), '|'),
         '') AS long_entries,
       CAST(4 AS BIGINT) AS n_after_concat
FROM part WHERE p_partkey % 8 = 0
""",
)
def x_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-type function breadth (§2.8 extension): map construction,
    key listing, point lookup, entry filtering, and map union — the
    collection type behind typed property bags (S4's flattened JSON
    payloads carry exactly this shape). All native Catalyst map
    expressions, map-only plan. The DuckDB twin recomputes each output
    from the underlying columns without MAP types (engine-independent
    semantics, not engine-mirrored internals): sorted key order and
    the length-filtered entry serialization pin both engines to the
    same observable values."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_partkey") % 8 == 0)
    m = F.map_from_arrays(
        F.array(F.lit("brand"), F.lit("name"), F.lit("type")),
        F.array("p_brand", "p_name", "p_type"),
    )
    base = p.select("p_partkey", m.alias("m"))
    long_entries = F.array_join(
        F.array_sort(
            F.transform(
                F.map_entries(F.map_filter("m", lambda k, v: F.length(v) > 8)),
                lambda e: F.concat(e["key"], F.lit("="), e["value"]),
            )
        ),
        "|",
    )
    return base.select(
        "p_partkey",
        F.array_join(F.array_sort(F.map_keys("m")), "|").alias("keys_str"),
        F.element_at("m", F.lit("type")).alias("type_val"),
        long_entries.alias("long_entries"),
        F.size(
            F.map_concat("m", F.create_map(F.lit("pk"), F.col("p_partkey").cast("string")))
        ).cast("bigint").alias("n_after_concat"),
    )


@_q(
    "x_edit_distance",
    """
WITH w AS (
  SELECT p_partkey,
         regexp_extract(p_name, '^(\\w+)', 1) AS w1,
         regexp_extract(p_name, '^\\w+ (\\w+)', 1) AS w2,
         p_brand
  FROM part WHERE p_partkey % 16 = 0
)
SELECT p_partkey, w1, w2,
       CAST(levenshtein(w1, w2) AS BIGINT) AS word_dist,
       CAST(levenshtein(p_brand, 'Brand#13') AS BIGINT) AS brand_dist,
       round(1.0 - levenshtein(w1, w2)::DOUBLE / greatest(len(w1), len(w2)), 4) AS word_sim
FROM w
""",
)
def x_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance fuzzy matching (§2.8 extension): Levenshtein
    distance plus a length-normalized similarity — the entity-
    resolution primitive behind fuzzy key joins (the reference's J10
    lookup joins assume exact keys; real master-data reconciliation
    tolerates typos). Map-only; at scale a fuzzy JOIN would first
    block candidates (LSH/prefix buckets, as the dedup family does)
    and apply this distance only within blocks — never all-pairs."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_partkey") % 16 == 0)
    w1 = F.regexp_extract("p_name", r"^(\w+)", 1)
    w2 = F.regexp_extract("p_name", r"^\w+ (\w+)", 1)
    base = p.select("p_partkey", w1.alias("w1"), w2.alias("w2"), "p_brand")
    dist = F.levenshtein("w1", "w2")
    return base.select(
        "p_partkey", "w1", "w2",
        dist.cast("bigint").alias("word_dist"),
        F.levenshtein("p_brand", F.lit("Brand#13")).cast("bigint").alias("brand_dist"),
        F.round(
            F.lit(1.0) - dist.cast("double") / F.greatest(F.length("w1"), F.length("w2")), 4
        ).alias("word_sim"),
    )


@_q(
    "a_histogram_bins",
    """
WITH b AS (
  SELECT CAST(floor(o_totalprice / 25000) AS BIGINT) AS price_bin,
         CAST(count(*) AS BIGINT) AS n,
         round(min(o_totalprice), 2) AS bin_min,
         round(max(o_totalprice), 2) AS bin_max,
         round(avg(o_totalprice), 2) AS bin_avg
  FROM orders GROUP BY 1
)
SELECT price_bin, n, bin_min, bin_max, bin_avg,
       CAST(sum(n) OVER (ORDER BY price_bin
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_n
FROM b
""",
)
def a_histogram_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram / ECDF binning: floor-division bin ids
    (explicit ``floor`` — DuckDB ROUNDS double→int casts where Spark
    truncates, the same bridge curate_token_packing documents), per-bin
    count/min/max/avg, then a cumulative count over the ~20 bins. The
    heavy aggregation is one partial-aggregable shuffle over the fact;
    the running sum is a window over the BIN table (tiny — single
    partition is correct, not a bottleneck). The profiling shape
    behind data-distribution dashboards and equi-width bucketing
    decisions at corpus scale."""
    o = _t(spark, sf_dir, "orders")
    b = (
        o.groupBy(F.floor(F.col("o_totalprice") / 25000).cast("bigint").alias("price_bin"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("bin_min"),
            F.round(F.max("o_totalprice"), 2).alias("bin_max"),
            F.round(F.avg("o_totalprice"), 2).alias("bin_avg"),
        )
    )
    # global-window-ok: input is the price_bin aggregate — ≤ ~25 bins, bounded by the price domain, not the data
    w = W.orderBy("price_bin").rowsBetween(W.unboundedPreceding, W.currentRow)
    return b.select(
        "price_bin", "n", "bin_min", "bin_max", "bin_avg",
        F.sum("n").over(w).cast("bigint").alias("cum_n"),
    )


@_q(
    "a_mode_per_group",
    """
WITH c AS (
  SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS n
  FROM orders GROUP BY o_orderstatus, o_orderpriority
),
tot AS (
  SELECT o_orderstatus,
         CAST(sum(n) AS BIGINT) AS n_total,
         CAST(count(*) AS BIGINT) AS n_distinct_priorities
  FROM c GROUP BY o_orderstatus
),
r AS (
  SELECT o_orderstatus, o_orderpriority, n,
         row_number() OVER (PARTITION BY o_orderstatus
                            ORDER BY n DESC, o_orderpriority ASC) AS rk
  FROM c
)
SELECT r.o_orderstatus,
       r.o_orderpriority AS mode_priority,
       r.n AS mode_n,
       tot.n_distinct_priorities,
       round(r.n::DOUBLE / tot.n_total, 4) AS mode_share
FROM r JOIN tot ON r.o_orderstatus = tot.o_orderstatus
WHERE rk = 1
""",
)
def a_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mode / categorical profiling per group: the most
    frequent category with an explicit integer tie-break (count DESC,
    value ASC) — engines' built-in ``mode()`` aggregates break ties
    arbitrarily, so the catalog computes it as count + row_number,
    which hashes identically everywhere. One shuffle for the
    (group, category) counts; the per-group totals and ranking both
    reuse that tiny aggregate (category cardinality ≪ fact rows at
    any scale), so the fact table is scanned and shuffled exactly
    once."""
    o = _t(spark, sf_dir, "orders")
    c = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    tot = c.groupBy("o_orderstatus").agg(
        F.sum("n").cast("bigint").alias("n_total"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct_priorities"),
    )
    w = W.partitionBy("o_orderstatus").orderBy(F.desc("n"), F.asc("o_orderpriority"))
    r = c.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") == 1)
    return r.join(tot, "o_orderstatus").select(
        "o_orderstatus",
        F.col("o_orderpriority").alias("mode_priority"),
        F.col("n").alias("mode_n"),
        "n_distinct_priorities",
        F.round(F.col("n").cast("double") / F.col("n_total"), 4).alias("mode_share"),
    )


# ---------------------------------------------------------------------------
# R4c3: sequence / interval / warehouse-history analytics
# ---------------------------------------------------------------------------


@_q(
    "events_max_concurrency",
    """
WITH iv AS (
  SELECT event_type, ts AS s,
         ts + (event_id % 120 + 1) * INTERVAL 1 MINUTE AS e
  FROM events
),
b AS (
  SELECT event_type, s AS t, 1 AS d FROM iv
  UNION ALL
  SELECT event_type, e AS t, -1 AS d FROM iv
),
r AS (
  SELECT event_type,
         sum(d) OVER (PARTITION BY event_type ORDER BY t, d
                      ROWS UNBOUNDED PRECEDING) AS conc
  FROM b
)
SELECT event_type,
       CAST(count(*) / 2 AS BIGINT) AS n_intervals,
       CAST(max(conc) AS BIGINT) AS max_concurrency
FROM r GROUP BY event_type
""",
)
def events_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line interval-overlap maximum: how many synthetic
    sessions (event start, +1..120 min deterministic duration) are
    simultaneously open, per event_type. The classic O(n log n)
    pattern distributed: each interval becomes a +1 start / -1 end
    boundary, one shuffle partitions by type, and a running sum over
    the time-ordered boundaries is the live-concurrency curve whose
    max is taken per group. Half-open intervals: ends sort before
    starts at equal t (ORDER BY t, d with d=-1 first), so touching
    intervals never overlap. Among equal (t, d) rows the prefix sum
    is order-dependent row-to-row but its group max is not (all
    deltas in a tie group share a sign, so the extremum sits at the
    group boundary) — the output is deterministic without a unique
    tie-break column. Scale: one shuffle, no self-join; the window
    sort is the same per-partition sort a 1000-executor cluster does
    for any event-time window."""
    from graphql_api_etl_spark.operators.timeseries import max_concurrency

    ev = _t(spark, sf_dir, "events")
    iv = ev.select(
        "event_type",
        F.col("ts").alias("s"),
        F.expr(
            "ts + make_interval(0, 0, 0, 0, 0, CAST(event_id % 120 + 1 AS INT), 0)"
        ).alias("e"),
    )
    return max_concurrency(iv, "event_type", "s", "e")


@_q(
    "x_scd2_history",
    """
WITH ordered AS (
  SELECT user_id, event_type, ts, event_id,
         lag(event_type) OVER w AS prev_type
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
changes AS (
  SELECT user_id, event_type, ts
  FROM ordered
  WHERE prev_type IS NULL OR prev_type <> event_type
),
versioned AS (
  SELECT user_id, event_type, ts,
         row_number() OVER w AS version,
         lead(ts) OVER w AS next_ts
  FROM changes
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
)
SELECT user_id, event_type AS state, CAST(version AS BIGINT) AS version,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
       coalesce(strftime(next_ts, '%Y-%m-%d %H:%M:%S'), '9999-12-31 00:00:00')
         AS valid_to,
       next_ts IS NULL AS is_current
FROM versioned
""",
)
def x_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension Type-2 build from an append-only
    change stream: collapse consecutive duplicate states per user
    (lag ≠ current keeps only change points), then close each version
    with the next change's timestamp (lead) — open versions get the
    sentinel high date and is_current=true. This is the warehouse
    history-table pattern (Kimball SCD2) expressed as two windows
    over ONE shuffle: both windows partition by user_id, so Catalyst
    reuses the exchange and the change-point filter runs streaming in
    the sorted partition. At 100 TB the same plan incrementalizes:
    union yesterday's open versions with today's deltas and re-run.
    Ordering is total — (ts, event_id) — so versions are
    deterministic under ties. Complements events_latest_per_user
    (SCD1 keep-latest) in the CDC family."""
    from graphql_api_etl_spark.operators.timeseries import scd2_history

    ev = _t(spark, sf_dir, "events")
    v = scd2_history(ev, "user_id", "event_type", "ts", "event_id").withColumnRenamed(
        "state", "event_type"
    )
    return v.select(
        "user_id",
        F.col("event_type").alias("state"),
        "version",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.coalesce(
            F.date_format("next_ts", "yyyy-MM-dd HH:mm:ss"),
            F.lit("9999-12-31 00:00:00"),
        ).alias("valid_to"),
        F.col("next_ts").isNull().alias("is_current"),
    )


@_q(
    "events_transition_matrix",
    """
WITH ordered AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
),
pairs AS (
  SELECT prev_type, event_type AS next_type FROM ordered
  WHERE prev_type IS NOT NULL
),
c AS (
  SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS n
  FROM pairs GROUP BY prev_type, next_type
),
tot AS (
  SELECT prev_type, CAST(sum(n) AS BIGINT) AS n_from FROM c GROUP BY prev_type
)
SELECT c.prev_type, c.next_type, c.n,
       round(c.n::DOUBLE / tot.n_from, 4) AS p
FROM c JOIN tot ON c.prev_type = tot.prev_type
""",
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: lag() forms (prev → next) bigrams inside one
    user-partitioned window, a groupBy counts each transition, and
    row-conditional probabilities normalize by the source state's
    outflow. Two shuffles total — the user window and the
    (prev, next) count whose cardinality is |types|² regardless of
    data size, so the normalizing join is driver-trivial at any
    scale. This is the sequence-mining primitive behind session-flow
    sankeys and next-event prediction baselines; determinism comes
    from the (ts, event_id) total order (bigrams are order-sensitive
    only through the window sort, which is pinned)."""
    from graphql_api_etl_spark.operators.timeseries import transition_matrix

    ev = _t(spark, sf_dir, "events")
    return (
        transition_matrix(ev, "user_id", "event_type", ["ts", "event_id"])
        .withColumnRenamed("prev_state", "prev_type")
        .withColumnRenamed("next_state", "next_type")
    )


@_q(
    "a_rfm_scores",
    """
WITH base AS (
  SELECT o_custkey AS c_custkey,
         date_diff('day', max(o_orderdate), TIMESTAMP '2026-01-01 00:00:00')
           AS recency_days,
         CAST(count(*) AS BIGINT) AS frequency,
         round(sum(o_totalprice), 2) AS monetary
  FROM orders GROUP BY o_custkey
),
scored AS (
  SELECT c_custkey, CAST(recency_days AS BIGINT) AS recency_days,
         frequency, monetary,
         CAST(ntile(5) OVER (ORDER BY recency_days ASC, c_custkey) AS BIGINT) AS r_score,
         CAST(ntile(5) OVER (ORDER BY frequency DESC, c_custkey) AS BIGINT) AS f_score,
         CAST(ntile(5) OVER (ORDER BY monetary DESC, c_custkey) AS BIGINT) AS m_score
  FROM base
)
SELECT c_custkey, recency_days, frequency, monetary,
       r_score, f_score, m_score,
       CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR) ||
         CAST(m_score AS VARCHAR) AS rfm_segment
FROM scored
""",
)
def a_rfm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer scoring (recency / frequency / monetary), the
    standard marketing-analytics segmentation: one aggregate over
    orders per customer, then three DISTRIBUTED ntile(5) quintiles
    over the per-customer rollup (r11: operators/rank.global_ntile —
    exact floor-balanced arithmetic over a range-shuffled row_number,
    so the plan holds even when the customer dimension outgrows one
    partition). Recency anchors to a fixed literal
    date so the query is reproducible; every ordering carries a
    c_custkey tie-break, making quintile boundaries deterministic on
    both engines (ntile's equal-split semantics agree given a total
    order)."""
    o = _t(spark, sf_dir, "orders")
    base = o.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.datediff(F.lit("2026-01-01").cast("timestamp"), F.max("o_orderdate"))
        .cast("bigint")
        .alias("recency_days"),
        F.count(F.lit(1)).cast("bigint").alias("frequency"),
        F.round(F.sum("o_totalprice"), 2).alias("monetary"),
    )
    # r11 global-window sweep: all three quintiles run distributed
    # (operators/rank.global_ntile — one range shuffle each, exact
    # floor-balanced ntile arithmetic) instead of three
    # single-partition windows over the per-customer rollup.
    # INDEPENDENT branches joined back on the key, not a chain: each
    # global_ntile's offsets branch duplicates its input's plan, so
    # chaining three multiplied the whole upstream 2^3-fold (253
    # pre-AQE exchanges in the plan audit); the rollup is
    # localCheckpointed (the a_spearman_corr multi-consumer pattern)
    # and each branch reads it once.
    from graphql_api_etl_spark.operators.rank import global_ntile

    base = base.localCheckpoint(eager=True)
    scored = base
    for out, order in (
        ("r_score", [F.asc("recency_days"), F.asc("c_custkey")]),
        ("f_score", [F.desc("frequency"), F.asc("c_custkey")]),
        ("m_score", [F.desc("monetary"), F.asc("c_custkey")]),
    ):
        branch = global_ntile(base, order, 5, out_col=out).select(
            "c_custkey", F.col(out).cast("bigint").alias(out)
        )
        scored = scored.join(branch, "c_custkey")
    scored = scored.select(
        "c_custkey", "recency_days", "frequency", "monetary",
        "r_score", "f_score", "m_score",
    )
    return scored.withColumn(
        "rfm_segment",
        F.concat(
            F.col("r_score").cast("string"),
            F.col("f_score").cast("string"),
            F.col("m_score").cast("string"),
        ),
    )


@_q(
    "a_profile_columns",
    """
WITH p AS (
  SELECT 'c_custkey' AS col_name, 'bigint' AS dtype,
         CAST(count(*) AS BIGINT) AS n_rows,
         CAST(count(*) - count(c_custkey) AS BIGINT) AS n_null,
         CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_distinct,
         CAST(min(c_custkey) AS VARCHAR) AS min_val,
         CAST(max(c_custkey) AS VARCHAR) AS max_val,
         CAST(NULL AS DOUBLE) AS avg_len
  FROM customer
  UNION ALL
  SELECT 'c_name', 'string', CAST(count(*) AS BIGINT),
         CAST(count(*) - count(c_name) AS BIGINT),
         CAST(count(DISTINCT c_name) AS BIGINT),
         min(c_name), max(c_name), round(avg(length(c_name)), 2)
  FROM customer
  UNION ALL
  SELECT 'c_nationkey', 'int', CAST(count(*) AS BIGINT),
         CAST(count(*) - count(c_nationkey) AS BIGINT),
         CAST(count(DISTINCT c_nationkey) AS BIGINT),
         CAST(min(c_nationkey) AS VARCHAR), CAST(max(c_nationkey) AS VARCHAR),
         CAST(NULL AS DOUBLE)
  FROM customer
  UNION ALL
  SELECT 'c_acctbal', 'double', CAST(count(*) AS BIGINT),
         CAST(count(*) - count(c_acctbal) AS BIGINT),
         CAST(count(DISTINCT c_acctbal) AS BIGINT),
         CAST(CAST(min(c_acctbal) AS DECIMAL(12,2)) AS VARCHAR),
         CAST(CAST(max(c_acctbal) AS DECIMAL(12,2)) AS VARCHAR),
         CAST(NULL AS DOUBLE)
  FROM customer
  UNION ALL
  SELECT 'c_mktsegment', 'string', CAST(count(*) AS BIGINT),
         CAST(count(*) - count(c_mktsegment) AS BIGINT),
         CAST(count(DISTINCT c_mktsegment) AS BIGINT),
         min(c_mktsegment), max(c_mktsegment),
         round(avg(length(c_mktsegment)), 2)
  FROM customer
)
SELECT * FROM p
""",
)
def a_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass column profiler (the Deequ / Great-Expectations
    "profile" primitive): null count, distinct count, min/max, and
    string mean-length for every column of the customer dimension,
    unpivoted to one row per column. Spark computes ALL measures in a
    single aggregate over one scan — the five count-distincts expand
    to one shuffle (Expand operator, 5× the dimension's rows, still
    dim-sized) — then stack() reshapes the single wide row; the
    oracle writes the same measures as per-column passes for clarity.
    Numeric min/max are emitted through DECIMAL(12,2) so both engines
    render identical strings. At 100 TB this is the profile job you
    run per-partition-batch after ingest; count(DISTINCT) swaps for
    approx_count_distinct when exactness stops mattering (that
    variant is a_approx_count_distinct)."""
    c = _t(spark, sf_dir, "customer")
    n = F.count(F.lit(1))
    agg = c.agg(
        n.cast("bigint").alias("n_rows"),
        (n - F.count("c_custkey")).cast("bigint").alias("null_custkey"),
        F.count_distinct("c_custkey").cast("bigint").alias("nd_custkey"),
        F.min("c_custkey").cast("string").alias("min_custkey"),
        F.max("c_custkey").cast("string").alias("max_custkey"),
        (n - F.count("c_name")).cast("bigint").alias("null_name"),
        F.count_distinct("c_name").cast("bigint").alias("nd_name"),
        F.min("c_name").alias("min_name"),
        F.max("c_name").alias("max_name"),
        F.round(F.avg(F.length("c_name")), 2).alias("len_name"),
        (n - F.count("c_nationkey")).cast("bigint").alias("null_nationkey"),
        F.count_distinct("c_nationkey").cast("bigint").alias("nd_nationkey"),
        F.min("c_nationkey").cast("string").alias("min_nationkey"),
        F.max("c_nationkey").cast("string").alias("max_nationkey"),
        (n - F.count("c_acctbal")).cast("bigint").alias("null_acctbal"),
        F.count_distinct("c_acctbal").cast("bigint").alias("nd_acctbal"),
        F.min("c_acctbal").cast("decimal(12,2)").cast("string").alias("min_acctbal"),
        F.max("c_acctbal").cast("decimal(12,2)").cast("string").alias("max_acctbal"),
        (n - F.count("c_mktsegment")).cast("bigint").alias("null_seg"),
        F.count_distinct("c_mktsegment").cast("bigint").alias("nd_seg"),
        F.min("c_mktsegment").alias("min_seg"),
        F.max("c_mktsegment").alias("max_seg"),
        F.round(F.avg(F.length("c_mktsegment")), 2).alias("len_seg"),
    )
    return agg.selectExpr(
        "stack(5, "
        "'c_custkey', 'bigint', n_rows, null_custkey, nd_custkey, min_custkey, max_custkey, CAST(NULL AS DOUBLE), "
        "'c_name', 'string', n_rows, null_name, nd_name, min_name, max_name, len_name, "
        "'c_nationkey', 'int', n_rows, null_nationkey, nd_nationkey, min_nationkey, max_nationkey, CAST(NULL AS DOUBLE), "
        "'c_acctbal', 'double', n_rows, null_acctbal, nd_acctbal, min_acctbal, max_acctbal, CAST(NULL AS DOUBLE), "
        "'c_mktsegment', 'string', n_rows, null_seg, nd_seg, min_seg, max_seg, len_seg"
        ") AS (col_name, dtype, n_rows, n_null, n_distinct, min_val, max_val, avg_len)"
    )


@_q(
    "dq_expectations",
    """
WITH cust AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(count(*) - count(DISTINCT c_custkey) AS BIGINT) AS dup_keys,
         CAST(count(*) FILTER (WHERE c_acctbal < 0) AS BIGINT) AS neg_bal
  FROM customer
),
ord AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(count(*) FILTER (WHERE o_totalprice < 0 OR o_totalprice > 1000000)
              AS BIGINT) AS bad_price,
         CAST(count(*) FILTER (WHERE o_orderdate IS NULL) AS BIGINT) AS null_date
  FROM orders
),
ord_ref AS (
  SELECT CAST(count(*) AS BIGINT) AS orphans
  FROM orders o WHERE NOT EXISTS
    (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
),
li AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(count(*) FILTER (WHERE l_quantity < 1 OR l_quantity > 50)
              AS BIGINT) AS bad_qty
  FROM lineitem
),
li_ref AS (
  SELECT CAST(count(*) AS BIGINT) AS orphans
  FROM lineitem l WHERE NOT EXISTS
    (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
),
ev AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(count(*) FILTER (WHERE ts IS NULL) AS BIGINT) AS null_ts
  FROM events
),
doc AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(count(*) FILTER (WHERE lang NOT IN ('en','de','fr','es'))
              AS BIGINT) AS bad_lang
  FROM documents
)
SELECT 'customer_custkey_unique' AS rule, n AS n_checked,
       dup_keys AS n_violations, dup_keys = 0 AS passed FROM cust
UNION ALL
SELECT 'customer_acctbal_non_negative', n, neg_bal, neg_bal = 0 FROM cust
UNION ALL
SELECT 'orders_totalprice_in_range', n, bad_price, bad_price = 0 FROM ord
UNION ALL
SELECT 'orders_orderdate_not_null', n, null_date, null_date = 0 FROM ord
UNION ALL
SELECT 'orders_custkey_in_customer', (SELECT n FROM ord), orphans,
       orphans = 0 FROM ord_ref
UNION ALL
SELECT 'lineitem_quantity_in_range', n, bad_qty, bad_qty = 0 FROM li
UNION ALL
SELECT 'lineitem_orderkey_in_orders', (SELECT n FROM li), orphans,
       orphans = 0 FROM li_ref
UNION ALL
SELECT 'events_ts_not_null', n, null_ts, null_ts = 0 FROM ev
UNION ALL
SELECT 'documents_lang_expected', n, bad_lang, bad_lang = 0 FROM doc
""",
)
def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality expectation suite (the Deequ /
    Great-Expectations check primitive): nine rules across five
    tables — uniqueness, non-null, numeric range, referential
    integrity, and categorical domain — each yielding (rule,
    n_checked, n_violations, passed). Rules sharing a table fuse into
    ONE aggregate pass (count + conditional counts in the same agg),
    so the whole suite costs one scan per table plus two anti-join
    probes for referential integrity; nothing shuffles more than the
    key being checked. Two rules fail on this corpus by design
    (negative balances exist; 'zh' documents are outside the expected
    language set) so both branches of the verdict logic carry
    evidence. This is the validation-gate family (V1–V5, ETL:
    1020–1074) generalized from count gates to rule suites."""
    _sum = lambda cond: F.sum(F.when(cond, 1).otherwise(0)).cast("bigint")  # noqa: E731
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    ev = _t(spark, sf_dir, "events")
    doc = _t(spark, sf_dir, "documents")

    cust = c.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        (F.count(F.lit(1)) - F.count_distinct("c_custkey")).cast("bigint").alias("dup_keys"),
        _sum(F.col("c_acctbal") < 0).alias("neg_bal"),
    )
    ordr = o.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        _sum((F.col("o_totalprice") < 0) | (F.col("o_totalprice") > 1000000)).alias("bad_price"),
        _sum(F.col("o_orderdate").isNull()).alias("null_date"),
    )
    ord_orphans = (
        o.join(c, o.o_custkey == c.c_custkey, "left_anti")
        .agg(F.count(F.lit(1)).cast("bigint").alias("orphans"))
    )
    lin = li.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        _sum((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)).alias("bad_qty"),
    )
    li_orphans = (
        li.join(o, li.l_orderkey == o.o_orderkey, "left_anti")
        .agg(F.count(F.lit(1)).cast("bigint").alias("orphans"))
    )
    evt = ev.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        _sum(F.col("ts").isNull()).alias("null_ts"),
    )
    docs = doc.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        _sum(~F.col("lang").isin("en", "de", "fr", "es")).alias("bad_lang"),
    )

    def rule(src: DataFrame, name: str, n_col: str, viol_col: str) -> DataFrame:
        return src.select(
            F.lit(name).alias("rule"),
            F.col(n_col).alias("n_checked"),
            F.col(viol_col).alias("n_violations"),
            (F.col(viol_col) == 0).alias("passed"),
        )

    ord_ref = ordr.select("n").crossJoin(ord_orphans)
    li_ref = lin.select("n").crossJoin(li_orphans)
    frames = [
        rule(cust, "customer_custkey_unique", "n", "dup_keys"),
        rule(cust, "customer_acctbal_non_negative", "n", "neg_bal"),
        rule(ordr, "orders_totalprice_in_range", "n", "bad_price"),
        rule(ordr, "orders_orderdate_not_null", "n", "null_date"),
        rule(ord_ref, "orders_custkey_in_customer", "n", "orphans"),
        rule(lin, "lineitem_quantity_in_range", "n", "bad_qty"),
        rule(li_ref, "lineitem_orderkey_in_orders", "n", "orphans"),
        rule(evt, "events_ts_not_null", "n", "null_ts"),
        rule(docs, "documents_lang_expected", "n", "bad_lang"),
    ]
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


@_q(
    "text_sentence_split",
    """
WITH s AS (
  SELECT doc_id, unnest(regexp_split_to_array(text, '[.!?]+ ')) AS raw
  FROM documents
),
cleaned AS (
  SELECT doc_id,
         length(regexp_replace(trim(raw), '[.!?]+$', '')) AS slen
  FROM s
  WHERE length(regexp_replace(trim(raw), '[.!?]+$', '')) > 0
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_sentences,
       round(avg(slen), 2) AS avg_sentence_chars,
       CAST(max(slen) AS BIGINT) AS max_sentence_chars
FROM cleaned GROUP BY doc_id
""",
)
def text_sentence_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence segmentation + per-document sentence statistics: split
    on terminal-punctuation-plus-space runs, strip residual trailing
    punctuation, drop empties, and aggregate count / mean / max
    sentence length per document. The rule is deliberately
    regex-engine-portable (no lookbehind — Java regex has it, RE2
    does not), so Spark and DuckDB segment identically. Map-side
    explode then one shuffle on doc_id; at corpus scale the explode
    multiplies rows ~n_sentences× but stays pipeline-local (no
    materialization between split and aggregate), the same shape as
    the shingle/token entries. Sentence stats feed the quality-score
    family (mean sentence length is a standard fluency signal
    alongside text_quality_stats' ratios)."""
    docs = _t(spark, sf_dir, "documents")
    s = docs.select(
        "doc_id", F.explode(F.split("text", r"[.!?]+ ")).alias("raw")
    )
    slen = F.length(F.regexp_replace(F.trim(F.col("raw")), r"[.!?]+$", ""))
    cleaned = s.select("doc_id", slen.alias("slen")).filter(F.col("slen") > 0)
    return cleaned.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sentences"),
        F.round(F.avg("slen"), 2).alias("avg_sentence_chars"),
        F.max("slen").cast("bigint").alias("max_sentence_chars"),
    )


def _ewma_lag_sql() -> str:
    """Build the 20-term lag-weighted EWMA oracle (see events_ewma_trailing:
    the weights are powers of two so every product and partial sum is exact
    BIGINT arithmetic — summation order cannot perturb the result)."""
    num = " + ".join(
        f"coalesce(lag(v_cents, {d}) OVER w, 0) * {1 << (19 - d)}" for d in range(20)
    )
    den = " + ".join(
        f"(CASE WHEN lag(v_cents, {d}) OVER w IS NOT NULL THEN {100 * (1 << (19 - d))} ELSE 0 END)"
        for d in range(20)
    )
    return f"""
WITH base AS (
  SELECT user_id, event_id, ts,
         CAST(round(value * 100) AS BIGINT) AS v_cents
  FROM events
),
t AS (
  SELECT user_id, event_id, ts,
         {num} AS num,
         {den} AS den
  FROM base
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, event_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
       round(num::DOUBLE / den::DOUBLE, 4) AS ewma
FROM t
"""


@_q("events_ewma_trailing", _ewma_lag_sql())
def events_ewma_trailing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing exponentially-weighted moving average (half-life = one
    event, window = last 20 events) per user — the standard smoothing
    feature for time-series feature stores. Expressed as ONE
    event-time window pass: the 20 decayed terms are lag(value, d)
    calls sharing a single (user_id, ts, event_id) window, so Spark
    computes all of them in one sort within one shuffle — no
    self-join, no row inflation. Determinism is engineered, not
    assumed: values quantize to integer cents and the weights are
    powers of two (2^(19-d)), making numerator and denominator exact
    BIGINT sums immune to FP summation order; the single final
    division is the only float op. At 100 TB this is the same
    plan shape as any sessionized rolling feature — partition by
    entity, sort by time, constant per-row work."""
    from graphql_api_etl_spark.operators.timeseries import ewma_trailing_cents

    ev = _t(spark, sf_dir, "events")
    base = ev.select(
        "user_id", "event_id", "ts",
        F.round(F.col("value") * 100).cast("bigint").alias("v_cents"),
    )
    t, ewma = ewma_trailing_cents(base, "user_id", ["ts", "event_id"], "v_cents", depth=20)
    return t.select(
        "user_id", "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        ewma.alias("ewma"),
    )


@_q(
    "a_benford_first_digit",
    """
WITH d AS (
  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
              AS BIGINT) AS digit
  FROM orders WHERE o_totalprice >= 1
),
c AS (
  SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY digit
),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM c)
SELECT digit, n,
       round(n::DOUBLE / tot.n_total, 4) AS observed_share,
       round(log10(1 + 1.0 / digit), 4) AS benford_share,
       round(abs(n::DOUBLE / tot.n_total - log10(1 + 1.0 / digit)), 4)
         AS abs_gap
FROM c, tot
""",
)
def a_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit screen on order totals — the classic
    forensic-accounting / data-quality test for fabricated or
    truncated numeric columns. One map-side projection extracts the
    leading digit (integer floor → string head, no float log tricks
    on the extraction path), one 9-group aggregate, and the expected
    log10(1 + 1/d) shares plus absolute gaps are computed on the
    9-row result. Scale-free beyond the single fact scan; the
    aggregate is map-side-combined to 9 groups. Complements
    dq_expectations (rule-based) with a distributional screen."""
    o = _t(spark, sf_dir, "orders")
    d = o.filter(F.col("o_totalprice") >= 1).select(
        F.substring(F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1)
        .cast("bigint")
        .alias("digit")
    )
    c = d.groupBy("digit").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    tot = c.agg(F.sum("n").cast("bigint").alias("n_total"))
    benford = F.round(F.log10(F.lit(1) + F.lit(1.0) / F.col("digit")), 4)
    share = F.col("n").cast("double") / F.col("n_total")
    return c.crossJoin(tot).select(
        "digit",
        "n",
        F.round(share, 4).alias("observed_share"),
        benford.alias("benford_share"),
        F.round(F.abs(share - F.log10(F.lit(1) + F.lit(1.0) / F.col("digit"))), 4).alias("abs_gap"),
    )


@_q(
    "a_quantile_buckets",
    """
WITH b AS (
  SELECT quantile_cont(o_totalprice, 0.1) AS b1,
         quantile_cont(o_totalprice, 0.2) AS b2,
         quantile_cont(o_totalprice, 0.3) AS b3,
         quantile_cont(o_totalprice, 0.4) AS b4,
         quantile_cont(o_totalprice, 0.5) AS b5,
         quantile_cont(o_totalprice, 0.6) AS b6,
         quantile_cont(o_totalprice, 0.7) AS b7,
         quantile_cont(o_totalprice, 0.8) AS b8,
         quantile_cont(o_totalprice, 0.9) AS b9
  FROM orders
),
assigned AS (
  SELECT 1 + (CASE WHEN o_totalprice > b1 THEN 1 ELSE 0 END)
           + (CASE WHEN o_totalprice > b2 THEN 1 ELSE 0 END)
           + (CASE WHEN o_totalprice > b3 THEN 1 ELSE 0 END)
           + (CASE WHEN o_totalprice > b4 THEN 1 ELSE 0 END)
           + (CASE WHEN o_totalprice > b5 THEN 1 ELSE 0 END)
           + (CASE WHEN o_totalprice > b6 THEN 1 ELSE 0 END)
           + (CASE WHEN o_totalprice > b7 THEN 1 ELSE 0 END)
           + (CASE WHEN o_totalprice > b8 THEN 1 ELSE 0 END)
           + (CASE WHEN o_totalprice > b9 THEN 1 ELSE 0 END) AS decile,
         o_totalprice
  FROM orders, b
)
SELECT CAST(decile AS BIGINT) AS decile,
       CAST(count(*) AS BIGINT) AS n,
       round(min(o_totalprice), 2) AS lo,
       round(max(o_totalprice), 2) AS hi,
       round(avg(o_totalprice), 2) AS avg_price
FROM assigned GROUP BY decile
""",
)
def a_quantile_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile-boundary bucketing — the SCALABLE alternative to a
    global ntile() window (which funnels every row through one sorted
    partition): ONE partial-aggregable percentile pass produces the 9
    decile boundaries, that single row is broadcast back over the
    fact scan, and bucket assignment is a map-side comparison chain —
    no global sort, no second shuffle beyond the 10-group rollup.
    This is the shape a_rfm_scores' docstring promises for
    fact-sized scoring tables. Strict-> comparisons pin boundary
    ties (a row equal to boundary k stays in bucket k) identically
    on both engines; at 100 TB the exact percentile swaps for
    approx_percentile with everything else unchanged."""
    o = _t(spark, sf_dir, "orders")
    b = o.agg(
        *[
            F.expr(f"percentile(o_totalprice, {q / 10})").alias(f"b{q}")
            for q in range(1, 10)
        ]
    )
    decile = F.lit(1)
    for q in range(1, 10):
        decile = decile + F.when(F.col("o_totalprice") > F.col(f"b{q}"), 1).otherwise(0)
    assigned = o.crossJoin(F.broadcast(b)).select(
        decile.cast("bigint").alias("decile"), "o_totalprice"
    )
    return assigned.groupBy("decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(F.min("o_totalprice"), 2).alias("lo"),
        F.round(F.max("o_totalprice"), 2).alias("hi"),
        F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
    )


@_q(
    "a_entropy_per_group",
    """
WITH c AS (
  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY user_id, event_type
),
tot AS (
  SELECT user_id, CAST(sum(n) AS BIGINT) AS n_events,
         CAST(count(*) AS BIGINT) AS n_types
  FROM c GROUP BY user_id
)
SELECT c.user_id, tot.n_events, tot.n_types,
       round(-sum((c.n::DOUBLE / tot.n_events) * ln(c.n::DOUBLE / tot.n_events)), 4)
         AS entropy
FROM c JOIN tot ON c.user_id = tot.user_id
GROUP BY c.user_id, tot.n_events, tot.n_types
""",
)
def a_entropy_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each user's event-type distribution — the
    behavioral-diversity / anomaly-profiling score (bots are
    low-entropy, organic users high). One shuffle to the
    (user, type) counts, whose cardinality is users × |types|; totals
    and the -Σ p·ln p fold both run over that aggregate, never the
    fact table. Probabilities derive from exact integer counts, so
    the only float work is ln over identical doubles (libm 1-ulp
    differences vanish under round 4)."""
    ev = _t(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    tot = c.groupBy("user_id").agg(
        F.sum("n").cast("bigint").alias("n_events"),
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
    )
    p = F.col("n").cast("double") / F.col("n_events")
    return (
        c.join(tot, "user_id")
        .groupBy("user_id", "n_events", "n_types")
        .agg(F.round(-F.sum(p * F.log(p)), 4).alias("entropy"))
    )


@_q(
    "events_interarrival_stats",
    """
WITH g AS (
  SELECT event_type,
         epoch_ms(ts) - lag(epoch_ms(ts))
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_ms
  FROM events
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_gaps,
       CAST(min(gap_ms) AS BIGINT) AS min_ms,
       round(avg(gap_ms), 1) AS avg_ms,
       round(quantile_cont(gap_ms, 0.5), 1) AS p50_ms,
       round(quantile_cont(gap_ms, 0.9), 1) AS p90_ms,
       CAST(max(gap_ms) AS BIGINT) AS max_ms
FROM g WHERE gap_ms IS NOT NULL
GROUP BY event_type
""",
)
def events_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival-time distribution: millisecond gaps between each
    user's consecutive events, aggregated per the arriving event's
    type (min / mean / exact p50 / p90 / max) — the latency-profile
    pass behind rate-limit tuning and burst detection. One
    user-partitioned window computes the gaps; the per-type rollup is
    a second small shuffle. Gaps are exact integers (epoch_ms), so
    the percentile interpolation is over identical values on both
    engines (the only float step, rounded to 0.1 ms)."""
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ms = F.unix_millis(F.col("ts"))
    g = ev.select(
        "event_type", (ms - F.lag(ms).over(w)).alias("gap_ms")
    ).filter(F.col("gap_ms").isNotNull())
    return g.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
        F.min("gap_ms").cast("bigint").alias("min_ms"),
        F.round(F.avg("gap_ms"), 1).alias("avg_ms"),
        F.round(F.expr("percentile(gap_ms, 0.5)"), 1).alias("p50_ms"),
        F.round(F.expr("percentile(gap_ms, 0.9)"), 1).alias("p90_ms"),
        F.max("gap_ms").cast("bigint").alias("max_ms"),
    )


@_q(
    "a_monthly_growth",
    """
WITH m AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS month,
         round(sum(o_totalprice), 2) AS revenue,
         CAST(count(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY month
),
g AS (
  SELECT month, revenue, n_orders,
         lag(revenue) OVER (ORDER BY month) AS prev_rev
  FROM m
)
SELECT month, revenue, n_orders,
       round((revenue - prev_rev) / prev_rev, 4) AS mom_pct
FROM g
""",
)
def a_monthly_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth — the canonical BI trend query:
    calendar-month rollup of the fact table (one partial-aggregated
    shuffle; the month key is a formatted string so both engines
    bucket identically), then a lag window over the ~80-row month
    table for the growth ratio. The global-order window runs over the
    AGGREGATE (bounded by the calendar, not the data), so the plan
    holds at any fact scale. Revenue is rounded BEFORE the ratio on
    both sides, making the division operands identical doubles."""
    o = _t(spark, sf_dir, "orders")
    m = o.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
    )
    # global-window-ok: input is the month-grain aggregate — calendar-bounded
    w = W.orderBy("month")
    g = m.withColumn("prev_rev", F.lag("revenue").over(w))
    return g.select(
        "month", "revenue", "n_orders",
        F.round((F.col("revenue") - F.col("prev_rev")) / F.col("prev_rev"), 4).alias(
            "mom_pct"
        ),
    )


@_q(
    "events_range_frame_sum",
    """
WITH b AS (
  SELECT user_id, event_id, epoch_ms(ts) AS ms,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
)
SELECT user_id, event_id,
       CAST(count(*) OVER w AS BIGINT) AS n_60s,
       CAST(sum(cents) OVER w AS BIGINT) AS cents_60s
FROM b
WINDOW w AS (PARTITION BY user_id ORDER BY ms
             RANGE BETWEEN 60000 PRECEDING AND CURRENT ROW)
""",
)
def events_range_frame_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-range window frames (RANGE BETWEEN, not ROWS): each
    event's trailing-60-second count and spend per user — the
    rate-limit / rolling-exposure primitive where the frame is
    defined by the ORDER VALUE, so simultaneous events (equal ms)
    are always in or out TOGETHER, making the result independent of
    tie order without any tie-break column (the reason this entry
    exists alongside the ROWS-frame suite). One shuffle on user_id;
    values quantize to integer cents so the frame sums are exact.
    Spark's rangeBetween needs a numeric sort key — epoch_ms — the
    same bridge the sessionize family uses."""
    ev = _t(spark, sf_dir, "events")
    b = ev.select(
        "user_id", "event_id",
        F.unix_millis("ts").alias("ms"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    w = W.partitionBy("user_id").orderBy("ms").rangeBetween(-60000, 0)
    return b.select(
        "user_id", "event_id",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_60s"),
        F.sum("cents").over(w).cast("bigint").alias("cents_60s"),
    )


@_q(
    "events_path_analysis",
    """
WITH o AS (
  SELECT user_id, event_type,
         lag(event_type, 1) OVER w AS p1,
         lag(event_type, 2) OVER w AS p2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
paths AS (
  SELECT p2 || ' > ' || p1 || ' > ' || event_type AS path
  FROM o WHERE p2 IS NOT NULL
),
c AS (
  SELECT path, CAST(count(*) AS BIGINT) AS n FROM paths GROUP BY path
),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM c)
SELECT path, n, round(n::DOUBLE / tot.n_total, 4) AS share
FROM c, tot
ORDER BY n DESC, path LIMIT 5
""",
)
def events_path_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path mining: the 5 most-travelled 3-step event sequences across
    all user journeys (the sankey / user-flow primitive, one order up
    from events_transition_matrix's bigrams). Two stacked lags in ONE
    user-partitioned window form the trigrams; the path aggregate has
    at most |types|³ groups regardless of data size, and top-5 is
    TakeOrderedAndProject with a (n DESC, path) integer-first
    tie-break — no global sort, deterministic under count ties."""
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.select(
        "event_type",
        F.lag("event_type", 1).over(w).alias("p1"),
        F.lag("event_type", 2).over(w).alias("p2"),
    ).filter(F.col("p2").isNotNull())
    paths = o.select(
        F.concat_ws(" > ", F.col("p2"), F.col("p1"), F.col("event_type")).alias("path")
    )
    c = paths.groupBy("path").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    tot = c.agg(F.sum("n").cast("bigint").alias("n_total"))
    return (
        c.crossJoin(F.broadcast(tot))
        .select("path", "n", F.round(F.col("n").cast("double") / F.col("n_total"), 4).alias("share"))
        .orderBy(F.desc("n"), F.asc("path"))
        .limit(5)
    )


@_q(
    "events_ohlc_bars",
    """
WITH b AS (
  SELECT event_type,
         epoch_ms(ts) // 300000 AS bar,
         value, ts, event_id,
         row_number() OVER (PARTITION BY event_type, epoch_ms(ts) // 300000
                            ORDER BY ts ASC, event_id ASC) AS rn_open,
         row_number() OVER (PARTITION BY event_type, epoch_ms(ts) // 300000
                            ORDER BY ts DESC, event_id DESC) AS rn_close
  FROM events
)
SELECT event_type, CAST(bar AS BIGINT) AS bar,
       CAST(count(*) AS BIGINT) AS n,
       round(max(CASE WHEN rn_open = 1 THEN value END), 2) AS open,
       round(max(value), 2) AS high,
       round(min(value), 2) AS low,
       round(max(CASE WHEN rn_close = 1 THEN value END), 2) AS close
FROM b GROUP BY event_type, bar
""",
)
def events_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC candlestick bars: open / high / low / close of the value
    series per (event_type, 5-minute bar) — the financial/metrics
    downsampling primitive. Open and close are FIRST/LAST under the
    (ts, event_id) total order, computed as rank-1 rows of two
    opposite-direction windows over the SAME partitioning as the
    final aggregate — one shuffle serves both windows and the
    group-by (Catalyst reuses the exchange). High/low are plain
    min/max. first_value/last_value would need frame care and
    arg_min/max tie rules differ across engines; rank-1-then-agg is
    deterministic everywhere."""
    ev = _t(spark, sf_dir, "events")
    bar = (F.unix_millis("ts") / F.lit(300000)).cast("bigint")
    base = ev.select("event_type", bar.alias("bar"), "value", "ts", "event_id")
    wo = W.partitionBy("event_type", "bar").orderBy(F.asc("ts"), F.asc("event_id"))
    wc = W.partitionBy("event_type", "bar").orderBy(F.desc("ts"), F.desc("event_id"))
    b = base.select(
        "event_type", "bar", "value",
        F.row_number().over(wo).alias("rn_open"),
        F.row_number().over(wc).alias("rn_close"),
    )
    return b.groupBy("event_type", "bar").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(F.max(F.when(F.col("rn_open") == 1, F.col("value"))), 2).alias("open"),
        F.round(F.max("value"), 2).alias("high"),
        F.round(F.min("value"), 2).alias("low"),
        F.round(F.max(F.when(F.col("rn_close") == 1, F.col("value"))), 2).alias("close"),
    )


@_q(
    "events_active_users",
    """
WITH du AS (
  SELECT DISTINCT CAST(epoch_ms(ts) // 86400000 AS BIGINT) AS day, user_id
  FROM events
),
days AS (SELECT DISTINCT day FROM du)
SELECT d.day,
       CAST(count(DISTINCT CASE WHEN du.day = d.day THEN du.user_id END) AS BIGINT) AS dau,
       CAST(count(DISTINCT CASE WHEN du.day > d.day - 7 THEN du.user_id END) AS BIGINT) AS wau,
       CAST(count(DISTINCT du.user_id) AS BIGINT) AS mau
FROM days d
JOIN du ON du.day BETWEEN d.day - 29 AND d.day
GROUP BY d.day
""",
)
def events_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / WAU / MAU engagement rollup — rolling DISTINCT users
    over 1/7/30-day windows, which no window frame can express
    (distinct isn't decomposable over sliding frames). The scalable
    shape: dedup the fact stream to (day, user) FIRST — one shuffle,
    after which cardinality is bounded by users × days — then a
    range join of that small table against the day spine with
    conditional distinct counts per window length. At 100 TB the
    dedup absorbs the data size; the windowed join never touches the
    raw stream. (The sketch alternative — per-day HLL merged across
    windows — is a_approx_count_distinct's territory; this entry is
    the exact path.)"""
    ev = _t(spark, sf_dir, "events")
    du = ev.select(
        (F.unix_millis("ts") / F.lit(86400000)).cast("bigint").alias("day"),
        "user_id",
    ).distinct()
    days = du.select("day").distinct().withColumnRenamed("day", "d")
    joined = days.join(
        du, (F.col("day") >= F.col("d") - 29) & (F.col("day") <= F.col("d")), "inner"
    )
    return (
        joined.groupBy("d")
        .agg(
            F.count_distinct(
                F.when(F.col("day") == F.col("d"), F.col("user_id"))
            ).cast("bigint").alias("dau"),
            F.count_distinct(
                F.when(F.col("day") > F.col("d") - 7, F.col("user_id"))
            ).cast("bigint").alias("wau"),
            F.count_distinct("user_id").cast("bigint").alias("mau"),
        )
        .withColumnRenamed("d", "day")
    )


@_q(
    "a_key_skew_report",
    """
WITH c AS (
  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n FROM orders GROUP BY o_custkey
),
r AS (
  SELECT n, row_number() OVER (ORDER BY n ASC, o_custkey ASC) AS rk FROM c
),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n_keys,
         CAST(sum(n) AS BIGINT) AS n_rows,
         CAST(max(n) AS BIGINT) AS max_n,
         sum(rk * n) AS srk
  FROM r
)
SELECT n_keys, n_rows, max_n,
       round(max_n::DOUBLE * n_keys / n_rows, 4) AS skew_ratio,
       round((2.0 * srk) / (n_keys * n_rows) - (n_keys + 1.0) / n_keys, 4) AS gini
FROM s
""",
)
def a_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnosis: per-key row counts for orders'
    customer key, summarized as max/avg skew ratio and the Gini
    coefficient (rank formula G = 2Σ(rank·n)/(K·N) − (K+1)/K over
    counts sorted ascending with an integer tie-break) — the report
    you run BEFORE choosing between a plain shuffle join, AQE skew
    splitting, or the salted join (j_salted_skew_join implements the
    cure; this measures the disease). The fact table collapses to
    per-key counts in one partial-aggregated shuffle; ranking runs
    over keys, not rows. All inputs to the final two divisions are
    exact integers."""
    o = _t(spark, sf_dir, "orders")
    c = o.groupBy("o_custkey").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    # r11 global-window sweep: the Gini rank runs distributed
    # (operators/rank.global_row_number) — per-key counts grow with
    # the key domain, so the bare-orderBy row_number funneled them
    # through one partition.
    from graphql_api_etl_spark.operators.rank import global_row_number

    r = global_row_number(
        c, [F.asc("n"), F.asc("o_custkey")], out_col="rk"
    ).select("n", "rk")
    s = r.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum("n").cast("bigint").alias("n_rows"),
        F.max("n").cast("bigint").alias("max_n"),
        F.sum(F.col("rk") * F.col("n")).alias("srk"),
    )
    return s.select(
        "n_keys", "n_rows", "max_n",
        F.round(F.col("max_n").cast("double") * F.col("n_keys") / F.col("n_rows"), 4).alias("skew_ratio"),
        F.round(
            (F.lit(2.0) * F.col("srk")) / (F.col("n_keys") * F.col("n_rows"))
            - (F.col("n_keys") + F.lit(1.0)) / F.col("n_keys"),
            4,
        ).alias("gini"),
    )


@_q(
    "source_fixed_width",
    """
SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars
FROM documents
""",
)
def source_fixed_width(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width-record source — the mainframe/EDI layout every ETL
    tool supports: records are written once as 20-byte lines
    (doc_id: 10, right-aligned · lang: 2 · n_chars: 8, right-aligned),
    read back as raw text, and sliced by POSITION with native
    substring/trim/cast — no delimiter logic at all. The differential
    compares the parsed fields against the parquet originals, so any
    off-by-one in the column offsets breaks the match. Newline-framed
    → parallel scan like the text-lines source; parsing is map-only
    codegen."""
    path, cached = _layout_cache_path(sf_dir, "documents_fixedwidth", ["documents"])
    docs = _t(spark, sf_dir, "documents")
    if not cached:
        _publish_layout(
            lambda tmp: docs.select(
                F.concat(
                    F.lpad(F.col("doc_id").cast("string"), 10, " "),
                    F.rpad(F.col("lang"), 2, " "),
                    F.lpad(F.col("n_chars").cast("string"), 8, " "),
                ).alias("value")
            ).write.mode("overwrite").text(tmp),
            path,
        )
    lines = spark.read.text(path)
    return lines.select(
        F.trim(F.substring("value", 1, 10)).cast("bigint").alias("doc_id"),
        F.trim(F.substring("value", 11, 2)).alias("lang"),
        F.trim(F.substring("value", 13, 8)).cast("bigint").alias("n_chars"),
    )


@_q(
    "a_audience_overlap",
    """
WITH flags AS (
  SELECT user_id,
         max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS f_click,
         max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS f_view,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS f_purchase
  FROM events GROUP BY user_id
)
SELECT f_click = 1 AS did_click, f_view = 1 AS did_view,
       f_purchase = 1 AS did_purchase,
       CAST(count(*) AS BIGINT) AS n_users
FROM flags GROUP BY did_click, did_view, did_purchase
""",
)
def a_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap segmentation (the Venn-diagram / audience-
    builder primitive): exact user counts for every observed
    combination of click/view/purchase activity. The stream collapses
    to one boolean flag row per user in a single partial-aggregated
    shuffle (conditional max — no distinct explosion); the 2³-group
    rollup over that dim-sized table is free. At 100 TB the flag
    aggregate is the same one pass; adding segments adds columns, not
    shuffles (contrast with N self-joins of per-segment user lists,
    the naive shape)."""
    ev = _t(spark, sf_dir, "events")
    flags = ev.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("f_click"),
        F.max(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("f_view"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("f_purchase"),
    )
    return (
        flags.select(
            (F.col("f_click") == 1).alias("did_click"),
            (F.col("f_view") == 1).alias("did_view"),
            (F.col("f_purchase") == 1).alias("did_purchase"),
        )
        .groupBy("did_click", "did_view", "did_purchase")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
    )


@_q(
    "a_market_basket",
    """
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
n_orders AS (
  SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n FROM items
),
item_n AS (
  SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_item
  FROM items GROUP BY l_partkey
),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         CAST(count(*) AS BIGINT) AS n_ab
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY part_a, part_b
)
SELECT part_a, part_b, n_ab,
       round(n_ab::DOUBLE / n_orders.n, 6) AS support,
       round(n_ab::DOUBLE * n_orders.n / (ia.n_item * ib.n_item), 4) AS lift
FROM pairs, n_orders
JOIN item_n ia ON ia.l_partkey = pairs.part_a
JOIN item_n ib ON ib.l_partkey = pairs.part_b
ORDER BY n_ab DESC, part_a, part_b LIMIT 20
""",
)
def a_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association mining: top co-purchased part pairs
    with support and lift — the classic retail affinity analysis. The
    basket self-join is keyed on the ORDER (equi-join, pairs bounded
    by Σ k_o² over per-order item counts k_o ≈ a few — never a
    cartesian over parts), the pair aggregate is one shuffle on the
    (a, b) key, and both marginal-count joins broadcast the dim-sized
    item-frequency table. Lift's inputs are exact integers; top-20 is
    TakeOrderedAndProject with integer-first tie-breaks. At 100 TB
    the same plan holds because pair cardinality scales with orders,
    not parts² (a pathological mega-basket would need the per-order
    item cap any production basket job applies)."""
    li = _t(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    n_orders = items.agg(
        F.count_distinct("l_orderkey").cast("bigint").alias("n")
    )
    item_n = items.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_item")
    )
    a = items.select(F.col("l_orderkey"), F.col("l_partkey").alias("part_a"))
    b = items.select(F.col("l_orderkey"), F.col("l_partkey").alias("part_b"))
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ab"))
    )
    ia = item_n.select(F.col("l_partkey").alias("part_a"), F.col("n_item").alias("na"))
    ib = item_n.select(F.col("l_partkey").alias("part_b"), F.col("n_item").alias("nb"))
    return (
        pairs.crossJoin(F.broadcast(n_orders))
        .join(F.broadcast(ia), "part_a")
        .join(F.broadcast(ib), "part_b")
        .select(
            "part_a", "part_b", "n_ab",
            F.round(F.col("n_ab").cast("double") / F.col("n"), 6).alias("support"),
            F.round(
                F.col("n_ab").cast("double") * F.col("n") / (F.col("na") * F.col("nb")), 4
            ).alias("lift"),
        )
        .orderBy(F.desc("n_ab"), F.asc("part_a"), F.asc("part_b"))
        .limit(20)
    )


@_q(
    "x_try_cast_tolerant",
    """
WITH raw AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN 'x' || CAST(n_chars AS VARCHAR)
              WHEN doc_id % 3 = 1 THEN ' ' || CAST(n_chars AS VARCHAR) || ' '
              ELSE CAST(n_chars AS VARCHAR) END AS n_str,
         CASE WHEN doc_id % 4 = 0 THEN '1970-13-45'
              ELSE '2024-01-' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') END
           AS d_str
  FROM documents
)
SELECT doc_id,
       TRY_CAST(n_str AS BIGINT) AS n_parsed,
       TRY_CAST(n_str AS BIGINT) IS NULL AS n_bad,
       strftime(TRY_CAST(d_str AS DATE), '%Y-%m-%d') AS d_parsed,
       TRY_CAST(d_str AS DATE) IS NULL AS d_bad
FROM raw
""",
)
def x_try_cast_tolerant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-tolerant ingestion casts (try_cast): malformed numerics
    and impossible dates become NULL instead of failing the job — the
    difference between a 100 TB backfill that finishes with a
    quarantine column and one that dies at hour nine on a single bad
    record. The entry manufactures three numeric shapes (corrupt,
    whitespace-padded — which BOTH engines' try_cast accept after
    trim — and clean) plus invalid calendar dates, and emits value +
    validity flag for each; the flags drive the dead-letter split in
    a real pipeline. Map-only codegen; ANSI-safe on both engines."""
    docs = _t(spark, sf_dir, "documents")
    n_str = (
        F.when(F.col("doc_id") % 3 == 0, F.concat(F.lit("x"), F.col("n_chars").cast("string")))
        .when(F.col("doc_id") % 3 == 1, F.concat(F.lit(" "), F.col("n_chars").cast("string"), F.lit(" ")))
        .otherwise(F.col("n_chars").cast("string"))
    )
    d_str = F.when(F.col("doc_id") % 4 == 0, F.lit("1970-13-45")).otherwise(
        F.concat(F.lit("2024-01-"), F.lpad((F.col("doc_id") % 28 + 1).cast("string"), 2, "0"))
    )
    raw = docs.select("doc_id", n_str.alias("n_str"), d_str.alias("d_str"))
    n_parsed = F.expr("try_cast(n_str AS BIGINT)")
    d_parsed = F.expr("try_cast(d_str AS DATE)")
    return raw.select(
        "doc_id",
        n_parsed.alias("n_parsed"),
        n_parsed.isNull().alias("n_bad"),
        F.date_format(d_parsed, "yyyy-MM-dd").alias("d_parsed"),
        d_parsed.isNull().alias("d_bad"),
    )


@_q(
    "a_group_ols",
    """
WITH s AS (
  SELECT l_returnflag,
         CAST(count(*) AS BIGINT) AS n,
         sum(l_quantity) AS sx,
         sum(l_extendedprice) AS sy,
         sum(l_quantity * l_extendedprice) AS sxy,
         sum(l_quantity * l_quantity) AS sxx,
         sum(l_extendedprice * l_extendedprice) AS syy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       round((sxy - sx * sy / n) / (sxx - sx * sx / n), 4) AS slope,
       round(sy / n - ((sxy - sx * sy / n) / (sxx - sx * sx / n)) * sx / n, 2)
         AS intercept,
       round(pow(sxy - sx * sy / n, 2) / ((sxx - sx * sx / n) * (syy - sy * sy / n)), 6)
         AS r2
FROM s
""",
)
def a_group_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group least-squares fit with R²: price-vs-quantity
    regression per return flag, from the five classic moment sums —
    ONE partial-aggregable pass over the fact table, closed-form
    normal equations on the 3-row result (no iterative optimizer, no
    second scan). This is the grouped-ML-lite pattern (trend per
    segment at warehouse scale); the moment sums shuffle as 5 doubles
    per group regardless of data size. Both engines accumulate
    doubles in their own order, so outputs are rounded at ratio level
    (slope 4dp, R² 6dp) — the sums agree to ~1e-12 relative at this
    scale, far inside the rounding margin."""
    li = _t(spark, sf_dir, "lineitem")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("l_quantity").alias("sx"),
        F.sum("l_extendedprice").alias("sy"),
        F.sum(F.col("l_quantity") * F.col("l_extendedprice")).alias("sxy"),
        F.sum(F.col("l_quantity") * F.col("l_quantity")).alias("sxx"),
        F.sum(F.col("l_extendedprice") * F.col("l_extendedprice")).alias("syy"),
    )
    cov = F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n")
    varx = F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")
    vary = F.col("syy") - F.col("sy") * F.col("sy") / F.col("n")
    slope = cov / varx
    return s.select(
        "l_returnflag", "n",
        F.round(slope, 4).alias("slope"),
        F.round(F.col("sy") / F.col("n") - slope * F.col("sx") / F.col("n"), 2).alias("intercept"),
        F.round(F.pow(cov, 2) / (varx * vary), 6).alias("r2"),
    )


@_q(
    "layout_dpp_prune",
    """
SELECT n_name,
       CAST(count(*) AS BIGINT) AS n_items,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN supplier ON l_suppkey   = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
""",
)
def layout_dpp_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning over a hive-partitioned fact copy —
    the third layout lever next to bucketing (tpch_q3_bucketed) and
    Z-order (layout_zorder_prune): lineitem denormalized with its
    supplier nation and written ``partitionBy(s_nationkey)`` (25
    directories), then queried through a dim filter that is NOT on
    the partition column (region name → nation). Static pruning can't
    touch the scan; at runtime Spark builds the pruning set from the
    broadcast dim subtree and reads only the ~5 matching partitions —
    at 100 TB that is the difference between scanning everything and
    scanning one region. The executed plan carries
    ``dynamicpruning`` in the scan's PartitionFilters
    (plan-asserted in tests/test_skew_and_tables.py); the oracle
    reads the RAW tables, so the hash match also proves the
    partitioned rewrite is lossless."""
    path, cached = _layout_cache_path(sf_dir, "lineitem_bynation", ["lineitem", "supplier"])
    if not cached:

        def _build(tmp: str) -> None:
            fact = (
                _t(spark, sf_dir, "lineitem")
                .join(
                    F.broadcast(_t(spark, sf_dir, "supplier")),
                    F.col("l_suppkey") == F.col("s_suppkey"),
                )
                .select("l_extendedprice", "l_discount", "s_nationkey")
            )
            # one file per partition dir: repartition on the partition
            # column so 25 writers each own one directory
            fact.repartition("s_nationkey").write.partitionBy("s_nationkey").parquet(tmp)

        _publish_layout(_build, path)
    fact = spark.read.parquet(path)
    dim = _t(spark, sf_dir, "nation").join(
        F.broadcast(_t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")),
        F.col("n_regionkey") == F.col("r_regionkey"),
    )
    return (
        fact.join(F.broadcast(dim), fact.s_nationkey == dim.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
        )
    )


@_q(
    "a_autocorr_lag",
    """
WITH daily AS (
  SELECT datediff('day', DATE '2024-01-01', CAST(date_trunc('day', ts) AS DATE)) AS idx,
         CAST(count(*) AS DOUBLE) AS n
  FROM events GROUP BY 1
)
SELECT CAST(lag_days AS BIGINT) AS lag_days,
       CAST(count(*) AS BIGINT) AS n_pairs,
       round(corr(a.n, b.n), 6) AS autocorr
FROM (SELECT unnest(range(1, 8)) AS lag_days) lags
CROSS JOIN daily a
JOIN daily b ON b.idx = a.idx + lags.lag_days
GROUP BY lag_days
""",
)
def a_autocorr_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the daily event-count series at lags 1–7 —
    the seasonality screen (weekly cycle shows as a lag-7 peak) a
    metrics pipeline runs before forecasting. Shape: one
    partial-aggregable rollup of the fact table to |days| rows, then
    all lag pairs via a self-equi-join on shifted day index — a
    deliberate alternative to a 7×LAG window, which would need a
    single-partition sort; the join formulation stays key-partitioned
    no matter how long the series grows (years × metrics). corr() is
    Pearson on both engines over day-count pairs; rounded 6dp, far
    above the ~1e-12 accumulation-order noise on a 30-point series."""
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.count(F.lit(1)).cast("double").alias("n"))
        .select(
            F.datediff(F.col("day").cast("date"), F.lit("2024-01-01").cast("date")).alias("idx"),
            "n",
        )
    )
    lags = spark.range(1, 8).select(F.col("id").cast("bigint").alias("lag_days"))
    a = daily.select(F.col("idx").alias("a_idx"), F.col("n").alias("a_n"))
    b = daily.select(F.col("idx").alias("b_idx"), F.col("n").alias("b_n"))
    pairs = lags.crossJoin(a).join(
        b, F.col("b_idx") == F.col("a_idx") + F.col("lag_days")
    )
    return pairs.groupBy("lag_days").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.round(F.corr("a_n", "b_n"), 6).alias("autocorr"),
    )


# Graph-analytics entries (derived co-purchase / trade graphs) register
# themselves on import, same bottom-import pattern as queries_llm.
from graphql_api_etl_spark import queries_graph  # noqa: E402,F401

# Structured-Streaming entries (availableNow micro-batch runs under the
# same differential gate), same bottom-import pattern.
from graphql_api_etl_spark import queries_stream  # noqa: E402,F401


@_q(
    "a_heavy_hitters_cms",
    r"""
WITH ev AS (SELECT user_id, CAST(user_id AS VARCHAR) AS k FROM events),
hb AS (
  SELECT user_id, d,
         CAST('0x' || substr(md5(CAST(d AS VARCHAR) || ':' || k), 1, 7) AS BIGINT) % 256 AS bucket
  FROM ev CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS d)
),
counters AS (SELECT d, bucket, CAST(count(*) AS BIGINT) AS cnt FROM hb GROUP BY d, bucket),
exact AS (SELECT user_id, k, CAST(count(*) AS BIGINT) AS exact_n FROM ev GROUP BY user_id, k),
cand AS (SELECT user_id, k, exact_n FROM exact ORDER BY exact_n DESC, user_id LIMIT 15),
cb AS (
  SELECT user_id, exact_n, d,
         CAST('0x' || substr(md5(CAST(d AS VARCHAR) || ':' || k), 1, 7) AS BIGINT) % 256 AS bucket
  FROM cand CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS d)
)
SELECT user_id, exact_n,
       CAST(min(cnt) AS BIGINT) AS cms_n,
       min(cnt) >= exact_n AS never_under
FROM cb JOIN counters USING (d, bucket)
GROUP BY user_id, exact_n
""",
)
def a_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch heavy hitters (Cormode–Muthukrishnan) over the
    event stream: a d=4 × w=256 counter sketch built in ONE shuffled
    aggregation (the 4-row hash fan-out happens map-side and the
    partial aggregate collapses it to ≤ d·w rows per task), then the
    top-15 exact keys re-estimated from the sketch. The output pins the
    CMS one-sided-error invariant — `never_under` must be true for
    every key on both engines, and `cms_n` itself must match because
    the md5 hash family is engine-portable (the 28-bit house hash,
    seeded per row d).

    Why it matters at 100 TB: the sketch is a FIXED 1024-cell
    mergeable summary regardless of key cardinality — the distributed
    pattern for frequency estimation when the key space (urls, ngrams,
    user ids) no longer fits a hash aggregate. The exact side here
    exists to adjudicate estimate quality in the differential; a real
    pipeline ships only the counters.

    Cites ETL:563–569 (the reference's only frequency surface is exact
    value_counts — this is its sketch-sized scale path)."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.col("user_id").cast("string").alias("k")
    )

    def bucket(d: int) -> F.Column:
        h = F.md5(F.concat(F.lit(f"{d}:"), F.col("k")))
        return F.conv(F.substring(h, 1, 7), 16, 10).cast("bigint") % 256

    fan = F.array(
        *[F.struct(F.lit(d).alias("d"), bucket(d).alias("bucket")) for d in range(4)]
    )
    rows = ev.select(F.explode(fan).alias("hb"))
    counters = rows.groupBy(
        F.col("hb.d").alias("d"), F.col("hb.bucket").alias("bucket")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    exact = ev.groupBy("user_id", "k").agg(
        F.count(F.lit(1)).cast("bigint").alias("exact_n")
    )
    cand = exact.orderBy(F.desc("exact_n"), F.asc("user_id")).limit(15)
    cb = cand.select("user_id", "exact_n", "k").select(
        "user_id", "exact_n", F.explode(fan).alias("hb")
    )
    return (
        cb.select("user_id", "exact_n", F.col("hb.d").alias("d"), F.col("hb.bucket").alias("bucket"))
        .join(F.broadcast(counters), ["d", "bucket"])
        .groupBy("user_id", "exact_n")
        .agg(F.min("cnt").cast("bigint").alias("cms_n"))
        .select(
            "user_id", "exact_n", "cms_n",
            (F.col("cms_n") >= F.col("exact_n")).alias("never_under"),
        )
    )


@_q(
    "j_fuzzy_blocked",
    r"""
WITH clean AS (
  SELECT c_custkey AS clean_id, c_name AS clean_name,
         substr(c_name, 16, 3) AS blk
  FROM customer
),
dirty AS (
  SELECT c_custkey AS dirty_id,
         substr(c_name, 1, pos - 1) || 'x' || substr(c_name, pos + 1, 100) AS dirty_name
  FROM (SELECT c_custkey, c_name, 10 + c_custkey % 9 AS pos FROM customer)
),
db AS (SELECT dirty_id, dirty_name, substr(dirty_name, 16, 3) AS blk FROM dirty)
SELECT dirty_id, clean_id,
       CAST(levenshtein(dirty_name, clean_name) AS BIGINT) AS dist,
       dirty_id = clean_id AS is_self
FROM db JOIN clean USING (blk)
WHERE levenshtein(dirty_name, clean_name) <= 2
""",
)
def j_fuzzy_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy join (record linkage): match a deterministically
    corrupted name register (one digit substituted with 'x' at
    position 10 + key%9) back to the clean register with
    levenshtein ≤ 2, candidates generated by EQUI-JOIN blocking on a
    3-char suffix key — never all-pairs. This is the standard
    blocking-then-verify linkage shape (F4/F5's exact membership
    generalized to approximate identity, ETL:426–447).

    The differential also pins the honest failure modes: corruptions
    landing INSIDE the block key (pos ≥ 16) produce unmatchable
    blocks (documented recall loss — real blocking schemes use
    multiple redundant keys), and distinct customers sharing a block
    within distance 2 surface as non-self matches (is_self = false),
    so both match classes carry evidence.

    Scale: cost is Σ per-block |dirty|·|clean| with near-unique block
    keys, and levenshtein runs only on candidates. Both engines
    implement unit-cost Wagner–Fischer, so `dist` is engine-exact."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    clean = cust.select(
        F.col("c_custkey").alias("clean_id"),
        F.col("c_name").alias("clean_name"),
        F.substring("c_name", 16, 3).alias("blk"),
    )
    dirty = cust.select(
        F.col("c_custkey").alias("dirty_id"),
        F.expr(
            "concat(substr(c_name, 1, 10 + c_custkey % 9 - 1), 'x', "
            "substr(c_name, 10 + c_custkey % 9 + 1, 100))"
        ).alias("dirty_name"),
    ).select(
        "dirty_id", "dirty_name", F.substring("dirty_name", 16, 3).alias("blk")
    )
    dist = F.levenshtein("dirty_name", "clean_name")
    return (
        dirty.join(clean, "blk")
        .filter(dist <= 2)
        .select(
            "dirty_id", "clean_id",
            dist.cast("bigint").alias("dist"),
            (F.col("dirty_id") == F.col("clean_id")).alias("is_self"),
        )
    )


@_q(
    "events_hypertable_rollup",
    """
WITH base AS (
  SELECT date_trunc('hour', ts) AS h,
         date_trunc('day', ts) AS d,
         date_trunc('week', ts) AS wk,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
)
SELECT CASE WHEN h IS NOT NULL THEN 'hour'
            WHEN d IS NOT NULL THEN 'day'
            ELSE 'week' END AS grain,
       strftime(coalesce(h, d, wk), '%Y-%m-%d %H:%M:%S') AS bucket_start,
       count(*) AS n_events,
       CAST(sum(cents) AS BIGINT) AS total_cents
FROM base
GROUP BY GROUPING SETS ((h), (d), (wk))
""",
)
def events_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-grain rollup (the TimescaleDB
    continuous-aggregate shape): hour, day, AND week buckets of the
    event stream in ONE pass via GROUPING SETS over pre-computed
    truncs — Spark's Expand fans each row to its three grains BEFORE
    the partial aggregation, so the exchange carries |buckets|·3 rows
    (combiner-collapsed map-side), not |events|·3, and the scan runs
    once instead of three times. Values are fixed-pointed to cents
    per ROW (round-half-up) before the BIGINT sum, so bucket totals
    are exact integers regardless of engine summation order — the
    difference from round(sum(double)) that matters as buckets widen
    to weeks. Both engines week-truncate to Monday.

    At 100 TB this is the continuous-aggregate maintenance job: the
    same plan over an incremental time slice, merged into per-grain
    materializations (cf. layout_* entries for the storage side)."""
    ev = _t(spark, sf_dir, "events")
    ev.createOrReplaceTempView("__events_ht")
    return spark.sql(
        """
        WITH base AS (
          SELECT date_trunc('hour', ts) AS h,
                 date_trunc('day', ts) AS d,
                 date_trunc('week', ts) AS wk,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
          FROM __events_ht
        )
        SELECT CASE WHEN h IS NOT NULL THEN 'hour'
                    WHEN d IS NOT NULL THEN 'day'
                    ELSE 'week' END AS grain,
               date_format(coalesce(h, d, wk), 'yyyy-MM-dd HH:mm:ss') AS bucket_start,
               count(*) AS n_events,
               CAST(sum(cents) AS BIGINT) AS total_cents
        FROM base
        GROUP BY GROUPING SETS ((h), (d), (wk))
        """
    )


@_q(
    "a_ab_test_ztest",
    """
WITH assigned AS (
  SELECT CASE WHEN CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 7) AS BIGINT) % 2 = 0
              THEN 'A' ELSE 'B' END AS arm,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
),
m AS (
  SELECT arm,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(cents) AS BIGINT) AS s1,
         CAST(sum(cents * cents) AS BIGINT) AS s2
  FROM assigned GROUP BY arm
),
w AS (
  SELECT max(CASE WHEN arm = 'A' THEN n END) AS n_a,
         max(CASE WHEN arm = 'A' THEN s1 END) AS s1_a,
         max(CASE WHEN arm = 'A' THEN s2 END) AS s2_a,
         max(CASE WHEN arm = 'B' THEN n END) AS n_b,
         max(CASE WHEN arm = 'B' THEN s1 END) AS s1_b,
         max(CASE WHEN arm = 'B' THEN s2 END) AS s2_b
  FROM m
),
z AS (
  SELECT n_a, n_b,
         CAST(s1_a AS DOUBLE) / n_a AS mean_a,
         CAST(s1_b AS DOUBLE) / n_b AS mean_b,
         (CAST(s2_a AS DOUBLE) - CAST(s1_a AS DOUBLE) * s1_a / n_a) / (n_a - 1) AS var_a,
         (CAST(s2_b AS DOUBLE) - CAST(s1_b AS DOUBLE) * s1_b / n_b) / (n_b - 1) AS var_b
  FROM w
)
SELECT n_a, n_b,
       CAST(floor((mean_b - mean_a) * 10000) AS BIGINT) AS mean_diff_centimilli,
       CAST(floor((mean_b - mean_a) / sqrt(var_a / n_a + var_b / n_b) * 10000) AS BIGINT) AS z_tenthousandths,
       abs((mean_b - mean_a) / sqrt(var_a / n_a + var_b / n_b)) > 1.96 AS significant
FROM z
""",
)
def a_ab_test_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Welch z-test on mean event value between
    deterministically assigned experiment arms (md5(user_id) % 2 —
    the same engine-portable uniform every sampler entry uses, so
    assignment is stable across runs/engines and consistent PER USER,
    the property a real experiment needs). The experimentation-
    analytics primitive: at 100 TB this exact plan scores thousands
    of metric×experiment pairs from one pass of per-arm moment sums.

    Determinism: values are fixed-pointed to cents per ROW, so the
    per-arm moment sums (n, Σx, Σx²) are exact BIGINTs regardless of
    partitioning/summation order (Σx² ≈ 1e14 at sf0.1 — comfortably
    in range); mean/variance/z are then computed from those exact
    integers by an identical expression tree, and outputs are
    fixed-pointed. The moments pivot to one row via the max-CASE
    conditional-aggregation idiom (a_filtered_agg), not a join.

    Plan: one partial-aggregable shuffle to 2 rows, then constant
    work. Welch (unequal-variance) form; n≫30 makes the z reference
    valid, and the gate |z| > 1.96 is pinned by both engines."""
    ev = _t(spark, sf_dir, "events")
    arm = F.when(
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 7), 16, 10)
        .cast("bigint") % 2 == 0,
        "A",
    ).otherwise("B")
    cents = F.floor(F.col("value") * 100 + 0.5).cast("bigint")
    m = (
        ev.select(arm.alias("arm"), cents.alias("cents"))
        .groupBy("arm")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("cents").cast("bigint").alias("s1"),
            F.sum(F.col("cents") * F.col("cents")).cast("bigint").alias("s2"),
        )
    )
    pick = lambda a, c: F.max(F.when(F.col("arm") == a, F.col(c)))  # noqa: E731
    w = m.agg(
        pick("A", "n").alias("n_a"), pick("A", "s1").alias("s1_a"), pick("A", "s2").alias("s2_a"),
        pick("B", "n").alias("n_b"), pick("B", "s1").alias("s1_b"), pick("B", "s2").alias("s2_b"),
    )
    mean_a = F.col("s1_a").cast("double") / F.col("n_a")
    mean_b = F.col("s1_b").cast("double") / F.col("n_b")
    var_a = (
        F.col("s2_a").cast("double") - F.col("s1_a").cast("double") * F.col("s1_a") / F.col("n_a")
    ) / (F.col("n_a") - 1)
    var_b = (
        F.col("s2_b").cast("double") - F.col("s1_b").cast("double") * F.col("s1_b") / F.col("n_b")
    ) / (F.col("n_b") - 1)
    zval = (mean_b - mean_a) / F.sqrt(var_a / F.col("n_a") + var_b / F.col("n_b"))
    return w.select(
        "n_a", "n_b",
        F.floor((mean_b - mean_a) * 10000).cast("bigint").alias("mean_diff_centimilli"),
        F.floor(zval * 10000).cast("bigint").alias("z_tenthousandths"),
        (F.abs(zval) > 1.96).alias("significant"),
    )


@_q(
    "a_mad_outliers",
    """
WITH c AS (
  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents FROM events
),
med AS (
  SELECT event_type, CAST(2 * quantile_cont(cents, 0.5) AS BIGINT) AS med2
  FROM c GROUP BY event_type
),
dev AS (
  SELECT c.event_type, cents, med2, abs(2 * cents - med2) AS dev2
  FROM c JOIN med USING (event_type)
),
mad AS (
  SELECT event_type, CAST(2 * quantile_cont(dev2, 0.5) AS BIGINT) AS mad4
  FROM dev GROUP BY event_type
)
SELECT dev.event_type,
       CAST(count(*) AS BIGINT) AS n,
       med2, mad4,
       CAST(count(*) FILTER (WHERE 2 * dev2 > 3 * mad4) AS BIGINT) AS n_outliers
FROM dev JOIN mad USING (event_type)
GROUP BY dev.event_type, med2, mad4
""",
)
def a_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier screen via median absolute deviation: per event
    type, the median and MAD of event value with a count of points
    beyond the 3×MAD fence — the data-cleaning staple that, unlike
    the z-score entries, is immune to the outliers it hunts.

    Exactness trick: medians of integers are integers or exact
    halves, so doubling makes EVERY quantity a BIGINT — cents → med2
    (half-cents), deviations → dev2 (half-cents), MAD → mad4
    (quarter-cents) — and the fence test 2·dev2 > 3·mad4 compares
    exact integers. No float survives past each percentile's exact
    interpolation, so engines cannot disagree.

    Plan: two percentile aggregations per group (sort-based within
    group; swap approx_percentile at scale — a_approx_percentiles is
    the house pattern) with dim-sized results broadcast back onto the
    map-side deviation/fence computation."""
    ev = _t(spark, sf_dir, "events")
    c = ev.select(
        "event_type", F.floor(F.col("value") * 100 + 0.5).cast("bigint").alias("cents")
    )
    med = c.groupBy("event_type").agg(
        (2 * F.expr("percentile(cents, 0.5)")).cast("bigint").alias("med2")
    )
    dev = c.join(F.broadcast(med), "event_type").select(
        "event_type", "med2", F.abs(2 * F.col("cents") - F.col("med2")).alias("dev2")
    )
    mad = dev.groupBy("event_type").agg(
        (2 * F.expr("percentile(dev2, 0.5)")).cast("bigint").alias("mad4")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "med2", "mad4")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum((2 * F.col("dev2") > 3 * F.col("mad4")).cast("bigint"))
            .cast("bigint")
            .alias("n_outliers"),
        )
        .select("event_type", "n", "med2", "mad4", "n_outliers")
    )


@_q(
    "a_abc_pareto",
    """
WITH rev AS (
  SELECT l_partkey,
         CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
  FROM lineitem GROUP BY l_partkey
),
tot AS (SELECT CAST(sum(cents) AS BIGINT) AS total FROM rev),
ranked AS (
  SELECT cents, total,
         CAST(sum(cents) OVER (ORDER BY cents DESC, l_partkey
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum
  FROM rev CROSS JOIN tot
)
SELECT CASE WHEN 100 * cum <= 80 * total THEN 'A'
            WHEN 100 * cum <= 95 * total THEN 'B'
            ELSE 'C' END AS abc_class,
       CAST(count(*) AS BIGINT) AS n_parts,
       CAST(sum(cents) AS BIGINT) AS class_cents
FROM ranked GROUP BY 1
""",
)
def a_abc_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto concentration analysis: parts ranked by revenue,
    classified by cumulative share (A ≤ 80%, B ≤ 95%, C the tail) —
    the assortment/inventory 80-20 report. Class boundaries compare
    100·cum ≤ k·total as exact BIGINTs (revenue fixed-pointed to
    cents per row before aggregation), so no float share ever exists
    to disagree about, and the running sum's (cents DESC, partkey)
    order is total.

    Plan: one key-balanced shuffle to per-part revenue, then the
    running share is computed DISTRIBUTED (r11:
    operators/rank.global_running_sums — range-repartition +
    per-partition running sum + broadcast offsets), so the plan holds
    even when |parts| outgrows a single partition."""
    li = _t(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    tot = rev.agg(F.sum("cents").cast("bigint").alias("total"))
    # r11 global-window sweep: the running share runs distributed
    # (operators/rank.global_running_sums — one range shuffle) so the
    # plan no longer degrades to a single partition when |parts|
    # outgrows one executor (the caveat the old docstring carried).
    from graphql_api_etl_spark.operators.rank import global_running_sums

    ranked = (
        global_running_sums(
            rev, [F.desc("cents"), F.asc("l_partkey")], {"cum_raw": "cents"}
        )
        .crossJoin(F.broadcast(tot))
        .select("cents", "total", F.col("cum_raw").cast("bigint").alias("cum"))
    )
    cls = F.when(100 * F.col("cum") <= 80 * F.col("total"), "A").when(
        100 * F.col("cum") <= 95 * F.col("total"), "B"
    ).otherwise("C")
    return ranked.groupBy(cls.alias("abc_class")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        F.sum("cents").cast("bigint").alias("class_cents"),
    )


@_q(
    "events_resample_interpolate",
    """
WITH p AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
),
pe AS (SELECT event_type, epoch_ms(h) AS t, cents FROM p),
spans AS (SELECT event_type, min(h) AS lo, max(h) AS hi FROM p GROUP BY event_type),
grid AS (
  SELECT event_type,
         epoch_ms(unnest(generate_series(lo, hi, INTERVAL 15 MINUTE))) AS t
  FROM spans
),
u AS (
  SELECT event_type, t, 0 AS ord, cents, t AS pt FROM pe
  UNION ALL
  SELECT event_type, t, 1 AS ord, NULL AS cents, NULL AS pt FROM grid
),
f AS (
  SELECT event_type, t, ord,
         last_value(cents IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY t, ord
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
         last_value(pt IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY t, ord
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_t,
         first_value(cents IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY t, ord
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
         first_value(pt IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY t, ord
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_t
  FROM u
)
SELECT event_type, t AS grid_ms,
       CAST(CASE WHEN prev_t = t THEN prev_v
                 ELSE (prev_v * (next_t - t) + next_v * (t - prev_t)) // (next_t - prev_t)
            END AS BIGINT) AS interp_cents,
       prev_t = t AS is_observed
FROM f WHERE ord = 1
""",
)
def events_resample_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling with LINEAR interpolation (the
    InfluxDB/Timescale `interpolate(linear)` shape, complementing
    events_gapfill's carry-forward): per event type, hourly
    observations re-sampled onto a 15-minute grid, each grid point
    linearly interpolated between its straddling observations.

    Neighbor search is ONE sorted pass per series: grid points are
    unioned with observations (observations sort first at equal
    timestamps via the ord column), then two ignore-nulls window
    scans — last_value backward, first_value forward — give the
    straddling (t, value) pairs; no self-join, no per-row search. The
    interpolation weight formula (prev·(tn−g) + next·(g−tp)) ÷
    (tn−tp) runs ENTIRELY in BIGINTs (cents × ms offsets ≈ 1e12,
    well in range; both engines' integer division agrees on the
    positive numerator), with grid-coincident points short-circuited
    to the exact observation, so no float exists anywhere.

    Scale: the heavy input collapses to per-(type, hour) rows in one
    partial-aggregated shuffle BEFORE any window; the windows
    partition by series key, so state is per-series and
    span-bounded."""
    ev = _t(spark, sf_dir, "events")
    p = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(
        F.sum(F.floor(F.col("value") * 100 + 0.5).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    pe = p.select("event_type", F.unix_millis("h").alias("t"), "cents").select(
        "event_type", "t", F.lit(0).alias("ord"), "cents", F.col("t").alias("pt")
    )
    spans = p.groupBy("event_type").agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
    grid = spans.select(
        "event_type",
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 15 MINUTE"))).alias("g"),
    ).select(
        "event_type",
        F.unix_millis("g").alias("t"),
        F.lit(1).alias("ord"),
        F.lit(None).cast("bigint").alias("cents"),
        F.lit(None).cast("bigint").alias("pt"),
    )
    u = pe.unionByName(grid)
    back = (
        W.partitionBy("event_type")
        .orderBy("t", "ord")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    fwd = (
        W.partitionBy("event_type")
        .orderBy("t", "ord")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    f = u.select(
        "event_type", "t", "ord",
        F.last("cents", ignorenulls=True).over(back).alias("prev_v"),
        F.last("pt", ignorenulls=True).over(back).alias("prev_t"),
        F.first("cents", ignorenulls=True).over(fwd).alias("next_v"),
        F.first("pt", ignorenulls=True).over(fwd).alias("next_t"),
    ).filter(F.col("ord") == 1)
    interp = F.when(F.col("prev_t") == F.col("t"), F.col("prev_v")).otherwise(
        F.expr(
            "(prev_v * (next_t - t) + next_v * (t - prev_t)) div (next_t - prev_t)"
        )
    )
    return f.select(
        "event_type",
        F.col("t").alias("grid_ms"),
        interp.cast("bigint").alias("interp_cents"),
        (F.col("prev_t") == F.col("t")).alias("is_observed"),
    )


@_q(
    "ts_sax_symbols",
    """
WITH d AS (
  SELECT event_type, date_trunc('day', ts) AS day, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
r AS (
  SELECT event_type, day, n,
         CAST(row_number() OVER (PARTITION BY event_type ORDER BY day) AS BIGINT) AS rn
  FROM d
),
m AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS nd,
         CAST(sum(n) AS BIGINT) AS s1,
         CAST(sum(n * n) AS BIGINT) AS s2
  FROM d GROUP BY event_type
),
paa AS (
  SELECT r.event_type, (rn - 1) // 4 AS window_idx,
         CAST(sum(n) AS BIGINT) AS wsum, CAST(count(*) AS BIGINT) AS wn,
         max(s1) AS s1, max(s2) AS s2, max(nd) AS nd
  FROM r JOIN m ON r.event_type = m.event_type
  GROUP BY r.event_type, (rn - 1) // 4
),
z AS (
  SELECT event_type, window_idx,
         (CAST(wsum AS DOUBLE) / wn - CAST(s1 AS DOUBLE) / nd)
         / sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / nd) / nd) AS zval
  FROM paa
)
SELECT event_type, CAST(window_idx AS BIGINT) AS window_idx,
       CAST(floor(zval * 1000000) AS BIGINT) AS paa_micro,
       CASE WHEN zval < -0.6745 THEN 'a'
            WHEN zval < 0.0 THEN 'b'
            WHEN zval < 0.6745 THEN 'c'
            ELSE 'd' END AS symbol
FROM z
""",
)
def ts_sax_symbols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX symbolization (Lin/Keogh Symbolic Aggregate approXimation)
    of the per-type daily activity series: z-normalize, piecewise-
    aggregate over 4-day windows, discretize against the standard
    N(0,1) quartile breakpoints (±0.6745, 0) into an 'a'–'d'
    alphabet — the representation distributed time-series similarity
    search indexes (cf. the EDBT'19 streaming-similarity line in
    PAPERS.md): symbolic words prefilter candidates, exact distance
    verifies, the same block-then-verify shape as the dedup family.

    Determinism: day counts and the z-score moment sums (n, Σx, Σx²)
    are exact BIGINTs, the z expression tree is identical on both
    engines (bit-identical doubles), PAA means divide exact integers,
    and breakpoints are shared literals — so symbols can only differ
    if a value lands within one ulp of a breakpoint, excluded by the
    driver-checked paa_micro fixed-point column.

    Plan: the stream collapses to (type, day) in one partial-
    aggregated shuffle; the ranking window and PAA regrouping are
    per-series (dim-bounded partitions); moments ride a broadcast."""
    ev = _t(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    wd = W.partitionBy("event_type").orderBy("day")
    r = d.withColumn("rn", F.row_number().over(wd).cast("bigint"))
    m = d.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("nd"),
        F.sum("n").cast("bigint").alias("s1"),
        F.sum(F.col("n") * F.col("n")).cast("bigint").alias("s2"),
    )
    paa = (
        r.join(F.broadcast(m), "event_type")
        .groupBy("event_type", F.expr("(rn - 1) div 4").alias("window_idx"))
        .agg(
            F.sum("n").cast("bigint").alias("wsum"),
            F.count(F.lit(1)).cast("bigint").alias("wn"),
            F.max("s1").alias("s1"),
            F.max("s2").alias("s2"),
            F.max("nd").alias("nd"),
        )
    )
    zval = (
        F.col("wsum").cast("double") / F.col("wn")
        - F.col("s1").cast("double") / F.col("nd")
    ) / F.sqrt(
        (F.col("s2").cast("double") - F.col("s1").cast("double") * F.col("s1") / F.col("nd"))
        / F.col("nd")
    )
    sym = (
        F.when(zval < -0.6745, "a")
        .when(zval < 0.0, "b")
        .when(zval < 0.6745, "c")
        .otherwise("d")
    )
    return paa.select(
        "event_type",
        F.col("window_idx").cast("bigint").alias("window_idx"),
        F.floor(zval * 1000000).cast("bigint").alias("paa_micro"),
        sym.alias("symbol"),
    )


@_q(
    "ts_similarity_topk",
    """
WITH d AS (
  SELECT user_id, date_trunc('day', ts) AS day, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
s AS (SELECT user_id, CAST(sum(n * n) AS BIGINT) AS s2 FROM d GROUP BY user_id),
q AS (SELECT user_id AS query_user, day, n AS qn FROM d WHERE user_id < 5),
joint AS (
  SELECT query_user, d.user_id AS neighbor_user,
         CAST(sum(qn * n) AS BIGINT) AS sab
  FROM q JOIN d USING (day)
  WHERE d.user_id != query_user
  GROUP BY query_user, d.user_id
),
dist AS (
  SELECT query_user, neighbor_user,
         sq.s2 + sn.s2 - 2 * sab AS dist2
  FROM joint
  JOIN s sq ON sq.user_id = query_user
  JOIN s sn ON sn.user_id = neighbor_user
),
ranked AS (
  SELECT query_user, neighbor_user, CAST(dist2 AS BIGINT) AS dist2,
         CAST(row_number() OVER (PARTITION BY query_user
                                 ORDER BY dist2, neighbor_user) AS BIGINT) AS rank
  FROM dist
)
SELECT query_user, neighbor_user, dist2, rank FROM ranked WHERE rank <= 5
""",
)
def ts_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series similarity search over SPARSE daily-activity
    series (the EDBT'19/REPOSE distributed-similarity family): top-5
    nearest users to each query user by squared Euclidean distance
    between daily event-count series — WITHOUT materializing dense
    day vectors. ‖a−b‖² = Σa² + Σb² − 2·Σ aₔbₔ, so per-user energies
    come from one rollup and the cross term only needs an INVERTED-
    INDEX join on day (pairs sharing no active day are maximally
    distant and never become candidates — the same block-then-verify
    candidate rule the dedup family uses, replayed identically by the
    oracle). Counts are BIGINTs, so distances and the (dist2,
    neighbor) ranking are exact integers.

    Scale: the stream collapses to (user, day) once; the candidate
    join fans out per shared day and re-collapses in a partial-
    aggregated (query, neighbor) sum; query rows broadcast. Day keys
    are naturally balanced; a viral day would salt like
    j_salted_skew_join."""
    ev = _t(spark, sf_dir, "events")
    d = ev.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    s = d.groupBy("user_id").agg(
        F.sum(F.col("n") * F.col("n")).cast("bigint").alias("s2")
    )
    q = F.broadcast(
        d.filter(F.col("user_id") < 5).select(
            F.col("user_id").alias("query_user"), "day", F.col("n").alias("qn")
        )
    )
    joint = (
        q.join(d, "day")
        .filter(F.col("user_id") != F.col("query_user"))
        .groupBy("query_user", F.col("user_id").alias("neighbor_user"))
        .agg(F.sum(F.col("qn") * F.col("n")).cast("bigint").alias("sab"))
    )
    sq = s.select(F.col("user_id").alias("query_user"), F.col("s2").alias("s2q"))
    sn = s.select(F.col("user_id").alias("neighbor_user"), F.col("s2").alias("s2n"))
    dist = (
        joint.join(F.broadcast(sq), "query_user")
        .join(sn, "neighbor_user")
        .select(
            "query_user", "neighbor_user",
            (F.col("s2q") + F.col("s2n") - 2 * F.col("sab")).cast("bigint").alias("dist2"),
        )
    )
    w = W.partitionBy("query_user").orderBy("dist2", "neighbor_user")
    return (
        dist.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= 5)
    )


@_q(
    "a_forecast_seasonal_naive",
    """
WITH d AS (
  SELECT event_type, date_trunc('day', ts) AS day, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
e AS (
  SELECT cur.event_type,
         abs(cur.n - prior.n) AS abs_err
  FROM d cur JOIN d prior
    ON cur.event_type = prior.event_type AND prior.day + INTERVAL 7 DAY = cur.day
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_days,
       CAST(sum(abs_err) AS BIGINT) AS total_abs_err,
       CAST((1000000 * sum(abs_err)) // count(*) AS BIGINT) AS mae_micro
FROM e GROUP BY event_type
""",
)
def a_forecast_seasonal_naive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naïve forecast baseline evaluation: ŷ(d) = y(d−7)
    per event type, scored by MAE over every day with a week-prior
    observation — the baseline any demand/traffic forecasting job
    must beat before a model earns its compute (and the denominator
    of MASE). The 7-day shift is a self EQUI-join on
    (type, day−7d) — not a row-offset lag, so missing days never
    misalign the season — and every quantity (counts, absolute
    errors, the ×1e6 integer-division MAE) is exact BIGINT
    arithmetic.

    Plan: the stream collapses to (type, day) in one partial-
    aggregated shuffle; the shifted self-join and final rollup run on
    the day-grain frame (|types|·|days|), orders of magnitude below
    the input."""
    ev = _t(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    cur = d.select("event_type", "day", F.col("n").alias("n_cur"))
    prior = d.select(
        "event_type",
        (F.col("day") + F.expr("INTERVAL 7 DAY")).alias("day"),
        F.col("n").alias("n_prior"),
    )
    e = cur.join(prior, ["event_type", "day"]).select(
        "event_type", F.abs(F.col("n_cur") - F.col("n_prior")).alias("abs_err")
    )
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("abs_err").cast("bigint").alias("total_abs_err"),
        F.expr("(1000000 * sum(abs_err)) div count(*)").cast("bigint").alias("mae_micro"),
    )


@_q(
    "dq_table_checksums",
    """
SELECT 'orders' AS table_name,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || '|' ||
                 CAST(o_custkey AS VARCHAR) || '|' || o_orderstatus), 1, 7) AS BIGINT))
            AS BIGINT) AS checksum
FROM orders
UNION ALL
SELECT 'lineitem',
       CAST(count(*) AS BIGINT),
       CAST(sum(CAST('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || '|' ||
                 CAST(l_linenumber AS VARCHAR) || '|' || l_returnflag), 1, 7) AS BIGINT))
            AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'customer',
       CAST(count(*) AS BIGINT),
       CAST(sum(CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || '|' ||
                 c_mktsegment), 1, 7) AS BIGINT))
            AS BIGINT)
FROM customer
""",
)
def dq_table_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent table checksums: per table, row count plus
    the BIGINT SUM of a per-row md5-derived 28-bit hash over its key
    columns — the cross-system reconciliation primitive (does the
    warehouse copy equal the lake copy?) that needs no sort, no
    collect, and MERGES: partial sums from any partitioning of the
    data agree, so each side computes its fingerprint independently
    and ships back 16 bytes. Hash inputs are integers and enum
    strings joined with an explicit separator (no float rendering,
    no ambiguity between ('ab','c') and ('a','bc')); the engine-
    portable md5 prefix is the house hash, so both engines — and any
    third system implementing the same recipe — produce identical
    checksums. Sum capacity: 2^28-max hashes × 6e8 rows ≈ 2^57,
    within BIGINT.

    Plan: one map-side hash + partial-aggregated single-row reduce
    per table; the UNION ALL of three one-row frames is free.
    Reference parity: the shape-gate accounting of ETL:1033–1060
    upgraded to content equality."""
    def cks(df: DataFrame, name: str, concat_col: F.Column) -> DataFrame:
        h = F.conv(F.substring(F.md5(concat_col), 1, 7), 16, 10).cast("bigint")
        return df.agg(
            F.lit(name).alias("table_name"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(h).cast("bigint").alias("checksum"),
        ).select("table_name", "n_rows", "checksum")

    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    c = _t(spark, sf_dir, "customer")
    return (
        cks(
            o, "orders",
            F.concat_ws("|", F.col("o_orderkey").cast("string"),
                        F.col("o_custkey").cast("string"), F.col("o_orderstatus")),
        )
        .unionByName(
            cks(
                li, "lineitem",
                F.concat_ws("|", F.col("l_orderkey").cast("string"),
                            F.col("l_linenumber").cast("string"), F.col("l_returnflag")),
            )
        )
        .unionByName(
            cks(
                c, "customer",
                F.concat_ws("|", F.col("c_custkey").cast("string"), F.col("c_mktsegment")),
            )
        )
    )


@_q(
    "source_xml_records",
    """
SELECT doc_id, lang,
       md5(text || ' <&">') AS text_md5
FROM documents
""",
)
def source_xml_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-framed XML record source (the log-export/feed layout:
    one `<doc id=".." lang=".."><text>..</text></doc>` element per
    line): written once from the documents table WITH an injected
    `' <&">'` suffix so every XML entity class is actually exercised,
    escaped on write and unescaped on read by native replace chains
    (amp FIRST on escape, LAST on unescape — the order that makes the
    pair a bijection), parsed by a single anchored regexp_extract.
    The differential compares md5(round-tripped text) against
    md5(original || salt) computed from the parquet originals, so a
    broken escape order, a greedy-match slip, or any byte corruption
    breaks the hash.

    Newline-framed → splittable parallel scan (like the text-lines
    and fixed-width sources); parse+unescape is map-only codegen.
    Full nested-DOM XML goes through the executor-side stdlib codec
    instead, as sources/xlsx.py does for its zip+XML container."""
    path, cached = _layout_cache_path(sf_dir, "documents_xml", ["documents"])
    docs = _t(spark, sf_dir, "documents")
    if not cached:
        salted = F.concat(F.col("text"), F.lit(' <&">'))
        esc = salted
        for a, b in [("&", "&amp;"), ("<", "&lt;"), (">", "&gt;"), ('"', "&quot;")]:
            esc = F.replace(esc, F.lit(a), F.lit(b))
        line = F.concat(
            F.lit('<doc id="'), F.col("doc_id").cast("string"),
            F.lit('" lang="'), F.col("lang"),
            F.lit('"><text>'), esc, F.lit("</text></doc>"),
        )
        _publish_layout(
            lambda tmp: docs.select(line.alias("value"))
            .write.mode("overwrite")
            .text(tmp),
            path,
        )
    lines = spark.read.text(path)
    pat = r'^<doc id="([0-9]+)" lang="([a-z]+)"><text>(.*)</text></doc>$'
    parsed = lines.select(
        F.regexp_extract("value", pat, 1).cast("bigint").alias("doc_id"),
        F.regexp_extract("value", pat, 2).alias("lang"),
        F.regexp_extract("value", pat, 3).alias("raw"),
    )
    un = F.col("raw")
    for a, b in [("&quot;", '"'), ("&gt;", ">"), ("&lt;", "<"), ("&amp;", "&")]:
        un = F.replace(un, F.lit(a), F.lit(b))
    return parsed.select("doc_id", "lang", F.md5(un).alias("text_md5"))


@_q(
    "a_dow_seasonality",
    """
WITH d AS (
  SELECT event_type,
         (epoch_ms(date_trunc('day', ts)) // 86400000 + 4) % 7 AS dow
  FROM events
),
c AS (
  SELECT event_type, dow, CAST(count(*) AS BIGINT) AS o
  FROM d GROUP BY event_type, dow
),
cc AS (
  SELECT event_type, dow, o,
         sum(o) OVER (PARTITION BY event_type) AS n,
         max(o) OVER (PARTITION BY event_type) AS mx
  FROM c
),
t AS (
  SELECT event_type, CAST(max(n) AS BIGINT) AS n,
         CAST(sum((7 * o - n) * (7 * o - n)) AS BIGINT) AS ss,
         CAST(min(CASE WHEN o = mx THEN dow END) AS BIGINT) AS peak_dow
  FROM cc GROUP BY event_type
)
SELECT event_type, n,
       CAST((1000000 * ss) // (7 * n) AS BIGINT) AS chi2_micro,
       peak_dow
FROM t
""",
)
def a_dow_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality screen: per event type, the χ²
    statistic against a uniform weekly profile plus the peak day —
    the is-there-a-weekly-cycle gate run before any seasonal model
    (cf. a_forecast_seasonal_naive, which assumes the cycle this
    measures). With e = n/7, χ² = Σ(o−e)²/e = Σ(7o−n)² / (7n) — so
    the statistic is a ×1e6 integer division of EXACT BIGINT sums;
    day-of-week itself is the engine-independent epoch-day formula
    ((days since 1970-01-01 + 4) mod 7, Sunday=0), not each engine's
    dayofweek() convention. Peak day ties resolve to the smallest
    dow on both sides.

    Plan: one partial-aggregated shuffle to (type, dow) — 7 rows per
    type — then window/rollup arithmetic on that dim-sized frame."""
    ev = _t(spark, sf_dir, "events")
    dow = (
        F.floor(F.unix_millis(F.date_trunc("day", F.col("ts"))) / 86400000) + 4
    ) % 7
    c = ev.select("event_type", dow.alias("dow")).groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).cast("bigint").alias("o")
    )
    wt = W.partitionBy("event_type")
    cc = c.select(
        "event_type", "dow", "o",
        F.sum("o").over(wt).alias("n"),
        F.max("o").over(wt).alias("mx"),
    )
    dev = 7 * F.col("o") - F.col("n")
    t = cc.groupBy("event_type", "n").agg(
        F.sum(dev * dev).cast("bigint").alias("ss"),
        F.min(F.when(F.col("o") == F.col("mx"), F.col("dow"))).cast("bigint").alias("peak_dow"),
    )
    return t.select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        F.expr("(1000000 * ss) div (7 * n)").cast("bigint").alias("chi2_micro"),
        "peak_dow",
    )


@_q(
    "a_growth_accounting",
    """
WITH a AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events
),
lagged AS (
  SELECT user_id, week,
         lag(week) OVER (PARTITION BY user_id ORDER BY week) AS prev_week
  FROM a
),
st AS (
  SELECT week,
         CAST(count(*) AS BIGINT) AS n_active,
         CAST(sum(CASE WHEN prev_week IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
         CAST(sum(CASE WHEN prev_week = week - INTERVAL 7 DAY THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
         CAST(sum(CASE WHEN prev_week IS NOT NULL
                        AND prev_week < week - INTERVAL 7 DAY THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected
  FROM lagged GROUP BY week
)
SELECT strftime(cur.week, '%Y-%m-%d') AS week,
       cur.n_active, cur.n_new, cur.n_retained, cur.n_resurrected,
       CAST(coalesce(prev.n_active - cur.n_retained, 0) AS BIGINT) AS n_churned
FROM st cur LEFT JOIN st prev ON prev.week = cur.week - INTERVAL 7 DAY
""",
)
def a_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly growth accounting (the new/retained/resurrected/churned
    decomposition every product-analytics stack reports): each active
    (user, week) is classified by the user's previous active week —
    never seen → new, exactly last week → retained, older → 
    resurrected — and churn(w) = active(w−1) − retained(w) falls out
    of a self-join of the weekly rollup, no per-user lead pass. The
    identity n_active = n_new + n_retained + n_resurrected holds by
    construction (the three cases partition the lag domain), and
    everything is exact integer counts over Monday-truncated weeks.

    Plan: one distinct shuffle to (user, week), one per-user lag
    window, one week rollup; the churn self-join runs on the
    week-grain frame. At 100 TB the distinct is the only input-sized
    exchange."""
    ev = _t(spark, sf_dir, "events")
    a = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("week")
    ).distinct()
    wl = W.partitionBy("user_id").orderBy("week")
    lagged = a.withColumn("prev_week", F.lag("week").over(wl))
    wk = F.col("week")
    prev7 = wk - F.expr("INTERVAL 7 DAY")
    st = lagged.groupBy("week").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_active"),
        F.sum(F.when(F.col("prev_week").isNull(), 1).otherwise(0))
        .cast("bigint").alias("n_new"),
        F.sum(F.when(F.col("prev_week") == prev7, 1).otherwise(0))
        .cast("bigint").alias("n_retained"),
        F.sum(
            F.when(
                F.col("prev_week").isNotNull() & (F.col("prev_week") < prev7), 1
            ).otherwise(0)
        ).cast("bigint").alias("n_resurrected"),
    )
    cur = st
    prev = st.select(
        (F.col("week") + F.expr("INTERVAL 7 DAY")).alias("week"),
        F.col("n_active").alias("prev_active"),
    )
    return (
        cur.join(prev, "week", "left")
        .select(
            F.date_format("week", "yyyy-MM-dd").alias("week"),
            "n_active", "n_new", "n_retained", "n_resurrected",
            F.coalesce(F.col("prev_active") - F.col("n_retained"), F.lit(0))
            .cast("bigint")
            .alias("n_churned"),
        )
    )


@_q(
    "a_decile_lift",
    """
WITH b AS (
  SELECT quantile_cont(n_chars, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS bs
  FROM documents
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_all,
         CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en_all
  FROM documents
),
bucketed AS (
  SELECT CAST(1 + (CASE WHEN n_chars > bs[1] THEN 1 ELSE 0 END)
                + (CASE WHEN n_chars > bs[2] THEN 1 ELSE 0 END)
                + (CASE WHEN n_chars > bs[3] THEN 1 ELSE 0 END)
                + (CASE WHEN n_chars > bs[4] THEN 1 ELSE 0 END)
                + (CASE WHEN n_chars > bs[5] THEN 1 ELSE 0 END)
                + (CASE WHEN n_chars > bs[6] THEN 1 ELSE 0 END)
                + (CASE WHEN n_chars > bs[7] THEN 1 ELSE 0 END)
                + (CASE WHEN n_chars > bs[8] THEN 1 ELSE 0 END)
                + (CASE WHEN n_chars > bs[9] THEN 1 ELSE 0 END) AS BIGINT) AS decile,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_en
  FROM documents CROSS JOIN b
)
SELECT decile,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(is_en) AS BIGINT) AS n_en,
       CAST((1000000 * sum(is_en)) // count(*) AS BIGINT) AS en_rate_micro,
       CAST((1000000 * sum(is_en) * max(n_all)) // (count(*) * max(n_en_all)) AS BIGINT) AS lift_micro
FROM bucketed CROSS JOIN tot
GROUP BY decile
""",
)
def a_decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile lift/gains table (the model-evaluation and bias-report
    staple): documents bucketed into length deciles via ONE bounded
    percentile pass + a broadcast comparison chain (a_quantile_
    buckets' scalable global-ntile alternative — no global sort),
    then per-decile English share and its lift over the corpus base
    rate. Rates and lifts are ×1e6 integer divisions of exact counts
    — only the decile BOUNDARIES are doubles, and both engines
    interpolate them from identical integer multisets, so bucket
    membership cannot drift. Ties share a bucket by construction
    (comparison against boundaries, not rank), which is what makes
    the bucketing growth-stable.

    Swap length for any model score and lang for any label and this
    is the lift chart a quality classifier ships with."""
    docs = _t(spark, sf_dir, "documents").select("n_chars", "lang")
    b = docs.agg(
        F.expr(
            "percentile(n_chars, array(0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9))"
        ).alias("bs")
    )
    tot = docs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_all"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
        .cast("bigint")
        .alias("n_en_all"),
    )
    decile = F.lit(1)
    for i in range(9):
        decile = decile + F.when(
            F.col("n_chars") > F.element_at("bs", i + 1), 1
        ).otherwise(0)
    bucketed = (
        docs.crossJoin(F.broadcast(b))
        .select(
            decile.cast("bigint").alias("decile"),
            F.when(F.col("lang") == "en", 1).otherwise(0).alias("is_en"),
        )
        .crossJoin(F.broadcast(tot))
    )
    return bucketed.groupBy("decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("is_en").cast("bigint").alias("n_en"),
        F.expr("(1000000 * sum(is_en)) div count(*)").cast("bigint").alias("en_rate_micro"),
        F.expr("(1000000 * sum(is_en) * max(n_all)) div (count(*) * max(n_en_all))")
        .cast("bigint")
        .alias("lift_micro"),
    )


@_q(
    "events_slo_error_budget",
    """
WITH d AS (
  SELECT date_trunc('day', ts) AS day,
         CAST(count(*) AS BIGINT) AS n_total,
         CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_err
  FROM events GROUP BY 1
),
m AS (
  SELECT day, n_total, n_err,
         date_trunc('month', day) AS month,
         CAST(sum(n_err) OVER (PARTITION BY date_trunc('month', day) ORDER BY day
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_err,
         CAST(sum(n_total) OVER (PARTITION BY date_trunc('month', day) ORDER BY day
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_total
  FROM d
)
SELECT strftime(day, '%Y-%m-%d') AS day,
       n_total, n_err,
       100 * n_err > 20 * n_total AS day_breach,
       5 * cum_err > cum_total AS budget_exhausted
FROM m
""",
)
def events_slo_error_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLO error-budget tracking (the SRE burn-rate report): per day,
    the error share against a 20% SLO (both verdict branches occur on
    this stream) and the month-to-date budget state as a running
    comparison 5·Σerr > Σtotal — every check is an exact BIGINT
    cross-multiplication, so no error RATE is ever computed as a
    float. Daily breach and cumulative exhaustion differ exactly when
    a bad day lands in an otherwise-healthy month, which is the
    signal burn-rate alerting exists for.

    Plan: one partial-aggregated shuffle to day grain; the running
    windows partition by month over the day-grain frame (bounded
    partitions, no global sort)."""
    ev = _t(spark, sf_dir, "events")
    d = ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_total"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("bigint")
        .alias("n_err"),
    )
    month = F.date_trunc("month", F.col("day"))
    wm = W.partitionBy(month).orderBy("day").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    m = d.select(
        "day", "n_total", "n_err",
        F.sum("n_err").over(wm).cast("bigint").alias("cum_err"),
        F.sum("n_total").over(wm).cast("bigint").alias("cum_total"),
    )
    return m.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n_total", "n_err",
        (100 * F.col("n_err") > 20 * F.col("n_total")).alias("day_breach"),
        (5 * F.col("cum_err") > F.col("cum_total")).alias("budget_exhausted"),
    )


@_q(
    "a_contingency_chisq",
    """
WITH j AS (
  SELECT c_mktsegment AS seg, o_orderpriority AS pri
  FROM orders JOIN customer ON o_custkey = c_custkey
),
cell AS (SELECT seg, pri, CAST(count(*) AS BIGINT) AS o FROM j GROUP BY seg, pri),
wr AS (
  SELECT seg, pri, o,
         CAST(sum(o) OVER (PARTITION BY seg) AS BIGINT) AS rt,
         CAST(sum(o) OVER (PARTITION BY pri) AS BIGINT) AS ct,
         CAST(sum(o) OVER () AS BIGINT) AS n
  FROM cell
)
SELECT seg, pri, o,
       CAST(floor(CAST(rt AS DOUBLE) * ct / n * 10000) AS BIGINT) AS expected_tenthousandths,
       CAST(floor((CAST(n AS DOUBLE) * o - CAST(rt AS DOUBLE) * ct)
                  * (CAST(n AS DOUBLE) * o - CAST(rt AS DOUBLE) * ct)
                  / (CAST(n AS DOUBLE) * rt * ct) * 10000) AS BIGINT) AS term_tenthousandths
FROM wr
""",
)
def a_contingency_chisq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contingency-table independence screen: the segment × priority
    χ² decomposition (observed count, expected count under
    independence, and each cell's χ² term) — the "are these two
    dimensions related" analysis behind every cross-tab report.
    Per-cell χ² = (N·o − rt·ct)² / (N·rt·ct): counts and marginals
    are exact BIGINTs from ONE pass (three window sums over the
    |seg|×|pri| cell table share the cell aggregation), and the two
    float quantities are computed by identical pre-cast-double
    expression trees then fixed-pointed — IEEE doubles make both
    engines round the >2⁵³ intermediate products identically.

    Plan: one fact join (dim broadcast), one shuffle to the 25-cell
    table, window marginals on that dim-sized frame."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    j = o.join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey")).select(
        F.col("c_mktsegment").alias("seg"), F.col("o_orderpriority").alias("pri")
    )
    cell = j.groupBy("seg", "pri").agg(F.count(F.lit(1)).cast("bigint").alias("o"))
    wr_ = cell.select(
        "seg", "pri", "o",
        F.sum("o").over(W.partitionBy("seg")).cast("bigint").alias("rt"),
        F.sum("o").over(W.partitionBy("pri")).cast("bigint").alias("ct"),
        F.sum("o").over(
            # global-window-ok: input is the seg×pri cell aggregate — ≤5×5 rows
            W.orderBy(F.lit(1)).rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
        ).cast("bigint").alias("n"),
    )
    nd = F.col("n").cast("double")
    rtd = F.col("rt").cast("double")
    dev = nd * F.col("o") - rtd * F.col("ct")
    return wr_.select(
        "seg", "pri", "o",
        F.floor(rtd * F.col("ct") / F.col("n") * 10000)
        .cast("bigint")
        .alias("expected_tenthousandths"),
        F.floor(dev * dev / (nd * F.col("rt") * F.col("ct")) * 10000)
        .cast("bigint")
        .alias("term_tenthousandths"),
    )


@_q(
    "dq_pseudonymize",
    """
WITH p AS (
  SELECT DISTINCT user_id,
         substr(md5('pepper-2026:' || CAST(user_id AS VARCHAR)), 1, 14) AS pseudonym
  FROM events
)
SELECT CAST(count(*) AS BIGINT) AS n_users,
       CAST(count(DISTINCT pseudonym) AS BIGINT) AS n_pseudonyms,
       CAST(count(*) - count(DISTINCT pseudonym) AS BIGINT) AS n_collisions,
       count(*) = count(DISTINCT pseudonym) AS injective
FROM p
""",
)
def dq_pseudonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic pseudonymization audit (the privacy-engineering
    primitive: replace identifiers with a keyed hash so joins still
    work across datasets, but raw ids never leave the boundary): each
    user maps to a 56-bit peppered-md5 pseudonym, and the entry
    REPORTS the injectivity evidence — user count, pseudonym count,
    collision count — rather than assuming it (at 56 bits the
    birthday bound stays negligible into the billions; the audit is
    what tells you when it stops being). The pepper is a literal here;
    in production it is a secret, which changes nothing in the plan.

    Map-only hash + two distinct aggregates; the same expression
    applied to any table's key column pseudonymizes consistently, so
    cross-table joins survive the masking — the property that makes
    this the standard alternative to sequence-renumbering."""
    ev = _t(spark, sf_dir, "events")
    p = ev.select(
        "user_id",
        F.substring(
            F.md5(F.concat(F.lit("pepper-2026:"), F.col("user_id").cast("string"))),
            1, 14,
        ).alias("pseudonym"),
    ).distinct()
    return p.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.countDistinct("pseudonym").cast("bigint").alias("n_pseudonyms"),
        (F.count(F.lit(1)) - F.countDistinct("pseudonym"))
        .cast("bigint")
        .alias("n_collisions"),
        (F.count(F.lit(1)) == F.countDistinct("pseudonym")).alias("injective"),
    )


@_q(
    "x_decimal_money_exact",
    """
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(l_quantity AS DECIMAL(18, 2))) * 100 AS BIGINT) AS sum_qty_c,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18, 2))) * 100 AS BIGINT) AS sum_price_c,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18, 2))
                * CAST(1 - CAST(l_discount AS DECIMAL(18, 4)) AS DECIMAL(18, 4)))
            * 10000 AS BIGINT) AS sum_disc_price_e4
FROM lineitem GROUP BY l_returnflag
""",
)
def x_decimal_money_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact DECIMAL money arithmetic (the type-discipline twin of
    the float entries' cents fixed-point): quantities and prices cast
    to DECIMAL(18,2/4) at the scan, summed and multiplied in decimal
    space where arithmetic is EXACT and summation order is provably
    irrelevant — what a financial pipeline uses instead of doubles.

    The RESULT columns are BIGINT fixed-point (cents / 1e-4 units),
    not rendered decimals: the r7 driver row hash-failed despite
    byte-identical local values (VERDICT r7 What's-wrong #2 — decimal
    rendering/widening drift between DuckDB builds), so the output is
    representation-proof by construction — an integer has exactly one
    rendering on every engine. The decimal sums are exact multiples of
    their scale unit, so the scale-up multiply and the BIGINT cast are
    lossless, not rounding.

    One partial-aggregable shuffle; decimal aggregation stays inside
    whole-stage codegen (Spark's Decimal128 path), so the exactness
    costs no plan shape."""
    li = _t(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(18,2)")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = (F.lit(1) - F.col("l_discount").cast("decimal(18,4)")).cast("decimal(18,4)")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        (F.sum(qty) * F.lit(100)).cast("bigint").alias("sum_qty_c"),
        (F.sum(price) * F.lit(100)).cast("bigint").alias("sum_price_c"),
        (F.sum(price * disc) * F.lit(10000)).cast("bigint").alias("sum_disc_price_e4"),
    )


@_q(
    "a_survival_km",
    """
WITH u AS (
  SELECT user_id,
         date_trunc('day', min(ts)) AS first_d,
         date_trunc('day', max(ts)) AS last_d
  FROM events GROUP BY user_id
),
mx AS (SELECT max(last_d) AS m FROM u),
lab AS (
  SELECT user_id,
         CAST(epoch_ms(last_d) - epoch_ms(first_d) AS BIGINT) / 86400000 AS t,
         last_d <= m - INTERVAL 7 DAY AS died
  FROM u CROSS JOIN mx
),
byt AS (
  SELECT t,
         CAST(sum(CASE WHEN died THEN 1 ELSE 0 END) AS BIGINT) AS d,
         CAST(sum(CASE WHEN died THEN 0 ELSE 1 END) AS BIGINT) AS c,
         CAST(count(*) AS BIGINT) AS n_at_t
  FROM lab GROUP BY t
),
risk AS (
  SELECT t, d, c,
         CAST((SELECT count(*) FROM lab) AS BIGINT)
         - CAST(coalesce(sum(n_at_t) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n_risk
  FROM byt
),
lg AS (
  SELECT t, d, c, n_risk,
         CAST(floor(ln(CAST(n_risk - d AS DOUBLE) / n_risk) * 1000000000) AS BIGINT) AS l
  FROM risk WHERE d > 0
),
s AS (
  SELECT t, d, c, n_risk,
         CAST(sum(l) OVER (ORDER BY t
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_l
  FROM lg
)
SELECT t, n_risk, d, c,
       CAST(floor(exp(CAST(cum_l AS DOUBLE) / 1000000000) * 1000000) AS BIGINT) AS s_micro
FROM s
""",
)
def a_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier survival estimate of user lifetime (first to last
    active day), with users still active in the final week treated as
    CENSORED — the retention-curve estimator that, unlike the naive
    ECDF, does not count a still-alive user as churned (exactly the
    bias right-censoring exists to fix; the c column shows how many
    censorings each step absorbed).

    Determinism: death/censor counts and at-risk sets are exact
    BIGINTs (at-risk via total − running sum of earlier lifetimes,
    not a per-user scan per step); each hazard factor ln((n−d)/n) is
    fixed-pointed to nano units BEFORE the cumulative sum, so the
    survival product is exp of an exact integer — engine-identical.

    Plan: one shuffle to per-user spans, one to the lifetime-grain
    frame; the running windows and the product run over ≤ |distinct
    lifetimes| rows."""
    ev = _t(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("first_d"),
        F.date_trunc("day", F.max("ts")).alias("last_d"),
    )
    mx = u.agg(F.max("last_d").alias("m"))
    lab = u.crossJoin(F.broadcast(mx)).select(
        "user_id",
        ((F.unix_millis("last_d") - F.unix_millis("first_d")) / 86400000)
        .cast("bigint")
        .alias("t"),
        (F.col("last_d") <= F.col("m") - F.expr("INTERVAL 7 DAY")).alias("died"),
    )
    byt = lab.groupBy("t").agg(
        F.sum(F.when(F.col("died"), 1).otherwise(0)).cast("bigint").alias("d"),
        F.sum(F.when(F.col("died"), 0).otherwise(1)).cast("bigint").alias("c"),
        F.count(F.lit(1)).cast("bigint").alias("n_at_t"),
    )
    total = lab.agg(F.count(F.lit(1)).cast("bigint").alias("n_total"))
    # global-window-ok: input is the weekly-cohort t aggregate — timeline-bounded (weeks)
    wprev = W.orderBy("t").rowsBetween(W.unboundedPreceding, -1)
    risk = byt.crossJoin(F.broadcast(total)).select(
        "t", "d", "c",
        (
            F.col("n_total")
            - F.coalesce(F.sum("n_at_t").over(wprev), F.lit(0))
        ).cast("bigint").alias("n_risk"),
    )
    lg = risk.filter(F.col("d") > 0).select(
        "t", "d", "c", "n_risk",
        F.floor(
            F.log((F.col("n_risk") - F.col("d")).cast("double") / F.col("n_risk"))
            * 1000000000
        ).cast("bigint").alias("l"),
    )
    # global-window-ok: same weekly-cohort t aggregate — timeline-bounded
    wcum = W.orderBy("t").rowsBetween(W.unboundedPreceding, W.currentRow)
    s = lg.select(
        "t", "d", "c", "n_risk",
        F.sum("l").over(wcum).cast("bigint").alias("cum_l"),
    )
    return s.select(
        "t", "n_risk", "d", "c",
        F.floor(F.exp(F.col("cum_l").cast("double") / 1000000000) * 1000000)
        .cast("bigint")
        .alias("s_micro"),
    )


@_q(
    "a_weighted_median",
    """
WITH wv AS (
  SELECT l_returnflag AS flag,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
  FROM lineitem GROUP BY 1, 2
),
r AS (
  SELECT flag, cents, w,
         CAST(sum(w) OVER (PARTITION BY flag ORDER BY cents
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
         CAST(sum(w) OVER (PARTITION BY flag) AS BIGINT) AS total
  FROM wv
)
SELECT flag, total AS w_total,
       CAST(min(CASE WHEN 2 * cum >= total THEN cents END) AS BIGINT) AS wmedian_cents
FROM r GROUP BY flag, total
""",
)
def a_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median (price weighted by quantity, per return flag) —
    the inventory-weighted "typical price" that an unweighted median
    misstates whenever volume correlates with price. No built-in
    exists in either engine; the SCALABLE formulation aggregates to
    the VALUE GRAIN first (one shuffle to (flag, cents) weight sums —
    distinct prices, not line items), then finds the first value
    whose running weight crosses half the total with an integer
    cross-multiplication (2·cum ≥ total — no float share). The
    windows run over the value-grain frame, never the fact table, so
    a 100 TB flag group costs |distinct values| window rows — the
    same reason a_quantile_buckets exists for unweighted quantiles.
    Weights and the lower-weighted-median convention are exact
    BIGINTs throughout."""
    li = _t(spark, sf_dir, "lineitem")
    wv = li.groupBy(
        F.col("l_returnflag").alias("flag"),
        F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("bigint").alias("cents"),
    ).agg(F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("w"))
    wcum = W.partitionBy("flag").orderBy("cents").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    r = wv.select(
        "flag", "cents",
        F.sum("w").over(wcum).cast("bigint").alias("cum"),
        F.sum("w").over(W.partitionBy("flag")).cast("bigint").alias("total"),
    )
    return r.groupBy("flag", F.col("total").alias("w_total")).agg(
        F.min(F.when(2 * F.col("cum") >= F.col("total"), F.col("cents")))
        .cast("bigint")
        .alias("wmedian_cents"),
    )


@_q(
    "events_cusum_changepoint",
    """
WITH d AS (
  SELECT date_trunc('day', ts) AS day, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1
),
t AS (
  SELECT day, n,
         CAST(count(*) OVER () AS BIGINT) AS nd,
         CAST(sum(n) OVER () AS BIGINT) AS total
  FROM d
),
s AS (
  SELECT day, n, nd, total,
         CAST(sum(nd * n - total) OVER (ORDER BY day
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cusum_scaled
  FROM t
),
mx AS (SELECT max(abs(cusum_scaled)) AS peak FROM s)
SELECT strftime(day, '%Y-%m-%d') AS day, n, cusum_scaled,
       abs(cusum_scaled) = peak AS is_changepoint
FROM s CROSS JOIN mx
""",
)
def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection on the daily event volume: the
    running sum of deviations from the global mean peaks exactly
    where the series' level shifts (the classic offline CUSUM
    estimator; z-score anomaly flags POINT outliers, this finds the
    LEVEL CHANGE). Scaled by the day count so everything is integer:
    Σ(nd·nᵢ − total) is nd times the usual Σ(nᵢ − mean), the argmax
    is invariant under the scaling, and the peak test compares exact
    BIGINTs — no mean is ever computed as a float.

    Plan: one partial-aggregated shuffle to day grain; the running
    sum and peak run over the day-grain frame."""
    ev = _t(spark, sf_dir, "events")
    d = ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    # global-window-ok: input is the day-grain aggregate — calendar-bounded
    wall = W.orderBy(F.lit(1)).rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    t = d.select(
        "day", "n",
        F.count(F.lit(1)).over(wall).cast("bigint").alias("nd"),
        F.sum("n").over(wall).cast("bigint").alias("total"),
    )
    # global-window-ok: same day-grain aggregate — calendar-bounded
    wcum = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    s = t.select(
        "day", "n",
        F.sum(F.col("nd") * F.col("n") - F.col("total"))
        .over(wcum)
        .cast("bigint")
        .alias("cusum_scaled"),
    )
    mx = s.agg(F.max(F.abs(F.col("cusum_scaled"))).alias("peak"))
    return s.crossJoin(F.broadcast(mx)).select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n", "cusum_scaled",
        (F.abs(F.col("cusum_scaled")) == F.col("peak")).alias("is_changepoint"),
    )


@_q(
    "events_sma_crossover",
    """
WITH d AS (
  SELECT date_trunc('day', ts) AS day,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1
),
w AS (
  SELECT day, cents,
         CAST(sum(cents) OVER (ORDER BY day ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS BIGINT) AS s5,
         CAST(count(*) OVER (ORDER BY day ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS BIGINT) AS c5,
         CAST(sum(cents) OVER (ORDER BY day ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS BIGINT) AS s20,
         CAST(count(*) OVER (ORDER BY day ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS BIGINT) AS c20
  FROM d
),
f AS (
  SELECT day, cents, s5, s20, 4 * s5 > s20 AS fast_above,
         lag(4 * s5 > s20) OVER (ORDER BY day) AS prev_above
  FROM w WHERE c20 = 20 AND c5 = 5
)
SELECT strftime(day, '%Y-%m-%d') AS day, cents, s5, s20, fast_above,
       coalesce(fast_above AND NOT prev_above, FALSE) AS golden_cross,
       coalesce(NOT fast_above AND prev_above, FALSE) AS death_cross
FROM f
""",
)
def events_sma_crossover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving-average crossover signals (SMA-5 vs SMA-20 on daily
    value, the golden/death-cross trend detector): the comparison
    s5/5 > s20/20 becomes the exact integer cross-multiplication
    4·s5 > s20 — with both windows restricted to FULL frames (c5=5,
    c20=20), the equal-denominator trick holds and no float average
    is ever formed; cross days come from one boolean lag. Per-row
    cents fixed-point keeps the frame sums exact under any order.

    Plan: one partial-aggregated shuffle to day grain; both frame
    windows and the lag share one day-ordered pass over the
    day-grain frame."""
    ev = _t(spark, sf_dir, "events")
    d = ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day")).agg(
        F.sum(F.floor(F.col("value") * 100 + 0.5).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    # global-window-ok: input is the day-grain aggregate — calendar-bounded
    w5 = W.orderBy("day").rowsBetween(-4, 0)
    w20 = W.orderBy("day").rowsBetween(-19, 0)
    w = d.select(
        "day", "cents",
        F.sum("cents").over(w5).cast("bigint").alias("s5"),
        F.count(F.lit(1)).over(w5).cast("bigint").alias("c5"),
        F.sum("cents").over(w20).cast("bigint").alias("s20"),
        F.count(F.lit(1)).over(w20).cast("bigint").alias("c20"),
    )
    fa = 4 * F.col("s5") > F.col("s20")
    f = (
        w.filter((F.col("c20") == 20) & (F.col("c5") == 5))
        .select("day", "cents", "s5", "s20", fa.alias("fast_above"))
        # global-window-ok: same day-grain aggregate — calendar-bounded
        .withColumn("prev_above", F.lag("fast_above").over(W.orderBy("day")))
    )
    return f.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "cents", "s5", "s20", "fast_above",
        F.coalesce(F.col("fast_above") & ~F.col("prev_above"), F.lit(False)).alias(
            "golden_cross"
        ),
        F.coalesce(~F.col("fast_above") & F.col("prev_above"), F.lit(False)).alias(
            "death_cross"
        ),
    )


@_q(
    "a_adoption_curve",
    """
WITH fp AS (
  SELECT l_partkey, o_custkey,
         date_trunc('month', min(o_orderdate)) AS first_m
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY l_partkey, o_custkey
),
top3 AS (
  SELECT l_partkey FROM fp
  GROUP BY l_partkey
  ORDER BY count(*) DESC, l_partkey LIMIT 3
),
m AS (
  SELECT fp.l_partkey, first_m, CAST(count(*) AS BIGINT) AS n_new
  FROM fp JOIN top3 ON fp.l_partkey = top3.l_partkey
  GROUP BY fp.l_partkey, first_m
)
SELECT l_partkey, strftime(first_m, '%Y-%m') AS month, n_new,
       CAST(sum(n_new) OVER (PARTITION BY l_partkey ORDER BY first_m
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_adopters
FROM m
""",
)
def a_adoption_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product adoption curve: per-month NEW adopters and the
    cumulative adopter count for the three most-adopted parts — the
    "rolling distinct customers" question answered the scalable way:
    a rolling COUNT(DISTINCT) is frame-inexpressible (the same wall
    events_active_users documents), but reducing each (part,
    customer) to its FIRST purchase month makes adoption a plain
    count whose running sum IS the distinct cumulative, exactly.
    All counts and the top-3 cut (buyers DESC, partkey) are exact
    integers.

    Plan: one shuffle to first-purchase grain (partial-aggregated
    min), a dim-sized top-k, and a per-part month rollup + running
    window over the month-grain frame."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    fp = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_partkey", "o_custkey")
        .agg(F.date_trunc("month", F.min("o_orderdate")).alias("first_m"))
    )
    top3 = (
        fp.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n_buyers"))
        .orderBy(F.desc("n_buyers"), F.asc("l_partkey"))
        .limit(3)
        .select("l_partkey")
    )
    m = (
        fp.join(F.broadcast(top3), "l_partkey")
        .groupBy("l_partkey", "first_m")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_new"))
    )
    wcum = W.partitionBy("l_partkey").orderBy("first_m").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    return m.select(
        "l_partkey",
        F.date_format("first_m", "yyyy-MM").alias("month"),
        "n_new",
        F.sum("n_new").over(wcum).cast("bigint").alias("cum_adopters"),
    )


@_q(
    "a_repeat_purchase_rate",
    """
WITH pc AS (
  SELECT c_mktsegment AS segment, o_custkey, CAST(count(*) AS BIGINT) AS n_orders
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY c_mktsegment, o_custkey
)
SELECT segment,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_repeat,
       CAST((1000000 * sum(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END)) // count(*)
            AS BIGINT) AS repeat_rate_micro,
       CAST((1000000 * sum(n_orders)) // count(*) AS BIGINT) AS orders_per_customer_micro
FROM pc GROUP BY segment
""",
)
def a_repeat_purchase_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase rate per market segment (the retention KPI
    next to a_growth_accounting's user-level view): share of
    customers with ≥2 orders plus mean orders per customer, both as
    ×1e6 integer divisions of exact counts. Two partial-aggregated
    shuffles — (segment, customer) order counts, then the segment
    rollup — with the dim join broadcast; nothing float, nothing
    input-sized past the first aggregate."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    pc = (
        o.join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.col("c_mktsegment").alias("segment"), "o_custkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))
    )
    return pc.groupBy("segment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum(F.when(F.col("n_orders") >= 2, 1).otherwise(0))
        .cast("bigint")
        .alias("n_repeat"),
        F.expr(
            "(1000000 * sum(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END)) div count(*)"
        ).cast("bigint").alias("repeat_rate_micro"),
        F.expr("(1000000 * sum(n_orders)) div count(*)")
        .cast("bigint")
        .alias("orders_per_customer_micro"),
    )


@_q(
    "a_kmv_distinct_sketch",
    """
WITH dh AS (
  SELECT DISTINCT event_type,
         CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 7) AS BIGINT) AS h
  FROM events
),
r AS (
  SELECT event_type, h,
         row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
  FROM dh
),
sk AS (SELECT event_type, h FROM r WHERE rn <= 64),
per AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS k_eff, CAST(max(h) AS BIGINT) AS kth_hash
  FROM sk GROUP BY event_type
),
ex AS (
  SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
  FROM events GROUP BY event_type
),
mr AS (
  SELECT h, row_number() OVER (ORDER BY h) AS rn
  FROM (SELECT DISTINCT h FROM sk)
),
uper AS (
  SELECT CAST(count(*) AS BIGINT) AS k_eff, CAST(max(h) AS BIGINT) AS kth_hash
  FROM mr WHERE rn <= 64
),
uex AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact FROM events)
SELECT event_type, n_exact, k_eff, kth_hash,
       CAST(CASE WHEN k_eff < 64 THEN k_eff
                 ELSE (CAST(63 AS BIGINT) * 268435456) // kth_hash END AS BIGINT) AS est_distinct
FROM per JOIN ex USING (event_type)
UNION ALL
SELECT '__union__' AS event_type, uex.n_exact, uper.k_eff, uper.kth_hash,
       CAST(CASE WHEN uper.k_eff < 64 THEN uper.k_eff
                 ELSE (CAST(63 AS BIGINT) * 268435456) // uper.kth_hash END AS BIGINT) AS est_distinct
FROM uper CROSS JOIN uex
""",
)
def a_kmv_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) distinct-count sketch per event type,
    PLUS the merged union sketch — the mergeable-cardinality primitive
    behind theta sketches: keep only the k smallest hash values of a
    key; the k-th smallest normalized hash estimates density, so
    distinct ≈ (k−1)/h_(k). Because min-of-mins composes, the union of
    per-segment sketches IS the sketch of the union — the '__union__'
    row is derived from the per-segment sketch ROWS alone, never a
    second pass over the input, which is what makes sketch rollups
    (per-hour → per-day → per-month distincts) O(k) per cell at 100 TB
    where exact COUNT(DISTINCT) re-shuffles the world each time.

    Determinism: the md5-prefix 28-bit hash is the engine-portable
    uniform every sampler entry uses; the estimate
    (k−1)·2²⁸ // h_(k) is a BIGINT division of exact integers, and
    small groups (k_eff < k) degrade to the exact count (the sketch
    holds every value). Exact n_exact per group is kept alongside so
    the error is visible in the output.

    Plan: one distinct shuffle to (type, hash) grain, a per-type
    window over DISTINCT-HASH grain (value grain, not input grain —
    at cluster scale swap for a partial top-k aggregate, the same
    two-phase shape a_two_phase_agg demonstrates), then dim-sized
    aggregates; the union sketch reads the ≤ k·|types| sketch rows."""
    ev = _t(spark, sf_dir, "events")
    h = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 7), 16, 10)
        .cast("bigint")
    )
    dh = ev.select("event_type", h.alias("h")).distinct()
    sk = (
        dh.withColumn(
            "rn", F.row_number().over(W.partitionBy("event_type").orderBy("h"))
        )
        .filter(F.col("rn") <= 64)
        .select("event_type", "h")
    )
    per = sk.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("k_eff"),
        F.max("h").cast("bigint").alias("kth_hash"),
    )
    ex = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("bigint").alias("n_exact")
    )
    est = (
        F.when(F.col("k_eff") < 64, F.col("k_eff"))
        .otherwise(F.expr("(CAST(63 AS BIGINT) * 268435456) div kth_hash"))
        .cast("bigint")
        .alias("est_distinct")
    )
    seg = per.join(ex, "event_type").select(
        "event_type", "n_exact", "k_eff", "kth_hash", est
    )
    uper = (
        sk.select("h")
        .distinct()
        # smallest-64 via orderBy+limit (TakeOrderedAndProject): the
        # old rank-then-filter window sorted every distinct hash
        # through one partition (r11 global-window sweep)
        .orderBy("h")
        .limit(64)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("k_eff"),
            F.max("h").cast("bigint").alias("kth_hash"),
        )
    )
    uex = ev.agg(F.countDistinct("user_id").cast("bigint").alias("n_exact"))
    union_row = uper.crossJoin(uex).select(
        F.lit("__union__").alias("event_type"), "n_exact", "k_eff", "kth_hash", est
    )
    return seg.unionByName(union_row)


@_q(
    "a_hll_registers",
    """
WITH dh AS (
  SELECT DISTINCT event_type,
         CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 7) AS BIGINT) AS h
  FROM events
),
b AS (
  SELECT event_type, h // 1048576 AS bucket, h % 1048576 AS w FROM dh
),
r AS (
  SELECT event_type, bucket,
         max(CASE WHEN w = 0 THEN 21 ELSE 21 - length(bin(w)) END) AS m
  FROM b GROUP BY event_type, bucket
),
agg AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n_present,
         CAST(sum(CAST(1 AS BIGINT) << (21 - m)) AS BIGINT) AS z_present,
         CAST(max(m) AS BIGINT) AS max_register
  FROM r GROUP BY event_type
),
ex AS (
  SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
  FROM events GROUP BY event_type
)
SELECT event_type, n_exact,
       CAST(256 - n_present AS BIGINT) AS n_zero_registers,
       max_register,
       CAST(z_present + (256 - n_present) * 2097152 AS BIGINT) AS z_scaled,
       CAST((CAST(718273 AS BIGINT) * 65536 * 2097152)
            // ((z_present + (256 - n_present) * 2097152) * 1000000)
            AS BIGINT) AS est_raw
FROM agg JOIN ex USING (event_type)
""",
)
def a_hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog register construction per event type, computed
    engine-portably and INTEGER-EXACT end to end: the 28-bit
    md5-prefix hash splits into an 8-bit bucket (m = 256 registers)
    and a 20-bit tail whose leading-zero rank ρ = 21 − bit_length(w)
    (bin() is the engine-portable bit_length: both engines render
    integers without leading zeros); each register keeps max ρ. The
    harmonic denominator Σ 2^−M_j is held as the exact BIGINT
    Σ 2^(21−M_j) (absent registers contribute 2²¹), and the raw
    estimate α₂₅₆·m²/Z uses α₂₅₆ ≈ 0.718273 as a ×1e6 integer so the
    division is a BIGINT // BIGINT both engines agree on to the last
    digit. n_exact sits alongside to make the error visible; the
    linear-counting small-range correction (m·ln(m/V) when zeros
    remain) is deliberately omitted — it would put a transcendental
    float between the engines — and the inputs it needs
    (n_zero_registers) are in the output.

    Where KMV (a_kmv_distinct_sketch) keeps k values, HLL keeps 256
    six-bit registers — the fixed-width mergeable sketch used for
    billions of distinct keys; registers merge by elementwise max, so
    the same rollup algebra applies. Plan: one distinct shuffle to
    (type, hash) grain, partial-aggregated max per (type, bucket) —
    never a window — then a 256-row-per-type rollup."""
    ev = _t(spark, sf_dir, "events")
    h = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 7), 16, 10)
        .cast("bigint")
    )
    dh = ev.select("event_type", h.alias("h")).distinct()
    b = dh.select(
        "event_type",
        F.expr("h div 1048576").alias("bucket"),
        (F.col("h") % 1048576).alias("w"),
    )
    rho = F.when(F.col("w") == 0, F.lit(21)).otherwise(
        F.lit(21) - F.length(F.bin(F.col("w")))
    )
    r = b.groupBy("event_type", "bucket").agg(F.max(rho).alias("m"))
    agg = r.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_present"),
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 21 - m)"))
        .cast("bigint")
        .alias("z_present"),
        F.max("m").cast("bigint").alias("max_register"),
    )
    ex = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("bigint").alias("n_exact")
    )
    z_scaled = (F.col("z_present") + (256 - F.col("n_present")) * 2097152).cast("bigint")
    return agg.join(ex, "event_type").select(
        "event_type",
        "n_exact",
        (256 - F.col("n_present")).cast("bigint").alias("n_zero_registers"),
        "max_register",
        z_scaled.alias("z_scaled"),
        F.expr(
            "(CAST(718273 AS BIGINT) * 65536 * 2097152)"
            " div ((z_present + (256 - n_present) * 2097152) * 1000000)"
        )
        .cast("bigint")
        .alias("est_raw"),
    )


@_q(
    "a_mannwhitney_u",
    """
WITH v AS (
  SELECT CASE WHEN c_mktsegment = 'BUILDING' THEN 'A' ELSE 'B' END AS arm,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders JOIN customer ON o_custkey = c_custkey
  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
),
g AS (
  SELECT cents,
         CAST(count(*) FILTER (WHERE arm = 'A') AS BIGINT) AS na_c,
         CAST(count(*) AS BIGINT) AS t
  FROM v GROUP BY cents
),
r AS (
  SELECT na_c, t,
         CAST(coalesce(sum(t) OVER (ORDER BY cents
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cumb
  FROM g
),
s AS (
  SELECT CAST(sum(na_c) AS BIGINT) AS n_a,
         CAST(sum(t - na_c) AS BIGINT) AS n_b,
         CAST(sum(na_c * (2 * cumb + t + 1)) AS BIGINT) AS r2_a,
         CAST(sum(t * t * t - t) AS BIGINT) AS tie_cubes
  FROM r
)
SELECT n_a, n_b,
       CAST(r2_a - n_a * (n_a + 1) AS BIGINT) AS u2_a,
       tie_cubes,
       CAST(floor((CAST(r2_a - n_a * (n_a + 1) AS DOUBLE) - CAST(n_a AS DOUBLE) * n_b)
            / (2.0 * sqrt(CAST(n_a AS DOUBLE) * n_b / 12.0
               * ((n_a + n_b + 1)
                  - CAST(tie_cubes AS DOUBLE)
                    / (CAST(n_a + n_b AS DOUBLE) * (n_a + n_b - 1)))))
            * 10000) AS BIGINT) AS z_tenthousandths
FROM s
""",
)
def a_mannwhitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test on order value between two market
    segments — the NONPARAMETRIC two-sample test next to
    a_ab_test_ztest's Welch z: it compares distributions by rank, so
    heavy tails and outliers (which order totals have) can't swamp
    it. Everything rank-related is exact: grouping to the VALUE GRAIN
    first (one shuffle to distinct cents with per-arm counts) makes
    tied ranks a per-group constant, and doubling the average-rank
    identity (2·rank̄ = 2·cum_before + t + 1) keeps the rank sum, U
    statistic (u2_a = 2·U_A), and the tie-correction term Σ(t³−t)
    BIGINTs that both engines agree on exactly. Only the final
    normal-approximation z touches doubles — one identical
    expression tree over exact integers, fixed-pointed on output
    (the a_ab_test_ztest convention).

    Plan: broadcast dim join, one partial-aggregated shuffle to cents
    grain, one running window over the value-grain frame (range-
    partition the cum-sum at cluster scale), then a scalar reduce."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    v = (
        o.join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select(
            F.when(F.col("c_mktsegment") == "BUILDING", "A").otherwise("B").alias("arm"),
            F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint").alias("cents"),
        )
    )
    g = v.groupBy("cents").agg(
        F.sum(F.when(F.col("arm") == "A", 1).otherwise(0)).cast("bigint").alias("na_c"),
        F.count(F.lit(1)).cast("bigint").alias("t"),
    )
    # distributed exclusive running sum over the value grain (r11
    # global-window sweep: cent-grain cardinality grows with data, so
    # the bare-orderBy window funneled it through ONE partition;
    # operators/rank.global_running_sum is one range shuffle instead)
    from graphql_api_etl_spark.operators.rank import global_running_sum

    r = global_running_sum(
        g, [F.asc("cents")], "t", out_col="cumb", inclusive=False
    ).select("na_c", "t", F.col("cumb").cast("bigint").alias("cumb"))
    s = r.agg(
        F.sum("na_c").cast("bigint").alias("n_a"),
        F.sum(F.col("t") - F.col("na_c")).cast("bigint").alias("n_b"),
        F.sum(F.col("na_c") * (2 * F.col("cumb") + F.col("t") + 1))
        .cast("bigint")
        .alias("r2_a"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .cast("bigint")
        .alias("tie_cubes"),
    )
    u2_a = F.col("r2_a") - F.col("n_a") * (F.col("n_a") + 1)
    zval = (
        u2_a.cast("double") - F.col("n_a").cast("double") * F.col("n_b")
    ) / (
        2.0
        * F.sqrt(
            F.col("n_a").cast("double") * F.col("n_b") / 12.0
            * (
                (F.col("n_a") + F.col("n_b") + 1)
                - F.col("tie_cubes").cast("double")
                / (
                    (F.col("n_a") + F.col("n_b")).cast("double")
                    * (F.col("n_a") + F.col("n_b") - 1)
                )
            )
        )
    )
    return s.select(
        "n_a", "n_b",
        u2_a.cast("bigint").alias("u2_a"),
        "tie_cubes",
        F.floor(zval * 10000).cast("bigint").alias("z_tenthousandths"),
    )


@_q(
    "a_gini_concentration",
    """
WITH rev AS (
  SELECT c_mktsegment AS segment, o_custkey,
         CAST(sum(CAST(floor(o_totalprice + 0.5) AS BIGINT)) AS BIGINT) AS dollars
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY c_mktsegment, o_custkey
),
idx AS (
  SELECT segment, dollars,
         CAST(row_number() OVER (PARTITION BY segment
              ORDER BY dollars, o_custkey) AS BIGINT) AS i
  FROM rev
),
s AS (
  SELECT segment,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(dollars) AS BIGINT) AS total,
         CAST(sum(i * dollars) AS BIGINT) AS s1,
         CAST(sum(CASE WHEN i > n2.n - n2.n // 10 THEN dollars ELSE 0 END) AS BIGINT) AS top10
  FROM idx JOIN (SELECT segment AS seg2, CAST(count(*) AS BIGINT) AS n
                 FROM rev GROUP BY segment) n2
    ON idx.segment = n2.seg2
  GROUP BY segment
)
SELECT segment, n AS n_customers, total AS total_dollars,
       CAST(floor(1000000.0 * (2.0 * s1 - (CAST(n AS DOUBLE) + 1) * total)
            / (CAST(n AS DOUBLE) * total)) AS BIGINT) AS gini_micro,
       CAST((1000000 * top10) // total AS BIGINT) AS top10_share_micro
FROM s
""",
)
def a_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration profile per market segment: the Gini
    coefficient from the sorted-index identity
    G = (2·Σ i·xᵢ − (n+1)·Σx) / (n·Σx) plus the top-decile revenue
    share — the inequality KPIs behind a_abc_pareto's class bands.
    Customers reduce to (segment, customer) revenue first (one
    partial-aggregated shuffle), so the ranking window runs over
    CUSTOMER grain, never orders; the rank index is pinned by the
    total order (dollars, custkey), making Σ i·xᵢ a deterministic
    exact BIGINT on any partitioning. The final ratios divide exact
    integers small enough to be double-exact (< 2⁵³) with one
    identical expression tree per engine — the (2·S1 − (n+1)·S)
    numerator stays integral until the last division, and the decile
    share is a pure BIGINT division. Whole dollars, not cents, keep
    Σ i·xᵢ comfortably in BIGINT range at any plausible segment size.

    Plan: broadcast dim join, revenue rollup shuffle, per-segment
    window + count join (broadcast at segment-dim size), one final
    partial-aggregated rollup."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    rev = (
        o.join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.col("c_mktsegment").alias("segment"), "o_custkey")
        .agg(
            F.sum(F.floor(F.col("o_totalprice") + 0.5).cast("bigint"))
            .cast("bigint")
            .alias("dollars")
        )
    )
    idx = rev.withColumn(
        "i",
        F.row_number()
        .over(W.partitionBy("segment").orderBy("dollars", "o_custkey"))
        .cast("bigint"),
    )
    n2 = rev.groupBy(F.col("segment").alias("seg2")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    s = (
        idx.join(F.broadcast(n2), F.col("segment") == F.col("seg2"))
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("dollars").cast("bigint").alias("total"),
            F.sum(F.col("i") * F.col("dollars")).cast("bigint").alias("s1"),
            F.sum(
                F.when(
                    F.col("i") > F.col("n") - F.expr("n div 10"), F.col("dollars")
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("top10"),
        )
    )
    gini = F.floor(
        1000000.0
        * (2.0 * F.col("s1") - (F.col("n").cast("double") + 1) * F.col("total"))
        / (F.col("n").cast("double") * F.col("total"))
    ).cast("bigint")
    return s.select(
        "segment",
        F.col("n").alias("n_customers"),
        F.col("total").alias("total_dollars"),
        gini.alias("gini_micro"),
        F.expr("(1000000 * top10) div total").cast("bigint").alias("top10_share_micro"),
    )


@_q(
    "dq_functional_deps",
    """
WITH cands AS (
  SELECT 'customer.c_custkey->c_mktsegment' AS fd, c_custkey AS x,
         c_mktsegment AS y FROM customer
  UNION ALL
  SELECT 'orders.o_custkey->o_orderpriority', CAST(o_custkey AS BIGINT),
         o_orderpriority FROM orders
  UNION ALL
  SELECT 'lineitem.l_orderkey->l_returnflag', CAST(l_orderkey AS BIGINT),
         l_returnflag FROM lineitem
  UNION ALL
  SELECT 'events.user_id->event_type', CAST(user_id AS BIGINT),
         event_type FROM events
),
per_key AS (
  SELECT fd, x, CAST(count(DISTINCT y) AS BIGINT) AS d
  FROM cands GROUP BY fd, x
)
SELECT fd,
       CAST(count(*) AS BIGINT) AS n_keys,
       CAST(sum(CASE WHEN d > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating,
       CAST(max(d) AS BIGINT) AS max_rhs,
       sum(CASE WHEN d > 1 THEN 1 ELSE 0 END) = 0 AS holds,
       CAST((1000000 * sum(CASE WHEN d > 1 THEN 1 ELSE 0 END)) // count(*)
            AS BIGINT) AS violation_micro
FROM per_key GROUP BY fd
""",
)
def dq_functional_deps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency profiling (X → Y candidate checks) — the
    schema-discovery companion to dq_expectations: for each declared
    candidate it reports how many left-hand keys exist, how many
    VIOLATE the dependency (more than one distinct Y), the worst
    fan-out, and the violation rate as a ×1e6 integer. One candidate
    is a true key dependency (customer), the rest quantify real
    fan-outs — exactly the report a pipeline uses to pick join keys,
    validate dimensional conformance, and catch silent grain drift
    after an upstream change.

    Shape: all candidates stack into ONE tall (fd, x, y) relation so
    a single groupBy pipeline profiles them together — adding a
    candidate is a row constructor, not a new plan; per-candidate
    scans stay column-pruned (each SELECT reads two columns). Two
    partial-aggregated shuffles: (fd, x) distinct-Y counts, then the
    per-fd rollup. Exact integers throughout."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    ev = _t(spark, sf_dir, "events")
    cands = (
        c.select(
            F.lit("customer.c_custkey->c_mktsegment").alias("fd"),
            F.col("c_custkey").cast("bigint").alias("x"),
            F.col("c_mktsegment").alias("y"),
        )
        .unionByName(
            o.select(
                F.lit("orders.o_custkey->o_orderpriority").alias("fd"),
                F.col("o_custkey").cast("bigint").alias("x"),
                F.col("o_orderpriority").alias("y"),
            )
        )
        .unionByName(
            li.select(
                F.lit("lineitem.l_orderkey->l_returnflag").alias("fd"),
                F.col("l_orderkey").cast("bigint").alias("x"),
                F.col("l_returnflag").alias("y"),
            )
        )
        .unionByName(
            ev.select(
                F.lit("events.user_id->event_type").alias("fd"),
                F.col("user_id").cast("bigint").alias("x"),
                F.col("event_type").alias("y"),
            )
        )
    )
    per_key = cands.groupBy("fd", "x").agg(
        F.countDistinct("y").cast("bigint").alias("d")
    )
    viol = F.sum(F.when(F.col("d") > 1, 1).otherwise(0))
    return per_key.groupBy("fd").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        viol.cast("bigint").alias("n_violating"),
        F.max("d").cast("bigint").alias("max_rhs"),
        (viol == 0).alias("holds"),
        F.expr(
            "(1000000 * sum(CASE WHEN d > 1 THEN 1 ELSE 0 END)) div count(*)"
        )
        .cast("bigint")
        .alias("violation_micro"),
    )


@_q(
    "a_poisson_bootstrap_ci",
    """
WITH base AS (
  SELECT CAST(o_orderkey AS BIGINT) AS okey,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
),
drawn AS (
  SELECT b, cents,
         CAST('0x' || substr(md5(CAST(okey AS VARCHAR) || ':' || CAST(b AS VARCHAR)), 1, 7)
              AS BIGINT) AS u
  FROM base CROSS JOIN (SELECT unnest(range(40)) AS b)
),
w AS (
  SELECT b, cents,
         CASE WHEN u < 98751885 THEN 0 WHEN u < 197503771 THEN 1
              WHEN u < 246879713 THEN 2 WHEN u < 263338361 THEN 3
              WHEN u < 267453023 THEN 4 WHEN u < 268275955 THEN 5
              WHEN u < 268413111 THEN 6 ELSE 7 END AS k
  FROM drawn
),
rep AS (
  SELECT b, CAST(sum(k) AS BIGINT) AS n_b, CAST(sum(k * cents) AS BIGINT) AS s_b
  FROM w GROUP BY b
),
rr AS (
  SELECT CAST(s_b AS DOUBLE) / n_b AS mean_b,
         row_number() OVER (ORDER BY CAST(s_b AS DOUBLE) / n_b) AS rk
  FROM rep
),
pt AS (
  SELECT CAST(count(*) AS BIGINT) AS n_rows, CAST(sum(cents) AS BIGINT) AS s FROM base
)
SELECT 40 AS n_replicates, n_rows,
       CAST(floor(CAST(s AS DOUBLE) / n_rows) AS BIGINT) AS mean_cents,
       CAST(floor(max(CASE WHEN rk = 2 THEN mean_b END)) AS BIGINT) AS ci_lo_cents,
       CAST(floor(max(CASE WHEN rk = 39 THEN mean_b END)) AS BIGINT) AS ci_hi_cents
FROM rr CROSS JOIN pt
GROUP BY n_rows, s
""",
)
def a_poisson_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap confidence interval for the mean order value
    — THE bootstrap that works on a cluster: classical resampling
    needs n draws from a dataset no worker holds, but Poisson(1)
    draw-counts per (row, replicate) are independent, so each row
    computes its own 40 replicate weights in a single streaming pass
    (no global state, no sampling shuffle) and the replicate means
    drop out of one partial-aggregated groupBy. Draw counts come from
    the md5 uniform pushed through the Poisson(1) inverse CDF as
    PRECOMPUTED integer thresholds on the 28-bit hash — the CDF is
    frozen into the query text, so both engines make the IDENTICAL
    draws (no rand(), no seed drift) and every weighted sum is an
    exact BIGINT. The 95% interval takes the 2nd/39th ordered
    replicate means; doubles appear only in that final per-replicate
    division, identical expression tree both engines.

    Plan: map-only weight expansion (40× rows, but k·cents folds into
    the partial aggregate immediately — no materialized blowup), one
    40-row shuffle, a 40-row window, a scalar point estimate."""
    o = _t(spark, sf_dir, "orders")
    base = o.select(
        F.col("o_orderkey").cast("bigint").alias("okey"),
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint").alias("cents"),
    )
    drawn = base.select(
        "cents",
        F.explode(F.sequence(F.lit(0), F.lit(39))).alias("b"),
        F.col("okey"),
    ).select(
        "b",
        "cents",
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("okey"), F.col("b"))), 1, 7
            ),
            16,
            10,
        )
        .cast("bigint")
        .alias("u"),
    )
    k = (
        F.when(F.col("u") < 98751885, 0)
        .when(F.col("u") < 197503771, 1)
        .when(F.col("u") < 246879713, 2)
        .when(F.col("u") < 263338361, 3)
        .when(F.col("u") < 267453023, 4)
        .when(F.col("u") < 268275955, 5)
        .when(F.col("u") < 268413111, 6)
        .otherwise(7)
    )
    rep = (
        drawn.select("b", "cents", k.alias("k"))
        .groupBy("b")
        .agg(
            F.sum("k").cast("bigint").alias("n_b"),
            F.sum(F.col("k") * F.col("cents")).cast("bigint").alias("s_b"),
        )
    )
    mean_b = F.col("s_b").cast("double") / F.col("n_b")
    rr = rep.select(mean_b.alias("mean_b")).withColumn(
        # global-window-ok: input is the bootstrap replicate means — fixed B replicates
        "rk", F.row_number().over(W.orderBy("mean_b"))
    )
    pt = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("cents").cast("bigint").alias("s"),
    )
    return (
        rr.crossJoin(pt)
        .groupBy("n_rows", "s")
        .agg(
            F.floor(F.max(F.when(F.col("rk") == 2, F.col("mean_b"))))
            .cast("bigint")
            .alias("ci_lo_cents"),
            F.floor(F.max(F.when(F.col("rk") == 39, F.col("mean_b"))))
            .cast("bigint")
            .alias("ci_hi_cents"),
        )
        .select(
            F.lit(40).alias("n_replicates"),
            "n_rows",
            F.floor(F.col("s").cast("double") / F.col("n_rows"))
            .cast("bigint")
            .alias("mean_cents"),
            "ci_lo_cents",
            "ci_hi_cents",
        )
    )


@_q(
    "dq_psi_drift",
    """
WITH e AS (
  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS es,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
),
g AS (
  SELECT min(es) AS mn_es, max(es) AS mx_es,
         min(cents) AS mn_c, max(cents) AS mx_c
  FROM e
),
b AS (
  SELECT event_type,
         CASE WHEN 2 * es < mn_es + mx_es THEN 'ref' ELSE 'cur' END AS half,
         CAST(least(9, ((cents - mn_c) * 10) // (mx_c - mn_c + 1)) AS BIGINT) AS bin
  FROM e CROSS JOIN g
),
cnt AS (
  SELECT event_type, bin,
         CAST(count(*) FILTER (WHERE half = 'ref') AS BIGINT) AS r_n,
         CAST(count(*) FILTER (WHERE half = 'cur') AS BIGINT) AS c_n
  FROM b GROUP BY event_type, bin
),
tot AS (
  SELECT event_type,
         CAST(sum(r_n) AS BIGINT) AS r_tot, CAST(sum(c_n) AS BIGINT) AS c_tot
  FROM cnt GROUP BY event_type
),
term AS (
  SELECT cnt.event_type, r_tot, c_tot,
         CAST(floor(1000000.0
           * ((CAST(r_n + 1 AS DOUBLE) / (r_tot + 10))
              - (CAST(c_n + 1 AS DOUBLE) / (c_tot + 10)))
           * ln((CAST(r_n + 1 AS DOUBLE) / (r_tot + 10))
                / (CAST(c_n + 1 AS DOUBLE) / (c_tot + 10)))) AS BIGINT) AS psi_term
  FROM cnt JOIN tot ON cnt.event_type = tot.event_type
)
SELECT event_type, r_tot AS n_reference, c_tot AS n_current,
       CAST(sum(psi_term) AS BIGINT) AS psi_micro,
       sum(psi_term) >= 100000 AS drifted
FROM term GROUP BY event_type, r_tot, c_tot
""",
)
def dq_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index per event type between the earlier
    and later half of the event stream — the standard production
    drift monitor for a feature/metric distribution (PSI ≥ 0.1 =
    "investigate", frozen here as the ×1e6 integer gate ≥ 100000).
    Values bin into ten equal-width buckets over the GLOBAL range
    (integer arithmetic, so bin edges are identical on any engine and
    any partitioning — reference-decile edges would drag percentile
    interpolation differences in), halves split on the integer epoch
    midpoint, and bins are Laplace-smoothed (+1/+10) so empty cells
    can't produce ln(0). Following the BM25 convention, each BIN's
    PSI term is fixed-pointed to micro units BEFORE the per-type sum
    — the reported PSI is an exact BIGINT sum, immune to float
    summation order; ln() ulps would need a term within ~1e-9 of an
    integer boundary to flip a floor.

    Plan: one scan, a broadcast 1-row stats frame, one
    partial-aggregated shuffle to (type, bin) with FILTER pivots for
    the two halves, then bin-grain arithmetic. At 100 TB this is the
    shape you run hourly over every (metric, segment) pair at once —
    the tall-relation trick dq_functional_deps uses composes here."""
    ev = _t(spark, sf_dir, "events")
    e = ev.select(
        "event_type",
        F.unix_timestamp("ts").cast("bigint").alias("es"),
        F.floor(F.col("value") * 100 + 0.5).cast("bigint").alias("cents"),
    )
    g = e.agg(
        F.min("es").alias("mn_es"), F.max("es").alias("mx_es"),
        F.min("cents").alias("mn_c"), F.max("cents").alias("mx_c"),
    )
    b = e.crossJoin(F.broadcast(g)).select(
        "event_type",
        F.when(2 * F.col("es") < F.col("mn_es") + F.col("mx_es"), "ref")
        .otherwise("cur")
        .alias("half"),
        F.least(
            F.lit(9),
            F.expr("((cents - mn_c) * 10) div (mx_c - mn_c + 1)"),
        )
        .cast("bigint")
        .alias("bin"),
    )
    cnt = b.groupBy("event_type", "bin").agg(
        F.sum(F.when(F.col("half") == "ref", 1).otherwise(0))
        .cast("bigint")
        .alias("r_n"),
        F.sum(F.when(F.col("half") == "cur", 1).otherwise(0))
        .cast("bigint")
        .alias("c_n"),
    )
    tot = cnt.groupBy(F.col("event_type").alias("et2")).agg(
        F.sum("r_n").cast("bigint").alias("r_tot"),
        F.sum("c_n").cast("bigint").alias("c_tot"),
    )
    p = (F.col("r_n") + 1).cast("double") / (F.col("r_tot") + 10)
    q = (F.col("c_n") + 1).cast("double") / (F.col("c_tot") + 10)
    term = (
        cnt.join(F.broadcast(tot), F.col("event_type") == F.col("et2"))
        .select(
            "event_type", "r_tot", "c_tot",
            F.floor(1000000.0 * (p - q) * F.log(p / q))
            .cast("bigint")
            .alias("psi_term"),
        )
    )
    return term.groupBy("event_type", "r_tot", "c_tot").agg(
        F.sum("psi_term").cast("bigint").alias("psi_micro"),
        (F.sum("psi_term") >= 100000).alias("drifted"),
    ).select(
        "event_type",
        F.col("r_tot").alias("n_reference"),
        F.col("c_tot").alias("n_current"),
        "psi_micro",
        "drifted",
    )


@_q(
    "a_ks_two_sample",
    """
WITH v AS (
  SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 'a' ELSE 'b' END AS arm,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
),
g AS (
  SELECT cents,
         CAST(count(*) FILTER (WHERE arm = 'a') AS BIGINT) AS a_n,
         CAST(count(*) FILTER (WHERE arm = 'b') AS BIGINT) AS b_n
  FROM v GROUP BY cents
),
c AS (
  SELECT CAST(sum(a_n) OVER w AS BIGINT) AS cum_a,
         CAST(sum(b_n) OVER w AS BIGINT) AS cum_b,
         CAST(sum(a_n) OVER () AS BIGINT) AS n_a,
         CAST(sum(b_n) OVER () AS BIGINT) AS n_b
  FROM g
  WINDOW w AS (ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
s AS (
  SELECT n_a, n_b,
         CAST(max(abs(n_b * cum_a - n_a * cum_b)) AS BIGINT) AS d_num
  FROM c GROUP BY n_a, n_b
)
SELECT n_a, n_b, d_num,
       CAST((1000000 * d_num) // (n_a * n_b) AS BIGINT) AS d_micro,
       CAST(d_num AS DOUBLE)
         > 1.358 * sqrt(CAST(n_a + n_b AS DOUBLE) * n_a * n_b) AS significant
FROM s
""",
)
def a_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov test on order value between
    urgent and low-priority orders — the distribution-SHAPE test that
    completes the stats family (a_ab_test_ztest: means;
    a_mannwhitney_u: stochastic dominance; KS: any difference
    anywhere in the CDF). The statistic is EXACT, no approximation at
    all: on the merged value grain, sup|F̂_a − F̂_b| cross-multiplies
    to max|n_b·cumA − n_a·cumB| — a BIGINT over value-grain running
    sums, so d_micro is engine-identical by construction. The only
    double is the α=0.05 threshold c·√((n_a+n_b)·n_a·n_b) (c=1.358),
    computed from exact integers < 2⁵³ by one identical expression.

    Plan: one partial-aggregated shuffle to cents grain with FILTER
    pivots, one running window over the value-grain frame
    (range-partitionable at scale), then a scalar max — the same
    value-grain discipline as a_weighted_median: the fact table is
    never windowed."""
    o = _t(spark, sf_dir, "orders")
    v = o.filter(F.col("o_orderpriority").isin("1-URGENT", "5-LOW")).select(
        F.when(F.col("o_orderpriority") == "1-URGENT", "a").otherwise("b").alias("arm"),
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint").alias("cents"),
    )
    g = v.groupBy("cents").agg(
        F.sum(F.when(F.col("arm") == "a", 1).otherwise(0)).cast("bigint").alias("a_n"),
        F.sum(F.when(F.col("arm") == "b", 1).otherwise(0)).cast("bigint").alias("b_n"),
    )
    # r11 global-window sweep: both running sums share ONE range
    # shuffle (operators/rank.global_running_sums) instead of a
    # single-partition window over the value-grain frame, and the
    # totals are a 1-row aggregate broadcast (the x_null_semantics
    # pattern) instead of an all-rows window.
    from graphql_api_etl_spark.operators.rank import global_running_sums

    cums = global_running_sums(
        g, [F.asc("cents")], {"cum_a_raw": "a_n", "cum_b_raw": "b_n"}
    )
    tot = g.agg(
        F.sum("a_n").cast("bigint").alias("n_a"),
        F.sum("b_n").cast("bigint").alias("n_b"),
    )
    c = cums.crossJoin(F.broadcast(tot)).select(
        F.col("cum_a_raw").cast("bigint").alias("cum_a"),
        F.col("cum_b_raw").cast("bigint").alias("cum_b"),
        "n_a",
        "n_b",
    )
    s = c.groupBy("n_a", "n_b").agg(
        F.max(
            F.abs(F.col("n_b") * F.col("cum_a") - F.col("n_a") * F.col("cum_b"))
        )
        .cast("bigint")
        .alias("d_num")
    )
    return s.select(
        "n_a", "n_b", "d_num",
        F.expr("(1000000 * d_num) div (n_a * n_b)").cast("bigint").alias("d_micro"),
        (
            F.col("d_num").cast("double")
            > 1.358
            * F.sqrt((F.col("n_a") + F.col("n_b")).cast("double") * F.col("n_a") * F.col("n_b"))
        ).alias("significant"),
    )


@_q(
    "events_theilsen_trend",
    """
WITH d AS (
  SELECT CAST(epoch(date_trunc('day', ts)) AS BIGINT) // 86400 AS x,
         CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1
),
p AS (
  SELECT CAST(floor(1000000.0 * (b.y - a.y) / (b.x - a.x)) AS BIGINT) AS slope_micro,
         a.x AS xi, b.x AS xj
  FROM d a JOIN d b ON a.x < b.x
),
r AS (
  SELECT slope_micro,
         row_number() OVER (ORDER BY slope_micro, xi, xj) AS rk,
         CAST(count(*) OVER () AS BIGINT) AS np
  FROM p
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM d) AS n_days,
       CAST(max(np) AS BIGINT) AS n_pairs,
       CAST(max(CASE WHEN rk = (np + 1) // 2 THEN slope_micro END) AS BIGINT)
         AS ts_slope_micro
FROM r
""",
)
def events_theilsen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend of daily event volume: the median of
    all pairwise day-to-day slopes — the trend estimator that
    tolerates up to ~29% arbitrarily corrupted days, where the OLS
    slope (a_group_ols) is dragged by a single outage or backfill
    spike. Day gaps use true epoch-day distance, not row index.

    Slopes are fixed-pointed by flooring an exactly-representable
    double ratio (1e6·Δy < 2⁵³) — deliberately NOT integer division,
    whose semantics diverge between engines on NEGATIVE numerators
    (DuckDB // floors, Spark div truncates toward zero); floor() is
    the one form both agree on for either sign. The median picks the
    lower-median rank under a pinned total order (slope, xi, xj).

    Plan: one partial-aggregated shuffle to DAY grain (the O(n²)
    pair join runs over ~730 day rows, never events — ~266 k pairs
    at any corpus size, constant in event volume), one sort-rank
    window over the pair frame, one scalar reduce."""
    ev = _t(spark, sf_dir, "events")
    d = ev.groupBy(
        F.expr("CAST(unix_timestamp(date_trunc('day', ts)) AS BIGINT) div 86400").alias("x")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    a, b = d.alias("a"), d.alias("b")
    p = a.join(b, F.col("a.x") < F.col("b.x")).select(
        F.floor(
            1000000.0
            * (F.col("b.y") - F.col("a.y")).cast("double")
            / (F.col("b.x") - F.col("a.x"))
        )
        .cast("bigint")
        .alias("slope_micro"),
        F.col("a.x").alias("xi"),
        F.col("b.x").alias("xj"),
    )
    # global-window-ok: input is day-pair slopes — calendar²-bounded
    wall = W.orderBy(F.lit(1)).rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    r = p.select(
        "slope_micro",
        F.row_number().over(W.orderBy("slope_micro", "xi", "xj")).alias("rk"),
        F.count(F.lit(1)).over(wall).cast("bigint").alias("np"),
    )
    n_days = d.agg(F.count(F.lit(1)).cast("bigint").alias("n_days"))
    med = r.agg(
        F.max("np").cast("bigint").alias("n_pairs"),
        F.max(F.when(F.col("rk") == F.expr("(np + 1) div 2"), F.col("slope_micro")))
        .cast("bigint")
        .alias("ts_slope_micro"),
    )
    return n_days.crossJoin(med).select("n_days", "n_pairs", "ts_slope_micro")


@_q(
    "events_attribution_credit",
    """
WITH conv AS (
  SELECT event_id AS cid, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS cts
  FROM events WHERE event_type = 'purchase'
),
touch AS (
  SELECT event_id AS tid, user_id, event_type AS channel,
         CAST(floor(epoch(ts)) AS BIGINT) AS tts
  FROM events WHERE event_type IN ('view', 'click')
),
pair AS (
  SELECT c.cid, t.channel, t.tts, t.tid
  FROM conv c JOIN touch t
    ON c.user_id = t.user_id
   AND c.cts - t.tts BETWEEN 0 AND 604800
),
ranked AS (
  SELECT cid, channel,
         row_number() OVER (PARTITION BY cid ORDER BY tts, tid) AS rn_first,
         row_number() OVER (PARTITION BY cid ORDER BY tts DESC, tid DESC) AS rn_last,
         CAST(count(*) OVER (PARTITION BY cid) AS BIGINT) AS n
  FROM pair
)
SELECT channel,
       CAST(count(*) AS BIGINT) AS n_touch_events,
       CAST(sum(CASE WHEN rn_first = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_first_touch,
       CAST(sum(CASE WHEN rn_last = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_last_touch,
       CAST(sum(1000000 // n) AS BIGINT) AS linear_credit_micro
FROM ranked GROUP BY channel
""",
)
def events_attribution_credit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch marketing attribution over the event stream:
    view/click touches within a 7-day lookback of each purchase earn
    credit under the three standard models at once — first-touch,
    last-touch, and linear — per channel. Position models are window
    ranks under pinned total orders ((ts, id) asc / desc, so
    same-second touches break ties identically on any engine or
    partitioning); linear credit is 10⁶ // n_touches per pair —
    integer division of positives, summed as exact BIGINTs, which is
    how the three models stay hash-identical while a float 1/n would
    drift with summation order. Conversions with no touch in the
    window simply contribute no pairs (orphan conversions are
    events_funnel's concern).

    Plan: both filtered scans prune to three columns; the user-key
    join carries the 7-day predicate in the join condition so the
    pair stream is lookback-bounded (per-user fan-out is
    touches×conversions WITHIN A WEEK, not all history); windows run
    per-conversion (small frames); one partial-aggregated rollup to
    channel grain. Per-user skew is the one watch item at 100 TB —
    the j_salted_skew_join treatment applies unchanged if a bot user
    dominates."""
    ev = _t(spark, sf_dir, "events")
    conv = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("cid"),
        "user_id",
        F.unix_timestamp("ts").cast("bigint").alias("cts"),
    )
    touch = ev.filter(F.col("event_type").isin("view", "click")).select(
        F.col("event_id").alias("tid"),
        F.col("user_id").alias("t_user"),
        F.col("event_type").alias("channel"),
        F.unix_timestamp("ts").cast("bigint").alias("tts"),
    )
    pair = conv.join(
        touch,
        (F.col("user_id") == F.col("t_user"))
        & (F.col("cts") - F.col("tts") >= 0)
        & (F.col("cts") - F.col("tts") <= 604800),
    ).select("cid", "channel", "tts", "tid")
    wc = W.partitionBy("cid")
    ranked = pair.select(
        "cid", "channel",
        F.row_number().over(wc.orderBy(F.asc("tts"), F.asc("tid"))).alias("rn_first"),
        F.row_number().over(wc.orderBy(F.desc("tts"), F.desc("tid"))).alias("rn_last"),
        F.count(F.lit(1)).over(wc).cast("bigint").alias("n"),
    )
    return ranked.groupBy("channel").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_touch_events"),
        F.sum(F.when(F.col("rn_first") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_first_touch"),
        F.sum(F.when(F.col("rn_last") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_last_touch"),
        F.sum(F.expr("1000000 div n")).cast("bigint").alias("linear_credit_micro"),
    )


@_q(
    "a_ab_cuped_adjust",
    """
WITH e AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS es,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
),
g AS (SELECT min(es) AS mn_es, max(es) AS mx_es FROM e),
u AS (
  SELECT user_id,
         CAST(sum(CASE WHEN 2 * es < mn_es + mx_es THEN cents ELSE 0 END) AS BIGINT) AS x,
         CAST(sum(CASE WHEN 2 * es >= mn_es + mx_es THEN cents ELSE 0 END) AS BIGINT) AS y,
         CASE WHEN CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 7) AS BIGINT) % 2 = 0
              THEN 'A' ELSE 'B' END AS arm
  FROM e CROSS JOIN g
  GROUP BY user_id, mn_es, mx_es
),
m AS (
  SELECT arm, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(y * y) AS BIGINT) AS syy,
         CAST(sum(x * y) AS BIGINT) AS sxy
  FROM u GROUP BY arm
),
w AS (
  SELECT max(CASE WHEN arm = 'A' THEN n END) AS n_a,
         max(CASE WHEN arm = 'A' THEN sx END) AS sx_a,
         max(CASE WHEN arm = 'A' THEN sy END) AS sy_a,
         max(CASE WHEN arm = 'B' THEN n END) AS n_b,
         max(CASE WHEN arm = 'B' THEN sx END) AS sx_b,
         max(CASE WHEN arm = 'B' THEN sy END) AS sy_b,
         CAST(sum(n) AS BIGINT) AS n_t,
         CAST(sum(sx) AS BIGINT) AS sx_t, CAST(sum(sy) AS BIGINT) AS sy_t,
         CAST(sum(sxx) AS BIGINT) AS sxx_t, CAST(sum(syy) AS BIGINT) AS syy_t,
         CAST(sum(sxy) AS BIGINT) AS sxy_t
  FROM m
),
d AS (
  SELECT n_a, n_b,
         CAST(sy_b AS DOUBLE) / n_b - CAST(sy_a AS DOUBLE) / n_a AS diff_raw,
         CAST(sx_b AS DOUBLE) / n_b - CAST(sx_a AS DOUBLE) / n_a AS dx,
         (CAST(sxy_t AS DOUBLE) - CAST(sx_t AS DOUBLE) * sy_t / n_t)
           / (CAST(sxx_t AS DOUBLE) - CAST(sx_t AS DOUBLE) * sx_t / n_t) AS theta,
         (CAST(sxy_t AS DOUBLE) - CAST(sx_t AS DOUBLE) * sy_t / n_t)
           * (CAST(sxy_t AS DOUBLE) - CAST(sx_t AS DOUBLE) * sy_t / n_t)
           / ((CAST(sxx_t AS DOUBLE) - CAST(sx_t AS DOUBLE) * sx_t / n_t)
              * (CAST(syy_t AS DOUBLE) - CAST(sy_t AS DOUBLE) * sy_t / n_t)) AS rho2
  FROM w
)
SELECT n_a, n_b,
       CAST(floor(diff_raw * 100) AS BIGINT) AS diff_raw_centicents,
       CAST(floor((diff_raw - theta * dx) * 100) AS BIGINT) AS diff_cuped_centicents,
       CAST(floor(theta * 1000000) AS BIGINT) AS theta_micro,
       CAST(floor(rho2 * 1000000) AS BIGINT) AS var_reduction_micro
FROM d
""",
)
def a_ab_cuped_adjust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction for the A/B read-out — the modern
    experimentation workhorse a_ab_test_ztest feeds into: the
    pre-period covariate X (each user's first-half spend) absorbs
    between-user variance from the post-period metric Y via
    Y − θ(X − X̄), θ = cov(X,Y)/var(X) POOLED across arms, cutting
    required sample size by ρ² (reported as var_reduction_micro).
    Assignment is the deterministic md5(user) % 2 arm split; halves
    split on the integer epoch midpoint (the dq_psi_drift
    convention), and users reduce to ONE (x, y) row each before any
    moment is taken, so the six pooled moments (n, ΣX, ΣY, ΣX²,
    ΣY², ΣXY) are exact BIGINTs on any partitioning. θ, the adjusted
    diff, and ρ² are identical double expression trees over those
    integers, fixed-pointed on output.

    Plan: one scan with a broadcast scalar epoch frame, one
    partial-aggregated shuffle to user grain, one to the 2-row arm
    frame, the usual max-CASE pivot — constant-size tail. At 100 TB
    the same plan scores every (metric, experiment) pair from one
    user-grain pass, which is the entire point of CUPED."""
    ev = _t(spark, sf_dir, "events")
    e = ev.select(
        "user_id",
        F.unix_timestamp("ts").cast("bigint").alias("es"),
        F.floor(F.col("value") * 100 + 0.5).cast("bigint").alias("cents"),
    )
    g = e.agg(F.min("es").alias("mn_es"), F.max("es").alias("mx_es"))
    arm = F.when(
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 7), 16, 10)
        .cast("bigint") % 2 == 0,
        "A",
    ).otherwise("B")
    u = (
        e.crossJoin(F.broadcast(g))
        .groupBy("user_id", "mn_es", "mx_es")
        .agg(
            F.sum(
                F.when(2 * F.col("es") < F.col("mn_es") + F.col("mx_es"), F.col("cents"))
                .otherwise(0)
            )
            .cast("bigint")
            .alias("x"),
            F.sum(
                F.when(2 * F.col("es") >= F.col("mn_es") + F.col("mx_es"), F.col("cents"))
                .otherwise(0)
            )
            .cast("bigint")
            .alias("y"),
        )
        .select("user_id", "x", "y", arm.alias("arm"))
    )
    m = u.groupBy("arm").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
    )
    pick = lambda a, c: F.max(F.when(F.col("arm") == a, F.col(c)))  # noqa: E731
    w = m.agg(
        pick("A", "n").alias("n_a"), pick("A", "sx").alias("sx_a"), pick("A", "sy").alias("sy_a"),
        pick("B", "n").alias("n_b"), pick("B", "sx").alias("sx_b"), pick("B", "sy").alias("sy_b"),
        F.sum("n").cast("bigint").alias("n_t"),
        F.sum("sx").cast("bigint").alias("sx_t"),
        F.sum("sy").cast("bigint").alias("sy_t"),
        F.sum("sxx").cast("bigint").alias("sxx_t"),
        F.sum("syy").cast("bigint").alias("syy_t"),
        F.sum("sxy").cast("bigint").alias("sxy_t"),
    )
    diff_raw = F.col("sy_b").cast("double") / F.col("n_b") - F.col("sy_a").cast("double") / F.col("n_a")
    dx = F.col("sx_b").cast("double") / F.col("n_b") - F.col("sx_a").cast("double") / F.col("n_a")
    cov = F.col("sxy_t").cast("double") - F.col("sx_t").cast("double") * F.col("sy_t") / F.col("n_t")
    varx = F.col("sxx_t").cast("double") - F.col("sx_t").cast("double") * F.col("sx_t") / F.col("n_t")
    vary = F.col("syy_t").cast("double") - F.col("sy_t").cast("double") * F.col("sy_t") / F.col("n_t")
    theta = cov / varx
    rho2 = cov * cov / (varx * vary)
    return w.select(
        "n_a", "n_b",
        F.floor(diff_raw * 100).cast("bigint").alias("diff_raw_centicents"),
        F.floor((diff_raw - theta * dx) * 100).cast("bigint").alias("diff_cuped_centicents"),
        F.floor(theta * 1000000).cast("bigint").alias("theta_micro"),
        F.floor(rho2 * 1000000).cast("bigint").alias("var_reduction_micro"),
    )


@_q(
    "a_ab_power_analysis",
    """
WITH u AS (
  SELECT user_id, CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY user_id
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(cents) AS BIGINT) AS s1,
         CAST(sum(cents * cents) AS BIGINT) AS s2
  FROM u
),
d AS (
  SELECT n,
         CAST(s1 AS DOUBLE) / n AS mean,
         (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1) AS var
  FROM m
)
SELECT n AS n_users,
       CAST(floor(mean) AS BIGINT) AS mean_cents,
       CAST(floor(var) AS BIGINT) AS var_cents2,
       CAST(ceil(15.6800 * var / (mean * 0.01 * (mean * 0.01))) AS BIGINT) AS n_per_arm_mde1,
       CAST(ceil(15.6800 * var / (mean * 0.02 * (mean * 0.02))) AS BIGINT) AS n_per_arm_mde2,
       CAST(ceil(15.6800 * var / (mean * 0.05 * (mean * 0.05))) AS BIGINT) AS n_per_arm_mde5
FROM d
""",
)
def a_ab_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment power analysis from measured variance — the
    question asked BEFORE a_ab_test_ztest is run: how many users per
    arm detect a 1%/2%/5% lift at α=0.05, power=0.80? The two-sample
    formula n = 2(z_{α/2}+z_β)²·σ²/δ² with the z constants FROZEN
    into the query text as 2·(1.96+0.84)² = 15.68 (no normal-inverse
    between engines), σ² from the exact per-user (n, Σx, Σx²)
    BIGINT moments, δ as the given fraction of the measured mean.
    ceil() of an identical double tree both engines share; the three
    MDE columns show the quadratic cost of precision directly.

    Plan: one partial-aggregated shuffle to user grain, one to a
    scalar moment row — the same two-shuffle stack as the metric
    pipeline it gates, so it runs at metric cost on any corpus."""
    ev = _t(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.sum(F.floor(F.col("value") * 100 + 0.5).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    m = u.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("s1"),
        F.sum(F.col("cents") * F.col("cents")).cast("bigint").alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("n")
    var = (
        F.col("s2").cast("double") - F.col("s1").cast("double") * F.col("s1") / F.col("n")
    ) / (F.col("n") - 1)
    def n_req(frac: float):
        delta = mean * frac
        return F.ceil(15.6800 * var / (delta * delta)).cast("bigint")
    return m.select(
        F.col("n").alias("n_users"),
        F.floor(mean).cast("bigint").alias("mean_cents"),
        F.floor(var).cast("bigint").alias("var_cents2"),
        n_req(0.01).alias("n_per_arm_mde1"),
        n_req(0.02).alias("n_per_arm_mde2"),
        n_req(0.05).alias("n_per_arm_mde5"),
    )


@_q(
    "a_order_to_ship_latency",
    """
WITH lat AS (
  SELECT o_orderpriority AS priority,
         (CAST(epoch(min(l_shipdate)) AS BIGINT)
          - CAST(epoch(o_orderdate) AS BIGINT)) // 86400 AS days
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  GROUP BY o_orderkey, o_orderpriority, o_orderdate
),
g AS (
  SELECT priority, days, CAST(count(*) AS BIGINT) AS n
  FROM lat GROUP BY priority, days
),
c AS (
  SELECT priority, days, n,
         CAST(sum(n) OVER (PARTITION BY priority ORDER BY days
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
         CAST(sum(n) OVER (PARTITION BY priority) AS BIGINT) AS total
  FROM g
)
SELECT priority, total AS n_orders,
       CAST(min(CASE WHEN 2 * cum >= total THEN days END) AS BIGINT) AS p50_days,
       CAST(min(CASE WHEN 10 * cum >= 9 * total THEN days END) AS BIGINT) AS p90_days,
       CAST(min(CASE WHEN 100 * cum >= 99 * total THEN days END) AS BIGINT) AS p99_days,
       CAST(max(days) AS BIGINT) AS max_days
FROM c GROUP BY priority, total
""",
)
def a_order_to_ship_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-first-shipment latency SLA report per order priority:
    p50/p90/p99/max of the integer day gap between order placement
    and the order's EARLIEST line shipment — the fulfilment KPI that
    checks whether '1-URGENT' actually ships faster. Percentiles are
    EXACT (type-7 lower-crossing), found by integer cross-
    multiplication (k·cum ≥ p·total) over the DAY-VALUE GRAIN, the
    a_weighted_median discipline: after the per-order min, rows
    collapse to (priority, days) counts — a few hundred cells — so
    the windows never see the fact table and no percentile
    interpolation (the thing engines disagree on) ever runs.

    Plan: one shuffle for the order-grain min (partial-aggregated),
    one to day-value grain, dim-sized windows, one rollup."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    lat = (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderkey", F.col("o_orderpriority").alias("priority"), "o_orderdate")
        .agg(F.min("l_shipdate").alias("first_ship"))
        .select(
            "priority",
            F.expr(
                "(CAST(unix_timestamp(first_ship) AS BIGINT)"
                " - CAST(unix_timestamp(o_orderdate) AS BIGINT)) div 86400"
            ).alias("days"),
        )
    )
    g = lat.groupBy("priority", "days").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    wc = W.partitionBy("priority").orderBy("days").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    c = g.select(
        "priority", "days", "n",
        F.sum("n").over(wc).cast("bigint").alias("cum"),
        F.sum("n").over(W.partitionBy("priority")).cast("bigint").alias("total"),
    )
    return c.groupBy("priority", F.col("total").alias("n_orders")).agg(
        F.min(F.when(2 * F.col("cum") >= F.col("total"), F.col("days")))
        .cast("bigint")
        .alias("p50_days"),
        F.min(F.when(10 * F.col("cum") >= 9 * F.col("total"), F.col("days")))
        .cast("bigint")
        .alias("p90_days"),
        F.min(F.when(100 * F.col("cum") >= 99 * F.col("total"), F.col("days")))
        .cast("bigint")
        .alias("p99_days"),
        F.max("days").cast("bigint").alias("max_days"),
    )


@_q(
    "sink_snapshot_diff",
    """
WITH base AS (
  SELECT CAST(o_orderkey AS BIGINT) AS k,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
         CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 7) AS BIGINT) AS h
  FROM orders
),
v1 AS (SELECT k, cents FROM base WHERE h % 10 != 9),
v2 AS (
  SELECT k, cents + CASE WHEN h % 7 = 0 THEN 1000 ELSE 0 END AS cents
  FROM base WHERE h % 7 != 3
),
d AS (
  SELECT coalesce(v1.k, v2.k) AS k,
         CASE WHEN v1.k IS NULL THEN 'added'
              WHEN v2.k IS NULL THEN 'removed'
              WHEN v1.cents != v2.cents THEN 'changed'
              ELSE 'unchanged' END AS status,
         CASE WHEN v1.k IS NOT NULL AND v2.k IS NOT NULL
              THEN abs(v2.cents - v1.cents) ELSE 0 END AS delta
  FROM v1 FULL OUTER JOIN v2 ON v1.k = v2.k
)
SELECT status, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(delta) AS BIGINT) AS sum_abs_delta_cents,
       CAST(min(k) AS BIGINT) AS sample_key
FROM d GROUP BY status
""",
)
def sink_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation diff — the audit that runs after every
    sink_merge_upsert / sink_scd2_history load: a full-outer join of
    two table versions on the business key classifying every row
    added / removed / changed / unchanged, with the absolute value
    drift summed per class and a deterministic sample key (min) for
    drill-down. The two versions are SYNTHESIZED deterministically
    from one scan (md5-keyed drops and +1000-cent bumps), so the
    expected class counts are reproducible on any engine — the same
    presence-flag full-outer machinery as flagship_reconcile
    (ETL:391–425's J1/J2), pointed at the change-data-capture
    question instead of the file-vs-API one.

    Plan: one scan feeds both version frames (Catalyst collapses the
    shared subtree into one parquet read), a key-partitioned
    SortMergeJoin — at 100 TB this is THE bucketed-join candidate:
    bucket both snapshots by key and the diff is shuffle-free — and
    a 4-row rollup."""
    o = _t(spark, sf_dir, "orders")
    base = o.select(
        F.col("o_orderkey").cast("bigint").alias("k"),
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint").alias("cents"),
        F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 7), 16, 10)
        .cast("bigint")
        .alias("h"),
    )
    v1 = base.filter(F.col("h") % 10 != 9).select("k", "cents")
    v2 = base.filter(F.col("h") % 7 != 3).select(
        "k",
        (
            F.col("cents")
            + F.when(F.col("h") % 7 == 0, 1000).otherwise(0)
        ).alias("cents"),
    )
    a, b = v1.alias("a"), v2.alias("b")
    d = a.join(b, F.col("a.k") == F.col("b.k"), "full_outer").select(
        F.coalesce(F.col("a.k"), F.col("b.k")).alias("k"),
        F.when(F.col("a.k").isNull(), "added")
        .when(F.col("b.k").isNull(), "removed")
        .when(F.col("a.cents") != F.col("b.cents"), "changed")
        .otherwise("unchanged")
        .alias("status"),
        F.when(
            F.col("a.k").isNotNull() & F.col("b.k").isNotNull(),
            F.abs(F.col("b.cents") - F.col("a.cents")),
        )
        .otherwise(0)
        .alias("delta"),
    )
    return d.groupBy("status").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("delta").cast("bigint").alias("sum_abs_delta_cents"),
        F.min("k").cast("bigint").alias("sample_key"),
    )


@_q(
    "x_largest_remainder_alloc",
    """
WITH rev AS (
  SELECT c_mktsegment AS segment,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY c_mktsegment
),
q AS (
  SELECT segment, cents,
         CAST(sum(cents) OVER () AS BIGINT) AS total,
         CAST((10000 * cents) // sum(cents) OVER () AS BIGINT) AS floor_bp,
         CAST((10000 * cents) % sum(cents) OVER () AS BIGINT) AS rem
  FROM rev
),
r AS (
  SELECT segment, cents, floor_bp, rem,
         CAST(10000 - sum(floor_bp) OVER () AS BIGINT) AS leftover,
         CAST(row_number() OVER (ORDER BY rem DESC, segment) AS BIGINT) AS rk
  FROM q
)
SELECT segment, cents AS revenue_cents, floor_bp, rem AS remainder,
       CAST(floor_bp + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
         AS alloc_bp
FROM r
""",
)
def x_largest_remainder_alloc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder (Hamilton) integer allocation: distribute
    10,000 basis points across market segments proportional to
    revenue so the shares SUM EXACTLY to 100.00% — the finance-ETL
    rounding problem naive round() gets wrong (rounded shares sum to
    9,999 or 10,001 bp and the books don't close). Floor quotas and
    remainders are pure positive-integer div/mod (identical
    semantics both engines — negatives never arise from revenue
    sums); the Σfloor shortfall goes +1 each to the largest
    remainders under the pinned (remainder DESC, segment) order, so
    the allocation is deterministic even on remainder ties.
    Σ alloc_bp = 10000 by construction.

    Plan: one partial-aggregated shuffle to segment grain with a
    broadcast dim join, then windows over the segment-dim frame —
    allocation is O(|segments|) after the rollup at any fact
    scale."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    rev = (
        o.join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        )
    )
    # global-window-ok: input is the segment-grain aggregate — ≤5 rows
    wall = W.orderBy(F.lit(1)).rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    q = rev.select(
        "segment", "cents",
        F.sum("cents").over(wall).cast("bigint").alias("total"),
    ).select(
        "segment", "cents",
        F.expr("(10000 * cents) div total").cast("bigint").alias("floor_bp"),
        ((10000 * F.col("cents")) % F.col("total")).cast("bigint").alias("rem"),
    )
    r = q.select(
        "segment", "cents", "floor_bp", "rem",
        (10000 - F.sum("floor_bp").over(wall)).cast("bigint").alias("leftover"),
        # global-window-ok: rank over the segment-grain frame — ≤5 rows
        F.row_number().over(W.orderBy(F.desc("rem"), F.asc("segment"))).cast("bigint").alias("rk"),
    )
    return r.select(
        "segment",
        F.col("cents").alias("revenue_cents"),
        "floor_bp",
        F.col("rem").alias("remainder"),
        (
            F.col("floor_bp")
            + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("alloc_bp"),
    )


@_q(
    "a_spearman_corr",
    """
WITH base AS (
  SELECT o_orderkey AS k,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price,
         CAST(cnt AS BIGINT) AS nli
  FROM orders JOIN (
    SELECT l_orderkey, count(*) AS cnt FROM lineitem GROUP BY l_orderkey
  ) li ON o_orderkey = l_orderkey
),
n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM base),
gx AS (
  SELECT price, CAST(count(*) AS BIGINT) AS t,
         CAST(coalesce(sum(count(*)) OVER (ORDER BY price
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cumb
  FROM base GROUP BY price
),
gy AS (
  SELECT nli, CAST(count(*) AS BIGINT) AS t,
         CAST(coalesce(sum(count(*)) OVER (ORDER BY nli
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cumb
  FROM base GROUP BY nli
),
cr AS (
  SELECT b.k,
         CAST(2 * gx.cumb + gx.t + 1 - (n.n + 1) AS BIGINT) AS cx,
         CAST(2 * gy.cumb + gy.t + 1 - (n.n + 1) AS BIGINT) AS cy
  FROM base b JOIN gx ON b.price = gx.price
              JOIN gy ON b.nli = gy.nli
              CROSS JOIN n
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(cx * cy) AS BIGINT) AS sxy,
         CAST(sum(cx * cx) AS BIGINT) AS sxx,
         CAST(sum(cy * cy) AS BIGINT) AS syy
  FROM cr
)
SELECT n, sxy, sxx, syy,
       CAST(floor(1000000.0 * sxy / sqrt(CAST(sxx AS DOUBLE) * syy)) AS BIGINT)
         AS spearman_micro
FROM m
""",
)
def a_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between order value and line-item
    count — the monotone-association measure that completes
    a_corr_covar's Pearson: outlier-proof and invariant to any
    monotone transform of either metric. Tied ranks use the exact
    2·rank̄ = 2·cum_before + t + 1 identity (a_mannwhitney_u), then
    ranks are CENTERED by the integer 2·rank̄ − (n+1): centered
    doubled ranks live in [−n, n], the moments (Σcx·cy, Σcx², Σcy²)
    grow as n³/3 — exact BIGINTs to n ≈ 3M rows and ~8× later than
    the uncentered form — and the means vanish identically (Σcx = 0),
    leaving ρ = Σcxcy/√(Σcx²Σcy²) as one double expression over
    exact integers. Past that n, bucket values to a coarser rank
    grid (ρ on quantile-bucketed data is still Spearman) or lift the
    three moments to DECIMAL(38,0); the identical-trees contract is
    unchanged either way.

    Plan: rank maps are built at VALUE GRAIN (two windowed frames
    over distinct prices / distinct counts), then joined back onto
    the order-grain stream — the fact table is never windowed — and
    one partial-aggregated reduce yields the moments."""
    o = _t(spark, sf_dir, "orders")
    li = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("nli"))
    )
    base = (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            F.col("o_orderkey").alias("k"),
            F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint").alias("price"),
            "nli",
        )
        # consumed 4× (count, both rank maps, the centered-rank join):
        # materialize the order-grain frame once instead of re-scanning
        # orders⋈lineitem per consumer (13 scans → 2 without this)
        .localCheckpoint(eager=True)
    )
    n = base.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    # r11 global-window sweep: both rank maps' exclusive cumsums run
    # distributed (operators/rank.global_running_sums — one range
    # shuffle each) instead of single-partition value-grain windows.
    from graphql_api_etl_spark.operators.rank import global_running_sums

    gx = (
        global_running_sums(
            base.groupBy("price").agg(F.count(F.lit(1)).cast("bigint").alias("t")),
            [F.asc("price")],
            {"cumb_raw": "t"},
            inclusive=False,
        )
        .select("price", "t", F.col("cumb_raw").cast("bigint").alias("cumb"))
    )
    gy = (
        global_running_sums(
            base.groupBy("nli").agg(F.count(F.lit(1)).cast("bigint").alias("t")),
            [F.asc("nli")],
            {"cumb_raw": "t"},
            inclusive=False,
        )
        .select("nli", "t", F.col("cumb_raw").cast("bigint").alias("cumb"))
    )
    gx2 = gx.select("price", F.col("t").alias("tx"), F.col("cumb").alias("cbx"))
    gy2 = gy.select("nli", F.col("t").alias("ty"), F.col("cumb").alias("cby"))
    cr = (
        base.join(gx2, "price")
        .join(F.broadcast(gy2), "nli")
        .crossJoin(F.broadcast(n))
        .select(
            (2 * F.col("cbx") + F.col("tx") + 1 - (F.col("n") + 1))
            .cast("bigint")
            .alias("cx"),
            (2 * F.col("cby") + F.col("ty") + 1 - (F.col("n") + 1))
            .cast("bigint")
            .alias("cy"),
        )
    )
    m = cr.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("cx") * F.col("cy")).cast("bigint").alias("sxy"),
        F.sum(F.col("cx") * F.col("cx")).cast("bigint").alias("sxx"),
        F.sum(F.col("cy") * F.col("cy")).cast("bigint").alias("syy"),
    )
    return m.select(
        "n", "sxy", "sxx", "syy",
        F.floor(
            1000000.0
            * F.col("sxy")
            / F.sqrt(F.col("sxx").cast("double") * F.col("syy"))
        )
        .cast("bigint")
        .alias("spearman_micro"),
    )


@_q(
    "a_runs_test",
    """
WITH d AS (
  SELECT date_trunc('day', ts) AS day, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1
),
s AS (
  SELECT day, n,
         CASE WHEN n > lag(n) OVER (ORDER BY day) THEN 1
              WHEN n < lag(n) OVER (ORDER BY day) THEN -1
              ELSE 0 END AS sgn
  FROM d
),
nz AS (SELECT day, sgn FROM s WHERE sgn != 0),
r AS (
  SELECT sgn,
         CASE WHEN sgn != lag(sgn) OVER (ORDER BY day) OR
                   lag(sgn) OVER (ORDER BY day) IS NULL THEN 1 ELSE 0 END AS is_new_run
  FROM nz
),
m AS (
  SELECT CAST(sum(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_up,
         CAST(sum(CASE WHEN sgn = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_down,
         CAST(sum(is_new_run) AS BIGINT) AS n_runs
  FROM r
)
SELECT n_up, n_down, n_runs,
       CAST(floor((CAST(n_runs AS DOUBLE)
              - (2.0 * n_up * n_down / (n_up + n_down) + 1))
            / sqrt(2.0 * n_up * n_down * (2.0 * n_up * n_down - n_up - n_down)
                   / ((CAST(n_up + n_down AS DOUBLE)) * (n_up + n_down)
                      * (n_up + n_down - 1)))
            * 10000) AS BIGINT) AS z_tenthousandths
FROM m
""",
)
def a_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test on the daily volume's up/down moves —
    the randomness check that closes the time-series diagnostics:
    a_autocorr_lag measures LINEAR serial dependence, CUSUM finds a
    LEVEL shift; the runs test catches any sign-pattern structure
    (momentum: too few runs; oscillation: too many) with no
    distributional assumption at all. Flat days drop out (the
    standard two-valued reduction), runs are counted by the
    lag-inequality flag, and n_up/n_down/n_runs are exact integers;
    only the closing normal approximation touches doubles — one
    identical expression tree, fixed-pointed (the a_ab_test_ztest
    convention).

    Plan: one partial-aggregated shuffle to day grain; every window
    runs over the day-grain frame (range-partition at scale); the
    moment row is scalar."""
    ev = _t(spark, sf_dir, "events")
    d = ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    # global-window-ok: input is the day-grain aggregate — calendar-bounded
    wd = W.orderBy("day")
    s = d.select(
        "day", "n",
        F.when(F.col("n") > F.lag("n").over(wd), 1)
        .when(F.col("n") < F.lag("n").over(wd), -1)
        .otherwise(0)
        .alias("sgn"),
    )
    nz = s.filter(F.col("sgn") != 0)
    r = nz.select(
        "sgn",
        F.when(
            (F.col("sgn") != F.lag("sgn").over(wd))
            | F.lag("sgn").over(wd).isNull(),
            1,
        )
        .otherwise(0)
        .alias("is_new_run"),
    )
    m = r.agg(
        F.sum(F.when(F.col("sgn") == 1, 1).otherwise(0)).cast("bigint").alias("n_up"),
        F.sum(F.when(F.col("sgn") == -1, 1).otherwise(0)).cast("bigint").alias("n_down"),
        F.sum("is_new_run").cast("bigint").alias("n_runs"),
    )
    nu, nd, nr = F.col("n_up"), F.col("n_down"), F.col("n_runs")
    mu = 2.0 * nu * nd / (nu + nd) + 1
    var = (
        2.0 * nu * nd * (2.0 * nu * nd - nu - nd)
        / ((nu + nd).cast("double") * (nu + nd) * (nu + nd - 1))
    )
    return m.select(
        "n_up", "n_down", "n_runs",
        F.floor((nr.cast("double") - mu) / F.sqrt(var) * 10000)
        .cast("bigint")
        .alias("z_tenthousandths"),
    )


@_q(
    "events_haar_energy",
    """
WITH d AS (
  SELECT date_trunc('day', ts) AS day, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1
),
x0 AS (
  SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i, n
  FROM d ORDER BY day LIMIT 16
),
l1 AS (
  SELECT (i + 1) // 2 AS i,
         CAST(sum(n) AS BIGINT) AS a,
         CAST(sum(CASE WHEN i % 2 = 1 THEN n ELSE -n END) AS BIGINT) AS dd
  FROM x0 GROUP BY (i + 1) // 2
),
l2 AS (
  SELECT (i + 1) // 2 AS i,
         CAST(sum(a) AS BIGINT) AS a,
         CAST(sum(CASE WHEN i % 2 = 1 THEN a ELSE -a END) AS BIGINT) AS dd
  FROM l1 GROUP BY (i + 1) // 2
),
l3 AS (
  SELECT (i + 1) // 2 AS i,
         CAST(sum(a) AS BIGINT) AS a,
         CAST(sum(CASE WHEN i % 2 = 1 THEN a ELSE -a END) AS BIGINT) AS dd
  FROM l2 GROUP BY (i + 1) // 2
),
l4 AS (
  SELECT (i + 1) // 2 AS i,
         CAST(sum(a) AS BIGINT) AS a,
         CAST(sum(CASE WHEN i % 2 = 1 THEN a ELSE -a END) AS BIGINT) AS dd
  FROM l3 GROUP BY (i + 1) // 2
)
SELECT 1 AS level, CAST(count(*) AS BIGINT) AS n_coeffs,
       CAST(sum(dd * dd) AS BIGINT) AS detail_energy,
       CAST(NULL AS BIGINT) AS approx_energy FROM l1
UNION ALL
SELECT 2, CAST(count(*) AS BIGINT), CAST(sum(dd * dd) AS BIGINT),
       CAST(NULL AS BIGINT) FROM l2
UNION ALL
SELECT 3, CAST(count(*) AS BIGINT), CAST(sum(dd * dd) AS BIGINT),
       CAST(NULL AS BIGINT) FROM l3
UNION ALL
SELECT 4, CAST(count(*) AS BIGINT), CAST(sum(dd * dd) AS BIGINT),
       CAST(sum(a * a) AS BIGINT) FROM l4
""",
)
def events_haar_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Haar wavelet energy decomposition of the daily volume (first
    16 days): per-level detail energies separate fast jitter
    (level 1: day-to-day), weekly-ish structure (level 3: 8-day
    blocks), and the DC trend (level-4 approximation) — the
    multi-resolution "where does the variance live" question that
    single-lag autocorrelation can't answer, and the front-end of
    wavelet-compressed series storage. UNNORMALIZED integer Haar
    (a = x₁+x₂, d = x₁−x₂, no √2) keeps every coefficient and every
    energy an exact BIGINT — normalization only rescales each level
    by a known 2^l, so the diagnostic content is identical and the
    cross-engine hash is trivially stable.

    Plan: one partial-aggregated shuffle to day grain, one tiny
    window for the day index, then four cascaded 2:1 groupBys over
    8/4/2/1-row frames. Per entity (add user_id to every key) this
    is the same plan at any fan-out — the transform never sees the
    fact table."""
    ev = _t(spark, sf_dir, "events")
    d = ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    x = (
        d.select(
            # global-window-ok: input is the day-grain aggregate — calendar-bounded (and i ≤ 16 consumed)
            F.row_number().over(W.orderBy("day")).cast("bigint").alias("i"), "n"
        )
        .filter(F.col("i") <= 16)
        .select("i", F.col("n").alias("a"))
    )
    levels = []
    cur = x
    for lvl in range(1, 5):
        nxt = cur.groupBy(F.expr("(i + 1) div 2").alias("i")).agg(
            F.sum("a").cast("bigint").alias("a"),
            F.sum(
                F.when(F.col("i") % 2 == 1, F.col("a")).otherwise(-F.col("a"))
            )
            .cast("bigint")
            .alias("dd"),
        )
        levels.append((lvl, nxt))
        cur = nxt.select("i", "a")
    outs = []
    for lvl, frame in levels:
        agg = frame.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_coeffs"),
            F.sum(F.col("dd") * F.col("dd")).cast("bigint").alias("detail_energy"),
            F.sum(F.col("a") * F.col("a")).cast("bigint").alias("a_energy"),
        )
        outs.append(
            agg.select(
                F.lit(lvl).alias("level"),
                "n_coeffs",
                "detail_energy",
                (F.col("a_energy") if lvl == 4 else F.lit(None).cast("bigint")).alias(
                    "approx_energy"
                ),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


@_q(
    "a_laspeyres_price_index",
    """
WITH pm AS (
  SELECT l_partkey AS part, date_trunc('month', l_shipdate) AS m,
         CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
  FROM lineitem GROUP BY 1, 2
),
b AS (SELECT min(m) AS base_m FROM pm),
base AS (
  SELECT part, cents AS cents_b, qty AS qty_b
  FROM pm CROSS JOIN b WHERE m = base_m
),
t AS (
  SELECT pm.m, pm.part,
         CAST(floor(1000000.0 * pm.cents * base.qty_b / pm.qty) AS BIGINT) AS num_term,
         base.cents_b
  FROM pm JOIN base ON pm.part = base.part
)
SELECT strftime(m, '%Y-%m') AS month,
       CAST(count(*) AS BIGINT) AS n_common_parts,
       CAST(sum(num_term) // sum(cents_b) AS BIGINT) AS laspeyres_micro
FROM t GROUP BY m
""",
)
def a_laspeyres_price_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laspeyres price index per ship month: what this month's unit
    prices would cost applied to the BASE month's basket,
    Σp_t·q₀ / Σp₀·q₀ over parts traded in both — the fixed-basket
    inflation measure that isolates PRICE movement from mix shift
    (raw revenue-per-unit confounds the two). Unit prices come from
    (part, month) cents/qty rollups; the denominator collapses
    exactly (p₀·q₀ = that month's cents — no division at all), and
    each numerator term is fixed-pointed to micro units BEFORE the
    per-month sum (the BM25 convention), so the index is a BIGINT
    division of exact sums on both engines.

    Plan: one partial-aggregated shuffle to (part, month) grain, the
    base-month basket broadcast back (dim-sized: one row per traded
    part), one rollup to month grain."""
    li = _t(spark, sf_dir, "lineitem")
    pm = li.groupBy(
        F.col("l_partkey").alias("part"),
        F.date_trunc("month", F.col("l_shipdate")).alias("m"),
    ).agg(
        F.sum(F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("bigint"))
        .cast("bigint")
        .alias("cents"),
        F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("qty"),
    )
    b = pm.agg(F.min("m").alias("base_m"))
    base = (
        pm.crossJoin(F.broadcast(b))
        .filter(F.col("m") == F.col("base_m"))
        .select(
            F.col("part").alias("bpart"),
            F.col("cents").alias("cents_b"),
            F.col("qty").alias("qty_b"),
        )
    )
    t = pm.join(F.broadcast(base), F.col("part") == F.col("bpart")).select(
        "m",
        F.floor(
            1000000.0 * F.col("cents") * F.col("qty_b") / F.col("qty")
        )
        .cast("bigint")
        .alias("num_term"),
        "cents_b",
    )
    return t.groupBy("m").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_common_parts"),
        F.expr("sum(num_term) div sum(cents_b)").cast("bigint").alias("laspeyres_micro"),
    ).select(
        F.date_format("m", "yyyy-MM").alias("month"),
        "n_common_parts",
        "laspeyres_micro",
    )


@_q(
    "a_skyline_pareto_2d",
    """
WITH pts AS (
  SELECT o_orderkey AS k,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price,
         CAST(epoch(o_orderdate) AS BIGINT) // 86400 AS day
  FROM orders
),
pg AS (
  SELECT price, CAST(min(day) AS BIGINT) AS md
  FROM pts GROUP BY price
),
m AS (
  SELECT price, md,
         CAST(min(md) OVER (ORDER BY price
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT) AS m_lower
  FROM pg
)
SELECT p.k AS o_orderkey, p.price AS price_cents, p.day AS order_day
FROM pts p JOIN m ON p.price = m.price
WHERE p.day = m.md AND (m.m_lower IS NULL OR p.day < m.m_lower)
""",
)
def a_skyline_pareto_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier) over orders minimizing (price,
    order day): every order no other order beats on BOTH axes — the
    classic preference-query operator (Börzsönyi et al.'s SKYLINE OF)
    neither engine ships natively. The naive formulation is an O(n²)
    NOT EXISTS self-join; this is the sort-scan identity at VALUE
    GRAIN: collapse to per-price min-day md(p) (one shuffle), take
    the running min M(p) over strictly-lower prices (one window over
    the price-grain frame), and a point survives iff it attains its
    price's min day AND beats every cheaper point's best day
    (day < M(p) — strict, so an equal-day-cheaper point correctly
    dominates). Equal (price, day) duplicates co-survive, the
    standard skyline semantics. Everything is integer (cents, epoch
    days); no float ever orders anything.

    Plan: shuffle to price grain, value-grain window
    (range-partitionable), hash join back — n log n work where the
    textbook nested-exists does n². The same decomposition extends
    per-group (add a partition key to all three steps)."""
    o = _t(spark, sf_dir, "orders")
    pts = o.select(
        F.col("o_orderkey").alias("k"),
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint").alias("price"),
        F.expr("CAST(unix_timestamp(o_orderdate) AS BIGINT) div 86400").alias("day"),
    )
    pg = pts.groupBy("price").agg(F.min("day").cast("bigint").alias("md"))
    # r11 global-window sweep: the strictly-lower running min runs
    # distributed (operators/rank.global_running_min — one range
    # shuffle), removing the single-partition window over the
    # price-grain frame.
    from graphql_api_etl_spark.operators.rank import global_running_min

    m = global_running_min(
        pg, [F.asc("price")], "md", out_col="m_lower_raw", inclusive=False
    ).select(
        F.col("price").alias("mprice"), "md",
        F.col("m_lower_raw").cast("bigint").alias("m_lower"),
    )
    return (
        pts.join(m, F.col("price") == F.col("mprice"))
        .filter(
            (F.col("day") == F.col("md"))
            & (F.col("m_lower").isNull() | (F.col("day") < F.col("m_lower")))
        )
        .select(
            F.col("k").alias("o_orderkey"),
            F.col("price").alias("price_cents"),
            F.col("day").alias("order_day"),
        )
    )


@_q(
    "dq_referential_integrity",
    """
WITH checks AS (
  SELECT 'orders.o_custkey->customer' AS fk,
         CAST(count(*) AS BIGINT) AS n_child,
         CAST(count(*) FILTER (WHERE c_custkey IS NULL) AS BIGINT) AS n_orphans,
         CAST(min(CASE WHEN c_custkey IS NULL THEN o_custkey END) AS BIGINT)
           AS sample_orphan_key
  FROM orders LEFT JOIN customer ON o_custkey = c_custkey
  UNION ALL
  SELECT 'lineitem.l_orderkey->orders',
         CAST(count(*) AS BIGINT),
         CAST(count(*) FILTER (WHERE o_orderkey IS NULL) AS BIGINT),
         CAST(min(CASE WHEN o_orderkey IS NULL THEN l_orderkey END) AS BIGINT)
  FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey
  UNION ALL
  SELECT 'lineitem.l_partkey->part',
         CAST(count(*) AS BIGINT),
         CAST(count(*) FILTER (WHERE p_partkey IS NULL) AS BIGINT),
         CAST(min(CASE WHEN p_partkey IS NULL THEN l_partkey END) AS BIGINT)
  FROM lineitem LEFT JOIN part ON l_partkey = p_partkey
  UNION ALL
  SELECT 'customer.c_nationkey->nation',
         CAST(count(*) AS BIGINT),
         CAST(count(*) FILTER (WHERE n_nationkey IS NULL) AS BIGINT),
         CAST(min(CASE WHEN n_nationkey IS NULL THEN c_nationkey END) AS BIGINT)
  FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
)
SELECT fk, n_child, n_orphans, sample_orphan_key, n_orphans = 0 AS intact
FROM checks
""",
)
def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the star schema's four FK
    edges: child row counts, ORPHAN counts (child keys with no
    parent), a deterministic sample orphan key for drill-down, and
    the pass flag — the load-gate run after every ingest, and the
    complement of dq_functional_deps (FDs check key DETERMINISM,
    this checks key EXISTENCE; sinks/gates.py raises on row-count
    gates, this localizes which edge broke). Spark has no FK
    constraints — this query IS the constraint, as code.

    Plan: each check is a LEFT join probing only the parent's key
    column (column-pruned to one side); dim parents broadcast,
    fact-fact (lineitem→orders) goes sort-merge on the join key.
    Counts partial-aggregate; the report is four rows."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    c = _t(spark, sf_dir, "customer")
    p = _t(spark, sf_dir, "part")
    n = _t(spark, sf_dir, "nation")

    def check(fk, child, ckey, parent, pkey, broadcast_parent=True):
        par = parent.select(pkey)
        if broadcast_parent:
            par = F.broadcast(par)
        j = child.select(ckey).join(par, F.col(ckey) == F.col(pkey), "left")
        return j.agg(
            F.lit(fk).alias("fk"),
            F.count(F.lit(1)).cast("bigint").alias("n_child"),
            F.sum(F.when(F.col(pkey).isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_orphans"),
            F.min(F.when(F.col(pkey).isNull(), F.col(ckey)))
            .cast("bigint")
            .alias("sample_orphan_key"),
        )
    checks = (
        check("orders.o_custkey->customer", o, "o_custkey", c, "c_custkey")
        .unionByName(
            check("lineitem.l_orderkey->orders", li, "l_orderkey", o, "o_orderkey",
                  broadcast_parent=False)
        )
        .unionByName(check("lineitem.l_partkey->part", li, "l_partkey", p, "p_partkey"))
        .unionByName(
            check("customer.c_nationkey->nation", c, "c_nationkey", n, "n_nationkey")
        )
    )
    return checks.select(
        "fk", "n_child", "n_orphans", "sample_orphan_key",
        (F.col("n_orphans") == 0).alias("intact"),
    )


@_q(
    "a_wasserstein_1d",
    """
WITH v AS (
  SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 'a' ELSE 'b' END AS arm,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
),
g AS (
  SELECT cents,
         CAST(count(*) FILTER (WHERE arm = 'a') AS BIGINT) AS a_n,
         CAST(count(*) FILTER (WHERE arm = 'b') AS BIGINT) AS b_n
  FROM v GROUP BY cents
),
c AS (
  SELECT cents,
         CAST(sum(a_n) OVER w AS BIGINT) AS cum_a,
         CAST(sum(b_n) OVER w AS BIGINT) AS cum_b,
         CAST(sum(a_n) OVER () AS BIGINT) AS n_a,
         CAST(sum(b_n) OVER () AS BIGINT) AS n_b,
         CAST(lead(cents) OVER (ORDER BY cents) AS BIGINT) AS next_cents
  FROM g
  WINDOW w AS (ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
s AS (
  SELECT n_a, n_b,
         CAST(sum(abs(n_b * cum_a - n_a * cum_b) * (next_cents - cents)) AS BIGINT)
           AS transport
  FROM c WHERE next_cents IS NOT NULL
  GROUP BY n_a, n_b
)
SELECT n_a, n_b, transport,
       CAST(floor(CAST(transport AS DOUBLE) / (CAST(n_a AS DOUBLE) * n_b)) AS BIGINT)
         AS w1_cents
FROM s
""",
)
def a_wasserstein_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-D Wasserstein-1 (earth mover's) distance between the urgent
    and low-priority order-value distributions — the TRANSPORT
    complement of a_ks_two_sample: KS reports the worst single CDF
    gap, W₁ = ∫|F̂_a − F̂_b|dx integrates every gap weighted by how
    far value must move, in the metric's own units (cents), which is
    what makes it the standard distribution-shift COST measure for
    monitoring (dq_psi_drift tells you IF; this tells you HOW MUCH,
    in money). On the merged value grain the integral is a closed
    sum: |n_b·cumA − n_a·cumB|·Δx per consecutive value pair — every
    term an exact BIGINT (the KS cross-multiplication plus a lead()
    gap), so `transport` is engine-identical by construction and the
    one double division at the end normalizes to cents.

    Plan: identical shape to a_ks_two_sample — one value-grain
    shuffle, one running window plus a lead over the same frame, one
    scalar reduce; nothing fact-sized is ever windowed."""
    o = _t(spark, sf_dir, "orders")
    v = o.filter(F.col("o_orderpriority").isin("1-URGENT", "5-LOW")).select(
        F.when(F.col("o_orderpriority") == "1-URGENT", "a").otherwise("b").alias("arm"),
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint").alias("cents"),
    )
    g = v.groupBy("cents").agg(
        F.sum(F.when(F.col("arm") == "a", 1).otherwise(0)).cast("bigint").alias("a_n"),
        F.sum(F.when(F.col("arm") == "b", 1).otherwise(0)).cast("bigint").alias("b_n"),
    )
    # r11 global-window sweep: running sums via ONE range shuffle,
    # totals via a 1-row broadcast aggregate, and the global lead()
    # via a distributed row_number + rn↔rn+1 self-join — nothing
    # value-grain ever funnels through a single partition.
    from graphql_api_etl_spark.operators.rank import (
        global_row_number,
        global_running_sums,
    )

    cums = global_running_sums(
        g, [F.asc("cents")], {"cum_a_raw": "a_n", "cum_b_raw": "b_n"}
    )
    rn = global_row_number(cums, [F.asc("cents")], out_col="__rn")
    nxt = rn.select(
        (F.col("__rn") - 1).alias("__rn"),
        F.col("cents").cast("bigint").alias("next_cents"),
    )
    tot = g.agg(
        F.sum("a_n").cast("bigint").alias("n_a"),
        F.sum("b_n").cast("bigint").alias("n_b"),
    )
    c = (
        rn.join(nxt, "__rn", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "cents",
            F.col("cum_a_raw").cast("bigint").alias("cum_a"),
            F.col("cum_b_raw").cast("bigint").alias("cum_b"),
            "n_a",
            "n_b",
            "next_cents",
        )
    )
    s = (
        c.filter(F.col("next_cents").isNotNull())
        .groupBy("n_a", "n_b")
        .agg(
            F.sum(
                F.abs(F.col("n_b") * F.col("cum_a") - F.col("n_a") * F.col("cum_b"))
                * (F.col("next_cents") - F.col("cents"))
            )
            .cast("bigint")
            .alias("transport")
        )
    )
    return s.select(
        "n_a", "n_b", "transport",
        F.floor(
            F.col("transport").cast("double")
            / (F.col("n_a").cast("double") * F.col("n_b"))
        )
        .cast("bigint")
        .alias("w1_cents"),
    )


@_q(
    "a_did_estimate",
    """
WITH e AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS es,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
),
g AS (SELECT min(es) AS mn_es, max(es) AS mx_es FROM e),
cells AS (
  SELECT CASE WHEN CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 7) AS BIGINT) % 2 = 0
              THEN 'A' ELSE 'B' END AS arm,
         CASE WHEN 2 * es < mn_es + mx_es THEN 'pre' ELSE 'post' END AS period,
         cents
  FROM e CROSS JOIN g
),
m AS (
  SELECT arm, period,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(cents) AS BIGINT) AS s1,
         CAST(sum(cents * cents) AS BIGINT) AS s2
  FROM cells GROUP BY arm, period
),
w AS (
  SELECT max(CASE WHEN arm = 'A' AND period = 'pre' THEN CAST(s1 AS DOUBLE) / n END) AS m_a0,
         max(CASE WHEN arm = 'A' AND period = 'post' THEN CAST(s1 AS DOUBLE) / n END) AS m_a1,
         max(CASE WHEN arm = 'B' AND period = 'pre' THEN CAST(s1 AS DOUBLE) / n END) AS m_b0,
         max(CASE WHEN arm = 'B' AND period = 'post' THEN CAST(s1 AS DOUBLE) / n END) AS m_b1,
         max(CASE WHEN arm = 'A' AND period = 'pre'
                  THEN ((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1)) / n END) AS v_a0,
         max(CASE WHEN arm = 'A' AND period = 'post'
                  THEN ((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1)) / n END) AS v_a1,
         max(CASE WHEN arm = 'B' AND period = 'pre'
                  THEN ((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1)) / n END) AS v_b0,
         max(CASE WHEN arm = 'B' AND period = 'post'
                  THEN ((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1)) / n END) AS v_b1,
         CAST(sum(n) AS BIGINT) AS n_total
  FROM m
)
SELECT n_total,
       CAST(floor((m_b1 - m_b0) - (m_a1 - m_a0)) AS BIGINT) AS did_cents,
       CAST(floor(((m_b1 - m_b0) - (m_a1 - m_a0))
            / sqrt(v_a0 + v_a1 + v_b0 + v_b1) * 10000) AS BIGINT) AS z_tenthousandths,
       abs(((m_b1 - m_b0) - (m_a1 - m_a0)) / sqrt(v_a0 + v_a1 + v_b0 + v_b1)) > 1.96
         AS significant
FROM w
""",
)
def a_did_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences: the treated arm's pre→post change
    minus the control arm's — the quasi-experimental estimator that
    nets out the secular time trend a naive before/after read-out
    absorbs as fake lift, and the last panel of the experimentation
    family (power → assign → z-test → CUPED → DiD). Cells are the
    deterministic md5 arm × integer-epoch-midpoint period split (the
    a_ab_cuped_adjust conventions); each cell reduces to exact
    BIGINT moments (n, Σx, Σx²); the estimate, its SE (√Σ of the
    four cell mean-variances), and the z are one identical double
    tree over those integers, fixed-pointed on output.

    Plan: one scan with the broadcast epoch frame, one
    partial-aggregated shuffle to FOUR cell rows, the max-CASE
    pivot, constant tail — DiD at any scale costs one metric pass."""
    ev = _t(spark, sf_dir, "events")
    e = ev.select(
        "user_id",
        F.unix_timestamp("ts").cast("bigint").alias("es"),
        F.floor(F.col("value") * 100 + 0.5).cast("bigint").alias("cents"),
    )
    g = e.agg(F.min("es").alias("mn_es"), F.max("es").alias("mx_es"))
    arm = F.when(
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 7), 16, 10)
        .cast("bigint") % 2 == 0,
        "A",
    ).otherwise("B")
    period = F.when(
        2 * F.col("es") < F.col("mn_es") + F.col("mx_es"), "pre"
    ).otherwise("post")
    m = (
        e.crossJoin(F.broadcast(g))
        .select(arm.alias("arm"), period.alias("period"), "cents")
        .groupBy("arm", "period")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("cents").cast("bigint").alias("s1"),
            F.sum(F.col("cents") * F.col("cents")).cast("bigint").alias("s2"),
        )
    )
    mean = F.col("s1").cast("double") / F.col("n")
    mvar = (
        (F.col("s2").cast("double") - F.col("s1").cast("double") * F.col("s1") / F.col("n"))
        / (F.col("n") - 1)
    ) / F.col("n")
    def pick(a, p, expr):
        return F.max(F.when((F.col("arm") == a) & (F.col("period") == p), expr))
    w = m.agg(
        pick("A", "pre", mean).alias("m_a0"), pick("A", "post", mean).alias("m_a1"),
        pick("B", "pre", mean).alias("m_b0"), pick("B", "post", mean).alias("m_b1"),
        pick("A", "pre", mvar).alias("v_a0"), pick("A", "post", mvar).alias("v_a1"),
        pick("B", "pre", mvar).alias("v_b0"), pick("B", "post", mvar).alias("v_b1"),
        F.sum("n").cast("bigint").alias("n_total"),
    )
    did = (F.col("m_b1") - F.col("m_b0")) - (F.col("m_a1") - F.col("m_a0"))
    se = F.sqrt(F.col("v_a0") + F.col("v_a1") + F.col("v_b0") + F.col("v_b1"))
    return w.select(
        "n_total",
        F.floor(did).cast("bigint").alias("did_cents"),
        F.floor(did / se * 10000).cast("bigint").alias("z_tenthousandths"),
        (F.abs(did / se) > 1.96).alias("significant"),
    )


@_q(
    "events_circular_hour_stats",
    """
WITH e AS (
  SELECT event_type,
         (CAST(floor(epoch(ts)) AS BIGINT) % 86400) // 60 AS minute_bin
  FROM events
),
g AS (
  SELECT event_type, minute_bin, CAST(count(*) AS BIGINT) AS w
  FROM e GROUP BY event_type, minute_bin
),
t AS (
  SELECT event_type, w,
         CAST(floor(1000000.0 * cos(2 * pi() * minute_bin / 1440.0)) AS BIGINT) AS c_t,
         CAST(floor(1000000.0 * sin(2 * pi() * minute_bin / 1440.0)) AS BIGINT) AS s_t
  FROM g
),
m AS (
  SELECT event_type,
         CAST(sum(w) AS BIGINT) AS n,
         CAST(sum(w * c_t) AS BIGINT) AS sc,
         CAST(sum(w * s_t) AS BIGINT) AS ss
  FROM t GROUP BY event_type
)
SELECT event_type, n,
       CAST(floor((atan2(CAST(ss AS DOUBLE), CAST(sc AS DOUBLE))
              + CASE WHEN atan2(CAST(ss AS DOUBLE), CAST(sc AS DOUBLE)) < 0
                     THEN 2 * pi() ELSE 0 END)
            * 24.0 / (2 * pi()) * 1000) AS BIGINT) AS mean_hour_milli,
       CAST(floor(1000.0 * sqrt(CAST(sc AS DOUBLE) * sc + CAST(ss AS DOUBLE) * ss)
            / (CAST(n AS DOUBLE) * 1000000.0)) AS BIGINT) AS resultant_milli
FROM m
""",
)
def events_circular_hour_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Circular (directional) statistics of event time-of-day per
    type: the mean DIRECTION on the 24 h clock and the resultant
    length R ∈ [0,1] — the correct "peak hour" answer where the
    arithmetic mean is wrong by construction (23:00 and 01:00
    average to noon linearly, midnight circularly; R says whether a
    peak exists at all: R→0 uniform traffic, R→1 a sharp spike).
    a_dow_seasonality's χ² says timing is non-uniform; this says
    WHERE it points.

    Determinism lessons encoded here (this entry found both):
    (1) DuckDB's epoch(ts) is FRACTIONAL and CAST-to-BIGINT ROUNDS
    while Spark's unix_timestamp truncates — on sub-second
    timestamps half the rows land one second apart, so every oracle
    that seconds-izes a raw ts must floor(epoch(ts)) (this audit
    hardened four earlier entries whose coarse comparisons had
    passed by luck). (2) Per-row fixed-pointed trig leaves
    |rows|-many libm floor-flip opportunities; QUANTIZING
    time-of-day to 1440 minute bins first (exact integer counts,
    one shuffle) runs trig once per BIN on identical inputs —
    verified bit-equal across engines for all 1440 — and keeps
    Σ count·term an exact BIGINT. atan2/sqrt run once per type
    over exact integers.

    Plan: one partial-aggregated shuffle to (type, minute) grain
    (≤ 1440·|types| rows), bin-grain trig, one rollup."""
    ev = _t(spark, sf_dir, "events")
    e = ev.select(
        "event_type",
        F.expr("(CAST(unix_timestamp(ts) AS BIGINT) % 86400) div 60").alias(
            "minute_bin"
        ),
    )
    g = e.groupBy("event_type", "minute_bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("w")
    )
    ang = 2 * 3.141592653589793 * F.col("minute_bin") / 1440.0
    t = g.select(
        "event_type", "w",
        F.floor(1000000.0 * F.cos(ang)).cast("bigint").alias("c_t"),
        F.floor(1000000.0 * F.sin(ang)).cast("bigint").alias("s_t"),
    )
    m = t.groupBy("event_type").agg(
        F.sum("w").cast("bigint").alias("n"),
        F.sum(F.col("w") * F.col("c_t")).cast("bigint").alias("sc"),
        F.sum(F.col("w") * F.col("s_t")).cast("bigint").alias("ss"),
    )
    a = F.atan2(F.col("ss").cast("double"), F.col("sc").cast("double"))
    ang_pos = a + F.when(a < 0, 2 * 3.141592653589793).otherwise(0.0)
    return m.select(
        "event_type", "n",
        F.floor(ang_pos * 24.0 / (2 * 3.141592653589793) * 1000)
        .cast("bigint")
        .alias("mean_hour_milli"),
        F.floor(
            1000.0
            * F.sqrt(
                F.col("sc").cast("double") * F.col("sc")
                + F.col("ss").cast("double") * F.col("ss")
            )
            / (F.col("n").cast("double") * 1000000.0)
        )
        .cast("bigint")
        .alias("resultant_milli"),
    )


@_q(
    "a_simpsons_detector",
    """
WITH base AS (
  SELECT c_mktsegment AS segment,
         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS grp,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders JOIN customer ON o_custkey = c_custkey
  WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
),
cell AS (
  SELECT segment, grp, CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS s
  FROM base GROUP BY segment, grp
),
strata AS (
  SELECT segment,
         max(CASE WHEN grp = 1 THEN n END) AS n1, max(CASE WHEN grp = 1 THEN s END) AS s1,
         max(CASE WHEN grp = 0 THEN n END) AS n0, max(CASE WHEN grp = 0 THEN s END) AS s0
  FROM cell GROUP BY segment
),
o AS (
  SELECT CAST(sum(n1) AS BIGINT) AS n1, CAST(sum(s1) AS BIGINT) AS s1,
         CAST(sum(n0) AS BIGINT) AS n0, CAST(sum(s0) AS BIGINT) AS s0
  FROM strata
)
SELECT segment,
       CAST(n1 AS BIGINT) AS n_urgent, CAST(n0 AS BIGINT) AS n_low,
       s1 * n0 > s0 * n1 AS urgent_higher,
       (SELECT s1 * n0 > s0 * n1 FROM o) AS overall_urgent_higher,
       (s1 * n0 > s0 * n1) != (SELECT s1 * n0 > s0 * n1 FROM o) AS sign_flip
FROM strata
""",
)
def a_simpsons_detector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson's-paradox detector: does "urgent orders are pricier
    than low-priority" hold in EVERY market segment, or only in the
    pooled aggregate (or vice versa)? Each stratum's mean comparison
    is the exact integer cross-multiplication s₁·n₀ > s₀·n₁ — no
    mean is ever divided — and the per-stratum direction is compared
    against the pooled direction computed from the SAME cell sums,
    flagging sign flips. This is the aggregation-bias audit that
    belongs next to every segment-level KPI rollup
    (a_repeat_purchase_rate, a_gini_concentration): a flipped
    stratum means the pooled number is answering a different
    question than the per-segment ones.

    Plan: broadcast dim join, ONE partial-aggregated shuffle to the
    2·|segments| cell grid; strata pivot and the pooled row are both
    derived from those cells — the fact table is read once."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    base = (
        o.filter(F.col("o_orderpriority").isin("1-URGENT", "5-LOW"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            F.col("c_mktsegment").alias("segment"),
            F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("grp"),
            F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint").alias("cents"),
        )
    )
    cell = base.groupBy("segment", "grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("s"),
    )
    pick = lambda g, col: F.max(F.when(F.col("grp") == g, F.col(col)))  # noqa: E731
    strata = cell.groupBy("segment").agg(
        pick(1, "n").alias("n1"), pick(1, "s").alias("s1"),
        pick(0, "n").alias("n0"), pick(0, "s").alias("s0"),
    )
    overall = strata.agg(
        F.sum("n1").cast("bigint").alias("on1"), F.sum("s1").cast("bigint").alias("os1"),
        F.sum("n0").cast("bigint").alias("on0"), F.sum("s0").cast("bigint").alias("os0"),
    )
    stratum_dir = F.col("s1") * F.col("n0") > F.col("s0") * F.col("n1")
    overall_dir = F.col("os1") * F.col("on0") > F.col("os0") * F.col("on1")
    return strata.crossJoin(F.broadcast(overall)).select(
        "segment",
        F.col("n1").alias("n_urgent"),
        F.col("n0").alias("n_low"),
        stratum_dir.alias("urgent_higher"),
        overall_dir.alias("overall_urgent_higher"),
        (stratum_dir != overall_dir).alias("sign_flip"),
    )


@_q(
    "events_entropy_rate",
    """
WITH s AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM events
),
p AS (
  SELECT event_type AS cur, nxt, CAST(count(*) AS BIGINT) AS n
  FROM s WHERE nxt IS NOT NULL GROUP BY event_type, nxt
),
r AS (SELECT cur, CAST(sum(n) AS BIGINT) AS rn FROM p GROUP BY cur),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM p),
term AS (
  SELECT p.cur, p.nxt,
         CAST(floor(-1000000000.0 * p.n * ln(CAST(p.n AS DOUBLE) / r.rn)
              / tot.nt) AS BIGINT) AS h_nano
  FROM p JOIN r ON p.cur = r.cur CROSS JOIN tot
)
SELECT CAST(count(*) AS BIGINT) AS n_cells,
       CAST(sum(h_nano) AS BIGINT) AS entropy_rate_nano
FROM term
""",
)
def events_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov entropy rate of the per-user event stream,
    H(Xₜ₊₁|Xₜ) = −Σ p(i,j)·ln p(j|i) in nats — the single number
    that says how PREDICTABLE user behaviour is from one step of
    history (0 = deterministic paths, ln|types| ≈ 1.609 = pure
    noise), the information-theoretic summary sitting on top of
    events_markov_transitions' matrix: recommendation and prefetch
    value lives exactly in the gap below the noise ceiling. Cell
    terms −n·ln(n/row)/N are fixed-pointed to NANO units per
    transition cell (the BM25 convention; ≤ |types|² cells) so the
    reported rate is an exact BIGINT sum.

    Plan: per-user lead over user-partitioned frames, one
    partial-aggregated shuffle to the |types|² cell grid, dim-grain
    arithmetic."""
    ev = _t(spark, sf_dir, "events")
    s = ev.select(
        "event_type",
        F.lead("event_type")
        .over(W.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    p = s.groupBy(F.col("event_type").alias("cur"), "nxt").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    r = p.groupBy(F.col("cur").alias("rcur")).agg(
        F.sum("n").cast("bigint").alias("rn")
    )
    tot = p.agg(F.sum("n").cast("bigint").alias("nt"))
    term = (
        p.join(F.broadcast(r), F.col("cur") == F.col("rcur"))
        .crossJoin(F.broadcast(tot))
        .select(
            F.floor(
                -1000000000.0
                * F.col("n")
                * F.log(F.col("n").cast("double") / F.col("rn"))
                / F.col("nt")
            )
            .cast("bigint")
            .alias("h_nano")
        )
    )
    return term.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.sum("h_nano").cast("bigint").alias("entropy_rate_nano"),
    )


@_q(
    "events_user_streaks",
    """
WITH ud AS (
  SELECT DISTINCT user_id,
         CAST(epoch(date_trunc('day', ts)) AS BIGINT) // 86400 AS day
  FROM events
),
isl AS (
  SELECT user_id, day,
         day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
  FROM ud
),
runs AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS streak
  FROM isl GROUP BY user_id, grp
),
per_user AS (
  SELECT user_id, CAST(max(streak) AS BIGINT) AS best_streak
  FROM runs GROUP BY user_id
)
SELECT best_streak,
       CAST(count(*) AS BIGINT) AS n_users
FROM per_user GROUP BY best_streak
""",
)
def events_user_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user, reported as
    the streak-length distribution — the engagement metric product
    teams actually ship ("7-day streak!") and the retention signal
    a_growth_accounting's week-grain lag classes are too coarse to
    see. Classic gaps-and-islands at USER-DAY grain: distinct
    (user, epoch-day) first (one shuffle collapses event volume to
    at most users×days rows), then day − row_number() is constant
    exactly within a consecutive run, and two rollups give each
    user's best streak and the population histogram. Every value is
    an exact integer; date_trunc before epoch keeps the day index
    immune to the fractional-seconds cast hazard this module's
    oracles document.

    Plan: one distinct shuffle to user-day grain, per-user windows
    over that grain (never raw events), two partial-aggregated
    rollups — the event table is read once."""
    ev = _t(spark, sf_dir, "events")
    ud = ev.select(
        "user_id",
        F.expr(
            "CAST(unix_timestamp(date_trunc('day', ts)) AS BIGINT) div 86400"
        ).alias("day"),
    ).distinct()
    isl = ud.select(
        "user_id", "day",
        (
            F.col("day")
            - F.row_number().over(W.partitionBy("user_id").orderBy("day"))
        ).alias("grp"),
    )
    runs = isl.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("streak")
    )
    per_user = runs.groupBy("user_id").agg(
        F.max("streak").cast("bigint").alias("best_streak")
    )
    return per_user.groupBy("best_streak").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    )


@_q(
    "a_hhi_concentration",
    """
WITH rev AS (
  SELECT n_name AS nation, l_suppkey,
         CAST(sum(CAST(floor(l_extendedprice / 1000 + 0.5) AS BIGINT)) AS BIGINT) AS kd
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  GROUP BY n_name, l_suppkey
),
s AS (
  SELECT nation,
         CAST(count(*) AS BIGINT) AS n_suppliers,
         CAST(sum(kd) AS BIGINT) AS total,
         CAST(sum(kd * kd) AS BIGINT) AS sumsq
  FROM rev GROUP BY nation
)
SELECT nation, n_suppliers, total AS total_kdollars,
       CAST(((1000000 * sumsq) // total) // total AS BIGINT) AS hhi_micro,
       CAST((1000 * total * total) // sumsq AS BIGINT) AS effective_n_milli
FROM s
""",
)
def a_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman supplier-concentration index per nation:
    HHI = Σ shareᵢ² of supplier revenue, plus its inverse — the
    EFFECTIVE number of suppliers (1/HHI, the inverse-Simpson
    diversity) — the concentration KPI procurement and antitrust
    actually use, and the supply-risk complement to
    a_gini_concentration's inequality view (Gini asks "how unequal",
    HHI asks "how few firms effectively exist"). Share squares never
    materialize — HHI = Σcᵢ²/(Σc)² from two exact BIGINT moments of
    the (nation, supplier) revenue rollup — and NO float ever runs:
    revenue is k$-granular (cents-squared overflows int64, and a
    float ratio rounds 10⁶·s/s² to 999999.999… on single-supplier
    nations — observed), 10⁶·Σc² fits comfortably, and the nested
    integer division ((10⁶·Σc²)//Σc)//Σc equals
    floor(10⁶·Σc²/(Σc)²) exactly (the positive-integer
    floor-composition identity), so a one-supplier nation reports
    precisely 1000000.

    Plan: one partial-aggregated shuffle to (nation, supplier) grain
    with broadcast dim joins, one rollup to |nations| rows."""
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    rev = (
        li.join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), "l_suppkey")
        .agg(
            F.sum(F.floor(F.col("l_extendedprice") / 1000 + 0.5).cast("bigint"))
            .cast("bigint")
            .alias("kd")
        )
    )
    s = rev.groupBy("nation").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_suppliers"),
        F.sum("kd").cast("bigint").alias("total"),
        F.sum(F.col("kd") * F.col("kd")).cast("bigint").alias("sumsq"),
    )
    return s.select(
        "nation", "n_suppliers",
        F.col("total").alias("total_kdollars"),
        F.expr("((1000000 * sumsq) div total) div total")
        .cast("bigint")
        .alias("hhi_micro"),
        F.expr("(1000 * total * total) div sumsq")
        .cast("bigint")
        .alias("effective_n_milli"),
    )


def _parquet_meta_oracle() -> str:
    """Row-group inventory oracle via DuckDB's parquet_metadata()
    against the SAME sf dir the Spark side reads
    ($SPARK_GRAFT_ORACLE_SF_DIR, default the driver's sf0.01)."""
    import os

    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    parts = []
    for t in ("lineitem", "orders", "events"):
        parts.append(
            f"""SELECT '{t}' AS table_name, CAST(row_group_id AS BIGINT) AS row_group,
       CAST(row_group_num_rows AS BIGINT) AS num_rows,
       CAST(count(*) AS BIGINT) AS n_columns,
       CAST(sum(total_compressed_size) AS BIGINT) AS compressed_bytes
FROM parquet_metadata('{sf_dir}/{t}.parquet')
GROUP BY row_group_id, row_group_num_rows"""
        )
    return " UNION ALL ".join(parts)


@_q("source_parquet_metadata", _parquet_meta_oracle)
def source_parquet_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet ROW-GROUP inventory for the three fact tables — the
    storage-introspection pass behind every layout decision this
    repo's layout_* entries then act on: row-group row counts decide
    whether maxPartitionBytes splits do anything, compressed bytes
    per group expose compaction debt (layout_compacted_scan), and a
    skewed group is a straggler foretold. Footers are harvested
    DISTRIBUTED: the file manifest becomes a DataFrame and each
    executor opens only footer bytes via pyarrow inside
    ``mapInPandas`` — at 100 TB the manifest is millions of files
    and THIS is the only shape that works (a driver loop over
    footers is the classic metadata bottleneck). DuckDB's
    parquet_metadata() replays the same numbers, so the differential
    pins byte-exact agreement between two independent footer
    parsers.

    Plan: manifest-sized input, Arrow map stage, no shuffle; output
    is row-group grain."""
    import pandas as pd

    files = [(t, f"{sf_dir}/{t}.parquet") for t in ("lineitem", "orders", "events")]
    manifest = spark.createDataFrame(files, "table_name string, path string")

    def read_footers(batches):
        import pyarrow.parquet as pq

        for pdf in batches:
            out = {"table_name": [], "row_group": [], "num_rows": [],
                   "n_columns": [], "compressed_bytes": []}
            for t, path in zip(pdf["table_name"], pdf["path"]):
                meta = pq.ParquetFile(path).metadata
                for i in range(meta.num_row_groups):
                    rg = meta.row_group(i)
                    out["table_name"].append(t)
                    out["row_group"].append(i)
                    out["num_rows"].append(rg.num_rows)
                    out["n_columns"].append(rg.num_columns)
                    out["compressed_bytes"].append(
                        sum(rg.column(j).total_compressed_size
                            for j in range(rg.num_columns))
                    )
            yield pd.DataFrame(out)

    return manifest.mapInPandas(
        read_footers,
        "table_name string, row_group bigint, num_rows bigint, "
        "n_columns bigint, compressed_bytes bigint",
    )


@_q(
    "x_fiscal_445_calendar",
    """
WITH wk AS (
  SELECT CAST(isoyear(o_orderdate) AS BIGINT) AS fy,
         CAST(weekofyear(o_orderdate) AS BIGINT) AS w,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
),
p AS (
  SELECT fy,
         CAST(least(4, (w - 1) // 13 + 1) AS BIGINT) AS quarter,
         CAST(CASE WHEN w >= 53 THEN 12
                   ELSE least(4, (w - 1) // 13 + 1) * 3 - 3
                        + CASE WHEN (w - 1) % 13 < 4 THEN 1
                               WHEN (w - 1) % 13 < 8 THEN 2
                               ELSE 3 END
              END AS BIGINT) AS period,
         cents
  FROM wk
)
SELECT fy AS fiscal_year, quarter, period,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(cents) AS BIGINT) AS revenue_cents
FROM p GROUP BY fy, quarter, period
""",
)
def x_fiscal_445_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-4-5 fiscal calendar rollup: orders mapped onto the
    retail-standard week-based calendar (four 13-week quarters of
    4+4+5-week periods on the ISO week grid; ISO week 53 folds into
    period 12, the leap-week convention) — the calendar ops entry
    the month-grain rollups (a_monthly_growth, adoption) can't
    substitute for, because 4-4-5 periods contain the SAME number of
    weekdays every year, which is the whole point retailers use them
    (month-over-month comps stop lying about weekend counts). ISO
    week/year come from both engines' native functions — verified
    identical across year boundaries (the Dec 29–Jan 3 rows that
    belong to the neighbouring ISO year are where naive
    year(month()) calendars silently misfile revenue); everything
    after is integer div/mod on the week number.

    Plan: map-only calendar math, one partial-aggregated shuffle to
    (fy, period) grain."""
    o = _t(spark, sf_dir, "orders")
    wk = o.select(
        F.expr("extract(YEAROFWEEK FROM o_orderdate)").cast("bigint").alias("fy"),
        F.weekofyear("o_orderdate").cast("bigint").alias("w"),
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint").alias("cents"),
    )
    quarter = F.least(F.lit(4), F.expr("(w - 1) div 13 + 1")).cast("bigint")
    in_q = (F.col("w") - 1) % 13
    period = (
        F.when(F.col("w") >= 53, 12)
        .otherwise(
            quarter * 3 - 3
            + F.when(in_q < 4, 1).when(in_q < 8, 2).otherwise(3)
        )
        .cast("bigint")
    )
    p = wk.select("fy", quarter.alias("quarter"), period.alias("period"), "cents")
    return p.groupBy(
        F.col("fy").alias("fiscal_year"), "quarter", "period"
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum("cents").cast("bigint").alias("revenue_cents"),
    )


@_q(
    "a_abc_xyz_matrix",
    """
WITH pm AS (
  SELECT l_partkey AS part, date_trunc('month', l_shipdate) AS m,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
         CAST(sum(CAST(floor(l_extendedprice + 0.5) AS BIGINT)) AS BIGINT) AS dollars
  FROM lineitem GROUP BY 1, 2
),
per AS (
  SELECT part,
         CAST(sum(dollars) AS BIGINT) AS rev,
         CAST(count(*) AS BIGINT) AS n_m,
         CAST(sum(qty) AS BIGINT) AS s1,
         CAST(sum(qty * qty) AS BIGINT) AS s2
  FROM pm GROUP BY part
),
abc AS (
  SELECT part, rev, n_m, s1, s2,
         CAST(sum(rev) OVER (ORDER BY rev DESC, part
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
         CAST(sum(rev) OVER () AS BIGINT) AS total
  FROM per
),
cls AS (
  SELECT CASE WHEN 10 * cum <= 8 * total THEN 'A'
              WHEN 100 * cum <= 95 * total THEN 'B' ELSE 'C' END AS abc_class,
         CASE WHEN n_m < 2 THEN 'Z'
              WHEN 4 * n_m * (n_m * s2 - s1 * s1) <= s1 * s1 * (n_m - 1) THEN 'X'
              WHEN n_m * (n_m * s2 - s1 * s1) <= s1 * s1 * (n_m - 1) THEN 'Y'
              ELSE 'Z' END AS xyz_class,
         rev
  FROM abc
)
SELECT abc_class, xyz_class,
       CAST(count(*) AS BIGINT) AS n_parts,
       CAST(sum(rev) AS BIGINT) AS revenue_dollars
FROM cls GROUP BY abc_class, xyz_class
""",
)
def a_abc_xyz_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC-XYZ inventory matrix: revenue importance (A ≤ 80% cumulative
    share, B ≤ 95%, C rest — a_abc_pareto's classes) CROSSED with
    demand variability (X: monthly-demand CV ≤ ½, Y: CV ≤ 1, Z:
    erratic or too short to tell) — the nine-cell planning grid that
    decides stocking policy (AX: automate replenishment; CZ: make to
    order). The CV thresholds are exact integer cross-multiplications
    of the per-part monthly moments — CV² = n(nΣq² − (Σq)²)/((n−1)(Σq)²)
    compared against ¼ and 1 by clearing denominators (4n(nΣq²−(Σq)²)
    ≤ (Σq)²(n−1), etc.) — so no variance, mean, or ratio is ever a
    float; the ABC cut reuses the integer cumulative-share
    comparisons.

    Plan: one shuffle to (part, month) grain, one to part grain, a
    DISTRIBUTED running share (operators/rank.global_running_sums,
    r11) for the cumulative cut, one rollup to ≤9 cells."""
    li = _t(spark, sf_dir, "lineitem")
    pm = li.groupBy(
        F.col("l_partkey").alias("part"),
        F.date_trunc("month", F.col("l_shipdate")).alias("m"),
    ).agg(
        F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("qty"),
        F.sum(F.floor(F.col("l_extendedprice") + 0.5).cast("bigint"))
        .cast("bigint")
        .alias("dollars"),
    )
    per = pm.groupBy("part").agg(
        F.sum("dollars").cast("bigint").alias("rev"),
        F.count(F.lit(1)).cast("bigint").alias("n_m"),
        F.sum("qty").cast("bigint").alias("s1"),
        F.sum(F.col("qty") * F.col("qty")).cast("bigint").alias("s2"),
    )
    # r11 global-window sweep: distributed running share + 1-row
    # broadcast total (was a single-partition window over |parts|).
    from graphql_api_etl_spark.operators.rank import global_running_sums

    tot = per.agg(F.sum("rev").cast("bigint").alias("total"))
    abc = (
        global_running_sums(
            per, [F.desc("rev"), F.asc("part")], {"cum_raw": "rev"}
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "part", "rev", "n_m", "s1", "s2",
            F.col("cum_raw").cast("bigint").alias("cum"),
            "total",
        )
    )
    var_num = F.col("n_m") * (F.col("n_m") * F.col("s2") - F.col("s1") * F.col("s1"))
    cv_den = F.col("s1") * F.col("s1") * (F.col("n_m") - 1)
    cls = abc.select(
        F.when(10 * F.col("cum") <= 8 * F.col("total"), "A")
        .when(100 * F.col("cum") <= 95 * F.col("total"), "B")
        .otherwise("C")
        .alias("abc_class"),
        F.when(F.col("n_m") < 2, "Z")
        .when(4 * var_num <= cv_den, "X")
        .when(var_num <= cv_den, "Y")
        .otherwise("Z")
        .alias("xyz_class"),
        "rev",
    )
    return cls.groupBy("abc_class", "xyz_class").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        F.sum("rev").cast("bigint").alias("revenue_dollars"),
    )


@_q(
    "events_lead_lag_xcorr",
    """
WITH d AS (
  SELECT CAST(epoch(date_trunc('day', ts)) AS BIGINT) // 86400 AS day,
         CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS v,
         CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS p
  FROM events GROUP BY 1
),
lags AS (SELECT unnest(range(-7, 8)) AS lag),
pair AS (
  SELECT l.lag, a.v AS x, b.p AS y
  FROM lags l JOIN d a ON TRUE JOIN d b ON b.day = a.day + l.lag
),
m AS (
  SELECT lag, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(y * y) AS BIGINT) AS syy,
         CAST(sum(x * y) AS BIGINT) AS sxy
  FROM pair GROUP BY lag
)
SELECT CAST(lag AS BIGINT) AS lag_days, n AS n_days,
       CAST(floor(1000000.0 * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
            / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                   * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)))
            AS BIGINT) AS xcorr_micro
FROM m
""",
)
def events_lead_lag_xcorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead-lag cross-correlation between the daily 'view' and
    'purchase' series at lags −7..+7 days: the peak lag answers "how
    long after browsing does buying happen?" — the cross-series
    companion to a_autocorr_lag's self-correlation, and the cheap
    screen run before any causal read of funnel timing (a peak at
    lag 0 with flat tails on this corpus is itself the honest
    finding: the synthetic streams co-move within a day). Per lag,
    the aligned-day pairing comes from a day-key equi-join (never a
    row-shifted window, so day gaps align correctly), and the five
    Pearson moments are exact BIGINTs; one double expression per lag
    row, floored.

    Plan: one partial-aggregated shuffle to day grain with FILTER
    pivots, a 15-lag × day-grain join (broadcast the 15-row lag
    frame), one rollup to 15 rows."""
    ev = _t(spark, sf_dir, "events")
    d = ev.groupBy(
        F.expr("CAST(unix_timestamp(date_trunc('day', ts)) AS BIGINT) div 86400").alias(
            "day"
        )
    ).agg(
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("bigint")
        .alias("v"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("p"),
    ).localCheckpoint(eager=True)
    lags = spark.range(-7, 8).select(F.col("id").alias("lag"))
    a = d.select(F.col("day").alias("aday"), F.col("v").alias("x"))
    b = d.select(F.col("day").alias("bday"), F.col("p").alias("y"))
    pair = (
        F.broadcast(lags)
        .crossJoin(a)
        .join(b, F.col("bday") == F.col("aday") + F.col("lag"))
        .select("lag", "x", "y")
    )
    m = pair.groupBy("lag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
    )
    r = (
        F.col("n").cast("double") * F.col("sxy")
        - F.col("sx").cast("double") * F.col("sy")
    ) / F.sqrt(
        (F.col("n").cast("double") * F.col("sxx") - F.col("sx").cast("double") * F.col("sx"))
        * (F.col("n").cast("double") * F.col("syy") - F.col("sy").cast("double") * F.col("sy"))
    )
    return m.select(
        F.col("lag").cast("bigint").alias("lag_days"),
        F.col("n").alias("n_days"),
        F.floor(1000000.0 * r).cast("bigint").alias("xcorr_micro"),
    )


# ---------------------------------------------------------------------------
# Interval coalescing — merge overlapping supplier shipping windows
# ---------------------------------------------------------------------------

_INTERVAL_COALESCE_SQL = """
WITH iv AS (
  SELECT l_suppkey AS k, CAST(l_shipdate AS DATE) AS s,
         CAST(l_shipdate AS DATE)
           + CAST((1 + (l_orderkey + l_linenumber) % 7) AS INTEGER) AS e
  FROM lineitem WHERE year(l_shipdate) = 1995 AND month(l_shipdate) <= 3
),
o AS (
  SELECT k, s, e, max(e) OVER (PARTITION BY k ORDER BY s, e
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
  FROM iv
),
fl AS (SELECT k, s, e, CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END AS st FROM o),
g AS (
  SELECT k, s, e, sum(st) OVER (PARTITION BY k ORDER BY s, e
           ROWS UNBOUNDED PRECEDING) AS gid
  FROM fl
),
sp AS (
  SELECT k, gid, min(s) AS ss, max(e) AS se, CAST(count(*) AS BIGINT) AS n_iv
  FROM g GROUP BY k, gid
)
SELECT k AS suppkey,
       CAST(sum(n_iv) AS BIGINT) AS n_intervals,
       CAST(count(*) AS BIGINT) AS n_spans,
       CAST(sum(date_diff('day', ss, se) + 1) AS BIGINT) AS covered_days,
       CAST(max(date_diff('day', ss, se) + 1) AS BIGINT) AS max_span_days
FROM sp GROUP BY k
"""


@_q("x_interval_coalesce", _INTERVAL_COALESCE_SQL)
def x_interval_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval COALESCING (union of overlapping/touching date ranges)
    — the missing member of the interval-algebra family next to
    interval JOIN (events_interval_join), range join
    (events_range_join_left) and concurrency (events_max_concurrency):
    per supplier, merge Q1-1995 shipping windows [shipdate, shipdate +
    transit] into maximal busy spans and report interval count, span
    count, covered days, and the longest span. Transit time is a
    deterministic synthesized 1–7 days of (orderkey + linenumber) —
    the operator under test is the merge, exactly as the mm family
    synthesizes payloads (the driver's trimmed lineitem carries no
    receipt date, ETL has no interval surface at all).

    The single-pass formulation every warehouse uses (gaps-and-
    islands): an interval OPENS a new span iff its start exceeds the
    running max end of everything before it in (start, end) order —
    one window max + one running sum per partition, then two
    aggregates; no self-join, no explode-to-days (a day-explode would
    be 90× the rows — correct but 90× the shuffle; covered_days
    falls out of span arithmetic instead). One shuffle on the
    partition key, then partial-aggregable rollups: the shape that
    holds at 100 TB where per-key interval lists are month-bounded.
    Ties on (s, e) are order-insensitive here: an equal-start-equal-
    end twin never opens a span regardless of which sorts first, so
    the emitted frame is engine-exact with no row_number tiebreak
    needed. DATE arithmetic is exact integer days on both sides."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.year("l_shipdate") == 1995) & (F.month("l_shipdate") <= 3)
    )
    iv = li.select(
        F.col("l_suppkey").alias("k"),
        F.col("l_shipdate").cast("date").alias("s"),
        F.expr(
            "date_add(CAST(l_shipdate AS DATE), "
            "CAST(1 + (l_orderkey + l_linenumber) % 7 AS INT))"
        ).alias("e"),
    )
    w = W.partitionBy("k").orderBy("s", "e")
    o = iv.withColumn(
        "pmax", F.max("e").over(w.rowsBetween(W.unboundedPreceding, -1))
    )
    fl = o.withColumn(
        "st",
        F.when(F.col("pmax").isNull() | (F.col("s") > F.col("pmax")), 1).otherwise(0),
    )
    g = fl.withColumn("gid", F.sum("st").over(w.rowsBetween(W.unboundedPreceding, 0)))
    sp = g.groupBy("k", "gid").agg(
        F.min("s").alias("ss"),
        F.max("e").alias("se"),
        F.count(F.lit(1)).cast("bigint").alias("n_iv"),
    )
    span_days = F.datediff("se", "ss") + F.lit(1)
    return sp.groupBy(F.col("k").alias("suppkey")).agg(
        F.sum("n_iv").cast("bigint").alias("n_intervals"),
        F.count(F.lit(1)).cast("bigint").alias("n_spans"),
        F.sum(span_days).cast("bigint").alias("covered_days"),
        F.max(span_days).cast("bigint").alias("max_span_days"),
    )


# ---------------------------------------------------------------------------
# Mann–Kendall trend test — exact-integer S and tie correction
# ---------------------------------------------------------------------------

_MANN_KENDALL_SQL = """
WITH m AS (
  SELECT n_name, date_trunc('month', o_orderdate) AS mon,
         CAST(count(*) AS BIGINT) AS n_orders
  FROM orders JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2
),
p AS (
  SELECT a.n_name,
         CASE WHEN b.n_orders > a.n_orders THEN 1
              WHEN b.n_orders < a.n_orders THEN -1 ELSE 0 END AS sg
  FROM m a JOIN m b ON a.n_name = b.n_name AND a.mon < b.mon
),
s AS (SELECT n_name, CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(sum(sg) AS BIGINT) AS s_stat
      FROM p GROUP BY n_name),
ties AS (
  SELECT n_name, CAST(coalesce(sum(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT) AS tie_term
  FROM (SELECT n_name, n_orders, CAST(count(*) AS BIGINT) AS t
        FROM m GROUP BY n_name, n_orders)
  WHERE t > 1 GROUP BY n_name
),
nm AS (SELECT n_name, CAST(count(*) AS BIGINT) AS n_months FROM m GROUP BY n_name)
SELECT nm.n_name AS nation, nm.n_months, s.s_stat, s.n_pairs,
       coalesce(ties.tie_term, 0) AS tie_term
FROM nm JOIN s ON nm.n_name = s.n_name
LEFT JOIN ties ON nm.n_name = ties.n_name
"""


@_q("a_mann_kendall", _MANN_KENDALL_SQL)
def a_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Kendall trend test per nation over monthly order counts —
    the nonparametric is-there-a-monotonic-trend test that pairs with
    the Theil–Sen slope entry (events_theilsen_trend estimates the
    slope; Mann–Kendall's S says whether to believe it). S = Σ_{i<j}
    sign(x_j − x_i) over month pairs plus the tie correction term
    Σ t(t−1)(2t+5) a variance computation needs — ALL exact BIGINTs
    (the metric is an order COUNT, never a float, so sign() can't
    waver on engine-specific float summation; z-scoring is one driver-
    side division away and deliberately left out of the frame).

    Plan: one month-grain rollup (two broadcast dim joins + partial
    agg), then the sign pair join per nation — C(n_months, 2) ≈ 3 k
    rows per key, bounded by the CALENDAR not the fact table, the
    same per-key-series shape as the lag/xcorr entries; a century of
    monthly data is 720 k pairs per key. Tie groups and month counts
    are two more tiny aggregates on the rollup."""
    m = (
        _t(spark, sf_dir, "orders")
        .join(
            F.broadcast(_t(spark, sf_dir, "customer")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name", F.date_trunc("month", "o_orderdate").alias("mon"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))
        .localCheckpoint(eager=True)
    )
    a, b = m.alias("a"), m.alias("b")
    # the rollup is |nations|·|months| rows at ANY fact-table scale —
    # broadcast the pair join's right side instead of letting the
    # planner sort-merge a calendar-bounded frame
    pairs = a.join(
        F.broadcast(b),
        (F.col("a.n_name") == F.col("b.n_name")) & (F.col("a.mon") < F.col("b.mon")),
    ).select(
        F.col("a.n_name").alias("n_name"),
        F.when(F.col("b.n_orders") > F.col("a.n_orders"), 1)
        .when(F.col("b.n_orders") < F.col("a.n_orders"), -1)
        .otherwise(0)
        .alias("sg"),
    )
    s = pairs.groupBy("n_name").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum("sg").cast("bigint").alias("s_stat"),
    )
    ties = (
        m.groupBy("n_name", "n_orders")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
        .filter(F.col("t") > 1)
        .groupBy("n_name")
        .agg(
            F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5))
            .cast("bigint")
            .alias("tie_term")
        )
    )
    nm = m.groupBy("n_name").agg(F.count(F.lit(1)).cast("bigint").alias("n_months"))
    return (
        nm.join(F.broadcast(s), "n_name")
        .join(F.broadcast(ties), "n_name", "left")
        .select(
            F.col("n_name").alias("nation"),
            "n_months",
            "s_stat",
            "n_pairs",
            F.coalesce("tie_term", F.lit(0)).cast("bigint").alias("tie_term"),
        )
    )


# ---------------------------------------------------------------------------
# Malformed-record recovery — PERMISSIVE CSV ingest with a corrupt channel
# ---------------------------------------------------------------------------

_CSV_CORRUPT_SQL = """
WITH o AS (
  SELECT o_orderkey, o_orderpriority, o_totalprice,
         (o_orderkey % 37 = 0) AS corrupt
  FROM orders
)
SELECT o_orderpriority,
       CAST(count(*) FILTER (WHERE NOT corrupt) AS BIGINT) AS n_good,
       CAST(count(*) FILTER (WHERE corrupt) AS BIGINT) AS n_corrupt,
       round(sum(o_totalprice) FILTER (WHERE NOT corrupt), 2) AS good_total
FROM o GROUP BY o_orderpriority
"""


@_q("source_csv_corrupt_recovery", _CSV_CORRUPT_SQL)
def source_csv_corrupt_recovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-record RECOVERY on CSV ingest — the source-robustness
    surface the clean roundtrip entries (jsonl/orc/text/fixed-width)
    never exercise, and a daily reality at 100 TB: a landing file is
    written with every 37th order's numeric column corrupted to a
    non-numeric token, then read back under PERMISSIVE mode with a
    DECLARED schema and a ``columnNameOfCorruptRecord`` channel — bad
    rows surface as (NULL fields + raw line) instead of failing the
    job or silently coercing. The entry accounts for both channels
    per priority class: corrupt rows keep their parseable priority
    column (CSV recovery is per-FIELD: only the poisoned numeric is
    NULL) but are counted via the corrupt-record column, and the good
    rows' totals must match the raw table's — proving recovery loses
    nothing and coerces nothing.

    Scale shape: line-splittable scan, per-row recovery is free in
    the parser, one partial-aggregable rollup; the corrupt channel
    costs one string column only on bad rows. The oracle replays the
    corruption rule arithmetically (key % 37)."""
    # version=2: the v1 writer used format_number (thousands separators
    # corrupted every field); data fingerprints alone can't see that
    path, cached = _layout_cache_path(sf_dir, "orders_badcsv", ["orders"], version=2)
    orders = _t(spark, sf_dir, "orders")
    if not cached:
        _publish_layout(
            lambda tmp: orders.select(
                F.concat_ws(
                    ",",
                    F.col("o_orderkey").cast("string"),
                    F.col("o_orderpriority"),
                    F.when(F.col("o_orderkey") % 37 == 0, F.lit("NOT_A_NUMBER"))
                    .otherwise(F.format_string("%.2f", F.col("o_totalprice")))
                    .alias("p"),
                )
            ).write.mode("overwrite").text(tmp),
            path,
        )
    schema = (
        "o_orderkey BIGINT, o_orderpriority STRING, o_totalprice DOUBLE, "
        "_corrupt STRING"
    )
    raw = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(path)
    )
    return raw.groupBy("o_orderpriority").agg(
        F.sum(F.when(F.col("_corrupt").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_good"),
        F.sum(F.when(F.col("_corrupt").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_corrupt"),
        F.round(F.sum(F.when(F.col("_corrupt").isNull(), F.col("o_totalprice"))), 2).alias(
            "good_total"
        ),
    )


# ---------------------------------------------------------------------------
# Kruskal–Wallis rank sums — k-group nonparametric location test inputs
# ---------------------------------------------------------------------------

_KRUSKAL_SQL = """
WITH c AS (
  SELECT o_orderpriority AS grp,
         CAST(round(o_totalprice * 100) AS BIGINT) AS v
  FROM orders
),
gv AS (SELECT grp, v, CAST(count(*) AS BIGINT) AS cg FROM c GROUP BY grp, v),
vals AS (SELECT v, CAST(sum(cg) AS BIGINT) AS t FROM gv GROUP BY v),
cum AS (
  SELECT v, t,
         CAST(coalesce(sum(t) OVER (ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS below
  FROM vals
),
ties AS (SELECT CAST(sum(t * t * t - t) AS BIGINT) AS tie_cubic FROM vals),
g AS (
  SELECT grp, CAST(sum(cg) AS BIGINT) AS n,
         CAST(sum(cg * (2 * below + t + 1)) AS BIGINT) AS sum_double_rank
  FROM gv JOIN cum USING (v) GROUP BY grp
)
SELECT grp AS priority, n, sum_double_rank, tie_cubic
FROM g CROSS JOIN ties
"""


@_q("a_kruskal_wallis", _KRUSKAL_SQL)
def a_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal–Wallis inputs per order-priority class — the k-group
    generalization of a_mannwhitney_u (does SOME priority class price
    differently?): per group the exact DOUBLED rank sum (2·rank̄ =
    2·cum_before + t + 1, the tie identity Spearman/Mann–Whitney use)
    and globally the tie-correction cubic Σ(t³ − t) the H statistic's
    denominator needs — H itself is one driver-side expression over
    these BIGINTs (H = [12/(N(N+1))]·Σ R̄ⱼ²/nⱼ − 3(N+1), tie-divided),
    deliberately left out of the frame: Σ Rⱼ² would square past int64
    at sf0.1's N≈150 k while the per-group SUMS stay exact at any N.

    Plan: the a_spearman_corr discipline — rank arithmetic at VALUE
    grain (one window over the distinct-price frame; the fact table
    is never windowed), the (group, value) count frame joins the
    cumulative map back, and everything reduces with partial
    aggregation. Exact integers end to end; ties are heavy at cent
    grain and the cubic term is genuinely non-zero."""
    c = _t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("grp"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("v"),
    )
    gv = c.groupBy("grp", "v").agg(F.count(F.lit(1)).cast("bigint").alias("cg"))
    vals = gv.groupBy("v").agg(F.sum("cg").cast("bigint").alias("t"))
    # r11 global-window sweep: distributed exclusive cumsum over the
    # value grain (operators/rank.global_running_sums).
    from graphql_api_etl_spark.operators.rank import global_running_sums

    cum = global_running_sums(
        vals, [F.asc("v")], {"below_raw": "t"}, inclusive=False
    ).select("v", "t", F.col("below_raw").cast("bigint").alias("below"))
    ties = vals.agg(
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .cast("bigint")
        .alias("tie_cubic")
    )
    g = (
        gv.join(cum, "v")
        .groupBy("grp")
        .agg(
            F.sum("cg").cast("bigint").alias("n"),
            F.sum(F.col("cg") * (2 * F.col("below") + F.col("t") + 1))
            .cast("bigint")
            .alias("sum_double_rank"),
        )
    )
    return g.crossJoin(F.broadcast(ties)).select(
        F.col("grp").alias("priority"), "n", "sum_double_rank", "tie_cubic"
    )


# ---------------------------------------------------------------------------
# Kendall tau-b — exact-integer concordance census (r8)
# ---------------------------------------------------------------------------

_KENDALL_TAU_SQL = """
WITH m AS (
  SELECT n_name, date_trunc('month', o_orderdate) AS mon,
         CAST(count(*) AS BIGINT) AS x,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS y
  FROM orders JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2
),
p AS (
  SELECT a.n_name,
         CASE WHEN b.x > a.x THEN 1 WHEN b.x < a.x THEN -1 ELSE 0 END AS sx,
         CASE WHEN b.y > a.y THEN 1 WHEN b.y < a.y THEN -1 ELSE 0 END AS sy
  FROM m a JOIN m b ON a.n_name = b.n_name AND a.mon < b.mon
)
SELECT n_name AS nation,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(CASE WHEN sx * sy = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_concordant,
       CAST(sum(CASE WHEN sx * sy = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_discordant,
       CAST(sum(CASE WHEN sx = 0 AND sy <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_tie_x,
       CAST(sum(CASE WHEN sy = 0 AND sx <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_tie_y,
       CAST(sum(CASE WHEN sx = 0 AND sy = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_tie_both
FROM p GROUP BY n_name
"""


@_q("a_kendall_tau", _KENDALL_TAU_SQL)
def a_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b concordance census per nation between the two
    monthly series the Mann-Kendall / Theil-Sen entries use one of:
    order count (x) vs revenue cents (y). Emits the five exact pair
    classes — concordant, discordant, x-only tie, y-only tie, both
    tied — from which tau-b is one driver-side expression
    ((nc − nd) / sqrt((n0−n1)(n0−n2))); the frame itself never floats,
    the same discipline as a_mann_kendall (sign() over exact BIGINTs
    cannot waver on engine-specific float summation; revenue is cents).

    Plan: month-grain rollup (broadcast dims + partial agg), then the
    C(n_months, 2) pair join per nation, broadcast on the right —
    bounded by the CALENDAR, not the fact table, like the Mann-Kendall
    and lead-lag entries. Spearman (a_spearman_corr) ranks VALUES;
    Kendall counts PAIR INVERSIONS — complementary rank statistics."""
    m = (
        _t(spark, sf_dir, "orders")
        .join(
            F.broadcast(_t(spark, sf_dir, "customer")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name", F.date_trunc("month", "o_orderdate").alias("mon"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("x"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("y"),
        )
        .localCheckpoint(eager=True)
    )
    a, b = m.alias("a"), m.alias("b")
    sgn = lambda l, r: F.when(r > l, 1).when(r < l, -1).otherwise(0)  # noqa: E731
    pairs = a.join(
        F.broadcast(b),
        (F.col("a.n_name") == F.col("b.n_name")) & (F.col("a.mon") < F.col("b.mon")),
    ).select(
        F.col("a.n_name").alias("n_name"),
        sgn(F.col("a.x"), F.col("b.x")).alias("sx"),
        sgn(F.col("a.y"), F.col("b.y")).alias("sy"),
    )
    c = lambda cond: F.sum(F.when(cond, 1).otherwise(0)).cast("bigint")  # noqa: E731
    return pairs.groupBy(F.col("n_name").alias("nation")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        c(F.col("sx") * F.col("sy") == 1).alias("n_concordant"),
        c(F.col("sx") * F.col("sy") == -1).alias("n_discordant"),
        c((F.col("sx") == 0) & (F.col("sy") != 0)).alias("n_tie_x"),
        c((F.col("sy") == 0) & (F.col("sx") != 0)).alias("n_tie_y"),
        c((F.col("sx") == 0) & (F.col("sy") == 0)).alias("n_tie_both"),
    )


# ---------------------------------------------------------------------------
# Multi-line JSON source + dynamic partition overwrite sink (r8)
# ---------------------------------------------------------------------------

_JSON_MULTILINE_SQL = """
SELECT o_orderpriority AS prio,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
FROM orders WHERE o_orderkey % 101 = 0
GROUP BY o_orderpriority
"""


@_q("source_json_multiline", _JSON_MULTILINE_SQL)
def source_json_multiline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-line JSON source (one pretty-printed ARRAY per file — the
    API-export / config-dump shape): unlike JSONL (source_jsonl_
    roundtrip), records span lines, so the reader MUST parse whole
    documents (``multiLine=true``) — the mode where Spark gives up
    line-level splitting and parallelizes per FILE. The landing file
    is written with the stdlib json module from a deterministic ~1%
    order subset (integer cents — no float rendering in the fixture),
    so the differential checks Spark's document-mode JSON parser
    against the parquet originals, not one JSON writer against itself.

    Scale note stated by the entry itself: a multi-line JSON file is
    one task — the 100 TB answer is many files (or JSONL), and this
    single-fixture scan is the documented worst case, not the
    recommended layout."""
    import json as _json
    import os as _os

    path, cached = _layout_cache_path(sf_dir, "orders_json_multiline", ["orders"])
    if not cached:
        rows = (
            _t(spark, sf_dir, "orders")
            .filter(F.col("o_orderkey") % 101 == 0)
            .select(
                F.col("o_orderkey").alias("k"),
                F.col("o_orderpriority").alias("prio"),
                F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
            )
            .collect()  # bounded: ~1% of orders, a fixture write
        )

        def _build(tmp: str) -> None:
            _os.makedirs(tmp, exist_ok=True)
            doc = [{"k": r["k"], "prio": r["prio"], "cents": r["cents"]} for r in rows]
            with open(_os.path.join(tmp, "orders.json"), "w") as f:
                _json.dump(doc, f, indent=2)  # records SPAN lines
            open(_os.path.join(tmp, "_SUCCESS"), "w").close()

        _publish_layout(_build, path)
    j = spark.read.option("multiLine", "true").json(path)
    return j.groupBy(F.col("prio")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum("cents").cast("bigint").alias("total_cents"),
    )


_DPO_SQL = """
WITH base AS (
  SELECT o_orderpriority, o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
final AS (
  SELECT * FROM base WHERE o_orderpriority <> '1-URGENT'
  UNION ALL
  SELECT * FROM base WHERE o_orderpriority = '1-URGENT' AND o_orderkey % 2 = 0
)
SELECT o_orderpriority AS prio,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(cents) AS BIGINT) AS total_cents
FROM final GROUP BY o_orderpriority
"""


@_q("sink_dynamic_partition_overwrite", _DPO_SQL)
def sink_dynamic_partition_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DYNAMIC partition overwrite semantics — the idempotent-backfill
    sink contract every partitioned lake job relies on: with
    ``spark.sql.sources.partitionOverwriteMode=dynamic``, an
    ``overwrite`` write replaces ONLY the partitions present in the
    incoming frame and leaves every other partition's files untouched
    (static mode would truncate the whole table first — the classic
    lost-data footgun). The fixture writes all five priority
    partitions, then overwrites just '1-URGENT' with its even-key
    subset; the differential checks the FINAL table state, so both a
    too-wide overwrite (other partitions truncated) and a too-narrow
    one (old urgent files surviving) break the match.

    The conf is set around the write and restored — at scale this is
    a per-job writer option, not a session default."""
    import shutil as _shutil

    path, cached = _layout_cache_path(sf_dir, "orders_dpo", ["orders"])
    if not cached:
        base = _t(spark, sf_dir, "orders").select(
            "o_orderpriority",
            "o_orderkey",
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        )

        def _build(tmp: str) -> None:
            _shutil.rmtree(tmp, ignore_errors=True)
            base.write.partitionBy("o_orderpriority").mode("overwrite").parquet(tmp)
            prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
            try:
                (
                    base.filter(
                        (F.col("o_orderpriority") == "1-URGENT")
                        & (F.col("o_orderkey") % 2 == 0)
                    )
                    .write.partitionBy("o_orderpriority")
                    .mode("overwrite")
                    .parquet(tmp)
                )
            finally:
                spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

        _publish_layout(_build, path)
    final = spark.read.parquet(path)
    return final.groupBy(F.col("o_orderpriority").alias("prio")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("cents").cast("bigint").alias("total_cents"),
    )


# ---------------------------------------------------------------------------
# Maximum drawdown — exact-cents running-peak window arithmetic (r8)
# ---------------------------------------------------------------------------

_MAX_DRAWDOWN_SQL = """
WITH daily AS (
  SELECT n_name, date_trunc('day', o_orderdate) AS d,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
  WHERE o_orderdate >= DATE '1997-01-01'
  GROUP BY 1, 2
),
cum AS (
  SELECT n_name, d,
         CAST(sum(cents - 400000) OVER
              (PARTITION BY n_name ORDER BY d) AS BIGINT) AS equity
  FROM daily
),
dd AS (
  SELECT n_name, d, equity,
         CAST(max(equity) OVER
              (PARTITION BY n_name ORDER BY d) AS BIGINT) AS peak
  FROM cum
)
SELECT n_name AS nation,
       CAST(count(*) AS BIGINT) AS n_days,
       CAST(max(peak - equity) AS BIGINT) AS max_drawdown_cents,
       CAST(max(equity) AS BIGINT) AS final_peak_cents
FROM dd GROUP BY n_name
"""


@_q("events_max_drawdown", _MAX_DRAWDOWN_SQL)
def events_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown per nation — the risk metric every financial /
    SLO time series wants: deepest peak-to-trough drop of a cumulative
    equity curve (daily revenue cents minus a fixed burn), i.e.
    ``max over t of (running-peak − equity_t)``. Inexpressible as one
    aggregate (it nests two prefix scans) but exactly two stacked
    window functions: running SUM for the equity curve, running MAX
    for the peak, then one ordinary aggregate over their difference —
    no self-join, no per-key sort beyond the one shuffle both windows
    share (same partitionBy+orderBy ⇒ one Window exchange+sort).

    All arithmetic is exact BIGINT cents (the ewma_trailing_cents
    discipline), so prefix sums are order-deterministic and the
    differential is a value hash, not a tolerance check. At 100 TB the
    day-grain rollup absorbs the fact table; the window runs on a
    |keys|×|days| frame."""
    daily = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1997-01-01").cast("date"))
        .join(
            F.broadcast(_t(spark, sf_dir, "customer")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name", F.date_trunc("day", "o_orderdate").alias("d"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        )
    )
    w = W.partitionBy("n_name").orderBy("d")
    cum = daily.withColumn(
        "equity",
        F.sum(F.col("cents") - F.lit(400000)).over(w).cast("bigint"),
    )
    dd = cum.withColumn("peak", F.max("equity").over(w).cast("bigint"))
    return dd.groupBy(F.col("n_name").alias("nation")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.max(F.col("peak") - F.col("equity")).cast("bigint").alias("max_drawdown_cents"),
        F.max("equity").cast("bigint").alias("final_peak_cents"),
    )


# ---------------------------------------------------------------------------
# Bitmap-accelerated distinct counting (r8) — Spark's bitmap aggregate
# family (3.5+), the warehouse technique for exact COUNT(DISTINCT) at
# scale without the distinct-explosion shuffle
# ---------------------------------------------------------------------------

_BITMAP_DISTINCT_SQL = """
SELECT event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(count(*) AS BIGINT) AS n_events
FROM events GROUP BY event_type
"""


@_q("a_bitmap_distinct", _BITMAP_DISTINCT_SQL)
def a_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct users per event type via Spark's BITMAP aggregate
    family (bitmap_bucket_number / bitmap_bit_position /
    bitmap_construct_agg / bitmap_count, SQL since 3.5) — the
    warehouse-native alternative to COUNT(DISTINCT): keys map to
    (bucket, bit) positions, each group×bucket folds into a 4 KB
    bitmap on the map side, and the final count is a popcount SUM.
    The aggregation is ASSOCIATIVE (bitmaps OR together), so unlike
    count(distinct) it composes with partial aggregation, rollup
    layers, and incremental refresh — precisely why bitmap indexes are
    the standard exact-distinct path at 100 TB, and the exact
    complement to the HLL sketch entries (a_approx_count_distinct,
    a_hll_registers): same shape, no error bound.

    The oracle is plain COUNT(DISTINCT) — a green row proves the whole
    bucket/bit/popcount pipeline loses and invents nothing. n_events
    rides along from the same pass (a second aggregate, not a second
    scan)."""
    ev = _t(spark, sf_dir, "events")
    per_bucket = (
        ev.select(
            "event_type",
            F.expr("bitmap_bucket_number(user_id)").alias("bucket"),
            F.expr("bitmap_bit_position(user_id)").alias("pos"),
            F.lit(1).alias("one"),
        )
        .groupBy("event_type", "bucket")
        .agg(
            F.expr("bitmap_count(bitmap_construct_agg(pos))").alias("n_distinct"),
            F.sum("one").cast("bigint").alias("n_rows"),
        )
    )
    return per_bucket.groupBy("event_type").agg(
        F.sum("n_distinct").cast("bigint").alias("n_users"),
        F.sum("n_rows").cast("bigint").alias("n_events"),
    )


# ---------------------------------------------------------------------------
# CSV writer/reader quoting roundtrip (r8) — the egress surface the
# clean-data entries never stress
# ---------------------------------------------------------------------------

# NOTE: the \n below is interpreted by PYTHON (non-raw string), so the
# SQL literal contains a REAL newline inside the quotes — matching the
# real newline Spark's F.lit(",\nx") injects. Do not "fix" it to \\n:
# DuckDB regular string literals do not interpret backslash escapes.
_CSV_ROUNDTRIP_SQL = """
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars,
       concat('v"', substr(text, 1, 20), ',\nx') AS hostile
FROM documents WHERE doc_id % 7 = 0
"""


@_q("sink_csv_roundtrip", _CSV_ROUNDTRIP_SQL)
def sink_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink→source roundtrip under HOSTILE field content: every
    value is wrapped with an embedded double quote, comma, and literal
    newline — the three characters that break naive CSV emitters —
    then written by Spark's CSV sink (RFC-4180 quoting) and read back
    with ``multiLine=true`` (quoted newlines span physical lines, so
    line-splitting parallelism is forfeit: same documented trade-off
    as source_json_multiline). The differential compares the ROUNDTRIP
    against the parquet-derived oracle, so a quoting, escaping, or
    newline-handling bug on either side of the sink/source pair breaks
    the value hash — this is the egress surface the reference's seven
    CSV report sinks (ETL:K1) rely on and no clean-data entry
    stresses.

    The landing dir is layout-cached (fingerprinted; one write per
    testdata generation). escape='"' pins RFC-4180 doubled-quote
    style explicitly — Spark's default escape is backslash, which
    DuckDB-style readers would misparse."""
    path, cached = _layout_cache_path(sf_dir, "docs_csv_hostile", ["documents"])
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 7 == 0)
    hostile = docs.select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars"),
        F.concat(
            F.lit('v"'), F.substring("text", 1, 20), F.lit(",\nx")
        ).alias("hostile"),
    )
    if not cached:
        _publish_layout(
            lambda tmp: hostile.write.mode("overwrite")
            .option("header", "true")
            .option("quoteAll", "true")
            .option("escape", '"')
            .csv(tmp),
            path,
        )
    back = (
        spark.read.option("header", "true")
        .option("multiLine", "true")
        .option("escape", '"')
        .schema("doc_id bigint, n_chars bigint, hostile string")
        .csv(path)
    )
    return back


# ---------------------------------------------------------------------------
# Null-aware anti join + ordered string_agg + codec roundtrip (r8)
# ---------------------------------------------------------------------------

_NAAJ_SQL = """
SELECT c_mktsegment AS segment,
       CAST(count(*) AS BIGINT) AS n_customers
FROM customer
WHERE c_custkey NOT IN (
  SELECT CASE WHEN o_totalprice > 400000 THEN NULL ELSE o_custkey END
  FROM orders WHERE o_orderstatus = 'F'
)
GROUP BY c_mktsegment
"""


@_q("j_null_aware_anti", _NAAJ_SQL)
def j_null_aware_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN with a NULLABLE subquery — the three-valued-logic trap
    every SQL engine must special-case: if the subquery produces even
    ONE NULL, ``x NOT IN (...)`` is never TRUE (x <> NULL is UNKNOWN),
    so the whole result is empty-or-filtered in a way a plain anti
    join gets WRONG. Spark plans this as a dedicated physical join —
    null-aware anti join (BroadcastHashJoin with isNullAwareAntiJoin,
    SPARK-32290) — and this entry pins its semantics against DuckDB's
    independent implementation: the subquery emits NULL for very large
    orders, so engines that degrade to a naive anti join return
    nonsense counts and break the hash. (The companion
    j_left_anti_unmatched covers the null-FREE fast path.)

    Expressed through spark.sql so the planner actually sees NOT IN
    (the DataFrame anti-join API would bypass the null-aware path).
    The CASE keeps the NULL injection deterministic and data-derived.
    Scale: the subquery side broadcasts (it must — NAAJ requires a
    broadcastable right side); the probe is one scan."""
    for t in ("customer", "orders"):
        _t(spark, sf_dir, t).createOrReplaceTempView(f"naaj_{t}")
    return spark.sql(_NAAJ_SQL.replace("FROM customer", "FROM naaj_customer")
                     .replace("FROM orders", "FROM naaj_orders"))


_STRING_AGG_SQL = """
WITH top_suppliers AS (
  SELECT n_name, s_name,
         row_number() OVER (PARTITION BY n_name ORDER BY s_acctbal DESC, s_name) AS rk
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
)
SELECT n_name AS nation,
       string_agg(s_name, ',' ORDER BY s_name) AS top3_csv,
       CAST(count(*) AS BIGINT) AS n
FROM top_suppliers WHERE rk <= 3
GROUP BY n_name
"""


@_q("a_string_agg_ordered", _STRING_AGG_SQL)
def a_string_agg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic LISTAGG / string_agg — the report-formatting
    aggregate that is nondeterministic by default on every distributed
    engine (collect order = partition arrival order) and therefore
    MUST be pinned with an explicit order to be reproducible. Spark
    has no ordered string_agg, so the engine-native spelling is
    ``concat_ws(',', array_sort(collect_list(x)))`` — collect in any
    order, sort inside the aggregate buffer, then join; DuckDB uses
    its native ``string_agg(... ORDER BY ...)``. A hash match proves
    the distributed collect+sort equals the engine-ordered aggregate —
    exactly the determinism discipline the reference's CSV report
    sinks need when they emit grouped lists (ETL: report formatting).

    Top-3 by account balance per nation keeps the lists bounded
    (window rank, TakeOrdered shape) — collect_list over an UNBOUNDED
    group would be the memory antipattern; ranking first is the scale
    answer."""
    sup = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("n_name", "s_name", "s_acctbal")
    )
    w = W.partitionBy("n_name").orderBy(F.desc("s_acctbal"), "s_name")
    top = sup.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 3)
    return top.groupBy(F.col("n_name").alias("nation")).agg(
        F.concat_ws(",", F.array_sort(F.collect_list("s_name"))).alias("top3_csv"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )


_CODEC_SQL = """
SELECT 'gzip' AS codec, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
FROM orders WHERE o_orderkey % 13 = 0
UNION ALL
SELECT 'snappy', CAST(count(*) AS BIGINT),
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
FROM orders WHERE o_orderkey % 13 = 0
UNION ALL
SELECT 'zstd', CAST(count(*) AS BIGINT),
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
FROM orders WHERE o_orderkey % 13 = 0
"""


@_q("layout_compression_codecs", _CODEC_SQL)
def layout_compression_codecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet compression-codec roundtrip: the same order subset
    written under gzip, snappy, and zstd (the three codecs a lake
    actually chooses between — ratio vs CPU vs decode speed), read
    back and aggregated per codec; a hash match proves every codec
    path is LOSSLESS through Spark's writer and reader. Codec choice
    is a first-order 100 TB lever (zstd typically ~30% smaller than
    snappy at similar decode cost, gzip smaller still but CPU-bound
    on write) and this entry pins that switching it can never change
    query results. File sizes deliberately NOT emitted — they vary by
    codec library build and would make the differential brittle; the
    lossless property is the invariant worth gating."""
    path, cached = _layout_cache_path(sf_dir, "orders_codecs", ["orders"])
    sub = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 13 == 0).select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    codecs = ("gzip", "snappy", "zstd")
    if not cached:

        def _build(tmp: str) -> None:
            import os as _os

            for c in codecs:
                sub.write.option("compression", c).mode("overwrite").parquet(
                    _os.path.join(tmp, c)
                )
            open(_os.path.join(tmp, "_SUCCESS"), "w").close()

        _publish_layout(_build, path)
    parts = []
    for c in codecs:
        parts.append(
            spark.read.parquet(f"{path}/{c}").agg(
                F.lit(c).alias("codec"),
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.sum("cents").cast("bigint").alias("total_cents"),
            ).select("codec", "n_rows", "total_cents")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


@_q(
    "events_asof_tolerance",
    """
WITH l AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'),
     r AS (SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase'),
a AS (
  SELECT l.user_id, l.ts AS lts, l.event_id AS click_id,
         r.ts AS rts, r.event_id AS purchase_id, r.value
  FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
)
SELECT user_id,
       strftime(lts, '%Y-%m-%d %H:%M:%S') AS click_ts,
       click_id,
       CASE WHEN rts >= lts - INTERVAL 6 HOUR THEN purchase_id END AS purchase_id,
       CASE WHEN rts >= lts - INTERVAL 6 HOUR THEN round(value, 2) END AS purchase_value,
       CAST(count(purchase_id) OVER () AS BIGINT) AS n_raw_matches,
       CAST(count(CASE WHEN rts >= lts - INTERVAL 6 HOUR THEN 1 END) OVER () AS BIGINT)
         AS n_fresh_matches
FROM a
""",
)
def events_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join WITH TOLERANCE (max staleness): each click gets the
    user's latest purchase at-or-before it ONLY if that purchase is
    within the last 6 hours — matches older than the tolerance become
    NULL. This is the attribution-window semantics every marketing/
    causal pipeline actually wants (an unbounded as-of credits a
    purchase from last month to today's click).

    Plan shape (VERDICT r8 What's-wrong #1 fix): ONE as-of join — the
    union-shuffle + ordered-window formulation of operators/asof.py —
    carrying the matched purchase's raw timestamp as a payload column
    (``rts``), so the 6-hour tolerance is a row-local predicate on the
    SAME frame, not a second join. For a backward as-of the post-filter
    is exactly as-of-with-tolerance: any purchase older than the latest
    one is staler still, so nulling the stale latest never hides a
    fresh fallback. Both audit totals (raw matches, fresh matches) are
    ONE 1-row aggregate over that frame broadcast back — no global
    single-partition window anywhere. The joined frame feeds two
    consumers (output rows + the totals agg); it is pinned once with
    ``localCheckpoint(eager=True)`` — the same two-consumer discipline
    as graph_hits/text_bpe_tokenize — so the union shuffle + window
    run ONCE instead of Catalyst duplicating the subtree per branch
    (divergent column pruning defeats ReuseExchange here). Net plan:
    one as-of shuffle+window (inside the checkpoint), a map-side
    partial 1-row agg, and a 1-row broadcast crossJoin — survives
    100x (checkpoint I/O is executor-local and ~|clicks| rows, far
    cheaper than recomputing the |clicks|+|purchases| shuffle twice).

    The two totals make the differential quantitative: n_raw_matches
    vs n_fresh_matches pins exactly how many matches the tolerance
    nulls out, so a tolerance applied with the wrong comparison (>/>=)
    or on the wrong side shifts a count, not just one row's NULL."""
    from graphql_api_etl_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", "ts", "event_id", "value")
        .withColumn("rts", F.col("ts"))
    )
    joined = asof_join(
        clicks, purchases, on="ts", by="user_id",
        right_cols=["event_id", "value", "rts"],
    ).localCheckpoint(eager=True)
    fresh = F.col("rts_right") >= F.col("ts") - F.expr("INTERVAL 6 HOURS")
    totals = joined.agg(
        F.count("event_id_right").cast("bigint").alias("n_raw_matches"),
        F.count(F.when(fresh, 1)).cast("bigint").alias("n_fresh_matches"),
    )
    return joined.select(
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        F.col("event_id").alias("click_id"),
        F.when(fresh, F.col("event_id_right")).alias("purchase_id"),
        F.when(fresh, F.round("value_right", 2)).alias("purchase_value"),
    ).crossJoin(F.broadcast(totals)).select(
        "user_id",
        "click_ts",
        "click_id",
        "purchase_id",
        "purchase_value",
        "n_raw_matches",
        "n_fresh_matches",
    )


@_q(
    "events_kaplan_meier",
    """
WITH lat AS (
  SELECT o_orderkey,
         (CAST(epoch(min(l_shipdate)) AS BIGINT)
          - CAST(epoch(o_orderdate) AS BIGINT)) // 86400 AS days
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  GROUP BY o_orderkey, o_orderdate
),
obs AS (
  SELECT CASE WHEN days <= 30 + o_orderkey % 31 THEN days
              ELSE 30 + o_orderkey % 31 END AS t,
         (days <= 30 + o_orderkey % 31) AS ev
  FROM lat
),
g AS (
  SELECT t, CAST(sum(CASE WHEN ev THEN 1 ELSE 0 END) AS BIGINT) AS d,
         CAST(sum(CASE WHEN ev THEN 0 ELSE 1 END) AS BIGINT) AS c
  FROM obs GROUP BY t
),
r AS (
  SELECT t, d,
         CAST(sum(d + c) OVER (ORDER BY t DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_risk
  FROM g
),
km AS (
  SELECT t, d, n_risk,
         exp(sum(ln(1.0 - CAST(d AS DOUBLE) / n_risk)) OVER (ORDER BY t
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS s
  FROM r WHERE d > 0
)
SELECT CAST(t AS BIGINT) AS t_days, n_risk AS n_at_risk, d AS n_events,
       round(s, 6) AS survival
FROM km
""",
)
def events_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival estimator over order-to-first-shipment
    latency with RIGHT CENSORING — the time-to-event analysis behind
    every fulfilment-SLA, churn, and incident-MTTR dashboard that a
    plain percentile report (a_order_to_ship_latency) gets wrong the
    moment observations are cut off: each order is administratively
    censored at 30 + o_orderkey % 31 days, so an order still unshipped
    at its cutoff contributes to every risk set it survived through
    but never to an event count. Output is the classic KM table — per
    event time t: n_at_risk (subjects with observation time >= t,
    computed as ONE descending cumulative sum over the day grain),
    n_events, and S(t) = prod(1 - d/n) as the cumulative product over
    event times.

    Determinism: risk sets and event counts are exact BIGINTs; the
    product is exp(cumsum(ln(1 - d/n))) — the SAME expression on both
    engines (never each engine's product()/aggregate internals) with
    round(6) absorbing float-sum order, the text_zipf_fit discipline.
    Ties between events and censorings at the same t follow the
    standard convention (censored-at-t remain at risk for events at t)
    by construction of the descending cumulative risk sum.

    Plan: one shuffle for the order-grain min (partial-aggregated),
    one to the DAY-VALUE grain (~latency-range + 31 rows), then two
    unpartitioned-but-dim-sized windows over that grain — the
    a_order_to_ship_latency discipline: windows never see the fact
    table."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    lat = (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.min("l_shipdate").alias("first_ship"))
        .select(
            "o_orderkey",
            F.expr(
                "(CAST(unix_timestamp(first_ship) AS BIGINT)"
                " - CAST(unix_timestamp(o_orderdate) AS BIGINT)) div 86400"
            ).alias("days"),
        )
    )
    cutoff = F.lit(30) + F.col("o_orderkey") % 31
    obs = lat.select(
        F.when(F.col("days") <= cutoff, F.col("days")).otherwise(cutoff).alias("t"),
        (F.col("days") <= cutoff).alias("ev"),
    )
    g = obs.groupBy("t").agg(
        F.sum(F.when(F.col("ev"), 1).otherwise(0)).cast("bigint").alias("d"),
        F.sum(F.when(F.col("ev"), 0).otherwise(1)).cast("bigint").alias("c"),
    )
    # global-window-ok: input is the censoring-time aggregate — t ≤ 61 by construction
    w_desc = W.orderBy(F.col("t").desc()).rowsBetween(W.unboundedPreceding, W.currentRow)
    r = g.select(
        "t", "d",
        F.sum(F.col("d") + F.col("c")).over(w_desc).cast("bigint").alias("n_risk"),
    ).filter(F.col("d") > 0)
    w_asc = W.orderBy("t").rowsBetween(W.unboundedPreceding, W.currentRow)
    surv = F.exp(
        F.sum(F.log(F.lit(1.0) - F.col("d").cast("double") / F.col("n_risk"))).over(w_asc)
    )
    return r.select(
        F.col("t").cast("bigint").alias("t_days"),
        F.col("n_risk").alias("n_at_risk"),
        F.col("d").alias("n_events"),
        F.round(surv, 6).alias("survival"),
    )


# ---------------------------------------------------------------------------
# ORC sink/source roundtrip over TEMPORAL + FLOAT types (r9) — the
# complement to source_orc_roundtrip (documents: strings/bigints):
# TIMESTAMP and DOUBLE are the two types ORC bridges actually break on
# ---------------------------------------------------------------------------

_ORC_ROUNDTRIP_SQL = """
SELECT event_id, ts, user_id, event_type, round(value, 6) AS value
FROM events WHERE event_id % 9 = 0
"""


@_q("sink_orc_roundtrip", _ORC_ROUNDTRIP_SQL)
def sink_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink→source roundtrip over the type spread the existing
    string/bigint ORC gate (source_orc_roundtrip) never stresses:
    TIMESTAMP (the zone-semantics trap — ORC stores local-time +
    writer zone where parquet stores instant-adjusted micros) and
    DOUBLE, written with zstd (the codec the string gate doesn't pin)
    and read back by Spark's vectorized ORC reader. The differential
    compares the ORC-roundtripped values against DuckDB reading the
    ORIGINAL parquet, so a timestamp-zone shift, a double rounding, or
    a predicate/stats bug on either side of the sink/source pair
    breaks the value hash. The landing dir is layout-cached
    (fingerprinted; one write per testdata generation), matching
    sink_csv_roundtrip / layout_compression_codecs."""
    path, cached = _layout_cache_path(sf_dir, "events_orc_zstd", ["events"])
    ev = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_id") % 9 == 0)
        .select(
            "event_id", "ts", "user_id", "event_type",
            F.round("value", 6).alias("value"),
        )
    )
    if not cached:
        _publish_layout(
            lambda tmp: ev.write.mode("overwrite")
            .option("compression", "zstd")
            .orc(tmp),
            path,
        )
    return spark.read.orc(path)


@_q(
    "events_asof_forward",
    """
WITH l AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'),
     r AS (SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase')
SELECT l.user_id,
       strftime(l.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
       l.event_id AS click_id,
       r.event_id AS next_purchase_id,
       round(r.value, 2) AS next_purchase_value,
       CAST(date_diff('second', l.ts, r.ts) AS BIGINT) AS secs_to_purchase
FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts <= r.ts
""",
)
def events_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join — each click paired with the user's NEXT
    purchase at-or-after it (time-to-conversion, the mirror of the
    backward attribution join): pandas merge_asof's direction axis,
    which the backward-only events_asof_join can't express. The
    operator (operators/asof.py, direction="forward") is backward
    under time reversal, so it reuses the identical one-shuffle
    union + ordered-window plan with the sort flipped — |L|+|R| rows
    shuffle once on user_id, no range explosion, AQE handles skewed
    users. Ties are inclusive (a purchase AT the click's timestamp is
    the next purchase), matching DuckDB's ASOF ... ON l.ts <= r.ts
    exactly; the seconds-to-purchase gap makes the differential
    quantitative — a wrong side priority at ties or an off-by-one in
    the carry shifts gaps, not just NULLs."""
    from graphql_api_etl_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", "ts", "event_id", "value")
        .withColumn("rts", F.col("ts"))
    )
    joined = asof_join(
        clicks, purchases, on="ts", by="user_id",
        right_cols=["event_id", "value", "rts"], direction="forward",
    )
    return joined.select(
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        F.col("event_id").alias("click_id"),
        F.col("event_id_right").alias("next_purchase_id"),
        F.round("value_right", 2).alias("next_purchase_value"),
        (F.unix_timestamp("rts_right") - F.unix_timestamp("ts"))
        .cast("bigint")
        .alias("secs_to_purchase"),
    )


@_q(
    "events_asof_nearest",
    """
WITH l AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'),
     r AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'),
b AS (
  SELECT l.event_id AS click_id, r.event_id AS pid, r.ts AS rts
  FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
),
f AS (
  SELECT l.event_id AS click_id, r.event_id AS pid, r.ts AS rts
  FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts <= r.ts
)
SELECT l.user_id,
       strftime(l.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
       l.event_id AS click_id,
       CASE WHEN b.pid IS NULL THEN f.pid
            WHEN f.pid IS NULL THEN b.pid
            WHEN epoch_us(l.ts) - epoch_us(b.rts)
                 <= epoch_us(f.rts) - epoch_us(l.ts) THEN b.pid
            ELSE f.pid END AS nearest_purchase_id,
       CAST(CASE WHEN b.pid IS NULL THEN epoch_us(f.rts) - epoch_us(l.ts)
                 WHEN f.pid IS NULL THEN epoch_us(b.rts) - epoch_us(l.ts)
                 WHEN epoch_us(l.ts) - epoch_us(b.rts)
                      <= epoch_us(f.rts) - epoch_us(l.ts)
                 THEN epoch_us(b.rts) - epoch_us(l.ts)
                 ELSE epoch_us(f.rts) - epoch_us(l.ts) END AS BIGINT) AS gap_us
FROM l
LEFT JOIN b ON l.event_id = b.click_id
LEFT JOIN f ON l.event_id = f.click_id
""",
)
def events_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST as-of join — each click paired with the temporally
    CLOSEST purchase in either direction, backward winning exact-
    distance ties (pandas merge_asof direction='nearest', completing
    the backward/forward/nearest axis on operators/asof.py). The
    operator computes BOTH carries over one union — a single shuffle
    on user_id, two window sorts on the same hash partitioning — and
    picks per row; the operator diffs timestamps as unix_micros
    BIGINTs (exact — fractional-second doubles have a ~0.24 µs ulp at
    current epochs, enough to flip an exact-distance tie; r10 ADVICE),
    and the oracle's two native ASOF joins + CASE replay the identical
    tie rule over the same integer epoch_us axis. The SIGNED gap_us output makes the differential
    quantitative: a flipped tie rule, a wrong carry side, or a
    boundary off-by-one shifts a gap's sign or magnitude, not just a
    NULL."""
    from graphql_api_etl_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", "ts", "event_id")
        .withColumn("rts", F.col("ts"))
    )
    joined = asof_join(
        clicks, purchases, on="ts", by="user_id",
        right_cols=["event_id", "rts"], direction="nearest",
    )
    return joined.select(
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("click_ts"),
        F.col("event_id").alias("click_id"),
        F.col("event_id_right").alias("nearest_purchase_id"),
        (F.unix_micros("rts_right") - F.unix_micros("ts"))
        .cast("bigint")
        .alias("gap_us"),
    )


@_q(
    "j_shuffle_hash_join",
    """
SELECT o_orderpriority,
       count(*) AS n_items,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1995-02-01 00:00:00'
GROUP BY o_orderpriority
""",
)
def j_shuffle_hash_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffled-hash join as an explicit strategy lever (r10): the
    month-filtered orders side carries a SHUFFLE_HASH hint, so Spark
    builds a per-partition hash map instead of sorting BOTH fact
    sides — skipping the two sort passes that dominate
    sort-merge-join time when the build side's partitions fit in
    memory. bench.py's flagship floors row quantifies the lever on the
    full-outer shape (SHJ 0.244 vs SMJ 0.306 marginal µs/row at 24×
    sf0.1); SMJ stays the repo-wide default because it spills
    gracefully — the hint is for joins where a selective filter
    (here: one order month) bounds the build side, the same judgment
    a 100 TB job makes per join. Plan-asserted as ShuffledHashJoin in
    tests/test_plans.py (the hint must not silently degrade to SMJ or
    broadcast)."""
    o = (
        _t(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1995-02-01").cast("timestamp"))
        )
        .hint("SHUFFLE_HASH")
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
    )


@_q(
    "x_try_arithmetic",
    """
SELECT o_orderkey,
       CASE WHEN o_custkey % 7 = 0 THEN NULL
            ELSE CAST(floor(o_totalprice / (o_custkey % 7) * 100) AS BIGINT)
       END AS price_per_bucket_cents,
       TRY_CAST(o_orderpriority AS INTEGER) AS prio_as_int,
       TRY_CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS prio_num,
       CASE WHEN o_custkey % 7 = 0 THEN NULL
            ELSE CAST(o_orderkey % (o_custkey % 7) AS BIGINT) END AS key_mod_bucket
FROM orders
WHERE o_orderkey % 32 = 0
""",
)
def x_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe scalar semantics (§2.8 extension; the reference's
    pandas arithmetic silently yields NaN/inf where SQL engines throw):
    try_divide and try_mod return NULL on zero denominators instead of
    raising (ANSI mode) or minting Inf (the pandas trap the reference
    inherits at ETL:1044's percentage division); try_cast returns NULL
    for malformed input ('1-URGENT' as INT) and parses clean digits
    (the priority's leading digit). The synthesized denominator o_custkey%7
    hits zero on every 7th customer, so both branches carry real rows
    at every SF. Map-only, pushdown intact; DuckDB replays the
    zero-denominator guard as CASE (its / raises on int zero-div) and
    malformed casts via TRY_CAST — two engines' independent
    error-handling paths must agree row-for-row. The division is
    emitted as floor-of-cents BIGINT (house fixed-point convention):
    round(x, 2) rounds .xx5 boundaries HALF_UP in Spark and half-even
    in DuckDB, observed as a 1-cent drift on the first differential
    run."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 32 == 0)
    bucket = F.col("o_custkey") % 7
    return o.select(
        "o_orderkey",
        F.floor(F.try_divide(F.col("o_totalprice"), bucket) * 100)
        .cast("bigint")
        .alias("price_per_bucket_cents"),
        F.expr("try_cast(o_orderpriority AS INT)").alias("prio_as_int"),
        F.expr("try_cast(substr(o_orderpriority, 1, 1) AS BIGINT)").alias("prio_num"),
        F.expr("try_mod(o_orderkey, o_custkey % 7)").cast("bigint").alias("key_mod_bucket"),
    )
