"""Scalar-function batteries (datetime/math/null/array/regex/map),
schema-evolution sources, and the MERGE/SCD2 sink families.

Split out of the round-11 query monolith (r12, VERDICT ask #4):
a pure move — entries register into the shared QUERIES dict in
the original order via the package __init__ import sequence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from graphql_api_etl_spark.operators.join import anti, cross, outer_merge, semi
from graphql_api_etl_spark.queries._registry import (  # noqa: F401
    QUERIES,
    Oracle,
    QueryFn,
    _q,
    _t,
)
from graphql_api_etl_spark.sources.registry import load_table
from graphql_api_etl_spark.queries.tpch import _layout_cache_path, _publish_layout  # noqa: F401



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




__catalog_exports__ = [
    'events_latest_per_user',
    'source_text_lines',
    'sink_merge_upsert',
    'sink_scd2_history',
    'x_datetime_functions',
    'curate_dataset_card',
    'x_math_functions',
    'x_null_semantics',
    'events_anomaly_zscore',
    'so_union_schema_evolution',
    'source_schema_merge_read',
    'x_array_functions',
    'a_corr_covar',
    'x_regex_functions',
    'a_filtered_agg',
    'x_map_functions',
    'x_edit_distance',
    'a_histogram_bins',
    'a_mode_per_group',
]
