"""Corpus-level curation operators: duplicate-span removal (C4-style),
deterministic global shuffle / shard assignment, Bloom-filter
decontamination, and corpus unigram language-model scoring.

These are the "whole-corpus" passes of a training-data pipeline — each
one's scale shape is documented per function. All are native-expression
(zero Python UDFs); every hash the operators use is md5-derived so a
SQL oracle on another engine computes bit-identical results.

Engine-native extensions beyond the reference (whose only global text
op is ``drop_duplicates``, ETL:781 ≡ ``/root/reference/weekly
alignments GQL API.py:781``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from graphql_api_etl_spark.operators.text import tokens

SPAN_WORDS = 20  # C4 uses 3-sentence spans; word-count spans are the
# line-free equivalent for single-line corpora.

BLOOM_BITS = 8192
BLOOM_HASHES = 3

SHARD_SEED = "shard-seed-42:"


def _hex7(col: Column) -> Column:
    """28-bit engine-portable hash: first 7 hex chars of an md5."""
    return F.conv(F.substring(col, 1, 7), 16, 10).cast("bigint")


# ---------------------------------------------------------------------------
# Duplicate-span removal (C4 / RefinedWeb style)
# ---------------------------------------------------------------------------


def span_rows(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
              span_words: int = SPAN_WORDS) -> DataFrame:
    """Explode each document into non-overlapping ``span_words``-word
    spans: one row per (doc, span_idx, span text). The final partial
    span is kept. Map-only — spans are built with native array
    expressions inside whole-stage codegen, then exploded."""
    toked = df.select(
        F.col(id_col), tokens(text_col).alias("__toks")
    ).withColumn("__n_spans", F.greatest(
        F.ceil(F.size("__toks") / F.lit(float(span_words))).cast("int"), F.lit(1)
    ))
    spans = F.expr(
        f"transform(sequence(0, __n_spans - 1), "
        f"i -> array_join(slice(__toks, i * {span_words} + 1, {span_words}), ' '))"
    )
    return (
        toked.select(F.col(id_col), F.posexplode(spans).alias("span_idx", "span"))
    )


def dedup_spans(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                span_words: int = SPAN_WORDS) -> DataFrame:
    """Corpus-wide duplicate-span removal with document reassembly —
    the C4 "three-sentence span" dedup re-expressed for single-line
    corpora. A span occurring anywhere else in the corpus survives
    only at its first occurrence (ordered by (doc_id, span_idx));
    every other occurrence is cut and the document re-joined from its
    surviving spans.

    Returns (doc_id, n_spans, n_kept, new_text).

    Scale shape: exactly two shuffles regardless of corpus size —
    (1) a window over the span text itself (the dedup key; partial
    ordering happens in the shuffle sort, no driver state), and
    (2) the per-document reassembly aggregate. Both keys are
    high-cardinality, so partitions stay balanced; no all-pairs
    comparison and no driver-side collection anywhere.
    """
    rows = span_rows(df, text_col, id_col, span_words)
    keep = (
        F.row_number().over(
            W.partitionBy("span").orderBy(F.col(id_col), F.col("span_idx"))
        )
        == 1
    )
    flagged = rows.withColumn("keep", keep)
    kept_struct = F.when(F.col("keep"), F.struct("span_idx", "span"))
    return flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_spans"),
        F.sum(F.col("keep").cast("bigint")).cast("bigint").alias("n_kept"),
        F.coalesce(
            F.array_join(
                # collect_list skips nulls → only kept spans; array_sort
                # on the struct orders by span_idx (first field).
                F.transform(
                    F.array_sort(F.collect_list(kept_struct)), lambda s: s["span"]
                ),
                " ",
            ),
            F.lit(""),
        ).alias("new_text"),
    )


# ---------------------------------------------------------------------------
# Deterministic global shuffle → training shards
# ---------------------------------------------------------------------------


def global_shuffle(df: DataFrame, id_col: str = "doc_id", n_shards: int = 8,
                   seed: str = SHARD_SEED) -> DataFrame:
    """Deterministic corpus shuffle + shard assignment: the "shuffle
    your training data once, reproducibly" pass. Each row gets a
    pseudo-random-but-deterministic sort key (md5 of seed+id), a shard
    (28-bit key prefix mod ``n_shards``) and a position within its
    shard.

    Returns (id, shard_id, pos) — ``pos`` is 1-based within shard,
    ordered by (shuffle_key, id).

    Scale shape: one shuffle on shard_id. In a real 100 TB write you'd
    ``repartition(n_shards, shard_id).sortWithinPartitions(key)`` and
    write one shard per directory; the row_number window here has the
    identical partitioning so Catalyst runs both in the same exchange.
    md5 keys distribute uniformly, so shards are balanced by
    construction (no skew handling needed).
    """
    key = F.md5(F.concat(F.lit(seed), F.col(id_col).cast("string")))
    keyed = df.select(F.col(id_col), key.alias("shuffle_key"))
    shard = (_hex7(F.col("shuffle_key")) % n_shards).alias("shard_id")
    pos = F.row_number().over(
        W.partitionBy("shard_id").orderBy("shuffle_key", id_col)
    )
    return (
        keyed.select(F.col(id_col), F.col("shuffle_key"), shard)
        .withColumn("pos", pos.cast("bigint"))
    )


# ---------------------------------------------------------------------------
# Deterministic Bloom-filter decontamination
# ---------------------------------------------------------------------------


def bloom_position_cols(col: Column, n_bits: int = BLOOM_BITS,
                        n_hashes: int = BLOOM_HASHES) -> list[Column]:
    """The k bit positions a key sets/probes: independent md5-derived
    hashes (domain-separated by index), each mod ``n_bits``. Fully
    deterministic → another engine computes the identical filter."""
    return [
        _hex7(F.md5(F.concat(F.lit(f"bloom{j}:"), col))) % n_bits
        for j in range(n_hashes)
    ]


def bloom_positions(col: Column, n_bits: int = BLOOM_BITS,
                    n_hashes: int = BLOOM_HASHES) -> Column:
    return F.array(*bloom_position_cols(col, n_bits, n_hashes))


def bloom_build(keys: DataFrame, key_col: str = "key",
                n_bits: int = BLOOM_BITS, n_hashes: int = BLOOM_HASHES) -> DataFrame:
    """Build the filter from a (small) key set: the DISTINCT set-bit
    positions as rows (column ``p``). Bounded by min(n_bits, k·|keys|)
    rows — a few KB for a benchmark-decontamination build side, so the
    probe can broadcast it as a hash table. Two earlier representations
    measured badly: a sorted array probed with array_contains is an
    interpreted O(|set|) scan PER PROBE (~20× slower), and a dense
    n_bits boolean bitmap costs an O(n_bits·|set|) interpreted
    transform on one task at build (~4 s). Position rows + broadcast
    hash joins keep both sides codegen'd and O(1)."""
    return keys.select(
        F.explode(bloom_positions(F.col(key_col), n_bits, n_hashes)).alias("p")
    ).distinct()


def bloom_bitmap(keys: DataFrame, key_col: str = "key",
                 n_bits: int = BLOOM_BITS, n_hashes: int = BLOOM_HASHES,
                 out_col: str = "bm") -> DataFrame:
    """The filter as ONE row holding a ``map<int, bigint>`` of 64-bit
    words (word index = p >> 6, bit = p & 63) — n_bits/64 entries, a
    few KB. Probing this shape is a pure EXPRESSION
    (:func:`bloom_hit_expr`) instead of k broadcast hash joins: the
    corpus side stays a single map-stage with no join in the plan at
    all, which also lets the probe run INSIDE an array lambda (per
    gram of an un-exploded gram set). The map lookup is O(1)-ish for
    the 128-entry map and, unlike the sorted-array representation that
    measured 20× slow (see :func:`bloom_build`), touches 1 word per
    hash, not the whole set."""
    words = (
        bloom_build(keys, key_col, n_bits, n_hashes)
        .groupBy((F.col("p") / 64).cast("int").alias("w"))
        # set-bit positions are DISTINCT (bloom_build), so summing
        # 2^bit per word equals the bitwise OR of the word's bits
        .agg(F.sum(F.expr("shiftleft(cast(1 as bigint), cast(p % 64 as int))")).alias("bits"))
    )
    return words.groupBy().agg(
        F.map_from_entries(F.collect_list(F.struct("w", "bits"))).alias(out_col)
    )


def bloom_hit_expr(key: Column, bm: Column,
                   n_bits: int = BLOOM_BITS, n_hashes: int = BLOOM_HASHES) -> Column:
    """True iff ALL k bit positions of ``key`` are set in the
    :func:`bloom_bitmap` map ``bm`` — usable anywhere an expression
    is, including inside ``F.filter``/``F.transform`` lambdas."""
    hit = None
    for p in bloom_position_cols(key, n_bits, n_hashes):
        word = F.coalesce(
            F.element_at(bm, (p / 64).cast("int")), F.lit(0).cast("bigint")
        )
        bit = (p % 64).cast("int")
        c = F.call_function("shiftright", word, bit).bitwiseAND(
            F.lit(1).cast("bigint")
        ) == 1
        hit = c if hit is None else hit & c
    return hit


def bloom_probe(df: DataFrame, key_col: str, bloom: DataFrame,
                n_bits: int = BLOOM_BITS, n_hashes: int = BLOOM_HASHES,
                out_col: str = "bloom_hit") -> DataFrame:
    """Probe: a key hits iff ALL its k positions are set — k broadcast
    hash LEFT joins against the position set, hit = every join matched.
    Map-only over the corpus (the identical broadcast subtree is
    planned once and reused), fully inside whole-stage codegen — the
    scale path for "drop anything that might be in the benchmark"
    before an exact confirmation join."""
    markers = [f"__bloom_p{j}" for j in range(n_hashes)]
    out = df
    hit = None
    for marker, p in zip(markers, bloom_position_cols(F.col(key_col), n_bits, n_hashes)):
        out = out.join(
            F.broadcast(bloom.select(F.col("p").alias(marker))),
            p == F.col(marker),
            "left",
        )
        term = F.col(marker).isNotNull()
        hit = term if hit is None else hit & term
    return out.withColumn(out_col, hit).drop(*markers)


# ---------------------------------------------------------------------------
# Corpus unigram LM scoring
# ---------------------------------------------------------------------------


def unigram_logprob(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                    round_to: int = 3) -> DataFrame:
    """Per-document mean unigram log-probability under the corpus's own
    unigram distribution — the cheap KenLM-style "how typical is this
    text" quality score (low = rare/garbled vocabulary, the classic
    pre-training filter signal).

    Returns (id, n_tokens, avg_logprob) with avg_logprob = mean over
    the doc's tokens of ln(count(word)/total_tokens), rounded.

    Scale shape: three aggregates, all partial-applied map-side —
    (1) vocab counts (shuffle keyed by word; heavy hitters are
    *helped* by partial aggregation since each map task emits one row
    per distinct word), (2) a single-row total, and (3) the per-doc
    mean. The vocab table is tiny relative to the corpus (Heaps' law)
    and is broadcast back, so the corpus-sized side never reshuffles.
    """
    words = df.select(
        F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("word")
    )
    vocab = words.groupBy("word").agg(F.count(F.lit(1)).alias("c"))
    total = vocab.agg(F.sum("c").alias("total"))
    scored = vocab.crossJoin(F.broadcast(total)).select(
        "word", F.log(F.col("c") / F.col("total")).alias("lp")
    )
    return (
        words.join(F.broadcast(scored), "word")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.round(F.avg("lp"), round_to).alias("avg_logprob"),
        )
    )
