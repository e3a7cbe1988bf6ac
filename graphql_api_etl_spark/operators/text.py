"""Text-analysis operators for large-scale training-data pipelines:
tokenization stats, quality scoring, language-ID heuristic, document
fingerprinting.

All operators are pure native-expression column pipelines (JVM-side,
whole-stage codegen — no Python UDFs), so they run at scan speed and
scale linearly: no shuffles at all except where an aggregate is
explicitly requested. At 100 TB each of these is a single map-only
pass over the documents table.

Engine-native extensions beyond the reference (which has only X1–X9
scalar string ops, SURVEY.md §2.8); the ingestion-side normalization
(lower/trim, ETL:642/756) reappears here as ``norm_text``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = r"\s+"

# Default per-"language" marker profiles for the heuristic language ID.
# Real deployments pass their own profiles (e.g. top-k stopwords per
# language); scoring = count of marker-token hits per profile, argmax
# wins. Deterministic, vocabulary-driven, zero-UDF.
DEFAULT_LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "to"],
    "query_ish": ["table", "row", "column", "join", "query"],
    "exec_ish": ["scan", "hash", "merge", "batch", "spark"],
}


def repartition_for_cpu(df: DataFrame) -> DataFrame:
    """Spread a narrow-partitioned input across the cluster's cores
    before a CPU-heavy map stage. No-op when already wide enough.
    (Moved here from operators.dedup in r14-opt so text operators can
    use it without a circular import; dedup re-exports it.)"""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization of trimmed text."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), TOKEN_SPLIT_RE)


def norm_text(col: Column | str) -> Column:
    """Canonical text form for hashing/dedup: lower + trim + collapsed
    whitespace (the reference's email normalization pattern, ETL:642)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")


def norm_tokens(col: Column | str) -> Column:
    """Case-normalized whitespace tokens without the collapse pass:
    equals ``tokens(norm_text(text))`` exactly, but replaces
    norm_text's collapse-whitespace regexp_replace — a full rewrite
    traversal of every document — with an ANCHORED edge strip
    (``^\\s+|\\s+$``), because splitting on ``\\s+`` already treats a
    run of whitespace as one boundary (r14-opt; guide §1.2 "per-task
    work"; measured 0.20 s → 0.14 s on the sf0.1 3-gram chain). The
    edge strip cannot be plain ``trim`` (space-only in Spark): a
    leading/trailing tab or newline must vanish exactly as the
    collapse+trim pair made it vanish — the divergence is pinned as an
    adversarial case in tests/test_operators.py alongside full-corpus
    equality at all three SFs. NOTE: only for TOKEN consumers —
    anything hashing the normalized STRING itself (exact_dedup,
    fingerprints) still needs :func:`norm_text`."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.regexp_replace(F.lower(c), r"^\s+|\s+$", ""), TOKEN_SPLIT_RE)


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


# BPE-ish pre-tokenization: letter runs / digit runs / punctuation runs,
# the language-agnostic core of GPT-2-style pre-tokenizers. Deliberately
# lookahead-free so Java regex and RE2 (DuckDB) agree.
BPE_ISH_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def bpe_ish_tokens(col: Column | str) -> Column:
    """Regex pre-tokenization (the \"token counting\" a training-data
    pipeline budgets with, vs whitespace words)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(BPE_ISH_RE), 0)  # idx=0: whole match (no groups)


def bpe_ish_token_count(col: Column | str) -> Column:
    return F.size(bpe_ish_tokens(col))


def marker_hits(toks: Column, markers: list[str]) -> Column:
    """Number of tokens that are in ``markers`` (duplicates counted)."""
    lits = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(toks, lambda t: F.array_contains(lits, t)))


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document stats: token count, char length, average token
    length, digit ratio."""
    toks = tokens(text_col)
    n_tok = F.size(toks)
    n_char = F.length(F.col(text_col))
    n_digit = n_char - F.length(F.regexp_replace(F.col(text_col), r"[0-9]", ""))
    return (
        df.withColumn("n_tokens", n_tok)
        .withColumn("text_len", n_char)
        .withColumn("avg_token_len", F.round(n_char.cast("double") / n_tok, 2))
        .withColumn("digit_ratio", F.round(n_digit.cast("double") / n_char, 4))
    )


def with_quality_score(
    df: DataFrame,
    text_col: str = "text",
    stopwords: list[str] | None = None,
    min_tokens: int = 20,
    max_tokens: int = 10_000,
    min_stopword_ratio: float = 0.01,
) -> DataFrame:
    """Heuristic quality gate (Gopher/C4-style length + stopword-density
    rules): emits ``stopword_ratio`` and a boolean ``quality_ok``."""
    stop = stopwords or ["the", "a", "and", "of", "to"]
    toks = tokens(text_col)
    n_tok = F.size(toks)
    ratio = F.round(marker_hits(toks, stop).cast("double") / n_tok, 4)
    ok = (n_tok >= min_tokens) & (n_tok <= max_tokens) & (ratio >= min_stopword_ratio)
    return df.withColumn("stopword_ratio", ratio).withColumn("quality_ok", ok)


def with_lang_guess(
    df: DataFrame,
    text_col: str = "text",
    profiles: dict[str, list[str]] | None = None,
) -> DataFrame:
    """Marker-token language ID: score each profile, take the argmax
    (ties break on profile-name order). Emits ``lang_guess`` plus one
    ``score_<name>`` column per profile."""
    profiles = profiles or DEFAULT_LANG_PROFILES
    toks = tokens(text_col)
    out = df
    for name, markers in profiles.items():
        out = out.withColumn(f"score_{name}", marker_hits(toks, markers))
    guess = None
    best = None
    for name in profiles:
        score = F.col(f"score_{name}")
        if guess is None:
            guess, best = F.lit(name), score
        else:
            is_better = score > best
            guess = F.when(is_better, F.lit(name)).otherwise(guess)
            best = F.when(is_better, score).otherwise(best)
    return out.withColumn("lang_guess", guess)


def _index_range(last: Column) -> Column:
    """1..last as an array, EMPTY when last < 1 — Spark's sequence(1, 0)
    is the DESCENDING [1, 0] (step defaults to -1 when stop < start),
    which would feed element_at an invalid index 0; DuckDB's
    range(1, 1) is empty, so the guard is also what keeps the two
    engines' n-gram construction aligned on sub-n docs."""
    return F.when(last >= 1, F.sequence(F.lit(1), last)).otherwise(
        F.array().cast("array<int>")
    )


def ngrams(toks: Column, n: int, sep: str = " ") -> Column:
    """Word n-grams as strings; empty result for docs shorter than
    ``n`` tokens. Built as a zip of ``n`` shifted slices so that a
    lambda-captured ``toks`` EXPRESSION (e.g. an inline tokenizer) is
    evaluated once per row — the earlier element_at(toks, i+j) form
    re-evaluated the capture per element, turning an inline
    split(text) into O(L²) regex work (measured 3.6 s → 0.2 s on the
    sf0.01 3-gram explode). Matches DuckDB's
    list_transform(range(1, len-n+1), i -> t[i] || ... || t[i+n-1])."""
    cnt = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    shifted = [F.slice(toks, j + 1, cnt).alias(f"g{j}") for j in range(n)]
    zipped = F.arrays_zip(*shifted)
    return F.transform(
        zipped, lambda s: F.concat_ws(sep, *[s[f"g{j}"] for j in range(n)])
    )


def with_repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition signals, map-only native expressions:
    the fraction of word-2-grams that are repeats of an earlier one
    (`dup_2gram_frac = 1 − distinct/total`) and the count of
    immediately-repeated tokens (`n_stutters`, "the the"). High values
    mark boilerplate/spam for the quality gate — at 100 TB this runs
    at scan speed alongside the other per-doc stats."""
    toks = tokens(text_col)
    grams = ngrams(toks, 2)
    n_2g = F.size(grams)
    n_dist = F.size(F.array_distinct(grams))
    stutters = F.size(
        F.filter(
            _index_range(F.size(toks) - 1),
            lambda i: F.element_at(toks, i) == F.element_at(toks, i + 1),
        )
    )
    return (
        df.withColumn("n_2grams", n_2g.cast("bigint"))
        .withColumn(
            "dup_2gram_frac",
            F.when(n_2g > 0, F.round(F.lit(1.0) - n_dist.cast("double") / n_2g, 4)).otherwise(
                F.lit(0.0)
            ),
        )
        .withColumn("n_stutters", stutters.cast("bigint"))
    )


PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\b555-[0-9]{4}\b"


def scrub_pii(df: DataFrame, text_col: str = "text", out_col: str = "text_scrubbed") -> DataFrame:
    """Mask emails/phone-shaped substrings with typed placeholders and
    count what was masked — the pre-training PII pass. Patterns are
    deliberately lookahead-free so Java regex (Spark) and RE2 (DuckDB)
    agree byte-for-byte; the oracle differential hashes the scrubbed
    text to prove it."""
    c = F.col(text_col)
    n_emails = F.size(F.regexp_extract_all(c, F.lit(PII_EMAIL_RE), 0))
    n_phones = F.size(F.regexp_extract_all(c, F.lit(PII_PHONE_RE), 0))
    scrubbed = F.regexp_replace(
        F.regexp_replace(c, PII_EMAIL_RE, "<EMAIL>"), PII_PHONE_RE, "<PHONE>"
    )
    return (
        df.withColumn("n_emails", n_emails.cast("bigint"))
        .withColumn("n_phones", n_phones.cast("bigint"))
        .withColumn(out_col, scrubbed)
    )


def winnowing_fingerprints(
    df: DataFrame, text_col: str = "text", k: int = 8, w: int = 4
) -> DataFrame:
    """MOSS-style winnowing fingerprints (Schleimer et al. 2003): hash
    every character ``k``-gram of the normalized text, slide a window
    of ``w`` consecutive hashes, keep each window's minimum — the
    classic rolling-hash document fingerprint whose selected set is
    position-stable under insertions (any shared substring of length
    ≥ k+w−1 yields a shared fingerprint).

    Built as ONE native expression chain (no Python): k-grams via a
    substring transform, 28-bit md5-derived hashes (engine-portable —
    the selection depends only on hash VALUES, so the classic O(1)
    rolling update is a constant-factor optimization the oracle
    doesn't need), window minima via slice+array_min, then distinct.
    Emits ``fingerprints`` (sorted distinct array) per doc.

    r14-opt: the input is spread across cores first — ~L md5 calls
    per document make this the heaviest native map stage in the
    catalog, and a one-row-group source ran it on ONE task (measured
    13.0 s → ~1 s at sf0.1 on 32 cores; guide §2.5 input skew)."""
    df = repartition_for_cpu(df)
    expr = (
        "CASE WHEN length({norm}) >= {k} "
        "THEN transform(sequence(1, length({norm}) - {k} + 1), i -> "
        "CAST(conv(substring(md5(substring({norm}, i, {k})), 1, 7), 16, 10) AS BIGINT)) "
        "ELSE CAST(array() AS ARRAY<BIGINT>) END"
    ).format(norm=f"regexp_replace(lower(trim({text_col})), '\\\\s+', ' ')", k=k)
    hashed = df.withColumn("__kh__", F.expr(expr))
    mins = (
        "CASE WHEN size(__kh__) >= {w} "
        "THEN transform(sequence(1, size(__kh__) - {w} + 1), j -> "
        "array_min(slice(__kh__, j, {w}))) "
        "ELSE __kh__ END"
    ).format(w=w)
    return (
        hashed.withColumn("__wm__", F.expr(mins))
        .withColumn("fingerprints", F.array_sort(F.array_distinct(F.col("__wm__"))))
        .drop("__kh__", "__wm__")
    )


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Content fingerprints: full md5 of normalized text plus a 63-bit
    integer prefix (join/bucket-friendly)."""
    h = F.md5(norm_text(text_col))
    return df.withColumn("content_hash", h).withColumn(
        "fingerprint", F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint")
    )


def with_compression_ratio(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gzip-compressibility quality signal (the Gopher-family filter:
    machine-generated/repetitive text compresses far better than
    natural prose): adds ``compressed_len``, ``raw_len``, and
    ``compression_ratio`` (compressed/raw, rounded to 4).

    Compression runs in an Arrow-batched pandas UDF (zlib level 6,
    stdlib — deterministic for a fixed level and library build; the
    RATIO is a per-row map, so partitioning never affects values).
    This is a Python-stage operator by necessity — no SQL engine
    exposes deflate — so it carries pytest evidence, not a DuckDB
    oracle, and stays off the native-path audit like the multimodal
    codecs (same Arrow-only policy)."""
    from graphql_api_etl_spark.operators._arrow_udfs import gzip_len_udf as _clen

    raw_len = F.length(F.col(text_col)).cast("long")
    return (
        df.withColumn("compressed_len", _clen(F.col(text_col)))
        .withColumn("raw_len", raw_len)
        .withColumn(
            "compression_ratio",
            F.round(F.col("compressed_len").cast("double") / F.col("raw_len"), 4),
        )
    )


def bpe_merge_table(spark, words: DataFrame, n_merges: int) -> DataFrame:
    """Train ``n_merges`` BPE merge rules and return the merge table —
    see :func:`bpe_train_with_segmentation` for the algorithm; this is
    the table-only wrapper (static return type, ADVICE r7)."""
    table, _segmented = bpe_train_with_segmentation(spark, words, n_merges)
    return table


def bpe_train_with_segmentation(
    spark, words: DataFrame, n_merges: int
) -> tuple[DataFrame, DataFrame]:
    """Train ``n_merges`` BPE merge rules (Sennrich et al. 2016,
    arXiv:1508.07909) from a word-frequency frame ``words(word, freq)``
    and return ``(table, segmentation)``: the rules as ``(merge_rank,
    left_sym, right_sym, merged_sym, pair_count)`` plus the final
    ``(word, seq)`` frame the training loop produced anyway.

    The distributed formulation is the standard word-frequency
    compression: pair statistics are computed over DISTINCT words
    weighted by corpus frequency, so after the initial tokenize+count
    shuffle every round's cost is bounded by the VOCABULARY size, not
    the corpus size — at 100 TB the corpus contributes one
    shuffle-and-count pass and the loop then runs on a ~|V|-row frame.
    Per round:

    - adjacent-pair stats: a native ``transform`` over each symbol
      sequence emits (left, right) structs (all positions, overlaps
      included — get_stats semantics), exploded and summed by pair
      with map-side partial aggregation;
    - argmax: ``orderBy(count DESC, left, right).limit(1)`` — a
      TakeOrdered over the pair-stats frame; the single winning rule
      (ties broken lexicographically, so the result is engine-exact)
      is the loop's only driver-collected row;
    - merge application: a native ``aggregate`` fold over each
      sequence replaces left-to-right non-overlapping occurrences
      (greedy scan: a just-merged symbol never re-matches as the left
      half within the same round) — no Python in the loop;
    - ``localCheckpoint`` per round materializes the re-segmented
      frame, keeping the fold expressions from nesting across rounds
      (12 stacked HOF folds would blow the codegen-method budget) and
      bounding lineage exactly like the PageRank recurrence.

    Symbols are their spellings (strings); words start as character
    sequences with a ``</w>`` end-of-word marker.  All counts are
    exact BIGINTs, so the argmax and the emitted table are
    deterministic across engines/partitionings — the DuckDB oracle is
    an independent pure-Python replica of the same spec.

    The returned segmentation is the fully-merged ``(word, seq)``
    frame (each round folds the vocabulary in place), so callers that
    tokenize the SAME corpus they trained on get the applied
    vocabulary for free instead of re-running the folds (bpe_apply is
    the standalone path for NEW text)."""
    chars = F.expr("filter(split(word, ''), x -> x <> '')")
    cur = words.select(
        "word",
        F.col("freq").cast("bigint").alias("freq"),
        F.concat(chars, F.array(F.lit("</w>"))).alias("seq"),
    ).localCheckpoint(eager=True)
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        pairs = (
            cur.select(
                "freq",
                F.expr(
                    "transform(slice(seq, 1, size(seq) - 1), "
                    "(x, i) -> struct(x AS l, element_at(seq, i + 2) AS r))"
                ).alias("ps"),
            )
            .select("freq", F.explode("ps").alias("p"))
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("freq").cast("bigint").alias("cnt"))
        )
        best = pairs.orderBy(F.desc("cnt"), "l", "r").limit(1).collect()
        if not best:
            break  # every word fused to a single symbol
        l, r, cnt = best[0]["l"], best[0]["r"], best[0]["cnt"]
        merged = l + r
        assert "'" not in merged and "\\" not in merged, merged
        merges.append((rank, l, r, merged, cnt))
        cur = cur.select(
            "word", "freq", F.expr(_merge_fold_expr(l, r, merged)).alias("seq")
        ).localCheckpoint(eager=True)
    table = spark.createDataFrame(
        merges,
        "merge_rank bigint, left_sym string, right_sym string, "
        "merged_sym string, pair_count bigint",
    )
    return table, cur.select("word", "seq")


def _merge_fold_expr(l: str, r: str, merged: str) -> str:
    """Greedy left-to-right non-overlapping merge of the (l, r) pair
    over a ``seq`` column, as a native aggregate fold (a just-merged
    symbol never re-matches as the left half within the same round) —
    shared by training (bpe_merge_table) and application (bpe_apply)
    so both run the exact same replacement semantics."""
    return (
        "aggregate(seq, CAST(array() AS array<string>), (acc, x) -> "
        f"CASE WHEN size(acc) > 0 AND element_at(acc, -1) = '{l}' AND x = '{r}' "
        f"THEN concat(slice(acc, 1, size(acc) - 1), array('{merged}')) "
        "ELSE concat(acc, array(x)) END)"
    )


def bpe_apply(vocab: DataFrame, merges: list[tuple[str, str, str]]) -> DataFrame:
    """Apply an ordered merge table to a vocabulary frame
    ``vocab(word)``: segment each word to characters + ``</w>``, run
    each (left, right, merged) rule in rank order with the SAME greedy
    fold the trainer used, and return ``(word, n_sym)`` — the post-BPE
    symbol count per distinct word.  The merge table is driver-side by
    contract (a tokenizer is small; 12 rules here), the vocab frame is
    |V|-rows, and per-rule cost is one native fold pass over it —
    tokenizing a 100 TB corpus this way costs one word-count shuffle
    plus |V|-bounded work, then a broadcast join back to the corpus."""
    chars = F.expr("filter(split(word, ''), x -> x <> '')")
    cur = vocab.select(
        "word", F.concat(chars, F.array(F.lit("</w>"))).alias("seq")
    ).localCheckpoint(eager=True)
    for l, r, merged in merges:
        assert "'" not in (l + r) and "\\" not in (l + r), (l, r)
        cur = cur.select(
            "word", F.expr(_merge_fold_expr(l, r, merged)).alias("seq")
        ).localCheckpoint(eager=True)
    return cur.select("word", F.size("seq").cast("bigint").alias("n_sym"))
