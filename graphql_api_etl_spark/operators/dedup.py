"""Deduplication operators for training-data pipelines: exact hash
dedup, MinHash+LSH near-dup, n-gram Jaccard, SimHash, and
embedding-cosine near-dup.

Design for 100 TB:

- **Exact dedup** is a hash-groupBy — one shuffle on the content hash,
  map-side partial aggregation; the keeper rule (min id) is an
  aggregate, never a sort.
- **MinHash+LSH** is the scale path for near-dup: signature computation
  is a map-only explode+groupBy (shuffle keyed on doc, same size as the
  corpus), banding turns the O(n²) pair problem into an equi-join on
  (band_idx, band_key) — only colliding candidates are ever
  materialized, and the final Jaccard verification touches candidate
  pairs only.
- **N-gram Jaccard** (brute) is the verification oracle, not the scale
  path; it goes through an inverted shingle index (explode + self-join
  on shingle) so cost is Σ|posting list|² per shingle, not n².
- All hashing is md5-derived so Spark and any ANSI engine (the DuckDB
  oracle) compute bit-identical signatures — no engine-private hash
  functions in results.

Engine-native extensions beyond the reference (whose only dedup is
``drop_duplicates``, A2/A4 at ETL:781/283–308 — covered by
:func:`exact_dedup` and aggregate.py's hierarchy dedup).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from graphql_api_etl_spark.operators.text import norm_text, tokens

# MinHash parameters: h is a 28-bit md5 prefix, so a*h + b stays far
# below 2^63 for a < 2^31 (no overflow in any BIGINT engine).
MINHASH_P = 4_294_967_311  # prime > 2^32
N_MINHASHES = 16
LSH_BANDS = 8  # 8 bands × 2 rows: ~0.35 Jaccard collision threshold


def minhash_params(n: int = N_MINHASHES) -> list[tuple[int, int]]:
    """Deterministic (a, b) coefficient pairs, a < 2^31, a != 0."""
    out = []
    for i in range(n):
        a = (2_654_435_761 * (i + 1)) % (2**31 - 1) or 1
        b = (40_503 * (i + 7) + 1) % MINHASH_P
        out.append((a, b))
    return out


def shingles(text_col: Column | str, n: int = 2) -> Column:
    """Distinct word n-gram shingles; degenerate short docs collapse to
    one whole-text shingle so every doc has ≥1."""
    toks = tokens(text_col)
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    return F.array_distinct(
        F.when(F.size(toks) >= n, grams).otherwise(F.array(F.concat_ws(" ", toks)))
    )


def shingle_hash(col: Column) -> Column:
    """28-bit engine-portable shingle hash: first 7 hex chars of md5."""
    return F.conv(F.substring(F.md5(col), 1, 7), 16, 10).cast("bigint")


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups over normalized content: one row per
    distinct content hash with the group size and the keeper (min id)."""
    return (
        df.select(F.md5(norm_text(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min(id_col).alias("keeper_id"),
        )
    )


def minhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n_gram: int = 2
) -> DataFrame:
    """Per-doc MinHash signature columns ``m0..m{k-1}``.

    explode(shingles) → portable 28-bit hash → k permutation-min
    aggregates in ONE groupBy pass (partial aggregation makes the
    shuffle carry k mins per doc, not the shingle stream).
    """
    params = minhash_params()
    sh = df.select(F.col(id_col), F.explode(shingles(text_col, n_gram)).alias("shingle"))
    h = shingle_hash(F.col("shingle"))
    aggs = [
        F.min((F.lit(a) * h + F.lit(b)) % F.lit(MINHASH_P)).alias(f"m{i}")
        for i, (a, b) in enumerate(params)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(signatures: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Banded-LSH candidate pairs (id_a < id_b) from minhash signatures.

    Bands are stacked with one explode (k/bands rows per doc) and
    matched with a single self-equi-join on (band_idx, band_key) — the
    join that replaces the O(n²) similarity matrix at scale.
    """
    rows = N_MINHASHES // LSH_BANDS
    bands = F.array(
        *[
            F.struct(
                F.lit(j).alias("band_idx"),
                F.concat_ws("-", *[F.col(f"m{j * rows + r}") for r in range(rows)]).alias("band_key"),
            )
            for j in range(LSH_BANDS)
        ]
    )
    stacked = signatures.select(F.col(id_col), F.explode(bands).alias("b")).select(
        F.col(id_col), F.col("b.band_idx").alias("band_idx"), F.col("b.band_key").alias("band_key")
    )
    a = stacked.select(F.col(id_col).alias("id_a"), "band_idx", "band_key")
    b = stacked.select(F.col(id_col).alias("id_b"), "band_idx", "band_key")
    return (
        a.join(b, ["band_idx", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_gram: int = 2,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """(id_a, id_b, jaccard) for pairs with shingle-Jaccard ≥ threshold.

    Without ``candidates``: inverted-index self-join on shingle (brute
    but indexed — the small-scale oracle). With ``candidates`` (e.g.
    from :func:`lsh_candidate_pairs`): verification join only — the
    scale path.
    """
    sets = df.select(F.col(id_col), shingles(text_col, n_gram).alias("sh"))
    if candidates is None:
        inv = sets.select(F.col(id_col), F.explode("sh").alias("shingle"))
        a = inv.select(F.col(id_col).alias("id_a"), "shingle")
        b = inv.select(F.col(id_col).alias("id_b"), "shingle")
        candidates = (
            a.join(b, "shingle").filter(F.col("id_a") < F.col("id_b")).select("id_a", "id_b").distinct()
        )
    sa = sets.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    sb = sets.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    joined = candidates.join(sa, "id_a").join(sb, "id_b")
    jac = F.size(F.array_intersect("sh_a", "sh_b")).cast("double") / F.size(F.array_union("sh_a", "sh_b"))
    return (
        joined.withColumn("jaccard", F.round(jac, 4))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_lsh_dedup(
    df: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_gram: int = 2,
) -> DataFrame:
    """Full MinHash→LSH→verify near-dup pipeline: banded candidates,
    then true-Jaccard verification (no false positives in the output;
    recall is governed by the band/row configuration)."""
    sigs = minhash_signatures(df, text_col, id_col, n_gram)
    cands = lsh_candidate_pairs(sigs, id_col)
    return jaccard_pairs(df, threshold, text_col, id_col, n_gram, candidates=cands)


# ---------------------------------------------------------------------------
# SimHash (64-bit, md5-derived, engine-portable)
# ---------------------------------------------------------------------------

SIMHASH_BITS = 64


def _token_hash64(col: Column) -> Column:
    """64-bit token hash from the md5 hex prefix: two 32-bit halves."""
    hi = F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")
    lo = F.conv(F.substring(F.md5(col), 9, 8), 16, 10).cast("bigint")
    return F.shiftleft(hi, 32) + lo


def simhash_signatures(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash per document over its distinct tokens.

    One explode + one groupBy with 64 bit-vote sums (partial-aggregated
    map-side), then the signature is reassembled from the vote signs.
    All arithmetic is BIGINT-exact and portable.
    """
    toked = df.select(F.col(id_col), F.explode(F.array_distinct(tokens(text_col))).alias("tok"))
    h = _token_hash64(F.col("tok"))
    votes = [
        F.sum(F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)).alias(f"v{j}")
        for j in range(SIMHASH_BITS)
    ]
    per_doc = toked.groupBy(id_col).agg(*votes)
    sig = None
    for j in range(SIMHASH_BITS):
        term = F.when(F.col(f"v{j}") > 0, F.shiftleft(F.lit(1).cast("bigint"), j)).otherwise(F.lit(0).cast("bigint"))
        sig = term if sig is None else sig + term
    return per_doc.select(F.col(id_col), sig.alias("simhash"))


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit BIGINT signatures via
    bit_count(xor)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_pairs(
    df: DataFrame, max_distance: int = 8, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, candidate-limited by
    16-bit band collisions (a signature pair within distance d ≤ 3
    always shares ≥1 of 4 bands; larger d trades recall for cost)."""
    sigs = simhash_signatures(df, text_col, id_col)
    bands = F.array(
        *[
            F.struct(
                F.lit(j).alias("band_idx"),
                F.shiftright(F.col("simhash"), j * 16).bitwiseAND(F.lit(0xFFFF)).alias("band_key"),
            )
            for j in range(4)
        ]
    )
    stacked = sigs.select(F.col(id_col), F.col("simhash"), F.explode(bands).alias("b")).select(
        F.col(id_col), "simhash", F.col("b.band_idx").alias("band_idx"), F.col("b.band_key").alias("band_key")
    )
    a = stacked.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("sig_a"), "band_idx", "band_key")
    b = stacked.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("sig_b"), "band_idx", "band_key")
    pairs = (
        a.join(b, ["band_idx", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .distinct()
    )
    return (
        pairs.withColumn("hamming", hamming64(F.col("sig_a"), F.col("sig_b")))
        .filter(F.col("hamming") <= max_distance)
        .select("id_a", "id_b", "hamming")
    )
