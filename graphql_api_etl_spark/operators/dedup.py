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

from graphql_api_etl_spark.operators.text import (  # noqa: F401 — repartition_for_cpu re-exported for its existing D.* consumers
    norm_text,
    norm_tokens,
    repartition_for_cpu,
    tokens,
)

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


def _shingles_from_tokens(toks: Column, n: int = 2) -> Column:
    """Distinct word n-gram shingles from a token-array column.

    ``toks`` MUST be a materialized column reference, not an inline
    tokenizer expression: lambda-captured expressions are re-evaluated
    per array element (measured: inline tokens() turned this into
    O(L²) regex work — 15 ms/doc). The n=2 hot path is zip_with over
    two slices: O(L) with no per-element array copies.
    """
    L = F.size(toks)
    if n == 2:
        grams = F.zip_with(
            F.slice(toks, 1, L - 1),
            F.slice(toks, 2, L - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    else:
        head = F.slice(toks, 1, L - (n - 1))
        grams = F.transform(
            head,
            lambda x, i: F.concat_ws(
                " ", F.array(x, *[F.element_at(toks, i + 1 + j) for j in range(1, n)])
            ),
        )
    return F.array_distinct(F.when(L >= n, grams).otherwise(F.array(F.concat_ws(" ", toks))))


def shingles(text_col: Column | str, n: int = 2) -> Column:
    """Column-expression form (case-normalized; short docs collapse to
    one whole-text shingle). Fine for ad-hoc use; the operators below
    go through :func:`shingled` so the tokenizer runs once per row."""
    return _shingles_from_tokens(norm_tokens(text_col), n)


def shingled(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 2) -> DataFrame:
    """(id, sh) DataFrame with the tokenizer materialized in its own
    projection so downstream slice/zip references don't re-run it."""
    toked = repartition_for_cpu(df).select(
        F.col(id_col), norm_tokens(text_col).alias("__toks")
    )
    return toked.select(F.col(id_col), _shingles_from_tokens(F.col("__toks"), n).alias("sh"))


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
    """Per-doc MinHash signature columns ``m0..m{k-1}``, MAP-ONLY.

    The shingle set never leaves its row: one ``transform`` hashes
    every shingle to the portable 28-bit value (md5 computed once per
    shingle), then each permutation's minimum is an ``array_min`` over
    a cheap affine ``transform`` — zero explode, zero shuffle, zero
    aggregate. The r1–r13 form (explode(shingles) → hash column →
    ONE groupBy with k partial-aggregated mins) was already the
    textbook aggregate shape, but it materialized |shingles| rows and
    paid a full hash-exchange of the corpus' doc ids; min over a set
    is order-free, so the per-row array form computes the identical
    signatures (differential-pinned) with no exchange at any scale —
    measured 1.07 s → 0.21 s on the sf0.1 signatures stage
    (OPTIMIZATION_r14.md). Guide §2.4 (remove shuffles outright) +
    §2.3 (aggregate before you shuffle — here: before there is
    nothing left to shuffle).
    """
    return signatures_from_sets(shingled(df, text_col, id_col, n_gram), id_col)


def signatures_from_sets(sets: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Map-only signature body over a prebuilt (id, sh) frame — split
    out so :func:`minhash_lsh_dedup` can share ONE shingle pass between
    signatures and verification (r14-opt)."""
    params = minhash_params()

    def _perm(a: int, b: int):
        return lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(MINHASH_P)

    hashed = sets.select(
        F.col(id_col),
        F.transform(F.col("sh"), lambda s: shingle_hash(s)).alias("__hvs"),
    )
    return hashed.select(
        id_col,
        *[
            F.array_min(F.transform(F.col("__hvs"), _perm(a, b))).alias(f"m{i}")
            for i, (a, b) in enumerate(params)
        ],
    )


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
    max_shingle_df: int | None = None,
    sets: DataFrame | None = None,
) -> DataFrame:
    """(id_a, id_b, jaccard) for pairs with shingle-Jaccard ≥ threshold.

    ``sets``: optionally a prebuilt (id, sh) shingle frame (e.g. the
    one the caller already persisted for signature computation) — the
    verification join consumes it twice (both pair sides), so sharing
    it removes two full tokenize+shingle passes over the corpus
    (r14-opt; guide §1.2 "don't compute things twice").

    Without ``candidates``: inverted-index self-join on shingle (brute
    but indexed — the small-scale oracle). With ``candidates`` (e.g.
    from :func:`lsh_candidate_pairs`): verification join only — the
    scale path.

    ``max_shingle_df`` (VERDICT r4 ask #4, the standard web-corpus
    stop-shingle guard): shingles appearing in more than this many
    documents are dropped from the inverted index BEFORE the self-join
    — its cost is Σ|posting list|², so one boilerplate phrase shared
    by 1M pages otherwise contributes 10¹² pairs on its own. Hot
    shingles are only excluded from CANDIDATE GENERATION; surviving
    candidate pairs are re-scored on their FULL shingle sets
    (array_intersect verification), so reported Jaccard values are
    exact and a ≥-threshold pair is lost only if hot shingles were its
    SOLE overlap — impossible above threshold once the cap exceeds the
    corpus' duplicate-group size, property-tested in
    tests/test_operators.py.
    """
    if sets is None:
        sets = shingled(df, text_col, id_col, n_gram)
    if candidates is None and max_shingle_df is not None:
        inv = sets.select(F.col(id_col), F.explode("sh").alias("shingle"))
        # The HOT list is small by construction (few shingles exceed a
        # sane df cap) → broadcast anti-join keeps the index pass
        # shuffle-free on the posting side.
        hot = (
            inv.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") > max_shingle_df)
            .select("shingle")
        )
        capped = inv.join(F.broadcast(hot), "shingle", "left_anti")
        a = capped.select(F.col(id_col).alias("id_a"), "shingle")
        b = capped.select(F.col(id_col).alias("id_b"), "shingle")
        cand = (
            a.join(b, "shingle")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
        return jaccard_pairs(
            df, threshold, text_col=text_col, id_col=id_col, n_gram=n_gram, candidates=cand
        )
    if candidates is None:
        # Count-based exact Jaccard: |∩| falls out of the inverted-index
        # self-join as a groupBy count, and |∪| = |A|+|B|-|∩| because
        # shingle sets are distinct — no per-pair array materialization
        # (the array_intersect formulation is quadratic in doc length
        # per pair and dominates runtime once candidates ≈ all pairs).
        sizes = sets.select(F.col(id_col), F.size("sh").alias("sz"))
        inv = sets.select(F.col(id_col), F.explode("sh").alias("shingle"))
        a = inv.select(F.col(id_col).alias("id_a"), "shingle")
        b = inv.select(F.col(id_col).alias("id_b"), "shingle")
        common = (
            a.join(b, "shingle")
            .filter(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("n_common"))
        )
        za = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
        zb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
        jac = F.col("n_common").cast("double") / (F.col("sz_a") + F.col("sz_b") - F.col("n_common"))
        scored = common.join(za, "id_a").join(zb, "id_b").withColumn("jaccard", F.round(jac, 4))
    else:
        # Verification path: candidates are already few (that is LSH's
        # whole point), so ship each pair its two shingle sets and
        # score natively — never rebuild the full inverted self-join,
        # whose Σ|posting|² cost is exactly what banding avoided.
        # |∪| is derived from sizes (sets are distinct), so only the
        # intersection array is ever built, in its own projection so
        # it is computed once per pair.
        sa = sets.select(
            F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"), F.size("sh").alias("sz_a")
        )
        sb = sets.select(
            F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"), F.size("sh").alias("sz_b")
        )
        joined = (
            candidates.join(sa, "id_a")
            .join(sb, "id_b")
            .withColumn("n_common", F.size(F.array_intersect("sh_a", "sh_b")))
        )
        jac = F.col("n_common").cast("double") / (
            F.col("sz_a") + F.col("sz_b") - F.col("n_common")
        )
        scored = joined.withColumn("jaccard", F.round(jac, 4))
    return scored.filter(F.col("jaccard") >= threshold).select("id_a", "id_b", "jaccard")


def signature_agreement(
    candidates: DataFrame, signatures: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Candidates + ``sig_match`` = number of agreeing minhash
    components (an unbiased Jaccard estimator: E[sig_match/k] = J).
    16 integer equality checks per pair, fully codegen — the cheap
    middle filter between banding and exact verification."""
    sa = signatures.select(
        F.col(id_col).alias("id_a"), *[F.col(f"m{i}").alias(f"a{i}") for i in range(N_MINHASHES)]
    )
    sb = signatures.select(
        F.col(id_col).alias("id_b"), *[F.col(f"m{i}").alias(f"b{i}") for i in range(N_MINHASHES)]
    )
    match = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0) for i in range(N_MINHASHES)
    )
    return (
        candidates.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("sig_match", match)
        .select("id_a", "id_b", "sig_match")
    )


def minhash_lsh_dedup(
    df: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_gram: int = 2,
    persist: bool = True,
    prefilter_slack: float = 0.25,
) -> DataFrame:
    """Full MinHash→LSH→verify near-dup pipeline: banded candidates,
    then true-Jaccard verification (no false positives in the output;
    recall is governed by the band/row configuration).

    ``persist`` keeps the shingle-set and signature frames in
    MEMORY_AND_DISK for the pipeline's lifetime: signatures feed four
    plan branches (each side of the band self-join, each side of the
    agreement join) and the shingle sets feed three (the signature
    chain plus both sides of the verification join) — without pinning,
    Spark recomputes the whole upstream per branch, measured 3× the
    wall-clock. r14-opt: the corpus is tokenized and shingled exactly
    ONCE per pipeline — verification previously rebuilt ``shingled``
    from raw text on both pair sides (two extra full regex passes,
    guide §1.2); signatures are k×8 bytes per doc and shingle sets are
    corpus-sized (a real deployment lands both as tables between
    stages anyway).
    """
    sets = shingled(df, text_col, id_col, n_gram)
    if persist:
        from pyspark.storagelevel import StorageLevel

        sets = sets.persist(StorageLevel.MEMORY_AND_DISK)
    sigs = signatures_from_sets(sets, id_col)
    if persist:
        from pyspark.storagelevel import StorageLevel

        # Materialize eagerly: a lazily-persisted frame consumed by two
        # branches of ONE job is computed once per branch (the racing
        # tasks don't wait on each other's cache fill) — measured 2.7×
        # the wall-clock of eager fill on the same data. Counting sigs
        # fills the upstream sets cache in the same job.
        sigs = sigs.persist(StorageLevel.MEMORY_AND_DISK)
        sigs.count()
    cands = lsh_candidate_pairs(sigs, id_col)
    # Banding admits any pair sharing one band (P = 1-(1-J²)^8, ~18%
    # even at J≈0.15), so on self-similar corpora candidates vastly
    # outnumber true pairs. The signature-agreement prefilter drops
    # most of them with integer compares before the (relatively
    # expensive) exact array verification; the floor sits
    # ``prefilter_slack`` below the threshold so boundary pairs at
    # J≈threshold survive with ≥99% probability (Binomial(16, J) tail).
    est_floor = max(0.0, threshold - prefilter_slack)
    min_match = int(est_floor * N_MINHASHES)  # floor; pairs need > this-ish
    filtered = signature_agreement(cands, sigs, id_col).filter(
        F.col("sig_match") >= F.lit(min_match)
    ).select("id_a", "id_b")
    if persist:
        from pyspark.storagelevel import StorageLevel

        filtered = filtered.persist(StorageLevel.MEMORY_AND_DISK)
        filtered.count()
    return jaccard_pairs(
        df, threshold, text_col, id_col, n_gram, candidates=filtered, sets=sets
    )


# ---------------------------------------------------------------------------
# SimHash (64-bit, md5-derived, engine-portable)
# ---------------------------------------------------------------------------

SIMHASH_BITS = 60  # token hash is 60-bit (see _token_hash64)


def _token_hash64(col: Column) -> Column:
    """60-bit token hash: 15 hex chars of md5 → bigint. Capped below
    2^63 so overflow-checked engines (DuckDB) compute it identically;
    bits 60..63 of the simhash are then always 0 on every engine."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def simhash_signatures(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash per document over its distinct tokens.

    One explode + one groupBy with 64 bit-vote sums (partial-aggregated
    map-side), then the signature is reassembled from the vote signs.
    All arithmetic is BIGINT-exact and portable.
    """
    toked = repartition_for_cpu(df).select(
        F.col(id_col), F.explode(F.array_distinct(norm_tokens(text_col))).alias("tok")
    )
    # Materialize the hash before the aggregate: referenced by 60 vote
    # expressions, it must be computed once per token, not 60 times.
    hashed = toked.select(id_col, _token_hash64(F.col("tok")).alias("hv"))
    h = F.col("hv")
    votes = [
        F.sum(F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)).alias(f"v{j}")
        for j in range(SIMHASH_BITS)
    ]
    per_doc = hashed.groupBy(id_col).agg(*votes)
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
