"""Similarity search over embedding columns (``array<float>``).

Three tiers, all returning (query_id, neighbor_id, sim, rank):

1. :func:`topk_bruteforce` — exact cosine top-k via a broadcast
   query-side cross join. The 100 TB story: the candidate corpus stays
   partitioned and is streamed once; only the (small) query set is
   broadcast, so cost is |Q|·|C| FLOPs with zero shuffle of the corpus.
   All arithmetic is a native ``aggregate(zip_with(...))`` fold —
   JVM-side, no Python.
2. :func:`topk_bucketed` — ANN via coarse buckets (IVF-style): only
   candidates in the query's bucket are scored. Any bucketing column
   works (a cluster id, an LSH key from :func:`with_hyperplane_bucket`).
3. :func:`with_hyperplane_bucket` — sign-random-hyperplane LSH key,
   md5-derived so it is deterministic and engine-portable.

Engine-native extension beyond the reference (no vector ops there);
cosine in double precision for cross-engine reproducibility.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product — deterministic summation order,
    so results are bit-identical across engines that fold in order."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def topk_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact cosine top-k: broadcast(queries) × corpus, windowed rank.

    Norms are precomputed per side before the join (each vector's norm
    is computed once, not once per pair). Rank ties break on
    neighbor_id for determinism.
    """
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
        ).withColumn("qn", norm(F.col("qv")))
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("cv")
    ).withColumn("cn", norm(F.col("cv")))
    pairs = q.crossJoin(c)
    if exclude_self:
        pairs = pairs.filter(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.withColumn("cos", dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")))
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos", 6).alias("sim"), "rank")
    )


def topk_bucketed(
    queries: DataFrame,
    corpus: DataFrame,
    bucket_col: str,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """ANN top-k within coarse buckets: the scale path. The cross join
    becomes an equi-join on the bucket key, so scored pairs drop from
    |Q|·|C| to Σ_b |Q_b|·|C_b|. Recall depends on bucket quality
    (IVF centroids, LSH keys, or any partitioning column)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(bucket_col).alias("bucket"), as_double(F.col(vec_col)).alias("qv")
    ).withColumn("qn", norm(F.col("qv")))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(bucket_col).alias("bucket"), as_double(F.col(vec_col)).alias("cv")
    ).withColumn("cn", norm(F.col("cv")))
    pairs = q.join(c, "bucket")
    if exclude_self:
        pairs = pairs.filter(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.withColumn("cos", dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")))
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos", 6).alias("sim"), "rank")
    )


# Deterministic pseudo-random hyperplanes: component (p, d) is derived
# from md5(p:d), mapped to ±1. Engine-portable (md5 is universal).
def _hyperplane(plane_idx: int, dim: int) -> list[int]:
    import hashlib

    comps = []
    for d in range(dim):
        h = hashlib.md5(f"{plane_idx}:{d}".encode()).hexdigest()
        comps.append(1 if int(h[:2], 16) % 2 == 0 else -1)
    return comps


def with_hyperplane_bucket(
    df: DataFrame, n_planes: int = 8, dim: int = 64, vec_col: str = "embedding", out_col: str = "lsh_bucket"
) -> DataFrame:
    """Sign-LSH bucket key: n_planes sign bits of ±1-hyperplane dots,
    packed into an integer. Cosine-similar vectors collide with
    probability (1 - θ/π)^n_planes."""
    v = as_double(F.col(vec_col))
    bucket = F.lit(0).cast("bigint")
    for p in range(n_planes):
        plane = _hyperplane(p, dim)
        # ±1 hyperplane dot: sum of signed components — still a native fold.
        signed = F.zip_with(
            v,
            F.array(*[F.lit(float(c)) for c in plane]),
            lambda x, s: x * s,
        )
        d = F.aggregate(signed, F.lit(0.0), lambda acc, x: acc + x)
        bucket = bucket + F.when(d >= 0, F.shiftleft(F.lit(1).cast("bigint"), p)).otherwise(F.lit(0).cast("bigint"))
    return df.withColumn(out_col, bucket)
