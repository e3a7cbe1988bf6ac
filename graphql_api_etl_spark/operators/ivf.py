"""IVF (inverted-file) approximate nearest neighbour: k-means coarse
quantizer + nprobe bucket search — the standard embedding-scale ANN
layout (FAISS IVF-Flat's shape, re-expressed as DataFrame ops).

Engine-native extension beyond the reference (no vector ops there).

Scale design:

- Lloyd's iterations keep DATA distributed: assignment is an
  Arrow-vectorized pandas UDF doing one k×dim matmul per batch
  (dense linear algebra is exactly what Arrow batching is for — the
  codegen'd scalar-expression form of 16 × 64-term distances
  overwhelms janino's method limits, and MLlib's own KMeans does the
  same BLAS-style batch math JVM-side); the update step is one native
  (bucket, dim) aggregation. Only the k×dim centroid matrix is ever
  collected — O(k·dim), data-size independent.
- This operator family is **rows-only** in the catalog (ANN results
  are engine/tie-order specific, like the approx aggregates), so the
  "no Python on oracle paths" invariant is untouched; recall against
  the exact brute-force oracle is asserted in pytest instead.
- Search probes the ``nprobe`` nearest buckets per query: an equi-join
  on the bucket id, so scored pairs drop from |Q|·|C| to
  nprobe·|Q|·|C|/k on balanced buckets, and the exact within-bucket
  cosine + WindowGroupLimit top-k reuse similarity.topk_bucketed.

Initial centroids are the k vectors with the smallest md5(vec_id) —
deterministic, data-order independent. Empty clusters keep their old
centroid. Iterations are fixed (no convergence test) so runs are
reproducible.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _centroid_matrix(centroids: list[list[float]]):
    import numpy as np

    return np.asarray(centroids, dtype="float64")


def _assign_udf(centroids: list[list[float]], nprobe: int = 1):
    """pandas UDF: vector → its ``nprobe`` nearest centroid ids
    (ascending distance on the unit sphere). One matmul per Arrow
    batch; ties broken by centroid id (argsort is stable)."""
    import numpy as np

    C = _centroid_matrix(centroids)
    cn = (C * C).sum(axis=1)  # ||c_j||^2

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def assign(vecs: pd.Series) -> pd.Series:
        V = np.vstack(vecs.to_numpy()).astype("float64")
        norms = np.linalg.norm(V, axis=1)
        norms[norms == 0.0] = 1.0
        Vh = V / norms[:, None]
        d = cn[None, :] - 2.0 * (Vh @ C.T)  # ||v̂-c||² − 1 (argmin-equivalent)
        idx = np.argsort(d, axis=1, kind="stable")[:, :nprobe]
        return pd.Series(list(idx.astype("int32")))

    return assign


def _lloyd(V, k: int, iters: int) -> list[list[float]]:
    """Lloyd's iterations on a pre-collected sample matrix — the shared
    deterministic core of :func:`train_kmeans` (Spark sample) and
    :func:`train_kmeans_local` (parquet sample, used by the DuckDB
    oracle builder). Seeds are the first ``k`` rows; both callers
    present rows in md5(id) order, so the two paths are bit-identical."""
    import numpy as np

    norms = np.linalg.norm(V, axis=1)
    norms[norms == 0.0] = 1.0
    Vh = V / norms[:, None]
    # seeds: first k in md5 order (same determinism as the sample)
    C = Vh[:k].copy()
    cn = (C * C).sum(axis=1)
    for _ in range(iters):
        d = cn[None, :] - 2.0 * (Vh @ C.T)
        b = np.argmin(d, axis=1)
        for j in range(k):
            members = Vh[b == j]
            if len(members):
                C[j] = members.mean(axis=0)
        cn = (C * C).sum(axis=1)
    return [list(map(float, c)) for c in C]


def train_kmeans(
    df: DataFrame,
    k: int = 16,
    iters: int = 3,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_size: int = 4096,
) -> list[list[float]]:
    """Lloyd's on a BOUNDED deterministic sample, driver-side numpy.

    Coarse-quantizer training does not need the full corpus — FAISS
    trains IVF centroids on a sample by design, and a 100 TB corpus
    would be sampled exactly like this. The sample is the
    ``sample_size`` vectors with the smallest md5(id) (deterministic,
    order/partitioning independent, pushdown-friendly), collected once
    (≤ sample_size·dim doubles — bounded, data-size independent); the
    iterations are then pure numpy (ms), replacing one distributed
    assignment+aggregation round-trip PER ITERATION with zero.
    Returns the k×dim centroid matrix of means over unit-normalized
    vectors (centroids themselves are NOT re-normalized; assignment
    uses the full ||c||^2 - 2 v·c argmin, so no renorm is needed)."""
    import numpy as np

    rows = (
        df.select(
            F.md5(F.col(id_col).cast("string")).alias("__h__"),
            F.expr(f"transform({vec_col}, x -> CAST(x AS DOUBLE))").alias("__vd__"),
        )
        .orderBy("__h__")
        .limit(sample_size)
        .collect()
    )
    V = np.asarray([r["__vd__"] for r in rows], dtype="float64")
    return _lloyd(V, k, iters)


def train_kmeans_local(
    parquet_path: str,
    k: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_size: int = 4096,
) -> list[list[float]]:
    """Spark-free twin of :func:`train_kmeans` for the oracle builder:
    reads the parquet directly (pyarrow), takes the same md5-ordered
    sample, and runs the same :func:`_lloyd` float64 ops — producing
    bit-identical centroids to what the Spark query trains on the same
    table (float32→float64 widening is exact on both paths)."""
    import hashlib

    import numpy as np
    import pyarrow.parquet as pq

    tbl = pq.read_table(parquet_path, columns=[id_col, vec_col])
    ids = tbl.column(id_col).to_pylist()
    vecs = tbl.column(vec_col).to_pylist()
    order = sorted(
        range(len(ids)), key=lambda i: hashlib.md5(str(ids[i]).encode()).hexdigest()
    )[:sample_size]
    V = np.asarray([vecs[i] for i in order], dtype="float64")
    return _lloyd(V, k, iters)


def with_ivf_bucket(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    out_col: str = "ivf_bucket",
) -> DataFrame:
    """Nearest-centroid assignment (one Arrow matmul per batch)."""
    assign = _assign_udf(centroids, nprobe=1)
    return df.withColumn(out_col, assign(F.col(vec_col))[0])


def probe_buckets(
    df: DataFrame,
    centroids: list[list[float]],
    nprobe: int = 2,
    vec_col: str = "embedding",
    out_col: str = "ivf_bucket",
) -> DataFrame:
    """Each query row exploded to its ``nprobe`` nearest buckets."""
    assign = _assign_udf(centroids, nprobe=nprobe)
    return df.withColumn("__probes__", assign(F.col(vec_col))).select(
        *df.columns, F.explode("__probes__").alias(out_col)
    )


def topk_ivf(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: list[list[float]],
    k: int = 5,
    nprobe: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """IVF ANN top-k: probe the nprobe nearest buckets per query, exact
    cosine within them (native codegen), WindowGroupLimit partial
    top-k — reuses similarity.topk_bucketed for the search itself."""
    from graphql_api_etl_spark.operators.similarity import topk_bucketed

    c_assigned = with_ivf_bucket(corpus, centroids, vec_col=vec_col)
    q_probed = probe_buckets(queries, centroids, nprobe=nprobe, vec_col=vec_col)
    return topk_bucketed(
        q_probed,
        c_assigned,
        bucket_col="ivf_bucket",
        k=k,
        id_col=id_col,
        vec_col=vec_col,
        exclude_self=exclude_self,
        dim=dim,
    )
