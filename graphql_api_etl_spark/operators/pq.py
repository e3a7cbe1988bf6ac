"""Product quantization (PQ) ANN: per-subspace k-means codebooks +
asymmetric-distance (ADC) top-k — the memory-scale companion to the
IVF operator (operators/ivf.py). Engine-native extension beyond the
reference (no vector ops there).

Why PQ at 100 TB: IVF prunes WHICH vectors are scored; PQ shrinks WHAT
is scored. A 64-dim float32 vector is 256 bytes; its PQ code here is
8 × 4-bit centroid ids = one 32-bit word — an 64× compression that
turns a corpus-wide ANN scoring pass from a vector-data scan into a
code scan, with the real vectors left in cold storage. The serving
shape is the FAISS ADC layout re-expressed on DataFrames:

- **Train** (driver, bounded): unit-normalize a deterministic
  md5-ordered sample (same sampling contract as ivf.train_kmeans —
  order/partitioning independent), slice into ``m`` subspaces, run
  fixed-iteration Lloyd's per subspace. Only m·k·(dim/m) floats are
  ever collected — data-size independent.
- **Encode** (distributed, Arrow): one batch×k distance matmul per
  subspace per Arrow batch, stable argmin, codes packed into one
  BIGINT (4 bits per subspace). Map-only; at scale this is the pass
  that writes the code column next to the parquet.
- **Search** (distributed, Arrow): the query set is small by contract
  (an ANN serving batch, like similarity.topk_matmul) — per query a
  k×m lookup table of subspace dot products is built ONCE driver-side,
  then each corpus batch is scored by m table gathers per row (no
  vector math at all), partial top-k per batch, exact final window.
  Rows reaching the shuffle are ≤ batches·k per query.

Determinism/oracle discipline (same rules as ivf/similarity): centroid
squared-norms and LUT entries are accumulated with SEQUENTIAL
left-associative float64 sums (matching DuckDB's ``list_dot_product``
loop, not numpy's pairwise order); scores are fixed-point
``sim_micro = floor(adc·1e6)`` ordered by (sim_micro DESC,
neighbor_id) — a total order both engines compute identically;
assignment argmin ties break on centroid id in both engines, and the
cross-engine assignment margin is asserted in pytest.
"""

from __future__ import annotations

import hashlib

import pandas as pd

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from graphql_api_etl_spark.operators.similarity import collect_query_matrix


def _seq_dot(a, b) -> float:
    """Left-associative sequential float64 dot — bit-identical to
    DuckDB's list_dot_product loop."""
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


def _lloyd_subspace(Vs, k: int, iters: int):
    """Fixed-iteration Lloyd's on RAW subvectors (callers pre-normalize
    the FULL vector; subvectors must not be re-normalized). Seeds are
    the first k rows; empty clusters keep their previous centroid."""
    import numpy as np

    C = Vs[:k].copy()
    for _ in range(iters):
        cn = (C * C).sum(axis=1)
        d = cn[None, :] - 2.0 * (Vs @ C.T)
        b = np.argmin(d, axis=1)
        for j in range(k):
            members = Vs[b == j]
            if len(members):
                C[j] = members.mean(axis=0)
    return C


def _train_from_matrix(V, m: int, k: int, iters: int):
    import numpy as np

    norms = np.linalg.norm(V, axis=1)
    norms[norms == 0.0] = 1.0
    Vh = V / norms[:, None]
    dsub = V.shape[1] // m
    return [
        [
            [float(x) for x in c]
            for c in _lloyd_subspace(Vh[:, j * dsub : (j + 1) * dsub], k, iters)
        ]
        for j in range(m)
    ]


def _md5_order(ids: list) -> list[int]:
    return sorted(range(len(ids)), key=lambda i: hashlib.md5(str(ids[i]).encode()).hexdigest())


def train_pq(
    df: DataFrame,
    m: int = 8,
    k: int = 16,
    iters: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_size: int = 4096,
) -> list[list[list[float]]]:
    """Codebooks ``[m][k][dim/m]`` from a bounded deterministic sample
    (the ``sample_size`` vectors with smallest md5(id); collected once,
    O(sample·dim) — data-size independent, like ivf.train_kmeans)."""
    import numpy as np

    rows = (
        df.select(F.md5(F.col(id_col).cast("string")).alias("__h__"), F.col(vec_col))
        .orderBy("__h__")
        .limit(sample_size)
        .collect()
    )
    V = np.asarray([list(r[1]) for r in rows], dtype="float64")
    return _train_from_matrix(V, m, k, iters)


def train_pq_local(
    parquet_path: str,
    m: int = 8,
    k: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_size: int = 4096,
) -> list[list[list[float]]]:
    """Spark-free twin of :func:`train_pq` for the DuckDB oracle
    builder — same md5-ordered sample, same float64 ops, bit-identical
    codebooks (float32→float64 widening is exact on both paths)."""
    import numpy as np
    import pyarrow.parquet as pq

    tbl = pq.read_table(parquet_path, columns=[id_col, vec_col])
    ids = tbl.column(id_col).to_pylist()
    vecs = tbl.column(vec_col).to_pylist()
    order = _md5_order(ids)[:sample_size]
    V = np.asarray([vecs[i] for i in order], dtype="float64")
    return _train_from_matrix(V, m, k, iters)


def codebook_norms(codebooks) -> list[list[float]]:
    """Per-centroid squared norms via the SEQUENTIAL sum — the shared
    constant both the encode UDF and the SQL oracle embed, so the
    assignment distance ``cn² − 2·v̂ₘ·c`` is built from identical
    literals in both engines."""
    return [[_seq_dot(c, c) for c in book] for book in codebooks]


def encode_pq(
    df: DataFrame,
    codebooks,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    code_col: str = "pq_code",
) -> DataFrame:
    """(id, pq_code): per-subspace argmin centroid ids packed 4 bits
    each into one BIGINT. Arrow map-only pass, one k×batch matmul per
    subspace per batch; argmin ties break on the smaller centroid id
    (np.argmin first-hit == the oracle's ORDER BY d, cid)."""
    import numpy as np

    from graphql_api_etl_spark.operators.similarity import stack_f64

    m = len(codebooks)
    k = len(codebooks[0])
    dsub = dim // m
    bits = max(4, (k - 1).bit_length())
    C = np.asarray(codebooks, dtype=np.float64)  # m × k × dsub
    cn2 = np.asarray(codebook_norms(codebooks), dtype=np.float64)  # m × k

    def encode(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            V = stack_f64(pdf[vec_col])
            norms = np.linalg.norm(V, axis=1)
            norms[norms == 0.0] = 1.0
            Vh = V / norms[:, None]
            code = np.zeros(len(ids), dtype=np.int64)
            for j in range(m):
                Vs = Vh[:, j * dsub : (j + 1) * dsub]
                d = cn2[j][None, :] - 2.0 * (Vs @ C[j].T)
                code |= np.argmin(d, axis=1).astype(np.int64) << (j * bits)
            yield pd.DataFrame(
                {id_col: ids, code_col: pd.Series(code, dtype="int64")}
            )

    return df.select(id_col, vec_col).mapInPandas(encode, f"{id_col} long, {code_col} long")


def topk_pq(
    queries: DataFrame,
    corpus_codes: DataFrame,
    codebooks,
    k: int = 5,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    code_col: str = "pq_code",
    exclude_self: bool = True,
    micro: int = 1_000_000,
) -> DataFrame:
    """ADC top-k over PQ codes: LUT[q][subspace][centroid] built once
    driver-side with sequential dots, then each corpus batch is scored
    by m gathers accumulated in subspace order (left-assoc, matching
    the oracle's m-term SQL sum), fixed-point floor, per-batch partial
    top-k, exact final window — similarity.topk_matmul's exact
    mechanics with table lookups replacing the matmul.

    Output: (query_id, neighbor_id, sim_micro, rank)."""
    import numpy as np

    m = len(codebooks)
    kc = len(codebooks[0])
    dsub = dim // m
    bits = max(4, (kc - 1).bit_length())
    mask = (1 << bits) - 1

    qrows = collect_query_matrix(queries, id_col, vec_col)
    qids = [int(r[0]) for r in qrows]
    qmat = np.asarray([list(r[1]) for r in qrows], dtype=np.float64)
    qn = np.linalg.norm(qmat, axis=1)
    qn[qn == 0.0] = 1.0
    qmat = qmat / qn[:, None]
    nq = len(qids)
    # LUT[j]: kc × nq of sequential subspace dots — identical floats to
    # the oracle's list_dot_product(list_slice(qh,…), cv) terms
    lut = [
        np.asarray(
            [
                [_seq_dot(qmat[qi, j * dsub : (j + 1) * dsub], codebooks[j][c]) for qi in range(nq)]
                for c in range(kc)
            ],
            dtype=np.float64,
        )
        for j in range(m)
    ]
    qid_to_idx = {qid: i for i, qid in enumerate(qids)}
    sentinel = np.iinfo(np.int64).min

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            cids = pdf[id_col].to_numpy(dtype=np.int64)
            codes = pdf[code_col].to_numpy(dtype=np.int64)
            acc = np.zeros((len(cids), nq), dtype=np.float64)
            for j in range(m):
                cj = (codes >> (j * bits)) & mask
                acc += lut[j][cj]  # sequential j-order accumulation
            simq = np.floor(acc * micro).astype(np.int64)
            if exclude_self:
                for pos, cid in enumerate(cids):
                    qi = qid_to_idx.get(int(cid))
                    if qi is not None:
                        simq[pos, qi] = sentinel
            out_q: list[int] = []
            out_c: list[int] = []
            out_s: list[int] = []
            for qi in range(nq):
                col = simq[:, qi]
                valid = np.flatnonzero(col != sentinel)
                idx = valid[np.lexsort((cids[valid], -col[valid]))[:k]]
                out_q.extend([qids[qi]] * len(idx))
                out_c.extend(int(c) for c in cids[idx])
                out_s.extend(int(s) for s in col[idx])
            yield pd.DataFrame(
                {
                    "query_id": pd.Series(out_q, dtype="int64"),
                    "neighbor_id": pd.Series(out_c, dtype="int64"),
                    "sim_micro": pd.Series(out_s, dtype="int64"),
                }
            )

    scored = corpus_codes.select(id_col, code_col).mapInPandas(
        score, "query_id long, neighbor_id long, sim_micro long"
    )
    w = W.partitionBy("query_id").orderBy(F.col("sim_micro").desc(), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim_micro", "rank")
    )


def topk_ivfpq(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: list[list[float]],
    codebooks,
    k: int = 5,
    nprobe: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
    micro: int = 1_000_000,
) -> DataFrame:
    """IVF-PQ: the two prunings composed the way a 100 TB ANN index
    actually runs them — the IVF coarse quantizer prunes WHO is scored
    (nprobe buckets per query instead of the whole corpus) and PQ
    shrinks WHAT is scored (4-bit codes instead of vectors).

    The search itself is PURE CATALYST — zero Python past the map-only
    assign/encode passes: the per-query ADC lookup tables (|Q|·k rows
    per subspace, serving-batch sized) become 8 broadcast-joined
    literal frames keyed on (query_id, subspace code), and the score
    is one native left-associative 8-term sum, fixed-point floored
    before the windowed top-k. Candidates = probe×bucket equi-join, so
    scored pairs are nprobe·|Q|·|C|/k_coarse on balanced buckets, each
    costing 8 hash lookups and 8 adds — no vector math anywhere in the
    join. LUT terms are sequential float64 dots (engine-exact vs the
    oracle's list_dot_product).

    Output: (query_id, neighbor_id, sim_micro, rank)."""
    import numpy as np

    from graphql_api_etl_spark.operators.ivf import probe_buckets, with_ivf_bucket

    spark = queries.sparkSession
    m = len(codebooks)
    kc = len(codebooks[0])
    dsub = dim // m
    bits = max(4, (kc - 1).bit_length())
    mask = (1 << bits) - 1

    # index side: bucket + code per corpus vector (two Arrow map-only
    # passes; at scale both land as columns next to the parquet once)
    corpus_idx = (
        with_ivf_bucket(corpus, centroids, vec_col=vec_col)
        .select(F.col(id_col).alias("neighbor_id"), "ivf_bucket")
        .join(
            encode_pq(corpus, codebooks, dim=dim, id_col=id_col, vec_col=vec_col)
            .withColumnRenamed(id_col, "neighbor_id"),
            "neighbor_id",
        )
    )
    q_probed = probe_buckets(
        queries.select(id_col, vec_col), centroids, nprobe=nprobe, vec_col=vec_col
    ).select(F.col(id_col).alias("query_id"), "ivf_bucket")

    qrows = collect_query_matrix(queries, id_col, vec_col)
    qids = [int(r[0]) for r in qrows]
    qmat = np.asarray([list(r[1]) for r in qrows], dtype=np.float64)
    qn = np.linalg.norm(qmat, axis=1)
    qn[qn == 0.0] = 1.0
    qmat = qmat / qn[:, None]
    luts = [
        spark.createDataFrame(
            [
                # float() unwraps the numpy scalar (createDataFrame's
                # DoubleType verifier rejects np.float64); the value is
                # bit-unchanged
                (qid, c, float(_seq_dot(qmat[qi, j * dsub : (j + 1) * dsub], codebooks[j][c])))
                for qi, qid in enumerate(qids)
                for c in range(kc)
            ],
            f"query_id long, c{j} int, t{j} double",
        )
        for j in range(m)
    ]

    cand = q_probed.join(corpus_idx, "ivf_bucket")
    if exclude_self:
        cand = cand.filter(F.col("query_id") != F.col("neighbor_id"))
    for j in range(m):
        cand = cand.withColumn(
            f"c{j}", F.shiftright("pq_code", j * bits).bitwiseAND(F.lit(mask)).cast("int")
        )
    for j in range(m):
        cand = cand.join(F.broadcast(luts[j]), ["query_id", f"c{j}"])
    adc = " + ".join(f"t{j}" for j in range(m))  # left-assoc, = oracle
    scored = cand.withColumn(
        "sim_micro", F.expr(f"CAST(floor(({adc}) * {micro}) AS BIGINT)")
    )
    w = W.partitionBy("query_id").orderBy(F.col("sim_micro").desc(), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim_micro", "rank")
    )
