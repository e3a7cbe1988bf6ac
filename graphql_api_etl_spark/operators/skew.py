"""Skew-mitigation utilities: salted joins and two-phase aggregation.

AQE's skew-join splitting (on in session.py) handles most sort-merge
skew at runtime, but two cases still need explicit salting at 100 TB:

1. **Hot-key joins where the build side is small but not broadcastable**
   — :func:`salted_join` spreads each hot probe key over N salt buckets
   and replicates the build side N×, so no single task owns a whole hot
   key. Cost: build side ×N (choose N ≈ hot-key skew factor, not
   cores).
2. **Skewed groupBy keys** — :func:`two_phase_agg` pre-aggregates on
   (key, salt) before the final combine on key, so the map-side partial
   state for a hot key is split across N reducers first. Only algebraic
   aggregates (sum/count/min/max) decompose this way; avg is derived
   sum/count.

Salt assignment is ``monotonically_increasing_id() % n``: deterministic
within a run, uniform across rows regardless of key values (a
key-derived salt would re-concentrate the hot key)."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt__"


def with_salt(df: DataFrame, n_buckets: int) -> DataFrame:
    return df.withColumn(_SALT, F.pmod(F.monotonically_increasing_id(), F.lit(n_buckets)))


def replicate_for_salt(df: DataFrame, n_buckets: int) -> DataFrame:
    """Each row duplicated once per salt bucket (the build side of a
    salted join)."""
    return df.withColumn(_SALT, F.explode(F.array(*[F.lit(i) for i in range(n_buckets)])))


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    n_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left (large/skewed) side salted and the right
    side replicated ×``n_buckets``. Row-for-row equivalent to
    ``left.join(right, on, how)`` for inner/left joins; the hot key's
    rows land in ``n_buckets`` different tasks instead of one."""
    allowed = {"inner", "left", "leftouter", "left_outer", "leftsemi", "left_semi", "leftanti", "left_anti"}
    if how.lower().replace("_", "") not in {h.replace("_", "") for h in allowed}:
        raise ValueError(
            f"salted_join supports inner/left joins only, got {how!r}: the right side "
            "is replicated per salt bucket, so right/full-outer would emit each "
            "unmatched right row once PER BUCKET"
        )
    keys = [on] if isinstance(on, str) else list(on)
    lsalted = with_salt(left, n_buckets)
    rreplicated = replicate_for_salt(right, n_buckets)
    return lsalted.join(rreplicated, keys + [_SALT], how).drop(_SALT)


def two_phase_agg(
    df: DataFrame,
    keys: Sequence[str],
    sums: Sequence[str] = (),
    counts: bool = True,
    mins: Sequence[str] = (),
    maxs: Sequence[str] = (),
    n_buckets: int = 16,
) -> DataFrame:
    """Salted two-phase aggregation for skewed group keys: partial
    aggregate on (keys, salt), then final combine on keys. Emits
    ``sum_<c>``, ``min_<c>``, ``max_<c>`` and (optionally) ``n_rows``."""
    keys = list(keys)
    salted = with_salt(df, n_buckets)
    partial_aggs: list[Column] = []
    final_aggs: list[Column] = []
    if counts:
        partial_aggs.append(F.count(F.lit(1)).alias("__n"))
        final_aggs.append(F.sum("__n").alias("n_rows"))
    for c in sums:
        partial_aggs.append(F.sum(c).alias(f"__s_{c}"))
        final_aggs.append(F.sum(f"__s_{c}").alias(f"sum_{c}"))
    for c in mins:
        partial_aggs.append(F.min(c).alias(f"__mn_{c}"))
        final_aggs.append(F.min(f"__mn_{c}").alias(f"min_{c}"))
    for c in maxs:
        partial_aggs.append(F.max(c).alias(f"__mx_{c}"))
        final_aggs.append(F.max(f"__mx_{c}").alias(f"max_{c}"))
    if not partial_aggs:
        raise ValueError("no aggregates requested")
    partial = salted.groupBy(*keys, _SALT).agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*final_aggs)


def estimate_hot_partition_bytes(
    fact: DataFrame,
    on: str | Sequence[str],
    fraction: float = 0.01,
    seed: int = 42,
) -> int:
    """Estimate the hottest join-key partition's size in bytes — the
    ``hot_partition_bytes`` input :func:`skew_aware_join` wants — from
    a SEEDED Bernoulli sample instead of a full per-key histogram.

    At 100 TB the exact diagnosis (groupBy key → max/sum, the
    j_skew_aware entry's bounded one-row pass) is itself a full
    shuffle of (key, count) pairs; a hot key by definition owns a
    large share of rows, so a 1% sample estimates its share with
    tight relative error (a key holding p of N rows appears
    ~Binomial(0.01·N, p) times — for the ≥1% shares that matter the
    estimate is within a few percent at any fact size worth
    diagnosing), while keys too cold to matter may vanish from the
    sample entirely, which is exactly the right failure mode: their
    absence reads as "no skew signal" and the router falls through to
    the plain plan Catalyst/AQE already handle.

    Deterministic for a given (fraction, seed) over the same input —
    safe to call inside a catalog entry without breaking the
    differential (the estimate feeds only the strategy pick, never
    the result rows)."""
    keys = [on] if isinstance(on, str) else list(on)
    sample = fact.sample(fraction=fraction, seed=seed)
    hist = (
        sample.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n").alias("max_n"), F.sum("n").alias("n_rows"))
        .collect()[0]
    )
    if not hist["n_rows"]:
        return 0
    hot_share = hist["max_n"] / hist["n_rows"]
    return int(plan_size_bytes(fact) * hot_share)


def exact_hot_partition_bytes(fact: DataFrame, on: str | Sequence[str]) -> int:
    """Exact hot-partition size: full per-key histogram collapsed to
    one row (max per-key count ÷ total rows × Catalyst's size). One
    partial-aggregated shuffle over the fact — affordable below the
    :func:`diagnose_hot_partition_bytes` switch, and the precision
    reference the sampled estimator is tested against."""
    keys = [on] if isinstance(on, str) else list(on)
    hist = (
        fact.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n").alias("max_n"), F.sum("n").alias("n_rows"))
        .collect()[0]
    )
    if not hist["n_rows"]:
        return 0
    return int(plan_size_bytes(fact) * (hist["max_n"] / hist["n_rows"]))


# Facts whose Catalyst size estimate is under this run the EXACT
# histogram diagnosis; above it, the seeded 1% sample. 1 GiB ≈ the
# point where a full (key,count) shuffle stops being pocket change
# relative to the join being planned.
EXACT_DIAGNOSIS_MAX_BYTES = 1 << 30


def diagnose_hot_partition_bytes(
    fact: DataFrame,
    on: str | Sequence[str],
    exact_max_bytes: int = EXACT_DIAGNOSIS_MAX_BYTES,
    fraction: float = 0.01,
    seed: int = 42,
) -> int:
    """Size-switched skew diagnosis (VERDICT r13 ask #1): the
    ``hot_partition_bytes`` input :func:`skew_aware_join` wants,
    priced for the fact at hand.

    Small facts (Catalyst estimate ≤ ``exact_max_bytes``) pay the
    exact per-key histogram — one cheap shuffle, zero estimation
    error.  Past the threshold the exact pass costs like the join
    itself (a full (key, count) shuffle of a 100 TB fact), so the
    seeded Bernoulli sample takes over: hot keys by definition own a
    large row share, so a 1% sample pins their share within a few
    percent, while keys too cold to matter vanishing from the sample
    reads as "no skew signal" — the right failure mode (the router
    falls through to the plain plan AQE already handles).

    Both branches are deterministic over the same input, so the
    switch is safe inside a catalog entry: the estimate feeds only
    the strategy pick, never the result rows.
    tests/test_skew_and_tables.py pins that both branches pick the
    SAME :func:`skew_aware_join` strategy on the skewed fixture."""
    if plan_size_bytes(fact) <= exact_max_bytes:
        return exact_hot_partition_bytes(fact, on)
    return estimate_hot_partition_bytes(fact, on, fraction=fraction, seed=seed)


def plan_size_bytes(df: DataFrame) -> int:
    """Catalyst's size estimate for a frame (the same statistic the
    broadcast planner consults): optimizedPlan().stats.sizeInBytes.
    An upper-bound heuristic — filters without column stats keep the
    parent size — which is the right bias for a broadcast decision."""
    return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())


def skew_aware_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str | Sequence[str],
    how: str = "inner",
    broadcast_threshold_bytes: int = 64 * 1024 * 1024,
    dim_size_bytes: int | None = None,
    hot_partition_bytes: int | None = None,
    aqe_split_threshold_bytes: int = 256 * 1024 * 1024,
) -> DataFrame:
    """Equi-join with the strategy picked by the MEASURED r11 skew
    decision table (docs/PLANS.md, bench.py ``_probe_skew_floors``:
    broadcast ~6× > AQE skew-split (fired) ~2× > SHJ > plain SMJ ≈
    salted), instead of hand-chosen hints per call site:

    1. **Dim fits the broadcast budget** → ``broadcast(dim)``: no
       shuffle, skew-immune, the 6× winner whenever legal (broadcast
       cannot carry the dim side of a full/right-outer).
    2. **Hot key past AQE's split threshold** → plain sort-merge and
       let AQE's skew split fire at runtime (the session enables it);
       measured the best shuffle strategy once fired.
    3. **Skewed but UNDER the split threshold** (AQE won't trigger —
       its default needs a >256 MB hot partition) → ``SHUFFLE_HASH``
       hint: no per-partition sort, the next-best measured strategy.
    4. **No skew signal** → plain equi-join; Catalyst/AQE pick as
       usual.

    ``hot_partition_bytes`` is the caller's estimate of the hottest
    join-key partition (e.g. ``fact_bytes × hot_key_share`` from the
    ``a_key_skew_report`` entry, or — the 100 TB path —
    :func:`estimate_hot_partition_bytes`'s seeded-sample estimate);
    ``dim_size_bytes`` defaults to Catalyst's own estimate via
    :func:`plan_size_bytes`.  Explicit
    salting is deliberately NOT in the table: measured within noise of
    plain SMJ (its dim×N replication eats the task-spread win) — it
    remains the manual fallback for engines/versions without AQE.
    """
    keys = [on] if isinstance(on, str) else list(on)
    outer_to_dim = how.lower().replace("_", "") in {"fullouter", "full", "rightouter", "right", "outer"}
    size = dim_size_bytes if dim_size_bytes is not None else plan_size_bytes(dim)
    if size <= broadcast_threshold_bytes and not outer_to_dim:
        return fact.join(F.broadcast(dim), keys, how)
    if hot_partition_bytes is not None and hot_partition_bytes <= aqe_split_threshold_bytes:
        # skewed-but-small hot key: AQE's splitter stays dormant, so
        # pick the measured runner-up explicitly (no sort phase).
        if not outer_to_dim:
            return fact.join(dim.hint("SHUFFLE_HASH"), keys, how)
    # plain SMJ: AQE skew split handles hot keys past its threshold,
    # and it is the only spill-safe choice for outer joins to the dim.
    return fact.join(dim, keys, how)
