"""Property-based tests (hypothesis) for the engine's core invariants
(SURVEY §5.4): full-outer provenance partition, inner-slice equivalence,
dedup idempotence, union-distinct commutativity.

Each example spins Spark jobs, so examples are few and inputs small —
the value is in the generated EDGE CASES (empty sides, all-duplicate
keys, disjoint keys), not volume.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from graphql_api_etl_spark.operators.join import outer_merge, split_by_provenance

KEYS = st.lists(st.integers(min_value=0, max_value=5), min_size=0, max_size=8)

_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def _df(spark, keys, side):
    if not keys:
        return spark.createDataFrame([], f"k int, {side} string")
    return spark.createDataFrame([(k, f"{side}{i}") for i, k in enumerate(keys)], f"k int, {side} string")


@given(left_keys=KEYS, right_keys=KEYS)
@_SETTINGS
def test_provenance_partition_invariant(spark, left_keys, right_keys):
    left, right = _df(spark, left_keys, "l"), _df(spark, right_keys, "r")
    m = outer_merge(left, right, on="k")
    both, lo, ro = split_by_provenance(m)
    n_both, n_lo, n_ro = both.count(), lo.count(), ro.count()
    # the three slices partition the outer join
    assert n_both + n_lo + n_ro == m.count()
    # inner slice ≡ inner join; anti slices ≡ SQL anti joins
    assert n_both == left.join(right, "k", "inner").count()
    assert n_lo == left.join(right, "k", "left_anti").count()
    assert n_ro == right.join(left, "k", "left_anti").count()


@given(keys=KEYS)
@_SETTINGS
def test_self_outer_merge_has_no_anti_rows(spark, keys):
    df = _df(spark, keys, "v")
    m = outer_merge(df, df.withColumnRenamed("v", "w"), on="k")
    _, lo, ro = split_by_provenance(m)
    assert lo.count() == 0 and ro.count() == 0


@given(keys=KEYS)
@_SETTINGS
def test_distinct_idempotent_and_union_commutative(spark, keys):
    a = _df(spark, keys, "v").select("k")
    b = _df(spark, list(reversed(keys)), "v").select("k")
    da = a.distinct()
    assert da.distinct().count() == da.count()  # idempotence
    ab = {r["k"] for r in a.unionByName(b).distinct().collect()}
    ba = {r["k"] for r in b.unionByName(a).distinct().collect()}
    assert ab == ba == set(keys)


@given(texts=st.lists(st.text(alphabet="ab ", min_size=1, max_size=20), min_size=1, max_size=6))
@_SETTINGS
def test_exact_dedup_counts(spark, texts):
    from graphql_api_etl_spark.operators.dedup import exact_dedup

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    groups = exact_dedup(docs).collect()
    # group sizes partition the corpus; keepers are distinct ids
    assert sum(r["n_copies"] for r in groups) == len(texts)
    keepers = [r["keeper_id"] for r in groups]
    assert len(keepers) == len(set(keepers))
