"""Property-based invariants (hypothesis) on small generated frames.

SURVEY.md §5.5: cheap algebraic wins — set-op partitions, dedup
idempotence, decimal-sum permutation invariance.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_ingestion_s3_to_parquet_spark.functions.numeric import dsum

rows = st.lists(
    st.tuples(st.integers(0, 9), st.sampled_from(["a", "b", "c"])),
    min_size=0,
    max_size=30,
)

slow_ok = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(left=rows, right=rows)
@slow_ok
def test_setop_partition_invariant(spark, left, right):
    """|A∩B| + |A−B| == |distinct A| (SQL set semantics)."""
    ldf = spark.createDataFrame(left or [(0, "a")], "k int, v string")
    rdf = spark.createDataFrame(right or [(1, "b")], "k int, v string")
    inter = ldf.intersect(rdf).count()
    exc = ldf.subtract(rdf).count()
    assert inter + exc == ldf.distinct().count()


@given(data=rows)
@slow_ok
def test_dedup_idempotent(spark, data):
    df = spark.createDataFrame(data or [(0, "a")], "k int, v string")
    once = df.dropDuplicates(["k", "v"])
    assert once.count() == once.dropDuplicates(["k", "v"]).count()


@given(
    vals=st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=25,
    ),
    seed=st.integers(0, 1000),
)
@slow_ok
def test_dsum_permutation_invariant(spark, vals, seed):
    """The decimal-sum is identical for any permutation/partitioning."""
    import random

    shuffled = vals[:]
    random.Random(seed).shuffle(shuffled)
    a = spark.createDataFrame([(v,) for v in vals], "x double").agg(
        dsum("x", "s")
    ).first().s
    b = (
        spark.createDataFrame([(v,) for v in shuffled], "x double")
        .repartition(3)
        .agg(dsum("x", "s"))
        .first()
        .s
    )
    assert a == b
