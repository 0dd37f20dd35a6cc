"""Exact heavy hitters: the Misra-Gries candidate pass may propose,
but the recount must dispose — output equals a plain GROUP BY/HAVING
regardless of partitioning or sketch capacity."""

import pytest
from pyspark.sql import functions as F

from gluestick_ts_spark.operators.frequent import heavy_hitters


def _exact(df, frac):
    n = df.where(F.col("item").isNotNull()).count()
    return {
        (r.item, r.cnt)
        for r in df.groupBy("item")
        .agg(F.count("*").alias("cnt"))
        .where(F.col("item").isNotNull() & (F.col("cnt") > frac * n))
        .collect()
    }


def test_heavy_hitters_exact_and_partition_invariant(spark):
    # zipf-ish skew: item i appears ~1000/i times
    rows = []
    for i in range(1, 60):
        rows.extend([(f"item{i}",)] * (1000 // i))
    rows.append((None,))
    df = spark.createDataFrame(rows, "item string")
    frac = 0.02
    exact = _exact(df, frac)
    assert exact  # the test must exercise a non-trivial answer
    got = {(r.item, r.cnt) for r in heavy_hitters(df, "item", frac).collect()}
    assert got == exact
    got7 = {
        (r.item, r.cnt)
        for r in heavy_hitters(df.repartition(7), "item", frac).collect()
    }
    assert got7 == exact
    # a barely-sufficient sketch capacity still returns the exact set
    # (the superset guarantee is what the recount relies on)
    tight = {
        (r.item, r.cnt)
        for r in heavy_hitters(
            df.repartition(5), "item", frac, capacity=50
        ).collect()
    }
    assert tight == exact


def test_heavy_hitters_edge_cases(spark):
    empty = spark.createDataFrame([], "item string")
    assert heavy_hitters(empty, "item", 0.1).count() == 0
    nulls = spark.createDataFrame([(None,), (None,)], "item string")
    assert heavy_hitters(nulls, "item", 0.1).count() == 0
    one = spark.createDataFrame([("a",), ("a",), ("b",)], "item string")
    got = {(r.item, r.cnt) for r in heavy_hitters(one, "item", 0.5).collect()}
    assert got == {("a", 2)}  # b at 1/3 does not exceed 50%
    with pytest.raises(ValueError, match="threshold_frac"):
        heavy_hitters(one, "item", 1.5)
    # an undersized sketch breaks the candidate-superset guarantee:
    # reject it instead of silently returning an incomplete answer
    with pytest.raises(ValueError, match="superset"):
        heavy_hitters(one, "item", 0.001, capacity=10)


def test_heavy_hitters_candidate_collect_is_bounded(spark):
    """The driver never sees more than partitions x capacity candidate
    strings — many distinct singletons must not blow up the collect
    (they cancel inside the per-partition Misra-Gries summary)."""
    rows = [(f"rare{i}",) for i in range(5000)] + [("hot",)] * 3000
    df = spark.createDataFrame(rows, "item string").repartition(4)
    got = {(r.item, r.cnt) for r in heavy_hitters(df, "item", 0.2).collect()}
    assert got == {("hot", 3000)}
