"""Skew utilities: salted join and two-phase distinct equal their
plain counterparts."""

from pyspark.sql import functions as F

from gluestick_ts_spark.operators.skew import salted_join, two_phase_count_distinct


def test_salted_join_equals_plain_join(spark):
    # skewed left: key 1 dominates
    left = spark.createDataFrame(
        [(1, i) for i in range(200)] + [(2, 900), (3, 901)], "k long, lv long"
    )
    right = spark.createDataFrame([(1, "a"), (2, "b"), (4, "d")], "k long, rv string")
    plain = {(r.k, r.lv, r.rv) for r in left.join(right, on=["k"]).collect()}
    salted = {(r.k, r.lv, r.rv) for r in salted_join(left, right, on=["k"], n_salts=4).collect()}
    assert salted == plain and len(plain) == 201


def test_salted_left_join(spark):
    left = spark.createDataFrame([(1, 10), (5, 50)], "k long, lv long")
    right = spark.createDataFrame([(1, "a")], "k long, rv string")
    got = {(r.k, r.rv) for r in salted_join(left, right, on=["k"], n_salts=3, how="left").collect()}
    assert got == {(1, "a"), (5, None)}


def test_salted_join_rejects_right_preserving(spark):
    import pytest

    left = spark.createDataFrame([(1, 10)], "k long, lv long")
    right = spark.createDataFrame([(1, "a"), (2, "b")], "k long, rv string")
    for how in ("right", "rightouter", "full", "full_outer", "outer"):
        with pytest.raises(ValueError, match="salted_join does not support"):
            salted_join(left, right, on=["k"], how=how)


def test_two_phase_count_distinct(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 1), ("a", 2), ("b", 7)], "g string, x long"
    )
    got = {(r.g, r.n_distinct) for r in two_phase_count_distinct(df, ["g"], "x").collect()}
    exact = {
        (r.g, r.n)
        for r in df.groupBy("g").agg(F.count_distinct("x").alias("n")).collect()
    }
    assert got == exact == {("a", 2), ("b", 1)}
