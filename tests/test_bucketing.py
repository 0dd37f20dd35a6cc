"""Bucketed co-located joins: correct results AND a shuffle-free plan."""

import pytest
from pyspark.sql import functions as F

from gluestick_ts_spark.operators.bucketing import (
    bucketed_join,
    plan_has_shuffle,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    o = spark.createDataFrame([(i, f"o{i}") for i in range(100)], "k long, ov string")
    l = spark.createDataFrame(
        [(i % 50, f"l{i}") for i in range(300)], "k long, lv string"
    )
    write_bucketed(o, "orders_b", ["k"], n_buckets=4)
    write_bucketed(l, "lines_b", ["k"], n_buckets=4)
    yield "orders_b", "lines_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lines_b")


def test_bucketed_join_no_shuffle(spark, bucketed_tables):
    ot, lt = bucketed_tables
    # Force the SMJ path (tiny test tables would broadcast, which
    # bypasses bucketing entirely) to assert the co-location property.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_join(spark, lt, ot, ["k"], ["k"])
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert not plan_has_shuffle(j), plan
        assert j.count() == 300
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_matches_plain(spark, bucketed_tables):
    ot, lt = bucketed_tables
    j = bucketed_join(spark, lt, ot, ["k"], ["k"])
    got = {(r.lv, r.ov) for r in j.collect()}
    plain = {
        (r.lv, r.ov)
        for r in spark.table(lt).join(
            spark.table(ot), spark.table(lt)["k"] == spark.table(ot)["k"]
        ).collect()
    }
    assert got == plain
