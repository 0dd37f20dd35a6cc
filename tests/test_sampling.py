"""Deterministic hash sampling/splitting invariants."""

import pytest
from pyspark.sql import functions as F

from gluestick_ts_spark.functions.sampling import hash_sample, hash_split, md5_bucket_expr


def test_bucket_range_and_determinism(spark):
    df = spark.createDataFrame([(i,) for i in range(500)], "id long")
    b1 = {r.id: r.b for r in df.select("id", md5_bucket_expr("id").alias("b")).collect()}
    b2 = {r.id: r.b for r in df.repartition(7).select("id", md5_bucket_expr("id").alias("b")).collect()}
    assert b1 == b2, "bucket must not depend on partitioning"
    assert all(0 <= v < 256 for v in b1.values())


def test_hash_sample_subset_stability(spark):
    df = spark.createDataFrame([(i,) for i in range(1000)], "id long")
    small = {r.id for r in hash_sample(df, "id", 0.1).collect()}
    big = {r.id for r in hash_sample(df, "id", 0.5).collect()}
    assert small <= big, "growing the fraction must only ADD keys"
    assert 0.05 < len(small) / 1000 < 0.16
    with pytest.raises(ValueError):
        hash_sample(df, "id", 1.5)


def test_hash_split_total_and_disjoint(spark):
    df = spark.createDataFrame([(i,) for i in range(1000)], "id long")
    out = hash_split(df, "id", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r.split: r.n for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 1000
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
