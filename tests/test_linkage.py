"""Edit-distance joins: the deletion-neighborhood blocking may
propose, but levenshtein disposes — output equals a brute-force cross
join regardless of partitioning, with no cross join in the plan."""

import re

import pytest
from pyspark.sql import functions as F

from gluestick_ts_spark.operators.linkage import (
    deletion_variants_expr,
    edit_distance_join,
    edit_distance_self_join,
)


def _lev(a, b):
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


WORDS = [
    "spark", "spork", "spark", "shark", "sprk", "sparks", "park",
    "quark", "spa", "stark", "spar", "sparc", "zzz", "szark", "sharky",
    "", "a", "b", "ab", "ba",
]


def _brute(words, d):
    return {
        (i, j, _lev(words[i], words[j]))
        for i in range(len(words))
        for j in range(len(words))
        if i < j and _lev(words[i], words[j]) <= d
    }


@pytest.mark.parametrize("d", [1, 2])
def test_self_join_matches_brute_force(spark, d):
    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(WORDS)], "id long, w string"
    ).repartition(5)
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in edit_distance_self_join(df, "w", "id", max_dist=d).collect()
    }
    assert got == _brute(WORDS, d)


def test_two_table_join_and_nulls(spark):
    a = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, None)], "id long, w string"
    )
    b = spark.createDataFrame(
        [(10, "alpho"), (11, "betas"), (12, "gamma")], "id long, w string"
    )
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in edit_distance_join(a, b, "w", "id", max_dist=1).collect()
    }
    assert got == {(1, 10, 1), (2, 11, 1)}
    with pytest.raises(ValueError, match="max_dist"):
        edit_distance_join(a, b, "w", "id", max_dist=3)


def test_deletion_variants_expr_exact_sets(spark):
    df = spark.createDataFrame([("abc",)], "s string")
    v1 = set(df.select(deletion_variants_expr("s", 1).alias("v")).first().v)
    assert v1 == {"abc", "bc", "ac", "ab"}
    v2 = set(df.select(deletion_variants_expr("s", 2).alias("v")).first().v)
    assert v2 == {"abc", "bc", "ac", "ab", "a", "b", "c"}


def test_plan_has_no_cross_join(spark):
    df = spark.createDataFrame(
        [(i, f"w{i}") for i in range(100)], "id long, w string"
    )
    out = edit_distance_self_join(df, "w", "id", max_dist=1)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = out._jdf.queryExecution().explainString(mode)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the candidate join keys on the md5 variant key, never raw text
    hashed = re.findall(r"hashpartitioning\([^)]*\)", plan)
    assert all("val_" not in h for h in hashed), hashed


def test_long_values_fail_loudly(spark):
    """A kilobyte value at d=2 would explode into ~500k variants; the
    in-row guard fails the job with an actionable message instead."""
    df = spark.createDataFrame(
        [(1, "short"), (2, "x" * 300)], "id long, w string"
    )
    with pytest.raises(Exception, match="max_len"):
        edit_distance_self_join(df, "w", "id", max_dist=1).collect()
    # raising the cap deliberately works
    got = edit_distance_self_join(df, "w", "id", max_dist=1, max_len=512)
    assert got.count() == 0
