"""Theta-sketch distinct-set overlap: exact below the nominal-entries
threshold, empty-set (not NULL) algebra on one-sided keys, and a plan
that never shuffles raw ids into a join."""

from pyspark.sql import functions as F

from gluestick_ts_spark.operators.overlap import distinct_overlap


def _df(spark, rows):
    return spark.createDataFrame(rows, "k string, uid long")


def test_overlap_exact_at_small_cardinality(spark):
    """Below 4096 distinct ids theta sketches are exact, so every
    derived statistic must equal plain set arithmetic."""
    a = _df(spark, [("x", i) for i in range(100)])          # {0..99}
    b = _df(spark, [("x", i) for i in range(60, 160)])      # {60..159}
    r = distinct_overlap(a, b, "uid", keys=["k"]).collect()[0]
    assert r.distinct_a == 100.0
    assert r.distinct_b == 100.0
    assert r.distinct_intersection == 40.0
    assert r.distinct_union == 160.0
    assert abs(r.jaccard - 40 / 160) < 1e-12
    assert abs(r.containment_a - 40 / 100) < 1e-12


def test_overlap_disjoint_and_identical(spark):
    a = _df(spark, [("x", i) for i in range(50)])
    b = _df(spark, [("x", i + 1000) for i in range(50)])
    r = distinct_overlap(a, b, "uid", keys=["k"]).collect()[0]
    assert (r.distinct_intersection, r.jaccard) == (0.0, 0.0)
    assert r.distinct_union == 100.0
    r2 = distinct_overlap(a, a, "uid", keys=["k"]).collect()[0]
    assert r2.distinct_intersection == 50.0
    assert r2.jaccard == 1.0
    assert r2.containment_a == 1.0


def test_overlap_one_sided_keys_are_empty_sets(spark):
    """A key on only one side reports the missing side and the
    intersection as 0 — never NULL."""
    a = _df(spark, [("only_a", 1), ("both", 1), ("both", 2)])
    b = _df(spark, [("only_b", 9), ("both", 2), ("both", 3)])
    rows = {r.k: r for r in distinct_overlap(a, b, "uid", keys=["k"]).collect()}
    assert set(rows) == {"only_a", "only_b", "both"}
    oa = rows["only_a"]
    assert (oa.distinct_a, oa.distinct_b, oa.distinct_intersection) == (1.0, 0.0, 0.0)
    assert oa.distinct_union == 1.0 and oa.containment_a == 0.0
    ob = rows["only_b"]
    assert (ob.distinct_a, ob.distinct_b, ob.distinct_union) == (0.0, 1.0, 1.0)
    bo = rows["both"]
    assert (bo.distinct_a, bo.distinct_b) == (2.0, 2.0)
    assert bo.distinct_intersection == 1.0 and bo.distinct_union == 3.0


def test_overlap_global_mode(spark):
    """keys=None: one corpus-global row even when either side is empty."""
    a = _df(spark, [("x", i) for i in range(10)])
    b = _df(spark, [("y", i) for i in range(5, 8)])
    out = distinct_overlap(a, b, "uid")
    rows = out.collect()
    assert len(rows) == 1
    assert rows[0].distinct_intersection == 3.0
    empty = _df(spark, []).where(F.lit(False))
    rows = distinct_overlap(a, empty, "uid").collect()
    assert len(rows) == 1
    assert rows[0].distinct_a == 10.0
    assert rows[0].distinct_b == 0.0
    assert rows[0].distinct_union == 10.0


def test_overlap_duplicates_do_not_inflate(spark):
    """The statistic is DISTINCT overlap: repeated ids count once."""
    a = _df(spark, [("x", 1)] * 500 + [("x", 2)])
    b = _df(spark, [("x", 1)] * 300)
    r = distinct_overlap(a, b, "uid", keys=["k"]).collect()[0]
    assert (r.distinct_a, r.distinct_b, r.distinct_intersection) == (2.0, 1.0, 1.0)


def test_overlap_plan_never_joins_raw_ids(spark):
    """The join input must be the per-key SKETCH relations (one row per
    key), i.e. both join children aggregate below the join — raw ids
    never cross a join boundary."""
    a = _df(spark, [("x", i) for i in range(100)])
    b = _df(spark, [("x", i) for i in range(50)])
    plan = distinct_overlap(a, b, "uid", keys=["k"])._jdf.queryExecution().executedPlan().toString()
    join_pos = min(
        p for p in (plan.find("SortMergeJoin"), plan.find("BroadcastHashJoin"),
                    plan.find("ShuffledHashJoin"))
        if p >= 0
    )
    # every join child is an aggregate: the first agg must appear AFTER
    # the join node in the tree printout (children print below parents)
    assert "HashAggregate" in plan[join_pos:]
    # and no exchange hash-partitions on the id column itself
    import re
    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "uid" not in m.group(1)


def test_overlap_null_key_is_a_first_class_group(spark):
    """NULL-keyed rows on both sides must intersect as one group (the
    join is null-safe), not split into two one-sided rows reporting
    intersection 0."""
    a = spark.createDataFrame(
        [(None, i) for i in range(1, 11)] + [("x", 1)],
        "k string, uid long",
    )
    b = spark.createDataFrame(
        [(None, i) for i in range(5, 16)] + [("y", 2)],
        "k string, uid long",
    )
    rows = {r.k: r for r in distinct_overlap(a, b, "uid", keys=["k"]).collect()}
    assert set(rows) == {None, "x", "y"}
    nz = rows[None]
    assert (nz.distinct_a, nz.distinct_b) == (10.0, 11.0)
    assert nz.distinct_intersection == 6.0   # {5..10}
    assert nz.distinct_union == 15.0         # {1..15}
