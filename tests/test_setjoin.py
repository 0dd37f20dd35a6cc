"""Prefix-filtered exact set-similarity join: must equal the brute
force on random inputs (the prefix filter proposes, the in-row verify
disposes), handle duplicates/empties, and never plan a cross join."""

import itertools
import random

import pytest
from pyspark.sql import functions as F

from gluestick_ts_spark.operators.setjoin import set_similarity_join


def _brute(rows, t):
    sets = {i: set(s) for i, s in rows if s}
    out = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        if union and inter / union >= t:
            out[(a, b)] = round(inter / union, 6)
    return out


def _run(spark, rows, t):
    df = spark.createDataFrame(rows, "doc_id long, tokens array<string>")
    return {
        (r.id_a, r.id_b): r.jaccard
        for r in set_similarity_join(df, threshold=t).collect()
    }


def test_setjoin_equals_brute_force_random(spark):
    """Randomized exactness at several thresholds: every qualifying
    pair found (completeness — the prefix-filter theorem) and nothing
    else (the verify)."""
    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(60)]
    # skewed frequencies: a few very common tokens (the naive
    # inverted-index killers), many rare ones
    rows = []
    for i in range(80):
        n = rng.randint(3, 12)
        s = {vocab[min(int(rng.expovariate(0.12)), 59)] for _ in range(n)}
        rows.append((i, sorted(s)))
    for t in (0.5, 0.7, 0.9):
        assert _run(spark, rows, t) == _brute(rows, t), f"t={t}"


def test_setjoin_duplicates_empties_and_identical(spark):
    rows = [
        (1, ["a", "b", "c", "a", "a"]),   # dups collapse
        (2, ["c", "b", "a"]),             # identical set, J=1
        (3, []),                          # empty: never pairs
        (4, ["a", "b"]),                  # J(4,1)=2/3, J(4,2)=2/3
    ]
    got = _run(spark, rows, 0.6)
    assert got[(1, 2)] == 1.0
    assert got[(1, 4)] == round(2 / 3, 6) and got[(2, 4)] == round(2 / 3, 6)
    assert all(3 not in p for p in got)
    # threshold excludes the 2/3 pairs
    assert set(_run(spark, rows, 0.7)) == {(1, 2)}


def test_setjoin_threshold_validation(spark):
    df = spark.createDataFrame([(1, ["a"])], "doc_id long, tokens array<string>")
    with pytest.raises(ValueError, match="threshold"):
        set_similarity_join(df, threshold=0.0)


def test_setjoin_plan_has_no_cross_join_and_prefix_blocks(spark):
    """The candidate stage is a token-keyed equi-join of PREFIX rows —
    no CartesianProduct / BroadcastNestedLoopJoin anywhere, and the
    pair verify stays in-row (no per-token shuffle after the
    reassembly)."""
    rows = [(i, [f"w{j}" for j in range(i % 7 + 2)]) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, tokens array<string>")
    plan = (
        set_similarity_join(df, threshold=0.8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin"):
        assert bad not in plan, bad
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan, node


def test_setjoin_threshold_boundary_exact(spark):
    """Float-boundary completeness regression: t=0.14 with |A|=50,
    |B|=7 subset of A gives exact J = 7/50 = 0.14 — qualifying at the
    threshold — while IEEE 0.14*50 = 7.000000000000001 would have the
    naive size filter and prefix length drop the pair."""
    rows = [
        (1, [f"w{i}" for i in range(50)]),
        (2, [f"w{i}" for i in range(7)]),
    ]
    df = spark.createDataFrame(rows, "doc_id long, tokens array<string>")
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in set_similarity_join(df, threshold=0.14).collect()
    }
    assert got == {(1, 2): 0.14}, got
    # and strictly-above-boundary thresholds still exclude it
    assert set_similarity_join(df, threshold=0.15).count() == 0


def test_setjoin_materialize_equivalence(spark):
    """materialize=True pins the ordered relation once; results must
    be identical to the lazy plan."""
    rng_rows = [(i, [f"w{j}" for j in range((i * 3) % 9 + 2)]) for i in range(60)]
    df = spark.createDataFrame(rng_rows, "doc_id long, tokens array<string>")
    lazy = _run(spark, rng_rows, 0.7)
    mat = {
        (r.id_a, r.id_b): r.jaccard
        for r in set_similarity_join(
            df, threshold=0.7, materialize=True
        ).collect()
    }
    assert mat == lazy
