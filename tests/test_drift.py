"""distribution_drift: PSI/JS per bucket — identical vs shifted
distributions, smoothing of vanished/new categories, frozen reference
cut points for numeric columns, and null-rate drift."""

import math

import pytest
from pyspark.sql import functions as F

from gluestick_ts_spark.operators.drift import distribution_drift, psi_total


def _cat_df(spark, counts):
    rows = [(v,) for v, n in counts.items() for _ in range(n)]
    return spark.createDataFrame(rows, "c string")


def test_identical_categorical_is_stable(spark):
    d = _cat_df(spark, {"a": 60, "b": 30, "c": 10})
    rep = distribution_drift(d, d, "c")
    assert psi_total(rep) == pytest.approx(0.0, abs=1e-9)
    m = {r.bucket: r for r in rep.collect()}
    assert m["a"].p_ref == pytest.approx(0.6)
    assert m["a"].js_contrib == pytest.approx(0.0, abs=1e-12)


def test_shifted_categorical_flags_drift(spark):
    ref = _cat_df(spark, {"a": 80, "b": 20})
    cur = _cat_df(spark, {"a": 20, "b": 80})
    rep = distribution_drift(ref, cur, "c")
    # hand computation: 2 * (0.6 * ln(4)) = 1.663...
    assert psi_total(rep) == pytest.approx(2 * 0.6 * math.log(4.0), rel=1e-9)
    assert psi_total(rep) > 0.25  # "shifted" by the rule of thumb


def test_new_and_vanished_categories_are_finite(spark):
    ref = _cat_df(spark, {"a": 50, "b": 50})
    cur = _cat_df(spark, {"a": 50, "z": 50})
    m = {r.bucket: r for r in distribution_drift(ref, cur, "c").collect()}
    for b in ("b", "z"):
        assert math.isfinite(m[b].psi_contrib) and m[b].psi_contrib > 0
    assert m["z"].n_ref == 0 and m["b"].n_cur == 0
    # JS stays bounded by ln(2) per bucket even on disjoint support
    assert all(0 <= r.js_contrib <= math.log(2) + 1e-12 for r in m.values())


def test_null_rate_drift_is_visible(spark):
    ref = spark.createDataFrame([("x",)] * 95 + [(None,)] * 5, "c string")
    cur = spark.createDataFrame([("x",)] * 60 + [(None,)] * 40, "c string")
    m = {r.bucket: r for r in distribution_drift(ref, cur, "c").collect()}
    assert m["<NULL>"].p_ref == pytest.approx(0.05)
    assert m["<NULL>"].p_cur == pytest.approx(0.40)
    assert m["<NULL>"].psi_contrib > 0.5


def test_numeric_buckets_freeze_reference_cuts(spark):
    ref = spark.createDataFrame([(float(i),) for i in range(100)], "v double")
    same = distribution_drift(ref, ref, "v", kind="numeric", bins=10)
    assert psi_total(same) == pytest.approx(0.0, abs=1e-9)
    assert same.count() == 10
    # shift the current side up by 200: every value overflows the
    # reference range and clamps into the LAST reference bucket —
    # visible as massive drift, not silently dropped
    cur = ref.select((F.col("v") + 200).alias("v"))
    rep = distribution_drift(ref, cur, "v", kind="numeric", bins=10)
    m = {r.bucket: r for r in rep.collect()}
    last = str(max(int(b) for b in m))
    assert m[last].n_cur == 100
    assert psi_total(rep) > 0.25


def test_numeric_validation_and_constant_column(spark):
    ref = spark.createDataFrame([(1.0,)] * 20, "v double")
    with pytest.raises(ValueError, match="bins"):
        distribution_drift(ref, ref, "v", kind="numeric", bins=1)
    with pytest.raises(ValueError, match="kind"):
        distribution_drift(ref, ref, "v", kind="wat")
    # constant column: duplicate cuts collapse, report stays well-formed
    rep = distribution_drift(ref, ref, "v", kind="numeric", bins=10)
    assert rep.count() == 1 and psi_total(rep) == pytest.approx(0.0, abs=1e-9)


def test_report_stays_engine_side(spark):
    ref = _cat_df(spark, {"a": 10, "b": 5})
    rep = distribution_drift(ref, ref, "c")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = rep._jdf.queryExecution().explainString(mode)
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan, node
