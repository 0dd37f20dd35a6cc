"""Resample + gap-fill: dense spine, hand-computed fills, per-key vs
global spine, and a key-partitioned (never global) sort plan."""

import pytest
from pyspark.sql import functions as F

from gluestick_ts_spark.operators.timeseries import resample_gapfill

ROWS = [
    # key a: observations at 00:00, 00:30 (gap at 00:15)
    ("a", "2024-01-01 00:00:10", 10.0),
    ("a", "2024-01-01 00:00:50", 30.0),
    ("a", "2024-01-01 00:30:00", 50.0),
    # key b: single observation
    ("b", "2024-01-01 00:45:00", 7.0),
]


@pytest.fixture()
def ts_df(spark):
    return spark.createDataFrame(ROWS, "k string, ts string, v double").select(
        "k", F.col("ts").cast("timestamp").alias("ts"), "v"
    )


def _m(df):
    return {
        (r.k, str(r.bucket)): (r.cnt, r.amt, r.is_gap) for r in df.collect()
    }


def test_zero_fill_dense_spine(ts_df):
    out = resample_gapfill(
        ts_df, "ts", "15 minutes",
        {"cnt": F.count("*"), "amt": F.sum("v")}, group_cols=["k"],
    )
    m = _m(out)
    assert m == {
        ("a", "2024-01-01 00:00:00"): (2, 40.0, False),
        ("a", "2024-01-01 00:15:00"): (0, 0.0, True),
        ("a", "2024-01-01 00:30:00"): (1, 50.0, False),
        ("b", "2024-01-01 00:45:00"): (1, 7.0, False),
    }


def test_locf_and_null_fills(ts_df):
    locf = resample_gapfill(
        ts_df, "ts", "15 minutes",
        {"cnt": F.count("*"), "amt": F.sum("v")}, group_cols=["k"], fill="locf",
    )
    assert _m(locf)[("a", "2024-01-01 00:15:00")] == (2, 40.0, True)
    nul = resample_gapfill(
        ts_df, "ts", "15 minutes",
        {"cnt": F.count("*"), "amt": F.sum("v")}, group_cols=["k"], fill="null",
    )
    assert _m(nul)[("a", "2024-01-01 00:15:00")] == (None, None, True)


def test_linear_interpolation(ts_df):
    out = resample_gapfill(
        ts_df, "ts", "15 minutes", {"amt": F.sum("v")},
        group_cols=["k"], fill="linear",
    )
    m = {(r.k, str(r.bucket)): r.amt for r in out.collect()}
    # gap at 00:15 between 40.0 (00:00) and 50.0 (00:30) -> midpoint 45
    assert m[("a", "2024-01-01 00:15:00")] == pytest.approx(45.0)
    assert m[("a", "2024-01-01 00:00:00")] == 40.0


def test_global_spine_covers_all_keys(ts_df):
    out = resample_gapfill(
        ts_df, "ts", "15 minutes", {"cnt": F.count("*")},
        group_cols=["k"], spine="global",
    )
    rows = {(r.k, str(r.bucket)) for r in out.collect()}
    # 4 buckets (00:00..00:45) x 2 keys
    assert len(rows) == 8
    assert ("b", "2024-01-01 00:00:00") in rows


def test_no_keys_and_validation(ts_df, spark):
    out = resample_gapfill(ts_df, "ts", "30 minutes", {"cnt": F.count("*")})
    m = {str(r.bucket): (r.cnt, r.is_gap) for r in out.collect()}
    assert m == {
        "2024-01-01 00:00:00": (2, False),
        "2024-01-01 00:30:00": (2, False),
    }
    with pytest.raises(ValueError, match="fill"):
        resample_gapfill(ts_df, "ts", "1 hour", {}, fill="bogus")


def test_plan_sorts_within_key_partitions_only(ts_df):
    out = resample_gapfill(
        ts_df, "ts", "15 minutes", {"cnt": F.count("*")},
        group_cols=["k"], fill="locf",
    )
    spark = ts_df.sparkSession
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = out._jdf.queryExecution().explainString(mode)
    # the locf window keys on the group hash; nothing sorts globally
    assert "rangepartitioning" not in plan, plan[:1500]
    assert "SinglePartition" not in plan, plan[:1500]


def test_is_gap_not_fooled_by_null_aggregates(spark):
    """An observed bucket whose aggregate is legitimately NULL (sum of
    all-NULL values) is NOT a gap — gap-ness comes from the spine-join
    miss, independent of aggregate order."""
    df = spark.createDataFrame(
        [("a", "2024-01-01 00:00:00", None),
         ("a", "2024-01-01 00:30:00", 5.0)],
        "k string, ts string, v double",
    ).select("k", F.col("ts").cast("timestamp").alias("ts"), "v")
    for aggs in (
        {"amt": F.sum("v"), "cnt": F.count("*")},
        {"cnt": F.count("*"), "amt": F.sum("v")},
    ):
        out = resample_gapfill(
            df, "ts", "15 minutes", aggs, group_cols=["k"], fill="null"
        )
        m = {str(r.bucket): (r.cnt, r.amt, r.is_gap) for r in out.collect()}
        assert m["2024-01-01 00:00:00"] == (1, None, False)  # observed, NULL agg
        assert m["2024-01-01 00:15:00"] == (None, None, True)
        assert m["2024-01-01 00:30:00"] == (1, 5.0, False)


# ---------------------------------------------------------------------------
# rolling_zscore
# ---------------------------------------------------------------------------

def _z_df(spark, values, key="a"):
    from datetime import datetime, timedelta

    base = datetime(2024, 1, 1)
    rows = [
        (key, base + timedelta(hours=i), float(v)) for i, v in enumerate(values)
    ]
    return spark.createDataFrame(rows, "k string, bucket timestamp, v double")


def _expected_z(values, i, lookback, min_periods):
    """Pure-python twin of the operator's exact-sum formula."""
    window = values[max(0, i - lookback): i]
    n = len(window)
    if n < min_periods:
        return None
    s, s2 = float(sum(window)), float(sum(v * v for v in window))
    var = (s2 - s * s / n) / (n - 1)
    if not var > 0:
        return None
    return (values[i] - s / n) / var ** 0.5


def test_rolling_zscore_hand_computed(spark):
    from gluestick_ts_spark.operators.timeseries import rolling_zscore

    values = [10, 12, 11, 10, 13, 11, 12, 100, 11, 10]
    out = rolling_zscore(
        _z_df(spark, values), "v", "bucket", group_cols=["k"],
        lookback=4, threshold=3.0, min_periods=2,
    ).orderBy("bucket").collect()
    for i, r in enumerate(out):
        exp = _expected_z(values, i, 4, 2)
        if exp is None:
            assert r.zscore is None and r.is_anomaly is False
        else:
            assert abs(r.zscore - exp) < 1e-9, (i, r.zscore, exp)
            assert r.is_anomaly == (abs(exp) > 3.0)
        assert r.roll_n == min(i, 4)
    # the spike is flagged, its neighbors are not
    assert [r.is_anomaly for r in out].count(True) == 1
    assert out[7].is_anomaly is True


def test_rolling_zscore_warmup_and_constant_baseline(spark):
    from gluestick_ts_spark.operators.timeseries import rolling_zscore

    # constant baseline -> var 0 -> never scorable, never anomalous
    out = rolling_zscore(
        _z_df(spark, [5, 5, 5, 5, 5, 99]), "v", "bucket", group_cols=["k"],
        lookback=4, min_periods=2,
    ).orderBy("bucket").collect()
    assert all(r.zscore is None for r in out)
    assert all(r.is_anomaly is False for r in out)  # false, never NULL
    # warmup: first min_periods rows unscorable even with variance
    out2 = rolling_zscore(
        _z_df(spark, [1, 9, 4, 7, 2]), "v", "bucket", group_cols=["k"],
        lookback=4, min_periods=3,
    ).orderBy("bucket").collect()
    assert [r.zscore is None for r in out2] == [True, True, True, False, False]
    assert [r.roll_mean is None for r in out2] == [True, True, True, False, False]


def test_rolling_zscore_keys_are_independent(spark):
    from gluestick_ts_spark.operators.timeseries import rolling_zscore

    a = _z_df(spark, [10, 12, 10, 12, 50], key="a")
    b = _z_df(spark, [1000, 1000, 1000, 1000, 1000], key="b")
    out = rolling_zscore(
        a.unionByName(b), "v", "bucket", group_cols=["k"],
        lookback=4, min_periods=2, threshold=2.0,
    )
    m = {(r.k, r.bucket.hour): r.is_anomaly for r in out.collect()}
    assert m[("a", 4)] is True  # b's plateau never leaks into a's baseline
    assert all(not v for (k, _), v in m.items() if k == "b")


def test_rolling_zscore_validation(spark):
    from gluestick_ts_spark.operators.timeseries import rolling_zscore

    df = _z_df(spark, [1, 2, 3])
    for kw in (
        {"lookback": 1},
        {"min_periods": 1},
        {"lookback": 4, "min_periods": 5},
    ):
        with pytest.raises(ValueError, match="rolling_zscore"):
            rolling_zscore(df, "v", "bucket", group_cols=["k"], **kw)


def test_rolling_zscore_plan_is_key_partitioned(spark):
    from gluestick_ts_spark.operators.timeseries import rolling_zscore

    out = rolling_zscore(
        _z_df(spark, [1, 2, 3, 4, 5]), "v", "bucket", group_cols=["k"],
        lookback=4, min_periods=2,
    )
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = out._jdf.queryExecution().explainString(mode)
    # one key-hash window pass: no global sort, no single partition
    assert "rangepartitioning" not in plan, plan[:1500]
    assert "SinglePartition" not in plan, plan[:1500]


def test_rolling_zscore_overflow_fails_loudly(spark):
    from gluestick_ts_spark.operators.timeseries import rolling_zscore

    df = _z_df(spark, [1.0, 2.0, 5e14, 3.0])
    out = rolling_zscore(df, "v", "bucket", group_cols=["k"],
                         lookback=3, min_periods=2)
    with pytest.raises(Exception, match="overflows"):
        out.collect()


def test_rolling_zscore_bound_scales_with_lookback(spark):
    """The overflow guard covers the WINDOW SUM: at lookback=200 a
    value of 9e13 (fine for the per-value cast) would overflow the
    sum-of-squares aggregate, so it must raise, not NULL out."""
    from gluestick_ts_spark.operators.timeseries import rolling_zscore

    df = _z_df(spark, [9e13, 9e13, 9e13])
    out = rolling_zscore(df, "v", "bucket", group_cols=["k"],
                         lookback=200, min_periods=2)
    with pytest.raises(Exception, match="overflows"):
        out.collect()
    # the same values pass at a small lookback where the sum fits
    ok = rolling_zscore(df, "v", "bucket", group_cols=["k"],
                        lookback=3, min_periods=2)
    assert ok.count() == 3


def test_debounce_hand_computed(spark):
    from datetime import datetime, timedelta

    from gluestick_ts_spark.operators.timeseries import debounce

    b = datetime(2024, 1, 1)
    secs = {"u": [0, 10, 20, 400, 410, 1000], "v": [5]}
    rows = [
        (k, b + timedelta(seconds=s), i * 10 + j)
        for i, (k, ss) in enumerate(secs.items())
        for j, s in enumerate(ss)
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, eid long")
    out = debounce(df, "ts", ["k"], within="1 minute", tie_cols=["eid"])
    got = {(r.k, r.eid): (r.burst_id, r.n_suppressed) for r in out.collect()}
    # u: bursts {0s,10s,20s}, {400s,410s}, {1000s}; v: single event
    assert got == {
        ("u", 0): (1, 2), ("u", 3): (2, 1), ("u", 5): (3, 0),
        ("v", 10): (1, 0),
    }
    # conservation: suppressed + kept == rows in
    assert sum(n for _, n in got.values()) + len(got) == len(rows)


def test_debounce_rolling_gap_stretches_burst(spark):
    """A burst is bounded by INTERNAL gaps, not total span: events at
    0s, 50s, 100s, 150s with within=1min chain into ONE burst even
    though the span (150s) exceeds the gap."""
    from datetime import datetime, timedelta

    from gluestick_ts_spark.operators.timeseries import debounce

    b = datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [("u", b + timedelta(seconds=s), s) for s in (0, 50, 100, 150)],
        "k string, ts timestamp, eid long",
    )
    out = debounce(df, "ts", ["k"], within="1 minute", tie_cols=["eid"]).collect()
    assert len(out) == 1 and out[0].n_suppressed == 3


def test_debounce_plan_is_key_partitioned(spark):
    from datetime import datetime

    from gluestick_ts_spark.operators.timeseries import debounce

    df = spark.createDataFrame(
        [("u", datetime(2024, 1, 1), 1)], "k string, ts timestamp, eid long"
    )
    out = debounce(df, "ts", ["k"], within="1 minute", tie_cols=["eid"])
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = out._jdf.queryExecution().explainString(mode)
    assert "rangepartitioning" not in plan and "SinglePartition" not in plan, (
        plan[:1500]
    )
