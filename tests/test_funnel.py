"""Ordered-funnel state machine semantics."""

from gluestick_ts_spark.operators.funnel import (
    funnel_counts,
    funnel_depth_per_user,
)


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp"
    )


def test_funnel_order_matters(spark):
    rows = [
        # u1 completes in order; u2 has all events but purchase BEFORE view
        (1, "signup", "2024-01-01 10:00:00"),
        (1, "view", "2024-01-01 10:05:00"),
        (1, "purchase", "2024-01-01 10:10:00"),
        (2, "signup", "2024-01-01 10:00:00"),
        (2, "purchase", "2024-01-01 10:01:00"),
        (2, "view", "2024-01-01 10:02:00"),
        # u3 never signs up
        (3, "view", "2024-01-01 10:00:00"),
    ]
    ev = _ev(spark, [(u, t, __import__("datetime").datetime.fromisoformat(ts))
                     for u, t, ts in rows])
    depths = {r.user_id: r.depth for r in funnel_depth_per_user(
        ev, ["signup", "view", "purchase"]).collect()}
    assert depths == {1: 3, 2: 2, 3: 0}
    counts = {r.step: r.n_users for r in funnel_counts(
        ev, ["signup", "view", "purchase"]).collect()}
    assert counts == {"signup": 2, "view": 2, "purchase": 1}


def test_funnel_repeated_and_offstep_events(spark):
    import datetime as dt

    rows = [
        # noise events between steps don't block; repeats don't double-count
        (1, "signup", dt.datetime(2024, 1, 1, 9)),
        (1, "error", dt.datetime(2024, 1, 1, 9, 30)),
        (1, "signup", dt.datetime(2024, 1, 1, 10)),
        (1, "view", dt.datetime(2024, 1, 1, 11)),
    ]
    ev = _ev(spark, rows)
    out = {r.step: r.n_users for r in funnel_counts(
        ev, ["signup", "view", "purchase"]).collect()}
    assert out == {"signup": 1, "view": 1, "purchase": 0}
    # report is monotonically non-increasing by construction
    seq = [r.n_users for r in funnel_counts(
        ev, ["signup", "view", "purchase"]).orderBy("step_idx").collect()]
    assert seq == sorted(seq, reverse=True)


def test_retention_matrix_weekly(spark):
    import datetime as dt

    rows = [
        # u1: first week W0, active W0 and W2
        (1, dt.datetime(2024, 1, 1, 10)),
        (1, dt.datetime(2024, 1, 16, 10)),
        # u2: first week W0, active W0 only
        (2, dt.datetime(2024, 1, 2, 10)),
        # u3: first week W1, active W1 and W2
        (3, dt.datetime(2024, 1, 8, 10)),
        (3, dt.datetime(2024, 1, 15, 10)),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    from gluestick_ts_spark.operators.funnel import retention_matrix

    got = {
        (str(r.cohort_period.date()), r.period_offset): r.n_users
        for r in retention_matrix(ev).collect()
    }
    assert got == {
        ("2024-01-01", 0): 2,  # cohort W0 size
        ("2024-01-01", 2): 1,  # u1 back in W2
        ("2024-01-08", 0): 1,  # cohort W1 size
        ("2024-01-08", 1): 1,  # u3 back in W2 (offset 1 from W1)
    }, got


def test_retention_matrix_monthly_and_validation(spark):
    import datetime as dt

    import pytest as _pytest

    ev = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 5)), (1, dt.datetime(2024, 3, 5))],
        "user_id long, ts timestamp",
    )
    from gluestick_ts_spark.operators.funnel import retention_matrix

    got = {(r.period_offset): r.n_users
           for r in retention_matrix(ev, period="month").collect()}
    assert got == {0: 1, 2: 1}
    with _pytest.raises(ValueError, match="unsupported period"):
        retention_matrix(ev, period="quarter")
