"""Ordered-funnel analysis: how deep into a step sequence each user
gets, in timestamp order.

The product-analytics staple (Amplitude/Mixpanel funnels; window
FUNNEL functions in ClickHouse) re-expressed Spark-first: ONE
user-keyed aggregate collects each user's (ts, type) events in order,
and an in-row ``aggregate`` fold runs the step state machine — no
self-join per step (the naive SQL formulation joins the events table
once PER STEP), no window cascade, no Python. Per-user event lists are
the only state, so memory is bounded by the busiest user, not the
corpus; at 100 TB add a per-user event cap or a time window first.

Determinism contract (what the driver oracle replicates): events sort
by ``(ts, type)`` — struct/lexicographic order on both engines — and a
step only advances the machine when it matches the NEXT expected step
after the current depth. Same-timestamp events advance in their sorted
order.

No reference counterpart (extension op).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _spread

__all__ = ["funnel_counts", "funnel_depth_per_user", "retention_matrix"]


def funnel_depth_per_user(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-user funnel depth: ``(user_col, depth)`` where depth = how
    many leading ``steps`` the user completed in order (0..len(steps)).
    Events not in ``steps`` are pruned BEFORE the shuffle."""
    steps_lit = F.from_json(F.lit(json.dumps(list(steps))), "array<string>")
    evs = _spread(events).where(F.col(type_col).isin(list(steps))).select(
        F.col(user_col).alias("__u"),
        F.struct(F.col(ts_col).alias("t"), F.col(type_col).alias("e")).alias("__ev"),
    )
    per_user = evs.groupBy("__u").agg(
        F.sort_array(F.collect_list("__ev")).alias("__seq")
    )
    n = len(steps)
    depth = F.aggregate(
        "__seq",
        F.lit(0),
        lambda acc, ev: F.when(
            (acc < n) & (ev["e"] == F.element_at(steps_lit, acc + 1)), acc + 1
        ).otherwise(acc),
    )
    return per_user.select(
        F.col("__u").alias(user_col), depth.cast("int").alias("depth")
    )


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """The funnel report: one row per step with ``step_idx`` (1-based),
    ``step``, and ``n_users`` who reached AT LEAST that step in order —
    monotonically non-increasing down the funnel by construction."""
    depths = funnel_depth_per_user(events, steps, user_col, type_col, ts_col)
    agg = depths.agg(
        *[
            F.count(F.when(F.col("depth") >= i + 1, 1)).alias(f"__n{i}")
            for i in range(len(steps))
        ]
    )
    parts = F.array(
        *[
            F.struct(
                F.lit(i + 1).alias("step_idx"),
                F.lit(s).alias("step"),
                F.col(f"__n{i}").cast("long").alias("n_users"),
            )
            for i, s in enumerate(steps)
        ]
    )
    return agg.select(F.explode(parts).alias("__r")).select(
        F.col("__r.step_idx"), F.col("__r.step"), F.col("__r.n_users")
    )


def retention_matrix(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
) -> DataFrame:
    """Cohort retention (the other behavioral-analytics staple): users
    are cohorted by the period of their FIRST event, and each
    ``(cohort_period, period_offset)`` cell counts distinct users from
    that cohort active ``offset`` periods later. Output:
    ``cohort_period (timestamp), period_offset (long), n_users
    (long)`` with offset 0 = the cohort size.

    Shape: one user-keyed aggregate derives each user's cohort (min
    event period), one broadcast-joinable (user, cohort) relation maps
    every event to its offset, and one (cohort, offset) count-distinct
    finishes — the user->cohort relation is the only corpus-keyed
    join, and at 100 TB it is exactly the relation you'd persist
    bucketed by user alongside the event store. ``period`` is any
    ``date_trunc`` unit (week/month/day).
    """
    ev = _spread(events).select(
        F.col(user_col).alias("__u"),
        F.date_trunc(period, F.col(ts_col)).alias("__p"),
    )
    cohorts = ev.groupBy("__u").agg(F.min("__p").alias("__cohort"))
    offset_expr = {
        "day": lambda a, b: F.datediff(a, b),
        "week": lambda a, b: F.floor(F.datediff(a, b) / 7),
        "month": lambda a, b: (F.year(a) - F.year(b)) * 12
        + (F.month(a) - F.month(b)),
    }
    if period not in offset_expr:
        raise ValueError(f"unsupported period {period!r} (day/week/month)")
    off = offset_expr[period]
    joined = ev.join(cohorts, on="__u").select(
        "__u",
        F.col("__cohort").alias("cohort_period"),
        off(F.col("__p"), F.col("__cohort")).cast("long").alias("period_offset"),
    )
    return (
        joined.groupBy("cohort_period", "period_offset")
        .agg(F.count_distinct("__u").alias("n_users"))
        .orderBy("cohort_period", "period_offset")
    )
