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

__all__ = ["funnel_counts", "funnel_depth_per_user"]


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
