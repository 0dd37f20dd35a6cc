"""As-of (point-in-time) join — an operator Spark lacks natively.

For each left row, attach the most recent right row with
``right.time <= left.time`` (direction="backward"; "forward" takes the
earliest right row at-or-after) within the same key group.

Spark-first implementation (SURVEY §2.2 joins row): a **union + window**
composition, not a pandas UDF —

1. tag both sides, union on (key, time) with right's payload columns
   nulled on left rows;
2. one window per key ordered by (time, side): ``last(payload,
   ignorenulls=True)`` carries the latest right payload forward;
3. keep left rows.

Cost: ONE shuffle on the key (both inputs co-partitioned by the same
window), no join explosion, no per-row Python. This is the classic
scalable as-of pattern; a merge-join variant via bucketed tables would
remove even that shuffle at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_time: str,
    right_time: str,
    direction: str = "backward",
    strict: bool = False,
    suffix: str = "_right",
) -> DataFrame:
    """Point-in-time join; returns all left columns plus right's
    payload columns (renamed with ``suffix`` on collision).

    ``strict=True`` uses ``<`` instead of ``<=`` (right row must be
    strictly earlier/later). Right-side ties at the same timestamp are
    broken deterministically by the window order (later-sorted wins);
    pre-deduplicate the right side per (key, time) for fully defined
    semantics.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    payload = [c for c in right.columns if c not in (right_on, right_time)]
    renamed = {c: (c + suffix if c in left.columns else c) for c in payload}

    key, time = "__gs_key", "__gs_time"
    l_tagged = left.select(
        F.col(left_on).alias(key),
        F.col(left_time).alias(time),
        F.lit(1).alias("__gs_is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__gs_lrow"),
        F.lit(None).cast(
            right.select(F.struct(*[F.col(c) for c in payload]).alias("s")).schema["s"].dataType
        ).alias("__gs_rrow"),
    )
    r_tagged = right.select(
        F.col(right_on).alias(key),
        F.col(right_time).alias(time),
        F.lit(0).alias("__gs_is_left"),
        F.lit(None).cast(
            left.select(F.struct(*[F.col(c) for c in left.columns]).alias("s")).schema["s"].dataType
        ).alias("__gs_lrow"),
        F.struct(*[F.col(c) for c in payload]).alias("__gs_rrow"),
    )
    unioned = l_tagged.unionByName(r_tagged)

    # At equal timestamps a right row is eligible iff non-strict: sort
    # right rows (is_left=0) before left rows and include the current
    # row in the frame; for strict, sort them after and stop the frame
    # one row short so equal-time right rows fall outside it.
    side_order = F.col("__gs_is_left").asc() if not strict else F.col("__gs_is_left").desc()
    time_order = F.col(time).asc() if direction == "backward" else F.col(time).desc()
    w = (
        Window.partitionBy(key)
        .orderBy(time_order, side_order)
        .rowsBetween(Window.unboundedPreceding, -1 if strict else 0)
    )

    matched = unioned.withColumn(
        "__gs_match", F.last("__gs_rrow", ignorenulls=True).over(w)
    ).where(F.col("__gs_is_left") == 1)

    out_cols = [F.col(f"__gs_lrow.{c}").alias(c) for c in left.columns] + [
        F.col(f"__gs_match.{c}").alias(renamed[c]) for c in payload
    ]
    return matched.select(*out_cols)
