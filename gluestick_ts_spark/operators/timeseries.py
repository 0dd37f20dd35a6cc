"""Time-series resampling: bucketed aggregates over a GAPLESS spine.

A raw event stream has no rows for quiet periods, so "events per hour"
silently skips empty hours — poison for charting, anomaly baselines,
and window features. The fix every time-series engine ships (Timescale
``time_bucket_gapfill``, InfluxD ``fill()``, QuestDB ``SAMPLE BY …
FILL``) is: bucket, aggregate, then LEFT-join the aggregate onto a
dense bucket spine and fill the holes.

Spark-first shape, all engine-level:

1. bucket = ``F.window(ts, interval).start`` (tumbling; in-row);
2. ONE map-side-combined aggregate per (key, bucket);
3. the spine comes from each key's (min, max) bucket — a per-key
   2-value aggregate — exploded via ``sequence(min, max, interval)``
   (buckets per key rows, never a driver collect; a global spine via
   ``spine='global'`` crosses every key with the corpus min/max —
   1 tiny 2-value agg broadcast onto the distinct-key relation);
4. fills: ``zero`` (coalesce), ``null`` (leave), ``locf`` — last
   observation carried forward via ``F.last(ignorenulls=True)`` over a
   per-key ordered window (the bucket spine is dense, so one window
   pass settles every gap), and ``linear`` — interpolation between the
   surrounding observations from the SAME locf window pair (previous
   value+bucket, next value+bucket via a mirrored ``F.first`` over the
   following frame), pure in-row arithmetic afterwards.

The per-key windows order by bucket WITHIN a key partition — the same
key-hash shuffle the aggregate already produced; nothing ever sorts
globally.

No reference counterpart (extension op — time-series family beside
sessionization, funnels and rollups).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["time_bucket_expr", "resample_gapfill", "rolling_zscore", "debounce"]

_FILLS = ("null", "zero", "locf", "linear")


def time_bucket_expr(ts_col: str | Column, interval: str) -> Column:
    """Tumbling-window bucket start for ``ts_col`` (e.g. interval
    ``'15 minutes'``, ``'1 hour'``) — in-row, no shuffle."""
    c = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    return F.window(c, interval)["start"]


def resample_gapfill(
    df: DataFrame,
    ts_col: str,
    interval: str,
    aggs: dict[str, Column],
    group_cols: list[str] | None = None,
    fill: str = "zero",
    spine: str = "per_key",
) -> DataFrame:
    """Bucketed aggregate over a dense spine: one row per (key, bucket)
    for EVERY bucket between the key's first and last observation
    (``spine='per_key'``) or the corpus-wide min/max (``'global'``),
    holes filled per ``fill``:

    - ``'null'``: aggregate columns NULL on gap rows;
    - ``'zero'``: zero-filled (counts/sums semantics);
    - ``'locf'``: last observation carried forward (NULL before the
      first observation);
    - ``'linear'``: linear interpolation between the surrounding
      observations (NULL outside them) — aggregate values must be
      numeric.

    ``aggs`` maps output column name → aggregate Column (e.g. ``{"cnt":
    F.count('*'), "amt": F.sum('v')}``). Gap rows carry ``is_gap =
    true``. Output: ``group_cols + [bucket] + list(aggs) + [is_gap]``.
    """
    if fill not in _FILLS:
        raise ValueError(f"resample_gapfill: fill must be one of {_FILLS}")
    if spine not in ("per_key", "global"):
        raise ValueError("resample_gapfill: spine must be 'per_key' or 'global'")
    keys = list(group_cols or [])
    step = F.expr(f"interval {interval}")

    # __obs marks observed buckets explicitly — deriving gap-ness from
    # an aggregate column's NULL-ness would misclassify an observed
    # bucket whose aggregate is legitimately NULL (e.g. sum of all-NULL
    # values)
    agged = (
        df.withColumn("bucket", time_bucket_expr(ts_col, interval))
        .groupBy(*keys, "bucket")
        .agg(
            *[c.alias(name) for name, c in aggs.items()],
            F.first(F.lit(True)).alias("__obs"),
        )
    )

    if spine == "per_key" and keys:
        spans = agged.groupBy(*keys).agg(
            F.min("bucket").alias("__lo"), F.max("bucket").alias("__hi")
        )
    else:
        lo_hi = agged.agg(
            F.min("bucket").alias("__lo"), F.max("bucket").alias("__hi")
        )
        spans = (
            agged.select(*keys).distinct().crossJoin(F.broadcast(lo_hi))
            if keys
            else lo_hi
        )
    spine_df = spans.select(
        *keys,
        F.explode(F.sequence(F.col("__lo"), F.col("__hi"), step)).alias("bucket"),
    )

    out = spine_df.join(agged, on=[*keys, "bucket"], how="left")
    names = list(aggs)
    out = out.withColumn("is_gap", F.col("__obs").isNull()).drop("__obs")

    if fill == "zero":
        out = out.select(
            *keys, "bucket",
            *[F.coalesce(F.col(n), F.lit(0)).alias(n) for n in names],
            "is_gap",
        )
    elif fill == "locf":
        w = (
            Window.partitionBy(*keys).orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        out = out.select(
            *keys, "bucket",
            *[F.last(F.col(n), ignorenulls=True).over(w).alias(n) for n in names],
            "is_gap",
        )
    elif fill == "linear":
        wb = (
            Window.partitionBy(*keys).orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        wf = (
            Window.partitionBy(*keys).orderBy("bucket")
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        filled = []
        pos = F.unix_timestamp("bucket").cast("double")
        for n in names:
            obs = F.when(~F.col("is_gap"), F.struct(F.col(n).alias("v"), pos.alias("t")))
            prev = F.last(obs, ignorenulls=True).over(wb)
            nxt = F.first(obs, ignorenulls=True).over(wf)
            frac = (pos - prev["t"]) / (nxt["t"] - prev["t"])
            filled.append(
                F.when(~F.col("is_gap"), F.col(n))
                .otherwise(
                    F.when(
                        prev.isNotNull() & nxt.isNotNull(),
                        prev["v"] + (nxt["v"] - prev["v"]) * frac,
                    )
                )
                .alias(n)
            )
        out = out.select(*keys, "bucket", *filled, "is_gap")
    else:  # "null"
        out = out.select(*keys, "bucket", *names, "is_gap")
    return out


def rolling_zscore(
    df: DataFrame,
    value_col: str,
    order_col: str,
    group_cols: list[str] | None = None,
    lookback: int = 24,
    threshold: float = 3.0,
    min_periods: int = 8,
) -> DataFrame:
    """Trailing-window anomaly scores: each row's ``value_col`` scored
    against the mean/stddev of the PRECEDING ``lookback`` rows (the
    current row is excluded from its own baseline, so a spike cannot
    mask itself). Appends

    - ``roll_n``    — how many baseline rows the frame held,
    - ``roll_mean`` — baseline mean (NULL until ``min_periods`` rows),
    - ``zscore``    — (value − mean) / sample-stddev (NULL while the
      baseline is short or constant),
    - ``is_anomaly`` — ``|zscore| > threshold`` (false, never NULL, on
      unscorable rows — downstream filters shouldn't trip on warmup).

    Mean and variance derive from EXACT decimal rolling sums (sum,
    sum-of-squares — the ``stats_agg_orders`` trick), so the doubles
    are independent of partition/summation order and bit-comparable
    across engines; values must fit ``decimal(18,4)`` (|v| < 1e14 —
    enforced: an oversized value raises at evaluation time rather than
    silently NULLing itself out of its own baseline).

    ``(group_cols, order_col)`` must be row-unique or the frame is
    nondeterministic. One key-hash shuffle; each key's rows sort
    within their partition — nothing global, the same scale shape as
    the ``resample_gapfill`` fills, and at 100 TB the window state is
    O(lookback) per key. Feed it gapless buckets (``resample_gapfill``
    with ``fill='zero'``) or quiet periods silently vanish from the
    baseline.
    """
    if lookback < 2 or min_periods < 2 or min_periods > lookback:
        raise ValueError(
            "rolling_zscore: need lookback >= min_periods >= 2 (sample "
            f"stddev is undefined below 2), got lookback={lookback} "
            f"min_periods={min_periods}"
        )
    keys = list(group_cols or [])
    w = (
        Window.partitionBy(*keys).orderBy(order_col)
        .rowsBetween(-lookback, -1)
    )
    # decimal overflow would NULL the value out of its own baseline
    # silently (non-ANSI cast); fail loudly at the first oversized row
    # instead of degrading to a no-signal metric. The bound covers the
    # WINDOW SUM, not just the cast: the sum-of-squares aggregate holds
    # decimal(38,8) (30 integer digits), so lookback * v^2 must stay
    # under 1e30 — at large lookbacks that is tighter than the
    # per-value decimal(18,4) range
    bound = min(1e14, (1e30 / lookback) ** 0.5)
    in_range = F.col(value_col).isNull() | (
        F.abs(F.col(value_col).cast("double")) < F.lit(bound)
    )
    guard = F.assert_true(
        in_range,
        F.lit(
            f"rolling_zscore: |{value_col}| >= {bound:.6g} overflows the "
            f"exact decimal rolling sums at lookback={lookback} — "
            "rescale the value first"
        ),
    )
    v = F.when(guard.isNull(), F.col(value_col)).cast("decimal(18,4)")
    n = F.count(v).over(w)
    s = F.sum(v).over(w).cast("double")
    s2 = F.sum(v * v).over(w).cast("double")
    mean = s / n
    var = (s2 - s * s / n) / (n - 1)
    z = (F.col(value_col).cast("double") - mean) / F.sqrt(var)
    scorable = (n >= F.lit(min_periods)) & (var > 0)
    return (
        df.withColumn("roll_n", F.coalesce(n, F.lit(0)).cast("long"))
        .withColumn("roll_mean", F.when(n >= F.lit(min_periods), mean))
        .withColumn("zscore", F.when(scorable, z))
        .withColumn(
            "is_anomaly",
            F.coalesce(
                scorable & (F.abs(z) > F.lit(float(threshold))), F.lit(False)
            ),
        )
    )


def debounce(
    df: DataFrame,
    ts_col: str,
    keys: list[str],
    within: str = "5 minutes",
    tie_cols: list[str] | None = None,
) -> DataFrame:
    """Burst suppression: keep the FIRST event of each burst per key,
    where a burst is a maximal run of events each within ``within`` of
    the PREVIOUS event (the rolling-gap definition — a burst can
    stretch past ``within`` total as long as no internal gap exceeds
    it; the same lag + running-sum trick as gap sessionization, one
    key-hash shuffle). The deduped double-fire / retry-storm cleaner
    every event pipeline needs before counting anything.

    Returns the kept rows plus ``burst_id`` (1-based per key) and
    ``n_suppressed`` (how many followers the kept row absorbed — the
    audit trail; sums to rows-in minus rows-out). ``(keys, ts_col,
    tie_cols)`` must be row-unique for a deterministic keep.
    """
    # interval literal -> exact microseconds via an epoch round-trip
    # (constant-folded; no per-row timestamp arithmetic)
    step = F.unix_micros(
        F.to_timestamp(F.lit("1970-01-01 00:00:00")) + F.expr(f"interval {within}")
    )
    ties = [F.col(c).asc() for c in (tie_cols or [])]
    # NTZ-tolerant: unix_micros demands TIMESTAMP; an NTZ column (the
    # raw-parquet default for some writers) casts via the session TZ,
    # which only shifts every value uniformly — gaps are unaffected
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(*keys).orderBy(F.col(ts_col).asc(), *ties)
    prev = F.lag(ts_us).over(w)
    new_burst = F.when(
        prev.isNull() | (ts_us - prev > step), 1
    ).otherwise(0)
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bursts = df.withColumn(
        "burst_id", F.sum(new_burst).over(wsum).cast("long")
    )
    wb = Window.partitionBy(*keys, "burst_id").orderBy(
        F.col(ts_col).asc(), *ties
    )
    wb_all = wb.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        bursts.withColumn("__rn", F.row_number().over(wb))
        .withColumn(
            "n_suppressed", (F.count(F.lit(1)).over(wb_all) - 1).cast("long")
        )
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
