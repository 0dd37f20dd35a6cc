"""Materialized time-bucket rollups (continuous aggregates).

The TimescaleDB-continuous-aggregate / Druid-rollup feature re-expressed
Spark-first: an event stream's per-bucket aggregates are PERSISTED,
date-partitioned, and kept current by ADDITIVE incremental refresh —
so dashboard-grain queries never re-scan raw history.

Design for 100 TB:

- the store holds only MERGEABLE statistics (``cnt`` + exact DECIMAL
  sums per value column) — means/averages are derived at read time, so
  two partial aggregates combine by plain addition with NO loss and no
  float-order sensitivity (the merged store is bit-identical to a full
  recompute, which is exactly what the driver oracle asserts);
- the store is partitioned by the bucket's DATE: a refresh batch names
  its affected dates (a tiny driver collect), reads ONLY those
  partitions (pruned scan), merges additively (one shuffle over
  batch + affected-partition data), and rewrites ONLY those partitions
  via dynamic partition overwrite — cost ∝ batch, never ∝ history;
- paths resolve through the Hadoop FS API (any Spark-writable scheme).

No reference counterpart (extension op; the reference has no
aggregation at all — SURVEY §2.2 Aggregations row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.fs import hadoop_path_exists

__all__ = [
    "rollup_aggregate",
    "write_rollup",
    "refresh_rollup",
    "read_rollup",
]

_DATE = "__gs_date"
_SUM_DECIMAL = "decimal(28,6)"


def rollup_aggregate(
    df: DataFrame,
    ts_col: str,
    keys: list[str],
    value_cols: list[str],
    bucket: str = "1 hour",
) -> DataFrame:
    """One-pass bucket aggregate in the store's mergeable shape:
    ``bucket_start`` (timestamp), ``keys``, ``cnt`` (long), and one
    exact ``sum_<col>`` DECIMAL per value column. Map-side combined by
    Spark's partial aggregation; safe to re-merge additively."""
    aggs = [F.count("*").alias("cnt")] + [
        F.sum(F.col(c).cast(_SUM_DECIMAL)).alias(f"sum_{c}") for c in value_cols
    ]
    return (
        df.groupBy(
            F.window(F.col(ts_col), bucket)["start"].alias("bucket_start"),
            *[F.col(k) for k in keys],
        )
        .agg(*aggs)
    )


def write_rollup(rollup_df: DataFrame, path: str) -> None:
    """Persist a rollup date-partitioned (partition column =
    ``to_date(bucket_start)``), so refreshes and time-sliced reads
    prune to the dates they touch."""
    (
        rollup_df.withColumn(_DATE, F.to_date("bucket_start").cast("string"))
        .write.partitionBy(_DATE)
        .mode("overwrite")
        .parquet(path)
    )


def read_rollup(
    spark: SparkSession,
    path: str,
    derive_means: bool = True,
) -> DataFrame:
    """The current rollup; per-value ``mean_<col>`` columns derived
    from the exact sums when ``derive_means`` (sum/cnt at read time —
    the store itself never holds a non-mergeable statistic)."""
    df = spark.read.parquet(path).drop(_DATE)
    if derive_means:
        for c in [c for c in df.columns if c.startswith("sum_")]:
            df = df.withColumn(
                f"mean_{c[4:]}",
                F.round(F.col(c).cast("double") / F.col("cnt"), 4),
            )
    return df


def refresh_rollup(
    batch_df: DataFrame,
    path: str,
    ts_col: str,
    keys: list[str],
    value_cols: list[str],
    bucket: str = "1 hour",
) -> DataFrame:
    """Incrementally fold a new batch into the persisted rollup:
    aggregate the batch (cost ∝ batch), read ONLY the store partitions
    for the batch's dates, combine ADDITIVELY (sum of counts, sum of
    exact sums — merged result equals a full recompute exactly), and
    rewrite only those partitions. Returns the post-refresh rollup.

    The spark.sql.sources.partitionOverwriteMode=dynamic setting is
    applied for the write and restored after, so only the merged dates'
    directories are replaced.
    """
    spark = batch_df.sparkSession
    partial = rollup_aggregate(batch_df, ts_col, keys, value_cols, bucket)
    partial = partial.withColumn(
        _DATE, F.to_date("bucket_start").cast("string")
    )
    if not hadoop_path_exists(spark, path):
        partial.write.partitionBy(_DATE).mode("overwrite").parquet(path)
        return read_rollup(spark, path)

    # batch's affected dates: a tiny driver collect (days, not rows)
    dates = [r[0] for r in partial.select(_DATE).distinct().collect()]
    existing = (
        spark.read.parquet(path)
        .where(F.col(_DATE).isin(dates))  # partition-pruned scan
    )
    sum_cols = [c for c in partial.columns if c.startswith("sum_")]
    merged = (
        existing.unionByName(partial)
        .groupBy("bucket_start", *keys, _DATE)
        .agg(
            F.sum("cnt").alias("cnt"),
            *[F.sum(c).cast(_SUM_DECIMAL).alias(c) for c in sum_cols],
        )
    )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        # localCheckpoint: the merged plan READS the same partitions the
        # overwrite replaces — pin it before mutating the store
        merged.localCheckpoint(eager=True).write.partitionBy(_DATE).mode(
            "overwrite"
        ).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return read_rollup(spark, path)
