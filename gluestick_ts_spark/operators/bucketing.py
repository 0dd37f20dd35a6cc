"""Bucketed-table helpers: co-located, shuffle-free joins at scale.

Writing both sides of a recurring big-big join bucketed by the join
key (same bucket count) lets Spark plan a SortMergeJoin with NO
Exchange on either side — the single biggest shuffle saving available
for repeated 100 TB joins. Bucketing in Spark only applies to managed
tables (``saveAsTable``), so these helpers wrap the table API.

Usage pattern::

    write_bucketed(orders,   "orders_b",   ["o_orderkey"], 64)
    write_bucketed(lineitem, "lineitem_b", ["l_orderkey"], 64)
    j = bucketed_join(spark, "lineitem_b", "orders_b",
                      ["l_orderkey"], ["o_orderkey"])
    # j's physical plan: SortMergeJoin with zero Exchange operators

The bucket count should be sized so one bucket of the LARGER table
fits an executor's task comfortably (e.g. 100 TB / 2048 buckets ≈
50 GB per bucket → split further by file within the bucket).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "bucketed_join", "plan_has_shuffle"]


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 64,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Persist ``df`` as a managed bucketed (and optionally
    sorted-within-bucket) table keyed for future co-located joins."""
    if not bucket_cols:
        raise ValueError("bucket_cols must be non-empty")
    writer = df.write.format(fmt).mode(mode).bucketBy(n_buckets, *bucket_cols)
    writer = writer.sortBy(*(sort_cols or bucket_cols))
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    left_on: list[str],
    right_on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two tables bucketed on their join keys. With matching
    bucket counts Catalyst reuses the bucketing as the join
    distribution: no Exchange on either side (assert with
    ``plan_has_shuffle``)."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    cond = None
    for l, r in zip(left_on, right_on):
        clause = left[l] == right[r]
        cond = clause if cond is None else (cond & clause)
    return left.join(right, cond, how)


def plan_has_shuffle(df: DataFrame) -> bool:
    """True if the physical plan contains a shuffle Exchange.
    BroadcastExchange is not a shuffle (no repartitioning of the big
    side) and is ignored."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange" in plan.replace("BroadcastExchange", "")
