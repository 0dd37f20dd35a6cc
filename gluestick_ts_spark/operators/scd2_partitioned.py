"""Bucket-partitioned SCD Type 2 history: merge AND rewrite ∝ batch.

The flat SCD2 store (``scd2.py``) already confines the merge SHUFFLE to
the batch's keys (pk anti-join bypass), but its atomic swap still
rewrites the entire history file every upsert — at 100 TB the closed-
history mass dominates and is rewritten per batch. This variant keeps
the exact merge algebra (``_scd2_merge`` is shared, not reimplemented)
while making each upsert TOUCH only the data it must — the
``snapshot_partitioned.py`` pattern applied to the history store:

1. history is stored partitioned by ``bucket = pmod(xxhash64(pk),
   n_buckets)`` (directory partition column → partition pruning).
   A key's ENTIRE version chain lives in one bucket, so a batch can
   never need rows outside the buckets its keys hash to — late data,
   mid-timeline splices, and collapse all stay bucket-local;
2. an incoming batch names its affected buckets (distinct over at most
   ``n_buckets`` ints — a tiny driver collect);
3. only those partitions are READ (pruned scan) and merged — touched
   keys rebuild their timeline, same-bucket untouched keys ride the
   merge's own anti-join bypass unchanged;
4. only those partitions are REWRITTEN via dynamic partition
   overwrite — untouched buckets' files are never opened.

Equivalence with the flat store is by construction (same merge over a
pruned-but-sufficient history slice, since bucket is a pure function
of pk) and pinned by tests replaying identical batch sequences into
both layouts, plus an IO test asserting untouched buckets' files stay
byte-identical across an upsert.

No reference counterpart (extension op — the scale layout for
``scd2_upsert``, as ``snapshot_partitioned.py`` is for
``snapshot_records``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.fs import hadoop_path_exists, join_uri
from .snapshot_partitioned import (
    _BUCKET,
    _bucket_expr,
    _resolve_buckets,
    write_store_buckets,
)
from .scd2 import _row_hash, _scd2_cols, _scd2_merge

__all__ = ["scd2_upsert_partitioned", "read_partitioned_scd2"]


def _store_path(stream: str, snapshot_dir: str) -> str:
    return join_uri(snapshot_dir, f"{stream}.scd2.bucketed.parquet")


def read_partitioned_scd2(
    spark: SparkSession, stream: str, snapshot_dir: str
) -> DataFrame | None:
    """The full version history (bucket column dropped), or None before
    the first upsert."""
    path = _store_path(stream, snapshot_dir)
    if not hadoop_path_exists(spark, path):
        return None
    return spark.read.parquet(path).drop(_BUCKET)


def scd2_upsert_partitioned(
    batch: DataFrame,
    stream: str,
    snapshot_dir: str,
    pk: str | list[str] = "id",
    eff_ts: str | None = None,
    track_cols: list[str] | None = None,
    n_buckets: int | None = None,
) -> DataFrame:
    """Merge a batch into the bucket-partitioned SCD2 history store and
    return the full post-merge history.

    Semantics are identical to ``scd2_upsert`` (same merge plan, same
    Type-1 carry rules for untracked columns, same replay idempotency);
    the store layout bounds per-upsert IO by the batch's bucket fan-out
    instead of history size. ``n_buckets`` applies at store CREATION
    only (default: auto-sized from the seed batch, ~500k rows/bucket)
    and is frozen into the store's sidecar meta — size it so a bucket
    is a few GB at the TARGET history volume; later upserts use the
    frozen value and refuse a conflicting explicit one.
    """
    pks = [pk] if isinstance(pk, str) else list(pk)
    if eff_ts is None:
        raise ValueError(
            "scd2_upsert_partitioned: eff_ts is required (no wall-clock reads)"
        )
    ts_col, ts_name, attrs, carry = _scd2_cols(batch, pks, eff_ts, track_cols)
    spark = batch.sparkSession
    path = _store_path(stream, snapshot_dir)
    n_buckets = _resolve_buckets(spark, path, n_buckets, batch)

    new_versions = batch.select(
        *pks,
        *attrs,
        *carry,
        ts_col.cast("timestamp").alias("valid_from"),
        _row_hash(attrs).alias("row_hash"),
        F.lit(1).alias("__src"),
    )

    if not hadoop_path_exists(spark, path):
        first = _scd2_merge(None, new_versions, pks, attrs, carry).withColumn(
            _BUCKET, _bucket_expr(pks, n_buckets)
        )
        # ~1 file/bucket seed layout (the dedup stores' rationale):
        # upsert reads open bucket-count files, not tasks x buckets
        first.repartition(n_buckets, _BUCKET).write.partitionBy(_BUCKET).mode(
            "overwrite"
        ).parquet(path)
        write_store_buckets(spark, path, n_buckets)
        return read_partitioned_scd2(spark, stream, snapshot_dir)

    store_cols = set(spark.read.parquet(path).schema.names)
    if any(c not in store_cols for c in carry):
        # schema widening (a NEW Type-1 column): a bucket-pruned
        # rewrite would leave mixed-schema buckets behind, so untouched
        # buckets' readers would miss the column. Pay one full rewrite
        # for the migration — rare by nature — and stay uniform.
        hist_full = spark.read.parquet(path).drop(_BUCKET)
        merged = _scd2_merge(hist_full, new_versions, pks, attrs, carry).withColumn(
            _BUCKET, _bucket_expr(pks, n_buckets)
        ).localCheckpoint(eager=True)
        merged.write.partitionBy(_BUCKET).mode("overwrite").parquet(path)
        # the static overwrite deleted the whole store dir, sidecar
        # included — re-freeze the (unchanged) bucket count
        write_store_buckets(spark, path, n_buckets)
        return read_partitioned_scd2(spark, stream, snapshot_dir)

    # Affected buckets: ≤ n_buckets ints — the one driver-side collect.
    buckets = [
        r[0]
        for r in new_versions.select(
            _bucket_expr(pks, n_buckets).alias(_BUCKET)
        )
        .distinct()
        .collect()
    ]
    hist = (
        spark.read.parquet(path)
        # partition-pruned scan: only the batch's buckets are read
        .where(F.col(_BUCKET).isin(buckets))
        .drop(_BUCKET)
    )
    merged = _scd2_merge(hist, new_versions, pks, attrs, carry).withColumn(
        _BUCKET, _bucket_expr(pks, n_buckets)
    )
    # Spark refuses to overwrite a path its plan reads; materialize the
    # (bucket-slice-sized) merge to break lineage before the rewrite.
    merged = merged.localCheckpoint(eager=True)

    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        # dynamic mode: only partitions present in `merged` (= the
        # affected buckets) are replaced; all others are untouched.
        merged.write.partitionBy(_BUCKET).mode("overwrite").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return read_partitioned_scd2(spark, stream, snapshot_dir)
