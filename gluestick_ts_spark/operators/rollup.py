"""Materialized time-bucket rollups (continuous aggregates).

The TimescaleDB-continuous-aggregate / Druid-rollup feature re-expressed
Spark-first: an event stream's per-bucket aggregates are PERSISTED,
date-partitioned, and kept current by ADDITIVE incremental refresh —
so dashboard-grain queries never re-scan raw history.

Design for 100 TB:

- the store holds only MERGEABLE statistics (``cnt`` + exact DECIMAL
  sums per value column, plus optional DataSketches HLL distinct and
  KLL quantile sketches) — means/averages/estimates are derived at
  read time, so two partial aggregates combine by plain addition /
  sketch union with NO loss and no float-order sensitivity (the
  merged store is bit-identical to a full recompute on the exact
  columns, which is exactly what the driver oracle asserts);
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
    "rollup_bucket_overlap",
    "rollup_heavy_hitters",
    "write_rollup_delta",
    "compact_rollup",
]

_DATE = "__gs_date"
_SUM_DECIMAL = "decimal(28,6)"
_DELTA_META = "rollup_meta.json"
_DELTAS_DIR = "deltas"


def rollup_aggregate(
    df: DataFrame,
    ts_col: str,
    keys: list[str],
    value_cols: list[str],
    bucket: str = "1 hour",
    distinct_cols: list[str] | None = None,
    quantile_cols: list[str] | None = None,
    intersect_cols: list[str] | None = None,
) -> DataFrame:
    """One-pass bucket aggregate in the store's mergeable shape:
    ``bucket_start`` (timestamp), ``keys``, ``cnt`` (long), one exact
    ``sum_<col>`` DECIMAL per value column, per ``distinct_cols``
    entry a ``hll_<col>`` DataSketches HLL sketch (binary), and per
    ``quantile_cols`` entry a ``kll_<col>`` DataSketches KLL floats
    sketch (binary). Map-side combined by Spark's partial
    aggregation; safe to re-merge: sums/counts add, sketches union
    (``hll_union_agg`` / ``kll_merge_agg_double``), so COUNT DISTINCT
    and PERCENTILES — the two dashboard statistics plain additive
    stores can't answer — survive incremental refresh and arbitrary
    re-bucketing at sketch accuracy (HLL ~2% on cardinality; KLL
    ~1.65% normalized RANK error at the default k=200, and EXACT
    whenever a bucket holds ≤ k values). Readers derive
    ``approx_distinct_<col>`` / ``approx_p50_<col>`` /
    ``approx_p95_<col>`` estimates on demand.

    ``intersect_cols`` additionally stores a ``theta_<col>``
    DataSketches Theta sketch per bucket (unioned on re-merge via
    ``theta_union_agg``). Unlike HLL, theta sketches INTERSECT, so a
    reader can answer cross-bucket set questions from the store alone
    — e.g. hour-over-hour returning users — without ever rescanning
    raw history (see ``rollup_bucket_overlap``). Exact below the
    4096-entry nominal threshold, bounded-error estimate above."""
    aggs = (
        [F.count("*").alias("cnt")]
        + [
            F.sum(F.col(c).cast(_SUM_DECIMAL)).alias(f"sum_{c}")
            for c in value_cols
        ]
        + [
            F.hll_sketch_agg(F.col(c)).alias(f"hll_{c}")
            for c in (distinct_cols or [])
        ]
        + [
            F.kll_sketch_agg_double(F.col(c).cast("double")).alias(f"kll_{c}")
            for c in (quantile_cols or [])
        ]
        + [
            F.theta_sketch_agg(F.col(c)).alias(f"theta_{c}")
            for c in (intersect_cols or [])
        ]
    )
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


def _remerge(df: DataFrame, keys: list[str]) -> DataFrame:
    """Re-aggregate a union of mergeable partials: counts and exact
    DECIMAL sums add, HLL sketches union. One map-side-combined pass —
    the merge rule every store layout (additive refresh, delta
    snapshots, compaction) shares."""
    sum_cols = [c for c in df.columns if c.startswith("sum_")]
    hll_cols = [c for c in df.columns if c.startswith("hll_")]
    kll_cols = [c for c in df.columns if c.startswith("kll_")]
    theta_cols = [c for c in df.columns if c.startswith("theta_")]
    return df.groupBy("bucket_start", *keys, _DATE).agg(
        F.sum("cnt").alias("cnt"),
        *[F.sum(c).cast(_SUM_DECIMAL).alias(c) for c in sum_cols],
        *[F.hll_union_agg(c).alias(c) for c in hll_cols],
        *[F.kll_merge_agg_double(c).alias(c) for c in kll_cols],
        *[F.theta_union_agg(c).alias(c) for c in theta_cols],
    )


def _derive_means(df: DataFrame) -> DataFrame:
    for c in [c for c in df.columns if c.startswith("sum_")]:
        df = df.withColumn(
            f"mean_{c[4:]}",
            F.round(F.col(c).cast("double") / F.col("cnt"), 4),
        )
    for c in [c for c in df.columns if c.startswith("hll_")]:
        df = df.withColumn(
            f"approx_distinct_{c[4:]}", F.hll_sketch_estimate(F.col(c))
        )
    for c in [c for c in df.columns if c.startswith("kll_")]:
        df = df.withColumn(
            f"approx_p50_{c[4:]}",
            F.kll_sketch_get_quantile_double(F.col(c), F.lit(0.5)),
        ).withColumn(
            f"approx_p95_{c[4:]}",
            F.kll_sketch_get_quantile_double(F.col(c), F.lit(0.95)),
        )
    return df


def read_rollup(
    spark: SparkSession,
    path: str,
    derive_means: bool = True,
) -> DataFrame:
    """The current rollup; per-value ``mean_<col>`` columns derived
    from the exact sums when ``derive_means`` (sum/cnt at read time —
    the store itself never holds a non-mergeable statistic).

    Layout-aware: a store carrying ``rollup_meta.json`` is the
    DELTA-SNAPSHOT layout (``write_rollup_delta``/``compact_rollup``)
    and is read as base snapshot + unfolded deltas re-aggregated; any
    other store is the plain date-partitioned parquet layout the batch
    ``write_rollup``/``refresh_rollup`` maintain.
    """
    from ..sources.fs import hadoop_path_exists, join_uri

    meta_path = join_uri(path, _DELTA_META)
    # a pointer mid-commit (crash between tmp write and rename) still
    # marks the delta layout — _read_rollup_meta self-heals the rename
    if hadoop_path_exists(spark, meta_path) or hadoop_path_exists(
        spark, meta_path + ".tmp"
    ):
        df = _read_delta_layout(spark, path)
    else:
        df = spark.read.parquet(path).drop(_DATE)
    return _derive_means(df) if derive_means else df


def rollup_heavy_hitters(
    rollup_df: DataFrame,
    keys: list[str],
    threshold_frac: float = 0.01,
) -> DataFrame:
    """Per-bucket heavy hitters FROM THE STORE: for every
    ``bucket_start``, the key combinations whose ``cnt`` exceeds
    ``threshold_frac`` of that bucket's total — the "trending terms
    per hour" question. Because the rollup store (batch-refreshed or
    streaming delta-snapshot via ``stream_rollup``) already holds the
    exact per-(bucket, keys) counts, this is EXACT streaming heavy
    hitters with none of the usual sketch caveats: one tiny per-bucket
    total aggregate over the (already reduced) store + a broadcast
    join back — raw events are never rescanned, and Structured
    Streaming's single-aggregation limit never applies because the
    second aggregate runs on the store at read time.

    Output: ``bucket_start``, ``keys``, ``cnt``, ``bucket_total``,
    ``frac`` (ROUND 6), ordered nowhere (caller sorts).
    """
    if not (0.0 < float(threshold_frac) < 1.0):
        raise ValueError("threshold_frac must be in (0, 1)")
    totals = rollup_df.groupBy("bucket_start").agg(
        F.sum("cnt").alias("bucket_total")
    )
    return (
        rollup_df.join(F.broadcast(totals), on="bucket_start")
        .where(
            F.col("cnt").cast("double")
            > F.lit(float(threshold_frac)) * F.col("bucket_total").cast("double")
        )
        .select(
            "bucket_start",
            *keys,
            "cnt",
            "bucket_total",
            F.round(
                F.col("cnt").cast("double") / F.col("bucket_total").cast("double"),
                6,
            ).alias("frac"),
        )
    )


def rollup_bucket_overlap(
    rollup_df: DataFrame,
    col: str,
    keys: list[str],
    bucket: str = "1 hour",
) -> DataFrame:
    """Cross-bucket distinct intersection FROM THE STORE: per key
    chain, the estimated number of ``col`` ids present in both a
    bucket and the bucket immediately before it (``approx_returning``)
    — e.g. hour-over-hour returning users per event type. Needs the
    store built with ``intersect_cols=[col]``.

    Cost: one lag window over AT MOST one sketch row per (key, bucket)
    + in-row ``theta_intersection`` — raw history is never rescanned;
    the exact formulation would re-shuffle every raw id per adjacent
    bucket pair. ``has_prev`` is false (and ``approx_returning`` NULL)
    where the preceding bucket is absent from the store — a gap is a
    visible discontinuity, never an intersection with stale data.
    """
    from pyspark.sql import Window

    theta = f"theta_{col}"
    if theta not in rollup_df.columns:
        raise ValueError(
            f"rollup store has no '{theta}' sketch column — build it "
            f"with intersect_cols=[{col!r}]"
        )
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy("bucket_start")
    prev_sketch = F.lag(theta).over(w)
    prev_start = F.lag("bucket_start").over(w)
    adjacent = prev_start == F.col("bucket_start") - F.expr(
        f"INTERVAL {bucket}"
    )
    return rollup_df.select(
        "bucket_start",
        *keys,
        F.theta_sketch_estimate(F.col(theta))
        .cast("double")
        .alias(f"approx_distinct_{col}"),
        F.coalesce(adjacent, F.lit(False)).alias("has_prev"),
        F.when(
            F.coalesce(adjacent, F.lit(False)),
            F.theta_sketch_estimate(
                F.theta_intersection(prev_sketch, F.col(theta))
            ).cast("double"),
        ).alias("approx_returning"),
    )


def refresh_rollup(
    batch_df: DataFrame,
    path: str,
    ts_col: str,
    keys: list[str],
    value_cols: list[str],
    bucket: str = "1 hour",
    distinct_cols: list[str] | None = None,
    quantile_cols: list[str] | None = None,
    intersect_cols: list[str] | None = None,
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
    partial = rollup_aggregate(
        batch_df, ts_col, keys, value_cols, bucket, distinct_cols,
        quantile_cols, intersect_cols,
    )
    partial = partial.withColumn(
        _DATE, F.to_date("bucket_start").cast("string")
    )
    if not hadoop_path_exists(spark, path):
        partial.write.partitionBy(_DATE).mode("overwrite").parquet(path)
        return read_rollup(spark, path)

    # batch's affected dates: a tiny driver collect (days, not rows).
    # Round 17: collected from the RAW batch rows via the same window
    # expression (a map-only projection + short-key distinct), not from
    # ``partial`` — reading them off ``partial`` ran the WHOLE batch
    # aggregate (count/sum/HLL/KLL sketches, shuffle included) once for
    # this collect and AGAIN inside ``merged`` below (guide §1.2 step
    # 1: don't compute things twice). Same window expression => the
    # distinct date set is identical by construction — including
    # buckets that span midnight, which is why this is NOT
    # to_date(ts_col).
    dates = [
        r[0]
        for r in batch_df.select(
            F.to_date(F.window(F.col(ts_col), bucket)["start"])
            .cast("string")
            .alias(_DATE)
        )
        .distinct()
        .collect()
    ]
    existing = (
        spark.read.parquet(path)
        .where(F.col(_DATE).isin(dates))  # partition-pruned scan
    )
    merged = _remerge(existing.unionByName(partial), keys)
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


# ---------------------------------------------------------------------------
# Delta-snapshot layout: EXACTLY-ONCE continuous aggregation.
#
# The additive refresh above is idempotent only per offset range WITH a
# committed checkpoint; a replayed micro-batch would re-add its counts.
# The delta layout closes that window structurally:
#
#   <path>/rollup_meta.json          -- the POINTER (single commit point):
#                                       {version, base, folded:{scope: W},
#                                        keys, sum_cols}
#   <path>/base_v<k>/...             -- immutable merged snapshots
#   <path>/deltas/<scope>/<batch>/   -- one partial aggregate per
#                                       micro-batch, date-partitioned
#
# Every micro-batch OVERWRITES its own (scope, batch) delta dir — a
# crash-replayed batch rewrites the same bytes instead of double-adding
# (per-batch writes are idempotent by PATH, no marker protocol needed).
# Readers see meta.base plus every delta with batch > folded[scope] and
# re-aggregate; compaction folds deltas into a NEW base_v<k+1> dir and
# then atomically advances the pointer, so a crash anywhere before the
# pointer write leaves the previous consistent view (orphan dirs are
# garbage, removed best-effort after the next successful commit).
# Single-writer contract like every other store; reads during an
# in-flight batch see the previous batch's view.
# ---------------------------------------------------------------------------


def _read_rollup_meta(spark: SparkSession, path: str) -> dict:
    """Read the pointer; self-heal the tmp-rename crash window. The
    writer's sequence is write-tmp → delete-old → rename-tmp: a crash
    between the last two leaves no meta but a COMPLETE tmp holding the
    newest consistent pointer, so finishing the rename here recovers
    the store instead of failing every read."""
    import json

    from ..sources.fs import (
        hadoop_path_exists,
        join_uri,
        read_text_file,
        rename_path,
    )

    meta_path = join_uri(path, _DELTA_META)
    tmp_path = meta_path + ".tmp"
    if not hadoop_path_exists(spark, meta_path) and hadoop_path_exists(
        spark, tmp_path
    ):
        rename_path(spark, tmp_path, meta_path)
    return json.loads(read_text_file(spark, meta_path))


def _write_rollup_meta(spark: SparkSession, path: str, meta: dict) -> None:
    """Pointer write via tmp + rename — never truncate-in-place: the
    pointer is the store's single commit point, and an in-place
    ``create(overwrite)`` would destroy the previous consistent view
    if the driver died mid-write. Every crash window leaves either
    the old meta, or a complete tmp that ``_read_rollup_meta``
    self-heals into place."""
    import json

    from ..sources.fs import (
        delete_path,
        hadoop_path_exists,
        join_uri,
        rename_path,
        write_text_file,
    )

    meta_path = join_uri(path, _DELTA_META)
    tmp_path = meta_path + ".tmp"
    write_text_file(spark, tmp_path, json.dumps(meta))
    if hadoop_path_exists(spark, meta_path):
        delete_path(spark, meta_path, recursive=False)
    if not rename_path(spark, tmp_path, meta_path):
        raise IOError(f"rollup meta commit failed: {tmp_path} -> {meta_path}")


def _unfolded_delta_dirs(
    spark: SparkSession, path: str, meta: dict
) -> list[tuple[str, int, str]]:
    """(scope, batch_no, dir) for every delta beyond the folded
    watermark — a driver-side listing of scopes x batches (days of
    micro-batches between compactions, never data-sized)."""
    from ..sources.fs import join_uri, list_dir_names

    droot = join_uri(path, _DELTAS_DIR)
    out = []
    for scope in list_dir_names(spark, droot):
        w = int(meta.get("folded", {}).get(scope, -1))
        for b in list_dir_names(spark, join_uri(droot, scope)):
            if b.isdigit() and int(b) > w:
                out.append((scope, int(b), join_uri(droot, scope, b)))
    return out


def _merge_parts(parts: list[DataFrame], keys: list[str]) -> DataFrame:
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    return _remerge(df, keys)


def _read_delta_layout(spark: SparkSession, path: str) -> DataFrame:
    from ..sources.fs import join_uri

    meta = _read_rollup_meta(spark, path)
    keys = meta["keys"]
    parts: list[DataFrame] = []
    if meta.get("base"):
        parts.append(spark.read.parquet(join_uri(path, meta["base"])))
    for _, _, d in _unfolded_delta_dirs(spark, path, meta):
        parts.append(spark.read.parquet(d))
    if not parts:
        raise ValueError(f"rollup delta store at {path} holds no data yet")
    return _merge_parts(parts, keys).drop(_DATE)


def write_rollup_delta(
    batch_df: DataFrame,
    path: str,
    ts_col: str,
    keys: list[str],
    value_cols: list[str],
    scope: str,
    batch_no: int,
    bucket: str = "1 hour",
    distinct_cols: list[str] | None = None,
    quantile_cols: list[str] | None = None,
    intersect_cols: list[str] | None = None,
) -> None:
    """Fold one micro-batch into the delta-snapshot store by writing
    its partial aggregate to the batch's OWN directory (overwrite) —
    cost ∝ batch, and a replay of the same (scope, batch_no) rewrites
    the identical delta instead of double-adding. Seeds the pointer
    file on first use."""
    from ..sources.fs import hadoop_path_exists, join_uri

    spark = batch_df.sparkSession
    if not hadoop_path_exists(spark, join_uri(path, _DELTA_META)):
        _write_rollup_meta(
            spark,
            path,
            {
                "version": 0,
                "base": None,
                "folded": {},
                "keys": list(keys),
                "sum_cols": [f"sum_{c}" for c in value_cols],
            },
        )
    partial = rollup_aggregate(
        batch_df, ts_col, keys, value_cols, bucket, distinct_cols,
        quantile_cols, intersect_cols,
    )
    partial = partial.withColumn(_DATE, F.to_date("bucket_start").cast("string"))
    partial.write.partitionBy(_DATE).mode("overwrite").parquet(
        join_uri(path, _DELTAS_DIR, scope, str(int(batch_no)))
    )


def _sweep_rollup_garbage(spark: SparkSession, path: str, meta: dict) -> None:
    """Delete everything the current pointer can no longer reach:
    base_v* dirs other than ``meta['base']`` and delta dirs at or
    below their scope's folded watermark. Crash-orphaned dirs (a
    previous compaction died after its pointer commit, before its
    delete loop) are exactly this set, so every later compaction
    reclaims them — reads never consult them either way."""
    from ..sources.fs import delete_path, join_uri, list_dir_names

    current = meta.get("base")
    for name in list_dir_names(spark, path):
        if name.startswith("base_v") and name != current:
            delete_path(spark, join_uri(path, name))
    droot = join_uri(path, _DELTAS_DIR)
    folded = meta.get("folded", {})
    for scope in list_dir_names(spark, droot):
        w = int(folded.get(scope, -1))
        for b in list_dir_names(spark, join_uri(droot, scope)):
            if b.isdigit() and int(b) <= w:
                delete_path(spark, join_uri(droot, scope, b))


def compact_rollup(spark: SparkSession, path: str) -> None:
    """Fold every unfolded delta into a new immutable base snapshot and
    advance the pointer. The pointer write is the single commit point:
    a crash before it leaves the previous (consistent) view plus
    orphan dirs; after it, a garbage sweep removes every dir the new
    pointer can no longer reach — INCLUDING orphans a previous
    compaction's crash left behind, since the sweep works from the
    pointer's watermarks, not from this run's delta list. With nothing
    unfolded the call is sweep-only. Run between batches
    (single-writer contract)."""
    from ..sources.fs import join_uri

    meta = _read_rollup_meta(spark, path)
    deltas = _unfolded_delta_dirs(spark, path, meta)
    if not deltas:
        _sweep_rollup_garbage(spark, path, meta)
        return
    parts: list[DataFrame] = []
    old_base = meta.get("base")
    if old_base:
        parts.append(spark.read.parquet(join_uri(path, old_base)))
    parts.extend(spark.read.parquet(d) for _, _, d in deltas)
    merged = _merge_parts(parts, meta["keys"])
    new_base = f"base_v{int(meta['version']) + 1}"
    merged.write.partitionBy(_DATE).mode("overwrite").parquet(
        join_uri(path, new_base)
    )
    folded = dict(meta.get("folded", {}))
    for scope, b, _ in deltas:
        folded[scope] = max(int(folded.get(scope, -1)), b)
    new_meta = {
        **meta,
        "version": int(meta["version"]) + 1,
        "base": new_base,
        "folded": folded,
    }
    _write_rollup_meta(spark, path, new_meta)
    # past the commit point: everything unreachable is garbage
    _sweep_rollup_garbage(spark, path, new_meta)
