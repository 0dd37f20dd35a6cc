"""Structured Streaming variants of the engine's incremental semantics.

The reference is batch-incremental only (snapshot upsert,
``etl-utils.ts:258-355``); these are the streaming-native equivalents
(SURVEY §2.2 Streaming row — stretch surface):

- ``stream_snapshot_records``: ``foreachBatch`` wrapper that applies
  the batch snapshot-upsert to every micro-batch — exactly-once-ish
  incremental state with the same keep-last semantics as batch mode.
- ``stream_dedup``: watermarked ``dropDuplicates`` — late data beyond
  the watermark is dropped, state is bounded (the scalable streaming
  dedup story).
- ``stream_windowed_counts``: tumbling-window aggregation with
  watermark for late data — the canonical streaming rollup.

All built on public Structured Streaming APIs; at scale these run with
checkpointing to durable storage and the same partitioning rules as
the batch operators.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import DataStreamWriter

from ..operators.snapshot import snapshot_records

__all__ = [
    "stream_snapshot_records",
    "stream_dedup",
    "stream_windowed_counts",
    "stream_sessionize",
    "stream_dedup_incremental",
    "stream_corpus_profile",
]


def stream_snapshot_records(
    stream_df: DataFrame,
    stream: str,
    snapshot_dir: str,
    pk: str | list[str] = "id",
    checkpoint_dir: str | None = None,
    **snapshot_kwargs: Any,
) -> DataStreamWriter:
    """Continuously upsert a stream into the persisted snapshot.

    Each micro-batch runs the batch ``snapshot_records`` merge (union +
    window keep-last + atomic swap), so batch and streaming state are
    byte-identical for the same inputs. Caller starts the returned
    writer (``.start()``/``.trigger(availableNow=True)``).
    """

    def _upsert(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        snapshot_records(batch_df, stream, snapshot_dir, pk=pk, **snapshot_kwargs)

    writer = stream_df.writeStream.foreachBatch(_upsert).outputMode("update")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer


def stream_dedup_incremental(
    stream_df: DataFrame,
    store_dir: str,
    emit,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.7,
    checkpoint_dir: str | None = None,
    bucketed: bool = False,
    num_buckets: int = 64,
    **minhash_kwargs: Any,
) -> DataStreamWriter:
    """Streaming fuzzy dedup against a durable signature store: each
    micro-batch is deduped with ``dedup_minhash_incremental`` (batch-
    internal exact-Jaccard + cross-store signature-estimate), the
    survivors are handed to ``emit(survivors_df, batch_id)``, and their
    signatures are appended to ``<store_dir>/signatures.parquet`` so
    later batches — and later restarts — never re-accept a duplicate.

    The store grows by exactly the accepted rows (~0.5 KB each at 64
    hashes); corpus text is never re-read. With a ``checkpoint_dir``
    the stream restarts from its offset and the already-appended
    signatures make reprocessing idempotent (a replayed batch dedups
    against its own prior acceptances). Caller starts the returned
    writer.

    ``store_dir`` may live on ANY Spark-readable filesystem (file:/,
    hdfs:/, s3a:/, ...): existence is checked through the Hadoop
    FileSystem API, never ``os.path`` (which only sees the driver's
    local disk and would silently dedup every batch against an empty
    store on a remote URI). Append-atomicity contract: micro-batches
    within one stream are serialized by foreachBatch, and each parquet
    append commits part files through the output committer (in-flight
    files stay under ``_temporary``), so the read-then-append cycle is
    safe for a SINGLE writer stream per store; concurrent writer
    streams sharing one store are not supported — fan unioned sources
    into one stream instead.

    ``bucketed=True`` keeps the store in the band-hash-bucketed layout
    (``write_signature_store``): each micro-batch's candidate join then
    partition-prunes the store scan to the batch's own buckets — the
    100 TB configuration, where the store itself is large and a full
    re-shuffle per batch is the dominant cost. The flat
    ``signatures.parquet`` layout remains the default for small stores.
    """
    from ..operators.dedup import (
        append_signature_store,
        dedup_minhash_incremental,
        dedup_minhash_incremental_bucketed,
        minhash_signatures,
        write_signature_store,
    )
    from ..sources.fs import hadoop_path_exists, join_uri

    sig_path = join_uri(store_dir, "signatures.parquet")
    meta_path = join_uri(store_dir, "store_meta.json")

    def _process_bucketed(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        num_hashes = minhash_kwargs.get("num_hashes", 64)
        if not hadoop_path_exists(spark, meta_path):
            # first batch: freeze the banding params into an empty store
            write_signature_store(
                minhash_signatures(batch_df.limit(0), id_col, text_col, num_hashes),
                store_dir,
                num_bands=minhash_kwargs.get("num_bands", 16),
                num_buckets=num_buckets,
                sig_len=num_hashes,
            )
        survivors, sigs = dedup_minhash_incremental_bucketed(
            batch_df,
            store_dir,
            id_col,
            text_col,
            num_hashes=num_hashes,
            shingle_n=minhash_kwargs.get("shingle_n", 3),
            threshold=threshold,
            seed=minhash_kwargs.get("seed", 42),
        )
        # EMIT BEFORE APPEND (same ordering contract as the flat-store
        # path): appending first would make a crash-replayed batch dedup
        # against its own signatures and emit nothing — the survivors
        # would be lost from the sink while living in the store. Both
        # relations are pinned first so neither recomputes against the
        # mutated store.
        survivors = survivors.localCheckpoint(eager=True)
        sigs = sigs.localCheckpoint(eager=True)
        emit(survivors, batch_id)
        append_signature_store(sigs, store_dir)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        if hadoop_path_exists(spark, sig_path):
            store = spark.read.parquet(sig_path)
        else:
            store = minhash_signatures(batch_df.limit(0), id_col, text_col)
        survivors, sigs = dedup_minhash_incremental(
            batch_df, store, id_col, text_col, threshold=threshold, **minhash_kwargs
        )
        # Survivors must be fully materialized BEFORE the store append
        # changes what the next read of sig_path returns.
        survivors = survivors.localCheckpoint(eager=True)
        sigs = sigs.localCheckpoint(eager=True)
        emit(survivors, batch_id)
        sigs.write.mode("append").parquet(sig_path)

    if bucketed:
        _process = _process_bucketed

    writer = stream_df.writeStream.foreachBatch(_process).outputMode("update")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer


def stream_dedup(
    stream_df: DataFrame,
    keys: list[str],
    event_time_col: str,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup with bounded state: rows whose event time
    is older than the watermark are no longer tracked (late duplicates
    beyond it pass through — the documented tradeoff that keeps state
    finite at 100 TB/day)."""
    return stream_df.withWatermark(event_time_col, watermark).dropDuplicates(
        keys + [event_time_col]
    )


def stream_windowed_counts(
    stream_df: DataFrame,
    event_time_col: str,
    window_duration: str = "1 hour",
    watermark: str = "30 minutes",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Tumbling-window counts with late-data handling via watermark."""
    groups = [F.window(F.col(event_time_col), window_duration)] + [
        F.col(c) for c in (group_cols or [])
    ]
    return (
        stream_df.withWatermark(event_time_col, watermark)
        .groupBy(*groups)
        .agg(F.count("*").alias("cnt"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *[F.col(c) for c in (group_cols or [])],
            "cnt",
        )
    )


def stream_sessionize(
    stream_df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Custom stateful streaming operator: session aggregation with an
    inactivity gap, built on ``applyInPandasWithState``.

    Emits one row per CLOSED session ``(user, session_start,
    session_end, n_events)``. A session closes when a later event for
    the same user arrives more than ``gap_seconds`` after the session's
    last event, or when the event-time watermark passes the session's
    timeout (state times out -> trailing session flushes). State per
    user is three longs — bounded regardless of stream volume; the
    shuffle key is the user, so session state never crosses executors.

    This is the streaming-native analogue of the batch
    ``sessionize_events`` query (lag + running-sum session ids).
    """
    import pandas as pd  # local import: only the executor needs it

    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType(), True),
            T.StructField("session_start", T.TimestampType(), True),
            T.StructField("session_end", T.TimestampType(), True),
            T.StructField("n_events", T.LongType(), True),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("start_us", T.LongType(), True),
            T.StructField("end_us", T.LongType(), True),
            T.StructField("cnt", T.LongType(), True),
        ]
    )
    gap_us = gap_seconds * 1_000_000

    def _emit(key, sessions):
        return pd.DataFrame(
            {
                "user_id": [key] * len(sessions),
                "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in sessions],
                "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in sessions],
                "n_events": [c for _, _, c in sessions],
            }
        )

    def _fn(key, pdf_iter, state):
        user = key[0]
        if state.hasTimedOut:
            s, e, c = state.get
            state.remove()
            yield _emit(user, [(s, e, c)])
            return
        if state.exists:
            s, e, c = state.get
        else:
            s = e = None
            c = 0
        times: list[int] = []
        for pdf in pdf_iter:
            col = pd.to_datetime(pdf[ts_col])
            times.extend(int(v.value) // 1000 for v in col)  # ns -> us
        times.sort()
        closed = []
        for t in times:
            if s is None:
                s = e = t
                c = 1
            elif t - e > gap_us:
                closed.append((s, e, c))
                s = e = t
                c = 1
            else:
                e = t
                c += 1
        if s is not None:
            state.update((s, e, c))
            # event-time timeout: fires once the watermark passes
            # session_end + gap (ms epoch).
            state.setTimeoutTimestamp(e // 1000 + gap_seconds * 1000)
        if closed:
            yield _emit(user, closed)

    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.col(user_col))
        .applyInPandasWithState(
            _fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf="EventTimeTimeout",
        )
    )


def stream_corpus_profile(
    stream_df: DataFrame,
    event_time_col: str,
    text_col: str = "text",
    window_duration: str = "1 hour",
    watermark: str = "30 minutes",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Streaming data-quality monitor: the ``corpus_profile``
    dataset-card aggregate per event-time window (and optional slice
    columns) — volumes, mean quality score, Gopher pass rate, and an
    APPROXIMATE exact-dup rate — so an ingest pipeline watches its
    quality drift live instead of re-profiling batches after the fact.

    Same one-pass shape as the batch profile (map-only quality/
    fingerprint projection + one windowed aggregation, watermark-
    bounded state). The only semantic delta vs batch: distinct
    fingerprints use ``approx_count_distinct`` (exact COUNT DISTINCT
    is unsupported in streaming aggregations), so ``exact_dup_rate``
    carries HLL error (~2%) — documented, and acceptable for a
    monitoring signal.
    """
    from ..functions.text import (
        fingerprint_expr,
        gopher_quality_flags,
        quality_score_expr,
        word_count_expr,
    )

    pre = stream_df.withWatermark(event_time_col, watermark).select(
        F.col(event_time_col),
        *[F.col(c) for c in (group_cols or [])],
        word_count_expr(text_col).cast("long").alias("__tok"),
        quality_score_expr(text_col).alias("__q"),
        gopher_quality_flags(text_col).getField("passes").cast("int").alias("__gp"),
        fingerprint_expr(text_col).alias("__fp"),
    )
    groups = [F.window(F.col(event_time_col), window_duration)] + [
        F.col(c) for c in (group_cols or [])
    ]
    return (
        pre.groupBy(*groups)
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("__tok").alias("n_tokens"),
            F.round(F.avg("__q"), 4).alias("quality_mean"),
            F.round(F.avg("__gp"), 4).alias("gopher_pass_rate"),
            F.round(
                1.0
                - F.approx_count_distinct("__fp").cast("double") / F.count("*"),
                4,
            ).alias("approx_dup_rate"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *[F.col(c) for c in (group_cols or [])],
            "n_docs",
            "n_tokens",
            "quality_mean",
            "gopher_pass_rate",
            "approx_dup_rate",
        )
    )
