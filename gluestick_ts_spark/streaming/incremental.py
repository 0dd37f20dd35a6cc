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

__all__ = ["stream_snapshot_records", "stream_dedup", "stream_windowed_counts"]


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
