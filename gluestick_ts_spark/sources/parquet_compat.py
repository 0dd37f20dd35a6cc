"""Nanosecond-timestamp-compatible parquet reads.

Spark 4 rejects parquet columns with logical type ``TIMESTAMP(NANOS)``
(``PARQUET_TYPE_ILLEGAL``) because ``TimestampType`` is microsecond
precision. Engines that write nanos (pyarrow default for
``datetime64[ns]`` without coercion) are common, so the source layer
degrades gracefully:

1. inspect the footer schema driver-side (pyarrow — no Spark job);
2. if any ``timestamp[ns]`` column exists, read with
   ``spark.sql.legacy.parquet.nanosAsLong`` so the column arrives as a
   raw nanos LongType;
3. convert back with ``timestamp_micros(CAST(c DIV 1000 AS BIGINT))`` —
   integer division, exact for the full int64 range (a double-based
   divide would lose precision past 2^53) and truncating toward
   microseconds exactly like DuckDB/pyarrow do when downcasting ns.

The footer check is cached per path: at scale the cost is one footer
read per table, not per query.

A second flavor hazard: parquet ``timestamp[us]`` WITHOUT a timezone
(``isAdjustedToUTC=false``) arrives as Spark ``TIMESTAMP_NTZ``, which
many builtins reject (``unix_micros``, ``to_utc_timestamp``, ...) —
the same query then works or throws depending on which engine wrote
the file. The source layer normalizes every ``TimestampNTZType``
column to session-TZ ``TimestampType``; the session TZ is pinned UTC
(session.py), so the cast is value-exact and downstream consumers see
ONE timestamp flavor regardless of the writer.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType

__all__ = ["nanos_timestamp_cols", "read_parquet_compat"]

_NANOS_COLS_CACHE: dict[str, tuple[str, ...]] = {}


def nanos_timestamp_cols(path: str) -> tuple[str, ...]:
    """Top-level column names with parquet type ``timestamp[ns]``.

    ``path`` may be a single file or a directory of part files (the
    first part's footer is taken as representative, matching Spark's
    own no-mergeSchema behavior).
    """
    cached = _NANOS_COLS_CACHE.get(path)
    if cached is not None:
        return cached
    target = path
    if os.path.isdir(path):
        parts = sorted(glob.glob(os.path.join(path, "*.parquet")))
        if not parts:
            _NANOS_COLS_CACHE[path] = ()
            return ()
        target = parts[0]
    try:
        import pyarrow.parquet as pq

        schema = pq.read_schema(target)
        cols = tuple(
            f.name
            for f in schema
            if str(f.type).startswith("timestamp[ns")
        )
    except Exception:
        cols = ()
    _NANOS_COLS_CACHE[path] = cols
    return cols


def _normalize_ntz(df: DataFrame) -> DataFrame:
    """Cast every top-level ``TimestampNTZType`` column to session-TZ
    ``TimestampType``.

    Schema inspection is driver-side (no job); with the session TZ
    pinned UTC the cast reinterprets the same wall-clock instant, so
    values are exact. Emitting one flavor here means every consumer
    (windows, as-of joins, ``unix_micros`` sessionization, streaming
    watermarks) is immune to whether the writer set
    ``isAdjustedToUTC``.
    """
    ntz = [f.name for f in df.schema.fields if isinstance(f.dataType, TimestampNTZType)]
    if not ntz:
        return df
    ntz_set = set(ntz)
    return df.select(
        *[
            F.col(c).cast("timestamp").alias(c) if c in ntz_set else F.col(c)
            for c in df.columns
        ]
    )


def read_parquet_compat(spark: SparkSession, path: str) -> DataFrame:
    """``spark.read.parquet`` that tolerates TIMESTAMP(NANOS) columns
    (returned as microsecond ``TimestampType``) and normalizes
    no-timezone ``TIMESTAMP_NTZ`` columns to ``TimestampType``."""
    ns_cols = nanos_timestamp_cols(path)
    if not ns_cols:
        return _normalize_ntz(spark.read.parquet(path))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    ns = set(ns_cols)
    return _normalize_ntz(
        df.select(
            *[
                F.expr(f"timestamp_micros(CAST(`{c}` DIV 1000 AS BIGINT))").alias(c)
                if c in ns
                else F.col(c)
                for c in df.columns
            ]
        )
    )
