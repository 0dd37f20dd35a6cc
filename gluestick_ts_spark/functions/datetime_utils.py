"""Datetime parity helpers.

Parity targets:

- ``localizeDatetime`` (reference ``src/etl-utils.ts:191-212``): cast a
  column to ``Datetime(ms)``; on failure re-parse from string; finally
  cast to ``Datetime(ms, "UTC")``. With the session TZ pinned to UTC
  (see ``session.py``) a Spark ``timestamp`` carries the same meaning.
- ISO-8601 export formatting (``src/singer.ts:63-73``):
  ``strftime("%Y-%m-%dT%H:%M:%S.%fZ")`` — six fractional digits.
- ``parseDates`` read-option fallback chain (``src/reader.ts:111-128``):
  try ``%Y-%m-%d %H:%M:%S%.f`` then ``%Y-%m-%d``.
- ``deepConvertDatetimes`` (``src/singer.ts:193-206``): recursive
  Date -> ISO conversion inside untyped nested values. In Spark, typed
  nested timestamps are formatted by ``to_json``; the recursive helper
  exists for driver-side dict/list blobs only.

All column helpers are pure Column expressions (JVM-side, codegen'd) —
no Python UDFs in any hot path.
"""

from __future__ import annotations

import datetime as _dt
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "localize_datetime",
    "iso8601_expr",
    "ISO8601_SPARK_FORMAT",
    "parse_dates_expr",
    "deep_convert_datetimes",
]

# Six fractional digits + literal Z — matches the reference's "%fZ"
# (singer.ts:67). Spark's date_format pads SSSSSS with zeros.
ISO8601_SPARK_FORMAT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"


def localize_datetime(df: DataFrame, col_name: str) -> Column:
    """UTC timestamp column with string-parse fallback.

    Mirrors ``etl-utils.ts:191-212``: first a plain cast, then (for
    values the cast can't handle) a lenient ``to_timestamp`` of the
    stringified value. ``try_to_timestamp`` keeps per-value failure
    tolerance: unparseable values become NULL instead of failing the
    job (the reference's per-value ``new Date(...)`` behaves the same,
    yielding Invalid Date).
    """
    c = F.col(col_name)
    return F.coalesce(
        c.try_cast("timestamp"),
        F.try_to_timestamp(c.try_cast("string")),
    )


def iso8601_expr(col: Column | str) -> Column:
    """Timestamp -> ``2024-01-02T03:04:05.000000Z`` string (singer.ts:63-73)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, ISO8601_SPARK_FORMAT)


def parse_dates_expr(col: Column | str) -> Column:
    """String -> timestamp with the reference's format fallback chain
    (``reader.ts:111-128``): full datetime (optional fraction) first,
    then bare date. Expressed as coalesce(try_to_timestamp...) so a
    value failing every format maps to NULL, not a job failure."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(
        F.try_to_timestamp(c, F.lit("yyyy-MM-dd HH:mm:ss.SSSSSS")),
        F.try_to_timestamp(c, F.lit("yyyy-MM-dd HH:mm:ss.SSS")),
        F.try_to_timestamp(c, F.lit("yyyy-MM-dd HH:mm:ss")),
        F.try_to_timestamp(c, F.lit("yyyy-MM-dd")),
    )


def deep_convert_datetimes(value: Any) -> Any:
    """Driver-side recursion: datetime/date -> ISO string inside plain
    dict/list blobs (``singer.ts:193-206``)."""
    if isinstance(value, _dt.datetime):
        return value.strftime("%Y-%m-%dT%H:%M:%S.%f") + "Z"
    if isinstance(value, _dt.date):
        return value.isoformat()
    if isinstance(value, dict):
        return {k: deep_convert_datetimes(v) for k, v in value.items()}
    if isinstance(value, (list, tuple)):
        return [deep_convert_datetimes(v) for v in value]
    return value
