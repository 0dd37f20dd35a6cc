"""Stream discovery + typed ingest — the engine's source facade.

Parity target: the reference ``Reader`` class (``src/reader.ts``):

- ``readDirectories`` (``reader.ts:203-235``): scan the input dir for
  ``*.csv`` / ``*.parquet``; stream name = basename minus extension,
  truncated at the first ``-`` (``users-20240101.csv`` -> ``users``);
  the first file seen per stream wins.
- ``get`` (``reader.ts:57-135``): read CSV (quote char ``"``, optional
  catalog dtypes, ``parseDates`` fallback chain) or Parquet (optional
  catalog casts). Errors log and return None.
- ``getPk`` (``reader.ts:162-201``): PKs from parquet footer KV
  metadata ``key_properties`` (JSON), else catalog empty-breadcrumb
  ``table-key-properties``.
- ``getMetadata`` (``reader.ts:141-160``): parquet footer KV metadata —
  stubbed in the reference (nodejs-polars can't reach the footer); real
  here via pyarrow.

Spark-first: ``get`` returns a *lazy* DataFrame. For CSV the catalog
schema is applied as a read schema (schema-on-read: no post-cast pass,
and the scan only decodes requested columns); for Parquet catalog casts
compile into a single ``select`` so Catalyst sees one projection.
Discovery is driver-side listing — cheap metadata work, no Spark job.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import Catalog
from ..functions.datetime_utils import parse_dates_expr
from .parquet_compat import read_parquet_compat

__all__ = ["Reader"]

logger = logging.getLogger(__name__)

# .csv/.parquet mirror the reference (reader.ts:214-219); .jsonl/.json
# are engine extensions (Spark's native JSON source).
_SUPPORTED_EXTS = (".csv", ".parquet", ".jsonl", ".json")


def _stream_name(filename: str) -> str:
    """Basename minus extension, truncated at the first ``-``
    (``reader.ts:221-232``)."""
    base = os.path.basename(filename)
    stem, _ext = os.path.splitext(base)
    return stem.split("-", 1)[0]


class Reader:
    """Discover tap-output streams and read them as typed DataFrames."""

    def __init__(
        self,
        spark: SparkSession,
        input_dir: str = "sync-output",
        root_dir: str = ".",
    ) -> None:
        self.spark = spark
        self.input_dir = input_dir
        self.root_dir = root_dir
        self.input_files: dict[str, str] = self._read_directories()
        self._catalog: Catalog | None = None
        self._catalog_loaded = False

    def __repr__(self) -> str:  # reader.ts:44-49 prints the stream map
        return f"Reader(streams={sorted(self.input_files)})"

    # -- discovery ---------------------------------------------------------

    def _read_directories(self) -> dict[str, str]:
        """First file per stream wins (``reader.ts:203-235``)."""
        streams: dict[str, str] = {}
        if not os.path.isdir(self.input_dir):
            return streams
        for entry in sorted(os.listdir(self.input_dir)):
            if not entry.lower().endswith(_SUPPORTED_EXTS):
                continue
            name = _stream_name(entry)
            if name not in streams:
                streams[name] = os.path.join(self.input_dir, entry)
        return streams

    @property
    def streams(self) -> list[str]:
        return sorted(self.input_files)

    def keys(self) -> list[str]:
        """Reference-named alias of the ``streams`` property
        (``reader.ts:43`` — the examples iterate ``input.keys()``)."""
        return self.streams

    # -- catalog -----------------------------------------------------------

    def read_catalog(self) -> Catalog | None:
        """Lazy-load ``<root_dir>/catalog.json`` (``reader.ts:237-251``)."""
        if not self._catalog_loaded:
            self._catalog = Catalog.load(self.root_dir)
            self._catalog_loaded = True
        return self._catalog

    # -- ingest ------------------------------------------------------------

    def get(
        self,
        stream: str,
        catalog_types: bool = False,
        parse_dates: list[str] | None = None,
        chunk_size: int | None = None,
        **reader_options: Any,
    ) -> DataFrame | None:
        """Read one stream as a DataFrame (``reader.ts:57-135``).

        Returns None (with a logged error) when the stream is unknown or
        the read fails — matching the reference's error contract
        (``reader.ts:87-90, 131-134``).

        ``chunk_size`` is accepted for reference parity
        (``reader.ts:60-62``: accepted and warned about, never
        implemented) and likewise has no effect here — Spark's input
        partitioning (``spark.sql.files.maxPartitionBytes``) subsumes
        driver-side chunked reads, so the kwarg only logs the same
        warning.
        """
        if chunk_size is not None:
            logger.warning(
                "chunk_size is not implemented (parity with reader.ts:60-62); "
                "Spark input partitioning subsumes chunked reads"
            )
        path = self.input_files.get(stream)
        if path is None:
            logger.error("Stream %s not found in %s", stream, self.input_dir)
            return None
        try:
            lower = path.lower()
            if lower.endswith(".parquet"):
                df = self._get_parquet(stream, path, catalog_types)
            elif lower.endswith((".jsonl", ".json")):
                df = self._get_json(stream, path, catalog_types)
            else:
                df = self._get_csv(stream, path, catalog_types, reader_options)
            if parse_dates:
                # One select for all date columns — no withColumn loop.
                exprs = [
                    parse_dates_expr(c).alias(c) if c in parse_dates else F.col(c)
                    for c in df.columns
                ]
                df = df.select(*exprs)
            return df
        except Exception:
            logger.exception("Failed to read stream %s from %s", stream, path)
            return None

    def _get_parquet(self, stream: str, path: str, catalog_types: bool) -> DataFrame:
        df = read_parquet_compat(self.spark, path)
        if not catalog_types:
            return df
        return self._apply_catalog_casts(df, stream)

    def _apply_catalog_casts(self, df: DataFrame, stream: str) -> DataFrame:
        catalog = self.read_catalog()
        target = catalog.struct_type(stream) if catalog else None
        if target is None:
            return df
        # Per-column cast with failure tolerance (reader.ts:67-84): a cast
        # to an unknown/incompatible type keeps the original column. All
        # casts compile into ONE select.
        by_name = {f.name: f.dataType for f in target.fields}
        exprs = []
        for f in df.schema.fields:
            want = by_name.get(f.name)
            if want is not None and want != f.dataType and self._castable(f.dataType, want):
                # try_cast: per-value failure tolerance under ANSI mode —
                # matches the reference's cast-else-keep contract
                # (reader.ts:75-80) at value granularity.
                exprs.append(F.col(f.name).try_cast(want).alias(f.name))
            else:
                if want is not None and want != f.dataType:
                    logger.warning(
                        "Stream %s: keeping column %s as %s (catalog wants %s)",
                        stream, f.name, f.dataType.simpleString(), want.simpleString(),
                    )
                exprs.append(F.col(f.name))
        return df.select(*exprs)

    def _get_json(self, stream: str, path: str, catalog_types: bool) -> DataFrame:
        """JSONL (one object per line) or JSON-array (.json, multiLine)
        ingest — engine extension. Catalog types apply as post-read
        try_casts (NOT schema-on-read: Spark's JSON reader nulls quoted
        numbers under a numeric read schema instead of coercing, which
        breaks the catalog-cast contract of keeping coercible values)."""
        reader = self.spark.read
        if path.lower().endswith(".json"):
            reader = reader.option("multiLine", "true")
        df = reader.json(path)
        if catalog_types:
            return self._apply_catalog_casts(df, stream)
        return df

    @staticmethod
    def _castable(src: T.DataType, dst: T.DataType) -> bool:
        """Conservative driver-side gate for 'cast, else keep + log'
        (reader.ts:75-80). Spark casts never throw per column at plan
        time; incompatible pairs (e.g. struct->long) are rejected here."""
        atomic = (
            T.StringType, T.LongType, T.IntegerType, T.ShortType, T.ByteType,
            T.DoubleType, T.FloatType, T.BooleanType, T.TimestampType, T.DateType,
            T.DecimalType,
        )
        if isinstance(src, atomic) and isinstance(dst, atomic):
            return True
        # complex -> string is always safe-ish via to_json semantics; skip it
        # to preserve the original column like the reference does on failure.
        return type(src) is type(dst)

    def _get_csv(
        self,
        stream: str,
        path: str,
        catalog_types: bool,
        reader_options: dict[str, Any],
    ) -> DataFrame:
        reader = (
            self.spark.read.option("header", "true")
            .option("quote", '"')  # reader.ts:95-98 default quoteChar
            .option("escape", '"')
            .option("inferSchema", "false" if catalog_types else "true")
        )
        for k, v in reader_options.items():
            reader = reader.option(k, v)
        if catalog_types:
            catalog = self.read_catalog()
            target = catalog.struct_type(stream) if catalog else None
            if target is not None:
                # Schema-on-read (reader.ts:100-105 dtype overlay). Columns
                # present in the file but absent from the catalog default
                # to string: read header first (cheap: one-row scan).
                # Complex catalog types (object/array) degrade to string —
                # the CSV source can't decode nested types, and the
                # reference likewise reads them as Utf8 until the JSON
                # parse pass (reader.ts:313-315, singer.ts:256-281).
                header_cols = self._csv_header(path, reader_options)
                by_name = {f.name: f for f in target.fields}
                fields = []
                for c in header_cols:
                    f = by_name.get(c, T.StructField(c, T.StringType(), True))
                    if isinstance(f.dataType, (T.StructType, T.ArrayType, T.MapType)):
                        f = T.StructField(f.name, T.StringType(), True)
                    fields.append(f)
                return reader.schema(T.StructType(fields)).csv(path)
        return reader.csv(path)

    def _csv_header(self, path: str, reader_options: dict[str, Any]) -> list[str]:
        """Column names from the header row (the reference re-reads the
        file with ``nRows: 0`` at ``reader.ts:260-266``; one text line
        here, no full scan). Parsed with a real CSV reader so quoted
        names containing the separator (``"a,b"``) stay one column."""
        import csv

        sep = str(reader_options.get("sep", ","))
        quote = str(reader_options.get("quote", '"')) or '"'
        with open(path, encoding="utf-8", errors="replace", newline="") as f:
            row = next(csv.reader(f, delimiter=sep, quotechar=quote), [])
        return list(row)

    # -- metadata ----------------------------------------------------------

    def get_metadata(self, stream: str) -> dict[str, str]:
        """Parquet footer KV metadata (``reader.ts:141-160``; the
        reference stubs this — pyarrow makes it real)."""
        path = self.input_files.get(stream)
        if path is None or not path.lower().endswith(".parquet"):
            return {}
        try:
            import pyarrow.parquet as pq

            meta = pq.read_schema(path).metadata or {}
            return {
                k.decode("utf-8", "replace"): v.decode("utf-8", "replace")
                for k, v in meta.items()
            }
        except Exception:
            logger.exception("Failed to read parquet metadata for %s", stream)
            return {}

    def get_pk(self, stream: str) -> list[str]:
        """Primary keys: parquet footer ``key_properties`` JSON first,
        catalog breadcrumbs second (``reader.ts:162-201``)."""
        meta = self.get_metadata(stream)
        raw = meta.get("key_properties")
        if raw:
            try:
                keys = json.loads(raw)
                if isinstance(keys, list):
                    return [str(k) for k in keys]
            except json.JSONDecodeError:
                pass
        catalog = self.read_catalog()
        if catalog:
            return catalog.key_properties(stream)
        return []
