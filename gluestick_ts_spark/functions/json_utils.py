"""JSON <-> column helpers.

Parity targets:

- ``parseObjs`` / ``parseDfCols`` (reference ``src/singer.ts:208-219,
  256-281``): for columns whose catalog type includes object/array,
  JSON-parse each string cell; keep the original value when parsing
  fails.
- struct -> JSON string encode (``src/etl-utils.ts:84-92``,
  ``src/singer.ts:49-57``): ``struct.jsonEncode()`` before CSV/Singer
  export.

Spark-first: ``from_json`` / ``to_json`` are JVM expressions inside
whole-stage codegen — no Python in the row path. Schema for parsing
comes from the catalog (preferred) or from sampled rows via
``schema_of_json`` (bounded driver-side sample, never a full scan).
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "parse_objs",
    "parse_df_cols",
    "struct_to_json",
    "infer_json_schema",
]


def struct_to_json(col: Column | str) -> Column:
    """Struct/array column -> JSON string (``etl-utils.ts:84-92``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.to_json(c)


def infer_json_schema(df: DataFrame, col_name: str, sample_rows: int = 100) -> T.DataType | None:
    """Infer a Spark type for a JSON-string column from a bounded sample.

    The reference samples the *first* non-null value (``singer.ts:80-130``);
    at scale we sample up to ``sample_rows`` non-null values and let Spark
    merge their schemas. Returns None when no parseable sample exists.
    """
    sample = (
        df.select(F.col(col_name).alias("j"))
        .where(F.col("j").isNotNull())
        .limit(sample_rows)
        .collect()
    )
    texts = [r["j"] for r in sample if r["j"]]
    if not texts:
        return None
    spark = df.sparkSession
    try:
        inferred = spark.read.json(spark.sparkContext.parallelize(texts, 1))
        schema = inferred.schema
        if "_corrupt_record" in schema.fieldNames():
            return None
        return schema
    except Exception:
        return None


def parse_objs(
    df: DataFrame,
    col_schemas: Mapping[str, T.DataType],
    keep_original_on_failure: bool = False,
) -> DataFrame:
    """Parse JSON-string columns to typed columns (``singer.ts:208-219``).

    ``from_json`` yields NULL on malformed input; the reference instead
    keeps the original string. ``keep_original_on_failure=True``
    reproduces that by keeping the column as a string and only
    canonicalizing values that parse — used where strict parity with the
    reference's mixed-type behavior matters (Spark columns are
    homogeneously typed, so "object or original string" must stay a
    string column).
    """
    exprs: list[Column] = []
    for f in df.schema.fields:
        if f.name in col_schemas:
            target = col_schemas[f.name]
            parsed = F.from_json(F.col(f.name).cast("string"), target)
            if keep_original_on_failure:
                exprs.append(
                    F.coalesce(F.to_json(parsed), F.col(f.name).cast("string")).alias(f.name)
                )
            else:
                exprs.append(parsed.alias(f.name))
        else:
            exprs.append(F.col(f.name))
    # One select, not N withColumn calls: avoids deep plan nesting
    # (anti-pattern in the reference at reader.ts:73-81).
    return df.select(*exprs)


def parse_df_cols(
    df: DataFrame,
    catalog_properties: Mapping[str, dict],
    sample_rows: int = 100,
) -> DataFrame:
    """Catalog-driven variant (``singer.ts:256-281``): parse every column
    whose catalog type includes ``object``/``array``. Schema precedence:
    catalog-declared item/property types, else sampled inference."""
    from ..catalog import json_schema_to_spark_type

    targets: dict[str, T.DataType] = {}
    for name, prop in catalog_properties.items():
        if name not in df.columns or not isinstance(prop, dict):
            continue
        t = prop.get("type")
        types = t if isinstance(t, list) else [t]
        if "object" in types or "array" in types:
            declared = json_schema_to_spark_type(prop)
            if isinstance(declared, T.StringType):
                inferred = infer_json_schema(df, name, sample_rows)
                if inferred is not None:
                    targets[name] = inferred
            else:
                targets[name] = declared
    if not targets:
        return df
    return parse_objs(df, targets)
