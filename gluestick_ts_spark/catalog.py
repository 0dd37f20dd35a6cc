"""Singer catalog handling: JSON-Schema -> Spark StructType, PK registry.

Parity target: the reference's catalog machinery in
``src/reader.ts`` —

- catalog file load: ``reader.ts:237-251`` (``<root>/catalog.json``)
- JSON-Schema -> dtype mapping: ``reader.ts:253-325``
  (``integer -> Int64``, ``number -> Float64``, ``boolean -> Bool``,
  ``format: date-time -> Datetime``, fallback ``Utf8``; ``anyOf``
  resolved to the variant that carries a ``format``; ``"null"``
  stripped from type arrays)
- PK breadcrumbs: ``reader.ts:186-197`` (stream metadata entry with an
  empty breadcrumb carrying ``table-key-properties``)

Everything here is driver-side pure Python: schema resolution happens
once, up front, per stream — no Spark jobs.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import types as T

__all__ = [
    "Catalog",
    "json_schema_to_spark_type",
    "json_schema_to_struct_type",
    "struct_type_from_properties",
]


def _resolve_any_of(prop: dict[str, Any]) -> dict[str, Any]:
    """Collapse ``anyOf`` like the reference (``reader.ts:284-290``):
    prefer the variant that declares a ``format``; otherwise fall back to
    a generic object."""
    variants = prop.get("anyOf")
    if not variants:
        return prop
    for v in variants:
        if isinstance(v, dict) and "format" in v:
            return v
    return {"type": "object"}


def _strip_null(type_decl: Any) -> str | None:
    """Singer schemas write ``["string", "null"]``; drop ``"null"`` and
    return the first concrete type (``reader.ts:298-300``)."""
    if isinstance(type_decl, str):
        return None if type_decl == "null" else type_decl
    if isinstance(type_decl, list):
        for t in type_decl:
            if t != "null":
                return t
    return None


def json_schema_to_spark_type(prop: dict[str, Any]) -> T.DataType:
    """Map one JSON-Schema property to a Spark type.

    Scalar mapping mirrors ``reader.ts:292-321``; nested object/array
    mapping extends it recursively (the reference keeps nested data as
    Polars Struct/Utf8 — Spark types them natively, which is strictly
    more faithful to the catalog).
    """
    prop = _resolve_any_of(prop)
    t = _strip_null(prop.get("type"))
    fmt = prop.get("format")
    if fmt == "date-time":
        return T.TimestampType()
    if t == "integer":
        return T.LongType()
    if t == "number":
        return T.DoubleType()
    if t == "boolean":
        return T.BooleanType()
    if t == "object":
        props = prop.get("properties")
        if props:
            return struct_type_from_properties(props)
        return T.StringType()  # untyped object rides as JSON string
    if t == "array":
        items = prop.get("items")
        if isinstance(items, dict) and items:
            return T.ArrayType(json_schema_to_spark_type(items), True)
        return T.StringType()
    # string / unknown -> Utf8 fallback (reader.ts:313-315, 321)
    return T.StringType()


def struct_type_from_properties(properties: dict[str, Any]) -> T.StructType:
    """Build an all-nullable StructType from JSON-Schema ``properties``.

    Every column is nullable because Singer schemas always emit
    ``["<type>", "null"]`` (reference ``singer.ts:22-32``).
    """
    return T.StructType(
        [
            T.StructField(name, json_schema_to_spark_type(p if isinstance(p, dict) else {}), True)
            for name, p in properties.items()
        ]
    )


def json_schema_to_struct_type(schema: dict[str, Any]) -> T.StructType:
    """Entry point for a full stream schema (``{"properties": {...}}``)."""
    return struct_type_from_properties(schema.get("properties", {}))


@dataclass
class Catalog:
    """Parsed Singer ``catalog.json`` (reference ``reader.ts:17-19``).

    ``streams`` is the raw list; helper methods expose per-stream schema
    and primary keys with the reference's precedence rules.
    """

    streams: list[dict[str, Any]] = field(default_factory=list)

    @classmethod
    def load(cls, root_dir: str) -> "Catalog | None":
        """Load ``<root_dir>/catalog.json`` (``reader.ts:237-251``).
        Returns None when absent — catalog usage is always optional."""
        path = os.path.join(root_dir, "catalog.json")
        if not os.path.isfile(path):
            return None
        try:
            with open(path, encoding="utf-8") as f:
                doc = json.load(f)
        except (OSError, json.JSONDecodeError):
            return None
        return cls(streams=doc.get("streams", []))

    def stream_entry(self, stream: str) -> dict[str, Any] | None:
        """Find a stream by ``stream`` or ``tap_stream_id``."""
        for s in self.streams:
            if s.get("stream") == stream or s.get("tap_stream_id") == stream:
                return s
        return None

    def properties(self, stream: str) -> dict[str, Any] | None:
        entry = self.stream_entry(stream)
        if not entry:
            return None
        return (entry.get("schema") or {}).get("properties")

    def struct_type(self, stream: str) -> T.StructType | None:
        """Catalog-declared Spark schema for a stream, or None."""
        props = self.properties(stream)
        if props is None:
            return None
        return struct_type_from_properties(props)

    def key_properties(self, stream: str) -> list[str]:
        """PKs from the empty-breadcrumb metadata entry
        (``reader.ts:186-197``)."""
        entry = self.stream_entry(stream)
        if not entry:
            return []
        for md in entry.get("metadata", []) or []:
            if md.get("breadcrumb") == []:
                keys = (md.get("metadata") or {}).get("table-key-properties")
                if keys:
                    return list(keys)
        return []


def get_catalog_schema(
    stream: str, root_dir: str = "."
) -> dict[str, Any] | None:
    """Stream's catalog ``schema.properties`` with every ``array`` type
    guaranteed an ``items`` schema (``singer.ts:221-254``). Returns
    None when the catalog or stream is absent (the reference throws;
    we keep the Reader's log-and-None error contract)."""
    catalog = Catalog.load(root_dir)
    if catalog is None:
        return None
    props = catalog.properties(stream)
    if props is None:
        return None
    fixed: dict[str, Any] = {}
    for name, prop in props.items():
        prop = dict(prop) if isinstance(prop, dict) else {}
        types = prop.get("type")
        type_list = types if isinstance(types, list) else [types]
        if "array" in type_list and "items" not in prop:
            prop["items"] = {"type": ["string", "null"]}
        fixed[name] = prop
    return fixed
