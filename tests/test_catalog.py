"""Unit tests for JSON-Schema -> StructType (SURVEY §2 row 6) and PK
breadcrumbs (row 7) — pure Python, no Spark."""

import json

from pyspark.sql import types as T

from gluestick_ts_spark.catalog import Catalog, json_schema_to_struct_type


def test_scalar_mapping():
    st = json_schema_to_struct_type(
        {
            "properties": {
                "id": {"type": ["integer", "null"]},
                "amount": {"type": ["number", "null"]},
                "ok": {"type": ["boolean", "null"]},
                "name": {"type": ["string", "null"]},
                "created_at": {"type": ["string", "null"], "format": "date-time"},
            }
        }
    )
    by = {f.name: f.dataType for f in st.fields}
    assert by["id"] == T.LongType()
    assert by["amount"] == T.DoubleType()
    assert by["ok"] == T.BooleanType()
    assert by["name"] == T.StringType()
    assert by["created_at"] == T.TimestampType()
    assert all(f.nullable for f in st.fields)


def test_any_of_prefers_format_variant():
    st = json_schema_to_struct_type(
        {
            "properties": {
                "when": {
                    "anyOf": [
                        {"type": "string"},
                        {"type": "string", "format": "date-time"},
                    ]
                }
            }
        }
    )
    assert st.fields[0].dataType == T.TimestampType()


def test_nested_object_and_array():
    st = json_schema_to_struct_type(
        {
            "properties": {
                "addr": {
                    "type": ["object", "null"],
                    "properties": {"city": {"type": "string"}},
                },
                "tags": {"type": ["array", "null"], "items": {"type": "integer"}},
            }
        }
    )
    by = {f.name: f.dataType for f in st.fields}
    assert isinstance(by["addr"], T.StructType)
    assert by["tags"] == T.ArrayType(T.LongType(), True)


def test_unknown_type_falls_back_to_string():
    st = json_schema_to_struct_type({"properties": {"x": {}}})
    assert st.fields[0].dataType == T.StringType()


def test_catalog_pk_breadcrumbs(tmp_path):
    doc = {
        "streams": [
            {
                "stream": "users",
                "schema": {"properties": {"id": {"type": "integer"}}},
                "metadata": [
                    {"breadcrumb": [], "metadata": {"table-key-properties": ["id"]}},
                    {"breadcrumb": ["properties", "id"], "metadata": {}},
                ],
            }
        ]
    }
    (tmp_path / "catalog.json").write_text(json.dumps(doc))
    cat = Catalog.load(str(tmp_path))
    assert cat is not None
    assert cat.key_properties("users") == ["id"]
    assert cat.key_properties("nope") == []
    assert cat.struct_type("users").fieldNames() == ["id"]
