"""Reader tests: discovery, CSV/Parquet ingest with catalog types,
parse-dates fallback, PK lookup (SURVEY §2 rows 1-8)."""

import datetime
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import types as T

from gluestick_ts_spark.sources.reader import Reader, _stream_name


def test_stream_name_derivation():
    # reader.ts:221-232 — basename minus ext, split at first '-'
    assert _stream_name("users-20240101.csv") == "users"
    assert _stream_name("orders.parquet") == "orders"
    assert _stream_name("a-b-c.csv") == "a"


@pytest.fixture()
def sync_dir(tmp_path):
    d = tmp_path / "sync-output"
    d.mkdir()
    (d / "users-20240101.csv").write_text(
        'id,name,amount,created_at\n1,"Ann",1.5,2024-01-02 03:04:05\n2,"Bob",2.5,2024-01-03\n'
    )
    (d / "users-20240102.csv").write_text("id,name\n99,dup\n")  # first wins
    pq.write_table(
        pa.table({"id": pa.array([1, 2], pa.int32()), "score": [0.5, 0.7]}),
        str(d / "scores.parquet"),
    )
    catalog = {
        "streams": [
            {
                "stream": "users",
                "schema": {
                    "properties": {
                        "id": {"type": ["integer", "null"]},
                        "name": {"type": ["string", "null"]},
                        "amount": {"type": ["number", "null"]},
                        "created_at": {
                            "type": ["string", "null"],
                            "format": "date-time",
                        },
                    }
                },
                "metadata": [
                    {"breadcrumb": [], "metadata": {"table-key-properties": ["id"]}}
                ],
            },
            {
                "stream": "scores",
                "schema": {
                    "properties": {
                        "id": {"type": ["integer", "null"]},
                        "score": {"type": ["number", "null"]},
                    }
                },
                "metadata": [],
            },
        ]
    }
    (tmp_path / "catalog.json").write_text(json.dumps(catalog))
    return tmp_path


def test_discovery_first_file_wins(spark, sync_dir):
    r = Reader(spark, str(sync_dir / "sync-output"), str(sync_dir))
    assert r.streams == ["scores", "users"]
    assert r.input_files["users"].endswith("users-20240101.csv")


def test_csv_catalog_types(spark, sync_dir):
    r = Reader(spark, str(sync_dir / "sync-output"), str(sync_dir))
    df = r.get("users", catalog_types=True)
    by = {f.name: f.dataType for f in df.schema.fields}
    assert by["id"] == T.LongType()
    assert by["amount"] == T.DoubleType()
    assert by["created_at"] == T.TimestampType()
    rows = {row["id"]: row for row in df.collect()}
    assert rows[1]["name"] == "Ann"
    assert rows[1]["created_at"] == datetime.datetime(2024, 1, 2, 3, 4, 5)


def test_csv_parse_dates_fallback(spark, sync_dir):
    r = Reader(spark, str(sync_dir / "sync-output"), str(sync_dir))
    df = r.get("users", parse_dates=["created_at"])
    rows = {row["id"]: row for row in df.collect()}
    # full format row
    assert rows[1]["created_at"] == datetime.datetime(2024, 1, 2, 3, 4, 5)
    # date-only fallback row (reader.ts:111-128)
    assert rows[2]["created_at"] == datetime.datetime(2024, 1, 3)


def test_parquet_catalog_cast(spark, sync_dir):
    r = Reader(spark, str(sync_dir / "sync-output"), str(sync_dir))
    df = r.get("scores", catalog_types=True)
    by = {f.name: f.dataType for f in df.schema.fields}
    assert by["id"] == T.LongType()  # int32 -> catalog integer -> long
    assert df.count() == 2


def test_csv_header_quoted_separator(spark, tmp_path):
    """A quoted column name containing the separator must stay ONE
    column in the schema-on-read StructType (header parsed with a real
    CSV reader, not a naive split)."""
    sync = tmp_path / "sync-output"
    sync.mkdir()
    (sync / "odd.csv").write_text('id,"a,b",amount\n1,x,2.5\n')
    catalog = {
        "streams": [
            {
                "stream": "odd",
                "schema": {
                    "properties": {
                        "id": {"type": ["integer", "null"]},
                        "a,b": {"type": ["string", "null"]},
                        "amount": {"type": ["number", "null"]},
                    }
                },
                "metadata": [],
            }
        ]
    }
    (tmp_path / "catalog.json").write_text(json.dumps(catalog))
    r = Reader(spark, str(sync), str(tmp_path))
    df = r.get("odd", catalog_types=True)
    by = {f.name: f.dataType for f in df.schema.fields}
    assert set(by) == {"id", "a,b", "amount"}
    assert by["amount"] == T.DoubleType()
    row = df.first()
    assert row["id"] == 1 and row["a,b"] == "x" and row["amount"] == 2.5


def test_csv_complex_catalog_type_reads_as_string(spark, tmp_path):
    """Object/array catalog types degrade to string in the CSV read
    schema (the CSV source can't decode nested types; the reference
    reads them as Utf8 until the JSON parse pass, reader.ts:313-315)."""
    sync = tmp_path / "sync-output"
    sync.mkdir()
    (sync / "users.csv").write_text('id,prefs\n1,"{""theme"": ""dark""}"\n')
    catalog = {
        "streams": [
            {
                "stream": "users",
                "schema": {
                    "properties": {
                        "id": {"type": ["integer", "null"]},
                        "prefs": {
                            "type": ["object", "null"],
                            "properties": {"theme": {"type": ["string", "null"]}},
                        },
                    }
                },
                "metadata": [],
            }
        ]
    }
    (tmp_path / "catalog.json").write_text(json.dumps(catalog))
    r = Reader(spark, str(sync), str(tmp_path))
    df = r.get("users", catalog_types=True)
    assert df is not None
    by = {f.name: f.dataType for f in df.schema.fields}
    assert by["id"] == T.LongType() and by["prefs"] == T.StringType()
    assert json.loads(df.first()["prefs"]) == {"theme": "dark"}


def test_unknown_stream_returns_none(spark, sync_dir):
    r = Reader(spark, str(sync_dir / "sync-output"), str(sync_dir))
    assert r.get("nope") is None


def test_pk_from_parquet_metadata(spark, tmp_path):
    d = tmp_path / "sync-output"
    d.mkdir()
    table = pa.table({"id": [1]})
    table = table.replace_schema_metadata({"key_properties": json.dumps(["id"])})
    pq.write_table(table, str(d / "things.parquet"))
    r = Reader(spark, str(d), str(tmp_path))
    assert r.get_pk("things") == ["id"]
    assert "key_properties" in r.get_metadata("things")


def test_pk_falls_back_to_catalog(spark, sync_dir):
    r = Reader(spark, str(sync_dir / "sync-output"), str(sync_dir))
    assert r.get_pk("users") == ["id"]


def test_reader_jsonl_source(spark, tmp_path):
    sync = tmp_path / "sync-output"
    sync.mkdir()
    (sync / "logs-20240101.jsonl").write_text(
        '{"id": 1, "msg": "a"}\n{"id": 2, "msg": "b"}\n'
    )
    (sync / "cfg.json").write_text('[{"id": 10, "on": true}, {"id": 11, "on": false}]')
    r = Reader(spark, str(sync), str(tmp_path))
    assert set(r.streams) == {"logs", "cfg"}
    logs = r.get("logs")
    assert {(x.id, x.msg) for x in logs.collect()} == {(1, "a"), (2, "b")}
    cfg = r.get("cfg")
    assert {(x.id, x.on) for x in cfg.collect()} == {(10, True), (11, False)}


def test_chunk_size_accepted_and_warned(spark, sync_dir, caplog):
    """chunk_size parity (reader.ts:60-62): accepted, warns, no effect."""
    import logging

    r = Reader(spark, str(sync_dir / "sync-output"), str(sync_dir))
    base = r.get("users")
    with caplog.at_level(logging.WARNING, logger="gluestick_ts_spark.sources.reader"):
        chunked = r.get("users", chunk_size=500)
    assert any("chunk_size" in m for m in caplog.messages)
    assert chunked is not None
    assert sorted(map(tuple, chunked.collect())) == sorted(map(tuple, base.collect()))
