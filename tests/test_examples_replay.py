"""End-to-end golden replays of the reference's three runnable
examples (``/root/reference/examples/*`` — the reference's only
executable validation). Each test drives the SAME flow through this
repo's public API and pins the produced bytes:

- example-csv (``example-csv.ts``): Reader.keys() -> per-stream
  ``get(catalog_types=True)`` -> inject a ``tenant`` literal column ->
  ``to_export`` (default singer). Golden: the full data.singer byte
  stream (SCHEMA framing, catalog key_properties, ISO datetimes,
  null-field drops, tenant column).
- example-nested-csv (``example-nested-csv.ts``): struct columns
  through the CSV export. The example's comment expects a failure, but
  the shipped dispatcher stringifies struct columns via
  ``struct.jsonEncode()`` (``etl-utils.ts:84-92``) and succeeds — this
  repo mirrors the shipped behavior (``to_json`` per struct column).
- example-parquet (``example-parquet.ts``): parquet stream with footer
  ``key_properties`` -> shape/columns -> catalog-typed read -> get_pk
  -> get_metadata -> ``to_export``.

The reference repo ships no fixture data or captured outputs, so the
fixtures here are representative and the goldens pin THIS repo's
exact bytes (regression pins), with the semantic assertions carrying
the reference-parity claims.
"""

from __future__ import annotations

import csv
import io
import json
import os

import pytest

from gluestick_ts_spark.sinks.export import to_export
from gluestick_ts_spark.sources.reader import Reader


@pytest.fixture()
def csv_project(tmp_path):
    """example-csv-shaped project: sync-output CSVs + catalog.json."""
    sync = tmp_path / "sync-output"
    sync.mkdir()
    (sync / "users-1.csv").write_text(
        "id,name,joined_at,score\n"
        "1,Ann,2024-01-02 03:04:05,9.5\n"
        "2,Bob,2024-02-03 04:05:06,\n"
        "3,Cyd,not-a-date,7.25\n"
    )
    (tmp_path / "catalog.json").write_text(json.dumps({
        "streams": [{
            "stream": "users",
            "schema": {"properties": {
                "id": {"type": ["integer", "null"]},
                "name": {"type": ["string", "null"]},
                "joined_at": {"type": ["string", "null"], "format": "date-time"},
                "score": {"type": ["number", "null"]},
            }},
            "metadata": [{
                "breadcrumb": [],
                "metadata": {"table-key-properties": ["id"]},
            }],
        }]
    }))
    return tmp_path


def test_example_csv_replay(spark, csv_project):
    """The example-csv loop: discover streams, catalog-typed read,
    tenant literal injection, default singer export — byte-golden."""
    root = str(csv_project)
    sync = os.path.join(root, "sync-output")
    reader = Reader(spark, sync, root)
    assert reader.keys() == ["users"]

    from pyspark.sql import functions as F

    for key in reader.keys():
        df = reader.get(key, catalog_types=True)
        assert df is not None
        out_df = df.withColumn("tenant", F.lit("default"))
        to_export(out_df, key, os.path.join(root, "etl-output"),
                  input_dir=sync, root_dir=root)

    lines = (csv_project / "etl-output" / "data.singer").read_text().splitlines()
    msgs = [json.loads(line) for line in lines]

    # SCHEMA first, catalog PK, tenant column typed string
    assert msgs[0]["type"] == "SCHEMA" and msgs[0]["stream"] == "users"
    assert msgs[0]["key_properties"] == ["id"]
    props = msgs[0]["schema"]["properties"]
    assert props["tenant"]["type"] == ["string", "null"]
    assert props["joined_at"] == {
        "type": ["string", "null"], "format": "date-time"
    }

    records = {m["record"]["id"]: m["record"] for m in msgs if m["type"] == "RECORD"}
    assert len(records) == 3
    # typed datetime -> ISO 6-digit; malformed cell -> null -> dropped
    assert records[1]["joined_at"] == "2024-01-02T03:04:05.000000Z"
    assert "joined_at" not in records[3]
    assert "score" not in records[2]  # null field dropped
    assert all(r["tenant"] == "default" for r in records.values())
    assert [m["type"] for m in msgs] == ["SCHEMA", "RECORD", "RECORD", "RECORD", "STATE"]

    # byte-golden regression pin for the full stream (compact
    # separators = JSON.stringify's byte format)
    _d = lambda o: json.dumps(o, separators=(",", ":"))  # noqa: E731
    golden = "\n".join([
        _d({
            "type": "SCHEMA", "stream": "users",
            "schema": {"type": ["object", "null"], "properties": {
                "id": {"type": ["integer", "null"]},
                "name": {"type": ["string", "null"]},
                "joined_at": {"type": ["string", "null"], "format": "date-time"},
                "score": {"type": ["number", "null"]},
                "tenant": {"type": ["string", "null"]},
            }},
            "key_properties": ["id"],
        }),
        _d({"type": "RECORD", "stream": "users", "record": {
            "id": 1, "name": "Ann",
            "joined_at": "2024-01-02T03:04:05.000000Z", "score": 9.5,
            "tenant": "default"}}),
        _d({"type": "RECORD", "stream": "users", "record": {
            "id": 2, "name": "Bob",
            "joined_at": "2024-02-03T04:05:06.000000Z",
            "tenant": "default"}}),
        _d({"type": "RECORD", "stream": "users", "record": {
            "id": 3, "name": "Cyd", "score": 7.25, "tenant": "default"}}),
        _d({"type": "STATE", "value": {}}),
    ]) + "\n"
    assert (csv_project / "etl-output" / "data.singer").read_text() == golden


def test_example_nested_csv_replay(spark, tmp_path):
    """example-nested-csv: struct columns through the CSV dispatcher.
    The shipped reference STRINGIFIES struct columns
    (etl-utils.ts:84-92, struct.jsonEncode) — the example's
    'should fail' comment predates that fix — so the export succeeds
    with JSON-encoded cells."""
    from pyspark.sql import Row

    df = spark.createDataFrame([
        Row(id=1, name="Alice",
            address=Row(street="123 Main St", city="NYC", zip="10001"),
            corrupted_data=Row(fieldname="helloworld")),
        Row(id=2, name="Bob",
            address=Row(street="456 Oak Ave", city="LA", zip="90001"),
            corrupted_data=Row(fieldname="helloworld")),
        Row(id=3, name="Charlie",
            address=Row(street="789 Pine Rd", city="SF", zip="94102"),
            corrupted_data=Row(fieldname="helloworld")),
    ])
    out = tmp_path / "etl-output"
    to_export(df, "nested_data", str(out), export_format="csv")
    text = (out / "nested_data.csv").read_text()

    rows = list(csv.DictReader(io.StringIO(text)))
    assert [r["name"] for r in rows] == ["Alice", "Bob", "Charlie"]
    assert json.loads(rows[0]["address"]) == {
        "street": "123 Main St", "city": "NYC", "zip": "10001"
    }
    assert json.loads(rows[2]["corrupted_data"]) == {"fieldname": "helloworld"}

    golden = (
        "id,name,address,corrupted_data\n"
        '1,Alice,"{""street"":""123 Main St"",""city"":""NYC"",""zip"":""10001""}","{""fieldname"":""helloworld""}"\n'
        '2,Bob,"{""street"":""456 Oak Ave"",""city"":""LA"",""zip"":""90001""}","{""fieldname"":""helloworld""}"\n'
        '3,Charlie,"{""street"":""789 Pine Rd"",""city"":""SF"",""zip"":""94102""}","{""fieldname"":""helloworld""}"\n'
    )
    assert text == golden


def test_example_parquet_replay(spark, tmp_path):
    """example-parquet: parquet stream, footer key_properties PK,
    catalog-typed read, metadata, singer export."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    sync = tmp_path / "sync-output"
    sync.mkdir()
    table = pa.table({
        "campaign_id": pa.array([10, 11, 12], pa.int64()),
        "clicks": pa.array([100, 250, 75], pa.int64()),
        "cost": pa.array([12.5, 20.0, 7.75], pa.float64()),
    })
    table = table.replace_schema_metadata(
        {"key_properties": json.dumps(["campaign_id"])}
    )
    pq.write_table(table, sync / "campaign_performance-1.parquet")
    (tmp_path / "catalog.json").write_text(json.dumps({
        "streams": [{
            "stream": "campaign_performance",
            "schema": {"properties": {
                "campaign_id": {"type": ["integer", "null"]},
                "clicks": {"type": ["integer", "null"]},
                "cost": {"type": ["number", "null"]},
            }},
            "metadata": [{"breadcrumb": [], "metadata": {}}],
        }]
    }))

    root = str(tmp_path)
    reader = Reader(spark, str(sync), root)
    assert reader.keys() == ["campaign_performance"]
    df = reader.get("campaign_performance")
    assert df.count() == 3
    assert df.columns == ["campaign_id", "clicks", "cost"]
    typed = reader.get("campaign_performance", catalog_types=True)
    assert typed.count() == 3
    assert reader.get_pk("campaign_performance") == ["campaign_id"]
    assert "key_properties" in reader.get_metadata("campaign_performance")

    to_export(typed, "campaign_performance", str(tmp_path / "etl-output"),
              input_dir=str(sync), root_dir=root)
    msgs = [json.loads(line) for line in
            (tmp_path / "etl-output" / "data.singer").read_text().splitlines()]
    assert msgs[0]["type"] == "SCHEMA"
    assert msgs[0]["key_properties"] == ["campaign_id"]  # footer-sourced
    recs = {m["record"]["campaign_id"]: m["record"]
            for m in msgs if m["type"] == "RECORD"}
    assert recs[11]["clicks"] == 250 and recs[12]["cost"] == 7.75
