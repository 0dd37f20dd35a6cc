"""Sink tests (SURVEY §2 rows 9-16, 23, 26-27): parquet/csv/jsonl/json
writers, Singer message framing, schema generation from StructType."""

import datetime
import json
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from gluestick_ts_spark.sinks.export import (
    to_export,
    write_csv,
    write_json_array,
    write_jsonl,
)
from gluestick_ts_spark.sinks.singer import (
    gen_singer_header,
    spark_type_to_singer_schema,
    to_singer,
    to_singer_schema,
)


@pytest.fixture()
def df(spark):
    return spark.createDataFrame(
        [
            Row(
                id=1,
                name="Ann",
                amount=1.5,
                ok=True,
                created_at=datetime.datetime(2024, 1, 2, 3, 4, 5, 123000),
                addr=Row(city="Berlin", zip="10115"),
            ),
            Row(id=2, name=None, amount=None, ok=False, created_at=None, addr=None),
        ]
    )


def test_singer_file_framing(df, tmp_path):
    to_singer(df, "users", str(tmp_path), keys=["id"])
    lines = (tmp_path / "data.singer").read_text().strip().splitlines()
    msgs = [json.loads(line) for line in lines]
    assert msgs[0]["type"] == "SCHEMA"
    assert msgs[0]["stream"] == "users"
    assert msgs[0]["key_properties"] == ["id"]
    props = msgs[0]["schema"]["properties"]
    assert props["id"]["type"] == ["integer", "null"]
    assert props["created_at"] == {"type": ["string", "null"], "format": "date-time"}
    assert props["addr"]["type"] == ["string", "null"]  # allow_objects=False
    records = [m for m in msgs if m["type"] == "RECORD"]
    assert len(records) == 2
    rec1 = next(r["record"] for r in records if r["record"]["id"] == 1)
    assert rec1["created_at"] == "2024-01-02T03:04:05.123000Z"
    assert json.loads(rec1["addr"]) == {"city": "Berlin", "zip": "10115"}
    rec2 = next(r["record"] for r in records if r["record"]["id"] == 2)
    assert "name" not in rec2  # null fields dropped (singer.ts:361-365)
    assert msgs[-1] == {"type": "STATE", "value": {}}


def test_singer_append_mode(df, tmp_path):
    to_singer(df, "users", str(tmp_path), keys=["id"])
    to_singer(df, "users", str(tmp_path), keys=["id"])
    lines = (tmp_path / "data.singer").read_text().strip().splitlines()
    types = [json.loads(line)["type"] for line in lines]
    assert types.count("SCHEMA") == 2
    assert types.count("RECORD") == 4


def test_singer_keep_null_fields(df, tmp_path):
    to_singer(df, "users", str(tmp_path), keys=["id"], keep_null_fields=True)
    lines = (tmp_path / "data.singer").read_text().strip().splitlines()
    rec2 = next(
        json.loads(line)["record"]
        for line in lines
        if '"RECORD"' in line and '"id": 2' in line.replace('"id":2', '"id": 2')
    )
    assert "name" in rec2 and rec2["name"] is None


def test_singer_allow_objects(df, tmp_path):
    to_singer(df, "users", str(tmp_path), keys=["id"], allow_objects=True)
    lines = (tmp_path / "data.singer").read_text().strip().splitlines()
    schema = json.loads(lines[0])["schema"]["properties"]
    assert schema["addr"]["type"] == ["object", "null"]
    assert "city" in schema["addr"]["properties"]
    rec1 = next(
        json.loads(line)["record"]
        for line in lines[1:]
        if json.loads(line).get("type") == "RECORD" and json.loads(line)["record"]["id"] == 1
    )
    assert rec1["addr"] == {"city": "Berlin", "zip": "10115"}


def test_singer_distributed_mode(df, tmp_path):
    to_singer(df, "users", str(tmp_path), keys=["id"], single_file=False)
    assert os.path.isdir(tmp_path / "data.singer.records")
    assert (tmp_path / "data.singer.schema").exists()
    assert (tmp_path / "data.singer.state").exists()


def test_gen_singer_header_declared_schema_wins(df):
    declared = {"properties": {"id": {"type": ["string", "null"]}}}
    _, header = gen_singer_header(df, schema=declared)
    assert header["properties"]["id"] == {"type": ["string", "null"]}
    assert header["properties"]["name"]["type"] == ["string", "null"]


def test_to_singer_schema_recursion():
    s = to_singer_schema({"a": 1, "b": [True], "c": {"d": 1.5}})
    assert s["properties"]["a"]["type"] == ["integer", "null"]
    assert s["properties"]["b"]["items"]["type"] == ["boolean", "null"]
    assert s["properties"]["c"]["properties"]["d"]["type"] == ["number", "null"]


def test_csv_sink_struct_stringify(df, tmp_path):
    path = str(tmp_path / "out.csv")
    write_csv(df, path)
    text = open(path).read().splitlines()
    assert text[0] == "id,name,amount,ok,created_at,addr"
    row1 = next(line for line in text[1:] if line.startswith("1,"))
    assert "Berlin" in row1  # struct JSON-encoded into the cell


def test_jsonl_sink(df, tmp_path):
    path = str(tmp_path / "out.jsonl")
    write_jsonl(df.select("id", "name"), path)
    recs = [json.loads(line) for line in open(path)]
    assert sorted(r["id"] for r in recs) == [1, 2]


def test_json_array_sink(df, tmp_path):
    path = str(tmp_path / "out.json")
    write_json_array(df.select("id"), path)
    data = json.loads(open(path).read())
    assert sorted(r["id"] for r in data) == [1, 2]


def test_to_export_dispatch(df, tmp_path, monkeypatch):
    to_export(df, "users", str(tmp_path), export_format="parquet")
    assert os.path.isdir(tmp_path / "users.parquet")
    monkeypatch.setenv("DEFAULT_EXPORT_FORMAT", "jsonl")
    to_export(df.select("id"), "users", str(tmp_path))
    assert (tmp_path / "users.jsonl").exists()
    monkeypatch.setenv("HG_UNIFIED_OUTPUT_USERS", "unified")
    to_export(df.select("id"), "users", str(tmp_path), export_format="jsonl")
    assert (tmp_path / "unified.jsonl").exists()


def test_to_export_singer_default(df, tmp_path):
    to_export(df, "users", str(tmp_path), keys=["id"])
    assert (tmp_path / "data.singer").exists()


def test_to_export_singer_allow_objects_default_true(df, tmp_path):
    """Dispatcher parity (etl-utils.ts:55): the singer branch of
    toExport passes ``allowObjects ?? true``, so a struct column keeps
    object typing on the DEFAULT dispatcher path — while a DIRECT
    to_singer call keeps its own False default (singer.ts:300)."""
    to_export(df, "users", str(tmp_path), keys=["id"])
    schema_msg = json.loads((tmp_path / "data.singer").read_text().splitlines()[0])
    assert schema_msg["schema"]["properties"]["addr"]["type"][0] == "object"

    # explicit override still wins on the dispatcher path
    to_export(df, "users", str(tmp_path), keys=["id"],
              filename="strfy.singer", allow_objects=False)
    msg2 = json.loads((tmp_path / "strfy.singer").read_text().splitlines()[0])
    assert msg2["schema"]["properties"]["addr"]["type"][0] == "string"

    # direct to_singer: reference default stays False
    to_singer(df, "users", str(tmp_path), keys=["id"], filename="direct.singer")
    msg3 = json.loads((tmp_path / "direct.singer").read_text().splitlines()[0])
    assert msg3["schema"]["properties"]["addr"]["type"][0] == "string"


def test_to_export_reserved_variables_prefix(df, tmp_path, monkeypatch):
    """etl-utils.ts:25,34-35: options.reservedVariables thread into
    buildStringFormatVariables for the OUTPUT_FILE_PREFIX templating,
    overriding env-derived values of the same name."""
    monkeypatch.setenv("OUTPUT_FILE_PREFIX", "{job_id}_{tenant}_")
    monkeypatch.setenv("TENANT", "acme")
    to_export(
        df.select("id"), "users", str(tmp_path), export_format="jsonl",
        reserved_variables={"job_id": "j42", "tenant": "beta"},
    )
    assert (tmp_path / "j42_beta_users.jsonl").exists()
    # without reserved vars: unknown {job_id} left intact, env tenant used
    to_export(df.select("id"), "users", str(tmp_path), export_format="jsonl")
    assert (tmp_path / "{job_id}_acme_users.jsonl").exists()


def test_unknown_format_raises(df, tmp_path):
    with pytest.raises(ValueError):
        to_export(df, "users", str(tmp_path), export_format="xml")


def test_to_singer_drop_all_null_cols(spark, tmp_path):
    import json

    from gluestick_ts_spark.sinks.singer import to_singer

    df = spark.createDataFrame(
        [(1, None, "x"), (2, None, None)],
        "id long, dead string, partial string",
    )
    out = str(tmp_path)
    to_singer(df, "s", out, keys=["id"], drop_all_null_cols=True)
    lines = [json.loads(l) for l in open(f"{out}/data.singer")]
    schema_props = lines[0]["schema"]["properties"]
    assert "dead" not in schema_props and "id" in schema_props and "partial" in schema_props
    # default (reference parity): all-null column kept in the schema
    to_singer(df, "s", out, keys=["id"], filename="keep.singer")
    lines2 = [json.loads(l) for l in open(f"{out}/keep.singer")]
    assert "dead" in lines2[0]["schema"]["properties"]


def test_to_singer_infer_json_strings(spark, tmp_path):
    import json

    from gluestick_ts_spark.sinks.singer import to_singer

    df = spark.createDataFrame(
        [(1, '{"a": 1, "b": "x"}'), (2, '{"a": 2, "b": "y"}'), (3, None)],
        "id long, payload string",
    )
    out = str(tmp_path)
    to_singer(df, "s", out, keys=["id"], allow_objects=True, infer_json_strings=True)
    lines = [json.loads(l) for l in open(f"{out}/data.singer")]
    props = lines[0]["schema"]["properties"]
    assert props["payload"]["type"][0] == "object"
    assert props["payload"]["properties"]["a"]["type"][0] == "integer"
    recs = {l["record"]["id"]: l["record"] for l in lines if l["type"] == "RECORD"}
    # records carry REAL nested objects, not escaped strings
    assert recs[1]["payload"] == {"a": 1, "b": "x"}
    assert "payload" not in recs[3]  # null dropped
    # default: inference off, payload stays a string column
    to_singer(df, "s", out, keys=["id"], filename="plain.singer")
    lines2 = [json.loads(l) for l in open(f"{out}/plain.singer")]
    assert lines2[0]["schema"]["properties"]["payload"]["type"][0] == "string"


def test_to_export_pk_fallback_from_catalog(spark, tmp_path):
    """toExport parity (etl-utils.ts:50-51): without explicit keys the
    Singer export pulls key_properties from Reader.get_pk."""
    sync = tmp_path / "sync-output"
    sync.mkdir()
    (sync / "users-1.csv").write_text("id,name\n1,Ann\n")
    (tmp_path / "catalog.json").write_text(
        json.dumps(
            {
                "streams": [
                    {
                        "stream": "users",
                        "schema": {"properties": {"id": {"type": ["integer", "null"]}}},
                        "metadata": [
                            {"breadcrumb": [], "metadata": {"table-key-properties": ["id"]}}
                        ],
                    }
                ]
            }
        )
    )
    df = spark.createDataFrame([(1, "Ann")], "id long, name string")
    out = tmp_path / "out"
    to_export(
        df, "users", str(out), export_format="singer",
        input_dir=str(sync), root_dir=str(tmp_path),
    )
    schema_msg = json.loads((out / "data.singer").read_text().splitlines()[0])
    assert schema_msg["key_properties"] == ["id"]
    # explicit keys still win over the Reader fallback
    to_export(
        df, "users", str(out), keys=["name"], export_format="singer",
        input_dir=str(sync), root_dir=str(tmp_path), filename="explicit.singer",
    )
    schema_msg2 = json.loads((out / "explicit.singer").read_text().splitlines()[0])
    assert schema_msg2["key_properties"] == ["name"]


def test_to_singer_use_catalog_schema_env(spark, tmp_path, monkeypatch):
    """USE_CATALOG_SCHEMA parity (singer.ts:307, 324-328): the env var
    loads the catalog schema and parses object-typed string columns."""
    (tmp_path / "catalog.json").write_text(
        json.dumps(
            {
                "streams": [
                    {
                        "stream": "users",
                        "schema": {
                            "properties": {
                                "id": {"type": ["integer", "null"]},
                                "payload": {
                                    "type": ["object", "null"],
                                    "properties": {"a": {"type": ["integer", "null"]}},
                                },
                            }
                        },
                        "metadata": [],
                    }
                ]
            }
        )
    )
    df = spark.createDataFrame([(1, '{"a": 7}')], "id long, payload string")

    # env unset: payload stays a plain string
    to_singer(df, "users", str(tmp_path), keys=["id"], allow_objects=True,
              root_dir=str(tmp_path), filename="plain.singer")
    plain = [json.loads(l) for l in open(tmp_path / "plain.singer")]
    assert plain[0]["schema"]["properties"]["payload"]["type"] == ["string", "null"]
    assert plain[1]["record"]["payload"] == '{"a": 7}'

    # env set: catalog schema applied + JSON string parsed to an object
    monkeypatch.setenv("USE_CATALOG_SCHEMA", "true")
    to_singer(df, "users", str(tmp_path), keys=["id"], allow_objects=True,
              root_dir=str(tmp_path), filename="catalog.singer")
    cat = [json.loads(l) for l in open(tmp_path / "catalog.singer")]
    assert cat[0]["schema"]["properties"]["payload"]["properties"]["a"]["type"] == [
        "integer", "null",
    ]
    assert cat[1]["record"]["payload"] == {"a": 7}


def test_gen_singer_header_recursive_typing_key_merge(spark):
    """recursiveTyping parity (singer.ts:89-119): array-of-object items
    merge keys across rows, not just the first element of the first row."""
    df = spark.createDataFrame(
        [
            (1, '[{"a": 1}]'),
            (2, '[{"b": "x"}]'),
            (3, '[{"c": true}, {"a": 9}]'),
        ],
        "id long, tags string",
    )
    _, header = gen_singer_header(
        df, allow_objects=True, infer_json_strings=True, recursive_typing=True
    )
    items = header["properties"]["tags"]["items"]
    assert set(items["properties"]) == {"a", "b", "c"}
    assert items["properties"]["a"]["type"][0] == "integer"
    assert items["properties"]["b"]["type"][0] == "string"
    assert items["properties"]["c"]["type"][0] == "boolean"

    # recursive_typing=False (first-value sampling): only the first
    # row's keys — NOT the default, which is True per singer.ts:304
    _, header_first = gen_singer_header(
        df, allow_objects=True, infer_json_strings=True, recursive_typing=False
    )
    assert set(header_first["properties"]["tags"]["items"]["properties"]) == {"a"}

    # records parse with the merged schema: absent keys are null-filled
    modified, _ = gen_singer_header(
        df, allow_objects=True, infer_json_strings=True, recursive_typing=True
    )
    rows = {r["id"]: r["tags"] for r in modified.collect()}
    assert rows[2][0]["b"] == "x" and rows[2][0]["a"] is None


def test_to_export_empty_keys_falls_back_to_pk(spark, tmp_path):
    """|| parity (etl-utils.ts:51): keys=[] is falsy in JS, so an empty
    list ALSO falls back to Reader.get_pk — not just keys=None."""
    sync = tmp_path / "sync-output"
    sync.mkdir()
    (sync / "users-1.csv").write_text("id,name\n1,Ann\n")
    (tmp_path / "catalog.json").write_text(
        json.dumps(
            {
                "streams": [
                    {
                        "stream": "users",
                        "schema": {"properties": {"id": {"type": ["integer", "null"]}}},
                        "metadata": [
                            {"breadcrumb": [], "metadata": {"table-key-properties": ["id"]}}
                        ],
                    }
                ]
            }
        )
    )
    df = spark.createDataFrame([(1, "Ann")], "id long, name string")
    out = tmp_path / "out"
    to_export(
        df, "users", str(out), keys=[], export_format="singer",
        input_dir=str(sync), root_dir=str(tmp_path),
    )
    schema_msg = json.loads((out / "data.singer").read_text().splitlines()[0])
    assert schema_msg["key_properties"] == ["id"]


def test_to_singer_catalog_stream_without_env(spark, tmp_path, monkeypatch):
    """Dispatcher parity (singer.ts:324): `if (catalogSchema ||
    catalogStream)` — passing catalog_stream alone (no USE_CATALOG_SCHEMA
    env var) must trigger the catalog-schema path."""
    monkeypatch.delenv("USE_CATALOG_SCHEMA", raising=False)
    (tmp_path / "catalog.json").write_text(
        json.dumps(
            {
                "streams": [
                    {
                        "stream": "people",
                        "schema": {
                            "properties": {
                                "id": {"type": ["integer", "null"]},
                                "payload": {
                                    "type": ["object", "null"],
                                    "properties": {"a": {"type": ["integer", "null"]}},
                                },
                            }
                        },
                        "metadata": [],
                    }
                ]
            }
        )
    )
    df = spark.createDataFrame([(1, '{"a": 7}')], "id long, payload string")
    to_singer(df, "users", str(tmp_path), keys=["id"], allow_objects=True,
              root_dir=str(tmp_path), catalog_stream="people",
              filename="bystream.singer")
    msgs = [json.loads(l) for l in open(tmp_path / "bystream.singer")]
    assert msgs[0]["schema"]["properties"]["payload"]["properties"]["a"]["type"] == [
        "integer", "null",
    ]
    assert msgs[1]["record"]["payload"] == {"a": 7}


def test_merged_array_schema_last_seen_wins(spark):
    """Object.assign parity (singer.ts:96-100): when the same key
    appears with different types across rows, the LAST-seen value's
    schema wins."""
    df = spark.createDataFrame(
        [
            (1, '[{"a": 1}]'),
            (2, '[{"a": "text"}]'),
        ],
        "id long, tags string",
    )
    _, header = gen_singer_header(
        df, allow_objects=True, infer_json_strings=True, recursive_typing=True
    )
    items = header["properties"]["tags"]["items"]
    assert items["properties"]["a"]["type"][0] == "string"
