"""Timestamp-flavor robustness for the parquet source layer.

The same logical instant can reach us as parquet ``timestamp[ns]``,
``timestamp[us]`` without timezone (Spark ``TIMESTAMP_NTZ``), or
``timestamp[us, tz=UTC]`` depending on which engine wrote the file.
``read_parquet_compat`` must emit ONE flavor — session-TZ
``TimestampType`` — with exact values, for all of them (this class of
hazard broke ``sessionize_events`` in round 4 when the fixture writer
switched ns -> us-NTZ).
"""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampType

from gluestick_ts_spark.sources.parquet_compat import read_parquet_compat

# Exact microsecond instants (UTC wall clock).
_INSTANTS = [
    dt.datetime(2024, 3, 1, 12, 0, 0, 123456),
    dt.datetime(2024, 3, 1, 12, 30, 0, 1),
    dt.datetime(1999, 12, 31, 23, 59, 59, 999999),
]


def _write(tmp_path, arrow_type, tz_aware: bool) -> str:
    vals = [
        v.replace(tzinfo=dt.timezone.utc) if tz_aware else v for v in _INSTANTS
    ]
    table = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array(vals, arrow_type),
        }
    )
    path = str(tmp_path / "t.parquet")
    pq.write_table(table, path)
    return path


@pytest.mark.parametrize(
    "arrow_type,tz_aware,label",
    [
        (pa.timestamp("us"), False, "us_ntz"),
        (pa.timestamp("ns"), False, "ns"),
        (pa.timestamp("us", tz="UTC"), True, "us_utc"),
    ],
)
def test_all_flavors_arrive_as_timestamp_type(
    spark, tmp_path, arrow_type, tz_aware, label
):
    path = _write(tmp_path, arrow_type, tz_aware)
    df = read_parquet_compat(spark, path)
    assert isinstance(df.schema["ts"].dataType, TimestampType), label
    got = [r.ts for r in df.orderBy("event_id").collect()]
    assert got == _INSTANTS, label


def test_unix_micros_works_on_every_flavor(spark, tmp_path):
    # the exact round-4 failure mode: unix_micros rejects TIMESTAMP_NTZ
    path = _write(tmp_path, pa.timestamp("us"), tz_aware=False)
    df = read_parquet_compat(spark, path)
    micros = [r.m for r in df.select(F.unix_micros("ts").alias("m")).collect()]
    expected = [
        int(v.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
        for v in _INSTANTS
    ]
    assert sorted(micros) == sorted(expected)


def test_non_timestamp_schema_untouched(spark, tmp_path):
    table = pa.table({"k": pa.array([1, 2], pa.int64()), "s": pa.array(["a", "b"])})
    path = str(tmp_path / "plain.parquet")
    pq.write_table(table, path)
    df = read_parquet_compat(spark, path)
    assert [f.name for f in df.schema.fields] == ["k", "s"]
    assert df.count() == 2
