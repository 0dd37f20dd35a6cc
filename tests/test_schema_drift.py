"""Schema-drift classification (pure metadata, no Spark jobs)."""

import pytest
from pyspark.sql import types as T

from gluestick_ts_spark.functions.schema_drift import (
    assert_no_drift,
    schema_drift,
)


def _st(*fields):
    return T.StructType([T.StructField(n, t, nullable) for n, t, nullable in fields])


def test_drift_classes_and_widening():
    old = _st(
        ("id", T.IntegerType(), True),
        ("price", T.FloatType(), True),
        ("gone", T.StringType(), True),
        ("code", T.LongType(), True),
        ("note", T.StringType(), False),
    )
    new = _st(
        ("id", T.LongType(), True),        # widening
        ("price", T.DoubleType(), True),   # widening
        ("code", T.BooleanType(), True),   # BREAKING
        ("note", T.StringType(), True),    # nullability
        ("fresh", T.StringType(), True),   # added
    )
    d = schema_drift(old, new)
    assert d.added == ["fresh"]
    assert d.removed == ["gone"]
    assert ("id", "int", "bigint", True) in d.type_changed
    assert ("price", "float", "double", True) in d.type_changed
    assert d.breaking == [("code", "bigint", "boolean")]
    assert d.nullability_changed == ["note"]
    with pytest.raises(ValueError, match="code: bigint -> boolean"):
        assert_no_drift(old, new)


def test_container_element_widening():
    old = _st(
        ("tags", T.ArrayType(T.IntegerType()), True),
        ("m", T.MapType(T.StringType(), T.FloatType()), True),
        ("bad", T.ArrayType(T.StringType()), True),
        ("kind", T.ArrayType(T.IntegerType()), True),
    )
    new = _st(
        ("tags", T.ArrayType(T.LongType()), True),                  # widening
        ("m", T.MapType(T.StringType(), T.DoubleType()), True),    # widening
        ("bad", T.ArrayType(T.BooleanType()), True),               # BREAKING
        ("kind", T.MapType(T.IntegerType(), T.IntegerType()), True),  # BREAKING
    )
    d = schema_drift(old, new)
    widenings = {p: w for p, _, _, w in d.type_changed}
    assert widenings["tags"] is True
    assert widenings["m"] is True
    assert widenings["bad"] is False
    assert widenings["kind"] is False
    assert {p for p, _, _ in d.breaking} == {"bad", "kind"}


def test_nested_struct_paths_and_no_drift():
    inner_old = _st(("k", T.IntegerType(), True))
    inner_new = _st(("k", T.LongType(), True))  # widening
    old = _st(("meta", inner_old, True))
    new = _st(("meta", inner_new, True))
    d = assert_no_drift(old, new)  # widening only: passes
    assert d.type_changed == [("meta.k", "int", "bigint", True)]
    same = schema_drift(old, old)
    assert not same


def test_snapshot_merge_rejects_breaking_drift(spark, tmp_path):
    from pyspark.sql import functions as F

    from gluestick_ts_spark.operators.snapshot import snapshot_records

    d = str(tmp_path)
    b1 = spark.createDataFrame([(1, 10)], "id long, amount int")
    snapshot_records(b1, "s", d, pk="id")
    # widening batch (int -> long, the merge coercion's own promotion)
    # passes the gate and merges
    b2 = spark.createDataFrame([(2, 20)], "id long, amount long")
    merged = snapshot_records(
        b2, "s", d, pk="id", coerce_types=True, reject_on_drift=True)
    assert merged.count() == 2
    # breaking batch is rejected BEFORE any write
    b3 = spark.createDataFrame([(3, True)], "id long, id2 boolean").select(
        "id", F.col("id2").alias("amount"))
    import pytest as _pytest

    with _pytest.raises(ValueError, match="amount"):
        snapshot_records(b3, "s", d, pk="id", reject_on_drift=True)
    assert spark.read.parquet(f"{d}/s.snapshot.parquet").count() == 2
