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


def test_nested_struct_paths_and_no_drift():
    inner_old = _st(("k", T.IntegerType(), True))
    inner_new = _st(("k", T.StringType(), True))  # widening (to string)
    old = _st(("meta", inner_old, True))
    new = _st(("meta", inner_new, True))
    d = assert_no_drift(old, new)  # widening only: passes
    assert d.type_changed == [("meta.k", "int", "string", True)]
    same = schema_drift(old, old)
    assert not same
