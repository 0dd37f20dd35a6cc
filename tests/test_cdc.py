"""snapshot_diff: insert/update/delete classification, null-safe
compares, composite keys, and a pk-keyed (never broadcast-nested-loop)
join plan."""

import pytest
from pyspark.sql import functions as F

from gluestick_ts_spark.operators.cdc import snapshot_diff


@pytest.fixture()
def gens(spark):
    old = spark.createDataFrame(
        [
            (1, "a", 10.0),     # unchanged
            (2, "b", 20.0),     # value update
            (3, None, 30.0),    # NULL -> value update
            (4, "d", None),     # NULL stays NULL: unchanged
            (5, "e", 50.0),     # deleted
        ],
        "id long, name string, bal double",
    )
    new = spark.createDataFrame(
        [
            (1, "a", 10.0),
            (2, "b", 21.0),
            (3, "c", 30.0),
            (4, "d", None),
            (6, "f", 60.0),     # inserted
        ],
        "id long, name string, bal double",
    )
    return old, new


def test_classification_and_images(gens):
    old, new = gens
    out = snapshot_diff(old, new, pk="id")
    m = {r.id: r for r in out.collect()}
    assert {k: v.change_type for k, v in m.items()} == {
        2: "update", 3: "update", 5: "delete", 6: "insert"
    }
    # new image under the bare name, old image under <col>_old
    assert (m[2].bal, m[2].bal_old) == (21.0, 20.0)
    assert (m[3].name, m[3].name_old) == ("c", None)  # null-safe: a change
    assert (m[5].bal, m[5].bal_old) == (None, 50.0)   # delete: old image only
    assert (m[6].bal, m[6].bal_old) == (60.0, None)   # insert: new image only


def test_include_unchanged_and_subset_compare(gens):
    old, new = gens
    all_rows = snapshot_diff(old, new, pk="id", include_unchanged=True)
    m = {r.id: r.change_type for r in all_rows.collect()}
    assert m[1] == "unchanged" and m[4] == "unchanged"  # NULL==NULL unchanged
    assert all_rows.count() == 6
    # comparing only `name`: row 2's bal-only change becomes invisible
    sub = snapshot_diff(old, new, pk="id", compare_cols=["name"])
    m2 = {r.id: r.change_type for r in sub.collect()}
    assert m2 == {3: "update", 5: "delete", 6: "insert"}
    assert "bal" not in sub.columns and "name_old" in sub.columns


def test_composite_pk(spark):
    old = spark.createDataFrame(
        [(1, "x", 5.0), (1, "y", 6.0)], "a long, b string, v double"
    )
    new = spark.createDataFrame(
        [(1, "x", 5.5), (2, "y", 6.0)], "a long, b string, v double"
    )
    out = snapshot_diff(old, new, pk=["a", "b"])
    m = {(r.a, r.b): r.change_type for r in out.collect()}
    assert m == {
        (1, "x"): "update", (1, "y"): "delete", (2, "y"): "insert"
    }


def test_validation(gens):
    old, new = gens
    with pytest.raises(ValueError, match="snapshot_diff"):
        snapshot_diff(old, new, pk="id", compare_cols=["missing"])
    with pytest.raises(ValueError, match="snapshot_diff"):
        snapshot_diff(
            old.select("id"), new.select("id"), pk="id"
        )


def test_plan_joins_on_pk_without_nested_loop(gens):
    old, new = gens
    out = snapshot_diff(old, new, pk="id")
    spark = old.sparkSession
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = out._jdf.queryExecution().explainString(mode)
    # a diff is one pk-keyed full-outer join: shuffled equi-join (or
    # bucketed co-location), never a nested-loop/cartesian fallback
    assert "FullOuter" in plan, plan[:2000]
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan[:2000]


def test_pk_in_compare_cols_is_refused(gens):
    old, new = gens
    with pytest.raises(ValueError, match="pk columns"):
        snapshot_diff(old, new, pk="id", compare_cols=["id", "bal"])


def test_old_image_alias_collision_is_refused(spark):
    old = spark.createDataFrame([(1, "a", "b")], "id long, x string, x_old string")
    new = spark.createDataFrame([(1, "a2", "b2")], "id long, x string, x_old string")
    with pytest.raises(ValueError, match="collide"):
        snapshot_diff(old, new, pk="id")
    # narrowing compare_cols away from the colliding pair works
    ok = snapshot_diff(old, new, pk="id", compare_cols=["x_old"])
    assert {r.change_type for r in ok.collect()} == {"update"}
