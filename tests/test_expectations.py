"""check_expectations: one-pass constraint report — classification,
NULL semantics per constraint kind, uniqueness with NULL keys, FK
anti-join, and the one-aggregate plan shape."""

import pytest
from pyspark.sql import functions as F

from gluestick_ts_spark.operators.expectations import (
    check_expectations,
    check_foreign_key,
    expect,
    expect_in,
    expect_not_null,
    expect_range,
    expect_regex,
    expect_unique,
)


@pytest.fixture()
def tbl(spark):
    return spark.createDataFrame(
        [
            (1, "a@x.io", 10.0, "open"),
            (2, "bad-email", 150.0, "open"),
            (2, None, -5.0, "weird"),
            (None, "c@y.io", 50.0, "closed"),
            (4, "d@z.io", None, "open"),
        ],
        "id long, email string, amount double, status string",
    )


def _report(df):
    return {r.constraint: (r.violations, r.total, r.passed) for r in df.collect()}


def test_row_level_constraints(tbl):
    rep = _report(
        check_expectations(
            tbl,
            [
                expect_not_null("id"),
                expect_not_null("email"),
                expect_range("amount", 0, 100),
                expect_regex("email", r"^[^@]+@[^@]+\.[^@]+$"),
                expect_in("status", ["open", "closed"]),
            ],
        )
    )
    assert rep["not_null(id)"] == (1, 5, False)
    assert rep["not_null(email)"] == (1, 5, False)
    # NULL amount is NOT a range violation; 150 and -5 are
    assert rep["range(amount)"] == (2, 5, False)
    assert rep["regex(email)"] == (1, 5, False)  # NULL email skipped here
    assert rep["in(status)"] == (1, 5, False)


def test_unique_and_custom(tbl):
    rep = _report(
        check_expectations(
            tbl,
            [
                expect_unique("id"),  # two id=2 rows; NULL id excluded
                expect("amount_gt_id", F.col("amount") <= F.col("id")),
            ],
        )
    )
    assert rep["unique(id)"] == (1, 5, False)
    # custom: violation when amount <= id; NULL comparisons count as
    # violations (unevaluable must not pass): (2,-5) plus the NULL-id
    # and NULL-amount rows
    assert rep["amount_gt_id"][0] == 3


def test_unique_composite_and_all_pass(spark):
    df = spark.createDataFrame(
        [(1, "x"), (1, "y"), (2, "x"), (None, "x"), (None, "x")],
        "a long, b string",
    )
    rep = _report(check_expectations(df, [expect_unique(["a", "b"])]))
    # NULL-keyed rows excluded entirely: 3 non-null keys, all distinct
    assert rep["unique(a,b)"] == (0, 5, True)


def test_validation_errors(tbl):
    with pytest.raises(ValueError, match="no constraints"):
        check_expectations(tbl, [])
    with pytest.raises(ValueError, match="duplicate"):
        check_expectations(tbl, [expect_not_null("id"), expect_not_null("id")])


def test_foreign_key(spark, tbl):
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    rep = _report(check_foreign_key(tbl, "id", parent, "pk"))
    # id=4 dangles; NULL id skipped (SQL FK semantics)
    assert rep["foreign_key(id)"] == (1, 5, False)
    with pytest.raises(ValueError, match="arity"):
        check_foreign_key(tbl, ["id", "email"], parent, "pk")


def test_report_is_one_aggregate_pass(tbl):
    out = check_expectations(
        tbl,
        [
            expect_not_null("id"),
            expect_range("amount", 0, 100),
            expect_unique("id"),
        ],
    )
    spark = tbl.sparkSession
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = out._jdf.queryExecution().explainString(mode)
    # however many constraints ride, the table is scanned once and the
    # report never touches Python (detail-section headers only — the
    # formatted plan prints each node in the tree AND its detail block)
    import re

    scans = re.findall(r"\(\d+\) (?:Scan|LocalTableScan)", plan)
    assert len(scans) <= 1, scans
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan, node


def test_awkward_names_and_columns_survive(spark):
    """Constraint display names with quotes and key columns with commas
    must not corrupt the report: names enter only as escaped literals,
    unique keys ride out-of-band (never re-parsed from the name)."""
    df = (
        spark.createDataFrame(
            [(1, "p"), (1, "q"), (2, "p")], "a long, b string"
        )
        .withColumn("both", F.concat_ws("|", "a", "b"))
        .withColumnRenamed("both", "a,b")
    )
    rep = _report(
        check_expectations(
            df,
            [
                expect("it's odd", F.col("a") % 2 == 1),
                expect_unique("a,b"),   # ONE column literally named "a,b"
            ],
        )
    )
    assert rep["it's odd"] == (2, 3, False)
    assert rep["unique(a,b)"] == (0, 3, True)  # 3 distinct "a|b" strings
    # a,b-vs-(a,b) disambiguation: duplicate the a=1,b="p" row — the
    # comma-named column AND the real pair now each hold one duplicate,
    # but a SUBSEQUENT duplicate only in the pair interpretation
    # (same (a,b), different "a,b") must count ONLY for the pair
    extra = spark.createDataFrame([(1, "p", "X")], "a long, b string, `a,b` string")
    dup = df.unionByName(extra)
    one_col = _report(check_expectations(dup, [expect_unique("a,b")]))
    pair = _report(check_expectations(dup, [expect_unique(["a", "b"])]))
    assert one_col["unique(a,b)"][0] == 0   # "X" is a new value: no dup
    assert pair["unique(a,b)"][0] == 1      # (1,"p") repeats: one dup
    with pytest.raises(ValueError, match="expect_unique"):
        check_expectations(df, [("custom", None)])


def test_quantile_constraint(tbl, spark):
    """Dataset-level quantile gate rides the same one-scan report:
    in-band passes, out-of-band fails with violations=1, an all-NULL
    column is an (unevaluable) violation, exact and approx agree on
    clean data, and the scan count stays 1."""
    from gluestick_ts_spark.operators.expectations import expect_quantile

    # amounts present: 10, 150, -5, 50 -> exact median (interpolated,
    # NULLs ignored) = 30.0
    rep = _report(
        check_expectations(
            tbl,
            [
                expect_quantile("amount", 0.5, 0, 100, exact=True),
                expect_not_null("id"),
            ],
        )
    )
    assert rep["quantile(amount,0.5)"] == (0, 5, True)

    rep = _report(
        check_expectations(
            tbl, [expect_quantile("amount", 0.5, 1000, 2000, exact=True)]
        )
    )
    assert rep["quantile(amount,0.5)"] == (1, 5, False)

    # approx sketch path (the streaming-compatible default)
    rep = _report(
        check_expectations(tbl, [expect_quantile("amount", 0.5, 0, 100)])
    )
    assert rep["quantile(amount,0.5)"] == (0, 5, True)

    # all-NULL column: unevaluable -> violation
    allnull = spark.createDataFrame(
        [(1, None), (2, None)], "id long, v double"
    )
    rep = _report(
        check_expectations(allnull, [expect_quantile("v", 0.9, 0, 1)])
    )
    assert rep["quantile(v,0.9)"] == (1, 2, False)

    with pytest.raises(ValueError, match="q must be"):
        expect_quantile("v", 1.5, 0, 1)

    # one-scan shape survives the mixed row-level + dataset-level report
    out = check_expectations(
        tbl,
        [
            expect_not_null("id"),
            expect_quantile("amount", 0.95, -100, 1000),
            expect_unique("id"),
        ],
    )
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = out._jdf.queryExecution().explainString(mode)
    import re

    scans = re.findall(r"\(\d+\) (?:Scan|LocalTableScan)", plan)
    assert len(scans) <= 1, scans
