"""Declarative data-quality expectations, verified in ONE corpus pass.

An ETL platform that snapshots and re-syncs streams (the reference's
whole job — ``etl-utils.ts:258-355``) eventually needs to ASSERT
things about a batch before merging it: pk present and unique, values
in range, formats valid, foreign keys resolvable. The Deequ/Great
Expectations pattern: declare constraints, evaluate them all in one
scan, get a per-constraint report instead of a crash halfway through
a merge.

Spark-first shape: every row-level constraint compiles to a
conditional-count expression and ALL of them fold into ONE map-side-
combined aggregate (plus ``count_distinct`` for uniqueness — Catalyst
plans the expand in the same pass). The single 1-row aggregate then
unpivots to one row per constraint via ``stack`` — still engine-level,
no driver loop over constraints. At 100 TB the whole report costs one
scan regardless of how many constraints ride it; only referential
integrity (``check_foreign_key``) needs a second relation, and that is
one broadcast/shuffle anti-join, never a driver-side set.

No reference counterpart (extension op — the validation gate an
ingest pipeline runs before ``snapshot_records``; sibling of
``functions/schema_drift.py``, which gates the SCHEMA the same way
this gates the VALUES).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "expect",
    "expect_not_null",
    "expect_unique",
    "expect_range",
    "expect_regex",
    "expect_in",
    "expect_quantile",
    "check_expectations",
    "check_foreign_key",
]


class _AggConstraint:
    """A DATASET-level constraint: its violation count is an aggregate
    expression evaluated in the shared one-scan pass (0 = holds, 1 =
    violated), not a per-row predicate count."""

    def __init__(self, violations: Column):
        self.violations = violations


def expect(name: str, violation: Column) -> tuple[str, Column]:
    """A named constraint from an arbitrary per-row violation
    predicate (NULL predicate results count as violations — an
    unevaluable constraint must not silently pass)."""
    return (name, F.coalesce(violation, F.lit(True)))


def expect_not_null(col: str) -> tuple[str, Column]:
    return (f"not_null({col})", F.col(col).isNull())


def expect_range(col: str, lo, hi) -> tuple[str, Column]:
    """NULLs are not range violations — compose with expect_not_null
    when absence itself is the defect."""
    return (
        f"range({col})",
        F.col(col).isNotNull() & ~F.col(col).between(F.lit(lo), F.lit(hi)),
    )


def expect_regex(col: str, pattern: str) -> tuple[str, Column]:
    return (
        f"regex({col})",
        F.col(col).isNotNull() & ~F.col(col).rlike(pattern),
    )


def expect_in(col: str, values: list) -> tuple[str, Column]:
    return (
        f"in({col})",
        F.col(col).isNotNull() & ~F.col(col).isin(list(values)),
    )


def expect_unique(cols: str | list[str]) -> tuple[str, None]:
    """Key-uniqueness constraint (violations = rows beyond the first
    per key = count − distinct count). Rows with a NULL key component
    are excluded from both counts — flag absence with
    expect_not_null, not a uniqueness artifact."""
    cols = [cols] if isinstance(cols, str) else list(cols)
    # the key columns ride OUT-OF-BAND (second element), never parsed
    # back out of the display name — a column name containing ',' or
    # ')' must not change which key gets checked
    return (f"unique({','.join(cols)})", list(cols))


def expect_quantile(
    col: str, q: float, lo, hi, exact: bool = False
) -> tuple[str, "_AggConstraint"]:
    """Dataset-level distribution constraint: the ``q``-quantile of
    ``col`` must lie in ``[lo, hi]`` (the Deequ ``hasApproxQuantile``
    gate — catches unit regressions like cents-vs-dollars that no
    per-row range check can, since every individual value may still
    be in range). Rides the SAME one-scan aggregate as the row-level
    constraints; ``violations`` is 0 or 1 (an unevaluable quantile —
    all-NULL column — is a violation, mirroring ``expect``'s rule).

    ``exact=False`` (default) uses the mergeable ``percentile_approx``
    sketch — the 100 TB path, and the only form a streaming window
    aggregation accepts; ``exact=True`` uses the interpolated exact
    ``percentile`` (sort-based — batch gates only)."""
    if not (0.0 <= float(q) <= 1.0):
        raise ValueError(f"q must be in [0, 1], got {q}")
    c = F.col(col)
    qa = (
        F.percentile(c, F.lit(float(q)))
        if exact
        else F.percentile_approx(c, F.lit(float(q)))
    )
    in_band = qa.between(F.lit(lo), F.lit(hi))
    return (
        f"quantile({col},{q})",
        _AggConstraint(
            F.when(F.coalesce(in_band, F.lit(False)), F.lit(0))
            .otherwise(F.lit(1))
            .cast("long")
        ),
    )


def _constraint_aggs(
    constraints: list, caller: str, distinct_fn
) -> tuple[list[str], list[Column]]:
    """Shared agg-builder for the batch and streaming gates: validate
    names, compile each constraint to an aggregate aliased ``__c{i}``
    (positional aliases, so arbitrary display names never reach an SQL
    identifier), and return (names, aggs). ``distinct_fn`` is the
    distinct-count aggregate uniqueness uses — exact in batch, approx
    in streaming."""
    if not constraints:
        raise ValueError(f"{caller}: no constraints given")
    names = [n for n, _ in constraints]
    if len(set(names)) != len(names):
        raise ValueError(f"{caller}: duplicate constraint names in {names}")
    aggs = [F.count(F.lit(1)).alias("__total")]
    for i, (name, viol) in enumerate(constraints):
        alias = f"__c{i}"
        if isinstance(viol, _AggConstraint):  # dataset-level (quantile)
            aggs.append(viol.violations.alias(alias))
        elif isinstance(viol, (list, tuple)):  # expect_unique key columns
            any_null = None
            for c in viol:
                isnull = F.col(c).isNull()
                any_null = isnull if any_null is None else (any_null | isnull)
            nonnull = F.count(F.when(~any_null, F.lit(1)))
            key = F.struct(*[F.col(c) for c in viol])
            # a struct with a NULL field is still a non-NULL struct, so
            # the distinct count would see null-keyed rows; mask them
            # out to mirror the non-null row count above
            delta = nonnull - distinct_fn(F.when(~any_null, key))
            # approx distinct can overshoot the true count on small
            # frames; a negative violation count reads as corruption
            aggs.append(F.greatest(delta, F.lit(0)).alias(alias))
        elif viol is None:
            raise ValueError(
                f"{caller}: constraint {name!r} has no predicate — "
                "uniqueness must come from expect_unique(...), which "
                "carries its key columns"
            )
        else:
            aggs.append(F.count(F.when(viol, F.lit(1))).alias(alias))
    return names, aggs


def _stack_report(names: list[str]) -> Column:
    """Unpivot the 1-row constraint summary to (constraint, violations)
    rows. Display names enter only as escaped string LITERALS; the
    value side references the positional ``__c{i}`` aliases, so no
    user-chosen name ever becomes an SQL identifier."""
    def lit(s: str) -> str:
        return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

    return F.expr(
        "stack({n}, {args}) as (constraint, violations)".format(
            n=len(names),
            args=", ".join(f"{lit(n)}, __c{i}" for i, n in enumerate(names)),
        )
    )


def check_expectations(
    df: DataFrame, constraints: list[tuple[str, Column | list[str]]]
) -> DataFrame:
    """Evaluate every constraint in one aggregate pass. Returns one
    row per constraint: ``(constraint, violations, total, passed)``
    where ``total`` is the table row count and ``passed`` is
    ``violations == 0``. Constraint names must be unique — the report
    keys on them."""
    names, aggs = _constraint_aggs(
        constraints, "check_expectations", F.count_distinct
    )
    one = df.agg(*aggs)
    return one.select(
        _stack_report(names), F.col("__total").alias("total")
    ).select(
        "constraint",
        "violations",
        "total",
        (F.col("violations") == 0).alias("passed"),
    )


def check_foreign_key(
    child: DataFrame, fk: str | list[str], parent: DataFrame, pk: str | list[str]
) -> DataFrame:
    """Referential-integrity report: child rows whose (non-NULL) fk
    resolves to no parent pk. One anti-join against the DISTINCT
    parent keys (broadcast when small, else a key shuffle) + the
    child count — same report schema as ``check_expectations``.
    NULL fk components are skipped (SQL FK semantics: unknowable,
    not dangling)."""
    fks = [fk] if isinstance(fk, str) else list(fk)
    pks = [pk] if isinstance(pk, str) else list(pk)
    if len(fks) != len(pks):
        raise ValueError("check_foreign_key: fk/pk arity mismatch")
    keys = parent.select(
        *[F.col(p).alias(f) for p, f in zip(pks, fks)]
    ).distinct()
    nonnull = child
    for f in fks:
        nonnull = nonnull.where(F.col(f).isNotNull())
    dangling = nonnull.join(keys, on=fks, how="left_anti")
    name = f"foreign_key({','.join(fks)})"
    return (
        dangling.agg(F.count(F.lit(1)).alias("violations"))
        .crossJoin(child.agg(F.count(F.lit(1)).alias("total")))
        .select(
            F.lit(name).alias("constraint"),
            "violations",
            "total",
            (F.col("violations") == 0).alias("passed"),
        )
    )
