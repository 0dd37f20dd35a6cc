"""Vector math over ``array<float>`` embedding columns.

Scale-extension functions (SURVEY §2.2 "Extensions"): dot product,
norms, cosine similarity — built from ``zip_with`` / ``aggregate``
higher-order functions so the arithmetic stays JVM-side (no UDF, no
Python). All math is done in double precision regardless of the input
element type so results are engine-portable (DuckDB oracle computes
the same left-to-right double sums).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["dot_expr", "norm_expr", "cosine_similarity_expr", "l2_distance_expr"]


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _as_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot_expr(a: Column | str, b: Column | str) -> Column:
    """Dot product of two equal-length numeric arrays, in double."""
    prods = F.zip_with(_as_double(_col(a)), _as_double(_col(b)), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm_expr(a: Column | str) -> Column:
    """Euclidean norm."""
    return F.sqrt(dot_expr(a, a))


def cosine_similarity_expr(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity in double precision; NULL-safe — zero vectors
    yield NULL via ``try_divide`` (a bare ``/`` THROWS under Spark 4's
    default ANSI mode, breaking the documented contract the moment a
    zero/NULL vector reaches any cosine path), matching DuckDB's
    ``list_cosine_similarity`` NaN-avoidance contract closely enough
    for thresholded use."""
    return F.try_divide(dot_expr(a, b), norm_expr(a) * norm_expr(b))


def l2_distance_expr(a: Column | str, b: Column | str) -> Column:
    """Euclidean distance."""
    diffs = F.zip_with(_as_double(_col(a)), _as_double(_col(b)), lambda x, y: (x - y) * (x - y))
    return F.sqrt(F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x))
