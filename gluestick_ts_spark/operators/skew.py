"""Skew-mitigation utilities for 100 TB-scale shuffles.

AQE's skew-join splitting (on by default in ``session.py``) handles
most runtime skew; these helpers cover the cases it can't:

- ``salted_join`` — a hot key on the LEFT side overwhelms one task
  even after AQE splits, because every left row of that key must meet
  every matching right row. Salting spreads the hot key across
  ``n_salts`` tasks by replicating the (smaller) right side per salt.
- ``two_phase_count_distinct`` — COUNT(DISTINCT x) disables partial
  aggregation, so a skewed group funnels every raw row to one reducer.
  Phase 1 dedups (keys, x) — a full-width shuffle but with map-side
  combine; phase 2 counts per key over the already-tiny distinct set.

Both are pure DataFrame compositions — deterministic, no RDDs, no
Python row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join", "two_phase_count_distinct"]

_SALT = "__gs_salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with left-side salting: left rows get a deterministic
    salt in ``[0, n_salts)`` (hash of the whole row, so a hot key's
    rows spread evenly); the right side is replicated once per salt.

    Use when one/few left keys dominate (e.g. a null-ish default id or
    a celebrity user). Right-side cost is ``n_salts ×`` its size —
    keep the replicated side the smaller one. Result equals the plain
    join (verified in tests), only the task layout changes.

    Only left-preserving join types are supported: with ``right``/
    ``full`` joins every unmatched RIGHT row would be emitted once per
    salt (the right side is replicated), so the result would no longer
    equal the plain join. For those, swap the sides (salt the skewed
    side) and use ``left``.
    """
    if not on:
        raise ValueError("salted_join requires at least one join key")
    allowed = {
        "inner", "cross", "left", "leftouter", "left_outer",
        "semi", "leftsemi", "left_semi", "anti", "leftanti", "left_anti",
    }
    if how.lower().replace(" ", "") not in allowed:
        raise ValueError(
            f"salted_join does not support how={how!r}: the right side is "
            "replicated per salt, so right/full joins would duplicate "
            "unmatched right rows. Swap the sides and use a left join."
        )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salts))
    l_salted = left.withColumn(_SALT, salt.cast("int"))
    r_salted = right.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return l_salted.join(r_salted, on=on + [_SALT], how=how).drop(_SALT)


def two_phase_count_distinct(
    df: DataFrame,
    keys: list[str],
    col: str,
    out_col: str = "n_distinct",
) -> DataFrame:
    """``COUNT(DISTINCT col) GROUP BY keys`` as dedup-then-count: the
    distinct shuffle gets map-side combine (Spark's single-phase
    distinct aggregate does not), so a skewed key's reducer sees its
    distinct values, not its raw rows."""
    return (
        df.select(*keys, col)
        .dropDuplicates(keys + [col])
        .groupBy(*keys)
        .agg(F.count(col).alias(out_col))
    )
