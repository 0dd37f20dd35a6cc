"""Distinct-set overlap between dataset generations via Theta sketches.

"How many users are in BOTH generations?" / "what fraction of this
corpus slice's ids also appear in that one?" is the set statistic the
engine's HLL sketches fundamentally can't answer: HLL summaries union
but never intersect. DataSketches Theta sketches (Spark 4's
``theta_sketch_agg`` family) are mergeable AND intersectable, so the
overlap report costs:

- ONE map-side-combined aggregate per side, collapsing each to at most
  one sketch row per key (never raw ids crossing the wire);
- one tiny key-equi join of the two sketch relations;
- in-row set algebra (``theta_intersection`` / ``theta_union`` /
  ``theta_sketch_estimate``) for |A|, |B|, |A ∩ B|, |A ∪ B|, Jaccard
  and containment.

The exact formulation is a full id-keyed shuffle join of both sides —
cost ∝ corpus. This one's cost ∝ distinct keys, and the sketches are
EXACT below the nominal-entries threshold (4096 at Spark's default
lgNomEntries=12), estimate-with-bounded-error above it.

No reference counterpart (extension op; the reference has no
aggregation at all — SURVEY §2.2 Aggregations / Extensions rows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["distinct_overlap"]


def _sketch_side(df: DataFrame, col: str, keys: list[str], tag: str) -> DataFrame:
    g = df.groupBy(*[F.col(k) for k in keys])
    return g.agg(F.theta_sketch_agg(F.col(col)).alias(tag))


def _est(c: Column) -> Column:
    return F.theta_sketch_estimate(c).cast("double")


def distinct_overlap(
    df_a: DataFrame,
    df_b: DataFrame,
    col: str,
    keys: list[str] | None = None,
) -> DataFrame:
    """Per-key estimated distinct-set relationship between two slices:
    ``distinct_a``, ``distinct_b``, ``distinct_intersection``,
    ``distinct_union``, ``jaccard``, ``containment_a`` (share of A's
    ids also in B). ``keys=None`` yields one corpus-global row.

    A key present on only one side reports the other side (and the
    intersection) as 0 — absence is an empty set, not NULL algebra.
    A NULL key value is a first-class group (the join is null-safe),
    so NULL-keyed rows on both sides intersect like any other group.
    """
    keys = list(keys or [])
    a = _sketch_side(df_a, col, keys, "__ta")
    b = _sketch_side(df_b, col, keys, "__tb")
    if keys:
        # null-safe equi-join: a plain `on=keys` join never matches
        # NULL = NULL, which would split a both-sided NULL group into
        # two one-sided rows silently reporting intersection 0
        bb = b.select(
            *[F.col(k).alias(f"__bk_{k}") for k in keys], "__tb"
        )
        cond = None
        for k in keys:
            c = F.col(k).eqNullSafe(F.col(f"__bk_{k}"))
            cond = c if cond is None else (cond & c)
        j = a.join(bb, on=cond, how="full_outer").select(
            *[
                F.coalesce(F.col(k), F.col(f"__bk_{k}")).alias(k)
                for k in keys
            ],
            "__ta",
            "__tb",
        )
    else:
        # both sides are exactly one (possibly empty-sketch) row
        j = a.crossJoin(b)

    has_a = F.col("__ta").isNotNull()
    has_b = F.col("__tb").isNotNull()
    est_a = F.when(has_a, _est(F.col("__ta"))).otherwise(F.lit(0.0))
    est_b = F.when(has_b, _est(F.col("__tb"))).otherwise(F.lit(0.0))
    inter = F.when(
        has_a & has_b,
        _est(F.theta_intersection(F.col("__ta"), F.col("__tb"))),
    ).otherwise(F.lit(0.0))
    union = (
        F.when(has_a & has_b, _est(F.theta_union(F.col("__ta"), F.col("__tb"))))
        .when(has_a, est_a)
        .when(has_b, est_b)
        .otherwise(F.lit(0.0))
    )
    return j.select(
        *keys,
        est_a.alias("distinct_a"),
        est_b.alias("distinct_b"),
        inter.alias("distinct_intersection"),
        union.alias("distinct_union"),
        F.when(union > 0, inter / union).otherwise(F.lit(0.0)).alias("jaccard"),
        F.when(est_a > 0, inter / est_a)
        .otherwise(F.lit(0.0))
        .alias("containment_a"),
    )
