"""Distribution drift between two dataset generations (PSI / JS).

The expectations gate (``operators/expectations.py``) answers "is this
batch VALID"; this module answers the next question a production
pipeline asks: "is this batch DIFFERENT" — has the incoming
distribution of a column drifted from the reference corpus the models
were trained (or the quotas were tuned) on. The standard instruments:

- **PSI** (population stability index, the credit-scoring / model-
  monitoring metric): ``Σ (p_cur − p_ref) · ln(p_cur / p_ref)`` over
  shared buckets. Rule-of-thumb thresholds: < 0.1 stable, 0.1–0.25
  drifting, > 0.25 shifted.
- **JS divergence** (symmetric, bounded [0, ln 2], defined even for
  disjoint supports) rides along per bucket for free.

Spark-first shape: ONE aggregate per side (map-side combined) down to
≤ ``bins`` (or distinct-category) rows, then a full-outer join of two
TINY relations and in-row arithmetic — at 100 TB the corpus passes
are the whole cost and nothing else grows. Numeric columns bucket by
quantile cut points computed on the REFERENCE side only
(``approx_percentile``, one extra tiny aggregate) so the bucketing is
frozen against the baseline — the current side re-uses the cuts, the
standard PSI recipe. Zero-count buckets are smoothed with a small
epsilon so a vanished or new category contributes a large-but-finite
PSI instead of ±inf.

No reference counterpart (extension op — monitoring family beside
``check_expectations``, ``stream_corpus_profile`` and
``rolling_zscore``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["distribution_drift", "psi_total"]

_EPS = 1e-6


def _bucket_expr(col: str, cuts: list[float]) -> Column:
    """Equi-depth bucket id from frozen cut points: bucket i holds
    values in (cuts[i-1], cuts[i]]; underflow clamps to 0, overflow to
    the last bucket (current-side values outside the reference range
    must land SOMEWHERE visible, not vanish)."""
    # the chain itself bounds the id: the largest branch assigns
    # len(cuts), so overflow values land in the last bucket by
    # construction — no extra clamp needed
    b = F.lit(0)
    for i, c in enumerate(cuts):
        b = F.when(F.col(col) > F.lit(float(c)), i + 1).otherwise(b)
    return b


def distribution_drift(
    ref: DataFrame,
    cur: DataFrame,
    col: str,
    kind: str = "categorical",
    bins: int = 10,
) -> DataFrame:
    """Per-bucket drift report between a reference and a current
    generation of ``col``: ``(bucket, n_ref, n_cur, p_ref, p_cur,
    psi_contrib, js_contrib)``. Sum ``psi_contrib`` (or call
    ``psi_total``) for the headline index.

    ``kind='categorical'`` buckets by value (cast to string; NULL is
    its own bucket — a drifting null rate IS drift). ``kind='numeric'``
    buckets by ``bins`` equi-depth quantile cut points computed on the
    REFERENCE side and frozen (one `approx_percentile` aggregate, ≤
    bins−1 driver-held doubles); NULLs are excluded from numeric
    buckets — pair with a categorical drift on null-ness if that
    matters. High-cardinality categorical columns should be hashed or
    topped-K first: the report is one row per category.
    """
    if kind not in ("categorical", "numeric"):
        raise ValueError("distribution_drift: kind must be 'categorical' or 'numeric'")
    if kind == "numeric":
        if bins < 2:
            raise ValueError("distribution_drift: need bins >= 2")
        qs = [i / bins for i in range(1, bins)]
        cuts = ref.select(
            F.percentile_approx(F.col(col).cast("double"), qs).alias("q")
        ).first()["q"]
        if cuts is None:
            raise ValueError(
                f"distribution_drift: reference side has no non-null {col!r}"
            )
        # collapse duplicate cuts (constant-ish columns) to keep
        # buckets well-defined
        cuts = sorted({float(c) for c in cuts})
        bexpr = lambda: _bucket_expr(col, cuts)  # noqa: E731
        r = ref.where(F.col(col).isNotNull()).select(
            bexpr().cast("string").alias("bucket")
        )
        c = cur.where(F.col(col).isNotNull()).select(
            bexpr().cast("string").alias("bucket")
        )
    else:
        r = ref.select(
            F.coalesce(F.col(col).cast("string"), F.lit("<NULL>")).alias("bucket")
        )
        c = cur.select(
            F.coalesce(F.col(col).cast("string"), F.lit("<NULL>")).alias("bucket")
        )
    ra = r.groupBy("bucket").agg(F.count("*").alias("n_ref"))
    ca = c.groupBy("bucket").agg(F.count("*").alias("n_cur"))
    j = ra.join(ca, on="bucket", how="full_outer").select(
        "bucket",
        F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
        F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
    )
    # totals via a window over the tiny joined relation — no second
    # corpus pass, no driver round-trip
    from pyspark.sql import Window

    w = Window.partitionBy()
    p_ref = F.greatest(
        F.col("n_ref") / F.sum("n_ref").over(w), F.lit(_EPS)
    )
    p_cur = F.greatest(
        F.col("n_cur") / F.sum("n_cur").over(w), F.lit(_EPS)
    )
    m = (p_ref + p_cur) / 2
    return (
        j.withColumn("p_ref", p_ref)
        .withColumn("p_cur", p_cur)
        .withColumn(
            "psi_contrib",
            (F.col("p_cur") - F.col("p_ref"))
            * F.log(F.col("p_cur") / F.col("p_ref")),
        )
        .withColumn(
            "js_contrib",
            (F.col("p_cur") * F.log(F.col("p_cur") / m)
             + F.col("p_ref") * F.log(F.col("p_ref") / m)) / 2,
        )
    )


def psi_total(report: DataFrame) -> float:
    """Headline PSI from a ``distribution_drift`` report (one tiny
    aggregate over ≤ bins rows)."""
    return float(
        report.agg(F.sum("psi_contrib").alias("s")).first()["s"] or 0.0
    )
