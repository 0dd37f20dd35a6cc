"""Minimal distributed ML for curation pipelines: a quality-classifier
distillation flow and its evaluation metric.

The modern curation recipe (LLaMA / RedPajama style) distills cheap
rule-based labels into a learned classifier: label documents with a
heuristic (e.g. the Gopher rules), featurize with the hashing trick
(``functions/text.py hashed_tf_expr`` — no model artifact), train a
linear classifier, then score the whole corpus map-only. Everything
here is built from Column expressions + bounded driver collects:

- ``train_logreg``: batch gradient descent for L2-regularized logistic
  regression. Per iteration, ONE aggregate computes the exact gradient
  (per-row contribution is in-row ``zip_with``/``aggregate`` math,
  map-side combined) and a ``dim``-sized collect updates the weights —
  k iterations = k corpus passes, no MLlib, no Python row path.
- ``logreg_score_expr``: sigmoid score against a constant-folded
  weight literal — map-only at any corpus size.
- ``binary_auc``: exact ROC AUC via the Mann-Whitney rank-sum with
  midrank tie handling. Midranks are exact multiples of 0.5, so the
  sums are ASSOCIATIVE-exact in doubles — the result is deterministic
  across partitionings and engines, which is what lets the driver's
  DuckDB oracle hash-check it (gradient sums here are NOT order-exact,
  so training itself is pytest-gated, not oracle-checked).

Round 12: ``operators/classifier.py`` closes that gap for the
distillation flow — its trainer exchanges gradients as exact integer
micro-units (order-free long sums), so training IS oracle-checked
there (bit-identical DuckDB re-derivation). This module keeps the
plain-float path (simpler math, any-real-valued features) and the
AUC metric; prefer ``classifier.train_logreg_hashed`` when you need
reproducibility under repartitioning or cross-engine verification.

No reference counterpart (extension ops).
"""

from __future__ import annotations

import json

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import _spread

__all__ = [
    "train_logreg",
    "logreg_score_expr",
    "binary_auc",
    "distill_quality_classifier",
    "distilled_score_expr",
]


def logreg_score_expr(
    vec_col: Column | str, weights: list[float], bias: float = 0.0
) -> Column:
    """Sigmoid(w·x + b) as a pure Column expression; ``weights`` enter
    the plan as ONE ``from_json`` literal (constant-folded)."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    w_lit = F.from_json(
        F.lit(json.dumps([float(x) for x in weights])), "array<double>"
    )
    z = (
        F.aggregate(
            F.zip_with(v, w_lit, lambda x, w: x.cast("double") * w),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        + F.lit(float(bias))
    )
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def train_logreg(
    df: DataFrame,
    vec_col: str,
    label_col: str,
    lr: float = 0.5,
    iters: int = 20,
    l2: float = 0.0,
) -> tuple[list[float], float]:
    """Batch-GD logistic regression: returns ``(weights, bias)``.

    Each iteration is one corpus pass: the per-row gradient
    contribution ``(sigmoid(w·x+b) - y) * x`` is in-row Column math,
    the mean gradient is ONE map-side-combined aggregate (a
    ``dim``-element array fold + scalar bias term), and the collect is
    ``dim`` doubles. Deterministic up to float summation order (like
    every distributed GD); quality is gated in pytest, and scoring
    with the returned frozen weights is map-only via
    ``logreg_score_expr``.
    """
    # data probe is FINE here (unlike the ANN query builders' retired
    # first() probes): training is an eager entry point that runs one
    # job per GD pass anyway — the caller expects actions
    first = df.select(F.size(vec_col)).first()
    if first is None:
        raise ValueError("train_logreg: empty input")
    dim = first[0]
    w = [0.0] * dim
    b = 0.0
    base = _spread(df).select(
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("__x"),
        F.col(label_col).cast("double").alias("__y"),
    )
    # Polyak tail-averaging: fixed-step batch GD OSCILLATES around the
    # optimum when the step outruns the local curvature (observed: one
    # iteration count lands AUC 0.96, a nearby one 0.44 on the same
    # data). Averaging the second-half iterates returns the orbit's
    # center, making the result robust to the (lr, iters) choice
    # instead of parameter-lucky.
    n_iters = max(0, iters)
    tail_from = n_iters // 2
    avg_w = [0.0] * dim
    avg_b = 0.0
    n_avg = 0
    for it in range(n_iters):
        score = logreg_score_expr("__x", w, b)
        err = (score - F.col("__y")).alias("__e")
        g = base.select(
            F.transform(F.col("__x"), lambda x: x * err).alias("__g"),
            err,
        ).agg(
            *[
                (F.sum(F.element_at("__g", i + 1)) / F.count("*")).alias(f"g{i}")
                for i in range(dim)
            ],
            (F.sum("__e") / F.count("*")).alias("gb"),
        ).first()
        w = [
            wi - lr * (float(g[f"g{i}"]) + l2 * wi) for i, wi in enumerate(w)
        ]
        b -= lr * float(g["gb"])
        if it >= tail_from:
            n_avg += 1
            avg_w = [a + (wi - a) / n_avg for a, wi in zip(avg_w, w)]
            avg_b += (b - avg_b) / n_avg
    if n_avg == 0:
        return w, b
    return avg_w, avg_b


def binary_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    ndigits: int = 6,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Exact ROC AUC (``auc``, ``n_pos``, ``n_neg``) via the
    Mann-Whitney statistic with midrank ties:

    ``AUC = (sum of positives' midranks - n_pos(n_pos+1)/2) / (n_pos * n_neg)``

    where ``midrank = rank() + (|tie group| - 1)/2`` over ascending
    score. Midranks are exact k/2 values, so the sum is bit-exact
    regardless of partition/summation order — deterministic across
    engines (the property the driver oracle checks). NULL when either
    class is absent.

    Global mode (``group_cols=None``, one output row) ranks over an
    unpartitioned window — a single-partition sort, fine for bounded
    evaluation sets but not a 100 TB corpus. ``group_cols`` is the
    scale path: the rank window partitions by the strata (one output
    row per stratum), so ranking parallelizes across strata and no
    executor ever sorts more than one stratum — the standard
    per-domain / per-language AUC report. For a single global number
    at corpus scale, score a deterministic ``hash_sample`` instead.
    """
    groups = list(group_cols or [])
    gcols = [F.col(c) for c in groups]
    w_rank = Window.partitionBy(*gcols).orderBy(F.col(score_col).asc())
    w_tie = Window.partitionBy(*gcols, F.col(score_col))
    ranked = df.select(
        *gcols,
        F.col(score_col),
        F.col(label_col).cast("int").alias("__y"),
    ).select(
        *groups,
        "__y",
        (
            F.rank().over(w_rank).cast("double")
            + (F.count("*").over(w_tie).cast("double") - 1.0) / 2.0
        ).alias("__mr"),
    )
    agg = ranked.groupBy(*gcols).agg(
        F.sum(F.when(F.col("__y") == 1, F.col("__mr"))).alias("rp"),
        F.count(F.when(F.col("__y") == 1, 1)).alias("np"),
        F.count(F.when(F.col("__y") == 0, 1)).alias("nn"),
    )
    auc = (F.col("rp") - F.col("np") * (F.col("np") + 1) / 2.0) / (
        F.col("np") * F.col("nn")
    )
    return agg.select(
        *groups,
        F.round(auc, ndigits).alias("auc"),
        F.col("np").cast("long").alias("n_pos"),
        F.col("nn").cast("long").alias("n_neg"),
    )


def distill_quality_classifier(
    df: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    dim: int = 32,
    lr: float = 0.3,
    iters: int = 15,
    l2: float = 0.0,
) -> tuple[list[float], float]:
    """The packaged distillation recipe: hashing-trick features with
    ``log1p`` count damping -> ``train_logreg``. Raw bucket counts
    carry the document-length signal rule-labels depend on, but their
    unbounded scale makes plain GD oscillate (observed: an 8-iteration
    run ANTI-correlated, AUC 0.08); ``log1p`` keeps the length signal
    with bounded feature scale, and lr=0.3/15 iters lands AUC ~0.95
    against the Gopher labels at every test scale. Score the corpus
    with ``distilled_score_expr`` and the returned frozen weights."""
    from ..functions.text import hashed_tf_expr

    feats = df.select(
        F.transform(hashed_tf_expr(text_col, dim), lambda x: F.log1p(x)).alias(
            "__x"
        ),
        F.col(label_col).cast("int").alias("__y"),
    )
    return train_logreg(feats, "__x", "__y", lr=lr, iters=iters, l2=l2)


def distilled_score_expr(
    text_col: Column | str, weights: list[float], bias: float
) -> Column:
    """Map-only corpus scoring for a classifier trained by
    ``distill_quality_classifier``: recreates the identical
    hashed-TF -> log1p features in-row and applies the frozen
    weights."""
    from ..functions.text import hashed_tf_expr

    feats = F.transform(
        hashed_tf_expr(text_col, len(weights)), lambda x: F.log1p(x)
    )
    w_lit = F.from_json(
        F.lit(json.dumps([float(x) for x in weights])), "array<double>"
    )
    z = (
        F.aggregate(
            F.zip_with(feats, w_lit, lambda x, w: x * w),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        + F.lit(float(bias))
    )
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
