"""Trainable quality classifier — distributed logistic regression over
portable text features (per-mille-normalized hashed TF + document
length flags), the fastText/CCNet pattern (Wenzek et al. 2019):
bootstrap labels from a high-precision heuristic (here the Gopher rule
verdict), train a linear model, keep its SOFT score — which smooths
the rules' cliffs and generalizes past their literal thresholds. The
reference (hotgluexyz/gluestick-ts) has no model-training analog; this
is part of the 100 TB extension surface.

Why it scales: training is pure data-parallel gradient descent — each
iteration is ONE aggregation job over an exploded (feature-slot,
term) frame, map-side combined down to ``dim+flags+1`` longs per
partition (no parameter server, no driver-side data). The feature
frame is computed once and cached; a 100 TB corpus trains on a
hash-sampled slice (standard practice — quality classifiers train on
~10^5 docs, not the corpus) and the model applies map-only everywhere.

Why it is ORACLE-CHECKABLE (the hard part — two engines must train to
bit-identical weights):

- features are INTEGER-VALUED by construction: per-mille token
  frequencies ``round(1000·count/total)`` and 0/100 length flags;
- gradients are exchanged as integer MICRO-UNITS: the per-doc
  probability is quantized to the 1e-6 grid (``round(p·1e6)``), so
  every gradient term ``(p_micro − y·1e6)·x_j`` is an exact integer
  and the cross-partition / cross-engine sums are exact LONG
  arithmetic — immune to float addition order;
- the per-doc margin is an ORDERED fold over the fixed-width feature
  array (Spark ``aggregate`` over ``zip_with``; DuckDB ``list_reduce``
  over ``list_transform`` — the ``plans/queries.py`` ``_IVF_DOT``
  pattern), identical in both engines;
- weights are re-quantized to the 1e-9 grid after every update with
  away-from-zero rounding (Spark ``ROUND`` == DuckDB ``round`` — NOT
  Python's banker's ``round``), so a sub-ulp ``exp`` difference
  between the JVM and libm cannot accumulate across iterations;
- the final model is frozen to integer micro-unit weights, making the
  inference score ``Σ_j W_micro[j]·x_j + B_micro`` exact LONG
  arithmetic — hash-identical across engines by construction.

``logreg_train_sql`` emits the ENTIRE training unrolled as a DuckDB
CTE chain from the same constants, so the oracle re-derives the
weights independently — training itself is correctness-gated, not
just inference (the ``ivf_train_centroids`` precedent).

Relationship to ``operators/ml.py``: that module's ``train_logreg`` /
``distill_quality_classifier`` are the earlier plain-float distillation
path, whose docstring documents that float gradient sums are NOT
order-exact and training there is pytest-gated only. This module is
the successor for verifiable pipelines: the quantization protocol
makes training deterministic under any partitioning AND cross-engine
checkable, at the price of fixing the feature family to integer-valued
vectors.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "train_logreg_hashed",
    "clf_features_expr",
    "clf_features_spark_sql",
    "logreg_score_micro_expr",
    "logreg_prob_expr",
    "hashed_tf_sql",
    "clf_features_sql",
    "logreg_train_sql",
    "logreg_apply_sql",
    "DEFAULT_LEN_FLAGS",
]

# token-count thresholds for the 0/100 length-flag features: a linear
# model over per-mille TFs alone cannot express the Gopher length
# window; step features give it a piecewise-constant length response.
# Scaled to 100 so flags and per-mille TFs train at similar magnitude
# (unscaled 0/1 flags measurably stall convergence).
DEFAULT_LEN_FLAGS: tuple[int, ...] = (25, 50, 100, 200, 400)


def _round_away(x: float, digits: int) -> float:
    """Away-from-zero decimal rounding — Spark's ``ROUND`` and
    DuckDB's ``round`` semantics. Python's builtin ``round`` is
    banker's (half-even) and would diverge from both engines on
    exact-half values."""
    scale = 10.0 ** digits
    return math.copysign(math.floor(abs(x) * scale + 0.5), x) / scale


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def clf_features_spark_sql(
    text_sql: str = "text",
    dim: int = 64,
    len_flags: tuple[int, ...] = DEFAULT_LEN_FLAGS,
) -> str:
    """Spark-SQL string of the classifier feature vector — ONE parser
    call instead of a deep py4j Column tree (the ``gopher_rules_sql``
    lesson; measured 6x faster to analyze at identical runtime
    semantics). Bucket ids bind once per row via the let-binding array
    trick (``hashed_tf_expr``); the total is just ``size(ids)`` since
    every token lands in exactly one bucket."""
    toks = f"filter(split(lower(trim({text_sql})), '\\\\s+'), t -> t != '')"
    # round 16 (optimization): md5 staged through its own transform so
    # each token hashes ONCE — the two hex-digit reads referenced
    # md5(t) twice per token (the hashed_tf_expr let-binding, mirrored
    # into this SQL twin; values identical)
    bucket = (
        "((instr('0123456789abcdef', substring(h, 1, 1)) - 1) * 16 + "
        "(instr('0123456789abcdef', substring(h, 2, 1)) - 1)) "
        f"% {dim}"
    )
    ids = f"transform(transform({toks}, t -> md5(t)), h -> {bucket})"
    tot = "CAST(size(ids) AS DOUBLE)"
    permille = (
        f"transform(sequence(0, {dim - 1}), i -> round(1000.0D * "
        f"CAST(size(filter(ids, j -> j = i)) AS DOUBLE) / "
        f"greatest({tot}, 1.0D)))"
    )
    flags = ", ".join(
        f"CASE WHEN {tot} >= {t}.0D THEN 100.0D ELSE 0.0D END"
        for t in len_flags
    )
    return (
        f"transform(array({ids}), ids -> "
        f"concat({permille}, array({flags})))[0]"
    )


def clf_features_expr(
    text: str,
    dim: int = 64,
    len_flags: tuple[int, ...] = DEFAULT_LEN_FLAGS,
) -> Column:
    """The classifier's feature vector of one document as an
    ``array<double>`` of ``dim + len(len_flags)`` INTEGER-VALUED
    slots: per-mille hashed-TF buckets ``round(1000·count_j/total)``
    then 0/100 length flags ``total >= threshold``. ``text`` is a
    column name or SQL fragment (string — the expression enters the
    plan through one parser call). Map-only; the bucket arithmetic is
    ``functions/text.py hashed_tf_expr``'s md5 family."""
    if not isinstance(text, str):
        raise TypeError(
            "clf_features_expr takes a column name / SQL fragment "
            "string (one-parser-call contract)"
        )
    return F.expr(clf_features_spark_sql(text, dim, len_flags))


def train_logreg_hashed(
    df: DataFrame,
    label: Column | str,
    text_col: str = "text",
    dim: int = 64,
    iters: int = 4,
    lr: float = 0.0001,
    l2: float = 0.0,
    len_flags: tuple[int, ...] = DEFAULT_LEN_FLAGS,
    features_col: str | None = None,
) -> dict:
    """Train logistic regression on :func:`clf_features_expr` features
    with the quantized-gradient protocol documented in the module
    header. ``label`` is a 0/1 column or expression (bootstrap it from
    a rule verdict — e.g. ``gopher_quality_flags(...)
    .getField("passes")``).

    Per iteration: ONE aggregation job — the residual-weighted feature
    slots (plus a constant bias slot) are exploded to ``(j, term)``
    rows and hash-aggregated by slot, map-side combined, so each
    partition ships ``dim+flags+1`` longs regardless of row count.
    Weights enter as literals (measured FASTER per iteration than the
    broadcast-one-row-frame alternative — the explode plan is small
    enough that re-analysis beats a broadcast exchange). The driver
    holds only the weight vector.

    Defaults (``iters=4, lr=1e-4``) are tuned on the Gopher-label
    task: larger rates oscillate (full-batch GD overshoot), longer
    schedules buy nothing — see tests for the convergence pin.

    Returns ``{"weights", "bias"}`` (1e-9-grid floats),
    ``{"weights_micro", "bias_micro"}`` (the frozen integer model
    ``logreg_score_micro_expr`` consumes), ``n`` (training rows) and
    ``grad_norms`` (per-iteration L1 of the micro-gradient — a
    convergence trace for tests/monitoring)."""
    if not 1 <= dim <= 256:
        raise ValueError(f"dim must be in [1, 256], got {dim}")
    if iters < 1:
        raise ValueError("iters must be >= 1")
    d = dim + len(len_flags)
    # features_col: a column holding ALREADY-BUILT feature vectors (a
    # caller that materialized clf_features_expr once — e.g. to score
    # from the same cache afterwards) skips the in-row rebuild here
    x = (
        F.col(features_col)
        if features_col is not None
        else clf_features_expr(text_col, dim, len_flags)
    )
    # null labels are FILTERED, not coerced: Spark's sum would skip a
    # null residual while a CASE-mapped 0 label would train on the row
    # — the two engines must see the SAME row set or the bit-identical
    # weights contract breaks (logreg_train_sql filters identically)
    feat = (
        df.select(
            x.alias("x"),
            _col(label).cast("double").alias("y"),
        )
        .where(F.col("y").isNotNull())
        .persist()
    )
    try:
        # n (the training row count) comes out of the FIRST gradient
        # job below — every posexplode group j holds exactly one term
        # per training row, so count(*) per group IS n. Folding it in
        # saves a whole Spark job (the old standalone feat.count()):
        # the per-iteration schedule is now exactly `iters` aggregation
        # jobs, which is irreducible — each iteration's residuals
        # depend on the previous iteration's weights.
        n = None
        w = [0.0] * d
        b = 0.0
        grad_norms = []
        for _ in range(iters):
            w_lit = F.array(*[F.lit(x) for x in w])
            s = F.aggregate(
                F.zip_with(F.col("x"), w_lit, lambda x, wj: x * wj),
                F.lit(0.0),
                lambda acc, t: acc + t,
            )
            p = F.lit(1.0) / (F.lit(1.0) + F.exp(-(s + F.lit(float(b)))))
            # micro-quantized residual: round(p*1e6) and y*1e6 are
            # exact integer-valued doubles, so the exploded products
            # below are exact and the long sums order-independent.
            # Slot d (a constant 1.0 appended per row) is the bias.
            r = (F.round(p * 1e6) - F.col("y") * 1e6).alias("r")
            proj = feat.select(
                r, F.concat(F.col("x"), F.array(F.lit(1.0))).alias("x")
            ).select("r", F.posexplode("x").alias("j", "xv"))
            rows = (
                proj.groupBy("j")
                .agg(
                    F.sum((F.col("r") * F.col("xv")).cast("long")).alias("g"),
                    F.count(F.lit(1)).alias("c"),
                )
                .collect()
            )
            if n is None:
                # n = slot j == 0's group count: concat(x, [bias]) is
                # non-empty for every non-null feature array, so each
                # training row lands in group 0 exactly once. An
                # arbitrary rows[0] group is only equivalent for dense
                # length-d arrays — caller-supplied features_col may be
                # null/ragged, where feature groups have unequal counts
                # (a ragged row's bias lands at j=len(x), not j=d) and
                # rows[0] (unordered collect) is whichever group
                # happened first.
                n = next(
                    (int(row["c"]) for row in rows if int(row["j"]) == 0), 0
                )
                if n == 0:
                    raise ValueError("training frame is empty")
            g = {int(row["j"]): int(row["g"] or 0) for row in rows}
            grad_norms.append(sum(abs(x) for x in g.values()))
            w = [
                _round_away(
                    w[j] - lr * (g.get(j, 0) / 1e6 / n + l2 * w[j]), 9
                )
                for j in range(d)
            ]
            b = _round_away(b - lr * (g.get(d, 0) / 1e6 / n), 9)
        return {
            "weights": w,
            "bias": b,
            "weights_micro": [int(_round_away(x * 1e6, 0)) for x in w],
            "bias_micro": int(_round_away(b * 1e6, 0)),
            "n": n,
            "dim": dim,
            "len_flags": tuple(len_flags),
            "grad_norms": grad_norms,
        }
    finally:
        feat.unpersist()


def logreg_score_micro_from_features(
    x: Column, weights_micro: list[int], bias_micro: int
) -> Column:
    """The inference fold over an ALREADY-BUILT feature vector column
    (see :func:`clf_features_expr`) — callers that materialized
    features once (e.g. for training) score from the cached arrays
    instead of re-deriving them from text."""
    w_lit = F.array(*[F.lit(int(v)).cast("long") for v in weights_micro])
    return (
        F.aggregate(
            F.zip_with(x, w_lit, lambda xv, wj: wj * xv.cast("long")),
            F.lit(0).cast("long"),
            lambda a, t: a + t,
        )
        + F.lit(int(bias_micro)).cast("long")
    )


def logreg_score_micro_expr(
    text: str,
    weights_micro: list[int],
    bias_micro: int,
    dim: int = 64,
    len_flags: tuple[int, ...] = DEFAULT_LEN_FLAGS,
) -> Column:
    """Inference score in integer micro-units: the ordered fold
    ``Σ_j W_micro[j]·x_j + B_micro`` as a LONG — exact integer
    arithmetic (features are integer-valued), so the score hashes
    identically on any engine. ``score >= 0`` is the model's decision
    boundary; soft-score users take :func:`logreg_prob_expr`.
    Map-only: one md5 per token plus an in-row fold."""
    if len(weights_micro) != dim + len(len_flags):
        raise ValueError(
            f"weights_micro has {len(weights_micro)} slots, expected "
            f"dim + len(len_flags) = {dim + len(len_flags)}"
        )
    return logreg_score_micro_from_features(
        clf_features_expr(text, dim, len_flags), weights_micro, bias_micro
    )


def logreg_prob_expr(score_micro: Column) -> Column:
    """Sigmoid probability of a micro-unit score, rounded to 6 dp (the
    repo-wide float-column contract)."""
    return F.round(
        F.lit(1.0)
        / (F.lit(1.0) + F.exp(-(score_micro.cast("double") / F.lit(1e6)))),
        6,
    )


# ---------------------------------------------------------------------
# DuckDB twins — generated from the same constants so the oracle
# re-derives training AND inference independently of the Spark path.
# ---------------------------------------------------------------------

def _bucket_sql(tok: str, dim: int) -> str:
    return (
        f"((strpos('0123456789abcdef', substr(md5({tok}), 1, 1)) - 1) * 16"
        f" + (strpos('0123456789abcdef', substr(md5({tok}), 2, 1)) - 1))"
        f" % {dim}"
    )


def hashed_tf_sql(text_sql: str = "text", dim: int = 64) -> str:
    """DuckDB fragment: the ``hashed_tf_expr`` vector of ``text_sql``
    as a ``DOUBLE[dim]`` list (same md5-bucket arithmetic — the
    ``plans/queries.py`` ``hv`` CTE pattern, zero-token docs kept as
    zero vectors)."""
    toks = (
        f"list_filter(regexp_split_to_array(lower(trim({text_sql})),"
        " '\\s+'), t -> t <> '')"
    )
    ids = f"list_transform({toks}, t -> {_bucket_sql('t', dim)})"
    return (
        f"[CAST(len(list_filter({ids}, j -> j = i)) AS DOUBLE) "
        f"for i in range(0, {dim})]"
    )


def _features_from_tf_sql(
    tf_list: str, dim: int, len_flags: tuple[int, ...]
) -> str:
    """DuckDB fragment: :func:`clf_features_expr` from an
    already-bound TF list reference ``tf_list`` and its bound total
    ``TOT`` (callers stage both in subqueries — DuckDB comprehensions
    would otherwise re-evaluate the list per slot)."""
    permille = (
        f"[round(CAST(1000.0 AS DOUBLE) * {tf_list}[j+1] / "
        f"greatest(TOT, CAST(1.0 AS DOUBLE))) for j in range(0, {dim})]"
    )
    flags = ", ".join(
        f"CASE WHEN TOT >= CAST({t}.0 AS DOUBLE) THEN "
        "CAST(100.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END"
        for t in len_flags
    )
    return f"({permille} || [{flags}])"


def clf_features_sql(
    text_sql: str = "text",
    dim: int = 64,
    len_flags: tuple[int, ...] = DEFAULT_LEN_FLAGS,
    id_col: str = "doc_id",
    from_table: str = "documents",
    extra_select: str = "",
    extra_alias: str = "",
) -> str:
    """DuckDB subquery (parenthesized, alias it) producing
    ``(id_col[, extra_alias], x DOUBLE[])`` — the classifier feature
    vector per row of ``from_table``, staged so TF list and total
    evaluate once per row. ``extra_select`` (``expr AS alias``)
    evaluates at the INNERMOST level, where ``from_table``'s raw
    columns are still in scope; ``extra_alias`` names its alias for
    the outer levels."""
    tf = hashed_tf_sql(text_sql, dim)
    inner = f", {extra_select}" if extra_select else ""
    outer = f", {extra_alias}" if extra_alias else ""
    return (
        f"(SELECT {id_col}{outer}, "
        + _features_from_tf_sql("V", dim, len_flags)
        + f" AS x FROM (SELECT {id_col}{outer}, V, "
        f"COALESCE(list_sum(V), CAST(0.0 AS DOUBLE)) AS TOT FROM ("
        f"SELECT {id_col}{inner}, {tf} AS V FROM {from_table}) a) b)"
    )


def logreg_train_sql(
    label_sql: str,
    text_sql: str = "text",
    dim: int = 64,
    iters: int = 4,
    lr: float = 0.0001,
    l2: float = 0.0,
    len_flags: tuple[int, ...] = DEFAULT_LEN_FLAGS,
    from_table: str = "documents",
    id_col: str = "doc_id",
) -> str:
    """The ENTIRE training loop unrolled as a DuckDB CTE chain (no
    leading WITH — splice into a larger statement). ``label_sql`` is a
    boolean SQL expression over ``from_table`` (the bootstrap rule).
    Terminates in ``clf_wfin(W DOUBLE[], B DOUBLE, WM BIGINT[],
    BM BIGINT)`` — one row holding the trained model; apply it with
    :func:`logreg_apply_sql`. Numerics mirror
    :func:`train_logreg_hashed` step for step: ordered-fold margin,
    1e-6-grid probability, exact integer gradient sums, 1e-9-grid
    away-from-zero weight rounding."""
    d = dim + len(len_flags)
    # every float constant is CAST to DOUBLE: a bare 0.05 parses as
    # DECIMAL in DuckDB and decimal arithmetic would diverge from the
    # Spark trainer's IEEE doubles
    lr_d = f"CAST({lr!r} AS DOUBLE)"
    l2_d = f"CAST({l2!r} AS DOUBLE)"
    # three-way CASE so a NULL label stays NULL (a plain CASE..ELSE 0
    # would coerce null to 0 and train on the row — diverging from the
    # Spark trainer, which filters null labels); the clf_fx WHERE below
    # then drops those rows so both engines train on the SAME set
    feats = clf_features_sql(
        text_sql, dim, len_flags, id_col, from_table,
        extra_select=(
            f"CAST(CASE WHEN ({label_sql}) THEN 1.0 "
            f"WHEN NOT ({label_sql}) THEN 0.0 ELSE NULL END "
            "AS DOUBLE) AS y"
        ),
        extra_alias="y",
    )
    # AS MATERIALIZED is load-bearing everywhere below: DuckDB inlines
    # plain CTEs, and each unrolled iteration references the previous
    # one several times — without materialization the chain recomputes
    # with exponential fan-out
    ctes = [
        f"clf_fx AS MATERIALIZED (SELECT * FROM {feats} t "
        "WHERE t.y IS NOT NULL)",
        "clf_nn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n "
        "FROM clf_fx)",
        (
            f"clf_w0 AS MATERIALIZED (SELECT [CAST(0.0 AS DOUBLE) "
            f"for i in range(0, {d})] AS W, CAST(0.0 AS DOUBLE) AS B)"
        ),
    ]
    for k in range(iters):
        dot = (
            f"list_reduce(list_transform(range({d}), "
            "j -> f.x[j+1] * w.W[j+1]), (a, b) -> a + b)"
        )
        ctes.append(
            f"clf_p{k} AS MATERIALIZED (SELECT f.{id_col}, f.y, f.x, "
            f"round(CAST(1.0 AS DOUBLE)/(CAST(1.0 AS DOUBLE) + "
            f"exp(-({dot} + w.B))) * 1e6) - f.y * 1e6 "
            f"AS r FROM clf_fx f, clf_w{k} w)"
        )
        ctes.append(
            f"clf_g{k} AS MATERIALIZED (SELECT j, "
            f"sum(CAST(r * (CASE WHEN j = {d} THEN CAST(1.0 AS DOUBLE) "
            f"ELSE x[j+1] END) AS BIGINT)) AS g "
            f"FROM clf_p{k}, range({d + 1}) t(j) GROUP BY j)"
        )
        ctes.append(
            f"clf_w{k + 1} AS MATERIALIZED (SELECT "
            f"(SELECT list(round(w.W[g.j+1] - {lr_d}*(g.g/1e6/n.n + "
            f"{l2_d}*w.W[g.j+1]), 9) ORDER BY g.j) "
            f"FROM clf_g{k} g, clf_nn n WHERE g.j < {d}) AS W, "
            f"(SELECT round(w.B - {lr_d}*(g.g/1e6/n.n), 9) "
            f"FROM clf_g{k} g, clf_nn n WHERE g.j = {d}) AS B "
            f"FROM clf_w{k} w)"
        )
    ctes.append(
        f"clf_wfin AS MATERIALIZED (SELECT W, B, "
        f"list_transform(range({d}), j -> CAST(round(W[j+1] * 1e6) "
        f"AS BIGINT)) AS WM, CAST(round(B * 1e6) AS BIGINT) AS BM "
        f"FROM clf_w{iters})"
    )
    return ", ".join(ctes)


def logreg_apply_sql(
    x_sql: str = "x",
    dim: int = 64,
    len_flags: tuple[int, ...] = DEFAULT_LEN_FLAGS,
) -> str:
    """DuckDB fragment: the micro-unit inference score of a STAGED
    feature-vector column ``x_sql`` (build it with
    :func:`clf_features_sql`) against the one-row ``clf_wfin`` model —
    reference both in the FROM clause. Twin of
    :func:`logreg_score_micro_expr`: exact LONG arithmetic over the
    integer-valued features."""
    return (
        f"(CAST(list_reduce(list_transform(range({dim + len(len_flags)}),"
        f" j -> clf_wfin.WM[j+1] * CAST({x_sql}[j+1] AS BIGINT)), "
        "(a, b) -> a + b) AS BIGINT) + clf_wfin.BM)"
    )
