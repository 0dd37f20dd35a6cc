"""DSIR-style data selection via importance resampling.

Implements the hashed n-gram importance-resampling recipe of Xie et al.
2023 ("Data Selection for Language Models via Importance Resampling",
NeurIPS 2023): documents from a large raw corpus are scored by how much
more likely their hashed n-gram features are under a TARGET distribution
(e.g. a curated/high-quality corpus) than under the raw corpus itself,
then selected by Gumbel top-k — which draws k documents without
replacement with probability proportional to their importance weight
(Efraimidis & Spirakis 2006 / the Gumbel-max trick).

Scale shape (the 100 TB story):

- Features are hashed unigram+bigram buckets computed IN-ROW from md5
  arithmetic (`functions/text.py hashed_tf_expr`'s portability
  contract) — map-only, engine-portable, no vocabulary artifact.
- Each distribution is ONE map-side-combined aggregate collapsing to
  <= num_buckets rows (bounded driver collect, like
  ``frozen_logprob_expr``'s model collect), embedded back as a single
  constant-folded literal of INTEGER counts — ln/division happen
  engine-side so a SQL oracle reproduces the arithmetic from the same
  integers.
- Per-document log-weights and Gumbel keys are then pure map-only
  column expressions; selection is a TakeOrdered threshold (one scalar
  collect), never a global sort.

No reference counterpart (extension operator; the data-selection stage
of an LLM training pipeline, alongside the quality/curation family).
"""

from __future__ import annotations

import json

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens_expr

__all__ = [
    "hashed_gram_buckets_expr",
    "gram_bucket_histogram",
    "gram_bucket_histograms",
    "dsir_logweight_expr",
    "gumbel_key_expr",
    "dsir_select",
]

_HEX = "0123456789abcdef"
_TWO_60 = float(1 << 60)


def _bucket_of(g: Column, num_buckets: int) -> Column:
    """First two md5 hex chars -> [0, 256), then % num_buckets — the
    engine-portable bucket (hashed_tf_expr's arithmetic). ``conv``
    decodes BOTH hex chars from ONE ``md5`` call: Catalyst does not
    reliably CSE subexpressions inside lambda functions, so the earlier
    two-nibble ``instr`` form hashed every gram twice per corpus scan."""
    b = F.conv(F.substring(F.md5(g), 1, 2), 16, 10).cast("int")
    return b % num_buckets


def hashed_gram_buckets_expr(text: Column | str, num_buckets: int = 256) -> Column:
    """Hashed-feature bucket per gram occurrence (unigrams + adjacent
    bigrams, duplicates KEPT — DSIR counts occurrences): ``array<int>``
    built fully in-row. ``num_buckets`` <= 256 (two md5 hex chars;
    production would widen the nibble window, same arithmetic).

    The token array is let-bound (evaluated once) before feeding both
    the unigram and bigram branches — referencing it twice would make
    Catalyst re-tokenize per branch."""
    if not 1 <= num_buckets <= 256:
        raise ValueError(
            f"num_buckets must be in [1, 256] (got {num_buckets}) — bucket "
            "ids come from two md5 hex chars"
        )
    t = F.col(text) if isinstance(text, str) else text
    toks = F.filter(tokens_expr(t), lambda x: x != "")

    def grams(T):
        bigrams = F.slice(
            F.zip_with(
                T,
                F.slice(T, 2, F.greatest(F.size(T) - 1, F.lit(1))),
                lambda a, b: F.concat_ws(" ", a, b),
            ),
            1,
            F.greatest(F.size(T) - 1, F.lit(0)),
        )
        return F.concat(T, bigrams)

    return F.transform(
        F.array(toks),
        lambda T: F.transform(grams(T), lambda g: _bucket_of(g, num_buckets)),
    )[0]


def gram_bucket_histogram(
    df: DataFrame, text_col: str = "text", num_buckets: int = 256
) -> list[int]:
    """Hashed-gram bucket counts of a corpus as a plain Python list of
    length ``num_buckets`` — ONE map-side-combined aggregate down to
    <= num_buckets rows, then a BOUNDED collect (256 rows max). The
    result is meant to be frozen into ``dsir_logweight_expr``'s
    literal, the same offline-model pattern as ``frozen_logprob_expr``.
    """
    rows = (
        df.select(
            F.explode(
                hashed_gram_buckets_expr(F.col(text_col), num_buckets)
            ).alias("b")
        )
        .groupBy("b")
        .agg(F.count("*").alias("c"))
        .collect()
    )
    hist = [0] * num_buckets
    for r in rows:
        hist[r["b"]] = r["c"]
    return hist


def gram_bucket_histograms(
    df: DataFrame,
    target_cond: Column,
    text_col: str = "text",
    num_buckets: int = 256,
) -> tuple[list[int], list[int]]:
    """Raw + target histograms in ONE corpus pass for the common DSIR
    setup where the target is a boolean SLICE of the raw corpus (e.g.
    ``lang == 'en'``): the bucket explode carries the slice flag and
    the target side is a conditional count in the same map-side-
    combined aggregate — half the corpus scans of two separate
    ``gram_bucket_histogram`` calls."""
    rows = (
        df.select(
            target_cond.alias("__t"),
            F.explode(
                hashed_gram_buckets_expr(F.col(text_col), num_buckets)
            ).alias("b"),
        )
        .groupBy("b")
        .agg(
            F.count("*").alias("r"),
            F.count_if(F.col("__t")).alias("t"),
        )
        .collect()
    )
    raw, tgt = [0] * num_buckets, [0] * num_buckets
    for r in rows:
        raw[r["b"]] = r["r"]
        tgt[r["b"]] = r["t"]
    return raw, tgt


def dsir_logweight_expr(
    text: Column | str,
    raw_hist: list[int],
    target_hist: list[int],
    smoothing: float = 1.0,
) -> Column:
    """Per-document importance log-weight: ``sum over gram occurrences
    of ln p_target(bucket) - ln p_raw(bucket)`` with Laplace smoothing
    ``(count + s) / (total + s*B)`` on both sides. Map-only: both
    histograms ride as constant-folded INTEGER literal arrays (one
    ``from_json`` each) and the division/ln stay engine-side, so an
    ANSI-SQL oracle reproduces the value from the same integers."""
    if len(raw_hist) != len(target_hist):
        raise ValueError("raw_hist and target_hist must have equal length")
    nb = len(raw_hist)
    raw_lit = F.from_json(F.lit(json.dumps(raw_hist)), "array<bigint>")
    tgt_lit = F.from_json(F.lit(json.dumps(target_hist)), "array<bigint>")
    raw_tot = float(sum(raw_hist) + smoothing * nb)
    tgt_tot = float(sum(target_hist) + smoothing * nb)
    buckets = hashed_gram_buckets_expr(text, nb)
    s = float(smoothing)
    return F.aggregate(
        buckets,
        F.lit(0.0),
        lambda acc, b: acc
        + F.log((F.element_at(tgt_lit, b + 1) + F.lit(s)) / F.lit(tgt_tot))
        - F.log((F.element_at(raw_lit, b + 1) + F.lit(s)) / F.lit(raw_tot)),
    )


def gumbel_key_expr(key: Column | str, logw: Column, seed: int = 1) -> Column:
    """``log w + Gumbel(0,1)`` selection key, seeded and
    engine-portable: ``u = (h + 0.5) / 2^60`` from the first 15 md5 hex
    chars of ``'dsir<seed>:' || key`` (u strictly inside (0,1), so both
    ln calls are finite), ``g = -ln(-ln(u))``. Taking the top-k rows by
    this key samples k documents WITHOUT replacement with probability
    proportional to their importance weight (Gumbel-max top-k).

    ``key`` must be NON-NULL: distinct keys are the 'independent noise
    per row' contract, and a NULL key would otherwise propagate to a
    NULL selection key and silently drop the row regardless of weight —
    so a NULL raises per-row instead (zero extra scans)."""
    k = F.col(key) if isinstance(key, str) else key
    k = F.when(
        k.isNull(),
        F.raise_error(
            "gumbel_key_expr/dsir_select: the id column must be non-null "
            "(distinct non-null keys get independent Gumbel noise)"
        ),
    ).otherwise(k)
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"dsir{seed}:"), k.cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    u = (h.cast("double") + F.lit(0.5)) / F.lit(_TWO_60)
    return logw + (-F.log(-F.log(u)))


def dsir_select(
    df: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 100,
    num_buckets: int = 256,
    seed: int = 1,
    smoothing: float = 1.0,
) -> DataFrame:
    """End-to-end DSIR selection: raw + target histograms (two bounded
    aggregates), map-only log-weights and Gumbel keys, then top-k by
    threshold — the k-th largest key is found via ``orderBy().limit(k)``
    (TakeOrdered, distributed partial top-k — never a global sort) and
    membership is one map-only comparison. Returns the selected rows
    with ``dsir_logw`` and ``dsir_key`` columns.

    Keys are continuous (distinct ids get independent Gumbel noise), so
    threshold ties have probability ~0; at worst a tie admits an extra
    row rather than dropping one."""
    raw_hist = gram_bucket_histogram(df, text_col, num_buckets)
    tgt_hist = gram_bucket_histogram(target, text_col, num_buckets)
    keyed = df.withColumn(
        "dsir_logw",
        dsir_logweight_expr(F.col(text_col), raw_hist, tgt_hist, smoothing),
    ).withColumn(
        "dsir_key", gumbel_key_expr(F.col(id_col), F.col("dsir_logw"), seed)
    )
    # eager threshold job BY DESIGN (not a hidden query-builder probe):
    # Gumbel top-k selection needs the k-th key materialized — callers
    # of a *selection* operator expect the action, and the histograms
    # above already ran two
    kth_row = (
        keyed.select("dsir_key")
        .orderBy(F.desc("dsir_key"))
        .limit(k)
        .agg(F.min("dsir_key"))
        .first()
    )
    if kth_row is None or kth_row[0] is None:
        return keyed  # fewer rows than k: keep everything
    return keyed.where(F.col("dsir_key") >= F.lit(float(kth_row[0])))
