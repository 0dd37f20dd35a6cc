"""Corpus profiling: the dataset-card aggregate for a document corpus.

One pass, one groupBy — per (source, lang) slice (or any grouping), the
numbers every training-data curation loop watches: volume (docs,
tokens, chars), quality (mean heuristic quality score, Gopher-rule pass
rate), duplication (exact-fingerprint dup rate), and label agreement
(recorded ``lang`` vs the n-gram language-ID prediction). All inputs
are the repo's existing pure Column expressions, so the whole profile
is a map-only projection followed by a single hash aggregation —
at 100 TB this is the cheapest full-corpus statement you can make, and
the first thing to run before/after any dedup or filter stage (compare
two profiles to see what a pipeline stage actually removed).

No reference counterpart (extension op).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import (
    char_count_expr,
    fingerprint_expr,
    gopher_quality_flags,
    lang_id_expr,
    quality_score_expr,
    tokens_expr,
    word_count_expr,
)

__all__ = [
    "corpus_profile",
    "unigram_logprob_scores",
    "bigram_logprob_scores",
    "trigram_logprob_scores",
    "bitri_logprob_scores",
    "bigram_pmi",
    "profile_columns",
    "group_quantile_cuts",
    "adaptive_quality_filter",
]


def corpus_profile(
    df: DataFrame,
    group_cols: list[str] | None = None,
    text_col: str = "text",
    lang_col: str | None = "lang",
) -> DataFrame:
    """Per-group corpus profile. Output (one row per group):

    - ``n_docs``, ``n_tokens``, ``n_chars`` — exact integer volumes;
    - ``avg_tokens``, ``avg_chars`` — derived from the exact sums
      (deterministic across partitionings, 4 dp);
    - ``quality_mean`` — mean heuristic quality score (4 dp);
    - ``gopher_pass_rate`` — fraction passing ALL Gopher rules (4 dp);
    - ``exact_dup_rate`` — 1 − distinct fingerprints / docs (4 dp):
      the within-group exact-duplication mass a dedup pass would drop;
    - ``lang_match_rate`` (only when ``lang_col`` is present) —
      fraction whose recorded language equals the n-gram language-ID
      prediction (4 dp);
    - ``median_tokens`` / ``p95_tokens`` — EXACT linear-interpolated
      token-length quantiles (4 dp). Exact group quantiles hold the
      group's values in the aggregation buffer, which is fine for
      dataset-card group counts (sources × languages) but NOT for
      high-cardinality groupings — at that point read
      ``p_approx_within_5pct`` instead: it records whether the
      mergeable ``approx_percentile`` sketch (the 100 TB path) landed
      within 5% of the exact P95, so the monitoring signal and its
      error budget are both in the row.

    ``group_cols`` defaults to ``["source", "lang"]`` filtered to the
    columns actually present; pass ``[]`` for a whole-corpus row.
    """
    if group_cols is None:
        group_cols = [c for c in ("source", "lang") if c in df.columns]
    gp = gopher_quality_flags(text_col)

    pre = df.select(
        *group_cols,
        word_count_expr(text_col).cast("long").alias("__tok"),
        char_count_expr(text_col).cast("long").alias("__chr"),
        quality_score_expr(text_col).alias("__q"),
        gp.getField("passes").cast("int").alias("__gp"),
        fingerprint_expr(text_col).alias("__fp"),
        *(
            [
                (F.col(lang_col) == lang_id_expr(text_col))
                .cast("int")
                .alias("__lm")
            ]
            if lang_col and lang_col in df.columns
            else []
        ),
    )
    grouped = pre.groupBy(*group_cols) if group_cols else pre.groupBy()
    aggs = [
        F.count("*").alias("n_docs"),
        F.sum("__tok").alias("n_tokens"),
        F.sum("__chr").alias("n_chars"),
        F.round(F.sum("__tok") / F.count("*"), 4).alias("avg_tokens"),
        F.round(F.sum("__chr") / F.count("*"), 4).alias("avg_chars"),
        F.round(F.avg("__q"), 4).alias("quality_mean"),
        F.round(F.avg("__gp"), 4).alias("gopher_pass_rate"),
        F.round(
            1.0 - F.count_distinct(F.col("__fp")) / F.count("*"), 4
        ).alias("exact_dup_rate"),
        F.round(F.percentile("__tok", F.lit(0.5)), 4).alias("median_tokens"),
        F.round(F.percentile("__tok", F.lit(0.95)), 4).alias("p95_tokens"),
        # within_bound pattern (see approx_distinct_users): the raw
        # sketch value is engine-specific, the BOOLEAN is deterministic.
        # The sketch is compared against the exact DISCRETE quantile —
        # approx_percentile approximates percentile_disc, and holding
        # it to the continuous (interpolated) value would fail small
        # groups on the definition gap, not on sketch error.
        (
            F.abs(
                F.approx_percentile("__tok", F.lit(0.95))
                - F.expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY __tok)")
            )
            <= 0.05
            * F.expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY __tok)")
        ).alias("p_approx_within_5pct"),
    ]
    if "__lm" in pre.columns:
        aggs.append(F.round(F.avg("__lm"), 4).alias("lang_match_rate"))
    out = grouped.agg(*aggs)
    return out.orderBy(*group_cols) if group_cols else out


def unigram_logprob_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_size: int = 50_000,
    cjk: "Column | None" = None,
) -> DataFrame:
    """CCNet-style statistical quality signal: per-document mean
    unigram log-probability under the corpus's own empirical unigram
    model — the standard complement to rule-based filters (Gopher
    flags catch malformed text; a low mean logprob catches text whose
    VOCABULARY is unusual for the corpus: boilerplate, codes, wrong
    domain). CCNet uses a KenLM 5-gram; the unigram model is the same
    signal class with no external model artifact.

    Two passes by nature (the model IS the corpus): (1) one
    token-keyed aggregate builds the top-``vocab_size`` unigram table
    (small — it is broadcast); (2) one per-document aggregate averages
    ``ln(count/N)`` over the document's tokens, with out-of-vocabulary
    tokens floored at ``ln(0.5/N)``. Output: ``(id, n_tokens,
    mean_logprob)`` — higher (less negative) = more typical text.

    Scale shape: the only corpus-sized shuffles are the two aggregates
    (both map-side combined, short keys); the vocabulary joins back as
    a broadcast. Document text never shuffles.
    No reference counterpart (extension op).
    """
    from ..functions.text import cjk_char_tokens_expr, tokens_expr

    # ``cjk`` (round 14, typically ``is_cjk_doc_expr``): routed rows
    # tokenize at the CHAR grain — an unsegmented CJK document is one
    # giant unique token under whitespace tokenization, so its "mean
    # unigram logprob" is a single OOV floor, not a typicality signal.
    # The model is shared (one vocabulary over both grains); pair the
    # score with a per-language cut (adaptive_quality_filter) rather
    # than a global constant when the corpus is multilingual.
    tok_arr = tokens_expr(text_col)
    if cjk is not None:
        tok_arr = F.when(cjk, cjk_char_tokens_expr(text_col)).otherwise(
            tok_arr
        )
    toks = df.select(
        F.col(id_col).alias("id"), F.explode(tok_arr).alias("__t")
    ).where(F.col("__t") != "")

    # round 16 (optimization): the count table feeds THREE consumers
    # (vocab top-V, the 1-row total, and — in the bigram sibling — the
    # conditional fold); un-materialized, Catalyst inlines the full
    # tokenize+explode+aggregate subtree into each one, so the corpus
    # was being re-tokenized once per consumer (guide §1.2 step 1:
    # duplicated subtrees). The aggregate output is vocabulary-sized
    # (tiny next to the corpus), so one eager localCheckpoint buys
    # back two full corpus passes.
    counts = toks.groupBy("__t").agg(
        F.count("*").alias("__c")
    ).localCheckpoint(eager=True)
    # top-V by count (ties by token for determinism) via orderBy+limit,
    # which compiles to TakeOrderedAndProject: per-partition top-V
    # merged on the driver — never a single-partition sort of the full
    # distinct vocabulary (a global row_number window would be one)
    vocab = counts.orderBy(F.col("__c").desc(), F.col("__t").asc()).limit(
        vocab_size
    )
    total = counts.agg(F.sum("__c").cast("double").alias("__n"))

    scored = (
        toks.join(F.broadcast(vocab), on="__t", how="left")
        .crossJoin(F.broadcast(total))
        .select(
            "id",
            F.log(
                F.coalesce(F.col("__c").cast("double"), F.lit(0.5)) / F.col("__n")
            ).alias("__lp"),
        )
    )
    return (
        scored.groupBy(F.col("id").alias(id_col))
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.round(F.avg("__lp"), 6).alias("mean_logprob"),
        )
    )


def bigram_logprob_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_size: int = 50_000,
    bigram_size: int = 200_000,
    min_count: int = 2,
    lam: float = 0.7,
    cjk: "Column | None" = None,
) -> DataFrame:
    """Interpolated bigram language-model quality score — the CCNet
    signal one context grain up from ``unigram_logprob_scores``: each
    bigram position (w_prev, w) of a document scores

        ln( lam * P(w | w_prev)  +  (1 - lam) * P(w) )

    under the corpus's own empirical model, where the conditional is
    c(w_prev, w) / c(w_prev) for bigrams in the model table (count >=
    ``min_count``, top-``bigram_size`` by (count DESC, pair ASC)) and
    0 otherwise — Jelinek-Mercer interpolation, so unseen pairs back
    off to the unigram term (top-``vocab_size`` with the same
    ln(0.5/N) OOV floor as the unigram op) instead of -inf. A low
    score now catches text whose WORD ORDER is unusual for the corpus
    (shuffled text, keyword stuffing, concatenated fragments) — the
    unigram model, by construction, cannot: it scores a document and
    its shuffle identically. Output ``(id, n_bigrams, mean_logprob2)``
    over documents with >= 2 tokens; higher = more typical.

    Scale shape (mirrors the unigram op, one grain up): bigrams are
    built IN-ROW and exploded once; the model tables come from two
    map-side-combined short-key aggregates; the conditional P(w|w_prev)
    is FOLDED INTO the bigram table at build time (one short-key join
    of the pruned bigram counts against exact unigram counts — so the
    scoring pass needs no separate c(w_prev) lookup and the full
    unigram relation is never broadcast); scoring joins the exploded
    positions against the two BROADCAST model tables + a 1-row total.
    Document text never shuffles; the only corpus-sized exchanges are
    the two count aggregates and the final per-document mean.
    No reference counterpart (extension op — corpus text analysis).

    ``cjk`` (round 15, typically ``is_cjk_doc_expr``) routes a row's
    tokens to the CHAR grain, the same routing its unigram sibling got
    in round 14 — unrouted, an unsegmented CJK document is ONE
    whitespace token, so it has zero bigram positions and no score at
    all (it vanishes from the output); routed, its bigram positions
    are adjacent CHAR pairs — exactly the BM25 CJK term grain — and
    the word-order signal is real. The model is shared (one bigram
    table over both grains); pair with a per-language cut when the
    corpus is multilingual, as with the unigram score.
    """
    base = _lm_token_arrays(df, id_col, text_col, cjk)
    uni, vocab, total = _lm_unigram_tables(base, vocab_size)
    bi_full = _lm_bigram_counts(base)
    return _bigram_scores(
        base, uni, vocab, total, bi_full, id_col, bigram_size, min_count, lam
    )


def _lm_token_arrays(df, id_col, text_col, cjk) -> DataFrame:
    """``(id, __t)`` — the routed, empty-filtered token array per row,
    EAGERLY MATERIALIZED (round 16 optimization). Every n-gram model
    table and every scoring pass reads these arrays; un-materialized,
    Catalyst inlines the tokenizer into each consumer, so the bigram
    op re-tokenized the corpus 5x and the trigram op 7x per execution
    (guide §1.2 step 1 — fix the duplicated subtree before anything
    else). The checkpoint is corpus-sized (the arrays weigh about as
    much as the text); at 100 TB that is a deliberate
    space-for-passes trade — the same one CCNet's pipeline makes by
    materializing its tokenized shards — and it lives on executor
    local disk, never the driver."""
    from ..functions.text import cjk_char_tokens_expr

    tok_arr = tokens_expr(text_col)
    if cjk is not None:
        tok_arr = F.when(cjk, cjk_char_tokens_expr(text_col)).otherwise(
            tok_arr
        )
    toks = F.filter(tok_arr, lambda t: t != "")
    return df.select(
        F.col(id_col).alias("id"), toks.alias("__t")
    ).localCheckpoint(eager=True)


def _lm_unigram_tables(base, vocab_size):
    """(uni, vocab, total) from the materialized token arrays. ``uni``
    is vocabulary-sized and feeds 2-3 consumers (top-V, the 1-row
    total, and the conditional folds), so it is checkpointed too."""
    uni = (
        base.select(F.explode("__t").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("c1"))
        .localCheckpoint(eager=True)
    )
    vocab = uni.orderBy(F.col("c1").desc(), F.col("tok").asc()).limit(
        int(vocab_size)
    )
    total = uni.agg(F.sum("c1").cast("double").alias("__n"))
    return uni, vocab, total


def _lm_bi_arr():
    m = F.size("__t")
    return F.transform(
        F.sequence(F.lit(1), m - 1),
        lambda i: F.struct(
            F.element_at("__t", i).alias("a"),
            F.element_at("__t", i + 1).alias("b"),
        ),
    )


def _lm_bigram_counts(base) -> DataFrame:
    """``(a, b, cab)`` over ALL adjacent pairs — the bigram model's
    numerator and the trigram conditional's denominator. Checkpointed:
    it is the shared denominator relation (distinct-pair-sized, far
    smaller than the position stream that builds it)."""
    return (
        base.where(F.size("__t") >= 2)
        .select(F.explode(_lm_bi_arr()).alias("__bi"))
        .select(F.col("__bi.a").alias("a"), F.col("__bi.b").alias("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("cab"))
        .localCheckpoint(eager=True)
    )


def _bigram_scores(
    base, uni, vocab, total, bi_full, id_col, bigram_size, min_count, lam
) -> DataFrame:
    pairs = (
        base.where(F.size("__t") >= 2)
        .select("id", F.explode(_lm_bi_arr()).alias("__bi"))
        .select("id", F.col("__bi.a").alias("a"), F.col("__bi.b").alias("b"))
    )
    # model table with the conditional folded in: P(b|a) = cab / ca
    btable = (
        bi_full.where(F.col("cab") >= int(min_count))
        .orderBy(F.col("cab").desc(), F.col("a").asc(), F.col("b").asc())
        .limit(int(bigram_size))
        .join(uni.select(F.col("tok").alias("a"), F.col("c1").alias("ca")), on="a")
        .select("a", "b", (F.col("cab").cast("double") / F.col("ca")).alias("__pb"))
    )
    scored = (
        pairs.join(F.broadcast(btable), on=["a", "b"], how="left")
        .join(
            F.broadcast(vocab.select(F.col("tok").alias("b"), "c1")),
            on="b",
            how="left",
        )
        .crossJoin(F.broadcast(total))
        .select(
            "id",
            F.log(
                F.lit(float(lam)) * F.coalesce(F.col("__pb"), F.lit(0.0))
                + F.lit(1.0 - float(lam))
                * (
                    F.coalesce(F.col("c1").cast("double"), F.lit(0.5))
                    / F.col("__n")
                )
            ).alias("__lp"),
        )
    )
    return scored.groupBy(F.col("id").alias(id_col)).agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.round(F.avg("__lp"), 6).alias("mean_logprob2"),
    )


def trigram_logprob_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_size: int = 50_000,
    bigram_size: int = 200_000,
    trigram_size: int = 200_000,
    min_count: int = 2,
    lam3: float = 0.5,
    lam2: float = 0.3,
    cjk: "Column | None" = None,
) -> DataFrame:
    """Interpolated TRIGRAM language-model quality score (round 16) —
    one context grain up from ``bigram_logprob_scores``, the last
    cheap rung toward CCNet's published 5-gram KenLM recipe: each
    trigram position (w_2, w_1, w) of a document scores

        ln( lam3 * P(w | w_2, w_1) + lam2 * P(w | w_1)
            + (1 - lam3 - lam2) * P(w) )

    under the corpus's own empirical model — Jelinek-Mercer
    interpolation down the order ladder, so an unseen trigram backs
    off to the bigram term and an unseen bigram to the unigram term
    (same top-``vocab_size`` + ln-floor OOV shape as the siblings).
    Conditionals use UNPRUNED lower-order denominators: P(w|w_2,w_1)
    = c3/c(w_2,w_1) over the full bigram counts and P(w|w_1) =
    c2/c(w_1) over the full unigram counts, folded into the pruned
    model tables at build time (count >= ``min_count``, top-N by
    (count DESC, key ASC)) so scoring needs no denominator lookups.
    Output ``(id, n_trigrams, mean_logprob3)`` over documents with
    >= 3 tokens; higher = more typical. What the extra order buys:
    the bigram model scores "the cat the cat the" as locally typical
    pairs; the trigram sees the period-2 loop.

    Same broadcast-table scale shape as the bigram op: positions are
    built in-row and exploded once; the model tables come from
    map-side-combined short-key aggregates; scoring joins the
    exploded positions against three BROADCAST tables + a 1-row
    total. Document text never shuffles. ``cjk`` routes rows to the
    CHAR grain exactly as the siblings do. No reference counterpart
    (extension op)."""
    base = _lm_token_arrays(df, id_col, text_col, cjk)
    uni, vocab, total = _lm_unigram_tables(base, vocab_size)
    # full bigram counts over ALL adjacent pairs (the trigram
    # conditional's denominator AND the bigram model's numerator) —
    # derived from the token arrays, not from the trigram positions,
    # so the final pair of a 2-token doc counts too (grain parity
    # with bigram_logprob_scores' own model)
    bi_full = _lm_bigram_counts(base)
    return _trigram_scores(
        base, uni, vocab, total, bi_full, id_col,
        bigram_size, trigram_size, min_count, lam3, lam2,
    )


def _trigram_scores(
    base, uni, vocab, total, bi_full, id_col,
    bigram_size, trigram_size, min_count, lam3, lam2,
) -> DataFrame:
    m = F.size("__t")
    tri_arr = F.transform(
        F.sequence(F.lit(1), m - 2),
        lambda i: F.struct(
            F.element_at("__t", i).alias("a"),
            F.element_at("__t", i + 1).alias("b"),
            F.element_at("__t", i + 2).alias("w"),
        ),
    )
    tris = (
        base.where(m >= 3)
        .select("id", F.explode(tri_arr).alias("__tr"))
        .select(
            "id",
            F.col("__tr.a").alias("a"),
            F.col("__tr.b").alias("b"),
            F.col("__tr.w").alias("w"),
        )
    )
    btable = (
        bi_full.where(F.col("cab") >= int(min_count))
        .orderBy(F.col("cab").desc(), F.col("a").asc(), F.col("b").asc())
        .limit(int(bigram_size))
        .join(
            uni.select(F.col("tok").alias("a"), F.col("c1").alias("ca")),
            on="a",
        )
        .select(
            F.col("a").alias("b"),
            F.col("b").alias("w"),
            (F.col("cab").cast("double") / F.col("ca")).alias("__pb"),
        )
    )
    ttable = (
        tris.groupBy("a", "b", "w")
        .agg(F.count("*").alias("c3"))
        .where(F.col("c3") >= int(min_count))
        .orderBy(
            F.col("c3").desc(),
            F.col("a").asc(),
            F.col("b").asc(),
            F.col("w").asc(),
        )
        .limit(int(trigram_size))
        .join(bi_full, on=["a", "b"])
        .select(
            "a", "b", "w",
            (F.col("c3").cast("double") / F.col("cab")).alias("__pt"),
        )
    )
    lam1 = 1.0 - float(lam3) - float(lam2)
    scored = (
        tris.join(F.broadcast(ttable), on=["a", "b", "w"], how="left")
        .join(F.broadcast(btable), on=["b", "w"], how="left")
        .join(
            F.broadcast(vocab.select(F.col("tok").alias("w"), "c1")),
            on="w",
            how="left",
        )
        .crossJoin(F.broadcast(total))
        .select(
            "id",
            F.log(
                F.lit(float(lam3)) * F.coalesce(F.col("__pt"), F.lit(0.0))
                + F.lit(float(lam2)) * F.coalesce(F.col("__pb"), F.lit(0.0))
                + F.lit(lam1)
                * (
                    F.coalesce(F.col("c1").cast("double"), F.lit(0.5))
                    / F.col("__n")
                )
            ).alias("__lp"),
        )
    )
    return scored.groupBy(F.col("id").alias(id_col)).agg(
        F.count("*").cast("long").alias("n_trigrams"),
        F.round(F.avg("__lp"), 6).alias("mean_logprob3"),
    )


def bitri_logprob_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_size: int = 50_000,
    bigram_size: int = 200_000,
    trigram_size: int = 200_000,
    min_count: int = 2,
    lam: float = 0.7,
    lam3: float = 0.5,
    lam2: float = 0.3,
    cjk: "Column | None" = None,
) -> tuple[DataFrame, DataFrame]:
    """Both interpolated n-gram scores over ONE shared model build
    (round 16 optimization): returns ``(bigram_scores,
    trigram_scores)`` — row-identical to calling
    ``bigram_logprob_scores`` and ``trigram_logprob_scores``
    separately (pytest pins the equivalence) — but the tokenized
    arrays, the unigram count table, and the full bigram count table
    are materialized ONCE and shared by both models. Separately, the
    two ops tokenize the corpus 12x between them (5 + 7 duplicated
    subtrees); fused, the corpus is tokenized once and re-read from
    the checkpoint 5x. Use this when a pipeline wants both scores
    (the top_terms doclp2+doclp3 composition)."""
    base = _lm_token_arrays(df, id_col, text_col, cjk)
    uni, vocab, total = _lm_unigram_tables(base, vocab_size)
    bi_full = _lm_bigram_counts(base)
    lp2 = _bigram_scores(
        base, uni, vocab, total, bi_full, id_col, bigram_size, min_count, lam
    )
    lp3 = _trigram_scores(
        base, uni, vocab, total, bi_full, id_col,
        bigram_size, trigram_size, min_count, lam3, lam2,
    )
    return lp2, lp3


def bigram_pmi(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    top_n: int = 50,
) -> DataFrame:
    """Collocation mining: top-``top_n`` adjacent-token bigrams by
    pointwise mutual information (Church & Hanks 1990),

        PMI(a,b) = ln( (c_ab / N_bigrams) / ((c_a / N_toks)(c_b / N_toks)) )

    with ``c_ab >= min_count`` (PMI is notoriously noisy on rare
    pairs). Output ``(bigram, cnt, pmi)`` ordered by (pmi DESC, bigram
    ASC); ``pmi`` is ROUND(..., 6) so the DuckDB oracle hash-matches
    the double math.

    Scale shape: bigrams are built IN-ROW (one zip over the token
    array — the corpus explodes once per grain, never a self-join);
    unigram and bigram counts are map-side-combined aggregates on
    token keys; the ``HAVING min_count`` subset joins the (much
    smaller) unigram-count relation on short keys; the two corpus-wide
    totals ride a 1-row broadcast; top-N is TakeOrderedAndProject (no
    global sort materialization). No reference counterpart (extension
    op — corpus text analysis family).
    """
    toks = F.filter(tokens_expr(text_col), lambda t: t != "")
    base = df.select(toks.alias("__t"))
    uni = (
        base.select(F.explode("__t").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("c1"))
    )
    m = F.size("__t")
    bi_arr = F.transform(
        F.sequence(F.lit(1), m - 1),
        lambda i: F.struct(
            F.element_at("__t", i).alias("a"),
            F.element_at("__t", i + 1).alias("b"),
        ),
    )
    bi = (
        base.where(m >= 2)
        .select(F.explode(bi_arr).alias("__bi"))
        .select(F.col("__bi.a").alias("a"), F.col("__bi.b").alias("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("cab"))
        .where(F.col("cab") >= int(min_count))
    )
    totals = base.select(
        F.sum(m).alias("nt"), F.sum(F.greatest(m - 1, F.lit(0))).alias("nb")
    )
    joined = (
        bi.join(uni.select(F.col("tok").alias("a"), F.col("c1").alias("ca")), on="a")
        .join(uni.select(F.col("tok").alias("b"), F.col("c1").alias("cb")), on="b")
        .crossJoin(F.broadcast(totals))
    )
    pmi = F.round(
        F.log(
            (F.col("cab").cast("double") / F.col("nb"))
            / (
                (F.col("ca").cast("double") / F.col("nt"))
                * (F.col("cb").cast("double") / F.col("nt"))
            )
        ),
        6,
    )
    return (
        joined.select(
            F.concat_ws(" ", "a", "b").alias("bigram"),
            F.col("cab").cast("long").alias("cnt"),
            pmi.alias("pmi"),
        )
        .orderBy(F.col("pmi").desc(), F.col("bigram").asc())
        .limit(int(top_n))
    )


def profile_columns(
    df: DataFrame, cols: list[str] | None = None
) -> DataFrame:
    """Generic per-COLUMN relational profile — the Deequ-profiler
    sibling of the document-corpus ``corpus_profile`` and the
    discovery half of the ``check_expectations`` gate (run this to see
    a stream's shape, then pin what you saw as constraints).

    One aggregate pass over the table regardless of column count:
    per column — null count/fraction, approximate distinct count
    (HLL at rsd 2%), min and max (stringified for the uniform report
    schema) — then an engine-level ``stack`` unpivot to one row per
    column: ``(column, dtype, n, n_nulls, null_frac,
    approx_distinct, min, max)``. Columns of non-orderable or nested
    types (map/array/struct) keep their null stats but report NULL
    min/max/distinct (map keys aren't even hashable engine-side;
    profile their fields or sizes explicitly instead). At 100 TB this
    is one map-side-combined scan — same cost class as
    ``corpus_profile``.
    """
    from pyspark.sql import types as T

    cols = list(cols) if cols is not None else list(df.columns)
    missing = [c for c in cols if c not in df.columns]
    if not cols or missing:
        raise ValueError(
            f"profile_columns: unknown columns {missing}" if missing
            else "profile_columns: no columns to profile"
        )
    dtypes = {f.name: f.dataType for f in df.schema.fields}
    simple = (
        T.NumericType, T.StringType, T.BooleanType, T.DateType,
        T.TimestampType, T.TimestampNTZType, T.BinaryType,
    )
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"__nulls{i}"))
        if isinstance(dtypes[c], simple):
            # rsd 2% (not the 5% default): a profile feeding constraint
            # decisions should not be off by 1-in-20
            aggs.append(F.approx_count_distinct(c, 0.02).alias(f"__dist{i}"))
            aggs.append(F.min(c).cast("string").alias(f"__min{i}"))
            aggs.append(F.max(c).cast("string").alias(f"__max{i}"))
        else:
            aggs.append(F.lit(None).cast("long").alias(f"__dist{i}"))
            aggs.append(F.lit(None).cast("string").alias(f"__min{i}"))
            aggs.append(F.lit(None).cast("string").alias(f"__max{i}"))
    one = df.agg(*aggs)

    def lit(s: str) -> str:
        return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

    stack = "stack({n}, {args}) as (column, dtype, n_nulls, approx_distinct, min, max)".format(
        n=len(cols),
        args=", ".join(
            f"{lit(c)}, {lit(dtypes[c].simpleString())}, "
            f"__nulls{i}, __dist{i}, __min{i}, __max{i}"
            for i, c in enumerate(cols)
        ),
    )
    return one.select(F.expr(stack), F.col("__n").alias("n")).select(
        "column",
        "dtype",
        "n",
        "n_nulls",
        F.round(F.col("n_nulls") / F.greatest(F.col("n"), F.lit(1)), 6).alias(
            "null_frac"
        ),
        "approx_distinct",
        "min",
        "max",
    )


def group_quantile_cuts(
    df: DataFrame,
    score_col: str,
    group_col: str = "lang",
    q: float = 0.25,
    exact: bool = True,
    cut_col: str = "group_cut",
) -> DataFrame:
    """Per-group score quantile: ``(group_col, cut_col)``, one row per
    group. ``exact=True`` uses the interpolated exact percentile (the
    oracle path — DuckDB's ``quantile_cont`` restates it, the
    corpus_profile precedent); ``exact=False`` uses the mergeable
    ``approx_percentile`` sketch — the 100 TB path, where per-group
    sketches combine map-side and the cut never needs a value sort.
    Either way: ONE map-side-combined aggregate collapsing to
    <= |groups| rows."""
    if not 0.0 < q < 1.0:
        raise ValueError(f"q must be in (0, 1), got {q}")
    agg = (
        F.percentile(score_col, F.lit(q))
        if exact
        else F.approx_percentile(score_col, F.lit(q))
    )
    return df.groupBy(group_col).agg(agg.alias(cut_col))


def adaptive_quality_filter(
    df: DataFrame,
    score_col: str,
    group_col: str = "lang",
    q: float = 0.25,
    exact: bool = True,
    cut_col: str = "group_cut",
    keep_col: str = "above_group_cut",
) -> DataFrame:
    """Per-group ADAPTIVE quality threshold — the RefinedWeb/FineWeb
    per-language curation recipe: instead of one global constant (which
    over-prunes whichever language the heuristic scores low), each
    group's cut is its OWN q-th score quantile, dropping the same
    bottom fraction everywhere. Adds ``cut_col`` (the group's cut) and
    ``keep_col`` (``score >= cut``) to every row.

    Scale shape: the cuts relation is <= |groups| rows and broadcast
    back onto the corpus — the corpus itself never shuffles. Groups
    absent from the cuts side (NULL group) keep ``keep_col = NULL``
    rather than a silent drop/keep."""
    cuts = group_quantile_cuts(df, score_col, group_col, q, exact, cut_col)
    out = df.join(F.broadcast(cuts), on=group_col, how="left")
    return out.withColumn(keep_col, F.col(score_col) >= F.col(cut_col))
