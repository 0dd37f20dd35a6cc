"""Corpus-profile aggregate tests (extension op)."""

import pytest
from pyspark.sql import functions as F

from gluestick_ts_spark.operators.profile import corpus_profile


@pytest.fixture()
def corpus(spark):
    return spark.createDataFrame(
        [
            (1, "srcA", "en", "the quick brown fox jumps over the lazy dog"),
            (2, "srcA", "en", "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
            (3, "srcA", "en", "completely different text with the usual words in it"),
            (4, "srcB", "fr", "le chat est sur la table et il dort"),
        ],
        "doc_id long, source string, lang string, text string",
    )


def test_profile_volumes_and_dup_rate(spark, corpus):
    rows = {(r.source, r.lang): r for r in corpus_profile(corpus).collect()}
    a = rows[("srcA", "en")]
    assert a.n_docs == 3
    assert a.n_tokens == 9 + 9 + 9
    assert a.avg_tokens == pytest.approx(9.0)
    # docs 1 and 2 share a fingerprint: 1 - 2 distinct / 3 docs
    assert a.exact_dup_rate == pytest.approx(round(1 - 2 / 3, 4))
    b = rows[("srcB", "fr")]
    assert b.n_docs == 1 and b.exact_dup_rate == 0.0
    # rates are probabilities
    for r in rows.values():
        assert 0.0 <= r.gopher_pass_rate <= 1.0
        assert 0.0 <= r.lang_match_rate <= 1.0


def test_profile_whole_corpus_and_no_lang(spark, corpus):
    whole = corpus_profile(corpus, group_cols=[]).collect()
    assert len(whole) == 1 and whole[0].n_docs == 4
    noname = corpus_profile(corpus.drop("lang"), group_cols=["source"]).collect()
    assert "lang_match_rate" not in noname[0].asDict()


def test_profile_consistent_with_text_stats(spark, sf_dir):
    """quality_mean / gopher_pass_rate must equal the mean of the
    oracle-checked per-doc text_stats columns over the same slice —
    transitive oracle coverage without a registry slot."""
    from gluestick_ts_spark.plans.queries import QUERIES

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    prof = corpus_profile(d, group_cols=[]).collect()[0]
    stats = QUERIES["text_stats"](spark, sf_dir)
    agg = stats.agg(
        F.round(F.avg("quality"), 4).alias("q"),
        F.round(F.avg(F.col("gopher_pass").cast("int")), 4).alias("gp"),
        F.count("*").alias("n"),
    ).collect()[0]
    assert prof.n_docs == agg.n
    assert prof.quality_mean == pytest.approx(agg.q, abs=1e-4)
    assert prof.gopher_pass_rate == pytest.approx(agg.gp, abs=1e-4)


def test_profile_plan_is_one_aggregation_pass(spark, sf_dir):
    """Map-only projection + hash aggregation: no Python operators, no
    joins, and at most the two exchanges the distinct-count aggregate
    needs (partial on (group, fp), final on group)."""
    import re

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = corpus_profile(d)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan
    assert len(re.findall(r"Exchange hashpartitioning", plan)) <= 2, plan


def test_unigram_logprob_scores(spark):
    """The common-vocabulary doc scores higher than the rare-vocabulary
    doc; values equal the hand-computed empirical unigram model; OOV
    floors at ln(0.5/N) when the vocab is capped."""
    import math

    from gluestick_ts_spark.operators.profile import unigram_logprob_scores

    corpus = spark.createDataFrame(
        [
            (1, "the the the cat"),
            (2, "the cat"),
            (3, "zyx qwv"),  # rare singletons
        ],
        "doc_id long, text string",
    )
    # counts: the=4, cat=2, zyx=1, qwv=1; N=8
    out = {r.doc_id: r for r in unigram_logprob_scores(corpus).collect()}
    n = 8.0
    exp1 = (3 * math.log(4 / n) + math.log(2 / n)) / 4
    exp3 = math.log(1 / n)
    assert out[1].n_tokens == 4
    assert out[1].mean_logprob == pytest.approx(round(exp1, 6), abs=1e-6)
    assert out[3].mean_logprob == pytest.approx(round(exp3, 6), abs=1e-6)
    assert out[1].mean_logprob > out[2].mean_logprob > out[3].mean_logprob

    # cap the vocab at 2: zyx/qwv fall out and floor at ln(0.5/N)
    capped = {
        r.doc_id: r.mean_logprob
        for r in unigram_logprob_scores(corpus, vocab_size=2).collect()
    }
    assert capped[3] == pytest.approx(round(math.log(0.5 / n), 6), abs=1e-6)


def test_unigram_logprob_plan_shape(spark, sf_dir):
    """Two aggregates and a broadcast vocab join — no sort-merge join,
    no Python, and the document text never appears in an exchange."""
    import re

    from gluestick_ts_spark.operators.profile import unigram_logprob_scores

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = unigram_logprob_scores(d)._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan
    assert "text" not in " ".join(re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan))


def test_bigram_pmi_hand_computed(spark):
    """PMI on a corpus tiny enough to verify by hand: 'new york'
    co-occurs always, so PMI(new, york) = ln((2/6)/((2/8)(2/8))) =
    ln(16/3); rare pairs below min_count are dropped; ordering is
    (pmi DESC, bigram ASC)."""
    import math

    from gluestick_ts_spark.operators.profile import bigram_pmi

    docs = spark.createDataFrame(
        [(1, "new york is big"), (2, "new york was big and old")],
        "doc_id long, text string",
    )
    # tokens: 8 total, bigrams: 3 + 3... doc2 has 6 tokens -> 5 bigrams
    # recompute: doc1 4 toks/3 bi, doc2 6 toks/5 bi -> nt=10, nb=8
    got = {r.bigram: r for r in bigram_pmi(docs, min_count=2, top_n=10).collect()}
    assert set(got) == {"new york"}  # only pair with count >= 2
    exp = math.log((2 / 8) / ((2 / 10) * (2 / 10)))
    assert got["new york"].cnt == 2
    assert abs(got["new york"].pmi - round(exp, 6)) < 1e-9
    # plan: the only join shapes are short-key equi-joins + the 1-row
    # totals broadcast; the corpus never self-joins
    plan = bigram_pmi(docs)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# profile_columns (generic relational profiler)
# ---------------------------------------------------------------------------

def test_profile_columns_report(spark):
    from gluestick_ts_spark.operators.profile import profile_columns

    df = spark.createDataFrame(
        [(1, "a", 1.5, ["x"]), (2, None, 2.5, []), (2, "c", None, None)],
        "id long, s string, v double, arr array<string>",
    )
    rep = {r.column: r for r in profile_columns(df).collect()}
    assert set(rep) == {"id", "s", "v", "arr"}
    assert all(r.n == 3 for r in rep.values())
    assert rep["id"].n_nulls == 0 and rep["id"].approx_distinct == 2
    assert (rep["s"].min, rep["s"].max, rep["s"].n_nulls) == ("a", "c", 1)
    assert rep["v"].null_frac == 0.333333
    # nested types keep null stats, report NULL min/max/distinct
    assert rep["arr"].dtype == "array<string>"
    assert rep["arr"].n_nulls == 1 and rep["arr"].min is None
    assert rep["arr"].approx_distinct is None


def test_profile_columns_subset_validation_and_one_scan(spark):
    import re

    from gluestick_ts_spark.operators.profile import profile_columns

    df = spark.createDataFrame([(1, "a")], "id long, s string")
    sub = profile_columns(df, ["s"])
    assert [r.column for r in sub.collect()] == ["s"]
    with pytest.raises(ValueError, match="unknown columns"):
        profile_columns(df, ["nope"])
    with pytest.raises(ValueError, match="no columns"):
        profile_columns(df, [])
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = profile_columns(df)._jdf.queryExecution().explainString(mode)
    scans = re.findall(r"\(\d+\) (?:Scan|LocalTableScan)", plan)
    assert len(scans) <= 1, scans
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan, node


def test_bigram_logprob_hand_computed(spark):
    """Jelinek-Mercer interpolated bigram scores against hand math:
    corpus 'a b a b' / 'a b c' / 'c' with full vocab and min_count=1.
    Unigrams a:3 b:3 c:2 (N=8); bigrams (a,b):3 (b,a):1 (b,c):1;
    conditionals P(b|a)=1, P(a|b)=1/3, P(c|b)=1/3."""
    import math

    from gluestick_ts_spark.operators.profile import bigram_logprob_scores

    d = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c"), (3, "c")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in bigram_logprob_scores(
        d, vocab_size=10, bigram_size=10, min_count=1, lam=0.5
    ).collect()}
    # single-token doc 3 has no bigram positions
    assert set(out) == {1, 2}
    lp_ab = math.log(0.5 * 1.0 + 0.5 * 3 / 8)
    lp_ba = math.log(0.5 * (1 / 3) + 0.5 * 3 / 8)
    lp_bc = math.log(0.5 * (1 / 3) + 0.5 * 2 / 8)
    assert out[1].n_bigrams == 3
    assert abs(out[1].mean_logprob2 - round((2 * lp_ab + lp_ba) / 3, 6)) < 1e-9
    assert out[2].n_bigrams == 2
    assert abs(out[2].mean_logprob2 - round((lp_ab + lp_bc) / 2, 6)) < 1e-9


def test_bigram_logprob_backoff_and_oov_floor(spark):
    """min_count prunes rare pairs (they back off to the unigram term
    alone) and out-of-vocabulary tokens hit the ln(0.5/N) floor."""
    import math

    from gluestick_ts_spark.operators.profile import bigram_logprob_scores

    d = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c"), (3, "c")],
        "doc_id long, text string",
    )
    # vocab_size=2 -> vocab {a, b} (count DESC, tok ASC); c is OOV.
    # min_count=2 -> only (a,b) survives in the bigram table.
    out = {r.doc_id: r for r in bigram_logprob_scores(
        d, vocab_size=2, bigram_size=10, min_count=2, lam=0.5
    ).collect()}
    lp_ab = math.log(0.5 * 1.0 + 0.5 * 3 / 8)
    lp_ba = math.log(0.5 * 3 / 8)               # pair pruned: pure backoff
    lp_bc = math.log(0.5 * 0.5 / 8)             # pruned pair + OOV floor
    assert abs(out[1].mean_logprob2 - round((2 * lp_ab + lp_ba) / 3, 6)) < 1e-9
    assert abs(out[2].mean_logprob2 - round((lp_ab + lp_bc) / 2, 6)) < 1e-9


def test_bigram_logprob_detects_word_order(spark):
    """The property the unigram model cannot have: a document and its
    token-shuffle share a unigram score, but the bigram model ranks
    the in-order document strictly higher when the corpus repeats its
    phrases."""
    from gluestick_ts_spark.operators.profile import (
        bigram_logprob_scores,
        unigram_logprob_scores,
    )

    phrase = "the quick brown fox jumps over the lazy dog"
    shuffled = "dog the over fox lazy quick jumps brown the"
    corpus = [(i, phrase) for i in range(20)] + [(100, shuffled)]
    d = spark.createDataFrame(corpus, "doc_id long, text string")
    uni = {r.doc_id: r.mean_logprob
           for r in unigram_logprob_scores(d, vocab_size=100).collect()}
    assert uni[0] == uni[100]  # same bag of words
    bi = {r.doc_id: r.mean_logprob2
          for r in bigram_logprob_scores(
              d, vocab_size=100, bigram_size=100, min_count=2
          ).collect()}
    assert bi[0] > bi[100]


def test_bigram_logprob_cjk_route(spark):
    """Round 15: routed CJK rows score CHAR bigrams — unrouted, an
    unsegmented zh document is one whitespace token with ZERO bigram
    positions, so it silently vanishes from the output; routed, its
    positions are adjacent char pairs and repeated zh boilerplate
    scores higher than a character-shuffle of the same text (the
    word-order property, at the routed grain). Non-CJK rows score
    identically routed or not."""
    from gluestick_ts_spark.functions.text import is_cjk_doc_expr
    from gluestick_ts_spark.operators.profile import bigram_logprob_scores

    zh = "春天来了公园里的花都开了很多人来这里散步"
    zh_shuffled = "花了都春来很公了人天里这开多的园来里步散"  # same chars
    en = "the quick brown fox jumps over the lazy dog"
    corpus = (
        [(i, zh) for i in range(10)]
        + [(50, zh_shuffled)]
        + [(60, en), (61, en)]
    )
    d = spark.createDataFrame(corpus, "doc_id long, text string")
    cjk = is_cjk_doc_expr("text")
    plain = {r.doc_id: r for r in bigram_logprob_scores(
        d, vocab_size=100, bigram_size=200, min_count=2).collect()}
    routed = {r.doc_id: r for r in bigram_logprob_scores(
        d, vocab_size=100, bigram_size=200, min_count=2, cjk=cjk).collect()}
    # unrouted: every zh doc is 1 token -> no bigram rows at all
    assert 0 not in plain and 50 not in plain
    # routed: zh docs carry len-1 char-bigram positions and the
    # in-order boilerplate outscores its character shuffle
    assert routed[0].n_bigrams == len(zh) - 1
    assert routed[0].mean_logprob2 > routed[50].mean_logprob2
    # EN rows: same bigram positions either way; the SCORE may shift
    # because the model is shared (routing adds the zh char mass to
    # the unigram backoff total — the documented one-model contract)
    assert plain[60].n_bigrams == routed[60].n_bigrams == len(en.split()) - 1
    assert routed[60].mean_logprob2 == routed[61].mean_logprob2


def test_bigram_logprob_cjk_partition_invariant(spark):
    """The routed bigram model's two cuts (top-V vocab, top-B bigram
    table) tie-break on full (count DESC, key ASC) order — pure
    functions of the data — so re-partitioning the corpus leaves every
    routed score bit-identical (the standing invariance guard for
    grains with a cut)."""
    from gluestick_ts_spark.functions.text import is_cjk_doc_expr
    from gluestick_ts_spark.operators.profile import bigram_logprob_scores

    zh = "春天来了公园里的花都开了很多人来这里散步"
    rows = [(i, zh + str(i % 3)) for i in range(12)] + [
        (50 + i, f"the quick brown fox {i % 4} jumps over the lazy dog")
        for i in range(8)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def run(frame):
        return {
            r.doc_id: (r.n_bigrams, r.mean_logprob2)
            for r in bigram_logprob_scores(
                frame, vocab_size=40, bigram_size=60, min_count=2,
                cjk=is_cjk_doc_expr("text"),
            ).collect()
        }

    a = run(df)
    assert a == run(df.repartition(5)) == run(df.repartition(1))
    # count-visible: every routed zh doc carries char-bigram positions
    assert all(a[i][0] == len(zh + "0") - 1 for i in range(12))


def test_adaptive_quality_filter_per_group_cuts(spark):
    """Hand-computed per-group P50: group a scores [0,1,2,3] -> cut
    1.5; group b scores [10,20] -> cut 15. Membership is score >= own
    group's cut, never the other group's."""
    from gluestick_ts_spark.operators.profile import (
        adaptive_quality_filter,
        group_quantile_cuts,
    )

    rows = [("a", 0.0), ("a", 1.0), ("a", 2.0), ("a", 3.0),
            ("b", 10.0), ("b", 20.0)]
    d = spark.createDataFrame(rows, "g string, s double")
    cuts = {r.g: r.group_cut for r in group_quantile_cuts(d, "s", "g", 0.5).collect()}
    assert cuts == {"a": 1.5, "b": 15.0}
    out = adaptive_quality_filter(d, "s", "g", q=0.5)
    got = {(r.g, r.s): r.above_group_cut for r in out.collect()}
    assert got[("a", 0.0)] is False and got[("a", 1.0)] is False
    assert got[("a", 2.0)] is True and got[("a", 3.0)] is True
    assert got[("b", 10.0)] is False and got[("b", 20.0)] is True


def test_adaptive_quality_filter_approx_path_and_validation(spark, sf_dir):
    """The mergeable approx_percentile path (the 100 TB shape) must
    agree with the exact path on the large uniform-ish test corpus to
    within the sketch's documented accuracy; q outside (0,1) raises."""
    import pytest as _pytest

    from gluestick_ts_spark.functions.text import quality_score_expr
    from gluestick_ts_spark.operators.profile import group_quantile_cuts
    from tests.conftest import load

    d = load(spark, sf_dir, "documents").select(
        "lang", quality_score_expr("text").alias("s")
    )
    exact = {r.lang: r.group_cut for r in group_quantile_cuts(d, "s", "lang", 0.25).collect()}
    approx = {r.lang: r.group_cut
              for r in group_quantile_cuts(d, "s", "lang", 0.25, exact=False).collect()}
    for lang, cut in exact.items():
        assert abs(approx[lang] - cut) <= 0.05 * abs(cut) + 0.01
    with _pytest.raises(ValueError):
        group_quantile_cuts(d, "s", "lang", 1.5)


def test_trigram_logprob_hand_computed(spark):
    """Round 16: the trigram rung against hand math. Corpus
    'a b c a b c' / 'a b d' / 'd', full tables, min_count=1.
    Unigrams a:3 b:3 c:2 d:2 (N=10); full bigrams (a,b):3 (b,c):2
    (c,a):1 (b,d):1; trigrams (a,b,c):2 (b,c,a):1 (c,a,b):1 (a,b,d):1.
    Conditionals: P(c|a,b)=2/3, P(a|b,c)=1/2, P(b|c,a)=1/1,
    P(d|a,b)=1/3; bigram-level P(c|b)=2/3, P(a|c)=1/2, P(b|a)=1,
    P(d|b)=1/3."""
    import math

    from gluestick_ts_spark.operators.profile import trigram_logprob_scores

    d = spark.createDataFrame(
        [(1, "a b c a b c"), (2, "a b d"), (3, "d")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in trigram_logprob_scores(
        d, vocab_size=10, bigram_size=10, trigram_size=10,
        min_count=1, lam3=0.5, lam2=0.3,
    ).collect()}
    # sub-3-token docs have no trigram positions
    assert set(out) == {1, 2}
    l1 = 1.0 - 0.5 - 0.3
    lp_abc = math.log(0.5 * (2 / 3) + 0.3 * (2 / 3) + l1 * 2 / 10)
    lp_bca = math.log(0.5 * (1 / 2) + 0.3 * (1 / 2) + l1 * 3 / 10)
    lp_cab = math.log(0.5 * 1.0 + 0.3 * 1.0 + l1 * 3 / 10)
    lp_abd = math.log(0.5 * (1 / 3) + 0.3 * (1 / 3) + l1 * 2 / 10)
    assert out[1].n_trigrams == 4
    want1 = round((2 * lp_abc + lp_bca + lp_cab) / 4, 6)
    assert abs(out[1].mean_logprob3 - want1) < 1e-9, (
        out[1].mean_logprob3, want1
    )
    assert out[2].n_trigrams == 1
    assert abs(out[2].mean_logprob3 - round(lp_abd, 6)) < 1e-9


def test_trigram_logprob_backoff_ladder_and_oov(spark):
    """The order ladder degrades one level at a time: a pruned trigram
    backs off to bigram + unigram, a pruned bigram to unigram alone,
    an OOV word to the ln floor — each term vanishing exactly when its
    table refuses the key."""
    import math

    from gluestick_ts_spark.operators.profile import trigram_logprob_scores

    d = spark.createDataFrame(
        [(1, "a b c a b c"), (2, "a b d"), (3, "d")],
        "doc_id long, text string",
    )
    # min_count=2: trigram table keeps only (a,b,c); bigram table keeps
    # (a,b) and (b,c). vocab_size=3 -> {a, b, c} (count DESC, tok ASC);
    # d is OOV.
    out = {r.doc_id: r for r in trigram_logprob_scores(
        d, vocab_size=3, bigram_size=10, trigram_size=10,
        min_count=2, lam3=0.5, lam2=0.3,
    ).collect()}
    l1 = 1.0 - 0.5 - 0.3
    lp_abc = math.log(0.5 * (2 / 3) + 0.3 * (2 / 3) + l1 * 2 / 10)
    lp_bca = math.log(0.3 * 0.0 + l1 * 3 / 10)  # tri pruned, (c,a) pruned
    lp_cab = math.log(0.3 * 1.0 + l1 * 3 / 10)  # tri pruned, (a,b) kept
    lp_abd = math.log(l1 * 0.5 / 10)            # all pruned + OOV
    want1 = round((2 * lp_abc + lp_bca + lp_cab) / 4, 6)
    assert abs(out[1].mean_logprob3 - want1) < 1e-9
    assert abs(out[2].mean_logprob3 - round(lp_abd, 6)) < 1e-9


def test_trigram_logprob_detects_period_two_loop(spark):
    """What the extra order buys: 'the cat the cat the ...' is locally
    typical BIGRAM pairs in a corpus full of 'the cat' collocations
    interleaved with varied prose, but its period-2 structure makes
    its trigrams ('the cat the', 'cat the cat') distributionally rare
    — the trigram mean must rank the loop below the natural doc while
    sharing its vocabulary."""
    from gluestick_ts_spark.operators.profile import trigram_logprob_scores

    natural = [
        (i, f"the cat sat on the mat n{i % 5} and the cat ate fish f{i % 3}")
        for i in range(30)
    ]
    loop = [(100, "the cat " * 8 + "the")]
    df = spark.createDataFrame(
        natural + loop, "doc_id long, text string"
    )
    out = {r.doc_id: r.mean_logprob3 for r in trigram_logprob_scores(
        df, vocab_size=50, bigram_size=200, trigram_size=200, min_count=2,
    ).collect()}
    assert out[100] < out[0], (out[100], out[0])


def test_trigram_logprob_cjk_partition_invariant(spark):
    """Standing invariance guard for grains with a cut: all three
    pruned tables tie-break on (count DESC, key ASC) — pure functions
    of the data — so re-partitioning leaves every routed score
    bit-identical."""
    from gluestick_ts_spark.functions.text import is_cjk_doc_expr
    from gluestick_ts_spark.operators.profile import trigram_logprob_scores

    zh = "春天来了公园里的花都开了很多人来这里散步"
    rows = [(i, zh + str(i % 3)) for i in range(12)] + [
        (50 + i, f"the quick brown fox {i % 4} jumps over the lazy dog")
        for i in range(8)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def run(frame):
        return {
            r.doc_id: (r.n_trigrams, r.mean_logprob3)
            for r in trigram_logprob_scores(
                frame, vocab_size=40, bigram_size=60, trigram_size=60,
                min_count=2, cjk=is_cjk_doc_expr("text"),
            ).collect()
        }

    a = run(df.repartition(1))
    b = run(df.repartition(7, "doc_id"))
    assert a == b
    # routed zh docs score at the char grain (len-1... len-2 positions)
    assert a[0][0] == len(zh) + 1 - 2


def test_bitri_logprob_matches_separate_ops(spark):
    """Round 16 (optimization): the fused builder shares one
    materialized token/unigram/bigram model between both scores —
    this pins its rows bit-identical to the two standalone ops on a
    routed corpus that keeps every branch live (truncated tables,
    min_count prune, backoff ladder, OOV floor, CJK char grain)."""
    from gluestick_ts_spark.functions.text import is_cjk_doc_expr
    from gluestick_ts_spark.operators.profile import (
        bigram_logprob_scores,
        bitri_logprob_scores,
        trigram_logprob_scores,
    )

    zh = "春天来了公园里的花都开了很多人来这里散步"
    rows = [(i, zh + str(i % 3)) for i in range(12)] + [
        (50 + i, f"the quick brown fox {i % 4} jumps over the lazy dog")
        for i in range(8)
    ] + [(99, "x")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kw = dict(
        vocab_size=40, bigram_size=60, min_count=2,
        cjk=is_cjk_doc_expr("text"),
    )
    lp2_f, lp3_f = bitri_logprob_scores(
        df, trigram_size=60, lam=0.7, lam3=0.5, lam2=0.3, **kw
    )
    lp2_s = bigram_logprob_scores(df, lam=0.7, **kw)
    lp3_s = trigram_logprob_scores(
        df, trigram_size=60, lam3=0.5, lam2=0.3, **kw
    )

    def rows_of(frame):
        return sorted(tuple(r) for r in frame.collect())

    assert rows_of(lp2_f) == rows_of(lp2_s)
    assert rows_of(lp3_f) == rows_of(lp3_s)
