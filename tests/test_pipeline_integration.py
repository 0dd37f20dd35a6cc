"""End-to-end training-data-prep pipeline: the operators composed the
way a real corpus job would run them — exact dedup, fuzzy dedup,
quality/language filtering, deterministic splitting, token chunking —
with cross-stage invariants asserted on the real test corpus.

Each stage is individually oracle- or property-tested elsewhere; this
test pins the COMPOSITION: stages must not undo each other's
guarantees (a re-introduced duplicate, a split leak between train and
test, a chunk from a filtered-out document).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gluestick_ts_spark.functions.sampling import hash_split
from gluestick_ts_spark.functions.text import (
    chunk_tokens,
    fingerprint_expr,
    lang_id_expr,
    quality_score_expr,
    token_count_expr,
)
from gluestick_ts_spark.operators.dedup import dedup_exact, dedup_minhash
from gluestick_ts_spark.sources.parquet_compat import read_parquet_compat


def test_llm_data_prep_pipeline(spark, sf_dir):
    docs = read_parquet_compat(spark, f"{sf_dir}/documents.parquet")
    n_raw = docs.count()

    # 1. exact dedup: one survivor per normalized fingerprint
    exact = dedup_exact(docs)
    fps = exact.select(fingerprint_expr("text").alias("fp"))
    assert fps.count() == fps.distinct().count()

    # 2. fuzzy dedup on the exact survivors
    fuzzy = dedup_minhash(exact, threshold=0.7)
    n_fuzzy = fuzzy.count()
    assert n_fuzzy <= exact.count() <= n_raw

    # 3. quality + language gate (pure Column exprs)
    scored = fuzzy.select(
        "*",
        quality_score_expr("text").alias("q"),
        lang_id_expr("text").alias("lang_pred"),
    )
    kept = scored.where((F.col("q") >= 0.3) & F.col("lang_pred").isNotNull())
    n_kept = kept.count()
    assert 0 < n_kept <= n_fuzzy

    # 4. deterministic split: disjoint, exhaustive, reproducible
    split = hash_split(kept, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    by_split = {r["split"]: r["n"] for r in split.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(by_split.values()) == n_kept
    assert set(by_split) <= {"train", "val", "test"}
    assert by_split.get("train", 0) > by_split.get("test", 0)
    again = hash_split(kept, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    assert [r["doc_id"] for r in split.where("split='test'").orderBy("doc_id").collect()] == [
        r["doc_id"] for r in again.where("split='test'").orderBy("doc_id").collect()
    ]

    # 5. chunk only the train split; every chunk traces to a kept train doc
    train = split.where("split='train'")
    chunks = chunk_tokens(train, chunk_size=64, overlap=8)
    n_train = train.count()
    assert chunks.count() >= n_train  # >=1 chunk per doc
    stray = chunks.join(train.select("doc_id"), on="doc_id", how="left_anti")
    assert stray.count() == 0

    # 6. budget accounting: chunk token totals are bounded by the
    # whitespace token count plus per-chunk overlap duplication
    totals = chunks.agg(F.sum("n_tokens").alias("chunk_toks"), F.count("*").alias("n_chunks")).first()
    doc_toks = train.agg(
        F.sum(token_count_expr("text")).alias("t")
    ).first()["t"]
    assert totals["chunk_toks"] <= doc_toks + totals["n_chunks"] * 8


def test_curation_drop_reason_histogram_stable_at_corpus_scale(spark):
    """The end-to-end curation verdict's drop-reason histogram pinned
    against the sf0.1 corpus — every stage (benchmark, contamination,
    duplicate, Gopher, quality, logprob) fires at this scale, and a
    threshold re-tune now shows up as a failing count instead of a
    silent acceptance-rate drift. Deterministic: every stage is a pure
    expression over fixed data (the unigram model is corpus-empirical
    but the corpus is fixed)."""
    import os

    import pytest as _pytest
    from pyspark.sql import functions as F

    from gluestick_ts_spark.plans.queries import QUERIES
    from tests.conftest import SF_DIR

    sf01 = os.path.join(os.path.dirname(SF_DIR.rstrip("/")), "sf0.1")
    if not os.path.exists(os.path.join(sf01, "documents.parquet")):
        _pytest.skip(f"sf0.1 testdata not present at {sf01}")
    hist = {
        r.drop_reason: r.cnt
        for r in QUERIES["curation_pipeline_docs"](spark, sf01)
        .groupBy("drop_reason")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    assert hist == {
        # round 9: the URL-dedup/domain-cap first stage takes top
        # priority — url_dup is exactly the planted 10% re-crawl band,
        # domain_cap the hot domain's mass minus its 25-doc cap; the
        # content stages keep firing on the survivors. Round 11: the
        # license screen fires between duplicate and gopher — the
        # planted rights-reserved + bare-copyright footers are 2 of
        # every 20 docs (500 at sf0.1), minus the 2 caught by earlier
        # stages; downstream reasons shrink by exactly the overlap.
        # Round 11 (cont.): the URL BLOCKLIST outranks everything —
        # the item%10==9 docs' tracker-farm domain is exactly the 10%
        # band (500), and every content reason shrinks by its overlap
        # with that band (gopher 1798->1501, logprob 68->60, ...).
        # The ROBOTS stage then fires between blocked and url_dup: the
        # item%20==15 docs' fixed docs site disallows /item/ except the
        # *35$ allow-override (200 = 4/5 of the 250-doc slot), and the
        # slot's move onto ONE shared host also raises domain_cap by
        # that site's over-cap allowed mass (475 -> 521)
        # Round 14 re-pin: the _JT_LANG_TEXTS multilingual/CJK slots
        # flow through the flagship verdict (plus three CLEAN-URL CJK
        # slots, _CUR_EXTRA_SLOTS — the _JT mods all collide with the
        # URL plant's drop bands, so no CJK doc could reach the
        # content stages); the gopher AND quality stages are
        # SCRIPT-ROUTED; the logprob gate is a per-routed-language
        # adaptive P10 cut over the script-routed unigram model
        # (replacing the global -3.41 constant that snapped on every
        # content change — the word-soup lp distribution is
        # razor-thin). Planted zh/ja/ko docs now reach keep=TRUE (the
        # slot assertions below); license fires on the half of the
        # new slots that land on dropping footers.
        None: 1128,
        "benchmark": 250,
        "blocked": 500,
        "contaminated": 16,
        "domain_cap": 521,
        "duplicate": 2,
        "gopher": 1287,
        "license": 500,
        "logprob": 77,
        "quality": 19,
        "robots": 200,
        "url_dup": 500,
    }, hist
    # the count-visible ROUTING positive: every planted real-script
    # CJK doc (100 per language at sf0.1) passes the routed gopher
    # stage — unrouted, each is one giant pseudo-token and fails the
    # 50-word floor; the de slot pins the word path still fires
    slots = (
        QUERIES["curation_pipeline_docs"](spark, sf01)
        .where("doc_id % 50 in (31, 11, 43, 7)")
        .groupBy((F.col("doc_id") % 50).alias("slot"))
        .agg(F.sum(F.col("gopher_ok").cast("int")).alias("n_pass"),
             F.count("*").alias("n"))
        .collect()
    )
    got = {r.slot: (r.n_pass, r.n) for r in slots}
    assert got[31] == (100, 100)  # zh — routed char grain passes
    assert got[11] == (100, 100)  # ja
    assert got[43] == (100, 100)  # ko
    assert got[7] == (0, 100)  # de — word grain, under the word floor
    # the round-14 END-TO-END positive: the clean-URL CJK slots run
    # the whole gauntlet — routed gopher + routed quality + the
    # per-language adaptive logprob cut — and HALF of each slot
    # reaches keep=TRUE (the other half lands on the license plant's
    # dropping footers: the license screen applies to CJK docs too)
    through = {
        r.slot: (r.n_keep, r.lang_set)
        for r in QUERIES["curation_pipeline_docs"](spark, sf01)
        .where("doc_id % 50 in (27, 17, 47)")
        .groupBy((F.col("doc_id") % 50).alias("slot"))
        .agg(
            F.sum(F.col("keep").cast("int")).alias("n_keep"),
            F.array_sort(F.collect_set("doc_lang")).alias("lang_set"),
        )
        .collect()
    }
    assert through[27] == (50, ["zh"])
    assert through[17] == (50, ["ja"])
    assert through[47] == (50, ["ko"])


def test_curation_lp_cut_partition_invariant(spark):
    """The per-routed-language adaptive logprob cut must be a pure
    function of the data, not the partitioning: F.percentile is an
    exact interpolated quantile, and the routed unigram model's
    vocabulary ranking ties break on the token — so re-partitioning
    the corpus leaves every lp_cut and lp_ok bit-identical. Guards the
    round-14 lp redesign's determinism contract (the DuckDB oracle
    re-derives the same cuts independently)."""
    from pyspark.sql import functions as F

    from gluestick_ts_spark.functions.text import is_cjk_doc_expr
    from gluestick_ts_spark.operators.dedup import _spread  # noqa: F401
    from gluestick_ts_spark.operators.profile import (
        adaptive_quality_filter,
        unigram_logprob_scores,
    )

    zh = ("我们的朋友不在家里他们有很多事情和我们一起去看那个人的房子"
          "这是一个很好的地方大家都喜欢在这里住")
    rows = [
        (i, f"the quick brown fox number {i} jumps over the lazy dog "
            f"and the day goes by while item {i % 7} waits")
        for i in range(40)
    ] + [(100 + i, zh + str(i)) for i in range(10)]
    # one clearly-atypical doc per group (all-OOV vocabulary): each
    # language's P10 cut must actually drop ITS OWN tail
    rows += [
        (99, "zyzzyva qwertic xylograph vexillum plictho grammatolatry"),
        (110, "鑫釁龘靐齉爩麤龗灪吁霺韤鱻"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def cuts_of(frame):
        cjk = is_cjk_doc_expr("text")
        lang = F.when(cjk, F.lit("zh")).otherwise(F.lit("en"))
        lp = unigram_logprob_scores(frame, vocab_size=30, cjk=cjk).join(
            frame.select("doc_id", lang.alias("__lg")), on="doc_id"
        )
        out = adaptive_quality_filter(
            lp, "mean_logprob", "__lg", q=0.10,
            cut_col="__c", keep_col="__ok",
        )
        return {
            r["doc_id"]: (r["__c"], r["__ok"])
            for r in out.select("doc_id", "__c", "__ok").collect()
        }

    a = cuts_of(df)
    b = cuts_of(df.repartition(7))
    c = cuts_of(df.repartition(1))
    assert a == b == c
    # both language groups carry a real cut and the P10 rule fires in
    # each: the planted all-OOV doc is ITS OWN language's tail (never
    # judged against the other group's cut), typical docs keep
    assert a[99][1] is False and a[110][1] is False
    assert a[0][1] is True and a[100][1] is True
    # the two groups' cuts are genuinely independent values
    assert a[0][0] != a[100][0]
