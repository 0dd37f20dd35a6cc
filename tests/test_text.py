"""Text-analysis function tests (extension ops over documents)."""

import pytest
from pyspark.sql import functions as F

from gluestick_ts_spark.functions.text import (
    char_count_expr,
    fingerprint_expr,
    lang_id_expr,
    punct_ratio_expr,
    quality_score_expr,
    shingles_expr,
    stopword_ratio_expr,
    token_count_expr,
    tokens_expr,
    word_count_expr,
)


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "der hund ist nicht ein fisch und das ist gut"),
            (3, "!!! ??? ..."),
            (4, "  The   QUICK  brown fox  "),
            (5, "one"),
        ],
        "doc_id long, text string",
    )


def _one(df, expr, doc_id):
    return df.where(F.col("doc_id") == doc_id).select(expr.alias("v")).first()["v"]


def test_tokens_and_word_count(docs):
    assert _one(docs, word_count_expr("text"), 1) == 9
    assert _one(docs, word_count_expr("text"), 4) == 4  # whitespace collapsed
    assert _one(docs, tokens_expr("text"), 4) == ["the", "quick", "brown", "fox"]


def test_char_count(docs):
    assert _one(docs, char_count_expr("text"), 5) == 3


def test_punct_ratio(docs):
    assert _one(docs, punct_ratio_expr("text"), 3) == pytest.approx(9 / 11)
    assert _one(docs, punct_ratio_expr("text"), 1) == 0.0


def test_stopword_ratio(docs):
    # doc 1: "the" twice + "over"? over not in list -> 2/9
    assert _one(docs, stopword_ratio_expr("text"), 1) == pytest.approx(2 / 9)


def test_quality_score_range(docs):
    rows = docs.select(quality_score_expr("text").alias("q")).collect()
    assert all(0.0 <= r["q"] <= 1.0 for r in rows)


def test_token_count_bpe(docs):
    # "!!! ??? ..." -> 9 single-symbol tokens
    assert _one(docs, token_count_expr("text"), 3) == 9
    assert _one(docs, token_count_expr("text"), 1) == 9


def test_fingerprint_normalizes_whitespace_and_case(docs):
    fps = {
        r["doc_id"]: r["fp"]
        for r in docs.select("doc_id", fingerprint_expr("text").alias("fp")).collect()
    }
    # doc 4 normalizes to "the quick brown fox" — distinct from doc 1
    assert fps[1] != fps[4]
    assert len(fps[1]) == 32


def test_fingerprint_equal_for_equivalent_text(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, " HELLO\tWORLD ")],
        "doc_id long, text string",
    )
    fps = df.select(fingerprint_expr("text").alias("fp")).distinct().collect()
    assert len(fps) == 1


def test_lang_id(docs):
    assert _one(docs, lang_id_expr("text"), 1) == "en"
    assert _one(docs, lang_id_expr("text"), 2) == "de"
    assert _one(docs, lang_id_expr("text"), 3) == "und"


def test_shingles(docs):
    sh = _one(docs, shingles_expr("text", 3), 4)
    assert sh == ["the quick brown", "quick brown fox"]
    # short doc: single shingle
    assert _one(docs, shingles_expr("text", 3), 5) == ["one"]


def test_repetition_ratio(spark):
    """Gopher-style duplicate-3-gram ratio: 0 for unique text, high for
    repeated boilerplate, 0 for short (< n tokens) docs."""
    from pyspark.sql import functions as F

    from gluestick_ts_spark.functions.text import repetition_ratio_expr

    df = spark.createDataFrame(
        [
            (1, "one two three four five six"),          # all grams unique
            (2, "spam spam spam spam spam spam spam"),   # one gram repeated
            (3, "hi"),                                    # shorter than n
        ],
        "id long, text string",
    )
    out = {r.id: r.ratio for r in df.select(
        "id", F.round(repetition_ratio_expr("text", 3), 6).alias("ratio")
    ).collect()}
    assert out[1] == 0.0
    # 5 gram positions, 1 distinct -> 1 - 1/5 = 0.8
    assert out[2] == 0.8
    assert out[3] == 0.0
