import pytest
from pyspark.sql import functions as F

from gluestick_ts_spark.operators.dsir import (
    dsir_logweight_expr,
    dsir_select,
    gram_bucket_histogram,
    gumbel_key_expr,
    hashed_gram_buckets_expr,
)
from tests.conftest import load


def test_gram_buckets_shape_and_range(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "solo"), (3, "")],
        "doc_id long, text string",
    )
    rows = {
        r.doc_id: r.b
        for r in df.select(
            "doc_id", hashed_gram_buckets_expr("text").alias("b")
        ).collect()
    }
    # n tokens -> n unigrams + (n-1) bigrams
    assert len(rows[1]) == 3 + 2
    assert len(rows[2]) == 1
    assert rows[3] == []
    assert all(0 <= b < 256 for bs in rows.values() for b in bs)


def test_histogram_bounded_and_totals(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    hist = gram_bucket_histogram(d)
    assert len(hist) == 256
    total_grams = d.select(
        F.sum(F.size(hashed_gram_buckets_expr("text")))
    ).first()[0]
    assert sum(hist) == total_grams


def test_dsir_upweights_target(spark, sf_dir):
    """The core DSIR property: selecting by importance weight toward
    the lang='en' target must raise the en fraction above the raw
    corpus base rate."""
    d = load(spark, sf_dir, "documents")
    sel = dsir_select(d, d.where(F.col("lang") == "en"), k=100)
    rows = sel.select("lang").collect()
    assert len(rows) == 100
    en_frac = sum(1 for r in rows if r.lang == "en") / len(rows)
    base = d.where(F.col("lang") == "en").count() / d.count()
    assert en_frac > base


def test_dsir_deterministic_across_partitionings(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    tgt = d.where(F.col("lang") == "en")
    a = {r.doc_id for r in dsir_select(d, tgt, k=50).select("doc_id").collect()}
    b = {
        r.doc_id
        for r in dsir_select(d.repartition(7), tgt.coalesce(1), k=50)
        .select("doc_id")
        .collect()
    }
    assert a == b and len(a) == 50


def test_dsir_k_exceeding_corpus_keeps_all(spark):
    df = spark.createDataFrame(
        [(i, f"tiny doc number {i}") for i in range(5)],
        "doc_id long, text string",
    )
    out = dsir_select(df, df, k=100)
    assert out.count() == 5


def test_gumbel_key_noise_is_seeded_and_bounded(spark):
    df = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    zero = F.lit(0.0)
    same = df.select(
        (gumbel_key_expr("doc_id", zero, seed=1)
         - gumbel_key_expr("doc_id", zero, seed=1)).alias("d")
    ).agg(F.max(F.abs("d"))).first()[0]
    assert same == 0.0
    diff = df.select(
        (gumbel_key_expr("doc_id", zero, seed=1)
         - gumbel_key_expr("doc_id", zero, seed=2)).alias("d")
    ).agg(F.max(F.abs("d"))).first()[0]
    assert diff > 0.0
    # Gumbel(0,1) noise is finite for every row (u strictly in (0,1))
    n_finite = df.select(
        gumbel_key_expr("doc_id", zero, seed=3).alias("g")
    ).where(F.col("g").isNotNull() & ~F.isnan("g")).count()
    assert n_finite == 200


def test_dsir_validation(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        hashed_gram_buckets_expr("text", num_buckets=512)
    with pytest.raises(ValueError):
        dsir_logweight_expr("text", [1] * 4, [1] * 8)


def test_gumbel_key_raises_on_null_id(spark):
    """NULL id contract: a NULL key would silently drop its row at the
    threshold filter regardless of weight, so the key expr raises
    per-row instead."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkRuntimeError

    from gluestick_ts_spark.operators.dsir import gumbel_key_expr

    df = spark.createDataFrame(
        [(1, 0.5), (None, 0.9)], "doc_id long, logw double"
    )
    with pytest.raises((Py4JJavaError, PySparkRuntimeError, Exception)) as ei:
        df.select(
            gumbel_key_expr("doc_id", F.col("logw")).alias("k")
        ).collect()
    assert "non-null" in str(ei.value)


def test_dsir_logweight_empty_text_is_zero(spark):
    """A whitespace-only/empty document has no grams; the 0.0-seeded
    fold must score it exactly 0.0 (the DuckDB oracle COALESCEs its
    NULL list_sum to match)."""
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "a b")], "doc_id long, text string"
    )
    rows = df.select(
        "doc_id",
        # non-uniform target: uniform histograms cancel identically
        dsir_logweight_expr("text", [1] * 256, [1] + [2] * 255).alias("lw"),
    ).collect()
    by_id = {r.doc_id: r.lw for r in rows}
    assert by_id[1] == 0.0 and by_id[2] == 0.0
    assert by_id[3] != 0.0


def test_single_pass_histograms_equal_two_pass(spark, sf_dir):
    from gluestick_ts_spark.operators.dsir import gram_bucket_histograms

    d = load(spark, sf_dir, "documents")
    raw1 = gram_bucket_histogram(d)
    tgt1 = gram_bucket_histogram(d.where(F.col("lang") == "en"))
    raw2, tgt2 = gram_bucket_histograms(d, F.col("lang") == "en")
    assert raw1 == raw2 and tgt1 == tgt2
