"""Sequence-packing operator tests (extension op)."""

import pytest
from pyspark.sql import functions as F

from gluestick_ts_spark.operators.packing import assemble_packs, pack_token_windows


@pytest.fixture()
def corpus(spark):
    return spark.createDataFrame(
        [
            (1, "a b c"),          # 3 tokens -> offsets 0..2
            (2, "d e f g"),        # 4 tokens -> 3..6 (straddles the L=4 boundary)
            (3, "h"),              # 1 token  -> 7
            (4, "i j k l m"),      # 5 tokens -> 8..12 (spans packs 2 and 3)
        ],
        "doc_id long, text string",
    )


def test_pack_spans_hand_computed(spark, corpus):
    spans = {
        (r.pack_id, r.doc_id): (r.tok_start, r.n_toks, r.pack_pos)
        for r in pack_token_windows(corpus, seq_len=4).collect()
    }
    assert spans[(0, 1)] == (1, 3, 0)   # doc 1 fully in pack 0 at pos 0
    assert spans[(0, 2)] == (1, 1, 3)   # doc 2's first token finishes pack 0
    assert spans[(1, 2)] == (2, 3, 0)   # its remaining 3 open pack 1
    assert spans[(1, 3)] == (1, 1, 3)
    assert spans[(2, 4)] == (1, 4, 0)
    assert spans[(3, 4)] == (5, 1, 0)   # final partial pack
    assert len(spans) == 6


def test_assemble_packs_exact_lengths_and_order(spark, corpus):
    spans = pack_token_windows(corpus, seq_len=4)
    packs = {
        r.pack_id: list(r.tokens)
        for r in assemble_packs(corpus, spans, seq_len=4).collect()
    }
    assert packs[0] == ["a", "b", "c", "d"]
    assert packs[1] == ["e", "f", "g", "h"]
    assert packs[2] == ["i", "j", "k", "l"]
    assert packs[3] == ["m"]  # each partition's last pack may be short
    # every non-final pack is exactly seq_len
    assert all(len(t) == 4 for p, t in packs.items() if p != max(packs))


def test_pack_partitioned_independent_streams(spark):
    df = spark.createDataFrame(
        [
            (1, "s1", "a b c"),
            (2, "s1", "d e"),
            (3, "s2", "x y z w v"),
        ],
        "doc_id long, shard string, text string",
    )
    spans = pack_token_windows(df, seq_len=4, partition_cols=["shard"])
    packs = {
        (r.shard, r.pack_id): list(r.tokens)
        for r in assemble_packs(
            df, spans, seq_len=4, partition_cols=["shard"]
        ).collect()
    }
    assert packs[("s1", 0)] == ["a", "b", "c", "d"]
    assert packs[("s1", 1)] == ["e"]
    assert packs[("s2", 0)] == ["x", "y", "z", "w"]
    assert packs[("s2", 1)] == ["v"]


def test_pack_total_token_conservation(spark, sf_dir):
    """No token is lost or duplicated: span n_toks sums to the corpus
    token count, and every non-final pack is exactly seq_len."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    from gluestick_ts_spark.functions.text import tokens_expr

    total = d.select(F.sum(F.size(tokens_expr("text")))).first()[0]
    spans = pack_token_windows(d, seq_len=128)
    agg = spans.agg(F.sum("n_toks").alias("s"), F.max("pack_id").alias("mx")).first()
    assert agg.s == total
    sizes = {
        r.pack_id: r.s
        for r in spans.groupBy("pack_id").agg(F.sum("n_toks").alias("s")).collect()
    }
    assert all(v == 128 for p, v in sizes.items() if p != agg.mx)
