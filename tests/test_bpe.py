"""BPE tokenizer training: the distributed trainer must reproduce the
reference algorithm (Sennrich et al. 2016) merge-for-merge, and the
encoder must apply the learned merges exactly."""

from pyspark.sql import functions as F

from gluestick_ts_spark.operators.bpe import (
    END_OF_WORD,
    bpe_encode_expr,
    bpe_pair_stats,
    train_bpe,
    word_freqs,
)


def _ref_bpe(word_counts: dict[str, int], n_merges: int, min_count: int = 2):
    """Pure-Python reference BPE (the paper's algorithm, deterministic
    tie-break cnt DESC then pair lexicographic)."""
    vocab = {
        tuple(list(w) + [END_OF_WORD]): c for w, c in word_counts.items()
    }
    merges = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] = (
                    pairs.get((syms[i], syms[i + 1]), 0) + c
                )
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_count:
            break
        (a, b) = best[0]
        merges.append((a, b))
        new_vocab = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def test_train_bpe_matches_reference_algorithm(spark):
    # the paper's canonical example shape: shared stems + suffixes
    text = " ".join(
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    )
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    wf = {r.word: r.cnt for r in word_freqs(docs).collect()}
    assert wf == {"low": 5, "lower": 2, "newest": 6, "widest": 3}

    got = train_bpe(docs, n_merges=8, checkpoint_every=3)
    exp = _ref_bpe(wf, 8)
    assert got == exp, (got, exp)
    # classic result: 'est</w>' forms within the first few merges
    joined = ["".join(p) for p in got]
    assert "est" in joined or ("es" in joined and "t" + END_OF_WORD in joined)


def test_train_bpe_partition_invariant_and_early_stop(spark):
    rows = [(i, "alpha beta alpha gamma beta alpha") for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    m1 = train_bpe(docs, n_merges=5)
    m2 = train_bpe(docs.repartition(7), n_merges=5)
    assert m1 == m2
    # a corpus of unique single-char words has no pair above the floor
    tiny = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    assert train_bpe(tiny, n_merges=5, min_pair_count=2) == []


def test_bpe_encode_applies_merges_in_order(spark):
    text = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6)
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    merges = train_bpe(docs, n_merges=6)
    enc = docs.select(
        bpe_encode_expr("text", merges).alias("e")
    ).first().e
    # encoding must be lossless: concatenating symbols (minus the
    # end-of-word marker) rebuilds each token
    toks = text.split()
    assert len(enc) == len(toks)
    for sub, tok in zip(enc, toks):
        assert "".join(sub).replace(END_OF_WORD, "") == tok
    # a fully-merged frequent word collapses to few symbols
    assert len(enc[0]) < len("low") + 1


def test_bpe_pair_stats_weighted_by_word_freq(spark):
    words = spark.createDataFrame(
        [(["a", "b", END_OF_WORD], 7), (["b", "a", END_OF_WORD], 2)],
        "symbols array<string>, cnt long",
    )
    got = {(r.a, r.b): r.cnt for r in bpe_pair_stats(words).collect()}
    assert got[("a", "b")] == 7
    assert got[("b", "a")] == 2
    assert got[("b", END_OF_WORD)] == 7
    assert got[("a", END_OF_WORD)] == 2


def test_bpe_pair_stats_plan_is_one_mapside_combined_agg(spark):
    """The per-iteration pair count must be a partial (map-side
    combined) aggregate with NO join — hot pairs are safe because
    combining happens before the exchange; the word table never
    self-joins."""
    words = spark.createDataFrame(
        [(["a", "b", END_OF_WORD], 3)], "symbols array<string>, cnt long"
    )
    plan = bpe_pair_stats(words)._jdf.queryExecution().executedPlan().toString()
    assert "partial_sum" in plan, plan
    assert "Join" not in plan and "CartesianProduct" not in plan
