"""Byte-pair-encoding tokenizer training at corpus scale.

The GPT-2/RoBERTa tokenizer-training recipe (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units")
re-expressed Spark-first. The insight that makes BPE tractable on a
100 TB corpus is that the training loop never needs the corpus after
one pass: it operates on the DISTINCT-WORD frequency table (millions
of rows, not trillions), and every merge iteration is

  1. one map-side-combined aggregate over in-row adjacent symbol
     pairs weighted by word frequency (``bpe_pair_stats``), and
  2. one 1-row driver collect of the argmax pair (deterministic
     tie-break: count DESC, then pair lexicographic), and
  3. one MAP-ONLY in-row left-fold that replaces non-overlapping
     occurrences of the chosen pair in each word's symbol array.

So ``n_merges`` merges cost n aggregates over the word table — no
shuffle ever touches corpus text, no driver structure exceeds the
merge list. Lineage is cut with localCheckpoint every few iterations
(the per-iteration transform would otherwise nest n plans deep).

Encoding with a trained merge list (``bpe_encode_expr``) is pure
Column algebra: the merges enter the plan as constants and apply as a
chain of in-row folds — map-only at any corpus size, no UDF.

No reference counterpart (extension op — the tokenizer-training step
of an LLM data pipeline, alongside chunking/packing in
``operators/packing.py``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens_expr

__all__ = [
    "END_OF_WORD",
    "word_freqs",
    "bpe_pair_stats",
    "train_bpe",
    "bpe_encode_expr",
]

# Sennrich's end-of-word marker: a terminal symbol so merges learned
# at word ends don't fire word-internally ("est</w>" vs "est").
END_OF_WORD = "</w>"


def word_freqs(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The corpus reduced to its distinct-word frequency table
    ``(word, cnt)`` — the single corpus-sized pass of BPE training;
    everything after operates on this (vocabulary-sized) relation."""
    toks = F.filter(tokens_expr(text_col), lambda t: t != "")
    return (
        df.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def _initial_symbols(word: Column) -> Column:
    return F.concat(F.split(word, ""), F.array(F.lit(END_OF_WORD)))


def bpe_pair_stats(words: DataFrame) -> DataFrame:
    """Adjacent-symbol pair counts weighted by word frequency:
    ``(a, b, cnt)`` from one in-row zip + one map-side-combined
    aggregate over the word table. ``words`` carries ``symbols``
    (array<string>) and ``cnt`` (long)."""
    m = F.size("symbols")
    pairs = F.transform(
        F.sequence(F.lit(1), m - 1),
        lambda i: F.struct(
            F.element_at("symbols", i).alias("a"),
            F.element_at("symbols", i + 1).alias("b"),
        ),
    )
    return (
        words.where(m >= 2)
        .select(F.explode(pairs).alias("__p"), "cnt")
        .groupBy(F.col("__p.a").alias("a"), F.col("__p.b").alias("b"))
        .agg(F.sum("cnt").alias("cnt"))
    )


def _merge_pair_expr(symbols: Column, a: str, b: str) -> Column:
    """Replace non-overlapping adjacent (a, b) with a+b, leftmost
    first — the standard BPE replacement as one in-row left fold (no
    UDF, no explode). The fold appends each symbol unless the
    accumulator's LAST element is ``a`` and the incoming one is ``b``,
    in which case the last element becomes the merged symbol; because
    the merged symbol is a new value, overlapping runs ("aaa" under
    (a,a)) merge leftmost-first exactly like the reference algorithm.
    """
    merged = F.lit(a + b)

    def step(acc: Column, s: Column) -> Column:
        last = F.element_at(acc, -1)
        return F.when(
            (F.size(acc) > 0) & (last == F.lit(a)) & (s == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(s)))

    return F.aggregate(
        symbols, F.array().cast("array<string>"), step
    )


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 50,
    min_pair_count: int = 2,
    checkpoint_every: int = 8,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus; returns the
    ordered merge list (the tokenizer artifact — feed it to
    ``bpe_encode_expr``). Stops early when the best remaining pair
    falls under ``min_pair_count``. Deterministic: the argmax pair
    tie-breaks (cnt DESC, a ASC, b ASC), so the same corpus always
    yields the same tokenizer regardless of partitioning."""
    words = word_freqs(df, text_col).select(
        _initial_symbols(F.col("word")).alias("symbols"), "cnt"
    ).localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    for i in range(int(n_merges)):
        best = (
            bpe_pair_stats(words)
            .orderBy(F.col("cnt").desc(), F.col("a").asc(), F.col("b").asc())
            .first()
        )
        if best is None or best["cnt"] < int(min_pair_count):
            break
        a, b = str(best["a"]), str(best["b"])
        merges.append((a, b))
        words = words.select(
            _merge_pair_expr(F.col("symbols"), a, b).alias("symbols"), "cnt"
        )
        # cut lineage: without this the plan nests one fold per merge
        if (i + 1) % int(checkpoint_every) == 0:
            words = words.localCheckpoint(eager=True)
    return merges


def bpe_encode_expr(
    text_col: Column | str, merges: list[tuple[str, str]]
) -> Column:
    """Encode text with a trained merge list: tokens split to
    characters (+ ``</w>``), then every merge applied IN ORDER as an
    in-row fold — the merges are plan constants, the whole encode is
    map-only Column algebra (one array<array<string>> of subword
    symbols per document). For very long merge lists prefer applying
    in a pre-tokenized pipeline stage; each merge adds one fold to
    the expression tree."""
    toks = F.filter(tokens_expr(text_col), lambda t: t != "")

    def encode_word(w: Column) -> Column:
        syms = F.concat(F.split(w, ""), F.array(F.lit(END_OF_WORD)))
        for a, b in merges:
            syms = _merge_pair_expr(syms, a, b)
        return syms

    return F.transform(toks, encode_word)
