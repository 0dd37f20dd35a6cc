"""Sequence packing: fixed-length training windows from a document
corpus (the GPT-style pretraining prep step — concatenate documents in
a deterministic order and split the token stream at exact ``seq_len``
boundaries, letting documents cross pack boundaries).

``chunk_tokens`` (functions/text.py) windows WITHIN a document; this
operator packs ACROSS documents so no context-window slot is wasted on
padding. No reference counterpart (extension op).

Scale shape: one window cumulative sum assigns every document its
global token offset, then each document computes IN-ROW which packs it
spans (usually 1-2) and the exact token slice it contributes to each —
one posexplode, no per-token rows, no driver state. The offset window
is the one sequential construct: partition it (``partition_cols``) so
each shard packs independently — an unpartitioned global order is a
single-task bottleneck at corpus scale and is only acceptable for
small corpora (the default warns by contract, not at runtime).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens_expr

__all__ = ["pack_token_windows", "assemble_packs"]


def pack_token_windows(
    df: DataFrame,
    seq_len: int = 512,
    id_col: str = "doc_id",
    text_col: str = "text",
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """Assign every document's tokens to fixed-length packs.

    Output: one row per (document × pack it spans):

    - ``pack_id`` — 0-based pack index (within the partition);
    - ``<id_col>`` — the contributing document;
    - ``tok_start`` — 1-based position of the first contributed token
      WITHIN the document (``slice`` convention);
    - ``n_toks`` — how many of the document's tokens land in this pack;
    - ``pack_pos`` — 0-based offset of those tokens WITHIN the pack;
    - ``partition_cols`` pass through when given (packing is
      per-partition — the scale path).

    Deterministic: order is by ``id_col`` within each partition, so the
    same corpus always packs identically. Every pack is exactly
    ``seq_len`` tokens except each partition's last.
    """
    part = list(partition_cols or [])
    w = Window.partitionBy(*part).orderBy(F.col(id_col)) if part else Window.orderBy(
        F.col(id_col)
    )
    toked = df.select(
        *part,
        F.col(id_col),
        F.size(tokens_expr(text_col)).cast("long").alias("__n"),
    ).where(F.col("__n") > 0)
    offs = toked.select(
        *part,
        id_col,
        "__n",
        (F.sum("__n").over(w) - F.col("__n")).alias("__start"),
    )
    first = F.floor(F.col("__start") / seq_len).cast("long")
    last = F.floor((F.col("__start") + F.col("__n") - 1) / seq_len).cast("long")
    spans = offs.select(
        *part,
        id_col,
        "__n",
        "__start",
        F.explode(F.sequence(first, last)).alias("pack_id"),
    )
    pack_lo = F.col("pack_id") * seq_len
    seg_lo = F.greatest(F.col("__start"), pack_lo)
    seg_hi = F.least(F.col("__start") + F.col("__n"), pack_lo + seq_len)
    return spans.select(
        *part,
        "pack_id",
        id_col,
        (seg_lo - F.col("__start") + 1).cast("long").alias("tok_start"),
        (seg_hi - seg_lo).cast("long").alias("n_toks"),
        (seg_lo - pack_lo).cast("long").alias("pack_pos"),
    )


def assemble_packs(
    df: DataFrame,
    spans: DataFrame,
    seq_len: int = 512,
    id_col: str = "doc_id",
    text_col: str = "text",
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """Materialize pack token arrays from ``pack_token_windows`` spans:
    ``(partition_cols..., pack_id, tokens array<string>, n_tokens)``.

    One join (spans × documents, keyed on the id) slices each
    document's contribution in-row, then one groupBy per pack
    concatenates the slices in ``pack_pos`` order. Every pack is
    exactly ``seq_len`` tokens except each partition's last.
    """
    part = list(partition_cols or [])
    toks = df.select(
        F.col(id_col), tokens_expr(text_col).alias("__toks")
    )
    seg = spans.join(toks, on=id_col).select(
        *part,
        "pack_id",
        "pack_pos",
        F.slice(F.col("__toks"), F.col("tok_start"), F.col("n_toks")).alias("__seg"),
    )
    glued = (
        seg.groupBy(*part, "pack_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pack_pos", "__seg"))
                    ),
                    lambda s: s["__seg"],
                )
            ).alias("tokens")
        )
        .select(
            *part,
            "pack_id",
            "tokens",
            F.size("tokens").cast("long").alias("n_tokens"),
        )
    )
    return glued
