"""Exact distributed heavy hitters (frequent items).

"Which items exceed x% of the stream?" answered EXACTLY in two
corpus passes, never one full shuffle of all items:

1. **Candidate pass** — one Arrow-batched ``mapInPandas`` sweep runs a
   Misra-Gries summary (Misra & Gries 1982) of capacity ``k`` per
   partition and emits at most ``k`` candidate items + one partition
   row-count row. The MG guarantee composes across partitions: any
   item with global frequency > n/(k+1) must exceed the local
   threshold in at least one partition, so the union of per-partition
   candidates is a SUPERSET of every global heavy hitter at threshold
   1/(k+1). The driver collects ≤ partitions × k candidates — bounded
   by configuration, not data.
2. **Recount pass** — the candidate set broadcasts back as a filter
   and ONLY candidate items are exactly counted (map-side combined
   aggregate on a relation pre-shrunk to candidates), then thresholded
   against the exact total.

The result is exact and deterministic regardless of partitioning —
the sketch only proposes, the recount disposes — which is why the
driver oracle can hash-check it against a plain GROUP BY ... HAVING.
This is the candidate+verify pattern production heavy-hitter jobs use
when the item domain (URLs, tokens, user ids) is too large to shuffle
wholesale but the heavy tail is what matters.

``mapInPandas`` is the right tool here (an explicitly Arrow-batched
sketch pass, like the multimodal decoders) — the hot relational path
stays JVM-side in pass 2.

No reference counterpart (extension op — streaming/batch analytics
family).
"""

from __future__ import annotations

import math
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["heavy_hitters"]

_CAND_SCHEMA = T.StructType(
    [
        T.StructField("item", T.StringType(), True),
        T.StructField("n_rows", T.LongType(), True),
    ]
)


def _mg_partition(capacity: int):
    def fn(batches: Iterator) -> Iterator:
        import pandas as pd

        # Per Arrow batch: an exact (value, count) summary at C speed
        # (value_counts), MERGED into the running Misra-Gries summary.
        # An exact summary is an MG summary with zero error, and MG
        # summaries merge (Agarwal et al., "Mergeable Summaries", PODS
        # 2012): add counters pointwise, then subtract the (k+1)-th
        # largest counter from all and drop the non-positive. Total
        # decrement per merge is <= weight/(k+1), so any item with
        # global frequency > n/(k+1) still survives with a positive
        # counter in at least one partition — the same candidate-
        # superset guarantee as the per-row update, without a Python
        # loop over corpus rows (the distinct-value folds below touch
        # only unique values per batch).
        counters = pd.Series(dtype="int64")
        n_rows = 0
        for pdf in batches:
            col = pdf.iloc[:, 0]
            n_rows += int(col.count())
            vc = col.value_counts()  # dropna by default; C-speed
            if vc.empty:
                continue
            counters = (
                vc.astype("int64")
                if counters.empty
                else counters.add(vc, fill_value=0).astype("int64")
            )
            if len(counters) > capacity:
                # (k+1)-th largest counter; after subtracting it, at
                # most `capacity` entries stay strictly positive
                d = int(counters.nlargest(capacity + 1).iloc[-1])
                counters = counters[counters > d] - d
        yield pd.DataFrame(
            {
                "item": list(counters.index) + [None],
                "n_rows": [None] * len(counters) + [n_rows],
            }
        )

    return fn


def heavy_hitters(
    df: DataFrame,
    item_col: str,
    threshold_frac: float = 0.001,
    capacity: int | None = None,
) -> DataFrame:
    """Items whose exact frequency exceeds ``threshold_frac`` of the
    non-null total, as ``(item, cnt)``. ``capacity`` defaults to
    ``ceil(1/threshold_frac)`` — the smallest Misra-Gries summary that
    guarantees the candidate superset (a larger capacity only shrinks
    pass-2 work). Triggers two jobs (candidate sweep + recount)."""
    if not 0 < threshold_frac < 1:
        raise ValueError(
            f"heavy_hitters: threshold_frac must be in (0, 1), got {threshold_frac}"
        )
    k_min = int(math.ceil(1.0 / threshold_frac))
    k = int(capacity) if capacity is not None else k_min
    if k < k_min:
        # MG with capacity k only guarantees candidates above n/(k+1);
        # a smaller summary can evict a true heavy hitter in EVERY
        # partition and silently return an incomplete "exact" answer
        raise ValueError(
            f"heavy_hitters: capacity {k} breaks the candidate-superset "
            f"guarantee for threshold_frac={threshold_frac} (needs >= {k_min})"
        )
    if k > 1_000_000:
        # candidate collect is partitions x k strings — a micro
        # threshold silently turns the bounded collect into a
        # driver-sized one; fail loudly instead
        raise ValueError(
            f"heavy_hitters: capacity {k} (threshold_frac={threshold_frac}) "
            "exceeds 1e6 — per-partition summaries that large defeat the "
            "bounded-candidate design; raise the threshold or cap capacity"
        )
    src = df.select(F.col(item_col).cast("string").alias("item"))
    summary = src.mapInPandas(_mg_partition(k), schema=_CAND_SCHEMA).collect()
    total = sum(r.n_rows for r in summary if r.n_rows is not None)
    cands = sorted({r.item for r in summary if r.item is not None})
    if total == 0 or not cands:
        return src.limit(0).groupBy("item").agg(F.count("*").alias("cnt"))
    floor = float(threshold_frac) * total
    # candidate filter as a broadcast semi-join, not an IN-literal:
    # partitions x capacity strings embedded in the plan would make
    # plan construction itself the driver-sized cost the bounded
    # collect avoids (same shape as fingerprint_store_membership)
    cand_df = df.sparkSession.createDataFrame(
        [(c,) for c in cands], "item string"
    )
    return (
        src.join(F.broadcast(cand_df), on="item", how="left_semi")
        .groupBy("item")
        .agg(F.count("*").alias("cnt"))
        .where(F.col("cnt") > floor)
    )
