"""Change-data-capture: diff two snapshot generations by primary key.

The reference's snapshot merge (``snapshotRecords``, reference
``etl-utils.ts:258-355``) OVERWRITES state — after a sync you know the
new truth but not what changed. Every downstream consumer of an ETL
platform eventually asks for the delta instead (audit trails, webhook
emission, incremental cache invalidation, reverse-ETL), so this module
is the natural sibling of ``snapshot_records``: given the previous and
current generation of a stream, emit one row per changed key tagged
``insert`` / ``update`` / ``delete``, with both the new and the old
image of every compared column.

Spark-first shape: ONE full-outer join on the primary key (null-safe
column comparison in-row — no hashing detour, so the diff also REPORTS
which side changed, not just that something did). At 100 TB both
generations shuffle on pk once; if the generations live in a bucketed
store (``operators/bucketing.py`` / the partitioned snapshot layout)
the join co-locates and the exchange disappears entirely. A diff is
inherently a full comparison — the scale lever is the layout, not the
algorithm — but everything after the join is map-only and the
``unchanged`` mass (the overwhelming majority, batch over batch) is
dropped before it reaches any further stage.

No reference counterpart (extension op — SURVEY §2.1 row 18's
delta-reporting sibling, beside the SCD2 history sibling).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["snapshot_diff"]


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    pk: str | list[str] = "id",
    compare_cols: list[str] | None = None,
    include_unchanged: bool = False,
) -> DataFrame:
    """Diff two snapshot generations of one stream.

    Output: ``pk`` columns, ``change_type`` (``insert`` / ``update`` /
    ``delete``, plus ``unchanged`` when ``include_unchanged``), the new
    image of every compared column under its own name (NULL on
    deletes), and the old image as ``<col>_old`` (NULL on inserts).
    ``compare_cols`` defaults to every shared non-pk column; comparison
    is null-safe (NULL == NULL is "unchanged", NULL vs value is a
    change). Keys must be unique per generation — this diffs
    snapshots, not logs (dedup with ``keep_last_dedup`` first).
    """
    pks = [pk] if isinstance(pk, str) else list(pk)
    if compare_cols is None:
        compare_cols = [
            c for c in new.columns if c not in pks and c in old.columns
        ]
    missing = [c for c in compare_cols if c not in old.columns or c not in new.columns]
    overlap = [c for c in compare_cols if c in pks]
    if not compare_cols or missing or overlap:
        if overlap:
            msg = (
                f"snapshot_diff: compare_cols {overlap} are pk columns — "
                "keys identify rows, they cannot also be compared values"
            )
        elif missing:
            msg = (
                "snapshot_diff: compare_cols must be shared non-pk "
                f"columns; missing from a side: {missing}"
            )
        else:
            msg = "snapshot_diff: no shared non-pk columns to compare"
        raise ValueError(msg)
    clash = [
        c for c in compare_cols
        if f"{c}_old" in compare_cols or f"{c}_old" in pks
    ]
    if clash:
        # the old image of column x is emitted as x_old; a REAL column
        # by that name would collide ambiguously inside the join —
        # refuse up front instead of failing (or mis-resolving) there
        raise ValueError(
            "snapshot_diff: old-image aliases collide with real columns "
            f"({[f'{c}_old' for c in clash]}) — rename them or narrow "
            "compare_cols"
        )
    o = old.select(
        *pks,
        *[F.col(c).alias(f"{c}_old") for c in compare_cols],
        F.lit(True).alias("__in_old"),
    )
    n = new.select(*pks, *compare_cols, F.lit(True).alias("__in_new"))
    j = n.join(o, on=pks, how="full_outer")
    changed = reduce(
        lambda a, b: a | b,
        [~F.col(c).eqNullSafe(F.col(f"{c}_old")) for c in compare_cols],
    )
    tagged = j.withColumn(
        "change_type",
        F.when(F.col("__in_old").isNull(), F.lit("insert"))
        .when(F.col("__in_new").isNull(), F.lit("delete"))
        .when(changed, F.lit("update"))
        .otherwise(F.lit("unchanged")),
    )
    if not include_unchanged:
        tagged = tagged.where(F.col("change_type") != "unchanged")
    return tagged.select(
        *pks,
        "change_type",
        *compare_cols,
        *[f"{c}_old" for c in compare_cols],
    )
