"""Z-order layout: the payoff is MEASURED from the written parquet
footers — per-file min-max widths (what row-group skipping prunes on)
must be far tighter than an unsorted write on BOTH dimensions."""

import pytest
from pyspark.sql import functions as F

from gluestick_ts_spark.sinks.zorder import (
    file_stats_ranges,
    write_zordered,
    zorder_key_expr,
)


def test_zorder_key_interleaves_bits(spark):
    # 2 cols x 2 bits over [0, 4): value==bucket; morton(x, y) with x
    # in even positions, y in odd
    ranges = {"x": (0.0, 4.0), "y": (0.0, 4.0)}
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 3), (2, 1)], "x int, y int"
    )
    got = {
        (r.x, r.y): r.z
        for r in df.select(
            "x", "y", zorder_key_expr(["x", "y"], ranges, bits=2).alias("z")
        ).collect()
    }
    def morton(x, y):
        return sum(((x >> j) & 1) << (2 * j) | ((y >> j) & 1) << (2 * j + 1)
                   for j in range(2))
    assert got == {(x, y): morton(x, y) for (x, y) in got}
    with pytest.raises(ValueError, match="signed long"):
        zorder_key_expr(["a", "b", "c", "d"], {}, bits=16)


def test_zorder_write_tightens_file_stats_on_both_dims(spark, tmp_path):
    # two independent dimensions; rows arrive in an order correlated
    # with NEITHER, so a plain write gives every file near-full ranges
    n = 20_000
    df = spark.range(n).select(
        ((F.col("id") * 7919) % 1000).cast("double").alias("a"),
        ((F.col("id") * 104729) % 1000).cast("double").alias("b"),
        F.col("id").alias("payload"),
    )
    plain = str(tmp_path / "plain")
    df.repartition(16).write.parquet(plain)
    asorted = str(tmp_path / "asorted")
    df.repartitionByRange(16, "a").sortWithinPartitions("a").write.parquet(
        asorted
    )
    zpath = str(tmp_path / "z")
    ranges = write_zordered(df, zpath, ["a", "b"], bits=10, num_files=16)
    assert ranges["a"][0] == 0.0 and ranges["a"][1] == 999.0

    def avg_width(path, col):
        stats = file_stats_ranges(path, ["a", "b"])
        return sum(s[col] for s in stats) / len(stats)

    for col in ("a", "b"):
        assert avg_width(plain, col) > 900  # unsorted: near-full ranges
        # z-ordered: every file covers a small fraction of BOTH dims
        # (measured ~400/~290 vs 998/998 unsorted)
        assert avg_width(zpath, col) < 550, (col, avg_width(zpath, col))
    # the single-column sort's blind spot: tight on a, wide on b —
    # z-order stays tight on the dimension the sort ignores
    assert avg_width(asorted, "a") < 100
    assert avg_width(asorted, "b") > 700
    assert avg_width(zpath, "b") < 0.6 * avg_width(asorted, "b")

    # correctness: same rows back
    assert spark.read.parquet(zpath).count() == n
    s1 = spark.read.parquet(zpath).agg(F.sum("payload")).first()[0]
    assert s1 == n * (n - 1) // 2


def test_zorder_rejects_all_null_dim(spark, tmp_path):
    df = spark.range(10).select(
        F.col("id").cast("double").alias("a"),
        F.lit(None).cast("double").alias("b"),
    )
    with pytest.raises(ValueError, match="all-NULL"):
        write_zordered(df, str(tmp_path / "x"), ["a", "b"])
