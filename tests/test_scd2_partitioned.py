"""Bucket-partitioned SCD2 store: identical history to the flat store
for the same batch sequence, while an upsert rewrites ONLY the buckets
its keys hash to — untouched buckets' files stay byte-identical."""

import hashlib
import os

import pytest
from pyspark.sql import functions as F

from gluestick_ts_spark.operators.scd2 import read_scd2, scd2_upsert
from gluestick_ts_spark.operators.scd2_partitioned import (
    read_partitioned_scd2,
    scd2_upsert_partitioned,
)

SCHEMA = "id long, city string, ts string"


def _rows(df):
    return sorted(
        (r.id, r.city, str(r.valid_from), str(r.valid_to), r.is_current)
        for r in df.collect()
    )


def _batches(spark):
    return [
        spark.createDataFrame(
            [(i, f"c{i}", "2024-01-01 00:00:00") for i in range(40)], SCHEMA
        ),
        # updates + re-sends + inserts + a within-batch chain
        spark.createDataFrame(
            [(i, f"d{i}", "2024-02-01 00:00:00") for i in range(0, 40, 2)]
            + [(i, f"c{i}", "2024-02-01 00:00:00") for i in range(1, 40, 2)]
            + [(100, "x", "2024-02-01 00:00:00"), (100, "y", "2024-02-10 00:00:00")],
            SCHEMA,
        ),
        # late data splicing INTO an existing closed range
        spark.createDataFrame([(0, "mid", "2024-01-15 00:00:00")], SCHEMA),
        # full replay of batch 2 (must be a no-op)
        spark.createDataFrame(
            [(i, f"d{i}", "2024-02-01 00:00:00") for i in range(0, 40, 2)]
            + [(i, f"c{i}", "2024-02-01 00:00:00") for i in range(1, 40, 2)]
            + [(100, "x", "2024-02-01 00:00:00"), (100, "y", "2024-02-10 00:00:00")],
            SCHEMA,
        ),
    ]


def test_partitioned_matches_flat_store_over_batch_sequence(spark, tmp_path):
    d_flat = str(tmp_path / "flat")
    d_part = str(tmp_path / "part")
    for b in _batches(spark):
        scd2_upsert(b, "s", d_flat, pk="id", eff_ts="ts")
        scd2_upsert_partitioned(b, "s", d_part, pk="id", eff_ts="ts", n_buckets=8)
    flat = read_scd2(spark, "s", d_flat)
    part = read_partitioned_scd2(spark, "s", d_part)
    assert _rows(flat) == _rows(part)
    assert sorted(flat.columns) == sorted(part.columns)


def _file_digests(store_dir):
    out = {}
    for root, _, files in os.walk(store_dir):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(root, f)
                out[os.path.relpath(p, store_dir)] = hashlib.md5(
                    open(p, "rb").read()
                ).hexdigest()
    return out


def test_upsert_rewrites_only_touched_buckets(spark, tmp_path):
    """The IO contract that makes the layout worth having: after an
    upsert touching ONE key, every part file in every bucket the batch
    does not hash to is still the same file with the same bytes."""
    d = str(tmp_path)
    seed = spark.createDataFrame(
        [(i, f"c{i}", "2024-01-01 00:00:00") for i in range(200)], SCHEMA
    )
    scd2_upsert_partitioned(seed, "s", d, pk="id", eff_ts="ts", n_buckets=16)
    store = os.path.join(d, "s.scd2.bucketed.parquet")
    before = _file_digests(store)
    assert len({p.split("/")[0] for p in before}) == 16  # all buckets exist

    one = spark.createDataFrame([(7, "moved", "2024-03-01 00:00:00")], SCHEMA)
    scd2_upsert_partitioned(one, "s", d, pk="id", eff_ts="ts", n_buckets=16)
    after = _file_digests(store)

    touched_bucket = (
        spark.createDataFrame([(7,)], "id long")
        .select(F.pmod(F.xxhash64("id"), F.lit(16)).cast("int").alias("b"))
        .first()
        .b
    )
    changed_dirs = {
        p.split("/")[0]
        for p in set(before) ^ set(after)
        | {p for p in before if p in after and before[p] != after[p]}
    }
    assert changed_dirs == {f"{'__gs_bucket'}={touched_bucket}"}
    # and the merge is correct: key 7 has a closed + an open version
    hist = read_partitioned_scd2(spark, "s", d).where("id = 7")
    got = sorted((r.city, r.is_current) for r in hist.collect())
    assert got == [("c7", False), ("moved", True)]


def test_partitioned_carry_and_column_eff_ts_parity(spark, tmp_path):
    """Same Type-1 carry semantics and Column-eff_ts guard as the flat
    store (shared merge), including the widening full-rewrite path."""
    d = str(tmp_path)
    b1 = spark.createDataFrame(
        [(1, "nyc", "2024-01-01 00:00:00"), (2, "sf", "2024-01-01 00:00:00")],
        SCHEMA,
    )
    with pytest.raises(ValueError, match="column name"):
        scd2_upsert_partitioned(b1, "s", d, pk="id", eff_ts=F.col("ts"))
    scd2_upsert_partitioned(b1, "s", d, pk="id", eff_ts="ts", n_buckets=4)
    # widening batch: adds a carry column -> full rewrite, uniform schema
    b2 = spark.createDataFrame(
        [(1, "berlin", "n1", "2024-02-01 00:00:00")],
        "id long, city string, note string, ts string",
    )
    h = scd2_upsert_partitioned(
        b2, "s", d, pk="id", eff_ts="ts", track_cols=["city"], n_buckets=4
    )
    rows = sorted((r.id, r.city, r.note, r.is_current) for r in h.collect())
    assert rows == [
        (1, "berlin", "n1", True),
        (1, "nyc", "n1", False),
        (2, "sf", None, True),
    ]
    # post-widening: untracked change updates in place, no new version
    b3 = spark.createDataFrame(
        [(1, "berlin", "n2", "2024-03-01 00:00:00")],
        "id long, city string, note string, ts string",
    )
    h2 = scd2_upsert_partitioned(
        b3, "s", d, pk="id", eff_ts="ts", track_cols=["city"], n_buckets=4
    )
    assert h2.where("id = 1").count() == 2
    assert {r.note for r in h2.where("id = 1").collect()} == {"n2"}


def test_bucket_count_frozen_in_store_meta(spark, tmp_path):
    """n_buckets is the store's law: frozen at creation (auto-sized
    when omitted), honored by later upserts that omit it, and a
    CONFLICTING explicit value is refused — bucket membership is a
    function of the frozen count, so a mismatch would silently prune
    the wrong partitions."""
    import os

    d = str(tmp_path)
    seed = spark.createDataFrame(
        [(i, f"c{i}", "2024-01-01 00:00:00") for i in range(50)], SCHEMA
    )
    scd2_upsert_partitioned(seed, "s", d, pk="id", eff_ts="ts", n_buckets=8)
    store = os.path.join(d, "s.scd2.bucketed.parquet")
    assert os.path.exists(os.path.join(store, "_gs_store_meta.json"))

    # omitted n_buckets: frozen value reused (8 bucket dirs, no more)
    b2 = spark.createDataFrame([(1, "x", "2024-02-01 00:00:00")], SCHEMA)
    scd2_upsert_partitioned(b2, "s", d, pk="id", eff_ts="ts")
    dirs = {n for n in os.listdir(store) if n.startswith("__gs_bucket=")}
    assert len(dirs) == 8

    with pytest.raises(ValueError, match="n_buckets=8"):
        scd2_upsert_partitioned(b2, "s", d, pk="id", eff_ts="ts", n_buckets=16)

    # auto-sizing: a tiny seed gets ONE bucket, not 64 near-empty dirs
    d2 = str(tmp_path / "auto")
    scd2_upsert_partitioned(seed, "s", d2, pk="id", eff_ts="ts")
    store2 = os.path.join(d2, "s.scd2.bucketed.parquet")
    dirs2 = {n for n in os.listdir(store2) if n.startswith("__gs_bucket=")}
    assert len(dirs2) == 1

    # same contract on the LWW partitioned snapshot store
    from gluestick_ts_spark.operators.snapshot_partitioned import (
        partitioned_snapshot_upsert,
    )

    snap = spark.createDataFrame([(i, i * 2) for i in range(10)], "id long, v long")
    partitioned_snapshot_upsert(snap, "t", d, pk="id", n_buckets=4)
    with pytest.raises(ValueError, match="n_buckets=4"):
        partitioned_snapshot_upsert(snap, "t", d, pk="id", n_buckets=8)
    partitioned_snapshot_upsert(snap, "t", d, pk="id")  # frozen value OK


def test_widening_rewrite_preserves_sidecar_and_guards(spark, tmp_path):
    """Round-8 review fixes: (a) the schema-widening full rewrite
    deletes the store dir — the bucket-count sidecar must be
    re-frozen, so a later upsert omitting n_buckets still resolves;
    (b) a store whose sidecar is missing refuses an n_buckets-less
    upsert instead of guessing (and self-heals from an explicit one);
    (c) track_cols=[] means 'track nothing, all Type-1', not 'track
    everything'; (d) a Column eff_ts with would-be carry columns is
    refused (its source column is indistinguishable from carry)."""
    import os

    d = str(tmp_path)
    b1 = spark.createDataFrame(
        [(1, "nyc", "2024-01-01 00:00:00")], SCHEMA
    )
    scd2_upsert_partitioned(b1, "s", d, pk="id", eff_ts="ts", n_buckets=4)
    store = os.path.join(d, "s.scd2.bucketed.parquet")
    # widening rewrite (new carry column)...
    b2 = spark.createDataFrame(
        [(1, "nyc", "n1", "2024-02-01 00:00:00")],
        "id long, city string, note string, ts string",
    )
    scd2_upsert_partitioned(
        b2, "s", d, pk="id", eff_ts="ts", track_cols=["city"]
    )
    assert os.path.exists(os.path.join(store, "_gs_store_meta.json"))
    # ...and a follow-up upsert with n_buckets omitted still works
    b3 = spark.createDataFrame(
        [(1, "berlin", "n2", "2024-03-01 00:00:00")],
        "id long, city string, note string, ts string",
    )
    h = scd2_upsert_partitioned(
        b3, "s", d, pk="id", eff_ts="ts", track_cols=["city"]
    )
    assert h.where("is_current").count() == 1

    # sidecar loss: refuse without an explicit count, self-heal with one
    os.remove(os.path.join(store, "_gs_store_meta.json"))
    with pytest.raises(ValueError, match="sidecar"):
        scd2_upsert_partitioned(
            b3, "s", d, pk="id", eff_ts="ts", track_cols=["city"]
        )
    scd2_upsert_partitioned(
        b3, "s", d, pk="id", eff_ts="ts", track_cols=["city"], n_buckets=4
    )
    assert os.path.exists(os.path.join(store, "_gs_store_meta.json"))

    # track_cols=[] -> pure Type-1: a changed attribute opens NO version
    d2 = str(tmp_path / "t1only")
    a1 = spark.createDataFrame([(1, "x", "2024-01-01 00:00:00")], SCHEMA)
    a2 = spark.createDataFrame([(1, "y", "2024-02-01 00:00:00")], SCHEMA)
    scd2_upsert_partitioned(a1, "s", d2, pk="id", eff_ts="ts", track_cols=[])
    h2 = scd2_upsert_partitioned(a2, "s", d2, pk="id", eff_ts="ts", track_cols=[])
    rows = [(r.city, r.is_current) for r in h2.collect()]
    assert rows == [("y", True)]  # one version, city updated in place

    # Column eff_ts: refused outright (name the column instead)
    with pytest.raises(ValueError, match="column name"):
        scd2_upsert_partitioned(
            b2, "s", str(tmp_path / "colts"), pk="id",
            eff_ts=F.col("ts"), track_cols=["city"],
        )
