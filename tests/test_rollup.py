"""Materialized rollup (continuous aggregate) invariants: additive
refresh equals full recompute, refreshes prune to affected dates."""

import glob
import os

from pyspark.sql import functions as F

from gluestick_ts_spark.operators.rollup import (
    read_rollup,
    refresh_rollup,
    rollup_aggregate,
    write_rollup,
)


def _events(spark):
    rows = []
    for i in range(400):
        day = 1 + (i % 5)          # 5 distinct dates
        hour = (i * 7) % 24
        rows.append((
            i,
            f"2024-02-{day:02d} {hour:02d}:{i % 60:02d}:00",
            ["click", "view"][i % 2],
            float(i) * 0.25,
        ))
    return spark.createDataFrame(
        rows, "event_id long, ts string, event_type string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def _norm(df):
    return {
        (str(r.bucket_start), r.event_type): (r.cnt, str(r.sum_value))
        for r in df.collect()
    }


def test_refresh_merges_exactly_to_full_recompute(spark, tmp_path):
    """Seed + two overlapping refreshes must leave the store
    bit-identical to aggregating all events at once — the additive
    DECIMAL design means no float-order drift can creep in."""
    ev = _events(spark)
    path = "file://" + str(tmp_path / "rollup")
    seed = ev.where(F.col("event_id") % 3 == 0)
    b1 = ev.where(F.col("event_id") % 3 == 1)
    b2 = ev.where(F.col("event_id") % 3 == 2)

    write_rollup(rollup_aggregate(seed, "ts", ["event_type"], ["value"]), path)
    refresh_rollup(b1, path, "ts", ["event_type"], ["value"])
    merged = refresh_rollup(b2, path, "ts", ["event_type"], ["value"])

    full = rollup_aggregate(ev, "ts", ["event_type"], ["value"])
    assert _norm(merged.select("bucket_start", "event_type", "cnt", "sum_value")) == _norm(full)
    # derived means come from the exact sums
    m = merged.where(F.col("cnt") > 0).select(
        "cnt", "sum_value", "mean_value").first()
    assert abs(float(m.sum_value) / m.cnt - m.mean_value) < 1e-4


def test_refresh_rewrites_only_affected_date_partitions(spark, tmp_path):
    """A refresh whose batch touches one date must leave every other
    date partition's files untouched on disk."""
    ev = _events(spark)
    path = str(tmp_path / "rollup")
    write_rollup(rollup_aggregate(ev, "ts", ["event_type"], ["value"]), path)

    def files_by_date():
        out = {}
        for d in glob.glob(os.path.join(path, "__gs_date=*")):
            out[os.path.basename(d)] = {
                (f, os.path.getmtime(os.path.join(d, f)))
                for f in os.listdir(d) if f.endswith(".parquet")
            }
        return out

    before = files_by_date()
    assert len(before) == 5
    one_day = spark.createDataFrame(
        [(9999, "2024-02-03 10:00:00", "click", 1.0)],
        "event_id long, ts string, event_type string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    refresh_rollup(one_day, path, "ts", ["event_type"], ["value"])
    after = files_by_date()
    changed = {d for d in after if after[d] != before.get(d)}
    assert changed == {"__gs_date=2024-02-03"}, changed
    # and the touched bucket really absorbed the row
    got = read_rollup(spark, path).where(
        (F.col("bucket_start") == "2024-02-03 10:00:00")
        & (F.col("event_type") == "click")
    ).first()
    base = rollup_aggregate(ev, "ts", ["event_type"], ["value"]).where(
        (F.col("bucket_start") == "2024-02-03 10:00:00")
        & (F.col("event_type") == "click")
    ).first()
    assert got.cnt == (base.cnt if base else 0) + 1


def test_refresh_midnight_spanning_bucket_merges_exactly(spark, tmp_path):
    """Round 17: the refresh's affected-dates collect derives from the
    raw batch rows via the SAME window expression (not from the batch
    aggregate, and NOT from to_date(ts)). A 7-hour bucket makes the
    two diverge — a row at 01:00 belongs to a bucket that STARTS on
    the previous date — so this pins the date set to the bucket
    grain: the merge must still equal full recompute and only the
    bucket-start dates' partitions may be touched."""
    rows = [
        # seed rows on 2024-02-01, batch row at 2024-02-02 01:00 whose
        # 7h bucket starts 2024-02-01 21:00 (previous calendar date)
        (1, "2024-02-01 22:00:00", "click", 1.0),
        (2, "2024-02-01 10:00:00", "click", 2.0),
    ]
    batch_rows = [(3, "2024-02-02 01:00:00", "click", 4.0)]
    mk = lambda rs: spark.createDataFrame(
        rs, "event_id long, ts string, event_type string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    ev, batch = mk(rows), mk(batch_rows)
    path = "file://" + str(tmp_path / "rollup7h")
    write_rollup(
        rollup_aggregate(ev, "ts", ["event_type"], ["value"], bucket="7 hours"),
        path,
    )
    merged = refresh_rollup(
        batch, path, "ts", ["event_type"], ["value"], bucket="7 hours"
    )
    full = rollup_aggregate(
        mk(rows + batch_rows), "ts", ["event_type"], ["value"],
        bucket="7 hours",
    )
    assert _norm(
        merged.select("bucket_start", "event_type", "cnt", "sum_value")
    ) == _norm(full)


def test_stream_rollup_converges_to_batch_recompute(spark, tmp_path):
    """Two micro-batches folded through the streaming wrapper leave
    the store equal to a one-shot batch aggregate of all events."""
    from gluestick_ts_spark.streaming.incremental import stream_rollup

    ev = _events(spark)
    src = str(tmp_path / "src")
    path = "file://" + str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ck")
    schema = "event_id long, ts timestamp, event_type string, value double"

    for part in (0, 1):
        ev.where(F.col("event_id") % 2 == part).write.mode("append").parquet(src)
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            stream_rollup(stream, path, "ts", ["event_type"], ["value"],
                          checkpoint_dir=ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    merged = read_rollup(spark, path).select(
        "bucket_start", "event_type", "cnt", "sum_value")
    full = rollup_aggregate(ev, "ts", ["event_type"], ["value"])
    assert _norm(merged) == _norm(full)


def test_stream_rollup_crash_replay_does_not_double_count(spark, tmp_path):
    """The delta-snapshot layout's structural idempotency: a replayed
    micro-batch OVERWRITES its own delta dir, so counts after the
    replay equal the single-run counts exactly (the additive-refresh
    layout would have re-added them)."""
    import os

    from gluestick_ts_spark.streaming.incremental import stream_rollup

    ev = _events(spark)
    src = str(tmp_path / "src")
    path = "file://" + str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ck")
    schema = "event_id long, ts timestamp, event_type string, value double"
    ev.write.mode("append").parquet(src)

    def run():
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            stream_rollup(stream, path, "ts", ["event_type"], ["value"],
                          checkpoint_dir=ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run()
    first = _norm(read_rollup(spark, path).select(
        "bucket_start", "event_type", "cnt", "sum_value"))
    # crash window: delta written, checkpoint commit lost -> replay
    os.remove(os.path.join(ckpt, "commits", "0"))
    crc = os.path.join(ckpt, "commits", ".0.crc")
    if os.path.exists(crc):
        os.remove(crc)
    run()
    again = _norm(read_rollup(spark, path).select(
        "bucket_start", "event_type", "cnt", "sum_value"))
    assert again == first
    assert _norm(rollup_aggregate(ev, "ts", ["event_type"], ["value"])) == again


def test_compact_rollup_folds_deltas_behind_pointer(spark, tmp_path):
    """Compaction folds unfolded deltas into a new immutable base and
    advances the pointer: reads identical before/after, folded delta
    dirs reclaimed, idempotent when nothing is unfolded."""
    import json

    from gluestick_ts_spark.operators.rollup import (
        compact_rollup,
        write_rollup_delta,
    )
    from gluestick_ts_spark.sources.fs import list_dir_names, read_text_file

    ev = _events(spark)
    path = "file://" + str(tmp_path / "dstore")
    for b in (0, 1, 2):
        write_rollup_delta(
            ev.where(F.col("event_id") % 3 == b), path,
            "ts", ["event_type"], ["value"], scope="q1", batch_no=b)
    before = _norm(read_rollup(spark, path).select(
        "bucket_start", "event_type", "cnt", "sum_value"))
    assert _norm(rollup_aggregate(ev, "ts", ["event_type"], ["value"])) == before

    compact_rollup(spark, path)
    meta = json.loads(read_text_file(spark, path + "/rollup_meta.json"))
    assert meta["base"] == "base_v1" and meta["folded"] == {"q1": 2}
    assert list_dir_names(spark, path + "/deltas/q1") == []
    after = _norm(read_rollup(spark, path).select(
        "bucket_start", "event_type", "cnt", "sum_value"))
    assert after == before
    compact_rollup(spark, path)  # no unfolded deltas: no-op
    assert json.loads(read_text_file(spark, path + "/rollup_meta.json"))[
        "version"] == 1

    # post-compaction deltas keep merging at read and replay-overwrite
    # stays idempotent against the new base
    write_rollup_delta(ev.limit(50), path, "ts", ["event_type"], ["value"],
                       scope="q1", batch_no=3)
    write_rollup_delta(ev.limit(50), path, "ts", ["event_type"], ["value"],
                       scope="q1", batch_no=3)  # replay overwrite
    plus = read_rollup(spark, path).agg(F.sum("cnt").alias("s")).first().s
    assert plus == ev.count() + 50


def test_rollup_hll_distinct_survives_refresh_and_deltas(spark, tmp_path):
    """Mergeable HLL sketches in the store: approx distinct users per
    bucket must match the exact value (small cardinalities are exact
    in DataSketches HLL) after an additive refresh AND through the
    delta-snapshot layout with compaction — the distinct statistic
    plain additive stores can't carry."""
    from gluestick_ts_spark.operators.rollup import (
        compact_rollup,
        refresh_rollup,
        write_rollup,
        write_rollup_delta,
    )

    ev = _events(spark).withColumn("user_id", F.col("event_id") % 7)
    exact = {
        (str(r.bucket_start), r.event_type): r.du
        for r in ev.groupBy(
            F.window("ts", "1 hour")["start"].alias("bucket_start"),
            "event_type",
        )
        .agg(F.count_distinct("user_id").alias("du"))
        .collect()
    }

    # additive-refresh layout
    p1 = "file://" + str(tmp_path / "r1")
    seed = ev.where(F.col("event_id") % 2 == 0)
    rest = ev.where(F.col("event_id") % 2 == 1)
    write_rollup(
        rollup_aggregate(seed, "ts", ["event_type"], ["value"],
                         distinct_cols=["user_id"]), p1)
    merged = refresh_rollup(rest, p1, "ts", ["event_type"], ["value"],
                            distinct_cols=["user_id"])
    got1 = {
        (str(r.bucket_start), r.event_type): r.approx_distinct_user_id
        for r in merged.collect()
    }
    assert got1 == exact

    # delta-snapshot layout + compaction
    p2 = "file://" + str(tmp_path / "r2")
    for b, part in enumerate((seed, rest)):
        write_rollup_delta(part, p2, "ts", ["event_type"], ["value"],
                           scope="q", batch_no=b, distinct_cols=["user_id"])
    got2 = {
        (str(r.bucket_start), r.event_type): r.approx_distinct_user_id
        for r in read_rollup(spark, p2).collect()
    }
    assert got2 == exact
    compact_rollup(spark, p2)
    got3 = {
        (str(r.bucket_start), r.event_type): r.approx_distinct_user_id
        for r in read_rollup(spark, p2).collect()
    }
    assert got3 == exact


def test_compact_rollup_sweeps_crash_orphans_and_meta_is_crash_safe(
    spark, tmp_path
):
    """A compaction that died after its pointer commit leaves folded
    deltas + the old base on disk; the next compaction (even with
    nothing unfolded) must sweep everything the pointer can't reach.
    And the pointer write itself must survive a tmp-rename crash (a
    complete .tmp self-heals on the next read)."""
    import json

    from gluestick_ts_spark.operators.rollup import (
        compact_rollup,
        write_rollup_delta,
    )
    from gluestick_ts_spark.sources.fs import (
        list_dir_names,
        read_text_file,
        rename_path,
        write_text_file,
    )

    ev = _events(spark)
    path = "file://" + str(tmp_path / "gstore")
    for b in (0, 1):
        write_rollup_delta(ev.where(F.col("event_id") % 2 == b), path,
                           "ts", ["event_type"], ["value"],
                           scope="q", batch_no=b)
    compact_rollup(spark, path)
    before = _norm(read_rollup(spark, path).select(
        "bucket_start", "event_type", "cnt", "sum_value"))

    # simulate the crash-orphan state: stale base + folded delta dirs
    write_text_file(spark, path + "/base_v0/stale.txt", "orphan")
    write_rollup_delta(ev.limit(10), path, "ts", ["event_type"], ["value"],
                       scope="q", batch_no=1)  # batch 1 <= watermark: folded
    assert "base_v0" in list_dir_names(spark, path)
    compact_rollup(spark, path)  # nothing unfolded -> sweep-only
    assert "base_v0" not in list_dir_names(spark, path)
    assert list_dir_names(spark, path + "/deltas/q") == []
    assert _norm(read_rollup(spark, path).select(
        "bucket_start", "event_type", "cnt", "sum_value")) == before

    # pointer crash window: meta gone, complete .tmp present
    rename_path(spark, path + "/rollup_meta.json",
                path + "/rollup_meta.json.tmp")
    healed = _norm(read_rollup(spark, path).select(
        "bucket_start", "event_type", "cnt", "sum_value"))
    assert healed == before
    json.loads(read_text_file(spark, path + "/rollup_meta.json"))  # restored


def test_rollup_kll_quantiles_survive_refresh_and_deltas(spark, tmp_path):
    """Mergeable KLL quantile sketches in the store: with <= k values
    per bucket the sketch is EXACT, so the derived approx_p50/p95 must
    equal the exact discrete quantile of the bucket's values after an
    additive refresh AND through the delta-snapshot layout with
    compaction — the percentile statistic plain additive stores can't
    carry. The merged sketch must also agree with a one-shot aggregate
    (merge invariance)."""
    from gluestick_ts_spark.operators.rollup import (
        compact_rollup,
        refresh_rollup,
        write_rollup,
        write_rollup_delta,
    )

    ev = _events(spark)

    def _exact(q):
        # inclusive-rank discrete quantile: smallest value whose
        # normalized rank >= q (the DataSketches default convention)
        out = {}
        rows = ev.groupBy(
            F.window("ts", "1 hour")["start"].alias("b"), "event_type"
        ).agg(F.sort_array(F.collect_list("value")).alias("vs")).collect()
        for r in rows:
            vs, n = r.vs, len(r.vs)
            # smallest index i with (i+1)/n >= q
            i = 0
            while (i + 1) / n < q:
                i += 1
            out[(str(r.b), r.event_type)] = vs[i]
        return out

    exact_p50, exact_p95 = _exact(0.5), _exact(0.95)

    def _got(df):
        p50 = {(str(r.bucket_start), r.event_type): r.approx_p50_value
               for r in df.collect()}
        p95 = {(str(r.bucket_start), r.event_type): r.approx_p95_value
               for r in df.collect()}
        return p50, p95

    # additive-refresh layout
    p1 = "file://" + str(tmp_path / "k1")
    seed = ev.where(F.col("event_id") % 2 == 0)
    rest = ev.where(F.col("event_id") % 2 == 1)
    write_rollup(
        rollup_aggregate(seed, "ts", ["event_type"], ["value"],
                         quantile_cols=["value"]), p1)
    merged = refresh_rollup(rest, p1, "ts", ["event_type"], ["value"],
                            quantile_cols=["value"])
    got50, got95 = _got(merged)
    assert got50 == exact_p50
    assert got95 == exact_p95

    # merge invariance: the refreshed store equals a one-shot aggregate
    from gluestick_ts_spark.operators.rollup import _derive_means

    one50, one95 = _got(_derive_means(
        rollup_aggregate(ev, "ts", ["event_type"], ["value"],
                         quantile_cols=["value"])))
    assert (one50, one95) == (got50, got95)

    # delta-snapshot layout + compaction
    p2 = "file://" + str(tmp_path / "k2")
    for b, part in enumerate((seed, rest)):
        write_rollup_delta(part, p2, "ts", ["event_type"], ["value"],
                           scope="q", batch_no=b, quantile_cols=["value"])
    got50, got95 = _got(read_rollup(spark, p2))
    assert got50 == exact_p50 and got95 == exact_p95
    compact_rollup(spark, p2)
    got50, got95 = _got(read_rollup(spark, p2))
    assert got50 == exact_p50 and got95 == exact_p95


def test_rollup_theta_overlap_answers_returning_users_from_store(
    spark, tmp_path
):
    """intersect_cols stores theta sketches per bucket; after an
    additive refresh, rollup_bucket_overlap must answer hour-over-hour
    returning users FROM THE STORE exactly (small cardinalities are
    exact in theta sketches), with gaps in the bucket chain reported
    as has_prev=False rather than intersected across the hole."""
    from gluestick_ts_spark.operators.rollup import (
        refresh_rollup,
        rollup_bucket_overlap,
        write_rollup,
    )

    # one event type, 4 consecutive hours + 1 gapped hour, known users
    rows = []
    users_by_hour = {
        0: [1, 2, 3, 4],
        1: [3, 4, 5],          # overlap with h0: {3,4} -> 2
        2: [5, 6],             # overlap with h1: {5}   -> 1
        3: [7, 8],             # overlap with h2: {}    -> 0
        5: [7, 8],             # gap at h4: has_prev False
    }
    i = 0
    for h, us in users_by_hour.items():
        for u in us:
            rows.append((i, f"2024-05-01 {h:02d}:15:00", "click", 1.0, u))
            i += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts string, event_type string, value double, "
        "user_id long",
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    path = "file://" + str(tmp_path / "theta_store")
    write_rollup(
        rollup_aggregate(
            ev.where("event_id % 2 = 0"), "ts", ["event_type"], ["value"],
            intersect_cols=["user_id"],
        ),
        path,
    )
    refresh_rollup(
        ev.where("event_id % 2 = 1"), path, "ts", ["event_type"], ["value"],
        intersect_cols=["user_id"],
    )
    store = read_rollup(spark, path, derive_means=False)
    out = {
        int(str(r.bucket_start)[11:13]): r
        for r in rollup_bucket_overlap(
            store, "user_id", ["event_type"]
        ).collect()
    }
    assert out[0].has_prev is False and out[0].approx_returning is None
    assert out[1].has_prev and out[1].approx_returning == 2.0
    assert out[2].has_prev and out[2].approx_returning == 1.0
    assert out[3].has_prev and out[3].approx_returning == 0.0
    assert out[5].has_prev is False and out[5].approx_returning is None
    assert out[0].approx_distinct_user_id == 4.0
    # validation: a store without the sketch refuses loudly
    import pytest

    with pytest.raises(ValueError, match="intersect_cols"):
        rollup_bucket_overlap(store.drop("theta_user_id"), "user_id",
                              ["event_type"])


def test_rollup_heavy_hitters_is_exact_streaming_trending(spark, tmp_path):
    """EXACT per-window heavy hitters from the streaming rollup store:
    two micro-batches of a token stream fold into the delta-snapshot
    store; rollup_heavy_hitters over the store must equal the plain
    batch GROUP BY / HAVING answer per hour — Structured Streaming's
    single-aggregation limit never bites because the second aggregate
    runs on the (already reduced) store at read time."""
    import pytest

    from gluestick_ts_spark.operators.rollup import rollup_heavy_hitters
    from gluestick_ts_spark.streaming.incremental import stream_rollup

    rows = []
    i = 0
    # hour 0: 'hot' 12/20 rows; hour 1: 'warm' 8/16, 'hot' only 2
    for tok, n, h in (("hot", 12, 0), ("x", 4, 0), ("y", 4, 0),
                      ("warm", 8, 1), ("hot", 2, 1), ("z", 6, 1)):
        for _ in range(n):
            rows.append((i, f"2024-07-01 {h:02d}:{i % 60:02d}:00", tok))
            i += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, token string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    src = str(tmp_path / "src")
    path = "file://" + str(tmp_path / "hstore")
    ckpt = str(tmp_path / "ck")
    schema = "event_id long, ts timestamp, token string"
    for part in (0, 1):
        ev.where(F.col("event_id") % 2 == part).write.mode("append").parquet(src)
        q = (
            stream_rollup(
                spark.readStream.schema(schema).parquet(src),
                path, "ts", ["token"], [], checkpoint_dir=ckpt,
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    store = read_rollup(spark, path, derive_means=False)
    got = {
        (str(r.bucket_start), r.token): (r.cnt, r.bucket_total, r.frac)
        for r in rollup_heavy_hitters(store, ["token"], 0.3).collect()
    }
    # exact batch twin
    win = ev.groupBy(
        F.window("ts", "1 hour")["start"].alias("b"), "token"
    ).agg(F.count("*").alias("c"))
    tot = ev.groupBy(F.window("ts", "1 hour")["start"].alias("b")).agg(
        F.count("*").alias("t")
    )
    exact = {
        (str(r.b), r.token): (r.c, r.t, round(r.c / r.t, 6))
        for r in win.join(tot, "b").where(F.col("c") > 0.3 * F.col("t")).collect()
    }
    assert got == exact
    assert ("2024-07-01 00:00:00", "hot") in got
    assert ("2024-07-01 01:00:00", "warm") in got
    assert ("2024-07-01 01:00:00", "hot") not in got

    with pytest.raises(ValueError, match="threshold_frac"):
        rollup_heavy_hitters(store, ["token"], 1.5)


def test_stream_rollup_theta_returning_users_end_to_end(spark, tmp_path):
    """The streaming composition: theta sketches ride stream_rollup's
    delta-snapshot store across micro-batches, and the store-side
    reader answers hour-over-hour returning users exactly — continuous
    ingestion, set-intersection analytics, zero raw-event rescans."""
    from gluestick_ts_spark.operators.rollup import rollup_bucket_overlap
    from gluestick_ts_spark.streaming.incremental import stream_rollup

    rows = []
    i = 0
    # h0 users {1,2,3}; h1 {2,3,4} (returning 2); h2 {9} (returning 0)
    for h, us in ((0, [1, 2, 3]), (1, [2, 3, 4]), (2, [9])):
        for u in us:
            rows.append((i, f"2024-08-01 {h:02d}:05:00", "t", 1.0, u))
            i += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts string, event_type string, value double, "
        "user_id long",
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    src = str(tmp_path / "src")
    path = "file://" + str(tmp_path / "tstore")
    ckpt = str(tmp_path / "ck")
    schema = (
        "event_id long, ts timestamp, event_type string, value double, "
        "user_id long"
    )
    for part in (0, 1):
        ev.where(F.col("event_id") % 2 == part).write.mode("append").parquet(src)
        q = (
            stream_rollup(
                spark.readStream.schema(schema).parquet(src),
                path, "ts", ["event_type"], ["value"],
                checkpoint_dir=ckpt, intersect_cols=["user_id"],
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    store = read_rollup(spark, path, derive_means=False)
    out = {
        int(str(r.bucket_start)[11:13]): r
        for r in rollup_bucket_overlap(store, "user_id", ["event_type"]).collect()
    }
    assert out[0].approx_returning is None and out[0].has_prev is False
    assert out[1].approx_returning == 2.0
    assert out[2].approx_returning == 0.0
    assert out[1].approx_distinct_user_id == 3.0
