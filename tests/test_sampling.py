"""Deterministic hash sampling/splitting invariants."""

import pytest
from pyspark.sql import functions as F

from gluestick_ts_spark.functions.sampling import hash_sample, hash_split, md5_bucket_expr


def test_bucket_range_and_determinism(spark):
    df = spark.createDataFrame([(i,) for i in range(500)], "id long")
    b1 = {r.id: r.b for r in df.select("id", md5_bucket_expr("id").alias("b")).collect()}
    b2 = {r.id: r.b for r in df.repartition(7).select("id", md5_bucket_expr("id").alias("b")).collect()}
    assert b1 == b2, "bucket must not depend on partitioning"
    assert all(0 <= v < 256 for v in b1.values())


def test_hash_sample_subset_stability(spark):
    df = spark.createDataFrame([(i,) for i in range(1000)], "id long")
    small = {r.id for r in hash_sample(df, "id", 0.1).collect()}
    big = {r.id for r in hash_sample(df, "id", 0.5).collect()}
    assert small <= big, "growing the fraction must only ADD keys"
    assert 0.05 < len(small) / 1000 < 0.16
    with pytest.raises(ValueError):
        hash_sample(df, "id", 1.5)


def test_hash_split_total_and_disjoint(spark):
    df = spark.createDataFrame([(i,) for i in range(1000)], "id long")
    out = hash_split(df, "id", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r.split: r.n for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 1000
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]


def test_weighted_domain_sample_rates_and_independence(spark):
    """Per-domain keep rates land near their quantized targets; the
    decision is partition-stable; and the mixture draw is INDEPENDENT
    of the split assignment (different salt => different hash), so a
    low-rate domain doesn't sample only from the low split buckets."""
    from gluestick_ts_spark.functions.sampling import weighted_domain_sample

    rows = [(i, "en" if i % 2 == 0 else "zh") for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, lang string")
    out = weighted_domain_sample(
        df, "id", "lang", {"en": 0.5, "zh": 0.125}
    )
    got = {r.id: r for r in out.collect()}
    again = {r.id: r for r in out.repartition(7).collect()}
    assert {i: g.wds_keep for i, g in got.items()} == {
        i: g.wds_keep for i, g in again.items()
    }
    en_rate = sum(g.wds_keep for g in got.values() if g.lang == "en") / 1000
    zh_rate = sum(g.wds_keep for g in got.values() if g.lang == "zh") / 1000
    assert abs(en_rate - 128 / 256) < 0.06, en_rate
    assert abs(zh_rate - 32 / 256) < 0.06, zh_rate
    # independence from the plain md5(id) bucket used by hash_split:
    # among kept zh rows, plain buckets must span the full range, not
    # only the bottom eighth
    kept_zh_plain = [
        r.b
        for r in df.join(
            out.where(F.col("wds_keep") & (F.col("lang") == "zh")).select("id"),
            "id",
        )
        .select(md5_bucket_expr("id").alias("b"))
        .collect()
    ]
    assert max(kept_zh_plain) > 200, max(kept_zh_plain)


def test_weighted_domain_sample_unknown_domain_and_validation(spark):
    from gluestick_ts_spark.functions.sampling import weighted_domain_sample

    df = spark.createDataFrame([(1, "xx"), (2, "en")], "id long, lang string")
    out = {r.id: r for r in weighted_domain_sample(
        df, "id", "lang", {"en": 1.0}).collect()}
    assert out[1].wds_rate == 0 and not out[1].wds_keep  # unknown -> default 0
    assert out[2].wds_rate == 256 and out[2].wds_keep    # rate 1.0 keeps all
    with pytest.raises(ValueError):
        weighted_domain_sample(df, "id", "lang", {"en": 1.5})


def test_stratified_exact_n_stable_and_exact(spark):
    from gluestick_ts_spark.functions.sampling import stratified_hash_sample_expr

    df = spark.createDataFrame(
        [(i, ["a", "b", "c"][i % 3]) for i in range(300)],
        "id long, stratum string",
    )
    rank, keep = stratified_hash_sample_expr("id", "stratum", 10)
    out = df.select("id", "stratum", rank.alias("r"), keep.alias("k"))
    per = {r["stratum"]: 0 for r in out.collect()}
    kept1 = set()
    for r in out.collect():
        if r.k:
            per[r.stratum] += 1
            kept1.add(r.id)
    assert per == {"a": 10, "b": 10, "c": 10}  # exact N per stratum
    rank2, keep2 = stratified_hash_sample_expr("id", "stratum", 10)
    kept2 = {r.id for r in df.repartition(7).select(
        "id", keep2.alias("k")).collect() if r.k}
    assert kept1 == kept2  # partition-stable membership


def test_temperature_rates_realize_target_mixture(spark):
    """T=1 leaves the natural mixture (all rates equal); larger T
    upweights rare domains; the kept corpus' expected mixture equals
    q_i = p_i^(1/T)/Z; rates compose with weighted_domain_sample."""
    import math

    from gluestick_ts_spark.functions.sampling import (
        domain_shares,
        temperature_rates,
        weighted_domain_sample,
    )

    rows = [(i, "en") for i in range(800)] + [(i + 800, "sw") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    shares = domain_shares(df, "lang")
    assert shares == {"en": 0.8, "sw": 0.2}

    r1 = temperature_rates(shares, temperature=1.0)
    assert abs(r1["en"] - r1["sw"]) < 1e-12  # natural mixture: no reweight
    assert max(r1.values()) == 1.0

    t = 2.0
    rt = temperature_rates(shares, temperature=t)
    assert rt["sw"] == 1.0 and rt["en"] < 1.0  # rare domain kept whole
    # expected kept mixture == q (up to the sampler's 1/256 quantization)
    z = 0.8 ** (1 / t) + 0.2 ** (1 / t)
    q_en = (0.8 ** (1 / t)) / z
    kept_en = 0.8 * rt["en"]
    kept_sw = 0.2 * rt["sw"]
    assert abs(kept_en / (kept_en + kept_sw) - q_en) < 1e-9

    out = weighted_domain_sample(df, "doc_id", "lang", rt)
    kept = out.where("wds_keep").groupBy("lang").count().collect()
    got = {r.lang: r["count"] for r in kept}
    assert got["sw"] == 200  # rate 1.0 keeps everything
    exp_en = round(rt["en"] * 256) / 256 * 800
    assert abs(got["en"] - exp_en) < 0.15 * exp_en  # md5 bucket noise

    import pytest as _p

    with _p.raises(ValueError, match="temperature"):
        temperature_rates(shares, temperature=0)


def test_epoch_shuffle_reproducible_and_fresh_per_seed(spark):
    """Same seed = identical permutation; new seed = a genuinely
    different one. Shard assignment partitions the corpus exactly."""
    import hashlib

    from gluestick_ts_spark.functions.sampling import (
        epoch_shard_expr,
        epoch_shuffle_expr,
    )

    d = spark.range(500).withColumnRenamed("id", "doc_id")
    order = lambda seed: [
        r.doc_id
        for r in d.orderBy(epoch_shuffle_expr("doc_id", seed)).collect()
    ]
    a, b, c = order(1), order(1), order(2)
    assert a == b
    assert a != c
    assert sorted(a) == sorted(c) == list(range(500))  # permutations
    # the order IS md5('seed:key') — engine-portable by construction
    expect = sorted(
        range(500),
        key=lambda i: hashlib.md5(f"1:{i}".encode()).hexdigest(),
    )
    assert a == expect

    shards = d.select(
        "doc_id", epoch_shard_expr("doc_id", 1, 7).alias("s")
    ).collect()
    assert {r.s for r in shards} == set(range(7))
    exp_shard = {
        i: int(hashlib.md5(f"1:{i}".encode()).hexdigest()[:4], 16) % 7
        for i in range(500)
    }
    assert {r.doc_id: r.s for r in shards} == exp_shard


def test_epoch_shuffle_null_key_yields_null_not_collision(spark):
    """Non-null-key contract: concat (not concat_ws) propagates a NULL
    key to a NULL hash, so null-keyed rows surface as NULLs instead of
    all silently colliding at md5('<seed>:')'s permutation position."""
    from gluestick_ts_spark.functions.sampling import epoch_shuffle_expr

    d = spark.createDataFrame([(1,), (None,)], "doc_id long")
    vals = {
        r.doc_id: r.h
        for r in d.select(
            "doc_id", epoch_shuffle_expr("doc_id", 1).alias("h")
        ).collect()
    }
    assert vals[1] is not None
    assert vals[None] is None


def test_write_training_shards_layout_and_order(spark, tmp_path):
    """Shard directories hold the exact hash-assigned rows, each shard
    file is ONE contiguous run sorted in epoch order (a sequential
    reader consumes the permutation), and re-writing with the same
    seed reproduces identical contents."""
    import glob
    import hashlib

    import pyarrow.parquet as pq

    from gluestick_ts_spark.functions.sampling import write_training_shards

    d = spark.range(300).withColumnRenamed("id", "doc_id").withColumn(
        "payload", F.col("doc_id") * 2
    )
    path = str(tmp_path / "epoch")
    manifest = write_training_shards(d, path, "doc_id", seed=3, n_shards=4)
    assert (manifest["key"], manifest["seed"], manifest["n_shards"]) == (
        "doc_id", "3", 4,
    )
    # the manifest's counts come from the WRITTEN data and are also
    # persisted as a sidecar for truncation detection
    import json as _json

    assert manifest["total_rows"] == 300
    assert sum(manifest["shard_rows"].values()) == 300
    sidecar = _json.load(open(path + "/_manifest.json"))
    assert sidecar == manifest

    h = lambda i: hashlib.md5(f"3:{i}".encode()).hexdigest()
    exp_by_shard = {}
    for i in range(300):
        exp_by_shard.setdefault(int(h(i)[:4], 16) % 4, []).append(i)
    for s in exp_by_shard:
        exp_by_shard[s].sort(key=h)

    got_by_shard = {}
    for s in range(4):
        files = sorted(glob.glob(f"{path}/shard={s}/*.parquet"))
        assert len(files) == 1, (s, files)  # one contiguous sorted run
        t = pq.read_table(files[0])
        got_by_shard[s] = t.column("doc_id").to_pylist()
        # payload columns ride along untouched
        assert t.column("payload").to_pylist() == [
            x * 2 for x in got_by_shard[s]
        ]
    assert got_by_shard == exp_by_shard

    # identical re-write under the same seed
    write_training_shards(d, path, "doc_id", seed=3, n_shards=4)
    for s in range(4):
        files = sorted(glob.glob(f"{path}/shard={s}/*.parquet"))
        assert [
            pq.read_table(f).column("doc_id").to_pylist() for f in files
        ] == [exp_by_shard[s]]


def test_select_token_budget(spark):
    """Greedy token-budget selection: exact agreement with the
    single-ordered-walk reference, partitioning-invariant, prefix
    property (keep set is a prefix of the quality order), edge cases."""
    import pytest as _pytest

    from gluestick_ts_spark.functions.sampling import select_token_budget

    rows = [(i, (i * 37 % 100) / 100.0, 10 + i % 5) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, q double, toks long")
    out = {r.doc_id: (r.cum_tokens, r.budget_keep)
           for r in select_token_budget(df, 500, "q", "toks").collect()}
    order = sorted(rows, key=lambda r: (-r[1], r[0]))
    cum = 0
    expect = {}
    for i, _, t in order:
        cum += t
        expect[i] = (cum, cum <= 500)
    assert out == expect
    kept = [i for i, (_, k) in out.items() if k]
    # prefix property: every kept doc outranks every dropped doc
    rank = {i: n for n, (i, _, _) in enumerate(order)}
    assert max(rank[i] for i in kept) < min(
        rank[i] for i in out if i not in kept
    )
    # partitioning invariance
    out13 = {r.doc_id: (r.cum_tokens, r.budget_keep)
             for r in select_token_budget(
                 df.repartition(13), 500, "q", "toks").collect()}
    assert out13 == out
    # budget 0 keeps nothing; budget >= total keeps everything
    none = select_token_budget(df, 0, "q", "toks").where("budget_keep")
    assert none.count() == 0
    total = sum(t for _, _, t in rows)
    alls = select_token_budget(df, total, "q", "toks").where("budget_keep")
    assert alls.count() == 200
    with _pytest.raises(ValueError):
        select_token_budget(df, -1, "q", "toks")
    # budget=None rejects with the contract up front, not an opaque
    # int(None) TypeError deep in the plan build
    with _pytest.raises(ValueError, match="got None"):
        select_token_budget(df, None, "q", "toks")


def test_select_token_budget_per_group(spark):
    """group_col mode: independent greedy selection per group with
    per-group dict budgets; exact agreement with per-group ordered
    walks; missing groups fall to default_budget; NULL group is its
    own group."""
    from gluestick_ts_spark.functions.sampling import select_token_budget

    rows = []
    for i in range(300):
        lang = ["en", "de", None][i % 3]
        rows.append((i, lang, (i * 53 % 97) / 100.0, 20 + i % 9))
    df = spark.createDataFrame(rows, "doc_id long, lang string, q double, toks long")
    budgets = {"en": 1000, "de": 400}
    out = {r.doc_id: (r.cum_tokens, r.budget_keep)
           for r in select_token_budget(
               df.repartition(9), budgets, "q", "toks",
               group_col="lang", default_budget=100,
           ).collect()}
    # per-group reference walks
    for lang in ("en", "de", None):
        grp = sorted((r for r in rows if r[1] == lang),
                     key=lambda r: (-r[2], r[0]))
        cum = 0
        cap = budgets.get(lang, 100)
        for i, _, _, t in grp:
            cum += t
            assert out[i] == (cum, cum <= cap), (lang, i, out[i], cum, cap)
    # single-budget mode is the group_col=None special case
    single = select_token_budget(df, 2000, "q", "toks")
    assert single.where("budget_keep").count() > 0
    import pytest as _p

    with _p.raises(ValueError):
        select_token_budget(df, {"en": 10}, "q", "toks")  # dict needs group_col
    with _p.raises(ValueError):
        select_token_budget(df, {"en": -1}, "q", "toks", group_col="lang")
