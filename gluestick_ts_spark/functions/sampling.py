"""Deterministic, engine-portable sampling and dataset splitting.

Training-data pipelines need REPRODUCIBLE sampling: the same row must
land in the same split on every run, every engine, every partition
layout. Spark's ``df.sample`` is seed-stable only for a fixed
partitioning, and its ``xxhash64`` doesn't exist in other engines — so
these helpers derive buckets from ``md5(key)``, which is identical
everywhere (verified against the DuckDB oracle).

The bucket is built from the first two hex digits via ``instr`` over
the hex alphabet — pure column arithmetic, no UDF, no RNG:

    bucket = 16 * pos(hex[0]) + pos(hex[1])        # 0..255

``hash_sample`` keeps a fraction; ``hash_split`` assigns disjoint
named splits with exact bucket boundaries (fractions are quantized to
1/256 — document the granularity, don't hide it).
"""

from __future__ import annotations

import json

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "md5_bucket_expr",
    "hash_sample",
    "hash_split",
    "weighted_domain_sample",
    "select_token_budget",
    "stratified_hash_sample_expr",
    "domain_shares",
    "temperature_rates",
    "epoch_shuffle_expr",
    "epoch_shard_expr",
    "write_training_shards",
]

_HEX = "0123456789abcdef"
N_BUCKETS = 256


def _md5_nibble_value(h: Column, n_digits: int) -> Column:
    """Integer in [0, 16^n_digits) from the first ``n_digits`` hex
    digits of an md5 string — the one place the engine-portable
    ``instr``-over-hex-alphabet decoding lives (both the 2-digit
    sampling bucket and the 4-digit epoch shard build on it)."""
    v = None
    for i in range(1, n_digits + 1):
        nib = F.instr(F.lit(_HEX), F.substring(h, i, 1)) - 1
        v = nib if v is None else v * 16 + nib
    return v


def md5_bucket_expr(key: Column | str) -> Column:
    """Deterministic bucket in [0, 256) from ``md5(cast(key as
    string))`` — identical in any engine with md5."""
    k = F.col(key) if isinstance(key, str) else key
    return _md5_nibble_value(F.md5(k.cast("string")), 2).cast("int")


def hash_sample(df: DataFrame, key: str, fraction: float) -> DataFrame:
    """Keep ~``fraction`` of rows, deterministically by key. Fraction
    is quantized to k/256; the SAME keys are kept on every run and
    engine (unlike ``df.sample``)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    cutoff = round(fraction * N_BUCKETS)
    return df.where(md5_bucket_expr(key) < F.lit(cutoff))


def weighted_domain_sample(
    df: DataFrame,
    key: str,
    domain_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "wds",
    prefix: str = "wds",
) -> DataFrame:
    """Data-mixture downsampling (the DoReMi / Pile-construction
    re-weighting primitive): keep each row with its DOMAIN's rate,
    decided deterministically by ``md5(salt || key)`` bucket — so a
    mixture re-run keeps exactly the same rows, and a different
    ``salt`` gives an independent decision from ``hash_split`` (the
    train/val/test assignment and the mixture draw must not correlate:
    with the same hash, a 10%-rate domain would sample entirely from
    the train split's low buckets).

    Adds three columns (names prefixed by ``prefix``):
    ``_bucket`` (0..255), ``_rate`` (the domain's quantized k/256
    rate), ``_keep`` (bucket < rate*256). Rates are quantized to 1/256
    like every sampler here — stated granularity beats hidden bias.
    Unknown domains fall to ``default_rate``. Map-only: the rate map
    is a literal CASE chain, nothing shuffles or broadcasts.
    """
    for d, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for {d!r} must be in [0, 1], got {r}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate must be in [0, 1], got {default_rate}")
    k = F.concat_ws("|", F.lit(salt), F.col(key).cast("string"))
    bucket = md5_bucket_expr(k)
    chain = None
    for d, r in rates.items():
        cond = F.col(domain_col) == F.lit(d)
        cut = F.lit(round(r * N_BUCKETS))
        chain = F.when(cond, cut) if chain is None else chain.when(cond, cut)
    cutoff = (
        chain.otherwise(F.lit(round(default_rate * N_BUCKETS)))
        if chain is not None
        else F.lit(round(default_rate * N_BUCKETS))
    )
    return (
        df.withColumn(f"{prefix}_bucket", bucket)
        .withColumn(f"{prefix}_rate", cutoff.cast("int"))
        .withColumn(f"{prefix}_keep", bucket < cutoff)
    )


def stratified_hash_sample_expr(
    key: Column | str,
    stratum_col: Column | str,
    n_per_stratum: int,
    salt: str = "strat",
):
    """Deterministic exact-N-per-stratum sample membership (eval-set
    construction: "16 documents per language, the same 16 forever"):
    rank rows within each stratum by ``md5(salt || key)`` — a fixed
    pseudo-random order — and keep the first ``n_per_stratum``.
    Returns ``(rank_col, keep_col)`` expressions built on a window;
    deterministic across runs/engines/partitionings because md5 of
    distinct keys is collision-free in practice and the hex string
    orders identically everywhere. One shuffle on the stratum key; at
    100 TB prefer rate-based ``weighted_domain_sample`` unless the
    exact-N contract is required (the window sorts each stratum)."""
    from pyspark.sql import Window

    k = F.col(key) if isinstance(key, str) else key
    s = F.col(stratum_col) if isinstance(stratum_col, str) else stratum_col
    h = F.md5(F.concat_ws("|", F.lit(salt), k.cast("string")))
    w = Window.partitionBy(s).orderBy(h.asc())
    rank = F.row_number().over(w).cast("long")
    return rank, rank <= int(n_per_stratum)


def hash_split(
    df: DataFrame, key: str, splits: dict[str, float], split_col: str = "split"
) -> DataFrame:
    """Assign each row a named split (e.g. train/val/test) by key
    bucket. Weights are normalized then quantized to 1/256 boundaries;
    assignment is total (every bucket belongs to exactly one split,
    the last split absorbs rounding)."""
    if not splits:
        raise ValueError("splits must be non-empty")
    total = sum(splits.values())
    names = list(splits)
    bounds: list[int] = []
    acc = 0.0
    for name in names[:-1]:
        acc += splits[name] / total
        bounds.append(round(acc * N_BUCKETS))
    bucket = md5_bucket_expr(key)
    # when-chain on ascending bounds: the first true condition wins.
    chain = None
    for name, bound in zip(names[:-1], bounds):
        cond = bucket < F.lit(bound)
        chain = F.when(cond, F.lit(name)) if chain is None else chain.when(cond, F.lit(name))
    assigned = chain.otherwise(F.lit(names[-1])) if chain is not None else F.lit(names[-1])
    return df.withColumn(split_col, assigned)


def epoch_shuffle_expr(key: Column | str, seed: int | str) -> Column:
    """The deterministic training-epoch shuffle order: ``md5(seed ':'
    key)`` as a sortable hex string. Ordering rows by it is a
    reproducible pseudo-random permutation of the corpus — the same
    permutation on every run, engine, and partition layout — and a
    different ``seed`` is a FRESH permutation (the per-epoch reshuffle
    training loops need, without materializing shuffled copies).

    Contract: ``key`` must be a NON-NULL unique id — distinct keys get
    distinct hashes, making the order total. ``concat`` (not
    ``concat_ws``, which SKIPS nulls) propagates a NULL key to a NULL
    hash, so null-keyed rows surface as NULLs at the sort/shard stage
    instead of silently colliding at md5('<seed>:')'s position (and
    ``epoch_shard_expr`` would have inherited that collision)."""
    k = F.col(key) if isinstance(key, str) else key
    return F.md5(F.concat(F.lit(f"{seed}:"), k.cast("string")))


def epoch_shard_expr(
    key: Column | str, seed: int | str, n_shards: int
) -> Column:
    """Deterministic shard id in [0, n_shards) from the first four hex
    digits of the epoch hash (a 0..65535 draw, mod n_shards — the mod
    bias is <= 1/65536 per shard). Same engine-portable ``instr``
    arithmetic as ``md5_bucket_expr``; shards are a PARTITION of the
    epoch order, so (shard, within-shard hash order) is the global
    permutation cut into n_shards independent streams."""
    if not 1 <= int(n_shards) <= 65536:
        raise ValueError(f"n_shards must be in [1, 65536], got {n_shards}")
    v = _md5_nibble_value(epoch_shuffle_expr(key, seed), 4)
    return (v % int(n_shards)).cast("int")


def write_training_shards(
    df: DataFrame,
    path: str,
    key: str,
    seed: int | str,
    n_shards: int,
) -> dict:
    """Materialize one deterministically-shuffled training epoch as
    ``shard=<i>/`` parquet directories: rows are assigned to shards by
    ``epoch_shard_expr`` and written in within-shard epoch-hash order,
    so a reader streaming shard files start-to-finish consumes the
    global permutation for this seed. Re-running with the same seed
    reproduces the identical layout; a new seed is a fresh epoch.

    Scale shape: ONE hash-partitioned exchange on the shard id (every
    shard's rows land in exactly one task, so each shard directory is
    written as one contiguous sorted run) + a task-local sort — no
    global sort, no driver collect. Returns the layout manifest
    ``{key, seed, n_shards, total_rows, shard_rows}`` and writes it to
    ``<path>/_manifest.json`` — the row counts come from the WRITTEN
    parquet footers (one metadata-only read-back, n_shards count rows
    to the driver), so a training loop can detect truncated or
    partially-written epochs before consuming them."""
    import json

    from ..sources.fs import join_uri, write_text_file

    spark = df.sparkSession
    shuffled = (
        df.withColumn("__gs_shard", epoch_shard_expr(key, seed, n_shards))
        .withColumn("__gs_h", epoch_shuffle_expr(key, seed))
        .repartition(int(n_shards), F.col("__gs_shard"))
        .sortWithinPartitions("__gs_shard", "__gs_h")
        .drop("__gs_h")
        .withColumnRenamed("__gs_shard", "shard")
    )
    shuffled.write.partitionBy("shard").mode("overwrite").parquet(path)
    counts = {
        int(r["shard"]): r["cnt"]
        for r in spark.read.parquet(path)
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    manifest = {
        "key": key,
        "seed": str(seed),
        "n_shards": int(n_shards),
        "total_rows": int(sum(counts.values())),
        "shard_rows": {str(s): int(c) for s, c in sorted(counts.items())},
    }
    write_text_file(spark, join_uri(path, "_manifest.json"), json.dumps(manifest))
    return manifest


def select_token_budget(
    df: DataFrame,
    budget: int | dict,
    score_col: str,
    token_col: str,
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    cum_col: str = "cum_tokens",
    keep_col: str = "budget_keep",
    group_col: str | None = None,
    default_budget: int = 0,
) -> DataFrame:
    """Greedy token-budget corpus selection: walk documents in
    (``score_col`` DESC, ``id_col`` ASC) order and keep every document
    whose RUNNING token total (inclusive) stays within ``budget`` —
    "assemble the best corpus that fits the training budget", the
    selection step after scoring/dedup in a data pipeline. Appends
    ``cum_col`` (the document's inclusive running total under that
    global order) and ``keep_col``.

    Greedy-prefix semantics (documented): the cut is a PREFIX of the
    quality order — the first document that overflows the budget stops
    the intake for every lower-scored document too (no knapsack
    backfilling with smaller docs; the prefix rule is what keeps the
    selection a pure function of the order).

    100 TB shape — this is a GLOBAL running sum, and the naive
    ``SUM() OVER (ORDER BY score)`` compiles to a single-partition
    window. Instead: documents land in deterministic fixed-width score
    buckets (``floor(score * n_buckets)`` — NOT sampled range
    boundaries, so the assignment is reproducible across runs and
    engines), ONE short aggregate computes per-bucket token sums,
    the driver prefix-sums the <= ``n_buckets`` rows into per-bucket
    offsets (bounded collect), and one bucket-keyed window adds the
    in-bucket running sum to the broadcast offset. Two passes, no
    global sort, skew bounded by the score distribution per 1/1024
    score slice. Scores are assumed in [0, 1] (quality scores;
    out-of-range scores clamp into the edge buckets — documented).

    ``group_col`` runs an INDEPENDENT selection per group (the
    "N tokens per language" data-mixing contract): ``budget`` may then
    be a ``{group: budget}`` dict (missing groups fall to
    ``default_budget``; a NULL group value is its own group); the
    driver prefix covers <= |groups| x n_buckets rows and the window
    partitions by (group, bucket) — the same two-pass shape.
    """
    if budget is None:
        # fail here with the contract, not later as F.lit(int(None))
        raise ValueError("budget must be an int or a {group: int} dict, got None")
    if group_col is None and isinstance(budget, dict):
        raise ValueError("a budget dict requires group_col")
    if not isinstance(budget, dict) and int(budget) < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    s = F.col(score_col).cast("double")
    bucket = F.least(
        F.lit(int(n_buckets) - 1),
        F.greatest(F.lit(0), F.floor(s * int(n_buckets)).cast("int")),
    )
    toks = F.coalesce(F.col(token_col).cast("long"), F.lit(0))
    # group key '' = "no group" in single-budget mode; a NULL group
    # value is its own group (keyed by a sentinel)
    grp = (
        F.coalesce(F.col(group_col).cast("string"), F.lit("\x00null"))
        if group_col
        else F.lit("")
    )
    bucketed = df.withColumn("__tb_bucket", bucket).withColumn("__tb_grp", grp)
    # NULL-safety: a NULL token count contributes 0 (it costs no
    # budget); a NULL score clamps into bucket 0 (greatest() skips
    # NULLs) and sorts LAST within it under DESC — the worst-quality
    # position, never a crash
    sums: dict[tuple[str, int], int] = {
        (r["__tb_grp"], int(r["__tb_bucket"])): int(r["toks"])
        for r in bucketed.groupBy("__tb_grp", "__tb_bucket")
        .agg(F.sum(toks).alias("toks"))
        .collect()
    }
    # higher bucket = higher score = consumed first, independently
    # per group (driver prefix over <= |groups| x n_buckets rows)
    offsets: dict[str, dict[str, int]] = {}
    for g in {g for g, _ in sums}:
        running = 0
        goff: dict[str, int] = {}
        for b in sorted((b for gg, b in sums if gg == g), reverse=True):
            goff[str(b)] = running
            running += sums[(g, b)]
        offsets[g] = goff
    off_expr = F.element_at(
        F.element_at(
            F.from_json(
                F.lit(json.dumps(offsets)),
                "map<string, map<string, bigint>>",
            ),
            F.col("__tb_grp"),
        ),
        F.col("__tb_bucket").cast("string"),
    )
    w = (
        Window.partitionBy("__tb_grp", "__tb_bucket")
        .orderBy(s.desc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = bucketed.withColumn(
        cum_col,
        (F.sum(toks).over(w) + off_expr).cast("long"),
    )
    if isinstance(budget, dict):
        for g, v in budget.items():
            if int(v) < 0:
                raise ValueError(f"budget for {g!r} must be >= 0, got {v}")
        budget_expr = F.coalesce(
            F.element_at(
                F.from_json(
                    F.lit(json.dumps({str(k): int(v) for k, v in budget.items()})),
                    "map<string, bigint>",
                ),
                F.col("__tb_grp"),
            ),
            F.lit(int(default_budget)),
        )
    else:
        budget_expr = F.lit(int(budget))
    return out.withColumn(keep_col, F.col(cum_col) <= budget_expr).drop(
        "__tb_bucket", "__tb_grp"
    )


def domain_shares(df: DataFrame, domain_col: str) -> dict[str, float]:
    """Observed domain mass shares ``{domain: fraction}`` — ONE
    map-side-combined aggregate plus a domain-cardinality driver
    collect (sources × languages, never data-sized). Feed to
    ``temperature_rates``."""
    rows = df.groupBy(domain_col).agg(F.count("*").alias("c")).collect()
    total = sum(r.c for r in rows)
    if total == 0:
        return {}
    return {r[domain_col]: r.c / total for r in rows}


def temperature_rates(
    shares: dict[str, float],
    temperature: float = 2.0,
    max_rate: float = 1.0,
) -> dict[str, float]:
    """Per-domain keep rates realizing TEMPERATURE-SCALED mixture
    sampling (the mBERT/XLM-R multilingual recipe; Conneau et al.
    2020 §3.1): the target mixture gives domain i probability

        q_i = p_i^(1/T) / sum_j p_j^(1/T)

    — T=1 keeps the natural mixture, larger T flattens it toward
    uniform (upweighting rare domains without the pathologies of full
    uniformity). Downsampling can only REMOVE mass, so the rates are
    ``r_i ∝ q_i / p_i`` scaled so the largest equals ``max_rate``:
    the kept corpus then has exactly the q mixture, maximally sized
    under the constraint r_i <= max_rate. Compose with
    ``weighted_domain_sample`` — the rates are plain numbers, so the
    sampling itself stays map-only and deterministic:

        rates = temperature_rates(domain_shares(df, "lang"), T=2)
        mixed = weighted_domain_sample(df, "doc_id", "lang", rates)

    Pure driver-side arithmetic; rate quantization (k/256) happens in
    the sampler, like every sampler here.
    """
    if temperature <= 0:
        raise ValueError(f"temperature must be > 0, got {temperature}")
    if not 0.0 < max_rate <= 1.0:
        raise ValueError(f"max_rate must be in (0, 1], got {max_rate}")
    pos = {d: p for d, p in shares.items() if p > 0}
    if not pos:
        return {}
    alpha = 1.0 / float(temperature)
    z = sum(p**alpha for p in pos.values())
    raw = {d: (p**alpha / z) / p for d, p in pos.items()}
    top = max(raw.values())
    return {d: max_rate * r / top for d, r in raw.items()}
