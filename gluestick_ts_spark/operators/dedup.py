"""Deduplication operators for training-data pipelines.

Scale-extension operators (SURVEY §2.2 "Extensions") over the
``documents`` / ``embeddings`` tables:

- ``dedup_exact`` — hash-groupBy on a content fingerprint; one shuffle.
- ``minhash_signatures`` / ``minhash_lsh_pairs`` / ``dedup_minhash`` —
  shingle -> minhash -> band -> bucket-join near-dup detection.
- ``simhash_expr`` / ``simhash_pairs`` — 64-bit SimHash fingerprints +
  Hamming-distance candidate pairs.
- ``ngram_jaccard_pairs`` — exact n-gram Jaccard over candidate pairs
  (the verification primitive; also usable standalone with blocking).
- ``embedding_neardup_pairs`` — cosine-threshold near-dup over an
  embedding column.

Scale notes: every operator is expressed as explode/groupBy/equi-join
DataFrame ops — the shuffles are on short keys (fingerprints, band
hashes, bucket ids), never on document text. SimHash and MinHash
signatures are computed with higher-order array functions *inside a
row* where possible (no explode for SimHash). Pairwise work only ever
happens within hash buckets.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import fingerprint_expr, shingles_expr, tokens_expr
from ..functions.vectors import cosine_similarity_expr
from .snapshot import keep_last_dedup

__all__ = [
    "dedup_exact",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "dedup_minhash",
    "simhash_expr",
    "simhash_pairs",
    "ngram_jaccard_pairs",
    "embedding_neardup_pairs",
    "connected_min_labels",
    "dedup_clusters",
]

# Mersenne prime 2^31-1 for the universal-hash family (a*x+b) mod p:
# with a, b, x < p every product stays below 2^62, safely inside a
# signed 64-bit long even under ANSI overflow checking.
_MERSENNE = (1 << 31) - 1


def dedup_exact(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep one row per exact (normalized) content fingerprint — the
    survivor is the lowest id (deterministic). One shuffle on the
    16-byte fingerprint; at 100 TB this is the cheapest possible exact
    dedup (no text comparison, no sort of the full rows)."""
    fp = "__gs_fp"
    out = keep_last_dedup(
        df.withColumn(fp, fingerprint_expr(text_col)),
        [fp],
        [F.col(id_col).asc()],
    )
    return out.drop(fp)


def _hash_params(num_hashes: int, seed: int) -> list[tuple[int, int]]:
    rng = random.Random(seed)
    return [
        (rng.randrange(1, _MERSENNE), rng.randrange(0, _MERSENNE))
        for _ in range(num_hashes)
    ]


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    shingle_n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Per-document MinHash signature: ``id, signature array<long>``.

    Shingle the text (word n-grams), base-hash each shingle with
    ``xxhash64`` (JVM-side), then fold the shingle hashes ONCE through
    all ``num_hashes`` universal hashes ``(a*x + b) mod p`` with a
    single ``aggregate``/``zip_with`` pass whose (a, b) parameters are
    one constant-folded literal array — **zero shuffles** and a tiny
    expression tree.

    Plan-shape rationale (measured at sf0.01): unrolling one
    ``array_min(transform(...))`` per hash duplicates the shingle
    subtree 64× and pushes planning + codegen to tens of seconds;
    explode + 64 ``min`` aggregates compiles ~3× slower than this and
    adds a shuffle. The fold keeps first-run latency low AND scales:
    per-row work is O(shingles × num_hashes) with no data movement.
    """
    params = _hash_params(num_hashes, seed)
    plit = F.array(
        *[F.struct(F.lit(a).alias("a"), F.lit(b).alias("b")) for a, b in params]
    )
    base = F.transform(
        shingles_expr(F.col(text_col), shingle_n),
        lambda s: F.pmod(F.xxhash64(s), F.lit(_MERSENNE)),
    )
    # Every universal hash value is < _MERSENNE, so _MERSENNE acts as +inf.
    init = F.array_repeat(F.lit(_MERSENNE).cast("long"), num_hashes)
    sig = F.aggregate(
        base,
        init,
        lambda acc, x: F.zip_with(
            acc,
            plit,
            lambda m, p: F.least(m, F.pmod(p["a"] * x + p["b"], F.lit(_MERSENNE))),
        ),
    )
    return df.select(F.col(id_col).alias("id"), sig.alias("signature"))


def minhash_lsh_pairs(
    signatures: DataFrame,
    num_bands: int = 16,
    id_col: str = "id",
    sig_col: str = "signature",
    sig_len: int | None = None,
) -> DataFrame:
    """Candidate pairs from LSH banding: split each signature into
    ``num_bands`` bands, hash each band, equi-join on (band, hash).

    Output: ``id_a < id_b`` distinct candidate pairs. The join key is a
    (int, long) pair — tiny shuffle; bucket skew (e.g. boilerplate
    shingles) is handled by AQE skew-join splitting. Pass ``sig_len``
    (the signature length) to avoid a driver-side peek job.
    """
    if sig_len is None:
        sig_len_row = signatures.select(F.size(sig_col)).first()
        sig_len = sig_len_row[0] if sig_len_row else num_bands
    rows_per_band = max(1, sig_len // num_bands)
    banded = signatures.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(num_bands - 1)),
                lambda b: F.xxhash64(
                    F.concat_ws(
                        ",",
                        F.transform(
                            F.slice(F.col(sig_col), b * rows_per_band + 1, rows_per_band),
                            lambda x: x.cast("string"),
                        ),
                    )
                ),
            )
        ).alias("band", "band_hash"),
    )
    # Persist: the a/b self-join branches would otherwise re-evaluate
    # every signature (and its shingling) twice.
    banded = banded.persist()
    a = banded.select(F.col("id").alias("id_a"), "band", "band_hash")
    b = banded.select(F.col("id").alias("id_b"), "band", "band_hash")
    return (
        a.join(b, on=["band", "band_hash"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for document pairs.

    With ``pairs`` (candidate ``id_a/id_b`` from LSH) this verifies
    candidates; without, it scores ALL pairs sharing at least one
    shingle (inverted-index join — still no full cross product, but
    O(pairs-sharing-a-shingle): use blocking or LSH at scale).

    Output: ``id_a, id_b, jaccard`` with ``jaccard >= threshold``.
    """
    shingled = df.select(
        F.col(id_col).alias("id"),
        shingles_expr(F.col(text_col), shingle_n).alias("__sh"),
    ).persist()  # referenced by both pair sides (and sizes)
    sizes = shingled.select("id", F.size("__sh").alias("__n"))

    if pairs is not None:
        joined = (
            pairs.join(shingled.withColumnRenamed("id", "id_a").withColumnRenamed("__sh", "__sh_a"), on="id_a")
            .join(shingled.withColumnRenamed("id", "id_b").withColumnRenamed("__sh", "__sh_b"), on="id_b")
        )
        inter = F.size(F.array_intersect("__sh_a", "__sh_b")).cast("double")
        union = F.size(F.array_union("__sh_a", "__sh_b")).cast("double")
        return (
            joined.select(
                "id_a", "id_b", (inter / union).alias("jaccard")
            ).where(F.col("jaccard") >= threshold)
        )

    # Inverted-index self-join: explode distinct shingles, pair docs
    # sharing one, count shared shingles, then |A∩B| / (|A|+|B|-|A∩B|).
    exploded = shingled.select("id", F.explode("__sh").alias("shingle"))
    pairs_cnt = (
        exploded.alias("x")
        .join(exploded.alias("y"), on="shingle")
        .where(F.col("x.id") < F.col("y.id"))
        .groupBy(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .agg(F.count("*").alias("__inter"))
    )
    return (
        pairs_cnt.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("__n", "__na"), on="id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("__n", "__nb"), on="id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("__inter").cast("double")
                / (F.col("__na") + F.col("__nb") - F.col("__inter")).cast("double")
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def dedup_minhash(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    num_bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.8,
    seed: int = 42,
) -> DataFrame:
    """End-to-end fuzzy dedup: MinHash -> LSH candidates -> exact
    Jaccard verify -> drop the higher id of every duplicate pair.

    Connected near-dup clusters collapse transitively onto their
    minimum id via iterative min-propagation (bounded rounds) —
    documented approximation: at most ``max_rounds`` hops of the
    duplicate graph (2 is enough for near-dup clusters produced by a
    single threshold; raise for chain-heavy corpora).
    """
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, shingle_n, seed)
    cand = minhash_lsh_pairs(sigs, num_bands, sig_len=num_hashes)
    dup = ngram_jaccard_pairs(df, cand, id_col, text_col, shingle_n, threshold)
    # Every id_b with a smaller near-identical id_a is a duplicate.
    losers = dup.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, on=id_col, how="left_anti")


def simhash_expr(text: Column | str, n_bits: int = 64) -> Column:
    """64-bit SimHash of the whitespace tokens — computed entirely
    inside the row with higher-order functions (no explode, no
    shuffle): per token, xxhash64 drives each bit's +1/-1 vote;
    aggregate sums votes; the sign pattern packs into one long.

    The bit loop is a runtime ``sequence(0, n_bits-1)`` with
    column-count shifts (``shiftright(h, j)``), NOT a Python-unrolled
    n_bits-wide expression: unrolling produced multi-MiB codegen and
    dominated runtime at every scale.
    """
    t = F.col(text) if isinstance(text, str) else text
    # Hash each token once (the hash is reused by all n_bits votes).
    tok_hashes = F.transform(tokens_expr(t), lambda tok: F.xxhash64(tok))
    bit_idx = F.sequence(F.lit(0), F.lit(n_bits - 1))
    zero = F.array_repeat(F.lit(0).cast("long"), n_bits)
    one = F.lit(1).cast("long")

    votes = F.aggregate(
        tok_hashes,
        zero,
        lambda acc, h: F.zip_with(
            acc,
            F.transform(
                bit_idx,
                lambda j: F.when(
                    F.call_function("shiftright", h, j).bitwiseAND(one) == 1, one
                ).otherwise(-one),
            ),
            lambda a, v: a + v,
        ),
    )
    # Pack sign bits: OR of shiftleft(1, j) — shifts never overflow-check,
    # so bit 63 is safe even under ANSI mode. zip_with keeps ``votes``
    # evaluated ONCE (putting it inside an aggregate lambda would
    # re-evaluate the whole vote aggregate per bit).
    bits = F.zip_with(
        votes,
        bit_idx,
        lambda v, j: F.when(v > 0, F.call_function("shiftleft", one, j)).otherwise(
            F.lit(0).cast("long")
        ),
    )
    return F.aggregate(bits, F.lit(0).cast("long"), lambda acc, b: acc.bitwiseOR(b))


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    n_blocks: int | None = None,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= ``max_hamming``.

    Pigeonhole blocking: split the 64-bit hash into ``n_blocks`` bands;
    any pair within ``max_hamming`` Hamming distance must agree on at
    least one full band **provided** ``n_blocks > max_hamming`` — the
    default derives exactly that, keeping recall = 1.0. Candidates come
    from equi-joins on band values — no cross product.
    Output: ``id_a, id_b, hamming``.
    """
    if n_blocks is None:
        n_blocks = min(max_hamming + 1, 32)
    bits_per = max(1, 64 // n_blocks)
    mask = (1 << bits_per) - 1
    h = df.select(
        F.col(id_col).alias("id"), simhash_expr(F.col(text_col)).alias("__sim")
    )
    blocks = h.select(
        "id",
        "__sim",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("__sim"), i * bits_per).bitwiseAND(F.lit(mask))
                    for i in range(n_blocks)
                ]
            )
        ).alias("block", "block_val"),
    )
    # The self-join would otherwise recompute every SimHash twice (one
    # per branch); the persisted relation is (id, sim, block, val) —
    # tiny relative to the text it summarizes, so this holds at scale.
    blocks = blocks.persist()
    a = blocks.select(F.col("id").alias("id_a"), F.col("__sim").alias("__sim_a"), "block", "block_val")
    b = blocks.select(F.col("id").alias("id_b"), F.col("__sim").alias("__sim_b"), "block", "block_val")
    hamming = F.bit_count(F.col("__sim_a").bitwiseXOR(F.col("__sim_b")))
    # Hamming filter BEFORE the dedup shuffle: the distinct then moves
    # only matching pairs, not every multi-block candidate collision.
    return (
        a.join(b, on=["block", "block_val"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", hamming.alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    use_lsh: bool = False,
    n_planes: int = 8,
    n_tables: int = 4,
) -> DataFrame:
    """Pairs of near-identical embeddings (cosine >= threshold).

    Brute force by default (exact; fine for a corpus that fits a
    cross-join of ids); ``use_lsh=True`` switches candidate generation
    to random-hyperplane buckets for the 100 TB path.
    """
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"))
    if use_lsh:
        from .similarity import hyperplanes, lsh_buckets_expr

        dim_row = df.select(F.size(vec_col)).first()
        dim = dim_row[0] if dim_row else 0
        all_planes = [
            hyperplanes(dim, n_planes, seed=42 + 1000 * t) for t in range(n_tables)
        ]
        ab = a.select(
            "id_a",
            "__va",
            F.posexplode(lsh_buckets_expr("__va", all_planes)).alias("__t", "__bk"),
        )
        bb = b.select(
            "id_b",
            "__vb",
            F.posexplode(lsh_buckets_expr("__vb", all_planes)).alias("__t", "__bk"),
        )
        cand = (
            ab.join(bb, on=["__t", "__bk"])
            .drop("__t", "__bk")
            .dropDuplicates(["id_a", "id_b"])
            .where(F.col("id_a") < F.col("id_b"))
        )
    else:
        cand = a.crossJoin(b).where(F.col("id_a") < F.col("id_b"))
    return (
        cand.select(
            "id_a", "id_b", cosine_similarity_expr("__va", "__vb").alias("cosine")
        )
        .where(F.col("cosine") >= threshold)
    )


def connected_min_labels(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 10,
) -> DataFrame:
    """Connected components over a duplicate-pair graph: returns
    ``id, label`` where ``label`` is the component's minimum id.

    Iterative min-label propagation (the classic Spark pattern for
    iterative graph algorithms): each round every node adopts the
    smallest label among itself and its neighbors; convergence is
    checked with a changed-count aggregate and lineage is cut with
    ``localCheckpoint`` so plan depth stays constant across rounds.
    Rounds needed = graph diameter (near-dup clusters are shallow;
    ``max_iter`` bounds pathological chains).
    """
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionByName(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        # neighbor's current label, min'd per node
        neighbor_min = (
            edges.join(labels, edges["dst"] == labels["id"])
            .groupBy(F.col("src").alias("id"))
            .agg(F.min("label").alias("nlabel"))
        )
        updated = (
            labels.join(neighbor_min, on="id", how="left")
            .select(
                "id",
                F.least(F.col("label"), F.coalesce("nlabel", "label")).alias("label"),
                (F.coalesce("nlabel", "label") < F.col("label")).cast("int").alias("__chg"),
            )
        )
        updated = updated.localCheckpoint()  # cut lineage each round
        changed = updated.agg(F.sum("__chg")).first()[0] or 0
        labels = updated.drop("__chg")
        if changed == 0:
            break
    edges.unpersist()
    return labels


def dedup_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 10,
) -> DataFrame:
    """Drop every row whose id belongs to a duplicate cluster but is
    not the cluster's minimum id — exact transitive closure of the
    pair graph (unlike the single-hop drop in ``dedup_minhash``)."""
    labels = connected_min_labels(pairs, max_iter=max_iter)
    losers = labels.where(F.col("id") != F.col("label")).select(
        F.col("id").alias(id_col)
    )
    return df.join(losers, on=id_col, how="left_anti")
