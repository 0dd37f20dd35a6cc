"""Similarity search over embedding columns.

Scale-extension operators (SURVEY §2.2 "Extensions"):

- ``cosine_topk`` — brute-force exact top-k: broadcast the (small)
  query set against the corpus, one pass, no shuffle on the corpus
  side. The baseline every ANN variant is measured against.
- ``ann_lsh_topk`` — random-hyperplane LSH: sign-bit signatures bucket
  the corpus; candidates come from an equi-join on bucket id (shuffle
  on a short key instead of a cross join), then exact re-ranking.
  The 100 TB path: candidate generation touches only hash buckets.
- ``ann_ivf_topk`` — IVF-style: corpus assigned to nearest of m
  deterministic seed centroids; queries probe ``n_probe`` nearest
  centroids only.

Design for scale: the corpus is never collected; hyperplanes/centroids
are tiny literal arrays (broadcast by Catalyst); candidate joins are
equi-joins Catalyst can plan as broadcast or shuffled-hash; exact
re-rank windows only over per-query candidate sets.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine_similarity_expr, dot_expr

__all__ = [
    "cosine_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "hyperplanes",
    "lsh_bucket_expr",
    "lsh_buckets_expr",
]


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
    query_vec_col: str | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    Output: ``query_id, neighbor_id, cosine (double), rank`` — rank is
    deterministic (cosine desc, neighbor id asc tie-break).

    The query side is broadcast: the corpus streams through one
    projection + per-query window. Self-matches (same id) are excluded
    when both sides share the id space.
    """
    qid = query_id_col or id_col
    qvec = query_vec_col or vec_col
    q = queries.select(
        F.col(qid).alias("query_id"), F.col(qvec).alias("__qvec")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cvec"))
    joined = c.crossJoin(F.broadcast(q)).where(F.col("neighbor_id") != F.col("query_id"))
    scored = joined.select(
        "query_id",
        "neighbor_id",
        cosine_similarity_expr("__qvec", "__cvec").alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit-free hyperplanes (driver-side
    constants; tiny — ``n_planes x dim`` floats)."""
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def lsh_buckets_expr(
    vec_col: Column | str, all_planes: list[list[list[float]]]
) -> Column:
    """Per-table sign-bit bucket ids as ``array<long>`` (one element per
    table). One fold over a constant-folded literal plane array —
    expression-tree size stays constant in n_tables × n_planes, so
    planning/codegen stays fast (unrolling one dot product per plane
    measurably dominated first-run latency)."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    tables_lit = F.array(
        *[
            F.array(
                *[
                    F.struct(
                        F.array(*[F.lit(float(x)) for x in plane]).alias("plane"),
                        F.lit(1 << i).cast("long").alias("w"),
                    )
                    for i, plane in enumerate(planes)
                ]
            )
            for planes in all_planes
        ]
    )
    zero = F.lit(0).cast("long")
    return F.transform(
        tables_lit,
        lambda planes: F.aggregate(
            planes,
            zero,
            lambda acc, p: acc
            + F.when(
                F.aggregate(
                    F.zip_with(v, p["plane"], lambda x, y: x.cast("double") * y),
                    F.lit(0.0),
                    lambda s, x: s + x,
                )
                >= 0,
                p["w"],
            ).otherwise(zero),
        ),
    )


def lsh_bucket_expr(vec_col: Column | str, planes: list[list[float]]) -> Column:
    """Single-table sign-bit bucket id (long)."""
    return F.element_at(lsh_buckets_expr(vec_col, [planes]), 1)


def ann_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 4,
    n_tables: int = 8,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k via multi-table random-hyperplane LSH.

    Each of ``n_tables`` independent plane sets maps every vector to a
    bucket; query/corpus pairs colliding in ANY table become
    candidates (union + distinct), then exact cosine re-ranks them.
    Recall grows with n_tables; candidate cost with n_planes^-1.
    Tuning: per-table neighbor collision is ~(1 - θ/π)^n_planes, so a
    few planes + many tables beats the reverse — 4×8 defaults measure
    recall@5 ≈ 0.7-0.75 on 64-dim embeddings, vs 0.33 for 6×4.
    """
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    all_planes = [
        hyperplanes(dim, n_planes, seed=seed + 1000 * t) for t in range(n_tables)
    ]
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cvec"))
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qvec"))

    # All tables in ONE posexplode + ONE equi-join on (table, bucket) —
    # not n_tables joins + union: same candidate set, 1/n_tables the
    # planning and shuffle stages. Vectors are NOT carried through the
    # bucket join/dedup (they'd be replicated n_tables× through two
    # shuffles); the deduped id pairs re-join them once.
    c_b = c.select(
        "neighbor_id",
        F.posexplode(lsh_buckets_expr("__cvec", all_planes)).alias(
            "__table", "__bucket"
        ),
    )
    q_b = q.select(
        "query_id",
        F.posexplode(lsh_buckets_expr("__qvec", all_planes)).alias(
            "__table", "__bucket"
        ),
    )
    cand_ids = (
        q_b.join(c_b, on=["__table", "__bucket"])
        .select("query_id", "neighbor_id")
        .dropDuplicates(["query_id", "neighbor_id"])
        .where(F.col("query_id") != F.col("neighbor_id"))
    )
    candidates = cand_ids.join(c, on="neighbor_id").join(
        F.broadcast(q), on="query_id"
    )

    scored = candidates.select(
        "query_id",
        "neighbor_id",
        cosine_similarity_expr("__qvec", "__cvec").alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def ann_ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """IVF-style ANN: deterministic sample of ``n_centroids`` corpus
    vectors act as centroids; every corpus vector joins its nearest
    centroid's inverted list; queries probe the ``n_probe`` nearest
    lists and re-rank exactly.

    At 100 TB the inverted lists would be written bucketed-by-centroid
    so probe queries prune partitions; here the centroid assignment is
    one broadcast join either way.
    """
    # Deterministic "training": the first n_centroids corpus rows by id
    # serve as centroids (their own id is the centroid id).
    cents = (
        corpus.orderBy(F.col(id_col))
        .limit(n_centroids)
        .select(
            F.col(id_col).alias("__cid"),
            F.col(vec_col).alias("__cent"),
        )
        # n_centroids rows, consumed by BOTH the corpus-assignment and
        # the query-probe branches — persist to avoid two top-k scans
        # of the full corpus.
        .persist()
    )

    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cvec"))
    c_scored = c.crossJoin(F.broadcast(cents)).withColumn(
        "__csim", cosine_similarity_expr("__cvec", "__cent")
    )
    w_c = Window.partitionBy("neighbor_id").orderBy(F.col("__csim").desc(), F.col("__cid").asc())
    c_assigned = (
        c_scored.withColumn("__r", F.row_number().over(w_c))
        .where(F.col("__r") == 1)
        .select("neighbor_id", "__cvec", "__cid")
    )

    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qvec"))
    q_scored = q.crossJoin(F.broadcast(cents)).withColumn(
        "__csim", cosine_similarity_expr("__qvec", "__cent")
    )
    w_q = Window.partitionBy("query_id").orderBy(F.col("__csim").desc(), F.col("__cid").asc())
    q_probes = (
        q_scored.withColumn("__r", F.row_number().over(w_q))
        .where(F.col("__r") <= n_probe)
        .select("query_id", "__qvec", "__cid")
    )

    candidates = q_probes.join(c_assigned, on="__cid").where(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = candidates.select(
        "query_id",
        "neighbor_id",
        cosine_similarity_expr("__qvec", "__cvec").alias("cosine"),
    ).dropDuplicates(["query_id", "neighbor_id"])
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
