"""Link-graph curation signals over crawl outlinks — the
domain-authority side of web curation (Common Crawl publishes exactly
this: domain-level webgraph + centrality ranks, used to seed and
weight crawls; quality pipelines use domain rank as a prior the way
they use the quality classifier's score).

- ``domain_link_edges``: page-level outlinks (``wat_links`` /
  ``sitemap_urls_from_warc`` output) collapsed to the eTLD+1 DOMAIN
  graph (``registered_domain_expr`` both sides, self-loops and
  identity-less rows dropped, parallel edges counted) — the grain
  where the graph gets small: a 10^11-page crawl is a ~10^7-domain
  graph, comfortably iterable.
- ``pagerank``: damped PageRank with dangling-mass redistribution,
  run as a fixed number of join+aggregate rounds. Ranks are QUANTIZED
  to an integer 1e-9 grid every round, so the per-node sums are
  exact LONG arithmetic — the result is bit-deterministic under any
  partitioning (the ``operators/classifier.py`` micro-unit protocol,
  applied to graph iteration; plain float PageRank differs run to run
  because shuffle order reorders float adds).

100 TB shape: the page->domain collapse is one short-string shuffle of
the edge list; each PageRank round is one join (ranks are the small
relation once the graph is domain-grain) + one aggregate, with a
checkpoint per round to truncate lineage (the ``dedup_clusters``
iterative precedent). No driver-side graph, no adjacency collect —
the only scalars collected are n (node count) and the per-round
dangling mass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["domain_link_edges", "pagerank", "attach_domain_rank"]

# rank grid: 1e-9 of total mass — fine enough that fixed-round ranks
# order correctly for any realistic graph, and small enough that every
# intermediate product (u * d_units <= GRID * GRID = 1e18) stays inside
# a long under ANSI overflow checking
_GRID = 1_000_000_000


def domain_link_edges(
    links: DataFrame,
    src_col: str = "source_url",
    dst_col: str = "url",
    psl=None,
) -> DataFrame:
    """Collapse page-level outlink rows to the registered-domain
    (eTLD+1) edge list: ``(src, dst, n_links)``. Self-loops (intra-
    domain navigation — the vast majority of raw links) and rows where
    either side has no extractable domain are dropped; parallel edges
    aggregate into ``n_links``. One shuffle on the (short) domain
    pair."""
    from .weburl import with_registered_domain

    e = with_registered_domain(links, src_col, "__gs_lg_src", psl=psl)
    e = with_registered_domain(e, dst_col, "__gs_lg_dst", psl=psl)
    e = e.select(
        F.col("__gs_lg_src").alias("src"),
        F.col("__gs_lg_dst").alias("dst"),
    ).where(
        (F.col("src") != "") & (F.col("dst") != "")
        & (F.col("src") != F.col("dst"))
    )
    return e.groupBy("src", "dst").agg(
        F.count(F.lit(1)).alias("n_links")
    )


def pagerank(
    edges: DataFrame,
    iters: int = 5,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
    ckpt_every: int = 4,
) -> DataFrame:
    """Damped PageRank over a directed edge list, ``iters`` fixed
    rounds from the uniform vector — returns ``(node, rank)`` with
    ranks summing to ~1. Dangling nodes (no outlinks) redistribute
    their mass uniformly each round, the standard correction — without
    it total mass leaks and ranks stop being comparable across graphs.
    ``weight_col`` (e.g. ``n_links``) makes the per-edge transfer
    proportional instead of uniform across a node's outlinks; edges
    with null or non-positive weight are DROPPED up front (they
    transfer nothing by definition, and keeping them could make a
    node's out-weight sum zero — a divide-by-zero job failure under
    ANSI mode), so a node referenced only by such edges is not in the
    graph at all.

    Determinism contract: ranks live on an integer 1e-9 grid — each
    round transfers ``floor(rank_units * w / W_out)`` units per edge
    (exact longs; the sub-unit floor residue, bounded by out-degree
    units, is dropped — documented mass slippage < n_edges/1e9), so
    sums are order-free and the output is IDENTICAL under any
    partitioning or engine. Each round is one join + one aggregate,
    with the round's dangling mass riding as a broadcast one-row
    aggregate inside the same job; the only driver scalar is n.

    ``ckpt_every`` (round 16, optimization): lineage is truncated with
    an eager ``localCheckpoint`` every k-th round instead of every
    round — the MLlib iterative-operator pattern (its
    ``checkpointInterval`` defaults to 10). Per-round checkpointing
    made every round its own Spark job; between checkpoints the rounds
    now chain inside ONE job, and the duplicated previous-round
    subtrees (each round reads its predecessor twice: dangling mass +
    transfers) deduplicate at runtime via AQE exchange reuse. The
    checkpoint cadence cannot change the ranks (exact integer
    arithmetic, order-free sums — the partition-invariance pytest pins
    it); it only bounds plan growth, which is geometric in the gap, so
    keep ``ckpt_every`` small. The final round is always checkpointed:
    callers fan the returned relation into several consumers (e.g. a
    rank column AND a broadcast join) and must not replay the
    iteration per consumer."""
    if iters < 1:
        raise ValueError("iters must be >= 1")
    if not 0.0 < damping < 1.0:
        raise ValueError("damping must be in (0, 1)")
    if ckpt_every < 1:
        raise ValueError("ckpt_every must be >= 1")
    w = (
        F.col(weight_col).cast("long")
        if weight_col is not None
        else F.lit(1).cast("long")
    )
    # drop null/non-positive weights BEFORE the out-weight sum: a node
    # whose edges all carry w <= 0 would otherwise get wout = 0 and
    # `du * w div wout` divides by zero — a job-killing error under
    # ANSI mode. A zero-weight edge transfers nothing by definition,
    # so dropping it (the node becomes dangling if nothing remains) is
    # the faithful semantics, not a clamp. The filter runs on the RAW
    # weight — F.least SKIPS nulls, so capping first would resurrect a
    # null weight as _GRID.
    # Weight cap: per-edge transfer computes du * w with du <= d·GRID
    # (~8.5e8), so w <= 1e9 keeps the product inside a long under ANSI
    # overflow checking; beyond that an edge already takes essentially
    # the whole out-share, so capping loses nothing.
    e = (
        edges.select(
            F.col(src_col).alias("src"),
            F.col(dst_col).alias("dst"),
            w.alias("w"),
        )
        .where(F.col("w") > 0)
        .withColumn("w", F.least(F.col("w"), F.lit(_GRID).cast("long")))
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.select("node", F.lit(0.0).alias("rank"))
    outw = e.groupBy("src").agg(F.sum("w").alias("wout"))
    # damping factor in grid units per 1.0 of rank: transfer keeps
    # d * rank; base keeps (1-d)/n. Both derived from the SAME integer
    # d_units so mass bookkeeping stays exact.
    d_units = int(round(damping * _GRID))
    base_units = (_GRID - d_units) // n
    pr = nodes.select("node", F.lit(_GRID // n).cast("long").alias("u"))
    for it in range(iters):
        ranked_out = pr.join(
            outw, pr["node"] == outw["src"], "left"
        ).select(pr["node"], "u", "wout")
        # dangling mass: nodes with no outlinks (wout null) — kept as
        # a BROADCAST one-row aggregate, not a collect: a per-round
        # first() was a whole extra Spark job per iteration (r13 —
        # measured ~1 s/round of pure job overhead on a tiny graph),
        # while the broadcast folds it into the round's single job.
        # Same exact integer arithmetic either way; n remains the only
        # driver-side scalar.
        dang = (
            ranked_out.where(F.col("wout").isNull())
            .agg(
                F.coalesce(F.sum("u"), F.lit(0)).cast("long").alias("__dm")
            )
        )
        # per-edge transfer in exact integer units:
        #   (u*d_units div GRID) * w div wout
        # INTEGRAL division (`div`), never `/`: double division rounds
        # past 2^53, so floor(double(a)/b) can come out one unit below
        # exact a // b — which would break both the bit-determinism
        # contract and the python-twin equality pin
        sends = (
            ranked_out.where(F.col("wout").isNotNull())
            .select(
                F.col("node").alias("src"),
                F.expr(f"u * {d_units}L div {_GRID}L").alias("du"),
                "wout",
            )
            .join(e, "src")
            .select("dst", F.expr("du * w div wout").alias("t"))
            .groupBy("dst")
            .agg(F.sum("t").alias("recv"))
        )
        # share = (dangling * d_units) div GRID div n — exact longs,
        # identical to the python twin's ((dm * d_units) // GRID) // n
        pr = (
            nodes.join(sends, nodes["node"] == sends["dst"], "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                (
                    F.coalesce(F.col("recv"), F.lit(0))
                    + F.lit(base_units).cast("long")
                    + F.expr(
                        f"__dm * {d_units}L div {_GRID}L div {n}L"
                    )
                ).alias("u"),
            )
        )
        if it == iters - 1 or (it + 1) % ckpt_every == 0:
            pr = pr.localCheckpoint(eager=True)
    return pr.select(
        "node", (F.col("u").cast("double") / _GRID).alias("rank")
    )


def attach_domain_rank(
    docs: DataFrame,
    ranks: DataFrame,
    url_col: str = "url",
    psl=None,
    default_rank: float = 0.0,
    rank_col: str = "domain_rank",
) -> DataFrame:
    """Join :func:`pagerank` domain ranks onto a document frame as a
    quality PRIOR — the Common Crawl pattern (their published
    domain-level centrality ranks are consumed exactly this way:
    domain authority as a per-document feature beside the content
    heuristics, feeding sampling weights or a classifier feature).

    Scale shape: the document's registered domain (eTLD+1, same
    ``registered_domain_expr`` grain the edge list was built at) is
    derived IN-ROW, and the rank relation — the ~10^7-row domain
    grain, dwarfed by any corpus — is broadcast into a left join, so
    the corpus never shuffles and the plan stays one map-side stage.
    Unranked domains (not in the crawl graph: fresh hosts, identity-
    less URLs) get ``default_rank`` so downstream arithmetic is
    total."""
    from .weburl import with_registered_domain

    r = F.broadcast(
        ranks.select(
            F.col("node").alias("__dom"), F.col("rank").alias(rank_col)
        )
    )
    out = with_registered_domain(docs, url_col, "__dom", psl=psl)
    return (
        out.join(r, on="__dom", how="left")
        .drop("__dom")
        .withColumn(
            rank_col,
            F.coalesce(F.col(rank_col), F.lit(float(default_rank))),
        )
    )
