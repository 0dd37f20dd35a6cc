"""Domain link graph + quantized PageRank (operators/linkgraph.py):
hand-computed closed-form ranks, an independent python twin of the
integer-unit protocol (exact equality), weighted transfer, dangling
redistribution, partition invariance, and the crawl e2e
(WAT links -> domain edges -> ranks)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gluestick_ts_spark.operators.linkgraph import (
    _GRID,
    attach_domain_rank,
    domain_link_edges,
    pagerank,
)


def _edges(spark, rows, schema="src string, dst string, w long"):
    return spark.createDataFrame(rows, schema)


def _ranks(df):
    return {r.node: r.rank for r in df.collect()}


# ------------------------------------------------ independent twin

def _pagerank_py(edges, iters=5, damping=0.85):
    """From-scratch python twin of the integer-unit protocol (same
    spec, independent code): edges = [(src, dst, w)]."""
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    n = len(nodes)
    edges = [(s, d, min(w, _GRID)) for s, d, w in edges]  # the op's cap
    outw = {}
    for s, _, w in edges:
        outw[s] = outw.get(s, 0) + w
    d_units = int(round(damping * _GRID))
    base = (_GRID - d_units) // n
    u = {x: _GRID // n for x in nodes}
    for _ in range(iters):
        dangling = sum(u[x] for x in nodes if x not in outw)
        recv = {x: 0 for x in nodes}
        for s, dst, w in edges:
            du = (u[s] * d_units) // _GRID
            recv[dst] += (du * w) // outw[s]
        share = (dangling * d_units) // _GRID // n
        u = {x: recv[x] + base + share for x in nodes}
    return {x: u[x] / _GRID for x in nodes}


def test_cycle_is_uniform(spark):
    e = _edges(spark, [("a", "b", 1), ("b", "c", 1), ("c", "a", 1)])
    got = _ranks(pagerank(e, iters=4))
    assert set(got) == {"a", "b", "c"}
    vals = set(got.values())
    assert len(vals) == 1  # symmetric graph -> identical ranks
    assert abs(sum(got.values()) - 1.0) < 1e-6


def test_star_closed_form_one_round(spark):
    """B,C,D -> A; A dangling. One round from uniform has the closed
    form A = 3·d/4 + (1−d)/4 + d/16, others = (1−d)/4 + d/16."""
    e = _edges(spark, [(s, "a", 1) for s in ("b", "c", "d")])
    got = _ranks(pagerank(e, iters=1))
    d = 0.85
    a_expect = 3 * (d / 4) + (1 - d) / 4 + d * 0.25 / 4
    o_expect = (1 - d) / 4 + d * 0.25 / 4
    assert abs(got["a"] - a_expect) < 1e-9
    for x in ("b", "c", "d"):
        assert abs(got[x] - o_expect) < 1e-9
    assert abs(sum(got.values()) - 1.0) < 1e-6


@pytest.mark.parametrize("iters", [1, 3])
def test_matches_independent_python_twin_exactly(spark, iters):
    rows = [
        ("a", "b", 2), ("a", "c", 1), ("b", "c", 1), ("c", "a", 1),
        ("d", "a", 5), ("e", "a", 1), ("b", "e", 1),
    ]
    e = _edges(spark, rows)
    got = _ranks(pagerank(e, iters=iters, weight_col="w"))
    want = _pagerank_py(rows, iters=iters)
    assert got == want  # EXACT — both sides are the same integer grid


def test_weighted_transfer_proportional(spark):
    e = _edges(spark, [("a", "b", 3), ("a", "c", 1)])
    got = _ranks(pagerank(e, iters=1, weight_col="w"))
    # b receives 3x c's transfer on top of the shared base
    base_plus_share = min(got["b"], got["c"], got["a"])
    assert abs(
        (got["b"] - base_plus_share) - 3 * (got["c"] - base_plus_share)
    ) < 1e-9


def test_partition_invariance_exact(spark):
    rows = [(f"n{i}", f"n{(i * 7 + 3) % 23}", 1 + i % 4) for i in range(60)]
    rows = [r for r in rows if r[0] != r[1]]
    a = _ranks(pagerank(_edges(spark, rows), iters=3, weight_col="w"))
    b = _ranks(
        pagerank(_edges(spark, rows).repartition(13), iters=3, weight_col="w")
    )
    assert a == b  # bit-identical under repartitioning


def test_authority_outranks_spokes(spark):
    e = _edges(
        spark,
        [(f"s{i}", "hub", 1) for i in range(8)] + [("hub", "s0", 1)],
    )
    got = _ranks(pagerank(e, iters=5))
    assert got["hub"] == max(got.values())
    assert got["s0"] > got["s1"]  # the hub's one outlink lifts s0


def test_ckpt_cadence_cannot_change_ranks(spark):
    # Checkpoint interval is a lineage-truncation knob only: every cadence
    # (per-round, mid-run, final-only) must emit bit-identical ranks.
    rows = [(f"n{i}", f"n{(i * 7 + 3) % 23}", 1 + i % 4) for i in range(60)]
    rows = [r for r in rows if r[0] != r[1]]
    e = _edges(spark, rows)
    want = _ranks(pagerank(e, iters=5, weight_col="w", ckpt_every=1))
    for k in (2, 3, 99):
        assert _ranks(pagerank(e, iters=5, weight_col="w", ckpt_every=k)) == want


def test_validation(spark):
    e = _edges(spark, [("a", "b", 1)])
    with pytest.raises(ValueError):
        pagerank(e, iters=0)
    with pytest.raises(ValueError):
        pagerank(e, damping=1.0)
    with pytest.raises(ValueError):
        pagerank(e, ckpt_every=0)


def test_domain_link_edges_etld1_collapse(spark):
    links = spark.createDataFrame(
        [
            ("http://www.a.com/p1", "http://b.co.uk/x"),
            ("http://a.com/p2", "http://sub.b.co.uk/y"),  # same domain pair
            ("http://a.com/p3", "http://a.com/other"),  # self-loop dropped
            ("not a url", "http://b.co.uk/z"),  # no src domain -> dropped
        ],
        "source_url string, url string",
    )
    rows = domain_link_edges(links).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.src, r.dst, r.n_links) == ("a.com", "b.co.uk", 2)


def test_crawl_to_ranks_e2e(spark, tmp_path):
    """WAT links -> domain edges -> ranks: the authority domain every
    page links to outranks the sources."""
    from gluestick_ts_spark.sources.warc import read_warc, warc_encode
    from gluestick_ts_spark.sources.wat import (
        read_wat,
        wat_from_warc,
        wat_links,
        write_wat,
    )

    def cap(i):
        html = (
            f"<html><body><a href='http://hub.org/{i}'>h</a>"
            f"<a href='http://peer{(i + 1) % 3}.net/'>p</a></body></html>"
        )
        return {
            "warc_type": "response",
            "url": f"http://peer{i}.net/page",
            "content_type": "application/http; msgtype=response",
            "body": b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
            + html.encode(),
        }

    (tmp_path / "c.warc.gz").write_bytes(warc_encode([cap(i) for i in range(3)]))
    wat = wat_from_warc(read_warc(spark, str(tmp_path)))
    write_wat(wat, str(tmp_path / "wat"))
    edges = domain_link_edges(wat_links(read_wat(spark, str(tmp_path / "wat"))))
    ranks = _ranks(pagerank(edges, iters=3, weight_col="n_links"))
    assert ranks["hub.org"] == max(ranks.values())


def test_huge_weights_stay_integer_exact(spark):
    """Transfers whose products pass 2^53 (where double division would
    round away from exact integer division) still match the python
    twin bit for bit — the `div` (integral) path, plus the 1e9 weight
    cap keeping products inside a long under ANSI mode."""
    rows = [
        ("a", "b", 999_999_937),  # prime-ish divisor territory
        ("a", "c", 1),
        ("d", "a", 123_456_789_123),  # beyond the cap -> clamped
    ]
    e = _edges(spark, rows)
    got = _ranks(pagerank(e, iters=2, weight_col="w"))
    want = _pagerank_py(rows, iters=2)
    assert got == want


def test_non_positive_weight_edges_dropped_not_div0(spark):
    """Zero/negative/null caller-supplied weights must not produce a
    wout=0 group (a divide-by-zero job failure under ANSI mode): such
    edges are dropped up front, and a node referenced ONLY by them is
    not in the graph."""
    e = _edges(
        spark,
        [
            ("a", "b", 0),     # a's only edge is zero-weight -> a dangles
            ("a", "z", -3),    # negative: dropped
            ("c", "a", 2),
            ("a2", "c", None), # null: dropped
            ("d", "c", 1),
        ],
    )
    got = _ranks(pagerank(e, iters=3, weight_col="w"))
    # b, z, a2 were referenced only through dropped edges
    assert set(got) == {"a", "c", "d"}
    want = _pagerank_py([("c", "a", 2), ("d", "c", 1)], iters=3)
    assert got == want
    assert abs(sum(got.values()) - 1.0) < 1e-6


def test_top_terms_rank_part_matches_python_twin(spark, sf_dir):
    """The driver-visible ``rank`` part of top_terms (round 13) lands
    EXACTLY on the independent python twin, fed the same deterministic
    doc_id link graph: url synth -> eTLD+1 collapse -> weighted
    3-round integer PageRank. Also pins the graph shape: 23 domains,
    d19..d22 dangling (never sources), ranks summing to ~1."""
    from collections import Counter

    from gluestick_ts_spark.plans.queries import QUERIES

    got = {
        r.token: r.rank
        for r in QUERIES["top_terms"](spark, sf_dir)
        .where("part = 'rank'")
        .select("token", "rank")
        .collect()
    }
    ids = [
        r.doc_id
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    raw = Counter()
    for i in ids:
        s = f"d{i % 19}.com"
        for dst in (f"d{(i * 7 + 3) % 23}.com", f"d{(i * 5 + 1) % 23}.com"):
            if dst != s:
                raw[(s, dst)] += 1
    want = _pagerank_py([(s, d, w) for (s, d), w in raw.items()], iters=3)
    assert got == want
    assert len(got) == 23
    assert {f"d{k}.com" for k in (19, 20, 21, 22)} <= set(got)
    assert abs(sum(got.values()) - 1.0) < 1e-6


def test_attach_domain_rank_prior(spark):
    """Rank attach: docs get their eTLD+1 domain's rank as a prior via
    a BROADCAST left join (plan-gated — the corpus side never
    shuffles); unknown domains fall back to default_rank."""
    e = _edges(spark, [("a.com", "b.com", 3), ("c.com", "a.com", 1)])
    ranks = pagerank(e, iters=2, weight_col="w")
    rk = {r.node: r.rank for r in ranks.collect()}
    docs = spark.createDataFrame(
        [
            (1, "http://www.a.com/page/1"),
            (2, "https://sub.b.com/x?q=1"),
            (3, "http://unknown-host.net/y"),
        ],
        "doc_id long, url string",
    )
    out = attach_domain_rank(docs, ranks)
    got = {r.doc_id: r.domain_rank for r in out.collect()}
    assert got[1] == rk["a.com"]
    assert got[2] == rk["b.com"]
    assert got[3] == 0.0
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_attach_domain_rank_import():
    from gluestick_ts_spark.operators.linkgraph import attach_domain_rank  # noqa: F401
