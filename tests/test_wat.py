"""WAT metadata sidecar (sources/wat.py): envelope generate -> write
-> parse round-trips, real-Common-Crawl-shaped envelopes (extra
fields) parsing with the subset schema, the labeled-not-fatal contract
on garbage envelopes, link-graph extraction, and the plan gate (the
envelope parse is one JVM from_json — no Python beyond the container
walk)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gluestick_ts_spark.sources.warc import read_warc, warc_encode
from gluestick_ts_spark.sources.wat import (
    WAT_ENVELOPE_SCHEMA,
    read_wat,
    wat_from_warc,
    wat_links,
    write_wat,
)


def _cap(i: int) -> dict:
    html = (
        f"<html><head><title>Doc {i}</title></head><body>"
        f'<a href="http://t.com/{i}a">x</a>'
        f" <A HREF='http://t.com/{i}b'>y</A>"
        '<img src="http://t.com/img.png"></body></html>'
    )
    return {
        "warc_type": "response",
        "url": f"http://s.com/p/{i}",
        "warc_date": f"2024-01-01T00:00:0{i}Z",
        "content_type": "application/http; msgtype=response",
        "body": b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
        + html.encode(),
    }


def test_wat_round_trip(spark, tmp_path):
    (tmp_path / "c.warc.gz").write_bytes(
        warc_encode([_cap(i) for i in range(3)])
    )
    crawl = read_warc(spark, str(tmp_path))
    wat = wat_from_warc(crawl)
    write_wat(wat, str(tmp_path / "wat"))
    rows = read_wat(spark, str(tmp_path / "wat")).orderBy("url").collect()
    assert [r.url for r in rows] == [f"http://s.com/p/{i}" for i in range(3)]
    assert [r.title for r in rows] == [f"Doc {i}" for i in range(3)]
    assert all(r.status == 200 and r.mime == "text/html" for r in rows)
    assert all(r.warc_date == f"2024-01-01T00:00:0{i}Z"
               for i, r in enumerate(rows))
    # anchors only — the img src is not an A@/href link
    assert all(len(r.links) == 2 for r in rows)
    edges = wat_links(read_wat(spark, str(tmp_path / "wat")))
    got = {(e.source_url, e.url) for e in edges.collect()}
    assert got == {
        (f"http://s.com/p/{i}", f"http://t.com/{i}{s}")
        for i in range(3)
        for s in ("a", "b")
    }


def test_real_cc_shaped_envelope_parses(spark):
    """An envelope with Common Crawl's EXTRA fields (Format, Reason,
    Server header, Metas, link text) parses through the subset schema
    — the reader works on the published files, not just our own."""
    extra = (
        '{"Envelope":{"Format":"WARC","WARC-Header-Metadata":'
        '{"WARC-Target-URI":"http://cc.org/x","WARC-Type":"response"},'
        '"Payload-Metadata":{"Actual-Content-Type":"application/http",'
        '"HTTP-Response-Metadata":{"Response-Message":{"Status":"301",'
        '"Reason":"Moved"},"Headers":{"Content-Type":"text/html",'
        '"Server":"nginx"},"HTML-Metadata":{"Head":{"Title":"CC Page",'
        '"Metas":[{"name":"x"}]},"Links":[{"path":"A@/href",'
        '"url":"http://cc.org/y","text":"anchor text"}]}}}}}'
    )
    df = spark.createDataFrame([(extra,)], "text string")
    j = df.select(
        F.from_json("text", WAT_ENVELOPE_SCHEMA).alias("j")
    ).first().j
    env = j["Envelope"]
    assert env["WARC-Header-Metadata"]["WARC-Target-URI"] == "http://cc.org/x"
    http = env["Payload-Metadata"]["HTTP-Response-Metadata"]
    assert http["Response-Message"]["Status"] == "301"
    assert http["HTML-Metadata"]["Links"][0]["url"] == "http://cc.org/y"
    assert http["HTML-Metadata"]["Head"]["Title"] == "CC Page"


def test_garbage_envelope_keeps_row_with_nulls(spark, tmp_path):
    recs = [
        {
            "warc_type": "metadata",
            "url": "http://s.com/p/0",
            "content_type": "application/json",
            "body": b"this is not json at all",
        }
    ]
    (tmp_path / "w.warc.gz").write_bytes(warc_encode(recs))
    rows = read_wat(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    # envelope fields null, capture identity preserved from the record
    assert r.url == "http://s.com/p/0"
    assert r.status is None and r.title is None and r.links == []


def test_wat_links_path_filter(spark):
    df = spark.createDataFrame(
        [
            (
                "http://a/",
                [
                    {"path": "A@/href", "url": "http://b/"},
                    {"path": "IMG@/src", "url": "http://c/i.png"},
                ],
            )
        ],
        "url string, links array<struct<path string, url string>>",
    )
    assert {r.url for r in wat_links(df).collect()} == {"http://b/"}
    assert {r.url for r in wat_links(df, path_filter=None).collect()} == {
        "http://b/",
        "http://c/i.png",
    }


def test_wat_frontier_composition(spark, tmp_path):
    """WAT links feed the frontier ops: normalize + keep-first dedup
    over the outlink edge list — the graph-from-metadata path that
    never decodes HTML twice."""
    from gluestick_ts_spark.operators.weburl import (
        normalize_url_expr,
        url_dedup_flag,
    )

    (tmp_path / "c.warc.gz").write_bytes(
        warc_encode([_cap(0), _cap(1)])
    )
    wat = wat_from_warc(read_warc(spark, str(tmp_path)))
    write_wat(wat, str(tmp_path / "wat"))
    edges = wat_links(read_wat(spark, str(tmp_path / "wat")))
    frontier = edges.select(
        F.monotonically_increasing_id().alias("id"),
        normalize_url_expr("url").alias("u"),
    )
    kept = url_dedup_flag(frontier, "u", id_col="id")
    assert kept.where("url_keep").count() == 4  # 2 docs x 2 distinct anchors


def test_read_wat_plan_is_jvm_side_after_container_walk(spark, tmp_path):
    (tmp_path / "c.warc.gz").write_bytes(warc_encode([_cap(0)]))
    wat = wat_from_warc(read_warc(spark, str(tmp_path)))
    write_wat(wat, str(tmp_path / "wat"))
    plan = (
        read_wat(spark, str(tmp_path / "wat"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # exactly the container walk's Arrow boundary, nothing more
    assert plan.count("MapInPandas") == 1
    for marker in ("BatchEvalPython", "ArrowEvalPython"):
        assert marker not in plan


def test_wat_streaming_sidecar(spark, tmp_path):
    """Streaming WAT generation (round 13 gate): wat_from_warc is pure
    in-row Column algebra, so it composes with read_warc_stream and a
    foreachBatch sidecar writer — envelopes equal the batch path's for
    the same containers, and a replay (fresh checkpoint, same input)
    produces identical rows."""
    import os

    from gluestick_ts_spark.sources.warc import read_warc_stream

    src = tmp_path / "crawl"
    src.mkdir()
    (src / "c.warc.gz").write_bytes(warc_encode([_cap(i) for i in range(3)]))

    def _run(tag: str) -> dict:
        got: dict[str, tuple] = {}

        def emit(df, batch_id):
            for r in wat_from_warc(df).collect():
                got[r.url] = (r.warc_date, r.wat)

        q = (
            read_warc_stream(spark, str(src))
            .writeStream.foreachBatch(emit)
            .option(
                "checkpointLocation", str(tmp_path / f"ck_{tag}")
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return got

    stream1 = _run("a")
    batch = {
        r.url: (r.warc_date, r.wat)
        for r in wat_from_warc(read_warc(spark, str(src))).collect()
    }
    assert stream1 == batch and len(batch) == 3
    # replay determinism: a fresh run over the same input is identical
    assert _run("b") == stream1
