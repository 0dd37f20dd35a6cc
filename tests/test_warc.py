"""WARC crawl-container source (sources/warc.py): fixture round-trips
for every container layout (plain / per-record gzip / whole-file gzip),
HTTP framing (chunked + content-encoding), charset resolution, the
labeled-_error corruption contract, and the distributed binaryFile
read incl. the text-only projection a curation pipeline uses."""

from __future__ import annotations

import gzip

import pytest
from pyspark.sql import functions as F

from gluestick_ts_spark.sources.warc import (
    http_text_of,
    parse_http_response,
    parse_warc_records,
    read_warc,
    warc_encode,
)


def _chunked(b: bytes, n: int = 7) -> bytes:
    out = []
    for i in range(0, len(b), n):
        c = b[i : i + n]
        out.append(f"{len(c):x}".encode() + b"\r\n" + c + b"\r\n")
    return b"".join(out) + b"0\r\n\r\n"


def _http(body: bytes, ct: str = "text/html", extra: bytes = b"") -> bytes:
    return (
        b"HTTP/1.1 200 OK\r\nContent-Type: " + ct.encode() + b"\r\n" + extra
        + b"\r\n" + body
    )


_HTML = (
    "<html><head><meta charset=iso-8859-1></head>"
    "<body>caf\xe9 crawl page</body></html>"
).encode("iso-8859-1")


def _capture(url: str, body: bytes) -> dict:
    return {
        "warc_type": "response",
        "url": url,
        "content_type": "application/http; msgtype=response",
        "body": body,
    }


def _fixture_records() -> list[dict]:
    return [
        {"warc_type": "warcinfo", "content_type": "application/warc-fields",
         "body": b"software: fixture\r\n"},
        {"warc_type": "request", "url": "http://a.example/",
         "content_type": "application/http; msgtype=request",
         "body": b"GET / HTTP/1.1\r\nHost: a.example\r\n\r\n"},
        _capture("http://a.example/", _http(_HTML)),
        _capture(
            "http://b.example/x",
            _http(
                _chunked(gzip.compress(_HTML)),
                ct="text/html; charset=ISO-8859-1",
                extra=b"Transfer-Encoding: chunked\r\nContent-Encoding: gzip\r\n",
            ),
        ),
        {"warc_type": "metadata", "url": "http://a.example/",
         "content_type": "application/warc-fields",
         "body": b"fetchTimeMs: 12\r\n"},
    ]


def test_roundtrip_all_three_layouts():
    recs = _fixture_records()
    plain = warc_encode(recs, per_record_gzip=False)
    layouts = {
        "plain": plain,
        "per_record_gzip": warc_encode(recs, per_record_gzip=True),
        "whole_file_gzip": gzip.compress(plain),
    }
    for name, data in layouts.items():
        got = list(parse_warc_records(data))
        assert [r["warc_type"] for r in got] == [
            "warcinfo", "request", "response", "response", "metadata",
        ], name
        assert got[2]["url"] == "http://a.example/"
        assert got[2]["record_id"] == "<urn:uuid:rec-00000002>"
        assert not any(r["warc_type"] == "_error" for r in got), name
    # the fixture writer is byte-deterministic (mtime pinned)
    assert warc_encode(recs) == warc_encode(recs)


def test_http_split_chunked_gzip_and_charsets():
    recs = _fixture_records()
    got = list(parse_warc_records(warc_encode(recs)))
    # straight capture
    s, h, b = parse_http_response(got[2]["body"])
    assert (s, b) == (200, _HTML)
    # chunked + gzip capture reassembles to the identical document
    s2, h2, b2 = parse_http_response(got[3]["body"])
    assert (s2, b2) == (200, _HTML)
    # charset from the HTTP header param
    assert "café crawl page" in http_text_of(b2, h2["content-type"])
    # charset from the <meta> sniff when the header is silent
    assert "café crawl page" in http_text_of(b, "text/html")
    # non-text content types stay binary
    assert http_text_of(b"\x89PNG....", "image/png") is None
    # a BOM is the page's own declaration and beats a LYING header
    # (the UTF-16-with-wrong-charset-header crawl classic)
    u16 = "café page ünïcode".encode("utf-16")
    assert http_text_of(u16, "text/html; charset=iso-8859-1") == "café page ünïcode"
    assert http_text_of(
        "﻿bom'd utf-8".encode("utf-8"), "text/plain"
    ) == "bom'd utf-8"  # BOM consumed, not leaked into the text
    # charset lies WITHOUT a BOM still fall through lossily, no raise
    bad = "ünïcode".encode("utf-16-be")  # BOM-less
    assert http_text_of(bad, "text/plain; charset=utf-8") is not None
    # max_chars caps
    assert http_text_of(b"x" * 100, "text/plain", max_chars=10) == "x" * 10


def test_http_split_tolerates_framing_lies():
    # declared chunked but not actually chunked: raw bytes come back
    lying = _http(b"not chunked at all",
                  extra=b"Transfer-Encoding: chunked\r\n")
    s, _h, b = parse_http_response(lying)
    assert s == 200 and b == b"not chunked at all"
    # declared gzip but plain: raw bytes come back
    lying2 = _http(b"plain body", extra=b"Content-Encoding: gzip\r\n")
    assert parse_http_response(lying2)[2] == b"plain body"
    # raw-deflate servers (zlib-header-less) still decode
    import zlib as _z
    co = _z.compressobj(wbits=-15)
    raw_deflate = co.compress(b"deflated!") + co.flush()
    ok = _http(raw_deflate, extra=b"Content-Encoding: deflate\r\n")
    assert parse_http_response(ok)[2] == b"deflated!"
    # a non-HTTP payload (resource record) passes through untouched
    assert parse_http_response(b"just bytes") == (None, {}, b"just bytes")


def test_corruption_is_labeled_not_fatal():
    recs = _fixture_records()
    plain = warc_encode(recs, per_record_gzip=False)
    cut = plain[:-60]  # chop into the final record
    got = list(parse_warc_records(cut))
    assert got[-1]["warc_type"] == "_error" and got[-1]["error"]
    assert [r["warc_type"] for r in got[:-1]] == [
        "warcinfo", "request", "response", "response",
    ]
    # garbage container: one _error row, nothing else
    only = list(parse_warc_records(b"this is not a warc"))
    assert [r["warc_type"] for r in only] == ["_error"]
    # corrupt gzip member: same contract
    broken = warc_encode(recs)[:-20]
    assert list(parse_warc_records(broken))[-1]["warc_type"] == "_error"


def test_read_warc_distributed(spark, tmp_path):
    wdir = tmp_path / "crawl"
    wdir.mkdir()
    (wdir / "seg-0.warc.gz").write_bytes(warc_encode(_fixture_records()))
    (wdir / "seg-1.warc").write_bytes(
        warc_encode(
            [_capture(f"http://c.example/{i}", _http(_HTML)) for i in range(3)],
            per_record_gzip=False,
        )
    )
    df = read_warc(spark, str(wdir))
    rows = df.collect()
    # responses only by default; both container files contribute
    assert sorted(r.url for r in rows) == [
        "http://a.example/", "http://b.example/x",
        "http://c.example/0", "http://c.example/1", "http://c.example/2",
    ]
    by_url = {r.url: r for r in rows}
    a = by_url["http://a.example/"]
    assert a.http_status == 200
    assert bytes(a.payload) == _HTML
    assert "café crawl page" in a.text
    assert a.error is None and a.truncated is False
    # the chunked+gzip capture decoded identically
    assert bytes(by_url["http://b.example/x"].payload) == _HTML
    # record_types widens the selection
    n_meta = read_warc(spark, str(wdir), record_types=("metadata",)).count()
    assert n_meta == 1
    with pytest.raises(ValueError, match="record_types"):
        read_warc(spark, str(wdir), record_types=())


def test_read_warc_caps_corruption_and_projection(spark, tmp_path):
    wdir = tmp_path / "crawl2"
    wdir.mkdir()
    big = _capture("http://big.example/", _http(b"B" * 4096, ct="text/plain"))
    (wdir / "good.warc").write_bytes(warc_encode([big], per_record_gzip=False))
    (wdir / "bad.warc").write_bytes(b"WARC/1.1\r\nbroken")
    df = read_warc(
        spark, str(wdir), max_payload_bytes=1024, emit_payload=False
    )
    rows = {r.warc_type: r for r in df.collect()}
    # the oversized body truncated at the cap, payload projected away,
    # text still derived from the capped bytes
    r = rows["response"]
    assert r.truncated is True and r.payload is None
    assert r.text == "B" * 1024
    # the corrupt sibling file became one labeled row, not a job failure
    e = rows["_error"]
    assert e.error and e.url is None
    # curation-style text-only read composes with engine expressions
    clean = df.where(F.col("error").isNull()).select(
        "url", F.length("text").alias("n")
    )
    assert clean.collect()[0].n == 1024


def test_warc_fuzz_never_raises_and_roundtrips():
    """Property gates (the codec-family fuzz pattern): (a) arbitrary
    record lists round-trip through warc_encode -> parse_warc_records
    in both layouts; (b) random truncations/mutations of a valid
    container never raise — worst case is a labeled _error row."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    rec_st = st.fixed_dictionaries(
        {
            "warc_type": st.sampled_from(
                ["response", "request", "metadata", "resource", "warcinfo"]
            ),
            "body": st.binary(max_size=200),
        },
        optional={
            "url": st.text(
                alphabet=st.characters(min_codepoint=33, max_codepoint=126),
                min_size=1, max_size=40,
            ).map(lambda s: "http://x/" + s),
            "content_type": st.sampled_from(
                ["application/http; msgtype=response", "text/plain",
                 "application/warc-fields"]
            ),
        },
    )

    @settings(max_examples=40, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(st.lists(rec_st, min_size=1, max_size=6), st.booleans())
    def roundtrip(recs, pergz):
        data = warc_encode(recs, per_record_gzip=pergz)
        got = list(parse_warc_records(data))
        assert len(got) == len(recs)
        for r, rec in zip(got, recs):
            assert r["warc_type"] == rec["warc_type"]
            assert r["body"] == rec["body"]
            assert r["url"] == rec.get("url")

    roundtrip()

    base = warc_encode(_fixture_records(), per_record_gzip=False)
    base_gz = warc_encode(_fixture_records(), per_record_gzip=True)

    @settings(max_examples=60, deadline=None)
    @given(st.integers(0, 1), st.integers(0, 10_000), st.integers(0, 255))
    def mutate(which, pos, byte):
        data = bytearray(base if which == 0 else base_gz)
        p = pos % len(data)
        data[p] = byte
        rows = list(parse_warc_records(bytes(data)))
        # tolerant contract: rows parse or one trailing labeled error;
        # NEVER an exception, never more than one _error row
        assert sum(1 for r in rows if r["warc_type"] == "_error") <= 1

    mutate()

    @settings(max_examples=40, deadline=None)
    @given(st.integers(0, 10_000))
    def truncate(cut):
        data = base[: cut % len(base)]
        rows = list(parse_warc_records(data))
        assert sum(1 for r in rows if r["warc_type"] == "_error") <= 1

    truncate()


def test_warc_to_curation_pipeline(spark, tmp_path):
    """The full crawl story end-to-end: WARC containers -> read_warc
    -> robots compliance FROM THE CRAWL'S OWN robots.txt captures
    (robots_from_warc, r12) -> jusText main-content extraction ->
    quality/license screens — every stage engine-level after the one
    Arrow parse boundary."""
    from pyspark.sql import functions as F

    from gluestick_ts_spark.functions.text import (
        license_flags_expr,
        main_text_expr,
        quality_score_expr,
    )
    from gluestick_ts_spark.operators.weburl import (
        robots_filter,
        robots_from_warc,
    )

    prose = (
        "The quick brown fox jumps over the lazy dog and then walks to "
        "the river in the morning for a drink of water with all of the "
        "other animals in the area and it is a fine day for that."
    )
    def page(body_html):
        return (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
            + body_html.encode()
        )

    captures = [
        # the crawl carries its own compliance policy: good.example's
        # robots.txt disallows /private/ — the helper, not hand-rolled
        # filtering, turns these captures into the policy relation
        _capture(
            "http://good.example/robots.txt",
            b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n"
            b"User-agent: *\nDisallow: /private/\n",
        ),
        _capture("http://good.example/", page(
            f'<div><a href="/">Home</a> <a href="/a">About</a></div>'
            f"<p>{prose}</p><div>(c) <a href='/t'>Terms</a></div>")),
        _capture("http://good.example/private/x", page(f"<p>{prose}</p>")),
        _capture("http://licensed.example/", page(
            f"<p>{prose} All rights reserved.</p>")),
        _capture("http://linkfarm.example/", page(
            '<div><a href="x">one</a> <a href="y">two</a> '
            '<a href="z">three</a></div>')),
    ]
    wdir = tmp_path / "crawl3"
    wdir.mkdir()
    (wdir / "c.warc.gz").write_bytes(warc_encode(captures))

    crawl = read_warc(spark, str(wdir), emit_payload=False)
    robots_rel = robots_from_warc(crawl)
    docs = (
        crawl
        .where(F.col("error").isNull() & (F.col("http_status") == 200))
        .where(~F.col("url").endswith("/robots.txt"))
        .select("url", main_text_expr(F.col("text")).alias("main"))
        .select(
            "url", "main",
            quality_score_expr(F.col("main")).alias("quality"),
            license_flags_expr(F.col("main"))["license_ok"].alias("lic_ok"),
        )
    )
    docs = robots_filter(docs, robots_rel, "url")
    rows = {r.url: r for r in docs.collect()}
    assert prose in rows["http://good.example/"].main
    assert "Home" not in rows["http://good.example/"].main  # nav died
    assert rows["http://good.example/"].lic_ok is True
    assert rows["http://licensed.example/"].lic_ok is False  # rights clause
    assert rows["http://linkfarm.example/"].main == ""  # nothing survived
    # robots verdicts came from the crawl's own captures
    assert rows["http://good.example/"].robots_ok is True
    assert rows["http://good.example/private/x"].robots_ok is False
    assert rows["http://licensed.example/"].robots_ok is True  # no robots


def test_write_wet_roundtrip(spark, tmp_path):
    """WET sink: (url, text) -> conversion records -> read_warc reads
    them back; per-partition files, NULL-text rows skipped, atomic
    part naming."""
    from gluestick_ts_spark.sources.warc import write_wet

    rows = [
        ("http://a.example/", "extracted text one", "2026-02-01T00:00:00Z"),
        ("http://b.example/", "extracted text two with café", "2026-02-01T00:00:01Z"),
        ("http://c.example/", None, "2026-02-01T00:00:02Z"),
    ]
    df = spark.createDataFrame(rows, "url string, text string, ts string").repartition(2)
    out = tmp_path / "wet"
    write_wet(df, str(out), date_col="ts")
    files = sorted(p.name for p in out.iterdir())
    assert files and all(f.startswith("part-") and f.endswith(".warc.gz") for f in files)
    back = read_warc(spark, str(out), record_types=("conversion",))
    got = {r.url: (r.text, r.warc_date) for r in back.collect()}
    assert got == {
        "http://a.example/": ("extracted text one", "2026-02-01T00:00:00Z"),
        "http://b.example/": ("extracted text two with café", "2026-02-01T00:00:01Z"),
    }
    # no error rows, no tmp litter
    assert back.where(F.col("error").isNotNull()).count() == 0
    assert not [p for p in out.iterdir() if p.name.startswith(".")]


def test_read_warc_stream_exactly_once(spark, tmp_path):
    """Streaming WARC ingest: new container files become record rows
    through the SAME mapper as the batch reader; the file-source
    checkpoint processes each container exactly once across restarts."""
    from gluestick_ts_spark.sources.warc import read_warc_stream

    wdir = tmp_path / "incoming"
    wdir.mkdir()
    ckpt = str(tmp_path / "ck")
    (wdir / "seg-0.warc.gz").write_bytes(
        warc_encode([_capture("http://s0.example/", _http(_HTML))])
    )
    got: list = []

    def run():
        q = (
            read_warc_stream(spark, str(wdir), emit_payload=False)
            .writeStream.foreachBatch(
                lambda df, bid: got.extend(
                    (r.url, r.text is not None) for r in df.collect()
                )
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    assert got == [("http://s0.example/", True)]
    # second container arrives; restart processes ONLY the new file
    (wdir / "seg-1.warc.gz").write_bytes(
        warc_encode([_capture("http://s1.example/", _http(_HTML))])
    )
    run()
    assert sorted(got) == [
        ("http://s0.example/", True), ("http://s1.example/", True),
    ]
    # stream rows == batch rows for the same bytes (shared mapper)
    batch = {r.url for r in read_warc(spark, str(wdir)).collect()}
    assert batch == {u for u, _ in got}
    with pytest.raises(ValueError, match="record_types"):
        read_warc_stream(spark, str(wdir), record_types=())


def test_streaming_crawl_to_curation_end_to_end(spark, tmp_path):
    """The WHOLE streaming crawl story in one pipe: .warc.gz segments
    land in a directory -> read_warc_stream -> jusText main-content
    extraction -> stream_curation_filter with the URL blocklist — a
    second segment's re-crawl of an accepted page dies as a duplicate
    against the durable store, and blocked domains never pass."""
    from pyspark.sql import functions as F

    from gluestick_ts_spark.functions.text import main_text_expr
    from gluestick_ts_spark.operators.weburl import robots_from_warc
    from gluestick_ts_spark.sources.warc import read_warc_stream
    from gluestick_ts_spark.streaming.incremental import stream_curation_filter

    # 6 stopwords + 54 distinct words: clears Gopher's word floor AND
    # the jusText density gate at stop_tenths=1 (6/60 = exactly 10%)
    stop6 = ["the", "and", "of", "to", "in", "is"]
    prose = " ".join(stop6 + [f"word{chr(97 + i % 26)}{i}" for i in range(54)])

    def page(extra=""):
        return (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
            + f"<div><a href='/'>Home</a></div><p>{prose}{extra}</p>".encode()
        )

    wdir = tmp_path / "incoming"
    wdir.mkdir()
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ck")
    import os

    os.makedirs(store, exist_ok=True)
    (wdir / "seg-0.warc.gz").write_bytes(warc_encode([
        # the crawl ships its own policy: robots_from_warc snapshots it
        _capture(
            "http://good.example/robots.txt",
            b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n"
            b"User-agent: *\nDisallow: /private/\n",
        ),
        _capture("http://good.example/a", page()),
        _capture("http://good.example/private/p", page(" private copy")),
        _capture("http://ads.tracker-farm.example/x", page(" blocked copy")),
    ]))
    verdicts: dict = {}

    def emit(df, batch_id):
        for r in df.collect():
            verdicts[r.doc_id] = (r.keep, r.drop_reason)

    def run():
        # admission-time policy table: snapshot the crawl-so-far's
        # robots captures batch-side (robots_from_warc is batch-only —
        # keep-latest needs a window), joined statically into the stream
        robots_rel = robots_from_warc(read_warc(spark, str(wdir)))
        docs = (
            read_warc_stream(spark, str(wdir), emit_payload=False)
            .where(F.col("error").isNull())
            .where(~F.col("url").endswith("/robots.txt"))
            .select(
                F.col("url").alias("doc_id"),
                F.col("url"),
                main_text_expr(F.col("text"), stop_tenths=1).alias("text"),
            )
        )
        q = (
            stream_curation_filter(
                docs, store, emit, id_col="doc_id", quality_min=0.0,
                checkpoint_dir=ckpt,
                url_col="url", blocklist=("tracker-farm.example",),
                robots=robots_rel,
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run()
    assert verdicts["http://good.example/a"] == (True, None)
    assert verdicts["http://good.example/private/p"] == (False, "robots")
    assert verdicts["http://ads.tracker-farm.example/x"] == (False, "blocked")

    # segment 2: a re-crawl of the accepted page (same content, new
    # URL path) — exact dedup against the durable store kills it
    verdicts.clear()
    (wdir / "seg-1.warc.gz").write_bytes(warc_encode([
        _capture("http://good.example/a-recrawl", page()),
    ]))
    run()
    assert verdicts == {
        "http://good.example/a-recrawl": (False, "duplicate")
    }, verdicts


def test_bare_lf_record_with_crlf_http_body():
    """Review regression: a bare-LF WARC record whose body is a CRLF
    HTTP capture must frame on the WARC LFLF terminator, not the HTTP
    CRLFCRLF deeper in the window — and later records must survive."""
    http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\nhello"
    rec = (
        b"WARC/1.1\n"
        b"WARC-Type: response\n"
        b"WARC-Target-URI: http://lf.example/\n"
        b"Content-Type: application/http; msgtype=response\n"
        + b"Content-Length: " + str(len(http)).encode() + b"\n\n"
        + http + b"\n\n"
    )
    follow = warc_encode(
        [_capture("http://next.example/", _http(b"after"))],
        per_record_gzip=False,
    )
    got = list(parse_warc_records(rec + follow))
    assert [r["warc_type"] for r in got] == ["response", "response"], got
    assert got[0]["url"] == "http://lf.example/"
    assert got[0]["content_type"] == "application/http; msgtype=response"
    assert got[0]["body"] == http  # the FULL capture, not the payload tail
    s, _h, b = parse_http_response(got[0]["body"])
    assert (s, b) == (200, b"hello")
    assert got[1]["url"] == "http://next.example/"
    # and a bare-LF HTTP capture still splits
    s2, _h2, b2 = parse_http_response(
        b"HTTP/1.1 200 OK\nContent-Type: text/plain\n\nbody"
    )
    assert (s2, b2) == (200, b"body")


def test_decompression_bomb_caps_not_ooms():
    """Review regression: zlib's bufsize is an initial allocation, not
    an output cap — a content-encoding bomb must fall back to the raw
    bytes, and a bombed .warc.gz member must become a labeled error."""
    import zlib as _z

    import gluestick_ts_spark.sources.warc as w

    old = w._MAX_DECOMPRESS_BYTES
    w._MAX_DECOMPRESS_BYTES = 1 << 16  # 64 KB cap for the test
    try:
        bomb = gzip.compress(b"\x00" * (1 << 20))  # 1 MB -> ~1 KB
        lying = _http(bomb, ct="text/plain",
                      extra=b"Content-Encoding: gzip\r\n")
        s, _h, b = parse_http_response(lying)
        assert s == 200 and b == bomb  # raw fallback, not 1 MB
        # a legitimate small gzip body still decodes
        ok = _http(gzip.compress(b"small"), ct="text/plain",
                   extra=b"Content-Encoding: gzip\r\n")
        assert parse_http_response(ok)[2] == b"small"
        # deflate flavors too
        okd = _http(_z.compress(b"zbody"), ct="text/plain",
                    extra=b"Content-Encoding: deflate\r\n")
        assert parse_http_response(okd)[2] == b"zbody"
        # a bombed gzip MEMBER in the container itself: labeled _error
        member_bomb = gzip.compress(
            (b"WARC/1.1\r\nWARC-Type: metadata\r\nContent-Length: "
             + str(1 << 20).encode() + b"\r\n\r\n" + b"\x00" * (1 << 20)
             + b"\r\n\r\n")
        )
        rows = list(parse_warc_records(member_bomb))
        assert rows[-1]["warc_type"] == "_error"
        assert "cap" in rows[-1]["error"]
    finally:
        w._MAX_DECOMPRESS_BYTES = old


def test_dechunk_rejects_negative_chunk_size():
    """Review regression: int(b'-1', 16) parses — a negative chunk size
    must trigger the raw-bytes fallback, not negative-index slicing."""
    lying = _http(b"-4\r\ngarbage that must come back verbatim",
                  extra=b"Transfer-Encoding: chunked\r\n")
    s, _h, b = parse_http_response(lying)
    assert s == 200
    assert b == b"-4\r\ngarbage that must come back verbatim"


def test_read_warc_oversized_container_is_error_row_not_job_death(spark, tmp_path):
    """r12: a container past Spark's binaryFile per-file ceiling
    (spark.sql.sources.binaryFile.maxLength, default Int.MaxValue)
    must become ONE labeled _error row — the module's never-die
    contract — not a task-level SparkException killing the job. The
    ceiling is lowered for the test; the filter reads the conf, so the
    guard path is the production path."""
    wdir = tmp_path / "crawl_big"
    wdir.mkdir()
    small = warc_encode([_capture("http://ok.example/", _http(_HTML))])
    (wdir / "ok.warc.gz").write_bytes(small)
    # oversized: anything past the lowered ceiling
    big = warc_encode(
        [_capture(f"http://big.example/{i}", _http(_HTML)) for i in range(40)]
    )
    (wdir / "big.warc.gz").write_bytes(big)
    assert len(big) > len(small)
    conf = "spark.sql.sources.binaryFile.maxLength"
    old = spark.conf.get(conf)
    spark.conf.set(conf, str(len(small)))  # ok fits, big doesn't
    try:
        rows = read_warc(spark, str(wdir)).collect()
    finally:
        spark.conf.set(conf, old)
    by_type = {}
    for r in rows:
        by_type.setdefault(r.warc_type, []).append(r)
    assert [r.url for r in by_type["response"]] == ["http://ok.example/"]
    errs = by_type["_error"]
    assert len(errs) == 1
    assert errs[0].warc_file.endswith("big.warc.gz")
    assert "exceeds the binaryFile source ceiling" in errs[0].error
    assert str(len(big)) in errs[0].error


def test_read_warc_stream_oversized_container_is_error_row(spark, tmp_path):
    """The streaming twin of the oversized guard: a continuously
    running crawl ingest survives the one bad segment, which arrives
    as a labeled _error row through the same union path."""
    from gluestick_ts_spark.sources.warc import read_warc_stream

    wdir = tmp_path / "incoming_big"
    wdir.mkdir()
    small = warc_encode([_capture("http://s.example/", _http(_HTML))])
    (wdir / "s.warc.gz").write_bytes(small)
    big = warc_encode(
        [_capture(f"http://b.example/{i}", _http(_HTML)) for i in range(40)]
    )
    (wdir / "b.warc.gz").write_bytes(big)
    conf = "spark.sql.sources.binaryFile.maxLength"
    old = spark.conf.get(conf)
    spark.conf.set(conf, str(len(small)))
    got: list = []
    try:
        q = (
            read_warc_stream(spark, str(wdir), emit_payload=False)
            .writeStream.foreachBatch(
                lambda df, bid: got.extend(
                    (r.warc_type, r.url, r.error) for r in df.collect()
                )
            )
            .option("checkpointLocation", str(tmp_path / "ck_big"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    finally:
        spark.conf.set(conf, old)
    types = sorted(t for t, _, _ in got)
    assert types == ["_error", "response"]
    err = next(e for t, _, e in got if t == "_error")
    assert "exceeds the binaryFile source ceiling" in err
    assert ("response", "http://s.example/", None) in got


def test_parse_http_response_unterminated_headers_keep_body():
    """ADVICE r12: an oversized/unterminated header block loses the
    HEADERS, not the body — raw bytes after the status line come back
    instead of b'' (the raw-bytes-fallback philosophy)."""
    # header block larger than the 64 KiB window, never terminated
    raw = (
        b"HTTP/1.1 200 OK\r\nX-Pad: " + b"a" * (70 * 1024)
        + b"\r\nX-More: v\r\nTHE BODY SURVIVES"
    )
    s, h, b = parse_http_response(raw)
    assert s == 200 and h == {}
    assert b.endswith(b"THE BODY SURVIVES") and b.startswith(b"X-Pad: ")
    # status line only, no newline at all: nothing to salvage
    assert parse_http_response(b"HTTP/1.1 204 No Content") == (204, {}, b"")


def test_http_text_of_utf32_be_bom():
    """ADVICE r12: the UTF-32 BE BOM (00 00 FE FF) joins the BOM table
    so big-endian UTF-32 pages decode instead of latin-1 mojibake."""
    body = b"\x00\x00\xfe\xff" + "café ünïcode".encode("utf-32-be")
    assert http_text_of(body, "text/plain; charset=iso-8859-1") == "café ünïcode"
    # and the LE twin still works
    import codecs

    le = codecs.BOM_UTF32_LE + "café".encode("utf-32-le")
    assert http_text_of(le, "text/plain") == "café"


def test_write_wet_mode_and_stale_parts(spark, tmp_path):
    """ADVICE r12: rerunning write_wet into a populated target must not
    leave stale part files mixing into downstream reads — default mode
    'error' refuses, 'overwrite' clears the old parts first (the
    fewer-partitions rerun is exactly the silent-mix case)."""
    from gluestick_ts_spark.sources.warc import write_wet

    out = tmp_path / "wet_modes"
    df2 = spark.createDataFrame(
        [("http://a.example/", "one"), ("http://b.example/", "two")],
        "url string, text string",
    ).repartition(2)
    write_wet(df2, str(out))
    assert len(list(out.glob("part-*.warc.gz"))) == 2
    with pytest.raises(FileExistsError, match="overwrite"):
        write_wet(df2, str(out))
    with pytest.raises(ValueError, match="mode"):
        write_wet(df2, str(out), mode="append")
    # overwrite with FEWER partitions: no stale part-00001 left behind
    df1 = spark.createDataFrame(
        [("http://c.example/", "three")], "url string, text string"
    ).coalesce(1)
    write_wet(df1, str(out), mode="overwrite")
    assert [p.name for p in sorted(out.glob("part-*"))] == ["part-00000.warc.gz"]
    back = read_warc(spark, str(out), record_types=("conversion",))
    assert [r.url for r in back.collect()] == ["http://c.example/"]


def test_write_wet_output_is_row_order_invariant(spark, tmp_path):
    """ADVICE r12: rows are sorted within each partition before
    encoding, so the SAME partition contents in a different iterator
    order produce byte-identical files — the property that makes
    speculative-attempt last-rename-wins safe."""
    from gluestick_ts_spark.sources.warc import write_wet

    rows = [(f"http://h{i}.example/", f"text {i}") for i in range(8)]
    a, b = tmp_path / "wa", tmp_path / "wb"
    df_fwd = spark.createDataFrame(rows, "url string, text string").coalesce(1)
    df_rev = spark.createDataFrame(rows[::-1], "url string, text string").coalesce(1)
    write_wet(df_fwd, str(a))
    write_wet(df_rev, str(b))
    fa, fb = a / "part-00000.warc.gz", b / "part-00000.warc.gz"
    assert fa.read_bytes() == fb.read_bytes()


def test_robots_from_warc_relation(spark, tmp_path):
    """r12: the formalized crawl->compliance bridge — /robots.txt
    response captures become the (domain, robots_text) relation
    robots_filter takes: latest-capture-wins per host, 4xx hosts drop
    (allow-all default), 5xx hosts synthesize complete disallow
    (RFC 9309 §2.3.1), page captures ignored."""
    from gluestick_ts_spark.operators.weburl import robots_from_warc, robots_filter

    def robots(host, body, status=200, date="2026-01-01T00:00:00Z"):
        rec = _capture(
            f"http://{host}/robots.txt",
            (f"HTTP/1.1 {status} X\r\nContent-Type: text/plain\r\n\r\n").encode()
            + body,
        )
        rec["warc_date"] = date
        return rec

    captures = [
        # stale capture first, fresh one later: fresh must win
        robots("site.example", b"User-agent: *\nDisallow: /\n",
               date="2026-01-01T00:00:00Z"),
        robots("site.example", b"User-agent: *\nDisallow: /private/\n",
               date="2026-02-01T00:00:00Z"),
        # 404 robots: unavailable -> allow-all -> NO relation row
        robots("gone.example", b"not found", status=404),
        # 500 robots: unreachable -> complete disallow row
        robots("down.example", b"oops", status=500),
        # an ordinary page capture is not a policy
        _capture("http://site.example/page", _http(_HTML)),
    ]
    wdir = tmp_path / "crawl_rb"
    wdir.mkdir()
    (wdir / "c.warc.gz").write_bytes(warc_encode(captures))

    rel = robots_from_warc(read_warc(spark, str(wdir)))
    got = {r.domain: r.robots_text for r in rel.collect()}
    assert set(got) == {"site.example", "down.example"}
    assert "Disallow: /private/" in got["site.example"]  # latest won
    assert got["down.example"] == "User-agent: *\nDisallow: /"

    # and the relation drives robots_filter end-to-end
    urls = spark.createDataFrame(
        [
            (0, "http://site.example/ok"),
            (1, "http://site.example/private/x"),
            (2, "http://gone.example/anything"),   # 404 robots -> allow
            (3, "http://down.example/anything"),   # 500 robots -> disallow
        ],
        "doc_id long, url string",
    )
    verdicts = {
        r.doc_id: r.robots_ok for r in robots_filter(urls, rel, "url").collect()
    }
    assert verdicts == {0: True, 1: False, 2: True, 3: False}
