"""WARC crawl-container source — the ingest format of the actual
100 TB story (Common Crawl ships as ``*.warc.gz``), which the
reference's CSV/parquet ``Reader`` (src/reader.ts) has no analog for.
Pure stdlib against the public ISO 28500 / WARC 1.1 spec + RFC 7230
HTTP framing; no warcio.

- ``parse_warc_records``: tolerant record walker over one container's
  bytes (plain, per-record gzip members — the spec's recommended
  layout, which is what makes .warc.gz independently seekable — or a
  single whole-file gzip stream, seen in the wild). Header folding,
  bare-LF tolerance, mandatory Content-Length framing; mid-file
  corruption stops THAT file and surfaces as one labeled ``_error``
  row instead of a task failure (the media codecs' labeled-fake
  philosophy: a 100k-file crawl read must never die on file 73 201).
- ``parse_http_response``: splits a response record's raw HTTP capture
  into (status, headers, body), undoing ``Transfer-Encoding: chunked``
  and ``Content-Encoding: gzip/deflate`` — real crawl captures carry
  both — with tolerant fall-back to the raw bytes when the framing
  lies.
- ``http_text_of``: charset-aware body decode (header charset ->
  HTML meta sniff -> UTF-8 -> Latin-1 lossy; never raises) for
  text/* and */html|xml|json payloads.
- ``read_warc``: the distributed reader — ``binaryFile`` scan +
  Arrow ``mapInPandas``, ONE task per container file, which is the
  standard crawl-processing grain (Common Crawl segments are ~1 GB
  and arrive 64 000 files per dump — parallelism comes from the file
  count, not intra-file splits; a gzip stream can't split anyway).
  Record-type filtering and ``max_payload_bytes`` truncation happen
  INSIDE the parse loop, so skipped types' HTTP bytes are never
  parsed and oversized bodies never reach the Arrow batch.
- ``warc_encode``: deterministic fixture writer (the codec modules'
  pattern) emitting spec-shaped records, per-record-gzip or plain.
- ``write_wet``: the inverse sink — extracted text back out as WARC
  ``conversion`` records (Common Crawl's WET sidecar layout), one
  multi-member ``.warc.gz`` per partition, executor-side.

100 TB shape: payload bytes live only between the file scan and the
mapInPandas output row (project ``text`` and drop ``payload`` before
any shuffle); the output is partitioned by input file, so downstream
per-record work (curation, dedup hashing) starts map-only with no
exchange.
"""

from __future__ import annotations

import gzip
import io
import re
import zlib
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "parse_warc_records",
    "parse_http_response",
    "http_text_of",
    "read_warc",
    "read_warc_stream",
    "warc_encode",
    "write_wet",
    "WARC_SCHEMA",
]

# guards against hostile/corrupt containers (the _MAX_PIXELS pattern):
# a crafted Content-Length or gzip bomb must cap out, not OOM a worker
_MAX_HEADER_BYTES = 64 * 1024
_MAX_DECOMPRESS_BYTES = 1 << 30
# feed size for incremental gzip decode: bounds the per-step copy so a
# 1 GB container of 50k per-record members costs O(container) total
# memcpy, not O(members x container) (the naive data[pos:] slicing)
_GZ_FEED = 4 << 20


def _capped_decompress(d, feed: bytes, total: int, where: int) -> tuple[list, int]:
    """Feed one chunk into decompressobj ``d`` honoring the global
    output cap (zlib's max_length is an OUTPUT limit per call —
    looping over ``unconsumed_tail`` is what makes it a real cap).
    Returns (pieces, new_total); raises ValueError at the cap."""
    pieces = []
    while True:
        remaining = _MAX_DECOMPRESS_BYTES - total
        if remaining <= 0:
            raise ValueError(f"gzip member at {where} exceeds decompress cap")
        piece = d.decompress(feed, remaining)
        total += len(piece)
        if piece:
            pieces.append(piece)
        if d.unconsumed_tail and not d.eof:
            feed = d.unconsumed_tail
            continue
        return pieces, total


def _gzip_members(data: bytes) -> Iterator[bytes]:
    """Decompress a (possibly multi-member) gzip stream, yielding one
    bytes blob per member — per-record gzip gives one record per
    member; whole-file gzip gives a single member holding them all.
    Incremental feeding (``_GZ_FEED`` slices off a memoryview) keeps
    total copying linear in the container size regardless of member
    count. Raises ValueError on corrupt streams or a decompression
    bomb (hard ``_MAX_DECOMPRESS_BYTES`` output cap per member)."""
    for _off, _length, blob in _gzip_member_slices(data):
        yield blob


def _gzip_member_slices(data: bytes) -> Iterator[tuple[int, int, bytes]]:
    """Like :func:`_gzip_members` but yields ``(compressed_offset,
    compressed_length, member_bytes)`` — the COMPRESSED extent of each
    member in the container, which is exactly what a CDX index records
    (``sources/cdx.py``): a ranged fetch seeks ``offset``, reads
    ``length`` bytes, and gunzips one member without touching the rest
    of the file."""
    mv = memoryview(data)
    n = len(data)
    pos = 0
    while pos < n:
        d = zlib.decompressobj(wbits=31)
        out: list = []
        total = 0
        p = pos
        try:
            while not d.eof:
                if p >= n:
                    raise ValueError(f"truncated gzip member at {pos}")
                chunk = bytes(mv[p : p + _GZ_FEED])
                p += len(chunk)
                pieces, total = _capped_decompress(d, chunk, total, pos)
                out.extend(pieces)
        except zlib.error as e:
            raise ValueError(f"corrupt gzip member at {pos}: {e}") from e
        # rewind the final chunk's unread tail (post-member bytes)
        p -= len(d.unused_data)
        if p <= pos:  # defensive: no forward progress
            raise ValueError(f"gzip stream stalled at {pos}")
        yield pos, p - pos, b"".join(out)
        pos = p


def _hdr_end(buf: bytes, start: int) -> tuple[int, int]:
    """Locate the header-block terminator from ``start``: the EARLIER
    of CRLFCRLF / LFLF within the header window (a bare-LF WARC record
    can hold a CRLF HTTP capture in its body — searching CRLF first
    across the whole window would frame on the HTTP headers instead).
    Returns (index, separator_len); (-1, 0) when absent."""
    crlf = buf.find(b"\r\n\r\n", start, start + _MAX_HEADER_BYTES)
    lf = buf.find(b"\n\n", start, start + _MAX_HEADER_BYTES)
    if crlf < 0 and lf < 0:
        return -1, 0
    if lf < 0 or (0 <= crlf < lf):
        return crlf, 4
    return lf, 2


def _split_headers(block: bytes) -> dict[str, str]:
    """Parse a WARC or HTTP header block (sans first line) into a
    lower-cased dict, honoring RFC folding continuations."""
    headers: dict[str, str] = {}
    last = None
    for raw in block.split(b"\n"):
        line = raw.rstrip(b"\r")
        if not line:
            continue
        if line[:1] in (b" ", b"\t") and last is not None:
            headers[last] += " " + line.strip().decode("latin-1")
            continue
        name, sep, value = line.partition(b":")
        if not sep:
            continue  # tolerate junk header lines
        last = name.strip().decode("latin-1").lower()
        headers[last] = value.strip().decode("latin-1")
    return headers


def parse_warc_records(data: bytes) -> Iterator[dict]:
    """Walk one WARC container's bytes (gzip'd or plain — sniffed),
    yielding per-record dicts: ``offset, warc_type, url, warc_date,
    record_id, content_type, truncated, body`` (the record content
    block, raw). ``truncated`` reflects the spec's ``WARC-Truncated``
    header (Common Crawl caps captures at 1 MB and tags them).

    Tolerant by contract: corruption (bad magic, missing
    Content-Length, short content) yields ONE final ``{"warc_type":
    "_error", "error": ...}`` dict and stops — parse what's parseable,
    label the rest."""
    try:
        if data[:2] == b"\x1f\x8b":
            chunks = _gzip_members(bytes(data))
        else:
            chunks = iter([bytes(data)])
        member_off = 0
        for chunk in chunks:
            for rec in _walk_chunk(chunk):
                rec["offset"] = member_off + rec.pop("chunk_offset")
                del rec["chunk_end"]
                yield rec
            member_off += len(chunk)
    except ValueError as e:
        yield {"warc_type": "_error", "error": str(e)}


def _walk_chunk(chunk: bytes) -> Iterator[dict]:
    """Walk the WARC records of ONE decompressed chunk (a gzip member
    or a plain container), yielding record dicts with CHUNK-RELATIVE
    ``chunk_offset``/``chunk_end`` byte extents — the shared core of
    :func:`parse_warc_records` and the CDX indexer
    (``sources/cdx.py``), which needs in-chunk extents to make ranged
    fetches land exactly on a record. Raises ValueError on corruption
    (callers decide the labeled-``_error`` policy)."""
    pos = 0
    while pos < len(chunk):
        # skip inter-record blank lines (spec: 2 CRLF trailers)
        while pos < len(chunk) and chunk[pos : pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= len(chunk):
            break
        if not chunk[pos : pos + 5] == b"WARC/":
            raise ValueError(f"bad record magic at offset {pos}")
        hdr_end, sep = _hdr_end(chunk, pos)
        if hdr_end < 0:
            raise ValueError(f"unterminated header block at {pos}")
        first_nl = chunk.index(b"\n", pos)
        headers = _split_headers(chunk[first_nl + 1 : hdr_end])
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            raise ValueError(f"missing/bad Content-Length at {pos}")
        if length < 0:
            raise ValueError(f"negative Content-Length at {pos}")
        body_at = hdr_end + sep
        if body_at + length > len(chunk):
            raise ValueError(f"record at {pos} overruns container")
        yield {
            "chunk_offset": pos,
            "chunk_end": body_at + length,
            "warc_type": headers.get("warc-type", ""),
            "url": headers.get("warc-target-uri"),
            "warc_date": headers.get("warc-date"),
            "record_id": headers.get("warc-record-id"),
            "content_type": headers.get("content-type"),
            "truncated": "warc-truncated" in headers,
            "payload_digest": headers.get("warc-payload-digest"),
            "body": chunk[body_at : body_at + length],
        }
        pos = body_at + length


def _dechunk(body: bytes) -> bytes:
    """Undo HTTP/1.1 chunked transfer framing (RFC 7230 §4.1).
    Raises ValueError on broken framing."""
    out = []
    pos = 0
    while True:
        nl = body.find(b"\n", pos)
        if nl < 0:
            raise ValueError("chunked body: missing size line")
        size_line = body[pos:nl].rstrip(b"\r")
        size = int(size_line.split(b";")[0], 16)  # ignore chunk extensions
        if size < 0:  # int(b'-1', 16) parses; negative slicing corrupts
            raise ValueError("chunked body: negative chunk size")
        pos = nl + 1
        if size == 0:
            return b"".join(out)  # trailers, if any, are dropped
        if pos + size > len(body):
            raise ValueError("chunked body: chunk overruns payload")
        out.append(body[pos : pos + size])
        pos += size
        while body[pos : pos + 1] in (b"\r", b"\n"):
            pos += 1


def parse_http_response(raw: bytes) -> tuple[int | None, dict[str, str], bytes]:
    """Split a response record's raw HTTP capture into ``(status,
    headers, body)``, undoing chunked transfer framing and
    gzip/deflate content encoding. Tolerant: if the status line isn't
    HTTP, returns ``(None, {}, raw)`` (resource/conversion records
    store bare payloads); if the declared framing/encoding is broken,
    the RAW body bytes come back rather than an exception — a crawl
    holds every lie a webserver ever told."""
    m = re.match(rb"HTTP/\d(?:\.\d)? +(\d{3})", raw[:32])
    if not m:
        return None, {}, raw
    status = int(m.group(1))
    hdr_end, sep = _hdr_end(raw, 0)
    if hdr_end < 0:
        # header block oversized (> _MAX_HEADER_BYTES) or unterminated:
        # the raw-bytes-fallback philosophy says lose the HEADERS, not
        # the body — return everything after the status line undecoded
        # rather than silently discarding the capture
        nl = raw.find(b"\n")
        return status, {}, raw[nl + 1 :] if nl >= 0 else b""
    first_nl = raw.index(b"\n")
    headers = _split_headers(raw[first_nl + 1 : hdr_end])
    body = raw[hdr_end + sep :]
    if "chunked" in headers.get("transfer-encoding", "").lower():
        try:
            body = _dechunk(body)
        except (ValueError, IndexError):
            pass  # tolerate broken framing: raw bytes beat a dead task
    enc = headers.get("content-encoding", "").lower().strip()
    if enc in ("gzip", "x-gzip", "deflate"):
        # capped incremental decode: a bombed body that would exceed
        # _MAX_DECOMPRESS_BYTES falls back to the (small) raw bytes —
        # zlib.decompress's bufsize is an INITIAL allocation, not a
        # cap, so the naive call both preallocated 1 GiB and let a
        # few-KB bomb expand without limit
        for wbits in ((15, -15) if enc == "deflate" else (31,)):
            try:
                d = zlib.decompressobj(wbits=wbits)
                pieces, _total = _capped_decompress(d, body, 0, 0)
                if d.eof or not d.unused_data:
                    body = b"".join(pieces)
                    break
            except (ValueError, zlib.error):
                continue  # next wbits flavor, else raw fallback
    return status, headers, body


_META_CHARSET = re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?([A-Za-z0-9_.:\-]+)""", re.I
)


def http_text_of(
    body: bytes, content_type: str | None, max_chars: int | None = None
) -> str | None:
    """Decode a textual HTTP body to str; None for non-text content
    types. Charset resolution order: byte-order mark (a BOM is the
    document's own first-party declaration — UTF-8/16/32 pages whose
    headers claim something else are a standing crawl reality and
    decode to mojibake without it) -> Content-Type header param ->
    HTML ``<meta charset=...>`` sniff (first 4 KB) -> UTF-8 ->
    Latin-1 with replacement (total — never raises; a crawl's charset
    labels are wrong constantly and a lossy decode beats a dead
    task). The BOM itself is consumed by the matching codec."""
    ct = (content_type or "").lower()
    if not (
        ct.startswith("text/")
        or "html" in ct
        or "xml" in ct
        or "json" in ct
        or "javascript" in ct
    ):
        return None
    charsets = []
    # order matters: UTF-32 LE BOMs start with the UTF-16 LE BOM bytes
    # (UTF-32 BE starts with NULs — order-independent, listed with its
    # endian twin for symmetry)
    for bom, cs in (
        (b"\xef\xbb\xbf", "utf-8-sig"),
        (b"\xff\xfe\x00\x00", "utf-32"),
        (b"\x00\x00\xfe\xff", "utf-32"),
        (b"\xfe\xff", "utf-16"),
        (b"\xff\xfe", "utf-16"),
    ):
        if body.startswith(bom):
            charsets.append(cs)
            break
    m = re.search(r"charset\s*=\s*[\"']?([A-Za-z0-9_.:\-]+)", ct)
    if m:
        charsets.append(m.group(1))
    m2 = _META_CHARSET.search(body[:4096])
    if m2:
        charsets.append(m2.group(1).decode("latin-1"))
    charsets.append("utf-8")
    for cs in charsets:
        try:
            text = body.decode(cs)
            break
        except (UnicodeDecodeError, LookupError):
            continue
    else:
        text = body.decode("latin-1", errors="replace")
    return text[:max_chars] if max_chars is not None else text


WARC_SCHEMA = (
    "warc_file string, record_offset long, warc_type string, url string, "
    "warc_date string, record_id string, content_type string, "
    "http_status int, http_content_type string, payload binary, "
    "text string, truncated boolean, error string"
)


def _binary_file_max_length(spark: SparkSession) -> int:
    """Spark's ``binaryFile`` per-file ceiling
    (``spark.sql.sources.binaryFile.maxLength``, default Int.MaxValue —
    the source's content column is one JVM byte array, so a file past
    it THROWS in the task). The readers filter on it so an oversized
    container becomes a labeled ``_error`` row instead of a job
    failure."""
    try:
        return int(spark.conf.get("spark.sql.sources.binaryFile.maxLength"))
    except Exception:
        return (1 << 31) - 1


def _oversized_error_rows(files: DataFrame, max_len: int) -> DataFrame:
    """``WARC_SCHEMA``-shaped labeled ``_error`` rows for containers
    the binaryFile source cannot load (``length > max_len``). Built
    from the scan's METADATA columns only — selecting path/length
    never reads file content, so the length ceiling can't throw — and
    fully distributed (no driver collect: 'rare' is a hope, not a
    bound)."""
    from pyspark.sql import functions as F

    null = lambda t: F.lit(None).cast(t)  # noqa: E731
    return files.where(F.col("length") > max_len).select(
        F.col("path").alias("warc_file"),
        null("long").alias("record_offset"),
        F.lit("_error").alias("warc_type"),
        null("string").alias("url"),
        null("string").alias("warc_date"),
        null("string").alias("record_id"),
        null("string").alias("content_type"),
        null("int").alias("http_status"),
        null("string").alias("http_content_type"),
        null("binary").alias("payload"),
        null("string").alias("text"),
        null("boolean").alias("truncated"),
        F.concat(
            F.lit("container length "),
            F.col("length").cast("string"),
            F.lit(
                " exceeds the binaryFile source ceiling "
                f"(spark.sql.sources.binaryFile.maxLength={max_len}); "
                "split the container or raise the ceiling"
            ),
        ).alias("error"),
    )


def read_warc(
    spark: SparkSession,
    path: str,
    record_types: tuple[str, ...] = ("response",),
    emit_text: bool = True,
    emit_payload: bool = True,
    max_payload_bytes: int = 8 * 1024 * 1024,
    max_text_chars: int | None = None,
) -> DataFrame:
    """Distributed WARC reader: one row per selected record across
    every container under ``path`` (a dir, a glob, or one file;
    ``.warc`` and ``.warc.gz`` both sniffed per-file).

    Columns (``WARC_SCHEMA``): capture identity (file/offset/type/
    url/date/record-id/WARC content-type), the split HTTP view
    (status + Content-Type for response records), the body
    (``payload`` raw bytes, ``text`` charset-decoded for textual
    types — each independently droppable via ``emit_payload`` /
    ``emit_text`` so a text-only curation read never moves image
    bytes), a ``truncated`` flag (WARC-Truncated header OR our
    ``max_payload_bytes`` cap fired), and ``error`` (NULL for good
    rows; a corrupt container contributes its parseable prefix plus
    one labeled ``_error`` row instead of failing the job).

    Scale: parallelism = container-file count (the Common Crawl
    grain: ~64k files/dump); non-selected record types are skipped
    before HTTP parsing; bodies above the cap truncate. Project away
    ``payload`` before any shuffle — the scan is the only place the
    raw bytes should exist.

    Robustness: a container past the binaryFile source's per-file
    ceiling (``spark.sql.sources.binaryFile.maxLength``, default
    Int.MaxValue ≈ 2 GiB — Common Crawl targets ~1 GiB but IA /
    uncapped heritrix archives routinely exceed it) would THROW in
    the task and fail the whole job; here the scan filters on the
    (pushed-down) ``length`` metadata column so oversized files are
    never content-read, and each surfaces as one labeled ``_error``
    row instead — the same never-die contract as mid-file
    corruption."""
    if not record_types:
        raise ValueError("record_types must name at least one WARC type")
    from pyspark.sql import functions as F

    files = spark.read.format("binaryFile").load(path)
    max_len = _binary_file_max_length(spark)
    # length <= ceiling pushes down to the binaryFile scan (the source
    # supports metadata filter pushdown), so oversized files are
    # skipped BEFORE the content read that would throw
    good = (
        files.where(F.col("length") <= max_len)
        .select("path", "content")
        .mapInPandas(
            _warc_mapper(
                record_types, emit_text, emit_payload, max_payload_bytes,
                max_text_chars,
            ),
            schema=WARC_SCHEMA,
        )
    )
    return good.unionByName(_oversized_error_rows(files, max_len))


def read_warc_stream(
    spark: SparkSession,
    path: str,
    record_types: tuple[str, ...] = ("response",),
    emit_text: bool = True,
    emit_payload: bool = True,
    max_payload_bytes: int = 8 * 1024 * 1024,
    max_text_chars: int | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Structured-Streaming twin of :func:`read_warc`: a continuously
    arriving crawl (new ``.warc.gz`` segments landing in a directory —
    exactly how crawls are delivered) becomes a STREAMING DataFrame of
    the same ``WARC_SCHEMA`` rows. The file source's checkpoint gives
    exactly-once per container file; the record parse is the SAME
    stateless Arrow mapper the batch reader uses, so batch and stream
    rows are identical for identical bytes. Compose downstream with
    the streaming curation family (``stream_curation_filter`` takes
    the extracted text column) or any ``writeStream`` sink.
    ``max_files_per_trigger`` bounds a micro-batch (containers are
    ~1 GB each — admission control is per-file here).

    Oversized containers (past ``spark.sql.sources.binaryFile.
    maxLength``) surface as labeled ``_error`` rows exactly like the
    batch reader — the length filter keeps the content read from ever
    throwing, so a continuously running crawl ingest survives the one
    bad segment."""
    if not record_types:
        raise ValueError("record_types must name at least one WARC type")
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    bin_schema = T.StructType(
        [
            T.StructField("path", T.StringType()),
            T.StructField("modificationTime", T.TimestampType()),
            T.StructField("length", T.LongType()),
            T.StructField("content", T.BinaryType()),
        ]
    )
    reader = spark.readStream.format("binaryFile").schema(bin_schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    files = reader.load(path)
    max_len = _binary_file_max_length(spark)
    good = (
        files.where(F.col("length") <= max_len)
        .select("path", "content")
        .mapInPandas(
            _warc_mapper(
                record_types, emit_text, emit_payload, max_payload_bytes,
                max_text_chars,
            ),
            schema=WARC_SCHEMA,
        )
    )
    # self-union of one streaming source: both arms share the file
    # listing; the checkpoint tracks each arm's offsets independently
    return good.unionByName(_oversized_error_rows(files, max_len))


def _record_row(
    fname,
    offset,
    rec: dict,
    emit_text: bool,
    emit_payload: bool,
    max_payload_bytes: int,
    max_text_chars: int | None,
) -> tuple:
    """One parsed record dict -> one ``WARC_SCHEMA`` row tuple — the
    shared conversion behind ``read_warc`` / ``read_warc_stream`` and
    the CDX ranged fetch (``sources/cdx.py``), so a record fetched by
    index is byte-identical to the same record read by full scan."""
    body = rec["body"]
    status = None
    http_ct = None
    ctype = (rec["content_type"] or "").lower()
    if ctype.startswith("application/http"):
        status, hh, body = parse_http_response(body)
        http_ct = hh.get("content-type")
    else:
        http_ct = rec["content_type"]
    capped = len(body) > max_payload_bytes
    if capped:
        body = body[:max_payload_bytes]
    text = http_text_of(body, http_ct, max_text_chars) if emit_text else None
    return (
        fname,
        offset,
        rec["warc_type"],
        rec["url"],
        rec["warc_date"],
        rec["record_id"],
        rec["content_type"],
        status,
        http_ct,
        body if emit_payload else None,
        text,
        bool(rec["truncated"] or capped),
        None,
    )


def _warc_mapper(
    record_types: tuple[str, ...],
    emit_text: bool,
    emit_payload: bool,
    max_payload_bytes: int,
    max_text_chars: int | None,
):
    """The shared batch/stream Arrow mapper behind ``read_warc`` /
    ``read_warc_stream`` (one parse implementation, two scan kinds)."""
    want = {t.lower() for t in record_types}

    def _parse(batches):
        import pandas as pd

        cols = [
            "warc_file", "record_offset", "warc_type", "url",
            "warc_date", "record_id", "content_type", "http_status",
            "http_content_type", "payload", "text", "truncated",
            "error",
        ]
        for pdf in batches:
            # one output frame PER FILE: an Arrow batch can hold many
            # ~1 GB containers, and accumulating every file's payload
            # rows into one frame multiplies peak memory by the batch's
            # file count — the exact buildup the module's scale note
            # forbids
            for fname, blob in zip(pdf["path"], pdf["content"]):
                rows = []
                for rec in parse_warc_records(bytes(blob)):
                    if rec["warc_type"] == "_error":
                        rows.append(
                            (fname, None, "_error", None, None, None, None,
                             None, None, None, None, None, rec["error"])
                        )
                        continue
                    if rec["warc_type"].lower() not in want:
                        continue
                    rows.append(
                        _record_row(
                            fname, rec["offset"], rec, emit_text,
                            emit_payload, max_payload_bytes, max_text_chars,
                        )
                    )
                if rows:
                    yield pd.DataFrame(rows, columns=cols)

    return _parse


def warc_encode(records: list[dict], per_record_gzip: bool = True) -> bytes:
    """Deterministic WARC fixture writer (the codec modules' pattern —
    fixtures come from our own spec-shaped encoder, not vendored
    binaries). Each record dict: ``warc_type`` (required), ``body``
    bytes (default empty), and optional ``url``, ``warc_date``,
    ``record_id``, ``content_type``, ``truncated`` (reason string).
    ``per_record_gzip=True`` emits the spec-recommended one-member-
    per-record layout; False emits the plain concatenation."""
    out = []
    for i, rec in enumerate(records):
        body = rec.get("body", b"")
        lines = [b"WARC/1.1", b"WARC-Type: " + rec["warc_type"].encode()]
        if rec.get("url"):
            lines.append(b"WARC-Target-URI: " + rec["url"].encode())
        lines.append(
            b"WARC-Date: " + rec.get("warc_date", "2026-01-01T00:00:00Z").encode()
        )
        lines.append(
            b"WARC-Record-ID: "
            + rec.get("record_id", f"<urn:uuid:rec-{i:08d}>").encode()
        )
        if rec.get("content_type"):
            lines.append(b"Content-Type: " + rec["content_type"].encode())
        if rec.get("truncated"):
            lines.append(b"WARC-Truncated: " + rec["truncated"].encode())
        lines.append(b"Content-Length: " + str(len(body)).encode())
        raw = b"\r\n".join(lines) + b"\r\n\r\n" + body + b"\r\n\r\n"
        if per_record_gzip:
            # fixed mtime + no filename: byte-deterministic fixtures
            buf = io.BytesIO()
            with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                gz.write(raw)
            raw = buf.getvalue()
        out.append(raw)
    return b"".join(out)


def write_wet(
    df,
    path: str,
    url_col: str = "url",
    text_col: str = "text",
    date_col: str | None = None,
    per_record_gzip: bool = True,
    mode: str = "error",
    record_type: str = "conversion",
    payload_content_type: str = "text/plain",
) -> None:
    """WET-style text-extraction sink: write ``(url, text)`` rows as
    WARC ``conversion`` records (the layout Common Crawl publishes its
    extracted-text sidecar files in) — ``read_warc``'s inverse, so a
    curation pipeline can emit crawl-shaped artifacts other crawl
    tooling reads back. ``record_type``/``payload_content_type``
    re-skin the same sink for other sidecar layouts (``sources/wat.py``
    writes ``metadata`` records of ``application/json`` envelopes). One ``part-<partition>.warc.gz`` per input
    partition, written executor-side: per-record gzip members
    concatenate into a valid multi-member ``.warc.gz`` (the property
    the reader's member walker exploits), so no driver collect and no
    single-file bottleneck — control output file count with the
    DataFrame's partitioning. NULL-text rows are skipped (nothing was
    extracted); ``date_col`` (a string column, default a fixed epoch)
    stamps WARC-Date. ``path`` must be a directory on a filesystem
    every executor can open POSIX-style (local dir, fuse-mounted
    object store) — the driver-side Hadoop-FS helpers are for tiny
    metadata, not record streams.

    ``mode`` is the Spark writer convention over the part files this
    sink owns (``part-NNNNN.warc[.gz]``): ``"error"`` (default)
    refuses a target that already holds parts — a rerun into the same
    path with FEWER partitions would otherwise leave stale high-
    numbered parts silently mixing into any downstream ``read_warc``
    over the directory; ``"overwrite"`` deletes the existing parts
    (both extensions, plus orphaned ``.tmp`` attempts) driver-side
    before the distributed write.

    Rows are sorted by ``(url, text)`` WITHIN each partition before
    encoding, so two speculative attempts of one partition encode
    byte-identical files even when the upstream iterator order is
    nondeterministic (a shuffle without ordering) — that determinism
    is what makes the attempts' last-rename-wins safe. Partition
    MEMBERSHIP must still be deterministic; control it with the
    DataFrame's partitioning."""
    import os

    from pyspark import TaskContext

    if mode not in ("error", "overwrite"):
        raise ValueError(f"mode must be 'error' or 'overwrite', got {mode!r}")
    os.makedirs(path, exist_ok=True)
    part_re = re.compile(r"(\.)?part-\d{5}(-a\d+)?\.warc(\.gz)?(\.tmp)?$")
    existing = [f for f in os.listdir(path) if part_re.fullmatch(f)]
    if existing:
        if mode == "error":
            raise FileExistsError(
                f"write_wet target {path!r} already holds "
                f"{len(existing)} part file(s); pass mode='overwrite' "
                "to replace them (a rerun with fewer partitions would "
                "otherwise leave stale parts mixing into reads)"
            )
        for f in existing:
            os.remove(os.path.join(path, f))
    cols = [url_col, text_col] + ([date_col] if date_col else [])
    ext = ".warc.gz" if per_record_gzip else ".warc"

    def _write(rows):
        recs = []
        for row in rows:
            if row[text_col] is None:
                continue
            rec = {
                "warc_type": record_type,
                "url": row[url_col],
                "content_type": payload_content_type,
                "body": str(row[text_col]).encode("utf-8"),
            }
            if date_col and row[date_col] is not None:
                rec["warc_date"] = str(row[date_col])
            recs.append(rec)
        if not recs:
            return
        # in-partition sort: attempt-invariant byte output (see the
        # docstring's speculative-execution note)
        recs.sort(key=lambda r: (r.get("url") or "", r["body"]))
        ctx = TaskContext.get()
        pid = ctx.partitionId()
        # attempt number in the TMP name: under speculative execution
        # two live attempts of one partition must not write the same
        # tmp file; both rename to the same final name and the content
        # is identical (deterministic encode of the same sorted rows),
        # so last-rename-wins is safe
        tmp = os.path.join(
            path, f".part-{pid:05d}-a{ctx.attemptNumber()}{ext}.tmp"
        )
        with open(tmp, "wb") as f:
            f.write(warc_encode(recs, per_record_gzip=per_record_gzip))
        # rename-into-place: a killed task never leaves a half record
        os.replace(tmp, os.path.join(path, f"part-{pid:05d}{ext}"))

    df.select(*cols).foreachPartition(_write)
