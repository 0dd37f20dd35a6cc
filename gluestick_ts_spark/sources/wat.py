"""WAT metadata sidecar — Common Crawl's per-capture metadata format
(one WARC ``metadata`` record per original capture, payload an
``application/json`` "Envelope" describing the capture: target URI,
HTTP status, extracted title and outlinks). The third member of the
crawl artifact family (WARC = captures, WET = extracted text, WAT =
metadata), rounding out ``sources/warc.py``/``write_wet``.

Why WAT matters at 100 TB: the LINK GRAPH. Building outlink edges
from raw WARC means decoding every HTML body; the published WAT files
carry the links pre-extracted at ~1/10 the bytes, so graph work
(frontier expansion, domain-level link counts, centrality signals for
curation) reads WAT, never WARC. This module both GENERATES the
envelope subset from a crawl frame (``wat_from_warc`` — pure Column
algebra, the CC field names verbatim so real tooling reads our files)
and PARSES real WAT files (``read_wat`` — ``from_json`` over the
metadata records, JVM-side; unknown envelope fields are ignored, so
actual Common Crawl WAT parses with the same subset schema).

100 TB shape: generation is map-only over the crawl frame (regex link
extraction in-row, one ``to_json`` per row); parsing is the
``read_warc`` container grain plus one JVM ``from_json``; the links
explode (``wat_links``) multiplies rows by out-degree — short strings
only, the classic cheap-relation shape for the downstream graph
shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .warc import read_warc, write_wet

__all__ = [
    "wat_from_warc",
    "write_wat",
    "read_wat",
    "wat_links",
    "WAT_ENVELOPE_SCHEMA",
]

# the envelope SUBSET both sides speak — real Common Crawl WAT carries
# much more (headers maps, meta tags, scripts); from_json ignores what
# the schema doesn't name, so actual WAT files parse with this too
WAT_ENVELOPE_SCHEMA = (
    "STRUCT<Envelope: STRUCT<"
    "`WARC-Header-Metadata`: STRUCT<`WARC-Target-URI`: STRING, "
    "`WARC-Date`: STRING>, "
    "`Payload-Metadata`: STRUCT<`HTTP-Response-Metadata`: STRUCT<"
    "`Response-Message`: STRUCT<Status: STRING>, "
    "`Headers`: STRUCT<`Content-Type`: STRING>, "
    "`HTML-Metadata`: STRUCT<"
    "Head: STRUCT<Title: STRING>, "
    "Links: ARRAY<STRUCT<path: STRING, url: STRING>>>>>>>"
)

# anchor-href extraction: the dominant link kind (WAT's A@/href path);
# Java-dialect regex, in-row
_HREF_RE = r"""(?i)<a[^>]+href\s*=\s*["']([^"'<>]+)["']"""
_TITLE_RE = r"(?is)<title[^>]*>(.*?)</title>"


def wat_from_warc(
    warc_df: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    status_col: str = "http_status",
    mime_col: str = "http_content_type",
    date_col: str = "warc_date",
) -> DataFrame:
    """Generate the WAT envelope subset from a ``read_warc`` frame:
    one ``(url, warc_date, wat)`` row per capture with a non-null
    body, the ``wat`` column the envelope JSON (CC field names
    verbatim — target URI, date, HTTP status, Content-Type, extracted
    ``<title>``, and ``A@/href`` outlinks). Pure in-row Column algebra
    (regex extraction + ``to_json``) — generating WAT for a crawl is
    map-only at any scale. Write with :func:`write_wat`; parse back
    (or parse the real published files) with :func:`read_wat`."""
    x = F.col(text_col)
    # SQL-literal-safe pattern: backslashes and single quotes escaped
    # for the parser (the pattern itself is unchanged)
    href_sql = _HREF_RE.replace("\\", "\\\\").replace("'", "\\'")
    links = F.transform(
        F.expr(f"regexp_extract_all({text_col}, '{href_sql}', 1)"),
        lambda u: F.struct(
            F.lit("A@/href").alias("path"), u.alias("url")
        ),
    )
    title = F.nullif(
        F.trim(F.regexp_extract(x, _TITLE_RE, 1)), F.lit("")
    )
    envelope = F.struct(
        F.struct(
            F.struct(
                F.col(url_col).alias("WARC-Target-URI"),
                F.col(date_col).alias("WARC-Date"),
            ).alias("WARC-Header-Metadata"),
            F.struct(
                F.struct(
                    F.struct(
                        F.col(status_col).cast("string").alias("Status")
                    ).alias("Response-Message"),
                    F.struct(
                        F.col(mime_col).alias("Content-Type")
                    ).alias("Headers"),
                    F.struct(
                        F.struct(title.alias("Title")).alias("Head"),
                        links.alias("Links"),
                    ).alias("HTML-Metadata"),
                ).alias("HTTP-Response-Metadata")
            ).alias("Payload-Metadata"),
        ).alias("Envelope")
    )
    return warc_df.where(x.isNotNull()).select(
        F.col(url_col).alias("url"),
        F.col(date_col).alias("warc_date"),
        F.to_json(envelope, {"ignoreNullFields": "true"}).alias("wat"),
    )


def write_wat(
    df: DataFrame,
    path: str,
    url_col: str = "url",
    wat_col: str = "wat",
    date_col: str | None = "warc_date",
    per_record_gzip: bool = True,
    mode: str = "error",
) -> None:
    """Write envelope rows (:func:`wat_from_warc`'s shape) as WARC
    ``metadata`` records of ``application/json`` payloads — the
    published WAT layout. Same executor-side multi-member sink as
    ``write_wet`` (one part per partition, attempt-invariant bytes,
    mode=error/overwrite)."""
    write_wet(
        df,
        path,
        url_col=url_col,
        text_col=wat_col,
        date_col=date_col,
        per_record_gzip=per_record_gzip,
        mode=mode,
        record_type="metadata",
        payload_content_type="application/json",
    )


def read_wat(spark: SparkSession, path: str) -> DataFrame:
    """Distributed WAT reader: metadata records under ``path`` parsed
    to ``(wat_file, url, warc_date, status, mime, title, links)`` —
    ``links`` an ``array<struct<path,url>>``. The envelope parse is
    ONE JVM ``from_json`` against the subset schema (real Common Crawl
    WAT carries more fields; they are ignored), so the only Python in
    the plan is the container walk ``read_warc`` already pays.
    Unparseable envelopes keep their row with null fields — the
    labeled-not-fatal contract."""
    recs = read_warc(
        spark, path, record_types=("metadata",),
        emit_text=True, emit_payload=False,
    )
    j = F.from_json(F.col("text"), WAT_ENVELOPE_SCHEMA)
    env = j.getField("Envelope")
    hdr = env.getField("WARC-Header-Metadata")
    http = env.getField("Payload-Metadata").getField("HTTP-Response-Metadata")
    html = http.getField("HTML-Metadata")
    return recs.select(
        F.col("warc_file"),
        F.coalesce(
            hdr.getField("WARC-Target-URI"), F.col("url")
        ).alias("url"),
        F.coalesce(
            hdr.getField("WARC-Date"), F.col("warc_date")
        ).alias("warc_date"),
        http.getField("Response-Message").getField("Status")
        .cast("int").alias("status"),
        http.getField("Headers").getField("Content-Type").alias("mime"),
        html.getField("Head").getField("Title").alias("title"),
        F.coalesce(
            html.getField("Links"),
            F.expr("CAST(array() AS ARRAY<STRUCT<path: STRING, url: STRING>>)"),
        ).alias("links"),
        F.col("error"),
    )


def wat_links(
    wat_df: DataFrame, path_filter: str | None = "A@/href"
) -> DataFrame:
    """The link-graph edge list from parsed WAT rows: one
    ``(source_url, url, path)`` row per outlink (``path_filter``
    restricts to one link kind — anchors by default; ``None`` keeps
    all). Feed into frontier planning (``operators/weburl.py``
    normalize/dedup/blocklist/caps) or domain-level graph aggregates —
    short-string rows, the cheap-relation shape."""
    out = wat_df.select(
        F.col("url").alias("source_url"),
        F.explode("links").alias("__l"),
    ).select(
        "source_url",
        F.col("__l.url").alias("url"),
        F.col("__l.path").alias("path"),
    )
    if path_filter is not None:
        out = out.where(F.col("path") == path_filter)
    return out
