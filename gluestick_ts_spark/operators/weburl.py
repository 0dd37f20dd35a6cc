"""URL-grain dedup + per-domain caps — RefinedWeb's FIRST pipeline
stage (Penedo et al. 2023 run URL dedup/filtering before any content
stage, because it prunes re-crawls for the price of a short-key
shuffle, never touching document text).

Scale-extension operators (SURVEY §2.2 "Extensions"; the reference has
no web-corpus operators — no parity target):

- ``normalize_url_expr``: canonical URL key, pure in-row regex algebra
  (lowercase scheme+host, strip default port / ``www.`` / fragment /
  tracking params / trailing slash). Engine-portable: every pattern is
  in the Java∩RE2 regex subset (the PII-redaction precedent), so a SQL
  oracle restates it verbatim (DuckDB needs the ``'g'`` flag where
  Spark's ``regexp_replace`` is global by default).
- ``registered_domain_expr``: the crawl-politeness grouping key —
  TRUE eTLD+1 against a bounded public-suffix snapshot
  (``operators/psl.py``; pass the full production list via
  ``parse_psl_rules``), so ``a.co.uk``/``b.co.uk`` cap independently.
  Compiles to in-row ``IN`` lists — no join, no UDF.
- ``url_dedup_flag`` / ``url_dedup``: keep-first by normalized URL
  (lowest id wins — deterministic, partitioning-invariant). ONE
  short-key hash shuffle on the normalized URL; document text never
  moves.
- ``domain_cap_flag``: keep at most ``cap`` documents per registered
  domain, chosen by seeded md5 order (``epoch_shuffle_expr``'s trick:
  the SAME deterministic pseudo-random ``cap`` docs per domain on
  every run, engine, and partition layout — not "whichever arrived
  first"). ONE short-key shuffle on the domain.

100 TB shape: both windows partition by a short derived key whose
cardinality grows with the corpus (URLs, domains), so AQE splits any
skewed host; no driver collect, no join, no text movement anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "normalize_url_expr",
    "registered_domain_expr",
    "url_dedup_flag",
    "url_dedup",
    "url_dedup_incremental",
    "domain_cap_flag",
    "domain_blocklist_flag",
    "parse_robots_rules",
    "robots_pattern_sql_regex",
    "robots_filter",
    "robots_from_warc",
    "sitemaps_from_robots",
    "sitemap_locs_expr",
    "sitemap_is_index_expr",
    "sitemap_urls_from_warc",
]

# scheme://authority (userinfo@host:port) — the case-insensitive part
_SCHEME_HOST = r"^([A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*)"
_TRACKING = r"([?&])(utm_[A-Za-z0-9_]+|fbclid|gclid|msclkid)=[^&#]*"


def normalize_url_expr(url: Column | str) -> Column:
    """Canonical URL string for dedup keys, in-row regex only.

    Steps (each a documented simplification where flagged):
    1. trim;
    2. lowercase the ``scheme://host[:port]`` prefix (scheme and host
       are case-insensitive per RFC 3986; the path is NOT touched);
    3. drop a ``:80``/``:443`` default port (simplification: dropped
       for any scheme, not just http/https);
    4. drop one leading ``www.``;
    5. drop the ``#fragment``;
    6. drop tracking query params (``utm_*``, ``fbclid``, ``gclid``,
       ``msclkid``) and repair the separators (``?&`` -> ``?``,
       ``&&+`` -> ``&``, trailing ``?``/``&`` dropped);
    7. drop one trailing ``/`` (simplification: treats ``.../a/`` ==
       ``.../a`` and ``http://x.com/`` == ``http://x.com``).

    Non-URL strings pass through steps that don't match — the
    expression never fails, it just normalizes less.
    """
    u = F.trim(F.col(url) if isinstance(url, str) else url)
    prefix = F.lower(F.regexp_extract(u, _SCHEME_HOST, 1))
    prefix = F.regexp_replace(prefix, r":(80|443)$", "")
    prefix = F.regexp_replace(prefix, r"^([a-z][a-z0-9+.\-]*://)www\.", r"$1")
    rest = F.regexp_replace(u, _SCHEME_HOST, "")
    rest = F.regexp_replace(rest, r"#.*", "")
    rest = F.regexp_replace(rest, _TRACKING, r"$1")
    rest = F.regexp_replace(rest, r"\?&+", "?")
    rest = F.regexp_replace(rest, r"&&+", "&")
    rest = F.regexp_replace(rest, r"[?&]+$", "")
    rest = F.regexp_replace(rest, r"/$", "")
    # no scheme -> regexp_extract yields '' and rest is the whole
    # string: concat degrades to the (trimmed, param-stripped) input
    return F.concat(prefix, rest)


def _is_public_suffix(s: Column, psl) -> Column:
    """Whether the (lowered) host string ``s`` IS a public suffix under
    the rule tables — the guard the ``www.``-strip needs: a host whose
    registrant label is literally ``www`` under a multi-label/private
    suffix (``www.blogspot.com``) must not be stripped down to the bare
    suffix. Whole-string ``IN`` checks for plain rules; wildcard rules
    match by label count + base lookup; exception rules carve hosts
    back OUT (they are registrable, not public). In-row, codegen-safe."""
    cond = F.lit(False)
    if psl.suffixes_2:
        cond = cond | s.isin(sorted(psl.suffixes_2))
    if psl.suffixes_3:
        cond = cond | s.isin(sorted(psl.suffixes_3))
    if psl.wildcard_tlds:
        cond = cond | (
            s.rlike(r"^[^.]+\.[^.]+$")
            & F.regexp_extract(s, r"([^.]+)$", 1).isin(sorted(psl.wildcard_tlds))
        )
    if psl.wildcard_2:
        cond = cond | (
            s.rlike(r"^[^.]+\.[^.]+\.[^.]+$")
            & F.regexp_extract(s, r"([^.]+\.[^.]+)$", 1).isin(
                sorted(psl.wildcard_2)
            )
        )
    if psl.exceptions:
        cond = cond & ~s.isin(sorted(psl.exceptions))
    if psl.exceptions_3:
        cond = cond & ~s.isin(sorted(psl.exceptions_3))
    return cond


def registered_domain_expr(url: Column | str, psl: "PslTables | None" = None) -> Column:
    """True eTLD+1 "registered domain" of the URL's host (lowered,
    ``www.``/userinfo/port stripped): one label deeper than the host's
    longest matching PUBLIC SUFFIX, so ``a.co.uk`` and ``b.co.uk`` cap
    independently instead of collapsing into one ``co.uk`` group.

    ``psl`` defaults to the bounded embedded snapshot
    (``operators/psl.py`` — high-traffic ccSLDs, the US state
    hierarchy, wildcard ccTLDs, top private-section hosting suffixes);
    pass ``parse_psl_rules(open('public_suffix_list.dat'),
    on_unsupported="skip")`` for the full production list (every ICANN
    rule shape is covered incl. ``*.kawasaki.jp`` wildcards and
    ``!city.kawasaki.jp`` exceptions; "skip" drops only 4+-label
    rules, documented). The tables compile to in-row ``IN`` lists —
    no join, no shuffle, no UDF, so the expression stays inside
    whole-stage codegen at any scale.

    Resolution order (the PSL algorithm over the snapshot's rule
    shapes): exception host (``!www.ck``) -> itself; 3-label suffix
    (``k12.ca.us``) -> last 4 labels; 2-label suffix (``co.uk``) or
    wildcard TLD (``*.ck``) -> last 3 labels; otherwise the last-2
    fallback. A host AT suffix depth (``co.uk`` itself — no registrant
    label) returns the host. Single-label hosts (``localhost``) return
    themselves; non-URLs return ''. The leading ``www.`` strips only
    when >= 2 labels remain AND the remainder is not itself a public
    suffix — ``www.ck`` is a real registered domain, and so is the
    ``www`` registrant under a multi-label/private suffix
    (``www.blogspot.com``/``www.github.io`` must NOT collapse into the
    bare hosting suffix)."""
    if psl is None:
        from .psl import PSL_SNAPSHOT

        psl = PSL_SNAPSHOT
    u = F.trim(F.col(url) if isinstance(url, str) else url)
    host = F.lower(
        F.regexp_extract(
            u, r"^[A-Za-z][A-Za-z0-9+.\-]*://(?:[^/?#@]*@)?([^/?#:]+)", 1
        )
    )
    stripped = F.regexp_replace(host, r"^www\.", "")
    host = F.when(
        host.rlike(r"^www\..*\.") & ~_is_public_suffix(stripped, psl), stripped
    ).otherwise(host)
    lastk = lambda k: F.regexp_extract(  # noqa: E731
        host, "(" + r"\.".join([r"[^.]+"] * k) + ")$", 1
    )
    last1, last2, last3, last4 = lastk(1), lastk(2), lastk(3), lastk(4)
    wild2, exc3 = psl.wildcard_2, psl.exceptions_3
    dom = F.when(last2 != "", last2).otherwise(host)
    if psl.suffixes_2 or psl.wildcard_tlds:
        cond = F.lit(False)
        if psl.suffixes_2:
            cond = cond | last2.isin(sorted(psl.suffixes_2))
        if psl.wildcard_tlds:
            cond = cond | last1.isin(sorted(psl.wildcard_tlds))
        dom = F.when(cond, F.when(last3 != "", last3).otherwise(host)).otherwise(dom)
    if psl.suffixes_3 or wild2:
        # *.kawasaki.jp: every 3-label suffix whose last 2 labels are
        # the wildcard base is public — same action as a plain 3-label
        # suffix rule (registered = last 4 labels)
        cond3 = F.lit(False)
        if psl.suffixes_3:
            cond3 = cond3 | last3.isin(sorted(psl.suffixes_3))
        if wild2:
            cond3 = cond3 | last2.isin(sorted(wild2))
        dom = F.when(
            cond3, F.when(last4 != "", last4).otherwise(host)
        ).otherwise(dom)
    if psl.exceptions:
        dom = F.when(last2.isin(sorted(psl.exceptions)), last2).otherwise(dom)
    if exc3:
        dom = F.when(last3.isin(sorted(exc3)), last3).otherwise(dom)
    return dom


# --- SQL-text twin of registered_domain_expr (round 16, optimization) ----
#
# Building the eTLD+1 Column above costs ~550 py4j round-trips PER CALL
# (every PSL suffix becomes its own `lit()` + seq-append round-trip inside
# `isin`), ~0.3 s of pure driver latency each time a pipeline stage derives
# a domain. The staged generator below emits the SAME expression tree as
# Spark-SQL text — the IN lists parse in one JVM call — through four
# Project layers that let-bind the host chain by COLUMN NAME (so the text
# never duplicates the host regex or the suffix tables; the SPARK-36718
# staging pattern queries.py uses for lang routing). Values are identical
# by construction; tests/test_weburl.py pins Column-vs-SQL equivalence
# over every rule-shape corner.

_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://(?:[^/?#@]*@)?([^/?#:]+)"


def _rx_sql(pattern: str) -> str:
    """Spark-SQL single-quoted literal for a regex: with the default
    parser (escapedStringLiterals=false) backslashes must double."""
    return "'" + pattern.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _in_sql(vals) -> str:
    out = []
    for v in sorted(vals):
        if "'" in v or "\\" in v:
            raise ValueError(f"unquotable PSL entry: {v!r}")
        out.append(f"'{v}'")
    return ", ".join(out)


def _is_public_suffix_sql(s: str, psl) -> str:
    """SQL twin of :func:`_is_public_suffix` over the fragment ``s``."""
    parts = []
    if psl.suffixes_2:
        parts.append(f"{s} IN ({_in_sql(psl.suffixes_2)})")
    if psl.suffixes_3:
        parts.append(f"{s} IN ({_in_sql(psl.suffixes_3)})")
    if psl.wildcard_tlds:
        rx2, rxt = _rx_sql(r"^[^.]+\.[^.]+$"), _rx_sql(r"([^.]+)$")
        parts.append(
            f"({s} RLIKE {rx2} AND "
            f"regexp_extract({s}, {rxt}, 1) IN "
            f"({_in_sql(psl.wildcard_tlds)}))"
        )
    if psl.wildcard_2:
        rx3, rxt2 = _rx_sql(r"^[^.]+\.[^.]+\.[^.]+$"), _rx_sql(r"([^.]+\.[^.]+)$")
        parts.append(
            f"({s} RLIKE {rx3} AND "
            f"regexp_extract({s}, {rxt2}, 1) IN "
            f"({_in_sql(psl.wildcard_2)}))"
        )
    # seed False then OR: absent shapes contribute nothing, and with no
    # shapes at all the guard is constant false (exceptions can't flip
    # false — `false AND x` is false in 3VL, exactly the Column path)
    cond = "(" + " OR ".join(parts) + ")" if parts else "false"
    if psl.exceptions:
        cond = f"({cond} AND NOT ({s} IN ({_in_sql(psl.exceptions)})))"
    if psl.exceptions_3:
        cond = f"({cond} AND NOT ({s} IN ({_in_sql(psl.exceptions_3)})))"
    return cond


def _domain_resolve_sql(h: str, psl) -> str:
    """SQL twin of the registered_domain_expr resolution chain over an
    already-staged (lowered, www-stripped) host fragment ``h``."""
    def lastk(k: int) -> str:
        pat = _rx_sql("(" + r"\.".join([r"[^.]+"] * k) + ")$")
        return f"regexp_extract({h}, {pat}, 1)"

    last1, last2, last3, last4 = lastk(1), lastk(2), lastk(3), lastk(4)
    dom = f"CASE WHEN {last2} != '' THEN {last2} ELSE {h} END"
    if psl.suffixes_2 or psl.wildcard_tlds:
        conds = []
        if psl.suffixes_2:
            conds.append(f"{last2} IN ({_in_sql(psl.suffixes_2)})")
        if psl.wildcard_tlds:
            conds.append(f"{last1} IN ({_in_sql(psl.wildcard_tlds)})")
        dom = (
            f"CASE WHEN {' OR '.join(conds)} THEN "
            f"CASE WHEN {last3} != '' THEN {last3} ELSE {h} END "
            f"ELSE {dom} END"
        )
    if psl.suffixes_3 or psl.wildcard_2:
        conds3 = []
        if psl.suffixes_3:
            conds3.append(f"{last3} IN ({_in_sql(psl.suffixes_3)})")
        if psl.wildcard_2:
            conds3.append(f"{last2} IN ({_in_sql(psl.wildcard_2)})")
        dom = (
            f"CASE WHEN {' OR '.join(conds3)} THEN "
            f"CASE WHEN {last4} != '' THEN {last4} ELSE {h} END "
            f"ELSE {dom} END"
        )
    if psl.exceptions:
        dom = (
            f"CASE WHEN {last2} IN ({_in_sql(psl.exceptions)}) "
            f"THEN {last2} ELSE {dom} END"
        )
    if psl.exceptions_3:
        dom = (
            f"CASE WHEN {last3} IN ({_in_sql(psl.exceptions_3)}) "
            f"THEN {last3} ELSE {dom} END"
        )
    return dom


def _ident_sql(col: str) -> str:
    """Backtick-quote a plain column name; pass fragments through."""
    import re as _re

    return f"`{col}`" if _re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", col) else col


def with_registered_domain(
    df: DataFrame,
    url_col: str,
    out_col: str,
    psl=None,
) -> DataFrame:
    """Append ``out_col`` = the URL's registered domain (true eTLD+1) —
    same values as ``withColumn(out_col, registered_domain_expr(url_col))``
    built via three staged temp columns and four one-shot SQL parses
    instead of ~1100 py4j round-trips. The temps are dropped; Catalyst
    collapses the Project layers (keeping multi-referenced non-cheap
    ones staged, which is also the right runtime shape — the host regex
    runs once per row, not once per reference)."""
    if psl is None:
        from .psl import PSL_SNAPSHOT

        psl = PSL_SNAPSHOT
    u = _ident_sql(url_col)
    h0, st, h = f"__gs_h0_{out_col}", f"__gs_st_{out_col}", f"__gs_h_{out_col}"
    host_rx = _rx_sql(_HOST_RE)
    www_rx = _rx_sql(r"^www\.")
    www_dotted_rx = _rx_sql(r"^www\..*\.")
    out = df.withColumn(
        h0,
        F.expr(f"lower(regexp_extract(trim({u}), {host_rx}, 1))"),
    )
    out = out.withColumn(
        st, F.expr(f"regexp_replace({h0}, {www_rx}, '')")
    )
    out = out.withColumn(
        h,
        F.expr(
            f"CASE WHEN {h0} RLIKE {www_dotted_rx} "
            f"AND NOT {_is_public_suffix_sql(st, psl)} "
            f"THEN {st} ELSE {h0} END"
        ),
    )
    out = out.withColumn(out_col, F.expr(_domain_resolve_sql(h, psl)))
    return out.drop(h0, st, h)


def url_dedup_flag(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    flag_col: str = "url_keep",
    norm_col: str | None = None,
) -> DataFrame:
    """Append ``flag_col``: True on the single keeper (lowest ``id_col``)
    of each normalized-URL group. Pass ``norm_col`` to also keep the
    normalized key as a column. One hash shuffle on the short key."""
    key = normalize_url_expr(url_col)
    out = df.withColumn("__url_norm", key)
    w = Window.partitionBy("__url_norm").orderBy(F.col(id_col).asc())
    # NULL-url rows are NOT duplicates of each other (there is no key
    # to agree on) — they all keep, instead of silently keep-firsting
    # the whole null group as one URL
    out = out.withColumn(
        flag_col,
        F.when(F.col("__url_norm").isNull(), F.lit(True)).otherwise(
            F.row_number().over(w) == 1
        ),
    )
    if norm_col:
        return out.withColumnRenamed("__url_norm", norm_col)
    return out.drop("__url_norm")


def url_dedup(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Keep-first by normalized URL: the RefinedWeb re-crawl prune.
    Returns surviving rows with their original columns."""
    flagged = url_dedup_flag(df, url_col, id_col, flag_col="__keep")
    return flagged.where(F.col("__keep")).drop("__keep")


def url_dedup_incremental(
    new_df: DataFrame,
    corpus_urls: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    """Keep-first URL dedup of a NEW crawl batch against an existing
    crawl's stored normalized-URL relation (schema ``url_norm``) — the
    incremental-ingest form of the re-crawl prune, mirroring
    ``dedup_exact_incremental``'s contract: within-batch keep-first,
    then one anti-join on the short normalized key. The corpus is
    touched only through its (tiny) URL-key relation; per-batch cost is
    bounded by the batch.

    Returns ``(survivors, survivor_urls)``; append ``survivor_urls``
    to the store so the next batch never re-accepts a re-crawl.
    """
    within = url_dedup(new_df, url_col, id_col)
    key = "__gs_url"
    keyed = within.withColumn(key, normalize_url_expr(url_col))
    # NULL keys never match in the anti-join (SQL null semantics), so
    # null-url rows always survive — consistent with url_dedup_flag
    survivors = keyed.join(
        corpus_urls.select(F.col("url_norm").alias(key)), on=key, how="left_anti"
    )
    # ...but a NULL is not a key worth STORING: it can never match a
    # future batch either, it would only bloat the store
    survivor_urls = survivors.where(F.col(key).isNotNull()).select(
        F.col(key).alias("url_norm")
    )
    return survivors.drop(key), survivor_urls


def domain_cap_flag(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    cap: int = 1000,
    seed: int | str = 1,
    flag_col: str = "domain_keep",
    domain_col: str | None = None,
    rank_col: str | None = None,
) -> DataFrame:
    """Append ``flag_col``: True for at most ``cap`` documents per
    registered domain, selected by seeded deterministic md5 order
    (``md5('<seed>:' || id)`` — a pseudo-random, partitioning-invariant
    pick; ties impossible for distinct non-null ids). A different
    ``seed`` picks a fresh ``cap``-subset. ``id_col`` must be non-null
    (the ``epoch_shuffle_expr`` contract). One short-key shuffle."""
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    from ..functions.sampling import epoch_shuffle_expr

    order_key = epoch_shuffle_expr(id_col, seed)
    out = (
        with_registered_domain(df, url_col, "__dom")
        if isinstance(url_col, str)
        else df.withColumn("__dom", registered_domain_expr(url_col))
    )
    w = Window.partitionBy("__dom").orderBy(order_key.asc())
    out = out.withColumn("__drank", F.row_number().over(w))
    # rows with no attributable domain always keep — the cap is a
    # per-domain politeness budget, not a bucket for the unknown. That
    # covers NULL urls AND non-URL strings (registered_domain_expr
    # resolves the latter to ''): capping all malformed rows together
    # under one '' bucket would silently drop everything past `cap`
    out = out.withColumn(
        flag_col,
        F.when(
            F.col("__dom").isNull() | (F.col("__dom") == ""), F.lit(True)
        ).otherwise(F.col("__drank") <= cap),
    )
    if rank_col:
        out = out.withColumnRenamed("__drank", rank_col)
    else:
        out = out.drop("__drank")
    if domain_col:
        return out.withColumnRenamed("__dom", domain_col)
    return out.drop("__dom")


def domain_blocklist_flag(
    df: DataFrame,
    url_col: str = "url",
    blocklist: "tuple[str, ...] | list[str] | DataFrame" = (),
    flag_col: str = "blocklist_ok",
    domain_col: str | None = None,
    psl=None,
) -> DataFrame:
    """Append ``flag_col``: False when the URL's registered domain
    (true eTLD+1, same resolution as the cap/dedup stages) is on the
    blocklist — RefinedWeb's adult/fraud/malware URL-filtering stage,
    which in their recipe runs BEFORE any content stage.

    Two scale modes by ``blocklist`` type:

    - tuple/list of domains: compiles to an in-row ``NOT isin`` —
      constant-folded, codegen'd, zero shuffle; right for curated
      lists up to a few thousand entries;
    - single-column DataFrame (column ``domain``): a BROADCAST left
      join + null test — right for UT1-scale lists (millions of
      domains, still megabytes as a broadcast); the corpus never
      shuffles for the verdict either way.

    Rows with no attributable domain (NULL url, non-URL strings that
    resolve to '') always KEEP — a blocklist names real domains; the
    identity-less can't be on it (the ``domain_cap_flag`` exemption,
    same rationale)."""
    out = (
        with_registered_domain(df, url_col, "__bldom", psl=psl)
        if isinstance(url_col, str)
        else df.withColumn("__bldom", registered_domain_expr(url_col, psl=psl))
    )
    if isinstance(blocklist, DataFrame):
        bl = blocklist.select(
            F.col("domain").alias("__bldom"), F.lit(True).alias("__blocked")
        ).dropDuplicates(["__bldom"])
        out = out.join(F.broadcast(bl), on="__bldom", how="left").withColumn(
            flag_col, F.col("__blocked").isNull()
        ).drop("__blocked")
    else:
        blocked = (
            F.col("__bldom").isin(*[str(d).lower() for d in blocklist])
            if len(tuple(blocklist))
            else F.lit(False)
        )
        # NULL domain -> isin is NULL -> coalesce keeps (identity-less)
        out = out.withColumn(
            flag_col, ~F.coalesce(blocked, F.lit(False))
        )
    if domain_col:
        return out.withColumnRenamed("__bldom", domain_col)
    return out.drop("__bldom")


def parse_robots_rules(robots_text: str, user_agent: str = "*") -> list[tuple[str, bool]]:
    """Parse one robots.txt body (RFC 9309) into the rule list that
    applies to ``user_agent``: ``[(path_pattern, allow)]``. Group
    selection is the spec's: the group(s) whose ``User-agent`` line is
    the LONGEST match for our product token win; ``*`` groups apply
    only when no specific group matched. Patterns keep the spec's
    ``*`` (any run) and trailing ``$`` (end anchor) syntax verbatim —
    :func:`robots_pattern_sql_regex` compiles them for matching.
    Unparseable lines are skipped (crawl-captured robots files hold
    every syntax error ever typed); an empty/absent/garbage file
    yields ``[]`` — allow-all, the spec's default."""
    ua = user_agent.lower()
    groups: list[tuple[list[str], list[tuple[str, bool]]]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[str, bool]] = []
    in_group_body = False
    for raw in (robots_text or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if in_group_body:
                groups.append((cur_agents, cur_rules))
                cur_agents, cur_rules = [], []
                in_group_body = False
            cur_agents.append(value.lower())
        elif field in ("allow", "disallow"):
            in_group_body = True
            if value:  # empty Disallow = allow-all, contributes nothing
                cur_rules.append((value, field == "allow"))
        # other fields (sitemap, crawl-delay) end nothing and add nothing
    if cur_agents or cur_rules:
        groups.append((cur_agents, cur_rules))
    # longest user-agent token match wins; '*' only as fallback
    best_len = -1
    best_rules: list[tuple[str, bool]] = []
    star_rules: list[tuple[str, bool]] = []
    for agents, rules in groups:
        for a in agents:
            if a == "*":
                star_rules = star_rules + rules
            elif a and a in ua:
                # one-directional on purpose: the robots token must be
                # a substring of OUR product token. The reverse
                # (``ua in a``) would let an unrelated longer token
                # ('mybot-images' for agent 'mybot', or any token
                # containing '*' when user_agent='*') win as the
                # "specific" group; '*' stays purely the fallback
                if len(a) > best_len:
                    best_len, best_rules = len(a), list(rules)
                elif len(a) == best_len:
                    best_rules = best_rules + rules
    return best_rules if best_len >= 0 else star_rules


def robots_pattern_sql_regex(pattern: str) -> str:
    """Compile a robots.txt path pattern to the Java∩RE2 regex both
    engines match with: regex-escape everything, ``*`` -> ``.*``, a
    trailing ``$`` -> end anchor, and anchor the start (robots
    patterns are path PREFIXES)."""
    anchored_end = pattern.endswith("$")
    body = pattern[:-1] if anchored_end else pattern
    out = []
    for ch in body:
        if ch == "*":
            out.append(".*")
        elif ch in r"\.[]{}()<>+-=!?^$|":
            out.append("\\" + ch)
        else:
            out.append(ch)
    return "^" + "".join(out) + ("$" if anchored_end else "")


def robots_filter(
    df: DataFrame,
    robots: "DataFrame | list[tuple[str, str]] | tuple",
    url_col: str = "url",
    user_agent: str = "*",
    flag_col: str = "robots_ok",
    psl=None,
    broadcast: bool = True,
    key: str = "host",
) -> DataFrame:
    """Append ``flag_col``: False when the crawl's own robots.txt for
    the URL's HOST disallows the URL's path for ``user_agent`` — RFC
    9309 longest-match-wins with allow winning ties, allow-all when a
    host has no robots capture. The compliance stage a governed crawl
    pipeline runs (robots captures arrive IN the WARC dump; pair with
    ``read_warc(record_types=("response",))`` filtered to
    ``/robots.txt`` paths).

    ``key="host"`` (default) matches the spec: robots.txt scope is the
    ORIGIN, so ``www.x.com`` and ``docs.x.com`` each have their own
    file — the robots relation keys by raw lowercased host.
    ``key="domain"`` matches on the registered eTLD+1 instead, for
    aggregated per-registrant policy tables.

    ``robots``: ``(domain, robots_text)`` — one row per host (or
    registered domain in domain mode). A DataFrame compiles its rules
    in an Arrow pass over the ROBOTS side (the corpus side never runs
    Python); a local list/tuple of pairs compiles DRIVER-side into a
    pure IN-ROW when/regexp chain — NO join, no local relation, fully
    whole-stage-codegen'd (the blocklist-tuple pattern), the right
    mode for fixed policy tables up to a few hundred hosts.

    DataFrame scale shape: each domain's rules compile to ONE row
    holding an array of ``(spec, allow, rx)`` structs; that relation
    is BROADCAST (robots corpora are domain-count-sized — millions of
    rows, still megabytes), the corpus joins 1:1 on its in-row domain
    key, and the longest-match resolution is in-row array algebra
    (``filter`` by ``rlike`` + ``array_max`` over ``(spec, allow)``
    structs — lexicographic struct max IS the RFC tiebreak). One
    broadcast join, zero corpus shuffles, no row-id round-trip.
    ``broadcast=False`` switches to a plain equi-join (corpus shuffles
    on the domain key) for whole-web robots corpora too big to
    broadcast (~10^8 domains); verdict algebra identical."""
    if key not in ("host", "domain"):
        raise ValueError(f"key must be 'host' or 'domain', got {key!r}")
    path = F.regexp_extract(
        _ucol(url_col), r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^#]*)", 1
    )
    path = F.when(path == "", F.lit("/")).otherwise(path)
    def _with_match_key(frame: DataFrame) -> DataFrame:
        if key == "host":
            return frame.withColumn(
                "__rdom",
                F.lower(
                    F.regexp_extract(
                        _ucol(url_col),
                        r"^[A-Za-z][A-Za-z0-9+.\-]*://(?:[^/?#@]*@)?([^/?#:]+)",
                        1,
                    )
                ),
            )
        if isinstance(url_col, str):
            return with_registered_domain(frame, url_col, "__rdom", psl=psl)
        return frame.withColumn(
            "__rdom", registered_domain_expr(url_col, psl=psl)
        )

    if not isinstance(robots, DataFrame):
        # local pairs: fold an in-row longest-pattern-first (allow
        # first on ties) when-chain per host — which IS the RFC
        # resolution for a static rule set. Built back-to-front so the
        # allow-all default is the innermost otherwise; a NULL/''
        # match key satisfies no host equality and falls through to
        # allow (the identity-less exemption)
        seen: dict = {}
        for dom, txt in robots:
            seen.setdefault(
                dom,
                sorted(
                    (
                        (len(pat), allow, robots_pattern_sql_regex(pat))
                        for pat, allow in parse_robots_rules(
                            txt or "", user_agent
                        )
                    ),
                    reverse=True,
                ),
            )
        out = _with_match_key(df).withColumn("__rpath", path)
        flag = F.lit(True)
        for dom, rules in reversed(list(seen.items())):
            if not rules:
                continue
            inner = F.lit(True)
            for _ln, allow, rx in reversed(rules):
                inner = F.when(
                    F.regexp_like(F.col("__rpath"), F.lit(rx)), F.lit(allow)
                ).otherwise(inner)
            flag = F.when(F.col("__rdom") == dom, inner).otherwise(flag)
        return out.withColumn(flag_col, flag).drop("__rdom", "__rpath")

    from pyspark.sql import types as T

    rule_schema = T.StructType(
        [
            T.StructField("domain", T.StringType()),
            T.StructField(
                "__rbrules",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("spec", T.IntegerType()),
                            T.StructField("allow", T.BooleanType()),
                            T.StructField("rx", T.StringType()),
                        ]
                    )
                ),
            ),
        ]
    )

    def _compile(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for dom, txt in zip(pdf["domain"], pdf["robots_text"]):
                rules = [
                    (len(pat), allow, robots_pattern_sql_regex(pat))
                    for pat, allow in parse_robots_rules(txt or "", user_agent)
                ]
                if rules:
                    rows.append((dom, rules))
            yield pd.DataFrame(rows, columns=["domain", "__rbrules"])

    compiled = (
        robots.select("domain", "robots_text")
        .dropDuplicates(["domain"])
        .mapInPandas(_compile, schema=rule_schema)
        .withColumnRenamed("domain", "__rbdom")
    )
    out = _with_match_key(df)
    out = out.withColumn("__rpath", path)
    right = F.broadcast(compiled) if broadcast else compiled
    joined = out.join(right, out["__rdom"] == right["__rbdom"], "left")
    hit = F.filter(
        F.col("__rbrules"), lambda r: F.regexp_like(F.col("__rpath"), r["rx"])
    )
    # lexicographic struct max == RFC 9309 §2.3.2: longest pattern
    # wins, allow beats disallow on equal length; empty -> NULL -> the
    # spec's allow-all default (also covers domains with no robots)
    best = F.array_max(
        F.transform(
            hit,
            lambda r: F.struct(
                r["spec"].alias("spec"), r["allow"].cast("int").alias("a")
            ),
        )
    )
    return joined.withColumn(
        flag_col,
        F.when(F.col("__rbrules").isNull(), F.lit(True)).otherwise(
            F.coalesce(best["a"] == 1, F.lit(True))
        ),
    ).drop("__rdom", "__rpath", "__rbdom", "__rbrules")


def robots_from_warc(
    warc_df: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    status_col: str = "http_status",
    date_col: str = "warc_date",
) -> DataFrame:
    """Distill a ``read_warc`` frame into the ``(domain, robots_text)``
    relation :func:`robots_filter` consumes — the formalized version of
    its docstring recipe, so every pipeline builds the compliance table
    the same way instead of each hand-rolling the filter slightly
    differently.

    Selection: response captures whose URL path (query/fragment
    ignored) is exactly ``/robots.txt`` — the RFC 9309 well-known
    location — keyed by the raw lowercased HOST (the spec's origin
    scope; feed the result to ``robots_filter(key="host")``, the
    default). Latest capture wins per host, ordered by ``date_col``
    (WARC-Date is ISO-8601, so string order IS time order), tie-broken
    by ``warc_file``/``record_offset`` when the frame still carries
    them — fully deterministic.

    Status handling (RFC 9309 §2.3.1):

    - 2xx (or a NULL status — resource/conversion records store bare
      payloads): the capture body is the policy;
    - 3xx/4xx "unavailable": the host row is DROPPED — no relation row
      means ``robots_filter``'s allow-all default, which is the spec's
      MAY-crawl ruling for unavailable robots;
    - 5xx "unreachable": the spec says assume complete disallow — the
      row synthesizes ``User-agent: *\\nDisallow: /``.

    Scale: the candidate set is host-count-sized (one /robots.txt row
    per host per crawl pass), so the keep-latest window shuffles a
    relation ~6 orders smaller than the corpus; the corpus itself is
    untouched. Batch-only (keep-latest needs a window): for streaming
    curation, snapshot the relation batch-side from the crawl so far —
    robots compliance is an admission-time policy table, not per-event
    state."""
    path = F.regexp_extract(
        F.col(url_col), r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)", 1
    )
    host = F.lower(
        F.regexp_extract(
            F.col(url_col),
            r"^[A-Za-z][A-Za-z0-9+.\-]*://(?:[^/?#@]*@)?([^/?#:]+)",
            1,
        )
    )
    status = F.col(status_col)
    cand = warc_df.where((path == "/robots.txt") & (host != "")).where(
        status.isNull() | (status < 300) | (status >= 500)
    )
    tie = [c for c in ("warc_file", "record_offset") if c in warc_df.columns]
    w = Window.partitionBy("__rb_host").orderBy(
        F.col(date_col).desc_nulls_last(),
        *[F.col(c).desc_nulls_last() for c in tie],
        F.col("__rb_text").asc_nulls_last(),
    )
    return (
        cand.select(
            host.alias("__rb_host"),
            F.col(date_col),
            *[F.col(c) for c in tie],
            F.when(
                status >= 500, F.lit("User-agent: *\nDisallow: /")
            ).otherwise(F.coalesce(F.col(text_col), F.lit("")))
            .alias("__rb_text"),
        )
        .withColumn("__rb_rn", F.row_number().over(w))
        .where(F.col("__rb_rn") == 1)
        .select(
            F.col("__rb_host").alias("domain"),
            F.col("__rb_text").alias("robots_text"),
        )
    )


from ..functions.text import _col as _ucol  # noqa: E402 (shared coercion helper)


def sitemaps_from_robots(
    robots_df: DataFrame,
    domain_col: str = "domain",
    text_col: str = "robots_text",
) -> DataFrame:
    """Sitemap DISCOVERY from the robots relation
    (:func:`robots_from_warc`'s output): every ``Sitemap:`` directive
    (sitemaps.org protocol §"informing search engine crawlers" — line
    anywhere in the file, case-insensitive, multiple allowed, value an
    absolute URL) becomes one ``(domain, sitemap_url)`` row. The
    standard crawl-frontier seed: robots names the sitemaps, sitemaps
    name the URLs (:func:`sitemap_locs_expr`).

    In-row ``regexp_extract_all`` + ``explode`` over the host-count-
    sized robots relation — negligible at any crawl scale."""
    locs = F.expr(
        f"regexp_extract_all({text_col}, "
        r"'(?im)^[ \\t]*sitemap[ \\t]*:[ \\t]*(\\S+)', 1)"
    )
    return robots_df.select(
        F.col(domain_col), F.explode(locs).alias("sitemap_url")
    )


# sitemap XML entity decode — the protocol REQUIRES entity-escaped
# URLs in <loc>; &amp; last so double-escapes don't double-decode
_SITEMAP_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&apos;", "'"),
    ("&amp;", "&"),
)


def sitemap_locs_expr(xml: str) -> Column:
    """URLs of one sitemap document as ``array<string>``: every
    ``<loc>`` element's text (sitemaps.org §XML format — used both by
    ``<urlset>`` page sitemaps and ``<sitemapindex>`` index files),
    CDATA unwrapped, whitespace trimmed, the five XML entities
    decoded. ``xml`` is a column name / SQL fragment string. Pure
    in-row regex chain — parsing a billion fetched sitemaps is
    map-only. Pair with :func:`sitemap_is_index_expr` to route index
    files back into the fetch frontier instead of the page queue."""
    if not isinstance(xml, str):
        raise TypeError(
            "sitemap_locs_expr takes a column name / SQL fragment string "
            "(regexp_extract_all enters the plan through the parser)"
        )
    raw = F.transform(
        F.expr(
            f"regexp_extract_all({xml}, '(?is)<loc[^>]*>(.*?)</loc>', 1)"
        ),
        lambda s: F.trim(
            F.regexp_replace(s, r"(?s)^\s*<!\[CDATA\[(.*)\]\]>\s*$", r"$1")
        ),
    )
    def _decode(ent: str, rep: str):
        # closure factory, NOT default args — pyspark counts lambda
        # defaults as HOF parameters and rejects the 3-arg signature
        return lambda s: F.replace(s, F.lit(ent), F.lit(rep))

    out = raw
    for ent, rep in _SITEMAP_ENTITIES:
        out = F.transform(out, _decode(ent, rep))
    return F.filter(out, lambda s: s != "")


def sitemap_is_index_expr(xml: Column | str) -> Column:
    """Whether a sitemap document is an INDEX file (``<sitemapindex>``
    root — its <loc>s name more sitemaps, not pages)."""
    x = F.col(xml) if isinstance(xml, str) else xml
    return x.rlike(r"(?is)<\s*sitemapindex[\s>]")


def sitemap_urls_from_warc(
    warc_df: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    status_col: str = "http_status",
) -> DataFrame:
    """Distill fetched sitemap captures from a ``read_warc`` frame
    into the crawl frontier: rows whose URL path names a sitemap
    (``*.xml``/``*.xml.gz`` containing ``sitemap``) or whose body has
    a ``<urlset>``/``<sitemapindex>`` root, exploded to one row per
    ``<loc>`` — ``(source_url, url, from_index)``. ``from_index=true``
    rows are sitemap URLs to fetch next; false rows are page URLs.
    2xx/NULL statuses only. Map-only over the matching captures."""
    x = F.col(text_col)
    status = F.col(status_col)
    is_sm = (
        F.lower(F.col(url_col)).rlike(r"sitemap[^/]*\.xml(\.gz)?([?#].*)?$")
        | x.rlike(r"(?is)<\s*(urlset|sitemapindex)[\s>]")
    )
    cand = warc_df.where(
        x.isNotNull() & is_sm & (status.isNull() | (status < 300))
    )
    return cand.select(
        F.col(url_col).alias("source_url"),
        sitemap_is_index_expr(x).alias("from_index"),
        F.explode(sitemap_locs_expr(text_col)).alias("url"),
    ).select("source_url", "url", "from_index")
