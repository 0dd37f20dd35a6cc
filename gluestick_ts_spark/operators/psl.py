"""Public-suffix (eTLD+1) tables for the weburl domain operators.

``registered_domain_expr`` groups documents by "registered domain" —
the crawl-politeness / per-registrant key (RefinedWeb's domain caps,
Common-Crawl-style host budgets). The plain last-two-labels heuristic
collapses every ``*.co.uk`` host into one ``co.uk`` group, so a single
hot ccSLD absorbs an entire country's cap. The fix is the public
suffix list (publicsuffix.org — Mozilla-maintained public data): a
host's registered domain is ONE label more than its longest matching
public suffix.

This module ships a BOUNDED SNAPSHOT of that list — the high-traffic
multi-label rules (ccSLDs like ``co.uk``/``com.au``/``co.jp``, the
US state hierarchy, the classic wildcard ccTLDs, and the most common
private-section hosting suffixes like ``github.io``/``blogspot.com``
whose subdomains are separate registrants) — NOT the full ~10k-entry
file. Single-label TLDs need no entry (they are the fallback rule).
Production use with the full list: download the PSL file, feed its
rule lines to ``parse_psl_rules(lines, on_unsupported="skip")``, and
pass the resulting tables to ``registered_domain_expr(url, psl=...)``
— the tables are a broadcast-sized in-row lookup either way (the
expression compiles to ``IN`` lists; no join, no shuffle, no UDF).
The parser covers every ICANN-section rule shape; "skip" drops only
the handful of 4+-label rules (e.g. ``pvt.k12.ma.us``), whose hosts
then resolve one label shallower — documented coverage loss, never a
crash.

Rule semantics implemented (the PSL algorithm, bounded to the rule
shapes in the snapshot):

- plain rule ``co.uk``: hosts under it register one label deeper
  (``a.co.uk`` -> ``a.co.uk``, ``x.a.co.uk`` -> ``a.co.uk``);
- wildcard rule ``*.ck``: EVERY 2-label suffix under ``ck`` is public
  (``a.b.ck`` -> ``a.b.ck``);
- exception rule ``!www.ck``: carves ``www.ck`` back out of its
  wildcard — ``www.ck`` itself is the registered domain.

The snapshot carries 2- and 3-label plain rules, 1-label wildcard
bases, and 2-label exceptions; the PARSER additionally handles the
real list's 2-label wildcard bases (``*.kawasaki.jp`` -> registered =
last 4 labels) and 3-label exceptions (``!city.kawasaki.jp``), so the
full ICANN section loads cleanly. Deeper private-section rules like
``*.compute.amazonaws.com`` are governed by ``on_unsupported``.
"""

from __future__ import annotations

from typing import Iterable, NamedTuple

__all__ = [
    "PslTables",
    "parse_psl_rules",
    "registered_domain_sql",
    "is_public_suffix_sql",
    "www_strip_host_sql",
    "PSL_SNAPSHOT_RULES",
    "PSL_SNAPSHOT",
]


class PslTables(NamedTuple):
    """Parsed public-suffix rules, split by shape for the in-row
    expression: ``suffixes_2``/``suffixes_3`` are plain 2-/3-label
    rules, ``wildcard_tlds``/``wildcard_2`` the 1-/2-label bases of
    ``*.<base>`` rules (``*.ck`` / ``*.kawasaki.jp``),
    ``exceptions``/``exceptions_3`` the 2-/3-label ``!``-carved hosts
    (``!www.ck`` / ``!city.kawasaki.jp``)."""

    suffixes_2: frozenset
    suffixes_3: frozenset
    wildcard_tlds: frozenset
    exceptions: frozenset
    wildcard_2: frozenset = frozenset()
    exceptions_3: frozenset = frozenset()


def parse_psl_rules(
    rules: Iterable[str], on_unsupported: str = "raise"
) -> PslTables:
    """Parse PSL-format rule lines (comments ``//`` and blanks are
    skipped, so a raw ``public_suffix_list.dat`` file's lines feed in
    directly). Covers every rule shape in the real list's ICANN
    section: plain 2-/3-label suffixes, 1-/2-label wildcard bases
    (``*.ck``, ``*.kawasaki.jp``), 2-/3-label exceptions (``!www.ck``,
    ``!city.kawasaki.jp``); 1-label plain rules are the fallback and
    need no entry. Deeper shapes (4+-label plain rules like
    ``pvt.k12.ma.us`` and some private-section rules) are governed by
    ``on_unsupported``: ``"raise"`` (default — fail loudly rather than
    silently mis-group) or ``"skip"`` (drop the rule; those hosts
    resolve one label shallower — the documented coverage loss when
    feeding the FULL production file)."""
    if on_unsupported not in ("raise", "skip"):
        raise ValueError(f"on_unsupported must be 'raise' or 'skip', got {on_unsupported!r}")
    suf2, suf3, wild, exc = set(), set(), set(), set()
    wild2, exc3 = set(), set()

    def unsupported(msg: str) -> None:
        if on_unsupported == "raise":
            raise ValueError(msg)

    for raw in rules:
        rule = raw.strip().lower()
        if not rule or rule.startswith("//"):
            continue
        if rule.startswith("!"):
            host = rule[1:]
            n = host.count(".")
            if n == 1:
                exc.add(host)
            elif n == 2:
                exc3.add(host)
            else:
                unsupported(f"unsupported exception rule shape: {raw!r}")
        elif rule.startswith("*."):
            base = rule[2:]
            n = base.count(".")
            if not base:
                unsupported(f"unsupported wildcard rule shape: {raw!r}")
            elif n == 0:
                wild.add(base)
            elif n == 1:
                wild2.add(base)
            else:
                unsupported(f"unsupported wildcard rule shape: {raw!r}")
        else:
            n = rule.count(".")
            if n == 0:
                continue  # bare TLD == the fallback rule; no entry needed
            if n == 1:
                suf2.add(rule)
            elif n == 2:
                suf3.add(rule)
            else:
                unsupported(f"unsupported rule depth (>3 labels): {raw!r}")
    return PslTables(
        frozenset(suf2),
        frozenset(suf3),
        frozenset(wild),
        frozenset(exc),
        frozenset(wild2),
        frozenset(exc3),
    )


def registered_domain_sql(host_ref: str, psl: PslTables | None = None) -> str:
    """The ANSI/DuckDB restatement of ``registered_domain_expr``'s
    suffix resolution, over an ALREADY-EXTRACTED lowered+www-stripped
    host column reference (compute the host in a CTE — the CASE
    references it ~9 times). Generated from the SAME ``PslTables`` the
    Spark expression reads, so the oracle and the engine cannot
    diverge on the rule set."""
    if psl is None:
        psl = PSL_SNAPSHOT

    def lastk(k: int) -> str:
        pat = r"\.".join([r"[^.]+"] * k)
        return f"regexp_extract({host_ref}, '({pat})$', 1)"

    def inlist(vals: frozenset) -> str:
        return "(" + ", ".join(f"'{v}'" for v in sorted(vals)) + ")"

    l1, l2, l3, l4 = lastk(1), lastk(2), lastk(3), lastk(4)
    branches = []
    if psl.exceptions_3:
        branches.append(f"WHEN {l3} IN {inlist(psl.exceptions_3)} THEN {l3}")
    if psl.exceptions:
        branches.append(f"WHEN {l2} IN {inlist(psl.exceptions)} THEN {l2}")
    conds3 = []
    if psl.suffixes_3:
        conds3.append(f"{l3} IN {inlist(psl.suffixes_3)}")
    if psl.wildcard_2:
        conds3.append(f"{l2} IN {inlist(psl.wildcard_2)}")
    if conds3:
        branches.append(
            f"WHEN {' OR '.join(conds3)} THEN "
            f"(CASE WHEN {l4} <> '' THEN {l4} ELSE {host_ref} END)"
        )
    conds = []
    if psl.suffixes_2:
        conds.append(f"{l2} IN {inlist(psl.suffixes_2)}")
    if psl.wildcard_tlds:
        conds.append(f"{l1} IN {inlist(psl.wildcard_tlds)}")
    if conds:
        branches.append(
            f"WHEN {' OR '.join(conds)} THEN "
            f"(CASE WHEN {l3} <> '' THEN {l3} ELSE {host_ref} END)"
        )
    branches.append(f"WHEN {l2} <> '' THEN {l2}")
    return "(CASE " + " ".join(branches) + f" ELSE {host_ref} END)"


def is_public_suffix_sql(ref: str, psl: PslTables | None = None) -> str:
    """ANSI/DuckDB boolean: whether the host string ``ref`` IS a public
    suffix — the SQL twin of ``weburl._is_public_suffix`` (the ``www.``
    strip guard), generated from the SAME rule tables. Whole-string
    ``IN`` for plain rules, label-count + base lookup for wildcards,
    exceptions carved back out (registrable)."""
    if psl is None:
        psl = PSL_SNAPSHOT

    def inlist(vals: frozenset) -> str:
        return "(" + ", ".join(f"'{v}'" for v in sorted(vals)) + ")"

    conds = []
    if psl.suffixes_2:
        conds.append(f"{ref} IN {inlist(psl.suffixes_2)}")
    if psl.suffixes_3:
        conds.append(f"{ref} IN {inlist(psl.suffixes_3)}")
    if psl.wildcard_tlds:
        conds.append(
            f"(regexp_matches({ref}, '^[^.]+\\.[^.]+$') AND "
            f"regexp_extract({ref}, '([^.]+)$', 1) "
            f"IN {inlist(psl.wildcard_tlds)})"
        )
    if psl.wildcard_2:
        conds.append(
            f"(regexp_matches({ref}, '^[^.]+\\.[^.]+\\.[^.]+$') AND "
            f"regexp_extract({ref}, '([^.]+\\.[^.]+)$', 1) "
            f"IN {inlist(psl.wildcard_2)})"
        )
    cond = "(" + " OR ".join(conds) + ")" if conds else "FALSE"
    carve = []
    if psl.exceptions:
        carve.append(f"{ref} NOT IN {inlist(psl.exceptions)}")
    if psl.exceptions_3:
        carve.append(f"{ref} NOT IN {inlist(psl.exceptions_3)}")
    if carve:
        cond = "(" + cond + " AND " + " AND ".join(carve) + ")"
    return cond


def www_strip_host_sql(h: str, psl: PslTables | None = None) -> str:
    """ANSI/DuckDB restatement of the host's conditional ``www.`` strip
    (``registered_domain_expr``'s host preparation): strip only when
    >= 2 labels remain AND the remainder is not itself a public suffix
    (``www.ck`` / ``www.blogspot.com`` keep their ``www``). ``h`` is the
    already-lowered host expression."""
    stripped = f"regexp_replace({h}, '^www\\.', '')"
    return (
        f"(CASE WHEN regexp_matches({h}, '^www\\..*\\.') "
        f"AND NOT {is_public_suffix_sql(stripped, psl)} "
        f"THEN {stripped} ELSE {h} END)"
    )


def _us_state_rules() -> list[str]:
    """The PSL's US hierarchy: every state code is a public suffix
    (``<st>.us``), and so are ``k12/cc/lib.<st>.us`` (schools,
    community colleges, libraries register under those)."""
    states = (
        "ak al ar az ca co ct dc de fl ga hi ia id il in ks ky la ma md me "
        "mi mn mo ms mt nc nd ne nh nj nm nv ny oh ok or pa ri sc sd tn tx "
        "ut va vt wa wi wv wy"
    ).split()
    rules = [f"{st}.us" for st in states]
    rules += [f"{p}.{st}.us" for st in states for p in ("k12", "cc", "lib")]
    return rules


# The snapshot: ICANN-section multi-label ccSLDs for high-traffic
# ccTLDs, the classic wildcard ccTLDs, and the top private-section
# hosting suffixes. Bounded (~350 rules) and embedded as code so the
# oracle SQL and the Spark expression provably share one source.
_SNAPSHOT_TEXT = """
    // United Kingdom
    ac.uk co.uk gov.uk ltd.uk me.uk net.uk nhs.uk org.uk plc.uk police.uk sch.uk
    // Australia
    asn.au com.au edu.au gov.au id.au net.au org.au
    // New Zealand
    ac.nz co.nz geek.nz gen.nz govt.nz health.nz iwi.nz kiwi.nz maori.nz mil.nz net.nz org.nz parliament.nz school.nz
    // Japan
    ac.jp ad.jp co.jp ed.jp go.jp gr.jp lg.jp ne.jp or.jp
    // Brazil (core set)
    adv.br com.br coop.br edu.br eng.br esp.br etc.br eti.br far.br fm.br gov.br ind.br inf.br jus.br leg.br med.br mil.br net.br org.br psi.br rec.br srv.br tur.br tv.br
    // India
    ac.in co.in edu.in firm.in gen.in gov.in ind.in mil.in net.in nic.in org.in res.in
    // China
    ac.cn com.cn edu.cn gov.cn mil.cn net.cn org.cn
    // South Korea
    ac.kr co.kr es.kr go.kr hs.kr kg.kr mil.kr ms.kr ne.kr or.kr pe.kr re.kr sc.kr
    // Taiwan / Hong Kong / Singapore
    club.tw com.tw ebiz.tw edu.tw game.tw gov.tw idv.tw mil.tw net.tw org.tw
    com.hk edu.hk gov.hk idv.hk net.hk org.hk
    com.sg edu.sg gov.sg net.sg org.sg per.sg
    // Indonesia / Malaysia / Thailand / Vietnam / Philippines
    ac.id biz.id co.id go.id mil.id my.id net.id or.id sch.id web.id
    com.my edu.my gov.my mil.my name.my net.my org.my
    ac.th co.th go.th in.th mi.th net.th or.th
    ac.vn biz.vn com.vn edu.vn gov.vn health.vn info.vn int.vn name.vn net.vn org.vn pro.vn
    com.ph edu.ph gov.ph mil.ph net.ph ngo.ph org.ph
    // Turkey / Israel / Ukraine / Poland (core) / Russia-adjacent none
    av.tr bbs.tr bel.tr biz.tr com.tr dr.tr edu.tr gen.tr gov.tr info.tr k12.tr mil.tr name.tr net.tr org.tr pol.tr tel.tr tv.tr web.tr
    ac.il co.il gov.il idf.il k12.il muni.il net.il org.il
    com.ua edu.ua gov.ua in.ua net.ua org.ua
    biz.pl com.pl edu.pl gov.pl info.pl net.pl org.pl waw.pl
    // South Africa / Kenya / Nigeria / Egypt / Saudi / UAE
    ac.za co.za gov.za law.za mil.za net.za nom.za org.za school.za web.za
    ac.ke co.ke go.ke info.ke me.ke mobi.ke ne.ke or.ke sc.ke
    com.ng edu.ng gov.ng i.ng mil.ng mobi.ng name.ng net.ng org.ng sch.ng
    com.eg edu.eg eun.eg gov.eg info.eg me.eg mil.eg name.eg net.eg org.eg sci.eg
    com.sa edu.sa gov.sa med.sa net.sa org.sa pub.sa sch.sa
    ac.ae co.ae gov.ae mil.ae net.ae org.ae sch.ae
    // Mexico / Argentina / Colombia / Chile-none / Peru / Venezuela
    com.mx edu.mx gob.mx net.mx org.mx
    com.ar edu.ar gob.ar int.ar mil.ar net.ar org.ar tur.ar
    com.co edu.co gov.co mil.co net.co nom.co org.co
    com.pe edu.pe gob.pe mil.pe net.pe nom.pe org.pe
    com.ve e12.ve edu.ve gob.ve info.ve mil.ve net.ve org.ve web.ve
    // Pakistan / Bangladesh-wildcard / Sri Lanka
    biz.pk com.pk edu.pk fam.pk gov.pk net.pk org.pk web.pk
    ac.lk com.lk edu.lk gov.lk net.lk org.lk sch.lk web.lk
    // classic wildcard ccTLDs (+ the canonical exception)
    *.bd *.ck *.er *.fk *.jm *.kh *.mm *.np *.pg
    !www.ck
    // private section: hosting suffixes whose subdomains are separate
    // registrants (the dedup/caps-relevant top of the private list)
    github.io githubusercontent.com gitlab.io bitbucket.io
    blogspot.com wordpress.com tumblr.com weebly.com wixsite.com webflow.io
    netlify.app vercel.app herokuapp.com onrender.com fly.dev surge.sh
    glitch.me neocities.org readthedocs.io
    appspot.com firebaseapp.com web.app pages.dev workers.dev
    azurewebsites.net cloudfront.net amplifyapp.com
    s3.amazonaws.com
    """

PSL_SNAPSHOT_RULES: tuple = tuple(
    rule
    for line in _SNAPSHOT_TEXT.splitlines()
    if not line.strip().startswith("//")
    for rule in line.split()
) + tuple(_us_state_rules())

# the parsed snapshot every weburl operator uses by default
PSL_SNAPSHOT: PslTables = parse_psl_rules(PSL_SNAPSHOT_RULES)
