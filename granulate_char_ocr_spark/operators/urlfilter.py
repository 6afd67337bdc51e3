"""URL quality filtering — the crawl-frontier curation stage every
web-scale corpus build runs before fetching or keeping a page
(RefinedWeb §3.1 "URL filtering", the UT1-blocklist tradition): score
each URL against lexical rules and keep only content-shaped ones.

Pure whole-stage codegen: the URL never leaves the JVM. Each rule is a
named predicate over pieces sliced out with regexp_extract, and the
DuckDB oracle runs the byte-identical rule set (the html.py parity
conventions: one explicit character class per slice, no engine-specific
\\s or \\w, digit counting via length-difference which both engines
compute identically).

Rules (each contributes its name to ``reasons`` when it fires; a URL is
kept iff NO rule fires):

- scheme     — not http/https
- ip_host    — dotted-quad IP literal host (no domain reputation)
- port       — explicit port (content pages sit on default ports)
- userinfo   — credentials in the authority (classic filter evasion)
- blocklist  — adult/gambling/ad-tech token inside the host
- tld        — spam-heavy top-level domain
- digits     — >25% of host characters are digits (DGA-ish hosts)
- depth      — path deeper than 6 segments (calendar/faceted traps)
- extension  — path ends in a non-content extension (assets, archives,
               media — the fetcher wants pages, not payloads)
- query_spam — 5+ query parameters (session/tracking explosions)
- length     — URL longer than 200 chars

The token/TLD lists are deliberately SHORT, documented constants — the
operator's value is the plumbing (rule → reason → keep, identical in
both engines); production swaps in the UT1 category lists by editing
the constants, which changes no plan shape."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# host-token blocklist (UT1-style categories, abbreviated)
BLOCK_TOKENS = ("casino", "porn", "xxx", "adserver", "tracker", "viagra")
# spam-heavy TLDs (abbreviated)
BLOCK_TLDS = ("top", "click", "gq", "loan")

MAX_PATH_DEPTH = 6
MAX_URL_LEN = 200
MAX_QUERY_PARAMS = 4
MAX_HOST_DIGIT_RATIO = 0.25

# non-content extensions: assets, archives, executables, media
BLOCK_EXTS = (
    "css", "js", "ico", "png", "jpg", "jpeg", "gif", "svg", "woff",
    "zip", "gz", "tar", "rar", "exe", "dmg", "iso",
    "mp3", "mp4", "avi", "mov", "pdf",
)

# slices: one explicit character class each (Java/RE2-identical).
# The authority may carry userinfo ('user:pass@host') — the greedy
# optional '[^/?#]*@' skips past the LAST '@' so host rules can't be
# evaded by planting credentials in front of a blocklisted host.
_RE_SCHEME = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://"
_RE_HOST = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#]*@)?([^/:?#]*)"
_RE_PORT = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#]*@)?[^/:?#]*:([0-9]+)"
_RE_PATH = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)"
_RE_QUERY = r"^[^?#]*\?([^#]*)"
_RE_IP = r"^[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}$"
_RE_USERINFO = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*@"


def _rules(url: Column) -> list[tuple[str, Column]]:
    scheme = F.regexp_extract(url, _RE_SCHEME, 1)
    host = F.regexp_extract(url, _RE_HOST, 1)
    port = F.regexp_extract(url, _RE_PORT, 1)
    path = F.regexp_extract(url, _RE_PATH, 1)
    query = F.regexp_extract(url, _RE_QUERY, 1)
    host_digits = F.length(host) - F.length(
        F.regexp_replace(host, r"[0-9]", "")
    )
    # path depth = number of '/'-separated non-empty segments
    depth = F.size(F.filter(F.split(path, "/"), lambda s: s != ""))
    ext = F.lower(F.regexp_extract(path, r"\.([a-zA-Z0-9]{1,5})$", 1))
    n_params = F.when(query == "", F.lit(0)).otherwise(
        F.size(F.split(query, "&"))
    )
    tld = F.regexp_extract(host, r"\.([a-zA-Z0-9-]+)$", 1)
    block_host = F.lit(False)
    for tok in BLOCK_TOKENS:
        block_host = block_host | host.contains(tok)
    return [
        ("scheme", ~scheme.isin("http", "https")),
        ("ip_host", host.rlike(_RE_IP)),
        ("port", port != ""),
        ("userinfo", url.rlike(_RE_USERINFO)),
        ("blocklist", block_host),
        ("tld", tld.isin(*BLOCK_TLDS)),
        (
            "digits",
            (F.length(host) > 0)
            & (host_digits / F.length(host) > MAX_HOST_DIGIT_RATIO),
        ),
        ("depth", depth > MAX_PATH_DEPTH),
        ("extension", ext.isin(*BLOCK_EXTS)),
        ("query_spam", n_params > MAX_QUERY_PARAMS),
        ("length", F.length(url) > MAX_URL_LEN),
    ]


def url_quality(
    df: DataFrame, url_col: str = "url", keep_cols: tuple[str, ...] = ()
) -> DataFrame:
    """(…, url) -> (…, url, host, keep, reasons): lexical URL quality —
    ``reasons`` is the comma-joined list of fired rule names in the
    fixed rule order ('' when kept). One scan, one projection, zero
    exchanges at any scale."""
    url = F.col(url_col)
    rules = _rules(url)
    reasons = F.concat_ws(
        ",",
        F.filter(
            F.array(
                *[F.when(c, F.lit(n)).otherwise(F.lit("")) for n, c in rules]
            ),
            lambda s: s != "",
        ),
    )
    return df.select(
        *keep_cols,
        url.alias("url"),
        F.regexp_extract(url, _RE_HOST, 1).alias("host"),
        (reasons == "").alias("keep"),
        reasons.alias("reasons"),
    )


def _sql_rules(url: str) -> list[tuple[str, str]]:
    """DuckDB mirror of _rules, byte-identical semantics."""
    scheme = f"regexp_extract({url}, '{_RE_SCHEME}', 1)"
    host = f"regexp_extract({url}, '{_RE_HOST}', 1)"
    port = f"regexp_extract({url}, '{_RE_PORT}', 1)"
    path = f"regexp_extract({url}, '{_RE_PATH}', 1)"
    query = f"regexp_extract({url}, '{_RE_QUERY}', 1)"
    host_digits = (
        f"(length({host}) - length(regexp_replace({host}, '[0-9]', '', 'g')))"
    )
    depth = (
        f"len(list_filter(string_split({path}, '/'), s -> s <> ''))"
    )
    ext = f"lower(regexp_extract({path}, '\\.([a-zA-Z0-9]{{1,5}})$', 1))"
    n_params = (
        f"CASE WHEN {query} = '' THEN 0 "
        f"ELSE len(string_split({query}, '&')) END"
    )
    tld = f"regexp_extract({host}, '\\.([a-zA-Z0-9-]+)$', 1)"
    block = " OR ".join(f"contains({host}, '{t}')" for t in BLOCK_TOKENS)
    tlds = ", ".join(f"'{t}'" for t in BLOCK_TLDS)
    exts = ", ".join(f"'{e}'" for e in BLOCK_EXTS)
    return [
        ("scheme", f"{scheme} NOT IN ('http', 'https')"),
        ("ip_host", f"regexp_matches({host}, '{_RE_IP}')"),
        ("port", f"{port} <> ''"),
        ("userinfo", f"regexp_matches({url}, '{_RE_USERINFO}')"),
        ("blocklist", f"({block})"),
        ("tld", f"{tld} IN ({tlds})"),
        (
            "digits",
            f"(length({host}) > 0 AND {host_digits} * 1.0 / length({host})"
            f" > {MAX_HOST_DIGIT_RATIO})",
        ),
        ("depth", f"{depth} > {MAX_PATH_DEPTH}"),
        ("extension", f"{ext} IN ({exts})"),
        ("query_spam", f"{n_params} > {MAX_QUERY_PARAMS}"),
        ("length", f"length({url}) > {MAX_URL_LEN}"),
    ]


# query parameters that never change page content (session/campaign
# tracking) — dropped during canonicalization
TRACKING_PARAMS = (
    "utm_source", "utm_medium", "utm_campaign", "utm_term",
    "utm_content", "gclid", "fbclid", "ref",
)


def canonical_url_expr(url: Column) -> Column:
    """RFC 3986-style URL canonicalization as pure column expressions —
    the prerequisite for URL-level dedup (the same page arrives under
    scheme-case, default-port, fragment, tracking-param and
    param-order variants). Steps, each deterministic:

    1. lowercase scheme and host (authority userinfo preserved as-is);
    2. strip default ports (:80 for http, :443 for https);
    3. drop the fragment;
    4. drop tracking query params (TRACKING_PARAMS, exact-name match);
    5. sort surviving query params bytewise (order never matters
       server-side; sorting makes variants collide);
    6. drop a now-empty query; strip one trailing slash from non-root
       paths ('/a/' ≡ '/a' for dedup purposes — documented choice).

    Percent-encoding is NOT normalized (decoding reserved characters
    changes meaning; decoding only unreserved ones is rarely load-
    bearing for dedup and is documented out of scope)."""
    scheme = F.lower(F.regexp_extract(url, _RE_SCHEME, 1))
    after = F.regexp_extract(
        url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^#]*)", 1
    )  # authority+path+query, fragment gone
    authority = F.regexp_extract(after, r"^([^/?]*)", 1)
    pathq = F.substring(after, F.length(authority) + 1, F.lit(1 << 30))
    userinfo = F.regexp_extract(authority, r"^([^@]*@)", 1)
    hostport = F.lower(
        F.regexp_replace(authority, r"^[^@]*@", "")
    )
    host = F.regexp_extract(hostport, r"^([^:]*)", 1)
    port = F.regexp_extract(hostport, r":([0-9]+)$", 1)
    drop_port = (
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
        | (port == "")
    )
    norm_auth = F.concat(
        userinfo, F.when(drop_port, host).otherwise(hostport)
    )
    path = F.regexp_extract(pathq, r"^([^?]*)", 1)
    query = F.when(
        pathq.contains("?"), F.regexp_replace(pathq, r"^[^?]*\?", "")
    ).otherwise(F.lit(""))
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "")
            & ~F.regexp_extract(p, r"^([^=]*)", 1).isin(*TRACKING_PARAMS),
        )
    )
    norm_q = F.when(
        F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))
    ).otherwise(F.lit(""))
    norm_path = (
        # RFC 3986 §6.2.3: an empty http(s) path normalizes to '/' —
        # 'https://h' and 'https://h/' are the same resource and must
        # share one dedup key
        F.when(path == "", F.lit("/"))
        .when(
            (F.length(path) > 1) & path.endswith("/"),
            F.substring(path, F.lit(1), F.length(path) - 1),
        )
        .otherwise(path)
    )
    return F.concat(scheme, F.lit("://"), norm_auth, norm_path, norm_q)


def canonical_url_sql(url: str) -> str:
    """DuckDB mirror of canonical_url_expr (byte-identical steps)."""
    scheme = f"lower(regexp_extract({url}, '{_RE_SCHEME}', 1))"
    after = (
        f"regexp_extract({url}, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^#]*)', 1)"
    )
    authority = f"regexp_extract({after}, '^([^/?]*)', 1)"
    pathq = f"{after}[length({authority}) + 1:]"
    userinfo = f"regexp_extract({authority}, '^([^@]*@)', 1)"
    hostport = f"lower(regexp_replace({authority}, '^[^@]*@', ''))"
    host = f"regexp_extract({hostport}, '^([^:]*)', 1)"
    port = f"regexp_extract({hostport}, ':([0-9]+)$', 1)"
    drop_port = (
        f"(({scheme} = 'http' AND {port} = '80') OR "
        f"({scheme} = 'https' AND {port} = '443') OR {port} = '')"
    )
    norm_auth = (
        f"({userinfo} || CASE WHEN {drop_port} THEN {host} "
        f"ELSE {hostport} END)"
    )
    path = f"regexp_extract({pathq}, '^([^?]*)', 1)"
    query = (
        f"CASE WHEN contains({pathq}, '?') "
        f"THEN regexp_replace({pathq}, '^[^\\?]*\\?', '') ELSE '' END"
    )
    params = ", ".join(f"'{p}'" for p in TRACKING_PARAMS)
    kept = (
        f"list_sort(list_filter(string_split({query}, '&'), "
        f"p -> p <> '' AND NOT regexp_extract(p, '^([^=]*)', 1) "
        f"IN ({params})))"
    )
    norm_q = (
        f"CASE WHEN len({kept}) > 0 "
        f"THEN '?' || array_to_string({kept}, '&') ELSE '' END"
    )
    norm_path = (
        f"CASE WHEN {path} = '' THEN '/' "
        f"WHEN length({path}) > 1 AND ends_with({path}, '/') "
        f"THEN {path}[1:length({path}) - 1] ELSE {path} END"
    )
    return f"({scheme} || '://' || {norm_auth} || {norm_path} || {norm_q})"


def url_quality_oracle_sql(url: str) -> tuple[str, str, str]:
    """(host_sql, keep_sql, reasons_sql) for a URL expression — the
    oracle side of ``url_quality``."""
    rules = _sql_rules(url)
    arr = ", ".join(
        f"CASE WHEN {cond} THEN '{name}' ELSE '' END" for name, cond in rules
    )
    reasons = (
        f"coalesce(array_to_string(list_filter([{arr}], s -> s <> ''), "
        "','), '')"
    )
    host = f"regexp_extract({url}, '{_RE_HOST}', 1)"
    return host, f"({reasons} = '')", reasons
