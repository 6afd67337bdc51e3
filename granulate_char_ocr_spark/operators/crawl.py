"""Crawl-maintenance operators — the incremental-ingest stages of a
web-scale pipeline: snapshot diffing (what changed since the last
crawl?) and robots.txt compliance (what may be kept at all?).

Both are pure DataFrame compositions (no Python anywhere):

- ``snapshot_diff`` is ONE full-outer join on the page key with status
  classification in the projection — at 100 TB this is a single
  co-partitioned shuffle on the join key, and AQE handles the
  almost-always-skewed "unchanged" majority.
- ``robots_rules`` parses robots.txt TEXT relationally: explode lines,
  attach each line to its governing ``User-agent`` group with a
  running-window group id, pick the governing group (agent-specific if
  one names our product token, else the ``*`` group, RFC 9309 §2.2.1),
  and compile each ``Allow``/``Disallow`` value to an anchored regex
  (``*`` → ``.*``, trailing ``$`` → end anchor, everything else
  escaped) — all in column expressions. ``apply_robots`` is a
  broadcast equi-join on host plus a longest-match fold over the
  host's rules — rule tables are tiny (per-host robots files), so no
  shuffle touches the URL table.

robots semantics are RFC 9309 matching: ``Allow`` and ``Disallow``
both honored, ``*`` matches any character run, a trailing ``$``
anchors the end, precedence is the longest (most-octets) matching
rule with ties broken toward ``Allow`` (§2.2.2), and an empty rule
value means no rule (the RFC's allow-all example). Matching is
against the URL path (the shared urlfilter path slice). Comments
(``#``) and blank lines are ignored; field names and user-agent
product tokens match case-insensitively."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "url",
    content_col: str = "content",
) -> DataFrame:
    """(old snapshot, new snapshot) -> (key, status, old_len, new_len)
    with status ∈ added | removed | changed | unchanged. One full-outer
    join; content equality is compared directly (engine-native string
    compare), lengths surfaced for audit."""
    # presence is tracked with explicit markers, NOT content nullity: a
    # snapshot row whose content is NULL is still PRESENT (it would
    # otherwise misclassify as added/removed), and NULL↔NULL content
    # must compare unchanged (eqNullSafe)
    o = old.select(
        F.col(key_col).alias("_k"),
        F.col(content_col).alias("_old"),
        F.lit(True).alias("_in_old"),
    )
    n = new.select(
        F.col(key_col).alias("_k"),
        F.col(content_col).alias("_new"),
        F.lit(True).alias("_in_new"),
    )
    j = o.join(n, "_k", "full_outer")
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(F.col("_old").eqNullSafe(F.col("_new")), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(
        F.col("_k").alias(key_col),
        status.alias("status"),
        F.length("_old").alias("old_len"),
        F.length("_new").alias("new_len"),
    )


def robots_rules(
    robots: DataFrame,
    host_col: str = "host",
    text_col: str = "robots_txt",
    agent: str | None = None,
) -> DataFrame:
    """(host, robots_txt) -> (host, rule, is_allow, prio, pattern).

    Relational parse: posexplode lines → strip comments/whitespace →
    group lines under their governing User-agent run → pick the
    governing group per host (a group naming ``agent``'s product token
    case-insensitively if one exists, else the ``*`` group — RFC 9309
    §2.2.1) → keep that group's ``Allow``/``Disallow`` lines.

    Each rule is compiled to an anchored Java/RE2-common regex in pure
    column expressions: a trailing ``$`` becomes an end anchor, ``*``
    becomes ``.*``, every other regex metachar is escaped; ``prio`` is
    the rule's octet length (the RFC's longest-match precedence key).
    Hosts whose robots.txt yields no rules simply emit no rows
    (allow-all). Empty rule values are dropped here (they mean no rule
    per RFC 9309), so every emitted row is a real pattern."""
    lines_g = _grouped_lines(robots, host_col, text_col)
    groups = _governing_groups(lines_g, host_col, agent)
    rules = lines_g.filter(
        F.col("field").isin("disallow", "allow") & (F.col("value") != "")
        # gid 0 = rules before any User-agent line: outside any group,
        # ignored per the RFC (the join below drops them since no
        # governing group has gid 0)
    )
    # rule value -> anchored regex, all codegen: strip one trailing '$'
    # (the RFC end anchor), escape every Java-regex metachar EXCEPT
    # '*', then turn '*' into '.*'; '^' + body (+ '$' if anchored)
    # gives prefix semantics under RLIKE's find-at-position matching.
    # A mid-rule '$' is literal per the RFC and lands in the escape.
    v = F.col("value")
    anchored = v.endswith("$")
    body = F.regexp_replace(v, r"\$$", "")
    esc = F.regexp_replace(body, r"([\\.\[\]{}()+\-?^$|])", r"\\$1")
    rx = F.regexp_replace(esc, r"\*", ".*")
    pattern = F.concat(
        F.lit("^"), rx, F.when(anchored, F.lit("$")).otherwise(F.lit(""))
    )
    return (
        # groups is per-host-per-group — always tiny; broadcast keeps
        # the parse free of a sort-merge exchange pair
        rules.join(F.broadcast(groups), [host_col, "gid"])
        .select(
            host_col,
            v.alias("rule"),
            (F.col("field") == "allow").alias("is_allow"),
            F.octet_length(v).alias("prio"),
            pattern.alias("pattern"),
        )
        .distinct()
    )


def _grouped_lines(
    robots: DataFrame, host_col: str, text_col: str
) -> DataFrame:
    """robots.txt text -> one row per field line with its governing
    User-agent group id (host, line_no, field, value, gid)."""
    lines = robots.select(
        host_col,
        F.posexplode(F.split(F.col(text_col), "\n")).alias("line_no", "raw"),
    ).select(
        host_col,
        "line_no",
        # strip comments, then surrounding whitespace (explicit class —
        # the cross-engine \s trap, see functions/html.py)
        F.regexp_replace(
            F.regexp_replace("raw", "#.*$", ""), r"^[ \t\r]+|[ \t\r]+$", ""
        ).alias("line"),
    )
    fields = lines.select(
        host_col,
        "line_no",
        F.lower(F.regexp_extract("line", r"^([A-Za-z-]+)[ \t]*:", 1)).alias(
            "field"
        ),
        F.regexp_replace(
            F.regexp_extract("line", r"^[A-Za-z-]+[ \t]*:[ \t]*(.*)$", 1),
            r"[ \t\r]+$",
            "",
        ).alias("value"),
    )
    # consecutive User-agent lines open ONE group (RFC 9309 §2.2.1),
    # and a group's rules run until the next UA run starts. Assign each
    # line the id of the most recent UA-run START at-or-before it, then
    # keep Disallow lines whose group contains a '*' agent line — this
    # honors '*' anywhere in the run, not just as the last UA line.
    # Blank and comment-only lines parse to field='' and are dropped
    # BEFORE the windows: the RFC ignores them entirely, so they must
    # not split a UA run (a '#' comment between two UA lines would
    # otherwise sever the group and silently drop its rules).
    fields = fields.filter(F.col("field") != "")
    w_ord = Window.partitionBy(host_col).orderBy("line_no")
    w_run = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    is_ua = F.col("field") == "user-agent"
    run_start = is_ua & ~F.coalesce(
        F.lag(is_ua).over(w_ord), F.lit(False)
    )
    return fields.withColumn(
        "gid", F.sum(run_start.cast("int")).over(w_run)
    )


def _governing_groups(
    lines_g: DataFrame, host_col: str, agent: str | None
) -> DataFrame:
    """Grouped lines -> the (host, gid) group ids whose rules govern
    ``agent``: the groups naming its product token (case-insensitive)
    when any exist for a host, else that host's ``*`` groups — RFC
    9309 §2.2.1."""
    is_ua = F.col("field") == "user-agent"
    ua_lines = lines_g.filter(is_ua)
    star_groups = (
        ua_lines.filter(F.col("value") == "*")
        .select(host_col, "gid")
        .distinct()
        .withColumn("_spec", F.lit(False))
    )
    if agent is None:
        return star_groups.select(host_col, "gid")
    spec_groups = (
        ua_lines.filter(F.lower(F.col("value")) == agent.lower())
        .select(host_col, "gid")
        .distinct()
        .withColumn("_spec", F.lit(True))
    )
    # RFC 9309 §2.2.1: if a group names our product token, ONLY that
    # group governs; the '*' group is the fallback. The window runs
    # over the tiny per-host group table, not the line table.
    w_host = Window.partitionBy(host_col)
    return (
        star_groups.unionByName(spec_groups)
        .withColumn(
            "_has_spec", F.max(F.col("_spec").cast("int")).over(w_host)
        )
        .filter(F.col("_spec").cast("int") == F.col("_has_spec"))
        .select(host_col, "gid")
    )


def robots_crawl_delay(
    robots: DataFrame,
    host_col: str = "host",
    text_col: str = "robots_txt",
    agent: str | None = None,
) -> DataFrame:
    """(host, robots_txt) -> (host, crawl_delay): the governing group's
    ``Crawl-delay`` in seconds — the de-facto politeness directive
    (not in RFC 9309 but honored by most crawlers). Group selection is
    the same machinery as robots_rules; when a group states several
    delays the MAXIMUM non-negative one wins — the strictest directive
    is the conservative reading for the site (review finding r4: min
    would fetch faster than the site asked) — and non-numeric values
    are ignored. Hosts without a valid directive emit no row (crawler
    default applies)."""
    lines_g = _grouped_lines(robots, host_col, text_col)
    groups = _governing_groups(lines_g, host_col, agent)
    # try_cast: ANSI mode (Spark 4 default) would THROW on a malformed
    # delay value; a junk directive must be ignored, not kill the job
    delay = F.col("value").try_cast("double")
    delays = lines_g.filter(
        (F.col("field") == "crawl-delay")
        & delay.isNotNull()
        & (delay >= 0)
    )
    return (
        delays.join(F.broadcast(groups), [host_col, "gid"])
        .groupBy(host_col)
        .agg(F.max(delay).alias("crawl_delay"))
    )


def host_budget_sample(
    urls: DataFrame,
    k: int,
    host_col: str = "host",
    url_col: str = "url",
    seed: int = 0,
) -> DataFrame:
    """Deterministic per-host frontier budget: keep at most ``k`` URLs
    per host, chosen by hash rank — the politeness/anti-spam cap every
    crawl scheduler applies before fetch (a single host must not own
    the batch).

    Selection is ``xxhash64(url, seed)``-ordered, so it is
    partition-layout-invariant and stable across retries (the same
    property as operators/sampling.py), and changing ``seed`` rotates
    the kept set without re-ranking semantics. One exchange on host;
    the per-host window sort is bounded by per-host frontier size —
    at 100 TB the frontier is consumed in batches, so the sort input
    per host is the batch slice, not the full crawl history. Ties on
    the 64-bit hash are broken by the URL itself, making the kept set
    a pure function of (url set, k, seed)."""
    w = Window.partitionBy(host_col).orderBy(
        F.xxhash64(F.col(url_col), F.lit(seed)), F.col(url_col)
    )
    return (
        urls.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def sitemap_urls(
    df: DataFrame, xml_col: str = "sitemap_xml", key_col: str = "host"
) -> DataFrame:
    """(key, sitemap_xml) -> (key, loc, lastmod): the <url> entries of a
    sitemap (sitemaps.org schema), parsed as pure column expressions —
    extract <url> blocks, then each block's <loc>/<lastmod> (lastmod
    NULL when absent). Namespace prefixes and attribute noise inside
    the tags are not handled (the published schema doesn't prefix these
    elements); <sitemapindex> files yield zero rows here — feed their
    child sitemaps back through this operator."""
    blocks = F.regexp_extract_all(
        F.col(xml_col), F.lit(r"(?is)<url>(.*?)</url>"), 1
    )
    entries = F.transform(
        blocks,
        lambda b: F.struct(
            F.regexp_extract(
                b, r"(?is)<loc>[ \t\r\n]*([^<]*?)[ \t\r\n]*</loc>", 1
            ).alias("loc"),
            F.regexp_extract(
                b,
                r"(?is)<lastmod>[ \t\r\n]*([^<]*?)[ \t\r\n]*</lastmod>",
                1,
            ).alias("lastmod"),
        ),
    )
    return (
        df.select(key_col, F.explode(entries).alias("_e"))
        .select(
            key_col,
            F.col("_e.loc").alias("loc"),
            F.nullif(F.col("_e.lastmod"), F.lit("")).alias("lastmod"),
        )
        .filter(F.col("loc") != "")
    )


_CDATA = r"(?s)<!\[CDATA\[(.*?)\]\]>"


def _feed_text(c):
    """CDATA-unwrap, XML-entity-decode and trim an extracted feed field
    (pure column expressions). Entity decode is the SHARED
    functions/html.py tail with the predefined-XML named set
    (lt/gt/quot/apos — no &nbsp;, which XML doesn't define) — the
    named-first/amp-LAST ordering contract and the numeric
    character-reference pass live in one place (review finding r4)."""
    from granulate_char_ocr_spark.functions.html import (
        XML_ENTITIES_PRE,
        decode_entities_expr,
    )

    out = F.regexp_replace(c, F.lit(_CDATA), F.lit("$1"))
    return F.trim(decode_entities_expr(out, pre=XML_ENTITIES_PRE))


def feed_entries(
    df: DataFrame, xml_col: str = "feed_xml", key_col: str = "host"
) -> DataFrame:
    """(key, feed_xml) -> (key, fmt, link, title, published): the
    entries of an RSS 2.0 or Atom 1.0 feed — the third crawl-discovery
    channel next to sitemaps and the link graph (feeds surface NEW
    urls faster than either; every crawl scheduler polls them).

    Parsed as pure column expressions, one regex family per format:

    - RSS 2.0 (RSS Advisory Board spec): ``<item>`` blocks; ``link`` is
      the ``<link>`` element TEXT, ``published`` is ``<pubDate>``.
    - Atom 1.0 (RFC 4287): ``<entry>`` blocks; ``link`` is the ``href``
      ATTRIBUTE of the first ``<link>`` whose ``rel`` is absent or
      ``alternate`` (§4.2.7.2: no rel means alternate), ``published``
      prefers ``<published>``, falling back to ``<updated>``.

    Both formats can appear in one corpus (or one row), so both block
    families are extracted and concatenated before the single explode.
    Titles and links are CDATA-unwrapped and XML-entity-decoded;
    ``published`` stays the raw date string (RFC 822 vs RFC 3339 —
    normalization is the caller's tier). Entries without a link are
    dropped (nothing to fetch). Namespace-prefixed dialects (RSS 1.0 /
    RDF) yield zero rows here — documented out of scope, as with
    <sitemapindex> above. Per row the work is a bounded regex cascade
    in whole-stage codegen; the explode is the only row multiplier —
    the same 100 TB posture as ``sitemap_urls``."""
    xml = F.col(xml_col)
    rss_blocks = F.regexp_extract_all(
        xml, F.lit(r"(?is)<item\b[^>]*>(.*?)</item>"), 1
    )
    atom_blocks = F.regexp_extract_all(
        xml, F.lit(r"(?is)<entry\b[^>]*>(.*?)</entry>"), 1
    )
    title_re = r"(?is)<title\b[^>]*>(.*?)</title>"

    def rss_entry(b):
        return F.struct(
            F.lit("rss").alias("fmt"),
            _feed_text(
                F.regexp_extract(b, r"(?is)<link\b[^>]*>(.*?)</link>", 1)
            ).alias("link"),
            _feed_text(F.regexp_extract(b, title_re, 1)).alias("title"),
            F.trim(
                F.regexp_extract(
                    b, r"(?is)<pubDate\b[^>]*>(.*?)</pubDate>", 1
                )
            ).alias("published"),
        )

    # Atom link: first <link> element carrying rel="alternate" or no
    # rel at all, href pulled from inside that one tag. The no-rel
    # branch must reject only a rel ATTRIBUTE — i.e. 'rel=' preceded by
    # whitespace — not the substring 'rel=' inside an href value
    # ('<link href="…/v?rel=author"/>' is a valid bare link; review
    # finding r4). The negative lookahead is Java-regex-only (this
    # pattern never needs a DuckDB mirror — the feed leg is
    # pytest-verified); a URL containing a literal space before 'rel='
    # would still be rejected, but spaces are illegal in URLs.
    _ATOM_ALT_LINK = (
        r"(?is)<link\b(?:[^>]*[ \t\r\n]rel\s*=\s*[\"']alternate[\"'][^>]*"
        r"|(?:[^>\s]|\s(?!rel\s*=))*)>"
    )

    def atom_link(b):
        tag = F.regexp_extract(b, _ATOM_ALT_LINK, 0)
        return _feed_text(
            F.regexp_extract(
                tag, r"(?is)\bhref\s*=\s*[\"']([^\"']*)[\"']", 1
            )
        )

    def atom_entry(b):
        pub = F.trim(
            F.regexp_extract(
                b, r"(?is)<published\b[^>]*>(.*?)</published>", 1
            )
        )
        upd = F.trim(
            F.regexp_extract(b, r"(?is)<updated\b[^>]*>(.*?)</updated>", 1)
        )
        return F.struct(
            F.lit("atom").alias("fmt"),
            atom_link(b).alias("link"),
            _feed_text(F.regexp_extract(b, title_re, 1)).alias("title"),
            F.when(pub != "", pub).otherwise(upd).alias("published"),
        )

    entries = F.concat(
        F.transform(rss_blocks, rss_entry),
        F.transform(atom_blocks, atom_entry),
    )
    return (
        df.select(key_col, F.explode(entries).alias("_e"))
        .select(
            key_col,
            F.col("_e.fmt").alias("fmt"),
            F.col("_e.link").alias("link"),
            F.nullif(F.col("_e.title"), F.lit("")).alias("title"),
            F.nullif(F.col("_e.published"), F.lit("")).alias("published"),
        )
        .filter(F.col("link") != "")
    )


def apply_robots(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
) -> DataFrame:
    """(…, url, host) × robots_rules output -> (…, allowed) under RFC
    9309 precedence: among the host's rules whose pattern matches the
    URL path, the longest (highest ``prio``) governs, ties break
    toward ``Allow``; no match (or no robots) means allowed. The fold
    is a single ``aggregate`` over the matching rules — entirely
    engine-side, no Python.

    The rules side is broadcast (robots files are tiny relative to any
    crawl), so the URL table never shuffles; the per-row RLIKE against
    a handful of non-foldable host patterns stays inside codegen. The
    path slice is the SHARED urlfilter constant — the frontier rules
    and the robots apply must parse URLs identically."""
    from granulate_char_ocr_spark.operators.urlfilter import _RE_PATH

    path = F.regexp_extract(F.col(url_col), _RE_PATH, 1)
    u = urls.withColumn("_path", F.when(path == "", "/").otherwise(path))
    r = F.broadcast(
        rules.groupBy(host_col).agg(
            F.collect_list(F.struct("prio", "is_allow", "pattern")).alias(
                "_rules"
            )
        )
    )
    j = u.join(r, host_col, "left")
    matches = F.filter(
        F.coalesce(F.col("_rules"), F.array()),
        lambda x: F.rlike(F.col("_path"), x["pattern"]),
    )
    # longest-match fold; the init prio -1 < any real rule's octet
    # length, so "no matching rule" resolves to the init's allow=true
    best = F.aggregate(
        matches,
        F.struct(F.lit(-1).alias("prio"), F.lit(True).alias("is_allow")),
        lambda acc, x: F.when(
            (x["prio"] > acc["prio"])
            | ((x["prio"] == acc["prio"]) & x["is_allow"]),
            F.struct(x["prio"].alias("prio"), x["is_allow"].alias("is_allow")),
        ).otherwise(acc),
    )
    return j.withColumn("allowed", best["is_allow"]).drop("_rules", "_path")


# --- CDX: the crawl-index lookup format --------------------------------

# A CDXJ line (the Common Crawl index layout) is 'SURT timestamp JSON':
#   org,example)/path 20240101123456 {"url": "...", "status": "200",
#   "mime": "text/html", "digest": "sha1:..", "length": "1234",
#   "offset": "456", "filename": "crawl/.../x.warc.gz"}
# Parsing it is how a pipeline FINDS records inside a petabyte WARC
# store without reading the WARCs — the index is the random-access
# layer the ingest planner queries.
_CDX_JSON = r"^\S+ \S+ (.*)$"
_CDX_TS = r"^\S+ (\S+) "


def surt_expr(url):
    """URL -> SURT key (Sort-friendly URI Reordering Transform): host
    lowercased, leading 'www.' dropped, dot-segments REVERSED and
    comma-joined, then ')' and the lowercased path. The key Common
    Crawl's index sorts on — same-site rows become one contiguous,
    prefix-scannable range. Query strings are dropped (the documented
    simplification vs CC's full canonicalizer, which also strips
    sessions params — our canonical_url_expr handles that separately).
    Pure codegen."""
    from granulate_char_ocr_spark.operators.urlfilter import (
        _RE_HOST,
        _RE_PATH,
    )

    host = F.lower(F.regexp_extract(url, _RE_HOST, 1))
    host = F.regexp_replace(host, r"^www\.", "")
    path = F.lower(F.regexp_extract(url, _RE_PATH, 1))
    path = F.when(path == "", F.lit("/")).otherwise(path)
    return F.concat(
        F.array_join(F.reverse(F.split(host, r"\.")), ","),
        F.lit(")"),
        path,
    )


def cdx_records(df: DataFrame, line_col: str = "cdx_line") -> DataFrame:
    """(…, cdx_line) -> (…, surt, ts, url, status, mime, digest,
    length, offset, filename): one CDXJ index line parsed to typed
    columns. get_json_object is JVM-side; numeric fields use try_cast
    (ANSI mode throws on junk — CLAUDE.md), so a malformed line yields
    NULL fields, never a task failure. Zero exchanges."""
    line = F.col(line_col)
    j = F.regexp_extract(line, _CDX_JSON, 1)

    def g(field):
        return F.get_json_object(j, f"$.{field}")

    # a carried column named like one of the nine outputs (a frontier
    # row that already has 'url'/'status') would duplicate the name
    # and make every downstream F.col ambiguous — the parse wins
    out_names = {
        "surt", "ts", "url", "status", "mime",
        "digest", "length", "offset", "filename",
    }
    carried = [
        c for c in df.columns if c != line_col and c not in out_names
    ]
    return df.select(
        *carried,
        F.substring_index(line, " ", 1).alias("surt"),
        F.regexp_extract(line, _CDX_TS, 1).alias("ts"),
        g("url").alias("url"),
        g("status").try_cast("int").alias("status"),
        g("mime").alias("mime"),
        g("digest").alias("digest"),
        g("length").try_cast("bigint").alias("length"),
        g("offset").try_cast("bigint").alias("offset"),
        g("filename").alias("filename"),
    )


def cdx_first_by_digest(cdx: DataFrame) -> DataFrame:
    """Keep ONE index row per content digest — the earliest capture
    (ties broken by surt) — the crawl-index twin of exact dedup: plan
    WARC reads for distinct content only, skipping re-crawls of
    unchanged pages. One exchange (hash by digest); rows with a NULL
    digest (malformed lines) are dropped — nothing to fetch."""
    w = Window.partitionBy("digest").orderBy("ts", "surt")
    return (
        cdx.filter(F.col("digest").isNotNull())
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def crawl_schedule(
    frontier: DataFrame,
    ranks: DataFrame,
    diff: DataFrame | None = None,
    per_host_budget: int = 100,
    default_rank: float = 1e-6,
) -> DataFrame:
    """Priority-ordered fetch schedule — the stage that turns the
    crawl-maintenance signals into tomorrow's fetch list:

      priority = host authority (PageRank, graph.pagerank) ×
                 page change status (snapshot_diff):
                 added 1.0 / changed 0.8 / unchanged 0.05;
                 a URL with no diff row is new → 1.0;
                 'removed' pages leave the schedule entirely.

    Capped per host (politeness twin of host_budget_sample, but
    priority-ranked rather than hash-sampled) and ordered so the
    fetcher drains highest-value URLs first.

    Plan shape at scale: the rank table is hosts (small — broadcast),
    the diff join is one url-key shuffle, the budget cap one host-key
    window — two exchanges over the frontier regardless of corpus
    size (output is NOT globally sorted: the per-host window already
    orders each host's drain, and a global sort would add a
    range-partition exchange for an ordering the fetcher pool doesn't
    need — order by ``priority`` at the consumer if required). Hosts
    absent from the rank table get ``default_rank`` so
    newly-discovered sites are crawlable but never outrank known
    authority."""
    # project first: a frontier carrying its own 'rank'/'status'
    # columns (cdx_records output does) would make the joins ambiguous
    f = frontier.select("url", "host").join(
        F.broadcast(ranks.select("host", "rank")), "host", "left"
    )
    if diff is not None:
        f = f.join(diff.select("url", "status"), "url", "left")
        weight = (
            F.when(F.col("status") == "removed", F.lit(0.0))
            .when(F.col("status") == "changed", F.lit(0.8))
            .when(F.col("status") == "unchanged", F.lit(0.05))
            .otherwise(F.lit(1.0))  # added, or never seen
        )
    else:
        weight = F.lit(1.0)
    scored = f.select(
        "url",
        "host",
        (F.coalesce(F.col("rank"), F.lit(default_rank)) * weight).alias(
            "priority"
        ),
    ).filter(F.col("priority") > 0)
    w = Window.partitionBy("host").orderBy(
        F.col("priority").desc(), F.col("url")
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= per_host_budget)
        .drop("_rn")
    )


def robots_sitemaps(
    robots: DataFrame, host_col: str = "host", text_col: str = "robots_txt"
) -> DataFrame:
    """(host, robots_txt) -> (host, sitemap_url): the ``Sitemap:``
    lines — per RFC 9309 §2.3 / sitemaps.org these are GLOBAL (outside
    any User-agent group), so every such line counts regardless of
    grouping. Completes the discovery chain: robots_sitemaps →
    sitemap_urls → frontier. Reuses the grouped-line parse (comments,
    field case, whitespace already handled there)."""
    lines = _grouped_lines(robots, host_col, text_col)
    return (
        lines.filter(
            (F.col("field") == "sitemap") & (F.col("value") != "")
        )
        .select(host_col, F.col("value").alias("sitemap_url"))
        .distinct()
    )


_REDIRECT_STATUSES = (301, 302, 303, 307, 308)


def resolve_redirects(
    pages: DataFrame, max_hops: int = 5
) -> DataFrame:
    """(url, status, location) -> (url, final_url, n_hops): follow
    HTTP redirect chains relationally so the corpus keys pages by
    where the content actually lives (the crawl-side twin of the
    canonical-URL dedup — a 301 is the server's own canonicalization
    statement).

    ``location`` is absolutized against the source URL when relative
    (RFC 9110 §10.2.2 allows both): absolute URLs pass through,
    '//host/path' network-path references (RFC 3986 — common on
    CDN-fronted sites) take the source's scheme, '/path' targets keep
    the source's full scheme://authority (port included), anything
    else (rare relative-path form) is treated as unresolvable and ends
    the chain. Duplicate fetch records for the same redirecting URL
    (recrawls) fold to one deterministic hop (min destination) so the
    output stays one row per url. Each hop is one equi-join of the url
    table against the (bounded, redirect-only) hop map — ``max_hops``
    joins total, the standard browser/crawler hop cap; loops and
    over-long chains stop at the cap with ``n_hops = max_hops`` rather
    than spinning."""
    from granulate_char_ocr_spark.operators.urlfilter import _RE_SCHEME

    loc = F.col("location")
    # scheme://authority INCLUDING any port — _RE_HOST stops at ':'
    # and dropped the port (review finding r4)
    src_origin = F.regexp_extract(
        "url", r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1
    )
    src_scheme = F.regexp_extract("url", _RE_SCHEME, 1)
    absolute = (
        F.when(loc.rlike(r"^[a-zA-Z][a-zA-Z0-9+.-]*://"), loc)
        .when(loc.startswith("//"), F.concat(src_scheme, F.lit(":"), loc))
        .when(loc.startswith("/"), F.concat(src_origin, loc))
        .otherwise(F.lit(None).cast("string"))
    )
    hop = (
        pages.filter(
            F.col("status").isin(*_REDIRECT_STATUSES)
            & F.col("location").isNotNull()
        )
        .select(F.col("url").alias("_src"), absolute.alias("_dst"))
        .filter(F.col("_dst").isNotNull())
        # recrawl duplicates would fan out multiplicatively across the
        # hop joins (2 rows -> 2^max_hops); min() is the deterministic
        # fold (review finding r4)
        .groupBy("_src")
        .agg(F.min("_dst").alias("_dst"))
    )
    cur = pages.select(
        "url",
        F.col("url").alias("final_url"),
        F.lit(0).alias("n_hops"),
    )
    for _ in range(max_hops):
        cur = (
            cur.join(
                hop.withColumnRenamed("_src", "final_url"),
                "final_url",
                "left",
            )
            .select(
                "url",
                F.coalesce("_dst", "final_url").alias("final_url"),
                (
                    F.col("n_hops")
                    + F.when(F.col("_dst").isNotNull(), 1).otherwise(0)
                ).alias("n_hops"),
            )
        )
    return cur.select("url", "final_url", "n_hops")
