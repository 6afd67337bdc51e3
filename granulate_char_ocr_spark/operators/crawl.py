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
  running ``last()`` window, keep the ``*``-group ``Disallow``
  prefixes. ``apply_robots`` is a broadcast equi-join on host plus a
  prefix predicate — rule tables are tiny (per-host robots files), so
  no shuffle touches the URL table.

robots semantics are the RFC 9309 CORE subset, documented: only the
``User-agent: *`` group is honored (no agent-specific groups), rules
are path PREFIXES (no ``$``/``*`` wildcards), ``Allow`` overrides are
not implemented, and an empty ``Disallow:`` value means allow-all (the
RFC's own example). Comments (``#``) and blank lines are ignored;
field names match case-insensitively."""

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
    robots: DataFrame, host_col: str = "host", text_col: str = "robots_txt"
) -> DataFrame:
    """(host, robots_txt) -> (host, disallow) rules for the ``*`` group.

    Relational parse: posexplode lines → strip comments/whitespace →
    carry the governing User-agent group forward with last(ignorenulls)
    over line order → keep ``Disallow`` lines whose group contains
    ``*``. Hosts whose robots.txt yields no rules simply emit no rows
    (allow-all). Empty ``Disallow:`` values are dropped here (they mean
    allow-all per RFC 9309), so every emitted rule is a real prefix."""
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
    lines_g = fields.withColumn(
        "gid", F.sum(run_start.cast("int")).over(w_run)
    )
    star_groups = (
        lines_g.filter(is_ua & (F.col("value") == "*"))
        .select(host_col, "gid")
        .distinct()
    )
    disallows = lines_g.filter(
        (F.col("field") == "disallow") & (F.col("value") != "")
        # gid 0 = rules before any User-agent line: outside any group,
        # ignored per the RFC (the join below drops them since no star
        # group has gid 0)
    )
    return (
        # star_groups is per-host-per-group — always tiny; broadcast
        # keeps the parse free of a sort-merge exchange pair
        disallows.join(F.broadcast(star_groups), [host_col, "gid"])
        .select(host_col, F.col("value").alias("disallow"))
        .distinct()
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


def apply_robots(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
) -> DataFrame:
    """(…, url, host) × (host, disallow) -> (…, allowed): a URL is
    allowed iff NO ``*``-group disallow prefix matches its path. The
    rules side is broadcast (robots files are tiny relative to any
    crawl), so the URL table never shuffles. The path slice is the
    SHARED urlfilter constant — the frontier rules and the robots
    apply must parse URLs identically."""
    from granulate_char_ocr_spark.operators.urlfilter import _RE_PATH

    path = F.regexp_extract(F.col(url_col), _RE_PATH, 1)
    u = urls.withColumn("_path", F.when(path == "", "/").otherwise(path))
    r = F.broadcast(
        rules.groupBy(host_col).agg(
            F.collect_list("disallow").alias("_dis")
        )
    )
    j = u.join(r, host_col, "left")
    blocked = F.exists(
        F.coalesce(F.col("_dis"), F.array()),
        lambda d: F.col("_path").startswith(d),
    )
    return j.withColumn("allowed", ~blocked).drop("_dis", "_path")
