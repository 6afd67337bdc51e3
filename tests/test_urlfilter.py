"""URL quality filter: per-rule semantics, Spark ≡ DuckDB rule parity,
gate-query parity, and the filter_bbox_parts demotion parity."""

import duckdb
import pytest
from pyspark.sql import functions as F

from granulate_char_ocr_spark.operators.urlfilter import (
    url_quality,
    url_quality_oracle_sql,
)

# (url, expected_keep, expected_reasons) — one per rule plus keeps/combos
RULE_CASES = [
    ("https://news.example.com/p/1", True, ""),
    ("http://blog.example.org/a/b", True, ""),
    ("ftp://files.example.com/x", False, "scheme"),
    ("//no-scheme.example.com/x", False, "scheme"),
    ("https://10.2.0.7/p/1", False, "ip_host,digits"),
    ("https://blog.example.org:8080/p/1", False, "port"),
    ("https://casino-winbig.example.com/p/1", False, "blocklist"),
    ("https://shop.example.top/p/1", False, "tld"),
    ("https://cdn123456.example.net/p/1", False, "digits"),
    ("https://deep.example.com/a/b/c/d/e/f/g/h", False, "depth"),
    ("https://deep.example.com/a/b/c/d/e/f", True, ""),  # depth == 6 kept
    ("https://files.example.com/assets/pack.zip", False, "extension"),
    ("https://files.example.com/assets/page.html", True, ""),
    ("https://news.example.com/p/1?a=1&b=2&c=3&d=4&e=5", False, "query_spam"),
    ("https://news.example.com/p/1?a=1&b=2&c=3&d=4", True, ""),  # 4 kept
    ("https://news.example.com/" + "x" * 200, False, "length"),
    # combos report every fired rule in rule order
    ("ftp://casino.example.top:21/x.zip?a=1&b=2&c=3&d=4&e=5", False,
     "scheme,port,blocklist,tld,extension,query_spam"),
    # credentials can't shield a blocklisted host (host = after last @)
    ("https://a:b@casino-winbig.example.top/x", False,
     "userinfo,blocklist,tld"),
    ("https://user@news.example.com/p/1", False, "userinfo"),
]


@pytest.fixture(scope="module")
def filtered(spark):
    df = spark.createDataFrame(
        [(i, u) for i, (u, _, _) in enumerate(RULE_CASES)],
        "i int, url string",
    )
    return {
        r.i: r
        for r in url_quality(df, keep_cols=("i",)).collect()
    }


@pytest.mark.parametrize(
    "idx", range(len(RULE_CASES)), ids=[u for u, _, _ in RULE_CASES]
)
def test_rule_semantics(filtered, idx):
    _, keep, reasons = RULE_CASES[idx]
    assert filtered[idx].keep == keep
    assert filtered[idx].reasons == reasons


def test_duckdb_rule_parity(filtered):
    """The oracle-side SQL rules fire identically on every case."""
    con = duckdb.connect()
    host, keep, reasons = url_quality_oracle_sql("url")
    rows = con.execute(
        f"SELECT i, url, {host} AS host, {keep} AS keep, "
        f"{reasons} AS reasons FROM (SELECT * FROM (VALUES "
        + ", ".join(
            f"({i}, '{u}')" for i, (u, _, _) in enumerate(RULE_CASES)
        )
        + ") t(i, url))"
    ).fetchall()
    for i, url, host_v, keep_v, reasons_v in rows:
        assert keep_v == filtered[i].keep, url
        assert reasons_v == filtered[i].reasons, url
        assert host_v == filtered[i].host, url


def test_url_filter_docs_parity(spark):
    """Gate query vs oracle at sf0.001, full row equality."""
    from granulate_char_ocr_spark import driver_queries

    sf = "/root/testdata/sf0.001"
    got = {
        tuple(r)
        for r in driver_queries.QUERIES["url_filter_docs"](
            spark, sf
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    want = {
        tuple(r)
        for r in con.execute(
            driver_queries.ORACLES["url_filter_docs"]
        ).fetchall()
    }
    assert got == want
    # the synthesized branch mix actually exercises the rule set
    fired = {
        reason for *_, reasons in got if reasons for reason in reasons.split(",")
    }
    assert {"scheme", "ip_host", "port", "blocklist", "tld",
            "depth", "extension", "query_spam"} <= fired


CANON_CASES = [
    # (raw, canonical)
    ("HTTPS://News.Example.COM/p/1", "https://news.example.com/p/1"),
    ("https://h.example.com:443/a", "https://h.example.com/a"),
    ("http://h.example.com:80/a", "http://h.example.com/a"),
    ("https://h.example.com:8443/a", "https://h.example.com:8443/a"),
    ("https://h.example.com/a#frag", "https://h.example.com/a"),
    ("https://h.example.com/a/", "https://h.example.com/a"),
    ("https://h.example.com/", "https://h.example.com/"),
    # RFC 3986 §6.2.3: empty path normalizes to '/' — same key as above
    ("https://h.example.com", "https://h.example.com/"),
    (
        "https://h.example.com/a?utm_source=x&b=2&a=1&gclid=99",
        "https://h.example.com/a?a=1&b=2",
    ),
    (
        "https://h.example.com/a?utm_source=x&fbclid=1",
        "https://h.example.com/a",
    ),
    # param ORDER collides after sort
    ("https://h.example.com/a?b=2&a=1", "https://h.example.com/a?a=1&b=2"),
    # userinfo preserved, host still lowercased
    ("https://U:p@H.example.com/a", "https://U:p@h.example.com/a"),
    # percent-encoding untouched (documented out of scope)
    ("https://h.example.com/a%2Fb", "https://h.example.com/a%2Fb"),
]


def test_canonical_url_spark_and_duckdb(spark):
    """Canonicalization: Spark expr and DuckDB mirror agree with the
    expected canonical form on every case."""
    from granulate_char_ocr_spark.operators.urlfilter import (
        canonical_url_expr,
        canonical_url_sql,
    )

    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(CANON_CASES)],
        "i int, url string",
    )
    got = {
        r.i: r.canon
        for r in df.select(
            "i", canonical_url_expr(F.col("url")).alias("canon")
        ).collect()
    }
    con = duckdb.connect()
    duck = dict(
        con.execute(
            f"SELECT i, {canonical_url_sql('url')} AS canon FROM "
            "(SELECT * FROM (VALUES "
            + ", ".join(
                f"({i}, '{u}')" for i, (u, _) in enumerate(CANON_CASES)
            )
            + ") t(i, url))"
        ).fetchall()
    )
    for i, (raw, want) in enumerate(CANON_CASES):
        assert got[i] == want, raw
        assert duck[i] == want, raw


def test_canonical_url_collides_variants(spark):
    """The whole point: every variant of one page canonicalizes to ONE
    key (URL-level dedup readiness)."""
    from granulate_char_ocr_spark.operators.urlfilter import (
        canonical_url_expr,
    )

    variants = [
        "https://News.example.com/story/",
        "HTTPS://news.example.com:443/story",
        "https://news.example.com/story#top",
        "https://news.example.com/story?utm_source=feed",
    ]
    df = spark.createDataFrame([(u,) for u in variants], "url string")
    keys = {
        r.canon
        for r in df.select(
            canonical_url_expr(F.col("url")).alias("canon")
        ).collect()
    }
    assert keys == {"https://news.example.com/story"}


def test_zero_exchange_plan(spark):
    """One scan → one projection: no Exchange anywhere in the plan."""
    from granulate_char_ocr_spark import driver_queries

    plan = driver_queries.QUERIES["url_filter_docs"](
        spark, "/root/testdata/sf0.001"
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def test_filter_bbox_parts(spark):
    """P3 conjunctive pushed-down filter (left the 50-entry gate for
    url_filter_docs in r4; pushdown stays pinned by
    test_bucketing_pruning.py): exact DuckDB parity."""
    from granulate_char_ocr_spark import driver_queries

    sf = "/root/testdata/sf0.001"
    got = {
        tuple(r)
        for r in driver_queries.filter_bbox_parts(spark, sf).collect()
    }
    con = duckdb.connect()
    con.execute(f"CREATE VIEW part AS SELECT * FROM '{sf}/part.parquet'")
    want = {
        tuple(r)
        for r in con.execute(driver_queries.FILTER_BBOX_ORACLE).fetchall()
    }
    assert got == want
