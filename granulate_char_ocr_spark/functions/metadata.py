"""Page-metadata extraction — the header fields every web-corpus
manifest carries next to the main text: title, document language,
canonical URL, meta description, and published date.

Everything is pure column expressions (regexp_extract cascades +
the shared entity decode from functions/html.py) — no UDFs, so the
whole extraction stays inside whole-stage codegen and scales as a
map over the page table. Each field degrades to NULL when absent
rather than empty-string noise, matching what a curation manifest
wants to store.

Coverage choices (documented limits, same altitude as the reference's
extraction stages — granulate-char-OCR has no web-metadata leg; this
module comes from the builder's web-tier brief):

- ``title``: first ``<title>`` element, entity-decoded, whitespace
  collapsed. Attribute noise in the open tag and multiline bodies
  handled; CDATA is not (HTML parsers don't treat it specially
  either).
- ``lang``: the ``<html lang=…>`` attribute (BCP-47 tag charset),
  quoted or bare.
- ``canonical_url``: ``<link rel=canonical href=…>`` in EITHER
  attribute order, first match wins (the duplicate-canonical case is
  a page bug; first is what browsers use).
- ``description``: ``<meta name=description content=…>`` in either
  attribute order, entity-decoded, whitespace collapsed.
- ``published``: a priority ladder mirroring how extractors source
  dates — JSON-LD ``"datePublished"`` first (most structured), then
  ``<meta property=article:published_time>`` (either attribute
  order), then the first ``<time datetime=…>``. The value is kept as
  the raw string — parsing/normalizing timestamps is a downstream
  concern (and a cross-engine trap, CLAUDE.md).

The regexes use the Java/RE2-common subset ((?is) flags, no
lookaround/backreferences) so a SQL mirror stays possible, but the
gate oracle derives expected values independently from the source
fields, not from a mirrored regex."""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

from granulate_char_ocr_spark.functions.html import (
    _WS_CLASS,
    decode_entities_expr,
    decode_entities_python,
)

_TITLE = r"(?is)<title[^>]*>(.*?)</title>"
_LANG = r"(?is)<html[^>]*[ \t\r\n]lang=[\"']?([A-Za-z][A-Za-z0-9-]*)"
# attribute order varies in the wild — one pattern per order, first
# non-empty wins. Values stop at the closing quote; bare (unquoted)
# canonical hrefs stop at whitespace or '>'.
_CANON_RH = (
    r"(?is)<link[^>]*rel=[\"']?canonical[\"']?[^>]*"
    r"href=[\"']?([^\"' \t\r\n>]+)"
)
_CANON_HR = (
    r"(?is)<link[^>]*href=[\"']?([^\"' \t\r\n>]+)[\"']?[^>]*"
    r"rel=[\"']?canonical"
)
_DESC_NC = (
    r"(?is)<meta[^>]*name=[\"']?description[\"']?[^>]*"
    r"content=[\"']([^\"']*)"
)
_DESC_CN = (
    r"(?is)<meta[^>]*content=[\"']([^\"']*)[\"'][^>]*"
    r"name=[\"']?description"
)
_LD_DATE = r"(?is)\"datePublished\"[ \t\r\n]*:[ \t\r\n]*\"([^\"]+)\""
_PUB_PC = (
    r"(?is)<meta[^>]*property=[\"']?article:published_time[\"']?[^>]*"
    r"content=[\"']([^\"']+)"
)
_PUB_CP = (
    r"(?is)<meta[^>]*content=[\"']([^\"']+)[\"'][^>]*"
    r"property=[\"']?article:published_time"
)
_TIME = r"(?is)<time[^>]*datetime=[\"']?([^\"' \t\r\n>]+)"


def _first(col: Column, *patterns: str) -> Column:
    """First non-empty regexp_extract over the pattern ladder, NULL
    when nothing matches (regexp_extract yields '' on no-match)."""
    return F.nullif(
        F.coalesce(
            *[F.nullif(F.regexp_extract(col, p, 1), F.lit("")) for p in patterns],
            F.lit(""),
        ),
        F.lit(""),
    )


def _clean_text(c: Column) -> Column:
    """Entity-decode + collapse whitespace + trim, NULL-preserving."""
    return F.nullif(
        F.trim(F.regexp_replace(decode_entities_expr(c), _WS_CLASS, " ")),
        F.lit(""),
    )


def title_expr(col: Column) -> Column:
    return _clean_text(F.coalesce(_first(col, _TITLE), F.lit("")))


def lang_expr(col: Column) -> Column:
    return _first(col, _LANG)


def canonical_url_meta_expr(col: Column) -> Column:
    return _first(col, _CANON_RH, _CANON_HR)


def description_expr(col: Column) -> Column:
    return _clean_text(F.coalesce(_first(col, _DESC_NC, _DESC_CN), F.lit("")))


def published_expr(col: Column) -> Column:
    return _first(col, _LD_DATE, _PUB_PC, _PUB_CP, _TIME)


def page_metadata_cols(col: Column) -> list[Column]:
    """The five metadata columns, ready for a select(*existing, …)."""
    return [
        title_expr(col).alias("title"),
        lang_expr(col).alias("lang"),
        canonical_url_meta_expr(col).alias("canonical_url"),
        description_expr(col).alias("description"),
        published_expr(col).alias("published"),
    ]


# --- Python twin (fixtures/tests pin expr ≡ python) ---------------------


def _first_py(s: str, *patterns: str) -> str | None:
    for p in patterns:
        m = re.search(p, s)
        if m and m.group(1) != "":
            return m.group(1)
    return None


def _clean_text_py(s: str | None) -> str | None:
    if s is None:
        return None
    out = re.sub(_WS_CLASS, " ", decode_entities_python(s)).strip()
    return out or None


def page_metadata_python(html: str) -> dict[str, str | None]:
    """Python twin of page_metadata_cols over one page."""
    return {
        "title": _clean_text_py(_first_py(html, _TITLE)),
        "lang": _first_py(html, _LANG),
        "canonical_url": _first_py(html, _CANON_RH, _CANON_HR),
        "description": _clean_text_py(_first_py(html, _DESC_NC, _DESC_CN)),
        "published": _first_py(html, _LD_DATE, _PUB_PC, _PUB_CP, _TIME),
    }
