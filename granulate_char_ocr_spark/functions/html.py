"""HTML main-content extraction — boilerplate strip as PURE column
expressions (whole-stage codegen, no UDF).

The north rule names the web-extraction legs explicitly ("HTML
boilerplate strip ... DOM heuristics"); this is the density-free core of
that pipeline expressed as a deterministic regex cascade every engine
can mirror (the DuckDB oracle runs the byte-identical transform):

1. drop non-content SUBTREES wholesale: <script>/<style> (code, not
   content) and the classic boilerplate containers <nav>/<header>/
   <footer>/<aside> (the Readability/trafilatura first pass);
2. strip HTML comments;
3. flatten remaining tags to spaces (block boundaries become word
   boundaries, never concatenations);
4. decode the entity set boilerplate actually emits (&amp; &lt; &gt;
   &quot; &#39; &nbsp;) — ampersand LAST so "&amp;lt;" decodes to the
   literal "&lt;" and not "<";
5. collapse whitespace and trim.

Lazy quantifiers and (?s) dot-all behave identically in Java regex
(Spark) and RE2 (DuckDB), so the oracle is exact. A same-logic Python
twin exists for fixtures."""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# subtree-dropping patterns: lazy body match, case-insensitive, dot-all
# (\b keeps <head> from swallowing <header> — 'e' is a word char)
_DROP_SUBTREES = [
    r"(?is)<head\b[^>]*>.*?</head>",
    r"(?is)<script\b[^>]*>.*?</script>",
    r"(?is)<style\b[^>]*>.*?</style>",
    r"(?is)<nav\b[^>]*>.*?</nav>",
    r"(?is)<header\b[^>]*>.*?</header>",
    r"(?is)<footer\b[^>]*>.*?</footer>",
    r"(?is)<aside\b[^>]*>.*?</aside>",
]
_COMMENT = r"(?s)<!--.*?-->"
_TAG = r"(?s)<[^>]*>"
_ENTITIES = [  # ampersand last (see module docstring)
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]


# whitespace collapse must behave identically in Java regex (Spark),
# RE2 (DuckDB) and Python: each engine's \s differs (Unicode in Python,
# ASCII+VT in Java, ASCII-no-VT in RE2), so use one explicit class
_WS_CLASS = r"[ \t\r\n\f\x0B]+"


def main_text_expr(col: Column) -> Column:
    """html string column -> extracted main text column."""
    out = col
    for pat in _DROP_SUBTREES:
        out = F.regexp_replace(out, pat, " ")
    out = F.regexp_replace(out, _COMMENT, " ")
    out = F.regexp_replace(out, _TAG, " ")
    for ent, rep in _ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(out, _WS_CLASS, " "))


def main_text_python(html: str) -> str:
    """Same-logic Python twin (fixtures/goldens)."""
    out = html
    for pat in _DROP_SUBTREES:
        out = re.sub(pat, " ", out)
    out = re.sub(_COMMENT, " ", out)
    out = re.sub(_TAG, " ", out)
    for ent, rep in _ENTITIES:
        out = out.replace(ent, rep)
    # strip(" ") not strip(): Python's bare strip eats Unicode whitespace
    # (NBSP) that Spark/DuckDB trim() leave alone
    return re.sub(_WS_CLASS, " ", out).strip(" ")


def main_text_oracle_sql(col_sql: str) -> str:
    """The byte-identical DuckDB (RE2) transform for the oracle side."""
    out = col_sql
    for pat in _DROP_SUBTREES:
        out = f"regexp_replace({out}, '{pat}', ' ', 'g')"
    out = f"regexp_replace({out}, '{_COMMENT}', ' ', 'g')"
    out = f"regexp_replace({out}, '{_TAG}', ' ', 'g')"
    for ent, rep in _ENTITIES:
        lit = rep.replace("'", "''")
        out = f"replace({out}, '{ent}', '{lit}')"
    return rf"trim(regexp_replace({out}, '{_WS_CLASS}', ' ', 'g'))"


def escape_text(col: Column) -> Column:
    """Entity-escape text for embedding into synthesized HTML (build side
    of the round trip; ampersand FIRST, the inverse order of decode)."""
    out = F.replace(col, F.lit("&"), F.lit("&amp;"))
    out = F.replace(out, F.lit("<"), F.lit("&lt;"))
    return F.replace(out, F.lit(">"), F.lit("&gt;"))
