"""Document-format parsing operators — the web-extraction legs the north
rule names explicitly: "HTML boilerplate strip" and "PDF/layout parse".

HTML main-content extraction is PURE whole-stage codegen (a regex
cascade over a string column — functions/html.py); PDF text extraction
is an Arrow-batched mapInPandas over binary payloads
(functions/pdf.py). Both are deterministic, so the driver gate checks
them against exact oracles."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from granulate_char_ocr_spark.functions.dom import main_content_expr
from granulate_char_ocr_spark.functions.html import main_text_expr


def html_main_texts(
    df: DataFrame, html_col: str = "html", key_col: str = "doc_id"
) -> DataFrame:
    """(key, html) -> (key, main_text): boilerplate-stripped body text,
    no Python in the plan."""
    return df.select(
        key_col, main_text_expr(F.col(html_col)).alias("main_text")
    )


def html_main_contents(
    df: DataFrame, html_col: str = "html", key_col: str = "doc_id"
) -> DataFrame:
    """(key, html) -> (key, main_content): density-selected content text
    (the DOM-heuristic leg, functions/dom.py) — link-dense and short
    blocks dropped by measure, not by element name. No Python in the
    plan."""
    return df.select(
        key_col, main_content_expr(F.col(html_col)).alias("main_content")
    )


def pdf_texts(
    df: DataFrame,
    payload_col: str = "payload",
    key_col: str = "doc_id",
    layout: bool = False,
) -> DataFrame:
    """(key, pdf_bytes) -> (key, extracted): the text layer of each PDF —
    in operator (draw) order by default, or in READING order with
    ``layout=True`` (text-matrix tracking + XY-cut column sort,
    functions/pdf.py), which un-interleaves multi-column and
    out-of-sequence draws. The key column keeps its input type. Per-row
    parse failures raise (wrap upstream when a corpus needs the
    permissive contract)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from granulate_char_ocr_spark.functions.pdf import (
            decode_pdf_text,
            decode_pdf_text_layout,
        )

        decode = decode_pdf_text_layout if layout else decode_pdf_text
        for pdf in batches:
            yield pd.DataFrame(
                {
                    key_col: pdf[key_col],
                    "extracted": [
                        decode(bytes(p)) for p in pdf[payload_col]
                    ],
                }
            )

    key_type = df.schema[key_col].dataType.simpleString()
    return df.select(key_col, payload_col).mapInPandas(
        fn, schema=f"{key_col} {key_type}, extracted string"
    )


def pdf_pages(
    df: DataFrame, payload_col: str = "payload", key_col: str = "doc_id"
) -> DataFrame:
    """1→N page explode: (key, pdf_bytes) -> (key, page_no, page_text),
    one row per text content stream in document order (page boundaries
    for one-stream-per-page files — this module's writer and the
    dominant real-world layout). The joined page texts equal
    ``pdf_texts``'s output exactly."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from granulate_char_ocr_spark.functions.pdf import (
            decode_pdf_text_pages,
        )

        for pdf in batches:
            keys, nos, texts = [], [], []
            for k, p in zip(pdf[key_col], pdf[payload_col]):
                for i, t in enumerate(decode_pdf_text_pages(bytes(p))):
                    keys.append(k)
                    nos.append(i)
                    texts.append(t)
            yield pd.DataFrame(
                {key_col: keys, "page_no": nos, "page_text": texts}
            )

    key_type = df.schema[key_col].dataType.simpleString()
    return df.select(key_col, payload_col).mapInPandas(
        fn, schema=f"{key_col} {key_type}, page_no int, page_text string"
    )
