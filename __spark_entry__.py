"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship OCR extraction job; ``queries()`` /
``oracle_sql()`` expose the operator surface from SURVEY.md §2 (relational
core, dedup, ANN, text analysis, and the extraction engine itself). See
``granulate_char_ocr_spark/driver_queries.py`` for the paired definitions.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from granulate_char_ocr_spark import driver_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full OCR extraction (text normalize + media OCR + stitch)
    on the deterministic synthetic interleaved corpus at sf0.001 scale.
    Returns the NESTED document shape (doc_id, spans[order]) — the engine's
    headline API; the queries() twin exposes the flat, canonicalizable
    projection for the oracle gate."""
    from granulate_char_ocr_spark.plans.pipeline import extract_documents

    docs, media, _ = driver_queries._ocr_corpus(spark, "/root/testdata/sf0.001")
    return extract_documents(docs, media)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator family from SURVEY.md §2."""
    return dict(driver_queries.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every query. The pixel-UDF ocr_*/mm_*
    entries are checked against committed golden parquets (dist/golden/)
    materialized by the deterministic fixture generator."""
    return dict(driver_queries.ORACLES)
