"""The public JSON result projection — the reference's ``OCRResult.to_dict``
(``backend/domain/entities/ocr_result.py:24-39``) as one ``to_json(struct)``
column over the recognized media stream.

Shape parity with the reference dict:
    {image_id, text, average_confidence, processing_time, timestamp,
     characters: [{granulate_symbol, latin_equivalent, confidence}]}

``granulate_symbol`` is recovered from the Latin char via the broadcast-sized
alphabet map (a literal ``map`` expression — no join). ``processing_time`` is
meaningless per-image in a batched engine (the whole Arrow batch classifies
in one matmul), so it is fixed at 0.0; ``timestamp`` defaults to the job-side
clock but accepts a pinned literal for deterministic tests/oracles.
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from granulate_char_ocr_spark.alphabet import GRANULATE_TO_LATIN


def _latin_to_granulate_map() -> Column:
    pairs = chain.from_iterable(
        (F.lit(latin), F.lit(gran)) for gran, latin in GRANULATE_TO_LATIN.items()
    )
    return F.create_map(*pairs)


def ocr_result_json(
    recognized: DataFrame,
    id_col: str = "media_ref",
    timestamp: str | None = None,
) -> DataFrame:
    """(… id_col, text, avg_confidence, chars) → (id_col, result_json).

    ``recognized`` is the detail=True output of extract_media_spans /
    extract_unique_media (the chars array carries latin + confidence).
    """
    ts = (
        F.lit(timestamp)
        if timestamp is not None
        else F.date_format(
            F.current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
        )
    )
    m = _latin_to_granulate_map()
    characters = F.transform(
        F.col("chars"),
        lambda c: F.struct(
            m[c["latin"]].alias("granulate_symbol"),
            c["latin"].alias("latin_equivalent"),
            c["confidence"].alias("confidence"),
        ),
    )
    payload = F.struct(
        F.col(id_col).alias("image_id"),
        F.col("text").alias("text"),
        F.coalesce(F.col("avg_confidence"), F.lit(0.0)).alias(
            "average_confidence"
        ),
        F.lit(0.0).alias("processing_time"),
        ts.alias("timestamp"),
        characters.alias("characters"),
    )
    return recognized.select(
        F.col(id_col), F.to_json(payload).alias("result_json")
    )
