"""The OCRResult.to_dict JSON projection (reference ocr_result.py:24-39)."""

import json

from granulate_char_ocr_spark.operators.extract import extract_unique_media
from granulate_char_ocr_spark.operators.results import ocr_result_json
from granulate_char_ocr_spark.sources.synthetic import render_word


def test_result_json_shape_and_values(spark):
    img = render_word("TEAM", 0)
    df = spark.createDataFrame(
        [("m_team", img.shape[1], img.shape[0], img.tobytes())],
        "media_ref string, width int, height int, pixels binary",
    )
    [row] = ocr_result_json(
        extract_unique_media(df), timestamp="2026-01-01T00:00:00.000000"
    ).collect()
    d = json.loads(row["result_json"])
    assert d["image_id"] == "m_team"
    assert d["text"] == "TEAM"
    assert d["average_confidence"] == 1.0
    assert d["processing_time"] == 0.0
    assert d["timestamp"] == "2026-01-01T00:00:00.000000"
    assert [c["latin_equivalent"] for c in d["characters"]] == list("TEAM")
    assert all(c["confidence"] == 1.0 for c in d["characters"])
    # the Granulate symbol column round-trips through the alphabet map
    from granulate_char_ocr_spark.alphabet import GRANULATE_TO_LATIN

    latin_to_gran = {v: k for k, v in GRANULATE_TO_LATIN.items()}
    assert [c["granulate_symbol"] for c in d["characters"]] == [
        latin_to_gran[ch] for ch in "TEAM"
    ]
