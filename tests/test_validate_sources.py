"""Character validator (P5) and the binaryFile corpus source (S4)."""

import pytest
from pyspark.sql import functions as F

from granulate_char_ocr_spark.operators import validate
from granulate_char_ocr_spark.sources import binary_files


def test_validator_error_precedence(spark):
    chars = spark.createDataFrame(
        [
            ("ᐁ", "A", 0.9),    # valid
            ("☃", "A", 0.9),    # unknown symbol
            ("ᐁ", "A", 0.3),    # low confidence
            ("ᐁ", "B", 0.9),    # mapping mismatch
            ("☃", "B", 0.1),    # unknown wins over everything
        ],
        "granulate_symbol string, latin string, confidence double",
    )
    out = validate.validate_characters(chars).collect()
    by = {(r["granulate_symbol"], r["latin"], r["confidence"]): r for r in out}
    assert by[("ᐁ", "A", 0.9)]["is_valid"] and by[("ᐁ", "A", 0.9)]["error"] is None
    assert by[("☃", "A", 0.9)]["error"] == "unknown_symbol"
    assert by[("ᐁ", "A", 0.3)]["error"] == "low_confidence"
    assert by[("ᐁ", "B", 0.9)]["error"] == "mapping_mismatch"
    assert by[("☃", "B", 0.1)]["error"] == "unknown_symbol"


def test_corrections(spark):
    chars = spark.createDataFrame(
        [("ᐁ", "B", 0.9), ("ᐂ", "B", 0.1)],
        "granulate_symbol string, latin string, confidence double",
    )
    validated = validate.validate_characters(chars)
    sugg = validate.suggest_corrections(validated).collect()
    assert len(sugg) == 1  # the 0.1-confidence row fails on confidence first
    assert sugg[0]["suggested_latin"] == "A"
    assert sugg[0]["adjusted_confidence"] == pytest.approx(0.7)


def test_digits_in_mapping(spark):
    chars = spark.createDataFrame(
        [("ᑐ", "1", 0.9)], "granulate_symbol string, latin string, confidence double"
    )
    [r] = validate.validate_characters(chars).collect()
    assert r["is_valid"]


def test_binary_file_corpus_roundtrip(spark, tmp_path):
    words = ["PLEASURE", "STOMACH", "A", "TRANSPORTATION"]
    d = str(tmp_path / "corpus")
    binary_files.dump_test_corpus(d, words)
    scan = binary_files.read_labeled_corpus(spark, d + "/*.raw")
    rows = scan.collect()
    assert {r["expected"] for r in rows} == set(words)
    assert all(r["height"] == 64 for r in rows)
    assert all(len(r["pixels"]) == r["width"] * r["height"] for r in rows)

    ev = binary_files.evaluate_corpus_files(spark, d + "/*.raw").collect()
    assert len(ev) == 4
    assert all(r["word_ok"] for r in ev), ev
