"""PNG codec round-trips (every scanline filter) + Spark-path parity:
embeddings computed from PNG payloads must equal the raw-payload ones."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from granulate_char_ocr_spark.functions import kernels
from granulate_char_ocr_spark.functions.png import decode_png, encode_png
from granulate_char_ocr_spark.sources.synthetic import render_word


def _rng_img(shape, seed=7):
    return np.random.default_rng(seed).integers(0, 256, shape, dtype=np.uint8)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_roundtrip_grey_all_filters(ftype):
    img = _rng_img((23, 41))
    assert np.array_equal(decode_png(encode_png(img, ftype)), img)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_roundtrip_rgb_all_filters(ftype):
    img = _rng_img((17, 13, 3))
    assert np.array_equal(decode_png(encode_png(img, ftype)), img)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_roundtrip_rgba_all_filters(ftype):
    img = _rng_img((9, 11, 4))
    assert np.array_equal(decode_png(encode_png(img, ftype)), img)


def test_glyph_roundtrip_preserves_ahash():
    img = render_word("TEAM", 1)
    back = decode_png(encode_png(img, filter_type=4))
    assert np.array_equal(back, img)
    assert np.array_equal(kernels.ahash_bits(back), kernels.ahash_bits(img))


def test_unsupported_rejected():
    data = bytearray(encode_png(_rng_img((4, 4))))
    data[24] = 16  # bit depth byte inside IHDR
    with pytest.raises(ValueError, match="unsupported"):
        decode_png(bytes(data))
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"notapng" + bytes(10))


def test_png_corpus_scan_end_to_end(spark, tmp_path):
    """The reference's real corpus shape: a directory of <LABEL>_<n>.png
    files → distributed scan → decode → recognize → 100% on clean glyphs."""
    from granulate_char_ocr_spark.operators.extract import extract_media_spans
    from granulate_char_ocr_spark.sources.binary_files import read_png_corpus

    words = ["PLEASURE", "TEAM", "WE"]
    for i, w in enumerate(words):
        img = render_word(w, i % 3)
        (tmp_path / f"{w}_{i + 1}.png").write_bytes(encode_png(img))
    corpus = read_png_corpus(spark, str(tmp_path / "*.png"))
    rec = extract_media_spans(
        corpus.select(
            corpus.path.alias("doc_id"),
            corpus.path.alias("media_ref"),
            "width",
            "height",
            "pixels",
        ).withColumn("offset", F.lit(0)),
        detail=False,
    )
    got = {r["media_ref"].rsplit("/", 1)[-1]: r["text"] for r in rec.collect()}
    assert got == {f"{w}_{i + 1}.png": w for i, w in enumerate(words)}
    labels = {r["expected"] for r in corpus.collect()}
    assert labels == set(words)


def test_png_corpus_permissive_mode(spark, tmp_path):
    """A corrupt file yields a decode_error row, never a task failure
    (permissive=True); strict mode raises."""
    from granulate_char_ocr_spark.sources.binary_files import read_png_corpus

    (tmp_path / "GOOD_1.png").write_bytes(encode_png(render_word("WE", 0)))
    (tmp_path / "BAD_2.png").write_bytes(b"\x89PNG but truncated garbage")
    rows = {
        r["path"].rsplit("/", 1)[-1]: r
        for r in read_png_corpus(spark, str(tmp_path / "*.png")).collect()
    }
    assert rows["GOOD_1.png"]["decode_error"] is None
    assert rows["GOOD_1.png"]["pixels"] is not None
    assert rows["BAD_2.png"]["pixels"] is None
    assert "signature" in rows["BAD_2.png"]["decode_error"]
    with pytest.raises(Exception):
        read_png_corpus(spark, str(tmp_path / "*.png"), permissive=False).collect()


def test_png_media_embeddings_match_raw(spark):
    """The multimodal pipeline over PNG payloads = over raw payloads."""
    from granulate_char_ocr_spark.operators import multimodal

    words = ["TEAM", "WORK", "A"]
    rows = []
    for codec in ("raw", "png"):
        for w in words:
            img = render_word(w, 0)
            payload = img.tobytes() if codec == "raw" else encode_png(img, 2)
            rows.append(
                (
                    f"{codec}_{w}",
                    "image",
                    codec,
                    img.shape[1],
                    img.shape[0],
                    1,
                    0,
                    payload,
                )
            )
    df = spark.createDataFrame(rows, schema=multimodal.MULTIMODAL_SCHEMA)
    emb = {
        r["media_ref"]: list(r["embedding"])
        for r in multimodal.image_embeddings(df).collect()
    }
    for w in words:
        assert emb[f"png_{w}"] == emb[f"raw_{w}"], w
