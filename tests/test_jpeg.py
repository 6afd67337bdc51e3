"""Baseline JPEG codec (grayscale, pure NumPy): near-equal round-trips
(JPEG is lossy), glyph-hash stability, format guards, and Spark-path parity
with raw payloads through the multimodal operators."""

import numpy as np
import pytest

from granulate_char_ocr_spark.functions import kernels
from granulate_char_ocr_spark.functions.jpeg import decode_jpeg, encode_jpeg
from granulate_char_ocr_spark.sources.synthetic import render_word


def _psnr(a, b):
    mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
    return float("inf") if mse == 0 else 10 * np.log10(255**2 / mse)


@pytest.mark.parametrize(
    "shape", [(8, 8), (24, 40), (17, 33), (64, 64), (1, 1), (9, 8)]
)
def test_roundtrip_psnr_gradient(shape):
    yy, xx = np.mgrid[0 : shape[0], 0 : shape[1]]
    img = np.clip(yy * 3 + xx * 2, 0, 255).astype(np.uint8)
    back = decode_jpeg(encode_jpeg(img, quality=90))
    assert back.shape == img.shape
    assert _psnr(img, back) > 40


def test_roundtrip_noise_and_quality_ladder():
    img = np.random.default_rng(0).integers(0, 256, (32, 48), dtype=np.uint8)
    p_lo = _psnr(img, decode_jpeg(encode_jpeg(img, quality=30)))
    p_hi = _psnr(img, decode_jpeg(encode_jpeg(img, quality=95)))
    assert p_hi > p_lo > 10  # higher quality → higher fidelity


def test_constant_image_exact():
    img = np.full((16, 24), 130, dtype=np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg(img)), img)


def test_glyph_survives_jpeg_with_identical_hash_and_recognition():
    img = render_word("PLEASURE", 0)
    back = decode_jpeg(encode_jpeg(img, quality=95))
    assert _psnr(img, back) > 50
    chars = kernels.recognize_word(back)
    assert "".join(c["latin"] for c in chars) == "PLEASURE"
    assert np.array_equal(kernels.ahash_bits(back), kernels.ahash_bits(img))


def test_unsupported_variants_rejected():
    good = bytearray(encode_jpeg(np.zeros((8, 8), dtype=np.uint8)))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"notajpeg")
    # flip SOF0 (C0) to SOF2 (C2, progressive)
    i = bytes(good).find(b"\xff\xc0")
    prog = bytes(good[:i]) + b"\xff\xc2" + bytes(good[i + 2 :])
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(prog)
    with pytest.raises(ValueError, match="grayscale"):
        encode_jpeg(np.zeros((4, 4, 3), dtype=np.uint8))


def test_jpeg_media_embeddings_match_raw(spark):
    """decode_payload('jpeg') through the Spark embedding operator equals
    the raw-payload result (ahash is stable under q=95 compression)."""
    from granulate_char_ocr_spark.operators import multimodal

    words = ["TEAM", "US"]
    rows = []
    for codec in ("raw", "jpeg"):
        for w in words:
            img = render_word(w, 0)
            payload = (
                img.tobytes() if codec == "raw" else encode_jpeg(img, quality=95)
            )
            rows.append(
                (
                    f"{codec}_{w}", "image", codec, img.shape[1], img.shape[0],
                    1, 0, payload,
                )
            )
    df = spark.createDataFrame(rows, schema=multimodal.MULTIMODAL_SCHEMA)
    emb = {
        r["media_ref"]: list(r["embedding"])
        for r in multimodal.image_embeddings(df).collect()
    }
    for w in words:
        assert emb[f"jpeg_{w}"] == emb[f"raw_{w}"], w


def test_mixed_image_corpus_scan(spark, tmp_path):
    """One directory of PNGs AND JPEGs, codec sniffed from content, both
    recognized exactly end-to-end."""
    from granulate_char_ocr_spark.operators.extract import extract_media_spans
    from granulate_char_ocr_spark.sources.binary_files import read_image_corpus
    from granulate_char_ocr_spark.functions.png import encode_png
    from pyspark.sql import functions as F

    (tmp_path / "TEAM_1.png").write_bytes(encode_png(render_word("TEAM", 0)))
    (tmp_path / "WORK_2.jpg").write_bytes(
        encode_jpeg(render_word("WORK", 1), quality=95)
    )
    corpus = read_image_corpus(spark, str(tmp_path / "*"))
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
    assert got == {"TEAM_1.png": "TEAM", "WORK_2.jpg": "WORK"}
    labels = {
        r["path"].rsplit("/", 1)[-1]: r["expected"] for r in corpus.collect()
    }
    assert labels == {"TEAM_1.png": "TEAM", "WORK_2.jpg": "WORK"}
