"""The robust (noisy) preprocessing path through the full Spark pipeline:
seeded salt-and-pepper media variants recognized end-to-end. Robustness is a
bound, not an equality contract (SURVEY §7 R2)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from granulate_char_ocr_spark.plans.pipeline import extract_flat
from granulate_char_ocr_spark.sources.synthetic import (
    MEDIA_SCHEMA,
    media_ref_for,
    render_word_noisy,
)

WORDS = ["PLEASURE", "STOMACH", "OPERATE", "FACTORY", "UNIFORM", "JOIN"]


@pytest.fixture(scope="module")
def noisy_setup(spark):
    rows = []
    spans = []
    for i, w in enumerate(WORDS):
        img = render_word_noisy(w, 0, seed=11 + i)
        ref = media_ref_for(w, 0) + "_noisy"
        rows.append(
            {
                "media_ref": ref,
                "word": w,
                "width": img.shape[1],
                "height": img.shape[0],
                "pixels": img.tobytes(),
            }
        )
        spans.append((f"doc_{i}", [(("media"), None, ref, 1)]))
    media = spark.createDataFrame(pd.DataFrame(rows), schema=MEDIA_SCHEMA)
    docs = spark.createDataFrame(
        spans,
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    return docs, media


def test_noisy_path_recognizes_most_chars(spark, noisy_setup):
    docs, media = noisy_setup
    flat = extract_flat(docs, media, noisy=True).filter(F.col("kind") == "media")
    got = {r["media_ref"]: r["text"] for r in flat.collect()}
    total = sum(len(w) for w in WORDS)
    correct = 0
    for w in WORDS:
        text = got[media_ref_for(w, 0) + "_noisy"]
        # positional char accuracy (EP3 zip semantics)
        correct += sum(1 for a, b in zip(w, text) if a == b)
    # r1 pinned >= 0.8; with the r2 merge + vote tiers this seed set is
    # fully recovered — pin it (deterministic input, deterministic kernels)
    assert correct / total == 1.0, got


def test_clean_path_degrades_on_noise_less_than_robust(spark, noisy_setup):
    """Sanity: the robust path should do at least as well as the clean path
    on noisy input (Otsu + blur + deskew vs fixed threshold)."""
    docs, media = noisy_setup
    clean = extract_flat(docs, media, noisy=False).filter(F.col("kind") == "media")
    robust = extract_flat(docs, media, noisy=True).filter(F.col("kind") == "media")
    c = {r["media_ref"]: r["text"] for r in clean.collect()}
    r = {r["media_ref"]: r["text"] for r in robust.collect()}

    def score(m):
        return sum(
            sum(1 for a, b in zip(w, m[media_ref_for(w, 0) + "_noisy"]) if a == b)
            for w in WORDS
        )

    assert score(r) >= score(c) - 2  # robust ≥ clean (small slack)
