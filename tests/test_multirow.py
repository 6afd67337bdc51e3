"""Robust-path gate queries (VERDICT r2 items 2-3): the cc segmenter over
stacked multi-row layouts and the noisy extraction path, both as they run at
the driver gate (the queries() entries themselves)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from granulate_char_ocr_spark.functions import kernels
from granulate_char_ocr_spark.sources import synthetic as syn

SF = "/root/testdata/sf0.001"  # 200-doc tier (fast; golden covers 800)


def test_cc_recovers_multirow_exactly_kernel_level():
    """The golden's premise: cc segmentation + row clustering recover
    exactly w1+w2 on every cycled (w1, w2, variant) the corpus can emit."""
    seen = set()
    for i in range(len(syn.WORDS) * 3):
        w1, w2, v = syn._multirow_choice(i)
        key = (w1, w2, v)
        if key in seen:
            continue
        seen.add(key)
        img = syn.render_multirow(w1, w2, v)
        pre = kernels.preprocess(img)
        regs = kernels.segment_regions_cc(pre)
        crops = [pre[y : y + h, x : x + w] for (x, y, w, h) in regs]
        text = "".join(
            r[0] for r in kernels.classify_batch(crops) if r[0] is not None
        )
        assert text == w1 + w2, (w1, w2, v, text)
    assert len(seen) == len(syn.WORDS) * 3  # the full distinct-image set


def test_projection_segmenter_cannot_separate_rows():
    """Why the cc entry exists: a pure column projection merges the two
    rows (both project onto the same columns), so the projection segmenter
    must NOT recover both words — if it ever does, the multirow corpus no
    longer demonstrates anything."""
    img = syn.render_multirow("THE", "JOB", 0)
    pre = kernels.preprocess(img)
    regs = kernels.segment_regions(pre)
    crops = [pre[y : y + h, x : x + w] for (x, y, w, h) in regs]
    text = "".join(
        r[0] for r in kernels.classify_batch(crops) if r[0] is not None
    )
    assert text != "THEJOB"


def test_multirow_gate_query_matches_generator(spark):
    from granulate_char_ocr_spark import driver_queries as dq

    got = {
        (r.doc_id, r.offset): (r.media_ref, r.text)
        for r in dq.QUERIES["ocr_extract_multirow"](spark, SF).collect()
    }
    n = dq._SF_DOCS["sf0.001"]
    assert len(got) == n
    for i in range(n):
        w1, w2, v = syn._multirow_choice(i)
        assert got[(f"mrdoc_{i:08d}", 1)] == (
            syn.multirow_media_ref(w1, w2, v),
            w1 + w2,
        )


def test_noisy_gate_query_matches_local_kernel(spark):
    """Spark noisy extraction == local recognize_word(noisy=True) per
    distinct image, spans re-attached — the engine-derived-golden premise."""
    from granulate_char_ocr_spark import driver_queries as dq

    rows = dq.QUERIES["ocr_extract_noisy"](spark, SF).collect()
    assert rows
    per_ref = {}
    for word in syn.WORDS:
        for v in range(syn.N_VARIANTS):
            img = syn.render_word_noisy(word, v, seed=syn.NOISE_SEED)
            chars = kernels.recognize_word(img, noisy=True)
            per_ref[syn.media_ref_for(word, v) + "_n"] = (
                "".join(c["latin"] for c in chars),
                ",".join(sorted({c["method"] for c in chars})),
            )
    for r in rows:
        assert (r.text, r.methods) == per_ref[r.media_ref], r
    # the third cascade tier is live at the gate (the judge's done-criterion)
    assert any("vote" in r.methods for r in rows)


def test_noisy_corpus_accuracy_bound(spark):
    """Robustness bound over the full gate corpus: ≥ 90% of noisy media
    spans extract their exact source word (the engine-derived golden pins
    parity; this pins that the parity target is actually GOOD)."""
    from granulate_char_ocr_spark import driver_queries as dq

    rows = dq.QUERIES["ocr_extract_noisy"](spark, SF).collect()
    # media_ref = f"img_{word}_{variant:04d}_n" and words are [A-Z]+ only
    ok = sum(1 for r in rows if r.text == r.media_ref[4:-7])
    assert ok / len(rows) >= 0.90, ok / len(rows)
