"""The media-span OCR extraction operator — an Arrow-batched ``mapInPandas``.

Spark-first restatement of the reference's per-image pipeline
(``ocr_service.py:92-171``): decode → preprocess → projection segmentation →
batched nearest-prototype classification → ordered word assembly. The
reference classifies characters one at a time (batch size 1,
``ocr_service.py:376``); here every crop from every image in an Arrow batch
is stacked into one (B, 64) bit matrix and classified with a single matmul.

Scale notes (100 TB posture):
* pixels NEVER cross a shuffle — this operator runs immediately after the
  media join and emits only recognized text + small char structs; the
  downstream doc_id re-assembly exchange carries no image bytes
  (SURVEY.md §7 R4).
* classifier prototypes are built once per Python worker
  (``alphabet.classifier_state()``), not per batch or per row — the
  executor-singleton fix for the reference's per-request model reload
  (``backend/api/endpoints/ocr.py:43``).
* `spark.sql.execution.arrow.maxRecordsPerBatch` bounds batch memory; one
  row ≈ width×64 bytes of pixels.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from granulate_char_ocr_spark.functions import kernels

# recognized-payload columns appended to the passthrough keys
_RESULT_COLS = (
    "text string, n_chars int, avg_confidence double, "
    "chars array<struct<latin:string,confidence:double,method:string,char_order:int>>"
)
# per-span extraction (non-dedup path): keys carried through the kernel
SPAN_SCHEMA = f"doc_id string, offset int, media_ref string, {_RESULT_COLS}"
# per-unique-image extraction (dedup path)
UNIQUE_SCHEMA = f"media_ref string, {_RESULT_COLS}"


def _process_batch(
    pdf: pd.DataFrame, noisy: bool, passthrough: tuple[str, ...]
) -> pd.DataFrame:
    n = len(pdf)
    pre_fn = kernels.preprocess_noisy if noisy else kernels.preprocess
    crops: list[np.ndarray] = []
    owner: list[int] = []  # crop -> row index
    regions_per_row: list[int] = []
    widths = pdf["width"].to_numpy()
    heights = pdf["height"].to_numpy()
    buffers = pdf["pixels"].to_numpy()
    for i in range(n):
        # per-image faults (dangling media_ref → null payload, truncated
        # buffer, zero-dim) collapse to an empty result instead of failing
        # the task — the reference's error contract (ocr_service.py:164-171)
        buf = buffers[i]
        try:
            h_i, w_i = int(heights[i]), int(widths[i])
            if buf is None or h_i <= 0 or w_i <= 0 or len(buf) != h_i * w_i:
                regions_per_row.append(0)
                continue
            img = np.frombuffer(buf, dtype=np.uint8).reshape(h_i, w_i)
            pre = pre_fn(img)
            regs = kernels.segment_regions(pre)
        except Exception:
            regions_per_row.append(0)
            continue
        regions_per_row.append(len(regs))
        for (x, y, w, h) in regs:
            crops.append(pre[y : y + h, x : x + w])
            owner.append(i)
    results = kernels.classify_batch(crops)  # ONE matmul for the whole batch

    texts: list[str] = [""] * n
    chars_col: list[list[dict]] = [[] for _ in range(n)]
    for row_i, (latin, conf, method) in zip(owner, results):
        if latin is None:
            continue  # unrecognized region dropped (reference ocr_service.py:149)
        order = len(chars_col[row_i])
        chars_col[row_i].append(
            {
                "latin": latin,
                "confidence": conf,
                "method": method,
                "char_order": order,
            }
        )
    for i in range(n):
        texts[i] = "".join(c["latin"] for c in chars_col[i])
    avg_conf = [
        float(np.mean([c["confidence"] for c in cs])) if cs else 0.0
        for cs in chars_col
    ]
    out = {c: pdf[c].to_numpy() for c in passthrough}
    out.update(
        {
            "text": texts,
            "n_chars": [len(cs) for cs in chars_col],
            "avg_confidence": avg_conf,
            "chars": chars_col,
        }
    )
    return pd.DataFrame(out)


def _map_extract(
    df: DataFrame, schema: str, passthrough: tuple[str, ...], noisy: bool
) -> DataFrame:
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield _process_batch(pdf, noisy, passthrough)

    cols = [*passthrough, "width", "height", "pixels"]
    return df.select(*cols).mapInPandas(fn, schema=schema)


def extract_media_spans(media_spans: DataFrame, noisy: bool = False) -> DataFrame:
    """Per-span extraction: (doc_id, offset, media_ref, width, height, pixels)
    → recognized spans (SPAN_SCHEMA). Used by the non-dedup path where every
    span carries its own payload."""
    return _map_extract(
        media_spans, SPAN_SCHEMA, ("doc_id", "offset", "media_ref"), noisy
    )


def extract_unique_media(media: DataFrame, noisy: bool = False) -> DataFrame:
    """Per-unique-image extraction: (media_ref, width, height, pixels) →
    (UNIQUE_SCHEMA). The dedup path: recognition is a pure function of the
    pixels, so each distinct media_ref is classified exactly once and the
    (small) results join back to the span stream — pixel bytes never enter a
    span-stream shuffle."""
    return _map_extract(media, UNIQUE_SCHEMA, ("media_ref",), noisy)
