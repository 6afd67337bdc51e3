"""Debug image sink — the reference's annotated-extraction dumps
(``training_data/scripts/debug_extraction.py``, SURVEY §2.1 S8), feasible
in-sandbox since functions/png.py exists: each media row is preprocessed,
segmented, bbox borders are burned in at mid-gray (128 distinguishes the
annotation from the {0,255} binary), and the result is PNG-encoded.

Split into a pure transformation (``debug_images`` — testable, no side
effects) and a file sink (``write_debug_image_files`` — foreachPartition,
each task writes its own files; at cluster scale point ``out_dir`` at a
fuse-mounted object store or swap the open() for a storage client)."""

from __future__ import annotations

import os
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from granulate_char_ocr_spark.functions import kernels
from granulate_char_ocr_spark.functions.png import encode_png

DEBUG_SCHEMA = "media_ref string, n_regions int, png binary"


def _annotate(pre: np.ndarray, regions: list[tuple[int, int, int, int]]) -> np.ndarray:
    img = pre.copy()
    for (x, y, w, h) in regions:
        x1, y1 = min(x + w, img.shape[1]) - 1, min(y + h, img.shape[0]) - 1
        img[y, x : x1 + 1] = 128
        img[y1, x : x1 + 1] = 128
        img[y : y1 + 1, x] = 128
        img[y : y1 + 1, x1] = 128
    return img


def debug_images(
    media: DataFrame, noisy: bool = False, segmenter: str = "projection"
) -> DataFrame:
    """(media_ref, width, height, pixels) → (media_ref, n_regions, png).
    Takes the same (noisy, segmenter) options as the extraction operators so
    the overlay always shows the regions classification actually sees."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        segment = (
            kernels.segment_regions_cc
            if segmenter == "cc"
            else kernels.segment_regions
        )
        for pdf in batches:
            refs, counts, pngs = [], [], []
            for r in pdf.itertuples(index=False):
                img = np.frombuffer(r.pixels, dtype=np.uint8).reshape(
                    r.height, r.width
                )
                # mirror extract._process_batch's segmentation chain exactly
                # (including the noisy path's adjacent-region merge)
                if noisy:
                    pre = kernels.preprocess_noisy(img)
                    regions = kernels.merge_adjacent_regions(
                        segment(pre), kernels.NOISY_MERGE_GAP
                    )
                else:
                    pre = kernels.preprocess(img)
                    regions = segment(pre)
                refs.append(r.media_ref)
                counts.append(len(regions))
                pngs.append(encode_png(_annotate(pre, regions)))
            yield pd.DataFrame(
                {"media_ref": refs, "n_regions": counts, "png": pngs}
            )

    cols = ["media_ref", "width", "height", "pixels"]
    return media.select(*cols).mapInPandas(fn, schema=DEBUG_SCHEMA)


def write_debug_image_files(debug_df: DataFrame, out_dir: str) -> None:
    """Side-effect sink: one ``<media_ref>.png`` per row, written by the
    task that owns the row (no driver collect)."""
    os.makedirs(out_dir, exist_ok=True)

    def write_partition(rows) -> None:
        for row in rows:
            with open(os.path.join(out_dir, f"{row['media_ref']}.png"), "wb") as f:
                f.write(bytes(row["png"]))

    debug_df.foreachPartition(write_partition)
