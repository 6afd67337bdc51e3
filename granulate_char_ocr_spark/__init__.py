"""granulate_char_ocr_spark — a PySpark-native character-level OCR extraction engine.

A brand-new Spark-first re-expression of the computation in the reference repo
``engkimo/granulate-char-OCR`` (see SURVEY.md): over a table of interleaved
text + media documents ``(doc_id, spans: array<struct<kind, text, media_ref,
offset>>)``, text spans flow through a vectorized Unicode normalization path
(Spark built-ins + one Arrow-batched NFC pandas UDF) while media spans
referencing glyph images flow through a batched-NumPy ``mapInPandas`` kernel
reimplementing the reference's preprocessing, projection segmentation and
per-character nearest-prototype classification. Recognized characters are
stitched back into each document's span sequence by offset.

Layout:
  alphabet.py   — the 26 pinned aHash prototypes + 36-symbol Granulate↔Latin map
  functions/    — pure NumPy image kernels + text normalization expressions
  sources/      — deterministic synthetic corpus generator + driver-table loaders
  operators/    — extraction UDF, span stitch, skew salting, dedup, ANN, text stats
  plans/        — end-to-end extraction plan, lineage/metrics, idempotent resume
  streaming/    — Structured Streaming analog of the camera-frame loop
"""

__version__ = "0.1.0"
