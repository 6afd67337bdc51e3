"""The end-to-end extraction plan (SURVEY.md §3 "Spark restatement").

    read documents → posexplode(spans)
      ├─ kind='text'  → vectorized normalization (built-ins + NFC pandas UDF)
      └─ kind='media' → join glyph_media on media_ref
                        → doc_id-salted repartition (skew defusal)
                        → mapInPandas [preprocess → segment → classify]
      → union → groupBy(doc_id) sort_array stitch → (doc_id, spans[order])

Exactly two materializing exchanges touch the span stream: the salted
repartition into the extraction kernel and the doc_id re-assembly out of it
(the media join broadcasts when the media store is under the broadcast
threshold — it is a deduplicated dictionary of distinct images, far smaller
than the span stream; at true 100 TB scale it degrades gracefully to a
shuffle hash join on ``media_ref``). No pixel bytes survive past the
extraction kernel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from granulate_char_ocr_spark.functions.text import normalize_expr
from granulate_char_ocr_spark.operators.extract import extract_media_spans
from granulate_char_ocr_spark.operators.skew import salt_repartition
from granulate_char_ocr_spark.operators.stitch import assemble_documents


def explode_spans(docs: DataFrame) -> DataFrame:
    """documents → one row per span (doc_id, offset, kind, text, media_ref)."""
    return docs.select(
        "doc_id", F.explode("spans").alias("s")
    ).select("doc_id", "s.kind", "s.text", "s.media_ref", "s.offset")


def extract_flat(
    docs: DataFrame,
    media: DataFrame,
    n_salts: int = 8,
    num_partitions: int | None = None,
    noisy: bool = False,
    broadcast_media: bool = True,
) -> DataFrame:
    """Flat extracted spans: (doc_id, offset, kind, text, media_ref,
    n_chars, avg_confidence, chars). Text spans carry n_chars = length of the
    normalized text and a null chars array."""
    spans = explode_spans(docs)

    text_out = (
        spans.filter(F.col("kind") == "text")
        .withColumn("text", normalize_expr(F.col("text")))
        .select(
            "doc_id",
            "offset",
            "kind",
            "text",
            "media_ref",
            F.length("text").alias("n_chars"),
            F.lit(None).cast("double").alias("avg_confidence"),
            F.lit(None)
            .cast(
                "array<struct<latin:string,confidence:double,"
                "method:string,char_order:int>>"
            )
            .alias("chars"),
        )
    )

    media_side = F.broadcast(media) if broadcast_media else media
    media_spans = (
        spans.filter(F.col("kind") == "media")
        .select("doc_id", "offset", "media_ref")
        .join(media_side, "media_ref", "left")
    )
    media_spans = salt_repartition(
        media_spans, n_salts=n_salts, num_partitions=num_partitions
    )
    recognized = extract_media_spans(media_spans, noisy=noisy)
    media_out = recognized.select(
        "doc_id",
        "offset",
        F.lit("media").alias("kind"),
        "text",
        "media_ref",
        "n_chars",
        "avg_confidence",
        "chars",
    )
    return text_out.unionByName(media_out)


def extract_documents(
    docs: DataFrame,
    media: DataFrame,
    n_salts: int = 8,
    num_partitions: int | None = None,
    noisy: bool = False,
    broadcast_media: bool = True,
) -> DataFrame:
    """The headline job: documents + glyph_media → (doc_id, spans[order])."""
    flat = extract_flat(
        docs,
        media,
        n_salts=n_salts,
        num_partitions=num_partitions,
        noisy=noisy,
        broadcast_media=broadcast_media,
    )
    return assemble_documents(flat.select("doc_id", "offset", "kind", "text", "media_ref"))
