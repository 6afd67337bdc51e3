"""Deterministic cardinality sketches.

At 100 TB, exact ``count(DISTINCT x)`` over a high-cardinality column is a
full shuffle of every distinct value; sketches answer the same question
with bounded state. Spark ships HLL++ (``approx_count_distinct``), but its
estimate is engine-specific — useless against a cross-engine oracle. The
KMV (k-minimum-values / bottom-k) sketch is the deterministic alternative:
hash every value to a uniform (0, 1] point, keep only the k smallest
distinct hashes, and estimate the cardinality as (k-1)/h_k where h_k is
the k-th smallest (Bar-Yossef et al. 2002; Beyer et al. 2007 §3). Given a
fixed hash function the result is a pure function of the value set, so
DuckDB reproduces it bit-for-bit — a gate-able sketch.

Why it scales: the "k smallest hashes of a set" statistic is MERGEABLE —
bottom-k of a union is the bottom-k of the concatenated bottom-k's — so
each partition needs only k doubles of state and the combine is
associative. Spark executes exactly that shape here: the per-group
k-smallest filter is a rank-window that the optimizer rewrites to
WindowGroupLimit, which applies the limit PARTIALLY on the map side
before the shuffle (each task forwards at most k rows per group — the
sketch merge, expressed relationally).

Relative error is ~1/sqrt(k); tests/test_sketches.py pins the observed
error on the fixture corpus and the merge property.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# 2^32 as an exact double: v+1 <= 2^32 keeps h in (0, 1], exactly
# representable, so Spark and DuckDB divide to bit-identical doubles.
_SCALE = float(1 << 32)


def kmv_hash(col) -> "F.Column":
    """Deterministic uniform (0, 1] hash of a column: top 32 bits of md5
    (the cross-engine idiom — DuckDB twin: ('0x' || substr(md5(x), 1, 8))
    ::BIGINT). +1 so a zero hash cannot divide-by-zero the estimator."""
    v = F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10)
    return (v.cast("bigint") + 1) / F.lit(_SCALE)


def kmv_distinct(
    df: DataFrame, group_cols: list[str], col: str, k: int = 64
) -> DataFrame:
    """(group_cols..., n_kept, est_distinct): KMV distinct-count estimate
    of ``col`` per group. When a group has fewer than k distinct hashes
    the sketch degenerates to the exact distinct count (n_kept), which is
    the textbook small-range behavior. Plan: one hash-distinct on
    (group, h), then a WindowGroupLimit k-smallest per group — no UDF,
    no collect."""
    d = (
        df.select(*group_cols, kmv_hash(F.col(col)).alias("h"))
        .distinct()
    )
    w = Window.partitionBy(*group_cols).orderBy("h")
    kept = (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
    )
    agg = kept.groupBy(*group_cols).agg(
        F.count("*").alias("n_kept"), F.max("h").alias("_h_k")
    )
    return agg.select(
        *group_cols,
        "n_kept",
        F.when(F.col("n_kept") < k, F.col("n_kept").cast("double"))
        .otherwise(F.round((F.lit(float(k - 1))) / F.col("_h_k")))
        .alias("est_distinct"),
    )
