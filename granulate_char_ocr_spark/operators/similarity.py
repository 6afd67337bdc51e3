"""Similarity search over an embedding column (array<float>).

Two paths, per the training-data-pipeline brief:

* ``cosine_topk``   — brute-force exact top-k: broadcast the (small) query
  set against the corpus; the dot product is a JVM-side higher-order
  ``aggregate(zip_with(...))`` — no Python in the hot loop. At 100 TB this is
  the verification baseline (scan-heavy but embarrassingly parallel, zero
  shuffle beyond the final per-query top-k).
* ``ivf_topk``      — the scale path: a coarse inverted-file (IVF) variant
  where the cell id is the sign pattern of the first ``sign_dims``
  components (a fixed, data-independent quantizer — keeps the oracle exact).
  Queries probe only their own cell: the corpus-side scan is pruned by an
  equi-join on the cell id. Swap the quantizer for trained centroids in
  production; the plan shape (cell equi-join → local top-k) is identical.

Ranking determinism: candidates are ranked by (rounded sim desc, vec_id asc)
so ties cannot reorder across engines; only (query_id, neighbor, rank, sim)
survive to the result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

COSINE_EXPR = (
    "aggregate(zip_with(l.embedding, r.embedding, (x, y) -> cast(x as double) * y), "
    "0D, (acc, v) -> acc + v) / "
    "(sqrt(aggregate(l.embedding, 0D, (a, x) -> a + cast(x as double) * x)) * "
    " sqrt(aggregate(r.embedding, 0D, (a, x) -> a + cast(x as double) * x)))"
)


def _ranked(joined: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id")
    )
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


def cosine_topk(embeddings: DataFrame, n_queries: int = 10, k: int = 5) -> DataFrame:
    """Exact top-k cosine neighbors for the first ``n_queries`` vec_ids."""
    queries = embeddings.filter(F.col("vec_id") < n_queries).alias("l")
    corpus = embeddings.alias("r")
    joined = (
        queries.crossJoin(F.broadcast(corpus).hint("broadcast"))
        .filter(F.col("l.vec_id") != F.col("r.vec_id"))
        .select(
            F.col("l.vec_id").alias("query_id"),
            F.col("r.vec_id").alias("neighbor_id"),
            F.round(F.expr(COSINE_EXPR), 5).alias("sim"),
        )
    )
    return _ranked(joined, k)


def _cell_expr(side: str, sign_dims: int) -> str:
    bits = " || ".join(
        f"case when element_at({side}.embedding, {i + 1}) >= 0 then '1' else '0' end"
        for i in range(sign_dims)
    )
    return bits


def ivf_topk(
    embeddings: DataFrame,
    n_queries: int = 10,
    k: int = 5,
    sign_dims: int = 4,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's own sign-cell
    (single-probe IVF). Returns (query_id, neighbor_id, rank, sim)."""
    cell = lambda side: F.expr(_cell_expr(side, sign_dims))  # noqa: E731
    corpus = embeddings.alias("r").withColumn("cell", cell("r"))
    queries = (
        embeddings.filter(F.col("vec_id") < n_queries)
        .alias("l")
        .withColumn("cell", cell("l"))
    )
    joined = (
        queries.join(corpus.hint("shuffle_hash"), "cell")
        .filter(F.col("l.vec_id") != F.col("r.vec_id"))
        .select(
            F.col("l.vec_id").alias("query_id"),
            F.col("r.vec_id").alias("neighbor_id"),
            F.round(F.expr(COSINE_EXPR), 5).alias("sim"),
        )
    )
    return _ranked(joined, k)
