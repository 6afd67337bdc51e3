"""Similarity search over an embedding column (array<float>).

Three formulations, per the training-data-pipeline brief:

* ``cosine_topk``      — brute-force exact top-k as a pure DataFrame plan:
  per-side ``norm`` columns are HOISTED before the join (computed once per
  vector, not once per pair — r1's plan recomputed both norms inside the
  join, the bench's worst query by 4x), so the per-pair expression is one
  dot product divided by two precomputed scalars.
* ``cosine_topk_gemm`` — the production brute-force leg: the (small, bounded)
  query set is collected once and broadcast as a NumPy matrix; each Arrow
  batch of the corpus stacks its embeddings and resolves ALL queries with a
  single BLAS gemm, emitting only per-batch top-k candidates. At 100 TB this
  is an embarrassingly-parallel corpus scan with k*n_batches rows per query
  entering the final top-k exchange — no pairwise join materialization.
* ``ivf_topk``         — the pruned path: a coarse inverted-file (IVF)
  variant where the cell id is the sign pattern of the first ``sign_dims``
  components (a fixed, data-independent quantizer — keeps the oracle exact).
  Queries probe only their own cell. Swap the quantizer for trained
  centroids in production; the plan shape (cell equi-join → local top-k) is
  identical.

Ranking determinism: candidates are ranked by (rounded sim desc, vec_id asc)
so ties cannot reorder across engines; only (query_id, neighbor, rank, sim)
survive to the result.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# dot product over pre-normed sides: norms are JOIN INPUT columns, computed
# once per vector (with_norm below), never per pair
DOT_EXPR = (
    "aggregate(zip_with(l.embedding, r.embedding, (x, y) -> cast(x as double) * y), "
    "0D, (acc, v) -> acc + v)"
)
COSINE_EXPR = f"{DOT_EXPR} / (l.norm * r.norm)"

NORM_EXPR = "sqrt(aggregate(embedding, 0D, (a, x) -> a + cast(x as double) * x))"


def with_norm(embeddings: DataFrame) -> DataFrame:
    """Project the L2 norm once per vector — the hoist that keeps the norm
    out of every pairwise expression downstream."""
    return embeddings.withColumn("norm", F.expr(NORM_EXPR))


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
    """Exact top-k cosine neighbors for the first ``n_queries`` vec_ids —
    the SQL-expressible baseline (norm-hoisted HOF dot product)."""
    normed = with_norm(embeddings)
    queries = normed.filter(F.col("vec_id") < n_queries).alias("l")
    corpus = normed.alias("r")
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


def cosine_topk_gemm(
    embeddings: DataFrame, n_queries: int = 10, k: int = 5
) -> DataFrame:
    """Exact top-k via one BLAS matmul per Arrow batch.

    The query set is bounded (n_queries rows) so collecting it to the driver
    is a deliberate, size-capped broadcast — the corpus side stays fully
    distributed and is scanned exactly once. Each batch emits at most
    n_queries * k candidate rows, so the final top-k shuffle carries
    k * n_batches rows per query, never the full pairwise product.
    Results are bit-compatible with cosine_topk at the pinned 5-decimal
    rounding (float64 gemm vs HOF sequential sum; pinned by tests).

    NOTE: the query-set collect is EAGER — it runs a (pushdown-pruned,
    n_queries-row) Spark job at DataFrame-construction time, unlike the
    lazy plans elsewhere. Deliberate: the broadcast matrix must exist
    before the mapInPandas closure is built, and the bounded query scan is
    the price of replacing the pairwise join with one gemm per batch.
    """
    q_pd = (
        embeddings.filter(F.col("vec_id") < n_queries)
        .select("vec_id", "embedding")
        .toPandas()
    )
    if len(q_pd) == 0:
        empty = "query_id bigint, neighbor_id bigint, rank int, sim double"
        return embeddings.sparkSession.createDataFrame([], empty)
    q_ids = q_pd["vec_id"].to_numpy()
    q_mat = np.stack(q_pd["embedding"].to_numpy()).astype(np.float64)
    qn = np.linalg.norm(q_mat, axis=1, keepdims=True)
    np.maximum(qn, 1e-300, out=qn)  # zero-vector queries: sims → 0, not NaN
    q_unit = q_mat / qn
    sc = embeddings.sparkSession.sparkContext
    bq = sc.broadcast((q_ids, q_unit))

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, qm = bq.value
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            xn = np.linalg.norm(x, axis=1, keepdims=True)
            np.maximum(xn, 1e-300, out=xn)
            sims = (x / xn) @ qm.T  # (B, Q): one gemm for the whole batch
            vec_ids = pdf["vec_id"].to_numpy()
            out_q, out_n, out_s = [], [], []
            for j, qid in enumerate(ids):
                mask = vec_ids != qid  # exclude self
                cand_ids = vec_ids[mask]
                # half-AWAY-from-zero to 5 decimals — np.round is half-to-
                # even, but Spark's round() and the DuckDB oracle both round
                # half away, and a sim landing exactly on a half-ulp would
                # rank/hash differently (ADVICE r2)
                s = sims[mask, j]
                cand = np.sign(s) * np.floor(np.abs(s) * 1e5 + 0.5) / 1e5
                # per-batch top-k under the EXACT final order (rounded sim
                # desc, neighbor_id asc): top-k of a union equals top-k of
                # the union of per-batch top-k's, so boundary ties at the
                # 5-decimal rounding cannot drop the wrong candidate
                top = np.lexsort((cand_ids, -cand))[:k]
                out_q.extend([qid] * len(top))
                out_n.extend(cand_ids[top])
                out_s.extend(cand[top])
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "sim": out_s}
            )

    cand = embeddings.select("vec_id", "embedding").mapInPandas(
        fn, schema="query_id bigint, neighbor_id bigint, sim double"
    )
    return _ranked(cand, k)


def _cell_expr(side: str, sign_dims: int) -> str:
    ref = f"{side}.embedding" if side else "embedding"
    bits = " || ".join(
        f"case when element_at({ref}, {i + 1}) >= 0 then '1' else '0' end"
        for i in range(sign_dims)
    )
    return bits


def with_cell(embeddings: DataFrame, sign_dims: int) -> DataFrame:
    """Project the IVF sign-cell id (unqualified refs — apply BEFORE any
    .alias(): a withColumn added after aliasing is not reachable via the
    alias qualifier in a self-join)."""
    return embeddings.withColumn("cell", F.expr(_cell_expr("", sign_dims)))


def probe_cells_expr(sign_dims: int, rings: int = 1) -> str:
    """array(own cell + every cell within ``rings`` sign flips) — the
    multi-probe candidate set shared by ivf_topk_multiprobe and
    dedup.embedding_near_pairs. rings=1 adds the ``sign_dims`` one-flip
    cells; rings=2 also adds the C(sign_dims, 2) two-flip cells (the
    recall/cost trade measured in BENCH/BASELINE.md §3)."""
    from itertools import combinations

    def cell_with_flips(flips: tuple[int, ...]) -> str:
        return " || ".join(
            (
                f"case when element_at(embedding, {j + 1}) >= 0 then '0' else '1' end"
                if j in flips
                else f"case when element_at(embedding, {j + 1}) >= 0 then '1' else '0' end"
            )
            for j in range(sign_dims)
        )

    probes = [_cell_expr("", sign_dims)]
    for r in range(1, rings + 1):
        probes.extend(
            cell_with_flips(f) for f in combinations(range(sign_dims), r)
        )
    return "array(" + ", ".join(probes) + ")"


def ivf_topk_multiprobe(
    embeddings: DataFrame,
    n_queries: int = 10,
    k: int = 5,
    sign_dims: int = 4,
) -> DataFrame:
    """Multi-probe IVF top-k: each query probes its own sign-cell PLUS the
    ``sign_dims`` cells one sign-flip away (the standard recall fix for
    single-probe IVF — a query vector near a quantization boundary finds
    neighbors that landed just across it). Corpus-side work grows only with
    the probe count (cells are disjoint, so no candidate dedup is needed);
    the corpus scan is still pruned by the cell equi-join. Measured
    recall@5 vs the exact gemm answer on the sf0.01 embeddings (500×64,
    10 queries): 0.54 multi-probe vs 0.20 single-probe at sign_dims=4,
    pinned by tests/test_ann_recall.py — the quantizer keeps 5/16 of the
    corpus per query here; at production scale sign_dims grows with the
    corpus so the probed fraction shrinks while the 1-flip recall
    mechanism is unchanged."""
    normed = with_norm(embeddings)
    corpus = with_cell(normed, sign_dims).alias("r")
    queries = (
        normed.filter(F.col("vec_id") < n_queries)
        .withColumn("cell", F.explode(F.expr(probe_cells_expr(sign_dims))))
        .alias("l")
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


def ivf_topk(
    embeddings: DataFrame,
    n_queries: int = 10,
    k: int = 5,
    sign_dims: int = 4,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's own sign-cell
    (single-probe IVF). Returns (query_id, neighbor_id, rank, sim)."""
    cell = lambda side: F.expr(_cell_expr(side, sign_dims))  # noqa: E731
    normed = with_norm(embeddings)
    corpus = normed.alias("r").withColumn("cell", cell("r"))
    queries = (
        normed.filter(F.col("vec_id") < n_queries)
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
