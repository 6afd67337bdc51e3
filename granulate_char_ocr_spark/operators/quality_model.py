"""Model-based quality scoring — the fastText-classifier stage of a
modern LLM data pipeline (the DCLM recipe: distill a rule
filter / reference corpus into a tiny linear model, then score the
whole crawl with it; the model generalizes where rules are brittle).

The engine-side contract is the point: the model is a K-bucket hashed
bag-of-ngrams logistic regression whose SCORING is pure column
expressions —

    grams   = word unigrams + bigrams of lower(text)
    buckets = pmod(xxhash64(gram, seed), K)
    score   = sigmoid(bias + mean(weight[bucket]))

— the weight table rides into the plan as a K-float array literal
(a few KB; at 100 TB that is a constant broadcast inside codegen, no
join, no UDF, no Python). Training (``fit_quality_model``) runs the
SAME Spark featurization and fits with plain NumPy full-batch gradient
descent on the driver — deterministic (fixed epochs/step, float64, no
shuffling), and the train-time collect is bounded by the training-set
size, never the corpus.

The mean (not sum) of bucket weights keeps long documents from
saturating the logit; xxhash64 is Spark's own, so train and serve can
never disagree on the hash. The reference repo has no model-based
text scoring (SURVEY §2 stops at rule filters); this leg comes from
the builder's brief (quality scoring as a first-class pipeline op).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

K_DEFAULT = 512
_HASH_SEED = 42


def gram_buckets_expr(text: Column, k: int = K_DEFAULT) -> Column:
    """text -> array<int> of hashed unigram+bigram feature buckets."""
    toks = F.filter(
        F.split(F.lower(text), r"[ \t\r\n]+"), lambda t: t != ""
    )
    n = F.size(toks)
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = F.concat(toks, bigrams)
    return F.transform(
        grams,
        lambda g: F.pmod(F.xxhash64(g, F.lit(_HASH_SEED)), F.lit(k)).cast(
            "int"
        ),
    )


def score_expr(
    text: Column, weights: list[float], bias: float
) -> Column:
    """Pure-codegen classifier score in [0, 1]: sigmoid(bias +
    mean(weight[bucket])). Empty text scores sigmoid(bias)."""
    k = len(weights)
    w = F.array(*[F.lit(float(x)) for x in weights])
    buckets = gram_buckets_expr(text, k)
    total = F.aggregate(
        buckets,
        F.lit(0.0),
        lambda acc, b: acc + F.element_at(w, b + 1),
    )
    mean = F.when(
        F.size(buckets) > 0, total / F.size(buckets)
    ).otherwise(F.lit(0.0))
    logit = F.lit(float(bias)) + mean
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-logit))


def quality_model_scores(
    docs: DataFrame,
    weights: list[float],
    bias: float,
    text_col: str = "text",
    key_col: str = "doc_id",
) -> DataFrame:
    """(key, text) -> (key, model_score): one zero-exchange projection;
    the whole model lives inside whole-stage codegen."""
    return docs.select(
        key_col, score_expr(F.col(text_col), weights, bias).alias(
            "model_score"
        )
    )


def fit_quality_model(
    train: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    k: int = K_DEFAULT,
    epochs: int = 300,
    lr: float = 2.0,
    l2: float = 1e-4,
) -> tuple[list[float], float]:
    """Fit (weights, bias) on (text, boolean label) rows.

    Featurization is the SAME Spark expression the scorer uses (hash
    parity by construction); the fit is full-batch logistic gradient
    descent in NumPy — deterministic for fixed epochs/lr (no sampling,
    no shuffling). The collect here is the TRAINING set (thousands of
    rows), a one-time driver-side step — serving never collects."""
    rows = train.select(
        gram_buckets_expr(F.col(text_col), k).alias("b"),
        F.col(label_col).cast("int").alias("y"),
    ).collect()
    n = len(rows)
    if n == 0:
        raise ValueError("fit_quality_model: empty training set")
    x = np.zeros((n, k), dtype=np.float64)
    y = np.empty(n, dtype=np.float64)
    for i, r in enumerate(rows):
        y[i] = r.y
        if r.b:
            counts = np.bincount(np.asarray(r.b), minlength=k)
            x[i] = counts / len(r.b)  # mean form — matches score_expr
    w = np.zeros(k, dtype=np.float64)
    b = 0.0
    for _ in range(epochs):
        z = x @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = p - y
        w -= lr * (x.T @ g / n + l2 * w)
        b -= lr * float(g.mean())
    return w.tolist(), b


def score_python(
    weights: list[float], bias: float, buckets
) -> float:
    """NumPy twin of score_expr's ARITHMETIC, over the bucket list
    Spark computed (gram_buckets_expr) — hashing lives JVM-side only,
    so the twin takes buckets, not text (a text parameter here would
    be dead and silently score everything as empty — review r4)."""
    if buckets is None or len(buckets) == 0:
        logit = bias
    else:
        w = np.asarray(weights, dtype=np.float64)
        logit = bias + float(w[np.asarray(buckets)].mean())
    return float(1.0 / (1.0 + np.exp(-logit)))
