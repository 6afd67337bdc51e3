"""fastText-style hashed-ngram quality classifier
(operators/quality_model.py): deterministic training, teacher
agreement, Spark-scoring == NumPy-twin arithmetic, zero-Python plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from granulate_char_ocr_spark.operators import quality_model as qm

GOOD = [
    "the quick brown fox jumps over the lazy dog near the river bank",
    "a detailed analysis of the query planner shows broadcast joins win",
    "weather patterns shifted north this spring according to the survey",
    "she wrote three chapters before breakfast and revised them after",
    "the committee approved funding for the new public library wing",
    "engineers measured throughput across both cluster configurations",
    "local farmers reported a strong harvest despite the late frost",
    "the museum opened a new exhibit on early printing techniques",
]
BAD = [
    "buy buy buy cheap cheap cheap now now now click click click",
    "win win win casino casino casino jackpot jackpot jackpot",
    "xxx zzz qqq www lll ppp kkk mmm nnn bbb vvv ccc",
    "free free free offer offer offer deal deal deal sale sale",
    "aaaa bbbb cccc dddd eeee ffff gggg hhhh iiii jjjj",
    "click here click here click here click here click here",
    "zzzzz yyyyy xxxxx wwwww vvvvv uuuuu ttttt sssss",
    "lotto lotto lotto prize prize prize claim claim claim",
]


@pytest.fixture(scope="module")
def model(spark):
    train = spark.createDataFrame(
        [(t, True) for t in GOOD] + [(t, False) for t in BAD],
        "text string, label boolean",
    )
    return qm.fit_quality_model(train, k=256, epochs=2000, lr=3.0)


def test_fit_is_deterministic(spark, model):
    train = spark.createDataFrame(
        [(t, True) for t in GOOD] + [(t, False) for t in BAD],
        "text string, label boolean",
    )
    w2, b2 = qm.fit_quality_model(train, k=256, epochs=2000, lr=3.0)
    assert w2 == model[0] and b2 == model[1]


def test_model_separates_teacher_labels(spark, model):
    w, b = model
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(GOOD + BAD)], "doc_id int, text string"
    )
    scores = {
        r.doc_id: r.model_score
        for r in qm.quality_model_scores(docs, w, b).collect()
    }
    good_scores = [scores[i] for i in range(len(GOOD))]
    bad_scores = [scores[i + len(GOOD)] for i in range(len(BAD))]
    assert min(good_scores) > max(bad_scores)
    assert min(good_scores) > 0.7 and max(bad_scores) < 0.3


def test_spark_score_equals_numpy_twin(spark, model):
    w, b = model
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(GOOD[:3] + BAD[:3] + [""])],
        "doc_id int, text string",
    )
    rows = docs.select(
        "doc_id",
        qm.gram_buckets_expr(F.col("text"), len(w)).alias("buckets"),
        qm.score_expr(F.col("text"), w, b).alias("score"),
    ).collect()
    for r in rows:
        want = qm.score_python(w, b, r.buckets)
        assert abs(r.score - want) < 1e-9


def test_generalizes_to_unseen_text(spark, model):
    # words never seen in training: the hashed-ngram space still
    # separates repetitive spam shape from prose shape via collisions
    # learned per bucket — exactly why the distilled model is used over
    # raw rules. Keep the bar modest: order, not calibration.
    w, b = model
    docs = spark.createDataFrame(
        [
            (0, "the historians catalogued manuscripts during the autumn"),
            (1, "prize prize prize winner winner winner claim claim claim"),
        ],
        "doc_id int, text string",
    )
    s = {
        r.doc_id: r.model_score
        for r in qm.quality_model_scores(docs, w, b).collect()
    }
    assert s[0] > s[1]


def test_plan_is_pure_codegen(spark, model):
    w, b = model
    docs = spark.createDataFrame([(1, "a b c")], "doc_id int, text string")
    plan = (
        qm.quality_model_scores(docs, w, b)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
