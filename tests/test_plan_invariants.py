"""Physical-plan invariants over the ENTIRE driver query surface — the
permanent guard for the r1 verdict's scale findings: no quadratic join may
ever reappear in any queries() entry."""

import pytest

FORBIDDEN = ("CartesianProduct", "BroadcastNestedLoopJoin")

# cosine_topk_gemm broadcasts an explicitly bounded query set via a driver
# collect — the one sanctioned materialization (documented in similarity.py)
SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def all_plans(spark):
    import __spark_entry__ as e

    plans = {}
    for name, fn in e.queries().items():
        df = fn(spark, SF)
        plans[name] = df._jdf.queryExecution().executedPlan().toString()
    return plans


# evaluate() combines three SINGLE-ROW global aggregates (summary, span
# equality, char accuracy) with crossJoins — 1×1 joins are constant-size at
# any corpus scale, so the nested-loop operator there is benign
ALLOWED_NESTED_LOOP = {"ocr_eval_metrics"}


def test_no_cartesian_or_nested_loop_join_anywhere(all_plans):
    bad = {
        name: [f for f in FORBIDDEN if f in plan]
        for name, plan in all_plans.items()
        if name not in ALLOWED_NESTED_LOOP and any(f in plan for f in FORBIDDEN)
    }
    assert not bad, f"quadratic joins found: {bad}"


def test_near_pair_ops_are_equi_joins(all_plans):
    """The r1 weak set must stay hash-join shaped."""
    for name in (
        "simhash_near_pairs",
        "dedup_embedding_cosine",
        "ann_ivf_multiprobe_topk",
    ):
        plan = all_plans[name]
        assert "HashJoin" in plan, f"{name} lost its equi-join:\n{plan[:500]}"


def test_flagship_queries_have_no_python_row_udfs(all_plans):
    """Python in the surface is Arrow-batched only: BatchEvalPython (the
    row-at-a-time UDF operator) must not appear anywhere."""
    offenders = [n for n, p in all_plans.items() if "BatchEvalPython" in p]
    assert not offenders, offenders
