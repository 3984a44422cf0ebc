"""Bigram JM-interpolated LM scores (textops/analysis.
bigram_logprob_scores): hand-computed probabilities, BOS handling,
empty-doc exclusion, broadcast-only model joins."""

from __future__ import annotations

import math

from pyspark.sql import Row

from nomenklatura_spark.textops.analysis import bigram_logprob_scores


def _corpus(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=1, text="a b"),
            Row(doc_id=2, text="a b a"),
            Row(doc_id=3, text="   "),
        ]
    )


def test_hand_computed_scores(spark):
    out = {
        r["doc_id"]: r
        for r in bigram_logprob_scores(_corpus(spark)).collect()
    }
    # pairs: d1 (<s>,a)(a,b); d2 (<s>,a)(a,b)(b,a)
    # cb: (<s>,a)=2 (a,b)=2 (b,a)=1; cv: <s>=2 a=2 b=1; cu: a=3 b=2; total=5
    p_sa = 0.7 * 2 / 2 + (1.0 - 0.7) * 3 / 5
    p_ab = 0.7 * 2 / 2 + (1.0 - 0.7) * 2 / 5
    p_ba = 0.7 * 1 / 1 + (1.0 - 0.7) * 3 / 5
    d1 = round((-math.log(p_sa) - math.log(p_ab)) / 2, 6)
    d2 = round((-math.log(p_sa) - math.log(p_ab) - math.log(p_ba)) / 3, 6)
    assert out[1]["n_tokens"] == 2
    assert abs(out[1]["avg_neg_logprob_bi"] - d1) < 1e-9
    assert abs(out[2]["avg_neg_logprob_bi"] - d2) < 1e-9
    # whitespace-only doc has no transitions and is excluded
    assert 3 not in out


def test_conditionals_sum_to_one_contexts(spark):
    # the context normalizer is the sum of that context's bigram counts,
    # so interpolated probabilities stay <= 1 and > 0
    rows = [Row(doc_id=i, text=t) for i, t in enumerate(
        ["x y z", "y z x", "z z z", "x"], start=1
    )]
    out = bigram_logprob_scores(spark.createDataFrame(rows)).collect()
    assert all(r["avg_neg_logprob_bi"] > 0 for r in out)


def test_model_joins_broadcast(spark):
    plan = (
        bigram_logprob_scores(_corpus(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
