"""Quality-classifier training (textops/classifier.py): learning on a
separable corpus, exact GD trajectory vs a numpy reference, partition-
order invariance of the rounded updates, and persist hygiene.

The registry row ``doc_quality_classifier`` is oracle-checked by
tests/test_entry_contract.py (the DuckDB oracle unrolls the same
training loop as CTEs); these tests pin the semantics the oracle can't
see — that the model actually *learns* when signal exists, and that the
trajectory is the documented deterministic one.
"""

from __future__ import annotations

import math

import pytest

from nomenklatura_spark.textops.classifier import (
    CLF_FEATURES,
    classifier_features,
    quality_classifier_scores,
    train_quality_lr,
)

GOOD = [
    "the quick brown fox jumped over the lazy dog and ran to the hills",
    "she said that the weather in the valley was mild for the season",
    "a report on the state of the industry was published in the journal",
    "the committee agreed that the proposal was sound and voted for it",
    "in the morning the harbor was full of boats waiting for the tide",
    "the teacher explained that the answer was hidden in the question",
    "many of the travelers on the road were headed for the coast",
    "the results of the survey were consistent with the earlier findings",
]

JUNK = [
    "$$$ 1234 !!! 5678 ### 90 @@@ 1111 %%% 2222 ^^^ 3333",
    "0x3f2a 0x9b1c 0xdead 0xbeef ::: ;;; ,,, ... 42 42 42",
    "!!!???;;;:::---___===+++***&&&^^^%%%$$$###@@@!!!",
    "9999 8888 7777 6666 5555 4444 3333 2222 1111 0000",
    "a1b2c3d4e5 f6g7h8i9j0 !@#$ %^&* ()_+ 12345 67890",
    "### ## # #### ##### 12 34 56 78 90 12 34 56 78 90",
    "|||///\\\\\\~~~```'''\"\"\"<<<>>>[[[]]]{{{}}}12321",
    "00 11 22 33 44 55 66 77 88 99 xx yy zz !! ?? ..",
]


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, t, "curated") for i, t in enumerate(GOOD)] + [
        (100 + i, t, "crawl") for i, t in enumerate(JUNK)
    ]
    return spark.createDataFrame(rows, "doc_id int, text string, source string")


def test_classifier_learns_separable_corpus(spark, corpus):
    """With real signal (stopword-rich prose vs punctuation/digit junk)
    the fit must separate the classes: every curated document scores
    above every crawl document, with a real margin between the means."""
    scored = quality_classifier_scores(
        corpus, ("curated",), n_iter=25, lr=4.0, eval_permille=0
    ).collect()
    pos = [r.quality_prob for r in scored if r.label == 1.0]
    neg = [r.quality_prob for r in scored if r.label == 0.0]
    assert min(pos) > max(neg)
    assert sum(pos) / len(pos) - sum(neg) / len(neg) > 0.2


def test_gd_trajectory_matches_numpy_reference(spark, corpus):
    """The distributed fit replays exactly: same rounded features, same
    9dp-rounded gradient means and weight updates, computed in plain
    Python floats."""
    feats = classifier_features(corpus).withColumn(
        "label", (corpus.source == "curated").cast("double")
    )
    model = train_quality_lr(feats, CLF_FEATURES, "label", n_iter=5, lr=2.0)

    rows = feats.select("label", *CLF_FEATURES).collect()
    w = {c: 0.0 for c in CLF_FEATURES}
    b = 0.0
    for _ in range(5):
        grads = {c: 0.0 for c in CLF_FEATURES}
        gb = 0.0
        for r in rows:
            z = b
            for c in CLF_FEATURES:
                z += w[c] * r[c]
            err = 1.0 / (1.0 + math.exp(-z)) - r.label
            for c in CLF_FEATURES:
                grads[c] += err * r[c]
            gb += err
        n = len(rows)
        for c in CLF_FEATURES:
            w[c] = round(w[c] - 2.0 * round(grads[c] / n, 9), 9)
        b = round(b - 2.0 * round(gb / n, 9), 9)

    assert model["intercept"] == b
    assert model["coefs"] == w


def test_training_is_partition_order_invariant(spark, corpus):
    """The 9dp gradient rounding absorbs sum-order differences: the same
    corpus split 1 way and 7 ways must give bitwise-equal models (the
    cross-engine oracle contract, exercised cluster-side)."""
    feats = classifier_features(corpus).withColumn(
        "label", (corpus.source == "curated").cast("double")
    )
    m1 = train_quality_lr(feats.repartition(1), n_iter=6, lr=2.0)
    m7 = train_quality_lr(feats.repartition(7), n_iter=6, lr=2.0)
    assert m1 == m7


def test_training_leaves_cache_clean(spark, corpus):
    """train_quality_lr persists the feature frame for its n_iter scans
    and must release it before returning."""
    from tests.test_persist_lifecycle import _n_persistent

    feats = classifier_features(corpus).withColumn(
        "label", (corpus.source == "curated").cast("double")
    )
    before = _n_persistent(spark)
    train_quality_lr(feats, n_iter=2)
    assert _n_persistent(spark) == before
