"""Repetition-signal semantics (textops/analysis.repetition_features) on
crafted inputs; the corpus-level values are oracle-checked by the driver
(`doc_repetition`), so this pins the per-signal definitions."""

from __future__ import annotations

from nomenklatura_spark.textops.analysis import repetition_features


def _feat(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return repetition_features(df, "text").collect()[0]


def test_distinct_words_no_repetition(spark):
    r = _feat(spark, "alpha beta gamma delta")
    assert r.r_n_words == 4
    assert r.r_dup_word_frac == 0.0
    assert r.r_top_word_share == 0.25
    assert r.r_top_bigram_share == round(1 / 3, 4)
    assert r.r_max_run == 1


def test_full_repetition(spark):
    r = _feat(spark, "spam spam spam spam")
    assert r.r_dup_word_frac == 0.75
    assert r.r_top_word_share == 1.0
    assert r.r_top_bigram_share == 1.0
    assert r.r_max_run == 4


def test_max_run_is_consecutive_not_global(spark):
    # "a" appears 3 times but never more than twice consecutively
    r = _feat(spark, "a a b a c")
    assert r.r_top_word_share == 0.6
    assert r.r_max_run == 2


def test_top_bigram_dominates(spark):
    # bigram "x y" occurs twice of four bigrams
    r = _feat(spark, "x y z x y")
    assert r.r_top_bigram_share == 0.5


def test_empty_and_single_word(spark):
    r = _feat(spark, "")
    assert (r.r_n_words, r.r_dup_word_frac, r.r_max_run) == (0, 0.0, 0)
    assert r.r_top_bigram_share == 0.0
    r = _feat(spark, "solo")
    assert (r.r_n_words, r.r_top_word_share, r.r_max_run) == (1, 1.0, 1)
    assert r.r_top_bigram_share == 0.0  # no bigrams in a 1-word doc


def test_case_and_punct_folding(spark):
    # words() lowercases and splits on non-letter runs
    r = _feat(spark, "Spam, spam! SPAM?")
    assert r.r_n_words == 3
    assert r.r_top_word_share == 1.0
    assert r.r_max_run == 3
