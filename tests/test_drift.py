"""Corpus drift monitor (textops/analysis.unigram_drift): exact values
against a driver-side reference, one-sided vocabulary handling."""

from __future__ import annotations

import math

from pyspark.sql import Row

from nomenklatura_spark.textops.analysis import unigram_drift

OLD = ["apple apple banana", "banana cherry"]
NEW = ["apple durian durian", "durian cherry cherry"]


def _reference():
    co, cn = {}, {}
    for t in OLD:
        for w in t.split():
            co[w] = co.get(w, 0) + 1
    for t in NEW:
        for w in t.split():
            cn[w] = cn.get(w, 0) + 1
    vocab = sorted(set(co) | set(cn))
    t_old, t_new, v = sum(co.values()), sum(cn.values()), len(vocab)
    out = {}
    for w in vocab:
        po = (co.get(w, 0) + 1) / (t_old + v)
        pn = (cn.get(w, 0) + 1) / (t_new + v)
        out[w] = (
            co.get(w, 0),
            cn.get(w, 0),
            round(po, 9),
            round(pn, 9),
            round(pn - po, 9),
            round(pn * math.log(pn / po), 9),
        )
    return out


def test_drift_matches_reference(spark):
    old = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(OLD)])
    new = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(NEW)])
    got = {
        r["word"]: (
            r["c_old"], r["c_new"], r["p_old"], r["p_new"], r["delta"], r["kl_term"]
        )
        for r in unigram_drift(old, new).collect()
    }
    want = _reference()
    assert got == want
    # durian exists only in the new snapshot; smoothing keeps it finite
    assert got["durian"][0] == 0 and got["durian"][4] > 0
    # apple receded: negative delta and negative KL contribution
    assert got["apple"][4] < 0 and got["apple"][5] < 0
    # total probability shift sums to ~0 (both sides are distributions)
    assert abs(sum(t[4] for t in got.values())) < 1e-6


def test_drift_from_stored_vocab_matches_rescan(spark, tmp_path):
    """The at-rest monitoring path: drift computed from two stored
    vocabulary-index versions must equal unigram_drift over the raw
    snapshots — the maintained counters ARE the corpus statistics."""
    from nomenklatura_spark.streaming.vocab_index import VocabIndexState
    from nomenklatura_spark.textops.analysis import (
        unigram_drift,
        unigram_drift_from_counts,
    )

    rows_old = [(i, f"alpha beta gamma w{i % 7}") for i in range(0, 40, 2)]
    rows_new = [(i, f"beta delta epsilon w{i % 5}") for i in range(1, 40, 2)]
    old = spark.createDataFrame(rows_old, "doc_id long, text string")
    new = spark.createDataFrame(rows_new, "doc_id long, text string")
    state = VocabIndexState(spark, str(tmp_path))
    state.apply_batch(old, batch_id=0)
    state.apply_batch(new, batch_id=1)
    served = unigram_drift_from_counts(
        state.vocab(version=0).select("word", "count"),
        state.vocab(version=1).select("word", "count"),
    )
    # version 1 is cumulative: the rescan twin is old vs old+new
    scratch = unigram_drift(old, old.unionByName(new))
    assert sorted(tuple(r) for r in served.collect()) == sorted(
        tuple(r) for r in scratch.collect()
    )
