"""DSIR importance resampling (textops/dsir.py).

The registry row ``doc_dsir`` is oracle-checked; these tests pin the
selection semantics: target-like documents outscore source-like ones,
the Gumbel resample is size-k and weight-biased, and the exact-integer
weight pipeline is partition-order invariant.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nomenklatura_spark.textops.dsir import dsir_resample, dsir_weights

TARGET = [
    "quantum entanglement spectra measured in cryogenic interferometer arrays",
    "entanglement spectra reveal quantum coherence in interferometer design",
    "cryogenic arrays improve quantum interferometer coherence measurements",
    "spectra of entanglement coherence in cryogenic quantum devices",
]

CRAWL = [
    "buy cheap shoes online free shipping discount sale today",
    "celebrity gossip news update photos viral trending story",
    "football match results league table goals highlights video",
    "recipe chicken dinner easy quick meal family cooking ideas",
]

HELD_OUT_TARGETISH = "quantum coherence in entanglement interferometer spectra"
HELD_OUT_CRAWLISH = "discount sale shoes free shipping buy online cheap"


@pytest.fixture(scope="module")
def corpus(spark):
    rows = (
        [(i, t, "curated") for i, t in enumerate(TARGET)]
        + [(100 + i, t, "crawl") for i, t in enumerate(CRAWL)]
        + [(200, HELD_OUT_TARGETISH, "crawl"), (201, HELD_OUT_CRAWLISH, "crawl")]
    )
    return spark.createDataFrame(rows, "doc_id int, text string, source string")


def test_weights_prefer_target_vocabulary(spark, corpus):
    """A held-out document written in the target's vocabulary must
    outscore one written in crawl vocabulary — the importance weight is
    the whole point of DSIR."""
    w = {
        r.id: r.dsir_logweight
        for r in dsir_weights(corpus, corpus.source == "curated").collect()
    }
    assert w[200] > w[201]
    # and the target docs themselves sit above the crawl docs
    assert min(w[i] for i in range(4)) > max(w[100 + i] for i in range(4))


def test_resample_is_size_k_and_weight_biased(spark, corpus):
    out = dsir_resample(corpus, corpus.source == "curated", k=5).collect()
    sampled = [r for r in out if r.sampled]
    rest = [r for r in out if not r.sampled]
    assert len(sampled) == 5
    mean = lambda xs: sum(xs) / len(xs)
    assert mean([r.dsir_logweight for r in sampled]) > mean(
        [r.dsir_logweight for r in rest]
    )
    # the key the sample was drawn by is monotone with membership
    assert min(r.sample_key for r in sampled) >= max(r.sample_key for r in rest)


def test_weights_partition_order_invariant(spark, corpus):
    """Exact-integer aggregation: any partitioning gives bitwise-equal
    weights (the cross-engine oracle contract, exercised cluster-side)."""
    pred = F.col("source") == "curated"
    a = sorted(
        dsir_weights(corpus.repartition(1), pred).collect(), key=lambda r: r.id
    )
    b = sorted(
        dsir_weights(corpus.repartition(7), pred).collect(), key=lambda r: r.id
    )
    assert [(r.id, r._w9) for r in a] == [(r.id, r._w9) for r in b]


def test_degenerate_documents_survive(spark):
    """One-word docs must not feed sequence(1, 0) a descending range,
    and zero-gram docs (text that normalizes to empty) must still get a
    row with the neutral weight 0 — the one-row-per-document contract
    shared with the classifier/cluster selectors."""
    docs = spark.createDataFrame(
        [(1, "word", "a"), (2, "two words", "b"), (3, "!!! ... ###", "b")],
        "doc_id int, text string, source string",
    )
    rows = {r.id: r for r in dsir_weights(docs, docs.source == "a").collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[3]._w9 == 0 and rows[3].dsir_logweight == 0.0
    sampled = dsir_resample(docs, docs.source == "a", k=3).collect()
    assert len(sampled) == 3 and all(r.sampled for r in sampled)
