"""Stratified split (textops/analysis.stratified_split): exact
per-stratum proportions, determinism, partition invariance."""

from __future__ import annotations

from pyspark.sql import Row

from nomenklatura_spark.textops.analysis import stratified_split


def _corpus(spark):
    rows = [Row(doc_id=i, lang="en") for i in range(100)]
    rows += [Row(doc_id=1000 + i, lang="de") for i in range(23)]
    rows += [Row(doc_id=2000, lang="fr")]  # 1-doc stratum
    return spark.createDataFrame(rows)


def test_split_exact_proportions(spark):
    out = stratified_split(_corpus(spark), "lang", "doc_id").collect()
    by = {}
    for r in out:
        by.setdefault(r["lang"], {}).setdefault(r["split"], 0)
        by[r["lang"]][r["split"]] += 1
    # en: 100 docs -> 90/5/5 exact
    assert by["en"] == {"train": 90, "val": 5, "test": 5}
    # de: 23 docs -> floor boundaries 20/1/2
    assert by["de"] == {"train": 20, "val": 1, "test": 2}
    # 1-doc stratum: boundaries 0/0 -> the doc lands in test, never lost
    assert by["fr"] == {"test": 1}


def test_split_deterministic_and_partition_invariant(spark):
    corpus = _corpus(spark)
    a = {r["doc_id"]: r["split"] for r in stratified_split(corpus, "lang", "doc_id").collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in stratified_split(
            corpus.repartition(16, "doc_id"), "lang", "doc_id"
        ).collect()
    }
    assert a == b and len(a) == 124
