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


def test_budget_select_greedy_exact(spark):
    """budget_select admits the maximal quality-ranked prefix whose
    running token sum fits the budget, per stratum."""
    from nomenklatura_spark.textops.analysis import budget_select

    rows = [
        # en: scores by stopword density (markers: the/and/of/to/in/is/...)
        (1, "en", "the and of to in a is it"),            # 8 tokens, 6/8
        (2, "en", "the cat sat on a mat quietly today"),  # 8 tokens, 1/8
        (3, "en", "zebra quagga okapi tapir bongo"),      # 5 tokens, 0.0
        (4, "de", "und der das ein"),                     # no en stopwords
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {
        r["id"]: (r["cum_tokens"], r["score"])
        for r in budget_select(df, budget_tokens=16).collect()
    }
    # en ranking: 1 (0.75) -> 2 (0.125) -> 3 (0.0); cum 8, 16, 21 -> 3 cut
    assert set(got) == {1, 2, 4}
    assert got[1][0] == 8 and got[2][0] == 16
    assert got[1][1] == 0.75 and got[2][1] == 0.125 and got[4][1] == 0.0


# ---------------------------------------------------------------------------
# leakage-safe (family-atomic) split


def test_leakage_safe_split_no_near_dup_straddles(spark, sf_dir):
    """The property the op exists for: ZERO near-dup pairs straddle a
    split boundary (a plain per-doc split leaks them), families are
    atomic, and every document is assigned exactly once."""
    from pyspark.sql import functions as F

    from nomenklatura_spark.dedup.ngram import ngram_jaccard_pairs
    from nomenklatura_spark.session import load_table
    from nomenklatura_spark.textops.analysis import leakage_safe_split

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    pairs = ngram_jaccard_pairs(
        docs, "doc_id", "text", k=3, threshold=0.5, max_df=100, mode="word"
    ).select("lid", "rid")
    out = leakage_safe_split(docs.select("doc_id"), pairs)
    assert out.count() == docs.count()
    sl = out.select(F.col("doc_id").alias("lid"), F.col("split").alias("s_l"))
    sr = out.select(F.col("doc_id").alias("rid"), F.col("split").alias("s_r"))
    straddling = (
        pairs.join(sl, "lid").join(sr, "rid")
        .where(F.col("s_l") != F.col("s_r"))
    )
    assert straddling.count() == 0
    # families are atomic: one split per family
    fam_splits = out.groupBy("family").agg(
        F.count_distinct("split").alias("k")
    )
    assert fam_splits.where(F.col("k") > 1).count() == 0
    # all three splits exist and train dominates
    dist = {r["split"]: r["count"] for r in out.groupBy("split").count().collect()}
    assert dist.get("train", 0) > dist.get("val", 0)
    assert dist.get("train", 0) > dist.get("test", 0)
    # partition invariance
    rep = leakage_safe_split(docs.select("doc_id").repartition(13), pairs)
    assert sorted(tuple(r) for r in out.collect()) == sorted(
        tuple(r) for r in rep.collect()
    )
