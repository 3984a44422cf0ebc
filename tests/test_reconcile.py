"""P7 — reconcile pipeline: auto-positive vs review split, command emit."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from nomenklatura_spark.plans.reconcile import reconcile
from nomenklatura_spark.sources.enrich import LocalEnricher

EDGE_DDL = (
    "target string, source string, judgement string, score double,"
    " user string, created_at string, deleted_at string"
)

REF = pd.DataFrame(
    {
        "entity_id": ["Q1", "Q2"],
        "schema": ["Person", "Person"],
        "name": ["Johanna Quandt", "Herbert Quandt"],
    }
)


def test_reconcile_split_and_commands(spark):
    queries = spark.createDataFrame(
        [("p1", "Johanna Quandt"), ("p2", "Herbert Quant")],
        "query_id string, query_name string",
    )
    edges = spark.createDataFrame([], EDGE_DDL)

    def score_fn(df):
        return df.withColumn(
            "score",
            F.when(F.lower("query_name") == F.lower("candidate_name"), 0.95)
            .otherwise(0.6),
        )

    res = reconcile(
        queries, LocalEnricher(REF), edges, score_fn,
        ts="2024-06-01T00:00:00", auto_threshold=0.9, review_threshold=0.5,
    )
    autos = {(r["target"], r["source"]) for r in res.auto_matched.collect()}
    review = {(r["target"], r["source"]) for r in res.review.collect()}
    # exact name → auto; fuzzy → review; no overlap
    assert any("Q1" in pair for pair in autos)
    assert autos and review
    assert not autos & review

    by_j = {
        r["judgement"]: r for r in res.edges.where(F.col("deleted_at").isNull()).collect()
    }
    assert "positive" in by_j and by_j["positive"]["user"] == "reconcile"
    assert "no_judgement" in by_j

    cmds = res.commands.collect()
    assert all(r["prop"] == "sameAs" for r in cmds)
    assert len(cmds) == len(autos)


def test_reconcile_skips_already_judged(spark):
    queries = spark.createDataFrame(
        [("p1", "Johanna Quandt")], "query_id string, query_name string"
    )
    from nomenklatura_spark.resolver.edges import normalize_pairs

    judged = normalize_pairs(
        spark.createDataFrame([("p1", "Q1")], "left string, right string")
    ).select(
        "target", "source",
        F.lit("negative").alias("judgement"),
        F.lit(None).cast("double").alias("score"),
        F.lit(None).cast("string").alias("user"),
        F.lit("2024-01-01").alias("created_at"),
        F.lit(None).cast("string").alias("deleted_at"),
    )

    def score_fn(df):
        return df.withColumn("score", F.lit(1.0))

    res = reconcile(
        queries, LocalEnricher(REF), judged, score_fn, ts="2024-06-01",
    )
    autos = {(r["target"], r["source"]) for r in res.auto_matched.collect()}
    assert all({t, s} != {"p1", "Q1"} for t, s in autos)
