"""S9/P2/P3 — enrichment connector pattern: cache-aware matching,
suggestion wiring, expansion."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from nomenklatura_spark.sources.enrich import (
    EnrichmentCache,
    LocalEnricher,
    StubHttpEnricher,
    enrich_expand,
    enrich_match,
    match_and_suggest,
)

EDGE_DDL = (
    "target string, source string, judgement string, score double,"
    " user string, created_at string, deleted_at string"
)

REF = pd.DataFrame(
    {
        "entity_id": ["x1", "x2", "x3"],
        "schema": ["Person", "Person", "Company"],
        "name": ["Johanna Quandt", "Herbert Quandt", "Acme GmbH"],
    }
)


@pytest.fixture()
def queries(spark):
    return spark.createDataFrame(
        [("q1", "Johanna Quandt"), ("q2", "Unrelated Name")],
        "query_id string, query_name string",
    )


def test_local_enricher_match(spark, queries):
    got = enrich_match(queries, LocalEnricher(REF)).collect()
    by_query = {}
    for r in got:
        by_query.setdefault(r["query_id"], set()).add(r["candidate_id"])
    # q1 shares the "quandt" token with both Quandts; q2 matches nothing
    assert by_query["q1"] == {"x1", "x2"}
    assert "q2" not in by_query


def test_cache_hit_skips_transport(spark, queries, tmp_path):
    cache = EnrichmentCache(str(tmp_path / "cache"))
    first = enrich_match(queries, LocalEnricher(REF), cache=cache).collect()
    assert len(first) == 2

    class Exploding(LocalEnricher):
        def match_batch(self, q: pd.DataFrame) -> pd.DataFrame:
            raise AssertionError("transport must not be called on cache hit")

    second = enrich_match(queries, Exploding(REF), cache=cache).collect()
    assert {(r["query_id"], r["candidate_id"]) for r in second} == {
        (r["query_id"], r["candidate_id"]) for r in first
    }


def test_cache_ttl_and_versioning(spark, queries, tmp_path):
    """Jittered TTL + min_timestamp invalidation + latest-row-wins
    (reference cache.py:30-33, get(min_timestamp=...))."""
    import datetime

    from pyspark.sql import functions as F

    cache = EnrichmentCache(str(tmp_path / "cache"))
    enrich_match(queries, LocalEnricher(REF), cache=cache).collect()

    # fresh entries survive any sane TTL; the jitter floor is >= 1 day
    assert cache.read(spark, max_age_days=30).count() > 0
    assert cache.read(spark, max_age_days=1).count() > 0
    # max_age < 1 disables the cache entirely (reference get(): max_age<1)
    assert cache.read(spark, max_age_days=0).count() == 0
    # a future min_timestamp invalidates everything stored before it
    future = datetime.datetime.now() + datetime.timedelta(days=1)
    assert cache.read(spark, min_timestamp=future).count() == 0

    # latest row wins: append a newer response for an existing fingerprint
    one = cache.read(spark).limit(1)
    cache.append(
        one.select(
            "fingerprint", "enricher", F.lit("NEWER").alias("response")
        )
    )
    fp = one.collect()[0]["fingerprint"]
    rows = cache.read(spark).where(F.col("fingerprint") == fp).collect()
    assert len(rows) == 1 and rows[0]["response"] == "NEWER"


def test_stub_http_raises(spark, queries):
    with pytest.raises(Exception):
        enrich_match(queries, StubHttpEnricher("https://example.com")).collect()


def test_match_and_suggest_pipeline(spark, queries):
    edges = spark.createDataFrame([], EDGE_DDL)

    def score_fn(df):
        return df.withColumn(
            "score",
            F.when(
                F.lower("query_name") == F.lower("candidate_name"), 1.0
            ).otherwise(0.4),
        )

    out = match_and_suggest(
        queries, LocalEnricher(REF), edges, score_fn, threshold=0.5,
        ts="2024-06-01T00:00:00",
    )
    rows = out.collect()
    assert len(rows) == 1  # only the exact-name candidate clears 0.5
    assert {rows[0]["target"], rows[0]["source"]} == {"q1", "x1"}
    assert rows[0]["judgement"] == "no_judgement"


def test_match_and_suggest_skips_judged(spark, queries):
    from nomenklatura_spark.resolver.edges import normalize_pairs

    judged = normalize_pairs(
        spark.createDataFrame([("q1", "x1")], "left string, right string")
    ).select(
        "target", "source",
        F.lit("negative").alias("judgement"),
        F.lit(None).cast("double").alias("score"),
        F.lit(None).cast("string").alias("user"),
        F.lit("2024-01-01T00:00:00").alias("created_at"),
        F.lit(None).cast("string").alias("deleted_at"),
    )

    def score_fn(df):
        return df.withColumn("score", F.lit(1.0))

    out = match_and_suggest(
        queries, LocalEnricher(REF), judged, score_fn, threshold=0.5,
        ts="2024-06-01T00:00:00",
    )
    fresh = out.where(F.col("judgement") == "no_judgement").collect()
    # (q1, x1) is already negatively judged → only (q1, x2) may appear
    assert {(r["target"], r["source"]) for r in fresh} != set()
    assert all({r["target"], r["source"]} != {"q1", "x1"} for r in fresh)


def test_enrich_expand(spark):
    matches = spark.createDataFrame(
        [("q1", "x1")], "query_id string, candidate_id string"
    )
    rows = enrich_expand(matches, LocalEnricher(REF)).collect()
    assert len(rows) == 1
    assert rows[0]["entity_id"] == "x1"
    assert rows[0]["value"] == "Johanna Quandt"
    assert rows[0]["dataset"] == "local"
