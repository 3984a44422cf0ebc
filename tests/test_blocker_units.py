"""Blocker operator unit tests with hand-built inputs — mirrors the
reference's blocker suite (tests/blocker/test_index.py there: manual
entries rows, pair-cost caps, stopword selection, match results)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

ENTRY_DDL = "schema string, id string, field string, token string, count int"


def _entries(spark, rows):
    return spark.createDataFrame(rows, ENTRY_DDL)


def _schemata(spark, pairs=None):
    pairs = pairs or [("Person", "Person")]
    return spark.createDataFrame(pairs, "left string, right string")


def test_pair_cost_triangular_within_schema(spark):
    """A token in df entities of one schema costs df*(df-1)/2 pairs."""
    from nomenklatura_spark.operators.blocker import build_token_stats

    rows = [("Person", f"e{i}", "np", "np:smith", 1) for i in range(5)]
    stats = build_token_stats(_entries(spark, rows), _schemata(spark), 1770)
    row = stats.collect()[0]
    assert int(row["compatible_pair_cost"]) == 5 * 4 // 2
    assert not row["stopword"]


def test_pair_cost_cross_schema(spark):
    """Across two compatible schemata the cost is the full cross product."""
    from nomenklatura_spark.operators.blocker import build_token_stats

    rows = [("Person", f"p{i}", "np", "np:x", 1) for i in range(3)] + [
        ("Company", f"c{i}", "np", "np:x", 1) for i in range(4)
    ]
    schemata = _schemata(
        spark,
        [("Person", "Person"), ("Company", "Company"),
         ("Person", "Company"), ("Company", "Person")],
    )
    stats = build_token_stats(_entries(spark, rows), schemata, 1770)
    row = stats.collect()[0]
    # within Person 3, within Company 6, cross 12
    assert int(row["compatible_pair_cost"]) == 3 + 6 + 12


def test_stopword_selection_above_cap(spark):
    from nomenklatura_spark.operators.blocker import (
        apply_stopwords,
        build_token_stats,
        stopwords_from_stats,
    )

    hot = [("Person", f"e{i}", "np", "np:common", 1) for i in range(60)]
    cold = [("Person", "e1", "np", "np:rare", 1), ("Person", "e2", "np", "np:rare", 1)]
    entries = _entries(spark, hot + cold)
    stats = build_token_stats(entries, _schemata(spark), max_pair_cost=1000)
    sw = stopwords_from_stats(stats)
    assert {r["token"] for r in sw.collect()} == {"np:common"}  # 1770 > 1000
    kept = apply_stopwords(entries, sw)
    assert {r["token"] for r in kept.collect()} == {"np:rare"}


def test_candidate_pair_scoring_formula(spark):
    """Two-level scoring: per (pair, field) max(l+r weight) and evidence
    count n; pair score = sum(maxw * (1 + ln(n)))."""
    from nomenklatura_spark.operators.blocker import candidate_pairs

    TF_DDL = "schema string, field string, token string, id string, weight double"
    tf = spark.createDataFrame(
        [
            ("Person", "np", "np:a", "e1", 2.0),
            ("Person", "np", "np:a", "e2", 3.0),
            ("Person", "np", "np:b", "e1", 1.0),
            ("Person", "np", "np:b", "e2", 4.0),
            ("Person", "name", "n:ab", "e1", 10.0),
            ("Person", "name", "n:ab", "e2", 10.0),
        ],
        TF_DDL,
    )
    got = candidate_pairs(tf, _schemata(spark), max_pairs=10).collect()
    assert len(got) == 1
    row = got[0]
    assert (row["lid"], row["rid"]) == ("e2", "e1")
    # np field: max(2+3, 1+4) = 5 with n=2 → 5*(1+ln2); name: 20*(1+ln1)
    expected = 5.0 * (1 + math.log(2)) + 20.0
    assert row["score"] == pytest.approx(expected, rel=1e-9)


def test_match_top_k_and_relative_floor(spark):
    """W1: per-subject top-K plus the min_score_ratio floor relative to
    the subject's best candidate."""
    from nomenklatura_spark.operators.blocker import match_candidates

    TF_DDL = "schema string, field string, token string, id string, weight double"
    # subject q shares a strong token with c1, weak with c2, weaker with c3
    matching = spark.createDataFrame(
        [
            ("Person", "name", "n:q", "q", 10.0),
            ("Person", "np", "np:w", "q", 1.0),
            ("Person", "np", "np:v", "q", 0.1),
        ],
        TF_DDL,
    )
    corpus = spark.createDataFrame(
        [
            ("Person", "name", "n:q", "c1", 10.0),
            ("Person", "np", "np:w", "c2", 1.0),
            ("Person", "np", "np:v", "c3", 0.1),
        ],
        TF_DDL,
    )
    got = match_candidates(
        matching, corpus, _schemata(spark),
        max_candidates=10, min_score_ratio=0.3,
    ).collect()
    by_cand = {r["matches_id"]: r for r in got}
    assert "c1" in by_cand  # best
    # c1 score 20, c2 score 2 (< 0.3*20=6 → floored out), c3 far below
    assert "c2" not in by_cand
    assert "c3" not in by_cand

    got_k1 = match_candidates(
        matching, corpus, _schemata(spark),
        max_candidates=1, min_score_ratio=0.0,
    ).collect()
    assert len(got_k1) == 1 and got_k1[0]["matches_id"] == "c1"


def test_folded_pair_cost_matches_join_path(spark):
    """The single-shuffle folded cost (schema_pairs known driver-side)
    must agree with the general tsc-self-join path, row for row."""
    from nomenklatura_spark.operators.blocker import build_token_stats

    pairs = [("Person", "Person"), ("Person", "Company"), ("Company", "Company")]
    rows = (
        [("Person", f"p{i}", "np", "np:smith", 1) for i in range(5)]
        + [("Company", f"c{i}", "np", "np:smith", 2) for i in range(3)]
        + [("Company", f"c{i}", "np", "np:acme", 1) for i in range(4)]
        + [("Person", "p0", "name", "n:x", 1)]  # schema with no pair partner rows
    )
    entries = _entries(spark, rows)
    schemata = _schemata(spark, pairs)
    cols = ["token", "field", "freq", "df", "compatible_pair_cost", "stopword"]
    joined = build_token_stats(entries, schemata, 10)
    folded = build_token_stats(entries, schemata, 10, schema_pairs=pairs)
    j = sorted(tuple(r) for r in joined.select(*cols).collect())
    f = sorted(tuple(r) for r in folded.select(*cols).collect())
    assert j == f
    # sanity: smith = 5*4/2 + 3*2/2 + 5*3 = 10+3+15 = 28 > 10 → stopword
    by_tok = {r[0]: r for r in f}
    assert by_tok["np:smith"][4] == 28 and by_tok["np:smith"][5] is True
    assert by_tok["np:acme"][4] == 6 and by_tok["np:acme"][5] is False


def test_folded_matching_cost_matches_join_path(spark):
    from nomenklatura_spark.operators.blocker import build_matching_token_stats

    pairs = [("Supplier", "Supplier"), ("Supplier", "Customer")]
    matching = _entries(
        spark, [("Supplier", f"s{i}", "np", "np:acme", 1) for i in range(3)]
    )
    indexed = _entries(
        spark,
        [("Supplier", f"s{i}", "np", "np:acme", 1) for i in range(4)]
        + [("Customer", f"c{i}", "np", "np:acme", 1) for i in range(5)]
        + [("Customer", "c9", "np", "np:only", 1)],
    )
    schemata = _schemata(spark, pairs)
    cols = ["token", "field", "freq", "df", "compatible_pair_cost", "stopword"]
    j = sorted(
        tuple(r)
        for r in build_matching_token_stats(matching, indexed, schemata, 10)
        .select(*cols)
        .collect()
    )
    f = sorted(
        tuple(r)
        for r in build_matching_token_stats(
            matching, indexed, schemata, 10, schema_pairs=pairs
        )
        .select(*cols)
        .collect()
    )
    assert j == f
    # acme: 3 matching suppliers × (4 indexed suppliers + 5 customers) = 27
    by_tok = {r[0]: r for r in f}
    assert by_tok["np:acme"][4] == 27 and by_tok["np:acme"][5] is True
