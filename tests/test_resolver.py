"""Resolver semantics tests — mirror the reference's resolver suite
(tests/test_resolver.py there): transitivity, canonical choice, verbs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nomenklatura_spark.resolver.edges import (
    EDGE_COLUMNS,
    decide_bulk,
    explode_cluster,
    get_judgements,
    live,
    normalize_pairs,
    prune_suggestions,
    rename_node,
    resolver_mapping,
    suggest_bulk,
)

TS = "2024-06-01T00:00:00"
TS2 = "2024-06-02T00:00:00"

EDGE_DDL = (
    "target string, source string, judgement string, score double,"
    " user string, created_at string, deleted_at string"
)


def _edges(spark, rows):
    return spark.createDataFrame(rows, EDGE_DDL)


def _empty(spark):
    return spark.createDataFrame([], EDGE_DDL)


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "left string, right string")


def test_pair_ordering_weights(spark):
    # QID > NK- > plain (identifier.py:16-29)
    p = normalize_pairs(_pairs(spark, [("e1", "Q42"), ("NK-x", "e1"), ("b", "a")]))
    rows = {(r["target"], r["source"]) for r in p.collect()}
    assert rows == {("Q42", "e1"), ("NK-x", "e1"), ("b", "a")}


def test_transitive_components_and_canonical(spark):
    edges = _edges(
        spark,
        [
            ("e2", "e1", "positive", None, "t", TS, None),
            ("e3", "e2", "positive", None, "t", TS, None),
            ("Q7", "e9", "positive", None, "t", TS, None),
        ],
    )
    mapping = {r["node"]: r["canonical_id"] for r in resolver_mapping(edges).collect()}
    # e1-e2-e3 transitively one cluster with a minted deterministic NK- id
    assert mapping["e1"] == mapping["e2"] == mapping["e3"]
    assert mapping["e1"].startswith("NK-")
    # QID outranks everything: no minting needed
    assert mapping["e9"] == "Q7"
    # determinism: recompute yields identical ids
    mapping2 = {r["node"]: r["canonical_id"] for r in resolver_mapping(edges).collect()}
    assert mapping == mapping2


def test_decide_retires_previous_edge(spark):
    edges = _edges(spark, [("e2", "e1", "no_judgement", 0.9, "xref", TS, None)])
    decisions = spark.createDataFrame(
        [("e2", "e1", "positive", None, "alice")],
        "target string, source string, judgement string, score double, user string",
    )
    out = decide_bulk(edges, decisions, TS2)
    rows = out.orderBy("created_at").collect()
    assert len(rows) == 2
    old, new = rows
    assert old["deleted_at"] == TS2 and old["judgement"] == "no_judgement"
    assert new["judgement"] == "positive" and new["deleted_at"] is None


def test_suggest_keeps_max_score_and_respects_judged(spark):
    edges = _edges(
        spark,
        [
            ("e2", "e1", "no_judgement", 0.5, "xref", TS, None),
            ("e4", "e3", "negative", None, "alice", TS, None),
        ],
    )
    suggestions = spark.createDataFrame(
        [("e2", "e1", 0.9, "xref"), ("e4", "e3", 0.99, "xref")],
        "target string, source string, score double, user string",
    )
    out = suggest_bulk(edges, suggestions, TS2)
    lv = live(out)
    s12 = lv.where((F.col("target") == "e2") & (F.col("judgement") == "no_judgement")).collect()
    assert len(s12) == 1 and s12[0]["score"] == 0.9
    # judged pair must NOT receive a suggestion (resolver.py:329-351)
    s34 = lv.where(F.col("target") == "e4").collect()
    assert len(s34) == 1 and s34[0]["judgement"] == "negative"


def test_explode_dissolves_cluster(spark):
    edges = _edges(
        spark,
        [
            ("e2", "e1", "positive", None, "t", TS, None),
            ("e3", "e2", "positive", None, "t", TS, None),
            ("e9", "e8", "positive", None, "t", TS, None),
        ],
    )
    mapping = resolver_mapping(edges)
    out = explode_cluster(edges, mapping, "e2", TS2)
    lv = live(out)
    assert lv.count() == 1  # only the e8-e9 edge survives
    assert lv.collect()[0]["target"] == "e9"


def test_prune_drops_suggestions(spark):
    edges = _edges(
        spark,
        [
            ("e2", "e1", "no_judgement", 0.7, "xref", TS, None),
            ("e4", "e3", "positive", None, "t", TS, None),
        ],
    )
    lv = live(prune_suggestions(edges, TS2))
    assert lv.count() == 1 and lv.collect()[0]["judgement"] == "positive"


def test_rename_node_rewrites_edges(spark):
    edges = _edges(spark, [("e2", "e1", "positive", None, "t", TS, None)])
    out = rename_node(edges, "e1", "Q99")
    row = live(out).collect()[0]
    # re-normalized: QID becomes the target
    assert (row["target"], row["source"]) == ("Q99", "e2")


def test_get_judgements_transitive(spark):
    edges = _edges(
        spark,
        [
            ("e2", "e1", "positive", None, "t", TS, None),
            ("e3", "e2", "positive", None, "t", TS, None),
            ("e5", "e4", "negative", None, "t", TS, None),
        ],
    )
    pairs = _pairs(spark, [("e1", "e3"), ("e4", "e5"), ("e1", "e8")])
    res = {
        (r["target"], r["source"]): r["judgement"]
        for r in get_judgements(edges, pairs).collect()
    }
    assert res[("e3", "e1")] == "positive"  # transitive via cluster
    assert res[("e5", "e4")] == "negative"
    assert res[("e8", "e1")] == "no_judgement"


def test_suggest_then_decide_then_mapping_roundtrip(spark):
    """End-to-end resolver lifecycle: suggest → decide → components."""
    edges = _empty(spark)
    suggestions = spark.createDataFrame(
        [("b", "a", 0.95, "xref")],
        "target string, source string, score double, user string",
    )
    edges = suggest_bulk(edges, suggestions, TS)
    decisions = spark.createDataFrame(
        [("b", "a", "positive", None, "alice")],
        "target string, source string, judgement string, score double, user string",
    )
    edges = decide_bulk(edges, decisions, TS2)
    mapping = {r["node"]: r["canonical_id"] for r in resolver_mapping(edges).collect()}
    assert mapping["a"] == mapping["b"]
    assert set(mapping) == {"a", "b"}


def test_components_match_union_find_on_random_graphs(spark):
    """Label propagation must agree with a driver-side union-find on
    seeded random graphs (chains, cliques, isolated pairs mixed)."""
    import random

    from nomenklatura_spark.resolver.components import connected_components

    for seed in (7, 23, 99):
        rnd = random.Random(seed)
        nodes = [f"n{i:03d}" for i in range(60)]
        edges = [
            (rnd.choice(nodes), rnd.choice(nodes)) for _ in range(45)
        ]
        edges = [(a, b) for a, b in edges if a != b]

        parent = {n: n for n in nodes}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        expected = {
            n: find(n)
            for n in nodes
            if any(n in e for e in edges)
        }

        df = spark.createDataFrame(edges, "source string, target string")
        got = {
            r["node"]: r["component"]
            for r in connected_components(df).collect()
        }
        assert got == expected, f"seed {seed}"


def test_merge_fold_contraction_equals_scratch(spark):
    """The merge case of fold_components_incremental (r11: batch pairs
    contracted through the previous mapping, CC on the quotient graph
    only) must stay bit-identical to a from-scratch connected_components
    over the full pair log — including batches that merge existing
    components across the mapping, introduce brand-new nodes, and add
    pairs entirely inside one component (no-op relabels)."""
    import random

    from nomenklatura_spark.resolver.components import (
        connected_components,
        fold_components_incremental,
    )

    for seed in (5, 41):
        rnd = random.Random(seed)
        nodes = [f"n{i:03d}" for i in range(50)]
        batches = []
        for b in range(3):
            # later batches reuse earlier nodes (merges + intra-component
            # no-ops) and mint unseen ones (new-endpoint path)
            pool = nodes[: 20 + 15 * b]
            batch = [
                (rnd.choice(pool), rnd.choice(pool)) for _ in range(12)
            ]
            batches.append([(a, c) for a, c in batch if a != c])

        mapping = None
        log = []
        for batch in batches:
            log.extend(batch)
            bdf = spark.createDataFrame(batch, "lid string, rid string")
            if mapping is None:
                mapping = connected_components(bdf, src="lid", dst="rid")
            else:
                mapping = fold_components_incremental(mapping, bdf)
            mapping = mapping.localCheckpoint(eager=True)
            scratch = connected_components(
                spark.createDataFrame(log, "lid string, rid string"),
                src="lid",
                dst="rid",
            )
            got = {r["node"]: r["component"] for r in mapping.collect()}
            want = {r["node"]: r["component"] for r in scratch.collect()}
            assert got == want, f"seed {seed}"
            # the fold must emit each node exactly once (a mapping, not
            # a multiset)
            assert len(mapping.collect()) == len(got), f"seed {seed}"


def test_get_candidates_excludes_decided_and_ranks(spark):
    from nomenklatura_spark.resolver.edges import get_candidates

    edges = _edges(
        spark,
        [
            # suggestions with scores
            ("b1", "a1", "no_judgement", 0.9, "x", TS, None),
            ("b2", "a2", "no_judgement", 0.7, "x", TS, None),
            ("b3", "a3", "no_judgement", None, "x", TS, None),
            ("b4", "a4", "no_judgement", 0.8, "x", TS, None),
            # decided elsewhere: must knock the (b4, a4) suggestion out
            ("b4", "a4", "positive", None, "x", TS2, None),
            # soft-deleted suggestion must not surface
            ("b5", "a5", "no_judgement", 0.99, "x", TS, TS2),
        ],
    )
    got = [(r["target"], r["source"]) for r in get_candidates(edges).collect()]
    # ordered by score desc nulls last; decided/deleted pairs gone
    assert got == [("b1", "a1"), ("b2", "a2"), ("b3", "a3")]
    assert [
        (r["target"], r["source"])
        for r in get_candidates(edges, limit=1).collect()
    ] == [("b1", "a1")]


def test_carry_first_seen_pure(spark):
    from nomenklatura_spark.sources.versioned import carry_first_seen

    ddl = "id string, value string, first_seen string"
    prev = spark.createDataFrame([("s1", "v1", "2024-01-01")], ddl)
    incoming = spark.createDataFrame(
        [("s1", "v1", "2024-02-01"), ("s2", "v2", "2024-02-01")], ddl
    )
    out = {r["id"]: r["first_seen"] for r in carry_first_seen(incoming, prev).collect()}
    assert out == {"s1": "2024-01-01", "s2": "2024-02-01"}
    # no previous snapshot -> unchanged
    assert carry_first_seen(incoming, None) is incoming
