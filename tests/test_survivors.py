"""Survivor-selection semantics (dedup/survivors.select_survivors) on a
crafted pair graph; the corpus-level composition is oracle-checked by
tests/test_entry_contract.py (`dedup_survivors`)."""

from __future__ import annotations

from nomenklatura_spark.dedup.survivors import select_survivors


def test_one_survivor_per_component_and_untouched_docs_kept(spark):
    corpus = spark.createDataFrame(
        [(i,) for i in range(7)], "doc_id long"
    )
    # components: {0,1,2} via chain, {5,6}; 3 and 4 are in no pair
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (5, 6)], "lid long, rid long"
    )
    rows = {r.doc_id: r for r in select_survivors(corpus, pairs).collect()}
    assert len(rows) == 7
    for d in (0, 1, 2):
        assert rows[d].canonical_doc == 0
    assert rows[0].keep and not rows[1].keep and not rows[2].keep
    for d in (3, 4):
        assert rows[d].canonical_doc == d and rows[d].keep
    assert rows[5].keep and not rows[6].keep
    # exactly one survivor per component
    kept = [d for d, r in rows.items() if r.keep]
    assert sorted(kept) == [0, 3, 4, 5]


def _union_find_canonicals(n_docs, edges):
    """Reference implementation: min-id component label per doc."""
    parent = list(range(n_docs))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {d: find(d) for d in range(n_docs)}


def test_survivors_match_union_find_on_random_graphs(spark):
    import random

    for seed in (7, 23, 101):
        rng = random.Random(seed)
        n = 40
        edges = sorted(
            {
                tuple(sorted(rng.sample(range(n), 2)))
                for _ in range(rng.randint(5, 35))
            }
        )
        corpus = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
        pairs = spark.createDataFrame(edges, "lid long, rid long")
        got = {
            r.doc_id: (r.canonical_doc, r.keep)
            for r in select_survivors(corpus, pairs).collect()
        }
        want = _union_find_canonicals(n, edges)
        assert got == {d: (c, d == c) for d, c in want.items()}, f"seed {seed}"
