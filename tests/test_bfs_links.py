"""Landmark BFS distances and common-neighbor link prediction
(operators/graph.py): exact parity with driver-side Python references
on crafted and random graphs, the loud non-convergence contract, and
the hub-cap semantics."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Row

from nomenklatura_spark.operators.graph import bfs_distances, link_prediction


def _py_bfs(edges, seeds):
    """Driver-side BFS reference: exact min hop counts per seed."""
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
    out = {}
    for s in seeds:
        dist = {s: 0}
        frontier = [s]
        d = 0
        while frontier:
            d += 1
            nxt = []
            for u in frontier:
                for v in adj.get(u, ()):
                    if v not in dist:
                        dist[v] = d
                        nxt.append(v)
            frontier = nxt
        for v, dv in dist.items():
            out[(s, v)] = dv
    return out


def _edges_df(spark, edges):
    return spark.createDataFrame(
        [Row(src=a, dst=b) for a, b in edges], "src string, dst string"
    )


def _seeds_df(spark, seeds):
    return spark.createDataFrame([Row(seed=s) for s in seeds], "seed string")


# Cycle + branch + unreachable island: A->B->C->A, C->D, E->F (island).
CRAFTED = [
    ("A", "B"),
    ("B", "C"),
    ("C", "A"),
    ("C", "D"),
    ("E", "F"),
    ("A", "B"),  # duplicate must collapse
]


def test_bfs_crafted_cycle_and_island(spark):
    got = {
        (r["seed"], r["node"]): r["dist"]
        for r in bfs_distances(
            _edges_df(spark, CRAFTED), _seeds_df(spark, ["A", "E"])
        ).collect()
    }
    want = _py_bfs(CRAFTED, ["A", "E"])
    assert got == want
    # the cycle is traversed exactly once: C is 2 hops, A stays 0
    assert got[("A", "C")] == 2 and got[("A", "A")] == 0
    # the island is invisible from A and vice versa
    assert ("A", "E") not in got and ("E", "D") not in got


def test_bfs_multi_seed_shares_rounds(spark):
    # overlapping reachable sets: each (seed, node) keyed independently
    got = {
        (r["seed"], r["node"]): r["dist"]
        for r in bfs_distances(
            _edges_df(spark, CRAFTED), _seeds_df(spark, ["A", "B"])
        ).collect()
    }
    assert got[("A", "D")] == 3 and got[("B", "D")] == 2


def test_bfs_random_parity(spark):
    rng = random.Random(4207)
    nodes = [f"n{i}" for i in range(40)]
    edges = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(160)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    seeds = nodes[:5]
    got = {
        (r["seed"], r["node"]): r["dist"]
        for r in bfs_distances(
            _edges_df(spark, edges), _seeds_df(spark, seeds)
        ).collect()
    }
    assert got == _py_bfs(edges, seeds)


def test_bfs_non_convergence_raises(spark):
    # a 5-chain cannot finish in 2 rounds: loud contract, no silent
    # truncation
    chain = [(f"c{i}", f"c{i + 1}") for i in range(5)]
    with pytest.raises(ValueError, match="max_rounds"):
        bfs_distances(
            _edges_df(spark, chain),
            _seeds_df(spark, ["c0"]),
            max_rounds=2,
        )


def _py_links(edges, min_common=1, cap=None):
    """Driver-side common-neighbor reference (undirected, canonical)."""
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    deg = {v: len(ns) for v, ns in adj.items()}
    counts = {}
    for w, ns in adj.items():
        if cap is not None and deg[w] > cap:
            continue
        ns = sorted(ns)
        for i, a in enumerate(ns):
            for b in ns[i + 1 :]:
                counts[(a, b)] = counts.get((a, b), 0) + 1
    out = {}
    for (a, b), cn in counts.items():
        if (a, b) in und or cn < min_common:
            continue
        out[(a, b)] = (
            cn,
            deg[a],
            deg[b],
            round(cn / (deg[a] + deg[b] - cn), 4),
        )
    return out


# Two stars sharing leaves (h1, h2 both adjacent to x, y, z) plus a
# direct edge elsewhere: h1-h2 share 3 neighbors and are NOT adjacent.
STARS = [
    ("h1", "x"),
    ("h1", "y"),
    ("h1", "z"),
    ("h2", "x"),
    ("h2", "y"),
    ("h2", "z"),
    ("x", "y"),  # existing edge: must be excluded from predictions
]


def test_links_crafted_stars(spark):
    got = {
        (r["a"], r["b"]): (
            r["common"],
            r["deg_a"],
            r["deg_b"],
            float(r["jaccard"]),
        )
        for r in link_prediction(
            _edges_df(spark, STARS), min_common=2
        ).collect()
    }
    assert got == _py_links(STARS, min_common=2)
    # the star centers are the top missing link: 3 shared of 3+3
    assert got[("h1", "h2")] == (3, 3, 3, 1.0)
    # x-y is an existing edge: never predicted despite sharing h1, h2
    assert ("x", "y") not in got


def test_links_direction_and_multiplicity_collapse(spark):
    doubled = STARS + [(b, a) for a, b in STARS]
    got = {
        (r["a"], r["b"]): r["common"]
        for r in link_prediction(
            _edges_df(spark, doubled), min_common=2
        ).collect()
    }
    assert got == {
        k: v[0] for k, v in _py_links(STARS, min_common=2).items()
    }


def test_links_hub_cap_excludes_celebrity_centers(spark):
    # hub adjacent to everyone: capping it removes its wedges only
    hub = [("hub", f"v{i}") for i in range(6)] + [
        ("v0", "v1"),
        ("v2", "v1"),
    ]
    for cap in (None, 5):
        got = {
            (r["a"], r["b"]): (
                r["common"],
                r["deg_a"],
                r["deg_b"],
                float(r["jaccard"]),
            )
            for r in link_prediction(
                _edges_df(spark, hub), min_common=1, max_center_degree=cap
            ).collect()
        }
        assert got == _py_links(hub, min_common=1, cap=cap)
    # with the hub capped, v0-v2 keeps its v1-centered wedge only
    assert _py_links(hub, min_common=1, cap=5)[("v0", "v2")][0] == 1
    assert _py_links(hub, min_common=1)[("v0", "v2")][0] == 2


def test_links_random_parity(spark):
    rng = random.Random(4208)
    nodes = [f"p{i}" for i in range(30)]
    edges = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(120)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    got = {
        (r["a"], r["b"]): (
            r["common"],
            r["deg_a"],
            r["deg_b"],
            float(r["jaccard"]),
        )
        for r in link_prediction(
            _edges_df(spark, edges), min_common=2
        ).collect()
    }
    assert got == _py_links(edges, min_common=2)


def test_harmonic_centrality_crafted(spark):
    """H(seed) = sum 1/dist on the exact grid; isolated seeds emit
    (0, 0.0); the cycle contributes each node once at min dist."""
    from nomenklatura_spark.operators.graph import harmonic_centrality

    got = {
        r["seed"]: (r["n_reached"], r["harmonic"])
        for r in harmonic_centrality(
            _edges_df(spark, CRAFTED), _seeds_df(spark, ["A", "F", "E"])
        ).collect()
    }
    # A reaches B(1), C(2), D(3): H = 1 + 1/2 + 1/3 (grid-truncated)
    want_a = (10**12 + 10**12 // 2 + 10**12 // 3) / 1e12
    assert got["A"] == (3, round(want_a, 6))
    assert got["E"] == (1, 1.0)  # E -> F only
    assert got["F"] == (0, 0.0)  # F has no out-edges
