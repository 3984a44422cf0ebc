"""Fixed-point PageRank (operators/graph.py): exact parity with a pure
Python fixed-point reference on a crafted graph with dangling nodes,
partition invariance, and the ranking sanity property."""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from nomenklatura_spark.operators.graph import PR_SCALE, pagerank


def _reference_pagerank(edges, n_iter=5, scale=PR_SCALE):
    """Driver-side replay of the exact integer recurrence."""
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    out = {}
    for a, b in set(edges):
        out.setdefault(a, []).append(b)
    n = len(nodes)
    base = scale * 3 // 20
    rank = {v: scale for v in nodes}
    for _ in range(n_iter):
        inflow = {v: 0 for v in nodes}
        for a, dsts in out.items():
            c = rank[a] // len(dsts)
            for b in dsts:
                inflow[b] += c
        ds = sum(rank[v] for v in nodes if v not in out)
        rank = {
            v: base + (17 * (inflow[v] + ds // n)) // 20 for v in nodes
        }
    return rank


# Diamond with a dangling sink E and a chain: exercises dangling
# redistribution, multi-in-degree, and zero-in-degree nodes.
EDGES = [
    ("A", "B"),
    ("A", "C"),
    ("B", "D"),
    ("C", "D"),
    ("D", "E"),  # E is dangling (no out-edges)
    ("F", "D"),  # F has no in-edges
    ("A", "B"),  # duplicate edge must collapse
]


def test_pagerank_matches_reference_with_dangling(spark):
    df = spark.createDataFrame([Row(src=a, dst=b) for a, b in EDGES])
    got = {r["node"]: r["rank_q"] for r in pagerank(df).collect()}
    want = _reference_pagerank(EDGES)
    assert got == want
    # high in-degree hub outranks leaves; teleport floor for sources
    assert got["D"] > got["B"] > got["F"]


def test_pagerank_partition_invariant(spark):
    df = spark.createDataFrame([Row(src=a, dst=b) for a, b in EDGES])
    one = {r["node"]: r["rank_q"] for r in pagerank(df.coalesce(1)).collect()}
    many = {
        r["node"]: r["rank_q"]
        for r in pagerank(df.repartition(16, "dst")).collect()
    }
    assert one == many


def test_pagerank_conserves_mass_without_dangling(spark):
    """On a symmetric graph every node has out-edges; total mass can only
    shrink by the per-node floor truncations (< n_nodes units per
    iteration per division), never grow."""
    sym = EDGES + [(b, a) for a, b in EDGES]
    df = spark.createDataFrame([Row(src=a, dst=b) for a, b in sym])
    rows = pagerank(df, n_iter=5).collect()
    total = sum(r["rank_q"] for r in rows)
    n = len(rows)
    assert total <= n * PR_SCALE
    assert total >= n * PR_SCALE - 5 * (2 * n + 2)
    for r in rows:
        assert abs(r["rank"] - r["rank_q"] / PR_SCALE) < 1e-6


def test_pagerank_edge_shapes(spark):
    """Self-loops, a star hub, and disconnected components all follow
    the exact reference recurrence."""
    from pyspark.sql import Row

    edges = [
        ("L", "L"),              # self-loop
        ("s1", "hub"), ("s2", "hub"), ("s3", "hub"), ("hub", "s1"),
        ("i1", "i2"), ("i2", "i1"),  # separate 2-cycle
    ]
    df = spark.createDataFrame([Row(src=a, dst=b) for a, b in edges])
    got = {r["node"]: r["rank_q"] for r in pagerank(df).collect()}
    want = _reference_pagerank(edges)
    assert got == want
    assert got["hub"] == max(got.values())


def test_pagerank_weighted_split(spark):
    """Weighted form: a source splits rank proportionally to integer
    edge weights ((rank·w) DIV sum_w).  Hand-computed one iteration:
    A→B w=3, A→C w=1; B and C dangle."""
    from pyspark.sql import Row

    df = spark.createDataFrame(
        [Row(src="A", dst="B", w=3), Row(src="A", dst="C", w=1)]
    )
    got = {
        r["node"]: r["rank_q"]
        for r in pagerank(df, n_iter=1, weight="w").collect()
    }
    s, base = PR_SCALE, (PR_SCALE * 3) // 20
    share = (2 * s) // 3  # dangling mass from B and C over N=3
    assert got["A"] == base + (17 * share) // 20
    assert got["B"] == base + (17 * ((s * 3) // 4 + share)) // 20
    assert got["C"] == base + (17 * (s // 4 + share)) // 20
    # weight ignored => equal split: B and C tie
    eq = {
        r["node"]: r["rank_q"] for r in pagerank(df, n_iter=1).collect()
    }
    assert eq["B"] == eq["C"]


def test_personalized_pagerank_proximity(spark):
    """PPR with seeds concentrates rank near the seed set, returns
    dangling mass to the seeds, and ranks by graph proximity."""
    from pyspark.sql import Row

    from nomenklatura_spark.operators.graph import personalized_pagerank

    # chain S -> A -> B -> sink, plus S <-> A back-edge; sink dangles
    edges = [("S", "A"), ("A", "S"), ("A", "B"), ("B", "sink")]
    df = spark.createDataFrame([Row(src=a, dst=b) for a, b in edges])
    seeds = spark.createDataFrame([Row(node="S")])
    got = {
        r["node"]: (r["rank_q"], r["is_seed"])
        for r in personalized_pagerank(df, seeds).collect()
    }
    ranks = {k: v[0] for k, v in got.items()}
    assert got["S"][1] and not got["A"][1]
    # proximity order: seed > 1-hop > 2-hop > dangling sink
    assert ranks["S"] > ranks["A"] > ranks["B"] > ranks["sink"]
    # a seed absent from the graph raises
    import pytest as _pytest

    with _pytest.raises(ValueError):
        personalized_pagerank(
            df, spark.createDataFrame([Row(node="nope")])
        ).collect()


def test_personalized_pagerank_matches_reference(spark):
    """Exact parity with a driver-side replay of the seeded recurrence
    on a graph with dangling mass."""
    from pyspark.sql import Row

    from nomenklatura_spark.operators.graph import (
        PR_SCALE,
        personalized_pagerank,
    )

    edges = [("S", "A"), ("A", "S"), ("A", "B"), ("B", "sink")]
    seeds = {"S"}
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    out = {}
    for a, b in set(edges):
        out.setdefault(a, []).append(b)
    n, k = len(nodes), len(seeds)
    seed_base = ((PR_SCALE * n * 3) // 20) // k
    rank = {v: PR_SCALE for v in nodes}
    for _ in range(5):
        inflow = {v: 0 for v in nodes}
        for a, dsts in out.items():
            c = rank[a] // len(dsts)
            for b in dsts:
                inflow[b] += c
        ds = sum(rank[v] for v in nodes if v not in out)
        rank = {
            v: (seed_base if v in seeds else 0)
            + (17 * (inflow[v] + (ds // k if v in seeds else 0))) // 20
            for v in nodes
        }
    df = spark.createDataFrame([Row(src=a, dst=b) for a, b in edges])
    sdf = spark.createDataFrame([Row(node="S")])
    got = {
        r["node"]: r["rank_q"]
        for r in personalized_pagerank(df, sdf).collect()
    }
    assert got == rank


# ---------------------------------------------------------------------------
# triangle counting


def _tri_reference(edges):
    """Brute-force per-node triangle counts over undirected edges."""
    und = set()
    for a, b in edges:
        a, b = str(a), str(b)
        if a != b:
            und.add((min(a, b), max(a, b)))
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    # per node: triangles = edges among its neighbors
    tri = {}
    for v, nb in adj.items():
        t = 0
        for x in nb:
            for y in nb:
                if x < y and (x, y) in und:
                    t += 1
        tri[v] = t
    return {
        v: (len(adj[v]), tri[v]) for v in adj
    }


def test_triangles_on_crafted_graph(spark):
    from nomenklatura_spark.operators.graph import triangle_counts

    # K4 on {a,b,c,d} (4 triangles, every node in 3) plus a pendant 'e'
    # and an open wedge f-g-h (no triangle)
    edges = [
        ("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
        ("c", "d"), ("d", "e"), ("f", "g"), ("g", "h"),
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: (r["degree"], r["triangles"], r["clustering"])
           for r in triangle_counts(df).collect()}
    ref = _tri_reference(edges)
    assert {v: (d, t) for v, (d, t, _) in got.items()} == ref
    assert got["a"] == (3, 3, 1.0)
    assert got["d"] == (4, 3, 0.5)
    assert got["e"] == (1, 0, 0.0)
    assert got["g"] == (2, 0, 0.0)


def test_triangles_normalize_direction_and_multiplicity(spark):
    from nomenklatura_spark.operators.graph import triangle_counts

    # the same triangle fed as mixed directions, duplicates, self-loops
    messy = [
        ("a", "b"), ("b", "a"), ("b", "c"), ("c", "a"), ("a", "c"),
        ("a", "a"), ("b", "c"),
    ]
    clean = [("a", "b"), ("b", "c"), ("a", "c")]
    got_m = sorted(
        tuple(r)
        for r in triangle_counts(
            spark.createDataFrame(messy, "src string, dst string")
        ).collect()
    )
    got_c = sorted(
        tuple(r)
        for r in triangle_counts(
            spark.createDataFrame(clean, "src string, dst string")
        ).collect()
    )
    assert got_m == got_c
    assert all(t == 1 and c == 1.0 for _, _, t, c in got_m)


def test_triangles_partition_invariant_and_random_parity(spark):
    import random

    from nomenklatura_spark.operators.graph import triangle_counts

    rnd = random.Random(7)
    edges = list({(f"n{rnd.randrange(30)}", f"n{rnd.randrange(30)}")
                  for _ in range(160)})
    df = spark.createDataFrame(edges, "src string, dst string")
    base = sorted(tuple(r) for r in triangle_counts(df).collect())
    ref = _tri_reference(edges)
    assert {v: (d, t) for v, d, t, _ in base} == ref
    assert base == sorted(
        tuple(r) for r in triangle_counts(df.repartition(13)).collect()
    )


# ---------------------------------------------------------------------------
# k-core peeling


def test_kcore_peels_tail_progressively(spark):
    from nomenklatura_spark.operators.graph import kcore_peel

    # triangle {a,b,c} (2-core) with a chain c-d-e hanging off it:
    # at k=2, e (deg 1) peels in round 1, then d (deg drops to 1) in
    # round 2, and the triangle survives.
    edges = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("d", "e")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r for r in kcore_peel(df, k=2, n_rounds=5).collect()}
    assert got["e"]["peel_round"] == 1 and not got["e"]["in_core"]
    assert got["d"]["peel_round"] == 2 and not got["d"]["in_core"]
    for v in ("a", "b", "c"):
        assert got[v]["in_core"] and got[v]["peel_round"] == 0
    # initial degrees are reported, not residual ones
    assert got["c"]["degree"] == 3 and got["d"]["degree"] == 2


def test_kcore_k_above_max_degree_peels_everything(spark):
    from nomenklatura_spark.operators.graph import kcore_peel

    df = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c")], "src string, dst string"
    )
    got = kcore_peel(df, k=10, n_rounds=3).collect()
    assert all(r["peel_round"] == 1 and not r["in_core"] for r in got)


def test_kcore_bounded_rounds_report_unfinished_cascade(spark):
    from nomenklatura_spark.operators.graph import kcore_peel

    # a 6-node path at k=2 peels from both ends, one layer per round;
    # with only 1 round, just the endpoints are gone
    path = [(f"n{i}", f"n{i+1}") for i in range(5)]
    df = spark.createDataFrame(path, "src string, dst string")
    got = {r["node"]: r["peel_round"]
           for r in kcore_peel(df, k=2, n_rounds=1).collect()}
    assert got["n0"] == 1 and got["n5"] == 1
    assert all(got[f"n{i}"] == 0 for i in (1, 2, 3, 4))
    # with enough rounds the whole path dissolves layer by layer
    full = {r["node"]: r["peel_round"]
            for r in kcore_peel(df, k=2, n_rounds=5).collect()}
    assert full == {"n0": 1, "n5": 1, "n1": 2, "n4": 2, "n2": 3, "n3": 3}


def test_graph_diagnostics_on_er_candidate_graph(spark, sf_dir):
    """The ER story end-to-end: the blocker's candidate-pair relation IS
    a graph; triangles/clustering and k-core run directly on it and
    agree with each other about density."""
    from nomenklatura_spark.operators.graph import kcore_peel, triangle_counts
    from nomenklatura_spark.plans.queries import QUERIES

    pairs = QUERIES["blocker_pairs"](spark, sf_dir).select(
        F.col("lid").alias("src"), F.col("rid").alias("dst")
    )
    tri = triangle_counts(pairs)
    core = kcore_peel(pairs, k=2, n_rounds=3)
    t = {r["node"]: r for r in tri.collect()}
    c = {r["node"]: r for r in core.collect()}
    assert set(t) == set(c) and len(t) > 0
    # a node inside any triangle has degree >= 2 twice over: it cannot
    # peel in round 1 of the 2-core
    for node, row in t.items():
        if row["triangles"] > 0:
            assert c[node]["peel_round"] != 1
    # initial degrees agree between the two operators
    assert all(t[n]["degree"] == c[n]["degree"] for n in t)


def test_kcore_matches_reference_on_random_graphs(spark):
    """Fuzz against a driver-side synchronous peeler (same bounded-round
    semantics) on random graphs."""
    import random

    from nomenklatura_spark.operators.graph import kcore_peel

    def reference(edges, k, rounds):
        adj = {}
        for a, b in edges:
            if a != b:
                adj.setdefault(a, set()).add(b)
                adj.setdefault(b, set()).add(a)
        peel = {v: 0 for v in adj}
        alive = set(adj)
        for t in range(1, rounds + 1):
            dead = {v for v in alive if len(adj[v] & alive) < k}
            for v in dead:
                peel[v] = t
            alive -= dead
        return peel

    for seed in (2, 13, 41):
        rnd = random.Random(seed)
        edges = list({(f"n{rnd.randrange(40)}", f"n{rnd.randrange(40)}")
                      for _ in range(150)})
        edges = [(a, b) for a, b in edges if a != b]
        df = spark.createDataFrame(edges, "src string, dst string")
        k = rnd.choice([2, 3, 4])
        got = {r["node"]: r["peel_round"]
               for r in kcore_peel(df, k=k, n_rounds=4).collect()}
        assert got == reference(edges, k, 4), (seed, k)


# ---------------------------------------------------------------------------
# label propagation


def test_label_prop_competing_seeds(spark):
    from nomenklatura_spark.operators.graph import label_propagation

    # F--f1--m--v1--V : one flagged seed, one vetted seed; m sits between
    # two labeled neighbors (tie -> lexicographically smaller label)
    edges = [("F", "f1"), ("f1", "m"), ("m", "v1"), ("v1", "V"), ("x", "y")]
    seeds = [("F", "flagged"), ("V", "vetted")]
    e = spark.createDataFrame(edges, "src string, dst string")
    s = spark.createDataFrame(seeds, "node string, label string")
    out = {
        r["node"]: r for r in label_propagation(e, s, n_rounds=2).collect()
    }
    assert out["F"]["is_seed"] and out["F"]["label"] == "flagged"
    assert out["F"]["votes"] == 0  # seed labels are inputs, not votes
    assert out["f1"]["label"] == "flagged" and not out["f1"]["is_seed"]
    assert out["v1"]["label"] == "vetted"
    # m's neighbors carry one flagged + one vetted vote -> tie -> label asc
    assert out["m"]["label"] == "flagged" and out["m"]["votes"] == 1
    # the disconnected component never receives a label
    assert out["x"]["label"] == "(none)" and out["x"]["votes"] == 0
    assert out["y"]["label"] == "(none)"
    # one more round: v1 now ties between V (vetted) and m (flagged
    # since round 2) and the ascending tie-break flips it — synchronous
    # LP tie churn is part of the pinned semantics, not a bug
    out3 = {
        r["node"]: r["label"]
        for r in label_propagation(e, s, n_rounds=3).collect()
    }
    assert out3["v1"] == "flagged"


def test_label_prop_majority_and_off_graph_seeds(spark):
    from nomenklatura_spark.operators.graph import label_propagation

    # hub with 3 flagged + 2 vetted neighbors -> majority flagged with 3
    # votes; a seed naming a node absent from the graph is ignored
    edges = (
        [(f"f{i}", "hub") for i in range(3)]
        + [(f"v{i}", "hub") for i in range(2)]
    )
    seeds = (
        [(f"f{i}", "flagged") for i in range(3)]
        + [(f"v{i}", "vetted") for i in range(2)]
        + [("ghost", "flagged")]
    )
    out = {
        r["node"]: r
        for r in label_propagation(
            spark.createDataFrame(edges, "src string, dst string"),
            spark.createDataFrame(seeds, "node string, label string"),
            n_rounds=2,
        ).collect()
    }
    assert "ghost" not in out
    assert out["hub"]["label"] == "flagged" and out["hub"]["votes"] == 3


def test_label_prop_spreads_outward_by_round(spark):
    from nomenklatura_spark.operators.graph import label_propagation

    chain = [(f"n{i}", f"n{i+1}") for i in range(5)]
    seeds = [("n0", "risk")]
    e = spark.createDataFrame(chain, "src string, dst string")
    s = spark.createDataFrame(seeds, "node string, label string")
    for rounds, labeled in ((1, {"n0", "n1"}), (3, {"n0", "n1", "n2", "n3"})):
        got = {
            r["node"]
            for r in label_propagation(e, s, n_rounds=rounds).collect()
            if r["label"] != "(none)"
        }
        assert got == labeled, rounds


def test_label_prop_seed_duplicates_and_conflicts(spark):
    """Duplicate seed rows must not double-count votes; conflicting
    labels for one seed node resolve to the ascending label."""
    from nomenklatura_spark.operators.graph import label_propagation

    edges = [("A", "m"), ("B", "m")]
    seeds = [
        ("A", "vetted"), ("A", "vetted"),  # duplicate rows
        ("B", "flagged"), ("B", "vetted"),  # conflict -> 'flagged'
    ]
    out = {
        r["node"]: r
        for r in label_propagation(
            spark.createDataFrame(edges, "src string, dst string"),
            spark.createDataFrame(seeds, "node string, label string"),
            n_rounds=1,
        ).collect()
    }
    assert len(out) == 3  # one row per node, no duplicates
    assert out["B"]["label"] == "flagged"
    # m sees ONE vetted vote (A) and ONE flagged vote (B): tie -> flagged
    assert out["m"]["label"] == "flagged" and out["m"]["votes"] == 1


def test_pagerank_weighted_large_weights_no_overflow(spark):
    """Link-count-sized weights (~1e10) used to overflow the BIGINT
    product rank_q * w mid-iteration (ANSI error); the DECIMAL(38,0)
    product keeps the split exact for any representable weight.  The
    quotient must equal the proportional split computed in Python's
    unbounded ints."""
    from pyspark.sql import Row

    w_b, w_c = 30_000_000_000, 10_000_000_000  # product ~3e28 >> 2^63
    df = spark.createDataFrame(
        [Row(src="A", dst="B", w=w_b), Row(src="A", dst="C", w=w_c)]
    )
    got = {
        r["node"]: r["rank_q"]
        for r in pagerank(df, n_iter=1, weight="w").collect()
    }
    s, base = PR_SCALE, (PR_SCALE * 3) // 20
    share = (2 * s) // 3
    tot = w_b + w_c
    assert got["B"] == base + (17 * ((s * w_b) // tot + share)) // 20
    assert got["C"] == base + (17 * ((s * w_c) // tot + share)) // 20
    # small weights: the decimal path agrees with the all-BIGINT split
    small = spark.createDataFrame(
        [Row(src="A", dst="B", w=3), Row(src="A", dst="C", w=1)]
    )
    got_small = {
        r["node"]: r["rank_q"]
        for r in pagerank(small, n_iter=1, weight="w").collect()
    }
    assert got_small["B"] == base + (17 * ((s * 3) // 4 + share)) // 20
    assert got_small["C"] == base + (17 * ((s * 1) // 4 + share)) // 20


def test_pagerank_scale_overflow_contract(spark):
    """The dampening step multiplies total mass (n_nodes * scale) by
    damp_num in BIGINT; a scale big enough to overflow must raise a
    clear ValueError up front, not fail mid-iteration."""
    import pytest
    from pyspark.sql import Row

    df = spark.createDataFrame([Row(src="A", dst="B"), Row(src="B", dst="C")])
    with pytest.raises(ValueError, match="smaller scale"):
        pagerank(df, n_iter=1, scale=2**61)


def test_personalized_pagerank_scale_overflow_contract(spark):
    """The seeded dampening term adds ds DIV n_seeds on top of inflow —
    up to ~2x the uniform bound with one seed; the same up-front
    ValueError contract applies.  A scale that pagerank's uniform bound
    would BARELY accept must still be rejected here when the seeded
    term pushes it over, and a safe scale must pass."""
    import pytest
    from pyspark.sql import Row

    from nomenklatura_spark.operators.graph import personalized_pagerank

    df = spark.createDataFrame([Row(src="A", dst="B"), Row(src="B", dst="C")])
    seeds = spark.createDataFrame([Row(node="A")])
    with pytest.raises(ValueError, match="smaller scale"):
        personalized_pagerank(df, seeds, n_iter=1, scale=2**61)
    # single seed, 3 nodes: uniform bound allows scale < 2^63/(d*4) but
    # the seeded bound needs scale*(3 + 3/1)*d < 2^63
    uniform_ok = 2**63 // (17 * 4) - 1
    with pytest.raises(ValueError, match="smaller scale"):
        personalized_pagerank(df, seeds, n_iter=1, scale=uniform_ok)
    out = personalized_pagerank(df, seeds, n_iter=1, scale=10**9)
    assert out.count() == 3


def test_neighbor_mean_features_crafted(spark):
    """Hand-derivable two-node smoothing on the exact integer grid:
    round 1 means check by hand (truncating division, negatives
    included), isolated nodes keep their value, and a second round
    composes on the round-1 grid."""
    from nomenklatura_spark.operators.graph import neighbor_mean_features

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("c", "a")], "src string, dst string"
    )
    feats = spark.createDataFrame(
        [("a", 10), ("b", -7), ("c", 100), ("z", 5)],
        "node string, value long",
    )
    r1 = {
        r["node"]: r["feat"]
        for r in neighbor_mean_features(edges, feats, n_rounds=1).collect()
    }
    # a: (10 + (-7) + 100) DIV 3 = 34; b: (-7 + 10) DIV 2 = 1;
    # c has no in-edges -> 100; z isolated -> 5
    assert r1 == {"a": 34, "b": 1, "c": 100, "z": 5}
    r2 = {
        r["node"]: r["feat"]
        for r in neighbor_mean_features(edges, feats, n_rounds=2).collect()
    }
    # round 2 on the round-1 grid: a: (34 + 1 + 100) DIV 3 = 45;
    # b: (1 + 34) DIV 2 = 17
    assert r2 == {"a": 45, "b": 17, "c": 100, "z": 5}
    # truncation toward zero on a negative mean (engine-agreement case)
    neg = spark.createDataFrame(
        [("a", -10), ("b", 3)], "node string, value long"
    )
    e2 = spark.createDataFrame([("a", "b")], "src string, dst string")
    (got,) = (
        neighbor_mean_features(e2, neg, n_rounds=1)
        .where("node = 'b'")
        .collect()
    )
    assert got["feat"] == -3  # (3 + -10) DIV 2 = -7 DIV 2 = -3, not -4


def test_neighbor_mean_features_overflow_contract(spark):
    """The up-front executable bound: max|value| * (max_indeg + 1)
    past int64 raises loudly before any round runs."""
    import pytest

    from nomenklatura_spark.operators.graph import neighbor_mean_features

    big = 2**62
    edges = spark.createDataFrame(
        [("a", "hub"), ("b", "hub"), ("c", "hub")],
        "src string, dst string",
    )
    feats = spark.createDataFrame(
        [("a", big), ("b", big), ("c", big), ("hub", 0)],
        "node string, value long",
    )
    with pytest.raises(ValueError, match="overflows int64"):
        neighbor_mean_features(edges, feats, n_rounds=1)
