"""DAG longest-path layering (operators/graph.dag_layers) and pairwise
clustering evaluation (dedup/eval.py): exact parity with driver-side
references, the cycle detector, and the zero-denominator edges."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Row

from nomenklatura_spark.dedup.eval import pairwise_cluster_metrics
from nomenklatura_spark.operators.graph import dag_layers


def _edges_df(spark, edges):
    return spark.createDataFrame(
        [Row(src=a, dst=b) for a, b in edges], "src string, dst string"
    )


def _py_layers(edges):
    """layer(v) = longest path (in edges) ending at v."""
    nodes = {a for a, _ in edges} | {b for _, b in edges}
    inn: dict[str, set[str]] = {v: set() for v in nodes}
    for a, b in edges:
        inn[b].add(a)
    layer = {v: 0 for v in nodes}
    for _ in range(len(nodes) + 1):
        nxt = {
            v: max([0] + [layer[u] + 1 for u in inn[v]]) for v in nodes
        }
        if nxt == layer:
            return layer
        layer = nxt
    raise AssertionError("cycle in reference input")


# diamond feeding a chain: a->b, a->c, b->d, c->d, d->e
DAG = [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("d", "e")]


def test_layers_crafted_diamond_chain(spark):
    got = {
        r["node"]: r["layer"]
        for r in dag_layers(_edges_df(spark, DAG)).collect()
    }
    assert got == {"a": 0, "b": 1, "c": 1, "d": 2, "e": 3}
    assert got == _py_layers(DAG)


def test_layers_longest_path_wins(spark):
    # two routes to z: direct (len 1) and through a 3-chain (len 3) —
    # the layering must take the MAX, not the BFS min
    edges = [("s", "z"), ("s", "m1"), ("m1", "m2"), ("m2", "z")]
    got = {
        r["node"]: r["layer"]
        for r in dag_layers(_edges_df(spark, edges)).collect()
    }
    assert got["z"] == 3
    assert got == _py_layers(edges)


def test_layers_cycle_raises(spark):
    cyc = [("x", "y"), ("y", "z"), ("z", "x")]
    with pytest.raises(ValueError, match="cycle"):
        dag_layers(_edges_df(spark, cyc), max_rounds=10)


def test_layers_random_dag_parity(spark):
    rng = random.Random(4209)
    n = 30
    edges = []
    for _ in range(90):
        i, j = sorted(rng.sample(range(n), 2))
        edges.append((f"v{i:02d}", f"v{j:02d}"))  # i<j: acyclic
    got = {
        r["node"]: r["layer"]
        for r in dag_layers(_edges_df(spark, edges)).collect()
    }
    assert got == _py_layers(edges)


def _labels_df(spark, rows):
    return spark.createDataFrame(
        [Row(id=i, gold=g, pred=p) for i, g, p in rows],
        "id long, gold string, pred string",
    )


def _py_metrics(rows):
    from collections import Counter

    c2 = lambda n: n * (n - 1) // 2  # noqa: E731
    gc = Counter(r[1] for r in rows)
    pc = Counter(r[2] for r in rows)
    cc = Counter((r[1], r[2]) for r in rows)
    g = sum(c2(n) for n in gc.values())
    p = sum(c2(n) for n in pc.values())
    t = sum(c2(n) for n in cc.values())
    prec = round(t / p, 6) if p else 0.0
    rec = round(t / g, 6) if g else 0.0
    f1 = round(2 * t / (g + p), 6) if (g + p) else 0.0
    # BCubed on the same exact integer grid as the operator
    n_items = len(rows)
    bpq = sum(n * n * 10**12 // pc[pl] for (_, pl), n in cc.items())
    brq = sum(n * n * 10**12 // gc[gl] for (gl, _), n in cc.items())
    bp = bpq / (n_items * 1e12)
    br = brq / (n_items * 1e12)
    bf1 = round(2 * bp * br / (bp + br), 6) if (bp + br) > 0 else 0.0
    return (t, g, p, prec, rec, f1, round(bp, 6), round(br, 6), bf1)


def test_eval_crafted_split_cluster(spark):
    # gold cluster {1,2,3} predicted split into {1,2} + {3}: TP=1 of
    # G=3 gold pairs, P=1 predicted pair -> precision 1, recall 1/3
    rows = [(1, "A", "x"), (2, "A", "x"), (3, "A", "y"), (4, "B", "z")]
    (got,) = pairwise_cluster_metrics(_labels_df(spark, rows)).collect()
    assert tuple(got)[:6] == (1, 3, 1, 1.0, 0.333333, 0.5)
    # BCubed by hand: items 1,2 -> P=1, R=2/3; item 3 -> P=1, R=1/3;
    # item 4 -> P=1, R=1.  BP=1, BR=(2/3+2/3+1/3+1)/4=2/3
    assert (got["bcubed_precision"], got["bcubed_recall"]) == (
        1.0,
        0.666667,
    )
    assert tuple(got) == _py_metrics(rows)


def test_eval_perfect_and_empty_prediction(spark):
    perfect = [(1, "A", "x"), (2, "A", "x"), (3, "B", "y")]
    (got,) = pairwise_cluster_metrics(_labels_df(spark, perfect)).collect()
    assert (got["pair_precision"], got["pair_recall"], got["pair_f1"]) == (
        1.0,
        1.0,
        1.0,
    )
    # all-singleton prediction: no predicted pairs, precision defined 0
    single = [(1, "A", "x"), (2, "A", "y"), (3, "A", "z")]
    (got,) = pairwise_cluster_metrics(_labels_df(spark, single)).collect()
    assert tuple(got)[:6] == (0, 3, 0, 0.0, 0.0, 0.0)
    # BCubed still defined: per-item P=1 (own singleton), R=1/3
    assert tuple(got)[6:] == _py_metrics(single)[6:]


def test_eval_random_parity(spark):
    rng = random.Random(4210)
    rows = [
        (i, f"g{rng.randrange(8)}", f"p{rng.randrange(10)}")
        for i in range(300)
    ]
    (got,) = pairwise_cluster_metrics(_labels_df(spark, rows)).collect()
    assert tuple(got) == _py_metrics(rows)


def test_eval_bcubed_sum_survives_int64(spark):
    """Regression for the DIV-returns-BIGINT trap: 10 perfect clusters
    of 1e6 items each put every per-cell term at 1e18 (fits int64) but
    the SUM at 1e19 (would wrap int64 to a negative) — the quotients
    must accumulate on the DECIMAL(38,0) grid, so a perfect clustering
    still scores exactly 1.0 across the board."""
    from pyspark.sql import functions as F

    labels = spark.range(10_000_000).select(
        F.col("id"),
        (F.col("id") % 10).cast("string").alias("gold"),
        (F.col("id") % 10).cast("string").alias("pred"),
    )
    (got,) = pairwise_cluster_metrics(labels).collect()
    assert (got["bcubed_precision"], got["bcubed_recall"]) == (1.0, 1.0)
    assert got["bcubed_f1"] == 1.0
    assert got["pair_f1"] == 1.0


def test_eval_cell_cap_is_executable(spark):
    """The per-cell int64 quotient bound is exact-or-loud: a cell above
    (2^63-1)/10^grid_scale raises a ValueError naming the cell before
    any BCubed quotient can wrap.  grid_scale=18 shrinks the cap to 9
    so a 10-item cell trips it without building a 9.2e6-row fixture."""
    rows = [(i, "A", "x") for i in range(10)] + [(99, "B", "y")]
    labels = _labels_df(spark, rows)
    with pytest.raises(ValueError) as exc:
        pairwise_cluster_metrics(labels, grid_scale=18)
    msg = str(exc.value)
    assert "'A'" in msg and "'x'" in msg and "10 items" in msg
    assert "grid_scale" in msg  # the escape hatch is named
    # the escape hatch works and agrees with the default grid to the
    # emitted 6dp (coarser grid only moves digits past 1e-6/N)
    (coarse,) = pairwise_cluster_metrics(labels, grid_scale=6).collect()
    (fine,) = pairwise_cluster_metrics(labels).collect()
    assert tuple(coarse) == tuple(fine)


def test_eval_grid_scale_validation(spark):
    labels = _labels_df(spark, [(1, "A", "x")])
    with pytest.raises(ValueError, match=r"grid_scale must be"):
        pairwise_cluster_metrics(labels, grid_scale=19)


def test_ann_recall_at_k_crafted(spark):
    """recall@k: full overlap scores 1, partial counts hits, a query
    the approximate side missed entirely scores 0 (present, not
    absent)."""
    from nomenklatura_spark.ann.eval import recall_at_k

    exact = spark.createDataFrame(
        [(1, n) for n in (10, 11)]
        + [(2, n) for n in (20, 21)]
        + [(3, n) for n in (30, 31)],
        "query_id long, neighbor_id long",
    )
    approx = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 20), (2, 99)],
        "query_id long, neighbor_id long",
    )
    got = {
        r["query_id"]: (r["hits"], r["recall_at_2"])
        for r in recall_at_k(exact, approx, k=2).collect()
    }
    assert got == {1: (2, 1.0), 2: (1, 0.5), 3: (0, 0.0)}
