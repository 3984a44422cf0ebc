"""Strongly connected components (operators/graph.py): hand-built
graphs, randomized agreement with a driver-side Tarjan reference, and
the max-member labeling invariant."""

from __future__ import annotations

import random

from pyspark.sql import Row

from nomenklatura_spark.operators.graph import strongly_connected_components


def _tarjan(edges):
    """Iterative Tarjan over an adjacency dict; returns {node: scc_set}."""
    adj = {}
    nodes = set()
    for a, b in edges:
        nodes.update((a, b))
        adj.setdefault(a, []).append(b)
    index = {}
    low = {}
    on_stack = set()
    stack = []
    sccs = []
    counter = [0]

    def strongconnect(v0):
        work = [(v0, 0)]
        while work:
            v, pi = work.pop()
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on_stack.add(v)
            recurse = False
            succs = adj.get(v, [])
            for i in range(pi, len(succs)):
                w = succs[i]
                if w not in index:
                    work.append((v, i + 1))
                    work.append((w, 0))
                    recurse = True
                    break
                elif w in on_stack:
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            if low[v] == index[v]:
                comp = set()
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    comp.add(w)
                    if w == v:
                        break
                sccs.append(comp)
            if work:
                parent = work[-1][0]
                low[parent] = min(low[parent], low[v])

    for v in sorted(nodes):
        if v not in index:
            strongconnect(v)
    return {v: frozenset(c) for c in sccs for v in c}


def _spark_scc(spark, edges):
    df = spark.createDataFrame(
        [Row(src=a, dst=b) for a, b in edges], "src bigint, dst bigint"
    )
    return {
        r["node"]: r["scc_id"]
        for r in strongly_connected_components(df).collect()
    }


def _check(spark, edges):
    got = _spark_scc(spark, edges)
    ref = _tarjan(edges)
    assert set(got) == set(ref)
    for v, scc_id in got.items():
        # labeling invariant: every SCC is labeled by its max member
        assert scc_id == max(ref[v]), (v, scc_id, sorted(ref[v]))


def test_two_cycles_and_chain(spark):
    # cycle {1,2,3}, cycle {7,8}, chain 3->5->6->7, stray 9->1
    edges = [(1, 2), (2, 3), (3, 1), (7, 8), (8, 7), (3, 5), (5, 6), (6, 7), (9, 1)]
    _check(spark, edges)


def test_nested_cycle_with_bridge_back(spark):
    # one big SCC {1,2,3,4} via a long way round plus an inner shortcut
    edges = [(1, 2), (2, 3), (3, 4), (4, 1), (2, 4), (4, 5)]
    _check(spark, edges)


def test_pure_dag_all_singletons(spark):
    edges = [(1, 2), (1, 3), (2, 4), (3, 4), (4, 5)]
    got = _spark_scc(spark, edges)
    assert got == {v: v for v in range(1, 6)}


def test_random_digraphs_match_tarjan(spark):
    rng = random.Random(8)
    for _ in range(3):
        n = 40
        edges = list(
            {
                (rng.randrange(n), rng.randrange(n))
                for _ in range(70)
            }
        )
        edges = [(a, b) for a, b in edges if a != b]
        _check(spark, edges)


def test_empty_graph_and_string_ids(spark):
    empty = spark.createDataFrame([], "src string, dst string")
    out = strongly_connected_components(empty)
    assert out.count() == 0
    assert dict(out.dtypes) == {"node": "string", "scc_id": "string"}
    # string ids: max-member labeling is lexicographic max
    e = spark.createDataFrame(
        [("b", "a"), ("a", "b"), ("a", "c")], "src string, dst string"
    )
    got = {
        r["node"]: r["scc_id"]
        for r in strongly_connected_components(e).collect()
    }
    assert got == {"a": "b", "b": "b", "c": "c"}


def test_condensation_is_acyclic_and_correct(spark):
    from pyspark.sql import Row

    from nomenklatura_spark.operators.graph import condense_graph

    # cycle {1,2,3} -> 5 -> cycle {7,8}; 9 -> 1
    edges = [(1, 2), (2, 3), (3, 1), (3, 5), (5, 7), (7, 8), (8, 7), (9, 1)]
    df = spark.createDataFrame(
        [Row(src=a, dst=b) for a, b in edges], "src bigint, dst bigint"
    )
    scc = strongly_connected_components(df)
    cond = {
        (r["scc_src"], r["scc_dst"])
        for r in condense_graph(df, scc).collect()
    }
    # SCC labels: {1,2,3}->3, {7,8}->8, singletons 5, 9
    assert cond == {(3, 5), (5, 8), (9, 3)}
    # acyclic: no pair appears in both directions and no self edges
    assert all((b, a) not in cond and a != b for a, b in cond)
