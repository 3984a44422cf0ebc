"""G10 — incremental resolver refresh: delta replay, merge equivalence,
rebuild-on-split."""

from __future__ import annotations

from pyspark.sql import functions as F

from nomenklatura_spark.resolver.edges import resolver_mapping
from nomenklatura_spark.resolver.incremental import (
    delta_edges,
    needs_rebuild,
    refresh_mapping,
)

EDGE_DDL = (
    "target string, source string, judgement string, score double,"
    " user string, created_at string, deleted_at string"
)

T0, T1, T2 = "2024-01-01", "2024-06-01", "2024-09-01"


def _edges(spark, rows):
    return spark.createDataFrame(rows, EDGE_DDL)


def _pos(t, s, created, deleted=None):
    return (t, s, "positive", 1.0, None, created, deleted)


def test_delta_edges_window(spark):
    edges = _edges(
        spark,
        [
            _pos("a", "b", T0),                # old
            _pos("c", "d", T1),                # created in window
            _pos("e", "f", T0, deleted=T1),    # deleted in window
        ],
    )
    got = {(r["target"], r["source"]) for r in delta_edges(edges, T1).collect()}
    assert got == {("c", "d"), ("e", "f")}


def test_incremental_merge_extends_cluster(spark):
    base = _edges(spark, [_pos("a", "b", T0)])
    prev = resolver_mapping(base)
    # new edge links c into the a-b cluster
    edges = _edges(spark, [_pos("a", "b", T0), _pos("b", "c", T1)])
    mapping, rebuilt = refresh_mapping(prev, edges, T1)
    assert not rebuilt
    got = {r["node"]: r["canonical_id"] for r in mapping.collect()}
    canon = {got[n] for n in ("a", "b", "c") if n in got}
    assert len(canon) == 1, f"a,b,c must share one canonical: {got}"


def test_incremental_matches_full_on_fresh_clusters(spark):
    """Clusters formed purely from delta edges must come out exactly as a
    full rebuild would (same minted canonical)."""
    base = _edges(spark, [])
    prev = resolver_mapping(base)
    edges = _edges(spark, [_pos("x", "y", T1), _pos("y", "z", T1)])
    inc, rebuilt = refresh_mapping(prev, edges, T1)
    assert not rebuilt
    full = resolver_mapping(edges)
    assert {tuple(r) for r in inc.collect()} == {tuple(r) for r in full.collect()}


def test_qid_takeover_on_merge(spark):
    """A newly-linked wikidata QID (highest identifier weight) must become
    the canonical of the merged cluster."""
    base = _edges(spark, [_pos("a", "b", T0)])
    prev = resolver_mapping(base)
    edges = _edges(spark, [_pos("a", "b", T0), _pos("a", "Q42", T1)])
    mapping, rebuilt = refresh_mapping(prev, edges, T1)
    assert not rebuilt
    got = {r["node"]: r["canonical_id"] for r in mapping.collect()}
    assert got["a"] == "Q42"
    assert got["b"] == "Q42"


def test_deleted_positive_forces_rebuild(spark):
    edges = _edges(
        spark,
        [
            _pos("a", "b", T0, deleted=T1),
            _pos("b", "c", T0),
        ],
    )
    assert needs_rebuild(edges, T1)
    prev = resolver_mapping(_edges(spark, [_pos("a", "b", T0), _pos("b", "c", T0)]))
    mapping, rebuilt = refresh_mapping(prev, edges, T1)
    assert rebuilt
    got = {r["node"]: r["canonical_id"] for r in mapping.collect()}
    # a was split off: only b and c remain clustered
    assert "a" not in got or got.get("a") != got.get("b")
    assert got["b"] == got["c"]


def test_negative_delete_does_not_rebuild(spark):
    edges = _edges(
        spark,
        [
            _pos("a", "b", T0),
            ("c", "d", "negative", None, None, T0, T1),
        ],
    )
    assert not needs_rebuild(edges, T1)
