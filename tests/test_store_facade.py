"""Store/View/Writer façade: upsert semantics, linker-applied views,
update re-keying, adjacency lookup."""

from __future__ import annotations

from pyspark.sql import functions as F

from nomenklatura_spark.store import SparkStore

STMT_DDL = (
    "id string, entity_id string, canonical_id string, prop string,"
    " prop_type string, schema string, value string, original_value string,"
    " dataset string, origin string, lang string, external boolean,"
    " first_seen timestamp, last_seen timestamp"
)

EDGE_DDL = (
    "target string, source string, judgement string, score double,"
    " user string, created_at string, deleted_at string"
)


def _stmt(i, eid, prop, value, ptype="string", schema="Person",
          dataset="d1", external=False):
    return (i, eid, eid, prop, ptype, schema, value, None, dataset,
            None, None, external, None, None)


def _store(spark, rows, edges=None):
    stmts = spark.createDataFrame(rows, STMT_DDL)
    e = spark.createDataFrame(edges or [], EDGE_DDL)
    return SparkStore(stmts).with_edges(e)


def test_add_statements_upserts_on_content_hash(spark):
    store = _store(spark, [_stmt("s1", "a", "name", "Alice")])
    new = spark.createDataFrame(
        [_stmt("s1", "a", "name", "Alice"), _stmt("s2", "a", "name", "Ally")],
        STMT_DDL,
    )
    merged = store.add_statements(new)
    assert merged.stmts.count() == 2  # s1 deduped


def test_view_scoping_and_external(spark):
    rows = [
        _stmt("s1", "a", "name", "Alice", dataset="d1"),
        _stmt("s2", "b", "name", "Bob", dataset="d2"),
        _stmt("s3", "a", "name", "Ext", dataset="d1", external=True),
    ]
    store = _store(spark, rows)
    v = store.view(scope=["d1"])
    vals = {r["value"] for r in v.statements().collect()}
    assert vals == {"Alice"}  # d2 scoped out, external dropped
    v_ext = store.view(scope=["d1"], external=True)
    assert {r["value"] for r in v_ext.statements().collect()} == {"Alice", "Ext"}


def test_view_reads_through_judgements(spark):
    rows = [
        _stmt("s1", "a", "name", "Alice"),
        _stmt("s2", "b", "name", "Alicia"),
    ]
    edges = [("a", "b", "positive", 1.0, None, "2024-01-01", None)]
    store = _store(spark, rows, edges)
    ents = store.view().entities().collect()
    assert len(ents) == 1  # a and b collapse to one canonical entity
    assert ents[0]["n_statements"] == 2


def test_writer_applies_linker_at_write_time(spark):
    edges = [("a", "b", "positive", 1.0, None, "2024-01-01", None)]
    store = _store(spark, [_stmt("s1", "a", "name", "Alice")], edges)
    new = spark.createDataFrame([_stmt("s2", "b", "name", "Alicia")], STMT_DDL)
    merged = store.add_statements(new)
    canon = {
        r["canonical_id"]
        for r in merged.stmts.where(F.col("id") == "s2").collect()
    }
    assert len(canon) == 1 and "b" not in canon  # rewritten to the canonical


def test_update_rekeys_existing(spark):
    rows = [
        _stmt("s1", "a", "name", "Alice"),
        _stmt("s2", "b", "name", "Alicia"),
    ]
    edges = [("a", "b", "positive", 1.0, None, "2024-01-01", None)]
    store = _store(spark, rows, edges).update()
    canon = {r["canonical_id"] for r in store.stmts.collect()}
    assert len(canon) == 1


def test_get_adjacent(spark):
    rows = [
        _stmt("s1", "p1", "name", "Payment 1", schema="Payment"),
        _stmt("s2", "p1", "beneficiary", "x1", ptype="entity", schema="Payment"),
        _stmt("s3", "x1", "name", "Xavier"),
    ]
    store = _store(spark, rows)
    adj = store.view().get_adjacent("x1").collect()
    assert any(
        r["src_id"] == "p1" and r["edge_prop"] == "beneficiary" for r in adj
    )


def test_update_loop_releases_superseded_mappings(spark):
    """A serving loop (`store = store.update()` per judgement batch) must
    stay constant-size per batch: the superseding call unpersists the old
    cached linker mapping, and the re-keyed statement frame is
    checkpointed so batch N's plan is a materialized scan, not an
    N-deep linker-join chain replaying every prior batch."""
    rows = [
        _stmt("s1", "a", "name", "Alice"),
        _stmt("s2", "b", "name", "Alicia"),
    ]
    edges = [("a", "b", "positive", 1.0, None, "2024-01-01", None)]
    store = _store(spark, rows, edges)
    plans = []
    prev_mapping = None
    for _ in range(4):
        store = store.update()
        assert store._mapping.is_cached  # live mapping cached
        if prev_mapping is not None:
            # the superseded batch's mapping was unpersisted
            assert not prev_mapping.is_cached
        prev_mapping = store._mapping
        plans.append(
            store.stmts._jdf.queryExecution().analyzed().toString()
        )
    # lineage truncated: every batch's statement plan is a checkpoint
    # scan with no joins, and depth does not grow with the batch count
    for p in plans:
        assert "Join" not in p, p
    assert len(plans[-1]) <= len(plans[0]) + 64
    canon = {r["canonical_id"] for r in store.stmts.collect()}
    assert len(canon) == 1  # re-keying still correct after the loop
    store.release()
    assert store._mapping is None
    assert not prev_mapping.is_cached
    # a post-release view recomputes the mapping and stays correct
    assert len(store.view().entities().collect()) == 1
