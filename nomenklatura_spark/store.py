"""The Store façade — the reference's user-facing Store/View/Writer API
re-expressed over DataFrames.

Reference surface (``nomenklatura/store/base.py``): a Store holds
statements and a resolver Linker; a Writer adds statements (content-hash
upsert, linker applied at write time, ``store/memory.py:31-49``); a View
scopes to datasets and answers ``get_entity`` / ``get_adjacent`` /
``entities()`` (``base.py:105-141``); ``Store.update(id)`` re-keys
statements after judgements (``base.py:46-52``, G11).

This is glue over the engine's operators — every method returns a lazy
DataFrame plan (no driver-side loops); a user of the reference finds the
same verbs with DataFrames in place of entity generators.

Storage layout at rest: parquet partitioned by ``dataset``
(``sources/statement_io.write_statements_partitioned``) so dataset scoping
is partition pruning and per-dataset reload is a partition overwrite.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F

from nomenklatura_spark.operators.assembly import adjacency, assemble_entities
from nomenklatura_spark.operators.filters import (
    filter_external,
    filter_schemata,
    scope_datasets,
)
from nomenklatura_spark.resolver.edges import resolver_mapping
from nomenklatura_spark.resolver.linker import apply_linker


@dataclass
class SparkView:
    """A dataset-scoped, linker-applied read view (reference View)."""

    stmts: DataFrame
    external: bool = False

    def statements(self) -> DataFrame:
        return filter_external(self.stmts, self.external)

    def entities(self, include_schemata: Sequence[str] | None = None) -> DataFrame:
        """Assembled entities (canonical_id + statement array) — A7."""
        df = self.statements()
        if include_schemata:
            df = filter_schemata(df, include_schemata)
        return assemble_entities(df)

    def get_entity(self, canonical_id: str) -> DataFrame:
        return self.entities().where(F.col("canonical_id") == canonical_id)

    def get_adjacent(self, canonical_id: str) -> DataFrame:
        """J6 — inbound + outbound entity-valued edges of one entity."""
        adj = adjacency(self.statements())
        return adj.where(
            (F.col("src_id") == canonical_id) | (F.col("dst_id") == canonical_id)
        )


@dataclass
class SparkStore:
    """Statement store + resolver edge table (reference Store)."""

    stmts: DataFrame
    edges: DataFrame | None = None
    _mapping: DataFrame | None = field(default=None, repr=False)

    def _linker_mapping(self) -> DataFrame | None:
        if self.edges is None:
            return None
        if self._mapping is None:
            self._mapping = resolver_mapping(self.edges).persist()
        return self._mapping

    def add_statements(self, new: DataFrame) -> "SparkStore":
        """Writer semantics: content-hash upsert (SO4) with the linker
        applied at write time (``store/memory.py:31-49``)."""
        mapping = self._linker_mapping()
        if mapping is not None:
            new = apply_linker(new, mapping)
        merged = self.stmts.unionByName(new).dropDuplicates(["id"])
        return SparkStore(merged, self.edges, self._mapping)

    def update(self) -> "SparkStore":
        """G11 — re-key all statements onto current canonical ids (after
        new judgements); recomputes the linker mapping.

        Loop hygiene — ``store = store.update()`` per judgement batch is
        the serving shape (reference: an UPDATE on the statement table),
        and two things must stay constant per batch:

        - the superseded store's persisted mapping is released (the old
          object stays usable — its mapping just recomputes uncached);
        - the re-keyed statement frame is checkpointed, truncating
          lineage: without it batch N's plan chains N linker joins deep
          (every action replays the whole history, and each level's
          component-checkpoint blocks stay reachable forever).  The
          checkpoint materializes once per batch; prior batches'
          blocks become unreachable and the context cleaner frees them.
        """
        if self.edges is None:
            return self
        mapping = resolver_mapping(self.edges).persist()
        rekeyed = apply_linker(self.stmts, mapping).localCheckpoint(eager=True)
        new = SparkStore(rekeyed, self.edges, mapping)
        self.release()
        return new

    def with_edges(self, edges: DataFrame) -> "SparkStore":
        self.release()
        return SparkStore(self.stmts, edges, None)

    def release(self) -> None:
        """Unpersist the cached linker mapping (end-of-lifecycle hook;
        also called when ``update``/``with_edges`` supersede this
        store).  Safe to call repeatedly — a later ``view()`` simply
        recomputes and re-caches."""
        if self._mapping is not None:
            self._mapping.unpersist()
            self._mapping = None

    def view(
        self, scope: Sequence[str] | None = None, external: bool = False
    ) -> SparkView:
        """Scoped read view; statements are linker-applied lazily so the
        view always reads through current judgements (``base.py:29-44``)."""
        df = self.stmts
        if scope:
            df = scope_datasets(df, scope)
        mapping = self._linker_mapping()
        if mapping is not None:
            df = apply_linker(df, mapping)
        return SparkView(df, external=external)
