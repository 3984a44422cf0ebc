"""Incremental MinHash-LSH dedup index (training-data tier of §2.12).

Batch MinHash dedup (``dedup/minhash.py``) rescans the corpus per run; a
training-data ingest pipeline instead wants every incoming micro-batch
checked against everything already ingested.  Because the signature
construction is deterministic (md5-derived hash family — no seed state),
the index is a materialised view maintained by key:

- ``signatures`` (id, seed, minhash) and ``bands`` (id, band, band_key)
  are keyed by document: an upsert batch replaces exactly the touched
  ids (retract + insert), the same contract as the blocking index
  (``streaming/index.py``).
- A batch's candidates are (batch bands ⋈ state bands) ∪ (batch
  self-join) — both bounded equi-joins on (band, band_key); the state
  side never self-joins again, so per-batch work is O(batch × collision)
  not O(corpus²).  Cross-batch estimated jaccard reads only the
  signature rows of collided ids.
- Emitted pairs accumulate in a ``pairs`` log that is append-only for
  new ids — over any sequence of batches, INCLUDING re-ingests with
  changed text, the live log equals the from-scratch
  ``minhash_dedup_pairs`` over the union of live documents
  (pytest-pinned): candidates(A∪B) = cand(A×A) ∪ cand(A×B) ∪ cand(B×B)
  and each term is produced by some batch; a changed-content upsert
  RETRACTS the id's stale pairs before the batch join re-derives its
  live ones (the cross join regenerates every pair with a batch-side
  endpoint, so retract-then-append is exact and a no-op for unchanged
  re-ingest).
- ``components`` is maintained INCREMENTALLY
  (``resolver/components.fold_components_incremental``): append-only
  folds can only MERGE components — connected components over the
  previous mapping compressed to stars (node → component edges) plus
  only the batch's new pairs, O(state mapping + batch), the corpus is
  never rescanned.  Exactness: the star graph has the same connected
  partition as the full log (each component label is a member node),
  so star ∪ new connects exactly what log ∪ new connects; and since a
  component label is the MIN node id of its members, the min over a
  merged star set equals the min over the merged log set — the
  maintained labels are bit-identical to a from-scratch run
  (pytest-pinned).  A changed-content upsert is the SPLIT case the
  merge fold cannot express — the reference's G10 rule (deleted
  positives force a rebuild of affected clusters,
  ``/root/reference/nomenklatura/resolver/resolver.py:130-173``):
  only the components holding a changed id or a new-pair endpoint are
  re-derived from the retracted-and-refreshed log (the affected node
  set is edge-closed; the helper's docstring has the argument).
  Replay-idempotent: refolding the same batch finds every signature
  already in state, so retraction stands down and the star fold adds
  edges already implied.  ``delete`` is the deletion half of the same
  rule: outright removal retracts signatures + pairs and re-derives
  only the affected components — post-delete state equals a
  from-scratch build over the remaining documents.
- ``serve_positive_pairs`` answers the contrastive positive feed
  (``textops/contrastive.build_positive_pairs``) from the maintained
  components alone — the training-data serving verb, like the funnel
  and retention tiers serve their dashboards from state.

State is versioned parquet snapshots with a VERSION pointer (crash-safe
swap, time travel) exactly like ``BlockingIndexState``; on a cluster the
merge is a Delta ``MERGE INTO`` per relation and the pairs log is an
append-only table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from nomenklatura_spark.streaming.state import (
    VersionedState,
    start_maintenance_stream,
)
from nomenklatura_spark.dedup.minhash import minhash_similarity

_SIG_SCHEMA = "id string, seed int, minhash long"
_BAND_SCHEMA = "id string, band int, band_key string"
_PAIR_SCHEMA = "lid string, rid string, est_jaccard double"
_COMP_SCHEMA = "node string, component string"


def _bands_of(signatures: DataFrame, band_size: int) -> DataFrame:
    banded = (
        signatures.withColumn("band", (F.col("seed") / band_size).cast("int"))
        .groupBy("id", "band")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("seed", "minhash"))),
                    lambda x: x["minhash"].cast("string"),
                ),
            ).alias("band_key")
        )
    )
    return banded


class DedupIndexState(VersionedState):
    """Versioned on-disk state: signatures + bands + pairs log."""

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        k: int = 3,
        mode: str = "word",
        n_hashes: int = 32,
        band_size: int = 4,
        threshold: float = 0.5,
    ) -> None:
        super().__init__(spark, state_dir)
        self.k, self.mode = k, mode
        self.n_hashes, self.band_size = n_hashes, band_size
        self.threshold = threshold

    def signatures(self, version: int | None = None) -> DataFrame:
        return self._read("signatures", _SIG_SCHEMA, version)

    def bands(self, version: int | None = None) -> DataFrame:
        return self._read("bands", _BAND_SCHEMA, version)

    def pairs(self, version: int | None = None) -> DataFrame:
        return self._read("pairs", _PAIR_SCHEMA, version)

    def components(self, version: int | None = None) -> DataFrame:
        """(node, component) over the accumulated pair log, maintained
        incrementally (module docstring) — component = min node id."""
        return self._read("components", _COMP_SCHEMA, version)

    def serve_positive_pairs(self, k: int = 3, **kwargs) -> DataFrame:
        """Contrastive positives from the maintained components alone
        (no rescan): up to ``k`` md5-ranked positives per anchor from
        its near-dup component — ``build_positive_pairs`` semantics
        including its executable giant-component bound."""
        from nomenklatura_spark.textops.contrastive import (
            build_positive_pairs,
        )

        return build_positive_pairs(
            self.components(), k=k, id_col="node", comp_col="component",
            **kwargs,
        )

    def apply_batch(self, docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
        """Fold one micro-batch of documents into the index; returns the
        near-dup pairs this batch surfaced (within-batch + vs state).

        Fold shape (r11 optimization — value-identical, pinned by the
        incremental-equals-scratch tests): the batch band relation is
        checkpointed ONCE and read by the within-join, the cross-join
        and the bands snapshot write (the previous shape re-ran the
        collect_list banding groupBy in each).  Independent driver
        actions overlap on a small thread pool (guide §2.6 back-fill):
        the changed-id probe runs beside the band materialization, and
        the snapshot writes run beside the component fold — the fold's
        wall is its critical path, not the sum of its actions."""
        from concurrent.futures import ThreadPoolExecutor

        from nomenklatura_spark.dedup.minhash import minhash_signatures

        batch_sigs = minhash_signatures(
            docs, id_col, text_col, self.k, self.mode, self.n_hashes
        ).select(F.col("id").cast("string").alias("id"), "seed", "minhash")
        batch_sigs = batch_sigs.localCheckpoint()

        state_sigs = self.signatures()
        state_bands = self.bands()
        touched = batch_sigs.select("id").distinct()
        # split case (module docstring): ids re-ingested with a CHANGED
        # signature must retract their stale pairs — compare the per-id
        # signature vectors (touched-sized aggregate, tiny); unchanged
        # re-ingest re-derives identical pairs so retraction stands
        # down.  The first fold skips the machinery (version pointer
        # read is free; nothing to retract against); later folds run
        # the probe on a worker thread UNDER the band materialization
        # (the two are independent — §2.6).
        first = self.version() < 0
        if first:
            changed = None
        else:
            sig_vec = F.sort_array(
                F.collect_list(F.struct("seed", "minhash"))
            )
            changed = (
                state_sigs.join(touched, "id", "semi")
                .groupBy("id")
                .agg(sig_vec.alias("_old"))
                .join(
                    batch_sigs.groupBy("id").agg(sig_vec.alias("_new")),
                    "id",
                )
                .where(~F.col("_old").eqNullSafe(F.col("_new")))
                .select("id")
            )
        bands_plan = _bands_of(batch_sigs, self.band_size)
        with ThreadPoolExecutor(max_workers=2) as pool:
            f_bands = pool.submit(bands_plan.localCheckpoint)
            has_changed = (not first) and (not changed.isEmpty())
            batch_bands = f_bands.result()
        if has_changed:
            changed = changed.localCheckpoint()

        # within-batch candidates: the batch bands self-join (the same
        # relation ``lsh_candidate_pairs`` builds, read from the one
        # checkpointed band pass)
        l = batch_bands.select(F.col("id").alias("lid"), "band", "band_key")
        r = batch_bands.select(F.col("id").alias("rid"), "band", "band_key")
        within = (
            l.join(r, ["band", "band_key"])
            .where(F.col("lid") < F.col("rid"))
            .select("lid", "rid")
            .distinct()
        )
        if first:
            # bootstrap fold (empty state): the cross join against the
            # empty state bands, the anti-join signature merge and the
            # pair-log union below are all identities — candidates are
            # the within-batch pairs alone and the signature relation is
            # the batch itself, keeping the first fold's plans free of
            # dead empty-side subtrees (the measured fold-1 anomaly)
            all_sigs = batch_sigs
            cands = within
        else:
            # cross candidates: batch vs state (state never re-self-joins)
            cross = (
                batch_bands.select(
                    F.col("id").alias("lid"), "band", "band_key"
                )
                .join(
                    state_bands.select(
                        F.col("id").alias("rid"), "band", "band_key"
                    ),
                    ["band", "band_key"],
                )
                .where(F.col("lid") != F.col("rid"))
                .select(
                    F.least("lid", "rid").alias("lid"),
                    F.greatest("lid", "rid").alias("rid"),
                )
                .distinct()
            )
            all_sigs = state_sigs.join(
                touched, "id", "left_anti"
            ).unionByName(batch_sigs)
            cands = within.unionByName(cross).distinct()
        new_pairs = (
            minhash_similarity(all_sigs, cands)
            .where(F.col("est_jaccard") >= self.threshold)
            .localCheckpoint()
        )

        # upsert-by-document + pair-log refresh, then swap the pointer
        v = self.version()
        nv = v + 1
        if first:
            # all three merges are identities over the batch relations
            # (empty state side); new_pairs is (lid, rid)-unique by the
            # similarity groupBy, so the max-merge is one too
            merged_sigs = batch_sigs
            merged_bands = batch_bands
            merged_pairs = new_pairs
        else:
            merged_sigs = state_sigs.join(
                touched, "id", "left_anti"
            ).unionByName(batch_sigs)
            merged_bands = state_bands.join(
                touched, "id", "left_anti"
            ).unionByName(batch_bands)
            old_pairs = self.pairs()
            if has_changed:
                # retract every pair touching a changed id; the batch
                # join has already re-derived the live ones (every pair
                # with a batch-side endpoint), so retract-then-append
                # is exact
                old_pairs = old_pairs.join(
                    changed.select(F.col("id").alias("lid")), "lid",
                    "left_anti",
                ).join(
                    changed.select(F.col("id").alias("rid")), "rid",
                    "left_anti",
                )
            merged_pairs = (
                old_pairs.unionByName(new_pairs)
                .groupBy("lid", "rid")
                .agg(F.max("est_jaccard").alias("est_jaccard"))
            )
        # incremental component fold: star-compression merge, or the
        # bounded G10 split-case rebuild when signatures changed
        # (module docstring has both exactness arguments)
        from nomenklatura_spark.resolver.components import (
            fold_components_incremental,
        )

        if has_changed:
            # the split-case rebuild reads merged_pairs too — share one
            # materialization between the CC and the snapshot write
            merged_pairs = merged_pairs.localCheckpoint()

        # the three data snapshot writes are independent of the
        # component fold — run them beside it (§2.6); the component
        # write chains after its fold inside the same worker, so the
        # fold wall is max(writes, CC + comps write), not the sum
        def _write(df: DataFrame, rel: str) -> None:
            df.write.mode("overwrite").parquet(self._path(rel, nv))

        def _fold_and_write_comps() -> None:
            if first:
                # empty previous mapping: the star union is empty, so
                # the merge fold IS plain CC over the new pairs
                from nomenklatura_spark.resolver.components import (
                    connected_components,
                )

                merged_comps = connected_components(
                    new_pairs.select("lid", "rid"), src="lid", dst="rid"
                )
            else:
                merged_comps = fold_components_incremental(
                    self.components(),
                    new_pairs,
                    merged_pairs=merged_pairs,
                    changed=changed if has_changed else None,
                )
            _write(merged_comps, "components")

        with ThreadPoolExecutor(max_workers=4) as pool:
            futs = [
                pool.submit(_write, merged_sigs, "signatures"),
                pool.submit(_write, merged_bands, "bands"),
                pool.submit(_write, merged_pairs, "pairs"),
                pool.submit(_fold_and_write_comps),
            ]
            for f in futs:
                f.result()
        self._bump(nv)
        return new_pairs

    def delete(self, ids: DataFrame) -> None:
        """Remove documents from the index outright — the DELETION half
        of the reference's G10 rule (a deleted positive judgement
        forces a rebuild of the affected clusters,
        ``/root/reference/nomenklatura/resolver/resolver.py:130-173``),
        bounded the same way as the changed-content upsert: signatures,
        bands and every pair touching a deleted id are retracted, and
        ONLY the components that held a deleted id are re-derived from
        the retracted log (the affected set is edge-closed —
        ``fold_components_incremental``'s split case with no new
        pairs), so post-delete state is bit-identical to a from-scratch
        build over the remaining documents (pytest-pinned).  Ids absent
        from the index are ignored, so a redelivered delete is a no-op;
        an EMPTY id set does not bump the version.  ``ids``: one-column
        DataFrame of document ids."""
        from nomenklatura_spark.resolver.components import (
            fold_components_incremental,
        )

        gone = (
            ids.select(F.col(ids.columns[0]).cast("string").alias("id"))
            .distinct()
            .localCheckpoint()
        )
        if gone.isEmpty():
            return
        v = self.version()
        nv = v + 1
        merged_sigs = self.signatures().join(gone, "id", "left_anti")
        merged_bands = self.bands().join(gone, "id", "left_anti")
        merged_pairs = (
            self.pairs()
            .join(gone.select(F.col("id").alias("lid")), "lid", "left_anti")
            .join(gone.select(F.col("id").alias("rid")), "rid", "left_anti")
            # USING joins move the key column first — restore the
            # relation's declared order before the snapshot write
            .select("lid", "rid", "est_jaccard")
            .localCheckpoint()
        )
        merged_comps = fold_components_incremental(
            self.components(),
            self.spark.createDataFrame([], _PAIR_SCHEMA).select(
                "lid", "rid"
            ),
            merged_pairs=merged_pairs,
            changed=gone,
        )
        merged_sigs.write.mode("overwrite").parquet(
            self._path("signatures", nv)
        )
        merged_bands.write.mode("overwrite").parquet(self._path("bands", nv))
        merged_pairs.write.mode("overwrite").parquet(self._path("pairs", nv))
        merged_comps.write.mode("overwrite").parquet(
            self._path("components", nv)
        )
        self._bump(nv)


def maintain_dedup_stream(
    stream: DataFrame,
    state: DedupIndexState,
    id_col: str = "doc_id",
    text_col: str = "text",
    checkpoint_dir: str | None = None,
    trigger_once: bool = False,
    tombstone_col: str | None = None,
) -> StreamingQuery:
    """Structured Streaming driver: each micro-batch of documents folds
    into the dedup index via ``foreachBatch`` (the merge is a multi-table
    transaction, which sinks can't express).  Replay-idempotent by
    construction (upsert-by-document + max-merged pair log; deletes are
    absent-id no-ops), so no batch guard is needed.  ``trigger_once``
    drains the backlog and terminates (availableNow), for cron-style
    catch-up runs.

    ``tombstone_col`` names an optional boolean column for CDC-shaped
    feeds: rows where it is true DELETE their id from the index
    (``DedupIndexState.delete`` — the G10 deletion path), other rows
    upsert as usual.  Within one micro-batch tombstones win over
    upserts of the same id (the delete folds after the upsert), so a
    batch that both rewrites and tombstones a document resolves to
    deleted — the deterministic reading of an intra-batch conflict."""

    def _process(batch: DataFrame, batch_id: int) -> None:
        if tombstone_col is None:
            state.apply_batch(batch, id_col, text_col)
            return
        dead = batch.where(F.col(tombstone_col)).select(id_col)
        live = batch.where(
            ~F.coalesce(F.col(tombstone_col), F.lit(False))
        )
        if not live.isEmpty():
            state.apply_batch(live, id_col, text_col)
        state.delete(dead)

    return start_maintenance_stream(stream, _process, checkpoint_dir, trigger_once)
