"""Incremental media near-dup index — the dHash tier's streaming ingest
path (§2.12 shape, the ``dedup_index`` contract applied to pixels).

A training-data ingest pipeline dedups every incoming batch of
images/audio against everything already ingested, without rescanning
the corpus.  The dHash construction (``multimodal/dhash.py``) is
deterministic (no seed state), so the index is a materialised view
maintained by key:

- ``signatures`` (id, blocks, dhash) are keyed by asset: an upsert
  batch replaces exactly the touched ids (retract + insert), the same
  contract as the text dedup index.  The expensive leg — the
  Arrow-batched DECODE — runs once per asset at ingest, never again.
- A batch's candidates are (batch bands ⋈ state bands) ∪ (batch
  self-pairs) — bounded equi-joins on (band_no, band_val); the state
  side never re-self-joins, so per-batch work is O(batch × collision),
  and the exact popcount-of-XOR filter reads only signature rows.
  Over any batch sequence — INCLUDING re-ingests with changed pixels —
  the live pair log equals a from-scratch ``dhash_pairs`` over the
  union of live signatures (pytest-pinned).  Append-only folds add
  probe-derived pairs (cand(A∪B) = cand(A×A) ∪ cand(A×B) ∪ cand(B×B),
  each term produced by some batch); a changed-content upsert RETRACTS
  the id's stale pairs from the log before the probe re-derives its
  live ones (the probe regenerates every pair with a batch-side
  endpoint, so retract-then-append is exact, and is a no-op for
  unchanged re-ingest).
- ``components`` are maintained INCREMENTALLY: append-only folds use
  the star-compression merge (pairs merge, never split; min-id labels
  compose — ``streaming/dedup_index.py`` has the exactness argument).
  A changed-content upsert is the SPLIT case the merge fold cannot
  express — the reference's G10 rule (deleted judgements force a
  rebuild of affected clusters,
  ``/root/reference/nomenklatura/resolver/resolver.py:130-173``)
  applied here: only the components holding a changed id or a new-pair
  endpoint are re-derived from the retracted-and-refreshed log (the
  affected node set is edge-closed, so the bounded rebuild equals a
  from-scratch run — ``apply_batch`` has the argument).
  ``delete`` is the deletion half of the same rule (outright removal;
  post-delete state equals a from-scratch build over the remaining
  assets).  ``serve_keep_list`` answers the training-feed question —
  which asset of each near-dup cluster survives — from state alone
  (keeper = min asset id, deterministic).

Replay-idempotent by construction (upsert-by-asset + distinct-merged
pair log + component fold keyed on signature CHANGE: refolding a batch
finds every signature already in state, so the retraction path stands
down and the regenerated pairs are the logged ones), so no batch guard
is needed.
State is versioned parquet snapshots behind the shared VERSION pointer
(crash-safe swap, time travel); on a cluster each relation is a Delta
MERGE and the pairs log an append-only table.  Since r12 the signature
and pair relations are hash-BUCKETED by key and each version is
assembled file-wise (``VersionedState._write_bucketed`` — untouched
buckets hardlink, retraction rewrites only its buckets, new rows
append), so a steady-state append-only fold writes O(batch) bytes
regardless of state size.

Scale shape: ingest cost per batch is one decode pass over the BATCH
(map-only, Arrow-batched) + a signature-sized band join against state
+ a mapping-sized component fold.  The band-bucket skew bound and the
``band_bytes`` widening knob are inherited from ``dhash_pairs``; the
fold's contract scan is BATCH-bounded — a maintained ``band_counts``
histogram (counts change only through buckets the batch touches) is
checked against batch-side buckets via a broadcast semi-join, never a
full-state groupBy (``probe_bucket_scan``; ``validate_buckets`` is the
full-scan repair verb after tightening ``max_bucket``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from nomenklatura_spark.multimodal.dhash import (
    _banded,
    _raise_band_offenders,
    band_bucket_counts,
    dhash_pairs,
    dhash_signatures,
    full_bucket_scan,
)
from nomenklatura_spark.streaming.state import (
    VersionedState,
    start_maintenance_stream,
)

_SIG_SCHEMA = "id long, blocks array<int>, dhash string"
_PAIR_SCHEMA = "lid long, rid long, hamming int"
_COMP_SCHEMA = "node long, component long"
_COUNT_SCHEMA = "band_no int, band_val long, n bigint"


class MediaDedupIndexState(VersionedState):
    """Versioned on-disk state: dHash signatures + pair log +
    incrementally-maintained components."""

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        max_hamming: int = 6,
        band_bytes: int = 1,
        max_bucket: int = 100_000,
        n_blocks: int = 8,
    ) -> None:
        super().__init__(spark, state_dir)
        self.max_hamming = max_hamming
        self.band_bytes = band_bytes
        self.max_bucket = max_bucket
        self.n_blocks = n_blocks

    def signatures(self, version: int | None = None) -> DataFrame:
        return self._read_bucketed("signatures", _SIG_SCHEMA, version)

    def pairs(self, version: int | None = None) -> DataFrame:
        return self._read_bucketed("pairs", _PAIR_SCHEMA, version)

    def components(self, version: int | None = None) -> DataFrame:
        return self._read("components", _COMP_SCHEMA, version)

    def band_counts(self, version: int | None = None) -> DataFrame:
        """(band_no, band_val, n) — the live signatures' band-bucket
        histogram, maintained incrementally (counts change only through
        buckets the batch touches) so each fold's bucket-skew contract
        scan checks batch-side buckets against it instead of
        re-aggregating the state-sized band relation
        (``multimodal/dhash.probe_bucket_scan``)."""
        return self._read("band_counts", _COUNT_SCHEMA, version)

    def validate_buckets(self) -> None:
        """Full-relation re-validation of the bucket-skew bound — the
        repair verb after TIGHTENING ``max_bucket`` over existing state
        (the fold's batch-bounded scan only sees buckets each batch
        touches, so a lowered bound is otherwise checked lazily)."""
        n_bands = self.n_blocks // self.band_bytes
        offenders = full_bucket_scan(
            _banded(self.signatures(), self.band_bytes, n_bands),
            self.max_bucket,
        ).collect()
        _raise_band_offenders(
            offenders, self.n_blocks, self.band_bytes, self.max_bucket
        )

    def apply_batch(
        self,
        assets: DataFrame,
        id_col: str = "asset_id",
        payload_col: str = "payload",
    ) -> DataFrame:
        """Fold one micro-batch of media assets into the index; returns
        the near-dup pairs this batch surfaced (within-batch + vs
        state).  The batch is decoded ONCE (localCheckpoint) and only
        signatures touch state.

        Fold shape (r12): the signature and pair relations are BUCKETED
        (``_write_bucketed``), so the steady-state append-only fold
        writes only the batch's own rows and hardlinks every untouched
        bucket — O(batch) write cost per fold, not O(state) — and the
        merged-signature relation is no longer materialized at all (its
        only consumer is the probe join, which reads the state parquet
        and the batch checkpoint directly).  Independent driver actions
        overlap on a small pool (§2.6): the overlap probe runs beside
        the batch-side histogram delta, and the changed-id probe beside
        the merged-histogram checkpoint."""
        from concurrent.futures import ThreadPoolExecutor

        # grid_h derives from n_blocks so the signatures this index
        # builds always match the n_blocks its dhash_pairs calls band —
        # a mismatch would explode to sentinel bands and raise there
        batch_sigs = dhash_signatures(
            assets, id_col=id_col, payload_col=payload_col,
            grid_h=self.n_blocks,
        ).localCheckpoint()
        state_sigs = self.signatures()
        touched = batch_sigs.select("id").distinct()
        first = self.version() < 0
        batch_counts = band_bucket_counts(
            batch_sigs, self.band_bytes, self.n_blocks
        )

        changed = None
        has_changed = False
        overlap = False
        touched_state = None
        if first:
            # bootstrap fold (empty state): the anti-join signature
            # merge is the batch itself — and the batch is ALREADY
            # checkpointed; no probe, no retraction leg
            merged_sigs = batch_sigs
            merged_counts = batch_counts.localCheckpoint()
        else:
            # The overlap probe (state signature rows of touched ids —
            # the changed probe's input, the histogram retraction leg's
            # input, and the rewrite-bucket source) is independent of
            # the batch-side histogram delta: run the two actions
            # concurrently (§2.6).  The delta is built OPTIMISTICALLY
            # without the retraction leg — the steady-state fold has no
            # overlap, so that delta is final; a re-ingest fold rebuilds
            # it with the touched ids' old bands retracted.
            with ThreadPoolExecutor(max_workers=2) as pool:
                f_touched = pool.submit(
                    state_sigs.join(touched, "id", "semi").localCheckpoint
                )
                f_delta = pool.submit(batch_counts.localCheckpoint)
                touched_state = f_touched.result()
                overlap = not touched_state.isEmpty()
                delta = f_delta.result()
            if overlap:
                # retraction leg: counts only change through buckets
                # the batch touches, so the delta stays batch-sized
                delta = (
                    batch_counts.unionByName(
                        band_bucket_counts(
                            touched_state, self.band_bytes, self.n_blocks
                        ).select(
                            "band_no", "band_val", (-F.col("n")).alias("n")
                        )
                    )
                    .groupBy("band_no", "band_val")
                    .agg(F.sum("n").alias("n"))
                    .localCheckpoint()
                )
            # merge the delta into the maintained histogram: state only
            # flows through semi/anti joins with the BROADCAST delta
            # bucket list — never a full-state groupBy (outer joins
            # can't build their preserved side, hence the semi + re-sum
            # shape).  The merged histogram feeds the fold's
            # BATCH-bounded skew scan (probe_bucket_scan) and the
            # snapshot.  Its checkpoint is independent of the
            # changed-id probe — run the two concurrently (§2.6).
            prev_counts = self.band_counts()
            delta_keys = F.broadcast(
                delta.select("band_no", "band_val")
            )
            updated = (
                prev_counts.join(
                    delta_keys, ["band_no", "band_val"], "semi"
                )
                .unionByName(delta)
                .groupBy("band_no", "band_val")
                .agg(F.sum("n").alias("n"))
                .where(F.col("n") > 0)
            )
            merged_counts_plan = prev_counts.join(
                delta_keys, ["band_no", "band_val"], "left_anti"
            ).unionByName(updated)
            with ThreadPoolExecutor(max_workers=2) as pool:
                f_counts = pool.submit(merged_counts_plan.localCheckpoint)
                if overlap:
                    # split case (module docstring): ids re-ingested
                    # with a CHANGED signature must retract their stale
                    # pairs — unchanged re-ingest re-derives identical
                    # pairs, so the retraction stands down and the fold
                    # stays merge-only (touched-sized join, tiny)
                    changed = (
                        touched_state.select(
                            "id", F.col("dhash").alias("_old")
                        )
                        .join(
                            batch_sigs.select(
                                "id", F.col("dhash").alias("_new")
                            ),
                            "id",
                        )
                        .where(~F.col("_old").eqNullSafe(F.col("_new")))
                        .select("id")
                    )
                    has_changed = not changed.isEmpty()
                    if has_changed:
                        changed = changed.localCheckpoint()
                merged_counts = f_counts.result()
            # the probe join's state side: a PLAN over the state
            # parquet + the batch checkpoint — never materialized (r12;
            # its only consumer is the one banded join below, and the
            # bucketed writes no longer need the merged relation)
            merged_sigs = state_sigs.join(
                touched, "id", "left_anti"
            ).unionByName(batch_sigs)

        # candidates: batch self-pairs + batch vs state, via the probe
        # mode of dhash_pairs — the banded join runs batch-bands ×
        # merged-bands, so accumulated state never re-self-joins (a
        # state-state pair was emitted by an earlier fold)
        new_pairs = dhash_pairs(
            merged_sigs,
            max_hamming=self.max_hamming,
            band_bytes=self.band_bytes,
            max_bucket=self.max_bucket,
            n_blocks=self.n_blocks,
            probe=batch_sigs,
            band_counts=merged_counts,
        ).localCheckpoint()

        # bucketed write plans (``streaming/dedup_index.py`` has the
        # full argument): an append-only fold appends the batch
        # relations verbatim (a new pair always has a batch-side
        # endpoint not in state, so it cannot collide with a logged
        # pair; dhash_pairs output is (lid, rid)-unique); a re-ingest
        # fold rewrites only the buckets holding retracted rows
        v = self.version()
        nv = v + 1
        live_pairs = None
        if first or not overlap:
            rb_ids: list[int] | None = None if first else []
            rb_pairs: list[int] | None = None if first else []
            sig_data, pair_data = batch_sigs, new_pairs
        else:
            rb_ids = [
                row[0]
                for row in touched_state.select(
                    self._bucket_of(F.col("id")).alias("_b")
                )
                .distinct()
                .collect()
            ]
            sig_data = (
                self._read_buckets("signatures", _SIG_SCHEMA, rb_ids)
                .join(touched, "id", "left_anti")
                .select("id", "blocks", "dhash")
                .unionByName(batch_sigs)
            )
            overlap_ids = touched_state.select("id").distinct()
            ovl = overlap_ids.select(F.col("id").alias("lid"))
            ovr = overlap_ids.select(F.col("id").alias("rid"))
            old_pairs = self.pairs()

            def _touching_lids(pairs_df: DataFrame) -> DataFrame:
                return (
                    pairs_df.join(ovl, "lid", "semi")
                    .select("lid")
                    .unionByName(
                        pairs_df.join(ovr, "rid", "semi").select("lid")
                    )
                )

            rb_pairs = [
                row[0]
                for row in _touching_lids(old_pairs)
                .unionByName(_touching_lids(new_pairs))
                .select(self._bucket_of(F.col("lid")).alias("_b"))
                .distinct()
                .collect()
            ]
            old_rb = self._read_buckets("pairs", _PAIR_SCHEMA, rb_pairs)
            if has_changed:
                # retract every pair touching a changed id; the probe
                # has already re-derived the live ones (every pair with
                # a batch-side endpoint), so retract-then-append is
                # exact
                old_rb = (
                    old_rb.join(
                        changed.select(F.col("id").alias("lid")), "lid",
                        "left_anti",
                    )
                    .join(
                        changed.select(F.col("id").alias("rid")), "rid",
                        "left_anti",
                    )
                    .select("lid", "rid", "hamming")
                )
            in_rb = (
                self._bucket_of(F.col("lid")).isin(rb_pairs)
                if rb_pairs
                else F.lit(False)
            )
            pair_data = (
                old_rb.unionByName(new_pairs.where(in_rb))
                .groupBy("lid", "rid")
                .agg(F.min("hamming").alias("hamming"))
                .unionByName(new_pairs.where(~in_rb))
            )
            if has_changed:
                # the split-case component rebuild reads the FULL live
                # log — a plan over the state parquet + the new-pair
                # checkpoint
                live_pairs = (
                    old_pairs.join(
                        changed.select(F.col("id").alias("lid")), "lid",
                        "left_anti",
                    )
                    .join(
                        changed.select(F.col("id").alias("rid")), "rid",
                        "left_anti",
                    )
                    .select("lid", "rid", "hamming")
                    .unionByName(new_pairs)
                )
        from nomenklatura_spark.resolver.components import (
            fold_components_incremental,
        )

        # the data writes are independent of the component fold — run
        # them beside it (§2.6); the component write chains after its
        # fold in the same worker, so the fold wall is
        # max(writes, CC + comps write), not the sum
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
                    merged_pairs=live_pairs,
                    changed=changed if has_changed else None,
                )
            _write(merged_comps, "components")

        with ThreadPoolExecutor(max_workers=4) as pool:
            futs = [
                pool.submit(
                    self._write_bucketed, "signatures", nv, sig_data,
                    "id", rb_ids,
                ),
                pool.submit(
                    self._write_bucketed, "pairs", nv, pair_data,
                    "lid", rb_pairs,
                ),
                pool.submit(_write, merged_counts, "band_counts"),
                pool.submit(_fold_and_write_comps),
            ]
            for f in futs:
                f.result()
        self._bump(nv)
        return new_pairs

    def delete(self, ids: DataFrame) -> None:
        """Remove assets from the index outright — the DELETION half of
        the G10 rule, bounded like the changed-content upsert
        (``streaming/dedup_index.py`` has the full contract): the
        signatures, the band-histogram contributions and every pair
        touching a deleted id are retracted, and only the components
        holding a deleted id are re-derived from the retracted log
        (``fold_components_incremental``'s split case with no new
        pairs) — post-delete state is bit-identical to a from-scratch
        build over the remaining assets (pytest-pinned).  Absent ids
        are ignored (redelivery no-op); an empty id set does not bump
        the version.  ``ids``: one-column DataFrame of asset ids."""
        from nomenklatura_spark.resolver.components import (
            fold_components_incremental,
        )

        gone = (
            ids.select(F.col(ids.columns[0]).cast("long").alias("id"))
            .distinct()
            .localCheckpoint()
        )
        if gone.isEmpty():
            return
        v = self.version()
        nv = v + 1
        state_sigs = self.signatures()
        gone_counts = band_bucket_counts(
            state_sigs.join(gone, "id", "semi"),
            self.band_bytes,
            self.n_blocks,
        ).localCheckpoint()
        prev_counts = self.band_counts()
        merged_counts = (
            prev_counts.join(
                F.broadcast(gone_counts.select("band_no", "band_val")),
                ["band_no", "band_val"],
                "left_anti",
            )
            .unionByName(
                prev_counts.withColumnRenamed("n", "_prev")
                .join(F.broadcast(gone_counts), ["band_no", "band_val"])
                .select(
                    "band_no",
                    "band_val",
                    (F.col("_prev") - F.col("n")).alias("n"),
                )
                .where(F.col("n") > 0)
            )
        )
        # bucketed retraction: only the buckets holding a deleted id's
        # rows are rewritten; the rest hardlink (``_write_bucketed``)
        gone_l = gone.select(F.col("id").alias("lid"))
        gone_r = gone.select(F.col("id").alias("rid"))
        rb_ids = [
            row[0]
            for row in state_sigs.join(gone, "id", "semi")
            .select(self._bucket_of(F.col("id")).alias("_b"))
            .distinct()
            .collect()
        ]
        old_pairs = self.pairs()
        rb_pairs = [
            row[0]
            for row in old_pairs.join(gone_l, "lid", "semi")
            .select("lid")
            .unionByName(
                old_pairs.join(gone_r, "rid", "semi").select("lid")
            )
            .select(self._bucket_of(F.col("lid")).alias("_b"))
            .distinct()
            .collect()
        ]
        sig_data = (
            self._read_buckets("signatures", _SIG_SCHEMA, rb_ids)
            .join(gone, "id", "left_anti")
            .select("id", "blocks", "dhash")
        )
        pair_data = (
            self._read_buckets("pairs", _PAIR_SCHEMA, rb_pairs)
            .join(gone_l, "lid", "left_anti")
            .join(gone_r, "rid", "left_anti")
            # USING joins move the key column first — restore the
            # relation's declared order before the snapshot write
            .select("lid", "rid", "hamming")
        )
        # the split-case component rebuild reads the FULL live log
        live_pairs = (
            old_pairs.join(gone_l, "lid", "left_anti")
            .join(gone_r, "rid", "left_anti")
            .select("lid", "rid", "hamming")
        )
        merged_comps = fold_components_incremental(
            self.components(),
            self.spark.createDataFrame([], _PAIR_SCHEMA).select(
                "lid", "rid"
            ),
            merged_pairs=live_pairs,
            changed=gone,
        )
        self._write_bucketed("signatures", nv, sig_data, "id", rb_ids)
        self._write_bucketed("pairs", nv, pair_data, "lid", rb_pairs)
        merged_comps.write.mode("overwrite").parquet(
            self._path("components", nv)
        )
        merged_counts.write.mode("overwrite").parquet(
            self._path("band_counts", nv)
        )
        self._bump(nv)

    def serve_keep_list(self) -> DataFrame:
        """(asset_id, keep) from state alone: one deterministic keeper
        (min asset id) per near-dup component; assets in no component
        (no near-dup found) are not listed — they trivially survive.
        The keep-list is what a training-data materialization anti-joins
        its media table against."""
        comp = self.components()
        return comp.select(
            F.col("node").alias("asset_id"),
            (F.col("node") == F.col("component")).alias("keep"),
        )


def maintain_media_dedup_stream(
    stream: DataFrame,
    state: MediaDedupIndexState,
    id_col: str = "asset_id",
    payload_col: str = "payload",
    checkpoint_dir: str | None = None,
    trigger_once: bool = False,
    tombstone_col: str | None = None,
) -> StreamingQuery:
    """Structured Streaming driver: each micro-batch of assets folds
    into the media dedup index via ``foreachBatch`` (multi-relation
    snapshot swap — sinks can't express it).  Replay-idempotent, so no
    batch guard (module docstring).  ``tombstone_col`` names an
    optional boolean column for CDC-shaped feeds: true rows DELETE
    their asset (``delete`` — the G10 deletion path), others upsert;
    within one micro-batch tombstones win over upserts of the same id
    (``streaming/dedup_index.maintain_dedup_stream`` has the
    contract)."""

    def _process(batch: DataFrame, batch_id: int) -> None:
        if tombstone_col is None:
            state.apply_batch(batch, id_col, payload_col)
            return
        dead = batch.where(F.col(tombstone_col)).select(id_col)
        live = batch.where(
            ~F.coalesce(F.col(tombstone_col), F.lit(False))
        )
        if not live.isEmpty():
            state.apply_batch(live, id_col, payload_col)
        state.delete(dead)

    return start_maintenance_stream(stream, _process, checkpoint_dir,
                                    trigger_once)
