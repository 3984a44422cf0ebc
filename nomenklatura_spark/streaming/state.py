"""Shared snapshot plumbing for the incrementally-maintained indexes.

Every maintained index (blocking entries, MinHash-LSH dedup, IVF
vectors, vocabulary) stores its relations as versioned parquet
snapshots behind a single VERSION pointer file: writers lay down the
new ``v{N}`` directories first and swap the pointer last with an atomic
rename, so a crash mid-write leaves the previous version intact and
readers never see a torn snapshot (time travel = read an older N).  On
a cluster the same call sites become Delta tables and the pointer
becomes the Delta log.

The pointer also records the last-applied Structured Streaming batch
id.  ``foreachBatch`` delivery is at-least-once: a crash between the
snapshot swap and the streaming checkpoint commit redelivers the same
micro-batch.  Upsert-by-key states are naturally replay-idempotent and
can ignore it; ADDITIVE states (the vocabulary's counter merge) must
skip batches at or below ``last_batch()`` or redelivery double-counts.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

# Hash-bucket count for the big key-partitioned state relations
# (signatures/bands/pairs of the dedup indexes).  Scale-dependent:
# size so one bucket is a sensible rewrite unit (~a Delta file's worth
# of rows); the local default keeps file counts small at test scale.
# On a cluster this is a deployment conf, like Delta's file sizing.
DEFAULT_STATE_BUCKETS = int(os.environ.get("NK_STATE_BUCKETS", "16"))


class VersionedState:
    """Crash-safe versioned parquet snapshots with a VERSION pointer."""

    def __init__(self, spark: SparkSession, state_dir: str) -> None:
        self.spark = spark
        self.state_dir = state_dir
        self.n_buckets = DEFAULT_STATE_BUCKETS
        os.makedirs(state_dir, exist_ok=True)

    @property
    def _version_file(self) -> str:
        return os.path.join(self.state_dir, "VERSION")

    def _pointer(self) -> tuple[int, int, str]:
        try:
            with open(self._version_file) as fh:
                parts = fh.read().split()
        except FileNotFoundError:
            return -1, -1, ""
        version = int(parts[0])
        batch = int(parts[1]) if len(parts) > 1 else -1
        scope = parts[2] if len(parts) > 2 else ""
        return version, batch, scope

    def version(self) -> int:
        return self._pointer()[0]

    def last_batch(self, scope: str = "") -> int:
        """Highest streaming batch id folded in so far (-1 if none).
        Batch ids are only comparable within one stream incarnation
        (Spark restarts numbering per checkpoint), so the guard is keyed
        by ``scope`` — a different scope (new checkpoint dir) reads as
        -1 and the replay guard stands down instead of silently dropping
        a fresh stream's first batches."""
        _, batch, stored = self._pointer()
        return batch if stored == scope else -1

    def _path(self, rel: str, version: int) -> str:
        return os.path.join(self.state_dir, rel, f"v{version}")

    def _bump(
        self,
        version: int,
        batch_id: int | None = None,
        scope: str = "",
    ) -> None:
        if batch_id is None:
            _, batch_id, stored = self._pointer()
            scope = stored
        tmp = self._version_file + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(f"{version} {batch_id} {scope}".rstrip())
        os.replace(tmp, self._version_file)

    def _read(
        self, rel: str, schema: str, version: int | None = None
    ) -> DataFrame:
        v = self.version() if version is None else version
        if v < 0:
            return self.spark.createDataFrame([], schema)
        # deliberately NOT lenient for v >= 0: VERSION pointing at a
        # missing snapshot is state corruption (partial deletion, wrong
        # state_dir) and must fail loudly, not read as an empty index.
        # (A version below the vacuum horizon also lands here — time
        # travel past vacuum(keep_last) is gone by design, like Delta.)
        return self.spark.read.parquet(self._path(rel, v))

    # -- bucketed relations -------------------------------------------------
    #
    # The big key-partitioned relations (dedup signatures/bands/pairs)
    # are stored hash-BUCKETED by key (``_bucket = pmod(xxhash64(key),
    # n_buckets)`` partition directories) and each new version is
    # assembled file-wise, the local analog of a Delta ``MERGE INTO``'s
    # copy-on-write: bucket directories whose rows are untouched by the
    # fold are HARDLINKED from the previous version (metadata-only, the
    # parquet bytes are shared), buckets that lose rows (a retraction /
    # delete) are rewritten from a partition-PRUNED read of just those
    # buckets, and the batch's new rows are appended as fresh files.
    # An append-only fold (no touched id previously in state — the
    # steady-state ingest case) therefore writes O(batch) bytes per
    # fold regardless of state size, where the pre-r12 layout re-read
    # and re-wrote the whole relation every fold.  Every version
    # directory stays COMPLETE (hardlinks count as files), so the
    # crash-safe pointer swap, time travel and ``vacuum`` are unchanged
    # — vacuum's rmtree drops directory entries and the shared bytes
    # live until the last version referencing them goes.

    def _bucket_of(self, col: "F.Column") -> "F.Column":
        return F.pmod(F.xxhash64(col), F.lit(self.n_buckets)).cast("int")

    @staticmethod
    def _has_parquet(path: str) -> bool:
        for root, _dirs, files in os.walk(path):
            if any(f.endswith(".parquet") for f in files):
                return True
        return False

    def _read_bucketed(
        self, rel: str, schema: str, version: int | None = None
    ) -> DataFrame:
        """Read a bucketed relation, dropping the ``_bucket`` partition
        column (the declared relation schema is bucket-free)."""
        v = self.version() if version is None else version
        if v < 0:
            return self.spark.createDataFrame([], schema)
        path = self._path(rel, v)
        if not os.path.isdir(path):
            # same loud contract as _read: a missing snapshot at a live
            # version is state corruption
            return self.spark.read.parquet(path)
        if not self._has_parquet(path):
            # a version can legitimately hold zero rows (partitioned
            # writes lay down no data files for an empty frame)
            return self.spark.createDataFrame([], schema)
        cols = self.spark.createDataFrame([], schema).columns
        return self.spark.read.parquet(path).select(*cols)

    def _read_buckets(
        self, rel: str, schema: str, buckets: list[int],
        version: int | None = None,
    ) -> DataFrame:
        """Partition-pruned read of just ``buckets`` — the rewrite
        side of a fold reads only the directories it will rewrite."""
        v = self.version() if version is None else version
        if v < 0 or not buckets:
            return self.spark.createDataFrame([], schema)
        path = self._path(rel, v)
        if not self._has_parquet(path):
            return self.spark.createDataFrame([], schema)
        cols = self.spark.createDataFrame([], schema).columns
        return (
            self.spark.read.parquet(path)
            .where(F.col("_bucket").isin(buckets))
            .select(*cols)
        )

    def _write_bucketed(
        self,
        rel: str,
        new_version: int,
        data: DataFrame,
        key: str,
        rewrite_buckets: list[int] | None,
    ) -> None:
        """Assemble ``rel/v{new_version}``: hardlink every bucket of
        the previous version NOT named in ``rewrite_buckets``, then
        append ``data`` (hash-partitioned by bucket of ``key``).

        ``rewrite_buckets=None`` carries nothing over (bootstrap or a
        full rewrite); ``[]`` carries everything (pure append).  The
        caller guarantees ``data`` holds the complete new content of
        every bucket in ``rewrite_buckets`` plus only NEW rows for the
        carried buckets."""
        dst = self._path(rel, new_version)
        if os.path.exists(dst):
            # orphan from a crashed fold (laid down, pointer never
            # swapped) — same tolerated-orphan contract as the
            # non-bucketed writers' mode("overwrite")
            shutil.rmtree(dst)
        os.makedirs(dst, exist_ok=True)
        src = self._path(rel, new_version - 1)
        if rewrite_buckets is not None and os.path.isdir(src):
            skip = {f"_bucket={b}" for b in rewrite_buckets}
            for d in os.listdir(src):
                if not d.startswith("_bucket=") or d in skip:
                    continue
                sdir = os.path.join(src, d)
                if not os.path.isdir(sdir):
                    continue
                ddir = os.path.join(dst, d)
                os.makedirs(ddir, exist_ok=True)
                for fname in os.listdir(sdir):
                    if fname.startswith(("_", ".")):
                        continue
                    spath = os.path.join(sdir, fname)
                    dpath = os.path.join(ddir, fname)
                    try:
                        os.link(spath, dpath)
                    except OSError:
                        shutil.copy2(spath, dpath)
        (
            data.withColumn("_bucket", self._bucket_of(F.col(key)))
            # one small shuffle of the (batch-sized) write set so each
            # bucket lands in ~one file instead of tasks x buckets
            .repartition(self.n_buckets, "_bucket")
            .write.mode("append")
            .partitionBy("_bucket")
            .parquet(dst)
        )

    def vacuum(self, keep_last: int = 2) -> list[str]:
        """Delete snapshot directories older than the newest
        ``keep_last`` versions — the Delta VACUUM analog for the
        maintained indexes, whose every ``apply_batch`` lays down a new
        ``v{N}`` set and never removes the old one (time travel).
        Without vacuuming, state storage grows with versions × relation
        size; a deployment runs this on a retention schedule.

        Only ``v{N}`` directories under the state's relation
        subdirectories are touched — non-versioned layouts (the BM25
        index's batch-partitioned postings root) hold live data for
        EVERY version and are left alone.  The current version is
        always kept (``keep_last`` is clamped to >= 1); reading a
        vacuumed version afterwards fails loudly (the horizon moved).
        Returns the removed directory paths."""
        import shutil

        v = self.version()
        if v < 0:
            return []
        cutoff = v - max(keep_last, 1) + 1
        removed: list[str] = []
        for rel in sorted(os.listdir(self.state_dir)):
            reldir = os.path.join(self.state_dir, rel)
            if not os.path.isdir(reldir):
                continue
            for d in sorted(os.listdir(reldir)):
                if (
                    d.startswith("v")
                    and d[1:].isdigit()
                    and int(d[1:]) < cutoff
                ):
                    target = os.path.join(reldir, d)
                    shutil.rmtree(target)
                    removed.append(target)
        return removed


def start_maintenance_stream(
    stream: DataFrame,
    process: Callable[[DataFrame, int], None],
    checkpoint_dir: str | None = None,
    trigger_once: bool = False,
) -> StreamingQuery:
    """Shared foreachBatch writer wiring for the maintained indexes
    (the snapshot merges are multi-relation transactions no sink can
    express).  ``trigger_once`` drains the backlog and terminates
    (availableNow) for cron-style catch-up runs."""
    writer = stream.writeStream.foreachBatch(process)
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
