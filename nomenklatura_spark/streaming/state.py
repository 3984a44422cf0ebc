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
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery


class VersionedState:
    """Crash-safe versioned parquet snapshots with a VERSION pointer."""

    def __init__(self, spark: SparkSession, state_dir: str) -> None:
        self.spark = spark
        self.state_dir = state_dir
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
