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

from pyspark.sql import DataFrame, SparkSession


class VersionedState:
    """Crash-safe versioned parquet snapshots with a VERSION pointer."""

    def __init__(self, spark: SparkSession, state_dir: str) -> None:
        self.spark = spark
        self.state_dir = state_dir
        os.makedirs(state_dir, exist_ok=True)

    @property
    def _version_file(self) -> str:
        return os.path.join(self.state_dir, "VERSION")

    def _pointer(self) -> tuple[int, int]:
        try:
            with open(self._version_file) as fh:
                parts = fh.read().split()
        except FileNotFoundError:
            return -1, -1
        version = int(parts[0])
        batch = int(parts[1]) if len(parts) > 1 else -1
        return version, batch

    def version(self) -> int:
        return self._pointer()[0]

    def last_batch(self) -> int:
        """Highest streaming batch id folded in so far (-1 if none)."""
        return self._pointer()[1]

    def _path(self, rel: str, version: int) -> str:
        return os.path.join(self.state_dir, rel, f"v{version}")

    def _bump(self, version: int, batch_id: int | None = None) -> None:
        if batch_id is None:
            batch_id = self.last_batch()
        tmp = self._version_file + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(f"{version} {batch_id}")
        os.replace(tmp, self._version_file)

    def _read(
        self, rel: str, schema: str, version: int | None = None
    ) -> DataFrame:
        v = self.version() if version is None else version
        path = self._path(rel, v)
        if v < 0 or not os.path.exists(path):
            return self.spark.createDataFrame([], schema)
        return self.spark.read.parquet(path)
