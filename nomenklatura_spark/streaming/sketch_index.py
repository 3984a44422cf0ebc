"""Incrementally-maintained count-min and histogram sketches (§2.12).

Completes the incremental sketch tier next to ``hll_index``: every
member of the sketch family (HLL distinct, CMS heavy-hitter counts,
fixed-bin histogram quantiles) can be maintained as a materialised view
over an append-only stream, so distinct/frequency/quantile questions
never rescan ingested history.

Unlike the max-merged HLL registers, BOTH of these merge by SUM —
additive state needs the batch-id replay guard (the
``vocab_index`` discipline): foreachBatch redelivery after a crash
between snapshot swap and checkpoint commit must not double-count.

The histogram index additionally carries its bounds contract IN the
state (a 1-row bounds snapshot written at creation): every increment
must bin against the SAME (lo, hi) frame or the bin-wise sum is
meaningless.  ``apply_batch`` reuses the stored bounds; values outside
them clip into the edge bins (the operator's documented behavior for
foreign-bounds increments).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming import StreamingQuery

from nomenklatura_spark.operators.sketch import (
    cms_sketch,
    hist_quantile,
    hist_sketch,
)
from nomenklatura_spark.streaming.state import (
    VersionedState,
    start_maintenance_stream,
)

_CMS_SCHEMA = "d int, bucket int, cnt long"
_HIST_SCHEMA = "key string, bin int, cnt long"
_BOUNDS_SCHEMA = "lo double, hi double"


class CmsIndexState(VersionedState):
    """Versioned on-disk count-min counters for one sketch family
    (fixed depth/width/prefix per index)."""

    def __init__(self, spark, root: str, depth: int = 4, width: int = 1024,
                 prefix: str = "cms"):
        super().__init__(spark, root)
        self.depth, self.width, self.prefix = depth, width, prefix

    def counters(self, version: int | None = None) -> DataFrame:
        return self._read("counters", _CMS_SCHEMA, version)

    def lookup(self, items: DataFrame, value_col: str) -> DataFrame:
        from nomenklatura_spark.operators.sketch import cms_lookup

        return cms_lookup(
            self.counters(), items, value_col,
            self.depth, self.width, self.prefix,
        )

    def apply_batch(
        self,
        df: DataFrame,
        value_col: str,
        weight_col: str | None = None,
        batch_id: int | None = None,
        scope: str = "",
    ) -> DataFrame:
        if batch_id is not None and batch_id <= self.last_batch(scope):
            return self.spark.createDataFrame([], _CMS_SCHEMA)
        batch = cms_sketch(
            df, value_col, self.depth, self.width, self.prefix, weight_col
        ).select("d", "bucket", F.col("cnt").cast("long").alias("cnt"))
        merged = (
            self.counters()
            .unionByName(batch)
            .groupBy("d", "bucket")
            .agg(F.sum("cnt").alias("cnt"))
        )
        nv = self.version() + 1
        merged.write.mode("overwrite").parquet(self._path("counters", nv))
        if batch_id is None:
            self._bump(nv)
        else:
            self._bump(nv, batch_id, scope)
        return batch


class HistIndexState(VersionedState):
    """Versioned on-disk histogram bins keyed by ``key``, bound to ONE
    (lo, hi) frame fixed at index creation."""

    def __init__(self, spark, root: str, n_bins: int = 32):
        super().__init__(spark, root)
        self.n_bins = n_bins

    def _bounds_path(self) -> str:
        # NOT a versioned v{N} layout: vacuum() deletes stale v{N} dirs
        # under every relation subdir, and the bounds contract is live
        # data for EVERY version — a v0 placement would be deleted by
        # the first retention pass and permanently brick the index
        import os

        return os.path.join(self.state_dir, "bounds_meta")

    def set_bounds(self, lo: float, hi: float) -> None:
        """Fix the bounds contract; must happen once, before the first
        batch (bin-wise sums across differing frames are meaningless)."""
        if self.version() >= 0:
            raise ValueError("bounds must be fixed before the first batch")
        self.spark.createDataFrame([(float(lo), float(hi))], _BOUNDS_SCHEMA) \
            .write.mode("overwrite").parquet(self._bounds_path())

    def bounds(self) -> DataFrame:
        return self.spark.read.schema(_BOUNDS_SCHEMA).parquet(
            self._bounds_path()
        )

    def bins(self, version: int | None = None) -> DataFrame:
        return self._read("bins", _HIST_SCHEMA, version)

    def quantile(self, q: float) -> DataFrame:
        return hist_quantile(
            self.bins(), self.bounds(), ["key"], q, self.n_bins
        ).orderBy("key")

    def apply_batch(
        self,
        df: DataFrame,
        key_col: str,
        value_col: str,
        batch_id: int | None = None,
        scope: str = "",
    ) -> DataFrame:
        if batch_id is not None and batch_id <= self.last_batch(scope):
            return self.spark.createDataFrame([], _HIST_SCHEMA)
        batch = hist_sketch(
            df.select(F.col(key_col).cast("string").alias("key"), value_col),
            ["key"],
            value_col,
            self.bounds(),
            self.n_bins,
        ).select("key", "bin", F.col("cnt").cast("long").alias("cnt"))
        merged = (
            self.bins()
            .unionByName(batch)
            .groupBy("key", "bin")
            .agg(F.sum("cnt").alias("cnt"))
        )
        nv = self.version() + 1
        merged.write.mode("overwrite").parquet(self._path("bins", nv))
        if batch_id is None:
            self._bump(nv)
        else:
            self._bump(nv, batch_id, scope)
        return batch


def maintain_cms_stream(
    stream: DataFrame,
    state: CmsIndexState,
    value_col: str,
    weight_col: str | None = None,
    checkpoint_dir: str | None = None,
    trigger_once: bool = False,
) -> StreamingQuery:
    scope = checkpoint_dir or ""

    def _process(batch: DataFrame, batch_id: int) -> None:
        state.apply_batch(
            batch, value_col, weight_col, batch_id=batch_id, scope=scope
        )

    return start_maintenance_stream(stream, _process, checkpoint_dir, trigger_once)


def maintain_hist_stream(
    stream: DataFrame,
    state: HistIndexState,
    key_col: str,
    value_col: str,
    checkpoint_dir: str | None = None,
    trigger_once: bool = False,
) -> StreamingQuery:
    scope = checkpoint_dir or ""

    def _process(batch: DataFrame, batch_id: int) -> None:
        state.apply_batch(batch, key_col, value_col, batch_id=batch_id, scope=scope)

    return start_maintenance_stream(stream, _process, checkpoint_dir, trigger_once)


_CAND_SCHEMA = "value string"


class HeavyHittersIndexState(VersionedState):
    """CMS counters plus a PROVABLY-capturing candidate set, maintained
    together — the serving form of heavy hitters: "top-k right now"
    answered from state, never by rescanning ingested history.

    A count-min sketch alone cannot serve top-k (it answers point
    queries; it has no key list).  The candidate rule here is the
    distributed pigeonhole device: every batch contributes the keys
    whose BATCH-LOCAL count reaches ``local_threshold`` T.  After B
    batches, any key with global count >= B*T must have reached T in at
    least one batch (counts can't all be below T and sum past B*T), so
    the stored candidate set provably contains every key that heavy —
    an executable epsilon like ``hll_pairwise_union``'s key cap, not a
    heuristic.  Candidate state is bounded by sum_b(|batch_b| / T) keys;
    keys lighter than B*T may be absent (the documented one-sided miss).

    Serving = CMS point estimates over the stored candidates, ordered
    by (estimate desc, value): estimates are exact-BIGINT one-sided
    overcounts, so the true count of every served key is <= its
    displayed estimate.  Both relations are written BEFORE the single
    VERSION bump, so a crash mid-fold leaves the previous snapshot
    consistent (counters and candidates never skew); additive CMS
    counters get the batch-id replay guard, and the candidate union is
    naturally idempotent (distinct set union).
    """

    def __init__(self, spark, root: str, depth: int = 4, width: int = 1024,
                 prefix: str = "cms", local_threshold: int = 10):
        super().__init__(spark, root)
        self.depth, self.width, self.prefix = depth, width, prefix
        self.local_threshold = local_threshold

    def counters(self, version: int | None = None) -> DataFrame:
        return self._read("counters", _CMS_SCHEMA, version)

    def candidates(self, version: int | None = None) -> DataFrame:
        return self._read("candidates", _CAND_SCHEMA, version)

    def apply_batch(
        self,
        df: DataFrame,
        value_col: str,
        batch_id: int | None = None,
        scope: str = "",
    ) -> None:
        if batch_id is not None and batch_id <= self.last_batch(scope):
            return
        vals = df.select(F.col(value_col).cast("string").alias("value"))
        batch_sketch = cms_sketch(vals, "value", self.depth, self.width,
                                  self.prefix).select(
            "d", "bucket", F.col("cnt").cast("long").alias("cnt")
        )
        merged = (
            self.counters()
            .unionByName(batch_sketch)
            .groupBy("d", "bucket")
            .agg(F.sum("cnt").alias("cnt"))
        )
        local_heavy = (
            vals.groupBy("value")
            .agg(F.count(F.lit(1)).alias("c"))
            .where(F.col("c") >= self.local_threshold)
            .select("value")
        )
        cands = self.candidates().union(local_heavy).distinct()
        nv = self.version() + 1
        merged.write.mode("overwrite").parquet(self._path("counters", nv))
        cands.write.mode("overwrite").parquet(self._path("candidates", nv))
        if batch_id is None:
            self._bump(nv)
        else:
            self._bump(nv, batch_id, scope)

    def serve_topk(self, k: int) -> DataFrame:
        """Top-k candidates by CMS estimate, from state alone."""
        from nomenklatura_spark.operators.sketch import cms_lookup

        est = cms_lookup(
            self.counters(), self.candidates(), "value",
            self.depth, self.width, self.prefix,
        )
        return est.orderBy(F.desc("n_cms"), "value").limit(k)
