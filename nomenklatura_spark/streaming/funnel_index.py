"""Incrementally-maintained ordered-funnel index (§2.12).

Batch ``operators/temporal.funnel_steps`` rescans the event history per
query; an ingest pipeline instead folds each micro-batch into per-user
SUFFICIENT state and answers funnel counts from state that is
O(users x steps + a bounded tail of candidate times), however large the
history grows.

Exactness under out-of-order arrival — the part that makes a streaming
funnel hard — rests on one monotonicity argument.  Let q_i be step i's
first qualifying touch (q_1 = min step-1 time; q_i = min step-i time
strictly after q_{i-1}, inside the horizon q_1 + W when set).  Late
data can only LOWER q_1, and therefore only lower each q_i in turn
(the eligible set {t > q_{i-1}} only widens downward, and min over a
superset never grows).  So a step-i time ABOVE the current q_i can
never become the answer, and the state may prune it; a time below the
current q_i must be kept, because a later batch may lower q_{i-1} past
it.  Step 1 needs only its minimum.  The horizon cut
``t <= q_1 + W`` is safe for the same reason: q_1 only decreases, so
the horizon only tightens, and a time outside it now is outside it
forever.  Users that have later-step events but no step-1 event yet
keep those times un-pruned (no q_1, no bound exists) — the one
documented unbounded corner, sized by that user's own event count.

Merging a batch = distinct-union + re-derive q + re-prune, which is
IDEMPOTENT: re-folding a delivered batch re-adds rows the prune already
rejected and rejects them again, so foreachBatch's at-least-once
redelivery is absorbed by algebra (the HLL-index property) — the
replay guard is honored when supplied but correctness never depends on
it.

State is versioned parquet snapshots behind the shared VERSION pointer
(`streaming/state.py`); on a cluster the merge becomes a Delta MERGE
on (u, step, t) plus a partition-overwrite of the pruned tail.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming import StreamingQuery

from nomenklatura_spark.streaming.state import (
    VersionedState,
    start_maintenance_stream,
)

_TIMES_SCHEMA = "u string, step int, t timestamp"


class FunnelIndexState(VersionedState):
    """Versioned on-disk state: the pruned (u, step, t) candidate-time
    relation for one funnel definition (fixed ``steps`` and ``within``
    per index)."""

    def __init__(
        self,
        spark,
        root: str,
        steps: list[str],
        within: str | None = None,
    ) -> None:
        super().__init__(spark, root)
        self.steps = list(steps)
        self.within = within

    def times(self, version: int | None = None) -> DataFrame:
        return self._read("times", _TIMES_SCHEMA, version)

    def _horizon(self):
        return F.expr(f"q1 + INTERVAL {self.within}")

    def _user_steps(self, times: DataFrame) -> DataFrame:
        """(u, q1..qk): each user's qualifying first-touch chain derived
        from the candidate-time relation — the same iterative
        min-strictly-after reduction as ``funnel_steps``, but over
        state-sized input."""
        k = len(self.steps)
        frames = [
            times.where(F.col("step") == 1)
            .groupBy("u")
            .agg(F.min("t").alias("q1"))
        ]
        for i in range(2, k + 1):
            cand = times.where(F.col("step") == i).join(frames[-1], "u")
            cond = F.col("t") > F.col(f"q{i - 1}")
            if self.within is not None:
                cond = cond & (F.col("t") <= self._horizon())
            frames.append(
                cand.where(cond)
                .groupBy("u", *[f"q{j}" for j in range(1, i)])
                .agg(F.min("t").alias(f"q{i}"))
            )
        out = frames[0]
        for i, fr in enumerate(frames[1:], start=2):
            out = out.join(fr.select("u", f"q{i}"), "u", "left")
        return out

    def apply_batch(
        self,
        df: DataFrame,
        user_col: str = "user_id",
        ts_col: str = "ts",
        type_col: str = "event_type",
        batch_id: int | None = None,
        scope: str = "",
    ) -> DataFrame:
        """Fold one micro-batch of raw events into the candidate-time
        state: distinct-union, re-derive the q chain, re-prune."""
        if batch_id is not None and batch_id <= self.last_batch(scope):
            return self.spark.createDataFrame([], _TIMES_SCHEMA)
        base = df.select(
            F.col(user_col).cast("string").alias("u"),
            F.col(ts_col).cast("timestamp").alias("t"),
            F.col(type_col).alias("et"),
        ).where(F.col("et").isin(self.steps))
        # per-step union, not an et->step map: repeated step names
        # ("view", "view") route one event to several step slots, like
        # the batch operator
        parts = [
            base.where(F.col("et") == s).select(
                "u", F.lit(i).cast("int").alias("step"), "t"
            )
            for i, s in enumerate(self.steps, start=1)
        ]
        batch = parts[0]
        for p in parts[1:]:
            batch = batch.unionByName(p)
        merged = self.times().unionByName(batch).distinct()
        # consumed by the q derivation AND the prune join
        merged = merged.localCheckpoint(eager=True)
        q = self._user_steps(merged)
        k = len(self.steps)
        qarr = F.array(*[F.col(f"q{i}") for i in range(1, k + 1)])
        st = merged.join(q, "u", "left")
        q_step = F.element_at(qarr, F.col("step"))
        keep_first = (F.col("step") == 1) & (F.col("t") == F.col("q1"))
        keep_later = (F.col("step") > 1) & (
            q_step.isNull() | (F.col("t") <= q_step)
        )
        if self.within is not None:
            keep_later = keep_later & (
                F.col("q1").isNull() | (F.col("t") <= self._horizon())
            )
        pruned = st.where(keep_first | keep_later).select("u", "step", "t")
        nv = self.version() + 1
        pruned.write.mode("overwrite").parquet(self._path("times", nv))
        if batch_id is None:
            self._bump(nv)
        else:
            self._bump(nv, batch_id, scope)
        return batch

    def counts(self, version: int | None = None) -> DataFrame:
        """The funnel answer from state alone — identical shape and
        algebra to ``funnel_steps`` (step, event_type, n_users,
        conversion with the zero-step-1 guard), never touching the
        ingested history."""
        from nomenklatura_spark.operators.temporal import (
            finalize_funnel_counts,
        )

        q = self._user_steps(self.times(version))
        rows = [
            q.agg(F.count(F.col(f"q{i}")).alias("n_users")).select(
                F.lit(i).cast("int").alias("step"),
                F.lit(s).alias("event_type"),
                "n_users",
            )
            for i, s in enumerate(self.steps, start=1)
        ]
        out = rows[0]
        for c in rows[1:]:
            out = out.unionByName(c)
        return finalize_funnel_counts(out)


def maintain_funnel_stream(
    stream: DataFrame,
    state: FunnelIndexState,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    checkpoint_dir: str | None = None,
    trigger_once: bool = False,
) -> StreamingQuery:
    """Structured Streaming driver: each micro-batch folds its events
    into the funnel state via ``foreachBatch``."""
    scope = checkpoint_dir or ""

    def _process(batch: DataFrame, batch_id: int) -> None:
        state.apply_batch(
            batch, user_col, ts_col, type_col, batch_id=batch_id, scope=scope
        )

    return start_maintenance_stream(
        stream, _process, checkpoint_dir, trigger_once
    )
