"""Custom stateful streaming operator: cross-batch statement dedup.

The reference's stores are upsert sinks — a statement (content-hash id)
arriving twice must not duplicate (``store/sql.py:125-150`` ON CONFLICT,
SO4).  In a streaming ingest that requires *state*: per entity, the set
of statement ids already emitted.  ``dropDuplicates`` on a stream keeps
unbounded global state with no eviction control; this operator owns its
state explicitly via ``applyInPandasWithState`` (the brief's designated
mechanism for custom stateful ops):

- grouped by ``canonical_id`` — state stays small per key and co-located
  with the shuffle partition that processes the entity anyway;
- state = sorted list of seen statement ids (content hashes);
- processing-time timeout evicts idle entities' state, bounding total
  state by the *active* entity set, not the corpus.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "seen array<string>"


def dedupe_stream(
    stmts: DataFrame,
    key_col: str = "canonical_id",
    id_col: str = "id",
    timeout_ms: int = 3_600_000,
) -> DataFrame:
    """Emit each (key, id) statement at most once across micro-batches.

    Output schema mirrors the input.  State per key is evicted after
    ``timeout_ms`` of processing-time inactivity — re-arrivals after
    eviction re-emit (at-least-once downstream is assumed to upsert, as
    every sink in this engine does).
    """
    out_schema = stmts.schema

    def _dedupe(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        seen: set[str] = set(state.get[0]) if state.exists else set()
        for pdf in pdfs:
            fresh = pdf[~pdf[id_col].isin(seen)]
            fresh = fresh.drop_duplicates(subset=[id_col])
            if len(fresh):
                seen.update(fresh[id_col])
                yield fresh
        state.update((sorted(seen),))
        state.setTimeoutDuration(timeout_ms)

    return stmts.groupBy(key_col).applyInPandasWithState(
        _dedupe,
        outputStructType=out_schema,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
