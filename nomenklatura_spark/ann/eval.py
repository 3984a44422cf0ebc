"""ANN recall evaluation — recall@k of an approximate index against the
brute-force ground truth.

The ANN tier's whole point is trading exactness for cost, and the knob
settings (IVF ``n_probe``, PQ ``m``, LSH band count) are only
defensible with a measured recall curve: pipelines tune the index by
re-running this evaluation per setting, exactly like ``dedup_eval``
closes the loop for the dedup tier.  The operand relations are the
engine's own query rows (brute `cosine_topk` as truth, any approximate
variant as candidate), so the evaluation never re-implements either
side.

Shape: one (query, neighbor) equi-semi-join + a per-query partial-agg
count — output is query-sized.  Determinism: both operands already
break score ties by (rounded score, neighbor id), replayed identically
by their oracles, so the intersection is stable across engines and
partitionings.  At 100 TB the ground truth is the expensive side
(brute force over a sampled query set — the standard practice: recall
is estimated on a few thousand queries, never the full corpus), and
this join costs nothing beyond it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def recall_at_k(
    exact: DataFrame,
    approx: DataFrame,
    k: int,
    query_col: str = "query_id",
    neighbor_col: str = "neighbor_id",
) -> DataFrame:
    """Per-query recall@k: |approx ∩ exact| / k for every query in the
    ground-truth relation (a query the approximate index missed
    entirely scores 0, not absent).  Returns (query_id, hits,
    recall_at_k) with recall rounded to 6dp."""
    e = exact.select(query_col, neighbor_col)
    a = approx.select(query_col, neighbor_col)
    hits = (
        e.join(a, [query_col, neighbor_col], "left_semi")
        .groupBy(query_col)
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    return (
        e.select(query_col)
        .distinct()
        .join(hits, query_col, "left")
        .select(
            query_col,
            F.coalesce("hits", F.lit(0)).cast("bigint").alias("hits"),
            F.round(
                F.coalesce("hits", F.lit(0)) / F.lit(float(k)), 6
            ).alias(f"recall_at_{k}"),
        )
    )
