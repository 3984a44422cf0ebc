"""A9/A10/P9 — xref stats, conflicting-match detection, entity deltas.

Behavioral re-expression of:
- xref running stats (``nomenklatura/xref.py:16-26``) — a one-row agg;
- conflicting-match reporting (``nomenklatura/conflicting_match.py:22-32``):
  when two entities both match the same candidate above a threshold but
  carry a NEGATIVE judgement between each other, flag the triangle;
- entity diff vocabulary ADD/MOD/DEL (``nomenklatura/delta.py:1-4``):
  statement-level snapshot comparison.

All three are pure DataFrame ops: the conflict triangle is a self-join of
the match table (bounded — per-candidate match lists are top-K capped
upstream) followed by a join against the negative edge set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

ADD = "ADD"
MOD = "MOD"
DEL = "DEL"


def xref_stats(scored: DataFrame, score_col: str = "score") -> DataFrame:
    """A9 — candidate-score summary (count/avg/min/max)."""
    return scored.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.avg(score_col), 6).alias("avg_score"),
        F.round(F.min(score_col), 6).alias("min_score"),
        F.round(F.max(score_col), 6).alias("max_score"),
    )


def conflicting_matches(
    matches: DataFrame,
    edges: DataFrame,
    threshold: float = 0.5,
) -> DataFrame:
    """A10 — triangles (candidate, left, right) where left and right both
    match ``candidate`` above threshold but are negatively judged against
    each other.

    ``matches``: (matching_id, matches_id, score) — the J2/W1 output.
    ``edges``: resolver edge table.  The match relation is symmetrized
    first (the reference indexes both directions, conflicting_match.py:
    23-25); the pair combination uses ``left < right`` to mirror
    ``itertools.combinations``.
    """
    above = matches.where(F.col("score") > threshold)
    sym = above.select(
        F.col("matching_id").alias("candidate_id"),
        F.col("matches_id").alias("match_id"),
    ).unionByName(
        above.select(
            F.col("matches_id").alias("candidate_id"),
            F.col("matching_id").alias("match_id"),
        )
    ).distinct()
    l = sym.select("candidate_id", F.col("match_id").alias("left_id"))
    r = sym.select("candidate_id", F.col("match_id").alias("right_id"))
    combos = l.join(r, "candidate_id").where(F.col("left_id") < F.col("right_id"))
    negative = (
        edges.where(F.col("deleted_at").isNull())
        .where(F.col("judgement") == "negative")
        .select(
            F.least("target", "source").alias("left_id"),
            F.greatest("target", "source").alias("right_id"),
        )
    )
    return combos.join(negative, ["left_id", "right_id"]).select(
        "candidate_id", "left_id", "right_id"
    )


def entity_delta(old: DataFrame, new: DataFrame) -> DataFrame:
    """P9 — per-entity ADD/MOD/DEL between two statement snapshots.

    An entity is ADD if it only exists in ``new``, DEL if only in
    ``old``, MOD if present in both with a differing statement-id set.
    Statement identity is the content-hash ``id`` column, so the compare
    is two aggregations + one full outer join on entity id — no
    row-by-row diffing.
    """
    o = old.groupBy("canonical_id").agg(
        F.array_sort(F.collect_set("id")).alias("o_ids")
    )
    n = new.groupBy("canonical_id").agg(
        F.array_sort(F.collect_set("id")).alias("n_ids")
    )
    joined = o.join(n, "canonical_id", "full_outer")
    return (
        joined.select(
            "canonical_id",
            F.when(F.col("o_ids").isNull(), F.lit(ADD))
            .when(F.col("n_ids").isNull(), F.lit(DEL))
            .when(F.col("o_ids") != F.col("n_ids"), F.lit(MOD))
            .alias("op"),
        )
        .where(F.col("op").isNotNull())
    )
