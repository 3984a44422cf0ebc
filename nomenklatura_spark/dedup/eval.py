"""Pairwise clustering evaluation — precision/recall/F1 of a predicted
clustering against a gold labeling WITHOUT enumerating pairs.

Every dedup tier (exact, MinHash, SimHash, containment, embedding)
ultimately emits a clustering, and the operational question is always
"how does the cheap clustering score against the trusted one?" — e.g.
near-dup components against exact-duplicate gold, or a re-tuned LSH
against last month's accepted merges.  The reference evaluates its
matchers the same pairwise way in its training replay (
/root/reference/nomenklatura/matching/train.py — precision/recall over
judged pairs); this applies that metric to whole clusterings at corpus
scale.

The trick that makes it 100 TB-safe: pairwise counts need only
CLUSTER-SIZE aggregates, never the pairs themselves —

- gold pairs   ``G = sum_i C(g_i, 2)`` over gold-cluster sizes,
- predicted    ``P = sum_j C(p_j, 2)`` over predicted-cluster sizes,
- true positives ``TP = sum_ij C(n_ij, 2)`` over the CONTINGENCY
  counts (documents sharing gold cluster i AND predicted cluster j) —
  a pair is in both clusterings iff both endpoints share an (i, j)
  cell, so each cell contributes exactly C(n_ij, 2) agreeing pairs.

Three partial-agg groupBys on (gold), (pred), (gold, pred) — no join
ever touches a pair, so a 10^9-document corpus with million-document
clusters costs three label-keyed shuffles (the quadratic pair space is
never materialized).  All counts are exact BIGINT; the only divisions
are the final three ratios, emitted rounded (house
round-before-compare rule).  F1 uses the exact identity
``2*TP / (G + P)`` (= 2PR/(P+R) after substituting P = TP/P_pairs,
R = TP/G_pairs), so it never compounds rounded intermediates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _pair_count(sizes: DataFrame, n_col: str, out: str) -> DataFrame:
    """One-row frame: sum of C(n, 2) over a cluster-size relation."""
    return sizes.agg(
        F.coalesce(
            F.sum((F.col(n_col) * (F.col(n_col) - F.lit(1))) / F.lit(2)),
            F.lit(0),
        )
        .cast("bigint")
        .alias(out)
    )


def pairwise_cluster_metrics(
    labels: DataFrame,
    gold_col: str = "gold",
    pred_col: str = "pred",
) -> DataFrame:
    """One-row (tp_pairs, gold_pairs, pred_pairs, pair_precision,
    pair_recall, pair_f1) over an (id, gold, pred) labeling.  Zero
    denominators yield 0.0 (an empty prediction has no precision to
    claim), ratios rounded to 6dp."""
    g = labels.groupBy(gold_col).agg(F.count(F.lit(1)).alias("n"))
    p = labels.groupBy(pred_col).agg(F.count(F.lit(1)).alias("n"))
    c = labels.groupBy(gold_col, pred_col).agg(F.count(F.lit(1)).alias("n"))
    out = (
        _pair_count(c, "n", "tp_pairs")
        .crossJoin(_pair_count(g, "n", "gold_pairs"))
        .crossJoin(_pair_count(p, "n", "pred_pairs"))
    )
    safe = lambda num, den: F.when(  # noqa: E731
        den > 0, F.round(num / den, 6)
    ).otherwise(F.lit(0.0))
    return out.select(
        "tp_pairs",
        "gold_pairs",
        "pred_pairs",
        safe(F.col("tp_pairs"), F.col("pred_pairs")).alias("pair_precision"),
        safe(F.col("tp_pairs"), F.col("gold_pairs")).alias("pair_recall"),
        safe(
            F.lit(2) * F.col("tp_pairs"),
            F.col("gold_pairs") + F.col("pred_pairs"),
        ).alias("pair_f1"),
    )
