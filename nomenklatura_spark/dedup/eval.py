"""Pairwise clustering evaluation — precision/recall/F1 of a predicted
clustering against a gold labeling WITHOUT enumerating pairs.

Every dedup tier (exact, MinHash, SimHash, containment, embedding)
ultimately emits a clustering, and the operational question is always
"how does the cheap clustering score against the trusted one?" — e.g.
near-dup components against exact-duplicate gold, or a re-tuned LSH
against last month's accepted merges.  The reference evaluates its
matchers the same pairwise way in its training replay (
/root/reference/nomenklatura/matching/regression_v1/train.py —
precision/recall over judged pairs); this applies that metric to whole
clusterings at corpus scale.

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
    grid_scale: int = 12,
) -> DataFrame:
    """One-row (tp_pairs, gold_pairs, pred_pairs, pair_precision,
    pair_recall, pair_f1, bcubed_precision, bcubed_recall, bcubed_f1)
    over an (id, gold, pred) labeling.  Zero denominators yield 0.0 (an
    empty prediction has no precision to claim), ratios rounded to 6dp.

    BCubed (Amigó et al. 2009 — the clustering metric the ER
    literature prefers, because unlike pairwise it doesn't let one
    giant cluster dominate): per-item precision is
    ``n_ij / |pred_j|``, per-item recall ``n_ij / |gold_i|``, averaged
    over items — which collapses onto the SAME contingency aggregates:
    ``BP = sum_ij n_ij^2 / |p_j| / N`` and
    ``BR = sum_ij n_ij^2 / |g_i| / N``.  No extra shuffle: the cell
    relation joins the two size relations on their label keys.

    Determinism: the per-cell term ``n^2 / size`` is a repeating
    decimal, and a float SUM of those is partition-order-dependent —
    so the sums run on the exact integer grid (house device: each term
    is ``n^2 * 10^12 DIV size`` in DECIMAL(38,0), truncating division;
    the decimal sum is exact and associative, the total truncation
    error is <= cells * 1e-12 / N, far below the 6dp emitted, and any
    engine replays it bit-identically).  Spark's DIV yields BIGINT even
    on DECIMAL operands (verified empirically: the division itself runs
    in decimal, only the RESULT is cast, wrapping silently past int64),
    so each quotient is cast back to DECIMAL(38,0) BEFORE the sum — the
    terms are ~n*10^grid_scale and an int64 accumulation would overflow
    past ~9.2e6 items, while the decimal sum matches DuckDB's HUGEINT
    accumulation exactly.  Remaining bound, per-TERM not per-corpus: a
    quotient is <= n_ij*10^grid_scale (pn >= n_ij), so it fits int64
    whenever every contingency CELL has
    n_ij <= (2^63-1) / 10^grid_scale (~9.2e6 at the default
    grid_scale=12) — and that bound is EXECUTABLE, not advisory: the
    largest cell is counted up front and a ValueError names it before
    any quotient can wrap.  Escape hatch for larger cells:
    ``grid_scale=6`` raises the cap to ~9.2e12 items per cell at
    truncation error <= cells*1e-6/N — still orders of magnitude below
    the 6dp emitted for any corpus big enough to hit the default cap.
    The contract costs one extra pass over ``labels`` (the same
    groupBy the metric itself runs), the house price for exact-or-loud
    (cf. neighbor_mean_features' up-front overflow contract)."""
    if not 0 <= grid_scale <= 18:
        raise ValueError(f"grid_scale must be in [0, 18], got {grid_scale}")
    g = labels.groupBy(gold_col).agg(F.count(F.lit(1)).alias("gn"))
    p = labels.groupBy(pred_col).agg(F.count(F.lit(1)).alias("pn"))
    c = labels.groupBy(gold_col, pred_col).agg(F.count(F.lit(1)).alias("n"))
    cell_cap = (2**63 - 1) // (10**grid_scale)
    top = c.orderBy(F.col("n").desc()).limit(1).collect()
    if top and top[0]["n"] > cell_cap:
        raise ValueError(
            "pairwise_cluster_metrics: contingency cell "
            f"({gold_col}={top[0][gold_col]!r}, "
            f"{pred_col}={top[0][pred_col]!r}) holds {top[0]['n']} items, "
            f"above the int64 quotient cap {cell_cap} at "
            f"grid_scale={grid_scale} — the BCubed term n^2*10^"
            f"{grid_scale} DIV size would wrap silently.  Pass a smaller "
            "grid_scale (6 keeps the sums exact to <= cells*1e-6/N, far "
            "below the 6dp emitted) or split the corpus."
        )
    grid = f"CAST(n AS DECIMAL(38,0)) * n * {10**grid_scale}"
    bc = (
        c.join(g, gold_col)
        .join(p, pred_col)
        .agg(
            F.sum(
                F.expr(f"CAST(({grid}) DIV pn AS DECIMAL(38,0))")
            ).alias("_bpq"),
            F.sum(
                F.expr(f"CAST(({grid}) DIV gn AS DECIMAL(38,0))")
            ).alias("_brq"),
            F.sum("n").alias("_N"),
        )
    )
    out = (
        _pair_count(c, "n", "tp_pairs")
        .crossJoin(_pair_count(g, "gn", "gold_pairs"))
        .crossJoin(_pair_count(p, "pn", "pred_pairs"))
        .crossJoin(bc)
    )
    safe = lambda num, den: F.when(  # noqa: E731
        den > 0, F.round(num / den, 6)
    ).otherwise(F.lit(0.0))
    # the sums above are exact integers; everything below is one-row
    # scalar double arithmetic (deterministic IEEE on fixed inputs —
    # no ordering anywhere), which also avoids DECIMAL(38,0) product
    # overflow for 10^9-item corpora
    bp = F.col("_bpq").cast("double") / (
        F.col("_N").cast("double") * F.lit(float(10**grid_scale))
    )
    br = F.col("_brq").cast("double") / (
        F.col("_N").cast("double") * F.lit(float(10**grid_scale))
    )
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
        F.round(bp, 6).alias("bcubed_precision"),
        F.round(br, 6).alias("bcubed_recall"),
        F.when(
            (bp + br) > 0,
            F.round(F.lit(2) * bp * br / (bp + br), 6),
        )
        .otherwise(F.lit(0.0))
        .alias("bcubed_f1"),
    )
