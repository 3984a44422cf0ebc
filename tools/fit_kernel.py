"""Fit the 1-1 residue fuzzy kernel against the reference's frozen run.

Historical fitting tool (round 2) — the ADOPTED kernel is now "wlev"
(names_v2.residue_fuzzy): confusable-class weighted levenshtein, min'd
with the LCS distance for equal lengths, gates ``d <= min(L/4, 2)`` and
``L >= 5 or d < 1``; see tools/fit_alignment.py for the full sweep.
This script keeps the earlier single-kernel comparisons reproducible.

Original hypothesis (decoded from frozen cases): rigour's compare_parts
scores a 1-1 residue pair as ``(1 - d/L)^e`` with

- ``d`` = max-side LCS distance ``max(l1, l2) - LCS(a, b)``
- ``L`` = max(l1, l2), gate ``L >= 5`` and ``d <= L // 4``
- ``e`` = 2 when the lengths are equal (substitution-shaped edits),
  1 otherwise (pure indels)

Evidence: putin~pudin 0.64=(4/5)^2, mertz~merz 0.8=(4/5)^1,
frederick~friedrich 0.605=(7/9)^2 (OSA distance is 3 but LCS distance
is 2), joonng~jong 0 (LCS distance 2 > 6//4), banks~bank 0.8.

Run: python tools/fit_kernel.py
"""

from __future__ import annotations

import csv
from pathlib import Path

import nomenklatura_spark.matching.names_v2 as nv

DATA = Path(__file__).parent.parent / "tests" / "data"
THRESHOLD = 0.7


def lcs_len(a: str, b: str) -> int:
    if not a or not b:
        return 0
    prev = [0] * (len(b) + 1)
    for ca in a:
        cur = [0]
        for j, cb in enumerate(b, 1):
            cur.append(prev[j - 1] + 1 if ca == cb else max(prev[j], cur[-1]))
        prev = cur
    return prev[-1]


def kernel_current(left: str, right: str, max_rate: int = 4) -> float:
    if left == right:
        return 1.0
    max_len = max(len(left), len(right))
    if max_len <= max_rate:
        return 0.0
    max_edits = max_len // max_rate
    d = nv.damerau_osa(left, right)
    if d > max_edits:
        return 0.0
    return (1 - (d / max_len)) ** max_edits


def make_lcs_kernel(gate_rate: int = 4, min_len: int = 5):
    def kernel(left: str, right: str, max_rate: int = 4) -> float:
        if left == right:
            return 1.0
        l1, l2 = len(left), len(right)
        L = max(l1, l2)
        if L < min_len:
            return 0.0
        d = L - lcs_len(left, right)
        if d > L // gate_rate:
            return 0.0
        e = 2 if l1 == l2 else 1
        return (1 - d / L) ** e

    return kernel


def score_corpus() -> dict:
    rows = list(csv.DictReader((DATA / "logicv2_frozen.csv").open()))
    deltas = []
    tp = fp = fn = 0
    strong_fails = []
    for r in rows:
        if r["schema"] in nv.OBJ_SCHEMAS:
            s = nv.object_name_match([r["name1"]], [r["name2"]])
        else:
            s = nv.name_match(
                [r["name1"]], [r["name2"]], person=(r["schema"] == "Person")
            )
        f = float(r["score"])
        deltas.append(abs(s - f))
        is_match = r["is_match"] == "true"
        pred = s >= THRESHOLD
        tp += pred and is_match
        fp += pred and not is_match
        fn += (not pred) and is_match
        if r["quality"] == "STRONG" and pred != is_match:
            strong_fails.append((r["name1"], r["name2"], round(s, 3)))
    precision = tp / (tp + fp) if tp + fp else 0.0
    recall = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {
        "mean": sum(deltas) / len(deltas),
        "within_0.1": sum(1 for d in deltas if d <= 0.1) / len(deltas),
        "within_0.05": sum(1 for d in deltas if d <= 0.05) / len(deltas),
        "f1": f1,
        "strong_fails": strong_fails,
    }


def run_variant(name: str, kernel, metaphone_score: float) -> None:
    nv.residue_fuzzy = kernel
    if hasattr(nv, 'METAPHONE_SCORE'): if hasattr(nv, 'METAPHONE_SCORE'): nv.METAPHONE_SCORE = metaphone_score
    nv._cluster_score.cache_clear()
    nv.name_pair_score.cache_clear()
    m = score_corpus()
    print(
        f"{name:42s} mean|d|={m['mean']:.4f} w0.1={m['within_0.1']:.3f} "
        f"w0.05={m['within_0.05']:.3f} F1={m['f1']:.3f} strong={len(m['strong_fails'])}"
    )
    for sf in m["strong_fails"]:
        print(f"    STRONG fail: {sf}")


if __name__ == "__main__":
    orig = nv.residue_fuzzy
    run_variant("osa rate4 kernel, metaphone 0.6", kernel_current, 0.6)
    run_variant("adopted (lcs eq2 r4 m5), metaphone 0.6", orig, 0.6)
    run_variant("adopted, no metaphone", orig, 0.0)
    nv.residue_fuzzy = orig
    pass  # metaphone fallback removed from names_v2
