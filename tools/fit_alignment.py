"""Fit alignment-policy toggles against the reference's frozen run.

Sweeps combinations of:
- residue kernel mode ("lcs" vs "hybrid": equal lengths → LCS distance
  with e=2, unequal → plain levenshtein with e=1)
- metaphone fallback score (0.6 vs off)
- the stopword sets used for the equal-pair skip and the mismatch dampen
  (full _STOP vs org-style conjunctions only)
- the single-letter (initial-vs-word) dampen

and reports corpus metrics vs tests/data/logicv2_frozen.csv.

Run: python tools/fit_alignment.py
"""

from __future__ import annotations

import csv
import itertools
from pathlib import Path

import nomenklatura_spark.matching.names_v2 as nv

DATA = Path(__file__).parent.parent / "tests" / "data"
THRESHOLD = 0.7

ORG_STOP = frozenset(
    {"of", "and", "the", "for", "und", "et", "in", "on", "at", "by", "to"}
)


def score_corpus():
    rows = list(csv.DictReader((DATA / "logicv2_frozen.csv").open()))
    deltas = []
    tp = fp = fn = 0
    strong = 0
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
            strong += 1
    p = tp / (tp + fp) if tp + fp else 0.0
    rec = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * p * rec / (p + rec) if p + rec else 0.0
    return {
        "mean": sum(deltas) / len(deltas),
        "w10": sum(1 for d in deltas if d <= 0.1) / len(deltas),
        "w05": sum(1 for d in deltas if d <= 0.05) / len(deltas),
        "f1": f1,
        "strong": strong,
    }


def run(kernel, meta, stop_eq, stop_dampen, sl):
    nv.KERNEL_MODE = kernel
    if hasattr(nv, 'METAPHONE_SCORE'): nv.METAPHONE_SCORE = meta
    nv._STOP_EQ = stop_eq
    nv._STOP_DAMPEN = stop_dampen
    nv.SINGLE_LETTER_DAMPEN = sl
    nv._cluster_score.cache_clear()
    nv.name_pair_score.cache_clear()
    m = score_corpus()
    name = (
        f"k={kernel:6s} meta={meta} eq={'org' if stop_eq is ORG_STOP else 'full'} "
        f"damp={'org' if stop_dampen is ORG_STOP else 'full'} sl={int(sl)}"
    )
    print(
        f"{name:48s} mean={m['mean']:.4f} w.1={m['w10']:.3f} "
        f"w.05={m['w05']:.3f} F1={m['f1']:.3f} strong={m['strong']}"
    )
    return m


if __name__ == "__main__":
    base = (nv.KERNEL_MODE, 0.0, nv._STOP_EQ, nv._STOP_DAMPEN,
            nv.SINGLE_LETTER_DAMPEN)
    full = nv._STOP
    for kernel, meta, eq, damp, sl in itertools.product(
        ("lcs", "hybrid"), (0.6, 0.0), (full, ORG_STOP), (full, ORG_STOP),
        (False, True),
    ):
        run(kernel, meta, eq, damp, sl)
    run(*base)
