"""Name-matcher accuracy harness — the reference's name_bench pattern
(contrib/name_bench: labelled pairs, F1 at a fixed threshold, STRONG
failures are hard errors).  Cases are hand-written for this engine,
spanning the quirk classes the matchers must separate: transliteration,
legal forms, initials, reordering, distinct-person traps.
"""

from __future__ import annotations

import pytest

# (name1, name2, is_match, strength) — strength STRONG must never fail
CASES = [
    # exact / trivial variants
    ("Johanna Quandt", "JOHANNA QUANDT", True, "STRONG"),
    ("Vladimir Putin", "Vladimir Putin", True, "STRONG"),
    # transliteration-ish single-edit
    ("Vladimir Putin", "Wladimir Putin", True, "STRONG"),
    ("Mohammed al-Assad", "Mohammad al-Assad", True, "MEDIUM"),
    # legal forms
    ("Acme Holdings Limited", "Acme Holdings Ltd", True, "STRONG"),
    ("Zeta Petrochemical GmbH", "Zeta Petrochemical", True, "MEDIUM"),
    # reordering
    ("Putin, Vladimir", "Vladimir Putin", True, "STRONG"),
    # initials
    ("J. Smith", "John Smith", True, "WEAK"),
    # extra parts
    ("Jose Maria Aznar Lopez", "Jose Maria Aznar", True, "MEDIUM"),
    # non-matches: shared surname, different person
    ("John Smith", "Jane Smith", False, "MEDIUM"),
    ("Herbert Quandt", "Johanna Quandt", False, "STRONG"),
    # non-matches: entirely different
    ("Vladimir Putin", "Angela Merkel", False, "STRONG"),
    ("Acme Holdings Ltd", "Omega Trading LLC", False, "STRONG"),
    # non-match trap: shared legal form only
    ("Alpha GmbH", "Beta GmbH", False, "STRONG"),
    # non-match trap: shared stopword only
    ("Bank of America", "Bank of China", False, "MEDIUM"),
    # number-bearing names
    ("Vessel No 7", "Vessel No 7", True, "STRONG"),
    # --- symbol-model cases (matching/symbols.py) ---
    # cross-language legal-form class ("OOO" ~ "LLC")
    ("Gazprom OOO", "Gazprom LLC", True, "STRONG"),
    ("Siemens AG", "Siemens Aktiengesellschaft", True, "STRONG"),
    # abbreviation groups
    ("Acme International Trading", "Acme Intl Trading", True, "STRONG"),
    # nickname folding
    ("Bill Clinton", "William Clinton", True, "STRONG"),
    ("Peggy Smith", "Margaret Smith", True, "MEDIUM"),
    # numeric folding across representations
    ("Sovcomflot Vessel 2", "Sovcomflot Vessel II", True, "STRONG"),
    # numeric divergence: same fleet, different hull
    ("Sovcomflot Vessel 1", "Sovcomflot Vessel 2", False, "STRONG"),
    # shared generic vocabulary only — must NOT match
    ("Alpha International Group", "Omega International Group", False, "STRONG"),
]

THRESHOLD = 0.7


def _f1(scores):
    tp = sum(1 for s, m in scores if m and s >= THRESHOLD)
    fp = sum(1 for s, m in scores if not m and s >= THRESHOLD)
    fn = sum(1 for s, m in scores if m and s < THRESHOLD)
    p = tp / (tp + fp) if tp + fp else 0.0
    r = tp / (tp + fn) if tp + fn else 0.0
    return 2 * p * r / (p + r) if p + r else 0.0


def test_name_v2_accuracy():
    from nomenklatura_spark.matching.names_v2 import name_match

    scores = [(name_match([a], [b]), m) for a, b, m, _ in CASES]
    # STRONG cases are hard requirements (name_bench P0 rule)
    for (a, b, m, strength), (s, _) in zip(CASES, scores):
        if strength == "STRONG":
            ok = (s >= THRESHOLD) == m
            assert ok, f"STRONG case failed: {a!r} vs {b!r} → {s:.3f} (match={m})"
    f1 = _f1(scores)
    assert f1 >= 0.85, f"name_v2 F1 too low: {f1:.3f}"


# Matching pairs whose equivalence lives in the symbol lexicon
# (nicknames, cross-language legal forms, abbreviations, roman numerals).
# OFAC is a surface-similarity algorithm — the reference tool has no such
# data either — so the separation guarantee below doesn't cover them.
SYMBOLIC_PAIRS = {
    ("Gazprom OOO", "Gazprom LLC"),
    ("Siemens AG", "Siemens Aktiengesellschaft"),
    ("Acme International Trading", "Acme Intl Trading"),
    ("Bill Clinton", "William Clinton"),
    ("Peggy Smith", "Margaret Smith"),
    ("Sovcomflot Vessel 2", "Sovcomflot Vessel II"),
}


def test_ofac_separates_matches():
    """OFAC scores must rank every surface-similar matching pair above
    every non-match that shares no name tokens (its per-token floor
    guarantees this)."""
    from nomenklatura_spark.matching.ofac import ofac_name_score

    match_scores = [
        ofac_name_score([a], [b])
        for a, b, m, _ in CASES
        if m and (a, b) not in SYMBOLIC_PAIRS
    ]
    clean_nonmatch = [
        ofac_name_score([a], [b])
        for a, b, m, _ in CASES
        if not m and not set(a.lower().split()) & set(b.lower().split())
    ]
    assert min(match_scores) > max(clean_nonmatch)
