"""Property-based tests (hypothesis) for the pure-Python scoring kernels.

These kernels run inside pandas UDFs on arbitrary real-world strings; the
properties pin the invariants the Spark layer relies on: scores stay in
[0, 1], equality scores 1, determinism, and no exceptions on any unicode
input.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

names = st.text(min_size=0, max_size=40)
tokens = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")),
    min_size=1,
    max_size=20,
)


@settings(max_examples=300, deadline=None)
@given(names, names)
def test_jaro_bounds_and_symmetry(a, b):
    from nomenklatura_spark.functions.names_compare import jaro

    s = jaro(a, b)
    assert 0.0 <= s <= 1.0
    assert s == jaro(b, a)
    if a == b:
        assert s == 1.0


@settings(max_examples=300, deadline=None)
@given(names, names)
def test_jaro_winkler_bounds(a, b):
    from nomenklatura_spark.functions.names_compare import jaro, jaro_winkler

    s = jaro_winkler(a, b)
    assert 0.0 <= s <= 1.0
    assert s >= jaro(a, b) - 1e-12  # prefix bonus never hurts


@settings(max_examples=300, deadline=None)
@given(names, names)
def test_ofac_score_bounds(a, b):
    from nomenklatura_spark.matching.ofac import ofac_score

    s = ofac_score(a, b)
    assert 0.0 <= s <= 1.0
    assert s == ofac_score(a, b)  # deterministic (lru caches included)


@settings(max_examples=200, deadline=None)
@given(st.lists(names, max_size=4), st.lists(names, max_size=4))
def test_name_match_bounds(q, r):
    from nomenklatura_spark.matching.names_v2 import name_match

    s = name_match(q, r)
    assert 0.0 <= s <= 1.0


@settings(max_examples=300, deadline=None)
@given(names)
def test_name_match_identity(n):
    from nomenklatura_spark.matching.names_v2 import _analyze, name_match

    if any(alt[0] for alt in _analyze(n)):
        # any tokenizable name matches itself perfectly
        assert name_match([n], [n]) == 1.0


@settings(max_examples=300, deadline=None)
@given(names, names)
def test_levenshtein_metric_properties(a, b):
    from nomenklatura_spark.matching.names_v2 import levenshtein

    d = levenshtein(a, b)
    assert d == levenshtein(b, a)
    assert (d == 0) == (a == b)
    assert d <= max(len(a), len(b))
    assert d >= abs(len(a) - len(b))


@settings(max_examples=300, deadline=None)
@given(names, names)
def test_strict_levenshtein_bounds(a, b):
    from nomenklatura_spark.matching.names_v2 import strict_levenshtein_py

    s = strict_levenshtein_py(a, b)
    assert 0.0 <= s <= 1.0
    assert (s == 1.0) == (a == b)


@settings(max_examples=300, deadline=None)
@given(tokens)
def test_metaphone_stable_and_ascii(t):
    from nomenklatura_spark.functions.names_compare import metaphone

    m = metaphone(t)
    assert m == metaphone(t)
    assert all(ord(c) < 128 for c in m)


@settings(max_examples=200, deadline=None)
@given(st.lists(names, max_size=3), st.lists(names, max_size=3))
def test_address_match_bounds(q, r):
    from nomenklatura_spark.matching.names_v2 import address_match

    s = address_match(q, r)
    assert 0.0 <= s <= 1.0


@settings(max_examples=300, deadline=None)
@given(names)
def test_fold_idempotent(n):
    from nomenklatura_spark.matching.translit import fold_text

    once = fold_text(n)
    assert fold_text(once) == once  # folding is a projection
