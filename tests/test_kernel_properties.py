"""Property-based tests (hypothesis) for the pure-Python scoring kernels.

These kernels run inside pandas UDFs on arbitrary real-world strings; the
properties pin the invariants the Spark layer relies on: scores stay in
[0, 1], equality scores 1, determinism, and no exceptions on any unicode
input.
"""

from __future__ import annotations

import pytest
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


def _enumerate_alignments(qps, rps, max_merge=3):
    """All monotone alignments of two part sequences with clusters up to
    max_merge×1 / 1×max_merge, as lists of (qslice, rslice) clusters."""
    if not qps and not rps:
        yield []
        return
    if qps:
        for rest in _enumerate_alignments(qps[1:], rps, max_merge):
            yield [(qps[:1], ())] + rest
    if rps:
        for rest in _enumerate_alignments(qps, rps[1:], max_merge):
            yield [((), rps[:1])] + rest
    for a in range(1, min(max_merge, len(qps)) + 1):
        for b in range(1, min(max_merge, len(rps)) + 1):
            if a > 1 and b > 1:
                continue
            for rest in _enumerate_alignments(qps[a:], rps[b:], max_merge):
                yield [(qps[:a], rps[:b])] + rest


@settings(max_examples=150, deadline=None)
@given(
    st.lists(st.sampled_from(["anna", "maria", "annamaria", "li", "petrov",
                              "petr", "jean", "claude", "jeanclaude"]),
             min_size=1, max_size=3),
    st.lists(st.sampled_from(["anna", "maria", "annamaria", "li", "petrov",
                              "petr", "jean", "claude", "jeanclaude"]),
             min_size=1, max_size=3),
)
def test_residue_dp_is_optimal(qps, rps):
    """The cost-folded DP must find the maximum-mass alignment — checked
    against exhaustive enumeration on small part sequences."""
    from nomenklatura_spark.matching.names_v2 import (
        _align_residue,
        _cluster_score,
    )

    qps, rps = tuple(qps), tuple(rps)

    def mass(aligns):
        return sum(_cluster_score(a, b) for a, b in aligns if a and b)

    got = mass(_align_residue(qps, rps))
    best = max(mass(al) for al in _enumerate_alignments(qps, rps))
    assert got == pytest.approx(best), (qps, rps, got, best)


def test_wlev_properties():
    """Weighted levenshtein: identity, symmetry, bounded by plain
    levenshtein from below by |len difference|, and never exceeding the
    unweighted distance."""
    from hypothesis import given, settings, strategies as st

    from nomenklatura_spark.matching.names_v2 import _wlev, levenshtein

    @settings(max_examples=300, deadline=None)
    @given(
        st.text(alphabet="abceikosuyz", max_size=12),
        st.text(alphabet="abceikosuyz", max_size=12),
    )
    def check(a, b):
        w = _wlev(a, b)
        assert w == _wlev(b, a)
        assert (w == 0.0) == (a == b)
        assert w <= levenshtein(a, b) + 1e-9
        assert w >= abs(len(a) - len(b)) - 1e-9

    check()


def test_codec_roundtrip_property():
    """BMP/PPM/WAV roundtrip for arbitrary shapes and samples."""
    import numpy as np
    from hypothesis import given, settings, strategies as st

    from nomenklatura_spark.multimodal.decode import (
        decode_bmp,
        decode_ppm,
        decode_wav,
        encode_bmp,
        encode_ppm,
        encode_wav,
    )

    @settings(max_examples=40, deadline=None)
    @given(st.integers(1, 13), st.integers(1, 9), st.integers(0, 2**31 - 1))
    def check_img(w, h, seed):
        px = np.random.RandomState(seed).randint(0, 256, (h, w, 3)).astype(
            np.uint8
        )
        assert (decode_bmp(encode_bmp(px)) == px).all()
        assert (decode_ppm(encode_ppm(px)) == px).all()

    @settings(max_examples=40, deadline=None)
    @given(st.integers(1, 400), st.integers(0, 2**31 - 1))
    def check_wav(n, seed):
        s = (
            np.random.RandomState(seed)
            .randint(-32768, 32768, n)
            .astype(np.int16)
        )
        rate, got = decode_wav(encode_wav(s, 44100))
        assert rate == 44100 and (got == s).all()

    check_img()
    check_wav()


# ---------------------------------------------------------------------------
# the overlap-prefix lemma behind dedup/ngram.containment_join


_set_pairs = st.tuples(
    st.sets(st.integers(min_value=0, max_value=60), min_size=1, max_size=25),
    st.sets(st.integers(min_value=0, max_value=60), min_size=1, max_size=25),
    st.floats(min_value=0.05, max_value=1.0),
    st.randoms(use_true_random=False),
)


@given(_set_pairs)
@settings(max_examples=500, deadline=None)
def test_overlap_prefix_lemma(case):
    """containment_join's candidate completeness rests on: for ANY
    global total order, if |A∩B| >= O = ceil(t*|A|) then A's first
    |A|-O+1 elements and B's first |B|-O+1 elements (in that order)
    intersect — i.e. the join over A-prefix x B with the positional
    filter o_rank <= |B|-O+1 can never miss a qualifying pair.  The
    witness is the order-smallest common element; fuzz it over random
    sets, thresholds, and random global orders."""
    import math

    a, b, t, rnd = case
    order = sorted(a | b)
    rnd.shuffle(order)
    rank = {x: i for i, x in enumerate(order)}
    o_req = math.ceil(t * len(a))
    if len(a & b) < o_req:
        return  # not a qualifying pair; nothing to guarantee
    a_sorted = sorted(a, key=lambda x: rank[x])
    b_sorted = sorted(b, key=lambda x: rank[x])
    a_prefix = set(a_sorted[: len(a) - o_req + 1])
    b_prefix = set(b_sorted[: len(b) - o_req + 1])
    assert a_prefix & b_prefix, (
        "qualifying pair with disjoint prefixes — candidate generation "
        "would have missed it"
    )


@settings(max_examples=150, deadline=None)
@given(
    st.integers(min_value=2, max_value=24),
    st.integers(min_value=2, max_value=24),
    st.integers(min_value=0, max_value=2**31 - 1),
)
def test_dhash_blocks_match_naive_reference(h, w, seed):
    """The vectorized dHash kernel must equal an independent per-cell
    double loop (resample index map, 299/587/114 luma, bit c =
    luma[r,c] > luma[r,c+1] weighted 2^c) for any image shape."""
    import numpy as _np

    from nomenklatura_spark.multimodal.dhash import dhash_blocks

    rng = _np.random.RandomState(seed)
    px = rng.randint(0, 256, size=(h, w, 3)).astype(_np.uint8)
    got = dhash_blocks(px)
    want = []
    for r in range(8):
        sr = (r * h) // 8
        lum = []
        for c in range(9):
            sc = (c * w) // 9
            p = px[sr, sc].astype(int)
            lum.append(299 * p[0] + 587 * p[1] + 114 * p[2])
        want.append(
            sum((1 << c) for c in range(8) if lum[c] > lum[c + 1])
        )
    assert got == want


@settings(max_examples=150, deadline=None)
@given(
    st.integers(min_value=2, max_value=4000),
    st.integers(min_value=0, max_value=2**31 - 1),
)
def test_audio_dhash_blocks_match_naive_reference(n, seed):
    import numpy as _np

    from nomenklatura_spark.multimodal.dhash import audio_dhash_blocks

    rng = _np.random.RandomState(seed)
    samples = rng.randint(-32768, 32768, size=n).astype(_np.int16)
    got = audio_dhash_blocks(samples)
    frames = [int(samples[(i * n) // 65]) for i in range(65)]
    want = [
        sum(
            (1 << j)
            for j in range(8)
            if frames[b * 8 + j] > frames[b * 8 + j + 1]
        )
        for b in range(8)
    ]
    assert got == want


@settings(max_examples=300, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=255), min_size=8,
             max_size=8),
    st.sets(st.integers(min_value=0, max_value=63), max_size=7),
    st.sampled_from([1, 2]),
)
def test_banding_pigeonhole_property(blocks, flip_bits, band_bytes):
    """For ANY signature and ANY <= n_bands-1 bit flips, at least one
    band value must be preserved — the completeness fact the banded
    equi-join rests on, checked against the exact band-combine
    arithmetic (byte j of band i weighted 256^j) at both band widths."""
    n_bands = 8 // band_bytes
    if len(flip_bits) > n_bands - 1:
        flip_bits = set(list(flip_bits)[: n_bands - 1])
    other = list(blocks)
    for bit in flip_bits:
        other[bit // 8] ^= 1 << (bit % 8)

    def bands(bl):
        return [
            sum(bl[i * band_bytes + j] << (8 * j)
                for j in range(band_bytes))
            for i in range(n_bands)
        ]
    a, b = bands(blocks), bands(other)
    assert any(x == y for x, y in zip(a, b))
    # and hamming computed per-block equals the flip count
    ham = sum(bin(x ^ y).count("1") for x, y in zip(blocks, other))
    assert ham == len(flip_bits)
