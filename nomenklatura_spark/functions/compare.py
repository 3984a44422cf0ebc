"""Pair-comparison features as pure Catalyst column expressions
(SURVEY.md §2.8 C2, C5, C6, C9-C13, C15; §2.7 SO2/SO3).

Each function takes left/right array columns (from
``operators.pairs.assemble_pairs``) and returns a score column in [0, 1]
(0.0 = feature not applicable, mirroring the reference's FNUL).

Reference semantics: ``nomenklatura/matching/compare/*.py``. Everything
here is UDF-free — set intersections, regexes and Levenshtein all run
JVM-side in whole-stage codegen, so the scoring stage adds no Python cost
at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _nonempty(*cols: Column) -> Column:
    cond = F.size(cols[0]) > 0
    for c in cols[1:]:
        cond = cond & (F.size(c) > 0)
    return cond


def has_overlap(left: Column, right: Column) -> Column:
    """SO2 — both non-empty and intersecting (compare/util.py:20-27)."""
    return _nonempty(left, right) & F.arrays_overlap(left, right)


def is_disjoint(left: Column, right: Column) -> Column:
    """SO3 — both non-empty with empty intersection (compare/util.py:8-16)."""
    return _nonempty(left, right) & ~F.arrays_overlap(left, right)


def _score(cond: Column, score: float = 1.0) -> Column:
    return F.when(cond, F.lit(score)).otherwise(F.lit(0.0))


# --- dates (compare/dates.py) ---------------------------------------------

def _days(dates: Column) -> Column:
    """Date values truncated to day precision, keeping only full dates."""
    return F.array_distinct(
        F.transform(
            F.filter(dates, lambda d: F.length(d) >= 10),
            lambda d: F.substring(d, 1, 10),
        )
    )


def _years(dates: Column) -> Column:
    return F.array_distinct(
        F.transform(
            F.filter(dates, lambda d: F.length(d) >= 4),
            lambda d: F.substring(d, 1, 4),
        )
    )


def _flip_day_month(days: Column) -> Column:
    """YYYY-MM-DD → YYYY-DD-MM (the common data-entry mistake,
    compare/dates.py:19-22)."""
    return F.transform(
        days,
        lambda d: F.regexp_replace(d, r"^(\d{4})-(\d{2})-(\d{2})", r"$1-$3-$2"),
    )


def dob_matches(q_dates: Column, r_dates: Column) -> Column:
    """C9 — birth-day equality; day/month flip scores 0.5
    (compare/dates.py:25-39)."""
    qd, rd = _days(q_dates), _days(r_dates)
    return (
        F.when(~_nonempty(q_dates, r_dates), F.lit(0.0))
        .when(has_overlap(qd, rd), F.lit(1.0))
        .when(has_overlap(_flip_day_month(qd), rd), F.lit(0.5))
        .otherwise(F.lit(0.0))
    )


def dob_year_matches(q_dates: Column, r_dates: Column) -> Column:
    return _score(has_overlap(_years(q_dates), _years(r_dates)))


def dob_day_disjoint(q_dates: Column, r_dates: Column) -> Column:
    """C9 qualifier — birth days present on both sides but different;
    flipped day/month counts half (compare/dates.py:49-68)."""
    qd, rd = _days(q_dates), _days(r_dates)
    return (
        F.when(~_nonempty(qd, rd), F.lit(0.0))
        .when(F.arrays_overlap(qd, rd), F.lit(0.0))
        .when(F.arrays_overlap(_flip_day_month(qd), rd), F.lit(0.5))
        .otherwise(F.lit(1.0))
    )


def dob_year_disjoint(q_dates: Column, r_dates: Column) -> Column:
    return _score(is_disjoint(_years(q_dates), _years(r_dates)))


# --- countries / gender (compare/countries.py, gender.py) ------------------

def country_mismatch(q_countries: Column, r_countries: Column) -> Column:
    """C10 — both entities carry countries with no overlap.

    Deviation (documented): the reference expands territories via rigour
    (``territories_intersect``) so e.g. a dependent territory matches its
    parent country; here plain code equality is used. Wire an alias
    dimension through ``expand`` when that precision is needed.
    """
    return _score(is_disjoint(q_countries, r_countries))


def gender_mismatch(q_genders: Column, r_genders: Column) -> Column:
    """C11 (compare/gender.py:8-15)."""
    return _score(is_disjoint(q_genders, r_genders))


# --- identifiers (compare/identifiers.py) ----------------------------------

def _clean_ids(ids: Column) -> Column:
    cleaned = F.transform(ids, lambda v: F.upper(F.regexp_replace(v, r"[^A-Za-z0-9]+", "")))
    return F.array_distinct(F.filter(cleaned, lambda v: F.length(v) >= 4))


def identifier_match(q_ids: Column, r_ids: Column) -> Column:
    """C12 — normalized identifier equality (compare/identifiers.py:21-30)."""
    return _score(has_overlap(_clean_ids(q_ids), _clean_ids(r_ids)))


def crypto_wallet_address(
    q_keys: Column, r_keys: Column, l_schema: Column, r_schema: Column
) -> Column:
    """C13 — CryptoWallet public key equality, keys > 10 chars
    (compare/identifiers.py:10-18)."""
    common = F.filter(
        F.array_intersect(q_keys, r_keys), lambda k: F.length(k) > 10
    )
    both_wallets = (l_schema == "CryptoWallet") & (r_schema == "CryptoWallet")
    return _score(both_wallets & (F.size(common) > 0))


# --- names (compare/names.py) ----------------------------------------------

def _clean_light(names: Column) -> Column:
    """clean_name_light approximation: lowercase, collapse whitespace and
    strip outer punctuation — no ascii folding (literal match is meant to
    be near-exact)."""
    cleaned = F.transform(
        names,
        lambda n: F.trim(F.regexp_replace(F.lower(n), r"\s+", " ")),
    )
    return F.array_distinct(F.filter(cleaned, lambda n: F.length(n) > 0))


def name_literal_match(q_names: Column, r_names: Column) -> Column:
    """C5 — same name with only light cleaning (compare/names.py:123-132)."""
    return _score(has_overlap(_clean_light(q_names), _clean_light(r_names)))


def weak_alias_match(q_names: Column, r_weak: Column) -> Column:
    """C6 — query name equals result's weak alias; asymmetric by design
    (compare/names.py:147-162)."""
    return _score(has_overlap(_clean_light(q_names), _clean_light(r_weak)))


def last_name_mismatch(q_last: Column, r_last: Column) -> Column:
    """Person last-name disjointness (compare/names.py:135-144)."""
    def toks(c: Column) -> Column:
        split = F.flatten(
            F.transform(c, lambda n: F.split(F.lower(n), r"[^a-z0-9]+"))
        )
        return F.array_distinct(F.filter(split, lambda t: F.length(t) >= 2))

    return _score(is_disjoint(toks(q_last), toks(r_last)))


# --- numbers (logic_v1/multi.py, compare/util.py:46-51) --------------------

def _numbers(values: Column) -> Column:
    return F.array_distinct(
        F.flatten(
            F.transform(values, lambda v: F.regexp_extract_all(v, F.lit(r"\d+"), 0))
        )
    )


def numbers_mismatch(q_values: Column, r_values: Column) -> Column:
    """C15 — both sides contain digit sequences with no overlap."""
    return _score(is_disjoint(_numbers(q_values), _numbers(r_values)))


# --- string distance (logic_v2/names/distance.py) --------------------------

def strict_levenshtein(left: Column, right: Column, max_rate: int = 4) -> Column:
    """C2 — edit distance allowing 1 edit per ``max_rate`` chars; score
    ``(1 - d/maxlen)^max_edits`` (distance.py:8-20). Pure column expr —
    Spark's levenshtein() is JVM-side."""
    maxlen = F.greatest(F.length(left), F.length(right))
    max_edits = F.floor(maxlen / max_rate)
    dist = F.levenshtein(left, right)
    return (
        F.when(left == right, F.lit(1.0))
        .when(max_edits < 1, F.lit(0.0))
        .when(dist > max_edits, F.lit(0.0))
        .otherwise(F.pow(1.0 - dist / maxlen, max_edits))
    )


def best_name_levenshtein(q_names: Column, r_names: Column, max_rate: int = 4) -> Column:
    """Max strict-Levenshtein score over the name cross-product — the
    array-valued form used by name_fingerprint_levenshtein's first stage
    (compare/names.py:79-84). Nested transform keeps the cross-product
    JVM-side; blocking has already bounded its size."""
    def pair_score(qn: Column, rn: Column) -> Column:
        maxlen = F.greatest(F.length(qn), F.length(rn))
        max_edits = F.floor(maxlen / max_rate)
        dist = F.levenshtein(qn, rn)
        return (
            F.when(qn == rn, F.lit(1.0))
            .when(max_edits < 1, F.lit(0.0))
            .when(dist > max_edits, F.lit(0.0))
            .otherwise(F.pow(1.0 - dist / maxlen, max_edits))
        )

    scores = F.flatten(
        F.transform(q_names, lambda qn: F.transform(r_names, lambda rn: pair_score(qn, rn)))
    )
    return F.coalesce(F.array_max(scores), F.lit(0.0))
