"""The deprecated-but-supported name-based matchers (C3/C7 as a model).

Re-expression of the reference's ``NameMatcher`` / ``NameQualifiedMatcher``
(``nomenklatura/matching/name_based/model.py:43-95``,
``name_based/names.py``): 0.5 · per-word best Jaro-Winkler + 0.5 ·
soundex-token overlap, with the OFAC qualifier penalties on the
"qualified" variant.  Kept because the reference keeps them (callers pin
algorithm names); `ofac` supersedes both.

Runs as one Arrow-batched pandas UDF over blocked pairs, like the other
matcher stacks.
"""

from __future__ import annotations

from functools import lru_cache

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from nomenklatura_spark.functions import compare as C
from nomenklatura_spark.functions.names_compare import jaro_winkler
from nomenklatura_spark.functions.scoring import Feature, weighted_sum_score

_SOUNDEX_MAP = {
    **dict.fromkeys("bfpv", "1"),
    **dict.fromkeys("cgjkqsxz", "2"),
    **dict.fromkeys("dt", "3"),
    "l": "4",
    **dict.fromkeys("mn", "5"),
    "r": "6",
}


def soundex(word: str) -> str:
    """American Soundex (the classic 4-char code)."""
    w = "".join(c for c in word.lower() if c.isalpha())
    if not w:
        return ""
    first = w[0].upper()
    digits = []
    prev = _SOUNDEX_MAP.get(w[0], "")
    for ch in w[1:]:
        if ch in "hw":
            continue
        d = _SOUNDEX_MAP.get(ch, "")
        if d and d != prev:
            digits.append(d)
        prev = d
    return (first + "".join(digits) + "000")[:4]


def _word_list(names: list[str]) -> list[str]:
    out = []
    for n in names or []:
        out.extend(t for t in str(n).lower().split() if t)
    return out


def _soundex_token(token: str) -> str:
    if token.isalpha() and len(token) > 1:
        code = soundex(token)
        if code:
            return code
    return token.upper()


@lru_cache(maxsize=100_000)
def _jaro_parts(q_words: tuple[str, ...], r_words: tuple[str, ...]) -> float:
    """Per distinct query word: best Jaro-Winkler (> 0.5) against the
    result words; mean over query words (names.py:35-60)."""
    r_set = set(r_words)
    sims = []
    for part in set(q_words):
        best = 0.0
        for other in r_set:
            s = jaro_winkler(part, other)
            if s > 0.5 and s > best:
                best = s
        sims.append(best)
    if not sims:
        return 0.0
    return sum(sims) / max(1.0, len(sims))


@lru_cache(maxsize=100_000)
def _soundex_parts(q_words: tuple[str, ...], r_words: tuple[str, ...]) -> float:
    """Soundex-token set overlap over the smaller set (names.py:21-32)."""
    qs = {_soundex_token(t) for t in q_words}
    rs = {_soundex_token(t) for t in r_words}
    overlap = qs & rs
    if not overlap:
        return 0.0
    return len(overlap) / max(1.0, min(len(qs), len(rs)))


def name_based_score(query_names: list[str], result_names: list[str]) -> float:
    q = tuple(_word_list(query_names))
    r = tuple(_word_list(result_names))
    return 0.5 * _jaro_parts(q, r) + 0.5 * _soundex_parts(q, r)


@F.pandas_udf(T.DoubleType())
def name_based_score_udf(q: pd.Series, r: pd.Series) -> pd.Series:
    return pd.Series(
        [name_based_score(list(a or []), list(b or [])) for a, b in zip(q, r)],
        dtype="float64",
    )


_QUALIFIERS = [
    Feature("f_country_mismatch", -0.1, qualifier=True),
    Feature("f_dob_year_disjoint", -0.1, qualifier=True),
    Feature("f_dob_day_disjoint", -0.15, qualifier=True),
    Feature("f_gender_mismatch", -0.1, qualifier=True),
    Feature("f_orgid_disjoint", -0.1, qualifier=True),
]


def score_pairs_name_based(pairs: DataFrame) -> DataFrame:
    """NameMatcher: 0.5·jaro_name_parts + 0.5·soundex_name_parts."""
    df = pairs.select(
        "*",
        name_based_score_udf(F.col("l_names"), F.col("r_names")).alias(
            "f_name_based"
        ),
    )
    return weighted_sum_score(df, [Feature("f_name_based", 1.0)])


def score_pairs_name_qualified(pairs: DataFrame) -> DataFrame:
    """NameQualifiedMatcher: the name-based score plus the OFAC qualifier
    penalties (model.py:66-95)."""
    df = pairs.select(
        "*",
        name_based_score_udf(F.col("l_names"), F.col("r_names")).alias(
            "f_name_based"
        ),
        C.country_mismatch(F.col("l_countries"), F.col("r_countries")).alias(
            "f_country_mismatch"
        ),
        C.dob_year_disjoint(F.col("l_birth_dates"), F.col("r_birth_dates")).alias(
            "f_dob_year_disjoint"
        ),
        C.dob_day_disjoint(F.col("l_birth_dates"), F.col("r_birth_dates")).alias(
            "f_dob_day_disjoint"
        ),
        C.gender_mismatch(F.col("l_genders"), F.col("r_genders")).alias(
            "f_gender_mismatch"
        ),
        C.is_disjoint(F.col("l_identifiers"), F.col("r_identifiers"))
        .cast("double")
        .alias("f_orgid_disjoint"),
    )
    return weighted_sum_score(df, [Feature("f_name_based", 1.0)] + _QUALIFIERS)
