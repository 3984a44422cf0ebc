"""C8 — OFAC Sanctions List Search score emulation.

Behavioral re-expression of the reference's OFAC emulation
(``nomenklatura/matching/name_based/ofac.py:1-181``): the score is the
max over (query name, candidate name) pairs of two techniques (FAQ 249):

1. whole-string SimMetrics-style Jaro-Winkler (prefix bonus applied
   unconditionally, no 0.7 Jaro gate), gated on the first characters of
   the normalised strings being equal — this reproduces OFAC's
   token-order asymmetry (``GEORGE BUSH`` != ``BUSH GEORGE``);
2. per-token best-pairing JW with a 0.5 per-pair floor, after dropping
   query tokens of length <= 2 (never emptying the list) — the floor
   acts as a soft first-letter check, the short-token drop resolves
   multi-alias explosions.

The entity-level matcher (``name_based/model.py:14-41`` behavior) is the
name score at weight 1.0 plus mismatch qualifiers combined as a plain
weighted sum (NOT the X1 max-of-mains rule).

Spark shape: normalisation and tokenisation happen once per side before
the pair join; only the per-pair max-over-name-products runs in an
Arrow-batched pandas UDF, and only on blocked candidate pairs.
"""

from __future__ import annotations

import re
from functools import lru_cache

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F, types as T

from nomenklatura_spark.functions import compare as C
from nomenklatura_spark.functions.names_compare import jaro
from nomenklatura_spark.functions.scoring import Feature, weighted_sum_score

PER_PAIR_JW_FLOOR = 0.5
SHORT_TOKEN_MAX_LEN = 2
WINKLER_PREFIX_MAX = 4
WINKLER_WEIGHT = 0.1

# apostrophes/commas/periods delete (O'BRIEN stays one token); other
# non-alphanumerics split
_DELETE_RE = re.compile(r"[''`.,]")
_SPLIT_RE = re.compile(r"[^0-9A-Za-zÀ-ɏЀ-ӿ]+")


def _simmetrics_jw(left: str, right: str) -> float:
    """JW with the prefix bonus applied unconditionally (SimMetrics-Java
    style), not gated on pure Jaro >= 0.7 as in Winkler 1990."""
    if not left or not right:
        return 0.0
    j = jaro(left, right)
    if j == 0.0:
        return 0.0
    prefix = 0
    for lc, rc in zip(left[:WINKLER_PREFIX_MAX], right[:WINKLER_PREFIX_MAX]):
        if lc != rc:
            break
        prefix += 1
    return j + prefix * WINKLER_WEIGHT * (1 - j)


def _raw_jw(left: str, right: str) -> float:
    """Standard JW (prefix bonus gated on Jaro > 0.7) for per-token pairs."""
    j = jaro(left, right)
    if j <= 0.7:
        return j
    prefix = 0
    for lc, rc in zip(left[:WINKLER_PREFIX_MAX], right[:WINKLER_PREFIX_MAX]):
        if lc != rc:
            break
        prefix += 1
    return j + prefix * WINKLER_WEIGHT * (1 - j)


@lru_cache(maxsize=50_000)
def _tokens(name: str) -> tuple[str, ...]:
    cleaned = _DELETE_RE.sub("", name)
    return tuple(t.upper() for t in _SPLIT_RE.split(cleaned) if t)


def _drop_short_tokens(tokens: tuple[str, ...]) -> tuple[str, ...]:
    kept = tuple(t for t in tokens if len(t) > SHORT_TOKEN_MAX_LEN)
    return kept or tokens


def whole_string_score(query: str, candidate: str) -> float:
    qn = " ".join(_tokens(query))
    cn = " ".join(_tokens(candidate))
    if not qn or not cn or qn[0] != cn[0]:
        return 0.0
    return _simmetrics_jw(qn, cn)


def per_token_score(query: str, candidate: str) -> float:
    q_tokens = _drop_short_tokens(_tokens(query))
    c_tokens = _tokens(candidate)
    if not q_tokens or not c_tokens:
        return 0.0
    total = 0.0
    for qt in q_tokens:
        best = max((_raw_jw(qt, ct) for ct in c_tokens), default=0.0)
        total += best if best >= PER_PAIR_JW_FLOOR else 0.0
    return total / len(q_tokens)


def ofac_score(query: str, candidate: str) -> float:
    return max(whole_string_score(query, candidate), per_token_score(query, candidate))


def ofac_name_score(query_names: list[str], result_names: list[str]) -> float:
    """Entity-level: max over every (query, candidate) name pair."""
    best = 0.0
    for qn in query_names or []:
        for rn in result_names or []:
            s = ofac_score(qn, rn)
            if s > best:
                best = s
                if best >= 1.0:
                    return best
    return best


@F.pandas_udf(T.DoubleType())
def ofac_name_score_udf(q: pd.Series, r: pd.Series) -> pd.Series:
    return pd.Series(
        [
            ofac_name_score(list(qn or []), list(rn or []))
            for qn, rn in zip(q, r)
        ]
    )


OFAC_FEATURES = [
    Feature("f_ofac_name", 1.0),
    Feature("f_country_mismatch", -0.1, qualifier=True),
    Feature("f_dob_year_disjoint", -0.1, qualifier=True),
    Feature("f_dob_day_disjoint", -0.15, qualifier=True),
    Feature("f_gender_mismatch", -0.1, qualifier=True),
    Feature("f_orgid_disjoint", -0.1, qualifier=True),
]


def score_pairs_ofac(pairs: DataFrame) -> DataFrame:
    """OFAC matcher over an assembled pair frame (weighted sum, clamped)."""
    df = pairs.select(
        "*",
        ofac_name_score_udf(F.col("l_names"), F.col("r_names")).alias("f_ofac_name"),
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
    return weighted_sum_score(df, OFAC_FEATURES)
