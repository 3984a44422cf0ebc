"""C1/C14 — LogicV2-style name matching and address matching.

Behavioral re-expression (NOT a port) of the reference's LogicV2 name
matcher (``nomenklatura/matching/logic_v2/names/match.py:29-244``) and
address comparison (``nomenklatura/matching/compare/addresses.py:25-71``).

The reference's name matcher leans on rigour's cultural symbol tables
(org-class/nick/location symbol pairing).  This engine re-expresses the
*scoring structure* — literal early-exit, symbol pairing, part alignment,
per-category score/weight, extras penalties, stopword dampening,
family-name boost, weighted-mean combination, max over the name product —
over the compact public lexicon in ``matching/symbols.py`` (ORG_CLASS /
SYMBOL / DOMAIN / NUMERIC / NICK categories with the reference's
``SYM_SCORES``/``SYM_WEIGHTS``/``EXTRAS_WEIGHTS`` tables, ``magic.py:8-63``),
plus structural INITIAL pairing.  Documented deviations:

- LOCATION symbols and per-script name analysis need gazetteer /
  linguistic databases this engine does not bundle;
- residue alignment is greedy best-pair on strict-Levenshtein scores
  (``logic_v2/names/distance.py:8-20`` semantics: 1 edit budget per 4
  chars, score ``(1 - d/len)^max_edits``) with a metaphone fallback at
  0.6, instead of rigour's cost-folded DP (``match.py:64-80``);
- the literal early-exit has no part-role compatibility guard
  (``util.py:part_tags_compatible``) — part tags aren't modelled;
- family-name boost (×1.3) applies to parts appearing in the entity's
  ``lastName`` values (config default ``nm_family_name_weight``,
  ``logic_v2/model.py:74-78``), matched or unmatched (``match.py:100-116``);
- extras weights: unmatched query parts ×0.8, unmatched result parts
  ×0.2 (``nm_extra_query_name`` / ``nm_extra_result_name`` defaults),
  biased per symbol category (``magic.py:weight_extra_match``: single
  stopword extras → 0.5, org/symbol ×0.7, numeric ×1.3);
- stopword single-part matches dampen ×0.7 (``match.py:92-99``);
- object-name matching (Vessel/Airplane/Security) uses whole-name
  strict-Levenshtein at 1-edit-per-5-chars with a ×0.7 number-mismatch
  penalty after prefix stripping (``match.py:141-171``,
  ``nm_number_mismatch`` default 0.3).

All of it runs in one Arrow-batched pandas UDF over blocked pairs; name
normalisation happens once per side before the pair join.
"""

from __future__ import annotations

import re
from functools import lru_cache

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from nomenklatura_spark.functions import compare as C
from nomenklatura_spark.functions.names_compare import metaphone
from nomenklatura_spark.functions.normalize import LEGAL_FORMS, STOP_TOKENS
from nomenklatura_spark.functions.scoring import Feature, heuristic_score
from nomenklatura_spark.matching.symbols import (
    EXTRAS_WEIGHTS,
    SYM_SCORES,
    SYM_WEIGHTS,
    token_symbol,
)

EXTRA_QUERY_WEIGHT = 0.8
EXTRA_RESULT_WEIGHT = 0.2
FAMILY_NAME_WEIGHT = 1.3
STOPWORD_DAMPEN = 0.7
STOPWORD_EXTRA_BIAS = 0.5
INITIAL_SCORE, INITIAL_WEIGHT = 0.9, 0.5
METAPHONE_SCORE = 0.6
NUMBER_MISMATCH_PENALTY = 0.3

# Schemas whose names are "things" (NameTypeTag.OBJ in the reference,
# followthemoney.names.schema_type_tag): whole-name fuzzy match instead
# of part alignment.
OBJ_SCHEMAS = frozenset({"Vessel", "Airplane", "Security"})

_LEGAL = frozenset(LEGAL_FORMS)
_STOP = frozenset(STOP_TOKENS)

_SPLIT_RE = re.compile(r"[^0-9a-zÀ-ɏЀ-ӿ]+")


def levenshtein(a: str, b: str) -> int:
    if a == b:
        return 0
    if not a or not b:
        return len(a) + len(b)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@lru_cache(maxsize=100_000)
def strict_levenshtein_py(left: str, right: str, max_rate: int = 4) -> float:
    """1 edit allowed per ``max_rate`` chars; score (1 - d/len)^max_edits."""
    if left == right:
        return 1.0
    max_len = max(len(left), len(right))
    max_edits = max_len // max_rate
    if max_edits < 1:
        return 0.0
    d = levenshtein(left, right)
    if d > max_edits:
        return 0.0
    return (1 - (d / max_len)) ** max_edits


@lru_cache(maxsize=100_000)
def _parts(name: str) -> tuple[str, ...]:
    return tuple(t for t in _SPLIT_RE.split(name.lower()) if t)


def _pair_score(qp: str, rp: str) -> tuple[float, float] | None:
    """(score, weight) for one aligned part pair, or None if no match.

    Symbol pairing first: two parts sharing a symbol id score/weigh per
    category (``SYM_SCORES``/``SYM_WEIGHTS``) — this is what keeps an
    equal generic term ("International"=="International") from dominating
    the mean (weight 0.3), and makes "Vessel 1" vs "Vessel 2" diverge
    (unshared NUMERIC).  Literal equality of a symbol-tagged pair rescues
    the score to 1.0 but keeps the category weight (``match.py:103-111``).
    """
    qs, rs = token_symbol(qp), token_symbol(rp)
    if qs is not None and qs == rs:
        cat = qs.split(":", 1)[0]
        if qp == rp:
            # literal rescue: score 1.0, category weight retained —
            # an equal "international" stays low-influence (w 0.3).
            return 1.0, SYM_WEIGHTS[cat]
        # Non-equal symbol pair: the reference maximises over pairings
        # with and without the symbol edge, so a stronger fuzzy surface
        # match ("jon"~"john", 0.75) beats a weaker nick edge (0.6).
        fuzzy = strict_levenshtein_py(qp, rp)
        if fuzzy > SYM_SCORES[cat]:
            return fuzzy, 1.0
        return SYM_SCORES[cat], SYM_WEIGHTS[cat]
    if qp == rp:
        return 1.0, 1.0
    if qp in _LEGAL and rp in _LEGAL:
        # distinct legal-form classes ("gmbh" vs "inc"): weak org evidence
        return SYM_SCORES["org"] * 0.5, SYM_WEIGHTS["org"]
    if len(qp) == 1 and rp.startswith(qp):
        return INITIAL_SCORE, INITIAL_WEIGHT
    if len(rp) == 1 and qp.startswith(rp):
        return INITIAL_SCORE, INITIAL_WEIGHT
    s = strict_levenshtein_py(qp, rp)
    if s > 0.0:
        return s, 1.0
    if len(qp) >= 3 and len(rp) >= 3 and metaphone(qp) == metaphone(rp) != "":
        return METAPHONE_SCORE, 1.0
    return None


def _extra_weight(part: str, side_weight: float, family: frozenset[str]) -> float:
    """Weight of an unmatched name part (``magic.py:weight_extra_match``):
    single stopword extras bias to 0.5 (then the ×0.7 stopword multiplier
    composes, as in ``match.py:92-99``); symbol-tagged extras bias per
    ``EXTRAS_WEIGHTS`` (org/symbol cheap to omit, numeric expensive)."""
    if part in _STOP:
        w = side_weight * STOPWORD_EXTRA_BIAS * STOPWORD_DAMPEN
    else:
        sym = token_symbol(part)
        cat = sym.split(":", 1)[0] if sym else None
        w = side_weight * EXTRAS_WEIGHTS.get(cat, 1.0)
    if part in family:
        w *= FAMILY_NAME_WEIGHT
    return w


def name_pair_score(
    query: str, result: str, family: frozenset[str] = frozenset()
) -> float:
    qps, rps = list(_parts(query)), list(_parts(result))
    if not qps or not rps:
        return 0.0
    if qps == rps:
        return 1.0
    # greedy best-pair alignment over the part product
    cands: list[tuple[float, float, str, str]] = []
    for qp in set(qps):
        for rp in set(rps):
            sw = _pair_score(qp, rp)
            if sw is not None:
                cands.append((sw[0], sw[1], qp, rp))
    cands.sort(key=lambda x: (-x[0] * x[1], x[2], x[3]))
    matches: list[tuple[float, float, str, str]] = []
    q_left, r_left = list(qps), list(rps)
    for s, w, qp, rp in cands:
        while qp in q_left and rp in r_left:
            q_left.remove(qp)
            r_left.remove(rp)
            matches.append((s, w, qp, rp))
    # extras: unmatched parts contribute score 0 at a reduced weight
    scored: list[tuple[float, float]] = []
    for s, w, qp, rp in matches:
        if (qp in _STOP) or (rp in _STOP):
            w *= STOPWORD_DAMPEN
        if qp in family or rp in family:
            w *= FAMILY_NAME_WEIGHT
        scored.append((s, w))
    for qp in q_left:
        scored.append((0.0, _extra_weight(qp, EXTRA_QUERY_WEIGHT, family)))
    for rp in r_left:
        scored.append((0.0, _extra_weight(rp, EXTRA_RESULT_WEIGHT, family)))
    total_w = sum(w for _, w in scored)
    if total_w <= 0.0:
        return 0.0
    return sum(s * w for s, w in scored) / total_w


def name_match(
    query_names: list[str],
    result_names: list[str],
    family_names: list[str] | None = None,
) -> float:
    """Max over the (query, result) name product with 1.0 early exit."""
    family = frozenset(
        p for n in (family_names or []) for p in _parts(n)
    )
    best = 0.0
    for qn in query_names or []:
        for rn in result_names or []:
            s = name_pair_score(qn, rn, family)
            if s > best:
                best = s
                if best >= 1.0:
                    return 1.0
    return best


# --- object-name matching (match.py:141-171) -------------------------------

_OBJ_PREFIX_RE = re.compile(r"^(?:m[/.]?[vsty]|s[/.]?[sy]|rms|hms|uss|fv|mfv)[\s.]+")
_NUMERIC_RE = re.compile(r"\d+")


def _obj_norm(name: str) -> str:
    s = _OBJ_PREFIX_RE.sub("", name.lower().strip())
    return " ".join(t for t in _SPLIT_RE.split(s) if t)


def obj_numbers_mismatch(query: str, result: str) -> bool:
    """Query-side numerals absent from the result (``util.py:58-64``)."""
    return bool(
        set(_NUMERIC_RE.findall(query)) - set(_NUMERIC_RE.findall(result))
    )


def object_name_match(query_names: list[str], result_names: list[str]) -> float:
    """Whole-name strict Levenshtein (1 edit per 5 chars) over the name
    product after vessel-prefix stripping; numerals missing on the result
    side cost ×(1 - 0.3)."""
    best = 0.0
    r_norms = [_obj_norm(n) for n in result_names or []]
    for qn in query_names or []:
        q = _obj_norm(qn)
        if not q:
            continue
        for r in r_norms:
            if not r:
                continue
            score = strict_levenshtein_py(q, r, max_rate=5)
            if obj_numbers_mismatch(q, r):
                score *= 1.0 - NUMBER_MISMATCH_PENALTY
            if score > best:
                best = score
    return best


@F.pandas_udf(T.DoubleType())
def object_name_match_udf(q: pd.Series, r: pd.Series) -> pd.Series:
    return pd.Series(
        [object_name_match(list(qn or []), list(rn or [])) for qn, rn in zip(q, r)]
    )


@F.pandas_udf(T.DoubleType())
def name_match_udf(q: pd.Series, r: pd.Series, fam: pd.Series) -> pd.Series:
    return pd.Series(
        [
            name_match(list(qn or []), list(rn or []), list(fn or []))
            for qn, rn, fn in zip(q, r, fam)
        ]
    )


# --- address matching (C14) ------------------------------------------------

_ADDR_DROP = frozenset(
    "street str st road rd avenue ave boulevard blvd lane ln suite ste floor "
    "fl apt unit building bldg po box".split()
)


@lru_cache(maxsize=100_000)
def _addr_tokens(addr: str) -> frozenset[str]:
    return frozenset(
        t for t in _SPLIT_RE.split(addr.lower()) if t and t not in _ADDR_DROP
    )


def address_match(query_addrs: list[str], result_addrs: list[str]) -> float:
    """Token-overlap + sorted-residue Levenshtein blend:
    score = (|overlap| + rem * lev) / (rem + |overlap|); subset → 1.0."""
    best = 0.0
    q_sets = [_addr_tokens(a) for a in query_addrs or []]
    r_sets = [_addr_tokens(a) for a in result_addrs or []]
    for qt in q_sets:
        for rt in r_sets:
            if not qt or not rt:
                continue
            overlap = qt & rt
            if len(overlap) == len(qt) or len(overlap) == len(rt):
                return 1.0
            q_rem = sorted(qt - overlap)
            r_rem = sorted(rt - overlap)
            q_fuzzy, r_fuzzy = " ".join(q_rem), " ".join(r_rem)
            max_len = max(len(q_fuzzy), len(r_fuzzy))
            lev = 1.0 - levenshtein(q_fuzzy, r_fuzzy) / max_len if max_len else 0.0
            rem_len = max(len(q_rem), len(r_rem))
            score = (len(overlap) + rem_len * lev) / (rem_len + len(overlap))
            best = max(best, score)
    return best


@F.pandas_udf(T.DoubleType())
def address_match_udf(q: pd.Series, r: pd.Series) -> pd.Series:
    return pd.Series(
        [address_match(list(qn or []), list(rn or [])) for qn, rn in zip(q, r)]
    )


# --- identifier format matchers (C12, logic_v2/identifiers.py:57-173) ------

ID_FORMATS = {
    # format: (regex over cleaned uppercase values, score)
    "lei": (r"^[0-9A-Z]{18}[0-9]{2}$", 0.95),
    "isin": (r"^[A-Z]{2}[0-9A-Z]{9}[0-9]$", 0.98),
    "bic": (r"^[A-Z]{4}[A-Z]{2}[0-9A-Z]{2}([0-9A-Z]{3})?$", 0.95),
    "ogrn": (r"^[15][0-9]{12}$", 0.95),
    "inn": (r"^[0-9]{10}([0-9]{2})?$", 0.95),
    "imo": (r"^IMO[0-9]{7}$", 0.95),
    # UEI: 12 alphanumeric, no O/I, first char nonzero (SAM.gov format).
    "uei": (r"^[A-HJ-NP-Z1-9][A-HJ-NP-Z0-9]{11}$", 0.95),
    # NPI: 10 digits starting 1/2; Luhn checksum verified (see _npi_valid).
    "npi": (r"^[12][0-9]{9}$", 0.95),
}


def _npi_valid(x):
    """CMS NPI check: Luhn over the 9 identifier digits with the
    published ``80840``-prefix constant 24; the 10th digit is the check
    digit.  Pure column arithmetic (9 unrolled terms), no UDF."""
    def dig(i: int):
        return F.substring(x, i, 1).cast("int")

    total = F.lit(24)
    for i in range(1, 10):
        v = dig(i)
        if i % 2 == 1:  # d1, d3, ... d9 double (alternating from the left)
            doubled = v * 2
            v = F.when(doubled > 9, doubled - 9).otherwise(doubled)
        total = total + v
    return (total + dig(10)) % 10 == 0


def format_identifier_scores(l_ids, r_ids) -> list:
    """One column per identifier format: 1.0 iff a value matching the
    format's shape appears on both sides.  Pure column expressions
    (upper + filter + arrays_overlap) — no UDF."""
    def _keeper(pattern: str, fmt: str):
        # F.filter introspects the lambda arity — exactly one parameter.
        def keep(x):
            ok = x.rlike(pattern)
            if fmt == "npi":
                ok = ok & _npi_valid(x)
            return ok

        return keep

    cols = []
    for name, (pattern, _w) in ID_FORMATS.items():
        keep = _keeper(pattern, name)
        lf = F.filter(
            F.transform(l_ids, lambda x: F.upper(F.regexp_replace(x, r"[\s-]", ""))),
            keep,
        )
        rf = F.filter(
            F.transform(r_ids, lambda x: F.upper(F.regexp_replace(x, r"[\s-]", ""))),
            keep,
        )
        cols.append(
            F.when(F.arrays_overlap(lf, rf), F.lit(1.0))
            .otherwise(F.lit(0.0))
            .alias(f"f_id_{name}")
        )
    return cols


# --- LogicV2 matcher -------------------------------------------------------

LOGIC_V2_FEATURES = [
    Feature("f_name_v2", 1.0),
    Feature("f_address_entity", 0.98),
    Feature("f_crypto_wallet", 0.98),
    Feature("f_id_isin", 0.98),
    Feature("f_id_lei", 0.95),
    Feature("f_id_ogrn", 0.95),
    Feature("f_id_imo", 0.95),
    Feature("f_id_inn", 0.95),
    Feature("f_id_bic", 0.95),
    Feature("f_id_uei", 0.95),
    Feature("f_id_npi", 0.95),
    Feature("f_identifier", 0.85),
    Feature("f_weak_alias", 0.8),
    Feature("f_address_prop", 0.2, qualifier=True),
    Feature("f_country_mismatch", -0.2, qualifier=True),
    Feature("f_dob_year_disjoint", -0.15, qualifier=True),
    Feature("f_dob_day_disjoint", -0.25, qualifier=True),
    Feature("f_gender_mismatch", -0.2, qualifier=True),
]


def score_pairs_logic_v2(pairs: DataFrame) -> DataFrame:
    """LogicV2 scoring over an assembled pair frame (X1 combination).

    Expects the pair frame from ``operators.pairs`` (l_/r_ prefixed
    feature arrays incl. ``l_addresses``/``l_last_names``).
    """
    is_address = (F.col("l_schema") == "Address") & (F.col("r_schema") == "Address")
    is_obj = F.col("l_schema").isin(*OBJ_SCHEMAS) & F.col("r_schema").isin(
        *OBJ_SCHEMAS
    )
    df = pairs.select(
        "*",
        F.when(
            is_obj,
            object_name_match_udf(F.col("l_names"), F.col("r_names")),
        )
        .otherwise(
            name_match_udf(
                F.col("l_names"), F.col("r_names"), F.col("r_last_names")
            )
        )
        .alias("f_name_v2"),
        F.when(
            is_address,
            address_match_udf(F.col("l_addresses"), F.col("r_addresses")),
        )
        .otherwise(F.lit(0.0))
        .alias("f_address_entity"),
        F.when(
            ~is_address,
            address_match_udf(F.col("l_addresses"), F.col("r_addresses")),
        )
        .otherwise(F.lit(0.0))
        .alias("f_address_prop"),
        C.crypto_wallet_address(
            F.col("l_public_keys"),
            F.col("r_public_keys"),
            F.col("l_schema"),
            F.col("r_schema"),
        ).alias("f_crypto_wallet"),
        C.identifier_match(F.col("l_identifiers"), F.col("r_identifiers")).alias(
            "f_identifier"
        ),
        C.weak_alias_match(F.col("l_names"), F.col("r_weak_aliases")).alias(
            "f_weak_alias"
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
        *format_identifier_scores(F.col("l_identifiers"), F.col("r_identifiers")),
    )
    return heuristic_score(df, LOGIC_V2_FEATURES)
