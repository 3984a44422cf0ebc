"""Matcher feature semantics tests — mirror the reference's matcher test
strategy (SURVEY.md §5): per-feature threshold assertions on hand-built
pairs. Reference behaviors cited per case."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nomenklatura_spark.functions import compare as C
from nomenklatura_spark.functions.names_compare import (
    jaro_winkler,
    metaphone,
    person_name_jw,
)
from nomenklatura_spark.functions.scoring import Feature, heuristic_score
from nomenklatura_spark.matching.logic import score_pairs_logic_v1

PAIR_SCHEMA = (
    "lid string, rid string, l_dates array<string>, r_dates array<string>,"
    " l_vals array<string>, r_vals array<string>"
)


def _one(spark, expr, **arrays):
    cols = ", ".join(f"{k} array<string>" for k in arrays)
    df = spark.createDataFrame([tuple(arrays.values())], cols)
    return df.select(expr.alias("x")).collect()[0]["x"]


# --- dates (reference compare/dates.py) ------------------------------------

def test_dob_matches_exact(spark):
    score = _one(
        spark,
        C.dob_matches(F.col("q"), F.col("r")),
        q=["1980-04-16"],
        r=["1980-04-16"],
    )
    assert score == 1.0


def test_dob_matches_flipped_half(spark):
    # day/month flip is "such a common mistake" → 0.5 (dates.py:19-37)
    score = _one(
        spark,
        C.dob_matches(F.col("q"), F.col("r")),
        q=["1980-04-16"],
        r=["1980-16-04"],
    )
    assert score == 0.5


def test_dob_day_disjoint_full_mismatch(spark):
    score = _one(
        spark,
        C.dob_day_disjoint(F.col("q"), F.col("r")),
        q=["1980-04-16"],
        r=["1991-01-01"],
    )
    assert score == 1.0


def test_dob_day_disjoint_requires_full_dates(spark):
    # year-only values have no day precision → not applicable → 0
    score = _one(
        spark,
        C.dob_day_disjoint(F.col("q"), F.col("r")),
        q=["1980"],
        r=["1991-01-01"],
    )
    assert score == 0.0


def test_dob_year(spark):
    assert (
        _one(spark, C.dob_year_matches(F.col("q"), F.col("r")), q=["1980-04"], r=["1980"])
        == 1.0
    )
    assert (
        _one(spark, C.dob_year_disjoint(F.col("q"), F.col("r")), q=["1980"], r=["1981"])
        == 1.0
    )


# --- set features ----------------------------------------------------------

def test_country_gender_mismatch(spark):
    assert _one(spark, C.country_mismatch(F.col("q"), F.col("r")), q=["de"], r=["fr"]) == 1.0
    assert _one(spark, C.country_mismatch(F.col("q"), F.col("r")), q=["de"], r=["de", "fr"]) == 0.0
    # empty side → not applicable (compare/util.py:8-16)
    assert _one(spark, C.country_mismatch(F.col("q"), F.col("r")), q=[], r=["fr"]) == 0.0
    assert _one(spark, C.gender_mismatch(F.col("q"), F.col("r")), q=["male"], r=["female"]) == 1.0


def test_identifier_match_normalizes(spark):
    # "IN-1234 56" ≡ "in123456" after strict normalization
    assert (
        _one(spark, C.identifier_match(F.col("q"), F.col("r")), q=["IN-1234 56"], r=["in123456"])
        == 1.0
    )
    assert (
        _one(spark, C.identifier_match(F.col("q"), F.col("r")), q=["XX-111"], r=["YY-222"])
        == 0.0
    )


def test_numbers_mismatch(spark):
    assert (
        _one(spark, C.numbers_mismatch(F.col("q"), F.col("r")), q=["12 Main St"], r=["99 Other Rd"])
        == 1.0
    )
    assert (
        _one(spark, C.numbers_mismatch(F.col("q"), F.col("r")), q=["12 Main"], r=["12 Other"])
        == 0.0
    )


def test_name_literal_and_weak_alias(spark):
    assert (
        _one(spark, C.name_literal_match(F.col("q"), F.col("r")), q=["Vladimir  Putin"], r=["vladimir putin"])
        == 1.0
    )
    assert (
        _one(spark, C.weak_alias_match(F.col("q"), F.col("r")), q=["VP"], r=["vp"])
        == 1.0
    )


# --- strict levenshtein (logic_v2/names/distance.py:8-20) ------------------

def test_strict_levenshtein(spark):
    df = spark.createDataFrame([("mikhail", "mikhael")], "a string, b string")
    score = df.select(C.strict_levenshtein(F.col("a"), F.col("b")).alias("s")).collect()[0]["s"]
    # len 7, max_edits=1, dist=1 → (1 - 1/7)^1
    assert score == pytest.approx((1 - 1 / 7) ** 1)
    df2 = spark.createDataFrame([("ab", "ba")], "a string, b string")
    score2 = df2.select(C.strict_levenshtein(F.col("a"), F.col("b")).alias("s")).collect()[0]["s"]
    assert score2 == 0.0  # max_edits < 1 and not equal


# --- jaro-winkler / metaphone kernels -------------------------------------

def test_jaro_winkler_known_value():
    # classic published example
    assert jaro_winkler("martha", "marhta") == pytest.approx(0.9611, abs=1e-4)
    assert jaro_winkler("abc", "abc") == 1.0
    assert jaro_winkler("abc", "xyz") == 0.0


def test_metaphone_equivalences():
    assert metaphone("Smith") == metaphone("Smyth")
    assert metaphone("Catherine") == metaphone("Kathryn")
    assert metaphone("") == ""


def test_person_name_jw_alignment():
    # reordered name parts should still align (compare/names.py:19-51)
    s = person_name_jw(["Vladimir Putin"], ["Putin, Vladimir"])
    assert s == pytest.approx(1.0)
    s2 = person_name_jw(["Vladimir Putin"], ["Vladimir Pudin"])
    assert 0.5 < s2 < 1.0


# --- X1 combination (types.py:264-308, logic_v1/model.py:63-81) ------------

def test_heuristic_score_skips_qualifiers_without_mains(spark):
    df = spark.createDataFrame(
        [(0.0, 1.0), (0.9, 1.0), (0.9, 0.0)], "f_main double, f_qual double"
    )
    feats = [Feature("f_main", 1.0), Feature("f_qual", -0.2, qualifier=True)]
    rows = heuristic_score(df, feats).select("score").collect()
    scores = [r["score"] for r in rows]
    assert scores[0] == 0.0  # no main → qualifiers skipped
    assert scores[1] == pytest.approx(0.7)  # 0.9 - 0.2
    assert scores[2] == pytest.approx(0.9)


def test_heuristic_score_clamps(spark):
    df = spark.createDataFrame([(1.0, 1.0)], "f_a double, f_b double")
    feats = [Feature("f_a", 1.0), Feature("f_b", 0.9)]
    score = heuristic_score(df, feats).collect()[0]["score"]
    assert score == 1.0


# --- end-to-end logic_v1 over assembled pairs ------------------------------

def _pair_frame(spark, l_schema, r_schema, l_names, r_names, **kw):
    row = {
        "lid": "a",
        "rid": "b",
        "l_schema": l_schema,
        "r_schema": r_schema,
        "l_names": l_names,
        "r_names": r_names,
        "l_birth_dates": kw.get("l_birth_dates", []),
        "r_birth_dates": kw.get("r_birth_dates", []),
        "l_countries": kw.get("l_countries", []),
        "r_countries": kw.get("r_countries", []),
        "l_genders": [],
        "r_genders": [],
        "l_identifiers": kw.get("l_identifiers", []),
        "r_identifiers": kw.get("r_identifiers", []),
        "l_public_keys": kw.get("l_public_keys", []),
        "r_public_keys": kw.get("r_public_keys", []),
        "l_weak_aliases": [],
        "r_weak_aliases": kw.get("r_weak_aliases", []),
        "l_last_names": [],
        "r_last_names": [],
        "l_all_values": l_names + kw.get("l_countries", []),
        "r_all_values": r_names + kw.get("r_countries", []),
    }
    array_cols = [
        k for k in row
        if k not in ("lid", "rid", "l_schema", "r_schema")
    ]
    schema = (
        "lid string, rid string, l_schema string, r_schema string, "
        + ", ".join(f"{k} array<string>" for k in array_cols)
    )
    ordered = (
        [row["lid"], row["rid"], row["l_schema"], row["r_schema"]]
        + [row[k] for k in array_cols]
    )
    return spark.createDataFrame([tuple(ordered)], schema)


def test_logic_v1_person_match(spark):
    pairs = _pair_frame(
        spark, "Person", "Person", ["Johanna Quandt"], ["Frau Johanna Quandt"]
    )
    score = score_pairs_logic_v1(pairs).collect()[0]["score"]
    assert score > 0.5  # the reference's golden xref case surfaces this pair


def test_logic_v1_company_identifier(spark):
    pairs = _pair_frame(
        spark,
        "Company",
        "Company",
        ["Zeta Petrochemical GmbH"],
        ["Zeta Petrochemical"],
        l_identifiers=["HRB-123"],
        r_identifiers=["hrb123"],
    )
    row = score_pairs_logic_v1(pairs).collect()[0]
    assert row["f_identifier"] == 1.0
    assert row["score"] >= 0.85


def test_logic_v1_qualifier_penalty(spark):
    base = _pair_frame(
        spark, "Person", "Person", ["Johanna Quandt"], ["Johanna Quandt"],
        l_countries=["de"], r_countries=["de"],
    )
    penalized = _pair_frame(
        spark, "Person", "Person", ["Johanna Quandt"], ["Johanna Quandt"],
        l_countries=["de"], r_countries=["fr"],
    )
    s_base = score_pairs_logic_v1(base).collect()[0]["score"]
    s_pen = score_pairs_logic_v1(penalized).collect()[0]["score"]
    assert s_pen == pytest.approx(s_base - 0.2)


def test_algorithm_registry_names():
    """Every reference algorithm name resolves (matching/__init__.py:11-30);
    regression entries raise a helpful training pointer."""
    import pytest

    from nomenklatura_spark.matching import ALGORITHMS, get_algorithm

    for name in ("logic-v1", "logic-v2", "ofac", "name-based",
                 "name-qualified", "regression-v1", "er-unstable"):
        assert get_algorithm(name) is not None, name
    assert get_algorithm("nope") is None
    with pytest.raises(ValueError, match="train_logistic"):
        ALGORITHMS["regression-v1"](None)


def test_name_based_kernel_semantics():
    """name-based = 0.5·(per-query-word best JW > 0.5) + 0.5·(soundex
    overlap / min set size) — reference name_based/names.py."""
    from nomenklatura_spark.functions.names_compare import jaro_winkler
    from nomenklatura_spark.matching.name_based import (
        name_based_score,
        soundex,
    )

    assert soundex("Robert") == "R163" and soundex("Rupert") == "R163"
    assert soundex("Tymczak") == "T522"
    assert name_based_score(["John Smith"], ["John Smith"]) == 1.0
    # identical soundex, jaro component = mean of per-word best JW
    jw = (jaro_winkler("john", "jon") + jaro_winkler("smith", "smith")) / 2
    got = name_based_score(["John Smith"], ["Jon Smith"])
    assert abs(got - (0.5 * jw + 0.5 * 1.0)) < 1e-9
    assert name_based_score(["Wholly Unrelated"], ["Other Person"]) < 0.5


def test_name_based_scorers_over_pairs(spark):
    from nomenklatura_spark.matching import (
        score_pairs_name_based,
        score_pairs_name_qualified,
    )

    pairs = spark.createDataFrame(
        [
            (["John Smith"], ["Jon Smith"], ["us"], ["de"], ["1980"],
             ["1981"], ["male"], ["female"], ["x1"], ["x2"]),
        ],
        "l_names array<string>, r_names array<string>, "
        "l_countries array<string>, r_countries array<string>, "
        "l_birth_dates array<string>, r_birth_dates array<string>, "
        "l_genders array<string>, r_genders array<string>, "
        "l_identifiers array<string>, r_identifiers array<string>",
    )
    plain = score_pairs_name_based(pairs).first()["score"]
    qual = score_pairs_name_qualified(pairs).first()["score"]
    assert plain > 0.9
    # qualifiers: country -0.1, dob_year -0.1, gender -0.1, orgid -0.1
    assert qual < plain - 0.3
