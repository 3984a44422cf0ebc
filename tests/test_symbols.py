"""Symbol lexicon (T3) and symbolic name scoring (C1) behavior.

Pins the category semantics from the reference's tables
(``logic_v2/names/magic.py:8-63``) as re-expressed over the compact
public lexicon, plus Spark/DuckDB parity of the ``sy:`` token emission.
"""

from __future__ import annotations

import duckdb
import pytest

from nomenklatura_spark.matching.names_v2 import (
    name_pair_score,
    name_match,
    object_name_match,
)
from nomenklatura_spark.matching.symbols import (
    blocker_symbol_map,
    symbol_sql_expr,
    token_symbol,
)


def test_token_symbol_categories():
    # org-class folding
    assert token_symbol("ltd") == token_symbol("limited") == "org:ltd"
    # one "limited liability" concept class (see symbols.py note)
    assert token_symbol("ooo") == token_symbol("llc") == "org:ltd"
    # the whole joint-stock family shares one class (frozen logic_v2 run
    # pairs "OAO Gazprom" ~ "Gazprom JSC" at the ORG_CLASS score)
    assert token_symbol("oao") == token_symbol("ojsc") == "org:jsc"
    # numerics: digits, ordinals, romans, words fold to the value
    assert (
        token_symbol("2")
        == token_symbol("2nd")
        == token_symbol("ii")
        == token_symbol("two")
        == token_symbol("second")
        == "num:2"
    )
    assert token_symbol("007") == "num:7"
    # single-letter romans excluded (initial collision)
    assert token_symbol("i") is None and token_symbol("v") is None
    # nicknames fold to the formal name; formal name tags itself
    assert token_symbol("bill") == token_symbol("william") == "nick:william"
    # generic vocabulary and domains
    assert token_symbol("intl") == "sym:international"
    assert token_symbol("medical") == "dom:medical"
    assert token_symbol("xyzzy") is None
    # >18-digit runs are not numerals
    assert token_symbol("1" * 19) is None


def test_symbol_sql_parity():
    """DuckDB oracle expression produces identical symbols (blocker set)."""
    toks = list(blocker_symbol_map())[:200] + ["2", "2nd", "007", "xyzzy", "intl"]
    expr = symbol_sql_expr("t")
    rows = duckdb.sql(
        f"SELECT t, {expr} AS s FROM (SELECT unnest({toks!r}) AS t)"
    ).fetchall()
    bmap = blocker_symbol_map()
    for t, s in rows:
        want = bmap.get(t)
        if t.isdigit():
            want = f"num:{int(t)}"
        if t == "2nd":
            want = "num:2"
        assert s == want, (t, s, want)


def test_equal_generic_symbol_low_weight():
    # shared generic vocabulary must not carry the match (weight 0.3)
    assert name_pair_score("a b international", "x international") < 0.3


def test_numeric_symbols_separate_vessels():
    same = name_pair_score("vessel 2", "vessel ii")
    diff = name_pair_score("vessel 1", "vessel 2")
    assert same > 0.9
    assert diff <= 0.5
    # numeric extras are expensive to omit (EXTRAS_WEIGHTS 1.3 > default)
    with_num = name_pair_score("pe fund 1", "pe fund")
    without = name_pair_score("pe fund x", "pe fund")
    assert with_num < without


def test_org_class_folding_scores():
    # cross-language legal-form classes pair symbolically
    assert name_pair_score("gazprom ooo", "gazprom llc") > 0.9
    assert name_pair_score("siemens ag", "siemens aktiengesellschaft") > 0.9
    # omitted org class is cheap (EXTRAS 0.7): still a strong match
    assert name_pair_score("siemens ag", "siemens") > 0.6


def test_nickname_pairing():
    assert name_pair_score("bill clinton", "william clinton") > 0.8
    # fuzzy surface beats a weaker nick edge (max-over-pairings emulation)
    jon = name_pair_score("jon smith", "john smith")
    assert jon > name_pair_score("bill smith", "william smith") - 0.1
    assert name_match(["Pepe Gonzalez"], ["Jose Gonzalez"]) > 0.7


def test_object_names():
    # vessel prefix stripping → literal
    assert object_name_match(["M/V Ocean Star"], ["Ocean Star"]) == 1.0
    # number mismatch penalty ×0.7
    one = object_name_match(["Ocean Star 1"], ["Ocean Star 2"])
    assert 0.4 < one < 0.7
    # whole-name fuzzy at 1 edit per 5 chars
    assert object_name_match(["Akademik Lomonosov"], ["Akademik Lomonosow"]) > 0.8
    assert object_name_match(["Akademik Lomonosov"], ["Titanic"]) == 0.0


def test_npi_luhn(spark):
    from nomenklatura_spark.matching.names_v2 import format_identifier_scores

    # 1234567893 is the CMS specification's worked example (valid);
    # flipping the check digit must fail despite matching the shape.
    df = spark.createDataFrame(
        [(["1234567893"], ["1234567893"]), (["1234567890"], ["1234567890"])],
        "l array<string>, r array<string>",
    )
    from pyspark.sql import functions as F

    out = df.select(
        *format_identifier_scores(F.col("l"), F.col("r"))
    ).collect()
    assert [r.f_id_npi for r in out] == [1.0, 0.0]


@pytest.mark.parametrize("value,expected", [
    ("Vessel II", {"sy:num:2"}),
    ("Gazprom OOO", {"sy:org:ltd"}),
    # "holdings" is sym-category (excluded from blocking), "medical" is dom
    ("Bill Medical Holdings", {"sy:nick:william", "sy:dom:medical"}),
    ("Plain Name", set()),
])
def test_tokenizer_emits_symbol_tokens(spark, value, expected):
    from nomenklatura_spark.functions.tokenize import tokenize_statements

    stmts = spark.createDataFrame(
        [("Company", "e1", value, "name")],
        "schema string, canonical_id string, value string, prop_type string",
    )
    toks = tokenize_statements(stmts).collect()
    got = {r.token for r in toks if r.field == "sy"}
    assert got == expected
