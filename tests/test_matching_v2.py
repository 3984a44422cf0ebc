"""OFAC emulation, LogicV2-style name/address matching, and the spark.ml
regression training pipeline.

The OFAC kernel tests pin the three documented quirks (token-order
asymmetry, short-token drop, per-pair floor); the train test proves the
coefficients-as-expression fold is exactly the fitted spark.ml model.
"""

from __future__ import annotations

import pytest

from pyspark.sql import Row, functions as F


# --- OFAC kernels ----------------------------------------------------------

def test_ofac_token_order_asymmetry():
    from nomenklatura_spark.matching.ofac import whole_string_score

    fwd = whole_string_score("GEORGE BUSH", "GEORGE W BUSH")
    rev = whole_string_score("BUSH GEORGE", "GEORGE W BUSH")
    assert fwd > 0.8
    assert rev == 0.0  # first-letter gate


def test_ofac_short_token_drop():
    from nomenklatura_spark.matching.ofac import per_token_score

    # UN (len 2) is dropped; KIM JONG alone matches perfectly
    assert per_token_score("KIM JONG UN", "KIM JONG") == pytest.approx(1.0)
    # but a single short token is never dropped to empty
    assert per_token_score("Z", "Z") == pytest.approx(1.0)


def test_ofac_per_pair_floor():
    from nomenklatura_spark.matching.ofac import per_token_score
    from nomenklatura_spark.functions.names_compare import jaro

    # BUSH vs HASWANI lands under the 0.5 floor → zeroed, mean = jw/2
    s = per_token_score("GEORGE BUSH", "GEORGE HASWANI")
    assert s == pytest.approx(0.5, abs=0.02)
    assert jaro("BUSH", "HASWANI") < 0.5


def test_ofac_entity_max_over_aliases():
    from nomenklatura_spark.matching.ofac import ofac_name_score

    s = ofac_name_score(
        ["Wladimir Putin"], ["Vladimir Putin", "Putin, Vladimir"]
    )
    assert s > 0.9


def test_ofac_spark_scoring(spark):
    from nomenklatura_spark.matching.ofac import score_pairs_ofac

    schema = (
        "left_id string, right_id string, l_schema string, r_schema string, "
        "l_names array<string>, r_names array<string>, "
        "l_countries array<string>, r_countries array<string>, "
        "l_birth_dates array<string>, r_birth_dates array<string>, "
        "l_genders array<string>, r_genders array<string>, "
        "l_identifiers array<string>, r_identifiers array<string>"
    )
    pairs = spark.createDataFrame(
        [
            (
                "a", "b", "Person", "Person",
                ["Vladimir Putin"], ["Vladimir PUTIN"],
                ["ru"], ["us"],
                ["1952-10-07"], ["1951-03-01"],
                ["male"], ["male"],
                [], [],
            )
        ],
        schema,
    )
    row = score_pairs_ofac(pairs).collect()[0]
    # name 1.0, country -0.1, dob year -0.1, dob day -0.15 → 0.65
    assert row["score"] == pytest.approx(0.65, abs=1e-6)


# --- LogicV2-style name match ----------------------------------------------

def test_name_v2_literal_early_exit():
    from nomenklatura_spark.matching.names_v2 import name_match

    assert name_match(["Johanna Quandt"], ["JOHANNA QUANDT"]) == 1.0


def test_name_v2_legal_form_dampening():
    from nomenklatura_spark.matching.names_v2 import name_pair_score

    # legal forms canonicalise in the comparable form: a literal match
    # (the reference scores "Acme Holdings Limited" ≡ "Acme Holdings Ltd"
    # at 1.0 via normalize_name's legal-form replacement)
    s = name_pair_score("acme limited", "acme ltd")
    assert s == 1.0
    # distinct legal forms do NOT literal-match
    assert name_pair_score("acme ltd", "acme gmbh") < 1.0


def test_name_v2_extra_asymmetry():
    from nomenklatura_spark.matching.names_v2 import name_pair_score

    extra_in_query = name_pair_score("john smith unrelated", "john smith")
    extra_in_result = name_pair_score("john smith", "john smith unrelated")
    assert extra_in_result > extra_in_query  # result extras cost less


def test_name_v2_family_name_boost():
    from nomenklatura_spark.matching.names_v2 import name_pair_score

    fam = frozenset(["smith"])
    # boost amplifies whatever the family part contributes: a matched
    # family name lifts the mean, a fuzzy family name drags it harder
    assert name_pair_score("john smith", "jon smith", fam) > name_pair_score(
        "john smith", "jon smith"
    )
    assert name_pair_score("john smith", "john smyth", fam) < name_pair_score(
        "john smith", "john smyth"
    )


def test_name_v2_initials():
    from nomenklatura_spark.matching.names_v2 import name_pair_score

    # single initials do NOT pair with full parts — the frozen reference
    # run scores "V. Putin" ~ "Vladimir Putin" at exactly 0.5 (the
    # initial aligns as a zero-score pair at weight 1)
    s = name_pair_score("j smith", "john smith")
    assert s == pytest.approx(0.5)
    # but initial RUNS pair as acronym spans ("JC"~"Jean-Claude" → 0.95)
    s2 = name_pair_score("jc juncker", "jean claude juncker")
    assert s2 == pytest.approx(0.95)


def test_strict_levenshtein_py():
    from nomenklatura_spark.matching.names_v2 import strict_levenshtein_py

    assert strict_levenshtein_py("jonathan", "jonathan") == 1.0
    assert strict_levenshtein_py("jonathan", "jonathon") == pytest.approx(
        (1 - 1 / 8) ** 2
    )
    assert strict_levenshtein_py("abc", "xyz") == 0.0  # short → no edit budget


def test_address_match_subset_and_blend():
    from nomenklatura_spark.matching.names_v2 import address_match

    assert address_match(["12 Main Street Berlin"], ["12 Main St Berlin"]) == 1.0
    partial = address_match(
        ["12 Main Street Berlin"], ["12 Mian Street Munich"]
    )
    assert 0.0 < partial < 1.0


def test_logic_v2_spark_scoring(spark):
    from nomenklatura_spark.matching.names_v2 import score_pairs_logic_v2

    schema = (
        "left_id string, right_id string, l_schema string, r_schema string, "
        "l_names array<string>, r_names array<string>, "
        "l_countries array<string>, r_countries array<string>, "
        "l_birth_dates array<string>, r_birth_dates array<string>, "
        "l_genders array<string>, r_genders array<string>, "
        "l_public_keys array<string>, r_public_keys array<string>, "
        "l_weak_aliases array<string>, r_weak_aliases array<string>, "
        "l_last_names array<string>, r_last_names array<string>, "
        "l_addresses array<string>, r_addresses array<string>, "
        "l_identifiers array<string>, r_identifiers array<string>"
    )
    base = (
        "Company", "Company",
        ["Acme Holdings Limited"], ["ACME Holdings Ltd"],
        ["de"], ["de"], [], [], [], [], [], [], [], [], [], [], [], [],
    )
    lei = "529900T8BM49AURSDO55"
    pairs = spark.createDataFrame(
        [
            ("a", "b", *base, [lei], [lei]),
            ("a", "c", *base, [], []),
        ],
        schema,
    )
    rows = {r["right_id"]: r for r in score_pairs_logic_v2(pairs).collect()}
    assert rows["b"]["f_id_lei"] == 1.0
    assert rows["b"]["score"] >= 0.95  # LEI equality dominates
    assert 0.8 < rows["c"]["score"] <= 1.0  # name-driven


# --- regression train pipeline ---------------------------------------------

def test_train_fold_matches_sparkml(spark):
    """The folded sigmoid expression must reproduce the fitted pipeline's
    predict_proba exactly (scaler fold included)."""
    import random

    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import StandardScaler, VectorAssembler

    from nomenklatura_spark.matching.train import (
        evaluate,
        hygiene_split,
        score_regression,
        train_logistic,
    )

    rng = random.Random(7)
    rows = []
    for i in range(400):
        x1, x2 = rng.random(), rng.random()
        label = 1 if x1 + 0.3 * x2 > 0.6 else 0
        rows.append(
            Row(left_id=f"l{i}", right_id=f"r{i}", f_a=x1, f_b=x2, label=label)
        )
    df = spark.createDataFrame(rows)

    train_df, eval_df = hygiene_split(df)
    assert train_df.count() + eval_df.count() == 400

    model = train_logistic(train_df, ["f_a", "f_b"])
    scored = score_regression(eval_df, model)

    # exact parity with the ml pipeline's probability column
    pipe = Pipeline(
        stages=[
            VectorAssembler(inputCols=["f_a", "f_b"], outputCol="_features"),
            StandardScaler(inputCol="_features", outputCol="_scaled",
                           withMean=True, withStd=True),
            LogisticRegression(featuresCol="_scaled", labelCol="label",
                               regParam=0.0, maxIter=100),
        ]
    ).fit(train_df)
    expected = [
        float(r["probability"][1])
        for r in pipe.transform(eval_df.orderBy("left_id")).collect()
    ]
    got = [r["score"] for r in scored.orderBy("left_id").collect()]
    assert got == pytest.approx(expected, abs=1e-9)

    metrics = evaluate(scored)
    assert metrics["f1"] > 0.9


def test_hygiene_split_drops_contradictions(spark):
    from nomenklatura_spark.matching.train import hygiene_split

    df = spark.createDataFrame(
        [
            Row(left_id="a", right_id="b", f_a=0.1, label=1),
            Row(left_id="b", right_id="a", f_a=0.1, label=0),  # contradiction
            Row(left_id="c", right_id="d", f_a=0.9, label=1),
        ]
    )
    train, eval_df = hygiene_split(df)
    kept = train.union(eval_df).collect()
    assert len(kept) == 1
    assert kept[0]["left_id"] == "c"


def test_explanations_struct(spark):
    from pyspark.sql import Row
    from nomenklatura_spark.functions.scoring import (
        Feature,
        explanations,
        heuristic_score,
    )

    df = spark.createDataFrame([Row(f_a=0.8, f_b=1.0)])
    feats = [Feature("f_a", 0.9), Feature("f_b", -0.2, qualifier=True)]
    out = explanations(heuristic_score(df, feats), feats).collect()[0]
    exp = out["explanation"]
    assert exp["f_a"]["weighted"] == pytest.approx(0.72)
    assert exp["f_b"]["qualifier"] is True
    assert out["score"] == pytest.approx(0.52)


def test_part_tag_guard():
    """C1 literal-early-exit guard (util.py:part_tags_compatible): a
    comparable-equal pair with a given/family role swap must not
    short-circuit to 1.0; correctly-tagged reorderings and untagged
    inputs are unaffected."""
    from nomenklatura_spark.matching.names_v2 import name_match

    # name-only inputs: guard off, literal reorder match as before
    assert name_match(["Vladimir Putin"], ["Putin Vladimir"], person=True) == 1.0
    # consistent tags across a "Family, Given" alias: still literal
    assert (
        name_match(
            ["Vladimir Putin"],
            ["Putin, Vladimir"],
            person=True,
            query_given=["Vladimir"],
            query_family=["Putin"],
            result_given=["Vladimir"],
            result_family=["Putin"],
        )
        == 1.0
    )
    # role swap: falls through to tag-ordered alignment — the family
    # literal survives as the only evidence, the given mismatch costs
    swapped = name_match(
        ["Vladimir Putin"],
        ["Putin Vladimir"],
        person=True,
        query_given=["Vladimir"],
        query_family=["Putin"],
        result_given=["Putin"],
        result_family=["Vladimir"],
    )
    assert swapped < 0.75
    # one side untagged == reference ANY tags: compatible
    assert (
        name_match(
            ["Vladimir Putin"],
            ["Putin Vladimir"],
            person=True,
            query_given=["Vladimir"],
            query_family=["Putin"],
        )
        == 1.0
    )
    # a token claimed by both prop families carries no tag
    assert (
        name_match(
            ["Kim Kim"],
            ["Kim Kim"],
            person=True,
            query_given=["Kim"],
            query_family=["Kim"],
            result_given=["Kim"],
            result_family=["Kim"],
        )
        == 1.0
    )


def test_part_tag_guard_survives_phrase_collapse():
    """The tag guard pairs parts by COMPARABLE value, not raw token
    (util.py:part_tags_compatible zips the comparable-sorted parts): a
    legal-form phrase collapse ("Gesellschaft mit beschränkter Haftung"
    -> "gmbh") makes the raw token counts unequal (6 vs 3), and the old
    raw-sorted zip truncated against the phrase's untagged words — a
    given/family role swap hidden behind the collapse short-circuited
    to 1.0."""
    from nomenklatura_spark.matching.names_v2 import _analyze, name_match

    q = "Putin Vladimir GmbH"
    r = "Vladimir Putin Gesellschaft mit beschränkter Haftung"
    # precondition: comparable-equal with unequal raw token counts
    qa, ra = _analyze(q)[0], _analyze(r)[0]
    assert qa[1] == ra[1] and len(qa[0]) != len(ra[0])
    # consistent roles across the collapse: literal 1.0 preserved
    assert (
        name_match(
            [q], [r],
            query_given=["Vladimir"], query_family=["Putin"],
            result_given=["Vladimir"], result_family=["Putin"],
        )
        == 1.0
    )
    # role swap hidden behind the collapse: must NOT short-circuit
    swapped = name_match(
        [q], [r],
        query_given=["Putin"], query_family=["Vladimir"],
        result_given=["Vladimir"], result_family=["Putin"],
    )
    assert swapped < 1.0
    # untagged inputs unaffected by the guard
    assert name_match([q], [r]) == 1.0
