"""Heuristic matching algorithms over assembled candidate pairs.

Spark re-expression of the reference's LogicV1 feature stack
(``nomenklatura/matching/logic_v1/model.py:36-63``): each feature is a
column over the pair-feature frame from ``operators.pairs``; combination
is X1 (max of weighted mains + qualifiers, clamped).

Cheap set/distance features run as pure column expressions; only the
Jaro-Winkler person-name alignment and metaphone features drop to a
single fused Arrow-batched pandas UDF, whose inputs are nulled for
non-person rows (schema gate) so the Arrow batches carry no payload
and the kernel short-circuits where the features don't apply.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from nomenklatura_spark.functions import compare as C
from nomenklatura_spark.functions.names_compare import (
    person_name_features_udf,
    soundex_token_overlap,
)
from nomenklatura_spark.functions.scoring import Feature, heuristic_score

LOGIC_V1_FEATURES = [
    Feature("f_name_literal", 1.0),
    Feature("f_person_jw", 0.8),
    Feature("f_name_levenshtein", 0.9),
    Feature("f_soundex", 0.0),
    Feature("f_metaphone", 0.0),
    Feature("f_crypto_wallet", 0.98),
    Feature("f_identifier", 0.85),
    Feature("f_weak_alias", 0.8),
    Feature("f_country_mismatch", -0.2, qualifier=True),
    Feature("f_last_name_mismatch", -0.2, qualifier=True),
    Feature("f_dob_year_disjoint", -0.15, qualifier=True),
    Feature("f_dob_day_disjoint", -0.2, qualifier=True),
    Feature("f_gender_mismatch", -0.2, qualifier=True),
    Feature("f_numbers_mismatch", -0.1, qualifier=True),
]


def compute_features(pairs: DataFrame, with_udf_features: bool = True) -> DataFrame:
    """Add all LogicV1 feature columns to an assembled pair frame."""
    is_person = (F.col("l_schema") == "Person") & (F.col("r_schema") == "Person")
    df = pairs.select(
        "*",
        C.name_literal_match(F.col("l_names"), F.col("r_names")).alias("f_name_literal"),
        # person-only vs non-person split mirrors logic_v1 feature gating
        F.when(
            ~is_person,
            C.best_name_levenshtein(F.col("l_names"), F.col("r_names")),
        ).otherwise(F.lit(0.0)).alias("f_name_levenshtein"),
        soundex_token_overlap(F.col("l_names"), F.col("r_names")).alias("f_soundex"),
        C.crypto_wallet_address(
            F.col("l_public_keys"), F.col("r_public_keys"),
            F.col("l_schema"), F.col("r_schema"),
        ).alias("f_crypto_wallet"),
        C.identifier_match(F.col("l_identifiers"), F.col("r_identifiers")).alias("f_identifier"),
        C.weak_alias_match(F.col("l_names"), F.col("r_weak_aliases")).alias("f_weak_alias"),
        C.country_mismatch(F.col("l_countries"), F.col("r_countries")).alias("f_country_mismatch"),
        C.last_name_mismatch(F.col("l_last_names"), F.col("r_last_names")).alias("f_last_name_mismatch"),
        C.dob_year_disjoint(F.col("l_birth_dates"), F.col("r_birth_dates")).alias("f_dob_year_disjoint"),
        C.dob_day_disjoint(F.col("l_birth_dates"), F.col("r_birth_dates")).alias("f_dob_day_disjoint"),
        C.gender_mismatch(F.col("l_genders"), F.col("r_genders")).alias("f_gender_mismatch"),
        C.numbers_mismatch(F.col("l_all_values"), F.col("r_all_values")).alias("f_numbers_mismatch"),
    )
    if with_udf_features:
        # gate in the INPUTS, not around the call: a pandas UDF under
        # CASE WHEN is hoisted and run on every row (SPARK-22347), so
        # non-person rows ship null instead of their name arrays and the
        # kernel short-circuits; one fused UDF = one Arrow round-trip
        pnf = person_name_features_udf(
            F.when(is_person, F.col("l_names")),
            F.when(is_person, F.col("r_names")),
        )
        df = (
            df.withColumn("_pnf", pnf)
            .withColumn("f_person_jw", F.col("_pnf.jw"))
            .withColumn("f_metaphone", F.col("_pnf.metaphone"))
            .drop("_pnf")
        )
    else:
        df = df.withColumn("f_person_jw", F.lit(0.0)).withColumn(
            "f_metaphone", F.lit(0.0)
        )
    return df


def score_pairs_logic_v1(pairs: DataFrame, with_udf_features: bool = True) -> DataFrame:
    """Full LogicV1 scoring: features + X1 combination."""
    return heuristic_score(
        compute_features(pairs, with_udf_features), LOGIC_V1_FEATURES
    )
