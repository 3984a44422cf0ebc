"""J8 — candidate-pair feature assembly.

The reference scores candidate pairs one at a time in Python
(``nomenklatura/xref.py:118-130``), memoizing per-query normalizations.
In Spark the same memoization is achieved *structurally*: normalize each
entity's property sets once into array columns, then join the (small)
candidate-pair table against the entity-feature table twice — so every
per-pair feature sees pre-normalized arrays and no work repeats
(SURVEY.md §4 "Memoization").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Property → feature-array mapping: which statement rows feed which
# comparison features (prop_type or prop name based).
FEATURE_PROPS = {
    "names": ("prop_type", "name"),
    "birth_dates": ("prop", "birthDate"),
    "countries": ("prop_type", "country"),
    "genders": ("prop", "gender"),
    "identifiers": ("prop_type", "identifier"),
    "public_keys": ("prop", "publicKey"),
    "weak_aliases": ("prop", "weakAlias"),
    "last_names": ("prop", "lastName"),
    "first_names": ("prop", "firstName"),
    "addresses": ("prop_type", "address"),
}


def entity_features(stmts: DataFrame) -> DataFrame:
    """One row per entity with typed value arrays ready for comparison.

    One shuffle on canonical_id; every downstream pair join reuses it.
    """
    aggs = [F.max("schema").alias("schema")]
    for col_name, (key, val) in FEATURE_PROPS.items():
        aggs.append(
            F.array_sort(
                F.array_distinct(
                    F.collect_list(F.when(F.col(key) == val, F.col("value")))
                )
            ).alias(col_name)
        )
    # all matchable values (for numbers_mismatch)
    aggs.append(
        F.array_sort(F.array_distinct(F.collect_list("value"))).alias("all_values")
    )
    return stmts.groupBy("canonical_id").agg(*aggs)


def assemble_pairs(
    pairs: DataFrame,
    features: DataFrame,
    left_id: str = "lid",
    right_id: str = "rid",
) -> DataFrame:
    """Join both sides' feature arrays onto the candidate pairs.

    The pair table is the *output of blocking* — orders of magnitude
    smaller than the entity corpus — so these are two shuffle joins on ids
    (or broadcast joins when the pair set is small enough).
    """
    l_feats = features.select(
        F.col("canonical_id").alias(left_id),
        *[F.col(c).alias(f"l_{c}") for c in features.columns if c != "canonical_id"],
    )
    r_feats = features.select(
        F.col("canonical_id").alias(right_id),
        *[F.col(c).alias(f"r_{c}") for c in features.columns if c != "canonical_id"],
    )
    return pairs.join(l_feats, left_id).join(r_feats, right_id)
