"""X1/X2 — feature-score combination as column expressions.

Reference: ``nomenklatura/matching/types.py:264-308`` (HeuristicAlgorithm)
and ``logic_v1/model.py:63-81`` / ``name_based/model.py:34-41``.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, functions as F


@dataclass(frozen=True)
class Feature:
    """One scoring feature: a named score column with a weight; qualifiers
    carry (usually negative) weights applied only when a main feature hit."""

    name: str
    weight: float
    qualifier: bool = False


def heuristic_score(df: DataFrame, features: list[Feature], out: str = "score") -> DataFrame:
    """X1 — LogicV1-style combination (logic_v1/model.py:63-81):

    score = max(main_i * w_i); if that max is 0 the qualifiers are skipped
    (they can only subtract); else add qualifier_j * w_j; clamp [0, 1].
    """
    mains = [F.col(f.name) * f.weight for f in features if not f.qualifier]
    quals = [F.col(f.name) * f.weight for f in features if f.qualifier]
    main_score = F.greatest(*mains) if len(mains) > 1 else mains[0]
    qual_sum = sum(quals[1:], start=quals[0]) if quals else F.lit(0.0)
    combined = F.when(main_score <= 0.0, F.lit(0.0)).otherwise(
        F.least(F.lit(1.0), F.greatest(F.lit(0.0), main_score + qual_sum))
    )
    return df.withColumn(out, combined)


def weighted_sum_score(df: DataFrame, features: list[Feature], out: str = "score") -> DataFrame:
    """X2 — plain weighted sum (name_based/model.py:34-41), clamped [0,1]."""
    terms = [F.col(f.name) * f.weight for f in features]
    total = sum(terms[1:], start=terms[0])
    return df.withColumn(out, F.least(F.lit(1.0), F.greatest(F.lit(0.0), total)))


def internal_dataset_discount(
    score: Column, l_datasets: Column, r_datasets: Column, discount: float
) -> Column:
    """X5 — discount pairs from overlapping datasets (xref.py:121-122)."""
    return F.when(
        F.arrays_overlap(l_datasets, r_datasets), score * discount
    ).otherwise(score)


def explanations(df: DataFrame, features: list[Feature], out: str = "explanation") -> DataFrame:
    """X4 — per-feature explanation struct riding beside the score.

    Reference exposes lazy per-feature ``FtResult(score, detail)`` objects
    (``matching/types.py:53-145``); columnar re-expression: one struct per
    feature with its raw score, weight, weighted contribution, and
    qualifier flag, collected into a map keyed by feature name.  Pure
    column construction — no extra pass over the data, prunable when the
    consumer doesn't select it.
    """
    entries = []
    for f in features:
        entries.append(F.lit(f.name))
        entries.append(
            F.struct(
                F.col(f.name).cast("double").alias("score"),
                F.lit(f.weight).alias("weight"),
                (F.col(f.name) * f.weight).cast("double").alias("weighted"),
                F.lit(f.qualifier).alias("qualifier"),
            )
        )
    return df.withColumn(out, F.create_map(*entries))


def logistic_score(df: DataFrame, coefs: dict[str, float], intercept: float, out: str = "score") -> DataFrame:
    """X3 — regression model as a column expression: sigmoid(w·x + b).

    The reference ships sklearn pipelines (regression_v1/model.py:94-110);
    exporting coefficients to a closed-form expression keeps batch scoring
    JVM-side (no model pickle on the executors).
    """
    linear = F.lit(float(intercept))
    for name, w in coefs.items():
        linear = linear + F.col(name) * float(w)
    return df.withColumn(out, F.lit(1.0) / (F.lit(1.0) + F.exp(-linear)))
