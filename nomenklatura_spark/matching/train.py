"""X3/P8 — regression matcher: spark.ml training + coefficients-as-expression.

The reference trains a scikit-learn LogisticRegression(CV) pipeline over
encoded pair features and pickles it (``matching/erun/train.py:22-35``,
``regression_v1/model.py:94-110``); inference calls ``predict_proba`` per
pair.  Spark-first re-expression:

- training: ``pyspark.ml`` Pipeline (VectorAssembler → StandardScaler →
  LogisticRegression) over the pair-feature frame — distributed, no
  driver-side sklearn;
- inference: NO model object in the scoring path.  The fitted scaler and
  LR fold into plain column arithmetic ``sigmoid(Σ wᵢ·(xᵢ-μᵢ)/σᵢ + b)``
  (``functions.scoring.logistic_score``) so scoring stays inside
  whole-stage codegen — no pandas UDF, no broadcast model, batch-size
  independent.

Determinism: hash-based train/eval split on the pair key (the reference
uses a seeded shuffle, ``erun/train.py:33-35``; a content hash is the
distributed-stable equivalent), plus contradiction dropping (same pair
with both labels → drop both).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from nomenklatura_spark.functions.scoring import logistic_score


def hygiene_split(
    pairs: DataFrame,
    label_col: str = "label",
    left_col: str = "left_id",
    right_col: str = "right_id",
    eval_fraction: float = 0.2,
) -> tuple[DataFrame, DataFrame]:
    """Dedup pairs, drop contradictions, hash-split into (train, eval).

    The split key is a content hash of the normalised pair id, so the
    same pair always lands in the same fold on any cluster size.
    """
    key = F.md5(
        F.concat_ws(
            "|",
            F.least(F.col(left_col), F.col(right_col)),
            F.greatest(F.col(left_col), F.col(right_col)),
        )
    )
    keyed = pairs.withColumn("_pair_key", key)
    clean = (
        keyed.groupBy("_pair_key")
        .agg(
            F.first(F.struct(*pairs.columns)).alias("_row"),
            F.count_distinct(F.col(label_col)).alias("_n_labels"),
        )
        .where(F.col("_n_labels") == 1)  # contradiction drop
        .select("_pair_key", "_row.*")
    )
    bucket = F.conv(F.substring(F.col("_pair_key"), 1, 8), 16, 10).cast("long") % 100
    train = clean.where(bucket >= int(eval_fraction * 100)).drop("_pair_key")
    eval_df = clean.where(bucket < int(eval_fraction * 100)).drop("_pair_key")
    return train, eval_df


def train_logistic(
    train_df: DataFrame,
    feature_cols: list[str],
    label_col: str = "label",
    reg_param: float = 0.0,
    max_iter: int = 100,
) -> dict:
    """Fit scaler+LR on the feature frame; return folded coefficients.

    Returns ``{"coefs": {col: w}, "intercept": b}`` with the standard-
    scaler fold applied (w/σ into the weight, -w·μ/σ into the intercept)
    so the result plugs straight into ``logistic_score``.
    """
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import StandardScaler, VectorAssembler

    pipe = Pipeline(
        stages=[
            VectorAssembler(inputCols=feature_cols, outputCol="_features"),
            StandardScaler(
                inputCol="_features", outputCol="_scaled", withMean=True, withStd=True
            ),
            LogisticRegression(
                featuresCol="_scaled",
                labelCol=label_col,
                regParam=reg_param,
                maxIter=max_iter,
            ),
        ]
    )
    model = pipe.fit(train_df)
    scaler, lr = model.stages[1], model.stages[2]
    mean = scaler.mean.toArray()
    std = scaler.std.toArray()
    raw_w = lr.coefficients.toArray()
    intercept = float(lr.intercept)
    coefs: dict[str, float] = {}
    for i, col in enumerate(feature_cols):
        s = std[i] if std[i] != 0.0 else 1.0
        w = raw_w[i] / s
        coefs[col] = float(w)
        intercept -= w * mean[i]
    return {"coefs": coefs, "intercept": float(intercept)}


def score_regression(df: DataFrame, model: dict, out: str = "score") -> DataFrame:
    """Apply a trained model as pure column arithmetic (no UDF)."""
    return logistic_score(df, model["coefs"], model["intercept"], out=out)


def evaluate(
    scored: DataFrame, label_col: str = "label", threshold: float = 0.5
) -> dict:
    """Confusion-matrix accuracy summary (entity_bench-style harness)."""
    agg = scored.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            ((F.col("score") >= threshold) & (F.col(label_col) == 1)).cast("long")
        ).alias("tp"),
        F.sum(
            ((F.col("score") >= threshold) & (F.col(label_col) == 0)).cast("long")
        ).alias("fp"),
        F.sum(
            ((F.col("score") < threshold) & (F.col(label_col) == 1)).cast("long")
        ).alias("fn"),
        F.sum(
            ((F.col("score") < threshold) & (F.col(label_col) == 0)).cast("long")
        ).alias("tn"),
    ).collect()[0]
    tp, fp, fn, tn = agg["tp"], agg["fp"], agg["fn"], agg["tn"]
    precision = tp / (tp + fp) if tp + fp else 0.0
    recall = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {
        "n": agg["n"], "tp": tp, "fp": fp, "fn": fn, "tn": tn,
        "precision": precision, "recall": recall, "f1": f1,
    }
