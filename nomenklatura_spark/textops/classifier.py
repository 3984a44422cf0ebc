"""Quality-classifier training for corpus filtering (fastText/DCLM shape).

The modern pretraining-data pipeline filters a crawl with a *trained*
quality classifier: label documents by corpus membership (curated
positives vs crawl negatives — the fastText supervision CCNet and DCLM
use), fit a linear model over cheap per-document features, score every
document, keep the high-probability tail.  The reference's analogue is
its trained regression matcher (``matching/erun/train.py:22-35``,
``regression_v1/model.py:94-110``) — a model fit on labeled rows and
folded into closed-form scoring; here the same shape is applied to the
document-quality role.

Spark-first split of the work:

- **features** — one map-only projection (the ``quality_features``
  ratio family plus a digit ratio), each rounded to 4dp so the training
  inputs are decimal-stable regardless of engine, partitioning, or
  evaluation order;
- **training** — full-batch gradient descent with the weight vector on
  the driver (d+1 floats).  Each iteration is ONE partially-aggregated
  scan computing the mean gradient — the ``treeAggregate`` shape
  ``pyspark.ml``'s own optimizers use per pass.  No document row ever
  shuffles; the per-iteration driver traffic is d+1 doubles.
- **determinism** — gradient means and weight updates are rounded to
  9dp per iteration, the same cross-engine sum-order stabilization the
  unrolled k-means Lloyd oracles rely on (``plans/queries.py``
  ``ann_ivf_topk``).  This makes the *training loop itself* replayable
  as unrolled SQL CTEs, so the DuckDB oracle verifies the fit, not just
  the scoring.
- **scoring** — ``functions.scoring.logistic_score``: closed-form
  ``sigmoid(w·x + b)`` column arithmetic inside whole-stage codegen; no
  model object reaches the executors.

At 100 TB: ``n_iter + 1`` scans of the feature frame (persist it for
the training window — released before return), zero shuffles of
document rows, and a map-only scoring pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from nomenklatura_spark.functions.scoring import logistic_score
from nomenklatura_spark.textops.analysis import quality_ratio_exprs, words

CLF_FEATURES = ["f_stop", "f_punct", "f_wlen", "f_digit"]


def classifier_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Bounded-ratio quality features, rounded to 4dp.

    All four live in [0, 1] (word length is capped at 12 chars and
    normalized), so unscaled gradient descent is well-conditioned and
    the sigmoid never saturates from raw magnitudes.
    """
    docs = docs.withColumn("_c_ws", words(F.col(text_col)))
    r = quality_ratio_exprs(F.col(text_col), F.col("_c_ws"))
    return docs.select(
        "*",
        F.round(r["stop_ratio"], 4).alias("f_stop"),
        F.round(r["punct_ratio"], 4).alias("f_punct"),
        F.round(
            F.least(r["mean_word_len"] / F.lit(12.0), F.lit(1.0)), 4
        ).alias("f_wlen"),
        F.round(r["digit_ratio"], 4).alias("f_digit"),
    ).drop("_c_ws")


def train_quality_lr(
    train_df: DataFrame,
    feature_cols: list[str] = CLF_FEATURES,
    label_col: str = "label",
    n_iter: int = 6,
    lr: float = 2.0,
) -> dict:
    """Fit a logistic model by full-batch GD; return folded parameters.

    Each iteration aggregates the mean error-weighted features (one scan,
    map-side partial agg); the driver applies the rounded update.  The
    9dp rounding of both the gradient mean and the weight makes the
    trajectory identical across engines and partition orders — boundary
    ties cannot occur because a binary double is never exactly on a
    decimal half (the established contract of every ``round(…, 9)``
    oracle in this repo).

    Returns ``{"coefs": {col: w}, "intercept": b}`` — plugs straight
    into ``functions.scoring.logistic_score``.
    """
    w = {c: 0.0 for c in feature_cols}
    b = 0.0
    feats = train_df.select(label_col, *feature_cols).persist()
    try:
        for _ in range(n_iter):
            linear = F.lit(b)
            for c in feature_cols:
                linear = linear + F.lit(w[c]) * F.col(c)
            err = F.lit(1.0) / (F.lit(1.0) + F.exp(-linear)) - F.col(label_col)
            aggs = [
                F.round(F.avg(err * F.col(c)), 9).alias(c) for c in feature_cols
            ]
            aggs.append(F.round(F.avg(err), 9).alias("_intercept"))
            g = feats.agg(*aggs).collect()[0]
            for c in feature_cols:
                w[c] = round(w[c] - lr * g[c], 9)
            b = round(b - lr * g["_intercept"], 9)
    finally:
        feats.unpersist()
    return {"coefs": w, "intercept": b}


def quality_classifier_scores(
    docs: DataFrame,
    positive_sources: tuple[str, ...],
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    n_iter: int = 6,
    lr: float = 2.0,
    eval_permille: int = 200,
) -> DataFrame:
    """The full classifier-filter pipeline over one corpus.

    Labels come from corpus membership (``source_col`` in the curated
    whitelist → 1.0), the train/eval split is a deterministic md5
    bucket of the document id (cluster-size-independent, same device as
    ``doc_sample_mix``), the model trains on the train fold only, and
    every document is scored.  Returns one row per document:
    ``(doc_id, label, is_train, quality_prob)``.
    """
    from nomenklatura_spark.functions.hashing import md5_bucket

    feats = classifier_features(docs, text_col)
    bucket = md5_bucket("clf", F.col(doc_id_col), 1000)
    labeled = feats.select(
        doc_id_col,
        F.when(F.col(source_col).isin(*positive_sources), F.lit(1.0))
        .otherwise(F.lit(0.0))
        .alias("label"),
        (bucket >= eval_permille).alias("is_train"),
        *CLF_FEATURES,
    )
    model = train_quality_lr(
        labeled.where(F.col("is_train")), CLF_FEATURES, "label", n_iter, lr
    )
    scored = logistic_score(labeled, model["coefs"], model["intercept"])
    return scored.select(
        doc_id_col,
        "label",
        "is_train",
        F.round("score", 6).alias("quality_prob"),
    )
