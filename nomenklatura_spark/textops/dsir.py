"""DSIR — data selection via importance resampling (Xie et al. 2023).

The third member of the data-selection family (next to the trained
quality classifier and domain-cluster mixing): score every raw-corpus
document by the log-likelihood ratio of a *target* distribution (the
curated corpus) vs the *source* distribution (the whole crawl) over
hashed n-gram features, then resample with Gumbel-top-k so selection is
probabilistic in the weights rather than a hard threshold.

Spark-first shape:

- the feature stream (unigrams + word bigrams, md5-hashed into ``B``
  buckets) is ONE explode scan; per-(doc, bucket) counts are one
  partially-aggregated shuffle;
- both n-gram models are ``B``-row tables (two tiny aggregates off the
  same stream) joined into a single broadcast log-ratio table — the
  per-bucket ratio is quantized to an integer 1e-9 grid, making the
  whole scoring pass exact-integer and therefore engine- and
  partition-order-independent (the ln-parity contract the blocker IDF
  and LM-score oracles rely on, hardened to bit-equality);
- the document weight is one more partial-agg shuffle (Σ count·ratio);
  the Gumbel key is the md5-uniform device used everywhere else in
  this repo, so the "randomized" resample is deterministic and
  SQL-replayable.

At 100 TB: ONE token-stream scan (both bucket models roll up from the
(doc, bucket) grain — the two-level-aggregation discipline), two
corpus-grain partial-agg shuffles (doc-bucket counts, doc weights),
two B-row broadcasts, and a top-k TakeOrdered.  Nothing
document-sized is ever collected.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from nomenklatura_spark.dedup.ngram import normalize_for_shingles, widen_small_scan

DSIR_BUCKETS = 256


def _hashed_ngram_stream(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int = DSIR_BUCKETS,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id, bucket) rows — one per unigram/bigram occurrence."""
    ws = F.filter(
        F.split(normalize_for_shingles(F.col(text_col)), " "),
        lambda w: w != "",
    )
    base = widen_small_scan(docs).select(
        F.col(id_col).alias("id"), ws.alias("_ws"), *extra_cols
    )
    # element_at is 1-based; sequence(1, 0) runs DESCENDING, so guard
    # single-word docs with an empty array (same trap as char shingles)
    bigrams = F.when(
        F.size("_ws") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("_ws") - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(F.col("_ws"), i), F.element_at(F.col("_ws"), i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = base.select(
        "id", F.explode(F.concat(F.col("_ws"), bigrams)).alias("g"), *extra_cols
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("g")), 1, 8), 16, 10).cast("long")
        % n_buckets
    )
    return grams.select("id", bucket.alias("b"), *extra_cols)


def dsir_weights(
    docs: DataFrame,
    target_pred: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """(id, _w9, dsir_logweight): per document, Σ_b count_db · log-ratio_b
    with Laplace-smoothed bucket models (target = rows matching
    ``target_pred``; source = the whole corpus, per the DSIR paper).
    ``_w9`` is the exact integer-scaled weight (units of 1e-9) — the
    resampler adds its Gumbel term in the same integer domain."""
    stream = _hashed_ngram_stream(
        docs.withColumn("_t", target_pred), id_col, text_col, n_buckets, ("_t",)
    )
    # ONE scan of the gram stream: the (doc, bucket) grain is the
    # finest, so both bucket models roll up from it (the doc_vocab
    # two-level-aggregation discipline) — ``_t`` is constant per doc,
    # so carrying it through the first groupBy doesn't change the grain
    doc_counts = stream.groupBy("id", "b", "_t").agg(
        F.count(F.lit(1)).alias("c")
    )
    bucket_counts = doc_counts.groupBy("b").agg(
        F.sum("c").alias("cs"),
        F.sum(F.when(F.col("_t"), F.col("c")).otherwise(F.lit(0))).alias("ct"),
    )
    totals = bucket_counts.agg(
        F.sum("cs").alias("_ts"), F.sum("ct").alias("_tt")
    )
    # full B-row grid so empty buckets still carry their smoothed ratio
    grid = (
        docs.sparkSession.range(n_buckets)
        .select(F.col("id").alias("b"))
        .join(bucket_counts, "b", "left")
        .na.fill(0, ["cs", "ct"])
        .crossJoin(F.broadcast(totals))
    )
    # INTEGER-scaled ratio (units of 1e-9): summing 9dp-quantized
    # ratios as binary doubles lets engine-dependent 1e-16 sum noise
    # decide decimal-boundary rounds (observed ~1/500 docs), and even
    # identical doubles round differently across engines when the true
    # value sits exactly on a decimal half (Spark rounds the shortest
    # repr, DuckDB the exact binary).  Quantizing ONCE to a scaled
    # BIGINT, summing exactly in integers, and reporting on the 1e-9
    # grid itself (round 9 — never a half-boundary) makes the output
    # bit-identical on every engine.  Exact-integer aggregation is the
    # blocker pair-cost Decimal(38,0) device.
    ratios = grid.select(
        "b",
        F.round(
            (
                F.log((F.col("ct") + 1) / (F.col("_tt") + n_buckets))
                - F.log((F.col("cs") + 1) / (F.col("_ts") + n_buckets))
            )
            * 1e9
        )
        .cast("bigint")
        .alias("lr9"),
    )
    summed = (
        doc_counts.join(F.broadcast(ratios), "b")
        .groupBy("id")
        .agg(F.sum(F.col("c") * F.col("lr9")).alias("_s9"))
    )
    # left-join from the document universe: a doc with zero grams (text
    # that normalizes to empty) still gets a row with the neutral weight
    # 0 — the natural value for an empty feature set, and the same
    # one-row-per-document contract as the classifier/cluster selectors
    ids = docs.select(F.col(id_col).alias("id"))
    return ids.join(summed, "id", "left").select(
        "id",
        F.coalesce(F.col("_s9"), F.lit(0).cast("bigint")).alias("_w9"),
        F.round(
            F.coalesce(F.col("_s9"), F.lit(0).cast("bigint")) / 1e9, 9
        ).alias("dsir_logweight"),
    )


def dsir_resample(
    docs: DataFrame,
    target_pred: Column,
    k: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """Gumbel-top-k importance resample: keep the ``k`` documents with
    the largest ``logweight + Gumbel(md5-uniform)`` key — samples
    without replacement ∝ exp(logweight), with the deterministic
    md5-bucket uniform standing in for RNG (the ``doc_sample_mix``
    device), so every engine draws the same sample."""
    from nomenklatura_spark.functions.hashing import md5_bucket

    weights = dsir_weights(docs, target_pred, id_col, text_col, n_buckets)
    u = (md5_bucket("dsir", F.col("id"), 100000) + 0.5) / 100000.0
    # same integer discipline for the sample key: Gumbel term quantized
    # to the 1e-9 grid, added to the exact scaled weight
    gumbel9 = F.round(-F.log(-F.log(u)) * 1e9).cast("bigint")
    # consumed twice (top-k and the final membership join) — checkpoint
    # so the weight pipeline runs once, blocks release with the plan
    scored = weights.select(
        "id",
        "dsir_logweight",
        F.round((F.col("_w9") + gumbel9) / 1e9, 9).alias("sample_key"),
    ).localCheckpoint(eager=True)
    top = (
        scored.orderBy(F.desc("sample_key"), F.asc("id"))
        .limit(k)
        .select("id", F.lit(True).alias("sampled"))
    )
    return (
        scored.join(top, "id", "left")
        .select(
            "id",
            "dsir_logweight",
            "sample_key",
            F.coalesce(F.col("sampled"), F.lit(False)).alias("sampled"),
        )
    )
