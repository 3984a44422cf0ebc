"""The blocking index — candidate generation for entity resolution.

This is the engine's scalability core (SURVEY.md §2.4 J1-J5, §2.5 A1-A6,
§2.6 W1-W2). Reference semantics: ``nomenklatura/blocker/index.py`` — there
the blocker is a set of DuckDB SQL queries; here the same relational
algebra is declared through the DataFrame API so Catalyst plans it
(partial aggregation, broadcast of the tiny schema-pair dim, AQE skew
handling on hot tokens).

Scale design notes (100 TB):

- The **dynamic stopword** computation (``build_token_stats``) is the single
  most important device: any token whose compatible-pair cost exceeds the
  budget is dropped *before* the self-join, bounding the join output
  quadratically (reference: index.py:59-71,232-306).
- The token self-join shuffles both sides on (token, field) — identical
  partitioning on both sides, so AQE sees one symmetric shuffle; skewed
  (hot) tokens are already bounded by the stopword cap, and
  ``spark.sql.adaptive.skewJoin`` splits any residue.
- The schema-compatibility pair table is a few hundred rows → broadcast.
- Per-subject top-K runs as a window; Spark ≥3.5 pushes the rank filter
  into the window operator (InferWindowGroupLimit), so candidate rows past
  ``max_candidates`` are never ships/sorted fully.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

NAME_PART_FIELD = "np"
SYMBOL_FIELD = "sy"
WORD_FIELD = "wd"

# Field boost weights (reference: nomenklatura/blocker/index.py:87-95).
BOOSTS: dict[str, float] = {
    NAME_PART_FIELD: 5.0,
    WORD_FIELD: 0.5,
    "name": 15.0,
    "phone": 10.0,
    "email": 10.0,
    "address": 1.0,
    "identifier": 10.0,
}

DEFAULT_MAX_BUCKET_SIZE = 60
DEFAULT_MAX_CANDIDATES = 75
# Candidates below this fraction of their subject's best score are noise
# (ten 20%-wide bands: 0.8^10) — reference index.py:60-63.
DEFAULT_MIN_SCORE_RATIO = 0.1


def bucket_pair_cost(bucket_size: int, cross: bool = False) -> int:
    """Pair budget implied by a max bucket size (index.py:66-71):
    triangular for dedupe self-join, full cross for matching."""
    if bucket_size < 0:
        raise ValueError("max_bucket_size must be >= 0")
    if cross:
        return bucket_size * bucket_size
    return bucket_size * max(0, bucket_size - 1) // 2


def boosts_df(spark: SparkSession, extra: dict[str, float] | None = None) -> DataFrame:
    rows = dict(BOOSTS)
    rows.update(extra or {})
    return spark.createDataFrame(
        [(k, float(v)) for k, v in rows.items()], "field string, boost double"
    )


def token_entries(tokens: DataFrame) -> DataFrame:
    """T2 — aggregate a raw (schema, id, field, token) token stream into the
    ``entries`` relation with per-entity counts and token truncation to 40
    chars (reference index.py:156-173)."""
    return (
        tokens.select(
            "schema",
            "id",
            "field",
            F.substring("token", 1, 40).alias("token"),
        )
        .groupBy("schema", "id", "field", "token")
        .agg(F.count(F.lit(1)).cast("int").alias("count"))
    )


def token_schema_counts(entries: DataFrame) -> DataFrame:
    """A1 — the per-(token, schema) doc-frequency relation.

    The reference materializes this as the ``token_schema_counts`` DuckDB
    table (index.py:238-249) because every downstream stage re-reads it;
    callers here should ``.persist()`` it for the same reason — stats
    (3 reads), matching stats, and IDF all derive from it instead of
    re-aggregating the much larger ``entries`` relation.

    ``df`` counts entries rows, which equals per-token distinct entities:
    tokens are field-prefixed (field is a function of the token) and an
    entity has exactly one schema, so (id, token) is unique in ``entries``.
    """
    return entries.groupBy("token", "schema").agg(
        F.first("field").alias("field"),
        F.count(F.lit(1)).alias("df"),
        F.sum("count").alias("freq"),
    )


def _default_schemata(df: DataFrame) -> DataFrame:
    """The bundled FtM can_match dimension (model/ftm.py) — used whenever
    the caller does not supply schema pairs, so the blocker stack runs on
    real FtM data out of the box (reference: xref.py:105 derives this from
    the followthemoney model at runtime)."""
    from nomenklatura_spark.model.ftm import schemata_pairs_df

    return schemata_pairs_df(df.sparkSession)


def build_token_stats(
    entries: DataFrame,
    schemata: DataFrame | None,
    max_pair_cost: int,
    tsc: DataFrame | None = None,
    schema_pairs: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """A1 + A2 — dynamic stopword detection.

    Per (token, schema) doc-frequencies, then the *compatible pair cost* of
    each token: the number of candidate pairs it would emit in the dedupe
    self-join, summed over schema-compatible pairs (triangular within one
    schema, cross between two). Tokens above ``max_pair_cost`` are flagged
    as stopwords. Reference: index.py:238-306.

    ``schemata`` is the matchable-pair dimension (left, right) — tiny,
    broadcast. Pass a persisted ``tsc`` (``token_schema_counts``) to avoid
    re-aggregating ``entries`` for each of the three reads below.

    When the compatible pairs are known driver-side (``schema_pairs`` —
    they come from the fixed FtM ontology, a bounded list), the tsc
    self-join collapses into ONE groupBy(token): per-token df-by-schema
    map + the cost as a folded sum over the pair list.  One shuffle
    instead of join+agg+totals+join; arithmetic is term-for-term the
    same as the join path (see test_blocker_units parity test).
    """
    if schemata is None and schema_pairs is None:
        from nomenklatura_spark.model.ftm import can_match_pairs

        schema_pairs = can_match_pairs()
    if tsc is None:
        tsc = token_schema_counts(entries)

    if schema_pairs is not None:
        pairs = sorted({(min(a, b), max(a, b)) for a, b in schema_pairs})
        agg = tsc.groupBy("token").agg(
            F.first("field").alias("field"),
            F.sum("freq").alias("freq"),
            F.sum("df").alias("df"),
            F.map_from_entries(
                F.collect_list(F.struct(F.col("schema"), F.col("df").alias("v")))
            ).alias("_dfm"),
        )
        zero = F.lit(0).cast("decimal(38,0)")
        cost = zero
        for a, b in pairs:
            da = F.element_at(F.col("_dfm"), a)
            if a == b:
                term = (da * (da - 1) / 2).cast("decimal(38,0)")
            else:
                term = (da * F.element_at(F.col("_dfm"), b)).cast("decimal(38,0)")
            cost = cost + F.coalesce(term, zero)
        return agg.select(
            "token",
            "field",
            "freq",
            "df",
            cost.alias("compatible_pair_cost"),
            (cost > F.lit(max_pair_cost)).alias("stopword"),
        )

    schema_pairs = (
        schemata.select(
            F.least("left", "right").alias("left_schema"),
            F.greatest("left", "right").alias("right_schema"),
        ).distinct()
    )

    l = tsc.select(
        F.col("token"), F.col("schema").alias("l_schema"), F.col("df").alias("l_df")
    )
    r = tsc.select(
        F.col("token"), F.col("schema").alias("r_schema"), F.col("df").alias("r_df")
    )
    # Pair cost sums can overflow long at extreme scale → decimal(38,0)
    # (the reference uses HUGEINT here).
    cost = (
        l.join(r, "token")
        .where(F.col("l_schema") <= F.col("r_schema"))
        .join(
            F.broadcast(schema_pairs),
            (F.col("l_schema") == F.col("left_schema"))
            & (F.col("r_schema") == F.col("right_schema")),
        )
        .groupBy("token")
        .agg(
            F.sum(
                F.when(
                    F.col("l_schema") == F.col("r_schema"),
                    (F.col("l_df") * (F.col("l_df") - 1) / 2).cast("decimal(38,0)"),
                ).otherwise((F.col("l_df") * F.col("r_df")).cast("decimal(38,0)"))
            ).alias("compatible_pair_cost")
        )
    )

    totals = tsc.groupBy("token").agg(
        F.first("field").alias("field"),
        F.sum("freq").alias("freq"),
        F.sum("df").alias("df"),
    )
    return totals.join(cost, "token", "left").select(
        "token",
        "field",
        "freq",
        "df",
        F.coalesce("compatible_pair_cost", F.lit(0).cast("decimal(38,0)")).alias(
            "compatible_pair_cost"
        ),
        (
            F.coalesce("compatible_pair_cost", F.lit(0).cast("decimal(38,0)"))
            > F.lit(max_pair_cost)
        ).alias("stopword"),
    )


def stopwords_from_stats(token_stats: DataFrame) -> DataFrame:
    return token_stats.where("stopword").select(
        "token", "field", "freq", "df", "compatible_pair_cost"
    )


def apply_stopwords(entries: DataFrame, stopwords: DataFrame | None) -> DataFrame:
    """J3 — stopword anti-join (reference index.py:480-487).

    The stopword relation is broadcast: its size is bounded by the cost
    budget (only heavy-hitter tokens can exceed it — dozens to a few
    thousand rows at any corpus size), so the anti-join is map-side and
    the entries relation is never shuffled for it."""
    if stopwords is None:
        return entries
    return entries.join(
        F.broadcast(stopwords.select("token")), "token", "left_anti"
    )


def term_frequencies(
    entries: DataFrame,
    boosts: DataFrame,
    tsc: DataFrame | None = None,
    rows: DataFrame | None = None,
    token_stats: DataFrame | None = None,
    drop_stopwords: bool = False,
    token_subset: DataFrame | None = None,
) -> DataFrame:
    """A3 + A4 + J5 — per-row term weight.

    weight = boost(field) * idf(token), dampened by 1/sqrt(n_names) for
    name-part and symbol fields (aliases multiply with the number of
    names). idf = 1 + ln(N / df). Reference: index.py:499-531.

    ``boosts`` is tiny → broadcast. With a persisted ``tsc``
    (``token_schema_counts``) the per-token distinct-entity count comes
    from summing its ``df`` over schemas (exact — see token_schema_counts)
    instead of re-aggregating ``entries``.

    The corpus entity count N rides along as a broadcast 1-row aggregate
    (scalar-subquery shape) rather than a driver-side ``.count()`` — no
    job barrier between computing N and the weight projection.

    ``rows`` restricts which entries receive a weight (e.g. a semi-join
    against the matching token set) while the IDF and name-count
    statistics stay computed over the full ``entries`` relation.

    ``token_stats`` (the ``build_token_stats`` output, which callers
    compute anyway for dynamic stopwords) is the cheapest source for the
    per-token df: its ``df`` column is exactly the distinct-entity count
    (see token_schema_counts). With ``drop_stopwords=True`` the stopword
    anti-join (J3) *folds into the IDF join*: the inner join on token
    against the non-stopword stats rows both attaches idf and drops
    stopword rows — one shuffle of the big relation instead of two,
    identical output (every entries token is present in the stats).

    Join order matters at scale: the id-keyed joins (name counts) and the
    broadcast boost join run first, the token join last, so the result
    comes out hash-partitioned by ``token`` — the J1/J2 joins on
    (token, field) then reuse that partitioning (subset-key clustered
    distribution) instead of exchanging both sides again.

    ``token_subset`` (the match path): restrict weights to entries whose
    token appears in the subset (e.g. the matching side's tokens). The
    IDF relation is first semi-joined down to the subset and then
    *broadcast* into the entries join — the matching token set is bounded
    by the matching batch, so the heaviest filter of the index becomes a
    map-side join with no shuffle of the index relation at all
    (vs. a separate shuffle semi-join followed by a shuffle weight join).
    """
    n_df = entries.agg(F.count_distinct("id").cast("double").alias("_n"))
    if token_stats is not None:
        base = token_stats.where(~F.col("stopword")) if drop_stopwords else token_stats
        token_df = base.select("token", F.col("df").alias("_df"))
    elif tsc is not None:
        token_df = tsc.groupBy("token").agg(F.sum("df").alias("_df"))
    else:
        token_df = entries.groupBy("token").agg(
            F.count_distinct("id").alias("_df")
        )
    token_idf = token_df.crossJoin(F.broadcast(n_df)).select(
        "token", (1.0 + F.log(F.col("_n") / F.col("_df"))).alias("idf")
    )
    if token_subset is not None:
        token_idf = F.broadcast(
            token_idf.join(
                token_subset.select("token").distinct(), "token", "semi"
            )
        )
    name_counts = (
        entries.where(F.col("field") == "name")
        .groupBy("id")
        .agg(F.greatest(F.lit(1), F.sum("count")).alias("n_names"))
    )
    dampened = F.col("field").isin(NAME_PART_FIELD, SYMBOL_FIELD)
    base = rows if rows is not None else entries
    if token_subset is not None:
        # Map-side broadcast filter first so the id-keyed shuffle below
        # only touches rows that survive the token restriction.
        joined = (
            base.join(token_idf, "token")
            .join(name_counts, "id", "left")
            .join(F.broadcast(boosts), "field", "left")
        )
    else:
        joined = (
            base.join(name_counts, "id", "left")
            .join(F.broadcast(boosts), "field", "left")
            .join(token_idf, "token")
        )
    return (
        joined
        .select(
            "schema",
            "field",
            "token",
            "id",
            "count",
            F.when(
                dampened,
                F.coalesce("boost", F.lit(1.0))
                * F.col("idf")
                / F.sqrt(F.coalesce("n_names", F.lit(1))),
            )
            .otherwise(F.coalesce("boost", F.lit(1.0)) * F.col("idf"))
            .alias("weight"),
        )
    )


def candidate_pairs(
    tf: DataFrame,
    schemata: DataFrame | None = None,
    max_pairs: int = 10_000,
    score_decimals: int | None = None,
) -> DataFrame:
    """J1 + A5 + W2 — the dedupe pair-generation self-join.

    Self-join term_frequencies on (token, field), keep schema-compatible
    pairs, dedup the triangle with ``l.id > r.id``; two-level scoring: per
    (pair, field) take ``max(l.weight + r.weight)`` and the field-evidence
    count, then per pair ``sum(maxw * (1 + ln(n)))`` (logarithmic credit
    for correlated evidence within one field). Global top-``max_pairs``.
    Reference: index.py:588-635.

    Output: (lid, rid, score) ordered by score desc, lid, rid.
    """
    if schemata is None:
        schemata = _default_schemata(tf)
    l = tf.select(
        F.col("id").alias("lid"),
        F.col("schema").alias("l_schema"),
        "field",
        "token",
        F.col("weight").alias("l_weight"),
    )
    r = tf.select(
        F.col("id").alias("rid"),
        F.col("schema").alias("r_schema"),
        "field",
        "token",
        F.col("weight").alias("r_weight"),
    )
    field_scores = (
        l.join(r, ["token", "field"])
        .where(F.col("lid") > F.col("rid"))
        .join(
            F.broadcast(schemata),
            (F.col("l_schema") == F.col("left"))
            & (F.col("r_schema") == F.col("right")),
        )
        .groupBy("lid", "rid", "field")
        .agg(
            F.max(F.col("l_weight") + F.col("r_weight")).alias("maxw"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    score = F.sum(F.col("maxw") * (1.0 + F.log("n"))).alias("score")
    scored = field_scores.groupBy("lid", "rid").agg(score)
    if score_decimals is not None:
        # Round *before* ordering so the top-K cut is stable across
        # engines/float orderings; ties break on (lid, rid).
        scored = scored.withColumn("score", F.round("score", score_decimals))
    return scored.orderBy(F.desc("score"), "lid", "rid").limit(max_pairs)


def build_matching_token_stats(
    matching_entries: DataFrame,
    indexed_entries: DataFrame,
    schemata: DataFrame,
    max_match_pair_cost: int,
    indexed_tsc: DataFrame | None = None,
    schema_pairs: list[tuple[str, str]] | None = None,
    matching_tsc: DataFrame | None = None,
) -> DataFrame:
    """Matching-side dynamic stopwords: cost = sum over schema-compatible
    (matching_df × indexed_df) per token (reference index.py:309-383).
    Directional: matching schema on the ``left`` of the pair table.
    Pass a persisted ``indexed_tsc`` to reuse the index-side doc
    frequencies instead of re-aggregating ``indexed_entries``; when the
    matching side is a schema slice of the indexed corpus, pass
    ``matching_tsc`` (= the indexed tsc filtered to that schema — the
    grouping includes ``schema``, so the filter IS the aggregate) and no
    second entries-wide aggregation runs at all.

    With driver-side ``schema_pairs``, the cost folds into one map-agg
    per side + one token join (see build_token_stats)."""
    m = (
        matching_tsc
        if matching_tsc is not None
        else token_schema_counts(matching_entries)
    )
    if indexed_tsc is not None:
        i = indexed_tsc.select("token", "schema", "df")
    else:
        i = indexed_entries.groupBy("token", "schema").agg(
            F.count(F.lit(1)).alias("df")
        )

    if schema_pairs is not None:
        pairs = sorted(set(schema_pairs))
        m_agg = m.groupBy("token").agg(
            F.first("field").alias("field"),
            F.sum("freq").alias("freq"),
            F.sum("df").alias("df"),
            F.map_from_entries(
                F.collect_list(F.struct(F.col("schema"), F.col("df").alias("v")))
            ).alias("_m"),
        )
        i_agg = i.groupBy("token").agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("schema"), F.col("df").alias("v")))
            ).alias("_i"),
        )
        zero = F.lit(0).cast("decimal(38,0)")
        cost = zero
        for a, b in pairs:
            term = (
                F.element_at(F.col("_m"), a) * F.element_at(F.col("_i"), b)
            ).cast("decimal(38,0)")
            cost = cost + F.coalesce(term, zero)
        return m_agg.join(i_agg, "token", "left").select(
            "token",
            "field",
            "freq",
            "df",
            cost.alias("compatible_pair_cost"),
            (cost > F.lit(max_match_pair_cost)).alias("stopword"),
        )

    cost = (
        m.select("token", F.col("schema").alias("m_schema"), F.col("df").alias("m_df"))
        .join(
            i.select(
                "token", F.col("schema").alias("i_schema"), F.col("df").alias("i_df")
            ),
            "token",
        )
        .join(
            F.broadcast(schemata),
            (F.col("m_schema") == F.col("left")) & (F.col("i_schema") == F.col("right")),
        )
        .groupBy("token")
        .agg(
            F.sum((F.col("m_df") * F.col("i_df")).cast("decimal(38,0)")).alias(
                "compatible_pair_cost"
            )
        )
    )
    totals = m.groupBy("token").agg(
        F.first("field").alias("field"),
        F.sum("freq").alias("freq"),
        F.sum("df").alias("df"),
    )
    return totals.join(cost, "token", "left").select(
        "token",
        "field",
        "freq",
        "df",
        F.coalesce("compatible_pair_cost", F.lit(0).cast("decimal(38,0)")).alias(
            "compatible_pair_cost"
        ),
        (
            F.coalesce("compatible_pair_cost", F.lit(0).cast("decimal(38,0)"))
            > F.lit(max_match_pair_cost)
        ).alias("stopword"),
    )


def match_candidates(
    matching: DataFrame,
    tf_all: DataFrame,
    schemata: DataFrame | None = None,
    max_candidates: int = DEFAULT_MAX_CANDIDATES,
    min_score_ratio: float = DEFAULT_MIN_SCORE_RATIO,
    score_decimals: int | None = None,
) -> DataFrame:
    """J2 + W1 — match external subjects against the index.

    Join matching tokens to indexed term frequencies on (token, field) with
    ``tf.id != m.id``; per (subject, candidate, field) take
    ``max(tf.weight)``; per pair ``sum(maxw * (1 + ln(n)))``; then
    per-subject top-K with a relative score floor — the window filter runs
    *inside* the plan, so rows past the cap are never fully sorted/shipped
    (reference: index.py:669-694 and issue #351; Spark's
    InferWindowGroupLimit gives the same pushdown).

    Output: (matching_id, matches_id, score) ordered by matching_id, rank.
    """
    if schemata is None:
        schemata = _default_schemata(matching)
    m = matching.select(
        F.col("id").alias("matching_id"),
        F.col("schema").alias("m_schema"),
        "field",
        "token",
    )
    field_scores = (
        m.join(tf_all.select(
            F.col("id").alias("matches_id"),
            F.col("schema").alias("t_schema"),
            "field",
            "token",
            "weight",
        ), ["token", "field"])
        .where(F.col("matches_id") != F.col("matching_id"))
        .join(
            F.broadcast(schemata),
            (F.col("m_schema") == F.col("left")) & (F.col("t_schema") == F.col("right")),
        )
        .groupBy("matching_id", "matches_id", "field")
        .agg(F.max("weight").alias("maxw"), F.count(F.lit(1)).alias("n"))
    )
    pair_scores = field_scores.groupBy("matching_id", "matches_id").agg(
        F.sum(F.col("maxw") * (1.0 + F.log("n"))).alias("score")
    )
    if score_decimals is not None:
        pair_scores = pair_scores.withColumn(
            "score", F.round("score", score_decimals)
        )
    w = Window.partitionBy("matching_id").orderBy(F.desc("score"), "matches_id")
    return (
        pair_scores.select(
            "matching_id",
            "matches_id",
            "score",
            F.row_number().over(w).alias("rn"),
            F.first_value("score").over(w).alias("best"),
        )
        .where(
            (F.col("rn") <= max_candidates)
            & (F.col("score") >= F.col("best") * min_score_ratio)
        )
        # no presentation sort: a global orderBy would make the range
        # partitioner sample the child, executing the match join twice
        # (the driver's value-hash is order-insensitive; rn carries the
        # per-subject rank for callers that need order)
        .select("matching_id", "matches_id", "score", "rn")
    )
