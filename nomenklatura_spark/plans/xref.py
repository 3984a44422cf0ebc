"""P1 — the xref pipeline: blocking → filtering → scoring → suggestions.

Reference: ``nomenklatura/xref.py:29-160``. The flagship batch job,
composed from the engine's operators:

1. tokenize + index the (linker-canonicalized) corpus  (T1/T2, A1-A5)
2. dynamic stopwords + candidate self-join             (A2/J3, J1, W2)
3. drop already-judged pairs                           (F6 anti-join)
4. assemble pair features + algorithm score            (J8, C*, X1)
5. internal-dataset discount, threshold                (X5)
6. auto-merge decisions / suggestions into the resolver (G3/G4)

Deviation (documented): the reference's ``patience``/sequential early-stop
knobs are artifacts of single-process scanning; here the equivalent
budget controls are ``max_pairs`` (W2 top-K) and ``limit`` on suggestions.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

from nomenklatura_spark.functions.tokenize import tokenize_statements
from nomenklatura_spark.matching.logic import score_pairs_logic_v1
from nomenklatura_spark.operators.blocker import (
    boosts_df,
    build_token_stats,
    bucket_pair_cost,
    candidate_pairs,
    term_frequencies,
    token_entries,
)
from nomenklatura_spark.operators.pairs import assemble_pairs, entity_features
from nomenklatura_spark.resolver.edges import (
    NO_JUDGEMENT,
    live,
    normalize_pairs,
    resolver_mapping,
    suggest_bulk,
)
from nomenklatura_spark.resolver.linker import apply_linker


@dataclass
class XrefOptions:
    max_pairs: int = 10_000
    max_bucket_size: int = 60
    auto_threshold: float | None = None
    threshold: float = 0.0
    limit: int = 5_000
    discount_internal: float = 1.0
    # reference algorithm NAME (cli.py --algorithm); resolved through
    # matching.get_algorithm.  logic-v1 is this engine's model-free default.
    algorithm: str = "logic-v1"


def xref_pairs(
    spark: SparkSession,
    stmts: DataFrame,
    schemata: DataFrame | None = None,
    edges: DataFrame | None = None,
    options: XrefOptions | None = None,
) -> DataFrame:
    """Stages 1-5: return scored candidate pairs (lid, rid, block_score,
    score, + feature columns), already filtered against judged pairs."""
    options = options or XrefOptions()

    if edges is not None:
        mapping = resolver_mapping(edges)
        stmts = apply_linker(stmts, mapping)

    # materialize before the 8-branch tokenizer union (each branch
    # re-reads the statement frame otherwise); entries then feeds 4
    # consumers and tf_f self-joins.  localCheckpoint, not persist: one
    # xref run used to pin all three relations in the block cache for
    # the session — checkpoint blocks release with the returned plan.
    stmts = stmts.localCheckpoint(eager=True)
    entries = token_entries(tokenize_statements(stmts)).localCheckpoint(
        eager=True
    )
    stats = build_token_stats(
        entries, schemata, bucket_pair_cost(options.max_bucket_size)
    )
    tf_f = term_frequencies(
        entries, boosts_df(spark), token_stats=stats, drop_stopwords=True
    ).localCheckpoint(eager=True)
    pairs = candidate_pairs(
        tf_f, schemata, max_pairs=options.max_pairs, score_decimals=6
    ).withColumnRenamed("score", "block_score")

    if edges is not None:
        judged = (
            live(edges)
            .where(F.col("judgement") != NO_JUDGEMENT)
            .select("target", "source")
        )
        keyed = normalize_pairs(pairs, left="lid", right="rid")
        keyed = keyed.join(judged, ["target", "source"], "left_anti")
        pairs = keyed.select(
            F.col("target").alias("lid"), F.col("source").alias("rid"), "block_score"
        )

    feats = entity_features(stmts)
    assembled = assemble_pairs(pairs, feats)
    if options.algorithm == "logic-v1":
        scored = score_pairs_logic_v1(assembled)
    else:
        from nomenklatura_spark.matching import get_algorithm

        algo = get_algorithm(options.algorithm)
        if algo is None:
            raise ValueError(f"unknown algorithm: {options.algorithm!r}")
        scored = algo(assembled)
    if options.discount_internal != 1.0:
        scored = scored.withColumn(
            "score", F.col("score") * options.discount_internal
        )
    return scored.where(F.col("score") >= options.threshold)


def xref(
    spark: SparkSession,
    stmts: DataFrame,
    schemata: DataFrame | None,
    edges: DataFrame,
    ts: str,
    options: XrefOptions | None = None,
) -> DataFrame:
    """Full P1: score pairs and upsert the top ``limit`` as resolver
    suggestions (G4). Returns the updated edge table."""
    options = options or XrefOptions()
    scored = xref_pairs(spark, stmts, schemata, edges, options)
    top = (
        scored.orderBy(F.desc("score"), "lid", "rid")
        .limit(options.limit)
        .select(F.col("lid").alias("left"), F.col("rid").alias("right"), "score")
    )
    suggestions = normalize_pairs(top).withColumn(
        "user", F.lit("xref")
    )
    return suggest_bulk(edges, suggestions, ts)
