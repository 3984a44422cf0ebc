"""P7 — reconciliation pipeline (wikidata-reconcile shape).

Behavioral re-expression of the reference's reconcile flow
(``nomenklatura/wikidata/reconcile.py``, ``cli.py:126-202``): stream
person entities → remote search → score against candidate proxies → at
or above ``auto_threshold`` decide POSITIVE automatically, between
``review_threshold`` and auto save as suggestions for human review →
emit statement-write commands for confirmed links.

Spark shape: one enrichment match (S9 batch connector, cache-aware), one
scoring pass, then a single partition of the scored frame into the two
edge flows — decide_bulk for autos, suggest_bulk for review.  The
"QuickStatements" emission becomes a DataFrame of (entity_id, prop,
value) command rows ready for ``df.write``; the wikidata HTTP transport
is a ``sources.enrich.Enricher`` instance (stubbed here — no network).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from nomenklatura_spark.resolver.edges import decide_bulk, normalize_pairs, suggest_bulk
from nomenklatura_spark.sources.enrich import Enricher, EnrichmentCache, enrich_match


@dataclass
class ReconcileResult:
    edges: DataFrame          # updated edge table (autos + suggestions)
    auto_matched: DataFrame   # (target, source, score) decided POSITIVE
    review: DataFrame         # (target, source, score) left for humans
    commands: DataFrame       # (entity_id, prop, value) write commands


def reconcile(
    queries: DataFrame,
    enricher: Enricher,
    edges: DataFrame,
    score_fn: Callable[[DataFrame], DataFrame],
    ts: str,
    auto_threshold: float = 0.9,
    review_threshold: float = 0.5,
    cache: EnrichmentCache | None = None,
) -> ReconcileResult:
    """``queries``: (query_id, query_name).  ``score_fn`` adds ``score``
    to (query_id, candidate_id, query_name, candidate_name) rows."""
    cands = enrich_match(queries, enricher, cache=cache).join(queries, "query_id")
    pairs = normalize_pairs(
        cands.select(
            F.col("query_id").alias("left"),
            F.col("candidate_id").alias("right"),
            "query_name",
            "candidate_name",
        )
    )
    judged = edges.where(F.col("deleted_at").isNull()).select("target", "source")
    scored = (
        score_fn(pairs.join(judged, ["target", "source"], "left_anti"))
        .where(F.col("score") >= review_threshold)
        # consumed by both the auto and review branches; localCheckpoint
        # releases with the plan instead of pinning per reconcile run
        .localCheckpoint(eager=True)
    )

    auto = scored.where(F.col("score") >= auto_threshold).select(
        "target", "source", "score"
    )
    review = scored.where(F.col("score") < auto_threshold).select(
        "target", "source", "score"
    )

    out = decide_bulk(
        edges,
        auto.select(
            "target",
            "source",
            F.lit("positive").alias("judgement"),
            "score",
            F.lit("reconcile").alias("user"),
        ),
        ts,
    )
    out = suggest_bulk(out, review, ts)

    # QuickStatements-shaped command rows: link each query entity to its
    # auto-matched remote id.
    commands = auto.select(
        F.col("target").alias("entity_id"),
        F.lit("sameAs").alias("prop"),
        F.col("source").alias("value"),
    )
    return ReconcileResult(
        edges=out, auto_matched=auto, review=review, commands=commands
    )
