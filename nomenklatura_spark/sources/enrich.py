"""S9/P2/P3 — enrichment connectors with a response cache.

Behavioral re-expression of the reference's enrichment framework
(``nomenklatura/enrich/common.py:88-246``: ``Enricher.match(entity)`` /
``expand(entity, match)`` generators with an SQL-backed response cache,
``nomenklatura/cache.py:36-157``; pipelines ``enrich/__init__.py:46-103``).

Spark-first shape:

- An enricher is a *batch* function: candidates for a whole partition of
  query entities at once (``mapInPandas``), not an entity-at-a-time
  generator.  The HTTP transport is pluggable; this container has no
  network, so the built-in transports are a broadcast-reference local
  enricher (the semantics of yente/aleph-style matching without the
  wire) and a stub that raises — identical interface, so a real
  connector only swaps the fetch function.
- The response cache is a parquet-backed table keyed by a deterministic
  request fingerprint with TTL semantics: cache hits are resolved with
  one anti-join, only misses hit the transport, new responses append.
  At 100 TB the cache table is partitioned by enricher name and pruned
  by the fingerprint join — the miss set is usually tiny relative to the
  corpus, exactly like the reference's per-URL SQL cache.

The 9 reference connectors (aleph, brightquery, nominatim, opencorporates,
openfigi, permid, wikidata, yente) are transport instances of this one
pattern — each is ~50 lines of request/response mapping on top of
``CachedEnricher``.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from dataclasses import dataclass

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

# candidate rows an enricher returns for query entities
MATCH_SCHEMA = (
    "query_id string, candidate_id string, candidate_schema string, "
    "candidate_name string, raw string"
)

# expanded statement rows for confirmed matches
EXPAND_SCHEMA = (
    "canonical_id string, entity_id string, schema string, prop string, "
    "prop_type string, value string, dataset string"
)

CACHE_SCHEMA = "fingerprint string, enricher string, response string, cached_at timestamp"


def request_fingerprint(enricher: str, query_col) -> "F.Column":
    """Deterministic cache key — md5 over (enricher, normalized query)."""
    return F.md5(F.concat_ws("|", F.lit(enricher), F.lower(F.trim(query_col))))


@dataclass
class EnrichmentCache:
    """Parquet-backed response cache with TTL (cache.py:36-157 semantics).

    - **Jittered expiry** (``cache.py:30-33 randomize_cache``): the
      effective TTL is uniform in [max(1, ceil(0.5·days)), ceil(1.3·days)]
      so a whole crawl's cache doesn't expire on one day.  The reference
      rolls a random TTL per lookup; at cluster scale that makes reruns
      nondeterministic, so the jitter here is derived per-fingerprint
      (md5 bucket) — same spread, stable across retries and engines.
    - **Versioned invalidation** (``cache.py get(min_timestamp=...)``):
      entries stored before ``min_timestamp`` are stale regardless of
      TTL — the stricter (later) cutoff wins.
    - **Latest row wins**: the parquet table is append-only, so reads
      dedupe per fingerprint by newest ``cached_at`` (the reference's
      ``ORDER BY timestamp DESC LIMIT 1``).
    """

    path: str

    def read(
        self,
        spark: SparkSession,
        max_age_days: int | None = None,
        min_timestamp=None,
    ) -> DataFrame:
        try:
            df = spark.read.parquet(self.path)
        except Exception:
            return spark.createDataFrame([], CACHE_SCHEMA)
        if max_age_days is not None:
            if max_age_days < 1:
                return spark.createDataFrame([], CACHE_SCHEMA)
            lo = max(1, -(-max_age_days // 2))  # ceil(days * 0.5)
            hi = -(-(max_age_days * 13) // 10)  # ceil(days * 1.3)
            jitter = lo + F.pmod(
                F.conv(F.substring(F.md5(F.col("fingerprint")), 1, 8), 16, 10)
                .cast("long"),
                F.lit(hi - lo + 1),
            ).cast("int")
            df = df.where(
                F.col("cached_at")
                >= F.to_timestamp(F.date_sub(F.current_timestamp(), jitter))
            )
        if min_timestamp is not None:
            df = df.where(F.col("cached_at") >= F.lit(min_timestamp))
        w = Window.partitionBy("fingerprint").orderBy(F.desc("cached_at"))
        return (
            df.withColumn("_rk", F.row_number().over(w))
            .where(F.col("_rk") == 1)
            .drop("_rk")
        )

    def append(self, rows: DataFrame) -> None:
        rows.select(
            "fingerprint", "enricher", "response",
            F.current_timestamp().alias("cached_at"),
        ).write.mode("append").parquet(self.path)


class Enricher:
    """Batch enrichment interface.  Subclasses implement ``match_batch``
    (query entities → candidate rows) and ``expand_batch`` (confirmed
    matches → statement rows)."""

    name = "abstract"

    def match_batch(self, queries: pd.DataFrame) -> pd.DataFrame:
        raise NotImplementedError

    def expand_batch(self, matches: pd.DataFrame) -> pd.DataFrame:
        raise NotImplementedError


class StubHttpEnricher(Enricher):
    """Placeholder for wire connectors — fails loudly at call time.

    A real connector implements one HTTP request per batch here; the
    Spark plumbing (cache join, mapInPandas fan-out) is unchanged.
    """

    name = "http-stub"

    def __init__(self, url: str) -> None:
        self.url = url

    def match_batch(self, queries: pd.DataFrame) -> pd.DataFrame:
        raise NotImplementedError(
            f"no network transport in this environment (url={self.url}); "
            "plug a fetch function into a CachedEnricher subclass"
        )


class LocalEnricher(Enricher):
    """Match queries against an in-memory reference corpus.

    Stands in for yente/aleph-style remote matching: candidate = any
    reference entity sharing a normalized name token with the query.
    The reference frame is broadcast to every executor (it plays the
    role of the remote index).
    """

    name = "local"

    def __init__(self, reference: pd.DataFrame) -> None:
        # columns: entity_id, schema, name
        self._ref = reference.assign(
            _token_sets=reference["name"].str.lower().str.split()
        )

    def match_batch(self, queries: pd.DataFrame) -> pd.DataFrame:
        out: list[tuple[str, str, str, str, str]] = []
        ref = self._ref
        for qid, qname in zip(queries["query_id"], queries["query_name"]):
            q_tokens = set(str(qname).lower().split())
            if not q_tokens:
                continue
            hits = ref[
                ref["_token_sets"].map(lambda t: bool(q_tokens & set(t or [])))
            ]
            for _, hit in hits.iterrows():
                out.append(
                    (qid, hit["entity_id"], hit["schema"], hit["name"], "{}")
                )
        return pd.DataFrame(
            out,
            columns=[
                "query_id", "candidate_id", "candidate_schema",
                "candidate_name", "raw",
            ],
        )

    def expand_batch(self, matches: pd.DataFrame) -> pd.DataFrame:
        rows = []
        ref = self._ref.set_index("entity_id")
        for cid in matches["candidate_id"]:
            if cid in ref.index:
                hit = ref.loc[cid]
                rows.append(
                    (cid, cid, hit["schema"], "name", "name", hit["name"], self.name)
                )
        return pd.DataFrame(
            rows,
            columns=[
                "canonical_id", "entity_id", "schema", "prop", "prop_type",
                "value", "dataset",
            ],
        )


def enrich_match(
    queries: DataFrame,
    enricher: Enricher,
    cache: EnrichmentCache | None = None,
    max_age_days: int | None = 30,
) -> DataFrame:
    """P2 stage 1 — candidates for each query entity, cache-aware.

    ``queries``: (query_id, query_name).  With a cache, only fingerprint
    misses reach the enricher; hits replay the cached response.
    """
    spark = queries.sparkSession
    fp = request_fingerprint(enricher.name, F.col("query_name"))
    keyed = queries.withColumn("fingerprint", fp)

    to_fetch = keyed
    cached_hits = None
    if cache is not None:
        cached = cache.read(spark, max_age_days).where(
            F.col("enricher") == enricher.name
        )
        cached_hits = keyed.join(cached, "fingerprint").select(
            "query_id", F.col("response")
        )
        to_fetch = keyed.join(cached, "fingerprint", "left_anti")

    def _fetch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf):
                yield enricher.match_batch(pdf)

    fetched = to_fetch.mapInPandas(_fetch, MATCH_SCHEMA)

    if cache is not None:
        # the cache write-back and the returned frame both consume
        # `fetched`; checkpoint so the transport fires EXACTLY once per
        # query — stronger than persist (an evicted persisted block
        # would silently re-fire the transport on recompute) and the
        # blocks release with the plan instead of pinning per run
        fetched = fetched.localCheckpoint(eager=True)
        # write-back: one cache row per fetched query (response = packed
        # rows).  Queries with NO candidates are cached too (negative
        # caching, response="[]") — otherwise they re-hit the transport
        # on every run, which is the common case at scale.
        responses = fetched.groupBy("query_id").agg(
            F.to_json(
                F.collect_list(
                    F.struct("candidate_id", "candidate_schema", "candidate_name")
                )
            ).alias("response")
        )
        packed = (
            to_fetch.select("query_id", "fingerprint")
            .distinct()
            .join(responses, "query_id", "left")
            .select(
                "fingerprint",
                F.lit(enricher.name).alias("enricher"),
                F.coalesce(F.col("response"), F.lit("[]")).alias("response"),
            )
        )
        cache.append(packed)
        replayed = (
            cached_hits.select(
                "query_id",
                F.explode(
                    F.from_json(
                        "response",
                        "array<struct<candidate_id:string,"
                        "candidate_schema:string,candidate_name:string>>",
                    )
                ).alias("c"),
            )
            .select(
                "query_id",
                F.col("c.candidate_id").alias("candidate_id"),
                F.col("c.candidate_schema").alias("candidate_schema"),
                F.col("c.candidate_name").alias("candidate_name"),
                F.lit("{}").alias("raw"),
            )
        )
        return fetched.unionByName(replayed)
    return fetched


def enrich_expand(
    matches: DataFrame,
    enricher: Enricher,
) -> DataFrame:
    """P3 — expand confirmed (POSITIVE-judged) matches into statements."""

    def _expand(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf):
                yield enricher.expand_batch(pdf)

    return matches.mapInPandas(_expand, EXPAND_SCHEMA)


def match_and_suggest(
    queries: DataFrame,
    enricher: Enricher,
    edges: DataFrame,
    score_fn: Callable[[DataFrame], DataFrame],
    threshold: float = 0.5,
    cache: EnrichmentCache | None = None,
    ts: str = "1970-01-01T00:00:00",
) -> DataFrame:
    """P2 — match → drop already-judged pairs → score → suggest.

    ``score_fn`` maps (query_id, candidate_id, query_name,
    candidate_name) rows to the same plus a ``score`` column.  Returns
    the updated edge table with NO_JUDGEMENT suggestions (G4 semantics).
    """
    from nomenklatura_spark.resolver.edges import normalize_pairs, suggest_bulk

    cands = enrich_match(queries, enricher, cache=cache)
    cands = cands.join(queries, "query_id")
    judged = edges.where(F.col("deleted_at").isNull()).select("target", "source")
    pairs = normalize_pairs(
        cands.select(
            F.col("query_id").alias("left"),
            F.col("candidate_id").alias("right"),
            "query_name",
            "candidate_name",
        )
    )
    fresh = pairs.join(judged, ["target", "source"], "left_anti")
    scored = score_fn(fresh).where(F.col("score") >= threshold)
    suggestions = scored.select("target", "source", "score")
    return suggest_bulk(edges, suggestions, ts)
