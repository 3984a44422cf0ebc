"""G3-G9 — resolver edge-table verbs as bulk DataFrame transformations.

Reference: ``nomenklatura/resolver/resolver.py`` — a SQL table
``(target, source, judgement, score, user, created_at, deleted_at)`` with
soft deletes, where target/source are ordered by identifier weight
(``resolver/identifier.py:50-55``: target = max of the pair).

Spark-first deviations (documented):

- Verbs are *bulk*: ``decide_bulk``/``suggest_bulk`` take a DataFrame of
  decisions and upsert them in one shuffle, instead of row-at-a-time SQL
  upserts (the reference batches these too, just smaller). In production
  the edge table is a Delta table and these unions become MERGE INTO; the
  pure-DataFrame form here has identical semantics on overwrite.
- Canonical-id minting (reference ``resolver.py:385-394`` mints random
  ``NK-<shortuuid>``) is made deterministic: ``NK-<sha256(sorted cluster
  members)[:12]>`` so distributed recomputation is stable (SURVEY.md §7
  hard-part (b)).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

from nomenklatura_spark.resolver.components import (
    canonical_ids,
    connected_components,
    identifier_weight,
)

POSITIVE = "positive"
NEGATIVE = "negative"
UNSURE = "unsure"
NO_JUDGEMENT = "no_judgement"

EDGE_COLUMNS = [
    "target", "source", "judgement", "score", "user", "created_at", "deleted_at",
]


def _ordered_pair(a: Column, b: Column) -> tuple[Column, Column]:
    """(target, source) with target the max by (identifier weight, id) —
    reference resolver/identifier.py:50-55."""
    a_key = F.struct(identifier_weight(a).alias("w"), a.alias("id"))
    b_key = F.struct(identifier_weight(b).alias("w"), b.alias("id"))
    target = F.when(a_key >= b_key, a).otherwise(b)
    source = F.when(a_key >= b_key, b).otherwise(a)
    return target, source


def normalize_pairs(pairs: DataFrame, left: str = "left", right: str = "right") -> DataFrame:
    t, s = _ordered_pair(F.col(left), F.col(right))
    return pairs.select(
        t.alias("target"), s.alias("source"),
        *[c for c in pairs.columns if c not in (left, right)],
    )


def live(edges: DataFrame) -> DataFrame:
    """Undeleted edges.  An edge frame loaded from a resolver dump (S7)
    carries live edges only and no ``deleted_at`` column — pass through."""
    if "deleted_at" not in edges.columns:
        return edges
    return edges.where(F.col("deleted_at").isNull())


def _commit(edges: DataFrame) -> DataFrame:
    """Materialize an edge-table state and truncate its lineage.

    Each reference verb commits to the resolver database; the DataFrame
    analogue is a checkpoint. Without it, chained verbs carry their entire
    upstream DAG (e.g. a full xref pipeline inside a suggestions frame) —
    plans grow without bound and eventually OOM the driver on plan
    stringification alone. The edge table itself is always small relative
    to the corpus. In production this is the Delta MERGE commit.
    """
    return edges.localCheckpoint(eager=True)


def decide_bulk(edges: DataFrame, decisions: DataFrame, ts: str) -> DataFrame:
    """G3 — apply judgements: soft-delete any live edge for each decided
    pair, then append the new edges. ``decisions`` columns: target, source,
    judgement, score (nullable), user.

    One broadcast/shuffle join + union — the Delta form is a single MERGE.
    """
    keyed = decisions.select(
        "target", "source", "judgement", "score", "user"
    )
    hit = keyed.select("target", "source").withColumn("_decided", F.lit(True))
    retired = (
        edges.join(hit, ["target", "source"], "left")
        .withColumn(
            "deleted_at",
            F.when(
                F.col("_decided") & F.col("deleted_at").isNull(), F.lit(ts)
            ).otherwise(F.col("deleted_at")),
        )
        .drop("_decided")
    )
    fresh = keyed.select(
        "target", "source", "judgement", "score", "user",
        F.lit(ts).alias("created_at"),
        F.lit(None).cast("string").alias("deleted_at"),
    )
    return _commit(retired.select(EDGE_COLUMNS).unionByName(fresh))


def suggest_bulk(edges: DataFrame, suggestions: DataFrame, ts: str) -> DataFrame:
    """G4 — upsert NO_JUDGEMENT candidate edges keeping the max score
    (reference resolver.py:329-351: ON CONFLICT DO UPDATE score, and
    already-judged pairs are left untouched)."""
    judged = (
        live(edges)
        .where(F.col("judgement") != NO_JUDGEMENT)
        .select("target", "source")
    )
    fresh = (
        suggestions.join(judged, ["target", "source"], "left_anti")
        .select(
            "target", "source",
            F.lit(NO_JUDGEMENT).alias("judgement"),
            "score",
            F.col("user") if "user" in suggestions.columns else F.lit(None).cast("string").alias("user"),
            F.lit(ts).alias("created_at"),
            F.lit(None).cast("string").alias("deleted_at"),
        )
    )
    merged = edges.select(EDGE_COLUMNS).unionByName(fresh.select(EDGE_COLUMNS))
    # keep one live suggestion per pair: the max score, newest on ties
    w = Window.partitionBy("target", "source").orderBy(
        F.desc_nulls_last("score"), F.desc("created_at")
    )
    suggestions_live = (
        merged.where(
            (F.col("judgement") == NO_JUDGEMENT) & F.col("deleted_at").isNull()
        )
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    other = merged.where(
        (F.col("judgement") != NO_JUDGEMENT) | F.col("deleted_at").isNotNull()
    )
    return _commit(other.unionByName(suggestions_live))


def explode_cluster(edges: DataFrame, mapping: DataFrame, node: str, ts: str) -> DataFrame:
    """G7 — dissolve all edges touching the cluster containing ``node``
    (mistake recovery, resolver.py:486-496). ``mapping`` is the current
    (node, canonical_id) linker table."""
    canon = mapping.where(F.col("node") == node).select("canonical_id")
    members = mapping.join(canon, "canonical_id", "left_semi").select(
        F.col("node").alias("member")
    )
    marked = (
        edges.join(
            members.withColumnRenamed("member", "target").withColumn("_t", F.lit(True)),
            "target",
            "left",
        )
        .join(
            members.withColumnRenamed("member", "source").withColumn("_s", F.lit(True)),
            "source",
            "left",
        )
        .withColumn(
            "deleted_at",
            F.when(
                (F.col("_t") | F.col("_s")) & F.col("deleted_at").isNull(),
                F.lit(ts),
            ).otherwise(F.col("deleted_at")),
        )
        .drop("_t", "_s")
    )
    return _commit(marked.select(EDGE_COLUMNS))


def prune_suggestions(edges: DataFrame, ts: str) -> DataFrame:
    """G9 (part) — soft-delete all NO_JUDGEMENT suggestions
    (resolver.py:498-520)."""
    return _commit(
        edges.withColumn(
            "deleted_at",
            F.when(
                (F.col("judgement") == NO_JUDGEMENT) & F.col("deleted_at").isNull(),
                F.lit(ts),
            ).otherwise(F.col("deleted_at")),
        )
    )


def rename_node(edges: DataFrame, old: str, new: str) -> DataFrame:
    """G8 — rewrite all live edges old → new (upstream id redirects,
    resolver.py:447-484), re-normalizing pair order."""
    renamed = live(edges).select(
        F.when(F.col("target") == old, F.lit(new)).otherwise(F.col("target")).alias("a"),
        F.when(F.col("source") == old, F.lit(new)).otherwise(F.col("source")).alias("b"),
        "judgement", "score", "user", "created_at", "deleted_at",
    )
    t, s = _ordered_pair(F.col("a"), F.col("b"))
    rekeyed = renamed.select(
        t.alias("target"), s.alias("source"),
        "judgement", "score", "user", "created_at", "deleted_at",
    ).where(F.col("target") != F.col("source"))
    dead = edges.where(F.col("deleted_at").isNotNull()).select(EDGE_COLUMNS)
    return _commit(dead.unionByName(rekeyed.select(EDGE_COLUMNS)))


def resolver_mapping(edges: DataFrame, mint_canonicals: bool = True) -> DataFrame:
    """G1+G2 — (node → canonical_id) from live POSITIVE edges.

    Canonical choice: max (identifier weight, id) member; when a cluster
    has no NK-/QID member and ``mint_canonicals``, a deterministic
    ``NK-<sha256(members)[:12]>`` id is minted (see module docstring).
    """
    pos = live(edges).where(F.col("judgement") == POSITIVE)
    comps = connected_components(pos, src="source", dst="target")
    mapped = canonical_ids(comps)
    if not mint_canonicals:
        return mapped
    minted = (
        comps.groupBy("component")
        .agg(
            F.max(
                F.struct(identifier_weight("node").alias("w"), F.col("node").alias("id"))
            ).alias("best"),
            F.sha2(F.concat_ws("|", F.array_sort(F.collect_set("node"))), 256).alias("h"),
        )
        .select(
            "component",
            F.when(
                F.col("best.w") >= 2, F.col("best.id")
            ).otherwise(F.concat(F.lit("NK-"), F.substring("h", 1, 12))).alias("canonical_id"),
        )
    )
    return comps.join(minted, "component").select("node", "canonical_id")


def get_candidates(edges: DataFrame, limit: int | None = None) -> DataFrame:
    """G6 — undecided suggestions ranked by score (reference
    ``resolver.py:306-327``): live NO_JUDGEMENT edges whose pair has not
    been decided (anti-join vs judged live pairs — a pair can acquire a
    judgement edge without its suggestion row being rewritten), ordered
    ``score DESC NULLS LAST`` (W3) with (target, source) tie-break."""
    l = live(edges)
    sugg = l.where(F.col("judgement") == NO_JUDGEMENT)
    judged = l.where(F.col("judgement") != NO_JUDGEMENT).select("target", "source")
    out = (
        sugg.join(judged, ["target", "source"], "left_anti")
        .select("target", "source", "score")
        .orderBy(F.col("score").desc_nulls_last(), "target", "source")
    )
    return out.limit(limit) if limit is not None else out


def get_judgements(edges: DataFrame, pairs: DataFrame) -> DataFrame:
    """G5 — judgement lookup for (left, right) pairs via cluster membership
    + direct edges. Simplified batch form: positive if both map to the same
    canonical cluster; else the live edge's judgement; else no_judgement."""
    mapping = resolver_mapping(edges)
    p = normalize_pairs(pairs)
    p = (
        p.join(
            mapping.withColumnRenamed("node", "target").withColumnRenamed(
                "canonical_id", "t_canon"
            ),
            "target",
            "left",
        )
        .join(
            mapping.withColumnRenamed("node", "source").withColumnRenamed(
                "canonical_id", "s_canon"
            ),
            "source",
            "left",
        )
    )
    direct = live(edges).select(
        "target", "source", F.col("judgement").alias("edge_judgement")
    )
    p = p.join(direct, ["target", "source"], "left")
    same_cluster = (
        F.col("t_canon").isNotNull()
        & (F.col("t_canon") == F.col("s_canon"))
    )
    return p.select(
        "target",
        "source",
        F.when(same_cluster, F.lit(POSITIVE))
        .otherwise(F.coalesce("edge_judgement", F.lit(NO_JUDGEMENT)))
        .alias("judgement"),
    )
