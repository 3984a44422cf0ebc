"""G10 — incremental resolver-index refresh with rebuild-on-split.

Reference semantics (``nomenklatura/resolver/resolver.py:130-173``): the
in-memory linker replays edge rows whose ``created_at``/``deleted_at`` is
newer than the last refresh; if a POSITIVE edge was *deleted* in that
window the whole index is rebuilt, because removing a merge edge can
split a cluster and no incremental rule can undo transitive closure.

Spark re-expression: the "index" is the (node → canonical) mapping
DataFrame.  An incremental refresh runs connected components over the
UNION of the previous mapping (each cluster compressed to a star:
node→canonical edges) and only the NEW positive edges — cost scales with
the mapping + delta, never with the statement corpus.  A deleted
positive edge in the delta window forces the full rebuild, exactly the
reference's rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from nomenklatura_spark.resolver.edges import POSITIVE, live, resolver_mapping


def delta_edges(edges: DataFrame, since_ts: str) -> DataFrame:
    """Edge rows touched at or after ``since_ts`` (created or soft-deleted)."""
    return edges.where(
        (F.col("created_at") >= since_ts)
        | (F.col("deleted_at").isNotNull() & (F.col("deleted_at") >= since_ts))
    )


def needs_rebuild(edges: DataFrame, since_ts: str) -> bool:
    """True iff a POSITIVE edge was deleted in the delta window — the
    cluster-split case that invalidates incremental maintenance."""
    return (
        delta_edges(edges, since_ts)
        .where(
            (F.col("judgement") == POSITIVE)
            & F.col("deleted_at").isNotNull()
            & (F.col("deleted_at") >= since_ts)
        )
        .limit(1)
        .count()
        > 0
    )


def refresh_mapping(
    prev_mapping: DataFrame,
    edges: DataFrame,
    since_ts: str,
) -> tuple[DataFrame, bool]:
    """Refresh (node → canonical_id) given the previous mapping and the
    full edge table.  Returns ``(mapping, rebuilt)``.

    - split case (deleted POSITIVE in window): full ``resolver_mapping``
      recompute → ``rebuilt=True``;
    - otherwise: components over prev-mapping stars ∪ new live positive
      edges.  Canonical choice re-runs over the merged membership, so a
      newly-linked higher-weight id (e.g. a QID) correctly takes over an
      existing cluster.
    """
    if needs_rebuild(edges, since_ts):
        return resolver_mapping(edges), True

    new_pos = (
        live(delta_edges(edges, since_ts))
        .where(F.col("judgement") == POSITIVE)
        .select("source", "target")
    )
    star = prev_mapping.select(
        F.col("node").alias("source"), F.col("canonical_id").alias("target")
    )
    # Re-run the full mapping logic (components + canonical choice +
    # minting) over the COMPRESSED graph: previous clusters appear as
    # stars around their canonical.  Existing NK- canonicals are graph
    # nodes with identifier weight 2, so on a cluster merge one of them
    # wins and the loser maps onto it (a canonical→canonical row, the
    # same chain the reference's prune collapses, resolver.py:498-608);
    # a newly-linked QID (weight 3) takes over, and brand-new clusters
    # from delta edges get minted canonicals — all via the one code path.
    synth = star.unionByName(new_pos).select(
        "target",
        "source",
        F.lit(POSITIVE).alias("judgement"),
        F.lit(None).cast("double").alias("score"),
        F.lit(None).cast("string").alias("user"),
        F.lit(since_ts).alias("created_at"),
        F.lit(None).cast("string").alias("deleted_at"),
    )
    return resolver_mapping(synth), False
