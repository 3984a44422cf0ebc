"""Survivor selection: turn a near-duplicate pair graph into a per-document
keep/drop verdict — the last step of a corpus dedup pass (reference
analogue: canonical-id minting over merged entity clusters,
/root/reference/nomenklatura/resolver/resolver.py connected()/canonical
traversal, re-expressed for document corpora).

Policy: one survivor per connected component, the minimum document id
(deterministic, join-free to compute — it IS the component label that
star contraction already produces). Every other member maps to that
canonical document and is dropped.

Plan shape (100 TB): the component map holds only documents that appear
in at least one dup pair — at real-corpus dup rates that is a small
fraction of the corpus, so AQE broadcasts the map side of the verdict
join on its own; when a pathological corpus makes it large, the join
degrades to a plain doc_id equi-join, never to anything super-linear
(which is why the broadcast is left to the planner, not hinted).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from nomenklatura_spark.resolver.components import connected_components


def select_survivors(
    corpus: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    lid: str = "lid",
    rid: str = "rid",
) -> DataFrame:
    """Per-document dedup verdict from a dup-pair relation: returns
    (id_col, canonical_doc, keep) for EVERY corpus document — documents
    in no pair survive trivially, members of a dup component survive
    only if they are the component's min id."""
    comps = connected_components(pairs, src=lid, dst=rid)
    canonical = F.coalesce(F.col("component"), F.col(id_col))
    # no broadcast hint: at normal dup rates AQE broadcasts the small
    # component map on its own, and a pathological high-duplication
    # corpus genuinely degrades to a plain doc_id equi-join instead of
    # dying on a forced oversized broadcast
    return (
        corpus.select(id_col)
        .join(comps.withColumnRenamed("node", id_col), id_col, "left")
        .select(
            id_col,
            canonical.alias("canonical_doc"),
            (canonical == F.col(id_col)).alias("keep"),
        )
    )
