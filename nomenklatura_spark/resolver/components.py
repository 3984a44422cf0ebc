"""G1 — connected components over the positive-judgement edge graph.

Reference semantics (``nomenklatura/resolver/linker.py:20-45``): positive
edges define clusters; each cluster's canonical id is its maximum member
under the identifier ordering (weight, id) — plain ids < ``NK-`` canonicals
< Wikidata QIDs (``resolver/identifier.py:16-29``).

Implementation: large-star/small-star-style alternating min-label
propagation on DataFrames (the standard Spark CC formulation from the
"Connected Components in MapReduce and Beyond" paper lineage, simplified
to repeated min-neighbor joins with AQE handling skew). ER clusters are
small and shallow (size 2-50 per FIXTURES.md), so convergence is a handful
of iterations; each iteration is one self-join + one aggregation, both
shuffling on the node id.

checkpoint/localCheckpoint truncates the lineage each iteration so the
plan doesn't grow exponentially at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def identifier_weight(col) -> "F.Column":
    """Canonical-identifier precedence (reference resolver/identifier.py:16-29):
    QIDs (Q\\d+) weight 3, NK- canonicals weight 2, plain ids weight 1."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.when(c.rlike(r"^Q\d+$"), F.lit(3))
        .when(c.startswith("NK-"), F.lit(2))
        .otherwise(F.lit(1))
    )


def _min_labels(g: DataFrame) -> DataFrame:
    """Per node: label = min(own id, min neighbor id). ``g`` must be
    symmetric, so every node appears on the ``a`` side."""
    return (
        g.groupBy("a")
        .agg(F.min("b").alias("_mb"))
        .select(F.col("a").alias("node"), F.least("a", "_mb").alias("label"))
    )


def _contract(g: DataFrame, labels: DataFrame) -> DataFrame:
    """Map both endpoints through the label map and keep surviving
    inter-label edges. Merging only ever happens along edges, so
    connectivity of the contracted graph mirrors the original."""
    la = labels.select(F.col("node").alias("a"), F.col("label").alias("_la"))
    lb = labels.select(F.col("node").alias("b"), F.col("label").alias("_lb"))
    return (
        g.join(la, "a")
        .join(lb, "b")
        .select(F.col("_la").alias("a"), F.col("_lb").alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )


def _pointer_jump(m: DataFrame) -> DataFrame:
    """label := label(label) where defined — one round of pointer jumping,
    so chain-shaped merges resolve in O(log chain) levels instead of
    O(chain)."""
    mm = m.select(F.col("node").alias("label"), F.col("label").alias("_nl"))
    return m.join(mm, "label", "left").select(
        "node", F.coalesce("_nl", "label").alias("label")
    )


def connected_components(
    edges: DataFrame,
    src: str = "source",
    dst: str = "target",
    max_iterations: int = 50,
    checkpoint: bool = True,
) -> DataFrame:
    """Star contraction (hash-to-min lineage): every node gets
    component = min (lexicographic) reachable node id. Returns
    (node, component).

    Each level contracts every node into its min-neighbor label and
    recurses on the (strictly shrinking) inter-label edge set, so the
    full edge relation is shuffled only at level 0 — the levels after
    that run on cluster-count-sized frames, which AQE coalesces and
    auto-broadcasts. That matters twice: at 100 TB the per-level cost
    decays geometrically instead of re-shuffling the world per round,
    and locally a tiny pair graph converges in one or two cheap jobs
    instead of diameter-many full-size iterations. ER merge graphs are
    shallow (FIXTURES.md: clusters of 2-50), so levels ≈ 2-3; a pointer
    jump per level keeps pathological chains at O(log) levels.

    Deterministic and engine-independent: min-id labeling needs no tie
    rules. Use ``canonical_ids`` on top to pick the reference's
    max-(weight, id) canonical per component.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).where(
        F.col("a").isNotNull() & F.col("b").isNotNull()
    )
    # Undirected: symmetrize once. Materialize — the edge set is read
    # several times below and its lineage may be an arbitrarily expensive
    # upstream pipeline (e.g. a similarity join).
    sym = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    if checkpoint:
        sym = sym.localCheckpoint(eager=True)

    # Level 0 over the full graph: node-level label map, contracted edges.
    labels = _min_labels(sym)
    g = _contract(sym, labels)
    for _ in range(max_iterations):
        if checkpoint:
            g = g.localCheckpoint(eager=True)
        if g.isEmpty():
            break
        # Contracted-level map (cluster-count-sized, not corpus-sized).
        m = _pointer_jump(_min_labels(g))
        # Fold the level's relabeling into the node-level composition.
        step = m.select(F.col("node").alias("label"), F.col("label").alias("_nl"))
        labels = labels.join(step, "label", "left").select(
            "node", F.coalesce("_nl", "label").alias("label")
        )
        g = _contract(g, m)
    return labels.select("node", F.col("label").alias("component"))


def fold_components_incremental(
    prev: DataFrame,
    new_pairs: DataFrame,
    merged_pairs: DataFrame | None = None,
    changed: DataFrame | None = None,
) -> DataFrame:
    """Fold one batch's pairs into a maintained (node, component)
    mapping — the incremental leg of the dedup indexes (§2.12).

    CONTRACT on ``prev`` (ADVICE r11): its ``component`` labels must be
    MIN-MEMBER NODE IDS — i.e. ``prev`` is the output of
    ``connected_components`` or of this fold itself.  The merge case's
    exactness rests on every label being a node of its own component
    (the relabel join reaches old components through their label) and
    on min-label composition; a differently-labeled mapping (e.g.
    ``canonical_ids`` output, whose labels are max-(weight, id)) would
    silently produce wrong components.  The dedup indexes only ever
    feed this function its own output, so the invariant holds by
    construction rather than by a per-fold assertion (checking "every
    label is a member node" would cost a mapping-sized join per fold).

    Merge case (``changed`` is None — nothing was retracted): pairs are
    append-only, so components can only MERGE.  The batch pairs are
    CONTRACTED through the previous mapping first (endpoint → its old
    component; endpoints the mapping has never seen ride as
    themselves), CC runs on that BATCH-sized component graph alone, and
    the previous mapping is composed with the resulting relabel map in
    one broadcast join — the mapping itself never re-enters CC's
    symmetrize/contract shuffles (r11: the earlier shape ran CC over
    the star-compressed mapping plus the batch, re-shuffling
    O(mapping) every fold; this one shuffles O(batch) and touches the
    mapping with a single map-side join).  Exact by the contraction
    argument: CC of the quotient graph mirrors CC of old ∪ new (merges
    only happen along edges), and min-id labels compose — an old
    component's label IS its minimum member id, so the min over a
    merged group's component labels and raw new ids equals the min
    over all its members, bit-identical to a from-scratch run
    (pytest-pinned incremental-equals-scratch in
    ``tests/test_dedup_index.py`` / ``tests/test_media_index.py``).

    Split case (``changed`` = the ids whose signatures changed this
    fold, their stale pairs already RETRACTED from ``merged_pairs``):
    retraction can SPLIT components, which no merge fold can express —
    the reference's G10 rule (deleted positive judgements force a
    rebuild of the affected clusters,
    ``/root/reference/nomenklatura/resolver/resolver.py:130-173``)
    bounded to the components it names: affected = components holding a
    changed id or a new-pair endpoint; only those are re-derived from
    ``merged_pairs`` (the live log).  The affected node set A is
    EDGE-CLOSED under the live log — a kept old pair's endpoints
    shared an old component (the mapping is CC over the old log), so
    one endpoint in A puts both there, and a new pair's endpoints are
    marked by construction — hence CC over the live log decomposes into
    CC(edges within A) ⊎ CC(edges outside A), the outside part IS the
    previous mapping restricted to unaffected components, and min-id
    labels agree piecewise: the bounded rebuild is bit-identical to a
    from-scratch run over the live log (pytest-pinned in
    ``tests/test_media_index.py`` / ``tests/test_dedup_index.py``).
    """
    if changed is None:
        lmap = prev.select(
            F.col("node").alias("lid"), F.col("component").alias("_lc")
        )
        rmap = prev.select(
            F.col("node").alias("rid"), F.col("component").alias("_rc")
        )
        cj = (
            new_pairs.select("lid", "rid")
            .join(lmap, "lid", "left")
            .join(rmap, "rid", "left")
        )
        contracted = cj.select(
            F.coalesce("_lc", "lid").alias("lid"),
            F.coalesce("_rc", "rid").alias("rid"),
        )
        # batch-sized CC over the component graph; every old component
        # id is itself a node of ``prev`` (label = min member), so the
        # relabel step below reaches it through its component column
        merge_labels = connected_components(
            contracted, src="lid", dst="rid"
        )
        step = merge_labels.select(
            F.col("node").alias("component"),
            F.col("component").alias("_nc"),
        )
        relabeled = prev.join(step, "component", "left").select(
            "node", F.coalesce("_nc", "component").alias("component")
        )
        # endpoints the previous mapping had never seen enter as new
        # rows — identified at contraction time (their map join missed),
        # so no anti-join against the mapping-sized relation is needed
        new_ids = (
            cj.where(F.col("_lc").isNull())
            .select(F.col("lid").alias("node"))
            .union(
                cj.where(F.col("_rc").isNull()).select(
                    F.col("rid").alias("node")
                )
            )
            .distinct()
        )
        new_nodes = merge_labels.join(new_ids, "node", "semi").select(
            "node", "component"
        )
        return relabeled.unionByName(new_nodes)
    if merged_pairs is None:
        raise ValueError(
            "fold_components_incremental: the split case needs the "
            "retracted-and-refreshed pair log (merged_pairs)"
        )
    cid = changed.columns[0]
    endpoints = (
        changed.select(F.col(cid).alias("node"))
        .unionByName(new_pairs.select(F.col("lid").alias("node")))
        .unionByName(new_pairs.select(F.col("rid").alias("node")))
        .distinct()
    )
    affected = (
        prev.join(endpoints, "node", "semi").select("component").distinct()
    )
    unaffected = prev.join(affected, "component", "left_anti")
    # A is edge-closed (docstring), so one anti-join on lid drops
    # exactly the outside edges
    rebuild_edges = merged_pairs.select("lid", "rid").join(
        unaffected.select(F.col("node").alias("lid")), "lid", "left_anti"
    )
    rebuilt = connected_components(rebuild_edges, src="lid", dst="rid")
    return unaffected.select("node", "component").unionByName(
        rebuilt.select("node", "component")
    )


def canonical_ids(components: DataFrame) -> DataFrame:
    """Pick each component's canonical id = max(identifier weight, id)
    member (reference linker.py:20-36), and emit the (node → canonical)
    mapping ready for the linker broadcast join."""
    canon = (
        components.groupBy("component")
        .agg(
            F.max(
                F.struct(
                    identifier_weight("node").alias("w"), F.col("node").alias("id")
                )
            )["id"].alias("canonical_id")
        )
    )
    return components.join(canon, "component").select("node", "canonical_id")
