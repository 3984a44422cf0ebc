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
