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


def connected_components(
    edges: DataFrame,
    src: str = "source",
    dst: str = "target",
    max_iterations: int = 50,
    checkpoint: bool = True,
) -> DataFrame:
    """Label propagation to a fixpoint: every node gets component = min
    (lexicographic) reachable node id. Returns (node, component).

    Deterministic and engine-independent: min-id labeling needs no tie
    rules. Use ``canonical_ids`` on top to pick the reference's
    max-(weight, id) canonical per component.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).where(
        F.col("a").isNotNull() & F.col("b").isNotNull()
    )
    # Undirected: symmetrize once. Materialize — the edge set is read every
    # iteration and its lineage may be an arbitrarily expensive upstream
    # pipeline (e.g. a similarity join).
    sym = (
        e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("component"))
    )

    for _ in range(max_iterations):
        # Each node adopts min(own label, neighbors' labels).
        neighbor_min = (
            sym.join(labels.withColumnRenamed("node", "b"), "b")
            .groupBy("a")
            .agg(F.min("component").alias("nbr_component"))
            .withColumnRenamed("a", "node")
        )
        # Carry the change flag through the propagation join so the
        # convergence probe is a scan of the checkpointed frame, not a
        # second labels join per iteration.
        new_component = F.least(
            "component", F.coalesce("nbr_component", "component")
        )
        new_labels = labels.join(neighbor_min, "node", "left").select(
            "node",
            new_component.alias("component"),
            (new_component != F.col("component")).alias("_chg"),
        )
        if checkpoint:
            new_labels = new_labels.localCheckpoint(eager=True)
        changed = new_labels.where("_chg").limit(1).count()
        labels = new_labels.select("node", "component")
        if changed == 0:
            break
    return labels


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
