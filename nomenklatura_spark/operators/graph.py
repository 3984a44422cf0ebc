"""Graph centrality (fixed-point PageRank) over DataFrame edge relations.

Why this operator exists in a curation/ER engine: web-scale training-data
pipelines weight documents by host/page centrality over the link graph
(the CommonCrawl harmonic-centrality / PageRank prior), and the ER tier
ranks xref work queues by how central an entity is in the relationship
graph (the reference walks the same adjacency in
``nomenklatura/store/base.py`` view traversal — J6).  Connected
components (resolver/components.py) answers *membership*; PageRank
answers *importance*.

Design — exact fixed-point integer arithmetic, not floats:

- Ranks are BIGINT micro-units on a ``scale`` grid (default 1e9), the
  same exact-integer device as the blocker pair-cost Decimal and the
  DSIR weight grid: floating-point addition is not associative, so a
  float PageRank's low bits depend on partitioning and engine; the
  integer form is bit-identical across partitionings AND across engines,
  which is what lets a DuckDB oracle replay the whole iteration as
  unrolled CTEs.
- One iteration = contribution join + partial-agg sum: each node sends
  ``rank_q DIV out_degree`` along its out-edges (truncating integer
  division), inflows are summed per destination (map-side combine), and
  ``rank' = (1-d)·scale + d · (inflow + dangling_share)`` with the
  damping ``d`` applied as an exact rational (17/20 for 0.85).
- Dangling mass (nodes without out-edges) is redistributed uniformly:
  ``dangling_share = sum(dangling rank) DIV N`` — computed as a one-row
  aggregate crossJoined back (broadcast of a scalar, not a shuffle).
- The teleport term uses the *initial* per-node mass (``scale``), so it
  is a compile-time constant; total mass drifts by at most one unit per
  node per iteration from the floor divisions — the standard fixed-point
  formulation, replayed identically by the oracle.

100 TB shape: the edge relation is hash-partitioned on ``src`` once and
localCheckpointed; every iteration's contribution join reuses that
layout against the rank frame (which leaves each iteration partitioned
on the node id from its groupBy), so steady state is ONE partial-agg
shuffle per iteration plus a scalar broadcast.  Lineage is truncated per
iteration, exactly like resolver/components.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

PR_SCALE = 1_000_000_000
DAMP_NUM = 17
DAMP_DEN = 20


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 5,
    scale: int = PR_SCALE,
    damp_num: int = DAMP_NUM,
    damp_den: int = DAMP_DEN,
    checkpoint: bool = True,
    weight: str | None = None,
) -> DataFrame:
    """Fixed-point PageRank over a directed edge relation.

    Returns ``(node, rank_q, rank)``: the exact integer rank in
    ``1/scale`` units after ``n_iter`` iterations, and its double form
    (``rank_q / scale``).  Multi-edges are collapsed (out-degree counts
    distinct destinations).  Deterministic under any partitioning.

    With ``weight`` (a non-negative INTEGER edge column — quantize
    upstream if you have float weights, the DSIR grid device), each node
    splits its rank proportionally: the edge carries
    ``(rank_q · w) DIV sum_w(src)`` — still exact integer arithmetic,
    the weighted-graph form a host-level quality prior actually uses
    (edge weight = link count between hosts).  Zero-total-weight sources
    behave as dangling.  The unweighted form is the special case w ≡ 1.

    Overflow contract: the weighted product ``rank_q · w`` is computed
    in DECIMAL(38,0) (exact, 38 digits — no BIGINT overflow for any
    representable weight; the quotient itself is ≤ rank_q because
    w ≤ sum_w(src)), so arbitrary link-count weights are safe as long
    as each source's TOTAL weight fits BIGINT.  Separately, the
    dampening step computes ``damp_num · total_mass`` in BIGINT, and
    total mass is conserved at ``n_nodes · scale`` — the constructor
    validates ``damp_num · (n_nodes + 1) · scale < 2^63`` and asks for
    a smaller ``scale`` on graphs big enough to violate it (at the
    default 1e9 scale that bound sits near 10^8 nodes).
    """
    spark = edges.sparkSession
    par = spark.sparkContext.defaultParallelism
    w_col = (
        F.col(weight).cast("long")
        if weight is not None
        else F.lit(1).cast("long")
    )
    e = (
        edges.select(
            F.col(src).alias("src"), F.col(dst).alias("dst"), w_col.alias("w")
        )
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.max("w").alias("w"))  # collapse multi-edges deterministically
        .where(F.col("w") > 0)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    deg = e.groupBy("src").agg(F.sum("w").alias("odeg"))
    # Partition the contribution relation by the join key once; every
    # iteration reuses the layout.
    e = e.join(deg, "src").repartition(par, "src")
    if checkpoint:
        e = e.localCheckpoint(eager=True)
        nodes = nodes.localCheckpoint(eager=True)
    n_nodes = nodes.count()
    if damp_num * (n_nodes + 1) * scale >= 2**63:
        raise ValueError(
            f"pagerank: damp_num * (n_nodes + 1) * scale = "
            f"{damp_num * (n_nodes + 1) * scale} would overflow BIGINT "
            f"in the dampening step (total rank mass is conserved at "
            f"n_nodes * scale); pass a smaller scale= (need scale < "
            f"{2**63 // (damp_num * (n_nodes + 1))})"
        )
    base = (scale * (damp_den - damp_num)) // damp_den

    # Weighted path: rank_q * w can exceed BIGINT for link-count-sized
    # weights (rank_q alone approaches n_nodes * scale on hub nodes);
    # DECIMAL(38,0) keeps the product exact, and the quotient is back
    # in BIGINT range by construction (w <= odeg => quotient <= rank_q).
    # The unweighted path (w = 1) stays in pure BIGINT codegen.
    contrib_expr = (
        "CAST((CAST(rank_q AS DECIMAL(38,0)) * w) DIV odeg AS BIGINT)"
        if weight is not None
        else "(rank_q * w) DIV odeg"
    )
    ranks = nodes.select("node", F.lit(scale).cast("long").alias("rank_q"))
    for _ in range(n_iter):
        contrib = (
            ranks.join(e, ranks["node"] == e["src"])
            .select(
                F.col("dst").alias("node"),
                F.expr(contrib_expr).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        dangling = (
            ranks.join(deg, ranks["node"] == deg["src"], "left_anti")
            .agg(F.coalesce(F.sum("rank_q"), F.lit(0)).cast("long").alias("ds"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit(base).cast("long")
                    + F.expr(
                        f"({damp_num} * (coalesce(inflow, 0L) + (ds DIV {n_nodes})))"
                        f" DIV {damp_den}"
                    )
                ).alias("rank_q"),
            )
        )
        if checkpoint:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select(
        "node",
        "rank_q",
        F.round(F.col("rank_q") / F.lit(float(scale)), 6).alias("rank"),
    )


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    seed_col: str = "node",
    n_iter: int = 5,
    scale: int = PR_SCALE,
    damp_num: int = DAMP_NUM,
    damp_den: int = DAMP_DEN,
    checkpoint: bool = True,
) -> DataFrame:
    """Personalized PageRank: teleport mass concentrates on a seed set
    instead of spreading uniformly, so ranks measure *proximity to the
    seeds* through the graph — the lead-prioritization ranking an ER
    investigation runs from known entities (sanctioned parties, a
    takedown list) over the relationship graph, and the seeded variant
    of the host-quality prior (seeds = trusted domains).

    Same exact fixed-point integer recurrence as ``pagerank`` with two
    substitutions: the teleport term ``(1−d)·M0`` lands entirely on the
    seeds (``DIV n_seeds`` each, zero elsewhere) and dangling mass
    returns to the seeds, not to all nodes.  Seeds outside the graph's
    node set are ignored.  Start mass remains uniform (M0 = N·scale),
    which only rescales ranks, not their order.
    """
    spark = edges.sparkSession
    par = spark.sparkContext.defaultParallelism
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("odeg"))
    e = e.join(deg, "src").repartition(par, "src")
    seed_nodes = (
        nodes.join(
            seeds.select(F.col(seed_col).alias("node")).distinct(), "node"
        )
    )
    marked = nodes.join(
        seed_nodes.select("node", F.lit(True).alias("_seed")), "node", "left"
    ).select("node", F.coalesce("_seed", F.lit(False)).alias("is_seed"))
    if checkpoint:
        e = e.localCheckpoint(eager=True)
        marked = marked.localCheckpoint(eager=True)
    n_nodes = marked.count()
    n_seeds = marked.where("is_seed").count()
    if n_seeds == 0:
        raise ValueError("personalized_pagerank: no seed appears in the graph")
    # Same up-front overflow contract as pagerank, with the seeded
    # dampening term's extra ds DIV n_seeds: a seed node can see up to
    # damp_num * (total_mass + total_mass DIV n_seeds) in BIGINT —
    # nearly twice the uniform bound with a single seed.
    mass = n_nodes * scale
    if damp_num * (mass + mass // n_seeds + 1) >= 2**63:
        need = 2**63 * n_seeds // (damp_num * n_nodes * (n_seeds + 1))
        raise ValueError(
            f"personalized_pagerank: damp_num * n_nodes * scale * "
            f"(1 + 1/n_seeds) = "
            f"{damp_num * (mass + mass // n_seeds)} would overflow "
            f"BIGINT in the seeded dampening step; pass a smaller "
            f"scale= (need scale < {need})"
        )
    base_total = (scale * n_nodes * (damp_den - damp_num)) // damp_den
    seed_base = base_total // n_seeds

    ranks = marked.select(
        "node", "is_seed", F.lit(scale).cast("long").alias("rank_q")
    )
    for _ in range(n_iter):
        contrib = (
            ranks.join(e, ranks["node"] == e["src"])
            .select(
                F.col("dst").alias("node"),
                F.expr("rank_q DIV odeg").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        dangling = (
            ranks.join(deg, ranks["node"] == deg["src"], "left_anti")
            .agg(F.coalesce(F.sum("rank_q"), F.lit(0)).cast("long").alias("ds"))
        )
        ranks = (
            marked.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                "is_seed",
                (
                    F.when(F.col("is_seed"), F.lit(seed_base)).otherwise(
                        F.lit(0)
                    ).cast("long")
                    + F.expr(
                        f"({damp_num} * (coalesce(inflow, 0L)"
                        f" + if(is_seed, ds DIV {n_seeds}, 0L)))"
                        f" DIV {damp_den}"
                    )
                ).alias("rank_q"),
            )
        )
        if checkpoint:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select(
        "node",
        "is_seed",
        "rank_q",
        F.round(F.col("rank_q") / F.lit(float(scale)), 6).alias("rank"),
    )


def _canonical_undirected(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Canonical undirected edge set (a < b, self-loops dropped,
    multiplicity collapsed), eagerly checkpointed: every consumer
    references it several times, and without lineage truncation the
    caller's edge pipeline re-executes once per reference (measured 6x
    for the triangle plan)."""
    return (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )


def _symmetrize(und: DataFrame) -> DataFrame:
    """Both directions of a canonical undirected relation as (s, d)."""
    return und.select(F.col("a").alias("s"), F.col("b").alias("d")).unionAll(
        und.select(F.col("b").alias("s"), F.col("a").alias("d"))
    )


def triangle_counts(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    decimals: int = 4,
) -> DataFrame:
    """Per-node triangle counts and local clustering coefficients.

    Input is an undirected edge relation in any form (direction, order
    and multiplicity are normalized away; self-loops dropped).  Returns
    ``(node, degree, triangles, clustering)`` for every endpoint, with
    ``clustering = 2T / (d(d-1))`` rounded (0.0 when d < 2).

    The ER use: transitivity of the xref candidate-pair graph — a
    high-clustering neighborhood is a coherent duplicate cluster, a
    zero-clustering hub is a stopword-like token bridging unrelated
    entities (the same diagnostic the dedup tier wants before trusting
    connected components to mint canonical ids).

    100 TB shape — the standard degree-ordered wedge algorithm, pure
    equi-joins (Suri & Vassilvitskii, "Counting triangles and the curse
    of the last reducer", WWW 2011):

    - Each undirected edge is oriented from the lexicographically
      smaller ``(degree, id)`` endpoint to the larger, which bounds
      every out-degree by O(sqrt(m)) — the wedge self-join is
      sum-of-C(outdeg, 2), NOT sum-of-C(deg, 2), so a celebrity node
      with 10^7 neighbors costs what its sqrt suggests, not its square.
    - Wedge generation and the closing-edge probe are two shuffled
      equi-joins on node ids; each triangle is found exactly once
      (its L-minimal vertex owns it), then fans out to its three
      corners through one union + partial-agg count.
    """
    # node ids keep their input type (both endpoints must share it):
    # integral ids sort/join at half the byte cost of their string forms
    # in the wedge-sized exchanges — measured 30s -> 17s at sf0.1
    # und feeds deg (twice, via the endpoint union) AND the orientation
    # join, and oriented feeds three plan branches — checkpointing und
    # and oriented cut the sf0.1 row 3.1s -> ~1.4s (the self-join had
    # executed 6x in one plan)
    und = _canonical_undirected(edges, src, dst)
    deg = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    # orient by (degree, id): u -> v iff L(u) < L(v); carry L(dst) so the
    # wedge join can order the two out-neighbors without a re-join
    da = deg.select(F.col("node").alias("a"), F.col("degree").alias("_da"))
    db = deg.select(F.col("node").alias("b"), F.col("degree").alias("_db"))
    lab = und.join(da, "a").join(db, "b")
    fwd = (F.col("_da") < F.col("_db")) | (
        (F.col("_da") == F.col("_db")) & (F.col("a") < F.col("b"))
    )
    oriented = lab.select(
        F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(fwd, F.col("_db")).otherwise(F.col("_da")).alias("dv"),
    ).localCheckpoint(eager=True)  # referenced by e1, e2 and closing
    e1 = oriented.select(
        F.col("u"), F.col("v").alias("x"), F.col("dv").alias("dx")
    )
    e2 = oriented.select(
        F.col("u"), F.col("v").alias("y"), F.col("dv").alias("dy")
    )
    wedges = e1.join(e2, "u").where(
        (F.col("dx") < F.col("dy"))
        | ((F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y")))
    )
    closing = oriented.select(F.col("u").alias("x"), F.col("v").alias("y"))
    tri = wedges.join(closing, ["x", "y"]).select("u", "x", "y")
    corners = (
        tri.select(F.col("u").alias("node"))
        .unionAll(tri.select(F.col("x").alias("node")))
        .unionAll(tri.select(F.col("y").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    d = F.col("degree")
    return (
        deg.join(corners, "node", "left")
        .select(
            "node",
            "degree",
            F.coalesce("triangles", F.lit(0)).cast("long").alias("triangles"),
            F.when(
                d >= 2,
                F.round(
                    F.lit(2.0) * F.coalesce("triangles", F.lit(0)) / (d * (d - 1)),
                    decimals,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("clustering"),
        )
    )


def kcore_peel(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    k: int = 3,
    n_rounds: int = 5,
) -> DataFrame:
    """Bounded k-core peeling: which nodes survive ``n_rounds`` of
    removing everything with degree < ``k``.

    The density diagnostic the xref queue reads after triangles: the
    k-core of a candidate-pair graph isolates the dense duplicate blobs
    that deserve batch review, while early-peeled nodes are stragglers
    attached by one or two candidate edges.  Bounded rounds (not
    run-to-fixpoint) keep the operator a fixed-depth plan that an
    unrolled SQL oracle can replay; each round that changes nothing is
    a no-op, so ``n_rounds`` is an upper bound on peel depth, not a
    semantic knob — report ``peel_round`` so the caller can see whether
    the cascade was still moving at the horizon.

    Returns ``(node, degree, peel_round, in_core)``: the initial
    degree, the 1-based round the node was removed (0 = survived all
    rounds), and the survivor flag.

    100 TB shape: per round ONE partial-agg degree count over the
    surviving symmetric edge relation plus two semi-joins against the
    alive set; lineage is truncated per round via localCheckpoint exactly
    like connected components, so the plan depth stays constant.
    """
    und = _canonical_undirected(edges, src, dst)
    sym = _symmetrize(und)
    deg0 = sym.groupBy(F.col("s").alias("node")).agg(
        F.count(F.lit(1)).alias("degree")
    )
    nodes = deg0.select("node", "degree", F.lit(0).alias("peel_round"))
    nodes = nodes.localCheckpoint(eager=True)
    sym = sym.localCheckpoint(eager=True)
    for t in range(1, n_rounds + 1):
        cur = nodes.where(F.col("peel_round") == 0)
        deg_t = sym.groupBy(F.col("s").alias("node")).agg(
            F.count(F.lit(1)).alias("_d")
        )
        peeled = (
            cur.join(deg_t, "node", "left")
            .where(F.coalesce("_d", F.lit(0)) < k)
            .select("node")
        )
        # no .count() round-trip: marking with a join keeps the loop
        # lazy per round; a vacuous round just re-marks nothing
        nodes = (
            nodes.join(peeled.withColumn("_p", F.lit(t)), "node", "left")
            .select(
                "node",
                "degree",
                F.when(
                    (F.col("peel_round") == 0) & F.col("_p").isNotNull(),
                    F.lit(t),
                )
                .otherwise(F.col("peel_round"))
                .alias("peel_round"),
            )
            .localCheckpoint(eager=True)
        )
        alive = nodes.where(F.col("peel_round") == 0).select(
            F.col("node").alias("s")
        )
        sym = (
            sym.join(alive, "s", "left_semi")
            .join(alive.select(F.col("s").alias("d")), "d", "left_semi")
            .select("s", "d")
            .localCheckpoint(eager=True)
        )
    return nodes.select(
        "node",
        "degree",
        F.col("peel_round").cast("int").alias("peel_round"),
        (F.col("peel_round") == 0).alias("in_core"),
    )


def label_propagation(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
    label_col: str = "label",
    n_rounds: int = 3,
) -> DataFrame:
    """Seeded synchronous label propagation over an undirected graph.

    The semi-supervised companion to personalized PageRank: PPR ranks
    nodes by *proximity* to one seed set; label propagation ASSIGNS
    each node the majority label among its labeled neighbors, seeded
    from several competing sets at once — the ER risk-propagation step
    (sanctioned vs vetted entities pulling the unlabeled middle), or a
    host-graph trust/spam vote.

    Semantics (deterministic by construction): each round every
    non-seed node takes the most common label among its neighbors'
    previous-round labels (ties broken by label ascending); seeds are
    clamped; nodes whose neighborhood is entirely unlabeled stay
    unlabeled.  Seeds not present in the graph are ignored.  Returns
    ``(node, label, votes, is_seed)`` with label ``'(none)'`` and
    votes 0 for never-labeled nodes (no NULLs — driver-hash
    discipline), votes 0 for seeds (their label is an input, not a
    vote).

    100 TB shape: per round ONE partial-agg count of (node, neighbor
    label) pairs over the symmetric edge relation joined to the
    LABEL frame (node-sized, shrinking to stable), plus a per-node
    window on the vote relation (bounded by labels-per-node); lineage
    truncated per round.  The edge relation is materialized once.
    """
    if n_rounds < 1:
        raise ValueError("label_propagation needs at least one round")
    und = _canonical_undirected(edges, src, dst)
    sym = _symmetrize(und).localCheckpoint(eager=True)
    nodes = sym.select(F.col("s").alias("node")).distinct().localCheckpoint(
        eager=True
    )
    seed_lab = (
        seeds.select(
            F.col(node_col).alias("node"), F.col(label_col).alias("label")
        )
        # one row per seed node: duplicates would double-count votes and
        # duplicate output rows; CONFLICTING labels for one node resolve
        # to the ascending label — the same deterministic tie rule the
        # vote itself uses
        .groupBy("node")
        .agg(F.min("label").alias("label"))
        .join(nodes, "node", "left_semi")
        .localCheckpoint(eager=True)
    )
    lab = seed_lab
    win = None
    from pyspark.sql.window import Window

    for _ in range(n_rounds):
        votes = (
            sym.join(lab.withColumnRenamed("node", "d"), "d")
            .groupBy(F.col("s").alias("node"), "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        w = Window.partitionBy("node").orderBy(F.desc("c"), F.asc("label"))
        win = (
            votes.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select("node", "label", "c")
            .localCheckpoint(eager=True)
        )
        lab = seed_lab.unionByName(
            win.join(seed_lab.select("node"), "node", "left_anti").select(
                "node", "label"
            )
        ).localCheckpoint(eager=True)
    is_seed = F.col("_sn").isNotNull()
    return (
        nodes.join(lab.withColumnRenamed("label", "_lab"), "node", "left")
        .join(
            seed_lab.select(F.col("node"), F.lit(1).alias("_sn")),
            "node",
            "left",
        )
        .join(
            win.select("node", F.col("c").alias("_c")), "node", "left"
        )
        .select(
            "node",
            F.coalesce("_lab", F.lit("(none)")).alias("label"),
            F.when(is_seed | F.col("_lab").isNull(), F.lit(0))
            .otherwise(F.coalesce("_c", F.lit(0)))
            .cast("long")
            .alias("votes"),
            is_seed.alias("is_seed"),
        )
    )


def strongly_connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_outer: int = 30,
    max_prop_rounds: int = 200,
) -> DataFrame:
    """Exact strongly connected components of a directed graph via the
    distributed coloring algorithm (Orzan 2004; Slota/Rajamanickam/
    Madduri IPDPS'14 adds the trim step) — the condensation pass a web/
    link graph needs before centrality (crawler traps and link farms ARE
    the big SCCs), and the cycle detector for ownership/control chains
    in an ER relationship graph.

    Rounds, all on DataFrame set algebra:

    1. **Trim** (to fixed point): a node with no in-edges or no
       out-edges in the live subgraph is its own SCC — strip, repeat.
       DAG-shaped regions drain here in O(longest chain) cheap rounds,
       leaving only cycle-carrying cores for the expensive steps.
    2. **Color** (forward max propagation to fixed point):
       ``color(v) = max id u with a path u ->* v``.  One join +
       partial-agg max per round; rounds = live-subgraph diameter.
    3. **Extract**: for each root (``color(r) == r``), the SCC of r is
       exactly the color-r nodes that reach r along color-r edges
       (backward mark to fixed point).  Proof the label is canonical:
       marked v has ``r ->* v`` (coloring) and ``v ->* r`` (marking), so
       v and r are mutually reachable; conversely every SCC member of r
       shares its color and reaches r, so the extracted set IS the SCC —
       and since all members reach each other, the max propagated onto
       them is >= the SCC max, hence ``scc_id = r = max member id``.
    4. Remove extracted nodes/edges, repeat from trim.

    Every fixed-point loop truncates lineage per round (localCheckpoint,
    the resolver/components.py discipline) and converges by an
    ``isEmpty`` delta check — rounds after convergence never run.  The
    bounds are loud contracts: exceeding ``max_outer``/``max_prop_rounds``
    raises rather than returning a silently-partial labeling.

    Deterministic and engine-exact (max ids + set reachability, no
    floats, no tie rules), so a DuckDB recursive-CTE closure replays it:
    ``scc_id(v) = max({v} ∪ {u : v ->* u AND u ->* v})``.

    100 TB shape: the full edge relation is shuffled once per round at
    worst, always by equi-join on a node key (AQE-skew-splittable); the
    frames carried between rounds are node-sized.  Each extraction
    removes its SCCs for good, so live-subgraph size is monotone
    decreasing; on condensation-shallow graphs (web graphs: one giant
    SCC + DAG fringe) the outer loop runs 2-3 times.

    Returns ``(node, scc_id)`` covering every node incident to an edge.
    """
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .where(F.col("a").isNotNull() & F.col("b").isNotNull())
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    live_nodes = (
        e.select(F.col("a").alias("node"))
        .union(e.select(F.col("b").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    spark = edges.sparkSession
    schema = "node " + dict(live_nodes.dtypes)["node"] + ", scc_id " + dict(
        live_nodes.dtypes
    )["node"]
    # extracted-SCC frames accumulate lazily: every input below is
    # localCheckpointed before it lands here, so the final union is a
    # wide-but-shallow plan over materialized blocks — no per-round
    # re-checkpoint of the whole assigned relation (halves the trim
    # loop's driver actions)
    assigned_frames: list[DataFrame] = []
    live_edges = e
    for _ in range(max_outer):
        if live_nodes.isEmpty():
            break
        # 1. trim to fixed point
        for _ in range(max_prop_rounds):
            has_in = live_edges.select(F.col("b").alias("node")).distinct()
            has_out = live_edges.select(F.col("a").alias("node")).distinct()
            trivial = (
                live_nodes.join(has_in, "node", "left_anti")
                .union(live_nodes.join(has_out, "node", "left_anti"))
                .distinct()
                .localCheckpoint(eager=True)
            )
            if trivial.isEmpty():
                break
            assigned_frames.append(
                trivial.select("node", F.col("node").alias("scc_id"))
            )
            live_nodes = live_nodes.join(
                trivial, "node", "left_anti"
            ).localCheckpoint(eager=True)
            live_edges = (
                live_edges.join(
                    live_nodes.select(F.col("node").alias("a")),
                    "a",
                    "left_semi",
                )
                .join(
                    live_nodes.select(F.col("node").alias("b")),
                    "b",
                    "left_semi",
                )
                .select("a", "b")
                .localCheckpoint(eager=True)
            )
        else:
            raise ValueError(
                f"scc: trim did not converge in {max_prop_rounds} rounds"
            )
        if live_nodes.isEmpty():
            break
        # 2. forward max-color propagation to fixed point
        color = live_nodes.select(
            "node", F.col("node").alias("color")
        ).localCheckpoint(eager=True)
        for _ in range(max_prop_rounds):
            inflow = (
                live_edges.join(
                    color.select(
                        F.col("node").alias("a"), F.col("color").alias("ca")
                    ),
                    "a",
                )
                .groupBy(F.col("b").alias("node"))
                .agg(F.max("ca").alias("cin"))
            )
            new_color = (
                color.join(inflow, "node", "left")
                .select(
                    "node",
                    F.greatest(
                        "color", F.coalesce("cin", "color")
                    ).alias("color"),
                )
                .localCheckpoint(eager=True)
            )
            delta = (
                new_color.withColumnRenamed("color", "nc")
                .join(color, "node")
                .where(F.col("nc") != F.col("color"))
            )
            converged = delta.isEmpty()
            color = new_color
            if converged:
                break
        else:
            raise ValueError(
                f"scc: coloring did not converge in {max_prop_rounds} "
                "rounds (graph diameter exceeds the bound; raise "
                "max_prop_rounds)"
            )
        # 3. backward mark from roots along same-color edges
        same_color_edges = (
            live_edges.join(
                color.select(
                    F.col("node").alias("a"), F.col("color").alias("ca")
                ),
                "a",
            )
            .join(
                color.select(
                    F.col("node").alias("b"), F.col("color").alias("cb")
                ),
                "b",
            )
            .where(F.col("ca") == F.col("cb"))
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
        mark = color.where(F.col("color") == F.col("node")).select(
            "node"
        ).localCheckpoint(eager=True)
        for _ in range(max_prop_rounds):
            grown = (
                same_color_edges.join(
                    mark.select(F.col("node").alias("b")), "b", "left_semi"
                )
                .select(F.col("a").alias("node"))
                .union(mark)
                .distinct()
                .localCheckpoint(eager=True)
            )
            done = grown.join(mark, "node", "left_anti").isEmpty()
            mark = grown
            if done:
                break
        else:
            raise ValueError(
                f"scc: marking did not converge in {max_prop_rounds} rounds"
            )
        assigned_frames.append(
            mark.join(color, "node").select(
                "node", F.col("color").alias("scc_id")
            )
        )
        live_nodes = live_nodes.join(mark, "node", "left_anti").localCheckpoint(
            eager=True
        )
        live_edges = (
            live_edges.join(
                live_nodes.select(F.col("node").alias("a")), "a", "left_semi"
            )
            .join(
                live_nodes.select(F.col("node").alias("b")), "b", "left_semi"
            )
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
    else:
        raise ValueError(
            f"scc: {max_outer} extraction rounds did not exhaust the "
            "graph; raise max_outer"
        )
    assigned = spark.createDataFrame([], schema)
    for fr in assigned_frames:
        assigned = assigned.union(fr)
    return assigned


def condense_graph(
    edges: DataFrame,
    scc: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Condensation of a directed graph: contract every SCC (from
    ``strongly_connected_components``) to one node and keep the distinct
    inter-SCC edges.  The result is a DAG by construction (an edge
    between two SCCs in both directions would have merged them), which
    is the point: downstream passes that need acyclicity — topological
    scheduling, longest-path dedup lineage, loop-free reachability —
    run on the condensation, which for web-shaped graphs is orders of
    magnitude smaller than the raw edge relation.

    Plan shape: two equi-joins of the edge relation against the
    node-sized SCC mapping (broadcast when it fits) + one distinct —
    nothing exceeds the edge relation's own grain.
    """
    m_src = scc.select(F.col("node").alias(src), F.col("scc_id").alias("_sa"))
    m_dst = scc.select(F.col("node").alias(dst), F.col("scc_id").alias("_sb"))
    return (
        edges.select(src, dst)
        .join(m_src, src)
        .join(m_dst, dst)
        .where(F.col("_sa") != F.col("_sb"))
        .select(F.col("_sa").alias("scc_src"), F.col("_sb").alias("scc_dst"))
        .distinct()
    )


def bfs_distances(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    seed_col: str = "seed",
    max_rounds: int = 30,
) -> DataFrame:
    """Exact multi-source BFS hop distances: for every seed (landmark)
    node, the minimum number of directed edges to every node it reaches.
    This is the shortest-path tier the graph suite was missing —
    landmark distances are the standard scalable stand-in for closeness/
    betweenness centrality (pick k landmarks, embed every node by its
    distance vector), the crawl-frontier "hops from the seed list"
    column in web-corpus curation (CommonCrawl records hop depth per
    page), and the ER investigator's "how far is this entity from a
    sanctioned seed" query over the relationship graph (the reference
    walks the same adjacency one hop at a time in its store views —
    SURVEY §2.4 J6; this is the all-hops closure of that walk).

    Frontier algorithm, level-synchronous and exact:

    - round 0 seeds the visited relation with ``(seed, seed, 0)``;
    - round r joins the frontier against the edge relation
      (``frontier.node = edges.src``), dedups the (seed, dst) pairs
      (map-side partial agg), anti-joins the visited set — BFS
      guarantees the first round that reaches a node holds its minimum
      distance, so a visited (seed, node) never needs revisiting;
    - convergence is an ``isEmpty`` delta check: an empty frontier means
      every reachable (seed, node) pair is labeled, and rounds after
      convergence never run.  Exceeding ``max_rounds`` raises — a
      silently-truncated distance table would corrupt every downstream
      consumer.

    Deterministic and engine-exact (set algebra + integer rounds, no tie
    rules), so a DuckDB recursive CTE replays it: enumerate paths with
    ``dist < max_rounds`` and take ``MIN(dist)`` per (seed, node) — the
    depth bound makes the recursion terminate on cyclic graphs, and it
    is safe because this operator PROVED convergence below the same
    bound.

    100 TB shape: the edge relation is hash-partitioned on ``src`` once
    and localCheckpointed; every round reuses that layout for the
    frontier join (frontier arrives node-keyed from the previous round's
    distinct).  Frames carried between rounds are (seed x node)-sized,
    never edge-sized; lineage is truncated per round (the
    resolver/components.py discipline).  Rounds = graph diameter from
    the seed set — single digits on web/social graphs.

    Returns ``(seed, node, dist)`` for every reachable pair, including
    the seed itself at distance 0.
    """
    e = (
        edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
        .where(F.col("_s").isNotNull() & F.col("_d").isNotNull())
        .distinct()
        .repartition("_s")
        .localCheckpoint(eager=True)
    )
    frontier = (
        seeds.select(F.col(seed_col).alias("seed"))
        .distinct()
        .select("seed", F.col("seed").alias("node"), F.lit(0).alias("dist"))
        .localCheckpoint(eager=True)
    )
    # levels accumulate LAZILY: every frame below is localCheckpointed
    # before it lands here, so the running union is a wide-but-shallow
    # plan over materialized blocks — re-checkpointing the whole visited
    # relation per round would copy O(rounds x visited) (the SCC
    # extractor's lesson)
    frames: list[DataFrame] = [frontier]
    for r in range(1, max_rounds + 1):
        visited = frames[0]
        for fr in frames[1:]:
            visited = visited.unionByName(fr)
        nxt = (
            frontier.join(e, frontier["node"] == e["_s"])
            .select("seed", F.col("_d").alias("node"))
            .distinct()
            .join(visited.select("seed", "node"), ["seed", "node"], "left_anti")
            .select("seed", "node", F.lit(r).alias("dist"))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            return visited
        frames.append(nxt)
        frontier = nxt
    raise ValueError(
        f"bfs_distances: frontier still non-empty after {max_rounds} "
        "rounds — raise max_rounds (and the oracle's depth bound with it)"
    )


def link_prediction(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    min_common: int = 2,
    max_center_degree: int | None = None,
) -> DataFrame:
    """Common-neighbor link prediction over an undirected graph: for
    every NON-adjacent pair (a, b) sharing at least ``min_common``
    neighbors, the number of common neighbors and the neighborhood
    Jaccard ``cn / (deg_a + deg_b - cn)``.  This is the classic
    missing-link scorer (Liben-Nowell & Kleinberg CIKM'03) and the ER
    tier's structural candidate generator: two entities sharing many
    relationship partners but no direct edge are exactly the pairs the
    reference's xref surfaces from shared tokens (SURVEY §2.4 J1) —
    this scores the same signal from graph structure instead of text.

    Plan, all equi-joins and partial aggs:

    1. canonicalize to distinct undirected edges, symmetrize, compute
       degrees (one partial-agg pass);
    2. enumerate wedges a—w—b (a < b) by self-joining the adjacency on
       the center w; count per (a, b) — each common neighbor yields
       exactly one wedge at its own center, so the count IS the common
       neighborhood size;
    3. anti-join the existing edge set (predict only missing links),
       join degrees, score.

    Jaccard is emitted rounded to 4dp (house determinism rule:
    round-before-compare so float division noise cannot flip a
    hash/rank across engines); the count and degrees stay exact BIGINT.

    100 TB shape: wedge enumeration costs sum(deg(w)^2) — inherent to
    exact common-neighbor counting (same frontier as the triangle
    count's wedge step).  The self-join is an equi-join on w
    (AQE-skew-splittable), and ``max_center_degree`` is the standard
    hub cap for web-scale graphs: centers above the cap (celebrity
    nodes whose co-followership says nothing) are excluded from wedge
    generation BEFORE the join, bounding the quadratic term; the cap is
    part of the operator's declared semantics, applied identically in
    any replay.  The wedge relation is the only super-linear frame; the
    grouped (a, b) counts are output-sized.

    Returns ``(a, b, common, deg_a, deg_b, jaccard)`` with a < b.
    """
    und = _canonical_undirected(edges, src, dst)
    adj = _symmetrize(und)
    deg = adj.groupBy(F.col("d").alias("node")).agg(
        F.count(F.lit(1)).alias("degree")
    )
    centers = adj.select(F.col("s").alias("w"), F.col("d").alias("n"))
    if max_center_degree is not None:
        ok = deg.where(F.col("degree") <= max_center_degree).select(
            F.col("node").alias("w")
        )
        centers = centers.join(ok, "w", "left_semi")
    wedges = (
        centers.alias("x")
        .join(centers.alias("y"), "w")
        .where(F.col("x.n") < F.col("y.n"))
        .select(F.col("x.n").alias("a"), F.col("y.n").alias("b"))
    )
    counts = wedges.groupBy("a", "b").agg(F.count(F.lit(1)).alias("common"))
    missing = counts.join(und, ["a", "b"], "left_anti").where(
        F.col("common") >= min_common
    )
    da = deg.select(F.col("node").alias("a"), F.col("degree").alias("deg_a"))
    db = deg.select(F.col("node").alias("b"), F.col("degree").alias("deg_b"))
    return (
        missing.join(da, "a")
        .join(db, "b")
        .select(
            "a",
            "b",
            "common",
            "deg_a",
            "deg_b",
            F.round(
                F.col("common")
                / (F.col("deg_a") + F.col("deg_b") - F.col("common")),
                4,
            ).alias("jaccard"),
        )
    )


def dag_layers(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 30,
) -> DataFrame:
    """Longest-path layering of a DAG: ``layer(v) = 0`` for sources (no
    in-edges) and ``layer(v) = 1 + max(layer(u) for u -> v)`` otherwise
    — the topological level assignment that turns the SCC condensation
    (``condense_graph``) into an executable schedule: everything in
    layer L depends only on layers < L, so a dependency-ordered rebuild
    (dataset refresh DAGs, dedup-lineage replay, ownership-chain depth)
    runs the layers in sequence and each layer in parallel.

    Exact fixed-point relaxation on integers: start every node at 0;
    each round recomputes ``1 + max`` over in-neighbors (one equi-join
    + partial-agg max) and keeps the elementwise maximum.  On a DAG the
    longest path into any node has at most ``depth`` edges, so values
    stabilize in ``depth`` rounds; the delta check (any node whose
    layer still grew) is the convergence proof.  A CYCLE keeps growing
    forever — exceeding ``max_rounds`` therefore raises, which doubles
    as the not-actually-a-DAG detector (run
    ``strongly_connected_components`` + ``condense_graph`` first).

    Deterministic and engine-exact (max + integers, no tie rules): a
    DuckDB recursive CTE replays it as MAX(path length) per node over
    depth-bounded path enumeration.

    100 TB shape: the edge relation is hash-partitioned on ``dst`` once
    and localCheckpointed; each round is one equi-join against the
    node-sized layer frame + a partial-agg max, lineage truncated per
    round.  Rounds = condensation depth — small for web-shaped graphs
    whose condensation is shallow.

    Returns ``(node, layer)`` for every node incident to an edge.
    """
    e = (
        edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
        .where(F.col("_s").isNotNull() & F.col("_d").isNotNull())
        .distinct()
        .repartition("_d")
        .localCheckpoint(eager=True)
    )
    layer = (
        e.select(F.col("_s").alias("node"))
        .union(e.select(F.col("_d").alias("node")))
        .distinct()
        .select("node", F.lit(0).cast("int").alias("layer"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_rounds):
        cand = (
            layer.join(e, layer["node"] == e["_s"])
            .groupBy(F.col("_d").alias("node"))
            .agg((F.max("layer") + F.lit(1)).alias("_cand"))
        )
        nxt = (
            layer.join(cand, "node", "left")
            .select(
                "node",
                F.greatest(F.col("layer"), F.coalesce("_cand", "layer"))
                .cast("int")
                .alias("layer"),
                (F.coalesce("_cand", F.lit(0)) > F.col("layer")).alias(
                    "_grew"
                ),
            )
            .localCheckpoint(eager=True)
        )
        if nxt.where(F.col("_grew")).isEmpty():
            return nxt.select("node", "layer")
        layer = nxt.select("node", "layer")
    raise ValueError(
        f"dag_layers: layers still growing after {max_rounds} rounds — "
        "the graph has a cycle (condense SCCs first) or needs a larger "
        "max_rounds"
    )


def harmonic_centrality(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    seed_col: str = "seed",
    max_rounds: int = 30,
) -> DataFrame:
    """Harmonic centrality of the seed (landmark) nodes:
    ``H(s) = sum over reachable v != s of 1/dist(s, v)`` — the
    closeness variant that stays defined on disconnected graphs
    (Boldi & Vigna 2014), computed exactly from ``bfs_distances``.
    PageRank ranks by INCOMING endorsement; harmonic centrality ranks
    by OUTGOING reach — the "how quickly can this entity touch the
    rest of the graph" column an investigator sorts by, and the
    landmark-quality score a navigation/routing layer uses to pick its
    pivots.

    Determinism: ``1/dist`` is a repeating decimal and a float sum of
    them is partition-order-dependent, so the sum runs on the exact
    integer grid (house device): each term is ``10^12 DIV dist``,
    summed in DECIMAL(38,0) (exact, associative, no overflow below
    10^26 reachable nodes), divided back only at the emitting edge
    (6dp).  Truncation error is <= reachable x 1e-12 — far below the
    emitted precision — and any engine replays it bit-identically.

    Cost: exactly ``bfs_distances`` (the BFS dominates; this adds one
    partial-agg per seed).  Returns ``(seed, n_reached, harmonic)``
    including seeds that reach nothing (0, 0.0).
    """
    d = bfs_distances(
        edges, seeds, src=src, dst=dst, seed_col=seed_col,
        max_rounds=max_rounds,
    )
    agg = (
        d.where(F.col("dist") > 0)
        .groupBy("seed")
        .agg(
            F.count(F.lit(1)).alias("n_reached"),
            F.sum(
                F.expr("CAST(1000000000000 DIV dist AS DECIMAL(38,0))")
            ).alias("_hq"),
        )
    )
    return (
        d.select("seed")
        .distinct()
        .join(agg, "seed", "left")
        .select(
            "seed",
            F.coalesce("n_reached", F.lit(0)).cast("bigint").alias(
                "n_reached"
            ),
            F.round(
                F.coalesce(F.col("_hq").cast("double"), F.lit(0.0))
                / F.lit(1e12),
                6,
            ).alias("harmonic"),
        )
    )


def neighbor_mean_features(
    edges: DataFrame,
    features: DataFrame,
    n_rounds: int = 2,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
    value_col: str = "value",
    checkpoint: bool = True,
) -> DataFrame:
    """GNN-style feature smoothing on an exact integer grid: per round,
    every node's feature becomes the integer mean of itself and its
    in-neighbors, ``h' = (h + sum_in h_u) DIV (1 + indeg)`` — the
    label/feature-propagation prior a graph-feature pipeline attaches
    to training rows (one round = a mean-aggregator GNN layer without
    weights; LightGCN-style smoothing, He et al. SIGIR'20).

    Exactness: features are caller-quantized BIGINTs (the house rule —
    cents, micro-units), sums and the truncating integer division stay
    on that grid, so any engine replays every round bit-identically
    (DuckDB's ``//`` and Spark's ``DIV`` both truncate toward zero,
    verified on negatives).  Nodes without in-edges keep their value
    (the mean of {self}); neighbors missing from ``features`` simply
    don't appear in the edge join (and their absence is visible in the
    denominator, which counts joined neighbors only).

    Scale contract, executable: ONE up-front driver action (the two
    1-row aggregates ride a single crossJoin job) computes
    ``max(abs(value))`` and the maximum in-degree and raises a loud
    ValueError when ``max_abs * (max_indeg + 1)`` cannot fit int64 —
    the per-node numerator bound — instead of letting a hub node wrap
    silently (the ``pagerank`` overflow-contract shape).  One check
    covers every round: the truncating mean of values within
    ``[-max_abs, max_abs]`` stays within it, so ``max_abs`` never
    grows.  Per round: one src-keyed equi-join + partial-agg sum and
    one node-keyed left join; lineage is truncated per round.
    """
    if n_rounds < 1:
        raise ValueError("neighbor_mean_features: n_rounds must be >= 1")
    h = features.select(
        F.col(node_col).alias("node"),
        F.col(value_col).cast("bigint").alias("v"),
    )
    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
    (stats,) = (
        h.agg(F.max(F.abs(F.col("v"))).alias("m"))
        .crossJoin(e.groupBy("_d").count().agg(F.max("count").alias("d")))
        .collect()
    )
    max_abs = int(stats["m"] or 0)
    max_deg = int(stats["d"] or 0)
    if max_abs and max_abs > (2**63 - 1) // (max_deg + 1):
        raise ValueError(
            f"neighbor_mean_features: max |value| {max_abs} times the "
            f"maximum in-degree + 1 ({max_deg + 1}) overflows int64 — "
            f"rescale the feature grid (fewer decimal places) or cap "
            f"hub degrees upstream"
        )
    for _ in range(n_rounds):
        agg = (
            e.join(h, e["_s"] == h["node"])
            .groupBy("_d")
            .agg(F.sum("v").alias("_sum"), F.count(F.lit(1)).alias("_c"))
        )
        h = (
            h.join(agg, h["node"] == agg["_d"], "left")
            .select(
                "node",
                F.when(F.col("_sum").isNull(), F.col("v"))
                .otherwise(
                    F.expr("(v + _sum) DIV (1 + _c)").cast("bigint")
                )
                .alias("v"),
            )
        )
        if checkpoint:
            h = h.localCheckpoint(eager=True)
    return h.select("node", F.col("v").alias("feat"))
