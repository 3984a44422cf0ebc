"""N-gram (shingle) Jaccard near-duplicate detection.

Exact variant: explode distinct character shingles, self-join on shingle
(the same bounded-token-join pattern as the ER blocker — SURVEY.md §2.4
J1), count shared shingles per pair, Jaccard = |∩| / (|A|+|B|-|∩|).

Scale notes: the ``max_df`` cap plays the role of the blocker's dynamic
stopwords — shingles shared by more than ``max_df`` documents generate
quadratic join output and carry no near-dup signal, so they are dropped
before the join. For 100 TB use the MinHash/LSH variant
(``dedup.minhash``) which replaces the exact intersection with banded
signatures; this exact version is its small-scale oracle.

Plan shape (deliberate):
- The normalization (regex strip + split) is materialized in a projection
  *before* the shingle ``transform`` — Catalyst does not CSE an expression
  that is referenced inside a lambda body, so inlining it re-evaluates the
  regex once per array element (O(words²) per document). Binding it to a
  column first makes it once-per-row.
- Shingle-set sizes ride through the explode as a carried column, so the
  Jaccard denominator needs no join back against a sizes relation — at
  scale that removes two joins against a |docs|-sized table.
- Shingle document frequency is ``groupBy("shingle").count()`` joined back
  against the (checkpointed) exploded relation — NOT a window over
  ``partitionBy("shingle")``.  A window puts ALL rows of a partition key
  into one task after its exchange, and AQE skew-splitting applies to
  joins, not windows: at 100x a Zipf-hot word-trigram ("of the and"-class)
  would serialize 10^8+ rows into a single straggler/OOM task.  The
  groupBy has map-side partial aggregation (skew-immune: hot keys are
  pre-combined per input partition down to one row each) and the join back
  is AQE-skew-splittable.  The exploded relation is localCheckpointed
  BEFORE the frequency stage, so the two consumers (the aggregate and the
  join probe side) read materialized blocks instead of re-evaluating the
  shingle-generation expression.
- The explode is ``explode_outer`` + a null filter on the *exploded*
  column: plain ``explode`` triggers InferFiltersFromGenerate, which adds
  a ``size(shingles) > 0`` pre-filter that predicate-pushdown inlines into
  the scan — duplicating the whole shingle expression (with the
  normalization re-evaluated per array element inside the lambda).
  Measured 10x slower at sf0.1.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def widen_small_scan(df: DataFrame) -> DataFrame:
    """Repartition up to the session's default parallelism when the input
    has fewer partitions — a small-file scan feeding a CPU-heavy projection
    otherwise runs on one core. At scale this is a no-op: a 100 TB scan
    already has orders of magnitude more splits than cores."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def normalize_for_shingles(col: Column) -> Column:
    return F.trim(F.regexp_replace(F.lower(col), r"[^a-z0-9]+", " "))


def _char_shingles_from_norm(norm: Column, k: int) -> Column:
    """Distinct char k-shingles from an already-materialized normalized
    string column (must be a plain column reference, not an expression —
    see module docstring)."""
    n = F.length(norm) - F.lit(k - 1)
    # sequence(1, n) would run *descending* for n < 1 — guard with an
    # empty array for strings shorter than k.
    positions = F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(
        F.array().cast("array<int>")
    )
    return F.array_distinct(
        F.transform(positions, lambda i: F.substr(norm, i, F.lit(k)))
    )


def _word_shingles_from_words(ws: Column, k: int) -> Column:
    """Distinct word k-gram shingles (space-joined) from an
    already-materialized word-array column."""
    n = F.size(ws) - F.lit(k - 1)
    positions = F.when(n >= 1, F.sequence(F.lit(0), n - 1)).otherwise(
        F.array().cast("array<int>")
    )
    return F.array_distinct(
        F.transform(
            positions,
            lambda i: F.array_join(F.slice(ws, i + 1, k), " "),
        )
    )


def char_shingles(col: Column, k: int = 5) -> Column:
    """Distinct character k-shingles of a normalized string, as an array —
    pure column expressions (sequence + transform), no UDF.

    NOTE: single-expression convenience form; inside a DataFrame plan
    prefer ``shingle_arrays`` which materializes the normalization first.
    """
    return _char_shingles_from_norm(normalize_for_shingles(col), k)


def word_shingles(col: Column, k: int = 3) -> Column:
    """Distinct word k-gram shingles (space-joined) of a normalized string.
    For natural-language near-dup detection word shingles are far sparser
    than character shingles, keeping the shingle self-join bounded."""
    ws = F.filter(F.split(normalize_for_shingles(col), " "), lambda w: w != "")
    return _word_shingles_from_words(ws, k)


def shingle_arrays(
    df: DataFrame, id_col: str, text_col: str, k: int = 5, mode: str = "char"
) -> DataFrame:
    """(id, shingles array<string>) with the normalization materialized in
    its own projection so the per-element lambda reads a bound column."""
    if mode == "char":
        prep = df.select(
            F.col(id_col).alias("id"),
            normalize_for_shingles(F.col(text_col)).alias("_prep"),
        )
        gen = _char_shingles_from_norm(F.col("_prep"), k)
    else:
        prep = df.select(
            F.col(id_col).alias("id"),
            F.filter(
                F.split(normalize_for_shingles(F.col(text_col)), " "),
                lambda w: w != "",
            ).alias("_prep"),
        )
        gen = _word_shingles_from_words(F.col("_prep"), k)
    return prep.select("id", gen.alias("shingles"))


def shingle_rows(
    df: DataFrame, id_col: str, text_col: str, k: int = 5, mode: str = "char"
) -> DataFrame:
    return (
        shingle_arrays(widen_small_scan(df), id_col, text_col, k, mode)
        .select("id", F.explode_outer("shingles").alias("shingle"))
        .where(F.col("shingle").isNotNull())
    )


def _df_capped(sh: DataFrame, max_df: int) -> DataFrame:
    """Drop rows whose shingle's document frequency exceeds ``max_df``.

    Shape: ``groupBy("shingle").count()`` (map-side partial aggregation —
    a Zipf-hot shingle is pre-combined to one row per input partition
    before the exchange) then an equi-join back with the cap predicate
    (AQE splits any remaining hot probe partitions).  Exposed as a helper
    so tests can plan-assert the partial-aggregate shape on the
    pre-checkpoint lineage.
    """
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
    return (
        sh.join(dfreq.where(F.col("_df") <= max_df), "shingle")
        .drop("_df")
    )


def _with_df_rank(sh: DataFrame) -> DataFrame:
    """Attach shingle document frequency (``sdf``) and the per-document
    rarest-first rank (``rk``) to an exploded (id, n, shingle) relation.

    Document frequency is ``groupBy("shingle").count()`` joined back —
    partial-aggregated map-side, join back AQE-skew-splittable — NOT a
    ``Window.partitionBy("shingle")`` count, which would serialize every
    row of a Zipf-hot shingle into one task (see module docstring).  The
    rank window partitions by ``id``, which is explode-bounded per key
    (one document's shingle count), not corpus-skewed.
    """
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("sdf"))
    rk = F.row_number().over(
        Window.partitionBy("id").orderBy("sdf", "shingle")
    )
    return sh.join(dfreq, "shingle").withColumn("rk", rk)


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    threshold: float = 0.5,
    max_df: int = 100,
    mode: str = "char",
) -> DataFrame:
    """Near-duplicate pairs (lid, rid, jaccard) with jaccard ≥ threshold.

    lid < rid dedups the triangle; shingles with document frequency >
    ``max_df`` are dropped (stopword cap) before the self-join.

    NOTE: sizes are computed *before* the max_df cap (from the distinct
    shingle array itself), so jaccard remains the true shingle-set
    jaccard; the cap only limits which pairs can be discovered (a pair
    must share at least one sub-cap shingle).
    """
    arrays = shingle_arrays(widen_small_scan(df), id_col, text_col, k, mode)
    sh = arrays.select(
        "id",
        F.size("shingles").alias("n_shingles"),
        F.explode_outer("shingles").alias("shingle"),
    ).where(F.col("shingle").isNotNull())
    # Materialize the exploded relation BEFORE the frequency stage: the
    # aggregate and the join probe side below both consume it, and a
    # checkpoint makes that one evaluation of the shingle-generation
    # expression instead of two.  localCheckpoint rather than persist:
    # the blocks are released when the returned plan is garbage-collected
    # (persist had no unpersist hook once the plan escaped, pinning one
    # shingle relation per corpus for the session), and a checkpointed
    # relation cannot be silently evicted into a recompute.
    sh = sh.localCheckpoint(eager=True)
    # Document-frequency cap: shingles are distinct per doc, so a row
    # count per shingle == document frequency.  groupBy + join back, not
    # a shingle-partitioned window — see module docstring (Zipf-hot
    # shingles must hit map-side partial aggregation, and the join back
    # is AQE-skew-splittable).
    sh = _df_capped(sh, max_df)
    # Self-joined below — two consumers again, same materialize rationale.
    sh = sh.localCheckpoint(eager=True)

    l = sh.select(
        F.col("id").alias("lid"), F.col("n_shingles").alias("l_n"), "shingle"
    )
    r = sh.select(
        F.col("id").alias("rid"), F.col("n_shingles").alias("r_n"), "shingle"
    )
    inter = (
        l.join(r, "shingle")
        .where(F.col("lid") < F.col("rid"))
        .groupBy("lid", "rid", "l_n", "r_n")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return inter.select(
        "lid",
        "rid",
        (
            F.col("n_common") / (F.col("l_n") + F.col("r_n") - F.col("n_common"))
        ).alias("jaccard"),
    ).where(F.col("jaccard") >= threshold)


def ngram_containment_pairs(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    bench_id_col: str | None = None,
    bench_text_col: str | None = None,
    k: int = 5,
    threshold: float = 0.5,
    mode: str = "word",
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents that *contain* a
    benchmark item's n-grams (GPT-3 appendix C / Dolma-style overlap
    filtering: containment = |shingles(doc) ∩ shingles(bench)| /
    |shingles(bench)|, directional toward the benchmark).

    Scale shape: the benchmark set is orders of magnitude smaller than the
    corpus, so its exploded shingle relation is **broadcast** — the corpus
    side never shuffles; the whole check is one broadcast hash join + a
    partial aggregation per (doc, bench_item). Returns
    (doc_id, bench_id, containment) with containment >= threshold,
    self-pairs excluded.
    """
    bench_id_col = bench_id_col or id_col
    bench_text_col = bench_text_col or text_col
    d = shingle_rows(docs, id_col, text_col, k, mode).withColumnRenamed(
        "id", "doc_id"
    )
    b = (
        shingle_arrays(bench, bench_id_col, bench_text_col, k, mode)
        .select(
            F.col("id").alias("bench_id"),
            F.size("shingles").alias("n_bench"),
            F.explode_outer("shingles").alias("shingle"),
        )
        .where(F.col("shingle").isNotNull())
    )
    hits = (
        d.join(F.broadcast(b), "shingle")
        .where(F.col("doc_id") != F.col("bench_id"))
        .groupBy("doc_id", "bench_id", "n_bench")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return hits.select(
        "doc_id",
        "bench_id",
        (F.col("n_common") / F.col("n_bench")).alias("containment"),
    ).where(F.col("containment") >= threshold)


def containment_join(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    mode: str = "word",
    threshold: float = 0.6,
) -> DataFrame:
    """Corpus-self ASYMMETRIC containment join via prefix filtering
    (SSJoin/PPJoin family — Chaudhuri et al. ICDE'06, Xiao et al.
    WWW'08): all (contained_id, container_id, containment) pairs with
    ``containment = |S_c ∩ S_o| / |S_c| >= threshold``, S = distinct
    shingle set.

    The dedup gap this closes: a document fully quoted inside one 4x
    larger has Jaccard <= 0.25 — symmetric near-dup passes (n-gram
    Jaccard, MinHash/LSH bands, SimHash) structurally miss it, because
    band collision probability decays as jaccard^band_size.  Asymmetric
    containment is the right measure for quote inclusion, boilerplate
    wrapping and partial mirrors, and prefix filtering is its EXACT
    candidate generator: order each document's shingles by global
    document frequency (rarest first, ties by shingle); a pair with
    containment >= t over S_c must share at least ceil(t*|S_c|)
    shingles, so it must share one of S_c's first
    ``|S_c| - ceil(t*|S_c|) + 1`` rarest shingles — join ONLY that
    prefix against the full shingle relation and no qualifying pair can
    be missed (no LSH recall loss, no all-pairs join).

    Candidate pruning uses the full overlap-prefix lemma, both sides:
    a pair with overlap >= O (here O = ceil(t*|S_c|)) must share its
    globally-SMALLEST common shingle x, and x ranks <= |S|-O+1 in BOTH
    documents' frequency orderings — so the join keeps a (prefix_c,
    shingle_o) match only when the shingle's rank in the container
    satisfies ``o_n - o_rk + 1 >= O`` (positional filter) and
    ``o_n >= O`` (size filter).  Hot vocabulary shingles rank LAST in
    every document, so the quadratic common-shingle collisions the
    one-sided prefix join would emit are pruned at the join itself —
    measured 1.5x fewer distinct candidates and 2x lower wall on the
    synthetic corpus — while completeness is untouched (the pruned
    pairs cannot reach the threshold, which is also why the DuckDB
    oracle can state the simpler one-sided form and still hash-match).

    Scale shape: shingle document frequency is a map-side-partial
    ``groupBy("shingle").count()`` equi-joined back onto the
    checkpointed exploded relation (skew-immune; a shingle-partitioned
    window would single-task Zipf-hot shingles — see module docstring),
    one window rank per document (partitioned by ``id``, bounded per
    key; materialized once, reused by the prefix, candidate and verify
    sides), one prefix-to-full equi-join on shingle with the positional
    filter applied join-side, then the exact verify joins the shingle
    relation through the candidate set only.  The reference has no
    containment operator; nearest surface is its xref candidate
    bounding (SURVEY.md §2.4 J1).
    """
    arrays = shingle_arrays(widen_small_scan(df), id_col, text_col, k, mode)
    sh = (
        arrays.select(
            "id",
            F.size("shingles").alias("n"),
            F.explode_outer("shingles").alias("shingle"),
        )
        .where(F.col("shingle").isNotNull())
    )
    # Checkpoint the exploded relation FIRST (shingle generation runs
    # once; the frequency aggregate and its join probe side both read
    # materialized blocks), then attach document frequency + rank via
    # _with_df_rank — groupBy+join, not a shingle-partitioned window
    # (see module docstring / helper docstring for the skew argument).
    sh = sh.localCheckpoint(eager=True)
    # read three times below (prefix + candidate full side + verify):
    # checkpoint so the shingle+frequency+rank relation is computed
    # once, and blocks release with the returned plan
    sh = _with_df_rank(sh).localCheckpoint(eager=True)
    req = F.ceil(F.lit(threshold) * F.col("n"))  # O = ceil(t*|S_c|)
    prefix = sh.where(F.col("rk") <= F.col("n") - req + 1).select(
        F.col("id").alias("cid"),
        req.alias("c_req"),
        "shingle",
    )
    full = sh.select(
        F.col("id").alias("oid"),
        F.col("n").alias("o_n"),
        F.col("rk").alias("o_rk"),
        "shingle",
    )
    cand = (
        prefix.join(full, "shingle")
        .where(
            (F.col("cid") != F.col("oid"))
            # positional + size filter: the smallest common shingle of a
            # qualifying pair ranks early in the container too
            & (F.col("o_n") - F.col("o_rk") + 1 >= F.col("c_req"))
        )
        .select("cid", "oid")
        .distinct()
    )
    l = sh.select(
        F.col("id").alias("cid"), F.col("n").alias("c_n"), "shingle"
    )
    r = sh.select(F.col("id").alias("oid"), "shingle")
    inter = (
        cand.join(l, "cid")
        .join(r, ["oid", "shingle"])
        .groupBy("cid", "oid", "c_n")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return inter.select(
        F.col("cid").alias("contained_id"),
        F.col("oid").alias("container_id"),
        (F.col("n_common") / F.col("c_n")).alias("containment"),
    ).where(F.col("containment") >= threshold)
