"""Dedup-tier semantics tests: MinHash estimate quality, SimHash banding
completeness vs brute force, exact dedup."""

from __future__ import annotations

from pyspark.sql import functions as F

from nomenklatura_spark.session import load_table


def test_minhash_agrees_with_exact_jaccard(spark, sf_dir):
    """MinHash-estimated jaccard must correlate with the exact n-gram
    jaccard on the planted near-dups: every exact pair ≥ 0.8 should be
    found by LSH with estimate ≥ 0.5."""
    from nomenklatura_spark.dedup.minhash import minhash_dedup_pairs
    from nomenklatura_spark.dedup.ngram import ngram_jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    exact = {
        (r["lid"], r["rid"])
        for r in ngram_jaccard_pairs(
            docs, "doc_id", "text", k=3, threshold=0.8, max_df=100, mode="word"
        ).collect()
    }
    est = {
        (r["lid"], r["rid"])
        for r in minhash_dedup_pairs(
            docs, "doc_id", "text", k=3, mode="word", threshold=0.5
        ).collect()
    }
    assert exact, "expected planted near-duplicates in the corpus"
    missed = exact - est
    assert not missed, f"LSH missed high-jaccard pairs: {missed}"


def test_simhash_banding_complete_vs_bruteforce(spark, sf_dir):
    """Pigeonhole guarantee: banded candidate generation must find every
    pair within hamming distance 3 that brute force finds."""
    from nomenklatura_spark.dedup.simhash import hamming32, simhash, simhash_pairs

    docs = load_table(spark, sf_dir, "documents").limit(200)
    fp = simhash(docs, "doc_id", "text").persist()
    banded = {
        (r["lid"], r["rid"]): r["hamming"]
        for r in simhash_pairs(fp, max_hamming=3).collect()
    }
    l = fp.select(F.col("id").alias("lid"), F.col("simhash").alias("a"))
    r = fp.select(F.col("id").alias("rid"), F.col("simhash").alias("b"))
    brute = {
        (x["lid"], x["rid"]): x["hamming"]
        for x in l.crossJoin(r)
        .where(F.col("lid") < F.col("rid"))
        .select("lid", "rid", hamming32(F.col("a"), F.col("b")).alias("hamming"))
        .where(F.col("hamming") <= 3)
        .collect()
    }
    assert banded == brute


def test_exact_dedup_keeps_one_per_hash(spark):
    from nomenklatura_spark.dedup.exact import exact_dedup, exact_duplicate_groups

    df = spark.createDataFrame(
        [(1, "hello world"), (2, "hello world"), (3, "different")],
        "id long, text string",
    )
    groups = exact_duplicate_groups(df, "id", "text").collect()
    assert len(groups) == 1 and groups[0]["n_dups"] == 2 and groups[0]["canonical_id"] == 1
    kept = {r["id"] for r in exact_dedup(df, "id", "text").collect()}
    assert kept == {1, 3}


def test_ngram_containment_directional(spark):
    """Containment is directional toward the benchmark: a corpus doc that
    embeds a whole benchmark item scores 1.0 on it regardless of how much
    extra text the doc carries; the reverse (short doc vs long bench item)
    scores low."""
    from nomenklatura_spark.dedup.ngram import ngram_containment_pairs

    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [
            # benchmark item verbatim inside a longer doc -> containment 1.0
            (1, "intro words here alpha beta gamma delta epsilon zeta trailing tail"),
            # partial overlap: 2 of the 4 bench trigrams
            (2, "alpha beta gamma delta unrelated continuation of text"),
            # disjoint
            (3, "totally different content with no shared phrases at all"),
        ],
        "doc_id long, text string",
    )
    rows = {
        (r["doc_id"], r["bench_id"]): r["containment"]
        for r in ngram_containment_pairs(
            docs, bench, "doc_id", "text", k=3, threshold=0.0, mode="word"
        ).collect()
    }
    assert rows[(1, 100)] == 1.0
    assert abs(rows[(2, 100)] - 0.5) < 1e-9
    assert (3, 100) not in rows


def test_duplicated_passages_planted(spark):
    """A passage shared by two docs (and repeated inside a third) is
    flagged; short docs yield zero windows; unique text yields zero
    duplicated windows."""
    from nomenklatura_spark.dedup.substring import duplicated_passages

    shared = "the quick brown fox jumps over the lazy dog tonight"
    docs = spark.createDataFrame(
        [
            (1, f"intro words here {shared} and some unique tail one"),
            (2, f"other beginning text {shared} different unique ending two"),
            (3, f"{shared} {shared}"),
            (4, "totally unique words that appear nowhere else in this tiny corpus at all"),
            (5, "too short"),
        ],
        "doc_id int, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in duplicated_passages(docs, "doc_id", "text", k=8).collect()
    }
    assert rows[5]["n_windows"] == 0 and rows[5]["dup_frac"] == 0.0
    assert rows[4]["dup_windows"] == 0
    # the 10-word shared passage contributes 3 duplicated 8-grams per copy
    assert rows[1]["dup_windows"] >= 3
    assert rows[2]["dup_windows"] >= 3
    # doc 3 repeats the passage internally: the 3 windows inside each
    # copy are duplicated (6 of 13); boundary-crossing windows are unique
    assert rows[3]["dup_windows"] == 6 and rows[3]["n_windows"] == 13
    assert 0.0 < rows[1]["dup_frac"] < 1.0


def test_semantic_dedup_consistency(spark, sf_dir):
    """SemDeDup pairs are a subset of the exact all-pairs set at the same
    threshold (clustering only PRUNES candidates), and the keep-list is
    the corpus minus the rid side of every pair."""
    from nomenklatura_spark.dedup.embedding import embedding_dup_pairs
    from nomenklatura_spark.dedup.semantic import (
        semantic_dedup_keep,
        semantic_dup_pairs,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    sem = semantic_dup_pairs(emb, threshold=0.35, n_centroids=8).persist()
    sem_pairs = {(r["lid"], r["rid"]) for r in sem.collect()}
    exact = {
        (r["lid"], r["rid"])
        for r in embedding_dup_pairs(emb, threshold=0.35).collect()
    }
    assert sem_pairs, "expected within-cluster duplicates in the corpus"
    assert sem_pairs <= exact
    kept = semantic_dedup_keep(emb, threshold=0.35, n_centroids=8)
    kept_ids = {r["vec_id"] for r in kept.select("vec_id").collect()}
    all_ids = {r["vec_id"] for r in emb.select("vec_id").collect()}
    drops = {rid for _, rid in sem_pairs}
    assert kept_ids == all_ids - drops


def test_hashed_embeddings_feed_ann_tier(spark):
    """The documents → hashed-embedding → semantic-dedup pipeline closes
    end-to-end: near-duplicate documents land at high cosine, unrelated
    ones do not, and the frame plugs into the embedding operators
    unchanged (vec_id/embedding contract)."""
    from pyspark.sql import functions as F

    from nomenklatura_spark.dedup.embedding import embedding_dup_pairs
    from nomenklatura_spark.textops.embed import hashed_embeddings

    base = (
        "spark executes declarative plans through catalyst and tungsten "
        "with whole stage code generation across the cluster"
    )
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base + " with a tiny appended clause"),
            (3, "entirely unrelated prose about harbors gulls and tides"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    emb = hashed_embeddings(docs).withColumnRenamed("doc_id", "vec_id")
    rows = {r["vec_id"]: r["embedding"] for r in emb.collect()}
    assert len(rows[1]) == 64 and rows[4] == [0.0] * 64
    pairs = {
        (r["lid"], r["rid"]): r["cosine_sim"]
        for r in embedding_dup_pairs(emb, threshold=0.5).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] > 0.8
    assert (1, 3) not in pairs


def test_semantic_dedup_hierarchical(spark, sf_dir):
    """Two-level SemDeDup (`semantic_dup_pairs_hier`): precision-1.0
    subset of the exact pair set (the threshold applies to the true
    cosine, clustering only prunes), deterministic across runs, recall
    comparable to the flat variant at the same effective cell count, and
    every fine cell id belongs to its coarse parent's range."""
    from nomenklatura_spark.ann.ivf import (
        ivf_assign_hier,
        train_centroids_hier,
    )
    from nomenklatura_spark.dedup.embedding import embedding_dup_pairs
    from nomenklatura_spark.dedup.semantic import (
        semantic_dup_pairs,
        semantic_dup_pairs_hier,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    hier = semantic_dup_pairs_hier(
        emb, threshold=0.35, n_coarse=3, n_fine=3
    ).persist()
    pairs1 = {(r["lid"], r["rid"]) for r in hier.collect()}
    pairs2 = {
        (r["lid"], r["rid"])
        for r in semantic_dup_pairs_hier(
            emb, threshold=0.35, n_coarse=3, n_fine=3
        ).collect()
    }
    assert pairs1 == pairs2  # deterministic codebook + assignment
    exact = {
        (r["lid"], r["rid"])
        for r in embedding_dup_pairs(emb, threshold=0.35).collect()
    }
    assert pairs1, "expected within-cell duplicates"
    assert pairs1 <= exact  # precision 1.0 by construction
    flat = {
        (r["lid"], r["rid"])
        for r in semantic_dup_pairs(emb, threshold=0.35, n_centroids=9).collect()
    }
    # same effective cell count (3x3 vs 9): the tree's recall should be
    # in the same regime as the flat partition's, not collapsed
    assert len(pairs1) >= len(flat) // 2

    coarse, fine = train_centroids_hier(emb, n_coarse=3, n_fine=3)
    frows = fine.collect()
    assert all(r["centroid"] // 3 == r["coarse"] for r in frows)
    inv = ivf_assign_hier(emb, coarse, fine)
    # every vector lands in exactly one fine cell
    assert inv.count() == emb.count()
    assert inv.select("id").distinct().count() == emb.count()
