"""Bloom-filter decontamination (dedup/bloom.py): no false negatives vs
the exact broadcast-join operator, deterministic membership on crafted
texts, and the map-only corpus plan shape."""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from nomenklatura_spark.dedup.bloom import bench_bloom, bloom_contamination
from nomenklatura_spark.dedup.ngram import ngram_containment_pairs


def _docs(spark):
    bench_text = (
        "the quick brown fox jumps over the lazy dog while seven wizards "
        "briskly mix a potion of quartz and onyx under the pale moon"
    )
    rows = [
        # bench item
        Row(doc_id=0, text=bench_text),
        # verbatim copy — must be contaminated
        Row(doc_id=1, text="intro words here " + bench_text + " outro words"),
        # partial overlap: one full 5-gram from the bench text
        Row(doc_id=2, text="unrelated start seven wizards briskly mix a potion ending"),
        # disjoint vocabulary — must NOT be contaminated (3-hash FP odds
        # against a ~25-shingle filter are ~1e-12 per shingle)
        Row(doc_id=3, text="alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        # too short for any 5-gram
        Row(doc_id=4, text="tiny doc"),
    ]
    return spark.createDataFrame(rows)


def test_bloom_membership_crafted(spark):
    docs = _docs(spark)
    bench = docs.where(F.col("doc_id") == 0)
    corpus = docs.where(F.col("doc_id") != 0)
    bloom = bench_bloom(bench, "doc_id", "text")
    out = {
        r["id"]: r
        for r in bloom_contamination(corpus, bloom, "doc_id", "text").collect()
    }
    assert out[1]["contaminated"] and out[1]["n_hits"] > 10
    assert out[2]["contaminated"] and out[2]["n_hits"] >= 1
    assert not out[3]["contaminated"] and out[3]["n_hits"] == 0
    assert out[4]["n_shingles"] == 0 and out[4]["hit_frac"] == 0.0
    # hit_frac is hits over the doc's own distinct shingles
    assert abs(out[2]["hit_frac"] - out[2]["n_hits"] / out[2]["n_shingles"]) < 1e-9


def test_bloom_has_no_false_negatives_vs_exact(spark, sf_dir):
    """Every doc the exact containment join finds sharing >= 1 shingle
    with the bench set must be Bloom-contaminated (Bloom membership can
    only over-approximate the exact shingle set)."""
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
    )
    bench = docs.where(F.col("doc_id") % 50 == 0)
    corpus = docs.where(F.col("doc_id") % 50 != 0)
    exact_hits = {
        r["doc_id"]
        for r in ngram_containment_pairs(
            corpus, bench, "doc_id", "text", k=5, threshold=1e-9, mode="word"
        )
        .select("doc_id")
        .distinct()
        .collect()
    }
    bloom = bench_bloom(bench, "doc_id", "text")
    flagged = {
        r["id"]
        for r in bloom_contamination(corpus, bloom, "doc_id", "text")
        .where("contaminated")
        .select("id")
        .collect()
    }
    assert exact_hits <= flagged, (
        f"false negatives: {sorted(exact_hits - flagged)[:5]}"
    )


def test_bloom_corpus_side_is_map_only(spark):
    """With the filter materialized (the serving shape: built once,
    reused per corpus batch), the corpus plan must be scan + broadcast
    append + projection — no shuffle Exchange anywhere."""
    docs = _docs(spark)
    bloom = bench_bloom(docs.where(F.col("doc_id") == 0), "doc_id", "text")
    bloom = bloom.localCheckpoint(eager=True)
    out = bloom_contamination(docs, bloom, "doc_id", "text")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan


def test_embedding_containment_planted(spark):
    """Directional semantic decontamination (dedup/embedding.py):
    a corpus vector nearly parallel to a bench vector is flagged with
    cosine ~1; an orthogonal one is not."""
    import math

    from nomenklatura_spark.dedup.embedding import (
        embedding_containment_pairs,
    )

    dim = 64
    bench_vec = [1.0 if i % 2 == 0 else -1.0 for i in range(dim)]
    near = [v + (0.01 if i == 0 else 0.0) for i, v in enumerate(bench_vec)]
    ortho = [1.0 if i < dim // 2 else -1.0 for i in range(dim)]
    rows = [(100, near), (101, ortho)]
    docs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    bench = spark.createDataFrame(
        [(0, bench_vec)], "vec_id long, embedding array<double>"
    )
    got = {
        (r["lid"], r["rid"]): r["cosine_sim"]
        for r in embedding_containment_pairs(
            docs, bench, threshold=0.9, dim=dim
        ).collect()
    }
    assert (100, 0) in got and math.isclose(got[(100, 0)], 1.0, abs_tol=1e-4)
    assert not any(lid == 101 for lid, _ in got)
