"""Domain clustering + alpha-sampling mix weights (textops/domains.py).

The registry row ``doc_clusters`` is oracle-checked end-to-end; these
tests pin the alpha-sampling algebra the oracle only spot-checks:
α=1 degenerates to natural sampling, the size-weighted mean weight is
exactly 1 (sampling-budget preservation), and α<1 upweights rare
domains monotonically.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nomenklatura_spark.textops.domains import alpha_mix_weights, domain_clusters


@pytest.fixture(scope="module")
def sizes(spark):
    return spark.createDataFrame(
        [(0, 700), (1, 200), (2, 80), (3, 20)],
        "centroid int, cluster_size long",
    )


def test_alpha_one_is_natural_sampling(spark, sizes):
    rows = alpha_mix_weights(sizes, alpha=1.0).collect()
    assert all(r.mix_weight == 1.0 for r in rows)


def test_budget_preserved(spark, sizes):
    """Σ_j share_j · weight_j = 1: reweighting redistributes the
    sampling budget, it doesn't change its size."""
    rows = alpha_mix_weights(sizes, alpha=0.5).collect()
    n = sum(r.cluster_size for r in rows)
    total = sum(r.cluster_size / n * r.mix_weight for r in rows)
    assert abs(total - 1.0) < 1e-5


def test_flattening_upweights_rare_domains(spark, sizes):
    rows = {r.centroid: r.mix_weight for r in alpha_mix_weights(sizes, 0.5).collect()}
    # weights strictly decrease with cluster size
    assert rows[3] > rows[2] > rows[1] > rows[0]
    assert rows[0] < 1.0 < rows[3]


def test_domain_clusters_covers_corpus(spark, sf_dir):
    """Every embedded document gets exactly one cluster row, and the
    per-cluster sizes are consistent with the assignment."""
    from nomenklatura_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    out = domain_clusters(emb, "vec_id", "embedding", n_clusters=4).persist()
    try:
        assert out.count() == emb.count()
        assert out.select("id").distinct().count() == emb.count()
        recounted = out.groupBy("cluster").count()
        bad = recounted.join(
            out.select("cluster", "cluster_size").distinct(), "cluster"
        ).where(F.col("count") != F.col("cluster_size"))
        assert bad.count() == 0
    finally:
        out.unpersist()


# ---------------------------------------------------------------------------
# c-TF-IDF cluster keywords


def test_cluster_keywords_surface_topic_words(spark):
    """Two crafted topics with distinct vocabularies plus shared filler:
    each cluster's top keywords must be its OWN topic words, and the
    shared filler (high corpus frequency -> low idf) must rank below
    them."""
    import math

    from nomenklatura_spark.textops.domains import cluster_keywords

    legal = "contract clause liability indemnity " * 5 + "the and of"
    cooking = "recipe flour oven bake simmer " * 5 + "the and of"
    docs = spark.createDataFrame(
        [(f"l{i}", legal) for i in range(3)]
        + [(f"c{i}", cooking) for i in range(3)],
        "doc_id string, text string",
    )
    assign = spark.createDataFrame(
        [(f"l{i}", 0) for i in range(3)] + [(f"c{i}", 1) for i in range(3)],
        "id string, cluster int",
    )
    out = cluster_keywords(docs, assign, top_k=4).collect()
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r["cluster"], []).append(r)
    top0 = {r["word"] for r in by_cluster[0]}
    top1 = {r["word"] for r in by_cluster[1]}
    assert top0 <= {"contract", "clause", "liability", "indemnity"}
    assert top1 <= {"recipe", "flour", "oven", "bake", "simmer"}
    # hand-check one score: tf=15 for 'contract' in cluster 0; A = total
    # tokens / 2 clusters; f_w = corpus frequency of 'contract'
    total = 3 * (4 * 5 + 3) + 3 * (5 * 5 + 3)  # 23-token legal, 28-token cooking
    a = total / 2
    contract = next(r for r in out if r["word"] == "contract")
    assert contract["tf"] == 15
    assert contract["score"] == round(15 * math.log(1 + a / 15), 6)
    # ranks are 1..k dense per cluster, ordered by score desc then word
    for rows in by_cluster.values():
        ranks = [r["rank"] for r in sorted(rows, key=lambda r: r["rank"])]
        assert ranks == list(range(1, len(rows) + 1))
        scores = [r["score"] for r in sorted(rows, key=lambda r: r["rank"])]
        assert scores == sorted(scores, reverse=True)


def test_cluster_keywords_partition_invariant(spark):
    from nomenklatura_spark.textops.domains import cluster_keywords

    rows = [
        (f"d{i}", " ".join(f"w{(i * 7 + j) % 23}" for j in range(30)))
        for i in range(24)
    ]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    assign = spark.createDataFrame(
        [(f"d{i}", i % 3) for i in range(24)], "id string, cluster int"
    )
    base = sorted(tuple(r) for r in cluster_keywords(docs, assign).collect())
    rep = sorted(
        tuple(r)
        for r in cluster_keywords(docs.repartition(7), assign).collect()
    )
    assert base == rep and len(base) > 0


def test_cluster_keywords_custom_assignment_key(spark):
    """assign_id_col: an assignments frame keyed by the docs' own id
    column (the natural shape) works without pre-renaming to 'id'."""
    from nomenklatura_spark.textops.domains import cluster_keywords

    docs = spark.createDataFrame(
        [("a", "x y z"), ("b", "x q r")], "doc_id string, text string"
    )
    assign = spark.createDataFrame(
        [("a", 0), ("b", 1)], "doc_id string, cluster int"
    )
    out = cluster_keywords(
        docs, assign, top_k=2, assign_id_col="doc_id"
    ).collect()
    assert {r["cluster"] for r in out} == {0, 1}
    default = cluster_keywords(
        docs,
        assign.withColumnRenamed("doc_id", "id"),
        top_k=2,
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, default))
