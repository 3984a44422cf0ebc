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
