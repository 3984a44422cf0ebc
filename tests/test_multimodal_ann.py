"""Multimodal binary-column plumbing + LSH ANN tests.

Multimodal features are verified byte-for-byte against the DuckDB oracle;
the LSH ANN path is verified by recall against the exact brute-force
result (its natural oracle, SURVEY.md §7.7 extension mandate).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from nomenklatura_spark.session import load_table


@pytest.fixture(scope="module")
def assets(spark, sf_dir):
    from nomenklatura_spark.multimodal import assets_from_documents

    docs = load_table(spark, sf_dir, "documents")
    return assets_from_documents(docs).persist()


def test_media_features_match_oracle(assets, duck):
    from nomenklatura_spark.multimodal import extract_features

    got = {
        r["asset_id"]: (r["media_type"], r["n_bytes"], r["header"], r["n_chunks"])
        for r in extract_features(assets).collect()
    }
    exp = {
        row[0]: (row[1], row[2], row[3], row[4])
        for row in duck.execute(
            """
            SELECT doc_id,
                CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
                     WHEN 1 THEN 'audio' ELSE 'video' END,
                octet_length(encode(text)),
                substring(text, 1, 4),
                CAST(octet_length(encode(text)) // 256 + 1 AS INT)
            FROM documents
            """
        ).fetchall()
    }
    assert got == exp


def test_metadata_only_scan_prunes_payload(assets, tmp_path, spark):
    """A metadata-only query over the asset table must not read the blob:
    ReadSchema in the parquet scan should exclude ``payload``."""
    path = str(tmp_path / "assets.parquet")
    assets.write.mode("overwrite").parquet(path)
    q = (
        spark.read.parquet(path)
        .groupBy("media_type")
        .agg(F.sum("duration_ms").alias("total_ms"))
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "payload" not in plan
    assert q.count() == 3


def test_frame_sample_shape_and_determinism(assets):
    from nomenklatura_spark.multimodal import frame_sample

    frames = frame_sample(assets, every_n=2, max_frames=4).collect()
    assert frames, "expected video assets to yield frames"
    by_asset: dict[int, list] = {}
    for r in frames:
        by_asset.setdefault(r["asset_id"], []).append(r)
    payloads = {
        r["asset_id"]: bytes(r["payload"])
        for r in assets.where("media_type = 'video'").collect()
    }
    for aid, rows in by_asset.items():
        assert len(rows) <= 4
        assert [r["frame_index"] for r in rows] == sorted(
            r["frame_index"] for r in rows
        )
        for r in rows:
            start = r["frame_index"] * 256
            assert bytes(r["frame"]) == payloads[aid][start : start + 256]


def test_resize_image_pads_or_truncates(assets):
    from nomenklatura_spark.multimodal import resize_image

    out = resize_image(assets, target_w=8, target_h=8).collect()
    assert out
    assert all(len(bytes(r["payload"])) == 64 for r in out)
    assert all(r["width"] == 8 and r["height"] == 8 for r in out)


def test_real_codec_decode_raises():
    from nomenklatura_spark.multimodal.decode import decode_image

    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG", codec="png")


def test_lsh_topk_recall_vs_brute(spark, sf_dir):
    """LSH with 8 bands × 2 bits must recover most true top-5 neighbors.

    Near-orthogonal synthetic vectors are the adversarial case for sign
    LSH, so the bar is recall ≥ 0.5 (brute force remains the exact path;
    LSH trades recall for never materialising the cross product)."""
    from nomenklatura_spark.ann.brute import cosine_topk
    from nomenklatura_spark.ann.lsh import lsh_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 20 == 0)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in lsh_topk(emb, queries, k=5, n_planes=16, band_bits=2).collect()
    }
    assert exact
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"LSH recall too low: {recall:.2f}"


def test_embedding_dup_lsh_subset_of_exact(spark, sf_dir):
    """LSH-blocked near-dup pairs must be a subset of the exact pairs
    (verification is exact — LSH can only lose candidates, never invent)."""
    from nomenklatura_spark.dedup.embedding import (
        embedding_dup_pairs,
        embedding_dup_pairs_lsh,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    exact = {
        (r["lid"], r["rid"]) for r in embedding_dup_pairs(emb, threshold=0.3).collect()
    }
    approx = {
        (r["lid"], r["rid"])
        for r in embedding_dup_pairs_lsh(
            emb, threshold=0.3, n_planes=16, band_bits=2
        ).collect()
    }
    assert exact, "expected some pairs at threshold 0.3"
    assert approx <= exact
    assert len(approx) / len(exact) >= 0.5


def test_ivf_topk_recall_vs_brute(spark, sf_dir):
    """IVF probing 4 of 8 cells must recover most true top-5 neighbors;
    near-orthogonal synthetic vectors scatter neighbors across cells, so
    the bar is recall ≥ 0.5 (same bar as LSH)."""
    from nomenklatura_spark.ann.brute import cosine_topk
    from nomenklatura_spark.ann.ivf import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 20 == 0)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(
            emb, queries, k=5, n_centroids=8, n_probe=4, n_iter=2
        ).collect()
    }
    assert exact
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"IVF recall too low: {recall:.2f}"


def test_ivf_full_probe_equals_brute(spark, sf_dir):
    """Probing every cell makes IVF exhaustive — must equal brute force
    exactly (completeness check on the inverted-list partitioning)."""
    from nomenklatura_spark.ann.brute import cosine_topk
    from nomenklatura_spark.ann.ivf import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 300)
    queries = emb.where(F.col("vec_id") % 40 == 0)
    exact = [
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in cosine_topk(emb, queries, k=5).collect()
    ]
    full = [
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in ivf_topk(
            emb, queries, k=5, n_centroids=4, n_probe=4, n_iter=2
        ).collect()
    ]
    assert exact == full


def test_ivf_codebook_reuse_deterministic(spark, sf_dir):
    """Training is hash-seeded → two trainings give the same codebook,
    and a pre-trained codebook gives the same result as inline training."""
    from nomenklatura_spark.ann.ivf import ivf_topk, train_centroids

    emb = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 400)
    queries = emb.where(F.col("vec_id") % 40 == 0)
    cb1 = train_centroids(emb, n_centroids=8, n_iter=2)
    cb2 = train_centroids(emb, n_centroids=8, n_iter=2)
    assert sorted(map(tuple, cb1.collect())) == sorted(map(tuple, cb2.collect()))

    inline = ivf_topk(emb, queries, k=3, n_centroids=8, n_probe=3, n_iter=2).collect()
    reused = ivf_topk(emb, queries, k=3, n_probe=3, centroids=cb1).collect()
    assert [tuple(r) for r in inline] == [tuple(r) for r in reused]
