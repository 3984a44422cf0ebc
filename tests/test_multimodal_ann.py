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


def test_bmp_ppm_wav_roundtrip():
    """Pure-numpy codecs: decode(encode(x)) == x, including BMP row
    padding at odd widths and WAV extra-chunk skipping."""
    import numpy as np

    from nomenklatura_spark.multimodal.decode import (
        decode_bmp,
        decode_ppm,
        decode_wav,
        encode_bmp,
        encode_ppm,
        encode_wav,
        sniff_codec,
    )

    rng = np.random.RandomState(7)
    for w, h in ((8, 8), (5, 3), (7, 2), (1, 1)):
        px = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
        bmp = encode_bmp(px)
        assert sniff_codec(bmp) == "bmp"
        assert (decode_bmp(bmp) == px).all()
        ppm = encode_ppm(px)
        assert sniff_codec(ppm) == "ppm"
        assert (decode_ppm(ppm) == px).all()
    samples = (rng.randint(-32768, 32767, 500)).astype(np.int16)
    wav = encode_wav(samples, 8000)
    assert sniff_codec(wav) == "wav"
    rate, got = decode_wav(wav)
    assert rate == 8000 and (got == samples).all()
    # a LIST chunk between fmt and data must be skipped
    extra = wav[:12] + b"LIST\x04\x00\x00\x00INFO" + wav[12:]
    patched = b"RIFF" + __import__("struct").pack("<I", len(extra) - 8) + extra[8:]
    rate2, got2 = decode_wav(patched)
    assert rate2 == 8000 and (got2 == samples).all()


def test_image_audio_stats_real_decode(spark):
    """image_stats / audio_stats compute genuine pixel/sample math via
    mapInPandas; undecodable payloads yield NULL stats, not failures."""
    import numpy as np

    from nomenklatura_spark.multimodal.decode import (
        audio_stats,
        encode_bmp,
        encode_wav,
        image_stats,
    )

    px = np.zeros((4, 6, 3), dtype=np.uint8)
    px[:, :, 0] = 200  # red plane
    px[:, :, 1] = 50
    rows = [
        (1, "image", bytearray(encode_bmp(px))),
        (2, "image", bytearray(b"raw1 not an image")),
        (3, "audio", bytearray(encode_wav(np.full(400, 1000, dtype=np.int16), 8000))),
        (4, "audio", bytearray(b"raw1 noise")),
    ]
    assets = spark.createDataFrame(
        rows, "asset_id long, media_type string, payload binary"
    )
    img = {r["asset_id"]: r for r in image_stats(assets).collect()}
    assert img[1]["codec"] == "bmp"
    assert (img[1]["width"], img[1]["height"]) == (6, 4)
    assert img[1]["mean_r"] == 200.0 and img[1]["mean_g"] == 50.0
    assert img[1]["min_px"] == 0 and img[1]["max_px"] == 200
    assert img[2]["width"] is None
    aud = {r["asset_id"]: r for r in audio_stats(assets).collect()}
    assert aud[3]["sample_rate"] == 8000
    assert aud[3]["n_samples"] == 400
    assert aud[3]["duration_ms"] == 50
    assert aud[3]["rms"] == 1000.0 and aud[3]["peak"] == 1000
    assert aud[4]["rms"] is None


def test_resize_image_real_resample(spark):
    """A BMP checkerboard resized 2x down keeps the pattern under
    nearest-neighbor resampling and re-encodes as BMP."""
    import numpy as np

    from nomenklatura_spark.multimodal.decode import (
        decode_bmp,
        encode_bmp,
        resize_image,
        sniff_codec,
    )

    px = np.zeros((8, 8, 3), dtype=np.uint8)
    px[::2, ::2] = 255
    assets = spark.createDataFrame(
        [(1, "image", bytearray(encode_bmp(px)))],
        "asset_id long, media_type string, payload binary",
    )
    out = resize_image(assets, target_w=4, target_h=4).collect()
    payload = bytes(out[0]["payload"])
    assert sniff_codec(payload) == "bmp"
    small = decode_bmp(payload)
    assert small.shape == (4, 4, 3)
    assert (small == px[::2, ::2]).all()


def test_pq_topk_recall_vs_brute(spark, sf_dir):
    """PQ with 16 subspaces + exact top-50 re-rank (IVFADC+R shape) must
    recover most true top-5 neighbors; codes must be m small ints per
    vector (the 16x memory compression that IS the point)."""
    from pyspark.sql import functions as F

    from nomenklatura_spark.ann.brute import cosine_topk
    from nomenklatura_spark.ann.pq import pq_encode, pq_topk, train_pq_codebooks
    from nomenklatura_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 50 == 0)
    brute = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, queries, k=5).collect()
    }
    pq = {
        (r["query_id"], r["neighbor_id"])
        for r in pq_topk(emb, queries, k=5, m=16, dim=64, rerank=50).collect()
    }
    recall = len(pq & brute) / len(brute)
    assert recall >= 0.8, f"PQ recall@5 {recall:.2f}"

    books = train_pq_codebooks(emb, m=16, k=16, dim=64)
    codes = pq_encode(emb, books, m=16, dim=64)
    n_vecs = emb.count()
    assert codes.count() == n_vecs * 16
    assert codes.agg(F.max("code")).first()[0] < 16


def test_ivfpq_topk_recall_vs_brute(spark, sf_dir):
    """The IVFADC composition (coarse cell pruning x PQ scoring x exact
    re-rank) keeps recall close to brute force while the scoring path
    reads only codes."""
    from pyspark.sql import functions as F

    from nomenklatura_spark.ann.brute import cosine_topk
    from nomenklatura_spark.ann.pq import ivfpq_topk
    from nomenklatura_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 50 == 0)
    brute = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, queries, k=5).collect()
    }
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in ivfpq_topk(
            emb, queries, k=5, n_cells=16, n_probe=8, m=16, rerank=50
        ).collect()
    }
    recall = len(got & brute) / len(brute)
    assert recall >= 0.6, f"IVFADC recall@5 {recall:.2f}"


def test_ivfpq_index_roundtrip_and_pruning(spark, sf_dir, tmp_path):
    """The at-rest IVFADC layout (`write_ivfpq_index`): serving from the
    index returns EXACTLY what the in-memory composition computes (same
    deterministic codebooks), and the codes/vectors scans carry a
    partition filter on the coarse cell — only probed inverted lists are
    read."""
    from nomenklatura_spark.ann.pq import (
        ivfpq_topk,
        ivfpq_topk_indexed,
        write_ivfpq_index,
    )
    from nomenklatura_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 50 == 0)
    path = str(tmp_path / "ivfpq")
    write_ivfpq_index(emb, path, n_cells=8, m=8, pq_k=8, n_iter=1)

    served = ivfpq_topk_indexed(
        spark, path, queries, k=5, n_probe=3, rerank=20
    )
    plan = served._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [centroid" in plan.replace(
        "PartitionFilters: [isnotnull(centroid", "PartitionFilters: [centroid"
    ) or "centroid#" in plan.split("PartitionFilters")[1][:200]

    mem = ivfpq_topk(
        emb, queries, k=5, n_cells=8, n_probe=3, m=8, pq_k=8,
        n_iter=1, dim=64, rerank=20,
    )
    a = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in served.collect()}
    b = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in mem.collect()}
    assert a == b
