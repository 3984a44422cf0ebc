"""Media near-dup dedup (multimodal/dhash.py): planted near-identical
images across formats, banding completeness vs brute force, the
poison-pill contract, the executable bucket-skew bound, and the
pigeonhole guard on max_hamming."""

from __future__ import annotations

import numpy as np
import pytest

from nomenklatura_spark.multimodal.decode import encode_bmp, encode_ppm
from nomenklatura_spark.multimodal.dhash import (
    dhash_pairs,
    dhash_signatures,
    media_dedup_pairs,
)


def _px(seed: int, h: int = 12, w: int = 20) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8).astype(
        np.uint8
    )


def _assets_df(spark, rows):
    return spark.createDataFrame(
        [(i, "image", bytearray(p)) for i, p in rows],
        "asset_id long, media_type string, payload binary",
    )


def test_cross_format_duplicates_pair_at_zero(spark):
    """The same pixels as BMP and as PPM share no container bytes but
    must dHash identically — only a real decode can pair them."""
    base = _px(1)
    other = _px(2)
    rows = [
        (0, encode_bmp(base)),
        (1, encode_ppm(base)),
        (10, encode_bmp(other)),
    ]
    pairs = {
        (r["lid"], r["rid"]): r["hamming"]
        for r in media_dedup_pairs(_assets_df(spark, rows)).collect()
    }
    assert pairs.get((0, 1)) == 0
    assert (0, 10) not in pairs and (1, 10) not in pairs


def test_small_edit_pairs_at_small_hamming(spark):
    """A one-pixel edit moves a handful of luma comparisons — the pair
    survives the <= max_hamming filter while an unrelated image does
    not."""
    base = _px(3)
    edited = base.copy()
    edited[0, 0, :] = 255 - edited[0, 0, :]
    rows = [(0, encode_bmp(base)), (1, encode_bmp(edited))]
    out = media_dedup_pairs(_assets_df(spark, rows), max_hamming=6).collect()
    assert len(out) == 1
    assert 0 <= out[0]["hamming"] <= 6


def test_banding_complete_vs_brute_force(spark):
    """Pigeonhole completeness: every pair within hamming <= n_bands-1
    by brute force over the signatures is found by the banded join."""
    rows = [(i, encode_bmp(_px(i))) for i in range(30)]
    # plant clones so the candidate set is non-trivial
    rows += [(100 + i, encode_bmp(_px(i))) for i in range(5)]
    df = _assets_df(spark, rows)
    sigs = dhash_signatures(df).localCheckpoint()
    got = {
        (r["lid"], r["rid"]): r["hamming"]
        for r in dhash_pairs(sigs, max_hamming=7).collect()
    }
    sig_rows = {r["id"]: r["blocks"] for r in sigs.collect()}
    want = {}
    ids = sorted(sig_rows)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            h = sum(
                bin(x ^ y).count("1")
                for x, y in zip(sig_rows[a], sig_rows[b])
            )
            if h <= 7:
                want[(a, b)] = h
    assert got == want
    assert any(h == 0 for h in want.values())  # the planted clones


def test_wider_bands_agree_within_their_guarantee(spark):
    """band_bytes=2 (4 bands, guarantee <= 3) finds exactly the
    band_bytes=1 pairs at the same max_hamming."""
    rows = [(i, encode_bmp(_px(i))) for i in range(20)]
    rows += [(200 + i, encode_bmp(_px(i))) for i in range(4)]
    sigs = dhash_signatures(_assets_df(spark, rows)).localCheckpoint()
    narrow = sorted(
        map(tuple, dhash_pairs(sigs, max_hamming=3, band_bytes=1).collect())
    )
    wide = sorted(
        map(tuple, dhash_pairs(sigs, max_hamming=3, band_bytes=2).collect())
    )
    assert narrow == wide


def test_poison_pill_payloads_yield_null_and_no_pairs(spark):
    """Undecodable payloads (fake codec, truncated BMP) signature to
    NULL and are excluded from pairing instead of failing the batch."""
    rows = [
        (0, encode_bmp(_px(7))),
        (1, b"raw/v1 fake payload bytes"),
        (2, encode_bmp(_px(7))[:20]),  # truncated header
    ]
    sigs = dhash_signatures(_assets_df(spark, rows)).collect()
    by_id = {r["id"]: r for r in sigs}
    assert by_id[0]["blocks"] is not None
    assert by_id[1]["blocks"] is None and by_id[1]["dhash"] is None
    assert by_id[2]["blocks"] is None
    out = media_dedup_pairs(_assets_df(spark, rows)).collect()
    assert out == []


def test_bucket_skew_bound_is_executable(spark):
    """Degenerate signatures (flat images all hash to one bucket) trip
    the loud max_bucket ValueError naming the bucket."""
    flat = np.full((10, 10, 3), 128, dtype=np.uint8)
    rows = [(i, encode_bmp(flat)) for i in range(8)]
    sigs = dhash_signatures(_assets_df(spark, rows))
    with pytest.raises(ValueError, match=r"max_bucket.*band0=0x00\(8\)"):
        dhash_pairs(sigs, max_bucket=4)


def test_pigeonhole_guard_and_param_validation(spark):
    sigs = dhash_signatures(
        _assets_df(spark, [(0, encode_bmp(_px(0)))])
    )
    with pytest.raises(ValueError, match="pigeonhole"):
        dhash_pairs(sigs, max_hamming=8)  # 8 bands guarantee only 7
    with pytest.raises(ValueError, match="does not divide"):
        dhash_pairs(sigs, band_bytes=3)
    with pytest.raises(ValueError, match="grid_w > 8"):
        dhash_signatures(_assets_df(spark, []), grid_w=9)


def test_audio_cross_rate_duplicates_pair_at_zero(spark):
    """The same samples under different sample-rate headers share no
    container bytes that matter — only the RIFF walker pairs them; a
    one-sample +1 edit stays within small Hamming distance; unrelated
    audio does not pair."""
    from nomenklatura_spark.multimodal.decode import encode_wav
    from nomenklatura_spark.multimodal.dhash import (
        audio_dhash_signatures,
    )

    rng = np.random.RandomState(5)
    base = rng.randint(-30000, 30000, size=300).astype(np.int16)
    edited = base.copy()
    edited[0] = np.int16((int(edited[0]) + 1 + 32768) % 65536 - 32768)
    other = rng.randint(-30000, 30000, size=300).astype(np.int16)
    rows = [
        (0, encode_wav(base, 8000)),
        (1, encode_wav(base, 16000)),
        (2, encode_wav(edited, 8000)),
        (10, encode_wav(other, 8000)),
    ]
    sigs = audio_dhash_signatures(_assets_df(spark, rows)).localCheckpoint()
    pairs = {
        (r["lid"], r["rid"]): r["hamming"]
        for r in dhash_pairs(sigs, max_hamming=6).collect()
    }
    assert pairs.get((0, 1)) == 0
    assert (0, 2) in pairs and pairs[(0, 2)] <= 2
    assert not any(10 in p for p in pairs)


def test_audio_poison_pill_and_validation(spark):
    from nomenklatura_spark.multimodal.dhash import (
        audio_dhash_signatures,
    )

    rows = [(0, b"not RIFF at all"), (1, b"RIFF\x00\x00\x00\x00WAVE")]
    sigs = audio_dhash_signatures(_assets_df(spark, rows)).collect()
    assert all(r["blocks"] is None for r in sigs)
    with pytest.raises(ValueError, match="multiple of 8"):
        audio_dhash_signatures(_assets_df(spark, []), n_frames=10)


def test_media_eval_alarm_fires_on_dropped_pairs(spark):
    """The media quality gate must DEGRADE when the pairing under-
    merges: with max_hamming=0 an edited near-dup pair is missed and
    recall drops below 1 while precision stays 1 (no false merges)."""
    from pyspark.sql import functions as F

    from nomenklatura_spark.dedup.eval import pairwise_cluster_metrics
    from nomenklatura_spark.resolver.components import (
        connected_components,
    )

    from nomenklatura_spark.multimodal.dhash import dhash_blocks

    a = _px(21)
    edited = a.copy()
    edited[0, 0, :] = 255  # force the (0,0) luma comparison to flip
    if dhash_blocks(edited) == dhash_blocks(a):
        edited[0, 0, :] = 0
    assert dhash_blocks(edited) != dhash_blocks(a)
    b = _px(22)
    rows = [
        (0, encode_bmp(a)),
        (1, encode_ppm(edited)),   # doc 0's near-dup, hamming > 0
        (2, encode_bmp(b)),
        (3, encode_ppm(b)),        # doc 1's exact cross-format dup
    ]
    assets = _assets_df(spark, rows)
    pairs = media_dedup_pairs(assets, max_hamming=0)
    comps = connected_components(pairs, src="lid", dst="rid")
    labels = (
        assets.select(F.col("asset_id").alias("id"))
        .withColumn("gold", F.expr("id DIV 2"))
        .join(comps.withColumnRenamed("node", "id"), "id", "left")
        .select("gold", F.coalesce("component", F.col("id")).alias("pred"))
    )
    (got,) = pairwise_cluster_metrics(labels, "gold", "pred").collect()
    assert got["pair_precision"] == 1.0
    assert got["pair_recall"] == 0.5  # the edited pair was missed


def test_signature_matches_reference_construction(spark):
    """Pin the exact bit layout: bit c of row r is
    luma[r, c] > luma[r, c+1] weighted 2^c, rows resampled by the
    integer (i*src)//dst map, luma = 299R + 587G + 114B."""
    px = _px(11, h=6, w=18)
    (row,) = dhash_signatures(
        _assets_df(spark, [(0, encode_ppm(px))])
    ).collect()
    rs = (np.arange(8) * 6) // 8
    cs = (np.arange(9) * 18) // 9
    g = px[rs][:, cs].astype(np.int64)
    luma = 299 * g[:, :, 0] + 587 * g[:, :, 1] + 114 * g[:, :, 2]
    want = [
        int(sum((1 << c) for c in range(8) if luma[r, c] > luma[r, c + 1]))
        for r in range(8)
    ]
    assert row["blocks"] == want
    assert row["dhash"] == "".join(f"{v:02x}" for v in want)


def test_n_blocks_mismatch_raises_loudly(spark):
    """ADVICE r10: banding 8-block signatures as n_blocks=16 would
    element_at past the array into NULL bands that match nothing —
    the pigeonhole guarantee silently voided.  The sentinel band makes
    the contract scan raise instead, naming the found block count."""
    rows = [(i, encode_bmp(_px(i))) for i in range(4)]
    sigs = dhash_signatures(_assets_df(spark, rows)).localCheckpoint()
    with pytest.raises(ValueError, match="n_blocks=16 does not match"):
        dhash_pairs(sigs, n_blocks=16, band_bytes=2)


def test_media_index_derives_grid_from_n_blocks(spark, tmp_path):
    """The index's signature pass must build the n_blocks it bands
    (ADVICE r10): n_blocks=16 produces 16-block (8x16 grid) signatures
    and the fold still finds the planted duplicate."""
    from nomenklatura_spark.streaming.media_index import (
        MediaDedupIndexState,
    )

    state = MediaDedupIndexState(
        spark, str(tmp_path / "s16"), n_blocks=16, band_bytes=2
    )
    base = _px(5)
    rows = [(0, encode_bmp(base)), (1, encode_ppm(base)),
            (2, encode_bmp(_px(6)))]
    pairs = state.apply_batch(_assets_df(spark, rows))
    assert {(r["lid"], r["rid"]) for r in pairs.collect()} == {(0, 1)}
    sizes = {len(r["blocks"]) for r in state.signatures().collect()}
    assert sizes == {16}
