"""Media near-duplicate detection: difference-hash (dHash) signatures
over decoded pixels + a banded Hamming join.

A training-data pipeline dedups images before captions: re-encodes,
resizes and tiny edits of the same picture must collapse to one asset.
dHash (the classic perceptual hash family popularised by Krawetz's
"Kind of Like That", 2013; same banding theory as SimHash — Charikar
2002 / Manku et al. 2007) is integer-exact, which makes it replayable
by a SQL oracle:

- decode the payload to H×W×3 uint8 pixels (the REAL pure-numpy
  BMP/PPM codecs in ``multimodal/decode.py`` — no imaging library),
- nearest-neighbor resample to a ``(grid_w+1) × grid_h`` grid (the
  same integer ``(i*src)//dst`` index map as ``resize_image``),
- integer luma ``299*R + 587*G + 114*B`` (the ITU-R 601 weights scaled
  by 1000 — comparisons are scale-invariant, so the division never
  happens and the math stays exact),
- bit (r, c) = ``luma[r, c] > luma[r, c+1]`` — ``grid_w`` bits per
  row, one row-byte per grid row, ``grid_w * grid_h`` bits total
  (64 at the 8×8 default).

The signature is carried as ``grid_h`` row-bytes (``blocks``
array<int>) plus a hex rendering — never as one 64-bit integer, so
bit 63 sign traps can't bite either engine.

Candidate pairs at scale are the SimHash banding shape
(``dedup/simhash.py``): band the row-bytes into ``n_bands`` exact-match
blocks; by pigeonhole, any pair within Hamming distance
``n_bands - 1`` shares at least one band → bounded equi-join, then the
exact popcount-of-XOR filter.  ``band_bytes`` widens the bands for
bigger corpora (2-byte bands → 4 bands, catches distance <= 3 with
65536-value buckets instead of 256).

``audio_dhash_signatures`` is the same construction over decoded WAV
samples (sign-of-delta bits over a nearest-neighbor frame resample) —
one signature shape, one banding/pairing path for both modalities.

Scale contract, executable: perceptual-hash buckets are SKEWED on real
corpora (solid-color images all hash to a handful of signatures), and
a degenerate bucket turns the band join quadratic.  A partial-agg
count runs first and any (band_no, band_val) bucket above
``max_bucket`` raises a loud ValueError naming the offenders — widen
``band_bytes``, pre-drop degenerate signatures (all-0x00/all-0xff =
flat images), or raise the bound if the pair volume is priced in.
100 TB shape: the signature pass is map-only Arrow-batched decode
(repartition payloads by size upstream — they are skewed); the band
join shuffles signature rows (tens of bytes each), never pixels.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

from nomenklatura_spark.multimodal.decode import (
    _resample_nearest,
    decode_image,
    sniff_codec,
)

_LUMA = (299, 587, 114)  # ITU-R 601, scaled x1000 (integer-exact)


def dhash_blocks(
    px: np.ndarray, grid_w: int = 8, grid_h: int = 8
) -> list[int]:
    """Pure kernel: H×W×3 uint8 pixels → ``grid_h`` row-bytes (module
    docstring construction).  Exposed for property tests; the Spark
    path is a thin Arrow-batched wrapper around this."""
    g = _resample_nearest(px, grid_w + 1, grid_h).astype(np.int64)
    luma = (
        _LUMA[0] * g[:, :, 0]
        + _LUMA[1] * g[:, :, 1]
        + _LUMA[2] * g[:, :, 2]
    )
    bits = luma[:, :-1] > luma[:, 1:]
    weights = (1 << np.arange(grid_w)).astype(np.int64)
    return [int(v) for v in (bits * weights).sum(axis=1)]


def audio_dhash_blocks(
    samples: np.ndarray, n_frames: int = 65
) -> list[int]:
    """Pure kernel: int16 samples → ``(n_frames - 1) / 8`` row-bytes
    of sign-of-delta bits over the integer frame resample."""
    n = len(samples)
    idx = (np.arange(n_frames) * n) // n_frames
    frames = samples[idx].astype(np.int64)
    bits = (frames[:-1] > frames[1:]).reshape((n_frames - 1) // 8, 8)
    weights = (1 << np.arange(8)).astype(np.int64)
    return [int(v) for v in (bits * weights).sum(axis=1)]


def dhash_signatures(
    assets: DataFrame,
    id_col: str = "asset_id",
    payload_col: str = "payload",
    grid_w: int = 8,
    grid_h: int = 8,
) -> DataFrame:
    """(id, blocks array<int>, dhash hex string) — one signature row per
    asset via Arrow-batched mapInPandas over the real decoders.
    Non-decodable payloads (compressed codecs, raw fakes, truncated
    bytes) yield NULL blocks instead of failing the batch — the same
    poison-pill contract as ``image_stats``; ``dhash_pairs`` skips them
    (an undecodable image has no pixels to near-match).  Bit c of row
    r is ``luma[r, c] > luma[r, c+1]`` weighted ``2^c``."""
    if grid_w < 1 or grid_h < 1:
        raise ValueError("dhash_signatures: grid must be >= 1x1")
    if grid_w > 8:
        raise ValueError(
            "dhash_signatures: grid_w > 8 would overflow the row-byte "
            "block encoding; widen grid_h instead"
        )
    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, blocks, hexes = [], [], []
            for aid, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                try:
                    px = (
                        decode_image(b)
                        if sniff_codec(b) in ("bmp", "ppm")
                        else None
                    )
                except (ValueError, NotImplementedError, IndexError,
                        struct.error):
                    # truncated headers raise struct/index errors —
                    # poison pills, same contract as the codec errors
                    px = None
                if not isinstance(px, np.ndarray):
                    ids.append(aid)
                    blocks.append(None)
                    hexes.append(None)
                    continue
                vals = dhash_blocks(px, grid_w, grid_h)
                ids.append(aid)
                blocks.append(vals)
                hexes.append("".join(f"{v:02x}" for v in vals))
            yield pd.DataFrame(
                {"id": ids, "blocks": blocks, "dhash": hexes}
            )

    return assets.select(id_col, payload_col).mapInPandas(
        _batches, "id long, blocks array<int>, dhash string"
    )


def audio_dhash_signatures(
    assets: DataFrame,
    id_col: str = "asset_id",
    payload_col: str = "payload",
    n_frames: int = 65,
) -> DataFrame:
    """The dHash construction for AUDIO: decode WAV PCM16 (the real
    RIFF chunk walker), nearest-neighbor resample to ``n_frames``
    samples via the integer ``(i*n)//n_frames`` index map, then bit i =
    ``frame[i] > frame[i+1]`` — ``n_frames - 1`` sign-of-delta bits
    packed 8 per row-byte (64 bits at the default), the same signature
    shape ``dhash_pairs`` bands.  Integer-exact end to end, so a SQL
    oracle replays it from the sample bytes.  Single-sample picks keep
    the math exact; a production fingerprinter would low-pass first —
    the banding/scale shape is identical either way.  Non-decodable
    payloads yield NULL blocks (poison-pill contract)."""
    from nomenklatura_spark.multimodal.decode import decode_wav

    if (n_frames - 1) % 8 != 0 or n_frames < 9:
        raise ValueError(
            "audio_dhash_signatures: n_frames - 1 must be a positive "
            "multiple of 8 (whole row-bytes)"
        )
    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, blocks, hexes = [], [], []
            for aid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    _, samples = decode_wav(bytes(payload))
                except (ValueError, NotImplementedError, IndexError,
                        struct.error):
                    samples = None
                if samples is None or len(samples) < 2:
                    ids.append(aid)
                    blocks.append(None)
                    hexes.append(None)
                    continue
                vals = audio_dhash_blocks(samples, n_frames)
                ids.append(aid)
                blocks.append(vals)
                hexes.append("".join(f"{v:02x}" for v in vals))
            yield pd.DataFrame(
                {"id": ids, "blocks": blocks, "dhash": hexes}
            )

    return assets.select(id_col, payload_col).mapInPandas(
        _batches, "id long, blocks array<int>, dhash string"
    )


def _banded(signatures: DataFrame, band_bytes: int,
            n_bands: int) -> DataFrame:
    """(id, blocks, band_no, band_val) — the exploded band relation.

    A signature whose block array does not hold exactly
    ``n_bands * band_bytes`` row-bytes explodes to a single SENTINEL
    band (band_no = -1, band_val = actual block count): ``element_at``
    past the array end yields NULL band values that silently match
    nothing, so a mismatched ``n_blocks`` would quietly void the
    pigeonhole completeness guarantee — the sentinel makes the
    ``dhash_pairs`` contract scan raise instead (loud-failure
    contract)."""
    n_blocks = n_bands * band_bytes
    band_val = [
        sum(
            (
                F.element_at("blocks", i * band_bytes + j + 1)
                .cast("long")
                * F.lit(1 << (8 * j)).cast("long")
                for j in range(band_bytes)
            ),
            start=F.lit(0).cast("long"),
        ).alias(f"_band{i}")
        for i in range(n_bands)
    ]
    bands_arr = F.array(
        *[
            F.struct(
                F.lit(i).alias("band_no"),
                band_val[i].alias("band_val"),
            )
            for i in range(n_bands)
        ]
    )
    sentinel = F.array(
        F.struct(
            F.lit(-1).alias("band_no"),
            F.size("blocks").cast("long").alias("band_val"),
        )
    )
    return (
        signatures.where(F.col("blocks").isNotNull())
        .select(
            "id",
            "blocks",
            F.explode(
                F.when(F.size("blocks") == n_blocks, bands_arr)
                .otherwise(sentinel)
            ).alias("b"),
        )
        .select("id", "blocks", F.col("b.band_no"), F.col("b.band_val"))
    )


def _raise_band_offenders(
    offenders: list, n_blocks: int, band_bytes: int, max_bucket: int
) -> None:
    """Shared loud-failure path for the band contract scan: sentinel
    rows (band_no = -1, ``_banded``) mean the caller's ``n_blocks``
    does not match the produced signatures; real rows above
    ``max_bucket`` mean a degenerate bucket would turn the band join
    quadratic."""
    sizes = [r for r in offenders if r["band_no"] == -1]
    if sizes:
        found = ", ".join(
            f"{r['band_val']}-block x{r['n']}" for r in sizes
        )
        raise ValueError(
            f"dhash_pairs: n_blocks={n_blocks} does not match the "
            f"produced signatures ({found}) — element_at past the block "
            f"array yields NULL bands that match nothing and silently "
            f"void the pigeonhole guarantee; pass the n_blocks the "
            f"producing signature pass actually built (grid_h for "
            f"images, (n_frames - 1) / 8 for audio)"
        )
    if offenders:
        names = ", ".join(
            f"band{r['band_no']}=0x{r['band_val']:0{2 * band_bytes}x}"
            f"({r['n']})"
            for r in offenders
        )
        raise ValueError(
            f"dhash_pairs: signature bucket(s) above the "
            f"max_bucket={max_bucket} band-join bound: {names} (top 10 "
            f"shown) — flat/degenerate images collapse onto few "
            f"signatures and turn the band join quadratic; widen "
            f"band_bytes, pre-drop degenerate signatures, or raise the "
            f"bound if the pair volume is priced in"
        )


def full_bucket_scan(banded: DataFrame, max_bucket: int) -> DataFrame:
    """Top-10 band-contract offenders over a full band relation: real
    buckets above ``max_bucket`` plus sentinel rows (band_no = -1,
    ``_banded``).  One groupBy over the whole relation — the batch
    path's shape, and the ``validate_buckets`` repair verb after
    tightening ``max_bucket`` over maintained state."""
    return (
        banded.groupBy("band_no", "band_val")
        .agg(F.count(F.lit(1)).alias("n"))
        .where((F.col("n") > max_bucket) | (F.col("band_no") == -1))
        .orderBy(F.col("n").desc(), "band_no", "band_val")
        .limit(10)
    )


def probe_bucket_scan(
    band_counts: DataFrame, probe_banded: DataFrame, max_bucket: int
) -> DataFrame:
    """The BATCH-bounded band-contract scan (``dhash_pairs`` probe
    mode): only probe-side buckets can have newly crossed the bound
    (counts change only through touched buckets — the induction in
    ``dhash_pairs``'s docstring), and sentinel bands can only enter
    through the probe (state signatures passed their own fold's scan).
    The probe bucket list is aggregated batch-side and BROADCAST, so
    the maintained counts relation is read map-side — no full-state
    groupBy anywhere in this plan (plan-asserted in
    ``tests/test_layout.py``)."""
    probe_buckets = probe_banded.groupBy("band_no", "band_val").agg(
        F.count(F.lit(1)).alias("n")
    )
    return (
        band_counts.join(
            F.broadcast(probe_buckets.select("band_no", "band_val")),
            ["band_no", "band_val"],
            "semi",
        )
        .where(F.col("n") > max_bucket)
        .unionByName(probe_buckets.where(F.col("band_no") == -1))
        .orderBy(F.col("n").desc(), "band_no", "band_val")
        .limit(10)
    )


def band_bucket_counts(
    signatures: DataFrame, band_bytes: int = 1, n_blocks: int = 8
) -> DataFrame:
    """(band_no, band_val, n) — the band-bucket histogram of a
    signature relation, the relation ``MediaDedupIndexState`` maintains
    incrementally so each fold's contract scan never re-aggregates
    state (``probe_bucket_scan``)."""
    return (
        _banded(signatures, band_bytes, n_blocks // band_bytes)
        .groupBy("band_no", "band_val")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def dhash_pairs(
    signatures: DataFrame,
    max_hamming: int = 6,
    band_bytes: int = 1,
    max_bucket: int = 100_000,
    n_blocks: int = 8,
    probe: DataFrame | None = None,
    band_counts: DataFrame | None = None,
) -> DataFrame:
    """(lid, rid, hamming) — candidate pairs within ``max_hamming``
    bits, complete by pigeonhole: the ``n_blocks`` row-bytes band into
    ``n_bands = n_blocks / band_bytes`` exact-match blocks and any pair
    within distance ``n_bands - 1`` shares >= 1 band.  Asking for a
    ``max_hamming`` past that guarantee raises (widen the grid or
    shrink ``band_bytes``) — silently incomplete candidate sets are
    how perceptual dedup quietly under-merges.  ``n_blocks`` must match
    the producing ``dhash_signatures``' ``grid_h`` (a static parameter,
    not inferred — inferring it would cost a full extra decode pass).
    The bucket-skew bound is executable (module docstring).

    With ``probe`` set (a subset of ``signatures``), only pairs with at
    least one probe-side endpoint are generated and the banded join
    runs probe-bands × all-bands — the incremental-ingest shape where
    per-batch work is O(batch × collision) and accumulated state never
    re-self-joins (``streaming/media_index.py``).  Pairs are normalized
    (lid < rid) in both modes, so probe-mode output is a subset of the
    full relation row-for-row.

    ``band_counts`` (probe mode only) makes the bucket-skew contract
    scan BATCH-bounded: a maintained (band_no, band_val, n) relation
    counting ``signatures``'s live band buckets — the scan then checks
    only probe-side buckets against it (probe-sized aggregate +
    broadcast join, no full-state groupBy) instead of re-aggregating
    the whole band relation.  Complete by induction: bucket counts only
    change through buckets the batch touches (upserts add batch bands,
    retraction only shrinks), and the fold that would first push a
    bucket past the bound raises BEFORE its snapshot commits, so every
    untouched state bucket already passed an earlier fold's scan.  The
    induction assumes ``max_bucket`` is not TIGHTENED over existing
    state — after lowering it, run the full scan once (call without
    ``band_counts``; ``MediaDedupIndexState.validate_buckets`` is the
    repair verb)."""
    if band_bytes < 1:
        raise ValueError("dhash_pairs: band_bytes must be >= 1")
    if n_blocks % band_bytes != 0:
        raise ValueError(
            f"dhash_pairs: band_bytes={band_bytes} does not divide the "
            f"{n_blocks}-byte signature"
        )
    n_bands = n_blocks // band_bytes
    if max_hamming > n_bands - 1:
        raise ValueError(
            f"dhash_pairs: max_hamming={max_hamming} exceeds the "
            f"pigeonhole guarantee of {n_bands - 1} at {n_bands} bands "
            f"({band_bytes}-byte); shrink band_bytes or max_hamming"
        )
    banded = _banded(signatures, band_bytes, n_bands)
    probe_banded = (
        banded if probe is None else _banded(probe, band_bytes, n_bands)
    )
    if band_counts is None:
        scan = full_bucket_scan(banded, max_bucket)
    else:
        if probe is None:
            raise ValueError(
                "dhash_pairs: band_counts is the probe-mode "
                "batch-bounded contract scan — full mode must run the "
                "full scan (call without band_counts)"
            )
        scan = probe_bucket_scan(band_counts, probe_banded, max_bucket)
    _raise_band_offenders(
        scan.collect(), n_blocks, band_bytes, max_bucket
    )
    left = probe_banded.select(
        F.col("id").alias("_pid"),
        F.col("blocks").alias("_lb"),
        "band_no",
        "band_val",
    )
    right = banded.select(
        F.col("id").alias("_xid"),
        F.col("blocks").alias("_rb"),
        "band_no",
        "band_val",
    )
    # hamming is symmetric (popcount of XOR), so it can be computed
    # before the (lid, rid) normalization that dedups orientations
    hamming = F.aggregate(
        F.zip_with(
            "_lb", "_rb", lambda x, y: F.bit_count(x.bitwiseXOR(y))
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    ).cast("int")
    # full mode sees each pair in both orientations — keep one at the
    # join (halves the intermediate); probe mode must keep both (only
    # the probe side drives) and normalize after
    cond = (
        F.col("_pid") < F.col("_xid")
        if probe is None
        else F.col("_pid") != F.col("_xid")
    )
    return (
        left.join(right, ["band_no", "band_val"])
        .where(cond)
        .select(
            F.least("_pid", "_xid").alias("lid"),
            F.greatest("_pid", "_xid").alias("rid"),
            hamming.alias("hamming"),
        )
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )


def media_dedup_pairs(
    assets: DataFrame,
    max_hamming: int = 6,
    id_col: str = "asset_id",
    payload_col: str = "payload",
    **pair_kwargs,
) -> DataFrame:
    """End-to-end media near-dup: decode → dHash → banded Hamming
    pairs.  One map-only signature pass, one signature-sized band
    join — pixels never shuffle.  Signatures are localCheckpointed so
    the skew scan and the band join read the one decoded pass instead
    of re-decoding payloads (signatures are tens of bytes per asset;
    the decode is the expensive leg)."""
    sigs = dhash_signatures(
        assets, id_col=id_col, payload_col=payload_col
    ).localCheckpoint(eager=False)
    return dhash_pairs(sigs, max_hamming=max_hamming, **pair_kwargs)
