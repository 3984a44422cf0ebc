"""Decode / feature-extract / resize / frame-sample over binary media columns.

All functions are Arrow-batched (``mapInPandas`` over an iterator of
``pandas.DataFrame``) — the exact shape a production decoder stack plugs
into.  Self-describing uncompressed formats are decoded for real, in
pure numpy (no imaging/audio libraries required):

- **BMP** (24-bit uncompressed, the classic DIB layout: bottom-up rows,
  4-byte row padding) — ``decode_bmp`` / ``encode_bmp``
- **PPM** (binary P6) — ``decode_ppm`` / ``encode_ppm``
- **WAV** (RIFF, 16-bit PCM) — ``decode_wav`` / ``encode_wav``

Compressed codecs (JPEG/PNG/MP3/H.264) genuinely need external codec
libraries, which this container does not have — those raise
``NotImplementedError``; the deterministic ``raw/v1`` fake format
passes through as bytes.  ``image_stats`` / ``audio_stats`` /
``resize_image`` run the real decoders inside the mapInPandas batch
loop, so the Spark-side plumbing exercises genuine pixel/sample math.

Scale notes (100 TB): per-row Python cost is amortised by Arrow batches
(``spark.sql.execution.arrow.maxRecordsPerBatch``); the input should be
repartitioned by size not row-count before the map (payloads are skewed),
and the transform is map-only — no shuffle is introduced.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

from nomenklatura_spark.multimodal.schema import FEATURE_SCHEMA, _CHUNK

_HEADER_LEN = 4


# --- pure-numpy codecs ------------------------------------------------------


def encode_bmp(pixels: np.ndarray) -> bytes:
    """H×W×3 uint8 (RGB) → 24-bit uncompressed BMP bytes."""
    h, w, c = pixels.shape
    assert c == 3
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    # BMP stores BGR, bottom row first, each row padded to 4 bytes
    bgr = pixels[::-1, :, ::-1]
    rows = np.zeros((h, row_bytes + pad), dtype=np.uint8)
    rows[:, :row_bytes] = bgr.reshape(h, row_bytes)
    data = rows.tobytes()
    size = 14 + 40 + len(data)
    header = struct.pack("<2sIHHI", b"BM", size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835,
                       2835, 0, 0)
    return header + info + data


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP bytes → H×W×3 uint8 (RGB)."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = struct.unpack_from("<I", payload, 10)[0]
    (hdr_sz, w, h, _planes, bpp, compression) = struct.unpack_from(
        "<IiiHHI", payload, 14
    )
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only 24-bit uncompressed BMP is supported (bpp={bpp}, "
            f"compression={compression})"
        )
    flip = h > 0
    h = abs(h)
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    rows = np.frombuffer(payload, dtype=np.uint8, count=h * stride,
                         offset=offset).reshape(h, stride)
    bgr = rows[:, :row_bytes].reshape(h, w, 3)
    if flip:
        bgr = bgr[::-1]
    return bgr[:, :, ::-1].copy()


def encode_ppm(pixels: np.ndarray) -> bytes:
    h, w, c = pixels.shape
    assert c == 3
    return f"P6\n{w} {h}\n255\n".encode() + pixels.astype(np.uint8).tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    if payload[:2] != b"P6":
        raise ValueError("not a binary PPM payload")
    # header: magic, whitespace-separated width/height/maxval, one ws byte
    parts: list[bytes] = []
    i = 2
    while len(parts) < 3:
        while payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":  # comment line
            i = payload.index(b"\n", i) + 1
            continue
        j = i
        while not payload[j : j + 1].isspace():
            j += 1
        parts.append(payload[i:j])
        i = j
    i += 1  # single whitespace after maxval
    w, h = int(parts[0]), int(parts[1])
    return (
        np.frombuffer(payload, dtype=np.uint8, count=h * w * 3, offset=i)
        .reshape(h, w, 3)
        .copy()
    )


def encode_wav(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """int16 mono PCM samples → RIFF/WAVE bytes."""
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """RIFF 16-bit PCM → (sample_rate, int16 samples).  Walks the chunk
    list, so extra chunks (LIST, fact) are skipped like a real parser."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    i = 12
    rate: int | None = None
    bits = channels = 0
    fmt_code = 1
    samples: np.ndarray | None = None
    while i + 8 <= len(payload):
        cid, clen = payload[i : i + 4], struct.unpack_from("<I", payload, i + 4)[0]
        body = payload[i + 8 : i + 8 + clen]
        if cid == b"fmt ":
            fmt_code, channels, rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", body
            )
        elif cid == b"data":
            samples = np.frombuffer(body, dtype="<i2").copy()
        i += 8 + clen + (clen % 2)
    if rate is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    if fmt_code != 1 or bits != 16 or channels != 1:
        raise NotImplementedError(
            f"only 16-bit mono PCM is supported (fmt={fmt_code}, "
            f"bits={bits}, channels={channels})"
        )
    return rate, samples


def sniff_codec(payload: bytes) -> str | None:
    """Identify a self-describing payload by magic bytes."""
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:2] == b"P6":
        return "ppm"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    return None


def decode_image(payload: bytes, codec: str = "auto"):
    """Image decode: BMP/PPM → H×W×3 uint8 numpy array (real pixel
    decode, no external libs); ``raw/v1`` passes through as bytes;
    compressed codecs raise (no codec libraries in this container)."""
    if codec == "auto":
        codec = sniff_codec(payload) or "raw/v1"
    if codec == "bmp":
        return decode_bmp(payload)
    if codec == "ppm":
        return decode_ppm(payload)
    if codec == "raw/v1":
        return payload
    raise NotImplementedError(
        f"image codec {codec!r} needs an external codec library"
    )


def decode_audio(payload: bytes, codec: str = "auto"):
    """Audio decode: WAV PCM16 → (rate, int16 samples); ``raw/v1``
    passes through; compressed codecs raise."""
    if codec == "auto":
        codec = sniff_codec(payload) or "raw/v1"
    if codec == "wav":
        return decode_wav(payload)
    if codec == "raw/v1":
        return payload
    raise NotImplementedError(
        f"audio codec {codec!r} needs an external codec library"
    )


def extract_features(assets: DataFrame) -> DataFrame:
    """Per-asset byte-level features via Arrow-batched mapInPandas.

    Deliberately computes only byte-verifiable features (length, header
    prefix, chunk count) so the whole pipeline has an exact SQL oracle;
    a real deployment would swap the body for embedding extraction while
    keeping the identical mapInPandas contract.
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "header": payloads.map(
                        lambda b: b[:_HEADER_LEN].decode("utf-8", "replace")
                    ),
                    "n_chunks": payloads.map(
                        lambda b: len(b) // _CHUNK + 1
                    ).astype("int32"),
                }
            )

    return assets.select("asset_id", "media_type", "payload").mapInPandas(
        _batches, FEATURE_SCHEMA
    )


def frame_sample(
    assets: DataFrame, every_n: int = 4, max_frames: int = 8
) -> DataFrame:
    """Sample every-nth fixed-size chunk ("frame") from each video payload.

    Output explodes one row per sampled frame with the frame bytes — the
    shape a vision-model preprocessing stage consumes.  Map-only; the
    fan-out factor is bounded by ``max_frames``.
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                n = len(payload) // _CHUNK + 1
                taken = 0
                for i in range(0, n, every_n):
                    if taken >= max_frames:
                        break
                    frames.append(bytes(payload[i * _CHUNK : (i + 1) * _CHUNK]))
                    ids.append(aid)
                    idxs.append(i)
                    taken += 1
            yield pd.DataFrame(
                {"asset_id": ids, "frame_index": idxs, "frame": frames}
            )

    out_schema = "asset_id long, frame_index int, frame binary"
    return (
        assets.where("media_type = 'video'")
        .select("asset_id", "payload")
        .mapInPandas(_batches, out_schema)
    )


def _resample_nearest(px: np.ndarray, w: int, h: int) -> np.ndarray:
    sh, sw = px.shape[:2]
    rows = (np.arange(h) * sh) // h
    cols = (np.arange(w) * sw) // w
    return px[rows][:, cols]


def resize_image(
    assets: DataFrame, target_w: int = 64, target_h: int = 64
) -> DataFrame:
    """Resize images: BMP/PPM payloads get a real nearest-neighbor
    resample (pure numpy) and are re-encoded in the same format; the
    ``raw/v1`` fake format keeps its deterministic byte truncation/pad
    to ``target_w*target_h`` bytes."""

    target = target_w * target_h

    def _one(b: bytes) -> bytes:
        codec = sniff_codec(b)
        if codec == "bmp":
            return encode_bmp(_resample_nearest(decode_bmp(b), target_w, target_h))
        if codec == "ppm":
            return encode_ppm(_resample_nearest(decode_ppm(b), target_w, target_h))
        return bytes(b[:target].ljust(target, b"\x00"))

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "width": target_w,
                    "height": target_h,
                    "payload": pdf["payload"].map(_one),
                }
            )

    out_schema = "asset_id long, width int, height int, payload binary"
    return (
        assets.where("media_type = 'image'")
        .select("asset_id", "payload")
        .mapInPandas(_batches, out_schema)
    )


def image_stats(assets: DataFrame) -> DataFrame:
    """Real pixel statistics for decodable image payloads (BMP/PPM):
    width, height, per-channel means, global min/max.  Non-decodable
    payloads yield NULL stats instead of failing the batch — at corpus
    scale a decoder stage must be poison-pill tolerant."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "asset_id": pdf["asset_id"], "codec": [], "width": [],
                "height": [], "mean_r": [], "mean_g": [], "mean_b": [],
                "min_px": [], "max_px": [],
            }
            for b in pdf["payload"]:
                codec = sniff_codec(b)
                try:
                    px = decode_image(bytes(b)) if codec in ("bmp", "ppm") else None
                except (ValueError, NotImplementedError, IndexError,
                        struct.error):
                    # truncated headers raise struct/index errors — same
                    # poison-pill contract as the codec errors
                    px = None
                if isinstance(px, np.ndarray):
                    means = px.reshape(-1, 3).mean(axis=0)
                    out["codec"].append(codec)
                    out["width"].append(px.shape[1])
                    out["height"].append(px.shape[0])
                    out["mean_r"].append(round(float(means[0]), 4))
                    out["mean_g"].append(round(float(means[1]), 4))
                    out["mean_b"].append(round(float(means[2]), 4))
                    out["min_px"].append(int(px.min()))
                    out["max_px"].append(int(px.max()))
                else:
                    out["codec"].append(codec)
                    for k in ("width", "height", "mean_r", "mean_g",
                              "mean_b", "min_px", "max_px"):
                        out[k].append(None)
            yield pd.DataFrame(out)

    out_schema = (
        "asset_id long, codec string, width int, height int, mean_r double, "
        "mean_g double, mean_b double, min_px int, max_px int"
    )
    return (
        assets.where("media_type = 'image'")
        .select("asset_id", "payload")
        .mapInPandas(_batches, out_schema)
    )


def audio_stats(assets: DataFrame) -> DataFrame:
    """Real sample statistics for WAV PCM16 payloads: sample rate, count,
    duration, RMS and peak amplitude.  Non-decodable payloads yield NULL
    stats (same poison-pill contract as ``image_stats``)."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "asset_id": pdf["asset_id"], "sample_rate": [],
                "n_samples": [], "duration_ms": [], "rms": [], "peak": [],
            }
            for b in pdf["payload"]:
                try:
                    rate, samples = decode_wav(bytes(b))
                except (ValueError, NotImplementedError, IndexError,
                        struct.error):
                    rate, samples = None, None
                if samples is None or rate is None or not len(samples):
                    for k in ("sample_rate", "n_samples", "duration_ms",
                              "rms", "peak"):
                        out[k].append(None)
                    continue
                x = samples.astype(np.float64)
                out["sample_rate"].append(rate)
                out["n_samples"].append(len(samples))
                out["duration_ms"].append(int(len(samples) * 1000 / rate))
                out["rms"].append(round(float(np.sqrt((x * x).mean())), 4))
                # widen before abs: np.abs(int16 -32768) overflows to -32768
                out["peak"].append(int(np.abs(samples.astype(np.int32)).max()))
            yield pd.DataFrame(out)

    out_schema = (
        "asset_id long, sample_rate int, n_samples int, duration_ms int, "
        "rms double, peak int"
    )
    return (
        assets.where("media_type = 'audio'")
        .select("asset_id", "payload")
        .mapInPandas(_batches, out_schema)
    )


def synthetic_bmp_assets(
    docs: DataFrame, width: int = 18, height: int = 6
) -> DataFrame:
    """Deterministic real-BMP assets: per document, a ``height×width``
    RGB image whose pixel bytes are the md5 stream
    ``md5(doc_id + ':px:' + chunk)`` — reproducible by any engine from
    hex arithmetic alone, so a query that DECODES the BMP (the real
    codec path) can still be value-checked against a SQL oracle that
    never parses BMP."""
    import hashlib

    n = width * height * 3
    n_chunks = -(-n // 16)

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for doc_id in pdf["doc_id"]:
                stream = b"".join(
                    hashlib.md5(f"{doc_id}:px:{i}".encode()).digest()
                    for i in range(n_chunks)
                )
                px = np.frombuffer(stream[:n], dtype=np.uint8).reshape(
                    height, width, 3
                )
                payloads.append(encode_bmp(px))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["doc_id"],
                    "media_type": "image",
                    "payload": payloads,
                }
            )

    out_schema = "asset_id long, media_type string, payload binary"
    return docs.select("doc_id").mapInPandas(_batches, out_schema)


def synthetic_media_pair_assets(
    docs: DataFrame,
    width: int = 18,
    height: int = 6,
    perturb_every: int = 5,
) -> DataFrame:
    """Deterministic near-duplicate asset PAIRS for the media dedup
    tier: per document, the md5 pixel stream of ``synthetic_bmp_assets``
    encoded twice — asset ``2*doc_id`` as BMP and asset ``2*doc_id + 1``
    as PPM (cross-FORMAT duplicates: same pixels, different container
    bytes, so only a decoder can match them).  Every
    ``perturb_every``-th document's PPM copy additionally flips pixel
    byte 0 by +128 mod 256 (a visible single-channel edit → a
    near-duplicate at small Hamming distance instead of an exact pixel
    copy).  Both the stream and the perturbation are pure hex
    arithmetic, so a SQL oracle replays the pixels without parsing
    BMP or PPM."""
    import hashlib

    n = width * height * 3
    n_chunks = -(-n // 16)

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, kinds, payloads = [], [], []
            for doc_id in pdf["doc_id"]:
                stream = b"".join(
                    hashlib.md5(f"{doc_id}:px:{i}".encode()).digest()
                    for i in range(n_chunks)
                )
                px = np.frombuffer(stream[:n], dtype=np.uint8).reshape(
                    height, width, 3
                )
                ids.append(2 * doc_id)
                kinds.append("image")
                payloads.append(encode_bmp(px))
                px2 = px.copy()
                if doc_id % perturb_every == 0:
                    px2[0, 0, 0] = (int(px2[0, 0, 0]) + 128) % 256
                ids.append(2 * doc_id + 1)
                kinds.append("image")
                payloads.append(encode_ppm(px2))
            yield pd.DataFrame(
                {
                    "asset_id": ids,
                    "media_type": kinds,
                    "payload": payloads,
                }
            )

    out_schema = "asset_id long, media_type string, payload binary"
    return docs.select("doc_id").mapInPandas(_batches, out_schema)


def synthetic_wav_pair_assets(
    docs: DataFrame,
    n_samples: int = 200,
    sample_rate: int = 8000,
    perturb_every: int = 5,
) -> DataFrame:
    """Near-duplicate WAV pairs for the audio dedup tier: per document,
    the md5 sample stream of ``synthetic_wav_assets`` encoded twice —
    asset ``2*doc_id`` verbatim and asset ``2*doc_id + 1`` re-encoded
    at DOUBLE the sample rate header (same samples, different container
    metadata — only a decoder sees they match), with every
    ``perturb_every``-th document's copy additionally bumping sample 0
    by +1 with exact int16 wraparound.  Pure hex arithmetic, so a SQL
    oracle replays the samples without parsing RIFF."""
    import hashlib

    n_bytes = n_samples * 2
    n_chunks = -(-n_bytes // 16)

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, kinds, payloads = [], [], []
            for doc_id in pdf["doc_id"]:
                stream = b"".join(
                    hashlib.md5(f"{doc_id}:au:{i}".encode()).digest()
                    for i in range(n_chunks)
                )
                samples = np.frombuffer(stream[:n_bytes], dtype="<i2")
                ids.append(2 * doc_id)
                kinds.append("audio")
                payloads.append(encode_wav(samples, sample_rate))
                s2 = samples.copy()
                if doc_id % perturb_every == 0:
                    # exact int16 wraparound, replayable relationally
                    s2[0] = np.int16((int(s2[0]) + 1 + 32768) % 65536
                                     - 32768)
                ids.append(2 * doc_id + 1)
                kinds.append("audio")
                payloads.append(encode_wav(s2, sample_rate * 2))
            yield pd.DataFrame(
                {
                    "asset_id": ids,
                    "media_type": kinds,
                    "payload": payloads,
                }
            )

    out_schema = "asset_id long, media_type string, payload binary"
    return docs.select("doc_id").mapInPandas(_batches, out_schema)


def synthetic_wav_assets(
    docs: DataFrame, n_samples: int = 200, sample_rate: int = 8000
) -> DataFrame:
    """Deterministic real-WAV assets: per document, ``n_samples`` int16
    PCM samples whose little-endian bytes are the md5 stream
    ``md5(doc_id + ':au:' + chunk)`` — same oracle device as
    ``synthetic_bmp_assets``, for the audio codec path."""
    import hashlib

    n_bytes = n_samples * 2
    n_chunks = -(-n_bytes // 16)

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for doc_id in pdf["doc_id"]:
                stream = b"".join(
                    hashlib.md5(f"{doc_id}:au:{i}".encode()).digest()
                    for i in range(n_chunks)
                )
                samples = np.frombuffer(stream[:n_bytes], dtype="<i2")
                payloads.append(encode_wav(samples, sample_rate))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["doc_id"],
                    "media_type": "audio",
                    "payload": payloads,
                }
            )

    out_schema = "asset_id long, media_type string, payload binary"
    return docs.select("doc_id").mapInPandas(_batches, out_schema)
