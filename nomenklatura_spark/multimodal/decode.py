"""Decode / feature-extract / resize / frame-sample over binary media columns.

All functions are Arrow-batched (``mapInPandas`` over an iterator of
``pandas.DataFrame``) — the exact shape a real decoder (PIL / torchaudio /
pyav) would plug into.  Since those libs aren't in this container, the
pixel/sample decoders are stubbed: they raise ``NotImplementedError``
unless the payload is in the deterministic ``raw/v1`` fake format, whose
"decode" is a pure byte-slice transform.  Everything Spark-side — schema,
batch iteration, partitioning, output arity — is real and tested.

Scale notes (100 TB): per-row Python cost is amortised by Arrow batches
(``spark.sql.execution.arrow.maxRecordsPerBatch``); the input should be
repartitioned by size not row-count before the map (payloads are skewed),
and the transform is map-only — no shuffle is introduced.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

from nomenklatura_spark.multimodal.schema import FEATURE_SCHEMA, _CHUNK

_HEADER_LEN = 4

try:  # pragma: no cover - the container has no imaging libs
    import PIL.Image as _pil  # type: ignore  # noqa: F401

    _HAS_PIL = True
except Exception:  # pragma: no cover
    _HAS_PIL = False


def _decode_stub(codec: str, what: str) -> None:
    if codec != "raw/v1":
        raise NotImplementedError(
            f"real {what} decode needs an imaging/audio library "
            f"(codec={codec!r}); only the deterministic 'raw/v1' fake "
            "format is decodable in this environment"
        )


def decode_image(payload: bytes, codec: str = "raw/v1") -> bytes:
    """Stub image decode: raw/v1 payloads pass through; real codecs raise."""
    _decode_stub(codec, "image")
    return payload


def decode_audio(payload: bytes, codec: str = "raw/v1") -> bytes:
    _decode_stub(codec, "audio")
    return payload


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


def resize_image(
    assets: DataFrame, target_w: int = 64, target_h: int = 64
) -> DataFrame:
    """'Resize' images: real resample if PIL existed; raw/v1 fake resize is
    a deterministic byte truncation/pad to ``target_w*target_h`` bytes."""

    target = target_w * target_h

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if _HAS_PIL:  # pragma: no cover
                raise NotImplementedError("wire PIL resampling here")
            resized = pdf["payload"].map(
                lambda b: bytes(b[:target].ljust(target, b"\x00"))
            )
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "width": target_w,
                    "height": target_h,
                    "payload": resized,
                }
            )

    out_schema = "asset_id long, width int, height int, payload binary"
    return (
        assets.where("media_type = 'image'")
        .select("asset_id", "payload")
        .mapInPandas(_batches, out_schema)
    )
