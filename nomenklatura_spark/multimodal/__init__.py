"""Multimodal (image/audio/video) column support.

Media assets are opaque ``binary`` payload columns with a typed metadata
struct riding alongside (``schema.ASSET_META``).  All heavy per-byte work
runs through Arrow-batched ``mapInPandas``.  Self-describing uncompressed
formats (BMP, binary PPM, WAV PCM16) decode for real in pure numpy —
pixel/sample statistics, nearest-neighbor resize; compressed codecs
(JPEG/PNG/MP3) raise ``NotImplementedError`` (no codec libraries in this
container) and the deterministic ``raw/v1`` fake format passes through.
"""

from nomenklatura_spark.multimodal.schema import (
    ASSET_SCHEMA,
    FEATURE_SCHEMA,
    assets_from_documents,
)
from nomenklatura_spark.multimodal.decode import (
    audio_stats,
    extract_features,
    frame_sample,
    image_stats,
    resize_image,
)

__all__ = [
    "ASSET_SCHEMA",
    "FEATURE_SCHEMA",
    "assets_from_documents",
    "audio_stats",
    "extract_features",
    "frame_sample",
    "image_stats",
    "resize_image",
]
