"""Multimodal (image/audio/video) column support.

Media assets are opaque ``binary`` payload columns with a typed metadata
struct riding alongside (``schema.ASSET_META``).  All heavy per-byte work
runs through Arrow-batched ``mapInPandas`` so the plumbing (schema,
partitioning, batch shape) is identical to what a real decoder would use;
the actual pixel/sample decode is stubbed (no image/audio libs in this
container) behind :func:`decode.decode_image` / :func:`decode.decode_audio`.
"""

from nomenklatura_spark.multimodal.schema import (
    ASSET_SCHEMA,
    FEATURE_SCHEMA,
    assets_from_documents,
)
from nomenklatura_spark.multimodal.decode import (
    extract_features,
    frame_sample,
    resize_image,
)

__all__ = [
    "ASSET_SCHEMA",
    "FEATURE_SCHEMA",
    "assets_from_documents",
    "extract_features",
    "frame_sample",
    "resize_image",
]
