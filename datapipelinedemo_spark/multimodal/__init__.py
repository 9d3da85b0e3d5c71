"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns with a typed metadata
struct; per-item compute (decode, resize, feature-extract,
frame-sample) runs in Arrow-batched ``mapInPandas`` so Python touches
columnar batches, never rows. The actual codecs are STUBBED in this
container (no PIL/ffmpeg): ``decode=`` selects a deterministic fake
featureizer, and the real decoder raises ``NotImplementedError`` — the
Spark-side contract (schema, batching, partitioning) is real and
tested either way.
"""

from datapipelinedemo_spark.multimodal.media import (  # noqa: F401
    MEDIA_SCHEMA,
    attach_fake_media,
    extract_features,
)
