"""Binary media columns + mapInPandas feature extraction.

Design for 100 TB of media: keep bytes out of shuffles (feature-extract
*before* any join/groupBy, project the binary column away immediately
after), size partitions by bytes not rows
(``spark.sql.files.maxPartitionBytes``), and let Arrow move batches to
Python — the per-batch loop below is the only Python in the path.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum", T.StringType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def attach_fake_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Derive a deterministic binary column from a text column (the
    container has no real media); schema and behavior match a real
    media table: (media_id, kind, content binary, meta struct)."""
    content = F.encode(F.col(text_col), "utf-8")
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col(id_col) % 3 + 1).cast("int"),
    )
    return df.select(
        F.col(id_col).alias("media_id"),
        kind.alias("kind"),
        content.alias("content"),
        F.struct(
            F.concat(F.lit("application/x-fake-"), kind).alias("mime"),
            F.octet_length(content).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def _decode_stub(content: bytes) -> list[float]:
    """Deterministic fake 8-dim feature: byte-histogram moments of the
    md5 digest. A real deployment swaps this for PIL/torchvision/ffmpeg
    work INSIDE the same batch loop — the Spark contract is identical."""
    digest = hashlib.md5(content).digest()
    return [b / 255.0 for b in digest[:8]]


def decode_real(content: bytes, kind: str):
    """The real decoder seam. Image/audio libs are absent here by
    design (see TASK constraints): plumbing is tested with the stub."""
    raise NotImplementedError(
        "real media decoding requires PIL/ffmpeg, not present in this container"
    )


def extract_features(media: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """Arrow-batched feature extraction over binary content.

    ``mapInPandas``: each Python worker receives pandas batches of the
    (pruned!) columns, computes features, and yields batches with an
    explicit output schema — no row pickling, no driver collect."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["content"].map(len).astype("int64"),
                    "checksum": pdf["content"].map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "feature": pdf["content"].map(
                        lambda b: _decode_stub(bytes(b))
                    ),
                }
            )
            yield out

    pruned = media.select("media_id", "kind", "content")
    return pruned.mapInPandas(run, FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_bytes", T.LongType()),
        T.StructField("frame_checksum", T.StringType()),
    ]
)


def sample_frames(
    media: DataFrame, frame_size: int = 1000, stride: int = 2
) -> DataFrame:
    """Video frame sampling plumbing: split content into fixed-size
    "frames", keep every ``stride``-th — a 1:N mapInPandas (each input
    row yields multiple frame rows). Real ffmpeg decode would replace
    the byte-slicing inside the same loop."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            out_rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                b = bytes(content)
                n_frames = (len(b) + frame_size - 1) // frame_size
                for i in range(0, n_frames, stride):
                    fb = b[i * frame_size : (i + 1) * frame_size]
                    out_rows.append(
                        (mid, i, len(fb), hashlib.md5(fb).hexdigest())
                    )
            yield pd.DataFrame(
                out_rows,
                columns=["media_id", "frame_idx", "frame_bytes", "frame_checksum"],
            )

    return media.select("media_id", "content").mapInPandas(run, FRAME_SCHEMA)


def resize_stub(media: DataFrame, max_bytes: int = 256) -> DataFrame:
    """Image "resize" plumbing: truncate content to ``max_bytes`` and
    update metadata — stands in for a PIL thumbnail inside the same
    mapInPandas loop. Pure-expression here (truncation IS expressible
    natively; a real resize would not be)."""
    resized = F.expr(f"substring(content, 1, {max_bytes})")
    return media.withColumn("content", resized).withColumn(
        "meta",
        F.struct(
            F.col("meta.mime").alias("mime"),
            F.octet_length(F.col("content")).cast("long").alias("n_bytes"),
        ),
    )
