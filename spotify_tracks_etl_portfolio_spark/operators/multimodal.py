"""Multimodal column support: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``
operators (north star: multimodal training-data pipelines).

The Spark-side plumbing is real and tested — schema, partitioning, UDF
signatures, batch shapes. The actual codecs (PIL/ffmpeg/soundfile) are
NOT in this container, so decode is gated: ``decode_media(..., real=True)``
raises ``NotImplementedError`` where the codec call would go, and the
default path runs a deterministic fake decode (byte statistics) with the
exact same plumbing.

Scale notes: media bytes dominate row size — keep them in their own
column, never in join keys; ``mapInPandas`` streams Arrow batches so one
task never holds a partition of raw media in Python memory at once;
``maxRecordsPerBatch`` is the knob when media rows are MBs.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Literal

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Typed metadata carried alongside every media blob.
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("format", T.StringType(), True),  # png|wav|mp4|...
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
    ]
)


def attach_fake_media(
    df: DataFrame, text_col: str, media_type: str = "image"
) -> DataFrame:
    """Deterministic stand-in media: the utf-8 bytes of a text column as
    the blob + a metadata struct. Lets the whole pipeline run end-to-end
    in this container with real binary-typed data."""
    return df.withColumn("media", F.encode(F.col(text_col), "UTF-8")).withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit("raw").alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.lit(None).cast("int").alias("sample_rate"),
        ),
    )


FEATURE_SCHEMA = "id long, n_bytes long, mean_byte double, first_byte int"


def decode_media_features(
    df: DataFrame,
    id_col: str,
    media_col: str = "media",
    real: bool = False,
    codec=None,
    batch_size_hint: int | None = None,
) -> DataFrame:
    """Decode → feature-extract over Arrow batches via ``mapInPandas``.

    ``real=True`` marks where the codec integration goes (PIL decode,
    resize, frame sampling). The codec itself is INJECTED via ``codec``
    — a callable taking the batch's blob ``pd.Series`` and returning a
    ``pd.DataFrame`` with columns ``n_bytes, mean_byte, first_byte`` —
    so the integration seam is testable without shipping PIL/ffmpeg;
    with ``real=True`` and no codec the task raises
    ``NotImplementedError`` (codecs are not in this container). The
    default fake path computes deterministic byte statistics with
    identical batch shape and output schema, so everything downstream
    of decode is genuinely exercised.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if real:
                if codec is None:
                    raise NotImplementedError(
                        "media codecs (PIL/ffmpeg) are not available in this "
                        "container; integrate the real decode here"
                    )
                feats = codec(pdf[media_col])
                feats = feats.assign(id=pdf[id_col].astype("int64").values)
                yield feats[["id", "n_bytes", "mean_byte", "first_byte"]].astype(
                    {"id": "int64", "n_bytes": "int64",
                     "mean_byte": "float64", "first_byte": "int32"}
                )
                continue
            blobs = pdf[media_col]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].astype("int64"),
                    "n_bytes": blobs.map(len).astype("int64"),
                    "mean_byte": blobs.map(
                        lambda b: float(sum(b)) / len(b) if len(b) else 0.0
                    ),
                    "first_byte": blobs.map(
                        lambda b: int(b[0]) if len(b) else -1
                    ).astype("int32"),
                }
            )

    return df.select(id_col, media_col).mapInPandas(extract, FEATURE_SCHEMA)


def resize_stub(
    df: DataFrame,
    id_col: str,
    media_col: str = "media",
    target_bytes: int = 64,
) -> DataFrame:
    """'Resize' plumbing: truncate blobs to a fixed byte budget (stand-in
    for image resize / audio downsample) — shows the binary→binary
    mapInPandas shape."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].astype("int64"),
                    "media_small": pdf[media_col].map(lambda b: b[:target_bytes]),
                }
            )

    return df.select(id_col, media_col).mapInPandas(
        resize, "id long, media_small binary"
    )


def frame_sample_stub(
    df: DataFrame,
    id_col: str,
    media_col: str = "media",
    stride: int = 16,
    media_type: Literal["video", "audio"] = "video",
) -> DataFrame:
    """'Frame sampling' plumbing: one output row per strided offset
    (stand-in for video frame extraction) — shows the 1→N explode shape
    with binary payloads."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, frame_idx, frames = [], [], []
            for _id, blob in zip(pdf[id_col], pdf[media_col]):
                for fi, off in enumerate(range(0, len(blob), stride)):
                    ids.append(int(_id))
                    frame_idx.append(fi)
                    frames.append(blob[off : off + stride])
            yield pd.DataFrame(
                {"id": pd.Series(ids, dtype="int64"),
                 "frame_idx": pd.Series(frame_idx, dtype="int32"),
                 "frame": frames}
            )

    return df.select(id_col, media_col).mapInPandas(
        sample, "id long, frame_idx int, frame binary"
    )
