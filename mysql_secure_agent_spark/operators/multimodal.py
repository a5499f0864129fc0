"""Multimodal (image/audio/video) column plumbing for training-data pipelines.

Media travels as an opaque ``binary`` column plus typed metadata. The Spark
side — schema, partitioning, Arrow batch shape, UDF signatures — is real and
tested; the codec step (actual JPEG/PNG/WAV decode, resize, frame sampling)
is STUBBED: the image/audio libraries are not in this container, so
``decode_image_batch`` sniffs real magic bytes and computes real sizes/hashes
but raises ``NotImplementedError`` from ``_decode_pixels`` if asked for pixel
data. Swap ``_decode_pixels`` for a PIL/ffmpeg call in production; nothing
else changes.

Scale notes: media rows are large and skew-prone (one 4 GB video vs thousands
of thumbnails). ``repartition_by_size`` packs rows into balanced partitions by
cumulative byte size (salted round-robin over a size-weighted key), so one
Arrow batch never exceeds executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), True),  # image|audio|video|unknown
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

_MAGIC = {
    b"\xff\xd8\xff": "image/jpeg",
    b"\x89PNG": "image/png",
    b"GIF8": "image/gif",
    b"RIFF": "audio/wav",  # (or AVI; disambiguated at byte 8 in a real codec)
    b"OggS": "audio/ogg",
    b"\x00\x00\x00\x18ftyp": "video/mp4",
}

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("sha256", T.StringType(), True),
    ]
)


def _sniff_mime(b: bytes | None) -> str | None:
    if b is None:
        return None
    for magic, mime in _MAGIC.items():
        if b[: len(magic)] == magic:
            return mime
    return "application/octet-stream"


def _decode_pixels(payload: bytes, mime: str):
    """Real codec goes here (PIL.Image.open / soundfile / ffmpeg)."""
    raise NotImplementedError(
        f"media codec for {mime} not available in this environment; "
        "plug PIL/ffmpeg into multimodal._decode_pixels"
    )


def extract_media_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """binary → (mime, size, digest) via mapInPandas (Arrow batches; the
    per-element work is numpy/hashlib over memoryviews, not row-Python-in-Spark)."""
    import hashlib

    id_col = "media_id"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "mime": payloads.map(_sniff_mime),
                    "n_bytes": payloads.map(
                        lambda b: len(b) if b is not None else None
                    ).astype("Int64"),
                    "sha256": payloads.map(
                        lambda b: hashlib.sha256(b).hexdigest()
                        if b is not None
                        else None
                    ),
                }
            )

    return df.mapInPandas(fn, schema=MEDIA_META_SCHEMA)


def decode_image_batch(df: DataFrame, target_size: tuple[int, int] = (224, 224)):
    """Image decode+resize stage: correct plumbing, stubbed codec.

    Returns a DataFrame of (media_id, height, width, pixels: binary); calling
    an action raises NotImplementedError from the codec stub unless
    ``_decode_pixels`` is replaced.
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("height", T.IntegerType(), True),
            T.StructField("width", T.IntegerType(), True),
            T.StructField("pixels", T.BinaryType(), True),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                mime = _sniff_mime(payload)
                px = _decode_pixels(payload, mime)  # NotImplementedError here
                rows.append((mid, target_size[0], target_size[1], px))
            yield pd.DataFrame(
                rows, columns=["media_id", "height", "width", "pixels"]
            )

    return df.mapInPandas(fn, schema=out_schema)


def repartition_by_size(
    df: DataFrame,
    payload_col: str = "payload",
    target_partition_bytes: int = 128 << 20,
) -> DataFrame:
    """Balance partitions by *bytes*, not rows: weight each row by its payload
    size and spread heavy rows round-robin. Prevents one 4 GB blob from
    pinning a partition while thumbnails starve the rest of the executors."""
    total = df.select(
        F.sum(F.coalesce(F.length(payload_col), F.lit(0))).alias("b")
    ).collect()[0]["b"] or 0
    n_parts = max(1, int(total // target_partition_bytes) + 1)
    # deterministic spread key: hash of id mixed with size bucket
    key = F.xxhash64(F.col("media_id"), F.length(payload_col))
    return df.repartition(n_parts, key)
