"""Multimodal (image/audio/video) column plumbing for training-data pipelines.

Media travels as an opaque ``binary`` column plus typed metadata. The Spark
side — schema, partitioning, Arrow batch shape, UDF signatures — is real and
tested. The codec layer is two-tier:

* UNCOMPRESSED formats decode for real, in pure numpy (no PIL/ffmpeg needed):
  PPM (P6) and BMP (24-bit BI_RGB, bottom-up rows + 4-byte row padding) to an
  (h, w, 3) uint8 array, and WAV (RIFF/fmt/data, 16-bit PCM) to an int16
  sample array. These are the wire formats a training pipeline's staging
  tier actually uses for decoded tensors at rest.
* COMPRESSED formats (JPEG/PNG/OGG/MP4) still raise ``NotImplementedError``
  from ``_decode_pixels`` — those codecs aren't in this container. Swap in a
  PIL/ffmpeg call there; nothing else changes.

``encode_ppm`` / ``encode_bmp`` / ``encode_wav`` synthesize deterministic
payloads (used by tests and the oracle-gated entry query: pixel values are
affine in (x, y, channel) with no mod-256 wraparound, so a SQL oracle can
verify the decoded checksum in closed form while Spark genuinely parses the
bytes).

Scale notes: media rows are large and skew-prone (one 4 GB video vs thousands
of thumbnails). ``repartition_by_size`` packs rows into balanced partitions by
cumulative byte size (salted round-robin over a size-weighted key), so one
Arrow batch never exceeds executor memory.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
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
    b"OggS": "audio/ogg",
    b"\x00\x00\x00\x18ftyp": "video/mp4",
    b"P6": "image/x-portable-pixmap",
    b"BM": "image/bmp",
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
    if b[:4] == b"RIFF":
        # RIFF container: bytes 8-12 name the form type (WAVE vs AVI )
        form = b[8:12]
        return "audio/wav" if form == b"WAVE" else "video/avi"
    for magic, mime in _MAGIC.items():
        if b[: len(magic)] == magic:
            return mime
    return "application/octet-stream"


# ------------------------------------------------------------------ codecs
# Pure-numpy decoders for the uncompressed formats; byte layouts follow the
# public format specs (netpbm P6; Windows BITMAPINFOHEADER; RIFF/WAVE PCM).


def _decode_ppm(payload: bytes) -> np.ndarray:
    """netpbm P6 → (h, w, 3) uint8. Header: 'P6' <w> <h> <maxval> with
    whitespace/comment separators, then a single whitespace byte, then raw
    RGB triplets row-major top-down."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # tokenize the three header ints, skipping '#' comments
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"only 8-bit PPM supported (maxval={maxval})")
    pos += 1  # exactly one whitespace byte after maxval
    n = w * h * 3
    raster = np.frombuffer(payload, dtype=np.uint8, count=n, offset=pos)
    return raster.reshape(h, w, 3)


def _decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BI_RGB BMP → (h, w, 3) uint8 in RGB order.
    Handles the two layout quirks a naive reader misses: rows are stored
    BOTTOM-UP (positive biHeight) and padded to 4-byte boundaries, and
    samples are BGR."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise ValueError("BITMAPCOREHEADER not supported")
    w, h_signed = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only uncompressed 24-bit BMP supported (bpp={bpp}, "
            f"compression={compression})"
        )
    h = abs(h_signed)
    row_bytes = (w * 3 + 3) & ~3
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=row_bytes * h, offset=data_off
    ).reshape(h, row_bytes)[:, : w * 3]
    img = rows.reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    if h_signed > 0:  # bottom-up storage
        img = img[::-1]
    return np.ascontiguousarray(img)


def _decode_wav(payload: bytes) -> tuple[int, int, np.ndarray]:
    """RIFF/WAVE 16-bit PCM → (sample_rate, n_channels, int16 samples).
    Walks chunks (fmt may be followed by LIST/fact before data)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, n_ch, bits, data = 12, None, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = pos + 8
        if cid == b"fmt ":
            fmt_tag, n_ch, rate = struct.unpack_from("<HHI", payload, body)
            bits = struct.unpack_from("<H", payload, body + 14)[0]
            if fmt_tag != 1 or bits != 16:
                raise NotImplementedError(
                    f"only 16-bit PCM WAV supported (fmt={fmt_tag}, bits={bits})"
                )
        elif cid == b"data":
            data = np.frombuffer(payload, dtype="<i2", count=size // 2, offset=body)
        pos = body + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    return rate, n_ch, data


def _decode_pixels(payload: bytes, mime: str) -> np.ndarray:
    """Decode an image payload to (h, w, 3) uint8. Real for the uncompressed
    formats; compressed codecs are environment-blocked (no PIL/ffmpeg in
    this container) — plug them in here."""
    if mime == "image/x-portable-pixmap":
        return _decode_ppm(payload)
    if mime == "image/bmp":
        return _decode_bmp(payload)
    raise NotImplementedError(
        f"media codec for {mime} not available in this environment; "
        "plug PIL/ffmpeg into multimodal._decode_pixels"
    )


# ----------------------------------------------------------------- encoders
# Deterministic synthetic payloads (tests + the oracle-gated entry query).
# Pixel/sample values are affine with small bounds — no mod-256 wraparound —
# so a SQL oracle can state the decoded checksum in closed form.


def encode_ppm(w: int, h: int, start: int) -> bytes:
    """P6 image with pixel(x, y, c) = start + x + y + c (caller keeps
    start + w + h + 3 <= 255)."""
    y, x, c = np.ogrid[0:h, 0:w, 0:3]
    img = (start + x + y + c).astype(np.uint8)
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def encode_bmp(w: int, h: int, start: int) -> bytes:
    """24-bit BI_RGB BMP with the same pixel values as encode_ppm (RGB
    content identical; storage is BGR bottom-up padded — the decoder's job)."""
    y, x, c = np.ogrid[0:h, 0:w, 0:3]
    img = (start + x + y + c).astype(np.uint8)
    row_bytes = (w * 3 + 3) & ~3
    raster = np.zeros((h, row_bytes), dtype=np.uint8)
    raster[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    data_off = 14 + 40
    file_size = data_off + row_bytes * h
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, data_off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, row_bytes * h,
                       2835, 2835, 0, 0)
    return header + info + raster.tobytes()


def encode_wav(n_samples: int, start: int, rate: int = 8000) -> bytes:
    """Mono 16-bit PCM with sample k = start + k (caller keeps
    start + n_samples < 32768)."""
    data = (start + np.arange(n_samples, dtype=np.int64)).astype("<i2")
    body = data.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    riff_size = 4 + (8 + len(fmt)) + (8 + len(body))
    return (
        b"RIFF" + struct.pack("<I", riff_size) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(body)) + body
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


def _resize_nearest(img: np.ndarray, th: int, tw: int) -> np.ndarray:
    """Deterministic nearest-neighbor resize (pixel-center sampling) — the
    pure-numpy stand-in for a PIL resize; same index math at any scale."""
    h, w = img.shape[:2]
    ys = ((np.arange(th) + 0.5) * h / th).astype(np.int64).clip(0, h - 1)
    xs = ((np.arange(tw) + 0.5) * w / tw).astype(np.int64).clip(0, w - 1)
    return img[ys][:, xs]


def decode_image_batch(
    df: DataFrame, target_size: tuple[int, int] | None = None
) -> DataFrame:
    """Image decode(+optional resize) over Arrow batches.

    Returns (media_id, height, width, pix_sum, pixels: binary). height/width
    are the NATIVE decoded dims; ``pix_sum`` sums every decoded byte at
    native size (the oracle-checkable invariant); ``pixels`` is the raw
    (h, w, 3) uint8 buffer, resized to ``target_size`` when given.
    Decode is real for PPM/BMP; compressed formats raise from the codec
    tier (environment-blocked, see module docstring).
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("height", T.IntegerType(), True),
            T.StructField("width", T.IntegerType(), True),
            T.StructField("pix_sum", T.LongType(), True),
            T.StructField("pixels", T.BinaryType(), True),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                mime = _sniff_mime(payload)
                img = _decode_pixels(payload, mime)
                h, w = img.shape[:2]
                pix_sum = int(img.sum(dtype=np.int64))
                if target_size is not None:
                    img = _resize_nearest(img, target_size[0], target_size[1])
                rows.append((mid, h, w, pix_sum, img.tobytes()))
            yield pd.DataFrame(
                rows, columns=["media_id", "height", "width", "pix_sum", "pixels"]
            )

    return df.mapInPandas(fn, schema=out_schema)


def decode_audio_batch(df: DataFrame) -> DataFrame:
    """WAV-PCM decode over Arrow batches: (media_id, sample_rate,
    n_channels, n_samples, amp_sum). ``amp_sum`` sums the int16 samples —
    the oracle-checkable invariant."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("sample_rate", T.IntegerType(), True),
            T.StructField("n_channels", T.IntegerType(), True),
            T.StructField("n_samples", T.LongType(), True),
            T.StructField("amp_sum", T.LongType(), True),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                rate, n_ch, data = _decode_wav(payload)
                rows.append(
                    (mid, rate, n_ch, len(data) // n_ch,
                     int(data.sum(dtype=np.int64)))
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "sample_rate", "n_channels", "n_samples",
                         "amp_sum"],
            )

    return df.mapInPandas(fn, schema=out_schema)


def repartition_by_size(
    df: DataFrame,
    payload_col: str = "payload",
    target_partition_bytes: int = 128 << 20,
) -> DataFrame:
    """Balance partitions by *bytes*, not rows: weight each row by its payload
    size and spread heavy rows round-robin. Prevents one 4 GB blob from
    pinning a partition while thumbnails starve the rest of the executors.

    Partition count comes from the source FILE LISTING when the frame scans
    files (sizes are free metadata from the already-done listing — at 100 TB
    an exact byte agg would be a full extra pass over the payloads before
    any work starts); the exact scalar agg is only the fallback for purely
    in-memory frames. Listing bytes are compressed/encoded so this slightly
    undercounts in-memory payload bytes — fine for a partition-count
    heuristic, and the conservative direction can be tuned via
    ``target_partition_bytes``."""
    total = 0
    files = df.inputFiles()
    if files:
        jvm = df.sparkSession._jvm
        hconf = df.sparkSession._jsc.hadoopConfiguration()
        for f in files:
            p = jvm.org.apache.hadoop.fs.Path(f)
            total += p.getFileSystem(hconf).getFileStatus(p).getLen()
    else:
        total = df.select(
            F.sum(F.coalesce(F.length(payload_col), F.lit(0))).alias("b")
        ).collect()[0]["b"] or 0
    n_parts = max(1, int(total // target_partition_bytes) + 1)
    # deterministic spread key: hash of id mixed with size bucket
    key = F.xxhash64(F.col("media_id"), F.length(payload_col))
    return df.repartition(n_parts, key)
