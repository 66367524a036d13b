"""Multimodal column plumbing: image/audio/video as opaque binary.

The heavyweight decode libraries (PIL, torchaudio, ffmpeg) are NOT in
this container, so the lossy-codec kernels accept a pluggable decoder —
but the uncompressed-bitmap path is REAL end-to-end: a pure-Python
24-bit BMP codec (encode/decode/nearest-neighbor resize/feature
extraction, `bmp_*` below) runs inside the same ``mapInPandas``
plumbing a PIL kernel would, so schemas, Arrow batch shapes,
partitioning, and the driver correctness gate all exercise genuine
decode → transform → re-encode byte work.

Design for 100 TB: binaries ride in parquet as ``binary`` columns with
typed metadata alongside (width/height/sample_rate/...), so metadata
predicates prune at the scan WITHOUT touching blob bytes (column
pruning keeps the binary column unread until a decode stage needs it).
Decode stages are ``mapInPandas`` — one Arrow batch in, one out,
bounded memory via spark.sql.execution.arrow.maxRecordsPerBatch.

Reference analogue: Silk treats typed resource values as opaque blobs
with typed metadata in DataSource characteristics
(/root/reference/silk-core/src/main/scala/org/silkframework/dataset/
DataSourceCharacteristics.scala); the decode stages mirror its
transformer-on-column model applied to binary payloads.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

IMAGE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("data", BinaryType()),
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)

IMAGE_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("feature", ArrayType(FloatType())),
        StructField("feat_dim", IntegerType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("data", BinaryType()),
    ]
)


def synthetic_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table: blob bytes derived from the id
    (md5 chain), realistic metadata. Stands in for a real image store."""
    df = spark.range(0, n, 1)
    blob = F.unhex(F.repeat(F.md5(F.concat(F.lit(seed), F.col("id"))), 4))
    return df.select(
        F.col("id").alias("media_id"),
        blob.alias("data"),
        F.element_at(
            F.array(F.lit("png"), F.lit("jpeg"), F.lit("webp")),
            (F.pmod(F.xxhash64(F.lit(seed + 1), F.col("id")), F.lit(3)) + 1).cast("int"),
        ).alias("format"),
        (F.pmod(F.xxhash64(F.lit(seed + 2), F.col("id")), F.lit(1920)) + 1).cast("int").alias("width"),
        (F.pmod(F.xxhash64(F.lit(seed + 3), F.col("id")), F.lit(1080)) + 1).cast("int").alias("height"),
    )


def _fake_decode(data: bytes) -> list[float]:
    """Deterministic stand-in for image decode + embed: 8 floats from
    the blob bytes. Replace with PIL/torch decode on a real cluster."""
    if data is None:
        return []
    return [b / 255.0 for b in data[:8]]


def extract_image_features(df: DataFrame, real_decoder=None) -> DataFrame:
    """mapInPandas feature extraction. `real_decoder` slots in a real
    (PIL/torch) kernel; default uses the deterministic fake so the
    distributed plumbing is testable in this container."""
    decoder = real_decoder or _fake_decode

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = pdf["data"].map(decoder)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feature": feats,
                    "feat_dim": feats.map(len).astype("int32"),
                }
            )

    return df.mapInPandas(batches, IMAGE_FEATURE_SCHEMA)


# ---------- pure-Python 24-bit BMP codec (no external libs) ----------
#
# Windows BMP, BITMAPINFOHEADER, 24 bpp, uncompressed (BI_RGB): the one
# mainstream raster format decodable with stdlib `struct` alone. Pixel
# rows are stored bottom-up as BGR with each row zero-padded to a
# 4-byte boundary; the codec exposes top-down RGB byte strings.


def bmp_encode(width: int, height: int, rgb: bytes) -> bytes:
    """Encode top-down row-major RGB bytes (len == w*h*3) as a 24-bit
    BMP file."""
    if len(rgb) != width * height * 3:
        raise ValueError(f"need {width * height * 3} RGB bytes, got {len(rgb)}")
    row_raw = width * 3
    pad = (4 - row_raw % 4) % 4
    body = bytearray()
    for y in range(height - 1, -1, -1):  # bottom-up
        row = rgb[y * row_raw : (y + 1) * row_raw]
        for x in range(width):  # RGB -> BGR
            r, g, b = row[3 * x : 3 * x + 3]
            body += bytes((b, g, r))
        body += b"\x00" * pad
    pixel_offset = 14 + 40
    file_size = pixel_offset + len(body)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, pixel_offset)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + info + bytes(body)


def bmp_decode(data: bytes) -> tuple[int, int, bytes]:
    """Decode a 24-bit uncompressed BMP to (width, height, top-down RGB
    bytes). Handles both bottom-up (positive height, the normal case)
    and top-down (negative height) row order."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP file (missing 'BM' magic)")
    pixel_offset = struct.unpack_from("<I", data, 10)[0]
    hdr_size = struct.unpack_from("<I", data, 14)[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    width, height = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    compression = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24bpp BI_RGB supported (got bpp={bpp}, comp={compression})")
    topdown = height < 0
    height = abs(height)
    row_raw = width * 3
    stride = row_raw + (4 - row_raw % 4) % 4
    out = bytearray(width * height * 3)
    for y in range(height):
        src_y = y if topdown else height - 1 - y
        row = data[pixel_offset + src_y * stride : pixel_offset + src_y * stride + row_raw]
        for x in range(width):
            b, g, r = row[3 * x : 3 * x + 3]
            out[(y * width + x) * 3 : (y * width + x) * 3 + 3] = bytes((r, g, b))
    return width, height, bytes(out)


def bmp_resize_nearest(data: bytes, out_w: int, out_h: int) -> bytes:
    """Nearest-neighbor resize of a BMP blob, returning a BMP blob:
    source pixel = (floor(x*w/out_w), floor(y*h/out_h))."""
    w, h, rgb = bmp_decode(data)
    out = bytearray(out_w * out_h * 3)
    for y in range(out_h):
        sy = (y * h) // out_h
        for x in range(out_w):
            sx = (x * w) // out_w
            out[(y * out_w + x) * 3 : (y * out_w + x) * 3 + 3] = rgb[
                (sy * w + sx) * 3 : (sy * w + sx) * 3 + 3
            ]
    return bmp_encode(out_w, out_h, bytes(out))


def bmp_stats(data: bytes) -> tuple[int, int, float, int, int]:
    """Decode + pixel statistics: (width, height, mean byte, min byte,
    max byte) over the RGB pixel array."""
    w, h, rgb = bmp_decode(data)
    return w, h, sum(rgb) / len(rgb), min(rgb), max(rgb)


def bmp_feature_decoder(data: bytes) -> list[float]:
    """Real decode kernel for `extract_image_features`: per-channel
    means + global stats from the decoded pixel array."""
    w, h, rgb = bmp_decode(data)
    n = w * h
    return [
        float(w),
        float(h),
        sum(rgb[0::3]) / n,
        sum(rgb[1::3]) / n,
        sum(rgb[2::3]) / n,
        sum(rgb) / (3 * n),
        float(min(rgb)),
        float(max(rgb)),
    ]


MEDIA_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mean_byte", DoubleType()),
        StructField("min_byte", IntegerType()),
        StructField("max_byte", IntegerType()),
    ]
)


def bmp_media_from_ids(
    df: DataFrame, id_col: str = "media_id", width: int = 8, height: int = 8, salt: str = "silk-media"
) -> DataFrame:
    """Deterministic BMP blobs from an id column: pixel bytes are the
    md5 digest of '<salt>:<id>' repeated to fill w*h*3 — a reproducible
    stand-in for an image store whose byte math an independent oracle
    can recompute. Runs as mapInPandas exactly like a real fetch/decode
    stage would."""
    npix = width * height * 3

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            blobs = []
            for mid in pdf[id_col]:
                digest = hashlib.md5(f"{salt}:{mid}".encode()).digest()
                reps = (npix + len(digest) - 1) // len(digest)
                blobs.append(bmp_encode(width, height, (digest * reps)[:npix]))
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "data": blobs,
                    "format": "bmp",
                    "width": pd.Series([width] * len(pdf), dtype="int32"),
                    "height": pd.Series([height] * len(pdf), dtype="int32"),
                }
            )

    return df.mapInPandas(batches, IMAGE_SCHEMA)


def media_stats(df: DataFrame) -> DataFrame:
    """Decode every blob (REAL byte-level BMP parse) and emit pixel
    statistics — the decode → analyze stage of a media pipeline, with
    the binary column read only here (metadata queries upstream never
    touch it)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            stats = [bmp_stats(d) for d in pdf["data"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "width": pd.Series([s[0] for s in stats], dtype="int32"),
                    "height": pd.Series([s[1] for s in stats], dtype="int32"),
                    "mean_byte": [s[2] for s in stats],
                    "min_byte": pd.Series([s[3] for s in stats], dtype="int32"),
                    "max_byte": pd.Series([s[4] for s in stats], dtype="int32"),
                }
            )

    return df.mapInPandas(batches, MEDIA_STATS_SCHEMA)


def resize_images(df: DataFrame, width: int, height: int, kernel=None) -> DataFrame:
    """Nearest-neighbor image resize over the binary column. The
    default kernel is the pure-Python BMP codec (real decode →
    index-map → re-encode); pass `kernel(data, w, h) -> bytes` to slot
    in PIL/opencv for lossy formats on a real cluster."""
    resize = kernel or bmp_resize_nearest

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "data": [resize(d, width, height) for d in pdf["data"]],
                    "format": pdf["format"],
                    "width": pd.Series([width] * len(pdf), dtype="int32"),
                    "height": pd.Series([height] * len(pdf), dtype="int32"),
                }
            )

    return df.mapInPandas(batches, IMAGE_SCHEMA)


def sample_frames(df: DataFrame, every_n: int = 10, max_frames: int = 4) -> DataFrame:
    """Video frame sampling stub with REAL fan-out plumbing: each media
    row yields `max_frames` frame rows (deterministic fake frame bytes);
    a real ffmpeg kernel replaces `_fake_frame` only."""

    def _fake_frame(data: bytes, idx: int) -> bytes:
        return bytes([(b + idx) % 256 for b in (data or b"")[:16]])

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {"media_id": [], "frame_idx": [], "data": []}
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                for k in range(max_frames):
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(k * every_n)
                    rows["data"].append(_fake_frame(data, k * every_n))
            yield pd.DataFrame(rows)

    return df.mapInPandas(batches, FRAME_SCHEMA)

# ---------- pure-Python 16-bit PCM WAV codec (no external libs) ----------
#
# RIFF/WAVE, mono, 16-bit signed little-endian PCM — like BMP, the one
# mainstream audio container decodable with stdlib `struct` alone, so
# the audio half of the multimodal family is REAL byte work end-to-end
# (a torchaudio/ffmpeg kernel slots into the same mapInPandas stages
# for lossy formats on a real cluster).


def wav_encode(sample_rate: int, samples: list[int]) -> bytes:
    """Encode signed 16-bit samples as a mono RIFF/WAVE PCM file."""
    body = struct.pack(f"<{len(samples)}h", *samples)
    byte_rate = sample_rate * 2
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, byte_rate, 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(body))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(body)) + body
    )


def wav_decode(data: bytes) -> tuple[int, list[int]]:
    """Decode a mono 16-bit PCM WAV to (sample_rate, samples), walking
    the RIFF chunk list (a real encoder may insert LIST/fact chunks
    between fmt and data)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, sample_rate, samples = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        if cid == b"fmt ":
            audio_fmt, channels, sample_rate = struct.unpack_from("<HHI", data, pos + 8)
            bits = struct.unpack_from("<H", data, pos + 8 + 14)[0]
            if audio_fmt != 1 or channels != 1 or bits != 16:
                raise ValueError(
                    f"only mono 16-bit PCM supported (fmt={audio_fmt}, ch={channels}, bits={bits})"
                )
        elif cid == b"data":
            n = size // 2
            samples = list(struct.unpack_from(f"<{n}h", data, pos + 8))
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if sample_rate is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    return sample_rate, samples


def wav_downsample_nearest(data: bytes, out_n: int) -> bytes:
    """Nearest-neighbor downsample of a WAV blob to `out_n` samples
    (source sample j = floor(j*n/out_n)), returning a WAV blob with the
    sample rate scaled so duration is preserved."""
    rate, samples = wav_decode(data)
    n = len(samples)
    out = [samples[(j * n) // out_n] for j in range(out_n)]
    return wav_encode(max((rate * out_n) // n, 1), out)


def wav_stats(data: bytes) -> tuple[int, int, float, float, int]:
    """Decode + signal statistics: (sample_rate, n_samples, mean,
    rms, peak_abs) over the signed sample values."""
    rate, s = wav_decode(data)
    n = len(s)
    rms = (sum(v * v for v in s) / n) ** 0.5
    return rate, n, sum(s) / n, rms, max(abs(v) for v in s)


AUDIO_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", IntegerType()),
        StructField("mean_sample", DoubleType()),
        StructField("rms", DoubleType()),
        StructField("peak_abs", IntegerType()),
    ]
)


def wav_media_from_ids(
    df: DataFrame,
    id_col: str = "media_id",
    n_samples: int = 16,
    sample_rate: int = 8000,
    salt: str = "silk-audio",
) -> DataFrame:
    """Deterministic WAV blobs from an id column: sample k is the
    signed int16 at bytes (2k, 2k+1) of the md5 digest of
    '<salt>:<id>' repeated to length — the audio twin of
    `bmp_media_from_ids`, byte math an independent oracle can
    recompute. Runs as mapInPandas exactly like a real fetch stage."""
    nbytes = n_samples * 2

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            blobs = []
            for mid in pdf[id_col]:
                digest = hashlib.md5(f"{salt}:{mid}".encode()).digest()
                reps = (nbytes + len(digest) - 1) // len(digest)
                raw = (digest * reps)[:nbytes]
                blobs.append(
                    wav_encode(sample_rate, list(struct.unpack(f"<{n_samples}h", raw)))
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "data": blobs,
                    "format": "wav",
                    "width": pd.Series([sample_rate] * len(pdf), dtype="int32"),
                    "height": pd.Series([n_samples] * len(pdf), dtype="int32"),
                }
            )

    return df.mapInPandas(batches, IMAGE_SCHEMA)


def audio_stats(df: DataFrame) -> DataFrame:
    """Decode every blob (REAL RIFF/PCM parse) and emit signal
    statistics — the audio analyze stage, binary column read only
    here."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            stats = [wav_stats(d) for d in pdf["data"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "sample_rate": pd.Series([s[0] for s in stats], dtype="int32"),
                    "n_samples": pd.Series([s[1] for s in stats], dtype="int32"),
                    "mean_sample": [s[2] for s in stats],
                    "rms": [s[3] for s in stats],
                    "peak_abs": pd.Series([s[4] for s in stats], dtype="int32"),
                }
            )

    return df.mapInPandas(batches, AUDIO_STATS_SCHEMA)


def downsample_audio(df: DataFrame, out_n: int, kernel=None) -> DataFrame:
    """Nearest-neighbor audio downsample over the binary column; the
    default kernel is the pure-Python WAV codec — pass
    `kernel(data, out_n) -> bytes` to slot in a resampling library."""
    ds = kernel or wav_downsample_nearest

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "data": [ds(d, out_n) for d in pdf["data"]],
                    "format": pdf["format"],
                    "width": pdf["width"],
                    "height": pd.Series([out_n] * len(pdf), dtype="int32"),
                }
            )

    return df.mapInPandas(batches, IMAGE_SCHEMA)
