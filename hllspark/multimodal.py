"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata structs;
decode / feature-extract / resize / frame-sample run as Arrow-batched
functions over mapInPandas.  The actual codec step is STUBBED in this
container (no PIL/ffmpeg/librosa available): ``decoder='fake'`` produces a
deterministic decode from the bytes themselves so the Spark-side plumbing —
schema, batching, partitioning, UDF signatures — is real and tested, while
``decoder='real'`` raises NotImplementedError at the clearly marked seam
where PIL/ffmpeg calls belong.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "media_id bigint, kind string, payload binary, width int, height int, "
    "sample_rate int, n_frames int"
)

FEATURE_DIM = 16


def synthesize_media(spark, n: int, num_partitions: int = 8) -> DataFrame:
    """Deterministic fake media table (binary payload = seeded byte pattern)."""
    df = spark.range(n, numPartitions=num_partitions)
    kind = F.element_at(
        F.lit(["image", "audio", "video"]), (F.col("id") % 3 + 1).cast("int")
    )
    payload = F.encode(
        F.concat(F.lit("MEDIA:"), F.col("id").cast("string"), F.lit(":PAYLOAD")),
        "utf-8",
    )
    return df.select(
        F.col("id").alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1920)) + 1).cast("int").alias("width"),
        (F.pmod(F.xxhash64("id", F.lit(2)), F.lit(1080)) + 1).cast("int").alias("height"),
        F.lit(16000).alias("sample_rate"),
        (F.pmod(F.xxhash64("id", F.lit(3)), F.lit(300)) + 1).cast("int").alias("n_frames"),
    )


def _decode_bytes_fake(payload: bytes) -> np.ndarray:
    """Deterministic stand-in decode: bytes -> pseudo-pixel array."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    reps = int(np.ceil(64 / max(len(arr), 1)))
    return np.tile(arr, reps)[:64].astype(np.float32)


def extract_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    decoder: str = "fake",
) -> DataFrame:
    """media rows -> (id, feature array<float>) via Arrow-batched
    mapInPandas.  Batch shape: whole Arrow batches, one numpy pass per
    batch — no per-row Python beyond the byte-object iteration that any
    codec call requires.

    ``decoder='real'`` (round 4) actually decodes the codec-free
    formats — PNG via stdlib zlib + numpy defiltering, WAV PCM16 via raw
    slicing (decode_png / decode_wav below) — and raises at the
    documented seam only for formats that genuinely need a codec library
    (JPEG's DCT, video).  ``decoder='fake'`` keeps the deterministic
    byte-pattern stand-in for plumbing tests."""
    if decoder not in ("fake", "real"):
        raise ValueError(f"unknown decoder {decoder!r}")

    def _bucket_means(raw: np.ndarray) -> np.ndarray:
        if len(raw) < FEATURE_DIM:
            raw = np.pad(raw, (0, FEATURE_DIM - len(raw)))
        idx = (np.arange(FEATURE_DIM, dtype=np.int64) * len(raw)) // FEATURE_DIM
        sums = np.add.reduceat(raw.astype(np.float64), idx)
        counts = np.diff(np.r_[idx, len(raw)])
        return (sums / counts).astype(np.float32)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            feats = []
            for payload in pdf[payload_col]:
                b = bytes(payload)
                if decoder == "fake":
                    raw = _decode_bytes_fake(b)
                    # pseudo feature: FEATURE_DIM bucket means of the decode
                    feats.append(
                        raw.reshape(FEATURE_DIM, -1).mean(axis=1).astype(np.float32)
                    )
                    continue
                fmt = sniff_format(b)
                if fmt == "png":
                    raw = decode_png(b).astype(np.float32).ravel()
                elif fmt == "wav":
                    raw = decode_wav(b)[1].astype(np.float32)
                else:
                    raise NotImplementedError(
                        f"real decode of {fmt!r} requires a codec library "
                        "(JPEG DCT / video) — the one remaining seam"
                    )
                feats.append(_bucket_means(raw))
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), "features": [f.tolist() for f in feats]}
            )

    return df.select(id_col, payload_col).mapInPandas(
        run, schema=f"{id_col} bigint, features array<float>"
    )


def frame_sample_plan(
    df: DataFrame, every_n: int = 30, id_col: str = "media_id"
) -> DataFrame:
    """Frame-sampling plan for video rows: one output row per sampled frame
    index (pure SQL explode — the decode of each frame is the stubbed step)."""
    frames = F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
    return (
        df.where(F.col("kind") == "video")
        .select(id_col, F.explode(frames).alias("frame_idx"))
    )


# ---------------------------------------------------------------------------
# container-format header parsing — REAL (no codec libraries needed)
# ---------------------------------------------------------------------------
# Magic-byte sniffing and header-field extraction are pure byte arithmetic,
# so unlike pixel/sample decode (stubbed above) these run for real: the
# typed-metadata side of the multimodal design (format, dimensions) comes
# from the binary column itself at ingest time.

_MAGICS = [
    ("png", b"\x89PNG\r\n\x1a\n"),
    ("jpeg", b"\xff\xd8\xff"),
    ("gif", b"GIF8"),
    ("riff", b"RIFF"),   # wav/avi/webp container; refined below
    ("mp4", None),       # ftyp at offset 4
    ("pdf", b"%PDF"),
]


def sniff_format(payload: bytes) -> str:
    """Identify the container from magic bytes (pure byte compare)."""
    if payload is None or len(payload) < 12:
        return "unknown"
    for name, magic in _MAGICS:
        if magic and payload.startswith(magic):
            if name == "riff":
                four = payload[8:12]
                return {b"WAVE": "wav", b"WEBP": "webp", b"AVI ": "avi"}.get(
                    four, "riff"
                )
            return name
    if payload[4:8] == b"ftyp":
        return "mp4"
    return "unknown"


def png_dims(payload: bytes) -> tuple[int, int] | None:
    """(width, height) from the PNG IHDR chunk (always first, offset 16)."""
    if len(payload) < 24 or not payload.startswith(b"\x89PNG\r\n\x1a\n"):
        return None
    w = int.from_bytes(payload[16:20], "big")
    h = int.from_bytes(payload[20:24], "big")
    return (w, h)


def jpeg_dims(payload: bytes) -> tuple[int, int] | None:
    """(width, height) from the first SOF0-SOF15 marker (excluding DHT/DAC/
    RST markers), walking the JPEG segment chain."""
    if len(payload) < 4 or not payload.startswith(b"\xff\xd8"):
        return None
    i = 2
    n = len(payload)
    while i + 9 < n:
        if payload[i] != 0xFF:
            i += 1
            continue
        marker = payload[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        seg_len = int.from_bytes(payload[i + 2 : i + 4], "big")
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            h = int.from_bytes(payload[i + 5 : i + 7], "big")
            w = int.from_bytes(payload[i + 7 : i + 9], "big")
            return (w, h)
        i += 2 + seg_len
    return None


def wav_sample_rate(payload: bytes) -> int | None:
    """Sample rate from the RIFF/WAVE fmt chunk (little-endian u32 at
    offset 24 in the canonical layout; chunk-walked for robustness)."""
    if len(payload) < 28 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    i = 12
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        clen = int.from_bytes(payload[i + 4 : i + 8], "little")
        if cid == b"fmt " and i + 16 <= len(payload):
            return int.from_bytes(payload[i + 12 : i + 16], "little")
        i += 8 + clen + (clen & 1)
    return None


def with_media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Adds (format string, width int, height int, sample_rate int) parsed
    from the binary column, Arrow-batched — the real typed-metadata path
    for a 100 TB media lake: header fields come from the first bytes only,
    so at scale pair with a range-read source that fetches payload
    prefixes rather than whole objects."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("struct<format:string,width:int,height:int,sample_rate:int>")
    def meta(payloads: pd.Series) -> pd.DataFrame:
        rows = []
        for b in payloads:
            b = bytes(b) if b is not None else b""
            fmt = sniff_format(b)
            dims = png_dims(b) if fmt == "png" else jpeg_dims(b) if fmt == "jpeg" else None
            rows.append(
                {
                    "format": fmt,
                    "width": dims[0] if dims else None,
                    "height": dims[1] if dims else None,
                    "sample_rate": wav_sample_rate(b) if fmt == "wav" else None,
                }
            )
        return pd.DataFrame(rows)

    return df.withColumn("media_meta", meta(F.col(payload_col)))


# container builders (the encode side of the header parsers; used by
# fixtures and tests — real byte layouts, no codec libs).  make_png /
# make_wav emit FULLY VALID files (CRC'd chunks, zlib'd IDAT scanlines /
# PCM16 data chunk) when given pixel/sample content, so the real decoders
# below have an honest fixture corpus.

import zlib as _zlib


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        len(data).to_bytes(4, "big")
        + ctype
        + data
        + _zlib.crc32(ctype + data).to_bytes(4, "big")
    )


def png_pixel(seed: int, y, x, c):
    """The fixture pixel function: (seed + 7y + 13x + 31c) mod 256 — a
    closed form a SQL oracle can re-compute with generate_series."""
    return (seed + 7 * y + 13 * x + 31 * c) % 256


def make_png(width: int, height: int, seed: int | None = None) -> bytes:
    """8-bit RGB PNG.  With ``seed``: valid IHDR+IDAT+IEND where
    pixel[y, x, c] = png_pixel(seed, y, x, c), scanline filter 0.
    Without: the legacy header-only stub (IHDR, no image data)."""
    ihdr = (
        width.to_bytes(4, "big") + height.to_bytes(4, "big")
        + b"\x08\x02\x00\x00\x00"
    )
    if seed is None:
        return (b"\x89PNG\r\n\x1a\n" + (13).to_bytes(4, "big") + b"IHDR"
                + ihdr + b"\x00" * 8)
    y, x, c = np.ogrid[0:height, 0:width, 0:3]
    px = png_pixel(seed, y, x, c).astype(np.uint8)
    scanlines = np.concatenate(
        [np.zeros((height, 1), dtype=np.uint8), px.reshape(height, width * 3)],
        axis=1,
    )
    idat = _zlib.compress(scanlines.tobytes(), 6)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )


def make_jpeg(width: int, height: int) -> bytes:
    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + b"\x00" * 9
    sof = (b"\xff\xc0" + (17).to_bytes(2, "big") + b"\x08"
           + height.to_bytes(2, "big") + width.to_bytes(2, "big")
           + b"\x03" + b"\x00" * 9)
    return b"\xff\xd8" + app0 + sof + b"\xff\xd9"


def wav_sample(seed: int, i):
    """Fixture PCM16 sample i: ((seed * 31 + i * 17) mod 65536) - 32768."""
    return (seed * 31 + i * 17) % 65536 - 32768


def make_wav(sample_rate: int, seed: int | None = None, n_samples: int = 0) -> bytes:
    """Mono PCM16 WAV; with seed/n_samples, a real data chunk where
    sample[i] = wav_sample(seed, i)."""
    if seed is not None and n_samples > 0:
        data = (
            wav_sample(seed, np.arange(n_samples)).astype("<i2").tobytes()
        )
    else:
        data = b""
    fmt = (b"fmt " + (16).to_bytes(4, "little") + (1).to_bytes(2, "little")
           + (1).to_bytes(2, "little") + sample_rate.to_bytes(4, "little")
           + (sample_rate * 2).to_bytes(4, "little")
           + (2).to_bytes(2, "little") + (16).to_bytes(2, "little"))
    body = b"WAVE" + fmt + b"data" + len(data).to_bytes(4, "little") + data
    return b"RIFF" + len(body).to_bytes(4, "little") + body


# ---------------------------------------------------------------------------
# REAL decode for the codec-free formats (round 4): PNG is zlib (stdlib) +
# per-scanline defiltering (numpy), WAV PCM is raw slicing.  JPEG remains
# the one documented NotImplementedError seam (it genuinely needs a DCT
# codec library not present in this container).
# ---------------------------------------------------------------------------


def decode_png(payload: bytes) -> np.ndarray:
    """(height, width, 3) uint8 array from an 8-bit RGB (color type 2,
    non-interlaced) PNG.  Chunk walk -> concatenated IDAT -> zlib
    inflate -> per-scanline defilter.  Filters: None/Up are vectorized;
    Sub is a per-channel uint8 cumulative sum (wraparound IS the mod-256
    the spec wants); Average/Paeth fall back to a per-pixel loop."""
    if not payload.startswith(b"\x89PNG\r\n\x1a\n"):
        raise ValueError("not a PNG")
    i, n = 8, len(payload)
    width = height = None
    idat = bytearray()
    while i + 8 <= n:
        clen = int.from_bytes(payload[i : i + 4], "big")
        ctype = payload[i + 4 : i + 8]
        data = payload[i + 8 : i + 8 + clen]
        if ctype == b"IHDR":
            width = int.from_bytes(data[0:4], "big")
            height = int.from_bytes(data[4:8], "big")
            bit_depth, color_type, interlace = data[8], data[9], data[12]
            if (bit_depth, color_type) != (8, 2) or interlace:
                raise NotImplementedError(
                    "decode_png supports 8-bit RGB non-interlaced only"
                )
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        i += 12 + clen
    if width is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    raw = np.frombuffer(_zlib.decompress(bytes(idat)), dtype=np.uint8)
    stride = width * 3 + 1
    if len(raw) != height * stride:
        raise ValueError("PNG scanline payload length mismatch")
    rows = raw.reshape(height, stride)
    out = np.zeros((height, width * 3), dtype=np.uint8)
    prev = np.zeros(width * 3, dtype=np.uint8)
    for y in range(height):
        ftype = int(rows[y, 0])
        line = rows[y, 1:].copy()
        if ftype == 0:
            rec = line
        elif ftype == 2:  # Up
            rec = line + prev  # uint8 wraparound == mod 256
        elif ftype == 1:  # Sub: per-channel cumsum, uint8 wraparound
            rec = np.add.accumulate(
                line.reshape(width, 3), axis=0, dtype=np.uint8
            ).reshape(-1)
        else:  # Average (3) / Paeth (4): left-neighbor sequential
            rec = np.zeros(width * 3, dtype=np.uint8)
            for k in range(width * 3):
                a = int(rec[k - 3]) if k >= 3 else 0
                b = int(prev[k])
                if ftype == 3:
                    rec[k] = (int(line[k]) + (a + b) // 2) % 256
                elif ftype == 4:
                    cul = int(prev[k - 3]) if k >= 3 else 0
                    p = a + b - cul
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - cul)
                    pred = a if pa <= pb and pa <= pc else b if pb <= pc else cul
                    rec[k] = (int(line[k]) + pred) % 256
                else:
                    raise ValueError(f"bad PNG filter {ftype}")
        out[y] = rec
        prev = rec
    return out.reshape(height, width, 3)


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """(sample_rate, int16 samples) from a PCM16 RIFF/WAVE payload."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    i, rate, samples = 12, None, None
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        clen = int.from_bytes(payload[i + 4 : i + 8], "little")
        body = payload[i + 8 : i + 8 + clen]
        if cid == b"fmt ":
            audio_format = int.from_bytes(body[0:2], "little")
            bits = int.from_bytes(body[14:16], "little")
            if (audio_format, bits) != (1, 16):
                raise NotImplementedError("decode_wav supports PCM16 only")
            rate = int.from_bytes(body[4:8], "little")
        elif cid == b"data":
            samples = np.frombuffer(body[: len(body) // 2 * 2], dtype="<i2")
        i += 8 + clen + (clen & 1)
    if rate is None or samples is None:
        raise ValueError("WAV missing fmt/data chunk")
    return rate, samples


def synthesize_media_containers(
    spark, n: int, num_partitions: int = 8
) -> DataFrame:
    """Deterministic media table with REAL container payloads: id % 3
    picks png (width=id%100+1, height=id%50+1, pixels = png_pixel(id,..))
    / jpeg (width=id%64+1, height=id%32+1, headers only — the codec seam)
    / wav (rate=8000+(id%4)*8000, 160+id%100 PCM16 samples =
    wav_sample(id,..)).  Arrow-batched generation; a pure function of id
    on any partitioning, and the pixel/sample functions are closed-form
    so SQL oracles can recompute decoded-content statistics exactly."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            payloads = []
            for i in ids:
                i = int(i)
                k = i % 3
                if k == 0:
                    payloads.append(make_png(i % 100 + 1, i % 50 + 1, seed=i))
                elif k == 1:
                    payloads.append(make_jpeg(i % 64 + 1, i % 32 + 1))
                else:
                    payloads.append(
                        make_wav(8000 + (i % 4) * 8000, seed=i,
                                 n_samples=160 + i % 100)
                    )
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    return spark.range(n, numPartitions=num_partitions).mapInPandas(
        gen, "media_id long, payload binary"
    )
