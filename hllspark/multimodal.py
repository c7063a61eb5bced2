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
    codec call requires."""
    if decoder == "real":
        raise NotImplementedError(
            "real media decoding requires PIL/ffmpeg, not present in this "
            "container — wire the codec call into _decode_bytes_fake's seam"
        )
    if decoder != "fake":
        raise ValueError(f"unknown decoder {decoder!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            feats = []
            for payload in pdf[payload_col]:
                raw = _decode_bytes_fake(bytes(payload))
                # pseudo feature: FEATURE_DIM bucket means of the decode
                feats.append(
                    raw.reshape(FEATURE_DIM, -1).mean(axis=1).astype(np.float32)
                )
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
