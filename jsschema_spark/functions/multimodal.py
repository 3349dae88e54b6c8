"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images / audio / video travel as ``binary`` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched pandas
UDFs over ``mapInPandas`` so each executor touches bytes exactly once per
batch. The decode kernels for real codecs (JPEG/PNG/MP3/H.264) need
libraries this container doesn't ship — those steps are STUBBED behind
``NotImplementedError`` or a clearly-marked deterministic fake; everything
Spark-side (schemas, batch iteration, partition sizing, UDF signatures) is
real and tested. The audio/WAV path is fully real — see
``jsschema_spark.audio``.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),   # image | audio | video
        T.StructField("format", T.StringType()),       # jpeg | png | wav | ...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("size_bytes", T.LongType()),
    ]
)

IMAGE_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("byte_entropy", T.DoubleType()),
        T.StructField("byte_histogram", T.ArrayType(T.IntegerType())),
        T.StructField("phash64", T.LongType()),
    ]
)


def real_image_decode(payload: bytes):
    """STUB — real JPEG/PNG decode needs Pillow/opencv, absent here. The
    engine's contract: bytes → HxWx3 uint8 array."""
    raise NotImplementedError("image decode requires Pillow/opencv (not in this container)")


def _byte_features(payload: bytes) -> tuple[float, list[int], int]:
    """Deterministic byte-level features (REAL, not a stub): a 16-bin byte
    histogram, its entropy, and a 64-bit locality hash — usable for corrupt-
    payload screening and exact-dup detection without any codec.

    Called per payload inside the Arrow batch (a Python loop over rows of
    one batch): variable-length binary cannot be numpy-vectorized ACROSS
    payloads without ragged batching, so the loop is the honest shape —
    each payload's own features ARE numpy-vectorized, and payload bytes
    are touched exactly once per batch (mirrors audio.py's file-granular
    note)."""
    if not payload:
        return 0.0, [0] * 16, 0
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr >> 4, minlength=16)
    p = hist / hist.sum()
    nz = p[p > 0]
    entropy = float(-(nz * np.log2(nz)).sum())
    med = np.median(hist)
    bits = (hist[: 8] > med).astype(np.uint64)
    h64 = int.from_bytes(hashlib.blake2b(arr[:4096].tobytes(), digest_size=8).digest(), "big") >> 1
    return entropy, [int(x) for x in hist], h64 ^ int(bits.sum())


def extract_media_features(
    df: DataFrame, id_col: str, payload_col: str,
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads — partition-sized
    Arrow batches; output schema fixed so downstream plans compile."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ents, hists, phs = [], [], []
            for payload in pdf[payload_col]:
                e, h, ph = _byte_features(bytes(payload) if payload is not None else b"")
                ents.append(e)
                hists.append(h)
                phs.append(ph)
            yield pd.DataFrame(
                {"id": pdf[id_col], "byte_entropy": ents, "byte_histogram": hists, "phash64": phs}
            )

    return df.select(F.col(id_col).alias(id_col), F.col(payload_col)).mapInPandas(
        gen, IMAGE_FEATURE_SCHEMA
    )


def frame_sample_plan(df: DataFrame, id_col: str, n_frames_col: str, every_n: int = 30) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame index
    (the decode-that-frame step is the stubbed kernel). Pure Catalyst —
    sequence + explode, no Python."""
    return df.select(
        F.col(id_col),
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col(n_frames_col) - 1, F.lit(0)), F.lit(every_n))
        ).alias("frame_idx"),
    )


def media_metadata(df: DataFrame, payload_col: str, media_type: str, fmt: str) -> DataFrame:
    """Attach a typed metadata struct derived from the payload envelope
    (sizes are real; pixel dims need the stubbed decoder ⇒ null)."""
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(fmt).alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("n_frames"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.length(F.col(payload_col)).cast("long").alias("size_bytes"),
        ),
    )
