"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns with a typed
metadata struct. The Spark-side plumbing — schema, Arrow batch shape,
``mapInPandas`` signatures, partition behavior — is real and tested; the
actual codec calls are STUBBED (this container has no image/audio
libraries): ``decode_image``/``extract_audio_features`` raise
``NotImplementedError`` unless given the deterministic-fake flag, which
produces seeded, reproducible pseudo-features derived from the payload
bytes so the distributed path can be exercised end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),       # image | audio | video
        T.StructField("payload", T.BinaryType()),     # opaque bytes
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)


def decode_image(payload: bytes, fake: bool = False) -> dict:
    """STUB: real decode needs Pillow/libjpeg, absent in this container.

    With ``fake=True`` returns deterministic pseudo-metadata derived from a
    sha256 of the payload — stable across runs/partitions, so the Spark
    plumbing is fully testable. Mirrors the role of the reference's
    ``pdf_to_image_full`` (work_order_extractor.py:1121-1146) as the
    payload→pixels boundary.
    """
    if not fake:
        raise NotImplementedError(
            "image decoding requires Pillow; run with fake=True for the "
            "deterministic test double"
        )
    h = hashlib.sha256(payload).digest()
    return {
        "sha256": hashlib.sha256(payload).hexdigest(),
        "width": 64 + h[0] % 192,
        "height": 64 + h[1] % 192,
        "mean_luma": round(h[2] / 255.0, 6),
        "embedding": [round((b - 128) / 128.0, 6) for b in h[:16]],
    }


def image_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """media rows → per-image features via one Arrow-batched pass.

    The payload column is consumed inside the pass and dropped from the
    output (same no-payload-shuffle rule as the text pipeline).
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            feats = [decode_image(p, fake=fake) for p in b["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"].values,
                    "sha256": [f["sha256"] for f in feats],
                    "width": [f["width"] for f in feats],
                    "height": [f["height"] for f in feats],
                    "mean_luma": [f["mean_luma"] for f in feats],
                    "embedding": [f["embedding"] for f in feats],
                }
            )

    return df.select("media_id", "payload").mapInPandas(
        fn, schema=IMAGE_FEATURES_SCHEMA
    )


def frame_sample_plan(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling PLAN: emits (media_id, frame_no) rows for every
    n-th frame from the metadata frame count — pure plan arithmetic
    (sequence+explode), the decode of each sampled frame being the stubbed
    step. Demonstrates the 1→N fan-out shape for video at scale."""
    n_frames = (F.col("n_bytes") / 1024).cast("int") + 1  # fake frame count
    return df.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
        ).alias("frame_no"),
    )


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Adapter for tests/benches: build a media table from the documents
    fixture (text bytes as the opaque payload)."""
    payload = F.encode(F.col("text"), "utf-8")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        payload.alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.octet_length(payload).cast("int").alias("n_bytes"),
    )
