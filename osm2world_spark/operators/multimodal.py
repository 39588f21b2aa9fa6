"""Multimodal (image/audio) span plumbing.

Media payloads are opaque `binary` columns + typed metadata; decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas UDFs
over `mapInPandas`. The actual codecs are NOT available in this
environment, so the decode step is a clearly marked deterministic stub
(`_fake_decode`) — the Spark-side plumbing (schemas, batch shapes,
partitioning, UDF signatures) is real and tested; swapping in a real
decoder is a one-function change.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("span_idx", IntegerType()),
        StructField("media_ref", StringType()),
        StructField("media_type", StringType()),   # image | audio | video
        StructField("payload", BinaryType()),      # opaque bytes
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("span_idx", IntegerType()),
        StructField("media_ref", StringType()),
        StructField("feature", ArrayType(FloatType())),  # fixed 16-dim
    ]
)


def media_table(docs: DataFrame) -> DataFrame:
    """documents -> one row per media span with synthesized opaque payload
    metadata (payload bytes = utf8 of media_ref here; a real pipeline reads
    object storage by media_ref)."""
    m = docs.select("doc_id", F.posexplode("spans").alias("span_idx", "span")).where(
        F.col("span.kind") == "media"
    )
    h = F.conv(F.substring(F.md5(F.col("span.media_ref")), 1, 8), 16, 10).cast("bigint")
    return m.select(
        "doc_id",
        F.col("span_idx").cast("int").alias("span_idx"),
        F.col("span.media_ref").alias("media_ref"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")), (F.pmod(h, F.lit(3)) + 1).cast("int")).alias("media_type"),
        F.encode(F.col("span.media_ref"), "utf-8").alias("payload"),
        (F.pmod(h, F.lit(1024)) + 64).cast("int").alias("width"),
        (F.pmod(F.floor(h / 7).cast("bigint"), F.lit(1024)) + 64).cast("int").alias("height"),
    )


def _fake_decode(payload: bytes) -> np.ndarray:
    """STUB decoder: deterministic pseudo-pixels from the payload hash.
    Replace with PIL/libav decode in production — NotImplementedError path
    kept explicit for the real-codec branch."""
    h = np.frombuffer(payload.ljust(16, b"\0")[:16], dtype=np.uint8).astype(np.float32)
    return h / 255.0


def extract_features(media: DataFrame, real_codecs: bool = False) -> DataFrame:
    """media rows -> 16-dim feature vectors via Arrow batches. The batch
    shape (one numpy matrix per Arrow batch) is what a real image encoder
    consumes; only the decode is stubbed."""
    if real_codecs:
        raise NotImplementedError("image/audio codecs are not available in this environment")

    def kernel(batches):
        for pdf in batches:
            feats = np.stack([_fake_decode(p) for p in pdf["payload"]]) if len(pdf) else np.zeros((0, 16), np.float32)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "span_idx": pdf["span_idx"],
                    "media_ref": pdf["media_ref"],
                    "feature": [row.astype(np.float32) for row in feats],
                }
            )

    return media.mapInPandas(kernel, schema=FEATURES_SCHEMA)
