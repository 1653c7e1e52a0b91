"""Multimodal columns: opaque binary payloads + typed metadata.

Design (BASELINE.json north star): image/audio/video travel as ``binary``
columns with a typed metadata struct; decode / feature-extract / resize /
frame-sample run as Arrow-batched pandas functions over ``mapInPandas``.
The Spark-side plumbing — schema, partitioning, UDF signatures, batch
shapes — is real and tested; the actual codec step is STUBBED behind an
import-try (image/audio libraries are not in this container) with a
deterministic fake, clearly tagged in the ``backend`` output column.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("feature", ArrayType(DoubleType())),
        StructField("backend", StringType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("n_bytes", LongType()),
    ]
)


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Deterministic media table derived from ``documents``: payload is the
    utf-8 encoding of the text (a stand-in byte stream), kind cycles by
    doc_id, metadata struct is derived arithmetically. The byte-column
    plumbing (binary type, metadata struct) is exactly what a real
    image/audio ingest produces."""
    k = F.col("doc_id")
    return docs.select(
        k.alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (k % 3 + 1).cast("int"),
        ).alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            (16 + k % 32).cast("int").alias("width"),
            (16 + (k * 7) % 32).cast("int").alias("height"),
            F.lit(16000).alias("sample_rate"),
            (1 + k % 24).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def _decode_backend():
    """Real decoder if an imaging library exists, else the deterministic
    stub. The container has neither PIL nor cv2 — the stub path is the
    tested one; the interface is what matters."""
    try:  # pragma: no cover - not installed in this environment
        import PIL.Image  # noqa: F401

        return "pillow"
    except Exception:
        return "stub"


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Stub semantics (deterministic): feature[j] = mean of payload bytes at
    positions ≡ j (mod dim), scaled to [0,1]. A real backend would decode
    and embed; the batch shape, schema, and partition-parallel execution are
    identical either way.
    """
    backend = _decode_backend()

    def fn(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            feats = []
            nbytes = []
            for payload in pdf["payload"]:
                arr = np.frombuffer(payload, dtype=np.uint8)
                nbytes.append(len(arr))
                if len(arr) == 0:
                    feats.append([0.0] * dim)
                    continue
                pads = (-len(arr)) % dim
                a = np.pad(arr, (0, pads)).reshape(-1, dim).astype("float64")
                feats.append((a.mean(axis=0) / 255.0).tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": nbytes,
                    "feature": feats,
                    "backend": backend,
                }
            )

    return media.mapInPandas(fn, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 4) -> DataFrame:
    """Frame sampling for video rows — pure Spark plumbing: explode the
    sampled frame-index sequence from metadata (a real implementation swaps
    the payload slice in; the row multiplication pattern is the same)."""
    video = media.filter(F.col("kind") == "video")
    return video.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_n))
        ).alias("frame_idx"),
        F.octet_length("payload").cast("bigint").alias("n_bytes"),
    )
