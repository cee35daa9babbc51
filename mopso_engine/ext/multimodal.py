"""Multimodal column plumbing: image/audio/video as opaque binary + typed
metadata, processed with Arrow-batched ``mapInPandas`` kernels.

The decode step is STUBBED (no imaging/audio libs in this container,
SURVEY §7.0): ``decode=fake`` produces a deterministic fake decode from
the bytes themselves so the Spark-side plumbing — schema, batch shape,
partitioning — is real and testable; ``decode=real`` raises
NotImplementedError where PIL/librosa would be called.

Scale shape: binary columns ride the normal columnar scan; kernels are
per-batch vectorized; nothing shuffles until an explicit aggregate.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: (asset_id, modality, payload, meta...) — the canonical multimodal row.
ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("modality", StringType(), False),  # image|audio|video
        StructField("payload", BinaryType(), False),
        StructField("mime", StringType(), True),
        StructField("n_bytes", LongType(), False),
    ]
)

_FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("features", ArrayType(DoubleType()), False),
    ]
)


def assets_from_documents(docs: DataFrame) -> DataFrame:
    """Fabricate a multimodal table from the documents table (the container
    has no real media): payload = utf-8 bytes of the text. The plumbing —
    binary column, metadata, kernels — is exactly what real media uses."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("image").alias("modality"),
        F.encode("text", "utf-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.octet_length(F.encode("text", "utf-8")).cast("long").alias("n_bytes"),
    )


def _fake_decode(payload: bytes, dim: int = 8) -> tuple[int, int, np.ndarray]:
    """Deterministic fake 'image decode': dimensions and features derived
    from a digest of the bytes — stable across runs and engines."""
    digest = hashlib.md5(payload).digest()
    w = 16 + digest[0] % 16
    h = 16 + digest[1] % 16
    feats = np.frombuffer(digest[:dim], dtype=np.uint8).astype(np.float64) / 255.0
    return w, h, feats


def decode_and_featurize(assets: DataFrame, *, decode: str = "fake", dim: int = 8) -> DataFrame:
    """(asset_id, width, height, features): the decode → feature-extract
    kernel. Arrow-batched; one output row per asset; no shuffle."""
    if decode == "real":
        def kernel(batches):  # pragma: no cover - requires imaging libs
            raise NotImplementedError(
                "real media decode requires PIL/torchvision/librosa — not available in this environment; use decode='fake'"
            )
            yield  # make it a generator
    elif decode == "fake":
        def kernel(batches):
            for pdf in batches:
                rows = [_fake_decode(p, dim) for p in pdf["payload"]]
                yield pd.DataFrame(
                    {
                        "asset_id": pdf["asset_id"],
                        "width": [r[0] for r in rows],
                        "height": [r[1] for r in rows],
                        "features": [r[2] for r in rows],
                    }
                )
    else:
        raise ValueError(f"unknown decode mode: {decode}")

    return assets.select("asset_id", "payload").mapInPandas(kernel, schema=_FEATURE_SCHEMA)


def frame_sample(assets: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' on the byte stream (stands in for video frame
    extraction): one row per sampled offset with a 1-byte 'frame id'.
    Shows the 1→N mapInPandas expansion pattern with bounded batches."""
    out_schema = StructType(
        [
            StructField("asset_id", LongType(), False),
            StructField("frame_no", IntegerType(), False),
            StructField("byte_at", IntegerType(), False),
        ]
    )

    def kernel(batches):
        for pdf in batches:
            ids, frames, vals = [], [], []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                for i, off in enumerate(range(0, len(payload), every_n_bytes)):
                    ids.append(aid)
                    frames.append(i)
                    vals.append(payload[off])
            yield pd.DataFrame({"asset_id": ids, "frame_no": frames, "byte_at": vals})

    return assets.select("asset_id", "payload").mapInPandas(kernel, schema=out_schema)


def asset_stats(assets: DataFrame) -> DataFrame:
    """Typed-metadata aggregate over the binary column (no decode needed):
    per modality, count + byte stats. Catalyst-only."""
    return (
        assets.groupBy("modality")
        .agg(
            F.count("*").alias("n_assets"),
            F.sum("n_bytes").alias("total_bytes"),
            F.round(F.avg("n_bytes"), 6).alias("avg_bytes"),
        )
        .orderBy("modality")
    )
