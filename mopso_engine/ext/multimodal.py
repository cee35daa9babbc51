"""Multimodal column plumbing: image/audio/video as opaque binary + typed
metadata, processed with Arrow-batched ``mapInPandas`` kernels.

Decode modes: ``fake`` (deterministic digest-derived decode — works in
any container, so the Spark-side plumbing — schema, batch shape,
partitioning — is always testable), ``real`` (Pillow image decode +
8-bin grayscale histogram features; requires PIL on the executors and
raises a clear ImportError otherwise), and ``auto`` (real iff PIL
imports, else fake — the mode a mixed fleet would run). This container
ships no imaging libs (SURVEY §7.0), so ``real`` is exercised only
where PIL exists; the test suite skips it cleanly.

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


def pil_available() -> bool:
    """True iff Pillow imports (driver-side probe; executors share the
    environment in local mode — on a real cluster, ship PIL in the
    executor env)."""
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def _real_decode(payload: bytes, dim: int = 8) -> tuple[int, int, np.ndarray]:
    """Pillow image decode → (width, height, dim-bin grayscale histogram
    normalized to sum 1). Import inside the function: the kernel closure
    must not capture a module the executors may lack."""
    import io

    import PIL.Image

    img = PIL.Image.open(io.BytesIO(payload))
    g = np.asarray(img.convert("L"), dtype=np.float64)
    hist, _ = np.histogram(g, bins=dim, range=(0.0, 256.0))
    total = hist.sum()
    feats = hist.astype(np.float64) / (total if total else 1.0)
    return img.width, img.height, feats


def decode_and_featurize(assets: DataFrame, *, decode: str = "fake", dim: int = 8) -> DataFrame:
    """(asset_id, width, height, features): the decode → feature-extract
    kernel. Arrow-batched; one output row per asset; no shuffle.

    ``decode='auto'`` picks the real Pillow decoder when it imports and
    falls back to the fake decoder otherwise (clean skip, no raise);
    ``decode='real'`` insists on Pillow and raises ImportError up front
    (driver-side, not mid-job) when it is absent."""
    if decode == "auto":
        decode = "real" if pil_available() else "fake"
    if decode == "real":
        if not pil_available():
            raise ImportError(
                "decode='real' requires Pillow, which is not importable here; "
                "use decode='auto' to fall back to the fake decoder"
            )

        def kernel(batches):  # pragma: no cover - requires imaging libs
            for pdf in batches:
                rows = [_real_decode(p, dim) for p in pdf["payload"]]
                yield pd.DataFrame(
                    {
                        "asset_id": pdf["asset_id"],
                        "width": [r[0] for r in rows],
                        "height": [r[1] for r in rows],
                        "features": [r[2] for r in rows],
                    }
                )
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
