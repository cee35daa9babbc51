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
    from a digest of the bytes — stable across runs and engines. For
    dim > 16 the 16-byte md5 is extended by digest chaining (md5 of the
    previous digest), so every requested feature is live — a silent
    digest[:dim] truncation would zero-pad nothing but leave callers
    like perceptual_hash(bits=32) with half-dead fingerprints (review
    finding)."""
    digest = hashlib.md5(payload).digest()
    w = 16 + digest[0] % 16
    h = 16 + digest[1] % 16
    stream = digest
    while len(stream) < dim:
        digest = hashlib.md5(digest).digest()
        stream += digest
    feats = np.frombuffer(stream[:dim], dtype=np.uint8).astype(np.float64) / 255.0
    return w, h, feats


def fake_features_local(payload: bytes, dim: int = 8) -> list[float]:
    """The fake decoder's feature vector alone — the shared
    'joint-embedding encoder' stub: the cross-modal entry encodes its
    (literal) text queries with THIS function driver-side, and the
    oracle replays the same bytes-to-features map, so both modalities
    land in one space by construction."""
    return [float(x) for x in _fake_decode(payload, dim)[2]]


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


def perceptual_hash(assets: DataFrame, *, decode: str = "fake", bits: int = 16) -> DataFrame:
    """Average-hash (aHash) perceptual fingerprint of decoded media:
    decode each asset to a ``bits``-long feature grid (the histogram /
    digest features of :func:`decode_and_featurize`), then set bit i
    iff feature i exceeds the asset's mean feature — the classic
    resize-threshold-pack recipe, with the threshold-pack stage as pure
    codegen'd expressions after the one Arrow decode scan. Output:
    (asset_id, phash long).

    Near-identical media (re-encodes, small crops) keep most bits under
    a REAL decoder; the fake decoder is digest-derived, so only
    byte-identical payloads collide — the plumbing (and the pairing
    below) is what this container can test, the semantics arrive free
    with Pillow."""
    feats = decode_and_featurize(assets, decode=decode, dim=bits)
    mean = F.aggregate("features", F.lit(0.0), lambda a, x: a + x) / F.size("features")
    bit_terms = [
        F.when(F.element_at("features", i + 1) > mean, F.lit(1 << i)).otherwise(F.lit(0))
        for i in range(bits)
    ]
    phash = bit_terms[0]
    for t in bit_terms[1:]:
        phash = phash.bitwiseOR(t)
    return feats.select("asset_id", phash.cast("long").alias("phash"))


def asset_neardup(
    assets: DataFrame,
    *,
    decode: str = "fake",
    bits: int = 16,
    bands: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-duplicate media pairs: perceptual hashes paired by the SAME
    guaranteed-recall banded Hamming join the text SimHash stack uses
    (`ext.dedup.hamming_pairs` — pigeonhole recall proof, equality
    joins only, never a cross product). Output:
    (asset_a, asset_b, hamming). The standard image-dedup shape at
    100 TB: one decode scan, one fingerprint table, banded self-join."""
    from mopso_engine.ext.dedup import hamming_pairs

    fps = perceptual_hash(assets, decode=decode, bits=bits)
    out = hamming_pairs(
        fps, id_col="asset_id", fp_col="phash", bits=bits, bands=bands, max_hamming=max_hamming
    )
    return out.select(
        F.col("id_a").alias("asset_a"), F.col("id_b").alias("asset_b"), "hamming"
    )
