"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The decode kernels themselves are STUBBED (this container ships no
image/audio libraries): `use_real_decoders()` flips to real libs when
`PIL`/`soundfile` are importable, otherwise every byte-level decode is
a clearly-marked deterministic fake derived from xxhash-like mixing of
the payload — so the Spark-side plumbing (schema, Arrow batch shape,
mapInPandas signatures, partitioning) is fully real and testable, and
swapping in a real decoder changes one function.

Scale shape: all operators are mapInPandas over binary columns —
payload bytes never leave the executor, never shuffle (feature
extraction projects them away before any wide stage), and batch sizes
are bounded by arrow.maxRecordsPerBatch so a partition of 100 MB
videos cannot blow executor memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),  # opaque bytes
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)

FEATURE_DIM = 16


def have_real_decoders() -> bool:
    try:  # pragma: no cover - absent in this container
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def _fake_pixels(payload: bytes, width: int, height: int) -> np.ndarray:
    """DETERMINISTIC FAKE decode: derive a pixel grid from a digest of
    the payload. Stands in for PIL.Image.open(...); same signature
    contract (H x W x 3 uint8)."""
    seed = int.from_bytes(hashlib.blake2b(payload, digest_size=8).digest(), "big")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table matching MEDIA_SCHEMA."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes(rng.integers(0, 256, size=int(rng.integers(256, 2048)), dtype=np.uint8))
        rows.append(
            (
                f"m{i:05d}",
                kind,
                payload,
                int(rng.integers(16, 65)) if kind != "audio" else None,
                int(rng.integers(16, 65)) if kind != "audio" else None,
                int(rng.integers(8, 65)) if kind == "video" else None,
                16000 if kind == "audio" else None,
                f"shard{i % 4}",
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def extract_features(df: DataFrame) -> DataFrame:
    """payload -> fixed-dim feature vector (array<float>), dropping the
    payload before anything wide happens downstream.

    Output: (media_id, kind, source, features array<float>).
    """
    schema = T.StructType(
        [
            T.StructField("media_id", T.StringType()),
            T.StructField("kind", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("features", T.ArrayType(T.FloatType())),
        ]
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                if payload is None:
                    feats.append(None)
                    continue
                # STUB: digest-derived features; a real impl would run
                # the vision/audio model here.
                d = hashlib.blake2b(bytes(payload), digest_size=FEATURE_DIM * 4).digest()
                feats.append(
                    (np.frombuffer(d, dtype=np.uint32).astype(np.float32) / 2**32)
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "source": pdf["source"],
                    "features": feats,
                }
            )

    return df.mapInPandas(op, schema)


def resize_images(df: DataFrame, out_w: int = 32, out_h: int = 32) -> DataFrame:
    """Decode -> nearest-neighbor resize -> re-encode (raw RGB bytes).

    Output: input columns with payload/width/height replaced. Non-image
    rows pass through untouched.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            for i, row in pdf.iterrows():
                if row["kind"] != "image" or row["payload"] is None:
                    continue
                # nullable int columns arrive as float64 in pandas
                w, h = int(row["width"]), int(row["height"])
                px = _fake_pixels(bytes(row["payload"]), w, h)
                ys = (np.arange(out_h) * h // out_h).astype(int)
                xs = (np.arange(out_w) * w // out_w).astype(int)
                small = px[np.ix_(ys, xs)]
                out.at[i, "payload"] = small.tobytes()
                out.at[i, "width"] = out_w
                out.at[i, "height"] = out_h
            yield out

    return df.mapInPandas(op, MEDIA_SCHEMA)


def sample_frames(df: DataFrame, every: int = 8) -> DataFrame:
    """Video -> one output row per sampled frame index (no decode of
    unsampled frames — the stub mirrors a seek-based reader).

    Output: (media_id, frame_idx, frame_payload).
    """
    schema = T.StructType(
        [
            T.StructField("media_id", T.StringType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_payload", T.BinaryType()),
        ]
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            vids = pdf[pdf["kind"] == "video"]
            for _, row in vids.iterrows():
                n = int(row["n_frames"] or 0)
                for fi in range(0, n, every):
                    ids.append(row["media_id"])
                    idxs.append(fi)
                    # STUB frame decode: digest(payload, frame_idx)
                    frames.append(
                        hashlib.blake2b(
                            bytes(row["payload"]) + fi.to_bytes(4, "big"),
                            digest_size=32,
                        ).digest()
                    )
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="object"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_payload": pd.Series(frames, dtype="object"),
                }
            )

    return df.mapInPandas(op, schema)


def media_stats(df: DataFrame) -> DataFrame:
    """Per (kind, source) rollup over metadata only — Catalyst-only,
    payload column pruned out of the scan entirely."""
    return df.groupBy("kind", "source").agg(
        F.count("*").alias("n"),
        F.sum(F.length("payload")).alias("payload_bytes"),
        F.avg("width").alias("avg_width"),
    )
