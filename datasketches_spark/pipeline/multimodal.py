"""Multimodal column plumbing: image/audio/video as opaque binary.

The Spark-side machinery here is REAL and tested -- schemas, typed
metadata extraction (JVM expressions), Arrow batch shapes, partition
behavior of ``mapInPandas`` decoders.  The *decoders themselves* are
deterministic fakes, clearly marked: this container ships no image/
audio libraries, so `decode_*` produce seeded pseudo-features from the
bytes (swap the marked section for PIL/librosa/ffmpeg in a real
deployment) and `strict=True` raises NotImplementedError instead.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from ..hashing import splitmix64


def binary_metadata(bin_col) -> Column:
    """Typed metadata struct from an opaque binary column -- pure JVM
    expressions (byte length + magic prefix), no decode needed."""
    c = F.col(bin_col) if isinstance(bin_col, str) else bin_col
    return F.struct(
        F.length(c).alias("n_bytes"),
        F.hex(F.substring(c, 1, 4)).alias("magic_hex"),
        F.crc32(c).alias("checksum"),
    )


def _fake_features(blob: bytes, n_features: int) -> np.ndarray:
    """DETERMINISTIC FAKE decoder core: seeded features from content.

    Replace with a real decoder (PIL / torchvision / librosa) where
    available -- the surrounding Spark plumbing does not change.
    """
    h = np.frombuffer(blob, dtype=np.uint8).astype(np.uint64)
    seed = int(splitmix64(np.array([h.sum() + len(blob)], dtype=np.uint64))[0])
    rng = np.random.default_rng(seed)
    return rng.standard_normal(n_features).astype(np.float32)


def decode_image_features(
    df: DataFrame,
    bin_col: str,
    id_col: str,
    n_features: int = 16,
    strict: bool = False,
) -> DataFrame:
    """(id, features array<float>) via Arrow-batched mapInPandas.

    ``strict=True`` raises NotImplementedError (no image libs in this
    environment); default uses the deterministic fake decoder so the
    distributed plumbing is fully exercisable.
    """
    schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType, True),
            StructField("features", ArrayType(FloatType()), True),
        ]
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if strict:
            raise NotImplementedError(
                "real image decoding requires PIL/torchvision; not available "
                "in this environment (stub per project brief)"
            )
        for pdf in batches:
            feats = [
                None if b is None else _fake_features(bytes(b), n_features).tolist()
                for b in pdf[bin_col]
            ]
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    return df.select(id_col, bin_col).mapInPandas(decode, schema=schema)


def sample_frames(
    df: DataFrame,
    bin_col: str,
    id_col: str,
    every_nth: int = 10,
    max_frames: int = 4,
    n_features: int = 8,
    strict: bool = False,
) -> DataFrame:
    """Video frame-sampling pattern: one input row -> many frame rows.

    Demonstrates the explode-shaped mapInPandas contract (output rows
    need not align 1:1 with input rows).  Fake frame features are
    deterministic in (content, frame_idx).
    """
    schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType, True),
            StructField("frame_idx", IntegerType(), True),
            StructField("features", ArrayType(FloatType()), True),
        ]
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if strict:
            raise NotImplementedError(
                "real video decoding requires ffmpeg; not available in this "
                "environment (stub per project brief)"
            )
        for pdf in batches:
            ids, idxs, feats = [], [], []
            for rid, b in zip(pdf[id_col], pdf[bin_col]):
                if b is None:
                    continue
                n_frames = min(max_frames, max(1, len(b) // max(every_nth, 1)))
                for i in range(n_frames):
                    ids.append(rid)
                    idxs.append(i)
                    feats.append(
                        _fake_features(bytes(b) + i.to_bytes(4, "little"), n_features).tolist()
                    )
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "features": feats})

    return df.select(id_col, bin_col).mapInPandas(decode, schema=schema)

def resize_binary(
    df: DataFrame,
    bin_col: str,
    id_col: str,
    target_w: int = 64,
    target_h: int = 64,
    strict: bool = False,
) -> DataFrame:
    """Image-resize pattern: (id, resized binary, width, height).

    Binary-in/binary-out mapInPandas plumbing (the shape a real
    PIL/torchvision resize uses unchanged).  The fake "resize" emits a
    deterministic target_w*target_h-byte payload derived from the
    content hash, so output size contracts are testable.
    """
    from pyspark.sql.types import BinaryType

    schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType, True),
            StructField("resized", BinaryType(), True),
            StructField("width", IntegerType(), True),
            StructField("height", IntegerType(), True),
        ]
    )
    n_out = target_w * target_h

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if strict:
            raise NotImplementedError(
                "real image resizing requires PIL/torchvision; not available "
                "in this environment (stub per project brief)"
            )
        for pdf in batches:
            out = []
            for b in pdf[bin_col]:
                if b is None:
                    out.append(None)
                    continue
                # DETERMINISTIC FAKE: content-seeded byte payload of the
                # exact target size (swap for a real resampler).
                h = np.frombuffer(bytes(b), dtype=np.uint8).astype(np.uint64)
                seed = int(splitmix64(np.array([h.sum() + len(b)], dtype=np.uint64))[0])
                rng = np.random.default_rng(seed)
                out.append(rng.integers(0, 256, n_out, dtype=np.uint8).tobytes())
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "resized": out,
                    "width": [None if o is None else target_w for o in out],
                    "height": [None if o is None else target_h for o in out],
                }
            )

    return df.select(id_col, bin_col).mapInPandas(resize, schema=schema)
