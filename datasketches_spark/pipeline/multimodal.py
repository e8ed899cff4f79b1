"""Multimodal column plumbing: image/audio/video as opaque binary.

The Spark-side machinery here is REAL and tested -- schemas, typed
metadata extraction (JVM expressions), Arrow batch shapes, partition
behavior of ``mapInPandas`` decoders.  Image decoding has three tiers,
probed lazily on each executor: PIL when importable (any format), a
pure-stdlib BMP/PNG/baseline-JPEG decoder that is ALWAYS available
(``_stdlib_image.py`` — real pixel math, exercised end-to-end in this
container's CI), and clearly-marked deterministic fakes for payloads
no real tier decodes.  ``strict=True`` disables the fake tier and
fails LOUDLY (NotImplementedError) when a payload needs PIL on an
executor that lacks it; with PIL present, undecodable bytes are NULL.
Video frame sampling uses cv2 when importable, a pure-stdlib
MJPEG-AVI reader (``_stdlib_video.py`` — real RIFF parsing + the
java-cross-validated JPEG frame decoder) otherwise, and the fake tier
with the same ``strict=True`` contract for payloads only cv2/ffmpeg
could read.  Audio features decode PCM/float WAV with a pure-stdlib
reader (``_stdlib_audio.py``); other codecs follow the same
fake/strict policy.
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
    StringType,
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


def _pil():
    """PIL.Image if importable, else None — called on executors so each
    worker probes its own environment (import result is cached by
    Python's module system)."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


def _cv2():
    try:
        import cv2  # noqa: PLC0415

        return cv2
    except ImportError:
        return None


def _fake_features(blob: bytes, n_features: int) -> np.ndarray:
    """DETERMINISTIC FAKE decoder core: seeded features from content.

    Replace with a real decoder (PIL / torchvision / librosa) where
    available -- the surrounding Spark plumbing does not change.
    """
    h = np.frombuffer(blob, dtype=np.uint8).astype(np.uint64)
    seed = int(splitmix64(np.array([h.sum() + len(blob)], dtype=np.uint64))[0])
    rng = np.random.default_rng(seed)
    return rng.standard_normal(n_features).astype(np.float32)


def _pil_image_features(image_mod, blob: bytes, n_features: int) -> list | None:
    """The PIL-tier pixel math of :func:`decode_image_features`:
    decode → grayscale → resample to the feature grid → normalize.
    Module-level (rather than a closure) so a PIL-less environment can
    still exercise this branch with an injected fake module
    (tests/test_pipeline.py); ``None`` for undecodable payloads."""
    import io  # noqa: PLC0415

    try:
        g = int(np.ceil(np.sqrt(n_features)))
        img = image_mod.open(io.BytesIO(blob)).convert("L").resize((g, g))
        px = np.asarray(img, dtype=np.float32).ravel()[:n_features]
        return (px / 255.0).tolist()
    except Exception:  # undecodable payload
        return None


def decode_image_features(
    df: DataFrame,
    bin_col: str,
    id_col: str,
    n_features: int = 16,
    strict: bool = False,
) -> DataFrame:
    """(id, features array<float>) via Arrow-batched mapInPandas.

    Three decoder tiers, probed per executor:

    1. **PIL** (any format PIL reads): decode, grayscale, resample to
       a small grid, emit the first ``n_features`` normalized pixels
       (undecodable bytes -> NULL);
    2. **stdlib** (always available — pipeline/_stdlib_image.py):
       uncompressed BMP, zlib PNG, and baseline-DCT JPEG decode with
       the same grayscale →
       grid → normalize pixel math, so the REAL decode path runs even
       where PIL is absent (this CI container);
    3. **deterministic fake** for bytes neither tier decodes, keeping
       the distributed plumbing exercisable on junk payloads.

    ``strict=True`` disables tier 3 and fails loudly: a payload only
    PIL could decode raises NotImplementedError on a PIL-less executor
    (never silently fabricated, never silently dropped).
    """
    schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType, True),
            StructField("features", ArrayType(FloatType()), True),
        ]
    )

    def _grid_features(px: np.ndarray) -> list:
        from . import _stdlib_image as SI  # noqa: PLC0415

        g = int(np.ceil(np.sqrt(n_features)))
        small = SI.resize_nearest(px, g, g).astype(np.float32).ravel()[:n_features]
        return (small / 255.0).tolist()

    def _stdlib_features(blob: bytes) -> list | None:
        from . import _stdlib_image as SI  # noqa: PLC0415

        px = SI.decode_gray(blob)
        return None if px is None else _grid_features(px)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        image_mod = _pil()

        def one(b) -> list | None:
            if b is None:
                return None
            blob = bytes(b)
            out = (
                _pil_image_features(image_mod, blob, n_features)
                if image_mod is not None
                else _stdlib_features(blob)
            )
            if out is None and image_mod is None:
                if strict:
                    # fail LOUDLY: without PIL the only real tier is the
                    # stdlib BMP/PNG/JPEG decoder; this payload needs more
                    raise NotImplementedError(
                        "real image decoding for this payload requires PIL "
                        "(the stdlib tier covers BMP/PNG/baseline-JPEG); strict=True "
                        "forbids the deterministic fake"
                    )
                return _fake_features(blob, n_features).tolist()
            return out

        for pdf in batches:
            yield pd.DataFrame(
                {id_col: pdf[id_col], "features": [one(b) for b in pdf[bin_col]]}
            )

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
    need not align 1:1 with input rows).  Decode tiers mirror the
    image path:

    1. **cv2/ffmpeg** when installed (any container/codec);
    2. **stdlib MJPEG-AVI** (round 8, `_stdlib_video.py`): real RIFF
       container parsing + the java-cross-validated baseline-JPEG
       frame decoder — REAL pixels with zero third-party deps;
    3. **deterministic fake** features for bytes neither tier decodes
       (``strict=True`` forbids this tier and raises instead).
    """
    schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType, True),
            StructField("frame_idx", IntegerType(), True),
            StructField("features", ArrayType(FloatType()), True),
        ]
    )

    def _real_frames(cv2_mod, blob: bytes) -> list[np.ndarray]:
        """Decode every_nth-th frame (up to max_frames) with OpenCV,
        each reduced to n_features grayscale grid pixels."""
        import os  # noqa: PLC0415
        import tempfile  # noqa: PLC0415

        g = int(np.ceil(np.sqrt(n_features)))
        out: list[np.ndarray] = []
        with tempfile.NamedTemporaryFile(suffix=".bin", delete=False) as f:
            f.write(blob)
            path = f.name
        cap = None
        try:
            cap = cv2_mod.VideoCapture(path)
            idx = 0
            while len(out) < max_frames:
                ok, frame = cap.read()
                if not ok:
                    break
                if idx % max(every_nth, 1) == 0:
                    gray = cv2_mod.cvtColor(frame, cv2_mod.COLOR_BGR2GRAY)
                    small = cv2_mod.resize(gray, (g, g)).astype(np.float32)
                    out.append(small.ravel()[:n_features] / 255.0)
                idx += 1
        except cv2_mod.error:
            # a corrupt mid-stream frame degrades to the frames decoded
            # so far, like an unopenable container degrades to zero
            pass
        finally:
            if cap is not None:
                cap.release()
            os.unlink(path)
        return out

    def _stdlib_grid(frame: np.ndarray) -> list:
        from . import _stdlib_image as SI  # noqa: PLC0415

        g = int(np.ceil(np.sqrt(n_features)))
        small = SI.resize_nearest(frame, g, g).astype(np.float32).ravel()[:n_features]
        return (small / 255.0).tolist()

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from . import _stdlib_video as SV  # noqa: PLC0415

        cv2_mod = _cv2()
        for pdf in batches:
            ids, idxs, feats = [], [], []
            for rid, b in zip(pdf[id_col], pdf[bin_col]):
                if b is None:
                    continue
                blob = bytes(b)
                if cv2_mod is not None:
                    real = _real_frames(cv2_mod, blob)
                    if not real and strict:
                        # same loud contract as the cv2-less branch: a
                        # payload that decodes to zero frames must not
                        # be silently dropped under strict=True
                        raise NotImplementedError(
                            "cv2 decoded zero frames from this payload; "
                            "strict=True forbids silently dropping it"
                        )
                    for i, fr in enumerate(real):
                        ids.append(rid)
                        idxs.append(i)
                        feats.append(fr.tolist())
                    continue
                if SV.is_avi(blob):
                    frames = SV.decode_frames(
                        blob, every_nth=every_nth, max_frames=max_frames
                    )
                    if frames:
                        for i, fr in enumerate(frames):
                            ids.append(rid)
                            idxs.append(i)
                            feats.append(_stdlib_grid(fr))
                        continue
                if strict:
                    raise NotImplementedError(
                        "real video decoding for this payload requires "
                        "cv2/ffmpeg (the stdlib tier covers MJPEG AVI); "
                        "strict=True forbids the deterministic fake"
                    )
                n_frames = min(max_frames, max(1, len(b) // max(every_nth, 1)))
                for i in range(n_frames):
                    ids.append(rid)
                    idxs.append(i)
                    feats.append(
                        _fake_features(blob + i.to_bytes(4, "little"), n_features).tolist()
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

    def _real_resize(image_mod, blob: bytes) -> bytes | None:
        import io  # noqa: PLC0415

        try:
            img = image_mod.open(io.BytesIO(blob)).convert("L")
            return img.resize((target_w, target_h)).tobytes()
        except Exception:  # undecodable payload
            return None

    def _stdlib_resize(blob: bytes) -> bytes | None:
        from . import _stdlib_image as SI  # noqa: PLC0415

        px = SI.decode_gray(blob)
        if px is None:
            return None
        return SI.resize_nearest(px, target_w, target_h).tobytes()

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        image_mod = _pil()
        for pdf in batches:
            out = []
            for b in pdf[bin_col]:
                if b is None:
                    out.append(None)
                    continue
                blob = bytes(b)
                if image_mod is not None:
                    out.append(_real_resize(image_mod, blob))
                    continue
                # stdlib tier: REAL BMP/PNG/JPEG decode + nearest resize
                rz = _stdlib_resize(blob)
                if rz is None and strict:
                    raise NotImplementedError(
                        "real image resizing for this payload requires PIL "
                        "(the stdlib tier covers BMP/PNG/baseline-JPEG); strict=True "
                        "forbids the deterministic fake"
                    )
                if rz is not None:
                    out.append(rz)
                    continue
                # DETERMINISTIC FAKE: content-seeded byte payload of the
                # exact target size (real tiers take precedence above).
                h = np.frombuffer(blob, dtype=np.uint8).astype(np.uint64)
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


def audio_features(
    df: DataFrame,
    bin_col: str,
    id_col: str,
    strict: bool = False,
) -> DataFrame:
    """Corpus-curation audio signals from opaque binary audio columns:
    ``(id, duration_s, sample_rate, rms, zcr, peak, clip_frac,
    silence_frac)`` — the speech/music quality filters a 100 TB
    multimodal pipeline gates ingestion on (too-quiet, clipped,
    mostly-silence, implausible duration).

    Decode tiers mirror the image/video paths: PCM / IEEE-float WAV
    decodes with the pure-stdlib reader (`_stdlib_audio.py` — real
    sample math, any channel count, 8/16/24/32-bit int and 32/64-bit
    float); payloads in other codecs yield deterministic fake features
    (content-seeded), or raise NotImplementedError under
    ``strict=True``.  NULL payloads yield NULL features.
    """
    schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType, True),
            StructField("duration_s", FloatType(), True),
            StructField("sample_rate", IntegerType(), True),
            StructField("rms", FloatType(), True),
            StructField("zcr", FloatType(), True),
            StructField("peak", FloatType(), True),
            StructField("clip_frac", FloatType(), True),
            StructField("silence_frac", FloatType(), True),
        ]
    )
    cols = ["duration_s", "sample_rate", "rms", "zcr", "peak", "clip_frac", "silence_frac"]

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from . import _stdlib_audio as SA  # noqa: PLC0415

        def one(b) -> dict | None:
            if b is None:
                return None
            blob = bytes(b)
            feats = SA.features(blob)
            if feats is not None:
                return feats
            if strict:
                raise NotImplementedError(
                    "real audio decoding for this payload requires an "
                    "audio codec library (the stdlib tier covers PCM/"
                    "IEEE-float WAV); strict=True forbids the "
                    "deterministic fake"
                )
            fake = _fake_features(blob, 6)
            return {
                "duration_s": float(fake[0] * 600.0),
                "sample_rate": 16000,
                "rms": float(fake[1]),
                "zcr": float(fake[2]),
                "peak": float(fake[3]),
                "clip_frac": float(fake[4]),
                "silence_frac": float(fake[5]),
            }

        for pdf in batches:
            rows = [one(b) for b in pdf[bin_col]]
            out = {id_col: pdf[id_col]}
            for c in cols:
                out[c] = [None if r is None else r[c] for r in rows]
            yield pd.DataFrame(out)

    return df.select(id_col, bin_col).mapInPandas(decode, schema=schema)


def media_probe(
    df: DataFrame,
    bin_col: str,
    id_col: str,
) -> DataFrame:
    """Decode-free media metadata from container HEADERS only:
    ``(id, kind, format, width, height, n_frames, fps, sample_rate,
    channels, duration_s)`` — the stratify-before-decode pass a
    multimodal ingestion pipeline runs over everything (route by kind,
    reject implausible dimensions/durations, size decode budgets)
    WITHOUT paying entropy decode for a single pixel or sample.

    Pure stdlib header parsers: BMP/PNG/JPEG dimensions (any JPEG,
    progressive included — SOFn carries dims), AVI avih
    (frames/dims/fps), WAV fmt/data (rate/channels/duration).
    Unknown or corrupt containers yield kind ``NULL`` — never a task
    failure.  One mapInPandas pass; no shuffle.
    """
    schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType, True),
            StructField("kind", StringType(), True),
            StructField("format", StringType(), True),
            StructField("width", IntegerType(), True),
            StructField("height", IntegerType(), True),
            StructField("n_frames", IntegerType(), True),
            StructField("fps", FloatType(), True),
            StructField("sample_rate", IntegerType(), True),
            StructField("channels", IntegerType(), True),
            StructField("duration_s", FloatType(), True),
        ]
    )
    cols = [
        "kind", "format", "width", "height", "n_frames", "fps",
        "sample_rate", "channels", "duration_s",
    ]

    def probe_one(b) -> dict:
        out = dict.fromkeys(cols)
        if b is None:
            return out
        from . import _stdlib_audio as SA  # noqa: PLC0415
        from . import _stdlib_image as SI  # noqa: PLC0415
        from . import _stdlib_video as SV  # noqa: PLC0415

        blob = bytes(b)
        v = SV.probe(blob)
        if v is not None:
            out.update(
                kind="video", format="mjpeg_avi", width=v["width"],
                height=v["height"], n_frames=v["n_frames"], fps=v["fps"],
                duration_s=(v["n_frames"] / v["fps"]) if v["fps"] else None,
            )
            return out
        a = SA.probe(blob)
        if a is not None:
            out.update(
                kind="audio", format=f"wav_{a['codec']}{a['bits']}",
                sample_rate=a["sample_rate"], channels=a["channels"],
                n_frames=a["n_frames"], duration_s=a["duration_s"],
            )
            return out
        i = SI.probe(blob)
        if i is not None:
            out.update(
                kind="image", format=i["format"], width=i["width"],
                height=i["height"],
            )
        return out

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [probe_one(b) for b in pdf[bin_col]]
            data = {id_col: pdf[id_col]}
            for c in cols:
                data[c] = [r[c] for r in rows]
            yield pd.DataFrame(data)

    return df.select(id_col, bin_col).mapInPandas(run, schema=schema)
