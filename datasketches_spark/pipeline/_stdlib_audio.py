"""Stdlib-only WAV (RIFF-WAVE) codec for the multimodal audio tier.

Same design as `_stdlib_image.py` / `_stdlib_video.py`: the one
mainstream container that needs no third-party codec is PCM WAV, so
the dependency-free tier decodes exactly that — integer PCM (8/16/
24/32-bit) and IEEE-float (32/64-bit), any channel count — and
everything else falls to the caller's fake/strict policy.

Corruption contract: unparseable bytes yield ``None``, never an
executor-killing exception (untrusted corpus bytes).
"""

from __future__ import annotations

import struct

import numpy as np

# samples longer than this are rejected before allocation (~64M mono
# samples ≈ 2^26 * 4 bytes), mirroring the image tier's pixel cap
_MAX_SAMPLES = 1 << 26


def is_wav(blob: bytes) -> bool:
    return (
        isinstance(blob, (bytes, bytearray))
        and len(blob) >= 12
        and bytes(blob[:4]) == b"RIFF"
        and bytes(blob[8:12]) == b"WAVE"
    )


def probe(blob: bytes) -> dict | None:
    """(sample_rate, channels, bits, n_frames, duration_s) from the
    fmt/data chunks without decoding samples; None if not a WAV."""
    parsed = _chunks(blob)
    if parsed is None:
        return None
    fmt, data_len, _ = parsed
    if fmt is None:
        return None
    codec, ch, rate, _, block, bits = fmt
    frame_bytes = block or max(1, ch * (bits // 8))
    n_frames = data_len // frame_bytes if frame_bytes else 0
    return {
        "codec": "pcm" if codec == 1 else ("float" if codec == 3 else f"code{codec}"),
        "sample_rate": int(rate),
        "channels": int(ch),
        "bits": int(bits),
        "n_frames": int(n_frames),
        "duration_s": round(n_frames / rate, 6) if rate else 0.0,
    }


def _chunks(blob: bytes):
    """(fmt_tuple | None, data_len, data_offset) or None if not RIFF-WAVE.
    fmt_tuple = (codec, channels, rate, byte_rate, block_align, bits)."""
    if not is_wav(blob):
        return None
    blob = bytes(blob)
    fmt = None
    data = None
    pos = 12
    try:
        while pos + 8 <= len(blob):
            cid = blob[pos : pos + 4]
            (size,) = struct.unpack_from("<I", blob, pos + 4)
            # truncated upload: a data chunk routinely declares the
            # full recording's size while the blob holds a prefix —
            # clamp to the remaining bytes and keep the decodable
            # prefix (the video tier's "frames decoded so far"
            # contract), instead of rejecting the whole file
            avail = len(blob) - pos - 8
            if cid == b"fmt " and min(size, avail) >= 16:
                fmt = struct.unpack_from("<HHIIHH", blob, pos + 8)
            elif cid == b"data":
                data = (min(size, avail), pos + 8)
                if fmt is not None:
                    break
            pos += 8 + size + (size & 1)
    except struct.error:
        return None
    if data is None:
        return None
    return fmt, data[0], data[1]


def decode_mono(blob: bytes) -> tuple[np.ndarray, int] | None:
    """(mono float32 samples in [-1, 1], sample_rate) from a PCM or
    IEEE-float WAV; multi-channel input averages to mono.  None for
    anything unparseable or non-PCM codecs."""
    parsed = _chunks(blob)
    if parsed is None or parsed[0] is None:
        return None
    (codec, ch, rate, _, _, bits), data_len, off = parsed
    if rate <= 0 or not (1 <= ch <= 64):
        return None
    # cap BEFORE any decode allocation: the float32 conversion costs
    # 4x the payload plus a mixdown copy, so a multi-GB declared data
    # chunk must be rejected here, not after frombuffer/astype
    bytes_per_frame = max((max(bits, 8) // 8) * ch, 1)
    if data_len // bytes_per_frame > _MAX_SAMPLES:
        return None
    blob = bytes(blob)
    try:
        if codec == 1 and bits == 16:
            raw = np.frombuffer(blob, dtype="<i2", count=data_len // 2, offset=off)
            x = raw.astype(np.float32) / 32768.0
        elif codec == 1 and bits == 8:  # unsigned in WAV
            raw = np.frombuffer(blob, dtype=np.uint8, count=data_len, offset=off)
            x = (raw.astype(np.float32) - 128.0) / 128.0
        elif codec == 1 and bits == 32:
            raw = np.frombuffer(blob, dtype="<i4", count=data_len // 4, offset=off)
            x = raw.astype(np.float32) / 2147483648.0
        elif codec == 1 and bits == 24:
            n = data_len // 3
            b3 = np.frombuffer(blob, dtype=np.uint8, count=n * 3, offset=off)
            b3 = b3.reshape(n, 3).astype(np.int32)
            v = b3[:, 0] | (b3[:, 1] << 8) | (b3[:, 2] << 16)
            v = np.where(v & 0x800000, v - (1 << 24), v)
            x = v.astype(np.float32) / 8388608.0
        elif codec == 3 and bits == 32:
            x = np.frombuffer(blob, dtype="<f4", count=data_len // 4, offset=off).astype(
                np.float32
            )
        elif codec == 3 and bits == 64:
            x = np.frombuffer(blob, dtype="<f8", count=data_len // 8, offset=off).astype(
                np.float32
            )
        else:
            return None
    except ValueError:
        return None
    frames = x.size // ch
    if frames == 0 or frames > _MAX_SAMPLES:
        return None
    mono = x[: frames * ch].reshape(frames, ch).mean(axis=1)
    return mono.astype(np.float32), int(rate)


def features(blob: bytes) -> dict | None:
    """Corpus-curation audio signals from a decodable WAV: duration,
    rate, RMS energy, zero-crossing rate, peak, clipping fraction,
    leading/trailing-silence fraction.  None if undecodable."""
    dec = decode_mono(blob)
    if dec is None:
        return None
    x, rate = dec
    n = x.size
    rms = float(np.sqrt(np.mean(x * x)))
    zcr = float(np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1])) / max(n - 1, 1))
    peak = float(np.max(np.abs(x)))
    clip = float(np.count_nonzero(np.abs(x) >= 0.999) / n)
    loud = np.flatnonzero(np.abs(x) >= 0.01)
    silence = 1.0 if loud.size == 0 else float((loud[0] + (n - 1 - loud[-1])) / n)
    return {
        "duration_s": round(n / rate, 6),
        "sample_rate": rate,
        "rms": rms,
        "zcr": zcr,
        "peak": peak,
        "clip_frac": clip,
        "silence_frac": silence,
    }


def encode_wav_pcm16(samples: np.ndarray, rate: int = 16000, channels: int = 1) -> bytes:
    """Minimal PCM16 WAV from float samples in [-1, 1] — the fixture
    twin of the reader (interleaved if ``samples`` is (n, channels))."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 2:
        channels = x.shape[1]
    pcm = np.clip(np.rint(x * 32767.0), -32768, 32767).astype("<i2")
    body = pcm.tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * 2, channels * 2, 16)
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(body)) + body
        + (b"\x00" if len(body) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
