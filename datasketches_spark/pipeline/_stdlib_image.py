"""Pure-stdlib image decoding: uncompressed BMP and zlib PNG.

A real-decoder tier between PIL and the deterministic fake: both
formats are decodable with nothing beyond ``zlib`` + ``numpy``, so the
decode → grayscale → resize pixel math in pipeline/multimodal.py is
exercisable end-to-end in environments without PIL/cv2 (this CI
container included).  Formats covered:

- BMP: 'BM' magic, BITMAPINFOHEADER (or larger), BI_RGB (uncompressed)
  at 8 (grayscale palette), 24 or 32 bits per pixel, bottom-up or
  top-down rows, 4-byte row padding;
- PNG: 8-bit depth, color types 0 (gray), 2 (RGB), 4 (gray+alpha) and
  6 (RGBA), non-interlaced, with full scanline unfiltering
  (None/Sub/Up/Average/Paeth per the PNG spec §4.5.4).

``decode_gray`` returns an HxW uint8 grayscale array (ITU-R 601 luma
for color inputs) or None for anything unparseable — the same
undecodable→NULL contract the PIL tier uses.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _luma(rgb: np.ndarray) -> np.ndarray:
    r = rgb[..., 0].astype(np.float32)
    g = rgb[..., 1].astype(np.float32)
    b = rgb[..., 2].astype(np.float32)
    # round, don't truncate: the weights sum to exactly 1, so a gray
    # pixel (r==g==b) must map to itself, not itself-minus-one
    return np.clip(np.rint(0.299 * r + 0.587 * g + 0.114 * b), 0, 255).astype(
        np.uint8
    )


def _decode_bmp(blob: bytes) -> np.ndarray | None:
    if len(blob) < 54 or blob[:2] != b"BM":
        return None
    (data_off,) = struct.unpack_from("<I", blob, 10)
    (hdr_size,) = struct.unpack_from("<I", blob, 14)
    if hdr_size < 40 or len(blob) < 14 + hdr_size:
        return None
    w, h = struct.unpack_from("<ii", blob, 18)
    planes, bpp = struct.unpack_from("<HH", blob, 26)
    (compression,) = struct.unpack_from("<I", blob, 30)
    if planes != 1 or compression != 0 or bpp not in (8, 24, 32):
        return None
    top_down = h < 0
    h = abs(h)
    if w <= 0 or h <= 0 or w > 1 << 16 or h > 1 << 16:
        return None
    row_bytes = (w * bpp // 8 + 3) & ~3
    if len(blob) < data_off + row_bytes * h:
        return None
    rows = np.frombuffer(
        blob, dtype=np.uint8, count=row_bytes * h, offset=data_off
    ).reshape(h, row_bytes)
    if not top_down:
        rows = rows[::-1]
    if bpp == 8:
        # resolve palette indices through the color table (BGRX
        # entries between the header and the pixel data) — an indexed
        # image with a non-gray palette must map through luma, not be
        # read as raw indices
        pal_off = 14 + hdr_size
        n_pal = min((data_off - pal_off) // 4, 256)
        if n_pal <= 0:
            return None
        pal = np.frombuffer(
            blob, dtype=np.uint8, count=n_pal * 4, offset=pal_off
        ).reshape(n_pal, 4)
        lut = np.zeros(256, dtype=np.uint8)
        lut[:n_pal] = _luma(pal[:, [2, 1, 0]].reshape(n_pal, 1, 3)).ravel()
        idx = rows[:, :w]
        if int(idx.max(initial=0)) >= n_pal:
            return None
        return lut[idx]
    px = rows[:, : w * (bpp // 8)].reshape(h, w, bpp // 8)
    return _luma(px[..., [2, 1, 0]])  # BMP stores BGR(A)


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray | None:
    """PNG scanline unfiltering (spec §4.5.4).  raw is h*(1+stride)."""
    out = np.zeros((h, stride), dtype=np.uint8)
    raw = raw.reshape(h, 1 + stride)
    for y in range(h):
        f = int(raw[y, 0])
        line = raw[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if f == 0:
            out[y] = line
        elif f == 2:  # Up
            out[y] = (line + prev) & 0xFF
        elif f in (1, 3, 4):  # Sub / Average / Paeth need a left scan
            cur = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                if f == 1:
                    v = line[x] + a
                elif f == 3:
                    v = line[x] + ((a + b) >> 1)
                else:
                    c = int(out[y - 1, x - bpp]) if (x >= bpp and y) else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    v = line[x] + pred
                cur[x] = v & 0xFF
            out[y] = cur
        else:
            return None
    return out


def _decode_png(blob: bytes) -> np.ndarray | None:
    if len(blob) < 33 or blob[:8] != _PNG_MAGIC:
        return None
    off = 8
    w = h = None
    channels = 0
    idat = []
    while off + 8 <= len(blob):
        (length,) = struct.unpack_from(">I", blob, off)
        ctype = blob[off + 4 : off + 8]
        body = blob[off + 8 : off + 8 + length]
        if len(body) != length:
            return None
        if ctype == b"IHDR":
            if length != 13:
                return None
            w, h, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or interlace != 0:
                return None
            channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color)
            if channels is None:
                return None
            if not (0 < w <= 1 << 16 and 0 < h <= 1 << 16):
                return None
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        off += 12 + length  # length + type + crc
    if w is None or not idat:
        return None
    try:
        raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    except zlib.error:
        return None
    stride = w * channels
    if raw.size != h * (1 + stride):
        return None
    px = _unfilter(raw, h, stride, channels)
    if px is None:
        return None
    px = px.reshape(h, w, channels)
    if channels == 1:
        return px[..., 0].copy()
    if channels == 2:  # gray + alpha
        return px[..., 0].copy()
    return _luma(px)


def decode_gray(blob: bytes) -> np.ndarray | None:
    """HxW uint8 grayscale from BMP or PNG bytes, else None."""
    if not isinstance(blob, (bytes, bytearray)) or len(blob) < 8:
        return None
    blob = bytes(blob)
    if blob[:2] == b"BM":
        try:
            return _decode_bmp(blob)
        except (struct.error, ValueError):
            return None
    if blob[:8] == _PNG_MAGIC:
        try:
            return _decode_png(blob)
        except (struct.error, ValueError):
            return None
    return None


def resize_nearest(img: np.ndarray, target_w: int, target_h: int) -> np.ndarray:
    """Nearest-neighbor resize (PIL's NEAREST index mapping)."""
    h, w = img.shape
    ys = np.minimum((np.arange(target_h) * h) // target_h, h - 1)
    xs = np.minimum((np.arange(target_w) * w) // target_w, w - 1)
    return img[np.ix_(ys, xs)]


# ---- encoders (test fixtures; tiny, exercised by the CI round trips)


def encode_bmp(gray: np.ndarray) -> bytes:
    """Minimal 8-bit grayscale BMP (palette = identity ramp)."""
    h, w = gray.shape
    row_bytes = (w + 3) & ~3
    palette = b"".join(bytes([i, i, i, 0]) for i in range(256))
    data_off = 14 + 40 + len(palette)
    rows = np.zeros((h, row_bytes), dtype=np.uint8)
    rows[:, :w] = gray[::-1]  # bottom-up
    body = rows.tobytes()
    head = b"BM" + struct.pack("<IHHI", data_off + len(body), 0, 0, data_off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, len(body), 2835, 2835, 256, 0)
    return head + info + palette + body


def encode_png(gray: np.ndarray) -> bytes:
    """Minimal 8-bit grayscale PNG (filter 0 scanlines)."""
    h, w = gray.shape

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + gray[y].tobytes() for y in range(h))
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )
