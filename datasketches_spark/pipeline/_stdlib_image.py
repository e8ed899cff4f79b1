"""Pure-stdlib image decoding: uncompressed BMP, zlib PNG, and
baseline-DCT JPEG.

A real-decoder tier between PIL and the deterministic fake: all three
formats are decodable with nothing beyond ``zlib`` + ``numpy``, so the
decode → grayscale → resize pixel math in pipeline/multimodal.py is
exercisable end-to-end in environments without PIL/cv2 (this CI
container included).  Formats covered:

- BMP: 'BM' magic, BITMAPINFOHEADER (or larger), BI_RGB (uncompressed)
  at 8 (grayscale palette), 24 or 32 bits per pixel, bottom-up or
  top-down rows, 4-byte row padding;
- PNG: 8-bit depth, color types 0 (gray), 2 (RGB), 4 (gray+alpha) and
  6 (RGBA), non-interlaced, with full scanline unfiltering
  (None/Sub/Up/Average/Paeth per the PNG spec §4.5.4);
- JPEG: baseline sequential DCT (SOF0/SOF1), 8-bit, Huffman-coded,
  1- or 3-component, any 1-4 sampling factors, DRI/RSTn restart
  markers.  Grayscale output needs only the luma plane, so chroma
  blocks are entropy-decoded (the bitstream must advance) but their
  IDCT is skipped.  Progressive (SOF2) and arithmetic-coded JPEGs
  return None.  Decoder validated against java's ImageIO encoder
  (javax.imageio writes standard Annex-K baseline JPEGs) in
  tests/test_pipeline.py.

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


# ------------------------------------------------------ baseline JPEG


def _zigzag() -> list[tuple[int, int]]:
    """The JPEG zigzag scan order, derived (not transcribed): even
    anti-diagonals run bottom-left -> top-right, odd ones the
    reverse, clamped to the 8x8 block."""
    out = []
    for s in range(15):
        cells = range(max(0, s - 7), min(s, 7) + 1)
        if s % 2 == 0:
            out.extend((s - c, c) for c in cells)  # up-right
        else:
            out.extend((r, s - r) for r in cells)  # down-left
    return out


_ZIG = _zigzag()
_ZIG_ROWS = np.array([r for r, _ in _ZIG])
_ZIG_COLS = np.array([c for _, c in _ZIG])


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II basis: F = A f A^T, f = A^T F A."""
    a = np.zeros((8, 8))
    for u in range(8):
        for x in range(8):
            cu = np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8)
            a[u, x] = cu * np.cos((2 * x + 1) * u * np.pi / 16)
    return a


_DCT_A = _dct_matrix()


class _BitReader:
    """MSB-first bit reader over entropy-coded JPEG data with 0xFF00
    byte unstuffing; RSTn markers are consumed on restart()."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 24:
            if self.pos >= len(self.data):
                self.acc = (self.acc << 8) & 0xFFFFFFFF
                self.nbits += 8  # pad past EOF with zeros (spec: EOI pad)
                continue
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 2  # stuffed FF
                else:
                    # a real marker: stop consuming, pad with zeros
                    self.acc = (self.acc << 8) & 0xFFFFFFFF
                    self.nbits += 8
                    continue
            else:
                self.pos += 1
            self.acc = ((self.acc << 8) | b) & 0xFFFFFFFF
            self.nbits += 8

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        return v

    def restart(self) -> bool:
        """Byte-align and consume an RSTn marker; False if absent."""
        self.acc = 0
        self.nbits = 0
        d, p = self.data, self.pos
        while p + 1 < len(d) and d[p] == 0xFF and d[p + 1] == 0xFF:
            p += 1
        if p + 1 < len(d) and d[p] == 0xFF and 0xD0 <= d[p + 1] <= 0xD7:
            self.pos = p + 2
            return True
        return False


def _build_huffman(bits: list[int], vals: bytes) -> dict[tuple[int, int], int]:
    """Canonical JPEG Huffman: {(length, code): symbol}."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(br: _BitReader, table: dict) -> int | None:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bits(1)
        sym = table.get((length, code))
        if sym is not None:
            return sym
    return None


def _extend(v: int, t: int) -> int:
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _decode_jpeg(blob: bytes) -> np.ndarray | None:
    if len(blob) < 4 or blob[:2] != b"\xff\xd8":
        return None
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> table
    comps = None  # list of (cid, h, v, tq)
    w = h = 0
    restart_interval = 0
    pos = 2
    scan = None
    while pos + 4 <= len(blob):
        if blob[pos] != 0xFF:
            return None
        marker = blob[pos + 1]
        if marker == 0xD8 or (0xD0 <= marker <= 0xD7):
            pos += 2
            continue
        if marker == 0xD9:  # EOI before SOS
            return None
        (seg_len,) = struct.unpack_from(">H", blob, pos + 2)
        body = blob[pos + 4 : pos + 2 + seg_len]
        if len(body) != seg_len - 2:
            return None
        if marker == 0xDB:  # DQT
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0xF
                off += 1
                n = 64 * (2 if pq else 1)
                if off + n > len(body):
                    return None
                raw = (
                    np.frombuffer(body, dtype=">u2", count=64, offset=off)
                    if pq
                    else np.frombuffer(body, dtype=np.uint8, count=64, offset=off)
                )
                tbl = np.zeros((8, 8), dtype=np.float64)
                tbl[_ZIG_ROWS, _ZIG_COLS] = raw
                qt[tq] = tbl
                off += n
        elif marker in (0xC0, 0xC1):  # SOF0 / SOF1 (baseline decoding)
            if body[0] != 8:
                return None
            h, w = struct.unpack_from(">HH", body, 1)
            nc = body[5]
            if nc not in (1, 3) or len(body) < 6 + 3 * nc:
                return None
            if not (0 < w <= 1 << 16 and 0 < h <= 1 << 16):
                return None
            # Cap total pixels BEFORE any dimension-derived allocation: a
            # crafted SOF0 can declare 65535x65535 (~34 GB of y_blocks)
            # with no entropy data behind it. 2^26 px (~8K x 8K) is far
            # beyond any corpus thumbnail this decoder tier is for.
            if w * h > 1 << 26:
                return None
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
                if not (1 <= hv >> 4 <= 4 and 1 <= (hv & 0xF) <= 4):
                    return None
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return None  # progressive / arithmetic / hierarchical
        elif marker == 0xC4:  # DHT
            off = 0
            while off + 17 <= len(body):
                tc, th = body[off] >> 4, body[off] & 0xF
                bits = list(body[off + 1 : off + 17])
                n = sum(bits)
                vals = body[off + 17 : off + 17 + n]
                if len(vals) != n:
                    return None
                huff[(tc, th)] = _build_huffman(bits, vals)
                off += 17 + n
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            ns = body[0]
            if comps is None or ns != len(comps) or len(body) < 1 + 2 * ns + 3:
                return None
            scan = []
            for i in range(ns):
                cs, tdta = body[1 + 2 * i], body[2 + 2 * i]
                match = [c for c in comps if c[0] == cs]
                if not match:
                    return None
                scan.append((match[0], tdta >> 4, tdta & 0xF))
            pos = pos + 2 + seg_len
            break
        pos += 2 + seg_len
    if scan is None or not qt:
        return None

    # MCU geometry; a single-component scan is non-interleaved: 8x8
    # data units regardless of declared sampling factors
    if len(scan) == 1:
        (cid, _, _, tq), td, ta = scan[0]
        scan = [((cid, 1, 1, tq), td, ta)]
    hm = max(c[0][1] for c in scan)
    vm = max(c[0][2] for c in scan)
    mcx = -(-w // (8 * hm))
    mcy = -(-h // (8 * vm))
    y_comp = scan[0][0]
    yw, yv = y_comp[1], y_comp[2]
    y_blocks = np.zeros((mcy * yv, mcx * yw, 8, 8), dtype=np.float64)

    br = _BitReader(blob, pos)
    pred = {c[0][0]: 0 for c in scan}
    try:
        for m in range(mcx * mcy):
            if restart_interval and m and m % restart_interval == 0:
                if not br.restart():
                    return None
                pred = {c[0][0]: 0 for c in scan}
            my, mx = divmod(m, mcx)
            for ci, ((cid, ch, cv, tq), td, ta) in enumerate(scan):
                dc_tbl = huff.get((0, td))
                ac_tbl = huff.get((1, ta))
                q = qt.get(tq)
                if dc_tbl is None or ac_tbl is None or q is None:
                    return None
                for by in range(cv):
                    for bx in range(ch):
                        t = _huff_decode(br, dc_tbl)
                        if t is None or t > 15:
                            return None
                        diff = _extend(br.bits(t), t) if t else 0
                        pred[cid] += diff
                        coef = np.zeros(64, dtype=np.float64)
                        coef[0] = pred[cid]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(br, ac_tbl)
                            if rs is None:
                                return None
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                return None
                            coef[k] = _extend(br.bits(s), s)
                            k += 1
                        if ci == 0:  # luma only: chroma IDCT skipped
                            blk = np.zeros((8, 8), dtype=np.float64)
                            blk[_ZIG_ROWS, _ZIG_COLS] = coef
                            blk *= q
                            y_blocks[my * yv + by, mx * yw + bx] = blk
    except (IndexError, KeyError):
        return None

    # one einsum IDCT over every luma block, then assemble the plane
    spatial = np.einsum("ux,mnuv,vy->mnxy", _DCT_A, y_blocks, _DCT_A)
    plane = spatial.transpose(0, 2, 1, 3).reshape(mcy * yv * 8, mcx * yw * 8)
    plane = np.clip(np.rint(plane + 128), 0, 255).astype(np.uint8)
    # luma plane dims for the image: ceil(w*yw/hm) x ceil(h*yv/vm)
    pw = -(-w * yw // hm)
    ph = -(-h * yv // vm)
    plane = plane[:ph, :pw]
    if (ph, pw) != (h, w):  # subsampled luma (rare): upscale to image size
        plane = resize_nearest(plane, w, h)
    return plane


def decode_gray(blob: bytes) -> np.ndarray | None:
    """HxW uint8 grayscale from BMP, PNG, or baseline-JPEG bytes,
    else None."""
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
    if blob[:2] == b"\xff\xd8":
        try:
            return _decode_jpeg(blob)
        except (struct.error, ValueError, IndexError, KeyError, MemoryError):
            # truncated segment bodies / corrupt table ids surface as
            # index errors deep in the marker parse — same None contract.
            # MemoryError: belt-and-braces behind the SOF0 pixel cap —
            # untrusted bytes must never fail the Spark task.
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


def encode_jpeg_gray(gray: np.ndarray, q: int = 8) -> bytes:
    """Minimal baseline-DCT grayscale JPEG (single component, flat
    quantization ``q``, custom fixed-length Huffman tables carried in
    DHT — canonical and prefix-free, just not size-optimal).  A real
    JPEG: java's ImageIO decodes it (cross-checked in tests)."""
    # q >= 2 keeps every quantized AC coefficient within the fixed
    # Huffman table's size categories 1..10: the level-shifted DCT can
    # reach |1024|, and 1024/1 has bit_length 11 -> KeyError at q=1.
    if not (2 <= int(q) <= 255):
        raise ValueError("encode_jpeg_gray: q must be in [2, 255]")
    q = int(q)
    h, w = gray.shape
    bh, bw = -(-h // 8), -(-w // 8)
    padded = np.zeros((bh * 8, bw * 8), dtype=np.float64)
    padded[:h, :w] = gray
    # edge-replicate padding so block borders don't ring
    padded[h:, :w] = gray[-1:, :]
    padded[:h, w:] = gray[:, -1:]
    padded[h:, w:] = gray[-1, -1]

    # canonical fixed-length tables: DC sizes 0..11 at 4 bits,
    # AC symbols (EOB, ZRL, run 0-15 x size 1-10) at 9 bits
    dc_syms = list(range(12))
    ac_syms = [0x00, 0xF0] + [
        (r << 4) | s for r in range(16) for s in range(1, 11)
    ]
    dc_bits = [0] * 16
    dc_bits[3] = len(dc_syms)  # all length 4
    ac_bits = [0] * 16
    ac_bits[8] = len(ac_syms)  # all length 9
    dc_code = {sym: (4, i) for i, sym in enumerate(dc_syms)}
    ac_code = {sym: (9, i) for i, sym in enumerate(ac_syms)}

    out = bytearray()
    acc = 0
    nbits = 0

    def put(val: int, n: int) -> None:
        nonlocal acc, nbits
        acc = (acc << n) | (val & ((1 << n) - 1))
        nbits += n
        while nbits >= 8:
            nbits -= 8
            b = (acc >> nbits) & 0xFF
            out.append(b)
            if b == 0xFF:
                out.append(0x00)

    def put_mag(v: int) -> int:
        """Append the magnitude bits of v; return its size category."""
        t = int(abs(v)).bit_length()
        if t:
            put(v if v > 0 else v + (1 << t) - 1, t)
        return t

    pred = 0
    for by in range(bh):
        for bx in range(bw):
            blk = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
            coef = _DCT_A @ blk @ _DCT_A.T
            zz = np.rint(coef[_ZIG_ROWS, _ZIG_COLS] / q).astype(int)
            diff = int(zz[0]) - pred
            pred = int(zz[0])
            t = int(abs(diff)).bit_length()
            ln, code = dc_code[t]
            put(code, ln)
            put_mag(diff)
            run = 0
            last = int(np.max(np.nonzero(zz)[0])) if np.any(zz) else 0
            for k in range(1, last + 1):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    ln, code = ac_code[0xF0]
                    put(code, ln)
                    run -= 16
                t = int(abs(v)).bit_length()
                ln, code = ac_code[(run << 4) | t]
                put(code, ln)
                put_mag(v)
                run = 0
            if last < 63:
                ln, code = ac_code[0x00]  # EOB
                put(code, ln)
    if nbits:
        put(0x7F, 7 - ((nbits - 1) % 8) + 1)  # pad with 1s via 0x7F tail

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    qzz = bytes([0]) + bytes([q] * 64)  # pq=0, tq=0, flat table (zigzag)
    sof = struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])
    # one DHT segment may carry several tables back to back
    dht = (
        bytes([0x00]) + bytes(dc_bits) + bytes(dc_syms)
        + bytes([0x10]) + bytes(ac_bits) + bytes(ac_syms)
    )
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    return (
        b"\xff\xd8"
        + seg(0xDB, qzz)
        + seg(0xC0, sof)
        + seg(0xC4, dht)
        + seg(0xDA, sos)
        + bytes(out)
        + b"\xff\xd9"
    )


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


def probe(blob: bytes) -> dict | None:
    """(format, width, height, bits) from container HEADERS only — no
    pixel decode, no entropy scan, so it runs at metadata-extraction
    speed over arbitrary corpus bytes.  BMP / PNG / JPEG (any JPEG,
    including progressive — the SOFn markers all carry dimensions);
    None for anything else or structurally corrupt headers."""
    if not isinstance(blob, (bytes, bytearray)) or len(blob) < 12:
        return None
    blob = bytes(blob)
    try:
        if blob[:2] == b"BM" and len(blob) >= 30:
            (hdr_size,) = struct.unpack_from("<I", blob, 14)
            if hdr_size < 40:
                return None
            w, h = struct.unpack_from("<ii", blob, 18)
            _, bpp = struct.unpack_from("<HH", blob, 26)
            return {"format": "bmp", "width": int(w), "height": abs(int(h)),
                    "bits": int(bpp)}
        if blob[:8] == _PNG_MAGIC and len(blob) >= 29 and blob[12:16] == b"IHDR":
            w, h = struct.unpack_from(">II", blob, 16)
            depth = blob[24]
            return {"format": "png", "width": int(w), "height": int(h),
                    "bits": int(depth)}
        if blob[:2] == b"\xff\xd8":
            pos = 2
            while pos + 4 <= len(blob):
                if blob[pos] != 0xFF:
                    return None
                marker = blob[pos + 1]
                if marker in (0xD8,) or 0xD0 <= marker <= 0xD7:
                    pos += 2
                    continue
                if marker in (0xD9, 0xDA):  # EOI / SOS before any SOF
                    return None
                (seg_len,) = struct.unpack_from(">H", blob, pos + 2)
                if seg_len < 2:
                    return None
                # any SOFn (0xC0-0xCF except DHT/JPG/DAC) carries dims
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                    if pos + 9 > len(blob):
                        return None
                    prec = blob[pos + 4]
                    h, w = struct.unpack_from(">HH", blob, pos + 5)
                    return {"format": "jpeg", "width": int(w),
                            "height": int(h), "bits": int(prec)}
                pos += 2 + seg_len
    except (struct.error, IndexError):
        return None
    return None
