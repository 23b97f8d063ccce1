"""Baseline JPEG codec in pure numpy (ITU-T T.81 / JFIF, public spec).

Sequential baseline DCT only — the overwhelmingly common case:

- ``encode_jpeg``: 8-bit grayscale or RGB, quality-scaled Annex-K
  quantization tables, canonical Huffman tables, 4:4:4 or 4:2:0 chroma
  subsampling.
- ``decode_jpeg``: reads DQT/SOF0/DHT/DRI/SOS from the stream (so it is
  self-describing — the decoder never assumes the encoder's tables),
  entropy-decodes MCUs with byte-unstuffing and restart-marker handling,
  dequantizes, inverse-DCTs (one (64, 64) matmul per block batch), and
  upsamples chroma for any 1-2 sampling factor pair.  Progressive,
  arithmetic-coded, 12-bit and >3-component streams raise ValueError —
  which the decode stages turn into rejection rows.

The DCT is the exact orthonormal 8-point transform as a matrix product;
encode/decode loss comes only from quantization, so round-trip PSNR is
quality-controlled and testable.
"""

from __future__ import annotations

import struct

import numpy as np

# ---- constants (ITU-T T.81 Annex K) ----

_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], np.int64).reshape(8, 8)

_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], np.int64).reshape(8, 8)

_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))

_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]

_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]


def _zigzag_order() -> np.ndarray:
    """Row-major indices in zigzag order, generated (not hardcoded):
    anti-diagonal s traversed upward when s is even, downward when odd."""
    order = []
    for s in range(15):
        cells = [(i, s - i) for i in range(max(0, s - 7), min(7, s) + 1)]
        if s % 2 == 0:
            cells.reverse()
        order.extend(i * 8 + j for i, j in cells)
    return np.array(order, np.int64)


_ZIGZAG = _zigzag_order()
_UNZIGZAG = np.argsort(_ZIGZAG)

# orthonormal 8-point DCT-II basis: F = _DCT @ f @ _DCT.T
_DCT = np.array([[np.cos((2 * n + 1) * k * np.pi / 16)
                  * (np.sqrt(0.125) if k == 0 else 0.5)
                  for n in range(8)] for k in range(8)])


def _quality_scale(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


def _canonical_codes(bits: list[int], vals: list[int],
                     ) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per T.81 canonical code construction."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]):
    """Decoder tables: (fast, slow).  ``fast`` maps the next 8 bits to
    (symbol, code_length) for all codes <= 8 bits (the overwhelmingly
    common case — one dict hit per symbol); ``slow`` is the exact
    (length, code) -> symbol map walked bit-by-bit for longer codes."""
    codes = _canonical_codes(bits, vals)
    slow = {(ln, code): sym for sym, (code, ln) in codes.items()}
    fast: dict[int, tuple[int, int]] = {}
    for sym, (code, ln) in codes.items():
        if ln <= 8:
            base = code << (8 - ln)
            for pad in range(1 << (8 - ln)):
                fast[base | pad] = (sym, ln)
    return fast, slow


class _JBitWriter:
    """MSB-first bit writer with JPEG byte stuffing (0xFF -> 0xFF 0x00)."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, val: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | (val & ((1 << nbits) - 1))
        self.nacc += nbits
        while self.nacc >= 8:
            self.nacc -= 8
            b = (self.acc >> self.nacc) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)
        self.acc &= (1 << self.nacc) - 1

    def flush(self) -> bytes:
        if self.nacc:  # pad with 1-bits per spec
            self.write(0xFF, 8 - self.nacc)
        return bytes(self.buf)


def _magnitude(v: int) -> tuple[int, int]:
    """DC/AC coefficient -> (category/size, magnitude bits)."""
    size = int(abs(v)).bit_length()
    bits = v if v >= 0 else v + (1 << size) - 1
    return size, bits


def _extend(bits: int, size: int) -> int:
    """Inverse of _magnitude: T.81 EXTEND procedure."""
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def _blockify(plane: np.ndarray) -> np.ndarray:
    """(H, W) padded-to-8 plane -> (n_blocks, 8, 8), row-major blocks."""
    h, w = plane.shape
    return (plane.reshape(h // 8, 8, w // 8, 8)
            .transpose(0, 2, 1, 3).reshape(-1, 8, 8))


def _pad_to(plane: np.ndarray, mh: int, mw: int) -> np.ndarray:
    h, w = plane.shape
    ph, pw = (-h) % mh, (-w) % mw
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


def _rgb_to_ycbcr(img: np.ndarray) -> tuple[np.ndarray, ...]:
    f = img.astype(np.float64)
    r, g, b = f[:, :, 0], f[:, :, 1], f[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return y, cb, cr


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray,
                  ) -> np.ndarray:
    cb = cb - 128.0
    cr = cr - 128.0
    rgb = np.stack([y + 1.402 * cr,
                    y - 0.344136 * cb - 0.714136 * cr,
                    y + 1.772 * cb], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------- encoder ----------------

def _encode_block(bw: _JBitWriter, block: np.ndarray, qt: np.ndarray,
                  dc_codes: dict, ac_codes: dict, dc_pred: int) -> int:
    coef = _DCT @ (block.astype(np.float64) - 128.0) @ _DCT.T
    q = np.round(coef / qt).astype(np.int64).ravel()[_ZIGZAG]
    dc = int(q[0])
    size, bits = _magnitude(dc - dc_pred)
    code, ln = dc_codes[size]
    bw.write(code, ln)
    bw.write(bits, size)
    run = 0
    last_nz = int(np.max(np.nonzero(q)[0])) if np.any(q[1:]) else 0
    for i in range(1, last_nz + 1):
        v = int(q[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        size, bits = _magnitude(v)
        code, ln = ac_codes[(run << 4) | size]
        bw.write(code, ln)
        bw.write(bits, size)
        run = 0
    if last_nz < 63:
        code, ln = ac_codes[0x00]  # EOB
        bw.write(code, ln)
    return dc


def _dht_segment(tc_th: int, bits: list[int], vals: list[int]) -> bytes:
    body = bytes([tc_th]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def _dqt_segment(tq: int, table: np.ndarray) -> bytes:
    body = bytes([tq]) + bytes(int(v) for v in table.ravel()[_ZIGZAG])
    return b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body


def encode_jpeg(img: np.ndarray, quality: int = 85,
                subsampling: str = "444",
                restart_interval: int = 0) -> bytes:
    """(H, W) gray or (H, W, 3) RGB uint8 -> baseline JFIF JPEG.
    ``restart_interval`` > 0 emits a DRI segment and RSTn markers every
    that many MCUs (what hardware encoders do for error resilience)."""
    if img.dtype != np.uint8 or img.ndim not in (2, 3):
        raise ValueError("encode_jpeg expects uint8 (H,W[,3])")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    gray = img.ndim == 2
    qt_l = _quality_scale(_QT_LUMA, quality)
    qt_c = _quality_scale(_QT_CHROMA, quality)
    dc_l = _canonical_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_l = _canonical_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)
    dc_c = _canonical_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS)
    ac_c = _canonical_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS)

    out = bytearray(b"\xff\xd8")                       # SOI
    out += (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00"
            + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + bytes([0, 0]))
    out += _dqt_segment(0, qt_l)
    if not gray:
        out += _dqt_segment(1, qt_c)
    # SOF0
    ncomp = 1 if gray else 3
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    if gray:
        sof += bytes([1, 0x11, 0])
    elif subsampling == "444":
        sof += bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1])
    else:
        sof += bytes([1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0x00, _DC_LUMA_BITS, _DC_LUMA_VALS)
    out += _dht_segment(0x10, _AC_LUMA_BITS, _AC_LUMA_VALS)
    if not gray:
        out += _dht_segment(0x01, _DC_CHROMA_BITS, _DC_CHROMA_VALS)
        out += _dht_segment(0x11, _AC_CHROMA_BITS, _AC_CHROMA_VALS)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([ncomp])
    sos += bytes([1, 0x00])
    if not gray:
        sos += bytes([2, 0x11, 3, 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    if gray:
        planes = [(_pad_to(img.astype(np.float64), 8, 8), 1)]
        mcus_x, mcus_y = -(-w // 8), -(-h // 8)
    else:
        y, cb, cr = _rgb_to_ycbcr(img)
        if subsampling == "444":
            planes = [(_pad_to(p, 8, 8), 1) for p in (y, cb, cr)]
            mcus_x, mcus_y = -(-w // 8), -(-h // 8)
        else:
            # box-filter 2x2 chroma downsample on the padded plane
            def down(p: np.ndarray) -> np.ndarray:
                p = _pad_to(p, 16, 16)
                return (p.reshape(p.shape[0] // 2, 2,
                                  p.shape[1] // 2, 2).mean(axis=(1, 3)))
            planes = [(_pad_to(y, 16, 16), 2), (down(cb), 1), (down(cr), 1)]
            mcus_x, mcus_y = -(-w // 16), -(-h // 16)

    bw = _JBitWriter()
    preds = [0] * len(planes)
    since = 0
    rst_n = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and since == restart_interval:
                out += bw.flush()
                out += bytes([0xFF, 0xD0 + (rst_n & 7)])
                rst_n += 1
                bw = _JBitWriter()
                preds = [0] * len(planes)
                since = 0
            for ci, (plane, f) in enumerate(planes):
                qt = qt_l if ci == 0 else qt_c
                dct_, act_ = (dc_l, ac_l) if ci == 0 else (dc_c, ac_c)
                for by in range(f):
                    for bx in range(f):
                        y0 = (my * f + by) * 8
                        x0 = (mx * f + bx) * 8
                        blk = plane[y0:y0 + 8, x0:x0 + 8]
                        preds[ci] = _encode_block(
                            bw, blk, qt, dct_, act_, preds[ci])
            since += 1
    out += bw.flush()
    out += b"\xff\xd9"                                 # EOI
    return bytes(out)


# ---------------- decoder ----------------

class _JBitReader:
    """Bit reader over UNSTUFFED scan bytes (0xFF00 already collapsed).
    Python-int accumulator (no per-bit array indexing); Huffman symbols
    resolve via one 8-bit table probe in the common case."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.bytepos = 0
        self.acc = 0
        self.nacc = 0

    def _fill(self, n: int) -> None:
        while self.nacc < n:
            if self.bytepos >= len(self.data):
                raise ValueError("truncated JPEG scan")
            self.acc = (self.acc << 8) | self.data[self.bytepos]
            self.bytepos += 1
            self.nacc += 8

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill(n)
        self.nacc -= n
        v = (self.acc >> self.nacc) & ((1 << n) - 1)
        self.acc &= (1 << self.nacc) - 1
        return v

    def _peek8(self) -> int:
        # near stream end, missing bits read as 0 (never forms a valid
        # longer code than what remains, so truncation still errors)
        if self.nacc < 8 and self.bytepos < len(self.data):
            self._fill(8)
        if self.nacc >= 8:
            return (self.acc >> (self.nacc - 8)) & 0xFF
        return (self.acc << (8 - self.nacc)) & 0xFF

    def _drop(self, n: int) -> None:
        if self.nacc < n:
            raise ValueError("truncated JPEG scan")
        self.nacc -= n
        self.acc &= (1 << self.nacc) - 1

    def huff(self, table) -> int:
        fast, slow = table
        hit = fast.get(self._peek8())
        if hit is not None:
            sym, ln = hit
            self._drop(ln)
            return sym
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.read(1)
            sym = slow.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _decode_block(br: _JBitReader, dc_t: dict, ac_t: dict, qt: np.ndarray,
                  dc_pred: int) -> tuple[np.ndarray, int]:
    zz = np.zeros(64, np.int64)
    size = br.huff(dc_t)
    dc = dc_pred + _extend(br.read(size), size)
    zz[0] = dc
    i = 1
    while i < 64:
        sym = br.huff(ac_t)
        if sym == 0x00:  # EOB
            break
        run, size = sym >> 4, sym & 0x0F
        if size == 0:
            if run != 15:
                raise ValueError("bad JPEG AC symbol")
            i += 16  # ZRL
            continue
        i += run
        if i >= 64:
            raise ValueError("JPEG coefficient index overflow")
        zz[i] = _extend(br.read(size), size)
        i += 1
    coef = (zz * qt.ravel()[_ZIGZAG])[_UNZIGZAG].reshape(8, 8)
    pix = _DCT.T @ coef.astype(np.float64) @ _DCT + 128.0
    return pix, dc


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG -> (H, W) gray or (H, W, 3) RGB uint8."""
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    comps: list[tuple[int, int, int, int]] = []  # (id, h, v, tq)
    h = w = 0
    restart = 0
    scan: list[tuple[int, int, int]] = []        # (comp_idx, dc_id, ac_id)
    scan_start = -1
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        seglen = struct.unpack_from(">H", data, pos)[0]
        body = data[pos + 2:pos + seglen]
        if len(body) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        nxt = pos + seglen
        if marker == 0xDB:  # DQT (possibly several tables)
            bpos = 0
            while bpos < len(body):
                pq, tq = body[bpos] >> 4, body[bpos] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit JPEG quant tables unsupported")
                tbl = np.frombuffer(body, np.uint8, 64, bpos + 1) \
                    .astype(np.int64)
                qts[tq] = tbl[_UNZIGZAG].reshape(8, 8)
                bpos += 65
        elif marker == 0xC4:  # DHT
            bpos = 0
            while bpos < len(body):
                tc, th = body[bpos] >> 4, body[bpos] & 0x0F
                bits = list(body[bpos + 1:bpos + 17])
                n = sum(bits)
                vals = list(body[bpos + 17:bpos + 17 + n])
                (dc_tabs if tc == 0 else ac_tabs)[th] = \
                    _decode_table(bits, vals)
                bpos += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            if body[0] != 8:
                raise ValueError("only 8-bit JPEG supported")
            h, w = struct.unpack_from(">HH", body, 1)
            nc = body[5]
            if nc not in (1, 3):
                raise ValueError(f"unsupported JPEG component count {nc}")
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c:9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline (SOF0) JPEG supported")
        elif marker == 0xDD:  # DRI
            restart = struct.unpack(">H", body)[0]
        elif marker == 0xDA:  # SOS
            ns = body[0]
            ids = [c[0] for c in comps]
            for s in range(ns):
                cid, tabs = body[1 + 2 * s], body[2 + 2 * s]
                scan.append((ids.index(cid), tabs >> 4, tabs & 0x0F))
            scan_start = nxt
            break
        pos = nxt
    if scan_start < 0 or not comps or h == 0:
        raise ValueError("JPEG missing SOF/SOS")

    # extract entropy-coded bytes: unstuff FF00, stop at a real marker
    raw = bytearray()
    intervals: list[bytes] = []
    p = scan_start
    while p < len(data):
        b = data[p]
        if b != 0xFF:
            raw.append(b)
            p += 1
            continue
        m = data[p + 1] if p + 1 < len(data) else 0xD9
        if m == 0x00:
            raw.append(0xFF)
            p += 2
        elif 0xD0 <= m <= 0xD7:  # RSTn: interval boundary
            intervals.append(bytes(raw))
            raw = bytearray()
            p += 2
        else:
            break
    intervals.append(bytes(raw))

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    planes = [np.zeros((mcus_y * c[2] * 8, mcus_x * c[1] * 8)) for c in comps]

    br = _JBitReader(intervals[0])
    interval_i = 0
    preds = [0] * len(comps)
    since_restart = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart and since_restart == restart:
                interval_i += 1
                if interval_i >= len(intervals):
                    raise ValueError("missing JPEG restart interval")
                br = _JBitReader(intervals[interval_i])
                preds = [0] * len(comps)
                since_restart = 0
            for ci, dc_id, ac_id in scan:
                _cid, ch, cv, tq = comps[ci]
                if tq not in qts or dc_id not in dc_tabs \
                        or ac_id not in ac_tabs:
                    raise ValueError("JPEG scan references missing table")
                for by in range(cv):
                    for bx in range(ch):
                        pix, preds[ci] = _decode_block(
                            br, dc_tabs[dc_id], ac_tabs[ac_id],
                            qts[tq], preds[ci])
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = pix
            since_restart += 1

    # upsample to full resolution and crop
    full = []
    for (cid, ch, cv, _tq), plane in zip(comps, planes):
        up = np.repeat(np.repeat(plane, vmax // cv, axis=0),
                       hmax // ch, axis=1)
        full.append(up[:h, :w])
    if len(full) == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
    return _ycbcr_to_rgb(full[0], full[1], full[2])
