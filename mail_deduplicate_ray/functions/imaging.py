"""Pure-numpy image/video codecs + perceptual features (no external libs).

Real pixel decode for the multimodal stages (stages/multimodal.py): the
sandbox has no image libraries, but several REAL public formats are plain
enough to parse with numpy alone —

- **BMP** (Windows bitmap, uncompressed 24-bit BGR, bottom-up or top-down,
  4-byte row padding) — the worked image format.
- **PPM/PGM** (Netpbm P6/P5, binary, maxval <= 255).
- **Y4M** (YUV4MPEG2, C420 8-bit) — the worked VIDEO container; frames are
  parsed lazily by offset so frame-sampling never touches unsampled bytes.

JPEG/PNG/H.264 genuinely need external codecs and stay out of scope; the
decode stages turn those into rejection rows (the resilience contract,
ref: deduplicate.py:563-576), never exceptions.

Features:

- ``resize_bilinear`` — classic separable bilinear resample.
- ``to_gray`` — ITU-R 601 luma.
- ``dhash64`` — 64-bit difference hash (9x8 grayscale, horizontal
  gradient sign), the standard perceptual near-dup fingerprint.
- ``tiny_embedding`` — L2-normalized 8x8 grayscale thumbnail (64-dim), the
  classic tiny-image embedding the ANN/near-dup machinery consumes.
"""

from __future__ import annotations

import struct

import numpy as np


# ---------------- BMP (24-bit uncompressed) ----------------

def encode_bmp(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> 24-bit uncompressed BMP (bottom-up rows)."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("encode_bmp expects (H, W, 3) uint8")
    h, w = img.shape[:2]
    row = w * 3
    pad = (-row) % 4
    body = np.zeros((h, row + pad), dtype=np.uint8)
    body[:, :row] = img[::-1, :, ::-1].reshape(h, row)  # bottom-up, BGR
    data = body.tobytes()
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(data), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data),
                       2835, 2835, 0, 0)
    return header + info + data


def decode_bmp(data: bytes) -> np.ndarray:
    """24-bit uncompressed BMP -> (H, W, 3) uint8 RGB.  Supports bottom-up
    (positive height) and top-down (negative height) rows; raises
    ValueError on anything else (compressed, paletted, other depths)."""
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP")
    off = struct.unpack_from("<I", data, 10)[0]
    size, w, h_raw, _planes, bpp, comp = struct.unpack_from(
        "<IiiHHI", data, 14)
    if size < 40 or bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={comp})")
    top_down = h_raw < 0
    h = abs(h_raw)
    if w <= 0 or h == 0:
        raise ValueError("bad BMP dimensions")
    row = w * 3
    stride = row + ((-row) % 4)
    need = off + stride * h
    if len(data) < need:
        raise ValueError("truncated BMP payload")
    body = np.frombuffer(data, np.uint8, count=stride * h,
                         offset=off).reshape(h, stride)
    img = body[:, :row].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    return img if top_down else img[::-1]


# ---------------- Netpbm (P5 gray / P6 rgb, binary, maxval <= 255) ------

def encode_ppm(img: np.ndarray) -> bytes:
    if img.ndim == 2:
        h, w = img.shape
        return b"P5 %d %d 255\n" % (w, h) + img.astype(np.uint8).tobytes()
    h, w = img.shape[:2]
    return b"P6 %d %d 255\n" % (w, h) + img.astype(np.uint8).tobytes()


def decode_netpbm(data: bytes) -> np.ndarray:
    """P5 -> (H, W) uint8; P6 -> (H, W, 3) uint8."""
    if data[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary netpbm image")
    # header: magic, width, height, maxval — whitespace separated, with
    # optional '#' comments
    fields: list[int] = []
    i = 2
    while len(fields) < 3:
        while i < len(data) and data[i:i + 1].isspace():
            i += 1
        if i < len(data) and data[i:i + 1] == b"#":
            while i < len(data) and data[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(data) and not data[j:j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated netpbm header")
        fields.append(int(data[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255 or w <= 0 or h <= 0:
        raise ValueError("unsupported netpbm (maxval > 255 or bad dims)")
    ch = 1 if data[:2] == b"P5" else 3
    need = w * h * ch
    buf = np.frombuffer(data, np.uint8, count=need, offset=i) \
        if len(data) - i >= need else None
    if buf is None:
        raise ValueError("truncated netpbm payload")
    return buf.reshape((h, w) if ch == 1 else (h, w, 3)).copy()


# ---------------- Y4M (YUV4MPEG2 C420) ----------------

def encode_y4m(frames: np.ndarray, fps: int = 25) -> bytes:
    """(N, H, W) uint8 luma frames -> Y4M (C420, flat U/V planes at 128)."""
    n, h, w = frames.shape
    if h % 2 or w % 2:
        raise ValueError("Y4M C420 needs even dimensions")
    out = [b"YUV4MPEG2 W%d H%d F%d:1 Ip A1:1 C420\n" % (w, h, fps)]
    uv = np.full((h // 2) * (w // 2), 128, np.uint8).tobytes()
    for f in frames:
        out.append(b"FRAME\n")
        out.append(f.astype(np.uint8).tobytes())
        out.append(uv)
        out.append(uv)
    return b"".join(out)


def parse_y4m_header(data: bytes) -> tuple[int, int, float, int, int]:
    """-> (width, height, fps, header_end, frame_stride).  The stride is
    the byte length of one 'FRAME\\n' + C420 payload, so frame k starts at
    ``header_end + k * stride`` — sampling never reads unsampled frames."""
    nl = data.find(b"\n")
    if nl < 0 or not data.startswith(b"YUV4MPEG2"):
        raise ValueError("not a Y4M stream")
    w = h = 0
    num, den = 25, 1
    for tok in data[9:nl].split():
        tag, val = tok[:1], tok[1:]
        if tag == b"W":
            w = int(val)
        elif tag == b"H":
            h = int(val)
        elif tag == b"F":
            num, den = (int(x) for x in val.split(b":"))
        elif tag == b"C" and not val.startswith(b"420"):
            raise ValueError(f"unsupported Y4M chroma {val!r}")
    if w <= 0 or h <= 0:
        raise ValueError("bad Y4M dimensions")
    stride = 6 + w * h * 3 // 2  # b"FRAME\n" + Y + U + V
    return w, h, num / den, nl + 1, stride


def y4m_frame_count(data: bytes) -> int:
    _w, _h, _fps, start, stride = parse_y4m_header(data)
    return (len(data) - start) // stride


def decode_y4m_frame(data: bytes, k: int) -> np.ndarray:
    """Luma plane of frame ``k`` as (H, W) uint8 — offset math only, no
    pass over other frames."""
    w, h, _fps, start, stride = parse_y4m_header(data)
    base = start + k * stride
    if base + stride > len(data) or k < 0:
        raise ValueError(f"Y4M frame {k} out of range")
    if data[base:base + 6] != b"FRAME\n":
        raise ValueError("corrupt Y4M frame marker")
    return np.frombuffer(data, np.uint8, count=w * h,
                         offset=base + 6).reshape(h, w).copy()


# ---------------- features ----------------

def to_gray(img: np.ndarray) -> np.ndarray:
    """uint8 RGB (or already-gray) -> float32 luma in [0, 255]."""
    if img.ndim == 2:
        return img.astype(np.float32)
    f = img.astype(np.float32)
    return 0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]


def resize_bilinear(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Separable bilinear resample of a 2-D float array (align-corners
    style sampling at pixel centers)."""
    h, w = img.shape
    ys = (np.arange(out_h) + 0.5) * h / out_h - 0.5
    xs = (np.arange(out_w) + 0.5) * w / out_w - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :]
    a = img[np.ix_(y0, x0)]
    b = img[np.ix_(y0, x1)]
    c = img[np.ix_(y1, x0)]
    d = img[np.ix_(y1, x1)]
    return (a * (1 - wy) * (1 - wx) + b * (1 - wy) * wx
            + c * wy * (1 - wx) + d * wy * wx)


def dhash64(gray: np.ndarray) -> int:
    """64-bit difference hash: 9x8 thumbnail, horizontal gradient sign."""
    t = resize_bilinear(gray, 8, 9)
    bits = (t[:, 1:] > t[:, :-1]).ravel()
    return int(np.packbits(bits).view(">u8")[0])


def tiny_embedding(gray: np.ndarray, side: int = 8) -> np.ndarray:
    """L2-normalized mean-centered thumbnail — the classic tiny-image
    embedding (side*side float32 dims)."""
    t = resize_bilinear(gray, side, side).ravel().astype(np.float32)
    t = t - t.mean()
    n = float(np.linalg.norm(t))
    return t / n if n > 0 else t


# decode registry keyed by declared format; magic-sniff fallback
_IMAGE_DECODERS = {
    "bmp": decode_bmp,
    "ppm": decode_netpbm,
    "pgm": decode_netpbm,
}


def decode_image(data: bytes, fmt: str | None = None) -> np.ndarray:
    """bytes -> uint8 array (gray or RGB).  Declared format first, then
    magic sniff (the declared-then-sniffed cascade, ref: mail.py:384-407);
    formats needing external codecs raise ValueError -> rejection rows."""
    dec = _IMAGE_DECODERS.get((fmt or "").lower())
    if dec is not None:
        return dec(data)
    if data[:2] == b"BM":
        return decode_bmp(data)
    if data[:2] in (b"P5", b"P6"):
        return decode_netpbm(data)
    head = data[:4].hex() if data else "empty"
    raise ValueError(f"unsupported image format (fmt={fmt!r}, head={head}) "
                     "— JPEG/PNG need external codecs")
