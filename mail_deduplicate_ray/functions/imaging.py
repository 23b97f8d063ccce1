"""Pure-numpy image/video codecs + perceptual features (no external libs).

Real pixel decode for the multimodal stages (stages/multimodal.py): the
sandbox has no image libraries, but several REAL public formats are plain
enough to parse with numpy alone —

- **BMP** (Windows bitmap, uncompressed 24-bit BGR, bottom-up or top-down,
  4-byte row padding) — the worked image format.
- **PPM/PGM** (Netpbm P6/P5, binary, maxval <= 255).
- **PNG** (8-bit gray / RGB / gray+alpha / RGBA / palette, non-interlaced)
  — the deflate stream is stdlib ``zlib``; chunk walk, CRC verification
  and scanline unfiltering (None/Sub/Up/Average/Paeth) are numpy. Sub is
  a per-lane cumsum, Up a previous-row add; only Average/Paeth rows pay a
  serial byte loop (their recurrence is inherently sequential).
- **JPEG** (baseline sequential DCT, ITU-T T.81 — see functions/jpeg.py):
  self-describing decode (tables read from DQT/DHT), 4:4:4/4:2:0/4:2:2
  chroma, restart markers; encoder with quality-scaled Annex-K tables.
- **Y4M** (YUV4MPEG2, C420 8-bit) — the worked VIDEO container; frames are
  parsed lazily by offset so frame-sampling never touches unsampled bytes.

Video codecs (H.264 etc.) genuinely need external libraries and stay out
of scope; the decode stages turn those into rejection rows (the
resilience contract, ref: deduplicate.py:563-576), never exceptions.

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
import zlib

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


# ---------------- PNG (8-bit, non-interlaced; stdlib zlib) ----------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> channels (bit depth 8 only)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body)))


def encode_png(img: np.ndarray, filter_type: int = 0) -> bytes:
    """uint8 image -> PNG.  (H, W) -> gray, (H, W, 3) -> RGB,
    (H, W, 4) -> RGBA; ``filter_type`` 0-4 is applied to every scanline
    (real encoders pick per-row; a fixed choice keeps the encoder a pure
    function and lets tests cover each filter's decode path)."""
    if img.dtype != np.uint8 or img.ndim not in (2, 3):
        raise ValueError("encode_png expects a uint8 (H,W[,C]) array")
    h, w = img.shape[:2]
    ch = 1 if img.ndim == 2 else img.shape[2]
    color = {1: 0, 3: 2, 4: 6}.get(ch)
    if color is None or not 0 <= filter_type <= 4:
        raise ValueError(f"unsupported channels={ch} or filter={filter_type}")
    rows = img.reshape(h, w * ch).astype(np.int64)
    prev = np.zeros(w * ch, np.int64)
    out = bytearray()
    for y in range(h):
        cur = rows[y]
        left = np.zeros_like(cur)
        left[ch:] = cur[:-ch]
        if filter_type == 0:
            flt = cur
        elif filter_type == 1:
            flt = cur - left
        elif filter_type == 2:
            flt = cur - prev
        elif filter_type == 3:
            flt = cur - (left + prev) // 2
        else:  # Paeth
            up_left = np.zeros_like(prev)
            up_left[ch:] = prev[:-ch]
            p = left + prev - up_left
            pa_, pb, pc_ = (np.abs(p - left), np.abs(p - prev),
                            np.abs(p - up_left))
            pred = np.where((pa_ <= pb) & (pa_ <= pc_), left,
                            np.where(pb <= pc_, prev, up_left))
            flt = cur - pred
        out.append(filter_type)
        out.extend((flt % 256).astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(out)))
            + _png_chunk(b"IEND", b""))


def _png_unfilter(raw: bytes, h: int, stride: int, bpp: int) -> np.ndarray:
    """Filtered scanlines -> reconstructed (h, stride) uint8 matrix."""
    if len(raw) < h * (stride + 1):
        raise ValueError("truncated PNG pixel data")
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.int64)
    pos = 0
    for y in range(h):
        ft = raw[pos]
        line = np.frombuffer(raw, np.uint8, count=stride,
                             offset=pos + 1).astype(np.int64)
        pos += stride + 1
        if ft == 0:
            rec = line
        elif ft == 1:  # Sub: per-lane prefix sum
            rec = line.copy()
            for lane in range(bpp):
                rec[lane::bpp] = np.cumsum(line[lane::bpp]) % 256
        elif ft == 2:  # Up
            rec = (line + prev) % 256
        elif ft == 3:  # Average: serial recurrence along the row
            rec = np.zeros(stride, np.int64)
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                rec[x] = (line[x] + (a + prev[x]) // 2) % 256
        elif ft == 4:  # Paeth: serial recurrence along the row
            rec = np.zeros(stride, np.int64)
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                c = prev[x - bpp] if x >= bpp else 0
                b = prev[x]
                p = a + b - c
                da, db, dc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (da <= db and da <= dc) else (b if db <= dc else c)
                rec[x] = (line[x] + pred) % 256
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        out[y] = rec
        prev = rec
    return out


def decode_png(data: bytes) -> np.ndarray:
    """PNG -> uint8 array: gray (H, W), gray+alpha (H, W, 2), RGB
    (H, W, 3), RGBA (H, W, 4); palette images resolve through PLTE to
    RGB.  Scope: bit depth 8, non-interlaced (the overwhelmingly common
    case); chunk CRCs are verified so corruption -> ValueError ->
    rejection rows, never wrong pixels."""
    if not data.startswith(_PNG_SIG):
        raise ValueError("not a PNG")
    pos = len(_PNG_SIG)
    w = h = color = -1
    plte: np.ndarray | None = None
    idat: list[bytes] = []
    while pos + 8 <= len(data):
        length, tag = struct.unpack_from(">I4s", data, pos)
        body = data[pos + 8:pos + 8 + length]
        if len(body) < length or pos + 12 + length > len(data):
            raise ValueError("truncated PNG chunk")
        crc = struct.unpack_from(">I", data, pos + 8 + length)[0]
        if zlib.crc32(tag + body) != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, color, comp, flt, interlace = struct.unpack(
                ">IIBBBBB", body)
            if depth != 8 or comp != 0 or flt != 0:
                raise ValueError(f"unsupported PNG (depth={depth})")
            if interlace:
                raise ValueError("interlaced PNG unsupported")
            if color not in _PNG_CHANNELS:
                raise ValueError(f"bad PNG color type {color}")
        elif tag == b"PLTE":
            plte = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            saw_end = True
            break
    else:
        saw_end = False
    if not saw_end:
        raise ValueError("truncated PNG (no complete IEND)")
    if w <= 0 or h <= 0 or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as e:
        raise ValueError(f"PNG deflate stream corrupt: {e}") from e
    ch = _PNG_CHANNELS[color]
    mat = _png_unfilter(raw, h, w * ch, ch)
    if color == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE")
        if int(mat.max(initial=0)) >= len(plte):
            raise ValueError("PNG palette index out of range")
        return plte[mat.reshape(h, w)]
    return mat.reshape(h, w) if ch == 1 else mat.reshape(h, w, ch)


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


# ---------------- AVI (MJPEG) ----------------
#
# Motion-JPEG in an AVI RIFF container — the second REAL video container
# (after Y4M), built on the baseline JPEG codec (functions/jpeg.py).
# Writer emits the canonical hdrl/movi/idx1 layout; the reader indexes
# '00dc' chunk offsets by walking chunk HEADERS only, so sampling frame
# k decodes exactly one JPEG payload (the same column-pruning-inside-a-
# payload discipline as the Y4M offset math).

import struct


def _riff_chunk(tag: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return tag + struct.pack("<I", len(body)) + body + pad


def _riff_list(kind: bytes, body: bytes) -> bytes:
    return _riff_chunk(b"LIST", kind + body)


def encode_avi_mjpeg(frames: np.ndarray, fps: int = 25,
                     quality: int = 90) -> bytes:
    """(N, H, W) uint8 gray frames -> AVI with one MJPG video stream
    (each frame an independent baseline JPEG — what hardware MJPEG
    encoders emit)."""
    from mail_deduplicate_ray.functions.jpeg import encode_jpeg

    n, h, w = frames.shape
    jpegs = [encode_jpeg(f, quality=quality) for f in frames]
    max_sz = max(len(j) for j in jpegs)

    avih = struct.pack("<14I",
                       1_000_000 // fps,   # dwMicroSecPerFrame
                       max_sz * fps,       # dwMaxBytesPerSec
                       0,                  # dwPaddingGranularity
                       0x10,               # AVIF_HASINDEX
                       n, 0, 1,            # frames, initial, streams
                       max_sz, w, h,
                       0, 0, 0, 0)
    strh = (b"vids" + b"MJPG"
            + struct.pack("<IHHIIIIIIIi4h",
                          0, 0, 0,       # flags, priority, language
                          0,             # initial frames
                          1, fps,        # scale, rate
                          0, n,          # start, length
                          max_sz,        # suggested buffer
                          0xFFFFFFFF,    # quality (driver default)
                          0,             # sample size (varies)
                          0, 0, int(w), int(h)))
    strf = struct.pack("<IiiHH4sIiiII",
                       40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0)
    hdrl = _riff_list(b"hdrl",
                      _riff_chunk(b"avih", avih)
                      + _riff_list(b"strl",
                                   _riff_chunk(b"strh", strh)
                                   + _riff_chunk(b"strf", strf)))
    movi_body = b"movi"
    idx = []
    for j in jpegs:
        idx.append((len(movi_body), len(j)))  # offset of '00dc' within movi
        movi_body += _riff_chunk(b"00dc", j)
    movi = _riff_chunk(b"LIST", movi_body)
    idx1 = b"".join(b"00dc" + struct.pack("<III", 0x10, off, sz)
                    for off, sz in idx)
    body = b"AVI " + hdrl + movi + _riff_chunk(b"idx1", idx1)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def avi_frame_offsets(data: bytes) -> list[tuple[int, int]]:
    """[(payload_offset, size)] of every video chunk ('00dc'/'00db') —
    found by walking chunk headers inside the movi LIST; payload bytes
    are never touched."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI file")
    pos, end = 12, 8 + struct.unpack("<I", data[4:8])[0]
    end = min(end, len(data))
    movi_start = movi_end = -1
    while pos + 8 <= end:
        tag = data[pos:pos + 4]
        sz = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        if tag == b"LIST" and data[pos + 8:pos + 12] == b"movi":
            movi_start, movi_end = pos + 12, pos + 8 + sz
            break
        pos += 8 + sz + (sz & 1)
    if movi_start < 0:
        raise ValueError("AVI movi list missing")
    out = []
    pos = movi_start
    while pos + 8 <= min(movi_end, len(data)):
        tag = data[pos:pos + 4]
        sz = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        if tag in (b"00dc", b"00db"):
            out.append((pos + 8, sz))
        pos += 8 + sz + (sz & 1)
    return out


def avi_frame_count(data: bytes) -> int:
    return len(avi_frame_offsets(data))


def decode_avi_frame(data: bytes, k: int) -> np.ndarray:
    """Gray luma of frame ``k`` — decodes exactly ONE embedded JPEG."""
    offs = avi_frame_offsets(data)
    if not 0 <= k < len(offs):
        raise ValueError(f"AVI frame {k} out of range")
    off, sz = offs[k]
    img = _decode_jpeg(data[off:off + sz])
    return to_gray(img) if img.ndim == 3 else img


def video_frame_count(data: bytes) -> int:
    """Container-sniffing frame count (tag over declared format — the
    codecs.py convention): RIFF -> AVI/MJPEG, YUV4 -> Y4M."""
    if data[:4] == b"RIFF":
        return avi_frame_count(data)
    return y4m_frame_count(data)


def decode_video_frame(data: bytes, k: int) -> np.ndarray:
    if data[:4] == b"RIFF":
        return decode_avi_frame(data, k)
    return decode_y4m_frame(data, k)


# ---------------- features ----------------

def to_gray(img: np.ndarray) -> np.ndarray:
    """uint8 RGB/RGBA/gray+alpha (or already-gray) -> float32 luma in
    [0, 255].  Alpha channels are ignored (fingerprints compare color)."""
    if img.ndim == 2:
        return img.astype(np.float32)
    if img.shape[2] == 2:  # gray + alpha (PNG color type 4)
        return img[:, :, 0].astype(np.float32)
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


_DCT32 = None


def _dct32() -> np.ndarray:
    """Orthonormal 32-point DCT-II basis (built once per process)."""
    global _DCT32
    if _DCT32 is None:
        n = np.arange(32)
        m = np.cos((2 * n[None, :] + 1) * n[:, None] * np.pi / 64)
        m[0] *= 1 / np.sqrt(2)
        _DCT32 = (m * np.sqrt(2 / 32)).astype(np.float64)
    return _DCT32


def phash64(gray: np.ndarray) -> int:
    """64-bit perceptual hash (pHash): 32x32 thumbnail -> 2D DCT ->
    top-left 8x8 low-frequency block -> bit per coefficient above the
    block median.  Uniform brightness shifts move only the DC term, and
    small noise perturbs high frequencies that never enter the block —
    the classic complement to the gradient-sign ``dhash64``."""
    t = resize_bilinear(gray, 32, 32).astype(np.float64)
    d = _dct32()
    coef = (d @ t @ d.T)[:8, :8].ravel()
    bits = coef > np.median(coef)
    return int(np.packbits(bits).view(">u8")[0])


def tiny_embedding(gray: np.ndarray, side: int = 8) -> np.ndarray:
    """L2-normalized mean-centered thumbnail — the classic tiny-image
    embedding (side*side float32 dims)."""
    t = resize_bilinear(gray, side, side).ravel().astype(np.float32)
    t = t - t.mean()
    n = float(np.linalg.norm(t))
    return t / n if n > 0 else t


# decode registry keyed by declared format; magic-sniff fallback
def _decode_jpeg(data: bytes) -> np.ndarray:
    from mail_deduplicate_ray.functions.jpeg import decode_jpeg
    return decode_jpeg(data)


_IMAGE_DECODERS = {
    "bmp": decode_bmp,
    "ppm": decode_netpbm,
    "pgm": decode_netpbm,
    "png": decode_png,
    "jpg": _decode_jpeg,
    "jpeg": _decode_jpeg,
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
    if data.startswith(_PNG_SIG):
        return decode_png(data)
    if data[:2] == b"\xff\xd8":
        return _decode_jpeg(data)
    head = data[:4].hex() if data else "empty"
    raise ValueError(f"unsupported image format (fmt={fmt!r}, head={head})")
