"""Audio codec registry: encode/decode between float32 PCM and `bytes`.

The reference dispatches per-container parse logic on a ``BoxFormat`` enum
(ref: mail_box.py:243-287); here the ``codec`` column picks the decoder.
All codecs are numpy-only (the sandbox has no audio libraries):

- ``pcm_s16le`` — WAV container, format tag 1, int16 little-endian.
- ``ulaw``      — WAV container, format tag 7, G.711 mu-law 8-bit.
- ``flac``      — STUB: clearly-marked NotImplementedError (no codec lib in
  this container).  The Ray-side plumbing (registry entry, rejection-row
  semantics in the decode stage) is real and tested; the reference's
  charset-fallback-then-reject behaviour is mirrored (ref: mail.py:384-407,
  deduplicate.py:428-431).

Decoded PCM round-trips with SNR >= 30 dB (per BASELINE.json input_hint):
int16 quantization gives ~90 dB, mu-law ~35-40 dB for speech-like signals.
"""

from __future__ import annotations

import struct

import numpy as np

_RIFF = struct.Struct("<4sI4s4sIHHIIHH4sI")  # RIFF header + fmt + data chunk header


def _wav_header(fmt_tag: int, sr_hz: int, bits: int, n_bytes: int) -> bytes:
    block_align = bits // 8
    return _RIFF.pack(
        b"RIFF", 36 + n_bytes, b"WAVE", b"fmt ", 16,
        fmt_tag, 1, sr_hz, sr_hz * block_align, block_align, bits,
        b"data", n_bytes,
    )


def _parse_wav(data: "bytes | memoryview") -> tuple[int, int, "bytes | memoryview"]:
    """Return (fmt_tag, sr_hz, payload). Raises ValueError on malformed input.
    Accepts a memoryview so callers can pass Arrow buffer slices without a
    per-row bytes copy; the returned payload is then a memoryview too."""
    if len(data) < _RIFF.size:
        raise ValueError("truncated WAV header")
    (riff, _sz, wave, _fmt, _fmtsz, fmt_tag, channels, sr_hz,
     _brate, _balign, _bits, dtag, dlen) = _RIFF.unpack_from(data)
    if riff != b"RIFF" or wave != b"WAVE" or dtag != b"data" or channels != 1:
        raise ValueError("not a supported mono WAV")
    payload = data[_RIFF.size:_RIFF.size + dlen]
    if len(payload) != dlen:
        raise ValueError("truncated WAV payload")
    return fmt_tag, sr_hz, payload


# ---- PCM16 ----

def encode_pcm16(x: np.ndarray, sr_hz: int) -> bytes:
    q = np.clip(np.round(x * 32767.0), -32768, 32767).astype("<i2")
    raw = q.tobytes()
    return _wav_header(1, sr_hz, 16, len(raw)) + raw


def _decode_pcm16(payload: bytes) -> np.ndarray:
    return np.frombuffer(payload, dtype="<i2").astype(np.float32) / 32767.0


# ---- G.711 mu-law (8-bit) ----

_MU = 255.0


def _ulaw_compress(x: np.ndarray) -> np.ndarray:
    x = np.clip(x, -1.0, 1.0)
    y = np.sign(x) * np.log1p(_MU * np.abs(x)) / np.log1p(_MU)
    return np.clip(np.round((y + 1.0) * 127.5), 0, 255).astype(np.uint8)


def _ulaw_expand(b: np.ndarray) -> np.ndarray:
    y = b.astype(np.float32) / 127.5 - 1.0
    return np.sign(y) * (np.expm1(np.abs(y) * np.log1p(_MU)) / _MU)


def encode_ulaw(x: np.ndarray, sr_hz: int) -> bytes:
    raw = _ulaw_compress(x).tobytes()
    return _wav_header(7, sr_hz, 8, len(raw)) + raw


def _decode_ulaw(payload: bytes) -> np.ndarray:
    return _ulaw_expand(np.frombuffer(payload, dtype=np.uint8)).astype(np.float32)


# ---- FLAC stub ----

def encode_flac(x: np.ndarray, sr_hz: int) -> bytes:  # pragma: no cover - stub
    raise NotImplementedError("flac: no codec library in this container (stubbed)")


def _decode_flac(payload: bytes) -> np.ndarray:  # pragma: no cover - stub
    raise NotImplementedError("flac: no codec library in this container (stubbed)")


ENCODERS = {"pcm_s16le": encode_pcm16, "ulaw": encode_ulaw, "flac": encode_flac}
_TAG_DECODERS = {1: _decode_pcm16, 7: _decode_ulaw}
AVAILABLE_CODECS = ("pcm_s16le", "ulaw")


def encode(x: np.ndarray, sr_hz: int, codec: str) -> bytes:
    try:
        enc = ENCODERS[codec]
    except KeyError:
        raise ValueError(f"unknown codec {codec!r}") from None
    return enc(x, sr_hz)


_TAG_SAMPLE_BYTES = {1: 2, 7: 1}


def decode(data: "bytes | memoryview", declared_codec: str | None = None,
           max_samples: int | None = None) -> tuple[np.ndarray, int]:
    """Decode `bytes` -> (float32 PCM, sr_hz).

    Mirrors the reference's declared-then-sniffed fallback cascade
    (ref: mail.py:384-407 decode_part): the WAV format tag wins over the
    declared codec; unknown tags / malformed containers raise ValueError
    (the decode *stage* converts that into a rejection row, never an
    exception — ref: deduplicate.py:563-576).

    ``data`` may be a memoryview (zero-copy Arrow buffer slice); the
    container is still validated against its declared length in full.
    ``max_samples`` limits the sample CONVERSION to a prefix — the decode
    stage only feeds the first ``_FFT_WINDOW`` samples to the spectral
    features, so converting the rest is pure DRAM traffic at 100 TB scale.
    """
    if declared_codec == "flac":
        return _decode_flac(data), 0
    fmt_tag, sr_hz, payload = _parse_wav(data)
    dec = _TAG_DECODERS.get(fmt_tag)
    if dec is None:
        raise ValueError(f"unsupported WAV format tag {fmt_tag}")
    if max_samples is not None:
        payload = payload[:_TAG_SAMPLE_BYTES[fmt_tag] * max_samples]
    return dec(payload), sr_hz


def snr_db(ref: np.ndarray, test: np.ndarray) -> float:
    """Signal-to-noise ratio in dB between a reference and decoded waveform."""
    n = min(len(ref), len(test))
    if n == 0:
        return float("inf")
    ref, test = ref[:n].astype(np.float64), test[:n].astype(np.float64)
    noise = np.sum((ref - test) ** 2)
    if noise == 0:
        return float("inf")
    return float(10.0 * np.log10(np.sum(ref**2) / noise))
