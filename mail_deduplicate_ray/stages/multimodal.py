"""Multimodal decode/feature stages beyond audio: images & video frames.

The engine treats every modality as an opaque ``binary`` column + typed
metadata, processed by actor-pool ``map_batches`` stages (same shape as
stages/decode.py).  Pixel decode is REAL for the stdlib-parseable
public formats (BMP 24-bit, Netpbm P5/P6, PNG via stdlib zlib, Y4M C420
video — see functions/imaging.py); formats that genuinely need external
codecs (JPEG/H.264, absent from this sandbox) become REJECTION ROWS with
a reason, never exceptions (the resilience contract, ref:
deduplicate.py:563-576).  The deterministic fake featurizer remains
available (``real_decode=False``) as the stand-in for learned encoders.

Schema convention::

    images: id string | bytes binary | width int32 | height int32 | fmt string
    videos: id string | bytes binary | fps float32 | n_frames int32 | fmt string

Batch sizing: rows carry multi-MB payloads, so callers pass small
``batch_size`` (e.g. 16-64) and the stage drops ``bytes`` on the way out —
the same dehydration rule as audio (ref: mail.py:228-262).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from mail_deduplicate_ray.functions import imaging


def _fake_embedding(payload: bytes, dims: int) -> np.ndarray:
    """Deterministic stand-in for a LEARNED encoder: seeded by content
    hash.  The real-decode path uses the classic tiny-image embedding
    instead; this fake remains the model-shaped placeholder (bytes ->
    fixed-dim float vector, identical work distribution)."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(dims).astype(np.float32)
    return v / np.linalg.norm(v)


class ImageDecodeStage:
    """bytes -> (embedding, dhash, decode_ok, reason); drops ``bytes``.

    ``real_decode=True``: decode via functions/imaging.py (BMP/PPM/PGM/PNG),
    embedding = L2-normalized 8x8 tiny-image (dims must be a square),
    ``dhash`` = 64-bit perceptual difference hash.  Unsupported/corrupt
    payloads -> decode_ok=False + reason.  ``real_decode=False``: the
    deterministic fake featurizer (learned-encoder stand-in); dhash 0."""

    def __init__(self, dims: int = 64, real_decode: bool = False) -> None:
        self.dims = dims
        self.real = real_decode
        if real_decode:
            side = int(dims ** 0.5)
            if side * side != dims:
                raise ValueError("real_decode needs a square dims "
                                 "(tiny-image embedding)")
            self.side = side

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["bytes"].to_pylist()
        fmts = (batch["fmt"].to_pylist() if "fmt" in batch.column_names
                else [None] * batch.num_rows)
        ok, reasons, embs, hashes, phashes = [], [], [], [], []
        for p, fmt in zip(payloads, fmts):
            if not p:
                ok.append(False)
                reasons.append("empty_payload")
                embs.append(np.zeros(self.dims, dtype=np.float32))
                hashes.append(0)
                phashes.append(0)
                continue
            if not self.real:
                ok.append(True)
                reasons.append("")
                embs.append(_fake_embedding(p, self.dims))
                hashes.append(0)
                phashes.append(0)
                continue
            try:
                gray = imaging.to_gray(imaging.decode_image(bytes(p), fmt))
                embs.append(imaging.tiny_embedding(gray, self.side))
                hashes.append(imaging.dhash64(gray))
                phashes.append(imaging.phash64(gray))
                ok.append(True)
                reasons.append("")
            except ValueError as e:  # rejection row, never an exception
                ok.append(False)
                reasons.append(str(e))
                embs.append(np.zeros(self.dims, dtype=np.float32))
                hashes.append(0)
                phashes.append(0)
        out = batch.drop_columns(["bytes"])
        return (out.append_column(
                    "embedding",
                    pa.array([e.tolist() for e in embs],
                             pa.list_(pa.float32(), self.dims)))
                .append_column("dhash", pa.array(
                    np.array(hashes, dtype=np.uint64), pa.uint64()))
                .append_column("phash", pa.array(
                    np.array(phashes, dtype=np.uint64), pa.uint64()))
                .append_column("decode_ok", pa.array(ok))
                .append_column("decode_reason", pa.array(reasons, pa.string())))


class VideoFrameSampleStage:
    """bytes -> k frame embeddings (uniform sample positions); drops bytes.

    ``real_decode=True``: Y4M (C420) parsing via functions/imaging.py —
    frame positions are resolved by OFFSET math, so only the sampled
    frames' luma planes are ever touched (the column-pruning discipline
    applied inside one payload).  Other containers -> decode_ok=False.
    ``real_decode=False``: deterministic fake embeddings (same layout)."""

    def __init__(self, k_frames: int = 4, dims: int = 64,
                 real_decode: bool = False) -> None:
        self.k = k_frames
        self.dims = dims
        self.real = real_decode
        if real_decode:
            side = int(dims ** 0.5)
            if side * side != dims:
                raise ValueError("real_decode needs a square dims")
            self.side = side

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["bytes"].to_pylist()
        n_frames = batch["n_frames"].to_pylist()
        embs, idxs, ok = [], [], []
        for p, nf in zip(payloads, n_frames):
            if not p:
                embs.append([])
                idxs.append([])
                ok.append(False)
                continue
            if self.real:
                try:
                    data = bytes(p)
                    # container sniff (tag over declared): Y4M or AVI/MJPEG
                    total = imaging.video_frame_count(data)
                    if total <= 0:
                        raise ValueError("no frames")
                    pos = np.unique(np.linspace(
                        0, total - 1, min(self.k, total)).astype(int))
                    embs.append([imaging.tiny_embedding(
                        imaging.decode_video_frame(data, int(i))
                        .astype(np.float32), self.side).tolist()
                        for i in pos])
                    idxs.append([int(i) for i in pos])
                    ok.append(True)
                except ValueError:
                    embs.append([])
                    idxs.append([])
                    ok.append(False)
                continue
            if not nf:
                embs.append([])
                idxs.append([])
                ok.append(False)
                continue
            pos = np.linspace(0, max(0, nf - 1), min(self.k, nf)).astype(int)
            embs.append([_fake_embedding(p + bytes([i % 256]), self.dims)
                         .tolist() for i in pos])
            idxs.append(pos.tolist())
            ok.append(True)
        out = batch.drop_columns(["bytes"])
        return (out.append_column(
                    "frame_embeddings",
                    pa.array(embs, pa.list_(pa.list_(pa.float32(), self.dims))))
                .append_column("frame_indices",
                               pa.array(idxs, pa.list_(pa.int32())))
                .append_column("decode_ok", pa.array(ok)))
