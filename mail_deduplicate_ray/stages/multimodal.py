"""Multimodal decode/feature stages beyond audio: images & video frames.

The engine treats every modality as an opaque ``binary`` column + typed
metadata, processed by actor-pool ``map_batches`` stages (same shape as
stages/decode.py).  The sandbox has no image/video libraries, so the pixel
work is STUBBED behind clearly-marked ``NotImplementedError`` — with a
deterministic fake featurizer so the Ray-side plumbing (schema, batch
sizing, actor signature, rejection rows, output layout) is real and tested.

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


def _fake_embedding(payload: bytes, dims: int) -> np.ndarray:
    """Deterministic stand-in for a real encoder: seeded by content hash.
    Replaced by a real model in production; the distribution of work
    (bytes -> fixed-dim float vector) is identical."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(dims).astype(np.float32)
    return v / np.linalg.norm(v)


class ImageDecodeStage:
    """bytes -> (embedding, ok, reason); drops ``bytes``.

    ``real_decode=True`` requires an image library (absent here) and raises
    NotImplementedError at construction — the stub path is the default and
    exercises the full Ray plumbing."""

    def __init__(self, dims: int = 64, real_decode: bool = False) -> None:
        if real_decode:
            raise NotImplementedError(
                "image decode: no image library in this container (stubbed)")
        self.dims = dims

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["bytes"].to_pylist()
        ok, reasons, embs = [], [], []
        for p in payloads:
            if not p:
                ok.append(False)
                reasons.append("empty_payload")
                embs.append(np.zeros(self.dims, dtype=np.float32))
            else:
                ok.append(True)
                reasons.append("")
                embs.append(_fake_embedding(p, self.dims))
        out = batch.drop_columns(["bytes"])
        return (out.append_column(
                    "embedding",
                    pa.array([e.tolist() for e in embs],
                             pa.list_(pa.float32(), self.dims)))
                .append_column("decode_ok", pa.array(ok))
                .append_column("decode_reason", pa.array(reasons, pa.string())))


class VideoFrameSampleStage:
    """bytes -> k frame embeddings (uniform sample positions); drops bytes.

    Real frame extraction needs a video library (absent) — stubbed the same
    way; the output layout (list of per-frame vectors + frame indices) is
    what a real sampler produces."""

    def __init__(self, k_frames: int = 4, dims: int = 64,
                 real_decode: bool = False) -> None:
        if real_decode:
            raise NotImplementedError(
                "video decode: no video library in this container (stubbed)")
        self.k = k_frames
        self.dims = dims

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["bytes"].to_pylist()
        n_frames = batch["n_frames"].to_pylist()
        embs, idxs, ok = [], [], []
        for p, nf in zip(payloads, n_frames):
            if not p or not nf:
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
