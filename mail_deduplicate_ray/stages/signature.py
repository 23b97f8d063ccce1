"""Signature stage: normalized columns + exact key + MinHash sig + sketches.

Actor-pool `map_batches` stage; the MinHash permutation matrix is built once
per actor in ``__init__`` (ref analogue: _WORKER initializer,
deduplicate.py:529-541).  Appends:

    codec_norm: string          normalized codec (M3)
    dur_bucket: int64           quantized duration (metadata-key component)
    transcript_norm: string     canonical transcript for shingling
    exact_key: string?          composite metadata+transcript sha (M9-M12)
    rejected: bool, reject_reason: string   (M8 minimal-fields guard)
    band_keys: binary           lsh_bands x uint64 LSH bucket keys
    minhash_sig8: binary        num_perm x uint8 (1-byte fold, verify payload)
    sketch: binary              bottom-k shingle hashes (containment verify)
    set_size: int64             true shingle-set size
    anchors: list<uint64>       m smallest shingle hashes (containment keys)

Signatures/sketches are packed as fixed-width binary so band-explode stages
can ``np.frombuffer`` them zero-copy and rows stay compact (~1.2 KB/row at
num_perm=128, bottomk=64).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from mail_deduplicate_ray.config import DedupConfig
from mail_deduplicate_ray.functions import hashing, minhash, normalize, shingles


def _fixed_bin(m: np.ndarray, width: int) -> pa.FixedSizeBinaryArray:
    """(n, ...) contiguous array -> n fixed-size binary rows of ``width``
    bytes, one buffer (no per-row tobytes loop).  Width is explicit so an
    EMPTY batch still carries the same schema as full ones."""
    n = m.shape[0]
    assert n == 0 or m.nbytes // n == width, (m.shape, m.dtype, width)
    return pa.FixedSizeBinaryArray.from_buffers(
        pa.binary(width), n, [None, pa.py_buffer(m.tobytes())])


def _fold_keys(keys: pa.Array) -> np.ndarray:
    """exact_key string -> uint64 hash (0 for null) — the 8-byte stand-in
    band rows carry for the all-identical fast path."""
    out = np.zeros(len(keys), dtype=np.uint64)
    for i, k in enumerate(keys.to_pylist()):
        if k:
            # fold head AND tail: the composite key is metadata_sha +
            # transcript_sha — both halves must distinguish
            out[i] = np.uint64((int(k[:16], 16) ^ int(k[-16:], 16)) or 1)
    return out


class FusedDecodeSignatureStage:
    """Decode + signature in ONE actor pool — halves pool spin-up and skips
    the inter-stage object-store hop (the two stages are always chained)."""

    def __init__(self, cfg: DedupConfig) -> None:
        from mail_deduplicate_ray.stages.decode import DecodeStage
        self.decode = DecodeStage(cfg)
        self.signature = SignatureStage(cfg)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return self.signature(self.decode(batch))


class SignatureStage:
    def __init__(self, cfg: DedupConfig) -> None:
        self.cfg = cfg
        self.mh = minhash.MinHasher(cfg.num_perm, cfg.minhash_seed, cfg.lsh_bands)

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        batch = batch.append_column(
            "codec_norm", normalize.normalize_codec(batch["codec"]))
        batch = batch.append_column(
            "dur_bucket", normalize.dur_bucket(batch["dur_ms"], cfg.dur_bucket_ms))
        tnorm = normalize.normalize_transcript(batch["transcript"])
        batch = batch.append_column("transcript_norm", tnorm)
        batch = hashing.add_exact_key(batch, cfg)

        texts = [t or "" for t in tnorm.to_pylist()]
        flat, offsets = shingles.batch_shingles(texts, cfg.shingle_k)
        sig = self.mh.signatures(flat, offsets)
        sizes = np.diff(offsets)
        # anchors from LONG shingles (cfg.anchor_k) — rare across unrelated
        # docs, shared by construction for true substrings (see config.py)
        lflat, loffs = shingles.batch_shingles(texts, cfg.anchor_k)
        anchors = self.mh.bottom_anchors(lflat, loffs)

        # The full 1 KB signature never leaves this stage: band keys are
        # precomputed here (16 x u64) and verification uses the 1-byte fold
        # (collision inflates est-j by (1-j)/255 ≈ 0.004).  This cuts both
        # the materialized signature table and LSH shuffle volume ~5x —
        # shuffles are memory-bandwidth-bound, the scaling-critical cost.
        band = self.mh.band_keys(sig)
        band_bin = _fixed_bin(np.ascontiguousarray(band), cfg.lsh_bands * 8)
        sig8 = (sig % np.uint64(255)).astype(np.uint8)
        sig8_bin = _fixed_bin(np.ascontiguousarray(sig8), cfg.num_perm)
        ek64 = _fold_keys(batch["exact_key"])
        anchors_arr = pa.array([a.tolist() for a in anchors],
                               pa.list_(pa.uint64()))
        return (
            batch.append_column("band_keys", band_bin)
            .append_column("minhash_sig8", sig8_bin)
            .append_column("ek64", pa.array(ek64))
            .append_column("set_size", pa.array(sizes))
            .append_column("anchors", anchors_arr)
        )
