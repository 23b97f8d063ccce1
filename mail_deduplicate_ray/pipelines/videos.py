"""Video near-dup pipeline: REAL frame decode (Y4M + AVI/MJPEG) -> pooled SRP -> pairs.

Multimodal detector #3 (after audio fingerprints and image dHash):

    read videos parquet (cached deterministic mixed Y4M / AVI-MJPEG fixture)
      -> VideoFrameSampleStage(real_decode=True) actor pool
         [k uniformly-sampled luma frames decoded by OFFSET — unsampled
          frames never leave the payload buffer]
      -> pooled video signature: mean of per-frame tiny-image embeddings,
         renormalized, SRP-projected to a 64-bit fingerprint
      -> pigeonhole-exact Hamming pairs (pipelines/fingerprints.py)

The tiny-image embedding is mean-centered and L2-normalized, so uniform
brightness/contrast changes drop out of the signature EXACTLY; re-timed
copies (every-other-frame) sample near-identical content.  Both planted
duplicate kinds land within a few SRP bits.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from mail_deduplicate_ray.functions import imaging, simhash
from mail_deduplicate_ray.stages import bucketing
from mail_deduplicate_ray.stages.multimodal import VideoFrameSampleStage

CACHE_ROOT = Path("/tmp/mdr_cache")
_H, _W = 32, 32
_DIMS = 64


def _synth_frames(rng: np.random.Generator, n_frames: int) -> np.ndarray:
    """Low-frequency animated field: a seeded base pattern panning
    horizontally frame to frame (content persists across frames, so
    subsampled copies stay near-identical in pooled embedding)."""
    small = rng.integers(0, 256, (6, 6)).astype(np.float32)
    base = imaging.resize_bilinear(small, _H, _W * 2)
    out = np.empty((n_frames, _H, _W), np.uint8)
    for f in range(n_frames):
        off = f % _W
        out[f] = np.clip(base[:, off:off + _W], 0, 255).astype(np.uint8)
    return out


def videos_path(sf_dir: str, n_base: int | None = None,
                seed: int = 47) -> Path:
    """Deterministic cached mixed Y4M/AVI-MJPEG corpus (id, bytes, fps, n_frames, fmt) +
    planted-truth JSON.  Kinds: unique / exact copy / brightness shift /
    re-timed (every other frame)."""
    if n_base is None:
        n_base = max(64, pq.read_metadata(
            f"{sf_dir}/documents.parquet").num_rows // 2)
    tag = Path(sf_dir).name or "sf"
    out = CACHE_ROOT / f"videos-{tag}-{n_base}-{seed}"
    if out.exists():
        return out
    CACHE_ROOT.mkdir(parents=True, exist_ok=True)
    ids: list[str] = []
    payloads: list[bytes] = []
    nframes: list[int] = []
    fmts: list[str] = []
    pairs: list[tuple[str, str, str]] = []

    def _enc(frames: np.ndarray, container: str) -> bytes:
        if container == "avi":
            return imaging.encode_avi_mjpeg(frames, quality=90)
        return imaging.encode_y4m(frames)

    for i in range(n_base):
        rng = np.random.default_rng((seed, i))
        nf = int(rng.integers(8, 17))
        frames = _synth_frames(rng, nf)
        base_id = f"vid-{i:08d}-0"
        base_fmt = "avi" if i % 3 == 2 else "y4m"  # mixed REAL containers
        ids.append(base_id)
        payloads.append(_enc(frames, base_fmt))
        nframes.append(nf)
        fmts.append(base_fmt)
        kind = ("unique", "exact", "bright", "retime")[int(rng.integers(4))]
        if kind == "unique":
            continue
        cid = f"vid-{i:08d}-1"
        dup_fmt = base_fmt
        if kind == "exact":
            dup = frames
            # cross-container near-dup: the copy is re-encoded in the
            # OTHER container (lossy MJPEG one way) — same recording,
            # different bytes, the image-corpus convention
            dup_fmt = "avi" if base_fmt == "y4m" else "y4m"
        elif kind == "bright":
            dup = np.clip(frames.astype(np.int16)
                          + int(rng.integers(-15, 16)), 0, 255) \
                .astype(np.uint8)
        else:  # retime: every other frame
            dup = frames[::2]
        ids.append(cid)
        payloads.append(_enc(dup, dup_fmt))
        nframes.append(len(dup))
        fmts.append(dup_fmt)
        pairs.append((base_id, cid, kind))
    tbl = pa.table({
        "vid_id": pa.array(ids, pa.string()),
        "bytes": pa.array(payloads, pa.binary()),
        "fps": pa.array([25.0] * len(ids), pa.float32()),
        "n_frames": pa.array(nframes, pa.int32()),
        "fmt": pa.array(fmts, pa.string()),
    })
    tmp = out.with_suffix(".tmp")
    tmp.mkdir(parents=True, exist_ok=True)
    n_parts = max(1, min(16, tbl.num_rows // 256))
    step = -(-tbl.num_rows // n_parts)
    for p in range(n_parts):
        pq.write_table(tbl.slice(p * step, step),
                       tmp / f"part-{p:04d}.parquet", row_group_size=512)
    tmp.rename(out)
    (CACHE_ROOT / f"{out.name}.truth.json").write_text(
        json.dumps({"pairs": pairs}))
    return out


class _PooledSRP:
    """frame_embeddings -> pooled 64-bit SRP fingerprint (planes built
    once per actor — ST1)."""

    def __init__(self, dims: int = _DIMS, seed: int = 0xBEE) -> None:
        self.srp = simhash.SRP(dims, 64, seed)
        self.dims = dims

    def __call__(self, t: pa.Table) -> pa.Table:
        embs = t["frame_embeddings"].to_pylist()
        ok = t["decode_ok"].to_numpy(zero_copy_only=False)
        fps = np.zeros(t.num_rows, np.uint64)
        valid = np.zeros(t.num_rows, bool)
        for r, (fe, o) in enumerate(zip(embs, ok)):
            if not o or not fe:
                continue
            m = np.asarray(fe, np.float32).mean(axis=0)
            n = float(np.linalg.norm(m))
            if n == 0:
                continue
            fps[r] = self.srp.fingerprint(m / n)[0]
            valid[r] = True
        return pa.table({
            "vid_id": t["vid_id"],
            "vsig": pa.array(fps, pa.uint64()),
            "sig_ok": pa.array(valid),
        })


def video_signatures(sf_dir: str) -> "ray.data.Dataset":
    from mail_deduplicate_ray.sources.clips_io import payload_batch_size

    path = videos_path(sf_dir)
    ds = ray.data.read_parquet(str(path))
    sampled = ds.map_batches(
        VideoFrameSampleStage, fn_constructor_args=(8, _DIMS, True),
        batch_format="pyarrow",
        batch_size=payload_batch_size(path, target_bytes=2 << 20),
        concurrency=bucketing.pool_size())
    return sampled.map_batches(
        _PooledSRP, batch_format="pyarrow", batch_size=1024,
        concurrency=bucketing.pool_size(0.5))


def videos_frame_neardup(sf_dir: str,
                         max_hamming: int = 3) -> "ray.data.Dataset":
    """(a_id, b_id) video pairs whose pooled-frame SRP fingerprints sit
    within ``max_hamming`` bits — exact over the signatures (pigeonhole
    banding, shared fingerprint primitive)."""
    from mail_deduplicate_ray.pipelines.fingerprints import \
        exact_hamming_pairs
    sigs = video_signatures(sf_dir).map_batches(
        lambda t: t.filter(t["sig_ok"]), batch_format="pyarrow")
    return exact_hamming_pairs(sigs, "vid_id", "vsig", max_hamming)
