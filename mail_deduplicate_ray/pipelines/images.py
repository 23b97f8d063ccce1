"""Image near-dup pipeline: REAL pixel decode -> dHash -> exact pairs.

The image analogue of the clips flagship's fingerprint channels, over a
deterministic synthetic MIXED-FORMAT corpus (no image tables ship with
the testdata; synthesis is seeded per-index so any range is
bit-identical — the clips-corpus convention, synth.py).  Each image is
stored round-robin as BMP / PNG / PPM, and a duplicate lands in a
DIFFERENT container than its base — the pipeline detects re-encoded
copies across formats because all three decoders are lossless and the
fingerprint is computed on pixels, not bytes:

    read images parquet (cached fixture)
      -> ImageDecodeStage(real_decode=True) actor pool   [bytes -> pixels]
      -> dhash64 perceptual fingerprints
      -> pigeonhole banding (max_hamming+1 disjoint blocks — recall 1.0
         by construction, the simhash_neardup_pairs idiom)
      -> bucketed exact Hamming verify -> pair dedup

Planted near-dup structure: exact pixel copies (different container),
uniform brightness shifts (dhash-invariant by construction — horizontal
differences are unchanged except at clip boundaries), and mild pixel
noise.  Ground truth rides beside the cache for the recall test.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from mail_deduplicate_ray.functions import imaging
from mail_deduplicate_ray.stages import bucketing
from mail_deduplicate_ray.stages.multimodal import ImageDecodeStage

CACHE_ROOT = Path("/tmp/mdr_cache")
_H, _W = 48, 64


def _synth_image(rng: np.random.Generator) -> np.ndarray:
    """Low-frequency random field — dhash-meaningful structure (pure
    noise has no stable gradients, every hash bit is a coin flip)."""
    small = rng.integers(0, 256, (6, 8, 3)).astype(np.float32)
    img = np.stack([imaging.resize_bilinear(small[:, :, c], _H, _W)
                    for c in range(3)], axis=2)
    return np.clip(img, 0, 255).astype(np.uint8)


_FMT_CYCLE = ("bmp", "png", "ppm")
_ENCODERS = {"bmp": imaging.encode_bmp, "png": imaging.encode_png,
             "ppm": imaging.encode_ppm}


def images_path(sf_dir: str, n_base: int | None = None,
                seed: int = 46) -> Path:
    """Deterministic cached mixed-format corpus sized to the sf (n_base
    defaults to the documents row count).  Base i is stored as
    ``_FMT_CYCLE[i % 3]``; its duplicate as the NEXT format in the cycle
    (cross-container pairs) — except the ``jpeg`` kind, whose duplicate
    is a LOSSY baseline-JPEG re-encode (q95) of the base pixels (real
    cross-codec near-dup; dhash moves <= 2 bits on this corpus).
    Layout: parquet of (img_id, bytes, width, height, fmt) + a truth
    JSON of planted near-dup pairs."""
    if n_base is None:
        n_base = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    tag = Path(sf_dir).name or "sf"
    out = CACHE_ROOT / f"images-{tag}-{n_base}-{seed}"
    if out.exists():
        return out
    CACHE_ROOT.mkdir(parents=True, exist_ok=True)
    ids: list[str] = []
    payloads: list[bytes] = []
    fmts: list[str] = []
    pairs: list[tuple[str, str, str]] = []
    for i in range(n_base):
        rng = np.random.default_rng((seed, i))
        img = _synth_image(rng)
        base_id = f"img-{i:08d}-0"
        base_fmt = _FMT_CYCLE[i % len(_FMT_CYCLE)]
        ids.append(base_id)
        payloads.append(_ENCODERS[base_fmt](img))
        fmts.append(base_fmt)
        kind = ("unique", "exact", "bright",
                "noise", "jpeg")[int(rng.integers(5))]
        if kind == "unique":
            continue
        cid = f"img-{i:08d}-1"
        if kind == "jpeg":
            from mail_deduplicate_ray.functions.jpeg import encode_jpeg
            ids.append(cid)
            payloads.append(encode_jpeg(img, quality=95))
            fmts.append("jpg")
            pairs.append((base_id, cid, kind))
            continue
        if kind == "exact":
            dup = img
        elif kind == "bright":
            dup = np.clip(img.astype(np.int16)
                          + int(rng.integers(-12, 13)), 0, 255) \
                .astype(np.uint8)
        else:  # noise
            dup = np.clip(img.astype(np.int16)
                          + rng.integers(-2, 3, img.shape), 0, 255) \
                .astype(np.uint8)
        dup_fmt = _FMT_CYCLE[(i + 1) % len(_FMT_CYCLE)]
        ids.append(cid)
        payloads.append(_ENCODERS[dup_fmt](dup))
        fmts.append(dup_fmt)
        pairs.append((base_id, cid, kind))
    tbl = pa.table({
        "img_id": pa.array(ids, pa.string()),
        "bytes": pa.array(payloads, pa.binary()),
        "width": pa.array([_W] * len(ids), pa.int32()),
        "height": pa.array([_H] * len(ids), pa.int32()),
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


def image_hashes(sf_dir: str) -> "ray.data.Dataset":
    """(img_id, dhash, phash, decode_ok) via the REAL decode actor
    pool — ONE decode pass computes both fingerprints (the stage emits
    them together); payload-bearing rows in small batches, bytes
    dropped on exit."""
    from mail_deduplicate_ray.sources.clips_io import payload_batch_size

    path = images_path(sf_dir)
    ds = ray.data.read_parquet(str(path))
    return ds.map_batches(
        ImageDecodeStage, fn_constructor_args=(64, True),
        batch_format="pyarrow", batch_size=payload_batch_size(path),
        concurrency=bucketing.pool_size()) \
        .select_columns(["img_id", "dhash", "phash", "decode_ok"])


def images_dhash_neardup(sf_dir: str,
                         max_hamming: int = 3) -> "ray.data.Dataset":
    """EXACT dhash near-dup pairs (Hamming <= max_hamming): pigeonhole
    banding over the 64-bit hash -> bucketed verify -> pair dedup (the
    shared fingerprint primitive, pipelines/fingerprints.py)."""
    from mail_deduplicate_ray.pipelines.fingerprints import \
        exact_hamming_pairs
    hashes = image_hashes(sf_dir).map_batches(
        lambda t: t.filter(t["decode_ok"]), batch_format="pyarrow")
    return exact_hamming_pairs(hashes, "img_id", "dhash", max_hamming)


def images_phash_neardup(sf_dir: str,
                         max_hamming: int = 7) -> "ray.data.Dataset":
    """pHash (DCT low-frequency) near-dup pairs — the perceptual
    complement to ``images_dhash_neardup``: brightness shifts and pixel
    noise mostly perturb frequencies outside the 8x8 low-pass block,
    but coefficients NEAR the block median can flip, so perturbed
    copies land at Hamming 0-6 — the radius is 7 (8 bands x 8 bits,
    pigeonhole-exact).  8-bit bands bucket coarsely at extreme corpus
    sizes (low-frequency bits correlate); production widens the hash
    (e.g. 16x16 block -> 256 bits) before narrowing bands — same
    primitive, wider key.  One decode pass computes BOTH hashes."""
    from mail_deduplicate_ray.pipelines.fingerprints import \
        exact_hamming_pairs
    hashes = image_hashes(sf_dir).map_batches(
        lambda t: t.filter(t["decode_ok"]), batch_format="pyarrow") \
        .select_columns(["img_id", "phash"])
    return exact_hamming_pairs(hashes, "img_id", "phash", max_hamming)
