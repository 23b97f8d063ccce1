"""Exact-key construction: sha224 over canonical fields.

Re-expresses the reference's key family:
- M9  ``hash_key``             (ref: mail.py:409-421) — sha224 of serialized
  canonical headers -> here sha224 of "field_id: value" lines of the
  configured metadata columns.
- M10/M11 ``hash_raw_body`` / ``hash_normalized_body`` (ref: mail.py:423-439)
  -> transcript sha, raw or whitespace-squashed.
- M12 ``BodyHasher`` composite key (ref: deduplicate.py:164-178, used at
  deduplicate.py:574,992) -> ``exact_key = metadata_sha + transcript_sha``.
- M8 minimal-headers rejection (ref: mail.py:480-504, cli.py:97-104) ->
  rows with fewer than ``minimal_fields`` usable metadata fields get
  ``rejected=True`` instead of a key (rejection rows, never exceptions —
  ref: deduplicate.py:563-576).

hashlib releases the GIL per call and runs in C; the loop below is over a
precomputed list of serialized strings, which profiling shows is dominated
by sha224 itself (fine inside map_batches).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from mail_deduplicate_ray.config import DedupConfig
from mail_deduplicate_ray.functions import normalize


def sha224_hex(values: list[str]) -> list[str]:
    return [hashlib.sha224(v.encode("utf-8", "surrogatepass")).hexdigest()
            for v in values]


def serialize_fields(batch: pa.Table, field_names: tuple[str, ...]) -> tuple[list[str], np.ndarray]:
    """Serialize canonical metadata fields to "id: value" lines per row.

    Returns (serialized strings, usable-field count per row).  A field is
    usable when non-null and non-empty after stringification (ref:
    mail.py:441-453 present-only canonical headers).
    """
    n = batch.num_rows
    cols: list[list[str | None]] = []
    for name in field_names:
        arr = pc.cast(batch[name], pa.string())
        cols.append(arr.to_pylist())
    out: list[str] = []
    counts = np.zeros(n, dtype=np.int32)
    for i in range(n):
        parts = []
        for name, col in zip(field_names, cols):
            v = col[i]
            if v is not None and v != "":
                parts.append(f"{name}: {v}")
        counts[i] = len(parts)
        out.append("\n".join(parts))
    return out, counts


def transcript_sha(batch: pa.Table, mode: str) -> list[str]:
    """Transcript hash component per BodyHasher mode (skip|raw|normalized)."""
    if mode == "skip":
        return [""] * batch.num_rows
    t = batch["transcript"]
    if mode == "normalized":
        t = normalize.squash_whitespace(pc.utf8_lower(t))
    vals = pc.fill_null(t, "").to_pylist()
    return sha224_hex(vals)


def add_exact_key(batch: pa.Table, cfg: DedupConfig) -> pa.Table:
    """Append ``exact_key: string`` + ``rejected: bool`` + ``reject_reason``.

    The metadata side hashes the *normalized* columns (codec_norm,
    dur_bucket, sr_hz); call sites must have appended those first (see
    stages/signature.py).
    """
    serialized, counts = serialize_fields(batch, cfg.key_columns)
    meta_sha = sha224_hex(serialized)
    body = transcript_sha(batch, cfg.transcript_hash)
    keys = [m + b for m, b in zip(meta_sha, body)]
    if cfg.key_audio_fp and "audio_fp" in batch.column_names:
        # audio-content component (see config.key_audio_fp): 16-hex SRP
        # fingerprint of the decoded spectral features — "exact" then
        # means content-exact, not metadata-coincident
        fps = batch["audio_fp"].to_numpy(zero_copy_only=False)
        keys = [k + f"{fp:016x}" for k, fp in zip(keys, fps)]
    rejected = counts < cfg.minimal_fields
    reason = np.where(rejected, "too_few_fields", "")
    keys_arr = pa.array(
        [None if r else k for k, r in zip(keys, rejected)], pa.string()
    )
    return (
        batch.append_column("exact_key", keys_arr)
        .append_column("rejected", pa.array(rejected))
        .append_column("reject_reason", pa.array(reason.tolist(), pa.string()))
    )
