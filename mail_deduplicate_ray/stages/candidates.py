"""Candidate generation + in-bucket verification -> verified edge table.

Four channels, each an explicit explode -> groupby(bucket) shuffle -> in-bucket
verify (SURVEY.md §4.3 shuffle #1; ref analogue: the hash-index grouping
deduplicate.py:1009 generalized from exact keys to LSH buckets):

  exact        groupby(exact_key): same composite sha ≡ duplicate by
               definition (ref: deduplicate.py:710-717) -> star edges, no
               pairwise work (the all-identical fast path,
               ref: deduplicate.py:292-310).
  minhash      per-band bucket keys from the MinHash signature; in-bucket
               est-Jaccard >= threshold.
  audio        16-bit bands of the 64-bit SRP audio fingerprint; in-bucket
               Hamming <= audio_hamming_max AND duration within tolerance.
  containment  bottom-m anchor shingles; in-bucket bottom-k containment
               estimate >= containment_threshold (the suffix-array
               exact-substring analogue from BASELINE.json).

In-bucket verification is **representative-based**: each member is compared
against the bucket-local cluster representatives found so far, joining the
first that passes; edges are a spanning set of the in-bucket transitive
closure, so edge count is O(members), not O(members^2) — connected
components downstream reconstructs the full clusters.  Oversized buckets are
capped at ``cfg.max_bucket`` deterministically (sorted by clip_id) and the
overflow is REPORTED via ``dropped`` rows, never silently (the skew story:
salting refinement tracked for a later round; the dominant mega-bucket cause
— all-identical keys — is already O(m) via the representative scheme).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from mail_deduplicate_ray.config import DedupConfig
from mail_deduplicate_ray.functions import minhash, simhash

EDGE_SCHEMA = pa.schema([
    ("src", pa.string()), ("dst", pa.string()),
    ("channel", pa.string()), ("dropped", pa.int64()),
])


def _edges_table(pairs: list[tuple[str, str]], channel: str,
                 dropped: int = 0) -> pa.Table:
    src = [min(a, b) for a, b in pairs]
    dst = [max(a, b) for a, b in pairs]
    n = len(pairs)
    return pa.table({
        "src": pa.array(src, pa.string()),
        "dst": pa.array(dst, pa.string()),
        "channel": pa.array([channel] * n, pa.string()),
        "dropped": pa.array([dropped] + [0] * (n - 1) if n else [], pa.int64()),
    })


def _empty_edges() -> pa.Table:
    return EDGE_SCHEMA.empty_table()


def _overflow_row(channel: str, dropped: int) -> pa.Table:
    """A no-edge accounting row so bucket truncation is visible in metrics."""
    return pa.table({
        "src": pa.array([""], pa.string()),
        "dst": pa.array([""], pa.string()),
        "channel": pa.array([channel], pa.string()),
        "dropped": pa.array([dropped], pa.int64()),
    })


def _cap_group(tbl: pa.Table, cap: int) -> tuple[pa.Table, int]:
    if tbl.num_rows <= cap:
        return tbl, 0
    order = pa.compute.sort_indices(tbl["clip_id"])
    return tbl.take(order[:cap]), tbl.num_rows - cap


# ---------------- exact channel ----------------

def exact_star_edges(group: pa.Table) -> pa.Table:
    ids = sorted(group["clip_id"].to_pylist())
    if len(ids) < 2:
        return _empty_edges()
    return _edges_table([(ids[0], other) for other in ids[1:]], "exact")


# ---------------- minhash channel ----------------

class ExplodeMinhashBands:
    """Actor-pool map_batches: one output row per (band bucket, clip)."""

    def __init__(self, cfg: DedupConfig) -> None:
        self.cfg = cfg
        self.mh = minhash.MinHasher(cfg.num_perm, cfg.minhash_seed, cfg.lsh_bands)

    def __call__(self, batch: pa.Table) -> pa.Table:
        keep = pa.compute.greater(batch["set_size"], 0)
        batch = batch.filter(keep)
        n = batch.num_rows
        if n == 0:
            return pa.table({"bucket": pa.array([], pa.uint64()),
                             "clip_id": pa.array([], pa.string()),
                             "minhash_sig": pa.array([], pa.binary()),
                             "exact_key": pa.array([], pa.string())})
        raw = b"".join(batch["minhash_sig"].to_pylist())
        sig = np.frombuffer(raw, dtype=np.uint64).reshape(n, self.cfg.num_perm)
        keys = self.mh.band_keys(sig)  # (n, bands)
        b = self.cfg.lsh_bands
        idx = np.repeat(np.arange(n), b)
        rep = batch.select(["clip_id", "minhash_sig", "exact_key"]).take(idx)
        return rep.append_column("bucket", pa.array(keys.reshape(-1)))


def verify_minhash_bucket(group: pa.Table, cfg: DedupConfig) -> pa.Table:
    if group.num_rows < 2:
        return _empty_edges()
    # all-identical fast path (ref: deduplicate.py:292-310): exact channel
    # already links these; emit nothing.
    ek = group["exact_key"].to_pylist()
    if len(set(ek)) == 1 and ek[0] is not None:
        return _empty_edges()
    group, dropped = _cap_group(group, cfg.max_bucket)
    n = group.num_rows
    sig = np.frombuffer(b"".join(group["minhash_sig"].to_pylist()),
                        dtype=np.uint64).reshape(n, cfg.num_perm)
    ids = group["clip_id"].to_pylist()
    order = np.argsort(np.asarray(ids))
    reps: list[int] = []
    pairs: list[tuple[str, str]] = []
    for i in order:
        if reps:
            sims = (sig[reps] == sig[i][None, :]).mean(axis=1)
            j = int(np.argmax(sims))
            if sims[j] >= cfg.jaccard_threshold:
                pairs.append((ids[reps[j]], ids[i]))
                continue
        reps.append(int(i))
    out = _edges_table(pairs, "minhash") if pairs else _empty_edges()
    if dropped:
        out = pa.concat_tables([out, _overflow_row("minhash", dropped)])
    return out


# ---------------- audio channel ----------------

class ExplodeAudioBands:
    def __init__(self, cfg: DedupConfig) -> None:
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = batch.filter(batch["decode_ok"])
        n = batch.num_rows
        if n == 0:
            return pa.table({"bucket": pa.array([], pa.uint64()),
                             "clip_id": pa.array([], pa.string()),
                             "audio_fp": pa.array([], pa.uint64()),
                             "dur_ms": pa.array([], pa.int32())})
        fp = np.asarray(batch["audio_fp"].to_numpy(zero_copy_only=False),
                        dtype=np.uint64)
        keys = simhash.band_keys_u64(fp, self.cfg.audio_bands, self.cfg.audio_bits)
        idx = np.repeat(np.arange(n), self.cfg.audio_bands)
        rep = batch.select(["clip_id", "audio_fp", "dur_ms"]).take(idx)
        return rep.append_column("bucket", pa.array(keys.reshape(-1)))


def verify_audio_bucket(group: pa.Table, cfg: DedupConfig) -> pa.Table:
    if group.num_rows < 2:
        return _empty_edges()
    group, dropped = _cap_group(group, cfg.max_bucket)
    fp = np.asarray(group["audio_fp"].to_numpy(zero_copy_only=False),
                    dtype=np.uint64)
    dur = np.asarray(group["dur_ms"].to_numpy(zero_copy_only=False),
                     dtype=np.int64)
    ids = group["clip_id"].to_pylist()
    order = np.argsort(np.asarray(ids))
    reps: list[int] = []
    pairs: list[tuple[str, str]] = []
    for i in order:
        matched = False
        if reps:
            hd = simhash.hamming(fp[reps], np.full(len(reps), fp[i], np.uint64))
            dur_ok = np.abs(dur[reps] - dur[i]) <= np.maximum(
                60, 0.05 * np.maximum(dur[reps], dur[i]))
            cand = np.flatnonzero((hd <= cfg.audio_hamming_max) & dur_ok)
            if len(cand):
                pairs.append((ids[reps[int(cand[0])]], ids[i]))
                matched = True
        if not matched:
            reps.append(int(i))
    out = _edges_table(pairs, "audio") if pairs else _empty_edges()
    if dropped:
        out = pa.concat_tables([out, _overflow_row("audio", dropped)])
    return out


# ---------------- containment channel ----------------

class ExplodeAnchors:
    def __init__(self, cfg: DedupConfig) -> None:
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = batch.filter(pa.compute.greater(batch["set_size"], 0))
        anchors = batch["anchors"].to_pylist()
        counts = [len(a) for a in anchors]
        idx = np.repeat(np.arange(batch.num_rows), counts)
        flat = (np.concatenate([np.asarray(a, dtype=np.uint64) for a in anchors])
                if anchors and idx.size else np.empty(0, np.uint64))
        rep = batch.select(["clip_id", "sketch", "set_size"]).take(idx)
        return rep.append_column("bucket", pa.array(flat))


def verify_containment_bucket(group: pa.Table, cfg: DedupConfig,
                              threshold: float = 0.9) -> pa.Table:
    if group.num_rows < 2:
        return _empty_edges()
    group, dropped = _cap_group(group, cfg.max_bucket)
    ids = group["clip_id"].to_pylist()
    sketches = [np.frombuffer(s, dtype=np.uint64)
                for s in group["sketch"].to_pylist()]
    sizes = group["set_size"].to_pylist()
    order = np.argsort(np.asarray(ids))
    k = 64
    reps: list[int] = []
    pairs: list[tuple[str, str]] = []
    for i in order:
        matched = False
        for r in reps:
            c = minhash.est_containment(sketches[r], sizes[r],
                                        sketches[i], sizes[i], k)
            if c >= threshold:
                pairs.append((ids[r], ids[i]))
                matched = True
                break
        if not matched:
            reps.append(int(i))
    out = _edges_table(pairs, "containment") if pairs else _empty_edges()
    if dropped:
        out = pa.concat_tables([out, _overflow_row("containment", dropped)])
    return out


# ---------------- channel drivers ----------------

def candidate_edges(sigs: "ray.data.Dataset", cfg: DedupConfig,
                    channels: tuple[str, ...] = ("exact", "minhash", "audio",
                                                 "containment"),
                    ) -> "ray.data.Dataset":
    """All verified candidate edges (union of channels), deduplicated.

    ``sigs`` is the output of DecodeStage + SignatureStage with
    rejected rows still present (they are filtered here).
    """
    usable = sigs.map_batches(
        lambda t: t.filter(pa.compute.invert(t["rejected"])),
        batch_format="pyarrow")
    parts = []
    if "exact" in channels:
        parts.append(
            usable.groupby("exact_key")
            .map_groups(exact_star_edges, batch_format="pyarrow"))
    if "minhash" in channels:
        exploded = usable.map_batches(
            ExplodeMinhashBands, fn_constructor_args=(cfg,),
            batch_format="pyarrow", concurrency=(1, 8))
        parts.append(exploded.groupby("bucket").map_groups(
            lambda g: verify_minhash_bucket(g, cfg), batch_format="pyarrow"))
    if "audio" in channels:
        exploded = usable.map_batches(
            ExplodeAudioBands, fn_constructor_args=(cfg,),
            batch_format="pyarrow", concurrency=(1, 8))
        parts.append(exploded.groupby("bucket").map_groups(
            lambda g: verify_audio_bucket(g, cfg), batch_format="pyarrow"))
    if "containment" in channels:
        exploded = usable.map_batches(
            ExplodeAnchors, fn_constructor_args=(cfg,),
            batch_format="pyarrow", concurrency=(1, 8))
        parts.append(exploded.groupby("bucket").map_groups(
            lambda g: verify_containment_bucket(g, cfg), batch_format="pyarrow"))
    edges = parts[0]
    for p in parts[1:]:
        edges = edges.union(p)
    return edges


def dedup_edges(raw_edges: "ray.data.Dataset") -> "ray.data.Dataset":
    """Drop overflow accounting rows + dedup pairs (a pair can surface from
    up to ``lsh_bands`` buckets and several channels)."""
    real = raw_edges.map_batches(
        lambda t: t.filter(pa.compute.not_equal(t["src"], "")),
        batch_format="pyarrow")
    return real.groupby(["src", "dst"]).map_groups(
        lambda g: g.slice(0, 1).select(["src", "dst", "channel"]),
        batch_format="pyarrow")


def overflow_dropped(raw_edges: "ray.data.Dataset") -> int:
    """Total rows dropped by bucket caps — reported, never silent."""
    only = raw_edges.map_batches(
        lambda t: t.filter(pa.compute.equal(t["src"], "")),
        batch_format="pyarrow")
    return int(only.sum("dropped") or 0)
