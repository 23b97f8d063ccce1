"""Candidate generation + in-bucket verification -> verified edge table.

Four channels, each an explicit explode -> bucketed groupby shuffle ->
in-partition verification (SURVEY.md §4.3 shuffle #1; ref analogue: the
hash-index grouping deduplicate.py:1009 generalized from exact keys to LSH
buckets):

  exact        same composite sha ≡ duplicate by definition
               (ref: deduplicate.py:710-717) -> star edges, fully
               vectorized (groupby-transform-min), no pairwise work
               (the all-identical fast path, ref: deduplicate.py:292-310).
  minhash      per-band bucket keys from the MinHash signature; in-bucket
               est-Jaccard >= threshold.
  audio        16-bit bands of the 64-bit SRP audio fingerprint; in-bucket
               Hamming <= audio_hamming_max AND duration within tolerance.
  containment  bottom-m anchor shingles; in-bucket bottom-k containment
               estimate >= containment_threshold (the suffix-array
               exact-substring analogue from BASELINE.json).

Shuffle shape: explode emits (bucket:uint64, payload) rows; the shuffle key
is ``bucket % nbuckets`` (small int), and ONE partition call verifies every
bucket hashed into it (stages/bucketing.py idiom) — per-bucket Python cost
without per-bucket task scheduling.

In-bucket verification computes the pairwise similarity MATRIX in one
vectorized shot (est-Jaccard / Hamming+feature-cosine / containment) and
reduces it to a SPANNING edge set via a tiny union-find, so edge count is
O(members) — connected components downstream rebuilds full clusters.
Bucket iteration is numpy sort + boundary slicing (``_bucket_slices``) —
never per-bucket pandas objects (partitions hold hundreds of thousands of
tiny buckets).  Oversized buckets are capped at ``cfg.max_bucket``
deterministically (clip_id order) and the overflow is REPORTED via
``dropped`` accounting rows, never silently.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from mail_deduplicate_ray.config import DedupConfig
from mail_deduplicate_ray.functions import simhash
from mail_deduplicate_ray.stages import bucketing

_EMPTY = pd.DataFrame({"src": pd.Series(dtype=str),
                       "dst": pd.Series(dtype=str),
                       "channel": pd.Series(dtype=str),
                       "dropped": pd.Series(dtype="int64")})


def _edges_df(pairs: list[tuple[str, str]], channel: str,
              dropped: int) -> pd.DataFrame:
    rows = [(min(a, b), max(a, b), channel, 0) for a, b in pairs]
    if dropped:
        rows.append(("", "", channel, dropped))
    if not rows:
        return _EMPTY
    return pd.DataFrame(rows, columns=["src", "dst", "channel", "dropped"])


# ---------------- exact channel (vectorized star edges) ----------------

def _exact_partition(df: pd.DataFrame) -> pd.DataFrame:
    mins = df.groupby("exact_key")["clip_id"].transform("min")
    dup = df["clip_id"] != mins
    if not dup.any():
        return _EMPTY
    return pd.DataFrame({"src": mins[dup], "dst": df.loc[dup, "clip_id"],
                         "channel": "exact", "dropped": 0})


# ---------------- shared spanning-edge extraction ----------------

def _spanning_edges(ids: np.ndarray, adj: np.ndarray) -> list[tuple[str, str]]:
    """Reduce a boolean adjacency matrix (members sorted by clip_id) to a
    spanning edge set of its in-bucket transitive closure via a tiny
    union-find — O(true pairs) with path compression; edges emitted are
    deterministic (row-major over sorted ids)."""
    m = len(ids)
    parent = np.arange(m)

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    pairs: list[tuple[str, str]] = []
    ii, jj = np.nonzero(np.triu(adj, 1))
    for i, j in zip(ii.tolist(), jj.tolist()):
        ri, rj = find(i), find(j)
        if ri != rj:
            parent[max(ri, rj)] = min(ri, rj)
            pairs.append((ids[i], ids[j]))
    return pairs


def _jaccard_matrix(sig: np.ndarray) -> np.ndarray:
    """(m, num_perm) -> (m, m) estimated Jaccard (vectorized, one shot)."""
    return (sig[:, None, :] == sig[None, :, :]).mean(axis=2)


_FOLD_SEED = np.uint64(0xCBF29CE484222325)
_FOLD_P = np.uint64(0x100000001B3)


def _fold_u64_cols(m: np.ndarray) -> np.ndarray:
    """(n, k) uint64 -> (n,) multiply-xor row fingerprints, vectorized over
    rows (FNV-style).  Used to group byte-identical verification keys inside
    buckets: ``np.unique`` over plain u64 is ~100x cheaper than
    ``np.unique(axis=0)`` on the raw byte matrix (whose structured-dtype
    promotion dominated the containment partition in profiling).  A 64-bit
    collision merges two DISTINCT keys within one bucket — probability
    <= max_bucket^2 / 2^65 ~ 2e-15 per bucket, vanishing even at 10^12 rows,
    and the affected rows already share an LSH band/anchor."""
    h = np.full(m.shape[0], _FOLD_SEED, dtype=np.uint64)
    for c in range(m.shape[1]):
        h = (h * _FOLD_P) ^ m[:, c]
    return h


def _group_expand_edges(ids: np.ndarray, inv: np.ndarray,
                        adj_u: np.ndarray,
                        intra_pass: bool) -> list[tuple[str, str]]:
    """Expand a DISTINCT-signature adjacency back to member edges.

    ``inv`` maps each member (clip_id-sorted) to its distinct-signature
    group; ``adj_u`` is the verified adjacency between distinct groups.
    Emits the same transitive closure the full member-pair matrix would:
    a rep-rep spanning edge per adjacent group pair, plus an intra-group
    star whenever identical-signature pairs pass verification themselves
    (``intra_pass``, true for minhash/audio where identical => similar)
    OR the group sits in a multi-group component (closure membership —
    the containment case, where identical sizes never pair directly but
    members still belong to the closure through the other group).

    This is the memoized-verification generalization of the reference's
    all-identical fast path (deduplicate.py:292-310): a bucket holding
    one giant duplicate cluster costs O(members), not O(members^2)."""
    u = adj_u.shape[0]
    parent = np.arange(u)

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    first = np.full(u, -1, dtype=np.int64)   # min-clip_id member per group
    counts = np.zeros(u, dtype=np.int64)
    for pos, g in enumerate(inv.tolist()):
        if first[g] < 0:
            first[g] = pos
        counts[g] += 1

    pairs: list[tuple[str, str]] = []
    gi, gj = np.nonzero(np.triu(adj_u, 1))
    for a, b in zip(gi.tolist(), gj.tolist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
            x, y = ids[first[a]], ids[first[b]]
            pairs.append((x, y) if x < y else (y, x))
    # component sizes in groups (for the containment closure rule)
    multi = np.zeros(u, dtype=bool)
    if not intra_pass:
        roots = np.array([find(g) for g in range(u)])
        root_n = np.bincount(roots, minlength=u)
        multi = root_n[roots] > 1
    for g in range(u):
        if counts[g] >= 2 and (intra_pass or multi[g]):
            rep = ids[first[g]]
            for pos in np.flatnonzero(inv == g).tolist():
                if pos != first[g]:
                    m = ids[pos]
                    pairs.append((rep, m) if rep < m else (m, rep))
    return pairs


# ---------------- minhash channel ----------------

def explode_minhash_bands(batch: pa.Table, cfg: DedupConfig) -> pa.Table:
    """Stateless map_batches: one output row per (band bucket, clip) —
    band keys were precomputed by the signature stage."""
    batch = batch.filter(pc.greater(batch["set_size"], 0))
    n = batch.num_rows
    if n == 0:
        return pa.table({"bucket": pa.array([], pa.uint64()),
                         "clip_id": pa.array([], pa.string()),
                         "minhash_sig8": pa.array([], pa.binary()),
                         "ek64": pa.array([], pa.uint64())})
    keys = np.frombuffer(b"".join(batch["band_keys"].to_pylist()),
                         dtype=np.uint64).reshape(n, cfg.lsh_bands)
    idx = np.repeat(np.arange(n), cfg.lsh_bands)
    rep = batch.select(["clip_id", "minhash_sig8", "ek64"]).take(idx)
    return rep.append_column("bucket", pa.array(keys.reshape(-1)))


def _bucket_slices(df: pd.DataFrame, cap: int):
    """Iterate (index-array, dropped) per multi-member bucket — pure numpy
    sort + boundary slicing; per-bucket cost is O(size), never a pandas
    group object (hundreds of thousands of tiny buckets per partition).

    Skew control via SALTED SPLITTING (SURVEY.md §4.2): a bucket larger
    than ``cap`` is split into chunks of <= cap members that all SHARE the
    bucket's min-clip_id member as a pivot, so in-chunk verification plus
    the pivot's spanning edges transitively connect every true duplicate of
    the pivot across chunks (the all-identical mega-bucket — 10^6 copies of
    one clip — collapses to one cluster).  Pairwise cost drops from O(m^2)
    to O(m*cap); cross-chunk pairs NOT similar to the pivot rely on other
    buckets/bands (standard LSH salting trade).  Nothing is dropped:
    ``dropped`` stays 0 and exists only as the accounting seam."""
    buckets = df["bucket"].to_numpy()
    ids = df["clip_id"].to_numpy()
    order = np.lexsort((ids, buckets))  # bucket-major, clip_id within
    b_sorted = buckets[order]
    bounds = np.flatnonzero(np.concatenate(
        ([True], b_sorted[1:] != b_sorted[:-1], [True])))
    for s, e in zip(bounds[:-1], bounds[1:]):
        if e - s < 2:
            continue
        idx = order[s:e]
        if len(idx) <= cap:
            yield idx, 0
            continue
        # salted split: chunk 0 is the first cap members; later chunks are
        # pivot + (cap-1) fresh members each (all clip_id-sorted, so chunk
        # composition is deterministic at any parallelism)
        yield idx[:cap], 0
        pivot = idx[:1]
        for lo in range(cap, len(idx), max(1, cap - 1)):
            chunk = np.concatenate([pivot, idx[lo:lo + cap - 1]])
            if len(chunk) >= 2:
                yield chunk, 0


def _minhash_partition(df: pd.DataFrame, cfg: DedupConfig,
                       exact_enabled: bool = True) -> pd.DataFrame:
    n = len(df)
    sig_all = np.frombuffer(b"".join(df["minhash_sig8"]),
                            dtype=np.uint8).reshape(n, cfg.num_perm)
    ids_all = df["clip_id"].to_numpy()
    ek_all = df["ek64"].to_numpy().astype(np.uint64)
    h_all = _fold_u64_cols(sig_all.view(np.uint64).reshape(n, -1))
    out: list[pd.DataFrame] = []
    for idx, dropped in _bucket_slices(df, cfg.max_bucket):
        ek = ek_all[idx]
        if exact_enabled and ek[0] != 0 and (ek == ek[0]).all():
            continue  # exact channel already links these (fast path)
        # verify per DISTINCT signature, expand to members: duplication
        # density (many byte-identical signatures per bucket) then costs
        # O(members), never O(members^2).  Distinctness via the u64 row
        # fingerprint (precomputed once for the whole partition).
        _, first, inv = np.unique(h_all[idx], return_index=True,
                                  return_inverse=True)
        if len(first) == 1:
            pairs = [(ids_all[idx[0]], ids_all[j]) for j in idx[1:]]
        else:
            adj_u = _jaccard_matrix(sig_all[idx[first]]) >= cfg.jaccard_threshold
            pairs = _group_expand_edges(ids_all[idx], inv, adj_u,
                                        intra_pass=True)
        if pairs or dropped:
            out.append(_edges_df(pairs, "minhash", dropped))
    return pd.concat(out, ignore_index=True) if out else _EMPTY


# ---------------- audio channel ----------------

def explode_audio_bands(batch: pa.Table, cfg: DedupConfig) -> pa.Table:
    batch = batch.filter(batch["decode_ok"])
    n = batch.num_rows
    if n == 0:
        return pa.table({
            "bucket": pa.array([], pa.uint64()),
            "clip_id": pa.array([], pa.string()),
            "audio_fp": pa.array([], pa.uint64()),
            "feat16": pa.array([], pa.binary(2 * cfg.spectral_dims)),
            "dur_ms": pa.array([], pa.int32())})
    fp = np.asarray(batch["audio_fp"].to_numpy(zero_copy_only=False),
                    dtype=np.uint64)
    # ship features as float16 (cosine error ~1e-4, threshold 0.999):
    # halves the dominant payload of the audio shuffle.  FixedSizeList ->
    # zero-copy flat values -> one reshape+astype; no per-row Python.
    feat = (batch["audio_feat"].combine_chunks().flatten()
            .to_numpy(zero_copy_only=False)
            .reshape(n, cfg.spectral_dims).astype(np.float16))
    width = 2 * cfg.spectral_dims
    f16 = pa.FixedSizeBinaryArray.from_buffers(
        pa.binary(width), n, [None, pa.py_buffer(feat.tobytes())])
    base = (batch.select(["clip_id", "audio_fp", "dur_ms"])
            .append_column("feat16", f16))
    keys = simhash.band_keys_u64(fp, cfg.audio_bands, cfg.audio_bits)
    idx = np.repeat(np.arange(n), cfg.audio_bands)
    return base.take(idx).append_column("bucket", pa.array(keys.reshape(-1)))


def _audio_partition(df: pd.DataFrame, cfg: DedupConfig) -> pd.DataFrame:
    fp_all = df["audio_fp"].to_numpy().astype(np.uint64)
    dur_all = df["dur_ms"].to_numpy().astype(np.int64)
    ids_all = df["clip_id"].to_numpy()
    raw16 = np.frombuffer(b"".join(df["feat16"]), dtype=np.uint8) \
        .reshape(len(df), 2 * cfg.spectral_dims)
    feat_all = raw16.view(np.float16).astype(np.float32)
    norms = np.linalg.norm(feat_all, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    feat_all = feat_all / norms
    h_all = _fold_u64_cols(np.concatenate(
        [fp_all[:, None], dur_all.view(np.uint64)[:, None],
         np.ascontiguousarray(raw16).view(np.uint64)], axis=1))
    out: list[pd.DataFrame] = []
    for idx, dropped in _bucket_slices(df, cfg.max_bucket):
        # distinct (fp, dur, feature) rows verify; members expand after
        _, first, inv = np.unique(h_all[idx], return_index=True,
                                  return_inverse=True)
        rep = idx[first]
        m = len(rep)
        fp, dur = fp_all[rep], dur_all[rep]
        x = fp[:, None] ^ fp[None, :]
        hd = np.unpackbits(x.view(np.uint8).reshape(m, m, 8),
                           axis=2).sum(axis=2)
        dmax = np.maximum(dur[:, None], dur[None, :])
        dur_ok = np.abs(dur[:, None] - dur[None, :]) <= np.maximum(60,
                                                                   0.05 * dmax)
        adj = (hd <= cfg.audio_hamming_max) & dur_ok
        if adj.any():
            # verify with the true spectral features, not just the SRP
            # sketch: re-encodes measure cosine > 0.9999; accidental SRP
            # collisions between unrelated clips fall well below the floor
            # (this is what stops transitive snowballing of audio clusters)
            fn = feat_all[rep]
            adj &= (fn @ fn.T) >= cfg.audio_cosine_min
        np.fill_diagonal(adj, False)
        pairs = _group_expand_edges(ids_all[idx], inv, adj, intra_pass=True)
        if pairs or dropped:
            out.append(_edges_df(pairs, "audio", dropped))
    return pd.concat(out, ignore_index=True) if out else _EMPTY


# ---------------- containment channel ----------------

def explode_anchors(batch: pa.Table, cfg: DedupConfig) -> pa.Table:
    batch = batch.filter(pc.greater(batch["set_size"], 0))
    anchors = batch["anchors"].to_pylist()
    counts = [len(a) for a in anchors]
    idx = np.repeat(np.arange(batch.num_rows), counts)
    flat = (np.concatenate([np.asarray(a, dtype=np.uint64)
                            for a in anchors])
            if anchors and idx.size else np.empty(0, np.uint64))
    rep = batch.select(["clip_id", "minhash_sig8", "set_size"]).take(idx)
    return rep.append_column("bucket", pa.array(flat))


def _containment_partition(df: pd.DataFrame,
                           cfg: DedupConfig) -> pd.DataFrame:
    """Containment estimated from MinHash signatures (vectorized):
    j = est Jaccard; |A∩B| ≈ j(|A|+|B|)/(1+j); containment =
    |A∩B| / min(|A|,|B|).  For B ⊂ A covering fraction f of A this is ~1.0
    while plain Jaccard is only f."""
    n = len(df)
    sig_all = np.frombuffer(b"".join(df["minhash_sig8"]),
                            dtype=np.uint8).reshape(n, cfg.num_perm)
    ids_all = df["clip_id"].to_numpy()
    sizes_all = df["set_size"].to_numpy().astype(np.float64)
    h_all = _fold_u64_cols(np.concatenate(
        [sig_all.view(np.uint64).reshape(n, -1),
         sizes_all.view(np.uint64)[:, None]], axis=1))
    out: list[pd.DataFrame] = []
    for idx, dropped in _bucket_slices(df, cfg.max_bucket):
        # distinct (signature, set_size) rows verify; members expand after
        # (identical rows never pair HERE — same-size rows belong to the
        # minhash/exact channels — but closure membership still links them
        # through the group they ride with: intra_pass=False)
        _, first, inv = np.unique(h_all[idx], return_index=True,
                                  return_inverse=True)
        rep = idx[first]
        sizes = sizes_all[rep].astype(np.float64)
        ratio = np.minimum(sizes[:, None], sizes[None, :]) / np.maximum(
            sizes[:, None], sizes[None, :])
        if not (ratio <= 0.95).any():
            if dropped:
                out.append(_edges_df([], "containment", dropped))
            continue
        jac = _jaccard_matrix(sig_all[rep])
        inter = jac * (sizes[:, None] + sizes[None, :]) / (1.0 + jac)
        cont = inter / np.minimum(sizes[:, None], sizes[None, :])
        adj = (cont >= cfg.containment_threshold) & (ratio <= 0.95)
        pairs = _group_expand_edges(ids_all[idx], inv, adj,
                                    intra_pass=False)
        if pairs or dropped:
            out.append(_edges_df(pairs, "containment", dropped))
    return pd.concat(out, ignore_index=True) if out else _EMPTY


# ---------------- channel drivers ----------------

def _bucketed_verify(exploded: "ray.data.Dataset", part_fn,
                     nbuckets: int) -> "ray.data.Dataset":
    """Shuffle on bucket%nbuckets (int), verify all buckets per partition."""
    def add_small(t: pa.Table) -> pa.Table:
        b = t["bucket"].to_numpy(zero_copy_only=False).astype(np.uint64)
        small = (b % np.uint64(nbuckets)).astype(np.int32)
        return t.append_column(bucketing.BUCKET_COL, pa.array(small))

    bucketed = exploded.map_batches(add_small, batch_format="pyarrow")
    return bucketed.groupby(bucketing.BUCKET_COL).map_groups(
        lambda df: part_fn(df.drop(columns=[bucketing.BUCKET_COL])),
        batch_format="pandas")


def candidate_edges(sigs: "ray.data.Dataset", cfg: DedupConfig,
                    channels: tuple[str, ...] = ("exact", "minhash", "audio",
                                                 "containment"),
                    nbuckets: int = 64) -> "ray.data.Dataset":
    """All verified candidate edges (union of channels), overflow rows
    included (``src == ''``).  ``sigs`` must already exclude rejected rows.
    """
    parts = []
    if "exact" in channels:
        keyed = sigs.map_batches(
            lambda t: t.filter(pc.is_valid(t["exact_key"]))
                       .select(["clip_id", "exact_key"]),
            batch_format="pyarrow")
        parts.append(bucketing.grouped(keyed, "exact_key", _exact_partition,
                                       nbuckets))
    if "minhash" in channels:
        exact_on = "exact" in channels
        exploded = sigs.map_batches(
            lambda t: explode_minhash_bands(t, cfg),
            batch_format="pyarrow", batch_size=2048)
        parts.append(_bucketed_verify(
            exploded, lambda df: _minhash_partition(df, cfg, exact_on),
            nbuckets))
    if "audio" in channels:
        exploded = sigs.map_batches(
            lambda t: explode_audio_bands(t, cfg),
            batch_format="pyarrow", batch_size=4096)
        parts.append(_bucketed_verify(
            exploded, lambda df: _audio_partition(df, cfg), nbuckets))
    if "containment" in channels:
        exploded = sigs.map_batches(
            lambda t: explode_anchors(t, cfg),
            batch_format="pyarrow", batch_size=4096)
        parts.append(_bucketed_verify(
            exploded, lambda df: _containment_partition(df, cfg), nbuckets))
    edges = parts[0]
    for p in parts[1:]:
        edges = edges.union(p)
    return edges


def dedup_edges(raw_edges: "ray.data.Dataset",
                nbuckets: int = 64) -> "ray.data.Dataset":
    """Dedup pairs (a pair can surface from up to ``lsh_bands`` buckets and
    several channels) — bucketed drop_duplicates, vectorized.  Overflow
    accounting rows (src=='') pass through untouched so one materialize
    serves both the edge list and the dropped-rows metric (split with
    :func:`split_edges`)."""
    def part(df: pd.DataFrame) -> pd.DataFrame:
        real = df[df["src"] != ""].drop_duplicates(subset=["src", "dst"])
        return pd.concat([real, df[df["src"] == ""]], ignore_index=True)

    return bucketing.grouped(
        raw_edges.map_batches(
            lambda t: t.select(["src", "dst", "channel", "dropped"]),
            batch_format="pyarrow"),
        "src", part, nbuckets)


def split_edges(deduped: "ray.data.Dataset",
                ) -> tuple["ray.data.Dataset", int]:
    """(real edges, total overflow-dropped rows) from dedup_edges output."""
    real = deduped.map_batches(
        lambda t: t.filter(pc.not_equal(t["src"], ""))
                   .select(["src", "dst", "channel"]),
        batch_format="pyarrow")
    return real, overflow_dropped(deduped)


def overflow_dropped(raw_edges: "ray.data.Dataset") -> int:
    """Total rows dropped by bucket caps — reported, never silent."""
    only = raw_edges.map_batches(
        lambda t: t.filter(pc.equal(t["src"], "")),
        batch_format="pyarrow")
    return int(only.sum("dropped") or 0)
