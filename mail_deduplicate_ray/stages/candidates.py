"""Candidate generation + in-bucket verification -> verified edge table.

Five channels, all riding ONE explode pass and ONE all-to-all shuffle
(SURVEY.md §4.3 shuffle #1; ref analogue: the hash-index grouping
deduplicate.py:1009 generalized from exact keys to LSH buckets):

  exact        same composite sha ≡ duplicate by definition
               (ref: deduplicate.py:710-717) -> star edges, fully
               vectorized (groupby-transform-min), no pairwise work
               (the all-identical fast path, ref: deduplicate.py:292-310).
  minhash      per-band bucket keys from the MinHash signature; in-bucket
               est-Jaccard >= threshold.
  audio        16-bit bands of the 64-bit SRP audio fingerprint; in-bucket
               Hamming <= audio_hamming_max AND duration within tolerance.
  containment  bottom-m anchor shingles; in-bucket bottom-k containment
               estimate >= containment_threshold (approximate
               near-containment; complements the exact channel below).
  substring    winnowing-minimizer buckets over transcript_norm; a
               contained transcript's minimizer set is provably a SUBSET of
               its container's (functions/shingles.minimizers), so each
               text candidates as containee in its q smallest-minimizer
               buckets (cfg.substring_probes; q=2 survives one hot-bucket
               cap) against each bucket's longer distinct texts.  Exact
               verification is a separate bucketed-text-join stage
               (``verify_substring_edges``) running suffix-array search —
               the north star's third detector (BASELINE.json:
               "suffix-array exact-substring matching for contained
               transcripts").

Shuffle shape: ``explode_all`` makes ONE pass over each usable-signature
batch and emits every enabled channel's bucket rows in a unified narrow
schema ``(clip_id, channel:uint8, bucket:uint64, payload:binary)``; the
shuffle key is ``bucket % nbuckets`` (small int) and ONE partition call
verifies every bucket of every channel hashed into it (per-channel
dispatch inside the partition).  Fusing the channels collapses four
groupby barriers plus four reads of the signature table into one of each
— measured 1.5x wall-clock on the whole candidate stage at 380k clips.

In-bucket verification computes the pairwise similarity MATRIX over the
DISTINCT verification keys in the bucket (distinctness via precomputed
u64 row fingerprints — duplication density costs O(members), never
O(members^2)), expands group adjacency back to member edges, and reduces
to a SPANNING edge set, so edge count is O(members) — connected
components downstream rebuilds full clusters.  Bucket iteration is numpy
sort + boundary slicing (``_bucket_slices``) — never per-bucket pandas
objects (partitions hold hundreds of thousands of tiny buckets).
Oversized buckets are split by salted chunking (nothing dropped); the
``dropped`` accounting column is the never-silent seam.
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

ALL_CHANNELS = ("exact", "minhash", "audio", "containment", "substring",
                "stretch")

# substring-verify regime switch (see verify_substring_edges): broadcast
# the participating texts when pairs and pruned text bytes are small;
# fall back to bucketed hash-joins above either cap
# pair-count gate for the zero-shuffle broadcast verify path.  The REAL
# memory guard is _TEXT_BYTES_CAP (the id->text map is built with a
# byte budget and bails to the bucketed joins when pruned texts exceed
# it); this limit only bounds the driver-side distinct-id scan over the
# pair list (~2 string refs/pair).  4M was far too conservative — at the
# 783k-clip scale point 13.3M substring candidates fell off the fast
# path and the join fallback cost 83.6 s vs ~4 s broadcast (the whole
# superlinear term of the candidates stage); 32M keeps the driver scan
# a few GB transient while the byte cap still protects worker heaps.
_PAIR_BROADCAST_LIMIT = 32_000_000
_TEXT_BYTES_CAP = 1 << 30

# channel codes in the fused explode (uint8 column)
_CH = {"exact": 0, "minhash": 1, "audio": 2, "containment": 3,
       "substring": 4, "stretch": 5}

# stretch payload: envelope frames capped here (32 frames = the full
# 8192-sample prefix at 8 kHz / 32 ms frames; higher rates yield fewer)
_STRETCH_ENV_CAP = 32


def _stretch_payload_width(cfg: DedupConfig) -> int:
    # n_peaks u8 | n_env u8 | dur i32 | logf P*f32 | amp P*f16 | env 32*f16
    return 2 + 4 + 6 * cfg.stretch_peaks + 2 * _STRETCH_ENV_CAP


def _edges_df(pairs: list[tuple[str, str]], channel: str,
              dropped: int) -> pd.DataFrame:
    rows = [(min(a, b), max(a, b), channel, 0) for a, b in pairs]
    if dropped:
        rows.append(("", "", channel, dropped))
    if not rows:
        return _EMPTY
    return pd.DataFrame(rows, columns=["src", "dst", "channel", "dropped"])


# ---------------- shared verification helpers ----------------

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


def _bucket_slices(buckets: np.ndarray, ids: np.ndarray, cap: int,
                   order_key: "np.ndarray | tuple | None" = None):
    """Iterate (index-array, dropped) per multi-member bucket — pure numpy
    sort + boundary slicing; per-bucket cost is O(size), never a pandas
    group object (hundreds of thousands of tiny buckets per partition).

    Skew control via SALTED SPLITTING (SURVEY.md §4.2): a bucket larger
    than ``cap`` is split into chunks of <= cap members that all SHARE the
    bucket's first member as a pivot, so in-chunk verification plus
    the pivot's spanning edges transitively connect every true duplicate of
    the pivot across chunks (the all-identical mega-bucket — 10^6 copies of
    one clip — collapses to one cluster).  Pairwise cost drops from O(m^2)
    to O(m*cap); cross-chunk pairs NOT similar to the pivot rely on other
    buckets/bands (standard LSH salting trade).  Nothing is dropped:
    ``dropped`` stays 0 and exists only as the accounting seam.

    ``order_key`` (one array, or a priority-ordered tuple of arrays)
    makes the within-bucket order CONTENT-DERIVED (the SortingLSH idea —
    sorted-bucket chunking): members are sorted by the key (ties by
    clip_id), so a verify core whose true pairs are near-equal in the
    key (the stretch channel's stretch-invariant spectral-shape scalar)
    gets them ADJACENT, and chunk composition no longer depends on
    clip_id assignment at all — a corpus relabeling permutation yields
    the same chunks up to renaming.  Without it the order is clip_id,
    which keeps planted-adjacent synthetic corpora flattering but ties
    real-corpus recall to id locality."""
    if order_key is None:
        keys = (ids, buckets)
    elif isinstance(order_key, tuple):
        keys = (ids,) + tuple(reversed(order_key)) + (buckets,)
    else:
        keys = (ids, order_key, buckets)
    order = np.lexsort(keys)  # bucket-major, key (or clip_id) within
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
        # salted split: chunk 0 is the first chunk; later chunks are
        # pivot + (cap-1) fresh members each (deterministic at any
        # parallelism: the order key is clip_id or content-derived).
        # With a content order key, chunk BOUNDARIES are additionally
        # offset per bucket by hash(bucket) % cap: identical boundaries
        # would make a boundary split CORRELATED across all of a pair's
        # shared double-cover buckets; the offset de-correlates it.
        # Measured ~neutral at 391k (0.935 -> 0.936 stretch recall —
        # the recall lever is the cap, i.e. the rank window; the offset
        # is kept because it removes the correlated-split failure mode
        # at zero cost).
        r = int(buckets[idx[0]] % np.uint64(cap)) if order_key is not None \
            else 0
        first = cap if r in (0, 1) else r
        yield idx[:first], 0
        pivot = idx[:1]
        for lo in range(first, len(idx), max(1, cap - 1)):
            chunk = np.concatenate([pivot, idx[lo:lo + cap - 1]])
            if len(chunk) >= 2:
                yield chunk, 0


# ---------------- fused explode (one pass, one shuffle) ----------------

def explode_all(batch: pa.Table, cfg: DedupConfig,
                channels: tuple[str, ...] = ALL_CHANNELS) -> pa.Table:
    """ONE pass over a usable-signature batch emitting every enabled
    channel's bucket rows in the unified narrow schema::

        clip_id: string  channel: uint8  bucket: uint64  payload: binary

    Payload layout per channel (fixed width within a channel; the verify
    cores parse it back with ``np.frombuffer``):

        exact        exact_key utf8 (112 B)
        minhash      minhash_sig8 (num_perm B) || ek64 (8 B LE)
        audio        audio_fp (8 B) || dur_ms (4 B) || feat16 (2*dims B)
        containment  minhash_sig8 (num_perm B) || set_size (8 B LE)
        substring    n_bytes of utf-8 transcript_norm (8 B LE) || tfp
                     minimizer-set fingerprint (8 B LE) || role (1 B:
                     1 = global-min row) || bot8: the text's 8 SMALLEST
                     minimizers (8x8 B LE, UINT64_MAX-padded) — the
                     exact subset-prune sketch (see _substring_core)
    """
    n = batch.num_rows
    out_idx: list[np.ndarray] = []    # row index into batch
    out_ch: list[np.ndarray] = []
    out_bkt: list[np.ndarray] = []
    out_pay: list[bytes] = []
    out_wid: list[np.ndarray] = []

    sig = None
    if n and ("minhash" in channels or "containment" in channels):
        sig = np.frombuffer(b"".join(batch["minhash_sig8"].to_pylist()),
                            dtype=np.uint8).reshape(n, cfg.num_perm)
        set_size = np.asarray(batch["set_size"].to_numpy(
            zero_copy_only=False), dtype=np.int64)

    if "exact" in channels and n:
        valid = pc.is_valid(batch["exact_key"]).to_numpy(zero_copy_only=False)
        ridx = np.flatnonzero(valid)
        if ridx.size:
            keys = pc.drop_null(batch["exact_key"]).to_pylist()
            flat = "".join(keys).encode("utf-8")
            widths = np.fromiter((len(k) for k in keys), np.int32,
                                 count=len(keys))
            ek = np.asarray(batch["ek64"].to_numpy(zero_copy_only=False),
                            dtype=np.uint64)[ridx]
            out_idx.append(ridx)
            out_ch.append(np.full(ridx.size, _CH["exact"], np.uint8))
            out_bkt.append(ek)  # ek64 is uniform (sha-derived); grouping
            out_pay.append(flat)  # correctness is by FULL key in the core
            out_wid.append(widths)

    if "minhash" in channels and n:
        m = np.flatnonzero(set_size > 0)
        if m.size:
            band = np.frombuffer(b"".join(batch["band_keys"].to_pylist()),
                                 dtype=np.uint64).reshape(n, cfg.lsh_bands)[m]
            ek = np.asarray(batch["ek64"].to_numpy(zero_copy_only=False),
                            dtype=np.uint64)[m]
            pay = np.concatenate([sig[m], ek[:, None].view(np.uint8)], axis=1)
            nb = cfg.lsh_bands
            out_idx.append(np.repeat(m, nb))
            out_ch.append(np.full(m.size * nb, _CH["minhash"], np.uint8))
            out_bkt.append(band.reshape(-1))
            out_pay.append(np.repeat(pay, nb, axis=0).tobytes())
            out_wid.append(np.full(m.size * nb, pay.shape[1], np.int32))

    if "audio" in channels and n:
        dok = np.asarray(batch["decode_ok"].to_numpy(zero_copy_only=False),
                         dtype=bool)
        a = np.flatnonzero(dok)
        if a.size:
            fp = np.asarray(batch["audio_fp"].to_numpy(zero_copy_only=False),
                            dtype=np.uint64)[a]
            dur = np.asarray(batch["dur_ms"].to_numpy(zero_copy_only=False),
                             dtype=np.int32)[a]
            # ship features as float16 (cosine error ~1e-4, threshold
            # 0.999): halves the dominant payload of the audio rows.
            # FixedSizeList -> zero-copy flat values -> one reshape+astype.
            feat = (batch["audio_feat"].combine_chunks().flatten()
                    .to_numpy(zero_copy_only=False)
                    .reshape(n, cfg.spectral_dims)[a].astype(np.float16))
            pay = np.concatenate([fp[:, None].view(np.uint8),
                                  dur[:, None].view(np.uint8),
                                  feat.view(np.uint8)], axis=1)
            keys = simhash.band_keys_u64(fp, cfg.audio_bands, cfg.audio_bits)
            ab = cfg.audio_bands
            out_idx.append(np.repeat(a, ab))
            out_ch.append(np.full(a.size * ab, _CH["audio"], np.uint8))
            out_bkt.append(keys.reshape(-1))
            out_pay.append(np.repeat(pay, ab, axis=0).tobytes())
            out_wid.append(np.full(a.size * ab, pay.shape[1], np.int32))

    if "containment" in channels and n:
        anchors = batch["anchors"].to_pylist()
        counts = np.fromiter((len(a) if s > 0 else 0
                              for a, s in zip(anchors, set_size)),
                             np.int64, count=n)
        ridx = np.repeat(np.arange(n), counts)
        if ridx.size:
            flat_b = np.concatenate(
                [np.asarray(a, dtype=np.uint64)
                 for a, c in zip(anchors, counts) if c])
            pay = np.concatenate(
                [sig, set_size[:, None].view(np.uint8)], axis=1)[ridx]
            out_idx.append(ridx)
            out_ch.append(np.full(ridx.size, _CH["containment"], np.uint8))
            out_bkt.append(flat_b)
            out_pay.append(pay.tobytes())
            out_wid.append(np.full(ridx.size, pay.shape[1], np.int32))

    if "substring" in channels and n:
        from mail_deduplicate_ray.functions.shingles import minimizers
        w = cfg.substring_min_len - cfg.substring_k + 1
        # zero-copy UTF-8 byte views straight from the Arrow string
        # buffers (no to_pylist decode + re-encode of every transcript);
        # all lengths in this channel are BYTE lengths — the minimizer
        # window math operates on bytes, so byte-based eligibility is the
        # exact guarantee (a contained text of >= min_len BYTES provably
        # shares its global-min k-gram with its container)
        col = batch["transcript_norm"].combine_chunks()
        off0 = col.offset
        odt = np.int64 if pa.types.is_large_string(col.type) else np.int32
        offs = np.frombuffer(col.buffers()[1], odt, count=n + 1,
                             offset=np.dtype(odt).itemsize * off0
                             ).astype(np.int64)
        data = np.frombuffer(col.buffers()[2], np.uint8)
        n_bytes = offs[1:] - offs[:-1]
        if col.null_count:
            n_bytes = np.where(
                np.asarray(col.is_null()).astype(bool), 0, n_bytes)
        el = np.flatnonzero(n_bytes >= cfg.substring_min_len)
        if el.size:
            mins = [minimizers(data[offs[i]:offs[i + 1]],
                               cfg.substring_k, w)
                    for i in el.tolist()]
            counts = np.fromiter((len(m) for m in mins), np.int64,
                                 count=el.size)
            ridx = np.repeat(el, counts)
            if ridx.size:
                flat = np.concatenate(mins)
                # text fingerprint (order-insensitive XOR fold of the
                # minimizer SET + length): groups byte-identical texts so
                # the verify core pairs DISTINCT texts, not members
                tfp = np.repeat(np.array(
                    [np.bitwise_xor.reduce(m) ^
                     (np.uint64(len(m)) * _FOLD_P) for m in mins],
                    np.uint64) ^ n_bytes[el].view(np.uint64), counts)
                # role=1 on the text's q SMALLEST minimizer rows: if P is
                # contained in T then minimizers(P) <= minimizers(T), so
                # every probe of P is in T's set — each candidate pair is
                # emitted from <= q buckets (deduped downstream); extra
                # probes make a pair survive a hot-bucket cap drop.
                # minimizers() output is sorted, so the probes are simply
                # the first q rows of each text's segment.
                starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
                pos_in_seg = np.arange(ridx.size) - np.repeat(starts, counts)
                role = (pos_in_seg < cfg.substring_probes).astype(np.uint8)
                # bottom-8 minimizer sketch (minimizers() is sorted):
                # containment implies minimizer-set SUBSET, so the verify
                # core can prune candidates exactly (no recall loss).
                # 8 probes, not 4: on bounded-entropy corpora texts
                # share their smallest shingles, and the chance of a
                # non-container passing falls ~geometrically per probe
                # (measured at the 783k scale point: bottom-4 left 13.3M
                # candidates, 96% false; the wider sketch is the source
                # fix, +32 B/row on only the substring channel rows)
                bot8 = np.full((el.size, 8), np.uint64(0xFFFFFFFFFFFFFFFF),
                               np.uint64)
                for r, m in enumerate(mins):
                    bot8[r, :min(8, len(m))] = m[:8]
                pay = np.concatenate(
                    [n_bytes[ridx][:, None].view(np.uint8),
                     tfp[:, None].view(np.uint8),
                     role[:, None],
                     np.repeat(bot8, counts, axis=0).view(np.uint8)],
                    axis=1)
                out_idx.append(ridx)
                out_ch.append(np.full(ridx.size, _CH["substring"], np.uint8))
                out_bkt.append(flat)
                out_pay.append(np.ascontiguousarray(pay).tobytes())
                out_wid.append(np.full(ridx.size, 81, np.int32))

    if "stretch" in channels and n:
        from mail_deduplicate_ray.functions import stretchmatch
        P = cfg.stretch_peaks
        npk = np.asarray(batch["n_peaks"].to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        dok = np.asarray(batch["decode_ok"].to_numpy(zero_copy_only=False),
                         dtype=bool)
        el = np.flatnonzero(dok & (npk >= 2))
        if el.size:
            logf = (batch["peak_logf"].combine_chunks().flatten()
                    .to_numpy(zero_copy_only=False)
                    .reshape(n, P)[el].astype(np.float64))
            amp = (batch["peak_amp"].combine_chunks().flatten()
                   .to_numpy(zero_copy_only=False)
                   .reshape(n, P)[el].astype(np.float64))
            dur = np.asarray(batch["dur_ms"].to_numpy(zero_copy_only=False),
                             dtype=np.int32)[el]
            envs = batch["envelope"].to_pylist()
            key_list = [stretchmatch.bucket_keys(
                logf[r, :npk[i]], amp[r, :npk[i]], cfg.stretch_qstep)
                for r, i in enumerate(el.tolist())]
            counts = np.fromiter((len(k) for k in key_list), np.int64,
                                 count=el.size)
            ridx = np.repeat(el, counts)
            if ridx.size:
                width = _stretch_payload_width(cfg)
                pay = np.zeros((el.size, width), np.uint8)
                pay[:, 0] = npk[el].astype(np.uint8)
                pay[:, 2:6] = dur[:, None].view(np.uint8)
                off = 6
                pay[:, off:off + 4 * P] = \
                    logf.astype(np.float32).view(np.uint8)
                off += 4 * P
                pay[:, off:off + 2 * P] = \
                    amp.astype(np.float16).view(np.uint8)
                off += 2 * P
                for r, i in enumerate(el.tolist()):
                    e = np.asarray(envs[i] or [],
                                   np.float32)[:_STRETCH_ENV_CAP]
                    pay[r, 1] = len(e)
                    pay[r, off:off + 2 * len(e)] = \
                        e.astype(np.float16).view(np.uint8)
                out_idx.append(ridx)
                out_ch.append(np.full(ridx.size, _CH["stretch"], np.uint8))
                out_bkt.append(np.concatenate(key_list))
                out_pay.append(np.repeat(pay, counts, axis=0).tobytes())
                out_wid.append(np.full(ridx.size, width, np.int32))

    if not out_idx:
        return pa.table({"clip_id": pa.array([], pa.string()),
                         "channel": pa.array([], pa.uint8()),
                         "bucket": pa.array([], pa.uint64()),
                         "payload": pa.array([], pa.binary())})
    idxc = np.concatenate(out_idx)
    widths = np.concatenate(out_wid)
    total = len(idxc)
    offsets = np.zeros(total + 1, np.int32)
    np.cumsum(widths, out=offsets[1:])
    payload = pa.Array.from_buffers(
        pa.binary(), total,
        [None, pa.py_buffer(offsets.tobytes()),
         pa.py_buffer(b"".join(out_pay))])
    return pa.table({
        "clip_id": batch["clip_id"].take(pa.array(idxc)),
        "channel": pa.array(np.concatenate(out_ch)),
        "bucket": pa.array(np.concatenate(out_bkt)),
        "payload": payload})


# ---------------- per-channel verify cores ----------------

def _exact_core(ids: np.ndarray, keys: np.ndarray) -> pd.DataFrame:
    """Star edges per group of byte-identical composite keys — grouping is
    by the FULL key (pandas hash of the bytes), so the 64-bit ek bucket fold
    can never merge distinct shas (ref exactness: deduplicate.py:710-717)."""
    s = pd.Series(ids)
    mins = s.groupby(keys, sort=False).transform("min")
    dup = (s != mins).to_numpy()
    if not dup.any():
        return _EMPTY
    return pd.DataFrame({"src": mins.to_numpy()[dup], "dst": ids[dup],
                         "channel": "exact", "dropped": 0})


def _minhash_core(ids_all: np.ndarray, buckets: np.ndarray,
                  sig_all: np.ndarray, ek_all: np.ndarray,
                  cfg: DedupConfig, exact_enabled: bool) -> pd.DataFrame:
    n = len(ids_all)
    h_all = _fold_u64_cols(np.ascontiguousarray(sig_all)
                           .view(np.uint64).reshape(n, -1))
    out: list[pd.DataFrame] = []
    for idx, dropped in _bucket_slices(buckets, ids_all, cfg.max_bucket):
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
            adj_u = (_jaccard_matrix(sig_all[idx[first]])
                     >= cfg.jaccard_threshold)
            pairs = _group_expand_edges(ids_all[idx], inv, adj_u,
                                        intra_pass=True)
        if pairs or dropped:
            out.append(_edges_df(pairs, "minhash", dropped))
    return pd.concat(out, ignore_index=True) if out else _EMPTY


def _audio_core(ids_all: np.ndarray, buckets: np.ndarray, fp_all: np.ndarray,
                dur_all: np.ndarray, raw16: np.ndarray,
                cfg: DedupConfig) -> pd.DataFrame:
    feat_all = np.ascontiguousarray(raw16).view(np.float16).astype(np.float32)
    norms = np.linalg.norm(feat_all, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    feat_all = feat_all / norms
    h_all = _fold_u64_cols(np.concatenate(
        [fp_all[:, None], dur_all.view(np.uint64)[:, None],
         np.ascontiguousarray(raw16).view(np.uint64)], axis=1))
    out: list[pd.DataFrame] = []
    for idx, dropped in _bucket_slices(buckets, ids_all, cfg.max_bucket):
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


def _stretch_core(ids_all: np.ndarray, buckets: np.ndarray,
                  mat: np.ndarray, cfg: DedupConfig) -> pd.DataFrame:
    """Stretch-channel verify (functions/stretchmatch.py): global-shift
    peak consensus + a banded-DTW envelope confirm.  Bucket keys are
    already stretch-invariant, so this core only separates whole-peak-set
    alignments (true stretched/padded copies) from chance key collisions.

    Execution shape (profiled at sf0.1 and at the 391k-clip scale bench —
    the per-bucket (m, m, P, P) score_matrix was 86% of the stage, the
    SAME pair was re-scored in every shared double-cover bucket, and the
    quantized-ratio keys saturate at ~13k distinct values on a tonal
    corpus so raw per-chunk all-pairs volume grows ~quadratically):

    1. per bucket chunk (cfg.stretch_max_bucket salted cap): payload-
       fingerprint unique -> MASS-WINDOWED pair list — members sorted by
       total amp mass, each paired only within the window where
       min(mass) >= score_min * max(mass) (the EXACT feasibility bound of
       the verify score under the 1-1 match the peak min-separation
       guarantees: a pair outside it can never reach the score floor) —
       then the symmetric duration-ratio gate (<= 3.0).  Both gates run
       on cheap scalars BEFORE any spectral work and cut the generated
       pair volume ~4x at the 391k-clip scale point;
    2. globally: pairs deduped across buckets on (min, max) payload
       fingerprints — each distinct pair is scored and DTW-confirmed
       exactly ONCE (stretchmatch.score_pairs: only (pair, anchor)
       combos with a feasible shift are gathered; audio_dsp.
       dtw_cost_batch: one tensor DP, not K interpreted loops);
    3. scatter the per-unique-pair verdict back to every bucket and
       expand member edges (identical payloads link via ``inv``,
       intra_pass=True — the memoized-verification idiom).

    The accept test replays score_matrix's symmetrized per-cell rule:
    pass iff EITHER direction has (score >= min AND matched >= 2).
    The 64-bit payload fold can merge two distinct tables with
    probability ~2^-64 per pair (same trade as _fold_u64_cols)."""
    from mail_deduplicate_ray.functions import audio_dsp, stretchmatch
    P = cfg.stretch_peaks
    dur_all = np.ascontiguousarray(mat[:, 2:6]).view(np.int32).ravel() \
        .astype(np.float64)
    logf_all = np.ascontiguousarray(mat[:, 6:6 + 4 * P]) \
        .view(np.float32).reshape(-1, P).astype(np.float64)
    amp_all = np.ascontiguousarray(mat[:, 6 + 4 * P:6 + 6 * P]) \
        .view(np.float16).reshape(-1, P).astype(np.float64)
    nenv_all = mat[:, 1].astype(np.int64)
    env_all = np.ascontiguousarray(mat[:, 6 + 6 * P:]) \
        .view(np.float16).reshape(-1, _STRETCH_ENV_CAP)
    w8 = (mat.shape[1] + 7) // 8 * 8
    padded = np.zeros((mat.shape[0], w8), np.uint8)
    padded[:, :mat.shape[1]] = mat
    h_all = _fold_u64_cols(np.ascontiguousarray(padded).view(np.uint64))
    mass_all = amp_all.sum(axis=1)
    # STRETCH-INVARIANT chunk-order key: a time-stretch by f shifts every
    # peak's log-frequency by -log f UNIFORMLY, so the amp-weighted spread
    # of centered log-frequencies is identical for a clip and its
    # stretched copy (and amp-scale cancels).  Sorting oversize buckets by
    # (spread, mass) co-locates true pairs regardless of where the
    # saturated quantized-ratio bucket put them — mass alone measured
    # 0.902 stretch-kind recall at 391k (true pairs straddled the narrow
    # mass-slice chunks); spread restores the content locality the old
    # clip_id order only got from the synthetic corpus's adjacent ids.
    npk_all = (amp_all > 0).sum(axis=1)
    wsum = np.maximum(mass_all, 1e-12)
    cen = (amp_all * logf_all).sum(axis=1) / wsum
    spread_all = np.sqrt(
        (amp_all * (logf_all - cen[:, None]) ** 2).sum(axis=1) / wsum)
    smin = min(cfg.stretch_score_min, cfg.stretch_score_min_rich)
    pend: list[tuple] = []          # (idx, dropped, inv, m, iu, ju)
    gi: list[np.ndarray] = []       # payload row per pair, both sides
    gj: list[np.ndarray] = []
    empty = np.empty(0, np.int64)
    for idx, dropped in _bucket_slices(buckets, ids_all,
                                       cfg.stretch_max_bucket,
                                       order_key=(spread_all, mass_all)):
        _, first, inv = np.unique(h_all[idx], return_index=True,
                                  return_inverse=True)
        rep = idx[first]
        m = len(rep)
        if m > 1:
            # mass-windowed pair gen: ascending mass sort, pair i only
            # with the j-window whose mass can still satisfy the exact
            # min >= smin * max bound (window padded one ulp wide, then
            # the exact predicate re-applied so float rounding at the
            # boundary cannot change semantics vs the all-pairs form).
            # CHUNK-LEVEL short-circuit: the wide (rich) band can only
            # admit pairs when the chunk has >= 2 rich members — with
            # fewer, generate at the strict floor directly instead of
            # enumerating the wide band and filtering it back (sparse
            # corpora take this path for essentially every chunk)
            c_smin = smin if (npk_all[rep]
                              >= cfg.stretch_rich_min_peaks).sum() >= 2 \
                else cfg.stretch_score_min
            s = mass_all[rep]
            perm = np.argsort(s, kind="stable")
            ss = s[perm]
            hi = np.searchsorted(ss, (ss / c_smin) * (1.0 + 1e-12),
                                 side="right")
            cnt = np.maximum(hi - np.arange(m) - 1, 0)
            ia = np.repeat(np.arange(m), cnt)
            off = np.concatenate(([0], np.cumsum(cnt)[:-1]))
            jb = np.arange(cnt.sum()) - np.repeat(off, cnt) + ia + 1
            keep = ss[ia] >= c_smin * ss[jb]
            ia, jb = ia[keep], jb[keep]
            iu, ju = perm[ia], perm[jb]
            # the window above is the WIDE (rich) band; pairs in
            # [smin_rich, smin_strict) qualify only when BOTH sides are
            # rich-spectrum (config.stretch_rich_min_peaks) — on sparse
            # corpora this collapses the band back to the strict window
            # before any spectral work
            if cfg.stretch_score_min > c_smin:
                sr_ = s[iu] / np.maximum(s[ju], 1e-12)
                strict = np.minimum(sr_, 1.0 / np.maximum(sr_, 1e-12)) \
                    >= cfg.stretch_score_min
                rich_pair = ((npk_all[rep[iu]] >= cfg.stretch_rich_min_peaks)
                             & (npk_all[rep[ju]]
                                >= cfg.stretch_rich_min_peaks))
                keep2 = strict | rich_pair
                iu, ju = iu[keep2], ju[keep2]
            dur = dur_all[rep]
            keep = (np.maximum(dur[iu], dur[ju])
                    <= 3.0 * np.maximum(np.minimum(dur[iu], dur[ju]), 1.0))
            iu, ju = iu[keep], ju[keep]
            # spectral-shape gate: true stretched copies have near-equal
            # spread (the stretch-invariant chunk-order key; |Δ| p99 =
            # 0.057 on planted pairs at 391k); cheap scalar compare
            # BEFORE any spectral work.  Measured NEUTRAL on the
            # saturated synthetic corpus (bit-identical recall, ~same
            # wall at 783k: spread-sorted chunks are already narrow
            # spread slices there) — it protects the OTHER regime,
            # sparse over-cap buckets whose chunks span a wide spread
            # range, where it prunes cross-shape chance pairs.
            sp = spread_all[rep]
            keep = (np.abs(sp[iu] - sp[ju])
                    <= cfg.stretch_spread_gate)
            iu, ju = iu[keep], ju[keep]
            gi.append(rep[iu])
            gj.append(rep[ju])
        else:
            iu = ju = empty
        pend.append((idx, dropped, inv, m, iu, ju))
    ok = np.empty(0, bool)
    uinv = np.empty(0, np.int64)
    _t_score = _t_dtw = 0.0
    if gi:
        li = np.concatenate(gi)
        rj = np.concatenate(gj)
        # cross-bucket dedup: one verdict per distinct (table, table) pair,
        # keyed by an order-canonical 64-bit combine of the two payload
        # folds — ONE u64 sort, not a 2-key lexsort / np.unique(axis=0)
        # (both dominated the core when profiled); a cross-pair combine
        # collision merges two verdicts at ~2^-64 (the _fold_u64_cols trade)
        pk = (np.minimum(h_all[li], h_all[rj]) * _FOLD_P) \
            ^ np.maximum(h_all[li], h_all[rj])
        _, uidx, uinv = np.unique(pk, return_index=True, return_inverse=True)
        ua, ub = li[uidx], rj[uidx]
        # every generated pair is already mass-feasible (the in-chunk
        # window IS the exact min >= smin * max bound): score them all
        import time as _time
        _t0 = _time.perf_counter()
        sc, nm = stretchmatch.score_pairs(
            logf_all[ua], amp_all[ua], logf_all[ub], amp_all[ub],
            cfg.stretch_tol, cfg.stretch_max_shift)
        # matched-count floor: cfg.stretch_min_matched, capped at the
        # pair's own smaller peak count (a 2-peak clip can never match 3)
        npk_pair = np.minimum((amp_all[ua] > 0).sum(1),
                              (amp_all[ub] > 0).sum(1))
        need = np.maximum(2, np.minimum(cfg.stretch_min_matched,
                                        npk_pair))[:, None]
        ok = ((sc >= cfg.stretch_score_min) & (nm >= need)).any(axis=1)
        # rich-spectrum second chance (config.stretch_rich_min_peaks):
        # >= R peaks aligned under ONE shift at the relaxed mass floor —
        # catches lossy (rolloff-attenuated) stretch copies of rich
        # audio that the strict floor rejects
        rich = npk_pair >= cfg.stretch_rich_min_peaks
        ok |= rich & ((sc >= cfg.stretch_score_min_rich)
                      & (nm >= cfg.stretch_rich_min_peaks)).any(axis=1)
        _t_score = _time.perf_counter() - _t0
        import os as _os
        if _os.environ.get("MDR_STRETCH_DUMP"):
            _dump_pairs(_os.environ["MDR_STRETCH_DUMP"], logf_all, amp_all,
                        spread_all, mass_all, ua, ub, ok)
        sel = np.flatnonzero(ok)
        if sel.size:
            # DTW envelope confirm — temporal alignment check the
            # spectral consensus cannot see (pad/stretch must still be a
            # monotone frame-to-frame warp)
            _t0 = _time.perf_counter()
            cost = audio_dsp.dtw_cost_batch(
                env_all[ua[sel]].astype(np.float64), nenv_all[ua[sel]],
                env_all[ub[sel]].astype(np.float64), nenv_all[ub[sel]])
            ok[sel[cost > cfg.stretch_dtw_max]] = False
            _t_dtw = _time.perf_counter() - _t0
    all_pairs: list[tuple[str, str]] = []
    total_dropped = 0
    off = 0
    for idx, dropped, inv, m, iu, ju in pend:
        total_dropped += dropped
        adj = np.zeros((m, m), bool)
        if iu.size:
            good = ok[uinv[off:off + iu.size]]
            off += iu.size
            adj[iu[good], ju[good]] = True
            adj |= adj.T
        all_pairs.extend(_group_expand_edges(ids_all[idx], inv, adj,
                                             intra_pass=True))
    _stretch_prof(ids_all, pend, uinv, ok, _t_score, _t_dtw)
    # one DataFrame for the whole partition (a frame per bucket + concat
    # measured seconds at sf0.1 over ~11k buckets)
    return _edges_df(all_pairs, "stretch", total_dropped)


def _dump_pairs(dirpath, logf_all, amp_all, spread_all, mass_all,
                ua, ub, ok) -> None:
    """Profiling aid: dump per-pair features + verdicts for gate design
    (no-op unless $MDR_STRETCH_DUMP names a directory)."""
    import os
    import uuid as _uuid
    os.makedirs(dirpath, exist_ok=True)
    # all accepted + a deterministic 1/50 of rejected (volume control)
    keep = ok | ((np.arange(ok.size) % 50) == 0)
    ua, ub, ok = ua[keep], ub[keep], ok[keep]
    np.savez_compressed(
        os.path.join(dirpath, f"pairs-{_uuid.uuid4().hex[:12]}.npz"),
        logf_a=logf_all[ua].astype(np.float32),
        logf_b=logf_all[ub].astype(np.float32),
        amp_a=amp_all[ua].astype(np.float32),
        amp_b=amp_all[ub].astype(np.float32),
        spread_a=spread_all[ua].astype(np.float32),
        spread_b=spread_all[ub].astype(np.float32),
        mass_a=mass_all[ua].astype(np.float32),
        mass_b=mass_all[ub].astype(np.float32),
        ok=ok)


def _stretch_prof(ids_all, pend, uinv, ok,
                  t_score: float = 0.0, t_dtw: float = 0.0) -> None:
    """Per-partition stretch-core accounting, appended as one JSON line
    to $MDR_STRETCH_PROF (profiling aid; no-op unless the env var is
    set — O_APPEND single-write keeps concurrent task lines intact)."""
    import os
    path = os.environ.get("MDR_STRETCH_PROF")
    if not path:
        return
    import json
    gen = int(sum(p[4].size for p in pend))
    rec = {
        "rows": int(len(ids_all)),
        "buckets_multi": int(sum(1 for p in pend if p[3] > 1)),
        "chunks": len(pend),
        "gen_pairs": gen,
        "distinct_pairs": int(ok.size),
        "accepted": int(ok.sum()),
        "score_s": round(t_score, 3),
        "dtw_s": round(t_dtw, 3),
    }
    with open(path, "a") as f:
        f.write(json.dumps(rec) + "\n")


def _containment_core(ids_all: np.ndarray, buckets: np.ndarray,
                      sig_all: np.ndarray, sizes_all: np.ndarray,
                      cfg: DedupConfig) -> pd.DataFrame:
    """Containment estimated from MinHash signatures (vectorized):
    j = est Jaccard; |A∩B| ≈ j(|A|+|B|)/(1+j); containment =
    |A∩B| / min(|A|,|B|).  For B ⊂ A covering fraction f of A this is ~1.0
    while plain Jaccard is only f."""
    n = len(ids_all)
    h_all = _fold_u64_cols(np.concatenate(
        [np.ascontiguousarray(sig_all).view(np.uint64).reshape(n, -1),
         sizes_all.view(np.uint64)[:, None]], axis=1))
    out: list[pd.DataFrame] = []
    for idx, dropped in _bucket_slices(buckets, ids_all, cfg.max_bucket):
        # distinct (signature, set_size) rows verify; members expand after
        # (identical rows never pair HERE — same-size rows belong to the
        # minhash/exact channels — but closure membership still links them
        # through the group they ride with: intra_pass=False)
        _, first, inv = np.unique(h_all[idx], return_index=True,
                                  return_inverse=True)
        rep = idx[first]
        sizes = sizes_all[rep]
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


def _substring_core(ids_all: np.ndarray, buckets: np.ndarray,
                    sizes_all: np.ndarray, tfp_all: np.ndarray,
                    roles_all: np.ndarray, cfg: DedupConfig,
                    bot4_all: "np.ndarray | None" = None) -> pd.DataFrame:
    """CANDIDATE containee↔container pairs, BIPARTITE per bucket.
    (Emitted rows are (min_id, max_id)-normalized by ``_edges_df`` —
    orientation is NOT preserved; the verify stage re-derives it from the
    attached text lengths.)

    If P occurs in T then every w-window of P recurs verbatim in T, so
    minimizers(P) ⊆ minimizers(T) — in particular P's q SMALLEST minimizer
    values are all in T's minimizer set.  The explode marks those rows per
    text (``role=1``, q = cfg.substring_probes); here only role-1 texts
    act as containees and they pair with every longer text in the bucket.
    Consequences at scale:

    * each true candidate pair is emitted from at most q buckets (the
      containee's probe buckets; deduped by ``dedup_edges``) — never once
      per shared minimizer;
    * pairing is over DISTINCT texts (grouped by the minimizer-set
      fingerprint ``tfp``), so a cluster of identical copies costs
      O(members) star rows, never O(members²) — the memoized-verification
      idiom shared with the other channels (ref all-identical fast path:
      deduplicate.py:292-310);
    * equal-length pairs are emitted only within a tfp group (identical
      texts); the verify stage checks them by string equality.

    No text verification here — ``verify_substring_edges`` re-attaches
    transcripts by bucketed join and runs the exact suffix-array check.
    Hot buckets are capped at ``max_bucket`` DISTINCT containees and, per
    containee, ``max_bucket`` shortest containers (nearest parents in a
    containment chain; a longer ancestor is reached transitively through
    the parent's own containee role WHEN the parent verifies) — overflow
    is counted in ``dropped``.  Unlike the LSH channels a containee has
    only its q probe buckets, so a candidate capped away in ALL of them is
    not retried elsewhere: on boilerplate-heavy corpora where thousands of
    texts share the same hot minimizers, raise ``max_bucket`` or
    ``substring_probes`` (treat a nonzero substring ``dropped`` as the
    signal to) — the reported count makes the trade visible rather than
    silent."""
    cap = cfg.max_bucket
    out: list[pd.DataFrame] = []
    order = np.lexsort((ids_all, buckets))
    b_sorted = buckets[order]
    bounds = np.flatnonzero(np.concatenate(
        ([True], b_sorted[1:] != b_sorted[:-1], [True])))
    for s, e in zip(bounds[:-1], bounds[1:]):
        if e - s < 2:
            continue
        idx = order[s:e]
        dropped = 0
        pairs: list[tuple[str, str]] = []
        # distinct texts (first occurrence = min clip_id: idx is sorted)
        _, first, inv = np.unique(tfp_all[idx], return_index=True,
                                  return_inverse=True)
        rep = idx[first]
        g_n = sizes_all[rep]
        g_role = roles_all[rep]
        # intra-group identical-copy stars, once per text (global-min bkt)
        morder = np.argsort(inv, kind="stable")
        gb = np.flatnonzero(np.concatenate(
            ([True], inv[morder][1:] != inv[morder][:-1], [True])))
        for gs, ge in zip(gb[:-1], gb[1:]):
            g = inv[morder[gs]]
            if ge - gs > 1 and g_role[g]:
                r = ids_all[rep[g]]
                pairs.extend((r, ids_all[idx[m]])
                             for m in morder[gs:ge].tolist()
                             if idx[m] != rep[g])
        # bipartite candidates between distinct texts
        c_sel = np.flatnonzero(g_role == 1)
        if c_sel.size and len(rep) > 1:
            if c_sel.size > cap:
                dropped += int(c_sel.size - cap)
                c_sel = c_sel[:cap]
            by_len = np.lexsort((rep, g_n))  # containers shortest-first
            n_sorted = g_n[by_len]
            for gi in c_sel.tolist():
                lo = np.searchsorted(n_sorted, g_n[gi], side="right")
                bigger = by_len[lo:]
                # pre-prune budget: the 8*cap SHORTEST containers (nearest
                # parents) enter the sketch prune; the far tail is dropped
                # with accounting.  Bounds sketch-compare cost per
                # containee at 8*cap*16 ops in pathological hot buckets —
                # strictly MORE permissive than the old direct cap.
                if bigger.size > 8 * cap:
                    dropped += int(bigger.size - 8 * cap)
                    bigger = bigger[:8 * cap]
                if bot4_all is not None and bigger.size:
                    # EXACT subset prune: containment => minimizers(P) ⊆
                    # minimizers(T), so any of P's m smallest minimizers
                    # that is below T's m-th-smallest MUST appear among
                    # T's bottom-m (m = sketch width, 8 since round 5;
                    # UINT64_MAX pads pass vacuously).  Kills the random
                    # same-minimizer collisions that make low-entropy
                    # corpora quadratic, with zero recall loss.
                    cm = bot4_all[rep[gi]]
                    bm = bot4_all[rep[bigger]]
                    ge = cm[None, :] >= bm[:, -1][:, None]
                    present = (bm[:, :, None]
                               == cm[None, None, :]).any(axis=1)
                    bigger = bigger[(ge | present).all(axis=1)]
                if bigger.size > cap:
                    dropped += int(bigger.size - cap)
                    bigger = bigger[:cap]
                a = ids_all[rep[gi]]
                pairs.extend((a, ids_all[rep[gj]])
                             for gj in bigger.tolist())
        if pairs or dropped:
            out.append(_edges_df(pairs, "substring", dropped))
    return pd.concat(out, ignore_index=True) if out else _EMPTY


# ---------------- fused partition dispatch ----------------

def _payload_matrix(pay: np.ndarray, width: int) -> np.ndarray:
    return np.frombuffer(b"".join(pay.tolist()),
                         dtype=np.uint8).reshape(len(pay), width)


def _payload_matrix_arrow(arr: "pa.BinaryArray", sel: np.ndarray,
                          width: int) -> np.ndarray:
    """Gather ``sel`` rows of a fixed-width-per-channel binary column as
    a (len(sel), width) uint8 matrix with ZERO per-row Python objects:
    Arrow take() compacts the selection (contiguous values), then one
    frombuffer + reshape views the flat buffer.  Replaces the
    pandas-object-column path (tens of millions of bytes objects +
    b"".join per partition at the 783k scale point — the GC-bound term
    that made the candidates stage superlinear while every verify core
    stayed linear)."""
    taken = arr.take(pa.array(sel, pa.int64()))
    odt = np.int64 if pa.types.is_large_binary(taken.type) else np.int32
    offs = np.frombuffer(taken.buffers()[1], dtype=odt)[
        taken.offset:taken.offset + len(taken) + 1]
    flat = np.frombuffer(taken.buffers()[2], np.uint8,
                         count=int(offs[-1] - offs[0]),
                         offset=int(offs[0]))
    return flat.reshape(len(taken), width)


def _fused_partition(t: pa.Table, cfg: DedupConfig,
                     channels: tuple[str, ...]) -> pd.DataFrame:
    """Verify every bucket of every channel hashed into this partition.
    Rows arrive as ONE Arrow table (batch_format="pyarrow" end to end —
    the pandas conversion used to materialize every payload as a Python
    bytes object, tens of millions per partition at scale); each core
    parses its fixed-width payload slice via _payload_matrix_arrow
    (zero per-row Python in the hot path)."""
    import os as _os
    import time as _time
    _prof = _os.environ.get("MDR_CAND_PROF")
    _times: dict[str, float] = {}
    _t00 = _time.perf_counter()
    ch = t["channel"].to_numpy(zero_copy_only=False)
    ids = t["clip_id"].to_numpy(zero_copy_only=False)
    bkt = t["bucket"].to_numpy(zero_copy_only=False).astype(np.uint64)
    pay_arr = t["payload"].combine_chunks()
    out: list[pd.DataFrame] = []

    _t0 = _time.perf_counter()
    sel = np.flatnonzero(ch == _CH["exact"])
    if sel.size:
        # exact keys stay per-row bytes (np.unique on objects) — one
        # row per clip, not the hot path
        keys = pay_arr.take(pa.array(sel, pa.int64())) \
            .to_numpy(zero_copy_only=False)
        out.append(_exact_core(ids[sel], keys))
    _times["exact"] = _time.perf_counter() - _t0

    _t0 = _time.perf_counter()
    sel = np.flatnonzero(ch == _CH["minhash"])
    if sel.size:
        mat = _payload_matrix_arrow(pay_arr, sel, cfg.num_perm + 8)
        sig = mat[:, :cfg.num_perm]
        ek = np.ascontiguousarray(mat[:, cfg.num_perm:]) \
            .view(np.uint64).ravel()
        out.append(_minhash_core(ids[sel], bkt[sel], sig, ek, cfg,
                                 exact_enabled="exact" in channels))
    _times["minhash"] = _time.perf_counter() - _t0

    _t0 = _time.perf_counter()
    sel = np.flatnonzero(ch == _CH["audio"])
    if sel.size:
        mat = _payload_matrix_arrow(pay_arr, sel,
                                    12 + 2 * cfg.spectral_dims)
        fp = np.ascontiguousarray(mat[:, :8]).view(np.uint64).ravel()
        dur = (np.ascontiguousarray(mat[:, 8:12]).view(np.int32)
               .ravel().astype(np.int64))
        out.append(_audio_core(ids[sel], bkt[sel], fp, dur,
                               np.ascontiguousarray(mat[:, 12:]), cfg))
    _times["audio"] = _time.perf_counter() - _t0

    _t0 = _time.perf_counter()
    sel = np.flatnonzero(ch == _CH["containment"])
    if sel.size:
        mat = _payload_matrix_arrow(pay_arr, sel, cfg.num_perm + 8)
        sig = mat[:, :cfg.num_perm]
        sizes = (np.ascontiguousarray(mat[:, cfg.num_perm:])
                 .view(np.int64).ravel().astype(np.float64))
        out.append(_containment_core(ids[sel], bkt[sel], sig, sizes, cfg))
    _times["containment"] = _time.perf_counter() - _t0

    _t0 = _time.perf_counter()
    sel = np.flatnonzero(ch == _CH["stretch"])
    if sel.size:
        mat = _payload_matrix_arrow(pay_arr, sel,
                                    _stretch_payload_width(cfg))
        out.append(_stretch_core(ids[sel], bkt[sel], mat, cfg))
    _times["stretch"] = _time.perf_counter() - _t0

    _t0 = _time.perf_counter()
    sel = np.flatnonzero(ch == _CH["substring"])
    if sel.size:
        mat = _payload_matrix_arrow(pay_arr, sel, 81)
        sizes = np.ascontiguousarray(mat[:, :8]).view(np.int64).ravel()
        tfp = np.ascontiguousarray(mat[:, 8:16]).view(np.uint64).ravel()
        roles = mat[:, 16]
        bot8 = np.ascontiguousarray(mat[:, 17:81]).view(np.uint64) \
            .reshape(-1, 8)
        out.append(_substring_core(ids[sel], bkt[sel], sizes, tfp, roles,
                                   cfg, bot8))
    _times["substring"] = _time.perf_counter() - _t0

    if _prof:
        import json as _json
        _times["total"] = _time.perf_counter() - _t00
        _times["rows"] = t.num_rows
        with open(_prof, "a") as f:
            f.write(_json.dumps({k: round(v, 3) if isinstance(v, float)
                                 else v for k, v in _times.items()}) + "\n")
    return pd.concat(out, ignore_index=True) if out else _EMPTY


# ---------------- test/back-compat wrapper ----------------

def _minhash_partition(df: pd.DataFrame, cfg: DedupConfig,
                       exact_enabled: bool = True) -> pd.DataFrame:
    """Column-named entry to the minhash core (unit tests feed DataFrames
    with clip_id / minhash_sig8 / ek64 / bucket columns directly)."""
    n = len(df)
    sig = np.frombuffer(b"".join(df["minhash_sig8"]),
                        dtype=np.uint8).reshape(n, cfg.num_perm)
    return _minhash_core(df["clip_id"].to_numpy(),
                         df["bucket"].to_numpy().astype(np.uint64),
                         sig, df["ek64"].to_numpy().astype(np.uint64),
                         cfg, exact_enabled)


# ---------------- channel drivers ----------------

def candidate_edges(sigs: "ray.data.Dataset", cfg: DedupConfig,
                    channels: tuple[str, ...] = ALL_CHANNELS,
                    nbuckets: int = 128) -> "ray.data.Dataset":
    """All verified candidate edges (union of channels) from ONE fused
    explode + ONE bucketed shuffle; overflow rows included (``src == ''``).
    ``sigs`` must already exclude rejected rows."""
    channels = tuple(channels)
    exploded = sigs.map_batches(
        lambda t: explode_all(t, cfg, channels),
        batch_format="pyarrow", batch_size=2048)

    def add_small(t: pa.Table) -> pa.Table:
        b = t["bucket"].to_numpy(zero_copy_only=False).astype(np.uint64)
        small = (b % np.uint64(nbuckets)).astype(np.int32)
        return t.append_column(bucketing.BUCKET_COL, pa.array(small))

    bucketed = exploded.map_batches(add_small, batch_format="pyarrow")
    return bucketed.groupby(bucketing.BUCKET_COL).map_groups(
        lambda t: bucketing.arrow_clean(
            _fused_partition(t.drop_columns([bucketing.BUCKET_COL]),
                             cfg, channels)),
        batch_format="pyarrow")


def dedup_edges(raw_edges: "ray.data.Dataset",
                nbuckets: int = 64) -> "ray.data.Dataset":
    """Dedup pairs (a pair can surface from up to ``lsh_bands`` buckets and
    several channels) — bucketed drop_duplicates, vectorized.  Overflow
    accounting rows (src=='') pass through untouched so one materialize
    serves both the edge list and the dropped-rows metric (split with
    :func:`split_edges`)."""
    def part(df: pd.DataFrame) -> pd.DataFrame:
        real = df[df["src"] != ""]
        # substring rows are unverified CANDIDATES at this point: when the
        # same pair also surfaced from a verified channel, keep that row
        # (or a failed suffix-array verify would erase a true edge)
        sub = real["channel"] == "substring"
        real = pd.concat([real[~sub], real[sub]]).drop_duplicates(
            subset=["src", "dst"])
        return pd.concat([real, df[df["src"] == ""]], ignore_index=True)

    return bucketing.grouped(
        raw_edges.map_batches(
            lambda t: t.select(["src", "dst", "channel", "dropped"]),
            batch_format="pyarrow"),
        "src", part, nbuckets)


# build a container's suffix array only when enough patterns query it to
# amortize construction: SA build is ~650us for a 1.5KB text while one
# two-way `in` search is ~1.6us, so the break-even fanout is O(100)
_SA_FANOUT = 256


def _verify_pair_rows(srcs, dsts, stexts, dtexts,
                      orient: bool = False) -> pa.Table:
    """The exact verification kernel shared by both verify paths: for each
    candidate (src, dst) with attached texts, keep the pair iff the shorter
    text occurs verbatim in the longer.  Low-fanout containers use the
    C two-way substring search (``in``); containers queried >= _SA_FANOUT
    times in this call get ONE suffix array built and binary-searched per
    pattern (the north star's "suffix-array builders" actor state —
    measured break-even: build 648us vs 1.6us/`in` query, so the SA only
    pays when many patterns hit one container).  Equal-length pairs are
    identical-copy star candidates (same tfp group) and verify by string
    equality — equal length can never strictly contain.

    ``orient=True`` switches to STRICT-containment semantics: verified
    rows come back as (src=container, dst=contained) and equal-length
    (identical-copy) pairs are dropped — the shape the docs
    ``substring_pairs`` oracle needs, where edge direction is the
    answer rather than fodder for connected components."""
    from mail_deduplicate_ray.functions.suffixarray import (sa_contains,
                                                            suffix_array)
    # fanout census: how many patterns will query each container here
    fanout: dict[str, int] = {}
    for src, dst, stext, dtext in zip(srcs, dsts, stexts, dtexts):
        if (isinstance(stext, str) and isinstance(dtext, str)
                and len(stext) != len(dtext)):
            big_id = src if len(stext) > len(dtext) else dst
            fanout[big_id] = fanout.get(big_id, 0) + 1
    out_s: list[str] = []
    out_d: list[str] = []
    cache: dict[str, tuple[bytes, np.ndarray]] = {}
    for src, dst, stext, dtext in zip(srcs, dsts, stexts, dtexts):
        if not isinstance(stext, str) or not isinstance(dtext, str):
            continue  # missing side (null text or NaN from pandas)
        if len(stext) == len(dtext):
            if not orient and stext == dtext:
                out_s.append(src)
                out_d.append(dst)
            continue
        big_id, small_id, big, small = ((src, dst, stext, dtext)
                                        if len(stext) > len(dtext)
                                        else (dst, src, dtext, stext))
        if fanout[big_id] >= _SA_FANOUT:
            ent = cache.get(big_id)
            if ent is None:
                bb = big.encode("utf-8")
                ent = (bb, suffix_array(np.frombuffer(bb, np.uint8)))
                cache[big_id] = ent
            hit = sa_contains(ent[0], ent[1], small.encode("utf-8"))
        else:
            hit = small in big
        if hit:
            out_s.append(big_id if orient else src)
            out_d.append(small_id if orient else dst)
    return pa.table({
        "src": pa.array(out_s, pa.string()),
        "dst": pa.array(out_d, pa.string()),
        "channel": pa.array(["substring"] * len(out_s), pa.string()),
        "dropped": pa.array([0] * len(out_s), pa.int64())})


def verify_substring_edges(deduped: "ray.data.Dataset",
                           usable: "ray.data.Dataset", cfg: DedupConfig,
                           nbuckets: int = 64,
                           orient: bool = False) -> "ray.data.Dataset":
    """Exact suffix-array verification of the substring channel's
    candidate pairs (the north-star detector, BASELINE.json).

    Texts are NOT shipped with the band rows (that would multiply shuffle
    volume by the minimizer count); they are re-attached here.  Two
    regimes, chosen by measured size (the hybrid small-side/bucketed
    split, same shape as components.py):

    * **broadcast** (the common case — candidate pairs are O(near-dups),
      ≪ corpus): the pair-id set prunes the text table (semi-join), and
      if the surviving texts fit under ``_TEXT_BYTES_CAP`` they are
      ``ray.put`` ONCE as an id→text map; verification is then a plain
      ``map_batches`` over the pair rows — ZERO shuffles.
    * **bucketed joins** (mega-dup corpora): two bucketed hash-joins
      attach ``transcript_norm`` to each side of the pair — each join
      ships the (pruned) text table once, O(participating text), the
      same cost class as one LSH band pass.  ``nbuckets`` scales down
      with the pair count so tiny jobs don't pay 64 partitions of fixed
      overhead.

    Non-substring edges and overflow accounting rows pass through
    untouched."""
    import ray as _ray
    # pin the upstream edge DAG once: both the cand materialize below and
    # the rest branch consume it — leaving it lazy re-executes the whole
    # explode+shuffle a second time (measured ~2x the candidates stage)
    deduped = deduped.materialize()
    rest = deduped.map_batches(
        lambda t: t.filter(pc.or_(pc.not_equal(t["channel"], "substring"),
                                  pc.equal(t["src"], ""))),
        batch_format="pyarrow")
    cand = deduped.map_batches(
        lambda t: t.filter(pc.and_(pc.equal(t["channel"], "substring"),
                                   pc.not_equal(t["src"], ""))),
        batch_format="pyarrow").materialize()
    n_pairs = cand.count()
    if n_pairs == 0:
        return rest
    # null transcripts can never verify; dropping them here keeps them out
    # of the broadcast map AND the fallback joins (where a null-text row
    # would masquerade as a pair row through the notna() classification)
    texts = usable.select_columns(["clip_id", "transcript_norm"]) \
        .map_batches(lambda t: t.filter(pc.is_valid(t["transcript_norm"])),
                     batch_format="pyarrow")

    if n_pairs <= _PAIR_BROADCAST_LIMIT:
        # semi-join prune: only texts participating in a pair are needed.
        # Arrow hash-unique / is_in (C++), NOT np.unique over object
        # strings (sort-based; measured seconds at millions of pairs)
        parts: list[pa.Array] = []
        for b in cand.select_columns(["src", "dst"]).iter_batches(
                batch_format="pyarrow", batch_size=65536):
            parts.append(pc.unique(b["src"]))
            parts.append(pc.unique(b["dst"]))
        need = pc.unique(pa.concat_arrays(
            [p.cast(pa.string()) for p in parts]))
        need_ref = _ray.put(need)

        def prune(t: pa.Table, ref=need_ref) -> pa.Table:
            return t.filter(pc.is_in(t["clip_id"],
                                     value_set=_ray.get(ref)))

        texts = texts.map_batches(prune, batch_format="pyarrow")

        # zero-shuffle fast path: broadcast the pruned id→text map
        tmap: dict | None = {}
        total = 0
        for b in texts.iter_batches(batch_format="pyarrow",
                                    batch_size=8192):
            # UTF-8 BYTES, not str length (binary_length counts bytes):
            # the cap guards driver/object-store memory, so it must
            # measure what is actually stored
            total += pc.sum(pc.binary_length(b["transcript_norm"])
                            ).as_py() or 0
            tmap.update(zip(b["clip_id"].to_pylist(),
                            b["transcript_norm"].to_pylist()))
            if total > _TEXT_BYTES_CAP:
                tmap = None
                break
        if tmap is not None:
            # task map, LARGE batches: tasks fuse with the upstream read
            # and skip actor-pool ramp-up; the big batch amortizes the
            # per-task deserialize of the broadcast map (measured 1.3s vs
            # 5.4s actor pool vs 6.7s at 4k batches, 2.4M pairs)
            tref = _ray.put(tmap)

            def vmap(t: pa.Table, ref=tref) -> pa.Table:
                m = _ray.get(ref)
                srcs = t["src"].to_pylist()
                dsts = t["dst"].to_pylist()
                return _verify_pair_rows(
                    srcs, dsts, [m.get(s) for s in srcs],
                    [m.get(d) for d in dsts], orient=orient)

            return rest.union(cand.map_batches(vmap, batch_size=65536,
                                               batch_format="pyarrow"))

    nbuckets = max(4, min(nbuckets, n_pairs // 2000 + 1))

    # join 1 (key = src): attach the src side's text
    pair1 = cand.map_batches(
        lambda t: pa.table({"key": t["src"], "other": t["dst"],
                            "otext": pa.nulls(t.num_rows, pa.string()),
                            "text": pa.nulls(t.num_rows, pa.string())}),
        batch_format="pyarrow")
    text_rows = texts.map_batches(
        lambda t: pa.table({"key": t["clip_id"],
                            "other": pa.nulls(t.num_rows, pa.string()),
                            "otext": pa.nulls(t.num_rows, pa.string()),
                            "text": t["transcript_norm"]}),
        batch_format="pyarrow")

    def j1(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        is_text = df["text"].notna()
        tmap = df.loc[is_text].set_index("key")["text"]
        pairs = df.loc[~is_text]
        return pa.table({
            "key": pa.array(pairs["other"], pa.string()),    # re-key by dst
            "other": pa.array(pairs["key"], pa.string()),    # src
            "otext": pa.array(pairs["key"].map(tmap), pa.string()),
            "text": pa.nulls(len(pairs), pa.string())})

    p1 = bucketing.grouped(pair1.union(text_rows), "key", j1, nbuckets,
                           batch_format="pyarrow")

    # join 2 (key = dst): attach the dst side's text, then verify
    def j2(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        is_text = df["text"].notna()
        tmap = dict(zip(df.loc[is_text, "key"], df.loc[is_text, "text"]))
        pairs = df.loc[~is_text]
        return _verify_pair_rows(
            pairs["other"].tolist(), pairs["key"].tolist(),
            pairs["otext"].tolist(),  # NaN/None handled by the kernel
            [tmap.get(k) for k in pairs["key"]], orient=orient)

    verified = bucketing.grouped(p1.union(text_rows), "key", j2, nbuckets,
                                 batch_format="pyarrow")
    return rest.union(verified)


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
