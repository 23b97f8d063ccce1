"""Character-shingle hashing (numpy-vectorized rolling polynomial hash).

The unit the MinHash detector works over (BASELINE.json north_star: "batched
MinHash over transcript character shingles").  The reference's analogue is
the normalized body-line content that feeds ``hash_normalized_body``
(ref: mail.py:431-439); near-dup generalizes the exact hash to a shingle set.
"""

from __future__ import annotations

import numpy as np

_BASE = np.uint64(1099511628211)  # FNV prime, wraps mod 2^64
_OFFS = np.uint64(14695981039346656037)


def _poly_hashes(data: np.ndarray, k: int) -> np.ndarray:
    """uint64 polynomial hash per k-gram position (``len(data)-k+1``
    results).  Accumulates over CONTIGUOUS shifted slices
    ``data[j:j+m]`` — ~2x faster than iterating the columns of a
    sliding_window_view, whose per-column access is a strided gather."""
    m = len(data) - k + 1
    h = np.full(m, _OFFS, dtype=np.uint64)
    for j in range(k):
        h *= _BASE
        h += data[j:j + m]
    return h


def shingle_hashes(text: str, k: int) -> np.ndarray:
    """Unique uint64 hashes of all k-char shingles of ``text``.

    Short texts (< k chars) hash as a single whole-string shingle so they
    still participate in exact-match candidates.
    """
    data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    if len(data) == 0:
        return np.empty(0, dtype=np.uint64)
    if len(data) < k:
        return _poly_hashes(data, len(data))
    return np.unique(_poly_hashes(data, k))


def batch_shingles(texts: list[str], k: int) -> tuple[np.ndarray, np.ndarray]:
    """Shingle a batch: returns (flat hashes, offsets) with offsets of
    length len(texts)+1 delimiting each doc's slice (for reduceat-style
    vectorized MinHash)."""
    parts = [shingle_hashes(t or "", k) for t in texts]
    offsets = np.zeros(len(parts) + 1, dtype=np.int64)
    np.cumsum([len(p) for p in parts], out=offsets[1:])
    flat = np.concatenate(parts) if parts else np.empty(0, dtype=np.uint64)
    return flat, offsets


def positional_shingle_hashes(data: np.ndarray, k: int) -> np.ndarray:
    """uint64 hash per k-gram POSITION of a uint8 byte array (no dedup, in
    text order) — the winnowing/minimizer unit.  Empty result if the text
    is shorter than k."""
    if len(data) < k:
        return np.empty(0, dtype=np.uint64)
    return _poly_hashes(data, k)


def _sliding_min(h: np.ndarray, w: int) -> np.ndarray:
    """Min of every length-``w`` window of ``h`` in O(n): the two-pass
    block trick — prefix mins and suffix mins over w-aligned blocks; a
    window [i, i+w) spans at most two blocks, so its min is
    ``min(suffix[i], prefix[i+w-1])``.  ~w/2x fewer comparisons than a
    sliding_window_view .min(axis=1)."""
    n = len(h)
    nb = -(-n // w)
    pad = np.full(nb * w, np.uint64(0xFFFFFFFFFFFFFFFF), dtype=np.uint64)
    pad[:n] = h
    blocks = pad.reshape(nb, w)
    pref = np.minimum.accumulate(blocks, axis=1).ravel()
    suff = np.minimum.accumulate(blocks[:, ::-1], axis=1)[:, ::-1].ravel()
    return np.minimum(suff[: n - w + 1], pref[w - 1: n])


def minimizers(data: np.ndarray, k: int, w: int) -> np.ndarray:
    """Unique winnowing minimizer VALUES of a uint8 byte array: the min
    k-gram hash of every w-gram-wide window.  Guarantee used by the
    substring detector: if pattern P (len >= w + k - 1) occurs inside text
    T, then minimizers(P) & minimizers(T) != {} — P's windows reappear
    verbatim inside T, so each window's min value is selected for both.
    Texts shorter than w + k - 1 bytes return an empty set."""
    h = positional_shingle_hashes(data, k)
    if len(h) < w:
        return np.empty(0, dtype=np.uint64)
    return np.unique(_sliding_min(h, w))


def token_hashes(text: str) -> np.ndarray:
    """uint64 hash per whitespace token (for token-level SimHash / Jaccard)."""
    toks = text.split()
    if not toks:
        return np.empty(0, dtype=np.uint64)
    out = np.empty(len(toks), dtype=np.uint64)
    base, offs, mask = int(_BASE), int(_OFFS), (1 << 64) - 1
    for i, t in enumerate(toks):
        h = offs
        for byte in t.encode("utf-8"):
            h = (h * base + byte) & mask
        out[i] = h
    return out
