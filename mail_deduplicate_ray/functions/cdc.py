"""Content-defined chunking (FastCDC, Xia et al. 2016 USENIX ATC) —
the storage-dedup primitive: split binary payloads at content-determined
boundaries so shared regions chunk identically regardless of byte
offset (insertions only disturb the chunks they touch).

Gear rolling hash: h = (h << 1) + GEAR[byte], boundaries where
``h & mask == 0``.  Because the ``<< 1`` shifts a term out after 64
steps, the hash at position i depends ONLY on the previous 64 bytes —
so the per-position hash array can be computed once for the whole
payload with 64 vectorized shift-adds (no per-byte Python), and is
bit-identical to the per-chunk streaming hash at every position ≥ 64
bytes past a chunk start (guaranteed: ``min_size`` must be ≥ 64).

Normalized chunking per the paper: a HARDER mask (more bits) applies
below the average target and an easier one above it, tightening the
chunk-size distribution; ``max_size`` forces a cut.

Ref semantics: the reference hashes whole canonical messages
(deduplicate.py hash_key, M9); CDC is the sub-message analogue a
storage-level dedup tier needs at 10^12-clip scale.
"""

from __future__ import annotations

import hashlib

import numpy as np

# deterministic gear table — seeded once at import, identical in every
# actor/process (the same cross-process contract as the shingle hashes)
GEAR = np.random.default_rng(0x9E3779B9).integers(
    0, 1 << 64, size=256, dtype=np.uint64)

MIN_SIZE = 1024
AVG_SIZE = 4096
MAX_SIZE = 16384


def _masks(avg_size: int) -> tuple[np.uint64, np.uint64]:
    """Normalization level 2: bits+2 below the average point, bits-2
    above (contiguous low-bit masks; the gear hash mixes well enough
    that bit placement is immaterial for synthetic payloads)."""
    bits = int(avg_size).bit_length() - 1
    return (np.uint64((1 << (bits + 2)) - 1),
            np.uint64((1 << max(bits - 2, 1)) - 1))


def gear_hashes(data: np.ndarray) -> np.ndarray:
    """(n,) uint8 -> (n,) uint64 gear hash at every position, windowed
    to the last 64 bytes (== the streaming hash everywhere a boundary
    may legally occur).  64 vectorized shift-adds, wrap-around uint64."""
    g = GEAR[data]
    h = g.copy()
    n = len(g)
    for j in range(1, min(64, n)):
        h[j:] += g[: n - j] << np.uint64(j)
    return h


def chunk_boundaries(data: bytes | np.ndarray,
                     min_size: int = MIN_SIZE,
                     avg_size: int = AVG_SIZE,
                     max_size: int = MAX_SIZE) -> np.ndarray:
    """Chunk END offsets (exclusive, ascending, last == len(data)).

    From each chunk start s the next cut is: the first hard-mask match
    in (s+min_size, s+avg_size], else the first easy-mask match in
    (s+avg_size, s+max_size], else s+max_size.  Candidate positions are
    precomputed sparse arrays; the walk is O(#chunks · log #candidates)
    via searchsorted — no per-byte Python."""
    if min_size < 64:
        raise ValueError("min_size must be >= 64 (windowed-hash contract)")
    arr = np.frombuffer(data, np.uint8) if isinstance(
        data, (bytes, bytearray, memoryview)) else np.asarray(data, np.uint8)
    n = len(arr)
    if n <= min_size:
        return np.array([n], np.int64) if n else np.empty(0, np.int64)
    h = gear_hashes(arr)
    mask_s, mask_l = _masks(avg_size)
    # a match at index i cuts AFTER byte i -> end offset i + 1
    cand_s = np.flatnonzero((h & mask_s) == 0) + 1
    cand_l = np.flatnonzero((h & mask_l) == 0) + 1
    ends: list[int] = []
    cur = 0
    while True:
        rem = n - cur
        if rem <= min_size:          # sub-min tail -> final chunk
            if rem:
                ends.append(n)
            break
        hard_hi = min(cur + avg_size, n)
        i = np.searchsorted(cand_s, cur + min_size, side="left")
        if i < len(cand_s) and cand_s[i] <= hard_hi:
            cut = int(cand_s[i])
        else:
            easy_hi = min(cur + max_size, n)
            j = np.searchsorted(cand_l, hard_hi, side="right")
            if j < len(cand_l) and cand_l[j] <= easy_hi:
                cut = int(cand_l[j])
            else:
                cut = easy_hi        # forced cut (or the remainder)
        ends.append(cut)
        cur = cut
        if cur == n:
            break
    return np.asarray(ends, np.int64)


def chunk_payload(data: bytes,
                  min_size: int = MIN_SIZE,
                  avg_size: int = AVG_SIZE,
                  max_size: int = MAX_SIZE
                  ) -> tuple[np.ndarray, list[bytes]]:
    """-> (lengths, 16-byte blake2b chunk digests).  Digest loop is per
    CHUNK (payload_bytes / avg_size iterations), not per byte."""
    ends = chunk_boundaries(data, min_size, avg_size, max_size)
    starts = np.concatenate(([0], ends[:-1]))
    digests = [hashlib.blake2b(data[s:e], digest_size=16).digest()
               for s, e in zip(starts, ends)]
    return (ends - starts), digests
