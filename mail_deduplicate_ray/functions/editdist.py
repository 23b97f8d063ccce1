"""Bounded edit-distance kernels for the PassJoin similarity join.

Public-algorithm basis: PassJoin (Li, Deng, Feng — "PASS-JOIN: A
Partition-based Method for Similarity Joins", PVLDB 5(3), 2011)
partitions one string of a candidate pair into ``d + 1`` contiguous
segments; any pair within edit distance ``d`` must contain one segment
verbatim, starting within ``±d`` of the segment's own start (the ``d``
edit operations touch at most ``d`` segments and shift positions by at
most ``d``).  That pigeonhole makes the candidate generation EXACT —
recall 1.0 by construction, like the SimHash pigeonhole banding in
``pipelines/docs.py``.

Reference parity: extends the dedup family of the reference's
group-by-hash (deduplicate.py:1009) to approximate string keys; the
verify kernel mirrors the reference's pairwise content-diff gate
(deduplicate.py:292-310) with a metric bound instead of a byte diff.
"""

from __future__ import annotations

import hashlib


def segments(length: int, nseg: int) -> list[tuple[int, int]]:
    """Even partition of ``[0, length)`` into ``nseg`` contiguous
    ``(start, seg_len)`` pieces — the first ``length % nseg`` pieces get
    the ceil size.  Deterministic: index and probe sides MUST derive the
    identical scheme for a given length."""
    base, rem = divmod(length, nseg)
    out = []
    start = 0
    for i in range(nseg):
        ln = base + (1 if i < rem else 0)
        out.append((start, ln))
        start += ln
    return out


def seg_key(length: int, idx: int, seg: str) -> int:
    """Deterministic 64-bit key for a (partition-length, segment-index,
    segment-bytes) triple.  blake2b, not ``hash()`` — stable across
    worker processes regardless of PYTHONHASHSEED."""
    h = hashlib.blake2b(f"{length}:{idx}:".encode() + seg.encode(),
                        digest_size=8).digest()
    return int.from_bytes(h, "little")


def lev_within(a: str, b: str, d: int) -> bool:
    """True iff ``levenshtein(a, b) <= d``.

    Ukkonen-banded DP (band half-width ``d`` — O(d·n) cells, not O(n·m))
    after trimming the common prefix and suffix, which collapses
    near-identical strings to their tiny differing core before any DP
    row is computed (the same trick the reference's content diff relies
    on via difflib's matching blocks)."""
    la, lb = len(a), len(b)
    if abs(la - lb) > d:
        return False
    lim = min(la, lb)
    i = 0
    while i < lim and a[i] == b[i]:
        i += 1
    j = 0
    while j < lim - i and a[la - 1 - j] == b[lb - 1 - j]:
        j += 1
    a2 = a[i:la - j]
    b2 = b[i:lb - j]
    n, m = len(a2), len(b2)
    if n > m:              # DP rows over the shorter string
        a2, b2, n, m = b2, a2, m, n
    if n == 0:
        return m <= d
    inf = d + 1
    prev = [jj if jj <= d else inf for jj in range(m + 1)]
    for ii in range(1, n + 1):
        lo = max(1, ii - d)
        hi = min(m, ii + d)
        cur = [inf] * (m + 1)
        cur[lo - 1] = ii if lo == 1 and ii <= d else inf
        ca = a2[ii - 1]
        best = inf
        for jj in range(lo, hi + 1):
            v = prev[jj - 1] + (ca != b2[jj - 1])
            up = prev[jj] + 1
            if up < v:
                v = up
            left = cur[jj - 1] + 1
            if left < v:
                v = left
            if v < inf:
                cur[jj] = v
                if v < best:
                    best = v
        if best >= inf:    # whole band exceeded the budget
            return False
        prev = cur
    return prev[m] <= d


def lev_bruteforce(a: str, b: str) -> int:
    """Reference full-DP Levenshtein (tests only — O(n·m))."""
    n, m = len(a), len(b)
    prev = list(range(m + 1))
    for i in range(1, n + 1):
        cur = [i] + [0] * m
        for j in range(1, m + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (a[i - 1] != b[j - 1]))
        prev = cur
    return prev[m]
