"""Suffix array construction + substring search (numpy prefix doubling).

The north-star's third detector — "suffix-array exact-substring matching
for contained transcripts" (BASELINE.json north_star) — generalizing the
reference's byte-identical body grouping (ref: mail.py:423-439) to
"one content is verbatim contained in another".  Construction is the
classic prefix-doubling scheme, fully vectorized: O(n log n) numpy sorts,
no per-character Python.  At 10^12 scale one array is built per CONTAINER
text (or per partition as a generalized array) and queried by many
patterns — an O(|p| log n) binary search each.
"""

from __future__ import annotations

import numpy as np


def suffix_array(data: np.ndarray) -> np.ndarray:
    """int64 suffix array of a uint8 byte array (lexicographic order of
    all suffixes), built by prefix doubling."""
    n = len(data)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    rank = np.unique(data, return_inverse=True)[1].astype(np.int64)
    k = 1
    while k < n:
        key2 = np.full(n, -1, dtype=np.int64)
        key2[: n - k] = rank[k:]
        order = np.lexsort((key2, rank))
        r1, r2 = rank[order], key2[order]
        changed = np.ones(n, dtype=bool)
        changed[1:] = (r1[1:] != r1[:-1]) | (r2[1:] != r2[:-1])
        new = np.empty(n, dtype=np.int64)
        new[order] = np.cumsum(changed) - 1
        rank = new
        if rank[order[-1]] == n - 1:  # all ranks distinct -> done
            break
        k *= 2
    sa = np.empty(n, dtype=np.int64)
    sa[rank] = np.arange(n)
    return sa


def sa_contains(text: bytes, sa: np.ndarray, pattern: bytes) -> bool:
    """True iff ``pattern`` occurs in ``text`` — binary search for the
    lower bound of suffixes >= pattern, then a prefix check."""
    m = len(pattern)
    if m == 0:
        return True
    lo, hi = 0, len(sa)
    while lo < hi:
        mid = (lo + hi) // 2
        s = int(sa[mid])
        if text[s:s + m] < pattern:
            lo = mid + 1
        else:
            hi = mid
    return lo < len(sa) and text[int(sa[lo]):int(sa[lo]) + m] == pattern
