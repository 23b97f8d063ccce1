"""HyperLogLog — the mergeable distinct-count sketch.

Exact COUNT DISTINCT (pipelines/relational.distinct_users_per_day) moves
one row per distinct key through a shuffle; at 10^12 rows with high-
cardinality keys even the distinct pairs are too many.  HLL replaces the
shuffle entirely: every batch folds into a fixed 2^p-byte register
array, partials merge by elementwise max (commutative + idempotent, so
retries and any merge order are safe), and the driver reduces a handful
of tiny register rows.  Standard error ~= 1.04 / sqrt(2^p)  (p=12 ->
~1.6%).

Pure numpy, vectorized; the 64-bit hash is SplitMix64 (public-domain
constant mixing), so results are deterministic across processes and
cluster sizes.
"""

from __future__ import annotations

import numpy as np

_U = np.uint64


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit mix of an int/uint array (SplitMix64)."""
    z = x.astype(np.uint64, copy=True)
    z += _U(0x9E3779B97F4A7C15)
    z = (z ^ (z >> _U(30))) * _U(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> _U(27))) * _U(0x94D049BB133111EB)
    return z ^ (z >> _U(31))


def _clz_suffix(v: np.ndarray, bits: int) -> np.ndarray:
    """Leading-zero count of each value within a ``bits``-wide word,
    vectorized bisection (no numpy clz primitive)."""
    shift = np.zeros(v.shape, dtype=np.uint64)
    # bisection over power-of-two windows -> shift = floor(log2(v))
    for w in [32, 16, 8, 4, 2, 1]:
        if w >= bits:
            continue
        mask = (v >> (shift + _U(w))) > 0
        shift = np.where(mask, shift + _U(w), shift)
    nz = v > 0
    lz = np.where(nz, _U(bits - 1) - shift, _U(bits))
    return lz.astype(np.int64)


def hll_partial(values: np.ndarray, p: int = 12) -> np.ndarray:
    """Fold a value array into a fresh 2^p uint8 register array."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if len(values) == 0:
        return regs
    h = splitmix64(np.asarray(values))
    idx = (h >> _U(64 - p)).astype(np.int64)
    suffix = h & _U((1 << (64 - p)) - 1)
    rank = (_clz_suffix(suffix, 64 - p) + 1).astype(np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def hll_estimate(regs: np.ndarray) -> int:
    """Cardinality estimate with the standard small-range (linear
    counting) correction."""
    m = len(regs)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return int(round(est))


# --- Count-Min — the mergeable frequency sketch -------------------------
#
# Heavy-hitter detection at 10^12 rows must not shuffle one row per
# DISTINCT key just to discover that almost all keys are light.  The CM
# sketch folds every batch into a fixed (depth, width) counter grid;
# partials merge by elementwise ADD (commutative/associative, safe under
# retries only with exactly-once semantics — Ray Data map_batches output
# is consumed once, so partial rows are safe).  Estimates NEVER
# undercount (point query = min over depth rows of non-negative adds),
# so "estimate >= threshold" candidates have zero false negatives; an
# exact second pass over candidates only removes the false positives.
# Cormode & Muthukrishnan, "An improved data stream summary: the
# count-min sketch and its applications" (J. Algorithms 55, 2005).

CM_DEPTH = 4
CM_WIDTH = 4096


def cm_partial(hashes: np.ndarray, counts: np.ndarray,
               depth: int = CM_DEPTH, width: int = CM_WIDTH) -> np.ndarray:
    """Fold (key-hash, count) pairs into a fresh (depth, width) int64
    grid.  Row r uses splitmix64(h + r) so the depth rows are
    independent mixes of the same key."""
    cm = np.zeros((depth, width), dtype=np.int64)
    if len(hashes) == 0:
        return cm
    h = np.asarray(hashes, dtype=np.uint64)
    c = np.asarray(counts, dtype=np.int64)
    for r in range(depth):
        idx = (splitmix64(h + _U(r)) % _U(width)).astype(np.int64)
        np.add.at(cm[r], idx, c)
    return cm


def cm_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return a + b


def cm_query(cm: np.ndarray, hashes: np.ndarray) -> np.ndarray:
    """Upper-bound count estimates for each key hash (vectorized min
    over the depth rows — never below the true count)."""
    h = np.asarray(hashes, dtype=np.uint64)
    depth, width = cm.shape
    est = np.full(len(h), np.iinfo(np.int64).max, dtype=np.int64)
    for r in range(depth):
        idx = (splitmix64(h + _U(r)) % _U(width)).astype(np.int64)
        np.minimum(est, cm[r][idx], out=est)
    return est
