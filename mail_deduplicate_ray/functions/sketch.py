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
    counting) correction.

    The harmonic sum is computed EXACTLY: every term 2^-reg (reg <= 64)
    is an integer multiple of 2^-64, so sum(2^-reg) = S / 2^64 with
    S = sum(2^(64-reg)) a Python int — no float-summation order
    dependence, which makes the estimate bit-replayable in SQL (the
    approx_distinct_users oracle builds the same S as a HUGEINT).
    Rounding is floor(est + 0.5) for the same reason (SQL round() is
    half-away-from-zero, Python round() half-to-even; floor(+0.5) is
    identical on both sides)."""
    import math
    m = len(regs)
    alpha = 0.7213 / (1 + 1.079 / m)
    counts = np.bincount(regs.astype(np.int64), minlength=65)
    s_int = sum(int(c) << (64 - r) for r, c in enumerate(counts) if c)
    est = alpha * m * m * float(1 << 64) / float(s_int)
    zeros = int(counts[0])
    if est <= 2.5 * m and zeros:
        est = m * math.log(m / zeros)
    return int(math.floor(est + 0.5))


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


# ---------------------------------------------------------------------------
# Bloom filter — the BFF-style (Dolma "bloom filter file") membership sketch
# for incremental exact dedup: mergeable by OR, NO false negatives (a seen
# key always tests positive, so no duplicate ever slips past the screen),
# false positives bounded by (set bits / m)^k and spent on wrongly-dropping
# a unique row — the standard constant-memory dedup trade-off.  At corpus
# scale the filter shards by key hash range (one bloom per range, each
# built from and probed by that range's rows) — the partials here are the
# per-shard unit.

BLOOM_BITS = 1 << 20   # 128 KiB packed; ~10 bits/key at 100k keys -> ~0.8% FP
BLOOM_K = 4


def _bloom_positions(hashes: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(k, n) probe positions via k independent SplitMix64 streams."""
    h = hashes.astype(np.uint64)
    pos = np.empty((k, len(h)), np.uint64)
    for i in range(k):
        h = splitmix64(h + _U(i))
        pos[i] = h % _U(m_bits)
    return pos


def bloom_partial(hashes: np.ndarray, m_bits: int = BLOOM_BITS,
                  k: int = BLOOM_K) -> np.ndarray:
    """Packed uint64 bit array (length m_bits/64) with ``k`` bits set per
    key — merge partials with ``|``."""
    bits = np.zeros(m_bits >> 6, np.uint64)
    if len(hashes):
        for pos in _bloom_positions(hashes, m_bits, k):
            np.bitwise_or.at(bits, (pos >> _U(6)).astype(np.int64),
                             _U(1) << (pos & _U(63)))
    return bits


def bloom_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return a | b


def bloom_contains(bits: np.ndarray, hashes: np.ndarray,
                   k: int = BLOOM_K) -> np.ndarray:
    """Vectorized membership test -> bool mask (True = maybe-seen; False
    is definite)."""
    m_bits = len(bits) << 6
    out = np.ones(len(hashes), bool)
    if len(hashes):
        for pos in _bloom_positions(hashes, m_bits, k):
            word = bits[(pos >> _U(6)).astype(np.int64)]
            out &= (word >> (pos & _U(63))) & _U(1) != 0
    return out


def bloom_fp_rate(bits: np.ndarray) -> float:
    """Current false-positive probability estimate: (fill ratio)^k."""
    ones = int(np.unpackbits(bits.view(np.uint8)).sum())
    return (ones / (len(bits) << 6)) ** BLOOM_K


# ---------------- mergeable quantile summary ----------------
#
# Deterministic block-quantile summary (the uniform-grid member of the
# GK/KLL family): each data block compresses to <= QS_GRID evenly-ranked
# (value, weight) points; summaries merge by concatenation; quantiles of
# the pooled weighted points carry rank error <= N / (2 * QS_GRID)
# (each block's grid misplaces <= n_i/(2*GRID) ranks; errors add).
# Unlike KLL there is NO randomness — output is independent of block
# ORDER (merge commutes; the quantile sorts pooled points by value) at
# the cost
# of a linearly-growing (but tiny: GRID floats per block) merge state;
# the driver fold sees one grid per BLOCK, not per row.

QS_GRID = 128


def qs_partial(values: "np.ndarray") -> "np.ndarray":
    """One block -> (k, 2) [value, weight] summary, k <= QS_GRID.
    Points sit at the midpoints of k equal-mass rank strata (the
    type-1 midpoint rule), each carrying weight n/k."""
    v = np.sort(np.asarray(values, np.float64))
    n = len(v)
    if n == 0:
        return np.empty((0, 2), np.float64)
    if n <= QS_GRID:
        return np.stack([v, np.ones(n)], axis=1)
    idx = ((np.arange(QS_GRID) + 0.5) * n / QS_GRID).astype(np.int64)
    return np.stack([v[idx], np.full(QS_GRID, n / QS_GRID)], axis=1)


def qs_merge(parts: "list[np.ndarray]") -> "np.ndarray":
    """Concatenate block summaries (order-independent by construction —
    the quantile query sorts by value)."""
    parts = [p for p in parts if len(p)]
    if not parts:
        return np.empty((0, 2), np.float64)
    return np.concatenate(parts, axis=0)


def qs_quantile(summary: "np.ndarray", q: float) -> float:
    """Weighted lower-quantile of the pooled summary points (value
    ascending, cumulative weight >= q * total)."""
    if not len(summary):
        return float("nan")
    order = np.argsort(summary[:, 0], kind="stable")
    vals = summary[order, 0]
    wts = summary[order, 1]
    cum = np.cumsum(wts)
    target = q * cum[-1]
    i = int(np.searchsorted(cum, target, side="left"))
    return float(vals[min(i, len(vals) - 1)])
