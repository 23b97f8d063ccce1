"""Batched MinHash signatures + LSH band keys + bottom-k containment sketches.

Vectorized over a whole batch of documents via ``np.minimum.reduceat`` on the
flattened shingle array (no per-row Python in the permutation math).  The
permutation family is the classic (a*x + b) mod p with p = 2^61 - 1.

LSH banding: ``num_perm`` components split into ``bands`` bands of ``r``
rows; each band's slice is folded to one uint64 bucket key.  Two docs with
Jaccard j collide in >=1 band with prob 1-(1-j^r)^b (b=16, r=8: j=0.8 ->
0.93, j=0.9 -> 0.999+).  Candidate recall is topped up by the exact-key
path (identical normalized transcripts always collide there).

Containment (for "contained transcript" pairs whose Jaccard is below the
LSH threshold — BASELINE.json: suffix-array exact-substring analogue): each
doc also emits ``anchors`` = its m smallest shingle hashes.  If B's text is
a substring of A covering fraction f of A's shingles, each of A's m minima
lands in B with prob ~f, so sharing >=1 anchor has prob ~1-(1-f)^m (f=0.6,
m=8: 0.9997).  Verification estimates containment from bottom-k sketches
(Broder-style) using the true shingle-set sizes carried per row.
"""

from __future__ import annotations

import numpy as np

_P = np.uint64((1 << 61) - 1)


class MinHasher:
    """Stateful hasher: permutation matrix built once (actor-pool state,
    ref analogue: deduplicate.py:529-541 _WORKER initializer)."""

    def __init__(self, num_perm: int, seed: int, bands: int,
                 anchors: int = 8, bottomk: int = 64) -> None:
        rng = np.random.default_rng(seed)
        self.num_perm = num_perm
        self.bands = bands
        self.r = num_perm // bands
        self.anchors = anchors
        self.bottomk = bottomk
        # multiply-add mod 2^64 with odd multiplier: a bijection on uint64,
        # ~3x faster than (a*x+b) mod (2^61-1) — no SIMD-hostile modulo.
        self.a = (rng.integers(1, np.iinfo(np.uint64).max, num_perm,
                               dtype=np.uint64) | np.uint64(1))
        self.b = rng.integers(0, np.iinfo(np.uint64).max, num_perm,
                              dtype=np.uint64)
        # per-band fold weights (odd -> bijective mod 2^64)
        self.band_w = rng.integers(1, np.iinfo(np.uint64).max,
                                   (bands, self.r), dtype=np.uint64) | np.uint64(1)

    def signatures(self, flat: np.ndarray, offsets: np.ndarray) -> np.ndarray:
        """(n_docs, num_perm) uint64 signature matrix from flattened shingles.

        Empty docs get all-max signatures (never collide).
        """
        n = len(offsets) - 1
        sig = np.full((n, self.num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
        if len(flat) == 0:
            return sig
        nonempty = np.flatnonzero(np.diff(offsets) > 0)
        starts = offsets[nonempty]
        # cache-resident tiling: both the shingle axis (docs grouped into
        # <=SH_TILE-shingle runs) and the perm axis (32-wide) are tiled so
        # temps stay ~1 MB — DRAM bandwidth, not cores, is the scaling
        # limit for big temps when 32 workers run side by side.
        SH_TILE = 4096
        PERM_TILE = 32
        ends = offsets[nonempty + 1]
        d0 = 0
        nd = len(nonempty)
        while d0 < nd:
            limit = starts[d0] + SH_TILE
            d1 = d0 + 1
            while d1 < nd and ends[d1] <= limit:
                d1 += 1
            lo, hi = starts[d0], ends[d1 - 1]
            x = flat[lo:hi]
            seg_starts = starts[d0:d1] - lo
            rows = nonempty[d0:d1]
            for c0 in range(0, self.num_perm, PERM_TILE):
                c1 = min(self.num_perm, c0 + PERM_TILE)
                h = x[:, None] * self.a[c0:c1][None, :] \
                    + self.b[c0:c1][None, :]
                sig[rows, c0:c1] = np.minimum.reduceat(h, seg_starts, axis=0)
            d0 = d1
        return sig

    def band_keys(self, sig: np.ndarray) -> np.ndarray:
        """(n_docs, bands) uint64 bucket keys; band index mixed into high bits
        so buckets never collide across bands."""
        n = sig.shape[0]
        v = sig.reshape(n, self.bands, self.r)
        folded = np.bitwise_xor.reduce(v * self.band_w[None, :, :], axis=2)
        band_tag = (np.arange(self.bands, dtype=np.uint64) << np.uint64(58))
        return (folded >> np.uint64(6)) ^ band_tag[None, :]

    def bottom_anchors(self, flat: np.ndarray,
                       offsets: np.ndarray) -> list[np.ndarray]:
        """Per-doc m smallest hashes via np.partition (no full sort)."""
        out: list[np.ndarray] = []
        m = self.anchors
        for i in range(len(offsets) - 1):
            seg = flat[offsets[i]:offsets[i + 1]]
            if len(seg) <= m:
                out.append(np.sort(seg))
            else:
                out.append(np.sort(np.partition(seg, m - 1)[:m]))
        return out

    def anchors_and_sketch(self, flat: np.ndarray, offsets: np.ndarray,
                           ) -> tuple[list[np.ndarray], list[np.ndarray], np.ndarray]:
        """Per-doc (anchor hashes, bottom-k sketch, true set size)."""
        n = len(offsets) - 1
        anchors: list[np.ndarray] = []
        sketches: list[np.ndarray] = []
        sizes = np.zeros(n, dtype=np.int64)
        for i in range(n):
            s = np.sort(flat[offsets[i]:offsets[i + 1]])
            sizes[i] = len(s)
            anchors.append(s[: self.anchors].copy())
            sketches.append(s[: self.bottomk].copy())
        return anchors, sketches, sizes


def est_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    return float(np.mean(sig_a == sig_b))


def est_jaccard_matrix(sigs: np.ndarray) -> np.ndarray:
    """All-pairs estimated Jaccard for a small group: (m, m) float."""
    eq = sigs[:, None, :] == sigs[None, :, :]
    return eq.mean(axis=2)


def est_containment(sketch_a: np.ndarray, size_a: int,
                    sketch_b: np.ndarray, size_b: int, k: int) -> float:
    """Estimated containment of the SMALLER set in the larger, from bottom-k
    sketches (Broder): j_est = |bottomk(A∪B) ∩ A ∩ B| / k, then
    |A∩B| ≈ j·(|A|+|B|)/(1+j); containment = |A∩B| / min(|A|,|B|)."""
    if size_a == 0 or size_b == 0:
        return 0.0
    union = np.union1d(sketch_a, sketch_b)[:k]
    inter = np.intersect1d(sketch_a, sketch_b, assume_unique=True)
    shared = np.isin(union, inter, assume_unique=True).sum()
    denom = min(len(union), k)
    if denom == 0:
        return 0.0
    j = shared / denom
    if j >= 1.0:
        return 1.0
    est_inter = j * (size_a + size_b) / (1.0 + j)
    return float(min(1.0, est_inter / min(size_a, size_b)))
