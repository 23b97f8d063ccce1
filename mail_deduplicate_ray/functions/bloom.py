"""Vectorized Bloom filter for join prefiltering.

Double hashing over ``pandas.util.hash_array`` (the same deterministic
vectorized hash the bucketing layer uses): bit index_i = (h1 + i*h2) mod m
with h2 forced odd so the stride covers the table.  No false negatives by
construction — a "definitely absent" verdict is exact, "maybe present"
still needs the exact join (the caller's shuffle verifies).

Everything is numpy-vectorized over uint64 words; a filter is a plain
ndarray, so per-batch partial filters OR-merge trivially and broadcast
once via ray.put.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_MIX1 = np.uint64(0x9E3779B97F4A7C15)
_MIX2 = np.uint64(0xBF58476D1CE4E5B9)
_MIX3 = np.uint64(0x94D049BB133111EB)


def _hashes(values) -> tuple[np.ndarray, np.ndarray]:
    h1 = pd.util.hash_array(np.asarray(values, dtype=object))
    z = h1 + _MIX1
    z = (z ^ (z >> np.uint64(30))) * _MIX2
    z = (z ^ (z >> np.uint64(27))) * _MIX3
    h2 = (z ^ (z >> np.uint64(31))) | np.uint64(1)
    return h1, h2


def empty(m_bits: int) -> np.ndarray:
    if m_bits < 64 or m_bits % 64:
        raise ValueError("m_bits must be a positive multiple of 64")
    return np.zeros(m_bits // 64, dtype=np.uint64)


def add(words: np.ndarray, values, k: int = 7) -> np.ndarray:
    """Set the bits for ``values`` in place (and return ``words``)."""
    m = np.uint64(len(words) * 64)
    h1, h2 = _hashes(values)
    for i in range(k):
        idx = (h1 + np.uint64(i) * h2) % m
        np.bitwise_or.at(words, (idx >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (idx & np.uint64(63)))
    return words


def contains(words: np.ndarray, values, k: int = 7) -> np.ndarray:
    """Boolean mask: True = maybe present, False = DEFINITELY absent."""
    m = np.uint64(len(words) * 64)
    h1, h2 = _hashes(values)
    out = np.ones(len(h1), dtype=bool)
    for i in range(k):
        idx = (h1 + np.uint64(i) * h2) % m
        bit = (words[(idx >> np.uint64(6)).astype(np.int64)]
               >> (idx & np.uint64(63))) & np.uint64(1)
        out &= bit.astype(bool)
    return out
