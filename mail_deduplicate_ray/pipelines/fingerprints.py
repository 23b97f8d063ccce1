"""Shared fingerprint near-dup primitive: EXACT Hamming-radius pairs.

One reusable pipeline op for every 64-bit perceptual/sketch fingerprint
(doc SimHash, image dHash, video pooled-embedding SRP): pigeonhole
banding — the fingerprint splits into ``max_hamming + 1`` disjoint
blocks, so any pair within the radius agrees on at least one whole block
and meets in that block's bucket (recall 1.0 by construction) — then a
bucketed exact-Hamming verify and a pair dedup.  The
simhash_neardup_pairs idiom (pipelines/docs.py), factored out once the
third consumer appeared.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from mail_deduplicate_ray.functions import simhash
from mail_deduplicate_ray.stages import bucketing


def exact_hamming_pairs(ds: "ray.data.Dataset", id_col: str, fp_col: str,
                        max_hamming: int = 3) -> "ray.data.Dataset":
    """(a_id, b_id) string pairs with Hamming(fp_a, fp_b) <= max_hamming —
    exact, via pigeonhole banding.  ``ds`` needs a string id column and a
    uint64 fingerprint column; rows with the same id are assumed unique."""
    nb = max_hamming + 1
    if 64 % nb:
        raise ValueError("max_hamming + 1 must divide 64")

    def explode(t: pa.Table) -> pa.Table:
        fp = t[fp_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        bands = simhash.band_keys_u64(fp, bands=nb)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        return pa.table({
            "band": pa.array(bands.ravel(), pa.uint64()),
            "id": pa.array(np.repeat(ids, nb), pa.string()),
            "fp": pa.array(np.repeat(fp, nb), pa.uint64()),
        })

    rows = ds.map_batches(explode, batch_format="pyarrow")

    def verify(df) -> pa.Table:
        ids_all = df["id"].to_numpy()
        fp_all = df["fp"].to_numpy().astype(np.uint64)
        bands = df["band"].to_numpy().astype(np.uint64)
        order = np.lexsort((ids_all, bands))
        b_sorted = bands[order]
        bounds = np.flatnonzero(np.concatenate(
            ([True], b_sorted[1:] != b_sorted[:-1], [True])))
        a_out, b_out = [], []
        for s, e in zip(bounds[:-1], bounds[1:]):
            if e - s < 2:
                continue
            idx = order[s:e]
            fp = fp_all[idx]
            ids = ids_all[idx]
            i, j = np.triu_indices(len(idx), 1)
            ok = simhash.hamming(fp[i], fp[j]) <= max_hamming
            if ok.any():
                a_out.append(ids[i[ok]])
                b_out.append(ids[j[ok]])
        a = np.concatenate(a_out) if a_out else np.empty(0, object)
        b = np.concatenate(b_out) if b_out else np.empty(0, object)
        lo = np.minimum(a, b)
        hi = np.maximum(a, b)
        return pa.table({"a_id": pa.array(lo, pa.string()),
                         "b_id": pa.array(hi, pa.string())})

    cand = bucketing.grouped(rows, "band", verify, batch_format="pandas")
    return bucketing.grouped(
        cand, "a_id",
        lambda df: df.drop_duplicates(subset=["a_id", "b_id"]),
        nbuckets=16)
