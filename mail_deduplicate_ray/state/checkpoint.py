"""Per-partition signature/edge checkpoints with config-fingerprint
invalidation — the resumable-execution story (SURVEY.md §4.4).

Mirrors the reference's two cache-invalidation guards (cache.py):
- the **settings fingerprint** (cache.py:103-109): a checkpoint written
  under a different `DedupConfig.fingerprint()` is invisible; stale
  fingerprint dirs are wiped wholesale (≙ _enforce_fingerprint
  cache.py:232-246).
- the **per-row key** (`clip_id` ≙ StaleKey cache.py:64-69): resume is an
  anti-join of the corpus against already-checkpointed keys, so only new
  rows are decoded/hashed (≙ HashCache.lookup cache.py:265-296 +
  Deduplicate.uncached deduplicate.py:869-886).

Writes are atomic (tmp dir + rename) and a failed commit never fails the
run (≙ cache.py:399-416).  Layout::

    root/<fingerprint>/signatures/part-*.parquet
    root/<fingerprint>/edges/part-*.parquet
    root/<fingerprint>/manifest.json        {stage: {rows, wall_s}}

The broadcast anti-join reads only the key column of the checkpoint; at
10^12-row scale swap the broadcast set for a hash-partitioned anti-join
(same API, documented here so the seam is explicit).
"""

from __future__ import annotations

import json
import logging
import shutil
import time
from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data

log = logging.getLogger(__name__)


class CheckpointStore:
    def __init__(self, root: str | Path, fingerprint: str,
                 wipe_stale: bool = True) -> None:
        self.root = Path(root)
        self.fingerprint = fingerprint
        self.dir = self.root / fingerprint
        if wipe_stale and self.root.exists():
            for d in self.root.iterdir():
                if d.is_dir() and d.name != fingerprint:
                    shutil.rmtree(d, ignore_errors=True)  # ≙ cache.py:232-246

    # ---- write side ----

    def write(self, stage: str, ds: "ray.data.Dataset") -> bool:
        """Atomic append-less publish of a stage's rows; returns success.
        A failed commit logs and returns False — never raises."""
        final = self.dir / stage
        tmp = self.dir / f".{stage}.tmp-{int(time.time() * 1e6)}"
        try:
            t0 = time.time()
            ds.write_parquet(str(tmp))
            if final.exists():
                shutil.rmtree(final)
            tmp.rename(final)
            self._update_manifest(stage, {
                "rows": sum(f.metadata.num_rows for f in map(
                    pq.ParquetFile, sorted(final.glob("*.parquet")))),
                "wall_s": round(time.time() - t0, 3),
            })
            return True
        except Exception:  # noqa: BLE001 — ≙ cache.py:399-416
            log.exception("checkpoint commit failed for stage %s", stage)
            shutil.rmtree(tmp, ignore_errors=True)
            return False

    def _update_manifest(self, stage: str, info: dict) -> None:
        mf = self.dir / "manifest.json"
        data = json.loads(mf.read_text()) if mf.exists() else {}
        data[stage] = info
        mf.write_text(json.dumps(data, indent=1))

    # ---- read side ----

    def has(self, stage: str) -> bool:
        return (self.dir / stage).exists()

    def load(self, stage: str) -> "ray.data.Dataset | None":
        if not self.has(stage):
            return None
        return ray.data.read_parquet(str(self.dir / stage))

    def keys(self, stage: str, key: str = "clip_id") -> set:
        """Checkpointed key set (column-pruned read)."""
        if not self.has(stage):
            return set()
        t = pq.read_table(str(self.dir / stage), columns=[key])
        return set(t[key].to_pylist())

    def manifest(self) -> dict:
        mf = self.dir / "manifest.json"
        return json.loads(mf.read_text()) if mf.exists() else {}


def anti_join_keys(ds: "ray.data.Dataset", done_keys: set,
                   key: str = "clip_id") -> "ray.data.Dataset":
    """Rows of ``ds`` whose key is NOT in ``done_keys`` (broadcast anti-join:
    the key set travels via ray.put once, ≙ uncached()
    deduplicate.py:869-886)."""
    if not done_keys:
        return ds
    ref = ray.put(done_keys)

    def f(t: pa.Table) -> pa.Table:
        keys = ray.get(ref)
        mask = [k not in keys for k in t[key].to_pylist()]
        return t.filter(pa.array(mask))

    return ds.map_batches(f, batch_format="pyarrow")


def resumable_signatures(ds: "ray.data.Dataset", cfg, store: CheckpointStore,
                         ) -> "ray.data.Dataset":
    """Signature stage with checkpoint/resume: cached rows are restored
    without decoding (≙ restore_cached deduplicate.py:750-767); only misses
    run the decode+signature actors; the union is re-persisted."""
    from mail_deduplicate_ray.pipelines.neardup import clip_signatures

    done = store.keys("signatures")
    missing = anti_join_keys(ds, done)
    fresh = clip_signatures(missing, cfg)
    cached = store.load("signatures")
    if cached is not None and done:
        cols = cached.schema().names
        out = cached.union(fresh.select_columns(cols))
    else:
        out = fresh
    out = out.materialize()
    store.write("signatures", out)
    return out
