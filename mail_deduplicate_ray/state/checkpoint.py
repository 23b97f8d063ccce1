"""Per-partition signature/edge checkpoints with config-fingerprint
invalidation — the resumable-execution story (SURVEY.md §4.4).

Mirrors the reference's two cache-invalidation guards (cache.py):
- the **settings fingerprint** (cache.py:103-109): a checkpoint written
  under a different `DedupConfig.fingerprint()` is invisible; stale
  fingerprint dirs are wiped wholesale (≙ _enforce_fingerprint
  cache.py:232-246).  Edge checkpoints carry an additional
  `edge_fingerprint` covering channels + verification thresholds.
- the **per-row key** ((clip_id, n_bytes) ≙ StaleKey's (size, mtime_ns),
  cache.py:64-69): resume is an anti-join of the corpus against
  already-checkpointed keys, so only new-or-changed rows are
  decoded/hashed (≙ HashCache.lookup cache.py:265-296 + Deduplicate
  .uncached deduplicate.py:869-886).

Resume is APPEND-ONLY: each resume writes the freshly-hashed rows as a
new `part-*` directory under the stage; existing part files are never
rewritten (at 10^12-row scale a resume costs O(new rows), not O(corpus)).
The anti-join is two-path like every small-side lookup in the engine:
broadcast key-set up to ``broadcast_threshold`` keys, hash-partitioned
``Dataset.join`` beyond it.

Writes are atomic (tmp dir + rename) and a failed commit never fails the
run (≙ cache.py:399-416).  Layout::

    root/<fingerprint>/signatures/part-000-<us>/*.parquet
    root/<fingerprint>/signatures/part-001-<us>/*.parquet   (resume delta)
    root/<fingerprint>/edges/*.parquet                      (full replace)
    root/<fingerprint>/manifest.json    {stage: {rows, wall_s, ...}}
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
        """Atomic full-replace publish of a stage's rows; returns success.
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
                "rows": _dir_rows(final),
                "wall_s": round(time.time() - t0, 3),
            })
            return True
        except Exception:  # noqa: BLE001 — ≙ cache.py:399-416
            log.exception("checkpoint commit failed for stage %s", stage)
            shutil.rmtree(tmp, ignore_errors=True)
            return False

    def append(self, stage: str, ds: "ray.data.Dataset") -> bool:
        """Atomic append of a new part directory under ``stage`` — existing
        part files are untouched (resume cost is O(new rows)).  Returns
        success; a failed commit logs and returns False."""
        final = self.dir / stage
        tmp = self.dir / f".{stage}.tmp-{int(time.time() * 1e6)}"
        try:
            t0 = time.time()
            ds.write_parquet(str(tmp))
            final.mkdir(parents=True, exist_ok=True)
            n_parts = len(list(final.glob("part-*")))
            part = final / f"part-{n_parts:03d}-{int(time.time() * 1e6)}"
            tmp.rename(part)
            info = self.manifest().get(stage, {})
            part_rows = _dir_rows(part)
            # per-partition lineage: each append is one resumable unit —
            # the log records what each part added and when, so a resumed
            # run (and the operator reading the manifest) can account for
            # every row without rescanning the parquet
            self._update_manifest(stage, {
                **info,
                "rows": int(info.get("rows", 0)) + part_rows,
                "parts": n_parts + 1,
                "wall_s": round(time.time() - t0, 3),
                "parts_log": list(info.get("parts_log", [])) + [{
                    "part": part.name,
                    "rows": part_rows,
                    "wall_s": round(time.time() - t0, 3),
                }],
            })
            return True
        except Exception:  # noqa: BLE001
            log.exception("checkpoint append failed for stage %s", stage)
            shutil.rmtree(tmp, ignore_errors=True)
            return False

    def _update_manifest(self, stage: str, info: dict) -> None:
        mf = self.dir / "manifest.json"
        data = json.loads(mf.read_text()) if mf.exists() else {}
        data[stage] = info
        mf.write_text(json.dumps(data, indent=1))

    # ---- read side ----

    def has(self, stage: str) -> bool:
        d = self.dir / stage
        return d.exists() and any(d.rglob("*.parquet"))

    def load(self, stage: str) -> "ray.data.Dataset | None":
        if not self.has(stage):
            return None
        files = sorted(str(p) for p in (self.dir / stage).rglob("*.parquet"))
        return ray.data.read_parquet(files)

    def keys(self, stage: str, key: str = "clip_id") -> set:
        """Checkpointed single-column key set (column-pruned read)."""
        t = self.key_table(stage, [key])
        return set() if t is None else set(t[key].to_pylist())

    def key_table(self, stage: str,
                  columns: list[str]) -> "pa.Table | None":
        """Checkpointed key columns as one Arrow table (column-pruned
        read); None when the stage is absent."""
        if not self.has(stage):
            return None
        files = sorted((self.dir / stage).rglob("*.parquet"))
        return pa.concat_tables(
            [pq.read_table(str(f), columns=columns) for f in files])

    def manifest(self) -> dict:
        mf = self.dir / "manifest.json"
        return json.loads(mf.read_text()) if mf.exists() else {}


def _dir_rows(d: Path) -> int:
    return sum(pq.ParquetFile(f).metadata.num_rows
               for f in sorted(d.rglob("*.parquet")))


_SEP = "\x00"


def anti_join_keys(ds: "ray.data.Dataset", done_keys: set,
                   key: str = "clip_id") -> "ray.data.Dataset":
    """Rows of ``ds`` whose key is NOT in ``done_keys`` (broadcast
    anti-join: the key set travels via ray.put once, ≙ uncached()
    deduplicate.py:869-886)."""
    if not done_keys:
        return ds
    ref = ray.put(done_keys)

    def f(t: pa.Table) -> pa.Table:
        import pandas as pd
        keys = ray.get(ref)
        mask = ~pd.Series(t[key].to_pylist()).isin(keys)
        return t.filter(pa.array(mask.to_numpy()))

    return ds.map_batches(f, batch_format="pyarrow")


def anti_join_table(ds: "ray.data.Dataset", done: "pa.Table | None",
                    keys: tuple[str, ...] = ("clip_id", "n_bytes"),
                    broadcast_threshold: int = 5_000_000,
                    num_partitions: int = 32) -> "ray.data.Dataset":
    """Rows of ``ds`` whose composite key is NOT present in ``done``.

    Two paths (the engine-wide small-side idiom): up to
    ``broadcast_threshold`` done-keys travel once via ``ray.put`` and each
    batch filters with a vectorized isin; beyond that a hash-partitioned
    ``Dataset.join`` (left_outer + null-marker filter) keeps everything
    off the driver."""
    if done is None or done.num_rows == 0:
        return ds

    if done.num_rows <= broadcast_threshold:
        done_set = set(zip(*(done[k].to_pylist() for k in keys)))
        ref = ray.put(done_set)

        def f(t: pa.Table) -> pa.Table:
            import pandas as pd
            s = ray.get(ref)
            probe = pd.Series(list(zip(*(t[k].to_pylist() for k in keys))))
            return t.filter(pa.array((~probe.isin(s)).to_numpy()))

        return ds.map_batches(f, batch_format="pyarrow")

    marker = ray.data.from_arrow(
        done.append_column("__done", pa.array([1] * done.num_rows,
                                              pa.int8())))
    joined = ds.join(marker, "left_outer", num_partitions,
                     on=keys, right_on=keys)

    def keep_missing(t: pa.Table) -> pa.Table:
        out = t.filter(pc.is_null(t["__done"]))
        return out.drop_columns(["__done"])

    return joined.map_batches(keep_missing, batch_format="pyarrow")


def semi_join_keys(ds: "ray.data.Dataset", keys_ds: "ray.data.Dataset",
                   keys: tuple[str, ...] = ("clip_id", "n_bytes"),
                   broadcast_threshold: int = 5_000_000,
                   num_partitions: int = 32) -> "ray.data.Dataset":
    """Rows of ``ds`` whose composite key IS present in ``keys_ds`` —
    the dual of :func:`anti_join_table`, same two-path small-side idiom
    (broadcast isin under the threshold, hash-partitioned join beyond)."""
    n = keys_ds.count()
    if n == 0:
        return ds.limit(0)
    if n <= broadcast_threshold:
        parts = [b.select(list(keys)) for b in
                 keys_ds.iter_batches(batch_format="pyarrow")]
        kt = pa.concat_tables(parts)
        kset = set(zip(*(kt[k].to_pylist() for k in keys)))
        ref = ray.put(kset)

        def f(t: pa.Table) -> pa.Table:
            import pandas as pd
            s = ray.get(ref)
            probe = pd.Series(list(zip(*(t[k].to_pylist() for k in keys))))
            return t.filter(pa.array(probe.isin(s).to_numpy()))

        return ds.map_batches(f, batch_format="pyarrow")

    marker = keys_ds.map_batches(
        lambda t: t.select(list(keys)).append_column(
            "__keep", pa.array([1] * t.num_rows, pa.int8())),
        batch_format="pyarrow")
    joined = ds.join(marker, "left_outer", num_partitions,
                     on=tuple(keys), right_on=tuple(keys))
    return joined.map_batches(
        lambda t: t.filter(pc.is_valid(t["__keep"]))
                   .drop_columns(["__keep"]),
        batch_format="pyarrow")


def resumable_signatures(ds: "ray.data.Dataset", cfg, store: CheckpointStore,
                         ) -> "ray.data.Dataset":
    """Signature stage with checkpoint/resume: cached rows are restored
    without decoding (≙ restore_cached deduplicate.py:750-767); only
    misses run the decode+signature actors, and only the fresh rows are
    written — as a new append-only part (existing parts untouched).

    Restored rows are SEMI-JOINED against the input's (clip_id,
    n_bytes) key set, so the output covers exactly the rows asked for:
    a SUBSET run (the shared-checkpoint path, neardup.signatures_shared)
    does not resurrect rows outside its input, and a changed-bytes
    resume does not return the stale old-bytes row alongside the fresh
    one (both were latent with the old unconditional
    ``cached.union(fresh)``)."""
    from mail_deduplicate_ray.pipelines.neardup import clip_signatures

    def with_nbytes(t: pa.Table) -> pa.Table:
        if "n_bytes" in t.column_names:
            return t
        return t.append_column(
            "n_bytes", pc.cast(pc.binary_length(t["bytes"]), pa.int64()))

    probe = ds.map_batches(with_nbytes, batch_format="pyarrow")
    done = store.key_table("signatures", ["clip_id", "n_bytes"])
    cached = store.load("signatures")
    missing = anti_join_table(probe, done)
    fresh = clip_signatures(missing, cfg).materialize()
    if fresh.count() > 0:
        store.append("signatures", fresh)
    if cached is None:
        return fresh
    hits = semi_join_keys(
        cached, probe.select_columns(["clip_id", "n_bytes"]))
    if fresh.count() == 0:
        return hits
    cols = cached.schema().names
    return hits.union(fresh.select_columns(cols))
