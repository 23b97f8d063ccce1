"""Actions: effects applied to the settled selection (ref: action.py).

Verb x target routing (ref: Action enum action.py:281-339, OPERATIONS
:268-278): the target subset is ``discard`` (keep == False) or
``selection`` (keep == True); verbs re-expressed for immutable columnar
storage:

  copy   (A1 copy_mails action.py:75-91)   -> write target rows as parquet
  move   (A2 move_mails :94-117)           -> write target + tombstone manifest
                                              (columnar stores don't mutate in
                                              place: deletion is a manifest)
  delete (A3 delete_mails :120-136)        -> tombstone manifest only
  dedup-storage (A4 hardlink_mails :139-265) -> discarded rows' payload
         replaced by a reference to the winner's blob; the byte-equality
         gate (:156-192 hardlink_blocker) ≙ equal exact_key unless
         ``allow_differing`` (--hardlink-differing)
  dry-run (A5 action.py:66-72)             -> counters only, no I/O

Outputs land in per-partition parquet directories (resumable layout:
atomic tmp+rename, one dir per action)."""

from __future__ import annotations

import shutil
import time
from dataclasses import dataclass, field
from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from mail_deduplicate_ray.pipelines.neardup import DedupResult


@dataclass
class ActionReport:
    action: str
    target: str
    rows: int
    dry_run: bool
    out_path: str | None = None
    extra: dict = field(default_factory=dict)


def _subset(result: DedupResult, target: str) -> "ray.data.Dataset":
    if target not in ("selection", "discard"):
        raise ValueError(f"bad target {target!r}")  # ref: action.py:303-310
    want = target == "selection"
    return result.settled.map_batches(
        lambda t: t.filter(pc.equal(t["keep"], want)),
        batch_format="pyarrow")


def _atomic_write(ds: "ray.data.Dataset", out_dir: str | Path) -> int:
    out = Path(out_dir)
    tmp = out.parent / f".{out.name}.tmp-{int(time.time() * 1e6)}"
    ds.write_parquet(str(tmp))
    if out.exists():
        shutil.rmtree(out)
    tmp.rename(out)
    import pyarrow.parquet as pq
    return sum(pq.ParquetFile(p).metadata.num_rows
               for p in sorted(out.glob("*.parquet")))


def _append_write(ds: "ray.data.Dataset", out_dir: str | Path) -> int:
    """Append-mode export (≙ create_box(..., append), ref:
    mail_box.py:490-511): new part files land in the EXISTING dataset dir
    under a fresh generation prefix; ``_manifest.json`` records per-
    generation lineage (files + rows).  Underscore-prefixed names are
    ignored by parquet directory readers, so the union reads back with a
    plain ``pq.read_table(dir)``.  The parts are staged to a tmp dir
    first and moved in one pass; the manifest update is atomic
    (tmp + rename), so a torn append leaves at worst orphan parts that
    the next manifest never references."""
    import json

    import pyarrow.parquet as pq
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    tmp = out.parent / f".{out.name}.tmp-{int(time.time() * 1e6)}"
    ds.write_parquet(str(tmp))
    manifest_p = out / "_manifest.json"
    manifest = (json.loads(manifest_p.read_text())
                if manifest_p.exists() else {"generations": []})
    gen = len(manifest["generations"])
    files = []
    rows = 0
    for p in sorted(tmp.glob("*.parquet")):
        name = f"gen{gen:05d}-{p.name}"
        rows += pq.ParquetFile(p).metadata.num_rows
        p.rename(out / name)
        files.append(name)
    shutil.rmtree(tmp)
    manifest["generations"].append({"id": gen, "files": files,
                                    "rows": rows})
    mtmp = out / f"._manifest.tmp-{int(time.time() * 1e6)}"
    mtmp.write_text(json.dumps(manifest, indent=1))
    mtmp.rename(manifest_p)
    return rows


def copy_action(result: DedupResult, target: str, out_dir: str | Path,
                dry_run: bool = False, append: bool = False,
                shards: int | None = None) -> ActionReport:
    """``shards``: write via the RESUMABLE sharded writer instead of the
    atomic whole-directory swap — hive-style ``shard=NNNN/`` dirs keyed
    by hash(clip_id), finished shards skipped on re-run
    (sources/sharded.py; the failed-run-resume story at corpus scale)."""
    sub = _subset(result, target)
    if dry_run:  # counters still produced (ref: action.py:66-72)
        return ActionReport("copy", target, sub.count(), True)
    if shards:
        from mail_deduplicate_ray.sources.sharded import write_sharded
        rep = write_sharded(sub, out_dir, "clip_id", nshards=shards)
        return ActionReport("copy", target, rep["rows_written"], False,
                            str(out_dir),
                            {"shards_written": len(rep["written"]),
                             "shards_skipped": len(rep["skipped"])})
    n = (_append_write if append else _atomic_write)(sub, out_dir)
    return ActionReport("copy", target, n, False, str(out_dir),
                        {"append": append})


def move_action(result: DedupResult, target: str, out_dir: str | Path,
                dry_run: bool = False, append: bool = False) -> ActionReport:
    """copy + tombstones for the moved rows (ref: action.py:94-117 —
    'remove from source' becomes a deletion manifest)."""
    rep = copy_action(result, target, out_dir, dry_run, append)
    tomb = _subset(result, target).select_columns(["clip_id"])
    if not dry_run:
        (_append_write if append else _atomic_write)(
            tomb, Path(out_dir).parent / f"{Path(out_dir).name}.tombstones")
    return ActionReport("move", target, rep.rows, dry_run, rep.out_path,
                        {"tombstones": rep.rows, "append": append})


def delete_action(result: DedupResult, target: str, out_dir: str | Path,
                  dry_run: bool = False) -> ActionReport:
    tomb = _subset(result, target).select_columns(["clip_id"])
    if dry_run:
        return ActionReport("delete", target, tomb.count(), True)
    n = _atomic_write(tomb, out_dir)
    return ActionReport("delete", target, n, False, str(out_dir))


def dedup_storage_action(result: DedupResult, out_dir: str | Path,
                         allow_differing: bool = False,
                         dry_run: bool = False) -> ActionReport:
    """Content-addressed storage dedup (hardlink analogue, A4): each
    discarded row becomes (clip_id, blob_ref=winner_clip_id).  The
    byte-equality gate compares exact keys — only rows whose composite
    content hash equals the winner's may share a blob, unless
    ``allow_differing`` (ref: hardlink_blocker action.py:156-192,
    --hardlink-differing)."""
    discarded = _subset(result, "discard")

    def link(t: pa.Table) -> pa.Table:
        linked = pa.table({
            "clip_id": t["clip_id"],
            "blob_ref": t["winner_clip_id"],
            "exact_key": t["exact_key"],
        })
        return linked

    links = discarded.map_batches(link, batch_format="pyarrow")
    if not allow_differing:
        # gate: the winner shares the blob only when content hashes match;
        # winner's exact_key == discarded's exact_key within exact clusters.
        # Rows linked across near-dup (not byte-identical) boundaries carry
        # differing keys -> blocked (kept as their own blob).
        winners = result.settled.map_batches(
            lambda t: t.filter(t["keep"]).select(["clip_id", "exact_key"]),
            batch_format="pyarrow").map_batches(
            lambda t: pa.table({"winner_clip_id": t["clip_id"],
                                "winner_key": t["exact_key"]}),
            batch_format="pyarrow")
        joined = links.map_batches(
            lambda t: pa.table({"clip_id": t["clip_id"],
                                "blob_ref": t["blob_ref"],
                                "exact_key": t["exact_key"],
                                "winner_clip_id": t["blob_ref"]}),
            batch_format="pyarrow").join(
            winners, "inner", 16, on=("winner_clip_id",),
            right_on=("winner_clip_id",))
        links = joined.map_batches(
            lambda t: t.filter(pc.equal(t["exact_key"], t["winner_key"]))
                       .select(["clip_id", "blob_ref"]),
            batch_format="pyarrow")
    else:
        links = links.select_columns(["clip_id", "blob_ref"])
    if dry_run:
        return ActionReport("dedup_storage", "discard", links.count(), True)
    n = _atomic_write(links, out_dir)
    return ActionReport("dedup_storage", "discard", n, False, str(out_dir))


class _TranscodeStage:
    """Actor-pool stage: decode full PCM -> optional resample -> re-encode
    into the target codec.  Malformed payloads pass through untouched and
    are counted in the `transcoded` column (False) rather than raised —
    the decode stage's resilience contract applied to the write path."""

    def __init__(self, codec: str, target_sr: int | None) -> None:
        from mail_deduplicate_ray import codecs as _codecs
        if codec not in _codecs.ENCODERS:
            raise ValueError(f"unknown target codec {codec!r}")
        self.codec = codec
        self.target_sr = target_sr

    def __call__(self, batch: pa.Table) -> pa.Table:
        from struct import error as struct_error

        from mail_deduplicate_ray import codecs as _codecs
        from mail_deduplicate_ray.functions import audio_dsp

        payloads = batch["bytes"].to_pylist()
        declared = batch["codec"].to_pylist()
        out_bytes, out_sr, out_dur, ok = [], [], [], []
        for data, dec in zip(payloads, declared):
            try:
                if data is None:
                    raise ValueError("null payload")
                pcm, sr = _codecs.decode(data, dec or None)
                if self.target_sr and sr != self.target_sr:
                    pcm = audio_dsp.resample_linear(pcm, sr, self.target_sr)
                    sr = self.target_sr
                out_bytes.append(_codecs.encode(pcm, sr, self.codec))
                out_sr.append(sr)
                out_dur.append(round(len(pcm) * 1000 / sr))
                ok.append(True)
            except (NotImplementedError, ValueError, struct_error):
                out_bytes.append(data)
                out_sr.append(None)
                out_dur.append(None)
                ok.append(False)
        keep = [n for n in batch.column_names
                if n not in ("bytes", "sr_hz", "dur_ms", "codec")]
        t = batch.select(keep)
        sr_fallback = batch["sr_hz"] if "sr_hz" in batch.column_names else None
        dur_fallback = batch["dur_ms"] if "dur_ms" in batch.column_names \
            else None
        sr_arr = pa.array(out_sr, pa.int32())
        dur_arr = pa.array(out_dur, pa.int32())
        if sr_fallback is not None:
            sr_arr = pc.coalesce(sr_arr, pc.cast(sr_fallback, pa.int32()))
        if dur_fallback is not None:
            dur_arr = pc.coalesce(dur_arr, pc.cast(dur_fallback, pa.int32()))
        return (t.append_column("bytes", pa.array(out_bytes, pa.binary()))
                .append_column("sr_hz", sr_arr)
                .append_column("dur_ms", dur_arr)
                .append_column("codec", pa.array(
                    [self.codec if o else (d or "") for o, d in
                     zip(ok, declared)], pa.string()))
                .append_column("transcoded", pa.array(ok)))


def transcode_action(result: DedupResult, source: "ray.data.Dataset",
                     out_dir: str | Path, codec: str = "pcm_s16le",
                     target_sr: int | None = None,
                     dry_run: bool = False) -> ActionReport:
    """Export the kept selection re-encoded to one codec (and optionally
    one sample rate) — the normalize-on-export writer (S7 extended; ref
    export semantics deduplicate.py copy path + the codec registry).
    The payload-bearing ``source`` is semi-joined to the kept clip_ids
    (settled rows are dehydrated — payloads never travel through the
    dedup shuffles), then transcoded in an actor pool and written as
    partitioned parquet."""
    from mail_deduplicate_ray.stages import bucketing
    from mail_deduplicate_ray.stages.joins import semi_anti_join

    kept = result.settled.map_batches(
        lambda t: pa.table({"keep_id": t.filter(t["keep"])["clip_id"]}),
        batch_format="pyarrow")
    sub = semi_anti_join(source, kept, "clip_id", "keep_id")
    _, hi = bucketing.pool_size()
    out = sub.map_batches(
        _TranscodeStage, fn_constructor_args=(codec, target_sr),
        batch_format="pyarrow", batch_size=128,
        concurrency=(max(1, hi // 2), max(1, hi - 1)), num_cpus=1)
    if dry_run:
        n = out.count()
        return ActionReport("transcode", "selection", n, True,
                            extra={"codec": codec, "target_sr": target_sr})
    n = _atomic_write(out, out_dir)
    return ActionReport("transcode", "selection", n, False, str(out_dir),
                        {"codec": codec, "target_sr": target_sr})
