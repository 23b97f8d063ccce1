"""Checkpoint/resume semantics (ref model: tests/test_cache.py — warm ≡
cold output, settings change discards, modified corpus rehashes misses)."""

import shutil
from pathlib import Path

import pytest
import ray.data

from mail_deduplicate_ray import synth
from mail_deduplicate_ray.config import DedupConfig
from mail_deduplicate_ray.state.checkpoint import (CheckpointStore,
                                                   anti_join_keys,
                                                   resumable_signatures)


@pytest.fixture()
def root(tmp_path):
    yield tmp_path / "ckpt"
    shutil.rmtree(tmp_path / "ckpt", ignore_errors=True)


def _clips(n=30):
    tbl, _ = synth.generate_clips(n, seed=7)
    return ray.data.from_arrow(tbl)


def _sig_rows(ds):
    return sorted(r["clip_id"] for r in ds.select_columns(["clip_id"])
                  .take_all())


def test_warm_equals_cold(root):
    cfg = DedupConfig()
    store = CheckpointStore(root, cfg.fingerprint())
    cold = resumable_signatures(_clips(), cfg, store)
    cold_ids = _sig_rows(cold)
    assert store.has("signatures")
    # warm: same corpus, all rows answered by checkpoint
    store2 = CheckpointStore(root, cfg.fingerprint())
    warm = resumable_signatures(_clips(), cfg, store2)
    assert _sig_rows(warm) == cold_ids  # ≙ tests/test_cache.py:77


def test_warm_skips_hashing(root):
    cfg = DedupConfig()
    store = CheckpointStore(root, cfg.fingerprint())
    resumable_signatures(_clips(), cfg, store)
    done = store.keys("signatures")
    # anti-join answers every row -> nothing left to hash
    remaining = anti_join_keys(_clips(), done).count()
    assert remaining == 0  # ≙ tests/test_cache.py:113


def test_partial_resume_hashes_only_misses(root):
    cfg = DedupConfig()
    store = CheckpointStore(root, cfg.fingerprint())
    small = _clips(15)
    resumable_signatures(small, cfg, store)
    n_small = len(store.keys("signatures"))
    big = _clips(30)  # superset (seeded prefix property)
    miss = anti_join_keys(big, store.keys("signatures"))
    assert miss.count() == big.count() - n_small
    out = resumable_signatures(big, cfg, store)
    assert out.count() == big.count()
    assert len(store.keys("signatures")) == big.count()


def test_settings_change_discards(root):
    # ≙ tests/test_cache.py:147 + cache.py:232-246 wholesale wipe
    cfg1 = DedupConfig()
    store1 = CheckpointStore(root, cfg1.fingerprint())
    resumable_signatures(_clips(), cfg1, store1)
    cfg2 = DedupConfig(shingle_k=7)
    assert cfg1.fingerprint() != cfg2.fingerprint()
    store2 = CheckpointStore(root, cfg2.fingerprint())
    assert not store2.has("signatures")  # invisible under new fingerprint
    assert not (Path(root) / cfg1.fingerprint()).exists()  # wiped


def test_failed_commit_never_raises(root, monkeypatch):
    # ≙ cache.py:399-416
    cfg = DedupConfig()
    store = CheckpointStore(root, cfg.fingerprint())
    ds = _clips(5)

    def boom(*a, **k):
        raise OSError("disk full")

    monkeypatch.setattr(ray.data.Dataset, "write_parquet", boom)
    assert store.write("signatures", ds) is False


def test_manifest_records_lineage(root):
    cfg = DedupConfig()
    store = CheckpointStore(root, cfg.fingerprint())
    resumable_signatures(_clips(10), cfg, store)
    mf = store.manifest()
    assert "signatures" in mf and mf["signatures"]["rows"] > 0


def test_resume_appends_only_new_parts(root):
    # resume must write ONLY the fresh rows as a new part; pre-existing
    # part files are never rewritten (O(new rows) resume, not O(corpus))
    import os
    cfg = DedupConfig()
    store = CheckpointStore(root, cfg.fingerprint())
    resumable_signatures(_clips(15), cfg, store)
    sig_dir = Path(root) / cfg.fingerprint() / "signatures"
    old_files = {p: os.stat(p).st_mtime_ns for p in sig_dir.rglob("*.parquet")}
    assert old_files
    big = _clips(30)
    out = resumable_signatures(big, cfg, store)
    assert out.count() == big.count()
    for p, mtime in old_files.items():
        assert os.stat(p).st_mtime_ns == mtime, f"rewrote {p}"
    new_files = set(sig_dir.rglob("*.parquet"))
    assert new_files > set(old_files)  # a fresh part appeared
    # per-partition lineage: one parts_log entry per append, rows add up
    mf = store.manifest()["signatures"]
    assert len(mf["parts_log"]) == mf["parts"] == 2
    assert sum(e["rows"] for e in mf["parts_log"]) == mf["rows"]
    assert mf["parts_log"][0]["rows"] > 0


def test_changed_bytes_rehashed_on_resume(root):
    # same clip_id, different payload bytes -> treated as a miss
    # (≙ StaleKey (size, mtime_ns), ref: cache.py:64-69)
    import pyarrow as pa
    from mail_deduplicate_ray.state.checkpoint import anti_join_table
    cfg = DedupConfig()
    store = CheckpointStore(root, cfg.fingerprint())
    tbl, _ = synth.generate_clips(10, seed=7)
    resumable_signatures(ray.data.from_arrow(tbl), cfg, store)
    # mutate one row's payload (append a byte)
    payloads = tbl["bytes"].to_pylist()
    payloads[0] = payloads[0] + b"\x00"
    tbl2 = tbl.set_column(tbl.schema.get_field_index("bytes"), "bytes",
                          pa.array(payloads, pa.binary()))
    done = store.key_table("signatures", ["clip_id", "n_bytes"])
    probe = ray.data.from_arrow(tbl2).map_batches(
        lambda t: t.append_column(
            "n_bytes",
            pa.compute.cast(pa.compute.binary_length(t["bytes"]),
                            pa.int64())),
        batch_format="pyarrow")
    miss = anti_join_table(probe, done)
    assert miss.count() == 1
    assert miss.take_all()[0]["clip_id"] == tbl["clip_id"][0].as_py()
    # the resumed OUTPUT must carry exactly one row per clip, keyed to
    # the CURRENT bytes — the stale old-bytes row is filtered, not
    # unioned back (round-5 semi-join restore)
    store2 = CheckpointStore(root, cfg.fingerprint())
    out = resumable_signatures(ray.data.from_arrow(tbl2), cfg, store2)
    rows = out.select_columns(["clip_id", "n_bytes"]).take_all()
    assert len(rows) == tbl2.num_rows
    by_id = {r["clip_id"]: r["n_bytes"] for r in rows}
    assert len(by_id) == tbl2.num_rows
    assert by_id[tbl["clip_id"][0].as_py()] == len(payloads[0])


def test_anti_join_shuffle_path_matches_broadcast(root):
    # the hash-partitioned join path must agree with the broadcast path
    import pyarrow as pa
    from mail_deduplicate_ray.state.checkpoint import anti_join_table
    tbl = pa.table({"clip_id": [f"c{i}" for i in range(20)],
                    "n_bytes": pa.array([100 + i for i in range(20)],
                                        pa.int64()),
                    "x": list(range(20))})
    done = tbl.select(["clip_id", "n_bytes"]).slice(0, 12)
    ds = ray.data.from_arrow(tbl)
    a = sorted(r["clip_id"] for r in
               anti_join_table(ds, done).take_all())
    b = sorted(r["clip_id"] for r in
               anti_join_table(ds, done, broadcast_threshold=0,
                               num_partitions=4).take_all())
    assert a == b == [f"c{i}" for i in range(12, 20)]


def test_edge_checkpoint_invalidated_on_channel_change(root):
    # ADVICE: re-running with different channels/thresholds must NOT reuse
    # the stale edge set
    from mail_deduplicate_ray.pipelines import neardup
    cfg = DedupConfig()
    ds = _clips(30)
    res_all = neardup.dedup_clips(ds, cfg, checkpoint_root=str(root))
    n_all = res_all.edges.count()
    res_exact = neardup.dedup_clips(_clips(30), cfg, channels=("exact",),
                                    checkpoint_root=str(root))
    n_exact = res_exact.edges.count()
    assert n_exact < n_all  # recomputed, not reused
    # and thresholds feed the validity key too
    assert cfg.edge_fingerprint(("exact",)) != cfg.edge_fingerprint(
        ("exact", "minhash"))
    assert DedupConfig(jaccard_threshold=0.9).edge_fingerprint(
        ("minhash",)) != cfg.edge_fingerprint(("minhash",))
    # the stretch channel's own bucket cap changes which pairs verify
    assert DedupConfig(stretch_max_bucket=32).edge_fingerprint(
        ("stretch",)) != cfg.edge_fingerprint(("stretch",))


def test_format_version_feeds_fingerprint(monkeypatch):
    # bumping SIG_FORMAT_VERSION must invalidate checkpoints wholesale
    cfg = DedupConfig()
    fp1 = cfg.fingerprint()
    monkeypatch.setattr(DedupConfig, "SIG_FORMAT_VERSION", 99)
    assert DedupConfig().fingerprint() != fp1


def test_partial_resume_invalidates_edge_log(root):
    """A resume that hashes NEW rows must recompute the edge log — the
    for_rows guard (pipelines/neardup.py) — and the recomputed edges must
    link the new duplicates (≙ cache.py staleness: stale content never
    answers from cache)."""
    import pyarrow as pa

    from mail_deduplicate_ray.pipelines import neardup

    tbl, _ = synth.generate_clips(30, seed=7)
    cfg = DedupConfig()
    r1 = neardup.dedup_clips(ray.data.from_arrow(tbl), cfg,
                             checkpoint_root=str(root))
    store = CheckpointStore(root, cfg.fingerprint())
    mf1 = store.manifest()["edges"]
    n1 = r1.stats["mail_found"] if isinstance(r1.stats, dict) \
        else r1.stats.to_dict()["mail_found"]
    assert mf1["for_rows"] == n1

    # grow the corpus: clone an existing clip under a fresh id — an exact
    # duplicate that MUST surface as a new edge after resume
    first = tbl.slice(0, 1)
    clone = first.set_column(
        tbl.schema.get_field_index("clip_id"), "clip_id",
        pa.array(["zz-cloned-row"], pa.string()))
    grown = pa.concat_tables([tbl, clone])
    r2 = neardup.dedup_clips(ray.data.from_arrow(grown), cfg,
                             checkpoint_root=str(root))
    mf2 = CheckpointStore(root, cfg.fingerprint()).manifest()["edges"]
    assert mf2["for_rows"] == n1 + 1  # edge log recomputed, not reused
    touched = {r["src"] for r in r2.edges.take_all()} \
        | {r["dst"] for r in r2.edges.take_all()}
    assert "zz-cloned-row" in touched
    orig = first["clip_id"][0].as_py()
    clusters = {r["clip_id"]: r["cluster_id"]
                for r in r2.settled.select_columns(
                    ["clip_id", "cluster_id"]).take_all()}
    assert clusters["zz-cloned-row"] == clusters[orig]


def test_edge_log_reused_when_nothing_changed(root):
    """Unchanged corpus + config: the second run must ANSWER edges from
    the checkpoint (for_rows and edge_fp both match)."""
    from mail_deduplicate_ray.pipelines import neardup

    tbl, _ = synth.generate_clips(30, seed=7)
    cfg = DedupConfig()
    neardup.dedup_clips(ray.data.from_arrow(tbl), cfg,
                        checkpoint_root=str(root))
    store = CheckpointStore(root, cfg.fingerprint())
    stamp1 = store.manifest()["edges"]
    r2 = neardup.dedup_clips(ray.data.from_arrow(tbl), cfg,
                             checkpoint_root=str(root))
    stamp2 = CheckpointStore(root, cfg.fingerprint()).manifest()["edges"]
    assert stamp2 == stamp1  # untouched -> loaded, not rewritten
    assert r2.stats.to_dict()["mail_found"] == tbl.num_rows


def test_signatures_shared_env_gate(root, monkeypatch):
    """VERDICT r4 item 9: with $MDR_SIG_CKPT_ROOT set, independent
    queries share one signature checkpoint — a flagship-style full run
    populates it, and a SUBSET run (the tiered cascades' tier-3 input)
    restores every hit instead of re-decoding; with the env unset,
    no checkpoint state is created."""
    from mail_deduplicate_ray.pipelines import neardup
    from mail_deduplicate_ray.state.checkpoint import anti_join_keys
    cfg = DedupConfig()

    monkeypatch.delenv("MDR_SIG_CKPT_ROOT", raising=False)
    plain = neardup.signatures_shared(_clips(), cfg)
    ids = _sig_rows(plain)
    assert not root.exists()

    monkeypatch.setenv("MDR_SIG_CKPT_ROOT", str(root))
    full = neardup.signatures_shared(_clips(), cfg)
    assert _sig_rows(full) == ids
    store = CheckpointStore(root, cfg.fingerprint(), wipe_stale=False)
    assert store.has("signatures")
    done = store.keys("signatures")
    # the subset (first 10 base rows) is fully answered by the shared
    # checkpoint -> nothing left to decode
    sub = _clips(10)
    assert anti_join_keys(sub, done).count() == 0
    sub_sigs = neardup.signatures_shared(sub, cfg)
    assert set(_sig_rows(sub_sigs)) <= set(ids)
    assert len(_sig_rows(sub_sigs)) == sub.count()


def test_semi_join_keys_shuffle_path_matches_broadcast(root):
    # the dual of anti_join_table: both paths agree, restored set exact
    import pyarrow as pa
    from mail_deduplicate_ray.state.checkpoint import semi_join_keys
    tbl = pa.table({"clip_id": [f"c{i}" for i in range(20)],
                    "n_bytes": pa.array([100 + i for i in range(20)],
                                        pa.int64()),
                    "x": list(range(20))})
    keys = ray.data.from_arrow(
        tbl.select(["clip_id", "n_bytes"]).slice(0, 12))
    ds = ray.data.from_arrow(tbl)
    a = sorted(r["clip_id"] for r in semi_join_keys(ds, keys).take_all())
    b = sorted(r["clip_id"] for r in
               semi_join_keys(ds, keys, broadcast_threshold=0,
                              num_partitions=4).take_all())
    assert a == b == sorted(f"c{i}" for i in range(12))
    # empty key set -> empty result on both paths
    empty = ray.data.from_arrow(tbl.select(["clip_id", "n_bytes"])
                                .slice(0, 0))
    assert semi_join_keys(ds, empty).count() == 0


def test_labels_checkpoint_reused_and_invalidated(root):
    """Union-find STATE checkpoint (north star: "signature and
    union-find state ... resumable"): an unchanged resume ANSWERS
    cluster labels from the store (same manifest stamp, same clusters);
    a channel change (different edge_fp) recomputes them."""
    from mail_deduplicate_ray.pipelines import neardup

    tbl, _ = synth.generate_clips(30, seed=7)
    cfg = DedupConfig()
    r1 = neardup.dedup_clips(ray.data.from_arrow(tbl), cfg,
                             checkpoint_root=str(root))
    store = CheckpointStore(root, cfg.fingerprint(), wipe_stale=False)
    mf1 = store.manifest()
    assert "labels" in mf1 and mf1["labels"]["edge_fp"] \
        == cfg.edge_fingerprint(tuple(cfg.channels))
    clusters1 = {r["clip_id"]: r["cluster_id"] for r in
                 r1.settled.select_columns(["clip_id", "cluster_id"])
                 .take_all()}

    r2 = neardup.dedup_clips(ray.data.from_arrow(tbl), cfg,
                             checkpoint_root=str(root))
    mf2 = CheckpointStore(root, cfg.fingerprint(),
                          wipe_stale=False).manifest()
    assert mf2["labels"] == mf1["labels"]  # loaded, not rewritten
    clusters2 = {r["clip_id"]: r["cluster_id"] for r in
                 r2.settled.select_columns(["clip_id", "cluster_id"])
                 .take_all()}
    assert clusters2 == clusters1

    # channel change -> different edge_fp -> labels recomputed
    neardup.dedup_clips(ray.data.from_arrow(tbl), cfg,
                        channels=("exact", "minhash"),
                        checkpoint_root=str(root))
    mf3 = CheckpointStore(root, cfg.fingerprint(),
                          wipe_stale=False).manifest()
    assert mf3["labels"]["edge_fp"] \
        == cfg.edge_fingerprint(("exact", "minhash"))
    assert mf3["labels"]["edge_fp"] != mf1["labels"]["edge_fp"]

    # run-metrics lineage: every dedup_clips with a store appends one
    # audit record (config fp, stage times, counters)
    runs = mf3["runs"]["log"]
    assert len(runs) == 3
    assert all(r["config_fp"] == cfg.fingerprint() for r in runs)
    assert runs[-1]["channels"] == ["exact", "minhash"]
    assert runs[0]["stats"]["mail_found"] == tbl.num_rows
