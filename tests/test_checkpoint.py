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
