"""Parallelism-independence: the pipeline's output is keyed, never
arrival-ordered (≙ tests/test_cli.py:127-159 parallel ≡ sequential)."""

import pyarrow.compute as pc
import pytest
import ray.data

from mail_deduplicate_ray.config import DedupConfig
from mail_deduplicate_ray.pipelines import neardup


def _outcome(res) -> dict:
    out = {}
    for b in res.settled.iter_batches(batch_format="pyarrow"):
        for cid, cl, keep, reason in zip(b["clip_id"].to_pylist(),
                                         b["cluster_id"].to_pylist(),
                                         b["keep"].to_pylist(),
                                         b["reason"].to_pylist()):
            out[cid] = (cl, keep, reason)
    return out


@pytest.mark.parametrize("blocks", [2, 16])
def test_same_output_at_any_block_split(small_corpus, blocks):
    # different block layouts = different batch boundaries, task order and
    # shuffle fan-in; cluster ids, keep flags and reasons must be identical
    tbl, _ = small_corpus
    ds = ray.data.from_arrow(tbl).repartition(blocks)
    res = neardup.dedup_clips(ds, DedupConfig())
    base = ray.data.from_arrow(tbl)
    ref = neardup.dedup_clips(base, DedupConfig())
    assert _outcome(res) == _outcome(ref)


def test_edge_checkpoint_resume_identical(small_corpus, tmp_path):
    tbl, _ = small_corpus
    cfg = DedupConfig()
    a = neardup.dedup_clips(ray.data.from_arrow(tbl), cfg,
                            checkpoint_root=str(tmp_path))
    # second run answers signatures AND edges from the checkpoint
    b = neardup.dedup_clips(ray.data.from_arrow(tbl), cfg,
                            checkpoint_root=str(tmp_path))
    assert _outcome(a) == _outcome(b)
    assert a.stats.to_dict() == b.stats.to_dict()
