"""End-to-end pipeline tests over the planted corpus (SURVEY.md §5: the
reference asserts exact surviving box contents; we assert exact cluster
partitions, recall vs planted ground truth, and the stats invariants)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from mail_deduplicate_ray.config import DedupConfig
from mail_deduplicate_ray.pipelines import neardup
from mail_deduplicate_ray.stages import candidates, components


@pytest.fixture(scope="module")
def result(small_corpus):
    tbl, _ = small_corpus
    ds = ray.data.from_arrow(tbl)
    return neardup.dedup_clips(ds, DedupConfig())


def _pred_clusters(res) -> dict[str, str]:
    pred = {}
    for b in res.settled.iter_batches(batch_format="pyarrow"):
        for cid, cl in zip(b["clip_id"].to_pylist(),
                           b["cluster_id"].to_pylist()):
            pred[cid] = cl
    return pred


def test_recall_against_planted_truth(small_corpus, result):
    # BASELINE.json: dup-pair recall >= 0.99 at the same signature config
    _, truth = small_corpus
    pred = _pred_clusters(result)
    hits = sum(1 for a, b in truth["recall_pairs"]
               if pred.get(a) is not None and pred.get(a) == pred.get(b))
    recall = hits / len(truth["recall_pairs"])
    assert recall >= 0.99, f"recall {recall}"


def test_clusters_match_truth_closure(small_corpus, result):
    # predicted partition must refine to the truth closure: every truth
    # cluster fully merged, no truth-crossing merges of planted rows
    _, truth = small_corpus
    pred = _pred_clusters(result)
    truth_of = truth["clusters"]
    for a, ca in truth_of.items():
        for b, cb in truth_of.items():
            if ca == cb:
                assert pred[a] == pred[b], (a, b)


def test_stats_invariants(result):
    # ref: check_stats deduplicate.py:1319-1398
    result.stats.check()
    d = result.stats.to_dict()
    assert d["mail_found"] > 0
    assert d["set_total"] == d["set_single"] + d.get("set_skipped_threshold", 0) \
        + d.get("set_skipped_strategies", 0) + d["set_deduplicated"]


def test_rejection_accounting(small_corpus, result):
    # sparse-metadata rows must be rejected, not clustered
    tbl, _ = small_corpus
    sparse = [cid for cid, sr in zip(tbl["clip_id"].to_pylist(),
                                     tbl["sr_hz"].to_pylist()) if sr is None]
    pred = _pred_clusters(result)
    for cid in sparse:
        assert cid not in pred
    rej = {r["clip_id"] for r in
           result.rejected.select_columns(["clip_id"]).take_all()}
    assert set(sparse) <= rej


def test_keep_table_drops_only_discarded(result):
    kept = neardup.keep_table(result).count()
    d = result.stats.to_dict()
    assert kept == d["mail_retained"] - d["mail_discarded"]


def test_no_overflow_on_small_corpus(result):
    assert result.overflow_dropped == 0


def test_exact_only_channel_groups_whitespace_variants(small_corpus):
    # whitespace-perturbed transcripts share the normalized exact key
    # (ref: CRLF vs LF duplicates, tests/test_mail_integration.py:334)
    tbl, truth = small_corpus
    ds = ray.data.from_arrow(tbl)
    res = neardup.dedup_clips(ds, DedupConfig(), channels=("exact",))
    pred = _pred_clusters(res)
    ws_pairs = [(a, b) for a, b, k in truth["pairs"] if k == "whitespace"]
    assert ws_pairs
    for a, b in ws_pairs:
        assert pred[a] == pred[b]


def test_contained_channel_finds_substring_pairs(small_corpus):
    tbl, truth = small_corpus
    ds = ray.data.from_arrow(tbl)
    res = neardup.dedup_clips(ds, DedupConfig(), channels=("containment",))
    pred = _pred_clusters(res)
    pairs = [(a, b) for a, b, k in truth["pairs"] if k == "contained"]
    assert pairs
    hits = sum(pred[a] == pred[b] for a, b in pairs)
    assert hits / len(pairs) >= 0.99


@pytest.mark.parametrize("driver_threshold", [2_000_000, 0],
                         ids=["driver-uf", "distributed"])
def test_connected_components_chain(driver_threshold):
    # a path graph exercises multi-round propagation; both the driver
    # union-find fast path and the distributed label propagation must
    # produce identical min-label output
    edges = ray.data.from_items(
        [{"src": f"n{i}", "dst": f"n{i+1}"} for i in range(6)])
    labels = components.connected_components(
        edges, driver_threshold=driver_threshold)
    got = {r["node"]: r["label"] for r in labels.take_all()}
    assert all(v == "n0" for v in got.values())
    assert len(got) == 7


@pytest.mark.parametrize("driver_threshold", [2_000_000, 0],
                         ids=["driver-uf", "distributed"])
def test_connected_components_two_components(driver_threshold):
    edges = ray.data.from_items([
        {"src": "a", "dst": "b"}, {"src": "b", "dst": "c"},
        {"src": "x", "dst": "y"},
    ])
    labels = components.connected_components(
        edges, driver_threshold=driver_threshold)
    got = {r["node"]: r["label"] for r in labels.take_all()}
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_bucket_cap_reports_overflow():
    import pandas as pd
    cfg = DedupConfig(max_bucket=4)
    n = 10
    sig = np.arange(128, dtype=np.uint8)
    grp = pd.DataFrame({
        "clip_id": [f"c{i}" for i in range(n)],
        "minhash_sig8": [sig.tobytes()] * n,
        "ek64": np.arange(1, n + 1, dtype=np.uint64),  # not all-identical
        "bucket": np.full(n, 1, dtype=np.uint64),
    })
    out = candidates._minhash_partition(grp, cfg)
    drop_rows = out[out["src"] == ""]
    assert len(drop_rows) == 1
    assert drop_rows["dropped"].iloc[0] == 6
    # capped members still produce spanning edges among themselves
    assert (out["src"] != "").sum() == 3
