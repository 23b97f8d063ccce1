"""Table-driven strategy semantics (ref: tests/test_strategy.py:136-386) and
settle-stage cascade/eviction behaviour (ref: tests/test_strategy.py:388-606)."""

import pandas as pd
import pytest

from mail_deduplicate_ray.config import DedupConfig
from mail_deduplicate_ray.stages.settle import make_settle
from mail_deduplicate_ray.stages.strategies import (REGISTRY,
                                                    MissingTimestamps,
                                                    StrategyCtx)


def group(**cols) -> pd.DataFrame:
    n = len(next(iter(cols.values())))
    base = {
        "clip_id": [f"c{i}" for i in range(n)],
        "dur_ms": [1000] * n,
        "sr_hz": [16000] * n,
        "ingest_ts": [float(i) for i in range(n)],
        "transcript_norm": ["same text"] * n,
        "cluster_id": ["c0"] * n,
    }
    base.update(cols)
    return pd.DataFrame(base)


CTX = StrategyCtx(regexp=r"c[12]$", cluster_id="c0")

# (strategy, column overrides, expected keep clip_ids) — ties kept, as in
# the reference's == min/max semantics (strategy.py:72-83 etc.)
CASES = [
    ("select-older", {"ingest_ts": [1.0, 2.0, 3.0, 3.0]}, ["c0", "c1"]),
    ("select-oldest", {"ingest_ts": [1.0, 1.0, 3.0]}, ["c0", "c1"]),
    ("select-newer", {"ingest_ts": [1.0, 2.0, 3.0]}, ["c1", "c2"]),
    ("select-newest", {"ingest_ts": [1.0, 3.0, 3.0]}, ["c1", "c2"]),
    ("select-smaller", {"dur_ms": [100, 200, 300]}, ["c0", "c1"]),
    ("select-smallest", {"dur_ms": [100, 100, 300]}, ["c0", "c1"]),
    ("select-bigger", {"dur_ms": [100, 200, 300]}, ["c1", "c2"]),
    ("select-biggest", {"dur_ms": [100, 300, 300]}, ["c1", "c2"]),
    ("select-matching-path", {"clip_id": ["c0", "c1", "c2", "c3"]}, ["c1", "c2"]),
    ("select-non-matching-path", {"clip_id": ["c0", "c1", "c2", "c3"]},
     ["c0", "c3"]),
    # north-star clip strategies (BASELINE.json north_star winners)
    ("keep-highest-sr", {"sr_hz": [8000, 16000, 16000]}, ["c1", "c2"]),
    ("transcript-regexp",
     {"transcript_norm": ["x c1", "y", "z c2"]}, ["c0", "c2"]),
]


def test_keep_longest_duration_alias():
    from mail_deduplicate_ray.config import canonicalize_strategies
    assert canonicalize_strategies(["keep-longest-duration"]) == (
        "select-biggest",)


@pytest.mark.parametrize("name,cols,expected", CASES,
                         ids=[c[0] for c in CASES])
def test_strategy_semantics(name, cols, expected):
    df = group(**cols)
    mask = REGISTRY[name](df, CTX)
    assert sorted(df.loc[mask, "clip_id"]) == expected


def test_select_one_deterministic_single():
    df = group(ingest_ts=[1.0, 2.0, 3.0])
    m1 = REGISTRY["select-one"](df, CTX)
    m2 = REGISTRY["select-one"](df, CTX)
    assert m1.sum() == 1 and (m1 == m2).all()
    inv = REGISTRY["select-all-but-one"](df, CTX)
    assert (inv == ~m1).all()


def test_missing_timestamps_raises():
    # ref: deduplicate.py:228-248
    df = group(ingest_ts=[1.0, None, 3.0])
    with pytest.raises(MissingTimestamps):
        REGISTRY["select-newest"](df, CTX)


# ---- settle cascade ----

NO_THRESH = dict(size_threshold=-1, content_threshold=-1)


def settle(df, **cfg_over):
    cfg = DedupConfig(**cfg_over)
    return make_settle(cfg)(df).set_index("clip_id")


def test_singleton_unique():
    out = settle(group(ingest_ts=[1.0]))
    assert out.loc["c0", "reason"] == "unique" and out.loc["c0", "keep"]
    assert out.loc["c0", "set_reason"] == "single"


def test_cascade_falls_through_all_and_none():
    # select-newest selects ALL (tie) -> fall through to select-biggest,
    # which is effective (ref: deduplicate.py:456-509)
    df = group(ingest_ts=[5.0, 5.0, 5.0], dur_ms=[100, 200, 200])
    out = settle(df, strategies=("select-newest", "select-biggest"), **NO_THRESH)
    assert list(out.loc[out["keep"], ].index) == ["c1", "c2"]
    assert (out["set_reason"] == "deduplicated").all()
    assert out.loc["c0", "reason"] == "discarded"
    assert out.loc["c0", "winner_clip_id"] == "c1"


def test_cascade_null_ts_falls_to_next():
    # ref: tests/test_mail_integration.py:123-206
    df = group(ingest_ts=[None, None, None], dur_ms=[100, 300, 300])
    out = settle(df, strategies=("select-newest", "select-biggest"), **NO_THRESH)
    assert sorted(out.loc[out["keep"], ].index) == ["c1", "c2"]


def test_cascade_exhausted_skips_set():
    df = group(ingest_ts=[None, None], dur_ms=[100, 100])
    out = settle(df, strategies=("select-newest", "select-biggest"), **NO_THRESH)
    assert out["keep"].all()
    assert (out["reason"] == "skipped").all()
    assert (out["set_reason"] == "skipped_strategies").all()


def test_eviction_outlier():
    # one member 3x duration -> evicted, rest settle normally
    # (ref: tests/test_strategy.py:546-606)
    df = group(dur_ms=[1000, 1000, 3000], ingest_ts=[1.0, 2.0, 3.0])
    out = settle(df, size_threshold=512, content_threshold=-1,
                 strategies=("select-newest",))
    assert out.loc["c2", "reason"] == "evicted" and out.loc["c2", "keep"]
    assert out.loc["c1", "reason"] == "selected"
    assert out.loc["c0", "reason"] == "discarded"


def test_eviction_non_transitive_chain():
    # A~B, B~C ok but A-C offends: greedy evicts the max-degree member.
    # chain durations: 1000, 1400, 1800 with threshold 500:
    # offending pair = (A,C) only -> evict one of them (tie on degree ->
    # min clip_id = A) -> remaining B,C coherent.
    df = group(dur_ms=[1000, 1400, 1800], ingest_ts=[1.0, 2.0, 3.0])
    out = settle(df, size_threshold=500, content_threshold=-1,
                 strategies=("select-newest",))
    assert out.loc["c0", "reason"] == "evicted"
    assert out.loc["c2", "reason"] == "selected"
    assert out.loc["c1", "reason"] == "discarded"


def test_dissimilar_pair_skips_whole_set():
    # <2 rows remain after eviction -> whole set skipped, all kept
    # (ref: deduplicate.py:354-358 caught at :428-431)
    df = group(dur_ms=[1000, 9000], ingest_ts=[1.0, 2.0])
    out = settle(df, size_threshold=500, content_threshold=-1,
                 strategies=("select-newest",))
    assert out["keep"].all()
    assert (out["set_reason"] == "skipped_threshold").all()


def test_offending_matrix_length_prune_parity():
    # the length-delta prune is an EXACT lower bound (every changed line
    # prints in full on its own side, so diff bytes >= the delta of the
    # line-content byte totals): the pruned matrix must equal brute-force
    # difflib over texts spanning equal-length rewrites, small edits,
    # empty transcripts (the stretch-merged hot case) and huge deltas
    import numpy as np
    import pandas as pd

    from difflib import unified_diff

    from mail_deduplicate_ray.config import DedupConfig
    from mail_deduplicate_ray.stages.settle import _offending_matrix

    texts = [
        "",                                    # stretch copy
        "alpha bravo charlie " * 30,           # long base
        "alpha bravo charlie " * 30,           # identical dup
        "alpha bravo charlie " * 29 + "zz ",   # near edit
        "delta echo " * 3,                     # short, different
        "delta echo " * 3 + "\nfox trot",      # multi-line variant
        "x" * 5000,                            # huge single line
    ]
    df = pd.DataFrame({
        "clip_id": [f"c{i}" for i in range(len(texts))],
        "dur_ms": [1000] * len(texts),
        "transcript_norm": texts,
    })
    cfg = DedupConfig(size_threshold=-1, content_threshold=120)
    got = _offending_matrix(df, cfg)

    def brute(a, b):
        return len("".join(unified_diff(
            a.splitlines(), b.splitlines(), n=0))) > 120
    want = np.zeros_like(got)
    for i in range(len(texts)):
        for j in range(len(texts)):
            if i != j:
                want[i, j] = brute(texts[i], texts[j])
    assert (got == want).all()


def test_content_threshold_eviction():
    df = group(transcript_norm=["alpha bravo charlie delta " * 20,
                                "alpha bravo charlie delta " * 20,
                                "totally different words here " * 30],
               ingest_ts=[1.0, 2.0, 3.0])
    out = settle(df, size_threshold=-1, content_threshold=100,
                 strategies=("select-newest",))
    assert out.loc["c2", "reason"] == "evicted"


def test_thresholds_disabled_no_eviction():
    # ref: threshold disable matrix (tests/test_strategy.py:608-645)
    df = group(dur_ms=[100, 9999], ingest_ts=[1.0, 2.0])
    out = settle(df, strategies=("select-newest",), **NO_THRESH)
    assert (out["reason"] != "evicted").all()
    assert out.loc["c1", "reason"] == "selected"


def test_settle_partition_matches_per_cluster_reference():
    # the array-based partition body must match the per-cluster reference
    # implementation exactly (same eviction, cascade, winner, anchors)
    import pandas as pd
    from mail_deduplicate_ray import synth
    from mail_deduplicate_ray.config import DedupConfig
    from mail_deduplicate_ray.stages.decode import DecodeStage
    from mail_deduplicate_ray.stages.signature import SignatureStage
    from mail_deduplicate_ray.stages.settle import (make_settle,
                                                    make_settle_partition)
    tbl, truth = synth.generate_clips(150, seed=1)
    cfg = DedupConfig()
    sig = SignatureStage(cfg)(DecodeStage(cfg)(tbl))
    df = sig.select(["clip_id", "sr_hz", "dur_ms", "codec", "codec_norm",
                     "transcript_norm", "exact_key", "audio_fp"]).to_pandas()
    df["ingest_ts"] = 1e9
    df["cluster_id"] = [truth["clusters"].get(c, c) for c in df["clip_id"]]
    out = make_settle_partition(cfg)(df)
    settle = make_settle(cfg)
    multi = df[df.groupby("cluster_id")["cluster_id"].transform("size") > 1]
    ref = pd.concat([settle(g) for _, g in
                     multi.groupby("cluster_id", sort=True)],
                    ignore_index=True).sort_values("clip_id",
                                                   ignore_index=True)
    got = out[out["set_reason"] != "single"].sort_values(
        "clip_id", ignore_index=True)
    cols = ["clip_id", "keep", "reason", "set_reason", "winner_clip_id",
            "threshold_checked", "set_anchor"]
    pd.testing.assert_frame_equal(ref[cols], got[cols])
