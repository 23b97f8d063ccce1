"""Settle stage: per-cluster thresholds + greedy eviction + strategy cascade.

``groupby(cluster_id).map_groups(settle)`` — SURVEY.md §4.3 shuffle #2.
Faithful to the reference's DuplicateSet.select flow (deduplicate.py:409-509):

1. size-1 cluster  -> keep, reason ``unique`` (deduplicate.py:419-424).
2. pairwise difference checks with greedy outlier eviction
   (check_differences, deduplicate.py:270-359): duration diff >
   size_threshold or transcript 0-context-unified-diff bytes >
   content_threshold mark a pair "offending"; repeatedly evict the member
   with the most offending pairs (tie-break min clip_id — the repr
   tie-break at deduplicate.py:344-348) until no offending pair remains.
   Evicted rows stay kept (reason ``evicted``).  If < 2 rows remain, the
   whole cluster is skipped (kept, ``skipped_threshold`` — the raise at
   deduplicate.py:354-358 caught as set-skip at :428-431).
   Fast paths: threshold disabled (-1) skips that check; all transcript
   hashes equal -> zero pairwise diffs (deduplicate.py:292-310); pair diffs
   memoized by content-hash pair (deduplicate.py:310,323-326).
3. strategy cascade (deduplicate.py:456-509): apply strategies in order; a
   strategy selecting ALL or NONE, or raising MissingTimestamps, falls
   through; first effective strategy wins; exhausted -> cluster skipped
   (kept, ``skipped_strategies``).

Output columns: keep(bool), reason(string), set_reason(string — constant
per cluster, drives the SET_* counters), winner_clip_id(string — the
min-clip_id kept row, ≙ link_targets deduplicate.py:1140-1170).
"""

from __future__ import annotations

from difflib import unified_diff

import pandas as pd

from mail_deduplicate_ray.config import DedupConfig
from mail_deduplicate_ray.stages.strategies import (
    REGISTRY, MissingTimestamps, StrategyCtx)


def _content_diff(a: str, b: str) -> int:
    """Bytes of 0-context unified diff (ref: deduplicate.py:361-382)."""
    return len("".join(unified_diff(a.splitlines(), b.splitlines(), n=0)))


def pretty_diff(a_id: str, a_text: str, a_ts: float | None,
                b_id: str, b_text: str, b_ts: float | None) -> str:
    """Verbose labeled unified diff between two clips' normalized
    transcripts (G5; ref: pretty_diff deduplicate.py:384-401 — same
    from/tofile labels and 2-decimal timestamp dates, 0 context)."""
    return "".join(unified_diff(
        a_text.splitlines(), b_text.splitlines(),
        fromfile=f"Normalized transcript of <Clip {a_id}>",
        tofile=f"Normalized transcript of <Clip {b_id}>",
        fromfiledate="" if a_ts is None else f"{a_ts:0.2f}",
        tofiledate="" if b_ts is None else f"{b_ts:0.2f}",
        n=0, lineterm="\n"))


def _offending_matrix(df: pd.DataFrame, cfg: DedupConfig) -> "np.ndarray":
    """(m, m) bool offending-pair adjacency, vectorized.

    Size diffs: one matrix op.  Content diffs: computed once per DISTINCT
    content pair (memoization ≙ body-hash-pair memo deduplicate.py:310,
    323-326; identical contents cost zero — the linear fast path
    deduplicate.py:292-310) then broadcast back to row pairs."""
    import numpy as np
    m = len(df)
    bad = np.zeros((m, m), dtype=bool)
    if cfg.size_threshold >= 0:
        dur = df["dur_ms"].to_numpy().astype(np.int64)
        bad |= np.abs(dur[:, None] - dur[None, :]) > cfg.size_threshold
    if cfg.content_threshold >= 0:
        texts = (df["transcript_norm"] if "transcript_norm" in df
                 else df["transcript"])
        codes, uniq = pd.factorize(texts, sort=True)
        u = len(uniq)
        if u > 1:
            # EXACT length-delta prune: every changed line is printed in
            # full on at least its own side, so diff bytes >= the delta
            # of the texts' line-content byte totals — a pair whose delta
            # already exceeds the threshold is offending WITHOUT running
            # difflib.  This is the hot case in clusters the stretch
            # channel merges (empty-transcript copies next to full
            # transcripts): settle grew 4.7x at the 760k scale point on
            # exactly those, and the prune removes the quadratic difflib
            # loop for them.  Pairs inside the delta still diff exactly.
            ln = np.array([sum(len(line) for line in t.splitlines())
                           for t in uniq], dtype=np.int64)
            over = np.abs(ln[:, None] - ln[None, :]) > cfg.content_threshold
            for a in range(u):
                for b in range(a + 1, u):
                    if not over[a, b] and \
                            _content_diff(uniq[a], uniq[b]) \
                            > cfg.content_threshold:
                        over[a, b] = over[b, a] = True
            bad |= over[np.ix_(codes, codes)]
    np.fill_diagonal(bad, False)
    return bad


def _evict(df: pd.DataFrame, cfg: DedupConfig) -> tuple[pd.DataFrame, list]:
    """Greedy eviction loop; returns (clean core, evicted index labels)."""
    import numpy as np  # noqa: F811 — worker-local import
    if cfg.size_threshold < 0 and cfg.content_threshold < 0:
        return df, []
    if len(df) > cfg.max_pairwise:
        # pairwise checks are O(m^2) content diffs; the reference assumes
        # small sets (deduplicate.py:270).  Giant clusters skip the checks
        # (reported via the `threshold_checked` column, never silently).
        return df, ["__UNCHECKED__"]
    bad = _offending_matrix(df, cfg)
    clip_ids = df["clip_id"].to_numpy()
    alive, evicted_pos, status = _evict_greedy(bad, clip_ids)
    if status == "skip":
        return df, ["__SKIP__"]
    core = df.iloc[np.flatnonzero(alive)]
    labels = df.index
    return core, [labels[i] for i in evicted_pos]


def _evict_greedy(bad, clip_ids) -> tuple:
    """(adjacency, ids) -> (alive mask, evicted positions in order, status).
    Greedy most-offending-first, tie-break min clip_id (repr tie-break,
    ref: deduplicate.py:344-348); whole set incoherent -> 'skip'
    (ref: deduplicate.py:354-358)."""
    import numpy as np
    alive = np.ones(len(clip_ids), dtype=bool)
    evicted: list[int] = []
    while True:
        deg = (bad & alive[None, :] & alive[:, None]).sum(axis=1)
        deg[~alive] = 0
        if deg.max(initial=0) == 0:
            return alive, evicted, "ok"
        top = deg == deg.max()
        cand = np.flatnonzero(top & alive)
        victim = cand[np.argmin(clip_ids[cand])]
        alive[victim] = False
        evicted.append(int(victim))
        if alive.sum() < 2:
            return alive, evicted, "skip"


def _cascade(core: pd.DataFrame, cfg: DedupConfig,
             cluster_id: str) -> tuple[pd.Series | None, str]:
    ctx = StrategyCtx(regexp=cfg.regexp, cluster_id=cluster_id,
                      time_source=cfg.time_source)
    for name in cfg.strategies:
        fn = REGISTRY[name]
        try:
            mask = fn(core, ctx).astype(bool)
        except MissingTimestamps:
            continue
        n = int(mask.sum())
        if n == 0 or n == len(core):
            continue  # useless strategy -> fall through (deduplicate.py:456-509)
        return mask, name
    return None, ""


def make_settle_partition(cfg: DedupConfig):
    """Partition body for bucketed settle.

    One sort + boundary slicing over the whole partition; all outputs are
    written into PREALLOCATED arrays and assembled into ONE output frame —
    the per-cluster pandas lifecycle (copy / per-group concat) otherwise
    dominates the stage (profiled ~3 ms/cluster of pure pandas overhead).
    Per-cluster logic (eviction, cascade) matches :func:`make_settle`
    exactly (parity-tested); singleton clusters never touch pandas."""
    import numpy as np

    def part(df: pd.DataFrame) -> pd.DataFrame:
        import os as _os
        import time as _time
        _prof = _os.environ.get("MDR_SETTLE_PROF")
        _t00 = _time.perf_counter()
        _t_evict = 0.0
        df = df.sort_values(["cluster_id", "clip_id"], ignore_index=True)
        n = len(df)
        cid = df["cluster_id"].to_numpy()
        clip_ids = df["clip_id"].to_numpy()
        bounds = np.flatnonzero(np.concatenate(
            ([True], cid[1:] != cid[:-1], [True])))
        keep = np.ones(n, dtype=bool)
        reason = np.empty(n, dtype=object)
        set_reason = np.empty(n, dtype=object)
        winner = np.full(n, "", dtype=object)
        checked = np.ones(n, dtype=bool)
        anchor = np.zeros(n, dtype=bool)
        for s, e in zip(bounds[:-1], bounds[1:]):
            anchor[s] = True  # min clip_id row carries the set counter
            if e - s == 1:
                reason[s] = "unique"
                set_reason[s] = "single"
                continue
            sub = df.iloc[s:e]
            _t0 = _time.perf_counter()
            core, evicted = _evict(sub, cfg)
            _t_evict += _time.perf_counter() - _t0
            if evicted == ["__SKIP__"]:
                reason[s:e] = "skipped"
                set_reason[s:e] = "skipped_threshold"
                continue
            if evicted == ["__UNCHECKED__"]:
                core, evicted = sub, []
                checked[s:e] = False
            ev = np.asarray(evicted, dtype=np.int64)
            reason[ev] = "evicted"
            mask, _strat = _cascade(core, cfg, str(cid[s]))
            pos = core.index.to_numpy()
            if mask is None:
                reason[pos] = "skipped"
                set_reason[s:e] = "skipped_strategies"
                continue
            m = np.asarray(mask)
            sel, dis = pos[m], pos[~m]
            reason[sel] = "selected"
            reason[dis] = "discarded"
            keep[dis] = False
            set_reason[s:e] = "deduplicated"
            winner[dis] = clip_ids[sel].min()  # ≙ deduplicate.py:1168
        if _prof:
            import json as _json
            sizes = np.diff(bounds)
            with open(_prof, "a") as f:
                f.write(_json.dumps({
                    "rows": int(n), "clusters": int(len(sizes)),
                    "max_cluster": int(sizes.max(initial=0)),
                    "multi_rows": int(sizes[sizes > 1].sum()),
                    "evict_s": round(_t_evict, 3),
                    "total_s": round(_time.perf_counter() - _t00, 3),
                }) + "\n")
        out = df.copy()
        out["keep"] = keep
        out["reason"] = reason
        out["set_reason"] = set_reason
        out["winner_clip_id"] = winner
        out["threshold_checked"] = checked
        out["set_anchor"] = anchor
        return out

    return part


def make_settle(cfg: DedupConfig):
    """Build the map_groups callable (cfg captured, pickled to workers)."""

    def settle(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("clip_id").reset_index(drop=True)
        cluster_id = str(df["cluster_id"].iloc[0])
        out = df.copy()
        out["keep"] = True
        out["reason"] = ""
        out["set_reason"] = ""
        out["winner_clip_id"] = ""
        out["threshold_checked"] = True
        # exactly ONE row per cluster carries the set-level counter (min
        # clip_id — rows are sorted): stats partials count anchors, so no
        # per-cluster driver state is ever held (scale seam, SURVEY §4.4)
        out["set_anchor"] = False
        out.loc[0, "set_anchor"] = True
        if len(df) == 1:
            out["reason"] = "unique"
            out["set_reason"] = "single"
            return out
        core, evicted = _evict(df, cfg)
        if evicted == ["__SKIP__"]:
            out["reason"] = "skipped"
            out["set_reason"] = "skipped_threshold"
            return out
        if evicted == ["__UNCHECKED__"]:
            core, evicted = df, []
            out["threshold_checked"] = False
        out.loc[evicted, "reason"] = "evicted"
        mask, strat = _cascade(core, cfg, cluster_id)
        if mask is None:
            out.loc[core.index, "reason"] = "skipped"
            out["set_reason"] = "skipped_strategies"
            return out
        sel_idx = core.index[mask]
        dis_idx = core.index[~mask]
        out.loc[sel_idx, "reason"] = "selected"
        out.loc[dis_idx, "reason"] = "discarded"
        out.loc[dis_idx, "keep"] = False
        out["set_reason"] = "deduplicated"
        winner = out.loc[sel_idx, "clip_id"].min()  # ≙ deduplicate.py:1168
        out.loc[dis_idx, "winner_clip_id"] = winner
        return out

    return settle
