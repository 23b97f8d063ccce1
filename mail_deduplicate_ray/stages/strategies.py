"""Selection strategies X1-X12 — per-cluster keep/discard policies.

Faithful re-expression of strategy.py:56-193 over a pandas group
(clusters are small, like the reference's DuplicateSets — per-group Python
is the right altitude, SURVEY.md §7.4):

    ingest_ts  <-  mail timestamp     (nullable; MissingTimestamps guard)
    dur_ms     <-  mail size          (the reference's `size` analogue)
    clip_id    <-  mail path          (regexp strategies)

Every function takes (df, ctx) and returns a boolean keep-mask (ties kept,
as in the reference's == min/max semantics).  Registered in ``REGISTRY``;
aliases resolved in config.canonicalize_strategies.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

import numpy as np
import pandas as pd


class MissingTimestamps(Exception):
    """Any null timestamp in the group + a time strategy -> fall through to
    the next strategy (ref: deduplicate.py:228-248 raise, :470-477 catch)."""


@dataclass
class StrategyCtx:
    regexp: str | None = None
    cluster_id: str = ""
    # ≙ TimeSource switch (ref: mail.py:51-64): the timestamp column time
    # strategies read; "none" disables them (MissingTimestamps fall-through)
    time_source: str = "ingest_ts"


def _ts(df: pd.DataFrame, ctx: StrategyCtx | None = None) -> pd.Series:
    col = ctx.time_source if ctx is not None else "ingest_ts"
    if col == "none" or col not in df.columns:
        raise MissingTimestamps
    ts = df[col]
    if ts.isna().any():
        raise MissingTimestamps
    return ts


def _t1(df, ctx):
    ts = _ts(df, ctx)
    return ts  # evaluated once per strategy call (isna scan is the cost)


def select_older(df, ctx):    ts = _t1(df, ctx); return ts < ts.max()     # noqa: E702,E704
def select_oldest(df, ctx):   ts = _t1(df, ctx); return ts == ts.min()    # noqa: E702,E704
def select_newer(df, ctx):    ts = _t1(df, ctx); return ts > ts.min()     # noqa: E702,E704
def select_newest(df, ctx):   ts = _t1(df, ctx); return ts == ts.max()    # noqa: E702,E704
def select_smaller(df, ctx):  return df["dur_ms"] < df["dur_ms"].max()   # noqa: E704
def select_smallest(df, ctx): return df["dur_ms"] == df["dur_ms"].min()  # noqa: E704
def select_bigger(df, ctx):   return df["dur_ms"] > df["dur_ms"].min()   # noqa: E704
def select_biggest(df, ctx):  return df["dur_ms"] == df["dur_ms"].max()  # noqa: E704


def select_matching_path(df, ctx):
    if not ctx.regexp:
        return pd.Series(False, index=df.index)
    return df["clip_id"].str.contains(ctx.regexp, regex=True, na=False)


def select_non_matching_path(df, ctx):
    return ~select_matching_path(df, ctx)


# --- north-star clip strategies (BASELINE.json north_star: selection
# "re-expressed as keep-longest-duration / keep-highest-sr /
# transcript-regexp winners").  keep-longest-duration is an alias of
# select-biggest (dur_ms IS the size analogue); these two add the
# sample-rate and transcript-content variants.

def select_highest_sr(df, ctx):
    return df["sr_hz"] == df["sr_hz"].max()


def select_matching_transcript(df, ctx):
    if not ctx.regexp:
        return pd.Series(False, index=df.index)
    return df["transcript_norm"].str.contains(ctx.regexp, regex=True,
                                              na=False)


def _det_pick(df: pd.DataFrame, ctx: StrategyCtx) -> int:
    """Deterministic single pick: min sha224(cluster_id + clip_id).

    The reference uses per-worker RNG (strategy.py:185-193,
    docs/performance.md:139 — count-deterministic only); we improve to full
    run-to-run determinism at any parallelism (SURVEY.md ST3).
    """
    keys = [hashlib.sha224((ctx.cluster_id + cid).encode()).digest()
            for cid in df["clip_id"]]
    return int(np.argmin(np.frombuffer(b"".join(k[:8] for k in keys),
                                       dtype=">u8")))


def select_one(df, ctx):
    mask = pd.Series(False, index=df.index)
    mask.iloc[_det_pick(df, ctx)] = True
    return mask


def select_all_but_one(df, ctx):
    return ~select_one(df, ctx)


REGISTRY = {
    "select-older": select_older,
    "select-oldest": select_oldest,
    "select-newer": select_newer,
    "select-newest": select_newest,
    "select-smaller": select_smaller,
    "select-smallest": select_smallest,
    "select-bigger": select_bigger,
    "select-biggest": select_biggest,
    "select-matching-path": select_matching_path,
    "select-non-matching-path": select_non_matching_path,
    "select-one": select_one,
    "select-all-but-one": select_all_but_one,
    "keep-highest-sr": select_highest_sr,
    "transcript-regexp": select_matching_transcript,
}
