"""Spectral-peak landmark fingerprinting — the constellation-matching
audio near-dup detector (Wang 2003, "An Industrial-Strength Audio Search
Algorithm", the Shazam paper): per clip, a sparse set of (f1, f2, dt)
peak-pair hashes anchored at frame times; two clips match when many of
their shared hashes agree on ONE relative time offset.  Offset-consistent
matching is what lets it find a clip embedded INSIDE a longer one (the
synth corpus's substring duplicates) and survive lossy re-encoding —
capabilities the whole-clip SimHash spectral signature does not have.

Scale shape (mirrors the LSH channels in stages/candidates.py):
landmark extraction is an actor-pool ``map_batches`` (FFT window built
once per actor), candidate generation is ONE landmark-keyed bucketed
shuffle with an IDF-style hot-hash drop (a landmark shared by more than
``max_per_hash`` clips carries no identity — the standard Shazam
pruning; dropped hashes are uninformative, not lost recall), scoring is
ONE pair-keyed shuffle taking the modal offset count.  No broadcast, no
driver state.

Ref analogue: the body-hash candidate channel (M10/G1) generalized to
time-offset-aligned audio content.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# landmark packing: 12-bit f1 | 12-bit f2 | 8-bit dt  (fits int64 easily)
_F_BITS = 12
_DT_BITS = 8


class LandmarkStage:
    """map_batches(LandmarkStage, concurrency=N, batch_format="pyarrow")
    -> rows (lm:int64, clip_id:string, t:int64), many per clip.

    ``frame``/``hop`` set the spectrogram grid; ``band_hz`` quantizes
    peak frequencies to absolute Hz bands so clips at different sample
    rates can still collide; ``fan_out``/``max_dt`` bound the target
    zone (peaks paired with up to ``fan_out`` later peaks within
    ``max_dt`` frames)."""

    def __init__(self, frame: int = 512, hop: int = 256,
                 peaks_per_frame: int = 3, fan_out: int = 4,
                 max_dt: int = 31, band_hz: float = 15.625) -> None:
        # band_hz default = the FFT bin width at sr 8000 / frame 512 —
        # the finest quantization the grid supports.  Coarser bands
        # saturate the hash vocabulary on narrowband audio (planted
        # 500-base corpus: 62.5 Hz bands -> recall 0.55 because the
        # IDF prune drops the over-shared hashes; 15.625 Hz -> 1.0).
        self.frame = frame
        self.hop = hop
        self.ppf = peaks_per_frame
        self.fan_out = fan_out
        self.max_dt = max_dt
        self.band_hz = band_hz
        self.window = np.hanning(frame).astype(np.float32)

    def _peaks(self, pcm: np.ndarray, sr: int) -> tuple[np.ndarray,
                                                        np.ndarray]:
        """(t_frames, f_bands) of per-frame top-magnitude peaks."""
        n = (len(pcm) - self.frame) // self.hop + 1
        if n <= 0:
            return (np.empty(0, np.int64), np.empty(0, np.int64))
        idx = (np.arange(n)[:, None] * self.hop
               + np.arange(self.frame)[None, :])
        frames = pcm[idx].astype(np.float32) * self.window
        mag = np.abs(np.fft.rfft(frames, axis=1))
        mag[:, 0] = 0.0  # DC carries no identity
        k = min(self.ppf, mag.shape[1] - 1)
        # top-k bins per frame, gated above the frame's mean magnitude
        top = np.argpartition(mag, -k, axis=1)[:, -k:]
        gate = mag.mean(axis=1, keepdims=True)
        keep = np.take_along_axis(mag, top, axis=1) > gate
        t = np.repeat(np.arange(n, dtype=np.int64), k)[keep.ravel()]
        bins = top.ravel()[keep.ravel()]
        bands = (bins.astype(np.float64) * sr / self.frame
                 / self.band_hz).astype(np.int64)
        order = np.lexsort((bands, t))
        return t[order], bands[order]

    def _landmarks(self, pcm: np.ndarray, sr: int) -> tuple[np.ndarray,
                                                            np.ndarray]:
        """(lm_hashes, anchor_t) — each anchor peak paired with the next
        ``fan_out`` peaks within ``max_dt`` frames."""
        t, f = self._peaks(pcm, sr)
        n = len(t)
        if n < 2:
            return (np.empty(0, np.int64), np.empty(0, np.int64))
        lms, ts = [], []
        for j in range(1, self.fan_out + 1):
            dt = t[j:] - t[:-j]
            # dt == 0 keeps same-frame peak pairs: chords/stationary
            # tones then still yield distinctive two-band hashes
            ok = (dt >= 0) & (dt <= self.max_dt)
            f1 = f[:-j][ok] & ((1 << _F_BITS) - 1)
            f2 = f[j:][ok] & ((1 << _F_BITS) - 1)
            lm = ((f1 << (_F_BITS + _DT_BITS)) | (f2 << _DT_BITS)
                  | dt[ok].astype(np.int64))
            lms.append(lm)
            ts.append(t[:-j][ok])
        return np.concatenate(lms), np.concatenate(ts)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from mail_deduplicate_ray.stages.audio_stats import iter_decoded

        ids = batch["clip_id"].to_pylist()
        out_lm: list[np.ndarray] = []
        out_t: list[np.ndarray] = []
        out_id: list[str] = []
        for i, pcm, sr in iter_decoded(batch):
            lm, t = self._landmarks(pcm, sr)
            if not len(lm):
                continue
            # within-clip dedup: FIRST occurrence per landmark value.
            # Real audio rarely repeats a hash, so this is near-lossless
            # there; for repetitive content it bounds every downstream
            # group to <= one row per clip, keeping pair-gen linear in
            # the number of clips sharing a hash instead of quadratic
            # in their frame counts.
            order = np.lexsort((t, lm))
            lm, t = lm[order], t[order]
            first = np.ones(len(lm), bool)
            first[1:] = lm[1:] != lm[:-1]
            lm, t = lm[first], t[first]
            out_lm.append(lm)
            out_t.append(t)
            out_id.extend([ids[i]] * len(lm))
        if not out_lm:
            return pa.table({"lm": pa.array([], pa.int64()),
                             "clip_id": pa.array([], pa.string()),
                             "t": pa.array([], pa.int64())})
        return pa.table({"lm": pa.array(np.concatenate(out_lm), pa.int64()),
                         "clip_id": pa.array(out_id, pa.string()),
                         "t": pa.array(np.concatenate(out_t), pa.int64())})


def landmark_pairs(ds: "ray.data.Dataset", min_matches: int = 7,
                   max_per_hash: int = 64,
                   stage_kwargs: dict | None = None) -> "ray.data.Dataset":
    """Constellation matcher over a clips Dataset -> (a_clip, b_clip,
    n_aligned) for every pair whose modal relative offset (smeared over
    ±1 frame — gate jitter under lossy re-encode shifts a landmark's
    first frame by one) is backed by >= ``min_matches`` landmark
    agreements (a_clip < b_clip).  The default threshold was tuned on
    the planted synth truth: recall 1.0 on exact/reencode/contained
    pairs, FP 0.06% on its worst-case stationary-tone audio (real audio
    has far higher landmark entropy, so precision only improves)."""
    import pandas as pd

    import ray.data  # noqa: F401  (type only)

    from mail_deduplicate_ray.stages import bucketing
    from mail_deduplicate_ray.stages.bucketing import grouped, grouped_multi

    _, hi = bucketing.pool_size()
    lms = ds.map_batches(
        LandmarkStage, fn_constructor_kwargs=stage_kwargs or {},
        batch_format="pyarrow", batch_size=128,
        concurrency=(max(1, hi // 2), max(1, hi - 1)), num_cpus=1)

    def pair_gen(df: "pd.DataFrame") -> pa.Table:
        out_a, out_b, out_off = [], [], []
        for _, g in df.groupby("lm", sort=False):
            # IDF-style prune: a hash this common identifies nothing
            if len(g) > max_per_hash:
                continue
            cid = g["clip_id"].to_numpy()
            tt = g["t"].to_numpy()
            order = np.lexsort((tt, cid))
            cid, tt = cid[order], tt[order]
            ii, jj = np.triu_indices(len(cid), k=1)
            ne = cid[ii] != cid[jj]
            ii, jj = ii[ne], jj[ne]
            out_a.append(cid[ii])
            out_b.append(cid[jj])
            out_off.append(tt[ii] - tt[jj])
        if not out_a:
            return pa.table({"a_clip": pa.array([], pa.string()),
                             "b_clip": pa.array([], pa.string()),
                             "off": pa.array([], pa.int64())})
        return pa.table({
            "a_clip": pa.array(np.concatenate(out_a), pa.string()),
            "b_clip": pa.array(np.concatenate(out_b), pa.string()),
            "off": pa.array(np.concatenate(out_off).astype(np.int64),
                            pa.int64())})

    cands = grouped(lms, "lm", pair_gen)

    def score(df: "pd.DataFrame") -> pa.Table:
        g = (df.groupby(["a_clip", "b_clip", "off"], sort=False)
             .size().reset_index(name="n")
             .sort_values(["a_clip", "b_clip", "off"]))
        a = g["a_clip"].to_numpy()
        b = g["b_clip"].to_numpy()
        o = g["off"].to_numpy()
        n = g["n"].to_numpy()
        # ±1-frame smear: add counts of adjacent offsets within a pair
        tot = n.astype(np.int64).copy()
        if len(n) > 1:
            adj = (a[1:] == a[:-1]) & (b[1:] == b[:-1]) & (o[1:] == o[:-1] + 1)
            tot[:-1][adj] += n[1:][adj]
            tot[1:][adj] += n[:-1][adj]
        g["n"] = tot
        best = (g.groupby(["a_clip", "b_clip"], sort=False)["n"].max()
                .reset_index(name="n_aligned"))
        best = best[best["n_aligned"] >= min_matches]
        return pa.table({
            "a_clip": pa.array(best["a_clip"].tolist(), pa.string()),
            "b_clip": pa.array(best["b_clip"].tolist(), pa.string()),
            "n_aligned": pa.array(best["n_aligned"].to_numpy(np.int64),
                                  pa.int64())})

    return grouped_multi(cands, ["a_clip", "b_clip"], score)
