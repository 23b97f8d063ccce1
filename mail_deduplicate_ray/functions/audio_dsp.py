"""Vectorized audio DSP kernels for per-clip analysis stages.

Pure numpy over float32 PCM (what codecs.decode yields); every function
operates on one clip but is internally vectorized, so the per-batch loop
in the actor stage does O(samples) numpy work per iteration, not Python
arithmetic.  Everything here is deterministic (no RNG, no wall clock).
"""

from __future__ import annotations

import numpy as np

# dBFS reference: full-scale amplitude 1.0 (codecs decode int16 / 32768)
_EPS = 1e-12


def rms_dbfs(pcm: np.ndarray) -> float:
    """Root-mean-square level in dB relative to full scale (amplitude
    1.0).  A full-scale sine is ~-3.01 dBFS; silence floors at -240."""
    if len(pcm) == 0:
        return -240.0
    rms = float(np.sqrt(np.mean(np.square(pcm, dtype=np.float64))))
    return float(max(20.0 * np.log10(rms + _EPS), -240.0))


def peak_dbfs(pcm: np.ndarray) -> float:
    if len(pcm) == 0:
        return -240.0
    peak = float(np.max(np.abs(pcm)))
    return float(max(20.0 * np.log10(peak + _EPS), -240.0))


def zero_crossings(pcm: np.ndarray) -> int:
    """Count of sign changes (zero samples attach to the previous sign —
    one crossing per actual transition, the np.signbit convention)."""
    if len(pcm) < 2:
        return 0
    s = np.signbit(pcm)
    return int(np.count_nonzero(s[1:] != s[:-1]))


def resample_linear(pcm: np.ndarray, sr_from: int, sr_to: int) -> np.ndarray:
    """Linear-interpolation resampler (the dependency-free scale path; a
    polyphase FIR would need scipy, which is out of sandbox).  Adequate
    for feature extraction on band-limited speech-like content: >=30 dB
    SNR on signals below ~sr_to/4 (tested); NOT anti-aliased, callers
    downsampling wide-band content should low-pass first."""
    if sr_from <= 0 or sr_to <= 0:
        raise ValueError("sample rates must be positive")
    if sr_from == sr_to or len(pcm) == 0:
        return pcm.astype(np.float32, copy=False)
    n_out = max(int(round(len(pcm) * sr_to / sr_from)), 1)
    # exact rate-ratio grid t[i] = i * sr_from/sr_to (an endpoint-aligned
    # grid has step (len-1)/(n_out-1) != ratio -> cumulative phase drift)
    ti = np.minimum(np.arange(n_out, dtype=np.float64) * (sr_from / sr_to),
                    len(pcm) - 1)
    return np.interp(ti, np.arange(len(pcm)), pcm).astype(np.float32)


def resample_sinc(pcm: np.ndarray, factor: float,
                  taps: int = 16) -> np.ndarray:
    """Blackman-windowed-sinc resampler: output sample j interpolates
    the input at t_j = j * factor, so ``factor > 1`` SHORTENS the clip
    (speed-up at the same sample rate — Kaldi-style speed perturbation)
    and ``factor < 1`` lengthens it.  Anti-aliased: when speeding up,
    the sinc cutoff scales to 1/factor so frequencies that would fold
    are attenuated (unlike :func:`resample_linear`, the feature-path
    shortcut); measured 112 dB passband SNR and -55 dB one transition
    band above the cutoff at taps=16 (Blackman chosen over Kaiser:
    two cosines instead of np.i0, ~2x faster at equal quality).  Fully
    vectorized: one (n_out, 2*taps) gather + weighted sum; memory is
    bounded per clip, not per corpus.  Deliberately a DIFFERENT kernel
    family from resample_linear — the speed-perturb augmentation op
    uses it, which makes the stretch-channel recall test independent
    of the synth generator's own resampler."""
    from fractions import Fraction
    if factor <= 0:
        raise ValueError("factor must be positive")
    n = len(pcm)
    n_out = max(int(round(n / factor)), 1)
    if n == 0:
        return pcm.astype(np.float32, copy=False)
    offs = np.arange(1 - taps, taps + 1)
    c = min(1.0, 1.0 / factor)                 # anti-alias cutoff scale

    def _weights(frac: np.ndarray) -> np.ndarray:
        core = c * np.sinc(frac * c)
        w = frac / taps                        # window argument in [-1, 1]
        win = np.where(np.abs(w) <= 1.0,
                       0.42 + 0.5 * np.cos(np.pi * w)
                       + 0.08 * np.cos(2.0 * np.pi * w), 0.0)
        return core * win

    fr = Fraction(factor).limit_denominator(64)
    if float(fr) == factor:
        # POLYPHASE fast path: for factor p/q the fractional phases
        # t_j mod 1 cycle with period q, so the (q, 2*taps) weight
        # table is computed ONCE and the per-sample work collapses to
        # a gather + weighted sum (the trig was ~90% of the naive
        # cost — measured 28 -> 3 ms per 1 s clip; speed factors like
        # 0.9 / 1.1 / 1.12 are all small rationals).  Same t_j grid as
        # the naive path, on exact integer phases rather than
        # accumulated float products (equal within one float32 ulp —
        # parity-tested).
        p, q = fr.numerator, fr.denominator
        j = np.arange(n_out, dtype=np.int64)
        base = (j * p) // q
        phase_frac = np.arange(q, dtype=np.float64) / q
        W = _weights(phase_frac[:, None] - offs[None, :])
        wfull = W[(j * p) % q]                 # frac_j = ((j*p) mod q)/q
    else:
        t = np.arange(n_out, dtype=np.float64) * factor
        base = np.floor(t).astype(np.int64)
        wfull = _weights((t - base)[:, None] - offs[None, :])
    k = base[:, None] + offs[None, :]
    kc = np.clip(k, 0, n - 1)
    valid = (k >= 0) & (k < n)
    y = np.sum(np.where(valid, pcm.astype(np.float64)[kc], 0.0) * wfull,
               axis=1)
    return y.astype(np.float32)


def trim_silence(pcm: np.ndarray, threshold_dbfs: float = -40.0,
                 frame: int = 256) -> tuple[int, int]:
    """Leading/trailing silence bounds: (start, stop) sample indices of
    the region whose frames exceed ``threshold_dbfs`` RMS.  Frame-level
    energy (vectorized reshape) — the energy-gate VAD baseline.  Returns
    (0, 0) for an all-silent clip."""
    if len(pcm) == 0:
        return (0, 0)
    n_frames = -(-len(pcm) // frame)
    padded = np.zeros(n_frames * frame, dtype=np.float64)
    padded[:len(pcm)] = pcm
    energy = np.sqrt(np.mean(padded.reshape(n_frames, frame) ** 2, axis=1))
    thresh = 10.0 ** (threshold_dbfs / 20.0)
    live = np.flatnonzero(energy > thresh)
    if len(live) == 0:
        return (0, 0)
    start = int(live[0]) * frame
    stop = min((int(live[-1]) + 1) * frame, len(pcm))
    return (start, stop)


def segment_silence(pcm: np.ndarray, threshold_dbfs: float = -40.0,
                    frame: int = 256, min_gap_frames: int = 2,
                    min_seg_frames: int = 1) -> list[tuple[int, int]]:
    """Voiced segments as (start, stop) sample bounds: frame-RMS gate
    (same energy grid as ``trim_silence``), silence gaps SHORTER than
    ``min_gap_frames`` are bridged into one segment, segments shorter
    than ``min_seg_frames`` dropped.  Vectorized run detection (one
    diff/split over live-frame indices), no per-sample Python."""
    if len(pcm) == 0:
        return []
    n_frames = -(-len(pcm) // frame)
    padded = np.zeros(n_frames * frame, dtype=np.float64)
    padded[:len(pcm)] = pcm
    energy = np.sqrt(np.mean(padded.reshape(n_frames, frame) ** 2, axis=1))
    thresh = 10.0 ** (threshold_dbfs / 20.0)
    idx = np.flatnonzero(energy > thresh)
    if len(idx) == 0:
        return []
    # split where the silent gap between live frames reaches min_gap
    gaps = np.diff(idx) - 1
    groups = np.split(idx, np.flatnonzero(gaps >= min_gap_frames) + 1)
    segs = []
    for g in groups:
        if int(g[-1] - g[0]) + 1 < min_seg_frames:
            continue
        segs.append((int(g[0]) * frame,
                     min((int(g[-1]) + 1) * frame, len(pcm))))
    return segs


def loudness_gain_db(pcm: np.ndarray,
                     target_dbfs: float = -20.0) -> tuple[float, bool]:
    """Normalization gain (dB) bringing the clip's RMS to
    ``target_dbfs``, LIMITED so the gained peak never exceeds full
    scale; returns ``(gain_db, limited)``.  Silence gets gain 0 (there
    is nothing to normalize and +inf gain would amplify the floor)."""
    r = rms_dbfs(pcm)
    if r <= -240.0:
        return (0.0, False)
    want = target_dbfs - r
    cap = -peak_dbfs(pcm)          # gain at which the peak hits 1.0
    if want > cap:
        return (float(cap), True)
    return (float(want), False)


def spectral_centroid_hz(pcm: np.ndarray, sr: int,
                         n_fft: int = 4096) -> float:
    """POWER-weighted mean frequency of the first ``n_fft`` samples
    under a Hann window — the brightness feature.  Hann + |X|^2
    weighting matter: a rectangular window's leakage skirts drag a pure
    tone's magnitude-weighted centroid off by hundreds of Hz (measured
    300 Hz -> 929 Hz), while this estimator recovers the tone frequency
    to <1e-9 Hz.  Returns 0.0 for silence/empty."""
    if len(pcm) == 0 or sr <= 0:
        return 0.0
    w = min(len(pcm), n_fft)
    x = np.zeros(n_fft, dtype=np.float64)
    x[:w] = pcm[:w] * np.hanning(w)
    mag2 = np.abs(np.fft.rfft(x)) ** 2
    total = float(mag2.sum())
    if total <= 0.0:
        return 0.0
    freqs = np.fft.rfftfreq(n_fft, d=1.0 / sr)
    return float((freqs * mag2).sum() / total)


def snr_estimate_db(pcm: np.ndarray, frame: int = 256) -> float:
    """Crude SNR estimate: mean frame energy over the 10th-percentile
    frame energy (the noise-floor proxy), in dB.  Clips with uniform
    energy (pure tones) report near 0-ish ratios of mean/floor; clips
    with silence+speech-like dynamics report high values.  Returns 0.0
    when fewer than 2 frames."""
    if len(pcm) < 2 * frame:
        return 0.0
    n_frames = len(pcm) // frame
    e = np.mean(pcm[:n_frames * frame].reshape(n_frames, frame) ** 2,
                axis=1)
    floor = float(np.percentile(e, 10))
    mean = float(e.mean())
    if floor <= 0.0:
        floor = 1e-12
    return float(10.0 * np.log10(max(mean, 1e-12) / floor))


# ---- log-mel embedding (fixed-dim audio feature for similarity search) ----

_MEL_BANKS: dict = {}


def _mel_bank(sr: int, frame: int, n_mels: int) -> np.ndarray:
    """(n_mels, frame//2+1) triangular mel filterbank (HTK mel scale),
    cached per (sr, frame, n_mels) — built once per worker."""
    key = (sr, frame, n_mels)
    bank = _MEL_BANKS.get(key)
    if bank is None:
        nfft = frame // 2 + 1
        mmax = 2595.0 * np.log10(1.0 + (sr / 2.0) / 700.0)
        hz = 700.0 * (10.0 ** (np.linspace(0.0, mmax, n_mels + 2)
                               / 2595.0) - 1.0)
        bins = np.floor((frame + 1) * hz / sr).astype(int)
        bins = np.clip(bins, 0, nfft - 1)
        bank = np.zeros((n_mels, nfft))
        for m in range(1, n_mels + 1):
            lo, ctr, hi = bins[m - 1], bins[m], bins[m + 1]
            for k in range(lo, ctr):
                bank[m - 1, k] = (k - lo) / max(1, ctr - lo)
            for k in range(ctr, hi):
                bank[m - 1, k] = (hi - k) / max(1, hi - ctr)
        _MEL_BANKS[key] = bank
    return bank


def log_mel_embedding(pcm: np.ndarray, sr: int, n_mels: int = 24,
                      frame: int = 512) -> np.ndarray:
    """Whole-clip audio embedding: non-overlapping ``frame``-sample
    windows -> |rfft| -> mel filterbank -> log1p -> mean+std pooling
    over time -> L2-normalized (2*n_mels,) float32.  The classic cheap
    audio descriptor for similarity search: robust to codec re-encode
    noise (log compression) and to moderate re-timing (global pooling)."""
    n = (len(pcm) // frame) * frame
    if n == 0:
        buf = np.zeros(frame)
        buf[:len(pcm)] = pcm
        frames = buf.reshape(1, frame)
    else:
        frames = pcm[:n].astype(np.float64).reshape(-1, frame)
    mag = np.abs(np.fft.rfft(frames, axis=1))
    mel = np.log1p(mag @ _mel_bank(sr, frame, n_mels).T)
    v = np.concatenate([mel.mean(axis=0), mel.std(axis=0)])
    nv = float(np.linalg.norm(v))
    return (v / nv if nv > 0 else v).astype(np.float32)


def energy_envelope(pcm: np.ndarray, sr: int,
                    frame_ms: int = 32) -> np.ndarray:
    """Per-frame log-RMS energy envelope at a FIXED frame duration
    (so a time-stretched copy yields a stretched envelope — the shape
    DTW alignment consumes).  Returns float32 (n_frames,)."""
    frame = max(1, (sr * frame_ms) // 1000)
    n = len(pcm) // frame
    if n == 0:
        return np.zeros(1, np.float32)
    x = pcm[: n * frame].astype(np.float64).reshape(n, frame)
    rms = np.sqrt((x * x).mean(axis=1))
    return np.log10(rms + 1e-9).astype(np.float32)


def dtw_cost(a: np.ndarray, b: np.ndarray,
             radius_frac: float = 0.25) -> float:
    """Normalized Sakoe-Chiba banded DTW distance between two envelopes:
    both sides are z-normalized (gain-invariant), the warping band is
    ``radius_frac`` of the longer side (always at least the length
    difference, so the corner stays reachable), and the optimal path
    cost is divided by (n + m) — comparable across envelope lengths.
    Identical envelopes -> 0.  O(n * band) cells; envelopes are tens of
    frames, so a pair costs microseconds-to-milliseconds."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if not len(a) or not len(b):
        return float("inf")
    a = (a - a.mean()) / (a.std() + 1e-9)
    b = (b - b.mean()) / (b.std() + 1e-9)
    n, m = len(a), len(b)
    r = max(3, int(radius_frac * max(n, m)), abs(n - m) + 1)
    INF = float("inf")
    prev = [INF] * (m + 1)
    prev[0] = 0.0
    for i in range(1, n + 1):
        cur = [INF] * (m + 1)
        lo, hi = max(1, i - r), min(m, i + r)
        ai = a[i - 1]
        for j in range(lo, hi + 1):
            c = abs(ai - b[j - 1])
            best = prev[j - 1]
            if prev[j] < best:
                best = prev[j]
            if cur[j - 1] < best:
                best = cur[j - 1]
            cur[j] = c + best
        prev = cur
    return float(prev[m] / (n + m))


def dtw_cost_batch(A: np.ndarray, na: np.ndarray,
                   B: np.ndarray, nb: np.ndarray,
                   radius_frac: float = 0.25,
                   chunk: int = 4096) -> np.ndarray:
    """Vectorized :func:`dtw_cost` over K envelope pairs at once — the
    identical banded recurrence (z-normalize, band r = max(3,
    radius_frac*max(n,m), |n-m|+1), cost / (n+m)) run as one DP over a
    (K, N+1, M+1) tensor instead of K Python-loop DPs, so a verify
    stage with tens of thousands of candidate pairs pays ~N*M numpy
    ops total rather than K * N * band Python-interpreted cells.

    ``A``/``B``: (K, N)/(K, M) zero-padded envelope rows; ``na``/``nb``
    their true lengths.  Pairs with an empty side return inf (the
    scalar kernel's contract).  ``chunk`` bounds the DP tensor's
    memory (chunk * (N+1) * (M+1) float64)."""
    A = np.asarray(A, np.float64)
    B = np.asarray(B, np.float64)
    na = np.asarray(na, np.int64)
    nb = np.asarray(nb, np.int64)
    K, N = A.shape
    M = B.shape[1]
    out = np.empty(K, np.float64)
    if K == 0:
        return out
    for lo in range(0, K, chunk):
        hi = min(K, lo + chunk)
        out[lo:hi] = _dtw_batch_chunk(A[lo:hi], na[lo:hi],
                                      B[lo:hi], nb[lo:hi],
                                      N, M, radius_frac)
    return out


def _dtw_batch_chunk(A, na, B, nb, N, M, radius_frac):
    k = len(na)
    iN = np.arange(N)[None, :]
    iM = np.arange(M)[None, :]
    am = iN < na[:, None]
    bm = iM < nb[:, None]
    ca = np.maximum(na, 1)[:, None]
    cb = np.maximum(nb, 1)[:, None]
    mean_a = (A * am).sum(1, keepdims=True) / ca
    mean_b = (B * bm).sum(1, keepdims=True) / cb
    std_a = np.sqrt((((A - mean_a) * am) ** 2).sum(1, keepdims=True) / ca)
    std_b = np.sqrt((((B - mean_b) * bm) ** 2).sum(1, keepdims=True) / cb)
    Az = (A - mean_a) / (std_a + 1e-9)
    Bz = (B - mean_b) / (std_b + 1e-9)
    r = np.maximum(np.maximum(
        3, (radius_frac * np.maximum(na, nb)).astype(np.int64)),
        np.abs(na - nb) + 1)
    INF = np.inf
    D = np.full((k, N + 1, M + 1), INF)
    D[:, 0, 0] = 0.0
    for i in range(1, N + 1):
        ai = Az[:, i - 1]
        li = i <= na
        Dp = D[:, i - 1]
        Di = D[:, i]
        for j in range(1, M + 1):
            c = np.abs(ai - Bz[:, j - 1])
            best = np.minimum(np.minimum(Dp[:, j - 1], Dp[:, j]),
                              Di[:, j - 1])
            v = li & (j <= nb) & (abs(i - j) <= r)
            Di[:, j] = np.where(v, c + best, INF)
    res = D[np.arange(k), na, nb] / np.maximum(na + nb, 1)
    res[(na == 0) | (nb == 0)] = INF
    return res


def clipping_ratio(pcm: np.ndarray, level: float = 0.999) -> float:
    """Fraction of samples at/above ``level`` of full scale — the
    hard-clipping signal an audio quality gate screens on."""
    if len(pcm) == 0:
        return 0.0
    return float(np.count_nonzero(np.abs(pcm) >= level) / len(pcm))


def spectral_flatness(pcm: np.ndarray, frame: int = 2048) -> float:
    """Wiener spectral flatness in [0, 1]: geometric / arithmetic mean
    of the power spectrum, averaged over up to 8 frames.  ~1 for white
    noise, ~0 for a pure tone — the tonality signal that flags test
    tones, hum and DTMF in a speech corpus."""
    if len(pcm) < frame:
        frame = max(64, 1 << (max(1, len(pcm)).bit_length() - 1))
    if len(pcm) < frame:
        return 1.0
    n_frames = min(8, len(pcm) // frame)
    vals = []
    for f in range(n_frames):
        x = pcm[f * frame:(f + 1) * frame].astype(np.float64)
        p = np.abs(np.fft.rfft(x * np.hanning(len(x)))) ** 2 + 1e-20
        vals.append(float(np.exp(np.mean(np.log(p))) / np.mean(p)))
    return float(np.mean(vals))
