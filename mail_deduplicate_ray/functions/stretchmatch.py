"""Stretch-robust spectral peak matching — the flagship's time-stretch /
pad duplicate channel (VERDICT r3 item 4).

A time-stretched copy (resampled by factor ``f``, optionally padded with
silence) scales every spectral component's frequency by ``1/f``: in
LOG-frequency, the whole peak set SHIFTS by the constant ``-ln f``.  Peak
AMPLITUDE ratios are invariant.  So:

- **signature** (decode stage): top-P spectral peaks of the Hann-windowed
  prefix FFT — precise log-frequencies (parabolic refinement on the raw
  rfft grid, no log-binning quantization) + vertex amplitudes normalized
  to max=1.  The Hann window kills scalloping (a rectangular window's
  ±36 % amplitude swing made relative amps useless for matching).
- **candidates** (explode): quantized log-frequency-DIFFERENCE keys —
  differences cancel the global shift, so they are exactly
  stretch-invariant.  Triples of the top-4 peaks give ~10^5-key entropy;
  a top-2 pair key covers clips whose copies disagree on peak COUNT
  (measured: the dominant key-miss mode).  Double-cover quantization
  (emit q and q+1) guarantees two values within one step share a key.
- **verify** (bucket core): global-shift consensus — anchor the shift on
  top-2 x top-2 peak pairs, count amplitude-weighted peak matches under
  that single shift.  score = matched min-amp mass / max(total mass);
  a true stretched copy aligns its WHOLE peak set under one shift, a
  chance key collision aligns one or two peaks only.
- **confirm**: banded DTW over the prefix energy envelopes (the temporal
  axis the spectrum cannot see) — stretched/padded copies align
  frame-to-frame within the Sakoe-Chiba band, so the gate is loose on
  cost but rejects gross temporal mismatches on non-stationary audio.

Measured on the synthetic corpus (300 planted stretch copies, f in
[1.05, 1.28], half with 50-150 ms leading pad): key recall + verify at
score >= 0.8 catches 0.99; 0 of 44,850 unrelated pairs pass.

Re-expresses the reference's near-dup verification contract (diff
thresholding after candidate grouping, ref: deduplicate.py:270-359) for
the audio modality the north star adds.
"""

from __future__ import annotations

import numpy as np

_HANN_CACHE: dict[int, np.ndarray] = {}

F_LO = 50.0      # analysis band floor (Hz)
F_HI = 4000.0    # analysis band ceiling (Hz), also capped at 0.95 * sr/2
MIN_SEP_BINS = 8  # local-max min separation on the rfft grid
PAIR_TAG = 1      # low bit of a pair-fallback key
TRIPLE_TAG = 0


def _hann(n: int) -> np.ndarray:
    w = _HANN_CACHE.get(n)
    if w is None:
        w = np.hanning(n)
        _HANN_CACHE[n] = w
    return w


def peak_table(mag: np.ndarray, sr_hz: int, window: int, max_peaks: int,
               amp_floor: float) -> tuple[np.ndarray, np.ndarray]:
    """Top-``max_peaks`` spectral peaks of ONE clip's windowed rfft
    magnitude -> (log_freq float64[k], amp float64[k]), amp max-normalized,
    peaks below ``amp_floor`` dropped.  ``mag`` is |rfft(hann * pcm)| of
    length window//2 + 1."""
    bin_hz = sr_hz / window
    lo = int(np.ceil(F_LO / bin_hz))
    hi = min(int(min(F_HI, 0.95 * sr_hz / 2.0) / bin_hz), len(mag) - 1)
    m = mag[lo:hi]
    if len(m) < 3:
        return np.empty(0), np.empty(0)
    loc = np.flatnonzero((m[1:-1] > m[:-2]) & (m[1:-1] >= m[2:])) + 1
    if not len(loc):
        return np.empty(0), np.empty(0)
    order = loc[np.argsort(m[loc])[::-1]]
    sel: list[int] = []
    for i in order.tolist():
        if all(abs(i - j) > MIN_SEP_BINS for j in sel):
            sel.append(i)
        if len(sel) >= max_peaks:
            break
    s = np.asarray(sel)
    # log-parabolic vertex refinement: Hann mainlobes are ~Gaussian in
    # log-magnitude, so the fit gives sub-bin frequency AND a stable
    # amplitude estimate (raw bin heights scallop with phase)
    y0 = np.log(m[s - 1] + 1e-12)
    y1 = np.log(m[s] + 1e-12)
    y2 = np.log(m[s + 1] + 1e-12)
    d = np.clip((y0 - y2) / (2 * (y0 - 2 * y1 + y2) + 1e-12), -0.5, 0.5)
    vy = y1 - 0.25 * (y0 - y2) * d
    fhz = (lo + s + d) * bin_hz
    amp = np.exp(vy)
    amp /= amp.max()
    keep = amp >= amp_floor
    return np.log(fhz[keep]), amp[keep]


def peak_table_batch(mags: np.ndarray, sr_hz: int, window: int,
                     max_peaks: int, amp_floor: float
                     ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Batched ``peak_table`` for a GROUP of same-sample-rate rows
    (VERDICT r4 item 10): the local-max mask and the log-parabolic
    vertex refinement run once over the whole (g, window//2+1) magnitude
    matrix; only the tiny greedy min-separation selection (≤ ~max_peaks
    candidates each) stays per row.  Bit-equivalent to calling
    ``peak_table`` row-by-row — same subset argsort, same elementwise
    refinement ops — asserted by tests/test_functions.py.

    Returns (logf (g, max_peaks) f64, amp (g, max_peaks) f64,
    n_peaks (g,) int64); rows are zero-padded past their count."""
    g = mags.shape[0]
    logf = np.zeros((g, max_peaks), np.float64)
    ampo = np.zeros((g, max_peaks), np.float64)
    npk = np.zeros(g, np.int64)
    bin_hz = sr_hz / window
    lo = int(np.ceil(F_LO / bin_hz))
    hi = min(int(min(F_HI, 0.95 * sr_hz / 2.0) / bin_hz),
             mags.shape[1] - 1)
    m = mags[:, lo:hi]
    if m.shape[1] < 3 or g == 0:
        return logf, ampo, npk
    is_peak = (m[:, 1:-1] > m[:, :-2]) & (m[:, 1:-1] >= m[:, 2:])
    sel_r: list[int] = []
    sel_i: list[int] = []
    counts = np.zeros(g, np.int64)
    for r in range(g):
        loc = np.flatnonzero(is_peak[r]) + 1
        if not len(loc):
            continue
        order = loc[np.argsort(m[r, loc])[::-1]]
        sel: list[int] = []
        for i in order.tolist():
            if all(abs(i - j) > MIN_SEP_BINS for j in sel):
                sel.append(i)
            if len(sel) >= max_peaks:
                break
        counts[r] = len(sel)
        sel_r.extend([r] * len(sel))
        sel_i.extend(sel)
    if not sel_i:
        return logf, ampo, npk
    rr = np.asarray(sel_r)
    s = np.asarray(sel_i)
    y0 = np.log(m[rr, s - 1] + 1e-12)
    y1 = np.log(m[rr, s] + 1e-12)
    y2 = np.log(m[rr, s + 1] + 1e-12)
    d = np.clip((y0 - y2) / (2 * (y0 - 2 * y1 + y2) + 1e-12), -0.5, 0.5)
    vy = y1 - 0.25 * (y0 - y2) * d
    fhz = (lo + s + d) * bin_hz
    amp = np.exp(vy)
    # per-row max-normalize + floor filter (segment ops over the flat
    # selection — rows are contiguous runs by construction)
    starts = np.zeros(g + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    for r in range(g):
        a, b = starts[r], starts[r + 1]
        if a == b:
            continue
        av = amp[a:b] / amp[a:b].max()
        keep = av >= amp_floor
        k = int(keep.sum())
        npk[r] = k
        logf[r, :k] = np.log(fhz[a:b][keep])
        ampo[r, :k] = av[keep]
    return logf, ampo, npk


def bucket_keys(logf: np.ndarray, amp: np.ndarray,
                qstep: float) -> np.ndarray:
    """Stretch-invariant uint64 bucket keys for one clip's peak table.

    Triple keys: for the top-4 peaks (by amp) sorted by frequency, each
    (i<j<k) triple emits 4 double-cover keys of the quantized difference
    pair.  Pair key: the top-2-by-amp difference (2 keys) — kept even
    when triples exist, because a copy may gain/lose a weak 3rd/4th peak
    and the pair of DOMINANT peaks is the stable core."""
    k = len(logf)
    if k < 2:
        return np.empty(0, np.uint64)
    idx = np.argsort(amp)[::-1][:4]
    ls = np.sort(logf[idx])
    out: list[int] = []
    n = len(ls)
    for i in range(n):
        for j in range(i + 1, n):
            for kk in range(j + 1, n):
                q1 = int((ls[j] - ls[i]) / qstep)
                q2 = int((ls[kk] - ls[j]) / qstep)
                for o1 in (0, 1):
                    for o2 in (0, 1):
                        out.append((((q1 + o1) * 100003 + (q2 + o2)) << 1)
                                   | TRIPLE_TAG)
    t2 = np.sort(logf[np.argsort(amp)[::-1][:2]])
    q = int((t2[1] - t2[0]) / qstep)
    for o in (0, 1):
        out.append((((q + o) * 1009) << 1) | PAIR_TAG)
    # spread the compact key ints over the u64 bucket space (splitmix-lite)
    h = np.asarray(out, np.uint64)
    h = (h + np.uint64(0x9E3779B97F4A7C15))
    h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    return np.unique(h ^ (h >> np.uint64(27)))


def score_matrix(L: np.ndarray, A: np.ndarray, tol: float,
                 max_shift: float) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized pairwise stretch-match scores for ``m`` peak tables.

    ``L``/``A``: (m, P) log-freqs / amps, zero-padded (amp==0 = absent).
    For each of the 4 top-2 x top-2 anchor combinations the global shift
    D[p,q] = L[p,i] - L[q,j] is hypothesised, every peak pair within
    ``tol`` of that shift matches (peak min-separation >> tol makes the
    match 1-1), and the score is matched min-amp mass over the larger
    total mass.  Returns (score (m,m), matched-count (m,m)) maxed over
    anchors.  O(m^2 P^2) memory — callers cap m at cfg.max_bucket."""
    m, P = L.shape
    present = A > 0
    sums = A.sum(axis=1)
    denom = np.maximum(sums[:, None], sums[None, :]) + 1e-12
    best = np.zeros((m, m))
    bestn = np.zeros((m, m), np.int32)
    # peaks are stored amp-descending, so anchor columns are 0 and 1
    pair_ok = present[:, None, :, None] & present[None, :, None, :]
    wmin = np.minimum(A[:, None, :, None], A[None, :, None, :])
    for i in (0, 1):
        if i >= P:
            break
        for j in (0, 1):
            if j >= P:
                break
            D = L[:, i, None] - L[None, :, j]            # (m, m)
            valid = (np.abs(D) <= max_shift) \
                & present[:, i, None] & present[None, :, j]
            if not valid.any():
                continue
            T = (np.abs(L[:, None, :, None] - L[None, :, None, :]
                        - D[:, :, None, None]) < tol) & pair_ok
            # each source peak takes its best (max-weight) match
            w = (T * wmin).max(axis=3).sum(axis=2)
            nm = T.any(axis=3).sum(axis=2)
            sc = np.where(valid, w / denom, 0.0)
            upd = sc > best
            best = np.where(upd, sc, best)
            bestn = np.where(upd, nm, bestn)
    return best, bestn


def score_pairs(La: np.ndarray, Aa: np.ndarray,
                Lb: np.ndarray, Ab: np.ndarray,
                tol: float, max_shift: float,
                chunk: int = 65536) -> tuple[np.ndarray, np.ndarray]:
    """Pair-list form of :func:`score_matrix`: score K explicit pairs
    (a_k, b_k) instead of an m x m bucket matrix.  Per pair and per
    DIRECTION, the best (score, matched-count) over the 4 top-2 x top-2
    anchor hypotheses — returned as (K, 2) arrays (column 0 = a->b,
    column 1 = b->a), so callers can replay score_matrix's symmetrized
    per-cell accept test exactly:
    ``pass = any_direction(sc >= smin and nm >= 2)``.

    Why this form: the verify core collects candidate pairs across ALL
    buckets (after duration prefilter + cross-bucket dedup) and scores
    each once — only (pair, anchor) combos whose hypothesised shift is
    within ``max_shift`` are gathered into the (V, P, P) tolerance
    tensor, where score_matrix built the full (m, m, P, P) tensor per
    bucket per anchor (measured 86%% of the stretch stage at sf0.1)."""
    K, P = La.shape
    sc = np.zeros((K, 2))
    nm = np.zeros((K, 2), np.int32)
    # float32 tensor math: peak log-freqs travel the wire as float32
    # (explode payload), so the inputs are exactly representable; the
    # tolerance (4e-3) and score floor (0.8) sit ~4 orders of magnitude
    # above float32 rounding on values in [ln 50, ln 4000] — and the
    # (V, P, P) passes are memory-bound, so 4-byte lanes halve the
    # stage's DRAM traffic.
    La = np.asarray(La, np.float32)
    Lb = np.asarray(Lb, np.float32)
    Aa = np.asarray(Aa, np.float32)
    Ab = np.asarray(Ab, np.float32)
    for lo in range(0, K, chunk):
        hi = min(K, lo + chunk)
        _score_pairs_chunk(La[lo:hi], Aa[lo:hi], Lb[lo:hi], Ab[lo:hi],
                           np.float32(tol), np.float32(max_shift),
                           sc[lo:hi], nm[lo:hi])
    return sc, nm


def _score_pairs_chunk(La, Aa, Lb, Ab, tol, max_shift, sc, nm):
    P = La.shape[1]
    pa_ = Aa > 0
    pb_ = Ab > 0
    denom = np.maximum(Aa.sum(1), Ab.sum(1)) + np.float32(1e-12)
    dL = La[:, :, None] - Lb[:, None, :]     # shared by all anchors
    # wmin doubles as the presence mask: amp == 0 means absent, so
    # min(Aa, Ab) is 0 exactly where score_matrix's pair_ok was False —
    # one multiply replaces the bool-tensor AND, and a positive row-max
    # replaces the separate T.any() matched-count pass
    wmin = np.minimum(Aa[:, :, None], Ab[:, None, :])
    wminT = wmin.transpose(0, 2, 1)
    for i in (0, 1):
        if i >= P:
            break
        for j in (0, 1):
            if j >= P:
                break
            # direction a->b: D = La[i] - Lb[j]; match |dL - D| < tol
            D = La[:, i] - Lb[:, j]
            v = np.flatnonzero((np.abs(D) <= max_shift)
                               & pa_[:, i] & pb_[:, j])
            if v.size:
                wr = (wmin[v] * (np.abs(dL[v] - D[v, None, None]) < tol)) \
                    .max(axis=2)
                s_ = wr.sum(axis=1) / denom[v]
                upd = s_ > sc[v, 0]
                sc[v, 0] = np.where(upd, s_, sc[v, 0])
                nm[v, 0] = np.where(upd, (wr > 0).sum(axis=1), nm[v, 0])
            # direction b->a: D2 = Lb[i] - La[j]; the b-side match matrix
            # is dL transposed with the shift negated
            D2 = Lb[:, i] - La[:, j]
            v = np.flatnonzero((np.abs(D2) <= max_shift)
                               & pb_[:, i] & pa_[:, j])
            if v.size:
                wr = (wminT[v] * (np.abs(dL[v].transpose(0, 2, 1)
                                         + D2[v, None, None]) < tol)) \
                    .max(axis=2)
                s_ = wr.sum(axis=1) / denom[v]
                upd = s_ > sc[v, 1]
                sc[v, 1] = np.where(upd, s_, sc[v, 1])
                nm[v, 1] = np.where(upd, (wr > 0).sum(axis=1), nm[v, 1])


def verify_pair(logf_a: np.ndarray, amp_a: np.ndarray,
                logf_b: np.ndarray, amp_b: np.ndarray,
                tol: float, max_shift: float) -> tuple[float, int]:
    """Single-pair entry (tests + diagnostics): same semantics as one
    off-diagonal cell of :func:`score_matrix`."""
    P = max(len(logf_a), len(logf_b), 1)

    def pad(x, n):
        out = np.zeros((1, n))
        out[0, :len(x)] = x
        return out

    L = np.concatenate([pad(logf_a, P), pad(logf_b, P)])
    A = np.concatenate([pad(amp_a, P), pad(amp_b, P)])
    sc, nm = score_matrix(L, A, tol, max_shift)
    return float(sc[0, 1]), int(nm[0, 1])
