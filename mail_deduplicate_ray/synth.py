"""Deterministic synthetic `clips` corpus with planted duplicate structure.

Re-expresses the reference's test-fixture factory (ref: tests/conftest.py:95-166
``MailFactory`` + ``make_box``) over the target schema from
``BASELINE.json:input_hint``::

    clip_id: string, bytes: binary, sr_hz: int32, dur_ms: int32,
    codec: string, transcript: string  (+ ingest_ts: float64, nullable)

Every row is generated from ``default_rng(seed, i)`` so the corpus is
bit-for-bit reproducible at any size and any prefix (sf0.01 is a prefix of
sf0.1).  Planted group kinds mirror FIXTURES.md §2 / the duplicate shapes the
reference's suite exercises (tests/test_strategy.py, tests/test_mail_integration.py):

    unique            ~60%   singleton groups
    exact             copies: identical waveform+transcript+codec (same bytes)
    reencode          same waveform, other codec (re-encoded copy)
    whitespace        same audio, transcript perturbed by extra whitespace only
    nearedit          1-token transcript edit (half same audio / half fresh)
    contained         transcript+audio is a contiguous slice of the base
    outlier           A~B exact + C chained to B by transcript but 3x duration
                      (drives greedy eviction, ref: deduplicate.py:270-359)
    sparse            unusable metadata -> rejected (ref: mail.py:480-504)
    null-ts groups    all-member ingest_ts null (MissingTimestamps fall-through,
                      ref: deduplicate.py:228-248)

Ground truth emitted alongside: ``pairs`` (recall denominator; outlier edges
are marked and excluded from recall), ``clusters`` (connected closure).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from mail_deduplicate_ray import codecs

VOCAB = (
    "the quick brown fox jumps over lazy dog pack my box with five dozen "
    "liquor jugs how vexingly daft zebras sphinx of black quartz judge vow "
    "bright alpha delta echo golf hotel india kilo lima mike november oscar "
    "papa romeo sierra tango uniform victor whiskey xray yankee zulu"
).split()

SR_CHOICES = np.array([8000, 16000, 22050], dtype=np.int64)
_BASE_TS = 1_600_000_000.0

# generator version: bump whenever the corpus BYTES change for a given
# (n, seed) — callers key caches on it (pipelines/clips.py clips_path).
# v2: stretch duplicate kind (time-stretched/padded copies, empty
# transcript) + 3-5 component waveforms (2-component clips are spectrally
# degenerate: any single shared peak-pair ratio aliases them — rich
# spectra are also the realistic regime).
GEN_VERSION = 2

KIND_P = {
    "unique": 0.57,
    "exact": 0.10,
    "reencode": 0.08,
    "whitespace": 0.06,
    "nearedit": 0.06,
    "contained": 0.04,
    "outlier": 0.03,
    # time-stretched (resampled 1.05-1.28x) and/or silence-padded copy
    # with MISSING transcript — only the stretch channel can catch it
    "stretch": 0.03,
    "sparse": 0.01,
    # remaining 0.02: exact group with all-null timestamps
    "nullts": 0.02,
}
_KINDS = list(KIND_P)
_KIND_CUM = np.cumsum([KIND_P[k] for k in _KINDS])


def _tokens(rng: np.random.Generator, n: int) -> list[str]:
    return [VOCAB[j] for j in rng.integers(0, len(VOCAB), n)]


def _waveform(rng: np.random.Generator, sr_hz: int, dur_ms: int) -> np.ndarray:
    n = max(1, int(sr_hz * dur_ms / 1000))
    t = np.arange(n, dtype=np.float64) / sr_hz
    x = np.zeros(n)
    for _ in range(int(rng.integers(3, 6))):
        f = float(rng.uniform(80.0, min(2000.0, sr_hz / 4)))
        a = float(rng.uniform(0.1, 0.3))
        ph = float(rng.uniform(0, 2 * np.pi))
        x += a * np.sin(2 * np.pi * f * t + ph)
    x += rng.normal(0.0, 0.005, n)
    return np.clip(x, -0.99, 0.99).astype(np.float32)


def _waveform_chord(rng: np.random.Generator, sr_hz: int,
                    dur_ms: int) -> np.ndarray:
    """HIGH-ENTROPY waveform (mode="chord", VERDICT r4 item 4): 8-14
    components over the full analysis band with log-uniform amplitudes —
    per-clip random multi-tone chords, so top-peak sets (and hence the
    stretch channel's quantized-ratio/pair keys) are diverse instead of
    concentrating on ~low-thousands of values.  The production-regime
    companion to the bounded-entropy tonal default."""
    n = max(1, int(sr_hz * dur_ms / 1000))
    t = np.arange(n, dtype=np.float64) / sr_hz
    x = np.zeros(n)
    for _ in range(int(rng.integers(8, 15))):
        f = float(rng.uniform(60.0, min(3800.0, 0.45 * sr_hz)))
        a = float(10.0 ** rng.uniform(-1.3, -0.4))
        ph = float(rng.uniform(0, 2 * np.pi))
        x += a * np.sin(2 * np.pi * f * t + ph)
    x += rng.normal(0.0, 0.005, n)
    return np.clip(x, -0.99, 0.99).astype(np.float32)


_WAVEFORMS = {"tonal": _waveform, "chord": _waveform_chord}


def _perturb_whitespace(rng: np.random.Generator, text: str) -> str:
    toks = text.split(" ")
    out = []
    for tk in toks:
        out.append(tk)
        r = rng.random()
        if r < 0.15:
            out.append("")  # double space
        elif r < 0.2:
            out[-1] = tk + "\n"
    s = " ".join(out).replace("\n ", "\n")
    return "  " + s if rng.random() < 0.5 else s


def _edit_one_token(rng: np.random.Generator, text: str) -> str:
    toks = text.split(" ")
    i = int(rng.integers(0, len(toks)))
    repl = VOCAB[int(rng.integers(0, len(VOCAB)))]
    while repl == toks[i]:
        repl = VOCAB[int(rng.integers(0, len(VOCAB)))]
    toks[i] = repl
    return " ".join(toks)


class _Builder:
    def __init__(self) -> None:
        self.clip_id: list[str] = []
        self.bytes_: list[bytes] = []
        self.sr_hz: list[int] = []
        self.dur_ms: list[int] = []
        self.codec: list[str] = []
        self.transcript: list[str] = []
        self.ingest_ts: list[float | None] = []
        self.pairs: list[tuple[str, str, str]] = []

    def add(self, cid: str, wave: np.ndarray, sr: int, codec: str,
            transcript: str, ts: float | None) -> None:
        dur = int(round(len(wave) * 1000 / sr))
        self.clip_id.append(cid)
        self.bytes_.append(codecs.encode(wave, sr, codec))
        self.sr_hz.append(sr)
        self.dur_ms.append(dur)
        self.codec.append(codec)
        self.transcript.append(transcript)
        self.ingest_ts.append(ts)


def generate_clips(
    n_base: int,
    seed: int = 42,
    texts: list[str] | None = None,
    mode: str = "tonal",
) -> tuple[pa.Table, dict]:
    """Build the clips table + ground truth (serial; see
    :func:`generate_clips_parallel` for the Ray-parallel variant — rows are
    seeded per-index so any range partition produces identical bytes).
    ``mode="tonal"`` (default) keeps the v2 bytes; ``"chord"`` swaps the
    base waveform for high-entropy multi-tone chords (same per-row kind /
    sr / duration / text draws; the chord synth consumes more rng draws,
    so downstream per-row details like copy counts re-randomize)."""
    return generate_clips_range(0, n_base, seed, texts, mode)


def generate_clips_parallel(n_base: int, seed: int = 42,
                            texts: list[str] | None = None,
                            n_tasks: int = 16,
                            mode: str = "tonal") -> tuple[pa.Table, dict]:
    """Same output as :func:`generate_clips`, built by Ray tasks over row
    ranges (per-row seeding makes ranges independent).  Requires an
    initialized Ray session; ~n_tasks x faster for big corpora."""
    import ray

    @ray.remote
    def _gen(lo: int, hi: int):
        tbl, truth = generate_clips_range(lo, hi, seed, texts, mode)
        return tbl, truth["pairs"]

    step = -(-n_base // n_tasks)
    futs = [_gen.remote(i, min(n_base, i + step))
            for i in range(0, n_base, step)]
    tables, all_pairs = [], []
    for tbl, pairs in ray.get(futs):
        tables.append(tbl)
        all_pairs.extend(pairs)
    out = pa.concat_tables(tables)
    truth = {
        "pairs": all_pairs,
        "recall_pairs": [(a, c) for a, c, k in all_pairs if k != "outlier"],
        "clusters": _closure([(a, c) for a, c, k in all_pairs
                              if k != "outlier"]),
    }
    return out, truth


def generate_clips_range(
    lo: int,
    n_base: int,
    seed: int = 42,
    texts: list[str] | None = None,
    mode: str = "tonal",
) -> tuple[pa.Table, dict]:
    """Rows [lo, n_base) of the corpus — per-row rng((seed, i)) makes any
    range bit-identical to the same rows of a full run."""
    _waveform = _WAVEFORMS[mode]
    b = _Builder()
    for i in range(lo, n_base):
        rng = np.random.default_rng((seed, i))
        kind = _KINDS[int(np.searchsorted(_KIND_CUM, rng.random(), side="right"))]
        sr = int(SR_CHOICES[int(rng.integers(0, len(SR_CHOICES)))])
        dur_ms = int(rng.integers(300, 1500))
        codec = "pcm_s16le" if rng.random() < 0.7 else "ulaw"
        if texts is not None and i < len(texts):
            text = texts[i]
        else:  # past the supplied texts: fresh seeded token sequences so
            # base transcripts stay genuinely distinct (no accidental dups)
            text = " ".join(_tokens(rng, int(rng.integers(30, 60))))
        ts: float | None = _BASE_TS + i * 37.0
        base_id = f"clip-{i:08d}-0"

        if kind == "sparse":
            # unusable metadata: null sr/dur, empty codec -> rejection path
            wave = _waveform(rng, 8000, 100)
            raw = codecs.encode(wave, 8000, "pcm_s16le")
            b.clip_id.append(base_id)
            b.bytes_.append(raw)
            b.sr_hz.append(None)  # type: ignore[arg-type]
            b.dur_ms.append(None)  # type: ignore[arg-type]
            b.codec.append("")
            b.transcript.append("")
            b.ingest_ts.append(None)
            continue

        wave = _waveform(rng, sr, dur_ms)
        if kind == "nullts":
            ts = None
        b.add(base_id, wave, sr, codec, text, ts)

        if kind == "unique":
            continue

        n_copies = int(rng.integers(1, 3))
        for j in range(1, n_copies + 1):
            cid = f"clip-{i:08d}-{j}"
            cts: float | None = None if kind == "nullts" else (
                _BASE_TS + i * 37.0 + j * 11.0)
            if kind in ("exact", "nullts"):
                b.add(cid, wave, sr, codec, text, cts)
                b.pairs.append((base_id, cid, "exact"))
            elif kind == "reencode":
                other = "ulaw" if codec == "pcm_s16le" else "pcm_s16le"
                b.add(cid, wave, sr, other, text, cts)
                b.pairs.append((base_id, cid, "reencode"))
            elif kind == "whitespace":
                b.add(cid, wave, sr, codec, _perturb_whitespace(rng, text), cts)
                b.pairs.append((base_id, cid, "whitespace"))
            elif kind == "nearedit":
                w2 = wave if j % 2 else _waveform(rng, sr, dur_ms)
                b.add(cid, w2, sr, codec, _edit_one_token(rng, text), cts)
                b.pairs.append((base_id, cid, "nearedit"))
            elif kind == "stretch":
                from mail_deduplicate_ray.functions import audio_dsp
                f = float(rng.uniform(1.05, 1.28))
                w2 = audio_dsp.resample_linear(wave, sr, int(round(sr * f)))
                if rng.random() < 0.5:  # leading silence pad
                    pad = int(sr * rng.uniform(0.05, 0.15))
                    w2 = np.concatenate([np.zeros(pad, np.float32), w2])
                b.add(cid, w2.astype(np.float32), sr, codec, "", cts)
                b.pairs.append((base_id, cid, "stretch"))
            elif kind == "contained":
                lo = len(wave) // 5
                hi = lo + (len(wave) * 3) // 5
                toks = text.split(" ")
                sub = " ".join(toks[len(toks) // 5: (len(toks) * 4) // 5])
                b.add(cid, wave[lo:hi], sr, codec, sub, cts)
                b.pairs.append((base_id, cid, "contained"))
            elif kind == "outlier":
                if j == 1:  # true exact copy
                    b.add(cid, wave, sr, codec, text, cts)
                    b.pairs.append((base_id, cid, "exact"))
                else:  # chained by transcript, 3x duration -> eviction target
                    w3 = _waveform(rng, sr, dur_ms * 3)
                    b.add(cid, w3, sr, codec, _edit_one_token(rng, text), cts)
                    b.pairs.append((base_id, cid, "outlier"))

    table = pa.table({
        "clip_id": pa.array(b.clip_id, pa.string()),
        "bytes": pa.array(b.bytes_, pa.binary()),
        "sr_hz": pa.array(b.sr_hz, pa.int32()),
        "dur_ms": pa.array(b.dur_ms, pa.int32()),
        "codec": pa.array(b.codec, pa.string()),
        "transcript": pa.array(b.transcript, pa.string()),
        "ingest_ts": pa.array(b.ingest_ts, pa.float64()),
    })
    truth = {
        "pairs": b.pairs,
        "recall_pairs": [(a, c) for a, c, k in b.pairs if k != "outlier"],
        "clusters": _closure([(a, c) for a, c, k in b.pairs if k != "outlier"]),
    }
    return table, truth


def _closure(pairs: list[tuple[str, str]]) -> dict[str, str]:
    """Union-find closure -> {clip_id: min clip_id of its component}."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, c in pairs:
        ra, rc = find(a), find(c)
        if ra != rc:
            lo, hi = sorted((ra, rc))
            parent[hi] = lo
    return {x: find(x) for x in parent}
