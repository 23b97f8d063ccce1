"""Engine configuration + fingerprinting.

Mirrors the reference's config surface (ref: cli.py:616-638 Config TypedDict)
and its cache-invalidation fingerprint (ref: cache.py:55-61 CACHED_SETTINGS,
cache.py:103-109 fingerprint) — any change to a signature-affecting knob
invalidates checkpoints wholesale.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass, field, asdict


# Strategy names (canonical + aliases), re-expressing strategy.py:197-273.
# Time strategies operate on `ingest_ts`; size strategies on `dur_ms`.
STRATEGY_ALIASES: dict[str, str] = {
    # alias -> canonical  (ref: strategy.py:215-244 alias pairs)
    "discard-newest": "select-older",
    "discard-newer": "select-oldest",
    "discard-oldest": "select-newer",
    "discard-older": "select-newest",
    "discard-biggest": "select-smaller",
    "discard-bigger": "select-smallest",
    "discard-smallest": "select-bigger",
    "discard-smaller": "select-biggest",
    "discard-non-matching-path": "select-matching-path",
    "discard-matching-path": "select-non-matching-path",
    "discard-all-but-one": "select-one",
    "discard-one": "select-all-but-one",
    # north-star clip-domain names (BASELINE.json): duration IS the size
    # analogue, so keep-longest-duration aliases select-biggest
    "keep-longest-duration": "select-biggest",
}

CANONICAL_STRATEGIES = (
    "select-older",
    "select-oldest",
    "select-newer",
    "select-newest",
    "select-smaller",
    "select-smallest",
    "select-bigger",
    "select-biggest",
    "select-matching-path",
    "select-non-matching-path",
    "select-one",
    "select-all-but-one",
    "keep-highest-sr",
    "transcript-regexp",
)


def canonicalize_strategies(names: list[str] | tuple[str, ...]) -> tuple[str, ...]:
    """Resolve aliases and dedup while preserving order.

    Ref: cli.py:155-166 ``unique_strategies`` (dedup by target function,
    aliases included) and cli.py:145 order-preserving ``dict.fromkeys``.
    """
    out: list[str] = []
    for n in names:
        c = STRATEGY_ALIASES.get(n, n)
        if c not in CANONICAL_STRATEGIES:
            raise ValueError(f"unknown strategy {n!r}")
        if c not in out:
            out.append(c)
    return tuple(out)


@dataclass(frozen=True)
class DedupConfig:
    """All signature/selection knobs of the engine.

    Signature-affecting fields feed :meth:`fingerprint` — the analogue of the
    reference's ``CACHED_SETTINGS`` (cache.py:55-61): hash_headers,
    hash_body, hash_only, input sources.
    """

    # ---- signature config (fingerprinted) ----
    # which metadata columns feed the canonical exact key
    # (≙ --hash-headers, ref: cli.py:62-94 default header list)
    key_columns: tuple[str, ...] = ("sr_hz", "codec_norm", "dur_bucket")
    # include the 64-bit audio content fingerprint (SRP over the decoded
    # spectral features) in the exact composite key.  Metadata + text
    # alone is the mail-faithful key (ref: mail.py:409-421 hashes only
    # canonical headers/body) but is WRONG for audio at scale: clips
    # with EMPTY transcripts and coincidentally-equal (sr, codec,
    # dur_bucket) collapse into one "exact" mega-cluster of byte-
    # different audio (measured: a 168k-member cluster at the 783k
    # scale point, ~0.12 planted pair-precision) — violating the north
    # star's decoded-PCM-equality invariant for what "exact duplicate"
    # means.  With the fingerprint in the key, exact groups are
    # content-exact; metadata twins with different audio separate.
    key_audio_fp: bool = True
    # transcript hashing mode: skip | raw | normalized
    # (≙ --hash-body, ref: deduplicate.py:164-178 BodyHasher)
    transcript_hash: str = "normalized"
    # minimum usable metadata fields, else row rejected
    # (≙ --minimal-headers floor, ref: cli.py:97-104, mail.py:480-504)
    minimal_fields: int = 2
    # duration bucket width (ms) used in the exact key — coarse quantization so
    # re-encodes with ±jitter still share the metadata key
    dur_bucket_ms: int = 50

    # shingling / MinHash (new surface, per BASELINE.json north_star).
    # k=8 spans ~1.5 tokens: unrelated small-vocab docs measure j<=0.13 /
    # containment<=0.42 while planted near-dups stay >=0.85 — wide margins
    # (measured over the sf0.1 documents vocabulary).
    shingle_k: int = 8
    num_perm: int = 128
    lsh_bands: int = 16  # rows per band = num_perm // lsh_bands
    minhash_seed: int = 0xC0FFEE
    # 1-token edits on ~45-token transcripts give true j≈0.85; 0.72 leaves
    # >2.5 sigma of 128-perm estimator noise while unrelated pairs peak ~0.13
    jaccard_threshold: float = 0.72
    # est-containment acceptance (see stages/candidates.py): 0.8 leaves
    # ~2.5 sigma of MinHash-estimator noise below a true containment of 1.0
    # while unrelated small-vocab docs peak near 0.7
    containment_threshold: float = 0.8
    # containment ANCHOR shingle length: anchors bucket docs for the
    # exact-substring channel, so they must be RARE across unrelated docs
    # (24 chars ≈ 4.5 tokens) or common-shingle mega-buckets swallow the
    # cap; verification still runs on shingle_k sets.  A true substring of
    # the normalized text shares its long shingles with the container by
    # construction (the suffix-array-matching semantics, BASELINE.json).
    anchor_k: int = 24

    # exact-substring channel (the suffix-array detector, BASELINE.json
    # north star): winnowing minimizers of k-gram hashes with window
    # w = substring_min_len - k + 1, so any contained transcript of
    # >= substring_min_len chars provably shares a minimizer with its
    # container (functions/shingles.minimizers); candidates then verify
    # by suffix-array search (functions/suffixarray.py)
    substring_k: int = 16
    substring_min_len: int = 64
    # candidate probes per containee: its q SMALLEST minimizer values (all
    # provably present in any container's set).  q=1 suffices for recall
    # whenever buckets stay under max_bucket; raise to 2 on corpora where
    # the substring channel reports cap drops (dropped > 0) — a capped
    # containee then retries from its second probe bucket.  Cost: each
    # probe pairs the containee with a DIFFERENT container population, so
    # unique candidates (and exact-verify work) scale ~linearly in q
    # (measured 2.38M -> 4.48M pairs at q=1->2 on the 190k bench corpus).
    substring_probes: int = 1

    # SimHash / SRP over decoded-PCM spectral features
    audio_bits: int = 64
    audio_bands: int = 4  # split audio fingerprint into bands of bits/bands
    audio_hamming_max: int = 3
    spectral_dims: int = 48
    audio_seed: int = 0xBEEF

    # stretch channel (functions/stretchmatch.py): time-stretched /
    # padded copies — Hann-windowed spectral peak table, stretch-invariant
    # log-ratio bucket keys, global-shift peak-consensus verify + DTW
    # envelope confirm.  Peak-table knobs are signature-affecting;
    # verify thresholds are edge-affecting.
    stretch_peaks: int = 8         # max peaks kept per clip (8 since
    # round 5: rich-spectrum copies lose band-edge peaks to resampler
    # rolloff, and the wider table keeps enough overlap for the verify —
    # chord-corpus stretch recall 0.90 -> 0.95 at ~equal wall; the
    # sparse tonal corpus is unaffected)
    stretch_amp_floor: float = 0.05  # drop peaks below this (max-normalized)
    stretch_env_frame_ms: int = 32   # envelope frame for the DTW confirm
    stretch_qstep: float = 0.02    # key quantization (log-freq units)
    stretch_tol: float = 0.004     # peak match tolerance (log-freq units)
    stretch_score_min: float = 0.8  # matched-mass verify floor
    stretch_max_shift: float = 0.59  # ln(1.8): widest stretch considered
    stretch_dtw_max: float = 0.8   # DTW envelope confirm ceiling
    # minimum matched peaks for a stretch accept, capped per pair at
    # min(n_peaks_a, n_peaks_b).  nm >= 2 is nearly vacuous under the
    # top-2 x top-2 anchoring (the anchor peak matches itself, and the
    # coarse bucket key already implies a second spacing match), so 2
    # keeps only the mass + DTW gates; 3 (default) demands a real
    # third-peak consensus (capped at the pair's own peak count, so
    # 2-peak clips still verify at 2)
    stretch_min_matched: int = 3
    # rich-spectrum second-chance accept: a pair whose BOTH sides carry
    # >= stretch_rich_min_peaks peaks may pass at the lower
    # stretch_score_min_rich mass floor IF that many peaks match under
    # one global shift.  Rationale: lossy stretch copies of rich audio
    # (e.g. linear-resampled chords) lose >20% amp mass to rolloff and
    # fail the strict 0.8 floor, while >= 5 peaks aligning under a
    # single shift is itself overwhelming evidence — on the
    # high-entropy chord corpus this lifts stretch-kind recall
    # 0.85 -> 0.95 with pair precision >= 0.92; on the sparse tonal
    # corpus pairs rarely have 5 peaks a side, so the strict floor
    # still governs (measured: recall/precision unchanged).
    stretch_score_min_rich: float = 0.65
    # 6, not 5: measured at P=8 the peak-count distributions separate
    # cleanly (tonal clips 3-5 peaks, chords 7-8; <0.4% tonal clips
    # reach 6) — at 5 the rich branch went live on the saturated tonal
    # corpus at the 391k scale point and chance accepts snowballed
    # (pair precision 0.74 -> 0.0003); at 6 it is inert there
    stretch_rich_min_peaks: int = 6
    # pair-generation gate on the stretch-invariant spectral-shape
    # spread (the chunk-order key): a true stretched copy's spread
    # matches its source to |Δ| <= 0.057 at p99 (measured on 10,728
    # planted pairs at 391k clips), while saturated-bucket chance
    # collisions spread over ~1.5 — gating at 2x the p99 prunes the
    # superlinear chance-pair volume before any spectral work
    stretch_spread_gate: float = 0.12
    # stretch-specific bucket cap (the channel's quantized-ratio keys have
    # bounded entropy — a tonal corpus concentrates them into mega-buckets
    # whose salted-chunk pair volume grows with cap^2/2 per member).
    # Chunks are sorted by the STRETCH-INVARIANT spectral-shape spread
    # (candidates._stretch_core), so the cap is the co-location window in
    # content-rank units and recall is MONOTONE in it — measured at 391k
    # clips: stretch-kind cluster recall 0.936 / 0.967 / 0.981 at
    # 64 / 128 / 192, +14 s candidates wall for 64 -> 192.  192 buys the
    # 90th-percentile pair spread-jitter (~230 ranks in a uniform
    # mega-bucket); pairs beyond it rely on the ~16 double-cover keys
    # (the standard LSH salting trade).
    stretch_max_bucket: int = 192

    # enabled candidate channels (the dedup_clips default; an explicit
    # channels= argument overrides, e.g. the bench's exact-only run)
    channels: tuple[str, ...] = ("exact", "minhash", "audio",
                                 "containment", "substring", "stretch")

    # ---- grouping / selection config (not fingerprinted) ----
    # which column time strategies read (≙ TimeSource date-header vs ctime
    # switch, ref: mail.py:51-64): any float64 epoch-seconds column, or
    # "none" to disable time strategies (they then raise MissingTimestamps
    # and the cascade falls through)
    time_source: str = "ingest_ts"
    # pairwise-difference thresholds inside a cluster; -1 disables
    # (≙ --size-threshold / --content-threshold, ref: deduplicate.py:270-359)
    size_threshold: int = 512  # ms of duration difference allowed
    content_threshold: int = 768  # bytes of 0-context unified transcript diff
    strategies: tuple[str, ...] = ("select-newest", "select-biggest", "select-one")
    regexp: str | None = None  # for select-(non-)matching-path
    # audio verification: true spectral-feature cosine floor (the SRP
    # fingerprint is only the candidate filter; re-encodes measure >0.9999)
    audio_cosine_min: float = 0.999
    # skew control: max rows examined per LSH bucket before salting/splitting
    max_bucket: int = 256
    # settle: clusters larger than this skip pairwise threshold checks
    # (O(m^2) diffs; the reference assumes small sets — deduplicate.py:270)
    max_pairwise: int = 256
    # connected-components round cap (each round = min-label propagation +
    # pointer-jump compression, so ``r`` rounds cover component diameter
    # ~2^r; exceeding the cap raises instead of silently splitting)
    cc_max_rounds: int = 10
    # distributed connected-components engine: "hashmin" (min-label +
    # pointer jumping — the default; 2-4 rounds on near-star LSH graphs)
    # or "star" (large/small-star contraction — O(log n) rounds on
    # adversarial chain topologies; components.star_contraction_components)
    cc_method: str = "hashmin"

    dry_run: bool = False

    def __post_init__(self) -> None:
        object.__setattr__(self, "strategies", canonicalize_strategies(self.strategies))
        if self.num_perm % self.lsh_bands:
            raise ValueError("num_perm must be divisible by lsh_bands")
        if self.audio_bits % self.audio_bands:
            raise ValueError("audio_bits must be divisible by audio_bands")
        if self.transcript_hash not in ("skip", "raw", "normalized"):
            raise ValueError(f"bad transcript_hash {self.transcript_hash!r}")
        if self.max_bucket < 2:
            raise ValueError("max_bucket must be >= 2 (salted chunks need "
                             "a pivot plus at least one fresh member)")
        if self.substring_min_len <= self.substring_k:
            raise ValueError("substring_min_len must exceed substring_k "
                             "(the minimizer window needs >= 1 k-gram)")
        if self.substring_probes < 1:
            raise ValueError("substring_probes must be >= 1")
        if self.cc_method not in ("hashmin", "star"):
            raise ValueError(f"bad cc_method {self.cc_method!r} "
                             "(hashmin | star)")
        known = {"exact", "minhash", "audio", "containment", "substring",
                 "stretch"}
        bad = set(self.channels) - known
        if bad:
            raise ValueError(f"unknown channels: {sorted(bad)}")

    # fields whose change invalidates SIGNATURE checkpoints (what the
    # decode+signature actors compute); verification thresholds live in
    # _EDGE_FINGERPRINTED instead so tightening e.g. jaccard_threshold
    # re-derives edges without re-decoding the corpus
    _FINGERPRINTED = (
        "key_columns",
        "key_audio_fp",
        "transcript_hash",
        "minimal_fields",
        "dur_bucket_ms",
        "shingle_k",
        "num_perm",
        "lsh_bands",
        "minhash_seed",
        "anchor_k",
        "audio_bits",
        "audio_bands",
        "spectral_dims",
        "audio_seed",
        "stretch_peaks",
        "stretch_amp_floor",
        "stretch_env_frame_ms",
        "channels",  # decode computes stretch columns only when enabled
    )

    # fields that change which candidate pairs verify -> edge checkpoints
    # keyed on these TOO (≙ CACHED_SETTINGS covering everything that
    # changes cached content, ref: cache.py:55-61,103-109)
    _EDGE_FINGERPRINTED = (
        "jaccard_threshold",
        "containment_threshold",
        "audio_hamming_max",
        "audio_cosine_min",
        "max_bucket",
        "substring_k",
        "substring_min_len",
        "substring_probes",
        "stretch_qstep",
        "stretch_tol",
        "stretch_score_min",
        "stretch_max_shift",
        "stretch_dtw_max",
        "stretch_min_matched",
        "stretch_score_min_rich",
        "stretch_rich_min_peaks",
        "stretch_max_bucket",
        "stretch_spread_gate",
    )

    # bump whenever the signature FORMAT changes outside config (feature
    # definition, checkpoint schema, hash kernels) — the fingerprint then
    # invalidates old checkpoints instead of crashing on missing columns
    # or silently mixing incompatible features.  v2: 8192-sample zero-pad
    # FFT window + n_bytes staleness column.  v3: stretch-channel peak
    # table + envelope columns.
    SIG_FORMAT_VERSION = 3

    def fingerprint(self) -> str:
        """sha256 of the signature-affecting config (ref: cache.py:103-109)."""
        d = asdict(self)
        payload = {k: d[k] for k in self._FINGERPRINTED}
        payload["__format__"] = self.SIG_FORMAT_VERSION
        blob = json.dumps(payload, sort_keys=True, default=list).encode()
        return hashlib.sha256(blob).hexdigest()[:16]

    def edge_fingerprint(self, channels: tuple[str, ...]) -> str:
        """Validity key for the edge-log checkpoint: signature fingerprint
        + enabled channels + every edge-affecting verification knob.  A
        --checkpoint-root re-run with any of these changed re-derives the
        edge set instead of silently reusing stale edges."""
        d = asdict(self)
        payload = {k: d[k] for k in self._EDGE_FINGERPRINTED}
        payload["sig"] = self.fingerprint()
        payload["channels"] = sorted(channels)
        blob = json.dumps(payload, sort_keys=True, default=list).encode()
        return hashlib.sha256(blob).hexdigest()[:16]

    @property
    def band_rows(self) -> int:
        return self.num_perm // self.lsh_bands

    @classmethod
    def from_toml(cls, path: str, **overrides) -> "DedupConfig":
        """Load config from a TOML file with STRICT keys (unknown keys are
        errors, ref: cli.py:299-318 strict config-file validation); CLI
        overrides win over file values."""
        import tomllib
        from dataclasses import fields
        with open(path, "rb") as f:
            data = tomllib.load(f).get("dedup", {})
        known = {f.name for f in fields(cls)}
        unknown = set(data) - known
        if unknown:
            raise ValueError(f"unknown config keys: {sorted(unknown)}")
        for k in ("key_columns", "strategies", "channels"):
            if k in data:
                data[k] = tuple(data[k])
        data.update(overrides)
        return cls(**data)
