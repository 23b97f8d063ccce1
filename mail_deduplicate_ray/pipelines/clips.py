"""Clips-table entry points: synthesize the Lance-shaped clips corpus from a
testdata dir (deterministic, seeded — per the driver note: the input_hint
table is synthesized at small scale; no external data) and run the flagship
near-dup pipeline on it.

The corpus is cached as parquet under /tmp keyed by (sf_dir basename, n_base,
seed) so repeated driver/bench invocations — including the two fresh
processes of `bench.py --scaling` — read the identical bytes instead of
regenerating.
"""

from __future__ import annotations

import os
from pathlib import Path

import pyarrow.parquet as pq

import ray.data

from mail_deduplicate_ray.sources.clips_io import read_parquet_clean

from mail_deduplicate_ray import synth
from mail_deduplicate_ray.config import DedupConfig
from mail_deduplicate_ray.pipelines import neardup

CACHE_ROOT = Path(os.environ.get("MDR_CACHE", "/tmp/mdr_cache"))


def _doc_texts(sf_dir: str) -> list[str]:
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    order = t["doc_id"].to_pylist()
    texts = t["text"].to_pylist()
    return [x for _, x in sorted(zip(order, texts))]


def clips_path(sf_dir: str, n_base: int | None = None, seed: int = 42,
               mode: str = "tonal") -> Path:
    texts = _doc_texts(sf_dir)
    n = n_base or len(texts)
    tag = Path(sf_dir).name or "sf"
    suffix = "" if mode == "tonal" else f"-{mode}"
    out = CACHE_ROOT / f"clips-{tag}-{n}-{seed}-g{synth.GEN_VERSION}{suffix}"
    if not out.exists():
        CACHE_ROOT.mkdir(parents=True, exist_ok=True)
        import ray
        if ray.is_initialized() and n >= 2000:
            tbl, truth = synth.generate_clips_parallel(n, seed=seed,
                                                       texts=texts,
                                                       mode=mode)
        else:
            tbl, truth = synth.generate_clips(n, seed=seed, texts=texts,
                                              mode=mode)
        tmp = out.with_suffix(".tmp")
        tmp.mkdir(parents=True, exist_ok=True)
        # many part files -> ray.data.read_parquet runs one read task per
        # file (a single file = one serial decompress of the whole corpus)
        n_parts = max(1, min(32, tbl.num_rows // 500))
        step = -(-tbl.num_rows // n_parts)
        for i in range(n_parts):
            pq.write_table(tbl.slice(i * step, step),
                           tmp / f"part-{i:04d}.parquet",
                           row_group_size=2048)
        tmp.rename(out)  # atomic publish (resume-safe)
        # ground truth beside the corpus, for recall checks (pairs keep
        # their duplicate KIND so tools/eval_recall.py can attribute
        # misses per kind at any scale)
        import json
        (CACHE_ROOT / f"{out.name}.truth.json").write_text(
            json.dumps({"recall_pairs": truth["recall_pairs"],
                        "pairs": truth["pairs"]}))
    return out


def read_clips(sf_dir: str, n_base: int | None = None,
               mode: str = "tonal") -> "ray.data.Dataset":
    """Parallel scan of the cached corpus: one pyarrow task per row group
    (sources.read_clips_fast — Ray's generic parquet datasource costs ~50x
    the CPU on large-binary payload columns)."""
    from mail_deduplicate_ray.sources.clips_io import read_clips_fast
    return read_clips_fast(str(clips_path(sf_dir, n_base, mode=mode)))


def flagship(sf_dir: str, cfg: DedupConfig | None = None,
             n_base: int | None = None) -> neardup.DedupResult:
    """The full mdedup-equivalent run (SURVEY.md §3.1) over the clips
    corpus derived from ``sf_dir``'s documents."""
    return neardup.dedup_clips(read_clips(sf_dir, n_base), cfg or DedupConfig())


def flagship_clusters(sf_dir: str) -> "ray.data.Dataset":
    """queries() surface: (clip_id, cluster_id, keep, reason)."""
    res = flagship(sf_dir)
    return res.settled.select_columns(["clip_id", "cluster_id", "keep",
                                       "reason"])


def flagship_clusters_chord(sf_dir: str) -> "ray.data.Dataset":
    """Flagship over the HIGH-ENTROPY chord corpus (synth mode="chord" —
    the production-regime companion to the worst-case tonal corpus;
    round-5 matrix in BASELINE.md: recall >= 0.99, planted pair
    precision ~0.996 at 391k/783k)."""
    res = neardup.dedup_clips(read_clips(sf_dir, mode="chord"),
                              DedupConfig())
    return res.settled.select_columns(["clip_id", "cluster_id", "keep",
                                       "reason"])


def clips_exact_dedup(sf_dir: str) -> "ray.data.Dataset":
    """Exact-only fast path (= reference with --hash-body normalized and no
    near-dup detectors)."""
    res = neardup.dedup_clips(read_clips(sf_dir), DedupConfig(),
                              channels=("exact",))
    return res.settled.select_columns(["clip_id", "cluster_id", "keep",
                                       "reason"])


def clips_signature_table(sf_dir: str) -> "ray.data.Dataset":
    """--hash-only analogue over clips (ref: cli.py:656-674)."""
    ds = read_clips(sf_dir)
    sigs = neardup.clip_signatures(ds, DedupConfig())
    return sigs.select_columns(["clip_id", "exact_key", "rejected",
                                "audio_fp", "set_size"])


def clips_audio_stats(sf_dir: str) -> "ray.data.Dataset":
    """Per-clip loudness/activity analysis (rows-only query): full-PCM
    decode in an actor pool -> integer milli-dB RMS/peak, zero-crossing
    count, energy-gate active-region length.  Small batch_size: this
    stage holds FULL decoded clips, unlike the signature path's FFT
    prefix."""
    from mail_deduplicate_ray.stages import bucketing
    from mail_deduplicate_ray.stages.audio_stats import AudioStatsStage

    ds = read_clips(sf_dir)
    _, hi = bucketing.pool_size()
    out = ds.map_batches(
        AudioStatsStage, batch_format="pyarrow", batch_size=128,
        concurrency=(max(1, hi // 2), max(1, hi - 1)), num_cpus=1)
    return out.select_columns(["clip_id", "audio_ok", "n_samples",
                               "rms_mdb", "peak_mdb", "zero_crossings",
                               "active_samples", "centroid_mhz",
                               "snr_mdb"])

def clips_silence_segments(sf_dir: str) -> "ray.data.Dataset":
    """Silence-split segmentation (rows-only query): one row per voiced
    segment — decode in an actor pool, frame-RMS gate with short-gap
    bridging, per-segment bounds in ms + segment RMS.  The audio
    analogue of the windowed-explode operators on the events table;
    at corpus scale the segment rows feed per-segment stages directly."""
    from mail_deduplicate_ray.stages import bucketing
    from mail_deduplicate_ray.stages.audio_stats import SilenceSegmentStage

    ds = read_clips(sf_dir)
    _, hi = bucketing.pool_size()
    return ds.map_batches(
        SilenceSegmentStage, batch_format="pyarrow", batch_size=128,
        concurrency=(max(1, hi // 2), max(1, hi - 1)), num_cpus=1)


def clips_loudness(sf_dir: str) -> "ray.data.Dataset":
    """Loudness-normalization plan (rows-only query): per-clip RMS/peak
    milli-dB and the peak-limited gain to -20 dBFS; the `limited` flag
    marks clips whose crest factor forces a lower gain."""
    from mail_deduplicate_ray.stages import bucketing
    from mail_deduplicate_ray.stages.audio_stats import LoudnessStage

    ds = read_clips(sf_dir)
    _, hi = bucketing.pool_size()
    out = ds.map_batches(
        LoudnessStage, batch_format="pyarrow", batch_size=128,
        concurrency=(max(1, hi // 2), max(1, hi - 1)), num_cpus=1)
    return out.select_columns(["clip_id", "audio_ok", "rms_mdb",
                               "peak_mdb", "gain_mdb", "limited"])


def clips_landmark_pairs(sf_dir: str) -> "ray.data.Dataset":
    """Constellation-matched audio pairs (rows-only query): Shazam-style
    spectral-peak landmark hashes -> offset-consistent pair scoring
    (stages/landmarks.py).  Finds same-recording pairs across lossy
    re-encodes AND clips embedded inside longer ones (the substring
    duplicates), the two cases whole-clip signatures can't align.
    Output: (a_clip, b_clip, n_aligned) sorted for stable hashing."""
    from mail_deduplicate_ray.stages.landmarks import landmark_pairs

    return landmark_pairs(read_clips(sf_dir)).sort(["a_clip", "b_clip"])


def clips_mel_embeddings(sf_dir: str, n_mels: int = 24) -> "ray.data.Dataset":
    """Per-clip log-mel audio embedding (rows-only query): full-PCM
    decode in an actor pool -> 2*n_mels L2-normalized descriptor —
    the feature column the audio similarity-search path consumes."""
    from mail_deduplicate_ray.stages import bucketing
    from mail_deduplicate_ray.stages.audio_stats import MelEmbeddingStage

    ds = read_clips(sf_dir)
    _, hi = bucketing.pool_size()
    out = ds.map_batches(
        MelEmbeddingStage, fn_constructor_args=(n_mels,),
        batch_format="pyarrow", batch_size=128,
        concurrency=(max(1, hi // 2), max(1, hi - 1)), num_cpus=1)
    return out.select_columns(["clip_id", "embedding", "audio_ok"])


def clips_audio_ann_top5(sf_dir: str, n_queries: int = 8,
                         k: int = 5) -> "ray.data.Dataset":
    """Similarity search over REAL audio features (rows-only query):
    brute-force cosine top-k of every corpus clip against the
    ``n_queries`` lexicographically-smallest clips' log-mel embeddings.

    Scale shape (the ann.py brute-force convention): the query side is
    tiny and broadcast ONCE via ray.put; the corpus side streams through
    the embedding actor pool, each batch emitting only its top-k rows
    per query (partial top-k); a per-query merge reduces n_batches * k
    rows.  Self-matches are excluded."""
    import numpy as np
    import pyarrow as pa

    import ray

    from mail_deduplicate_ray.stages import bucketing

    embs = clips_mel_embeddings(sf_dir)

    # query side: the n_queries lexicographically-smallest clip_ids,
    # fetched by parquet predicate pushdown (the _load_queries idiom,
    # ann.py) and featurized driver-side — never a corpus pass
    from mail_deduplicate_ray import codecs
    from mail_deduplicate_ray.functions import audio_dsp

    boundary = f"clip-{n_queries:08d}"
    t = pq.read_table(str(clips_path(sf_dir)),
                      columns=["clip_id", "bytes", "codec"],
                      filters=[("clip_id", "<", boundary)])
    qids: list[str] = []
    qvecs: list[np.ndarray] = []
    for cid, payload, codec in sorted(
            zip(t["clip_id"].to_pylist(), t["bytes"].to_pylist(),
                t["codec"].to_pylist()))[:n_queries]:
        try:
            pcm, sr = codecs.decode(payload, codec or None)
        except (ValueError, NotImplementedError):
            continue
        qids.append(cid)
        qvecs.append(audio_dsp.log_mel_embedding(pcm, sr))
    qmat = np.asarray(qvecs, dtype=np.float64)
    qref = ray.put((qids, qmat))

    def score(t: pa.Table, qref=qref) -> pa.Table:
        ids_, qm = ray.get(qref)
        t = t.filter(t["audio_ok"])
        n = t.num_rows
        if n == 0:
            return pa.table({"query_id": pa.array([], pa.string()),
                             "clip_id": pa.array([], pa.string()),
                             "sim_udeg": pa.array([], pa.int64())})
        col = t["embedding"].combine_chunks()
        emb = col.flatten().to_numpy(zero_copy_only=False) \
            .astype(np.float64).reshape(n, -1)
        cids = np.asarray(t["clip_id"].to_pylist())
        sims = emb @ qm.T  # (n, Q); both sides already L2-normalized
        out_q, out_c, out_s = [], [], []
        for qi, qid in enumerate(ids_):
            s = sims[:, qi]
            top = np.lexsort((cids, -s))[:k + 1]  # +1 covers self row
            for j in top:
                out_q.append(qid)
                out_c.append(str(cids[j]))
                # integer micro-sim keeps output hash-stable (cents rule)
                out_s.append(int(round(s[j] * 1_000_000)))
        return pa.table({"query_id": pa.array(out_q, pa.string()),
                         "clip_id": pa.array(out_c, pa.string()),
                         "sim_udeg": pa.array(out_s, pa.int64())})

    partials = embs.map_batches(score, batch_format="pyarrow")

    def merge(df):
        import pandas as pd
        df = df[df["query_id"] != df["clip_id"]]
        df = df.sort_values(["query_id", "sim_udeg", "clip_id"],
                            ascending=[True, False, True])
        out = df.groupby("query_id", sort=False).head(k).copy()
        out["rank"] = out.groupby("query_id", sort=False).cumcount() \
            .astype("int64")
        return pd.DataFrame({
            "query_id": out["query_id"],
            "rank": out["rank"],
            "clip_id": out["clip_id"],
            "sim_udeg": out["sim_udeg"].astype("int64")})

    return bucketing.grouped(partials, "query_id", merge, nbuckets=8) \
        .sort(["query_id", "rank"])


def clips_cdc_chunks(sf_dir: str) -> "ray.data.Dataset":
    """Storage-level dedup analysis via content-defined chunking
    (FastCDC gear-hash, ``functions/cdc.py``): chunk every clip's raw
    payload at content-determined boundaries, dedup chunks globally,
    and report the corpus storage profile — ONE summary row
    (total_chunks, unique_chunks, total_bytes, unique_bytes,
    dedup_ratio_pm, max_chunk_refs).  dedup_ratio_pm = per-mille of
    total bytes that survive chunk dedup (integer, engine-portable).

    Scale shape: chunking is an actor-pool ``map_batches`` (gear table
    built once per actor) that emits per-batch DISTINCT chunk partials
    (hash16, n_bytes, n_refs) — the shuffle moves ~24-byte chunk rows
    at payload_bytes/4 KB rows per clip, never payload bytes; a
    bucketed groupby folds partials into unique chunks, then a tiny
    all-reduce produces the single summary row.  The same chunk table
    is what a real dedup store would persist as its chunk index.
    Non-SQL (DuckDB cannot chunk binary) -> rows-only with kernel
    determinism/shift-resistance unit tests."""
    import numpy as np
    import pyarrow as pa

    from mail_deduplicate_ray.stages import bucketing

    class Chunker:
        def __init__(self) -> None:
            from mail_deduplicate_ray.functions import cdc
            self.cdc = cdc

        def __call__(self, t: "pa.Table") -> "pa.Table":
            import pandas as pd
            agg: dict[bytes, list[int]] = {}
            for buf in t["bytes"].to_pylist():
                if not buf:
                    continue
                lens, digests = self.cdc.chunk_payload(buf)
                for ln, dg in zip(lens.tolist(), digests):
                    slot = agg.get(dg)
                    if slot is None:
                        agg[dg] = [ln, 1]
                    else:
                        slot[1] += 1
            if not agg:
                return pa.table({"h": pa.array([], pa.binary(16)),
                                 "n_bytes": pa.array([], pa.int64()),
                                 "n_refs": pa.array([], pa.int64())})
            ks = list(agg.keys())
            v = np.asarray(list(agg.values()), np.int64)
            return pa.table({"h": pa.array(ks, pa.binary(16)),
                             "n_bytes": pa.array(v[:, 0], pa.int64()),
                             "n_refs": pa.array(v[:, 1], pa.int64())})

    _, hi = bucketing.pool_size()
    partials = read_clips(sf_dir).map_batches(
        Chunker, batch_format="pyarrow", batch_size=128,
        concurrency=(max(1, hi // 2), max(1, hi - 1)), num_cpus=1)

    def fold(df) -> "pa.Table":
        g = (df.groupby("h", sort=False, as_index=False)
               .agg(n_bytes=("n_bytes", "first"),
                    n_refs=("n_refs", "sum")))
        return pa.table({
            "total_chunks": pa.array([int(g["n_refs"].sum())], pa.int64()),
            "unique_chunks": pa.array([len(g)], pa.int64()),
            "total_bytes": pa.array(
                [int((g["n_bytes"] * g["n_refs"]).sum())], pa.int64()),
            "unique_bytes": pa.array([int(g["n_bytes"].sum())], pa.int64()),
            "max_chunk_refs": pa.array(
                [int(g["n_refs"].max()) if len(g) else 0], pa.int64())})

    per_bucket = bucketing.grouped(partials, "h", fold)

    def summarize(t: "pa.Table") -> "pa.Table":
        tot_b = sum(t["total_bytes"].to_pylist())
        uni_b = sum(t["unique_bytes"].to_pylist())
        return pa.table({
            "total_chunks": pa.array([sum(t["total_chunks"].to_pylist())],
                                     pa.int64()),
            "unique_chunks": pa.array([sum(t["unique_chunks"].to_pylist())],
                                      pa.int64()),
            "total_bytes": pa.array([tot_b], pa.int64()),
            "unique_bytes": pa.array([uni_b], pa.int64()),
            "dedup_ratio_pm": pa.array(
                [uni_b * 1000 // tot_b if tot_b else 0], pa.int64()),
            "max_chunk_refs": pa.array([max(t["max_chunk_refs"].to_pylist(),
                                            default=0)], pa.int64())})

    import ray as _ray
    import pyarrow as _pa
    parts = per_bucket.take_all()
    if not parts:
        empty = pa.table({c: pa.array([0], pa.int64()) for c in
                          ("total_chunks", "unique_chunks", "total_bytes",
                           "unique_bytes", "dedup_ratio_pm",
                           "max_chunk_refs")})
        return ray.data.from_arrow(empty)
    t = _pa.Table.from_pylist(parts)
    return ray.data.from_arrow(summarize(t))


def clips_tiered_dedup(sf_dir: str) -> "ray.data.Dataset":
    """TIERED deduplication cascade over the clips corpus — the
    production shape for web-scale dedup: run detectors cheapest-first
    and attribute every removal to the FIRST tier that catches it, so
    each expensive tier only ever sees the previous tier's survivors.

      tier 1 ``exact``       sha256(transcript) equality
      tier 2 ``normalized``  sha256(normalize_transcript) — lower +
                             markers stripped + whitespace collapsed
      tier 3 ``neardup``     MinHash-LSH cluster membership
      tier 4 ``unique``      survived everything (keeper = own id)

    Output: one row per clip — (clip_id, tier, keeper_id), keeper_id =
    the lexicographically-smallest member of the tier-group the clip
    fell into (ref semantics: G7's cascade fall-through re-expressed as
    detector tiers; the planted corpus kinds map 1:1 — ``exact`` kind
    -> tier 1, ``whitespace`` -> tier 2, ``nearedit`` -> tier 3).

    Scale shape: ONE transcript pass computes both hash keys (payload
    bytes are never read — column-pruned scan); tiers 1-2 are
    successive bucketed groupbys over 28-byte keys, each input
    pre-filtered to the prior tier's survivors so every shuffle
    shrinks; tier 3 re-reads only survivor rows via the bucketed
    ``semi_anti_join`` and runs the engine's own signature -> LSH ->
    connected-components path.  This is exactly why production
    pipelines tier: at 10^12 clips the near-dup shuffle runs over the
    exact-dedup survivors, typically 3-5x smaller.  Non-SQL end-to-end
    (tier 3 is MinHash) -> rows-only; tiers 1-2 are parity-tested
    against a pandas recompute and planted-kind attribution is
    asserted in tests."""
    import hashlib

    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from mail_deduplicate_ray.functions import normalize
    from mail_deduplicate_ray.pipelines import neardup
    from mail_deduplicate_ray.stages import bucketing, candidates, components
    from mail_deduplicate_ray.stages.joins import semi_anti_join

    def _sha_col(vals: list, ids: list) -> pa.Array:
        # empty transcripts are UNUSABLE rows (ref: M8 min-fields reject,
        # deduplicate.py) — salt with the clip_id so they never group
        return pa.array(
            [hashlib.sha256(v.encode()).hexdigest() if v else f"e:{i}"
             for v, i in zip(vals, ids)], pa.string())

    def keys(t: pa.Table) -> pa.Table:
        norm = normalize.normalize_transcript(t["transcript"])
        ids = t["clip_id"].to_pylist()
        return pa.table({
            "clip_id": t["clip_id"],
            "exact_key": _sha_col(
                [v or "" for v in t["transcript"].to_pylist()], ids),
            "norm_key": _sha_col(
                [v or "" for v in norm.to_pylist()], ids)})

    # COLUMN-PRUNED scan for the hash tiers: only (clip_id, transcript)
    # leave storage — the payload bytes are first read in tier 3
    from mail_deduplicate_ray.sources.clips_io import read_clips_fast
    meta = read_clips_fast(str(clips_path(sf_dir)),
                           columns=["clip_id", "transcript"])
    keyed = meta.map_batches(keys, batch_format="pyarrow")

    def t1(df) -> "pa.Table":
        keep = df.groupby("exact_key", sort=False)["clip_id"].transform("min")
        return pa.table({
            "clip_id": pa.array(df["clip_id"], pa.string()),
            "norm_key": pa.array(df["norm_key"], pa.string()),
            "exact_keeper": pa.array(keep, pa.string())})

    tier1 = bucketing.grouped(keyed, "exact_key", t1).materialize()

    tier_exact = tier1.map_batches(
        lambda t: pa.table({
            "clip_id": (m := t.filter(pc.not_equal(
                t["clip_id"], t["exact_keeper"])))["clip_id"],
            "tier": pa.array(["exact"] * m.num_rows, pa.string()),
            "keeper_id": m["exact_keeper"]}),
        batch_format="pyarrow")

    survivors1 = tier1.map_batches(
        lambda t: t.filter(pc.equal(t["clip_id"], t["exact_keeper"]))
                   .select(["clip_id", "norm_key"]),
        batch_format="pyarrow")

    def t2(df) -> "pa.Table":
        keep = df.groupby("norm_key", sort=False)["clip_id"].transform("min")
        return pa.table({
            "clip_id": pa.array(df["clip_id"], pa.string()),
            "norm_keeper": pa.array(keep, pa.string())})

    tier2 = bucketing.grouped(survivors1, "norm_key", t2).materialize()

    tier_norm = tier2.map_batches(
        lambda t: pa.table({
            "clip_id": (m := t.filter(pc.not_equal(
                t["clip_id"], t["norm_keeper"])))["clip_id"],
            "tier": pa.array(["normalized"] * m.num_rows, pa.string()),
            "keeper_id": m["norm_keeper"]}),
        batch_format="pyarrow")

    survivors2 = tier2.map_batches(
        lambda t: t.filter(pc.equal(t["clip_id"], t["norm_keeper"]))
                   .select(["clip_id"]),
        batch_format="pyarrow")

    # tier 3: the engine's FULL near-dup detector set over the remaining
    # survivors — decode + signature actor pools, every channel except
    # ``exact`` (tier 1 already removed byte-identical transcripts, so
    # the exact channel can only produce empty buckets)
    surv_rows = semi_anti_join(read_clips(sf_dir), survivors2,
                               "clip_id", "clip_id")

    cfg = DedupConfig()
    sigs = neardup.signatures_shared(surv_rows, cfg).materialize()
    usable = sigs.map_batches(
        lambda t: t.filter(pc.invert(t["rejected"])), batch_format="pyarrow")
    tier3_channels = tuple(c for c in candidates.ALL_CHANNELS
                           if c != "exact")
    deduped = candidates.dedup_edges(
        candidates.candidate_edges(usable, cfg, channels=tier3_channels))
    # substring rows are unverified CANDIDATES until the suffix-array
    # verify (the flagship's own rule, neardup.dedup_clips) — without it
    # minimizer-bucket collisions become false tier-3 removals
    deduped = candidates.verify_substring_edges(deduped, usable, cfg) \
        .materialize()
    edges, overflow = candidates.split_edges(deduped)
    if overflow:  # reported, never silent (the overflow contract)
        import logging
        logging.getLogger(__name__).warning(
            "clips_tiered_dedup: %d candidate rows dropped by bucket caps",
            overflow)
    labels = components.connected_components(edges, cfg.cc_max_rounds,
                                             method=cfg.cc_method)
    labeled = components.attach_cluster_ids(
        sigs.select_columns(["clip_id"]), labels)

    def t3(df) -> "pa.Table":
        keep = df.groupby("cluster_id", sort=False)["clip_id"].transform("min")
        dup = df["clip_id"].to_numpy() != keep.to_numpy()
        tier = np.where(dup, "neardup", "unique")
        return pa.table({
            "clip_id": pa.array(df["clip_id"], pa.string()),
            "tier": pa.array(tier.tolist(), pa.string()),
            "keeper_id": pa.array(keep, pa.string())})

    tier_near = bucketing.grouped(labeled, "cluster_id", t3)

    return tier_exact.union(tier_norm).union(tier_near).sort("clip_id")


def clips_dtw_pairs(sf_dir: str, max_hamming: int = 1,
                    max_cost_m: int = 120) -> "ray.data.Dataset":
    """Time-warp-robust audio near-dup pairs: SRP fingerprints over the
    log-mel embeddings generate candidates (pigeonhole-exact Hamming <=
    ``max_hamming``), and each candidate pair is VERIFIED by banded DTW
    alignment of the clips' fixed-frame energy envelopes — the verify
    step whole-clip signatures can't do, because DTW aligns stretched /
    padded copies frame-to-frame.  Output: (a_clip, b_clip, dtw_cost_m)
    — milli-cost, kept when <= ``max_cost_m``.

    Scale shape: ONE fused decode pass produces tiny per-clip rows
    (64-bit fingerprint; tens-of-frames envelope); candidates come
    from the banding shuffle (pipelines/fingerprints.py) at Hamming <=
    1 — measured on the tonal synth corpus, radius 1 keeps 92% of the
    same-recording truth pairs at 7.6x fewer candidates than radius 3
    (79.5k vs 603k at sf0.1; mel fingerprints collide across unrelated
    stationary tones, so the radius IS the candidate-volume knob);
    envelopes join onto pairs via two bucketed shuffle joins (never a
    broadcast of the corpus); a duration-ratio gate skips the DP for
    unalignable pairs and the DTW kernel runs per plausible pair inside
    ``map_batches`` on O(frames x band) cells.  Rows-only (DTW is not SQL); the kernel
    is unit-tested for stretch alignment and the planted exact /
    re-encode pairs are asserted near-zero in tests."""
    import numpy as np
    import pyarrow as pa

    from mail_deduplicate_ray.functions import simhash
    from mail_deduplicate_ray.pipelines.fingerprints import \
        exact_hamming_pairs
    from mail_deduplicate_ray.stages import bucketing
    from mail_deduplicate_ray.stages.joins import shuffle_join

    from mail_deduplicate_ray.stages.audio_stats import MelEnvelopeStage

    _, hi = bucketing.pool_size()
    pool = (max(1, hi // 2), max(1, hi - 1))

    # ONE decode pass -> (embedding, envelope) per clip; materialized so
    # the fingerprint/band stage and both join sides read the small
    # feature table instead of re-running (or doubling) the decode pool
    feats = read_clips(sf_dir).map_batches(
        MelEnvelopeStage, batch_format="pyarrow", batch_size=128,
        concurrency=pool, num_cpus=1
    ).map_batches(
        lambda t: t.filter(t["audio_ok"])
                   .select(["clip_id", "embedding", "envelope"]),
        batch_format="pyarrow").materialize()

    class Fingerprint:
        def __init__(self, dims: int = 48, seed: int = 0xD7A) -> None:
            self.srp = simhash.SRP(dims, 64, seed)

        def __call__(self, t: pa.Table) -> pa.Table:
            n = t.num_rows
            if n == 0:
                return pa.table({"clip_id": pa.array([], pa.string()),
                                 "fp": pa.array([], pa.uint64())})
            col = t["embedding"].combine_chunks()
            emb = col.flatten().to_numpy(zero_copy_only=False) \
                .astype(np.float64).reshape(n, -1)
            fp = self.srp.fingerprint(emb)
            return pa.table({"clip_id": t["clip_id"],
                             "fp": pa.array(fp.astype(np.uint64),
                                            pa.uint64())})

    fps = feats.map_batches(Fingerprint, batch_format="pyarrow",
                            batch_size=1024,
                            concurrency=bucketing.pool_size(0.5))
    pairs = exact_hamming_pairs(fps, "clip_id", "fp", max_hamming)

    envs = feats.select_columns(["clip_id", "envelope"])

    a_env = envs.map_batches(
        lambda t: t.rename_columns(["a_id", "env_a"]),
        batch_format="pyarrow")
    b_env = envs.map_batches(
        lambda t: t.rename_columns(["b_id", "env_b"]),
        batch_format="pyarrow")
    joined = shuffle_join(pairs, a_env, "a_id", "a_id")
    joined = shuffle_join(joined, b_env, "b_id", "b_id")

    def verify(t: pa.Table) -> pa.Table:
        from mail_deduplicate_ray.functions import audio_dsp
        a_ids = t["a_id"].to_pylist()
        b_ids = t["b_id"].to_pylist()
        costs = []
        for ea, eb in zip(t["env_a"].to_pylist(), t["env_b"].to_pylist()):
            la, lb = len(ea), len(eb)
            # duration gate BEFORE the DP: envelopes differing by >1.6x
            # cannot align under the band radius anyway (the tonal synth
            # corpus makes mel fingerprints collide across unrelated
            # clips, so this gate carries most of the pruning)
            if not la or not lb or max(la, lb) > 1.6 * min(la, lb):
                costs.append(10 ** 9)
                continue
            c = audio_dsp.dtw_cost(np.asarray(ea, np.float64),
                                   np.asarray(eb, np.float64))
            costs.append(int(round(c * 1000)) if np.isfinite(c)
                         else 10 ** 9)
        out = pa.table({
            "a_clip": pa.array(a_ids, pa.string()),
            "b_clip": pa.array(b_ids, pa.string()),
            "dtw_cost_m": pa.array(costs, pa.int64())})
        import pyarrow.compute as _pc
        return out.filter(_pc.less_equal(out["dtw_cost_m"], max_cost_m))

    return joined.map_batches(verify, batch_format="pyarrow") \
                 .sort(["a_clip", "b_clip"])


def clips_quality_gate(sf_dir: str) -> "ray.data.Dataset":
    """Audio corpus QUALITY GATE (rows-only query): per-clip clipping /
    tonality / SNR / duration screens with first-failure reasons —
    the curation pass a training pipeline runs before dedup.  Actor
    pool, payload dropped on exit; integer milli units."""
    from mail_deduplicate_ray.stages import bucketing
    from mail_deduplicate_ray.stages.audio_stats import QualityGateStage

    ds = read_clips(sf_dir)
    _, hi = bucketing.pool_size()
    out = ds.map_batches(
        QualityGateStage, batch_format="pyarrow", batch_size=128,
        concurrency=(max(1, hi // 2), max(1, hi - 1)), num_cpus=1)
    return out.select_columns(["clip_id", "audio_ok", "clipping_pm",
                               "flatness_m", "snr_mdb", "dur_ms_true",
                               "keep", "gate_reason"])


def clips_speed_perturb(sf_dir: str,
                        factors: tuple[float, ...] = (0.9, 1.1),
                        ) -> "ray.data.Dataset":
    """Speed-perturbation augmentation (the Kaldi 3-way recipe minus the
    identity copy): every decodable clip re-emitted at each tempo factor
    via the anti-aliased Blackman-sinc resampler
    (functions/audio_dsp.resample_sinc), re-encoded pcm_s16le.  Output
    rows are CLIPS_SCHEMA-compatible plus (orig_clip_id, factor_milli),
    so ``original ∪ augmented`` feeds any clips pipeline directly — and
    the flagship's stretch channel must re-merge each copy with its
    source (test_pipeline: an INDEPENDENT-resampler validation of that
    channel).  Scale shape: pure actor-pool map, zero shuffle; output
    bytes ~= sum(1/f) x input bytes, streamed block by block."""
    from mail_deduplicate_ray.stages import bucketing
    from mail_deduplicate_ray.stages.audio_stats import SpeedPerturbStage

    ds = read_clips(sf_dir)
    _, hi = bucketing.pool_size()
    return ds.map_batches(
        SpeedPerturbStage, fn_constructor_kwargs={"factors": factors},
        batch_format="pyarrow", batch_size=64,
        concurrency=(max(1, hi // 2), max(1, hi - 1)), num_cpus=1)


def clips_speed_perturb_stats(sf_dir: str) -> "ray.data.Dataset":
    """queries() surface for the augmentation op: payload dropped (the
    dehydration rule), one metadata row per augmented clip."""
    return clips_speed_perturb(sf_dir).drop_columns(["bytes"]) \
        .sort(["clip_id"])
