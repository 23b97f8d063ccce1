"""Unified MULTIMODAL tiered dedup — one tier-attributed cascade over the
audio + image + video corpora (VERDICT r3 item 8: "the shape a real
100 TB training-data run wants").

Every asset gets a namespaced id (``a:``/``i:``/``v:`` prefix) and one
output row (asset_id, modality, tier, keeper_id); the tier is the FIRST
detector that catches the asset, so each later (more expensive) stage
only ever shuffles the previous tier's survivors:

  tier 1 ``exact_bytes``  sha256 of the raw payload — ONE cross-modality
                          bucketed groupby over 35-byte key rows (byte-
                          identical re-uploads; the only tier where all
                          three modalities share a shuffle)
  tier 2 ``content_key``  modality-cheap exact content keys:
                          audio  -> normalized-transcript sha
                          image  -> dHash equality (catches lossless
                                    cross-container re-encodes)
                          video  -> pooled frame-SRP equality
  tier 3 ``neardup``      modality near-dup machinery over survivors:
                          audio  -> the flagship's full channel set
                                    (minhash/audio/containment/substring/
                                    stretch) + connected components
                          image  -> dHash + pHash pigeonhole pairs -> CC
                          video  -> SRP Hamming<=3 pairs -> CC
  tier 4 ``unique``       survived everything (keeper = own id)

Scale shape: survivor filtering between tiers is ALWAYS a bucketed
``semi_anti_join`` (survivors are MOST of the corpus at 10^12 scale —
a driver-side id set would be the anti-pattern); image/video payload
bytes are decoded exactly ONCE (the same fingerprint pass feeds the
tier-2 equality key and the tier-3 Hamming pairs); the AUDIO decode —
the expensive stage — runs only on tier-2 survivors, which is exactly
why production pipelines tier.  Decode-failed assets get a salted
tier-2 key (never groups) and reach tier 4 as ``unique`` — the
rejection analogue of M8: unusable content never deduplicates.  All
groupbys are bucketed key shuffles; CC is the engine's distributed
min-label machinery.  Rows-only query (tier 3 is MinHash/SRP);
planted-kind -> tier attribution is asserted per modality in the
cross-modal attribution test.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from mail_deduplicate_ray.stages import bucketing
from mail_deduplicate_ray.stages.joins import semi_anti_join


def _coalesce(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Block-count control for the cascade's TINY key/edge tables.

    The payload reads arrive in hundreds of small blocks (the decode
    pools want that parallelism), but every downstream table here is a
    few dozen bytes per row — and Ray's sort-based shuffles launch
    map+reduce tasks PER INPUT BLOCK, so letting the key tables inherit
    payload block counts snowballs through the unions (measured: the
    final sort over 1,044 inherited blocks spent 241 s of pure task
    scheduling on 21k rows; coalesced, the whole cascade runs in a
    fraction of that).  repartition(shuffle=False) is a driver-side
    block split/merge, not a data shuffle."""
    return ds.repartition(bucketing.default_nbuckets())


def _sha_table(t: pa.Table, id_col: str, prefix: str) -> pa.Table:
    arr = t["bytes"].combine_chunks()
    ids = t[id_col].to_pylist()
    keys = [hashlib.sha256(arr[i].as_py() or b"").hexdigest()
            for i in range(t.num_rows)]
    return pa.table({
        "asset_id": pa.array([f"{prefix}:{i}" for i in ids], pa.string()),
        "key": pa.array(keys, pa.string())})


def _dedup_tier(keyed: "ray.data.Dataset", tier: str,
                carry: list[str]) -> tuple["ray.data.Dataset",
                                           "ray.data.Dataset"]:
    """One cascade step: bucketed groupby on ``key`` -> (attributed
    non-keepers, surviving keepers with ``carry`` columns)."""
    def part(df) -> pa.Table:
        keep = df.groupby("key", sort=False)["asset_id"].transform("min")
        cols = {"asset_id": pa.array(df["asset_id"], pa.string()),
                "keeper_id": pa.array(keep, pa.string())}
        for c in carry:
            cols[c] = pa.array(df[c])
        return pa.table(cols)

    grouped = bucketing.grouped(_coalesce(keyed), "key", part).materialize()
    caught = grouped.map_batches(
        lambda t: pa.table({
            "asset_id": (m := t.filter(pc.not_equal(
                t["asset_id"], t["keeper_id"])))["asset_id"],
            "tier": pa.array([tier] * m.num_rows, pa.string()),
            "keeper_id": m["keeper_id"]}),
        batch_format="pyarrow")
    survivors = grouped.map_batches(
        lambda t: t.filter(pc.equal(t["asset_id"], t["keeper_id"]))
                   .select(["asset_id", *carry]),
        batch_format="pyarrow")
    return caught, survivors


def _cc_tier(edges: "ray.data.Dataset",
             survivors: "ray.data.Dataset") -> "ray.data.Dataset":
    """Tier-3/4 attribution: connected components over verified near-dup
    edges; cluster non-keepers -> ``neardup``, everything else ->
    ``unique``."""
    from mail_deduplicate_ray.stages import components
    labels = components.connected_components(edges)
    labeled = components.attach_cluster_ids(
        _coalesce(survivors.select_columns(["asset_id"])), labels,
        key="asset_id")

    def part(df) -> pa.Table:
        keep = df.groupby("cluster_id", sort=False)["asset_id"] \
            .transform("min")
        dup = df["asset_id"].to_numpy() != keep.to_numpy()
        return pa.table({
            "asset_id": pa.array(df["asset_id"], pa.string()),
            "tier": pa.array(np.where(dup, "neardup", "unique").tolist(),
                             pa.string()),
            "keeper_id": pa.array(keep, pa.string())})

    return bucketing.grouped(labeled, "cluster_id", part)


def _retag(ds: "ray.data.Dataset", col: str,
           prefix: str) -> "ray.data.Dataset":
    return ds.map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index(col), "asset_id",
            pc.binary_join_element_wise(
                pa.array([prefix] * t.num_rows), pc.cast(t[col], pa.string()),
                ":")),
        batch_format="pyarrow")


def _fp_key(col: str, ok_col: str):
    """Tier-2 key from a uint64 fingerprint; decode-failed rows get a
    salted key (own id) so they flow through without grouping."""
    def f(t: pa.Table) -> pa.Table:
        return pa.table({
            "asset_id": t["asset_id"],
            "key": pc.if_else(
                t[ok_col], pc.cast(t[col], pa.string()),
                pc.binary_join_element_wise(
                    pa.array(["x"] * t.num_rows), t["asset_id"], ":"))})
    return f


def corpus_tiered_dedup(sf_dir: str) -> "ray.data.Dataset":
    """One row per asset across ALL modalities: (asset_id, modality,
    tier, keeper_id) — see module docstring for the cascade."""
    from mail_deduplicate_ray.pipelines import clips as clips_mod
    from mail_deduplicate_ray.pipelines import images as images_mod
    from mail_deduplicate_ray.pipelines import videos as videos_mod
    from mail_deduplicate_ray.pipelines.fingerprints import \
        exact_hamming_pairs
    from mail_deduplicate_ray.sources.clips_io import (payload_batch_size,
                                                       read_clips_fast)

    a_path = clips_mod.clips_path(sf_dir)
    i_path = images_mod.images_path(sf_dir)
    v_path = videos_mod.videos_path(sf_dir)

    # ---- tier 1: byte-sha over the UNION (one shuffle, all modalities)
    a_keys = read_clips_fast(str(a_path), columns=["clip_id", "bytes"]) \
        .map_batches(lambda t: _sha_table(t, "clip_id", "a"),
                     batch_format="pyarrow",
                     batch_size=payload_batch_size(a_path))
    i_keys = ray.data.read_parquet(str(i_path),
                                   columns=["img_id", "bytes"]) \
        .map_batches(lambda t: _sha_table(t, "img_id", "i"),
                     batch_format="pyarrow")
    v_keys = ray.data.read_parquet(str(v_path),
                                   columns=["vid_id", "bytes"]) \
        .map_batches(lambda t: _sha_table(t, "vid_id", "v"),
                     batch_format="pyarrow")
    tier1_caught, surv1 = _dedup_tier(a_keys.union(i_keys, v_keys),
                                      "exact_bytes", carry=[])
    surv1 = surv1.materialize()

    # ---- tier 2 keys (per modality, survivors only — bucketed semi
    # joins, never a driver-side id set: survivors are MOST of the
    # corpus at 10^12 scale)
    # audio: normalized-transcript sha; empty transcripts salt with the
    # id (M8: unusable content never groups)
    from mail_deduplicate_ray.functions import normalize

    def a_norm_keys(t: pa.Table) -> pa.Table:
        norm = normalize.normalize_transcript(t["transcript"]).to_pylist()
        ids = t["clip_id"].to_pylist()
        return pa.table({
            "asset_id": pa.array([f"a:{i}" for i in ids], pa.string()),
            "key": pa.array(
                [hashlib.sha256(v.encode()).hexdigest() if v else f"e:{i}"
                 for v, i in zip(norm, ids)], pa.string())})

    a2 = semi_anti_join(
        _coalesce(read_clips_fast(str(a_path),
                                  columns=["clip_id", "transcript"])
                  .map_batches(a_norm_keys, batch_format="pyarrow")),
        surv1, "asset_id", "asset_id")

    # image/video fingerprints: computed ONCE (the same decode pass
    # feeds tier-2 equality and tier-3 Hamming pairs), materialized
    # small (id + fingerprints + ok flag per asset); decode-failed
    # assets keep flowing via the salted key
    i_fps = _coalesce(_retag(images_mod.image_hashes(sf_dir), "img_id",
                             "i")).materialize()
    v_fps = _coalesce(_retag(videos_mod.video_signatures(sf_dir), "vid_id",
                             "v")).materialize()

    i2 = semi_anti_join(
        i_fps.map_batches(_fp_key("dhash", "decode_ok"),
                          batch_format="pyarrow"),
        surv1, "asset_id", "asset_id")
    v2 = semi_anti_join(
        v_fps.map_batches(_fp_key("vsig", "sig_ok"),
                          batch_format="pyarrow"),
        surv1, "asset_id", "asset_id")

    tier2_caught, surv2 = _dedup_tier(a2.union(i2, v2), "content_key",
                                      carry=[])
    surv2 = surv2.materialize()

    # ---- tier 3: modality near-dup over tier-2 survivors
    # audio: the flagship's own channel set (no exact channel — tier 1/2
    # already removed byte- and transcript-identical copies); rejected
    # clips stay in ``sigs`` and fall through to ``unique``
    from mail_deduplicate_ray.config import DedupConfig
    from mail_deduplicate_ray.pipelines import neardup
    from mail_deduplicate_ray.stages import candidates

    def tag_clip(t: pa.Table) -> pa.Table:
        return t.set_column(
            t.schema.get_field_index("clip_id"), "clip_id",
            pc.binary_join_element_wise(
                pa.array(["a"] * t.num_rows), t["clip_id"], ":"))

    # select audio survivors by UNTAGGED clip_id and tag AFTER the
    # signature stage: signature columns are id-independent, and with
    # original ids the shared signature checkpoint
    # (neardup.signatures_shared, $MDR_SIG_CKPT_ROOT) hits rows the
    # flagship already decoded in the same session
    a_ids = surv2.map_batches(
        lambda t: pa.table({"clip_id": pc.utf8_slice_codeunits(
            t.filter(pc.starts_with(t["asset_id"], pattern="a:"))
            ["asset_id"], 2, 2_147_483_647)}),
        batch_format="pyarrow")
    a_rows = semi_anti_join(read_clips_fast(str(a_path)), a_ids,
                            "clip_id", "clip_id")
    cfg = DedupConfig()
    sigs = neardup.signatures_shared(a_rows, cfg).materialize() \
        .map_batches(tag_clip, batch_format="pyarrow")
    usable = sigs.map_batches(
        lambda t: t.filter(pc.invert(t["rejected"])),
        batch_format="pyarrow")
    deduped = candidates.dedup_edges(candidates.candidate_edges(
        usable, cfg,
        channels=tuple(c for c in cfg.channels if c != "exact")))
    deduped = candidates.verify_substring_edges(deduped, usable, cfg) \
        .materialize()
    a_edges, overflow = candidates.split_edges(deduped)
    if overflow:
        import logging
        logging.getLogger(__name__).warning(
            "corpus_tiered_dedup: %d candidate rows dropped by caps",
            overflow)
    a_surv = sigs.map_batches(
        lambda t: t.select(["clip_id"]).rename_columns(["asset_id"]),
        batch_format="pyarrow")

    # image/video: reuse the materialized fingerprints; edges only from
    # decode-ok rows, but ALL survivor ids enter CC attribution (failed
    # decodes are edgeless -> unique)
    i_surv = _coalesce(semi_anti_join(i_fps, surv2, "asset_id",
                                      "asset_id")).materialize()
    v_surv = _coalesce(semi_anti_join(v_fps, surv2, "asset_id",
                                      "asset_id")).materialize()
    i_ok = i_surv.map_batches(lambda t: t.filter(t["decode_ok"]),
                              batch_format="pyarrow")
    v_ok = v_surv.map_batches(lambda t: t.filter(t["sig_ok"]),
                              batch_format="pyarrow")

    def as_edges(t: pa.Table) -> pa.Table:
        return t.rename_columns(["src", "dst"])

    i_edges = exact_hamming_pairs(i_ok, "asset_id", "phash", 7).union(
        exact_hamming_pairs(i_ok, "asset_id", "dhash", 3)).map_batches(
        as_edges, batch_format="pyarrow")
    v_edges = exact_hamming_pairs(v_ok, "asset_id", "vsig", 3) \
        .map_batches(as_edges, batch_format="pyarrow")

    tier34 = _cc_tier(
        _coalesce(a_edges.map_batches(
            lambda t: t.select(["src", "dst"]),
            batch_format="pyarrow")).union(i_edges, v_edges),
        a_surv.union(i_surv.select_columns(["asset_id"]),
                     v_surv.select_columns(["asset_id"])))

    out = _coalesce(tier1_caught.union(tier2_caught, tier34))
    return out.map_batches(
        lambda t: t.append_column("modality", pc.utf8_slice_codeunits(
            t["asset_id"], 0, 1)),
        batch_format="pyarrow").sort("asset_id")
