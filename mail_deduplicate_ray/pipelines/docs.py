"""Document-table operators (the SQL-checkable query surface).

Every function takes ``sf_dir`` and returns a Ray Dataset whose column
names match the paired DuckDB oracle in ``__ray_entry__.py`` exactly
(the driver hash-compares values after sorting columns by name).

Scale shape: projections are pruned at the read (`columns=[...]`), content
hashes are computed vectorized in map_batches, and heavy columns (text)
are dropped BEFORE any shuffle so the groupby moves scalars only.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from mail_deduplicate_ray.sources.clips_io import read_parquet_clean

from mail_deduplicate_ray.functions import normalize, shingles, simhash, textstats
from mail_deduplicate_ray.functions.textstats import (bpe_ish_token_counts,
                                                      quality_table,
                                                      token_counts)

REGEXP_PATTERN = r"\bmerge\b.*\bjoin\b"  # shared with the oracle


def _docs(sf_dir: str, columns: list[str]) -> "ray.data.Dataset":
    return read_parquet_clean(f"{sf_dir}/documents.parquet", columns=columns)


def _sha256_col(t: pa.Table, src: str, out: str) -> pa.Table:
    vals = [hashlib.sha256((v or "").encode()).hexdigest()
            for v in t[src].to_pylist()]
    return t.append_column(out, pa.array(vals, pa.string()))


def _dedup_by(ds: "ray.data.Dataset", key_fn) -> "ray.data.Dataset":
    """hash-partitioned exact dedup: key in map_batches (text dropped before
    the shuffle), groupby(key) -> (keeper_id, n_copies).
    Ref semantics: G1 group-by-hash (deduplicate.py:1009) + min-id winner
    (deduplicate.py:1168)."""
    keyed = ds.map_batches(key_fn, batch_format="pyarrow")

    def per_group(g: pa.Table) -> pa.Table:
        return pa.table({
            "keeper_id": pa.array([pc.min(g["doc_id"]).as_py()], pa.int64()),
            "n_copies": pa.array([g.num_rows], pa.int64()),
        })

    return keyed.groupby("text_key").map_groups(per_group,
                                                batch_format="pyarrow")


def exact_dedup_docs(sf_dir: str) -> "ray.data.Dataset":
    def key(t: pa.Table) -> pa.Table:
        t = _sha256_col(t, "text", "text_key")
        return t.select(["doc_id", "text_key"])
    return _dedup_by(_docs(sf_dir, ["doc_id", "text"]), key)


def normalized_dedup_docs(sf_dir: str) -> "ray.data.Dataset":
    def key(t: pa.Table) -> pa.Table:
        norm = normalize.collapse_whitespace(pc.utf8_lower(t["text"]))
        t = t.append_column("text_norm", norm)
        t = _sha256_col(t, "text_norm", "text_key")
        return t.select(["doc_id", "text_key"])
    return _dedup_by(_docs(sf_dir, ["doc_id", "text"]), key)


def doc_hashes(sf_dir: str) -> "ray.data.Dataset":
    """--hash-only analogue (ref: cli.py:656-674): signatures, stop."""
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        lambda t: _sha256_col(t, "text", "text_sha").select(
            ["doc_id", "text_sha"]),
        batch_format="pyarrow")


def keep_biggest_per_lang(sf_dir: str) -> "ray.data.Dataset":
    """select-biggest (X8) over lang groups: rows with the group-max
    n_chars, ties kept (ref: strategy.py:146-153)."""
    ds = _docs(sf_dir, ["doc_id", "lang", "n_chars"])

    def per_group(g: pa.Table) -> pa.Table:
        mx = pc.max(g["n_chars"])
        return g.filter(pc.equal(g["n_chars"], mx))

    return ds.groupby("lang").map_groups(per_group, batch_format="pyarrow")


def regexp_filter_docs(sf_dir: str) -> "ray.data.Dataset":
    """select-matching-path analogue (X9, ref: strategy.py:156-167)."""
    return _docs(sf_dir, ["doc_id", "lang", "text"]).map_batches(
        lambda t: t.filter(pc.match_substring_regex(t["text"], REGEXP_PATTERN))
                   .select(["doc_id", "lang"]),
        batch_format="pyarrow")


def token_stats_per_lang(sf_dir: str) -> "ray.data.Dataset":
    """Partial-aggregate pattern: per-batch (lang, n_docs, sum_tokens,
    sum_chars) partials, then a tiny groupby-sum — the shuffle moves one
    row per (batch, lang), not one per document."""
    ds = _docs(sf_dir, ["doc_id", "lang", "text", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.append_column("n_tokens", pc.cast(token_counts(t["text"]),
                                                pa.int64()))
        t = t.select(["lang", "n_tokens", "n_chars"])
        g = t.group_by("lang").aggregate(
            [("n_tokens", "sum"), ("n_chars", "sum"), ("lang", "count")])
        return pa.table({
            "lang": g["lang"],
            "n_docs": pc.cast(g["lang_count"], pa.int64()),
            "sum_tokens": pc.cast(g["n_tokens_sum"], pa.int64()),
            "sum_chars": pc.cast(g["n_chars_sum"], pa.int64()),
        })

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def final(g: pa.Table) -> pa.Table:
        return pa.table({
            "lang": [g["lang"][0].as_py()],
            "n_docs": pa.array([pc.sum(g["n_docs"]).as_py()], pa.int64()),
            "sum_tokens": pa.array([pc.sum(g["sum_tokens"]).as_py()], pa.int64()),
            "sum_chars": pa.array([pc.sum(g["sum_chars"]).as_py()], pa.int64()),
        })

    return partials.groupby("lang").map_groups(final, batch_format="pyarrow")


def quality_scores(sf_dir: str) -> "ray.data.Dataset":
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        lambda t: quality_table(t).select(
            ["doc_id", "n_tokens", "n_stopwords", "n_punct"]),
        batch_format="pyarrow")


def bpe_token_counts(sf_dir: str) -> "ray.data.Dataset":
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        lambda t: t.append_column(
            "n_bpe_tokens", pc.cast(bpe_ish_token_counts(t["text"]), pa.int64())
        ).select(["doc_id", "n_bpe_tokens"]),
        batch_format="pyarrow")


def lang_id_docs(sf_dir: str) -> "ray.data.Dataset":
    def f(t: pa.Table) -> pa.Table:
        pred = textstats.lang_id(t["text"].to_pylist())
        return (t.select(["doc_id", "lang"])
                 .append_column("lang_pred", pa.array(pred, pa.string())))
    return _docs(sf_dir, ["doc_id", "lang", "text"]).map_batches(
        f, batch_format="pyarrow")


def doc_fingerprints(sf_dir: str) -> "ray.data.Dataset":
    def f(t: pa.Table) -> pa.Table:
        fps = [textstats.rolling_fingerprint(v or "")
               for v in t["text"].to_pylist()]
        return (t.select(["doc_id"])
                 .append_column("fingerprint", pa.array(fps, pa.uint64())))
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow")


def simhash_docs(sf_dir: str) -> "ray.data.Dataset":
    def f(t: pa.Table) -> pa.Table:
        hs = [simhash.token_simhash(shingles.token_hashes((v or "").lower()))
              for v in t["text"].to_pylist()]
        return (t.select(["doc_id"])
                 .append_column("simhash", pa.array(hs, pa.uint64())))
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow")


def minhash_clusters_docs(sf_dir: str) -> "ray.data.Dataset":
    """MinHash-LSH near-dup clustering of the documents table (doc_id plays
    clip_id, text plays transcript) — full candidate->verify->CC path."""
    from mail_deduplicate_ray.config import DedupConfig
    from mail_deduplicate_ray.stages import bucketing, candidates, components
    from mail_deduplicate_ray.stages.signature import SignatureStage

    cfg = DedupConfig(key_columns=("lang",), minimal_fields=1)
    ds = _docs(sf_dir, ["doc_id", "lang", "text"]).map_batches(
        lambda t: pa.table({
            "clip_id": pc.cast(t["doc_id"], pa.string()),
            "sr_hz": pa.nulls(t.num_rows, pa.int32()),
            "dur_ms": pa.nulls(t.num_rows, pa.int32()),
            "codec": t["lang"],
            "transcript": t["text"],
            "lang": t["lang"],
        }), batch_format="pyarrow")
    sigs = ds.map_batches(SignatureStage, fn_constructor_args=(cfg,),
                          batch_format="pyarrow", batch_size=2048,
                          concurrency=bucketing.pool_size()).materialize()
    usable = sigs.map_batches(
        lambda t: t.filter(pc.invert(t["rejected"])), batch_format="pyarrow")
    raw = candidates.candidate_edges(usable, cfg, channels=("minhash",))
    edges = candidates.dedup_edges(raw)
    labels = components.connected_components(edges, cfg.cc_max_rounds)
    rows = sigs.select_columns(["clip_id"])
    out = components.attach_cluster_ids(rows, labels)
    return out.map_batches(
        lambda t: pa.table({
            "doc_id": pc.cast(t["clip_id"], pa.int64()),
            "cluster_id": t["cluster_id"]}),
        batch_format="pyarrow")


class _NgramJaccardScorer:
    """Actor-pool stage for EXACT n-gram-set Jaccard pairs: the corpus'
    inverted trigram index is BUILT ONCE on the driver and broadcast via
    ray.put; each actor's __init__ just ray.gets the numpy arrays
    (zero-copy reads from the object store — building per actor cost a
    multi-second 10M-element argsort times the pool size).  Each batch
    emits (a_id, b_id) for pairs with set-Jaccard >= threshold (a < b, so
    each unordered pair appears once).

    This is the exact-verify counterpart of the MinHash channel — at
    10^12 scale pair GENERATION goes through LSH buckets
    (stages/candidates.py) and this kernel only verifies candidates."""

    def __init__(self, index_ref, threshold: float) -> None:
        import ray as _ray
        (self.ids, self.sizes, self.uniq, self.starts,
         self.postings) = _ray.get(index_ref)
        self.threshold = threshold

    def __call__(self, t: pa.Table) -> pa.Table:
        import numpy as np
        n_corpus = len(self.ids)
        a_out, b_out = [], []
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        for grams, a_id in zip(_gram_sets(t), ids):
            na = len(grams)
            if na == 0:
                continue
            # postings walk: exact intersection COUNT against every corpus
            # doc in one vectorized pass (no per-pair loop).  Per-DOC, not
            # per-batch-matrix on purpose: common trigrams have posting
            # lists touching most of the corpus, so a batched gather
            # materializes ~10^9-element temporaries and runs 15x slower
            # than this cache-resident per-doc walk (measured).
            if not len(self.uniq):
                continue
            loc = np.minimum(np.searchsorted(self.uniq, grams),
                             len(self.uniq) - 1)
            hits = loc[self.uniq[loc] == grams]
            if not len(hits):
                continue
            sel = np.concatenate([
                self.postings[self.starts[lo]:self.starts[lo + 1]]
                for lo in hits])
            counts = np.bincount(sel, minlength=n_corpus)
            union = na + self.sizes - counts
            # same float expression as the oracle SQL (i*1.0/union >= t)
            ok = (counts / union >= self.threshold) & (self.ids > a_id)
            js = np.flatnonzero(ok)
            a_out.extend([int(a_id)] * len(js))
            b_out.extend(self.ids[js].tolist())
        return pa.table({"a_id": pa.array(a_out, pa.int64()),
                         "b_id": pa.array(b_out, pa.int64())})


def _gram_sets(t: pa.Table, k: int = 3):
    """Per-doc sorted, unique uint64 trigram hashes via the deterministic
    rolling-hash kernel (process-independent — actors and driver must
    agree).  Gram definition mirrors the oracle SQL exactly on the ASCII
    corpus: substr(text, i, k) for i in 1..max(len-k+1, 1) — a doc
    shorter than k contributes itself (shingle_hashes' <k whole-string
    shingle).  An EMPTY text mirrors the oracle too: substr('',1,3) = ''
    gives the gram set {''} (hashed as the bare FNV offset), so two empty
    docs pair at Jaccard 1.0 — shingle_hashes alone would return no grams
    and silently drop those pairs."""
    import numpy as np

    from mail_deduplicate_ray.functions.shingles import _OFFS
    empty = np.array([_OFFS], dtype=np.uint64)
    for text in t["text"].to_pylist():
        h = shingles.shingle_hashes(text or "", k)
        yield h if len(h) else empty


class _SubstringVerifier:
    """Actor stage: verifies candidate (container_class, contained_class)
    pairs by SUFFIX-ARRAY search (functions/suffixarray.py — the
    north-star's exact-substring detector), then expands each verified
    class pair to its (container doc, contained doc) cross product.
    Container suffix arrays are memoized per actor — at scale the same
    container is probed by many patterns."""

    def __init__(self, corpus_ref) -> None:
        import ray as _ray
        self.texts, self.members = _ray.get(corpus_ref)
        self._sa: dict[int, "np.ndarray"] = {}

    def __call__(self, t: pa.Table) -> pa.Table:
        import numpy as np

        from mail_deduplicate_ray.functions.suffixarray import (sa_contains,
                                                                suffix_array)
        a_out, b_out = [], []
        for big, small in zip(t["big"].to_numpy(zero_copy_only=False),
                              t["small"].to_numpy(zero_copy_only=False)):
            big, small = int(big), int(small)
            sa = self._sa.get(big)
            if sa is None:
                sa = suffix_array(np.frombuffer(self.texts[big], np.uint8))
                self._sa[big] = sa
            if sa_contains(self.texts[big], sa, self.texts[small]):
                bm, sm = self.members[big], self.members[small]
                a_out.append(np.repeat(bm, len(sm)))
                b_out.append(np.tile(sm, len(bm)))
        cat = (np.concatenate(a_out) if a_out
               else np.empty(0, np.int64))
        catb = (np.concatenate(b_out) if b_out
                else np.empty(0, np.int64))
        return pa.table({"a_id": pa.array(cat, pa.int64()),
                         "b_id": pa.array(catb, pa.int64())})


def substring_pairs(sf_dir: str, min_len: int = 64,
                    k: int = 16) -> "ray.data.Dataset":
    """(a_id, b_id) pairs where doc b's text occurs VERBATIM inside doc
    a's strictly longer text and len(b) >= min_len — exact-substring
    containment (the north-star's suffix-array detector; ref analogue:
    byte-identical grouping mail.py:423-439 generalized to containment).

    Shape: winnowing-minimizer candidate buckets (window w = min_len-k+1,
    so any valid pattern provably shares >= 1 minimizer with its
    container — see functions/shingles.minimizers) -> groupby(bucket)
    pair-gen over DISTINCT text classes -> suffix-array verify in an
    actor pool -> expand classes to doc pairs.  Texts are ASCII in this
    corpus, so byte and char lengths agree with the SQL oracle.  At
    10^12 scale the class texts join back by key instead of the ray.put
    broadcast, and hot minimizer buckets salt exactly like the LSH
    channels (stages/candidates._bucket_slices)."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from mail_deduplicate_ray.functions.shingles import minimizers
    w = min_len - k + 1
    corpus = pq.read_table(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    ids = corpus["doc_id"].to_numpy(zero_copy_only=False)
    codes, uniq = pd.factorize(
        pd.Series([v or "" for v in corpus["text"].to_pylist()]))
    texts = [u.encode("utf-8") for u in uniq]
    members = [ids[np.flatnonzero(codes == c)].astype(np.int64)
               for c in range(len(uniq))]
    import ray as _ray
    ref = _ray.put((texts, members))

    lens = np.array([len(b) for b in texts], dtype=np.int64)
    eligible = np.flatnonzero(lens >= min_len)  # both sides need >= min_len
    cls_tbl = pa.table({
        "cls": pa.array(eligible, pa.int64()),
        "n_bytes": pa.array(lens[eligible], pa.int64()),
        "text": pa.array([uniq[c] for c in eligible], pa.string()),
    })

    def explode(t: pa.Table) -> pa.Table:
        buckets, cls_out, len_out = [], [], []
        for cls, nb, txt in zip(t["cls"].to_numpy(zero_copy_only=False),
                                t["n_bytes"].to_numpy(zero_copy_only=False),
                                t["text"].to_pylist()):
            mins = minimizers(np.frombuffer(txt.encode("utf-8"), np.uint8),
                              k, w)
            buckets.append(mins)
            cls_out.append(np.full(len(mins), cls, np.int64))
            len_out.append(np.full(len(mins), nb, np.int64))
        return pa.table({
            "bucket": pa.array(np.concatenate(buckets) if buckets
                               else np.empty(0, np.uint64)),
            "cls": pa.array(np.concatenate(cls_out) if cls_out
                            else np.empty(0, np.int64)),
            "n_bytes": pa.array(np.concatenate(len_out) if len_out
                                else np.empty(0, np.int64)),
        })

    def pair_gen(g: pa.Table) -> pa.Table:
        n_bytes = g["n_bytes"].to_numpy(zero_copy_only=False)
        cls = g["cls"].to_numpy(zero_copy_only=False)
        order = np.argsort(n_bytes, kind="stable")
        nb, cl = n_bytes[order], cls[order]
        i, j = np.triu_indices(len(cl), k=1)
        strict = nb[i] < nb[j]  # contained must be STRICTLY shorter
        return pa.table({"big": pa.array(cl[j][strict], pa.int64()),
                         "small": pa.array(cl[i][strict], pa.int64())})

    n_blocks = max(2, min(64, len(eligible)))
    cand = (ray.data.from_arrow(cls_tbl).repartition(n_blocks)
            .map_batches(explode, batch_format="pyarrow")
            .groupby("bucket").map_groups(pair_gen, batch_format="pyarrow"))
    # a class pair can surface from many shared minimizers: verify once
    distinct = cand.groupby(["big", "small"]).map_groups(
        lambda t: t.slice(0, 1), batch_format="pyarrow")
    from mail_deduplicate_ray.stages.bucketing import pool_size
    _, hi = pool_size()
    return distinct.map_batches(
        _SubstringVerifier, fn_constructor_args=(ref,),
        batch_format="pyarrow", batch_size=64,
        concurrency=(1, max(2, hi // 2)))


def ngram_jaccard_pairs(sf_dir: str,
                        threshold: float = 0.6) -> "ray.data.Dataset":
    """(a_id, b_id) pairs with exact character-trigram-set Jaccard >=
    threshold (the n-gram-Jaccard dedup family member with a full DuckDB
    oracle; MinHash estimates the same quantity at scale)."""
    import numpy as np
    import pyarrow.parquet as pq
    corpus = pq.read_table(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    ids = corpus["doc_id"].to_numpy(zero_copy_only=False)
    sets = list(_gram_sets(corpus))
    # inverted index gram -> posting slice of corpus doc positions,
    # built once here, shipped to every actor as read-only plasma arrays
    sizes = np.array([len(s) for s in sets], dtype=np.int64)
    flat = np.concatenate(sets) if sets else np.empty(0, np.uint64)
    docpos = np.repeat(np.arange(len(sets)), sizes)
    order = np.argsort(flat, kind="stable")
    uniq, starts = np.unique(flat[order], return_index=True)
    import ray as _ray
    ref = _ray.put((ids, sizes, uniq, np.append(starts, len(flat)),
                    docpos[order]))
    from mail_deduplicate_ray.stages.bucketing import pool_size
    # pool no bigger than the number of batches it will see — a
    # cluster-sized pool spends more wall on actor startup than scoring
    # when the query side is small
    # small batches: per-batch output (pair lists) is highly skewed —
    # duplicate-dense id ranges emit 10x the pairs of sparse ones, so fine
    # batch granularity is what bounds the straggler
    batch = 64
    n_tasks = max(1, (corpus.num_rows + batch - 1) // batch)
    _, hi = pool_size()
    hi = max(2, min(hi, n_tasks))
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        _NgramJaccardScorer, fn_constructor_args=(ref, threshold),
        batch_format="pyarrow", batch_size=batch, concurrency=(1, hi))


def simhash_neardup_pairs(sf_dir: str,
                          max_hamming: int = 3) -> "ray.data.Dataset":
    """EXACT SimHash near-dup pairs: every doc pair whose 64-bit token
    SimHash fingerprints differ in <= ``max_hamming`` bits.

    Banding is pigeonhole-exact, not probabilistic: the fingerprint is
    split into ``max_hamming + 1`` disjoint blocks, so any pair within
    the Hamming radius agrees on at least one whole block and meets in
    that block's bucket — recall 1.0 by construction (verified against
    brute force in tests).  Pipeline: signature map -> band flat-map ->
    bucketed groupby -> per-band vectorized popcount verify on DISTINCT
    fingerprints (identical-fp groups pair without any popcount — the
    all-identical fast path, ref: deduplicate.py:292-310) -> global pair
    dedup.  At corpus scale the pair stream feeds connected components
    (as the minhash channel does) rather than being materialized.
    """
    import numpy as np

    from mail_deduplicate_ray.stages.bucketing import grouped

    nb = max_hamming + 1
    if 64 % nb:
        raise ValueError("max_hamming + 1 must divide 64")

    def sig(t: pa.Table) -> pa.Table:
        hs = [simhash.token_simhash(shingles.token_hashes((v or "").lower()))
              for v in t["text"].to_pylist()]
        fp = np.asarray(hs, dtype=np.uint64)
        bands = simhash.band_keys_u64(fp, bands=nb)  # (n, nb)
        n = len(fp)
        return pa.table({
            "band": pa.array(bands.ravel(), pa.uint64()),
            "doc_id": pa.array(np.repeat(
                t["doc_id"].to_numpy(zero_copy_only=False), nb), pa.int64()),
            "fp": pa.array(np.repeat(fp, nb), pa.uint64()),
        })

    rows = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        sig, batch_format="pyarrow")

    def part(df) -> pa.Table:
        a_out, b_out = [], []
        for _, g in df.groupby("band", sort=False):
            if len(g) < 2:
                continue
            fp = g["fp"].to_numpy().astype(np.uint64)
            ids = g["doc_id"].to_numpy().astype(np.int64)
            # one argsort + split, not a boolean mask per unique fp
            # (O(N log N) vs O(U*N) in skewed buckets)
            order = np.argsort(fp, kind="stable")
            fp_s, ids_s = fp[order], ids[order]
            ufp, starts = np.unique(fp_s, return_index=True)
            groups = [np.sort(m) for m in np.split(ids_s, starts[1:])]
            # identical fingerprints: all-pairs without popcount
            for m in groups:
                if len(m) > 1:
                    iu, ju = np.triu_indices(len(m), 1)
                    a_out.append(m[iu]); b_out.append(m[ju])
            k = len(ufp)
            if k > 1:
                iu, ju = np.triu_indices(k, 1)
                ok = simhash.hamming(ufp[iu], ufp[ju]) <= max_hamming
                for i, j in zip(iu[ok], ju[ok]):
                    mi, mj = groups[i], groups[j]
                    a = np.repeat(mi, len(mj)); b = np.tile(mj, len(mi))
                    lo = np.minimum(a, b); hi = np.maximum(a, b)
                    a_out.append(lo); b_out.append(hi)
        a = np.concatenate(a_out) if a_out else np.empty(0, np.int64)
        b = np.concatenate(b_out) if b_out else np.empty(0, np.int64)
        return pa.table({"a_id": pa.array(a, pa.int64()),
                         "b_id": pa.array(b, pa.int64())})

    cand = grouped(rows, "band", part)
    # cross-band pair dedup: bucket on a_id + vectorized drop_duplicates
    # per bucket (the ann.py idiom) — O(nbuckets) Python calls, not one
    # map_groups lambda per distinct pair
    return grouped(cand, "a_id",
                   lambda df: df.drop_duplicates(subset=["a_id", "b_id"]))


def stratified_sample_docs(sf_dir: str) -> "ray.data.Dataset":
    """Deterministic stratified sampling — the reproducible-subset
    operator a training-data pipeline needs (same sample at ANY
    parallelism, cluster size, or re-run; no RNG state).

    Keep a doc iff ``(doc_id * 2654435761 mod 2^32) mod 100 <
    rate(lang)`` (Knuth multiplicative hash; 10% for 'en', 30%
    otherwise).  A pure vectorized filter — no shuffle — and the hash
    arithmetic is replayed exactly by the DuckDB oracle via HUGEINT
    (numpy uint64 wrap-around agrees because 2^32 divides 2^64).
    """
    import numpy as np

    def f(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (ids * np.uint64(2654435761)) % np.uint64(1 << 32) \
            % np.uint64(100)
        # coalesce: a null lang takes the ELSE rate, as SQL CASE does
        # (a null condition would null the rate and drop the row)
        rate = pc.if_else(pc.coalesce(pc.equal(t["lang"], "en"),
                                      pa.scalar(False)),
                          pa.scalar(10, pa.uint64()),
                          pa.scalar(30, pa.uint64()))
        keep = pc.less(pa.array(h, pa.uint64()), rate)
        return t.filter(keep).select(["doc_id", "lang"])

    return _docs(sf_dir, ["doc_id", "lang"]).map_batches(
        f, batch_format="pyarrow").sort("doc_id")


def top_trigrams(sf_dir: str, k: int = 100) -> "ray.data.Dataset":
    """Corpus-wide character-trigram frequency top-k — the vocab-building
    scan of a training-data pipeline.

    Combiner-first: each batch emits one (gram, n) partial per DISTINCT
    trigram (trigrams packed as uint32 codes via a zero-copy sliding
    window over the batch's concatenated bytes; doc boundaries are NUL
    separators whose windows are masked out), so the shuffle moves
    distinct-gram partials, never one row per occurrence.  Codes decode
    to strings only in the final tiny top-k.  ASCII corpus assumption
    (byte == char), as documented for substring_pairs."""
    import numpy as np

    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        texts = [(v or "").encode() for v in t["text"].to_pylist()]
        joined = b"\x00".join(texts)
        arr = np.frombuffer(joined, np.uint8)
        if len(arr) < 3:
            return pa.table({"code": pa.array([], pa.uint32()),
                             "n": pa.array([], pa.int64())})
        win = np.lib.stride_tricks.sliding_window_view(arr, 3)
        w = win[~(win == 0).any(axis=1)]
        code = ((w[:, 0].astype(np.uint32) << 16)
                | (w[:, 1].astype(np.uint32) << 8)
                | w[:, 2].astype(np.uint32))
        uniq, counts = np.unique(code, return_counts=True)
        return pa.table({"code": pa.array(uniq, pa.uint32()),
                         "n": pa.array(counts.astype(np.int64), pa.int64())})

    partials = _docs(sf_dir, ["text"]).map_batches(
        partial, batch_format="pyarrow")
    summed = partials.groupby("code").aggregate(Sum("n", alias_name="n"))

    def decode(t: pa.Table) -> pa.Table:
        codes = t["code"].to_numpy(zero_copy_only=False).astype(np.uint32)
        grams = [bytes([c >> 16, (c >> 8) & 0xFF, c & 0xFF]).decode()
                 for c in codes]
        return pa.table({"gram": pa.array(grams, pa.string()),
                         "n": pc.cast(t["n"], pa.int64())})

    return (summed.map_batches(decode, batch_format="pyarrow")
            .sort(["n", "gram"], descending=[True, False]).limit(k))


def sample_k_per_lang(sf_dir: str, k: int = 20) -> "ray.data.Dataset":
    """Deterministic per-stratum k-sample: the first ``k`` docs of each
    lang in Knuth-hash order (reproducible reservoir — same subset at any
    parallelism, no RNG).  Bucketed shuffle on lang, vectorized sort +
    head(k) per partition; oracle replays via row_number over the same
    hash."""
    import numpy as np

    from mail_deduplicate_ray.stages.bucketing import grouped

    ds = _docs(sf_dir, ["doc_id", "lang"])

    def add_hash(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (ids * np.uint64(2654435761)) % np.uint64(1 << 32)
        return t.append_column("__h", pa.array(h, pa.uint64()))

    hashed = ds.map_batches(add_hash, batch_format="pyarrow")

    def part(df):
        df = df.sort_values(["lang", "__h", "doc_id"])
        return (df.groupby("lang", sort=False).head(k)
                [["doc_id", "lang"]])

    return grouped(hashed, "lang", part).sort(["lang", "doc_id"])


def _tri_codes(text: str) -> "np.ndarray":
    """Distinct character trigrams of ``text`` packed as sorted uint32
    codes (ASCII corpus: byte == char)."""
    import numpy as np
    b = (text or "").encode()
    if len(b) < 3:
        return np.empty(0, np.uint32)
    arr = np.frombuffer(b, np.uint8)
    win = np.lib.stride_tricks.sliding_window_view(arr, 3)
    code = ((win[:, 0].astype(np.uint32) << 16)
            | (win[:, 1].astype(np.uint32) << 8)
            | win[:, 2].astype(np.uint32))
    return np.unique(code)


def decontaminate_docs(sf_dir: str, threshold_pct: int = 80,
                       eval_mod: int = 97) -> "ray.data.Dataset":
    """Benchmark DECONTAMINATION — the training-data hygiene scan: find
    train docs whose distinct-trigram set is >= ``threshold_pct``%
    contained in some eval doc's set (eval split = ``doc_id % eval_mod
    == 0``, standing in for a held-out benchmark suite).

    Physical plan: a benchmark set is SMALL BY NATURE (fixed size
    regardless of corpus scale), so its gram sets are collected once and
    broadcast via ``ray.put``; the train corpus streams through a task
    map scoring sorted-array intersections — ZERO shuffle, the scan is
    embarrassingly parallel.  Integer containment arithmetic
    (``100*n_shared >= pct*n_grams``) keeps the oracle hash-exact."""
    import numpy as np

    import ray as _ray

    def _eval_filter(t: pa.Table) -> pa.Table:
        import numpy as np
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % eval_mod == 0))

    eval_tbl = pa.concat_tables(
        _docs(sf_dir, ["doc_id", "text"]).map_batches(
            _eval_filter, batch_format="pyarrow"
        ).iter_batches(batch_format="pyarrow"))
    eval_index = [(int(i), _tri_codes(t))
                  for i, t in zip(eval_tbl["doc_id"].to_pylist(),
                                  eval_tbl["text"].to_pylist())]
    ref = _ray.put(eval_index)

    def score(t: pa.Table) -> pa.Table:
        evals = _ray.get(ref)
        out = {"doc_id": [], "eval_id": [], "n_shared": [], "n_grams": []}
        for did, text in zip(t["doc_id"].to_pylist(),
                             t["text"].to_pylist()):
            if did % eval_mod == 0:
                continue
            codes = _tri_codes(text)
            if codes.size == 0:
                continue
            for eid, ecodes in evals:
                n_shared = np.intersect1d(codes, ecodes,
                                          assume_unique=True).size
                if 100 * n_shared >= threshold_pct * codes.size:
                    out["doc_id"].append(did)
                    out["eval_id"].append(eid)
                    out["n_shared"].append(n_shared)
                    out["n_grams"].append(int(codes.size))
        return pa.table({
            "doc_id": pa.array(out["doc_id"], pa.int64()),
            "eval_id": pa.array(out["eval_id"], pa.int64()),
            "n_shared": pa.array(out["n_shared"], pa.int64()),
            "n_grams": pa.array(out["n_grams"], pa.int64())})

    return (_docs(sf_dir, ["doc_id", "text"])
            .map_batches(score, batch_format="pyarrow")
            .sort(["doc_id", "eval_id"]))



SCRUB_PATTERN = r"\b(key|hash|value)\b"  # deny-list, shared with the oracle


def scrub_docs(sf_dir: str) -> "ray.data.Dataset":
    """Deny-list redaction — the PII-scrub shape (emails/URLs/IDs in a
    real corpus; a token deny-list here since the synthetic text has no
    PII).  One vectorized RE2 replace + one count per batch; the scrubbed
    text leaves the stage only as its sha256, so no payload re-shuffles."""

    def f(t: pa.Table) -> pa.Table:
        scrubbed = pc.replace_substring_regex(t["text"], SCRUB_PATTERN,
                                              replacement="<X>")
        nred = pc.cast(pc.count_substring_regex(t["text"], SCRUB_PATTERN),
                       pa.int64())
        t2 = pa.table({"doc_id": t["doc_id"], "n_redacted": nred,
                       "scrubbed": scrubbed})
        return _sha256_col(t2, "scrubbed", "scrubbed_sha").select(
            ["doc_id", "n_redacted", "scrubbed_sha"])

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow")


def token_repetition_docs(sf_dir: str) -> "ray.data.Dataset":
    """Repetition-quality signal (the Gopher-style duplicate-token
    fraction): per-doc total vs distinct whitespace tokens.  The token
    stream is exploded ONCE per batch (list offsets -> flat array +
    repeated doc ids) and reduced with a vectorized pandas groupby —
    per-doc Python never touches token strings."""
    import numpy as np
    import pandas as pd

    from mail_deduplicate_ray.stages.bucketing import arrow_clean

    def f(t: pa.Table) -> pa.Table:
        la = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(t["text"]), r"\s+").combine_chunks()
        lens = pc.list_value_length(la).to_numpy(zero_copy_only=False)
        doc_ids = t["doc_id"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "doc_id": np.repeat(doc_ids, lens),
            "tok": la.flatten().to_numpy(zero_copy_only=False)})
        g = (df.groupby("doc_id", sort=False)["tok"]
             .agg(n_tokens="size", n_distinct_tokens="nunique")
             .reset_index())
        for c in ("n_tokens", "n_distinct_tokens"):
            g[c] = g[c].astype("int64")
        return arrow_clean(g)

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow")


def curate_docs(sf_dir: str, min_tokens: int = 10, max_tokens: int = 1000,
                k_per_lang: int = 100) -> "ray.data.Dataset":
    """Composed training-data curation — the pipeline a corpus team
    actually runs, as ONE streaming plan: exact dedup (keep min doc_id
    per byte-identical text) -> token-count quality gate -> deterministic
    per-lang k-sample.  Stage wiring: the dedup winner set is a
    (text_key -> min id) groupby whose output is ids only; winners
    semi-join back onto the token-counted rows (payload text never
    re-shuffles); the final sample reuses the Knuth-hash order so the
    subset is parallelism-independent."""
    import numpy as np

    from mail_deduplicate_ray.stages.bucketing import grouped
    from mail_deduplicate_ray.stages.joins import semi_anti_join

    ds = _docs(sf_dir, ["doc_id", "lang", "text"])

    def keyed(t: pa.Table) -> pa.Table:
        t2 = _sha256_col(t, "text", "text_key")
        return t2.select(["doc_id", "text_key"])

    winners = (_docs(sf_dir, ["doc_id", "text"])
               .map_batches(keyed, batch_format="pyarrow")
               .groupby("text_key").map_groups(
                   lambda g: pa.table({
                       "keep_id": pa.array([pc.min(g["doc_id"]).as_py()],
                                           pa.int64())}),
                   batch_format="pyarrow"))

    def with_tokens(t: pa.Table) -> pa.Table:
        n = pc.cast(token_counts(t["text"]), pa.int64())
        return pa.table({"doc_id": t["doc_id"], "lang": t["lang"],
                         "n_tokens": n})

    tokened = ds.map_batches(with_tokens, batch_format="pyarrow")
    kept = semi_anti_join(tokened, winners, "doc_id", "keep_id")

    def quality(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(t["n_tokens"],
                                     pa.scalar(min_tokens, pa.int64())),
                    pc.less_equal(t["n_tokens"],
                                  pa.scalar(max_tokens, pa.int64())))
        t = t.filter(m)
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (ids * np.uint64(2654435761)) % np.uint64(1 << 32)
        return t.append_column("__h", pa.array(h, pa.uint64()))

    hashed = kept.map_batches(quality, batch_format="pyarrow")

    def part(df):
        df = df.sort_values(["lang", "__h", "doc_id"])
        return (df.groupby("lang", sort=False).head(k_per_lang)
                [["doc_id", "lang", "n_tokens"]])

    return grouped(hashed, "lang", part).sort(["lang", "doc_id"])


def vocab_coverage_docs(sf_dir: str, vocab_k: int = 200) -> "ray.data.Dataset":
    """Out-of-vocabulary rate per doc: build the corpus top-k word vocab
    (per-batch partial counts -> tiny groupby -> top-k), broadcast it
    once, then count each doc's in-vocab tokens vectorized — the
    broadcast-small-side pattern over a derived artifact (the vocab is
    bounded by k however large the corpus)."""
    import numpy as np
    import pandas as pd

    import ray

    from ray.data.aggregate import Sum

    from mail_deduplicate_ray.stages.bucketing import arrow_clean

    ds = _docs(sf_dir, ["doc_id", "text"])

    def _tokens(t: pa.Table):
        la = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(t["text"]), r"\s+").combine_chunks()
        lens = pc.list_value_length(la).to_numpy(zero_copy_only=False)
        return la, lens

    def tok_partial(t: pa.Table) -> pa.Table:
        la, _ = _tokens(t)
        flat = pa.table({"tok": la.flatten()})
        g = flat.group_by("tok").aggregate([("tok", "count")])
        return pa.table({"tok": g["tok"],
                         "n": pc.cast(g["tok_count"], pa.int64())})

    # the driver only ever sees vocab_k rows: top-k selection runs in
    # Ray (sort+limit over the distinct-token counts), same shape as
    # top_trigrams
    vocab_tbl = (ds.map_batches(tok_partial, batch_format="pyarrow")
                 .groupby("tok").aggregate(Sum("n", alias_name="n"))
                 .sort(["n", "tok"], descending=[True, False])
                 .limit(vocab_k).to_pandas())
    ref = ray.put(set(vocab_tbl["tok"]))

    def coverage(t: pa.Table) -> pa.Table:
        v = ray.get(ref)
        la, lens = _tokens(t)
        toks = pd.Series(la.flatten().to_numpy(zero_copy_only=False))
        in_vocab = toks.isin(v).to_numpy()
        seg = np.repeat(np.arange(len(lens)), lens)
        n_in = np.bincount(seg, weights=in_vocab,
                           minlength=len(lens)).astype(np.int64)
        return arrow_clean(pd.DataFrame({
            "doc_id": t["doc_id"].to_numpy(zero_copy_only=False),
            "n_tokens": lens.astype(np.int64),
            "n_in_vocab": n_in}))

    return ds.map_batches(coverage, batch_format="pyarrow")


def length_weighted_sample_docs(sf_dir: str,
                                full_weight_chars: int = 2000,
                                ) -> "ray.data.Dataset":
    """Deterministic WEIGHTED Bernoulli sample: P(keep) proportional to
    doc length, capped at 1 beyond ``full_weight_chars`` — the
    upweight-long-documents primitive of a data-mixing recipe, with the
    same Knuth-hash determinism as the uniform samplers (no RNG; any
    parallelism, same subset)."""
    import numpy as np

    ds = _docs(sf_dir, ["doc_id", "lang", "n_chars"])
    scale = (1 << 32) // full_weight_chars

    def f(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (ids * np.uint64(2654435761)) % np.uint64(1 << 32)
        chars = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.uint64)
        thresh = np.minimum(chars * np.uint64(scale), np.uint64(1 << 32))
        return t.filter(pa.array(h < thresh)).select(
            ["doc_id", "lang", "n_chars"])

    return ds.map_batches(f, batch_format="pyarrow").sort("doc_id")


def dup_group_size_histogram(sf_dir: str) -> "ray.data.Dataset":
    """Duplicate-multiplicity distribution: how many exact-dup groups
    have 1, 2, ... copies — the dedup run-report statistic (ref stats
    analogue: set_single / set_deduplicated counts) as a two-level
    groupby whose final table is bounded by the max multiplicity."""
    from ray.data.aggregate import Count

    groups = exact_dedup_docs(sf_dir)  # (keeper_id, n_copies)
    out = groups.groupby("n_copies").aggregate(
        Count(alias_name="n_groups"))
    return out.map_batches(
        lambda t: pa.table({"n_copies": pc.cast(t["n_copies"], pa.int64()),
                            "n_groups": pc.cast(t["n_groups"], pa.int64())}),
        batch_format="pyarrow").sort("n_copies")
