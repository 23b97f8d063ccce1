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
    from mail_deduplicate_ray.stages.bucketing import grouped

    keyed = ds.map_batches(key_fn, batch_format="pyarrow")

    def part(df) -> "pa.Table":
        g = (df.groupby("text_key", sort=False, as_index=False)
             .agg(keeper_id=("doc_id", "min"),
                  n_copies=("doc_id", "size")))
        return pa.table({
            "keeper_id": pa.array(g["keeper_id"].to_numpy(), pa.int64()),
            "n_copies": pa.array(g["n_copies"].to_numpy(), pa.int64())})

    return grouped(keyed, "text_key", part)


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


def bag_dedup_docs(sf_dir: str) -> "ray.data.Dataset":
    """Word-order-invariant exact dedup: docs whose whitespace-token
    MULTISETS are equal form one group (catches shuffled/reordered
    copies that byte- and normalized-dedup miss) — (keeper_id,
    n_copies) like ``exact_dedup_docs``.  Key = sha256 of the sorted
    token list; the text column is dropped before the groupby so the
    shuffle moves 28-byte keys (ref semantics: M7 canonical projection
    + G1 group-by-hash, deduplicate.py:1009)."""
    def key(t: pa.Table) -> pa.Table:
        vals = [hashlib.sha256(
                    "\x00".join(sorted((v or "").split())).encode()
                ).hexdigest()
                for v in t["text"].to_pylist()]
        return pa.table({"doc_id": t["doc_id"],
                         "text_key": pa.array(vals, pa.string())})

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
    labels = components.connected_components(edges, cfg.cc_max_rounds,
                                              method=cfg.cc_method)
    rows = sigs.select_columns(["clip_id"])
    out = components.attach_cluster_ids(rows, labels)
    return out.map_batches(
        lambda t: pa.table({
            "doc_id": pc.cast(t["clip_id"], pa.int64()),
            "cluster_id": t["cluster_id"]}),
        batch_format="pyarrow")


def _gram_set1(text) -> "np.ndarray":
    """One doc's sorted unique uint64 trigram hashes, with the oracle's
    empty-text convention ({''} -> the bare FNV offset)."""
    import numpy as np

    from mail_deduplicate_ray.functions.shingles import _OFFS
    h = shingles.shingle_hashes(text or "", 3)
    return h if len(h) else np.array([_OFFS], dtype=np.uint64)


def _gram_sets(t: pa.Table):
    """Per-doc sorted, unique uint64 trigram hashes via the deterministic
    rolling-hash kernel (process-independent — actors and driver must
    agree).  Gram definition mirrors the oracle SQL exactly on the ASCII
    corpus: substr(text, i, k) for i in 1..max(len-k+1, 1) — a doc
    shorter than k contributes itself (shingle_hashes' <k whole-string
    shingle).  An EMPTY text mirrors the oracle too: substr('',1,3) = ''
    gives the gram set {''} (hashed as the bare FNV offset), so two empty
    docs pair at Jaccard 1.0 — shingle_hashes alone would return no grams
    and silently drop those pairs."""
    for text in t["text"].to_pylist():
        yield _gram_set1(text)


def _text_cls(texts) -> list[str]:
    """128-bit identity key per text (collision-safe class id: identical
    texts share a class; distinct texts never collide in practice —
    2^-128).  Classing duplicates BEFORE the similarity join is the
    memoized-verification idiom of stages/candidates.py: a cluster of m
    identical copies costs O(m) member rows, never O(m^2) verify work."""
    return [hashlib.sha256((v or "").encode()).hexdigest()[:32]
            for v in texts]


def substring_pairs(sf_dir: str, min_len: int = 64,
                    k: int = 16) -> "ray.data.Dataset":
    """(a_id, b_id) pairs where doc b's text occurs VERBATIM inside doc
    a's strictly longer text and len(b) >= min_len — exact-substring
    containment (the north-star's suffix-array detector; ref analogue:
    byte-identical grouping mail.py:423-439 generalized to containment).

    Routed through the clips substring machinery (stages/candidates.py):
    winnowing-minimizer buckets -> bipartite candidates over DISTINCT
    texts (one fused explode + one bucketed shuffle) -> exact
    suffix-array verify with ``orient=True`` (verified rows come back as
    (container, contained); equal-length identical-copy pairs drop) ->
    identical-text class expansion via bloom-pruned shuffle joins.
    Nothing corpus-sized touches the driver: texts re-attach inside
    ``verify_substring_edges`` (semi-join-pruned broadcast under its
    caps, bucketed-join fallback beyond — both parity-tested), and the
    member table is bloom-semi-pruned to participating representatives
    before the expansion joins.  Texts are ASCII in this corpus, so byte
    (channel eligibility) and char (oracle) lengths agree."""
    import numpy as np

    from mail_deduplicate_ray.config import DedupConfig
    from mail_deduplicate_ray.stages import bucketing, candidates
    from mail_deduplicate_ray.stages.joins import semi_anti_join, shuffle_join

    cfg = DedupConfig(substring_k=k, substring_min_len=min_len)
    docs = _docs(sf_dir, ["doc_id", "text"])

    def to_clips(t: pa.Table) -> pa.Table:
        # zero-padded string ids so the machinery's min-clip_id class
        # representative is the min doc_id (string order == numeric order)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "clip_id": pa.array([f"{i:020d}" for i in ids], pa.string()),
            "transcript_norm": t["text"]})

    usable = docs.map_batches(to_clips, batch_format="pyarrow")
    raw = candidates.candidate_edges(usable, cfg, channels=("substring",))
    ded = candidates.dedup_edges(raw)
    ver = candidates.verify_substring_edges(ded, usable, cfg, orient=True)
    pairs = ver.map_batches(
        lambda t: (lambda f: pa.table({
            "big": pc.cast(f["src"], pa.int64()),
            "small": pc.cast(f["dst"], pa.int64())}))(
            t.filter(pc.not_equal(t["src"], ""))),
        batch_format="pyarrow").materialize()

    empty = ray.data.from_arrow(pa.table({
        "a_id": pa.array([], pa.int64()), "b_id": pa.array([], pa.int64())}))
    if pairs.count() == 0:
        return empty

    # pair endpoints are identical-text class REPRESENTATIVES (min doc_id)
    # — expand each side to its full class through the member table
    mem_rows = docs.map_batches(
        lambda t: pa.table({
            "cls": pa.array(_text_cls(t["text"].to_pylist()), pa.string()),
            "doc_id": t["doc_id"]}),
        batch_format="pyarrow")

    if pairs.count() <= _SS_PAIR_BROADCAST_LIMIT:
        # small-pair regime: two zero-shuffle broadcast-filtered corpus
        # scans replace the class groupby + bloom semi-join + two
        # expansion shuffle joins (measured ~10 s -> ~5 s at sf0.1 —
        # the join chain was all fixed stage cost at this pair count).
        # Everything collected is output-bounded: one (rep -> cls) row
        # per pair endpoint, then one member row per doc that appears
        # in the expanded output.  ORIENTATION is preserved (big-side
        # members contain; small-side members are contained).
        out = _substring_expand_broadcast(pairs, mem_rows)
        if out is not None:
            return out.union(empty)

    def rep_expand(df) -> pa.Table:
        rep = df.groupby("cls", sort=False)["doc_id"].transform("min")
        return pa.table({
            "rep_id": pa.array(rep.to_numpy(dtype=np.int64), pa.int64()),
            "doc_id": pa.array(df["doc_id"].to_numpy(dtype=np.int64),
                               pa.int64())})

    members = bucketing.grouped(mem_rows, "cls", rep_expand)
    pids = pairs.map_batches(
        lambda t: pa.table({"rep_id": pa.concat_arrays(
            [t["big"].combine_chunks().cast(pa.int64()),
             t["small"].combine_chunks().cast(pa.int64())])}),
        batch_format="pyarrow")
    # bloom semi prune: member rows of non-participating classes drop
    # BEFORE the shuffle, so the expansion joins move O(pairs), not corpus
    members = semi_anti_join(members, pids, "rep_id", "rep_id",
                             bloom_bits=1 << 20).materialize()
    am = members.map_batches(
        lambda t: pa.table({"rep_id": t["rep_id"], "a_id": t["doc_id"]}),
        batch_format="pyarrow")
    bm = members.map_batches(
        lambda t: pa.table({"rep_id": t["rep_id"], "b_id": t["doc_id"]}),
        batch_format="pyarrow")
    e2 = shuffle_join(shuffle_join(pairs, am, "big", "rep_id"),
                      bm, "small", "rep_id")
    return e2.map_batches(
        lambda t: t.select(["a_id", "b_id"]), batch_format="pyarrow") \
        .union(empty)


# edit-distance verify regime cap (patchable in tests to force the
# dedup-shuffle + text-join fallback)
_LEV_PAIR_BROADCAST_LIMIT = 200_000

# substring expansion regime caps (patchable in tests to force the
# shuffle-join fallback, mirroring the verify-side switches)
_SS_PAIR_BROADCAST_LIMIT = 200_000
_SS_MEMBER_BROADCAST_LIMIT = 5_000_000


def _substring_expand_broadcast(pairs: "ray.data.Dataset",
                                mem_rows: "ray.data.Dataset"):
    """Oriented class→member expansion for the small-pair regime.

    Phase 1: broadcast the pair-endpoint rep-id set; a zero-shuffle scan
    of the member rows yields each participating rep's class key (one
    row per endpoint — reps ARE members of their class, so filtering
    ``doc_id ∈ reps`` finds exactly the (cls, rep) rows).  Phase 2:
    broadcast the participating class keys; a second zero-shuffle scan
    collects those classes' full member lists (every collected row
    appears in the output, so the driver share is output-bounded; above
    ``_SS_MEMBER_BROADCAST_LIMIT`` we return None and the caller falls
    back to the shuffle-join path).  Expansion itself is one
    ``map_batches`` over the pair table."""
    import numpy as np
    import ray as _ray

    reps: set[int] = set()
    for b in pairs.iter_batches(batch_format="pyarrow"):
        reps.update(b["big"].to_pylist())
        reps.update(b["small"].to_pylist())
    rep_ref = _ray.put(np.fromiter(reps, np.int64, len(reps)))

    def rep_cls(t: pa.Table, ref=rep_ref) -> pa.Table:
        want = _ray.get(ref)
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = np.isin(ids, want)
        return pa.table({"cls": t["cls"].filter(pa.array(m)),
                         "rep_id": pa.array(ids[m], pa.int64())})

    cls_of_rep: dict[str, int] = {}
    for b in mem_rows.map_batches(rep_cls, batch_format="pyarrow") \
                     .iter_batches(batch_format="pyarrow"):
        for c, r in zip(b["cls"].to_pylist(), b["rep_id"].to_pylist()):
            cls_of_rep[c] = r
    cls_ref = _ray.put(set(cls_of_rep))

    def cls_members(t: pa.Table, ref=cls_ref) -> pa.Table:
        want = _ray.get(ref)
        cl = t["cls"].to_pylist()
        m = pa.array([c in want for c in cl])
        return pa.table({"cls": t["cls"].filter(m),
                         "doc_id": t["doc_id"].filter(m)})

    members_of: dict[int, list[int]] = {}
    n_member_rows = 0
    for b in mem_rows.map_batches(cls_members, batch_format="pyarrow") \
                     .iter_batches(batch_format="pyarrow"):
        n_member_rows += b.num_rows
        if n_member_rows > _SS_MEMBER_BROADCAST_LIMIT:
            return None
        for c, d in zip(b["cls"].to_pylist(), b["doc_id"].to_pylist()):
            members_of.setdefault(cls_of_rep[c], []).append(d)
    mref = _ray.put({k: np.asarray(v, np.int64)
                     for k, v in members_of.items()})

    def expand(t: pa.Table, ref=mref) -> pa.Table:
        m = _ray.get(ref)
        big = t["big"].to_pylist()
        small = t["small"].to_pylist()
        a_out, b_out = [], []
        for bg, sm in zip(big, small):
            ma, mb = m[bg], m[sm]
            a_out.append(np.repeat(ma, len(mb)))
            b_out.append(np.tile(mb, len(ma)))
        a = np.concatenate(a_out) if a_out else np.empty(0, np.int64)
        b = np.concatenate(b_out) if b_out else np.empty(0, np.int64)
        return pa.table({"a_id": pa.array(a, pa.int64()),
                         "b_id": pa.array(b, pa.int64())})

    return pairs.map_batches(expand, batch_format="pyarrow",
                             batch_size=65536)


# verify-regime caps for the ngram-Jaccard join (patchable in tests to
# force the bucketed-join fallback — same switch as verify_substring_edges)
_NGJ_PAIR_BROADCAST_LIMIT = 2_000_000
_NGJ_TEXT_BYTES_CAP = 1 << 30
# candidate-path selector: None = auto (dense regime -> block self-join,
# sparse -> prefix-filtered join); tests force "prefix" / "block"
_NGJ_FORCE_PATH: str | None = None


class _PrefixExplode:
    """Actor stage: per doc, emit the PREFIX of its trigram set under the
    global rarity order — one row (gram_rank, cls, size) per prefix gram.
    Prefix length |s| - ceil(t*|s|) + 1 is the classic prefix-filter bound
    (All-Pairs / PPJoin): two sets with Jaccard >= t MUST share a gram
    inside both prefixes, so the bucketed groupby downstream sees every
    qualifying pair.  Rarity ordering makes buckets small: a gram with
    document frequency m lands in at most m prefixes.  The rank map is
    ray.get ONCE per actor (zero-copy plasma arrays)."""

    def __init__(self, rank_ref, threshold: float) -> None:
        import ray as _ray
        self.grams_sorted, self.rank = _ray.get(rank_ref)
        self.t = threshold

    def __call__(self, t: pa.Table) -> pa.Table:
        import numpy as np
        texts = t["text"].to_pylist()
        cls = _text_cls(texts)
        bkt, cls_out, size_out = [], [], []
        seen: set[str] = set()  # identical texts in one batch explode once
        for text, ck in zip(texts, cls):
            if ck in seen:
                continue
            seen.add(ck)
            grams = _gram_set1(text)
            n = len(grams)
            # safe ceil: never under-count the required overlap (a float
            # product sitting just above an exact integer would shorten
            # the prefix and could miss a true pair)
            p = n - int(np.ceil(self.t * n - 1e-9)) + 1
            r = np.sort(self.rank[np.searchsorted(self.grams_sorted,
                                                  grams)])[:max(p, 1)]
            bkt.append(r)
            cls_out.append(np.repeat(np.array([ck], object), len(r)))
            size_out.append(np.full(len(r), n, np.int64))
        if not bkt:
            return pa.table({"gram_rank": pa.array([], pa.uint64()),
                             "cls": pa.array([], pa.string()),
                             "size": pa.array([], pa.int64())})
        return pa.table({
            "gram_rank": pa.array(np.concatenate(bkt), pa.uint64()),
            "cls": pa.array(np.concatenate(cls_out), pa.string()),
            "size": pa.array(np.concatenate(size_out), pa.int64())})


def _ngj_verify_rows(cls_a, cls_b, texts_a, texts_b,
                     threshold: float) -> pa.Table:
    """Exact trigram-set Jaccard check per candidate class pair (same
    float expression as the oracle SQL: inter*1.0/union >= t).  Gram sets
    are memoized per class within the call — one class verifies against
    many counterparts."""
    import numpy as np
    cache: dict[str, "np.ndarray"] = {}

    def grams(ck: str, text) -> "np.ndarray":
        g = cache.get(ck)
        if g is None:
            g = _gram_set1(text)
            cache[ck] = g
        return g

    out_a, out_b = [], []
    for ca, cb, ta, tb in zip(cls_a, cls_b, texts_a, texts_b):
        if not isinstance(ta, str) or not isinstance(tb, str):
            continue  # missing side (null text / NaN)
        ga, gb = grams(ca, ta), grams(cb, tb)
        inter = np.intersect1d(ga, gb, assume_unique=True).size
        union = len(ga) + len(gb) - inter
        if inter / union >= threshold:
            out_a.append(ca)
            out_b.append(cb)
    return pa.table({"cls_a": pa.array(out_a, pa.string()),
                     "cls_b": pa.array(out_b, pa.string())})


def ngram_jaccard_pairs(sf_dir: str,
                        threshold: float = 0.6) -> "ray.data.Dataset":
    """(a_id, b_id) pairs with exact character-trigram-set Jaccard >=
    threshold — a fully DISTRIBUTED exact set-similarity join (the
    n-gram-Jaccard dedup family member with a full DuckDB oracle;
    MinHash estimates the same quantity at scale).

    Shape (prefix-filtered similarity join, All-Pairs/PPJoin re-expressed
    as Ray Data shuffles — nothing corpus-sized ever touches the driver):

    1. **rarity rank** — one map_batches pass emits per-batch partial
       (gram, count) rows; a groupby-sum reduces them.  The distinct
       trigram count is bounded by |charset|^3 REGARDLESS of corpus size,
       so this table is provably small and its rank arrays broadcast via
       one ray.put.
    2. **identical-text classing** — docs group by a 128-bit text hash;
       one shuffle of (cls, doc_id) scalars yields intra-class pairs
       (Jaccard exactly 1.0) and the member table for final expansion.
       No text crosses this shuffle.
    3. **prefix explode + bucketed pair-gen** — each DISTINCT class emits
       its rarity-ordered prefix rows; groupby(gram_rank) generates
       candidate class pairs under the exact size-ratio bound
       (J <= min/max), two-pointer vectorized, then pairs dedup by a
       bucketed drop_duplicates.
    4. **exact verify** — candidate pairs re-attach one representative
       text per class: broadcast regime (semi-join-pruned cls->text map,
       ray.put once, zero shuffles) under _NGJ_* caps, bucketed
       shuffle-join fallback beyond (parity-tested).
    5. **expansion** — verified class pairs join the member table twice
       (cls_a, then cls_b) and union with the intra-class pairs.
    """
    import numpy as np
    import ray as _ray

    from mail_deduplicate_ray.stages import bucketing
    from mail_deduplicate_ray.stages.joins import semi_anti_join, shuffle_join

    docs = _docs(sf_dir, ["doc_id", "text"])
    empty_pairs = ray.data.from_arrow(pa.table({
        "a_id": pa.array([], pa.int64()), "b_id": pa.array([], pa.int64())}))

    # ---- regime pick from a BOUNDED sample (first ~4k docs — same
    # bounded-driver-sample pattern as the IVF quantizer): coverage =
    # fraction of the (sampled) gram universe the average doc holds.
    # Sparse (real text: ~300 grams per doc out of 10^5-10^6 distinct) ->
    # prefix filtering prunes hard and is the scale path.  Dense (tiny
    # gram universe, every pair shares most grams — prefix buckets
    # degenerate to all-pairs) -> block self-join with a vectorized
    # postings verify: each unordered class-block pair scored by exactly
    # ONE task, no candidate dedup shuffle at all.  Sampling only steers
    # the heuristic; both paths are exact.
    import pyarrow.parquet as pq
    sample_parts = []
    got = 0
    for rb in pq.ParquetFile(f"{sf_dir}/documents.parquet").iter_batches(
            batch_size=2048, columns=["text"]):
        sample_parts.append(rb)
        got += rb.num_rows
        if got >= 4096:
            break
    if got == 0:
        return empty_pairs
    sample = pa.Table.from_batches(sample_parts)
    sample_sets = list(_gram_sets(sample))
    sample_universe = np.unique(np.concatenate(sample_sets))
    coverage = (sum(len(s) for s in sample_sets) / len(sample_sets)
                / max(1, len(sample_universe)))
    path = _NGJ_FORCE_PATH or ("block" if coverage > 0.05 else "prefix")

    # ---- identical-text classing (scalar shuffle only)
    members = docs.map_batches(
        lambda t: pa.table({
            "cls": pa.array(_text_cls(t["text"].to_pylist()), pa.string()),
            "doc_id": t["doc_id"]}),
        batch_format="pyarrow").materialize()  # consumed by 3 branches

    def triangles(df) -> pa.Table:
        a_out, b_out = [], []
        for _, grp in df.groupby("cls", sort=False):
            if len(grp) < 2:
                continue
            m = np.sort(grp["doc_id"].to_numpy(dtype=np.int64))
            i, j = np.triu_indices(len(m), 1)
            a_out.append(m[i])
            b_out.append(m[j])
        a = np.concatenate(a_out) if a_out else np.empty(0, np.int64)
        b = np.concatenate(b_out) if b_out else np.empty(0, np.int64)
        return pa.table({"a_id": pa.array(a, pa.int64()),
                         "b_id": pa.array(b, pa.int64())})

    intra = bucketing.grouped(members, "cls", triangles)

    if path == "block":
        # materialized: the verify shuffle chain otherwise re-plans inside
        # the 3-way union and loses stage overlap (measured ~2x end-to-end)
        verified = _ngj_block_pairs(docs, threshold).materialize()
        return _ngj_expand(intra, verified, members, empty_pairs)

    # ---- 1. global gram document-frequency -> rarity rank (broadcast;
    # distinct trigram count is bounded by |charset|^3 at ANY corpus size)
    def df_partial(t: pa.Table) -> pa.Table:
        sets = list(_gram_sets(t))
        if not sets:
            return pa.table({"gram": pa.array([], pa.uint64()),
                             "cnt": pa.array([], pa.int64())})
        u, c = np.unique(np.concatenate(sets), return_counts=True)
        return pa.table({"gram": pa.array(u, pa.uint64()),
                         "cnt": pa.array(c, pa.int64())})

    def df_sum(df) -> pa.Table:
        s = df.groupby("gram", sort=False)["cnt"].sum()
        return pa.table({
            "gram": pa.array(s.index.to_numpy(dtype=np.uint64), pa.uint64()),
            "cnt": pa.array(s.to_numpy(dtype=np.int64), pa.int64())})

    # bucketed sum, NOT the native groupby: Ray's sort-based aggregation
    # round-trips uint64 keys through Python ints and fails Arrow
    # conversion for values above int64 max
    df_tbl = bucketing.grouped(
        docs.map_batches(df_partial, batch_format="pyarrow"),
        "gram", df_sum).to_pandas()
    if not len(df_tbl):
        return intra.union(empty_pairs)
    g = df_tbl["gram"].to_numpy(dtype=np.uint64)
    c = df_tbl["cnt"].to_numpy(dtype=np.int64)
    o = np.argsort(g, kind="stable")
    gs, cs = g[o], c[o]
    rank = np.empty(len(gs), np.uint64)
    rank[np.lexsort((gs, cs))] = np.arange(len(gs), dtype=np.uint64)
    rank_ref = _ray.put((gs, rank))

    # ---- 3. prefix explode -> bucketed candidate pair-gen
    prefix = docs.map_batches(
        _PrefixExplode, fn_constructor_args=(rank_ref, threshold),
        batch_format="pyarrow", batch_size=512,
        concurrency=bucketing.pool_size())

    def pair_gen(df) -> pa.Table:
        bkt = df["gram_rank"].to_numpy(dtype=np.uint64)
        cls = df["cls"].to_numpy()
        size = df["size"].to_numpy(dtype=np.int64)
        order = np.lexsort((cls, bkt))
        b_sorted = bkt[order]
        bounds = np.flatnonzero(np.concatenate(
            ([True], b_sorted[1:] != b_sorted[:-1], [True])))
        a_out, b_out = [], []
        for s, e in zip(bounds[:-1], bounds[1:]):
            if e - s < 2:
                continue
            idx = order[s:e]
            # distinct classes only (cross-batch duplicates collapse here)
            uc, first = np.unique(cls[idx], return_index=True)
            if len(uc) < 2:
                continue
            su = size[idx[first]]
            so = np.argsort(su, kind="stable")
            s_sorted, c_sorted = su[so], uc[so]
            # two-pointer under the exact size-ratio bound: emission is
            # output-sensitive, O(candidates), never O(bucket^2)
            j_idx = np.arange(len(s_sorted))
            lows = np.searchsorted(s_sorted,
                                   threshold * s_sorted - 1e-9, "left")
            cnt = np.maximum(j_idx - lows, 0)
            tot = int(cnt.sum())
            if not tot:
                continue
            jj = np.repeat(j_idx, cnt)
            ii = (np.repeat(lows, cnt)
                  + np.arange(tot) - np.repeat(np.cumsum(cnt) - cnt, cnt))
            pa_, pb_ = c_sorted[ii], c_sorted[jj]
            a_out.append(np.minimum(pa_, pb_))
            b_out.append(np.maximum(pa_, pb_))
        a = np.concatenate(a_out) if a_out else np.empty(0, object)
        b = np.concatenate(b_out) if b_out else np.empty(0, object)
        return pa.table({"cls_a": pa.array(a, pa.string()),
                         "cls_b": pa.array(b, pa.string())})

    cand = bucketing.grouped(
        bucketing.grouped(prefix, "gram_rank", pair_gen),
        "cls_a", lambda df: df.drop_duplicates()).materialize()
    n_pairs = cand.count()
    if n_pairs == 0:
        return intra.union(empty_pairs)

    # ---- 4. exact verify (broadcast regime, bucketed-join fallback)
    verified = None
    if n_pairs <= _NGJ_PAIR_BROADCAST_LIMIT:
        parts: list[pa.Array] = []
        for b in cand.iter_batches(batch_format="pyarrow",
                                   batch_size=65536):
            parts.append(pc.unique(b["cls_a"]))
            parts.append(pc.unique(b["cls_b"]))
        need = pc.unique(pa.concat_arrays(
            [p.cast(pa.string()) for p in parts]))
        need_ref = _ray.put(need)

        def prune(t: pa.Table, ref=need_ref) -> pa.Table:
            ks = pa.array(_text_cls(t["text"].to_pylist()), pa.string())
            m = pc.is_in(ks, value_set=_ray.get(ref))
            return pa.table({"cls": ks.filter(m),
                             "text": t.filter(m)["text"]})

        tmap: dict | None = {}
        total = 0
        for b in docs.map_batches(prune, batch_format="pyarrow") \
                .iter_batches(batch_format="pyarrow", batch_size=8192):
            for ck, txt in zip(b["cls"].to_pylist(), b["text"].to_pylist()):
                if ck not in tmap:
                    txt = txt or ""
                    tmap[ck] = txt
                    total += len(txt.encode("utf-8"))
            if total > _NGJ_TEXT_BYTES_CAP:
                tmap = None
                break
        if tmap is not None:
            tref = _ray.put(tmap)

            def vmap(t: pa.Table, ref=tref) -> pa.Table:
                m = _ray.get(ref)
                ca = t["cls_a"].to_pylist()
                cb = t["cls_b"].to_pylist()
                return _ngj_verify_rows(ca, cb, [m.get(x) for x in ca],
                                        [m.get(x) for x in cb], threshold)

            verified = cand.map_batches(vmap, batch_size=65536,
                                        batch_format="pyarrow")
    if verified is None:
        # fallback: prune distinct class texts by semi join, then two
        # bucketed joins attach each side's text — O(participating text)
        # per join, the same cost class as one LSH band pass
        ctext = docs.map_batches(
            lambda t: pa.table({
                "cls": pa.array(_text_cls(t["text"].to_pylist()),
                                pa.string()),
                "text": t["text"]}),
            batch_format="pyarrow")
        keys = cand.map_batches(
            lambda t: pa.table({"cls": pa.concat_arrays(
                [t["cls_a"].combine_chunks().cast(pa.string()),
                 t["cls_b"].combine_chunks().cast(pa.string())])}),
            batch_format="pyarrow")
        ctext = semi_anti_join(ctext, keys, "cls", "cls")
        ctext = bucketing.grouped(
            ctext, "cls", lambda df: df.drop_duplicates("cls")).materialize()
        ta = ctext.map_batches(
            lambda t: pa.table({"cls": t["cls"], "text_a": t["text"]}),
            batch_format="pyarrow")
        tb = ctext.map_batches(
            lambda t: pa.table({"cls": t["cls"], "text_b": t["text"]}),
            batch_format="pyarrow")
        j = shuffle_join(shuffle_join(cand, ta, "cls_a", "cls"),
                         tb, "cls_b", "cls")
        verified = j.map_batches(
            lambda t: _ngj_verify_rows(
                t["cls_a"].to_pylist(), t["cls_b"].to_pylist(),
                t["text_a"].to_pylist(), t["text_b"].to_pylist(),
                threshold),
            batch_format="pyarrow")

    return _ngj_expand(intra, verified, members, empty_pairs)


_NGJ_MEMBER_BROADCAST_LIMIT = 5_000_000


def _ngj_expand(intra: "ray.data.Dataset", verified: "ray.data.Dataset",
                members: "ray.data.Dataset",
                empty_pairs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Expand verified cross-class pairs to doc pairs through the member
    table and union with the intra-class triangles.  Two regimes: up to
    ``_NGJ_MEMBER_BROADCAST_LIMIT`` member rows the cls->ids map travels
    once via ray.put and expansion is a zero-shuffle map (classes are
    mostly singletons, so the shuffle joins were 2 full exchanges of the
    pair table for nothing — measured 10s -> ~1s at sf0.1); beyond the
    cap, two bucketed shuffle joins (never driver-bound)."""
    import numpy as np
    import ray as _ray

    from mail_deduplicate_ray.stages.joins import shuffle_join

    if members.count() <= _NGJ_MEMBER_BROADCAST_LIMIT:
        mm: dict[str, list[int]] = {}
        for b in members.iter_batches(batch_format="pyarrow",
                                      batch_size=65536):
            for ck, did in zip(b["cls"].to_pylist(),
                               b["doc_id"].to_pylist()):
                mm.setdefault(ck, []).append(did)
        ref = _ray.put({k: np.asarray(v, np.int64)
                        for k, v in mm.items()})

        def expand(t: pa.Table, ref=ref) -> pa.Table:
            m = _ray.get(ref)
            ca = t["cls_a"].to_pylist()
            cb = t["cls_b"].to_pylist()
            na = np.fromiter((len(m[x]) for x in ca), np.int64, len(ca))
            nb = np.fromiter((len(m[x]) for x in cb), np.int64, len(cb))
            if len(ca) and (na == 1).all() and (nb == 1).all():
                a = np.fromiter((m[x][0] for x in ca), np.int64, len(ca))
                b = np.fromiter((m[x][0] for x in cb), np.int64, len(cb))
            else:
                parts_a, parts_b = [], []
                for x, y in zip(ca, cb):
                    ma, mb = m[x], m[y]
                    parts_a.append(np.repeat(ma, len(mb)))
                    parts_b.append(np.tile(mb, len(ma)))
                a = (np.concatenate(parts_a) if parts_a
                     else np.empty(0, np.int64))
                b = (np.concatenate(parts_b) if parts_b
                     else np.empty(0, np.int64))
            return pa.table({
                "a_id": pa.array(np.minimum(a, b), pa.int64()),
                "b_id": pa.array(np.maximum(a, b), pa.int64())})

        cross = verified.map_batches(expand, batch_format="pyarrow",
                                     batch_size=65536)
        return intra.union(cross).union(empty_pairs)

    am = members.map_batches(
        lambda t: pa.table({"cls": t["cls"], "a_id": t["doc_id"]}),
        batch_format="pyarrow")
    bm = members.map_batches(
        lambda t: pa.table({"cls": t["cls"], "b_id": t["doc_id"]}),
        batch_format="pyarrow")
    e2 = shuffle_join(shuffle_join(verified, am, "cls_a", "cls"),
                      bm, "cls_b", "cls")
    cross = e2.map_batches(
        lambda t: pa.table({
            "a_id": pc.min_element_wise(t["a_id"], t["b_id"]),
            "b_id": pc.max_element_wise(t["a_id"], t["b_id"])}),
        batch_format="pyarrow")
    return intra.union(cross).union(empty_pairs)


def _ngj_block_pairs(docs: "ray.data.Dataset", threshold: float,
                     n_blocks: int = 8) -> "ray.data.Dataset":
    """Dense-regime exact Jaccard pairs over DISTINCT text classes: the
    block self-join idiom (see embedding_neardup_pairs) — every class
    replicates its packed gram set to its ``n_blocks`` block-pair buckets
    and each unordered block pair is scored by exactly one partition task
    with the vectorized postings walk (per-class searchsorted + bincount
    against the opposite block — the cache-resident kernel, never a
    per-pair Python loop).  No candidate dedup shuffle exists on this
    path: each class pair is examined exactly once."""
    import numpy as np

    from mail_deduplicate_ray.stages import bucketing

    ctext = docs.map_batches(
        lambda t: pa.table({
            "cls": pa.array(_text_cls(t["text"].to_pylist()), pa.string()),
            "text": t["text"]}),
        batch_format="pyarrow")
    classes = bucketing.grouped(
        ctext, "cls", lambda df: df.drop_duplicates("cls"))

    def explode(t: pa.Table) -> pa.Table:
        cls = t["cls"].to_pylist()
        grams = [_gram_set1(v) for v in t["text"].to_pylist()]
        base = pa.table({
            "cls": t["cls"],
            "blk": pa.array(bucketing.hash_to_buckets(cls, n_blocks)
                            .astype(np.int64), pa.int64()),
            "grams": pa.array([g.tobytes() for g in grams], pa.binary())})
        n = t.num_rows
        reps = np.repeat(np.arange(n), n_blocks)
        other = np.tile(np.arange(n_blocks, dtype=np.int64), n)
        mine = base["blk"].to_numpy(zero_copy_only=False)[reps]
        lo = np.minimum(mine, other)
        hi = np.maximum(mine, other)
        return base.take(pa.array(reps)).append_column(
            "pk", pa.array(lo * n_blocks + hi, pa.int64()))

    exploded = classes.map_batches(explode, batch_format="pyarrow")

    def part(df) -> pa.Table:
        cls_all = df["cls"].to_numpy()
        blk_all = df["blk"].to_numpy()
        grams_all = [np.frombuffer(b, np.uint64) for b in df["grams"]]
        sizes_all = np.array([len(g) for g in grams_all], dtype=np.int64)
        pks = df["pk"].to_numpy()
        a_out: list = []
        b_out: list = []
        order = np.argsort(pks, kind="stable")
        p_sorted = pks[order]
        bounds = np.flatnonzero(np.concatenate(
            ([True], p_sorted[1:] != p_sorted[:-1], [True])))
        for s, e in zip(bounds[:-1], bounds[1:]):
            idx = order[s:e]
            pk = int(p_sorted[s])
            i, j = pk // n_blocks, pk % n_blocks
            sb = idx[blk_all[idx] == j]
            sa = sb if i == j else idx[blk_all[idx] == i]
            if not len(sa) or not len(sb):
                continue
            # inverted postings over the RIGHT side, built once per pair
            flat = (np.concatenate([grams_all[k] for k in sb])
                    if len(sb) else np.empty(0, np.uint64))
            pos = np.repeat(np.arange(len(sb)), sizes_all[sb])
            o2 = np.argsort(flat, kind="stable")
            uniq, starts = np.unique(flat[o2], return_index=True)
            starts = np.append(starts, len(flat))
            postings = pos[o2]
            sizes_b = sizes_all[sb]
            cls_b = cls_all[sb]
            for k in sa.tolist():
                ga = grams_all[k]
                if not len(uniq):
                    continue
                loc = np.minimum(np.searchsorted(uniq, ga), len(uniq) - 1)
                hits = loc[uniq[loc] == ga]
                if not len(hits):
                    continue
                sel = np.concatenate(
                    [postings[starts[h]:starts[h + 1]] for h in hits])
                counts = np.bincount(sel, minlength=len(sb))
                union = len(ga) + sizes_b - counts
                ok = counts / union >= threshold
                if i == j:
                    ok &= cls_b > cls_all[k]  # each unordered pair once
                js = np.flatnonzero(ok)
                if len(js):
                    cbs = cls_b[js]
                    cas = np.full(len(js), cls_all[k], object)
                    a_out.append(np.minimum(cas, cbs))
                    b_out.append(np.maximum(cas, cbs))
        a = np.concatenate(a_out) if a_out else np.empty(0, object)
        b = np.concatenate(b_out) if b_out else np.empty(0, object)
        return pa.table({"cls_a": pa.array(a, pa.string()),
                         "cls_b": pa.array(b, pa.string())})

    nb = max(8, (n_blocks * (n_blocks + 1)) // 2)
    return bucketing.grouped(exploded, "pk", part, nbuckets=nb)


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


def levenshtein_neardup_pairs(sf_dir: str,
                              max_dist: int = 4) -> "ray.data.Dataset":
    """Edit-distance similarity join: every doc pair with
    ``levenshtein(text_a, text_b) <= max_dist`` — the typo/near-edit
    member of the dedup family (exact, not probabilistic).

    PassJoin shape (see ``functions/editdist.py``; recall 1.0 by
    pigeonhole): each doc INDEXES the ``d+1`` even segments of its own
    text keyed ``(len, seg_i, bytes)`` and PROBES, for every partner
    length ``L`` in ``[len-d, len]`` (the partition of the SHORTER side
    of any pair is the indexed one), the substrings that could align
    with ``L``'s segments (start within ``±d`` of the segment start).
    Keys are 8-byte blake2b digests, so the ONE bucketed shuffle moves
    ~17-byte rows; per-bucket bipartite pair-gen, then the banded-DP
    verify (common prefix/suffix trim): below the pair cap the
    candidate set dedups on the driver and only PARTICIPATING texts are
    collected via a zero-shuffle broadcast-filtered scan (both
    output-bounded); above it, a dedup shuffle + two bucketed text
    joins (never driver-bound).
    Strings of ``len <= 2d`` meet in a single 'tiny' bucket (the
    pigeonhole needs ``d+1`` non-empty segments); that bucket is bounded
    by the corpus length histogram, every other stage is O(rows).
    """
    import numpy as np

    from mail_deduplicate_ray.functions import editdist
    from mail_deduplicate_ray.stages.bucketing import grouped
    from mail_deduplicate_ray.stages.joins import shuffle_join

    d = max_dist
    nseg = d + 1
    docs = _docs(sf_dir, ["doc_id", "text"])

    def emit(t: pa.Table) -> pa.Table:
        keys: list[int] = []
        ids: list[int] = []
        sides: list[int] = []
        for did, text in zip(t["doc_id"].to_pylist(),
                             t["text"].to_pylist()):
            s = text or ""
            n = len(s)
            seen: set[tuple[int, int]] = set()

            def add(side: int, k: int) -> None:
                if (side, k) not in seen:
                    seen.add((side, k))
                    keys.append(k)
                    ids.append(did)
                    sides.append(side)

            if n <= 2 * d:          # pairs whose shorter side <= d
                add(0, 0)
                add(1, 0)
            if n >= nseg:           # own partition, indexed
                for i, (st, ln) in enumerate(editdist.segments(n, nseg)):
                    add(0, editdist.seg_key(n, i, s[st:st + ln]))
            # probe the partitions of shorter-or-equal partner lengths
            for L in range(max(n - d, nseg), n + 1):
                for i, (st, ln) in enumerate(editdist.segments(L, nseg)):
                    lo = max(st - d, 0)
                    hi = min(st + d, n - ln)
                    for p in range(lo, hi + 1):
                        add(1, editdist.seg_key(L, i, s[p:p + ln]))
        return pa.table({
            "key": pa.array(np.asarray(keys, np.uint64), pa.uint64()),
            "doc_id": pa.array(ids, pa.int64()),
            "side": pa.array(sides, pa.int8()),
        })

    rows = docs.map_batches(emit, batch_format="pyarrow")

    def part(df) -> pa.Table:
        # vectorized bipartite pair-gen: keep only keys present on BOTH
        # sides (np.intersect1d), one argsort + np.split — never a
        # per-group pandas loop over the ~mostly-singleton key space
        # (measured 46 s -> sub-second at sf0.01)
        key = df["key"].to_numpy().astype(np.uint64)
        did = df["doc_id"].to_numpy().astype(np.int64)
        side = df["side"].to_numpy()
        both = np.intersect1d(np.unique(key[side == 0]),
                              np.unique(key[side == 1]),
                              assume_unique=True)
        empty = pa.table({"a_id": pa.array([], pa.int64()),
                          "b_id": pa.array([], pa.int64())})
        if not len(both):
            return empty
        m = np.isin(key, both)
        key, did, side = key[m], did[m], side[m]
        order = np.argsort(key, kind="stable")
        did, side = did[order], side[order]
        _, starts = np.unique(key[order], return_index=True)
        a_out, b_out = [], []
        for ids_g, sd_g in zip(np.split(did, starts[1:]),
                               np.split(side, starts[1:])):
            idx = ids_g[sd_g == 0]
            prb = ids_g[sd_g == 1]
            a = np.repeat(idx, len(prb))
            b = np.tile(prb, len(idx))
            keep = a != b
            if keep.any():
                a, b = a[keep], b[keep]
                a_out.append(np.minimum(a, b))
                b_out.append(np.maximum(a, b))
        if not a_out:
            return empty
        return pa.table({
            "a_id": pa.array(np.concatenate(a_out), pa.int64()),
            "b_id": pa.array(np.concatenate(b_out), pa.int64())})

    cand = grouped(rows, "key", part).materialize()

    # fast path: collect the candidate pair set on the driver (dedup is
    # a set add — this also replaces the cross-bucket dedup shuffle),
    # broadcast the participating ids, one zero-shuffle scan collects
    # only THOSE docs' texts (bounded by 2x candidates), and one
    # map_batches verifies.  Above the cap: dedup shuffle + two
    # bucketed text joins (never driver-bound), parity-tested.
    import ray as _ray

    if cand.count() <= _LEV_PAIR_BROADCAST_LIMIT:
        pair_set: set[tuple[int, int]] = set()
        for b in cand.iter_batches(batch_format="pyarrow"):
            pair_set.update(zip(b["a_id"].to_pylist(),
                                b["b_id"].to_pylist()))
        if not pair_set:
            return cand  # empty, schema already (a_id, b_id)
        ids = np.unique(np.array(list(pair_set), np.int64))
        id_ref = _ray.put(ids)

        def pick_texts(t: pa.Table, ref=id_ref) -> pa.Table:
            want = _ray.get(ref)
            di = t["doc_id"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            m = np.isin(di, want)
            return pa.table({"doc_id": pa.array(di[m], pa.int64()),
                             "text": t["text"].filter(pa.array(m))})

        texts: dict[int, str] = {}
        for b in docs.map_batches(pick_texts, batch_format="pyarrow") \
                     .iter_batches(batch_format="pyarrow"):
            texts.update(zip(b["doc_id"].to_pylist(),
                             b["text"].to_pylist()))
        tref = _ray.put(texts)
        arr = np.array(sorted(pair_set), np.int64)
        pairs_ds = ray.data.from_arrow(pa.table({
            "a_id": pa.array(arr[:, 0], pa.int64()),
            "b_id": pa.array(arr[:, 1], pa.int64())}))

        def bverify(t: pa.Table, ref=tref) -> pa.Table:
            tx = _ray.get(ref)
            ok = [editdist.lev_within(tx.get(x) or "", tx.get(y) or "", d)
                  for x, y in zip(t["a_id"].to_pylist(),
                                  t["b_id"].to_pylist())]
            return t.filter(pa.array(ok, pa.bool_()))

        return pairs_ds.map_batches(bverify, batch_format="pyarrow",
                                    batch_size=8192)

    cand = grouped(cand, "a_id",
                   lambda df: df.drop_duplicates(subset=["a_id", "b_id"]))
    cand = cand.materialize()
    ta = docs.map_batches(
        lambda t: pa.table({"a_id": t["doc_id"], "text_a": t["text"]}),
        batch_format="pyarrow")
    tb = docs.map_batches(
        lambda t: pa.table({"b_id": t["doc_id"], "text_b": t["text"]}),
        batch_format="pyarrow")
    joined = shuffle_join(shuffle_join(cand, ta, "a_id", "a_id"),
                          tb, "b_id", "b_id")

    def verify(t: pa.Table) -> pa.Table:
        ok = [editdist.lev_within(x or "", y or "", d)
              for x, y in zip(t["text_a"].to_pylist(),
                              t["text_b"].to_pylist())]
        kept = t.filter(pa.array(ok, pa.bool_()))
        return kept.select(["a_id", "b_id"])

    return joined.map_batches(verify, batch_format="pyarrow")


def levenshtein_clusters(sf_dir: str,
                         max_dist: int = 4) -> "ray.data.Dataset":
    """Edit-distance near-dup CLUSTERING: connected components over the
    ``levenshtein <= max_dist`` pair graph; ``cluster_id`` = min doc_id
    in the component, singletons label themselves.

    This is the first SQL-ORACLED connected-components query: DuckDB
    replays the transitive closure with a recursive CTE over the same
    pair predicate, so the distributed CC engine (hashmin
    pointer-jumping / star contraction, ``stages/components.py``) is
    value-checked against an independent truth — previously it carried
    only driver-vs-distributed parity evidence.  Ids travel zero-padded
    so the engine's min-label (string order) equals the numeric min."""
    from mail_deduplicate_ray.stages import components

    pairs = levenshtein_neardup_pairs(sf_dir, max_dist)

    def pad(col):
        return pc.utf8_lpad(pc.cast(col, pa.string()), 20, "0")

    edges = pairs.map_batches(
        lambda t: pa.table({"src": pad(t["a_id"]), "dst": pad(t["b_id"])}),
        batch_format="pyarrow")
    labels = components.connected_components(edges)
    ids = _docs(sf_dir, ["doc_id"]).map_batches(
        lambda t: pa.table({"clip_id": pad(t["doc_id"])}),
        batch_format="pyarrow")
    out = components.attach_cluster_ids(ids, labels)
    return out.map_batches(
        lambda t: pa.table({
            "doc_id": pc.cast(t["clip_id"], pa.int64()),
            "cluster_id": pc.cast(t["cluster_id"], pa.int64())}),
        batch_format="pyarrow")


def cluster_best_docs(sf_dir: str) -> "ray.data.Dataset":
    """Per-cluster best-representative selection — the docs-table
    analogue of the flagship's settle winner (ref: select-biggest X8 +
    min-id tiebreak applied per near-dup cluster): over the
    ``levenshtein_clusters`` components, keep each cluster's longest
    document (n_chars desc, doc_id asc tiebreak).  Output: (cluster_id,
    doc_id, n_chars) — one row per cluster.

    Scale shape: the CC labels (scalar rows) join n_chars via one
    doc_id-bucketed shuffle, then one cluster-bucketed argmax.  The
    oracle replays the full closure + argmax in SQL, making this the
    first fully-SQL-checked dedup SELECTION (not just clustering)."""
    from mail_deduplicate_ray.stages import joins
    from mail_deduplicate_ray.stages.bucketing import grouped

    labels = levenshtein_clusters(sf_dir)
    meta = _docs(sf_dir, ["doc_id", "n_chars"])
    joined = joins.shuffle_join(labels, meta, "doc_id", "doc_id",
                                how="inner")

    def argmax(df):
        df = df.sort_values(["cluster_id", "n_chars", "doc_id"],
                            ascending=[True, False, True])
        out = df.groupby("cluster_id", sort=False).head(1)
        return pa.table({
            "cluster_id": pa.array(out["cluster_id"].to_numpy(), pa.int64()),
            "doc_id": pa.array(out["doc_id"].to_numpy(), pa.int64()),
            "n_chars": pa.array(out["n_chars"].to_numpy(), pa.int64())})

    return grouped(joined, "cluster_id", argmax)


def incremental_neardup_docs(sf_dir: str, max_dist: int = 4,
                             mod: int = 7) -> "ray.data.Dataset":
    """Incremental-snapshot near-dup screening: which NEW documents
    (``doc_id % mod == 0`` plays the fresh ingest batch) are within
    edit distance ``max_dist`` of any BASE document (the already-curated
    corpus)?  Output: (doc_id, base_id) with base_id = the smallest
    matching base doc — the anti-join feed of an incremental ingestion
    pipeline (ref cache-resume analogue: J1 anti-join,
    state/checkpoint.py; here the index is content similarity, not an
    exact key, so the screen must run the near-dup machinery).

    Scale shape: composes the distributed edit-distance pair engine
    (length-banded pigeonhole candidates, banded-DP verify) with one
    scalar-pair orientation filter and a bucketed min-reduce — no new
    shuffle of text."""
    from mail_deduplicate_ray.stages.bucketing import grouped

    pairs = levenshtein_neardup_pairs(sf_dir, max_dist)

    def orient(t: pa.Table) -> pa.Table:
        import numpy as np

        a = t["a_id"].to_numpy(zero_copy_only=False)
        b = t["b_id"].to_numpy(zero_copy_only=False)
        u = np.concatenate([a, b])
        v = np.concatenate([b, a])
        keep = (u % mod == 0) & (v % mod != 0)
        return pa.table({"u": pa.array(u[keep], pa.int64()),
                         "v": pa.array(v[keep], pa.int64())})

    oriented = pairs.map_batches(orient, batch_format="pyarrow")

    def min_base(df):
        g = (df.groupby("u", sort=False, as_index=False)
             .agg(base_id=("v", "min")))
        return pa.table({
            "doc_id": pa.array(g["u"].to_numpy(), pa.int64()),
            "base_id": pa.array(g["base_id"].to_numpy(), pa.int64())})

    return grouped(oriented, "u", min_base)


def chunk_dedup_docs(sf_dir: str, w: int = 10) -> "ray.data.Dataset":
    """Paragraph-granularity dedup WITH document reconstruction — the
    MassiveText/Dolma-style operator that dedups below document level:
    each document splits into consecutive ``w``-token chunks (the
    "paragraphs" of this single-line corpus), every chunk keeps only
    its globally-FIRST occurrence (ordered by doc_id, chunk_idx), and
    surviving chunks reassemble into the deduplicated document.
    Output: (doc_id, dedup_text, n_kept) — docs whose every chunk was
    seen earlier vanish, exactly as SQL GROUP BY over kept rows does.

    Scale shape: one chunk-keyed bucketed shuffle picks winners (the
    chunk STRING is the in-bucket group key, so equality is exact —
    the bucket router may hash), one doc-keyed bucketed shuffle
    reassembles.  Chunk text moves through both shuffles; that traffic
    is inherent (reassembly needs the bytes).  Ref analogue: M12 body
    hashing at sub-document granularity + G1 group-by-hash keep-first."""
    from mail_deduplicate_ray.stages.bucketing import grouped

    docs = _docs(sf_dir, ["doc_id", "text"])

    def explode(t: pa.Table) -> pa.Table:
        out_c, out_d, out_i = [], [], []
        for did, v in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            # split on single spaces to match SQL string_split(text, ' ')
            toks = (v or "").split(" ")
            for i in range(0, (len(toks) + w - 1) // w):
                out_c.append(" ".join(toks[i * w:(i + 1) * w]))
                out_d.append(did)
                out_i.append(i)
        return pa.table({"chunk": pa.array(out_c, pa.string()),
                         "doc_id": pa.array(out_d, pa.int64()),
                         "chunk_idx": pa.array(out_i, pa.int64())})

    chunks = docs.map_batches(explode, batch_format="pyarrow")

    def keep_first(df):
        df = df.sort_values(["chunk", "doc_id", "chunk_idx"])
        out = df.groupby("chunk", sort=False).head(1)
        return pa.table({
            "chunk": pa.array(out["chunk"].tolist(), pa.string()),
            "doc_id": pa.array(out["doc_id"].to_numpy(), pa.int64()),
            "chunk_idx": pa.array(out["chunk_idx"].to_numpy(), pa.int64())})

    kept = grouped(chunks, "chunk", keep_first)

    def reassemble(df):
        df = df.sort_values(["doc_id", "chunk_idx"])
        g = (df.groupby("doc_id", sort=False)
             .agg(dedup_text=("chunk", " ".join), n_kept=("chunk", "size")))
        g = g.reset_index()
        return pa.table({
            "doc_id": pa.array(g["doc_id"].to_numpy(), pa.int64()),
            "dedup_text": pa.array(g["dedup_text"].tolist(), pa.string()),
            "n_kept": pa.array(g["n_kept"].to_numpy(), pa.int64())})

    return grouped(kept, "doc_id", reassemble)


def dup_span_intervals_docs(sf_dir: str, L: int = 50) -> "ray.data.Dataset":
    """Duplicate-span detection — the exact-substring training-data
    dedup of Lee et al. 2022 ("Deduplicating Training Data Makes
    Language Models Better", arXiv:2107.06499): mark every character
    position covered by a length-``L`` gram that also occurs in
    ANOTHER document, and merge the marked positions into maximal
    removal intervals.  Output: (doc_id, start_pos, end_pos) per
    merged interval, 0-based inclusive — the cut list a span-removal
    pass would apply.

    Scale shape: gram explode (zero-copy numpy sliding window over the
    batch's concatenated bytes; ASCII corpus assumption as documented
    for top_trigrams) → ONE gram-keyed bucketed shuffle computes
    cross-doc distinct counts (the gram STRING is the in-bucket group
    key — exact equality; at 10^12 scale swap the carried string for a
    128-bit fingerprint) → ONE doc-keyed bucketed shuffle merges
    intervals (vectorized gaps-and-islands).  No driver state, no
    broadcast.  Ref analogue: G3/G4 pairwise content diff, here
    inverted into a corpus-wide positional index."""
    import numpy as np

    from mail_deduplicate_ray.stages.bucketing import grouped

    docs = _docs(sf_dir, ["doc_id", "text"])

    def explode(t: pa.Table) -> pa.Table:
        out_g: list[str] = []
        out_d: list[np.ndarray] = []
        out_p: list[np.ndarray] = []
        for did, v in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            v = v or ""
            n = len(v) - L + 1
            if n <= 0:
                continue
            out_g.extend(v[i:i + L] for i in range(n))
            out_d.append(np.full(n, did, np.int64))
            out_p.append(np.arange(n, dtype=np.int64))
        if not out_g:
            return pa.table({"gram": pa.array([], pa.string()),
                             "doc_id": pa.array([], pa.int64()),
                             "pos": pa.array([], pa.int64())})
        return pa.table({"gram": pa.array(out_g, pa.string()),
                         "doc_id": pa.array(np.concatenate(out_d), pa.int64()),
                         "pos": pa.array(np.concatenate(out_p), pa.int64())})

    grams = docs.map_batches(explode, batch_format="pyarrow")

    def cross_doc_marks(df):
        nd = df.groupby("gram", sort=False)["doc_id"].transform("nunique")
        out = df[nd >= 2]
        return pa.table({
            "doc_id": pa.array(out["doc_id"].to_numpy(), pa.int64()),
            "pos": pa.array(out["pos"].to_numpy(), pa.int64())})

    marks = grouped(grams, "gram", cross_doc_marks)

    def merge_intervals(df):
        df = df.sort_values(["doc_id", "pos"])
        d = df["doc_id"].to_numpy()
        p = df["pos"].to_numpy()
        # island break: new doc, or gap > L (coverage [pos, pos+L-1]
        # unions are contiguous iff next_pos <= prev_pos + L)
        brk = np.ones(len(d), bool)
        if len(d) > 1:
            brk[1:] = (d[1:] != d[:-1]) | (p[1:] > p[:-1] + L)
        gid = np.cumsum(brk) - 1
        n = gid[-1] + 1 if len(gid) else 0
        # positions are sorted within each island, so first/last suffice
        first = np.flatnonzero(brk)
        last = np.append(first[1:] - 1, len(p) - 1) if n else first
        starts = p[first] if n else np.zeros(0, np.int64)
        ends = p[last] if n else np.zeros(0, np.int64)
        docs_out = d[first] if n else np.zeros(0, np.int64)
        return pa.table({
            "doc_id": pa.array(docs_out, pa.int64()),
            "start_pos": pa.array(starts, pa.int64()),
            "end_pos": pa.array(ends + L - 1, pa.int64())})

    return grouped(marks, "doc_id", merge_intervals)


def leakage_free_splits_docs(sf_dir: str, test_pct: int = 10,
                             val_pct: int = 10) -> "ray.data.Dataset":
    """Cluster-aware train/val/test assignment — the LEAKAGE-FREE split
    a training pipeline needs: every member of a near-dup cluster lands
    in the SAME split (splitting by raw doc hash would put a document
    in train and its near-duplicate in test, silently inflating eval).
    Split = Knuth multiplicative hash of the CLUSTER id, so assignment
    is deterministic at any parallelism and replayed exactly by the SQL
    oracle.  Output: (doc_id, cluster_id, split).

    Scale shape: the CC labels are scalar rows; the split is a pure
    vectorized map over them — no shuffle beyond what the clustering
    already did."""
    import numpy as np

    labels = levenshtein_clusters(sf_dir)

    def assign(t: pa.Table) -> pa.Table:
        cid = t["cluster_id"].to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        h = (cid * np.uint64(2654435761)) % np.uint64(1 << 32) \
            % np.uint64(100)
        split = np.where(h < test_pct, "test",
                         np.where(h < test_pct + val_pct, "val", "train"))
        return t.append_column("split", pa.array(split.tolist(),
                                                 pa.string()))

    return labels.map_batches(assign, batch_format="pyarrow")


def lang_adaptive_length_filter_docs(sf_dir: str, lo_q: float = 0.05,
                                     hi_q: float = 0.95
                                     ) -> "ray.data.Dataset":
    """Per-language ADAPTIVE length gate (the Gopher-rules shape, made
    distribution-aware): keep docs whose n_chars lies within their OWN
    language's [p5, p95] discrete quantiles — a fixed global threshold
    over- or under-prunes languages with different length profiles.
    Output: (doc_id, lang, n_chars) kept rows.

    Scale shape: value-count compression (one (lang, n_chars, n) row
    per distinct pair per batch) -> one tiny lang-bucketed shuffle for
    thresholds (distinct lengths are bounded, rows are not) -> the
    thresholds table is languages-sized, so it broadcasts into a
    zero-shuffle filter scan.  quantile_disc convention: 0-based index
    ceil(q*n)-1, clamped at 0 (matches DuckDB, like
    order_price_quantiles)."""
    import math

    import numpy as np
    import ray as _ray

    from mail_deduplicate_ray.stages.bucketing import grouped

    docs = _docs(sf_dir, ["doc_id", "lang", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["lang", "n_chars"]).aggregate([("n_chars", "count")])
        return pa.table({"lang": g["lang"], "n_chars": g["n_chars"],
                         "n": pc.cast(g["n_chars_count"], pa.int64())})

    partials = docs.map_batches(partial, batch_format="pyarrow")

    def thresholds(df):
        rows = []
        for lang, g in df.groupby("lang", sort=True, dropna=False):
            vc = g.groupby("n_chars")["n"].sum().sort_index()
            vals = vc.index.to_numpy()
            cum = vc.to_numpy().cumsum()
            total = int(cum[-1])
            out = []
            for q in (lo_q, hi_q):
                r = max(math.ceil(q * total), 1) - 1
                out.append(int(vals[int(np.searchsorted(cum, r + 1))]))
            rows.append((lang, out[0], out[1]))
        import pandas as pd
        return pd.DataFrame(rows, columns=["lang", "lo", "hi"])

    th = pa.concat_tables(
        grouped(partials, "lang", thresholds, batch_format="pandas")
        .iter_batches(batch_format="pyarrow"))
    bounds = {lang: (lo, hi)
              for lang, lo, hi in zip(th["lang"].to_pylist(),
                                      th["lo"].to_pylist(),
                                      th["hi"].to_pylist())}
    ref = _ray.put(bounds)

    def gate(t: pa.Table) -> pa.Table:
        b = _ray.get(ref)
        langs = t["lang"].to_pylist()
        nc = t["n_chars"].to_numpy(zero_copy_only=False)
        keep = np.fromiter(
            (lang in b and b[lang][0] <= c <= b[lang][1]
             for lang, c in zip(langs, nc)), bool, len(langs))
        return t.filter(pa.array(keep))

    return docs.map_batches(gate, batch_format="pyarrow").sort("doc_id")


def mixture_rebalance_docs(sf_dir: str) -> "ray.data.Dataset":
    """Mixture REBALANCING — downsample every language to the minority
    language's mass so the corpus mixture is uniform (the
    sampling-weights step of training-data assembly, integer-exact):
    keep a doc iff its Knuth hash lands under its language's per-mille
    acceptance rate ``floor(1000 * min_count / count_lang)``.
    Output: (doc_id, lang) kept rows.

    Scale shape: one languages-sized count aggregate (collected — it is
    #languages rows regardless of corpus size), rates broadcast in the
    task closure, then a pure vectorized zero-shuffle filter.  The
    hash arithmetic replays exactly in SQL (HUGEINT), like
    stratified_sample_docs."""
    import numpy as np

    from ray.data.aggregate import Count

    docs = _docs(sf_dir, ["doc_id", "lang"])
    counts = {r["lang"]: r["count()"] for r in
              docs.groupby("lang").aggregate(Count()).take_all()}
    mn = min(counts.values())
    permille = {lang: 1000 * mn // n for lang, n in counts.items()}

    def gate(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (ids * np.uint64(2654435761)) % np.uint64(1 << 32) \
            % np.uint64(1000)
        rate = np.fromiter((permille[v] for v in t["lang"].to_pylist()),
                           np.uint64, t.num_rows)
        return t.filter(pa.array(h < rate))

    return docs.map_batches(gate, batch_format="pyarrow").sort("doc_id")


def global_shuffle_order_docs(sf_dir: str,
                              nbuckets: int = 256) -> "ray.data.Dataset":
    """Deterministic GLOBAL SHUFFLE ORDER — every doc's position in the
    hash-permuted corpus (the reproducible training-order operator: the
    same permutation at any parallelism, any cluster size, any re-run).
    Output: (doc_id, position) with position = rank under
    ``ORDER BY knuth_hash(doc_id), doc_id``.

    Scale shape (the pack_sequences prefix-sum idiom on the HASH axis):
    hash-RANGE buckets are contiguous in the permuted order, so
    per-bucket counts (one tiny aggregate) scan into exclusive base
    offsets on the driver, broadcast, and each bucket ranks locally —
    a global total order with NO global sort."""
    import numpy as np

    import ray as _ray

    from ray.data.aggregate import Count
    from mail_deduplicate_ray.stages.bucketing import grouped

    docs = _docs(sf_dir, ["doc_id"])
    shift = np.uint64(32 - int(np.log2(nbuckets)))

    def keyed(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (ids * np.uint64(2654435761)) % np.uint64(1 << 32)
        return pa.table({
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "h": pa.array(h.astype(np.int64), pa.int64()),
            "__hb": pa.array((h >> shift).astype(np.int64), pa.int64())})

    rows = docs.map_batches(keyed, batch_format="pyarrow")

    totals = rows.groupby("__hb").aggregate(Count()).take_all()
    totals.sort(key=lambda r: r["__hb"])
    base, acc = {}, 0
    for r in totals:
        base[r["__hb"]] = acc
        acc += r["count()"]
    base_ref = _ray.put(base)

    def part(df, base_ref=base_ref):
        bases = _ray.get(base_ref)
        out = []
        for hb, g in df.groupby("__hb", sort=False):
            g = g.sort_values(["h", "doc_id"])
            pos = bases[hb] + np.arange(len(g), dtype=np.int64)
            out.append(pa.table({
                "doc_id": pa.array(g["doc_id"].to_numpy(), pa.int64()),
                "position": pa.array(pos, pa.int64())}))
        return pa.concat_tables(out) if out else pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "position": pa.array([], pa.int64())})

    return grouped(rows, "__hb", part)


def bloom_incremental_dedup_docs(sf_dir: str,
                                 mod: int = 7) -> "ray.data.Dataset":
    """BFF-style incremental exact dedup (the Dolma "bloom filter file"
    screen): the BASE corpus (``doc_id % mod != 0``) folds into a
    mergeable Bloom sketch; the NEW ingest batch (``doc_id % mod == 0``)
    keeps only docs whose text hash tests NEGATIVE.  The bloom has no
    false negatives, so no duplicate of a base text ever survives; its
    false positives wrongly drop a bounded fraction of unique new docs —
    the constant-memory trade-off this operator exists for (the
    checkpoint anti-join in state/checkpoint.py is the exact-key
    alternative; this one costs 128 KiB per 100k keys, period).
    Output: (doc_id, n_chars) of kept new docs.

    Scale shape: per-batch bloom partials (one 128 KiB row each) reduce
    on the driver by OR — a tiny fixed-size reduce, never a shuffle of
    the keys — then ONE ``ray.put`` broadcast feeds a zero-shuffle
    streaming filter of the new split.  At 10^12 rows the filter shards
    by key hash range (one partial per range, probed by that range's
    rows); the partial/merge API in functions/sketch.py is the unit.

    SQL-oracled (VERDICT r3 item 6): the k=4 probe positions are four
    DISJOINT 20-bit slices of sha256(text) (m = 2^20 bits), so DuckDB
    replays every bloom decision exactly — base probes union via
    DISTINCT, a new doc is kept iff >= 1 of its probe bits is absent
    from that union.  Same no-false-negative / bounded-FP semantics as
    the SplitMix64 probes this replaced; independence comes from the
    hash being cryptographic."""
    import hashlib

    import numpy as np

    import ray as _ray

    from mail_deduplicate_ray.functions import sketch

    docs = _docs(sf_dir, ["doc_id", "text", "n_chars"])
    n_words = sketch.BLOOM_BITS >> 6  # 2^20 bits packed into uint64 words

    def sha_positions(texts: list) -> np.ndarray:
        """(n, 4) probe positions: hex slices [0:5],[5:10],[10:15],[15:20]
        of sha256(text) — 20 bits each, disjoint, uniform over 2^20."""
        out = np.empty((len(texts), 4), np.uint64)
        for i, s in enumerate(texts):
            h = hashlib.sha256((s or "").encode("utf-8")).hexdigest()
            out[i] = (int(h[0:5], 16), int(h[5:10], 16),
                      int(h[10:15], 16), int(h[15:20], 16))
        return out

    def base_partial(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        texts = [v for v, keep in zip(t["text"].to_pylist(), ids % mod != 0)
                 if keep]
        bits = np.zeros(n_words, np.uint64)
        if texts:
            p = sha_positions(texts).ravel()
            np.bitwise_or.at(bits, (p >> np.uint64(6)).astype(np.int64),
                             np.uint64(1) << (p & np.uint64(63)))
        return pa.table({"bits": pa.array([bits], pa.list_(pa.uint64()))})

    merged = np.zeros(n_words, np.uint64)
    for b in docs.map_batches(base_partial, batch_format="pyarrow") \
                 .iter_batches(batch_format="pyarrow"):
        for row in b["bits"].to_pylist():
            merged |= np.asarray(row, np.uint64)
    ref = _ray.put(merged)

    def screen(t: pa.Table) -> pa.Table:
        bits = _ray.get(ref)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        new = t.filter(pa.array(ids % mod == 0))
        texts = new["text"].to_pylist()
        if not texts:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_chars": pa.array([], pa.int64())})
        p = sha_positions(texts)                      # (n, 4)
        word = bits[(p >> np.uint64(6)).astype(np.int64)]
        hit = (word >> (p & np.uint64(63))) & np.uint64(1) != 0
        kept = new.filter(pa.array(~hit.all(axis=1)))
        return pa.table({"doc_id": pc.cast(kept["doc_id"], pa.int64()),
                         "n_chars": pc.cast(kept["n_chars"], pa.int64())})

    return docs.map_batches(screen, batch_format="pyarrow").sort("doc_id")


def dup_span_removal_docs(sf_dir: str, L: int = 50) -> "ray.data.Dataset":
    """Duplicate-span REMOVAL — the actual cut pass of Lee et al. 2022
    exact-substring dedup: every char position covered by a cross-doc
    ``L``-gram is deleted and the surviving segments re-concatenate.
    Output: one row per document — (doc_id, clean_text, n_removed);
    docs with no duplicated span pass through verbatim (n_removed=0),
    fully-covered docs survive as empty text (the caller's min-length
    gate drops them, as in the paper's pipeline).

    Scale shape: the cross-doc gram marks come from the same gram-keyed
    shuffle as ``dup_span_intervals_docs``; the TEXT joins the marks in
    the SAME doc-keyed shuffle as union rows (pos = -1 carries the
    text; the dup_ngram_fraction idiom) — two shuffles total, no join
    stage, no broadcast."""
    import numpy as np

    from mail_deduplicate_ray.stages.bucketing import grouped

    docs = _docs(sf_dir, ["doc_id", "text"])

    def explode(t: pa.Table) -> pa.Table:
        out_g: list[str] = []
        out_d: list[np.ndarray] = []
        out_p: list[np.ndarray] = []
        for did, v in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            v = v or ""
            n = len(v) - L + 1
            if n <= 0:
                continue
            out_g.extend(v[i:i + L] for i in range(n))
            out_d.append(np.full(n, did, np.int64))
            out_p.append(np.arange(n, dtype=np.int64))
        if not out_g:
            return pa.table({"gram": pa.array([], pa.string()),
                             "doc_id": pa.array([], pa.int64()),
                             "pos": pa.array([], pa.int64())})
        return pa.table({"gram": pa.array(out_g, pa.string()),
                         "doc_id": pa.array(np.concatenate(out_d), pa.int64()),
                         "pos": pa.array(np.concatenate(out_p), pa.int64())})

    grams = docs.map_batches(explode, batch_format="pyarrow")

    def cross_doc_marks(df):
        nd = df.groupby("gram", sort=False)["doc_id"].transform("nunique")
        out = df[nd >= 2]
        return pa.table({
            "doc_id": pa.array(out["doc_id"].to_numpy(), pa.int64()),
            "pos": pa.array(out["pos"].to_numpy(), pa.int64()),
            "text": pa.array([None] * len(out), pa.string())})

    marks = grouped(grams, "gram", cross_doc_marks)

    def carrier(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "pos": pa.array(np.full(t.num_rows, -1, np.int64), pa.int64()),
            "text": t["text"]})

    carriers = docs.map_batches(carrier, batch_format="pyarrow")

    def cut(df):
        out_id, out_text, out_rm = [], [], []
        for did, g in df.groupby("doc_id", sort=False):
            tx = g.loc[g["pos"] == -1, "text"]
            if tx.empty:        # marks hashed here but carrier elsewhere
                continue        # cannot happen: same key, same bucket
            text = tx.iloc[0] or ""
            pos = np.sort(g.loc[g["pos"] >= 0, "pos"].to_numpy())
            keep = np.ones(len(text), bool)
            if len(pos):
                # covered chars: union of [p, p+L-1] — mark via diff array
                delta = np.zeros(len(text) + 1, np.int64)
                np.add.at(delta, pos, 1)
                np.add.at(delta, np.minimum(pos + L, len(text)), -1)
                keep = np.cumsum(delta[:-1]) == 0
            arr = np.frombuffer(text.encode(), np.uint8)
            clean = arr[keep[:len(arr)]].tobytes().decode()
            out_id.append(did)
            out_text.append(clean)
            out_rm.append(int((~keep).sum()))
        return pa.table({
            "doc_id": pa.array(out_id, pa.int64()),
            "clean_text": pa.array(out_text, pa.string()),
            "n_removed": pa.array(out_rm, pa.int64())})

    return grouped(marks.union(carriers), "doc_id", cut)


def distinctive_terms_docs(sf_dir: str, k: int = 3) -> "ray.data.Dataset":
    """Per-document DISTINCTIVE terms — the integer-exact core of
    tf-idf term weighting: each doc's top-``k`` tokens ranked by term
    frequency descending, document frequency ascending (rarer across
    the corpus = more distinctive), token ascending as the
    deterministic tiebreak.  Output: (doc_id, token, rank).  No float
    idf crosses the ranking, so the SQL oracle replays the order
    bit-for-bit.

    Scale shape: explode (token, doc_id, tf) with within-doc counts
    pre-folded; ONE token-bucketed shuffle attaches df (= group size,
    since rows are distinct per (token, doc)); ONE doc-bucketed
    shuffle ranks and takes the head — no driver table, no broadcast
    (the df side would be vocabulary-sized)."""
    import numpy as np

    from mail_deduplicate_ray.stages.bucketing import grouped

    docs = _docs(sf_dir, ["doc_id", "text"])

    def explode(t: pa.Table) -> pa.Table:
        out_t, out_d, out_n = [], [], []
        for did, v in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            cnt: dict[str, int] = {}
            for tok in (v or "").split():
                cnt[tok] = cnt.get(tok, 0) + 1
            out_t.extend(cnt.keys())
            out_d.extend([did] * len(cnt))
            out_n.extend(cnt.values())
        return pa.table({"token": pa.array(out_t, pa.string()),
                         "doc_id": pa.array(out_d, pa.int64()),
                         "tf": pa.array(np.asarray(out_n, np.int64),
                                        pa.int64())})

    tf = docs.map_batches(explode, batch_format="pyarrow")

    def attach_df(df):
        df = df.copy()
        df["df"] = df.groupby("token", sort=False)["token"] \
                     .transform("size").astype("int64")
        return df

    with_df = grouped(tf, "token", attach_df)

    def rank_part(df):
        df = df.sort_values(["doc_id", "tf", "df", "token"],
                            ascending=[True, False, True, True])
        df["rank"] = df.groupby("doc_id", sort=False).cumcount() + 1
        out = df[df["rank"] <= k]
        return pa.table({
            "doc_id": pa.array(out["doc_id"].to_numpy(), pa.int64()),
            "token": pa.array(out["token"].tolist(), pa.string()),
            "rank": pa.array(out["rank"].to_numpy(), pa.int64())})

    return grouped(with_df, "doc_id", rank_part)


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


def heavy_tokens(sf_dir: str, min_count: int = 500) -> "ray.data.Dataset":
    """Heavy-hitter tokens (EXACT output): every whitespace token whose
    corpus-wide count is ``>= min_count``, found via the
    sketch-candidate → exact-rescan idiom.

    Pass 1 folds each batch's distinct-token counts into a Count-Min
    partial (``functions/sketch.py``; fixed 4×4096 grid, merged by add
    — a driver reduce of one tiny row per block, never a shuffle of the
    token stream).  The merged sketch broadcasts once via ``ray.put``;
    pass 2 re-tokenizes, keeps only tokens whose CM estimate reaches
    the threshold (CM never undercounts → zero false negatives) and
    emits per-batch partial counts for THOSE tokens only, so the final
    exact groupby moves candidate partials, not the vocabulary.  The
    closing ``>= min_count`` filter on exact sums removes CM's false
    positives — output equals the plain SQL HAVING truth."""
    import numpy as np
    import pandas as pd
    import ray as _ray
    from ray.data.aggregate import Sum

    from mail_deduplicate_ray.functions import sketch

    docs = _docs(sf_dir, ["text"])

    def _uniq_counts(t: pa.Table):
        toks: list[str] = []
        for v in t["text"].to_pylist():
            toks.extend((v or "").split())
        if not toks:
            return (np.empty(0, object), np.empty(0, np.int64))
        return np.unique(np.asarray(toks, dtype=object),
                         return_counts=True)

    def cm_stage(t: pa.Table) -> pa.Table:
        uniq, cnt = _uniq_counts(t)
        cm = sketch.cm_partial(pd.util.hash_array(uniq), cnt)
        return pa.table({"cm": pa.array([cm.ravel()],
                                        pa.list_(pa.int64()))})

    merged = np.zeros((sketch.CM_DEPTH, sketch.CM_WIDTH), np.int64)
    for b in docs.map_batches(cm_stage, batch_format="pyarrow") \
                 .iter_batches(batch_format="pyarrow"):
        for row in b["cm"].to_pylist():
            merged += np.asarray(row, np.int64).reshape(merged.shape)
    ref = _ray.put(merged)

    def cand_partials(t: pa.Table, ref=ref) -> pa.Table:
        cm = _ray.get(ref)
        uniq, cnt = _uniq_counts(t)
        if not len(uniq):
            return pa.table({"tok": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        est = sketch.cm_query(cm, pd.util.hash_array(uniq))
        keep = est >= min_count
        return pa.table({"tok": pa.array(uniq[keep].tolist(), pa.string()),
                         "n": pa.array(cnt[keep], pa.int64())})

    summed = (docs.map_batches(cand_partials, batch_format="pyarrow")
              .groupby("tok").aggregate(Sum("n", alias_name="n")))
    return summed.map_batches(
        lambda t: t.filter(pc.greater_equal(t["n"], min_count)),
        batch_format="pyarrow")


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


# PII patterns shared verbatim with the DuckDB oracle (both engines are
# RE2, so semantics match exactly); applied in this order — email first
# so its domain dots can't partially match as an IP
PII_PATTERNS = (
    ("n_email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("n_phone", r"\+?\d{3}[-. ]\d{3}[-. ]\d{4}", "<PHONE>"),
    ("n_ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
)


def pii_redact_docs(sf_dir: str) -> "ray.data.Dataset":
    """PII redaction — regex scrub of emails / phone numbers / IPv4s,
    each replaced by a typed token, with per-kind match counts.  Pure
    per-doc vectorized map (pyarrow RE2 kernels), zero shuffle; the
    DuckDB oracle replays the identical RE2 patterns stepwise so
    replacement ORDER is part of the checked contract."""
    def f(t: pa.Table) -> pa.Table:
        text = pc.fill_null(pc.cast(t["text"], pa.string()), "")
        out: dict = {"doc_id": t["doc_id"]}
        counts = {}
        for name, pat, rep in PII_PATTERNS:
            counts[name] = pc.cast(
                pc.count_substring_regex(text, pat), pa.int64())
            text = pc.replace_substring_regex(text, pat, rep)
        out["clean_text"] = text
        out.update(counts)
        return pa.table(out)

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow").sort("doc_id")


def bpe_train_docs(sf_dir: str, n_merges: int = 30) -> "ray.data.Dataset":
    """BPE tokenizer TRAINING over the corpus (Sennrich et al. 2016) —
    the op a training-data pipeline runs before tokenize-and-shard.
    Output: one row per learned merge — (rank, left, right, merged,
    pair_count), deterministic (ties -> lexicographically smallest
    pair).

    Scale shape (how real trainers do it): the only corpus-sized pass
    is ONE word-count aggregation (per-batch pandas value_counts
    partials -> one bucketed shuffle), producing the compressed
    (word, count) vocabulary — Heaps' law makes it orders of magnitude
    smaller than the corpus, and every BPE iteration then runs on that
    small table driver-side; the 10^12-token corpus is never rescanned
    per merge.  (At extreme vocab sizes the same loop runs on a
    frequency-truncated vocab, the standard practice.)"""
    import pandas as pd

    from mail_deduplicate_ray.stages.bucketing import grouped

    docs = _docs(sf_dir, ["text"])

    def wc(t: pa.Table) -> pa.Table:
        la = pc.split_pattern_regex(pc.utf8_trim_whitespace(
            pc.fill_null(pc.cast(t["text"], pa.string()), "")),
            r"\s+").combine_chunks()
        s = pd.Series(la.flatten().to_numpy(zero_copy_only=False))
        vc = s[s != ""].value_counts()
        return pa.table({"word": pa.array(vc.index.to_numpy(), pa.string()),
                         "cnt": pa.array(vc.to_numpy(), pa.int64())})

    def part(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby("word", sort=False)["cnt"].sum()
                .reset_index())

    vocab = {r["word"]: int(r["cnt"])
             for r in grouped(docs.map_batches(wc, batch_format="pyarrow"),
                              "word", part).take_all()}

    syms = {w: list(w) + ["</w>"] for w in vocab}
    ranks, lefts, rights, mergeds, counts = [], [], [], [], []
    for rank in range(n_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for w, c in vocab.items():
            s = syms[w]
            for a, b in zip(s, s[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + c
        if not pair_counts:
            break
        negc, a, b = min((-c, p[0], p[1]) for p, c in pair_counts.items())
        merged = a + b
        ranks.append(rank)
        lefts.append(a)
        rights.append(b)
        mergeds.append(merged)
        counts.append(-negc)
        for w, s in syms.items():
            if a not in s:
                continue
            out = []
            i = 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    return ray.data.from_arrow(pa.table({
        "rank": pa.array(ranks, pa.int64()),
        "left": pa.array(lefts, pa.string()),
        "right": pa.array(rights, pa.string()),
        "merged": pa.array(mergeds, pa.string()),
        "pair_count": pa.array(counts, pa.int64())}))


def gopher_repetition_docs(sf_dir: str) -> "ray.data.Dataset":
    """Within-doc n-gram repetition signals — the Gopher repetition
    filters (Rae et al. 2021, table A1) as integer-exact columns, one
    row per document, ZERO shuffle (pure per-doc map):

    - ``top2_chars`` / ``top3_chars``: occurrences x char-length of the
      doc's most frequent word 2-/3-gram (ties -> lexicographically
      smallest gram); Gopher's "fraction of characters in the most
      frequent n-gram" is top{n}_chars / text_chars.
    - ``dup5_tokens``: token positions covered by at least one 5-gram
      occurring >= 2 times in the doc (coverage UNION via a diff array
      over the batch-flat token axis — overlaps counted once).
    - ``n_tokens`` / ``text_chars``: the denominators.

    Numerators/denominators stay integers so the DuckDB oracle replays
    them exactly (the integer-exact convention); callers divide.
    Complements ``token_repetition_docs`` (distinct-token fraction) and
    ``dup_ngram_fraction_docs`` (CROSS-doc duplicate grams)."""
    import numpy as np
    import pandas as pd

    from mail_deduplicate_ray.stages.bucketing import arrow_clean

    def f(t: pa.Table) -> pa.Table:
        texts = pc.fill_null(pc.cast(t["text"], pa.string()), "")
        la = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(texts), r"\s+").combine_chunks()
        lens = pc.list_value_length(la).to_numpy(zero_copy_only=False).copy()
        flat = la.flatten().to_numpy(zero_copy_only=False)
        # empty text splits to [""] — treat as zero tokens (SQL parity)
        tok_len = np.fromiter((len(s) for s in flat), np.int64,
                              count=len(flat))
        empty = (np.repeat(lens == 1, lens)) & (tok_len == 0)
        doc_ids = t["doc_id"].to_numpy(zero_copy_only=False)
        n = len(doc_ids)
        n_tokens = lens - np.bincount(
            np.repeat(np.arange(n), lens)[empty], minlength=n)
        text_chars = pc.utf8_length(texts).to_numpy(zero_copy_only=False)

        d = np.repeat(np.arange(n), lens)
        keep = ~empty
        flat, tok_len, d = flat[keep], tok_len[keep], d[keep]
        s = pd.Series(flat, dtype=object)

        def gram_frame(k: int) -> pd.DataFrame:
            """(doc, pos, gram, gram_chars) for word k-grams."""
            ok = np.ones(len(d), bool)
            g = s.copy()
            glen = tok_len.copy()
            for j in range(1, k):
                ok[-j:] = False
                nxt = s.shift(-j)
                same = np.zeros(len(d), bool)
                same[:-j] = d[j:] == d[:-j]
                ok &= same
                g = g + " " + nxt
                glen = glen + 1 + np.roll(tok_len, -j)
            idx = np.flatnonzero(ok)
            return pd.DataFrame({"doc": d[idx], "pos": idx,
                                 "g": g.to_numpy()[idx],
                                 "glen": glen[idx]})

        def top_chars(k: int) -> np.ndarray:
            gf = gram_frame(k)
            out = np.zeros(n, np.int64)
            if gf.empty:
                return out
            cnt = (gf.groupby(["doc", "g"], sort=False)
                   .agg(cnt=("pos", "size"), glen=("glen", "first"))
                   .reset_index())
            best = (cnt.sort_values(["doc", "cnt", "g"],
                                    ascending=[True, False, True])
                    .drop_duplicates("doc"))
            out[best["doc"].to_numpy()] = (
                best["cnt"].to_numpy(np.int64)
                * best["glen"].to_numpy(np.int64))
            return out

        def dup_cover(k: int) -> np.ndarray:
            gf = gram_frame(k)
            out = np.zeros(n, np.int64)
            if gf.empty:
                return out
            dup = gf[gf.groupby(["doc", "g"], sort=False)["pos"]
                     .transform("size") >= 2]
            if dup.empty:
                return out
            # coverage union on the batch-flat token axis (grams never
            # cross docs, so spans stay inside their doc's segment)
            delta = np.zeros(len(d) + 1, np.int64)
            np.add.at(delta, dup["pos"].to_numpy(), 1)
            np.add.at(delta, dup["pos"].to_numpy() + k, -1)
            covered = np.cumsum(delta[:-1]) > 0
            cnt = np.bincount(d[covered], minlength=n)
            return cnt.astype(np.int64)

        return arrow_clean(pd.DataFrame({
            "doc_id": doc_ids,
            "n_tokens": n_tokens.astype(np.int64),
            "text_chars": text_chars.astype(np.int64),
            "top2_chars": top_chars(2),
            "top3_chars": top_chars(3),
            "dup5_tokens": dup_cover(5)}))

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow").sort("doc_id")


def curate_docs(sf_dir: str, min_tokens: int = 10, max_tokens: int = 1000,
                k_per_lang: int = 100) -> "ray.data.Dataset":
    """Composed training-data curation — the pipeline a corpus team
    actually runs, as ONE streaming plan: exact dedup (keep min doc_id
    per byte-identical text) -> token-count quality gate -> deterministic
    per-lang k-sample.  Stage wiring: (lang, n_tokens) travel WITH the
    28-byte dedup key through the one groupby shuffle, so the winner
    rows come out carrying every column the gate needs — no second
    corpus scan, no semi-join back (payload text never shuffles at
    all); the final sample reuses the Knuth-hash order so the subset is
    parallelism-independent."""
    import numpy as np

    from mail_deduplicate_ray.stages.bucketing import grouped

    ds = _docs(sf_dir, ["doc_id", "lang", "text"])

    def keyed(t: pa.Table) -> pa.Table:
        t2 = _sha256_col(t, "text", "text_key")
        n = pc.cast(token_counts(t["text"]), pa.int64())
        return pa.table({"doc_id": t2["doc_id"], "lang": t2["lang"],
                         "n_tokens": n, "text_key": t2["text_key"]})

    def win_part(df):
        idx = df.groupby("text_key", sort=False)["doc_id"].idxmin()
        return df.loc[idx, ["doc_id", "lang", "n_tokens"]]

    kept = grouped(ds.map_batches(keyed, batch_format="pyarrow"),
                   "text_key", win_part)

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


def pack_sequences_docs(sf_dir: str, capacity: int = 2048,
                        bucket_width: int = 4096) -> "ray.data.Dataset":
    """Sequence packing — assign every document its token offset in the
    doc_id-ordered corpus concatenation and the ``capacity``-token
    training chunk that offset lands in (the batch-construction step of
    an LLM data pipeline).  Output: (doc_id, n_tokens, start_offset,
    chunk_id).

    The global prefix sum is computed WITHOUT a global sort: doc_ids
    are range-bucketed (``doc_id // bucket_width`` — contiguous ranges,
    so bucket totals are tiny and skew-free), per-bucket token totals
    come back from a partial-agg groupby small enough to collect, the
    driver scans them into exclusive per-bucket base offsets (one int
    per bucket), broadcasts the map, and a second pass computes the
    within-bucket cumulative sum per partition.  Two scalar-column
    passes, one bucket-count-sized driver table — no stage ever holds
    more than a bucket of rows.  ``bucket_width`` sets the driver
    table's size (n_docs / width entries): size it so that table stays
    ~1e6 rows (width 1e6 at 10^12 docs) — the per-bucket cumsum cost
    is unchanged, only the base map granularity moves."""
    import numpy as np

    import ray as _ray

    from ray.data.aggregate import Sum

    from mail_deduplicate_ray.stages.bucketing import grouped

    def keyed(t: pa.Table) -> pa.Table:
        n = pc.cast(token_counts(t["text"]), pa.int64())
        return pa.table({
            "doc_id": t["doc_id"], "n_tokens": n,
            "__rb": pc.cast(
                pc.floor(pc.divide(pc.cast(t["doc_id"], pa.float64()),
                                   float(bucket_width))), pa.int64())})

    rows = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        keyed, batch_format="pyarrow")

    totals = rows.groupby("__rb").aggregate(
        Sum("n_tokens", alias_name="tot")).take_all()
    totals.sort(key=lambda r: r["__rb"])
    base, acc = {}, 0
    for r in totals:
        base[r["__rb"]] = acc
        acc += r["tot"]
    base_ref = _ray.put(base)

    def part(df, base_ref=base_ref):
        bases = _ray.get(base_ref)
        out = []
        for rb, g in df.groupby("__rb", sort=False):
            g = g.sort_values("doc_id")
            toks = g["n_tokens"].to_numpy()
            start = bases[rb] + np.concatenate(
                ([0], np.cumsum(toks[:-1], dtype=np.int64)))
            out.append(pa.table({
                "doc_id": pa.array(g["doc_id"].to_numpy(), pa.int64()),
                "n_tokens": pa.array(toks, pa.int64()),
                "start_offset": pa.array(start, pa.int64()),
                "chunk_id": pa.array(start // capacity, pa.int64())}))
        if not out:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_tokens": pa.array([], pa.int64()),
                             "start_offset": pa.array([], pa.int64()),
                             "chunk_id": pa.array([], pa.int64())})
        return pa.concat_tables(out)

    return grouped(rows, "__rb", part)


def rare_bigram_docs(sf_dir: str, min_count: int = 5) -> "ray.data.Dataset":
    """Corpus-LM rarity scoring (the integer-exact core of a CCNet-style
    perplexity filter): train the "language model" — token-bigram
    counts — on the corpus itself, then score every document by how
    many of its bigram occurrences are RARE (corpus count <
    ``min_count``).  Output: (doc_id, n_bigrams, n_rare); high
    n_rare/n_bigrams flags incoherent or out-of-domain text.

    Scale shape is the sketch-candidate → exact-rescan idiom of
    ``heavy_tokens``, inverted: the COMMON bigram set (count >=
    min_count) is the small side at web scale (heavy hitters), so it is
    what gets materialized exactly (Count-Min partials folded on the
    driver -> candidate rescan groupby -> exact >= min_count filter)
    and broadcast once; the per-doc pass then counts occurrences
    falling OUTSIDE it.  The unbounded rare tail is never collected
    anywhere."""
    import numpy as np
    import pandas as pd

    import ray as _ray

    from ray.data.aggregate import Sum

    from mail_deduplicate_ray.functions import sketch

    docs = _docs(sf_dir, ["doc_id", "text"])

    def _doc_bigrams(v: str) -> list[str]:
        ts = (v or "").split()
        return [ts[i] + " " + ts[i + 1] for i in range(len(ts) - 1)]

    def _uniq_counts(t: pa.Table):
        bgs: list[str] = []
        for v in t["text"].to_pylist():
            bgs.extend(_doc_bigrams(v))
        if not bgs:
            return (np.empty(0, object), np.empty(0, np.int64))
        return np.unique(np.asarray(bgs, dtype=object), return_counts=True)

    def cm_stage(t: pa.Table) -> pa.Table:
        uniq, cnt = _uniq_counts(t)
        cm = sketch.cm_partial(pd.util.hash_array(uniq), cnt)
        return pa.table({"cm": pa.array([cm.ravel()], pa.list_(pa.int64()))})

    merged = np.zeros((sketch.CM_DEPTH, sketch.CM_WIDTH), np.int64)
    for b in docs.map_batches(cm_stage, batch_format="pyarrow") \
                 .iter_batches(batch_format="pyarrow"):
        for row in b["cm"].to_pylist():
            merged += np.asarray(row, np.int64).reshape(merged.shape)
    cm_ref = _ray.put(merged)

    def cand_partials(t: pa.Table, cm_ref=cm_ref) -> pa.Table:
        cm = _ray.get(cm_ref)
        uniq, cnt = _uniq_counts(t)
        if not len(uniq):
            return pa.table({"bg": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        keep = sketch.cm_query(cm, pd.util.hash_array(uniq)) >= min_count
        return pa.table({"bg": pa.array(uniq[keep].tolist(), pa.string()),
                         "n": pa.array(cnt[keep], pa.int64())})

    common = (docs.map_batches(cand_partials, batch_format="pyarrow")
              .groupby("bg").aggregate(Sum("n", alias_name="n"))
              .map_batches(
                  lambda t: t.filter(pc.greater_equal(t["n"], min_count))
                             .select(["bg"]),
                  batch_format="pyarrow"))
    common_ref = _ray.put(frozenset(
        v for b in common.iter_batches(batch_format="pyarrow")
        for v in b["bg"].to_pylist()))

    def score(t: pa.Table, common_ref=common_ref) -> pa.Table:
        cset = _ray.get(common_ref)
        n_bg, n_rare = [], []
        for v in t["text"].to_pylist():
            bgs = _doc_bigrams(v)
            n_bg.append(len(bgs))
            n_rare.append(sum(1 for b in bgs if b not in cset))
        return pa.table({"doc_id": t["doc_id"],
                         "n_bigrams": pa.array(n_bg, pa.int64()),
                         "n_rare": pa.array(n_rare, pa.int64())})

    return docs.map_batches(score, batch_format="pyarrow")


def dup_ngram_fraction_docs(sf_dir: str, k: int = 5,
                            min_docs: int = 2) -> "ray.data.Dataset":
    """Cross-document duplicate n-gram fraction — the "what share of
    this document's k-grams also appear in OTHER documents" signal the
    train-data-dedup literature uses to quantify residual duplication
    after document-level dedup.  Output: (doc_id, n_grams,
    n_dup_grams) where a gram occurrence counts as dup when its gram
    occurs in >= ``min_docs`` distinct documents.

    Scale shape: explode emits one (gram, doc_id, n_occ) row per
    DISTINCT gram per doc (within-doc multiplicity pre-folded in the
    map, so the shuffle never carries occurrence-level rows), one
    bucketed groupby(gram) filters to cross-doc grams and re-keys the
    survivors by doc, then ONE doc_id-bucketed shuffle both sums the
    dup occurrences and attaches the per-doc totals (totals ride as
    (doc_id, n_grams, 0) rows unioned with the (doc_id, 0, n_occ)
    survivors — a column-sum per doc replaces a groupby PLUS a join).
    Gram strings cross the wire exactly once; nothing lands on the
    driver."""
    import numpy as np

    from mail_deduplicate_ray.stages.bucketing import grouped

    docs = _docs(sf_dir, ["doc_id", "text"])

    def totals(t: pa.Table) -> pa.Table:
        n = pc.cast(token_counts(t["text"]), pa.int64())
        return pa.table({
            "doc_id": t["doc_id"],
            "n_grams": pc.max_element_wise(
                pc.subtract(n, pa.scalar(k - 1, pa.int64())),
                pa.scalar(0, pa.int64())),
            "n_dup_grams": pa.nulls(t.num_rows, pa.int64()).fill_null(0)})

    def explode(t: pa.Table) -> pa.Table:
        out_g, out_d, out_n = [], [], []
        for did, v in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            ts = (v or "").split()
            cnt: dict[str, int] = {}
            for i in range(max(len(ts) - k + 1, 0)):
                g = " ".join(ts[i:i + k])
                cnt[g] = cnt.get(g, 0) + 1
            out_g.extend(cnt.keys())
            out_d.extend([did] * len(cnt))
            out_n.extend(cnt.values())
        return pa.table({"gram": pa.array(out_g, pa.string()),
                         "doc_id": pa.array(out_d, pa.int64()),
                         "n_occ": pa.array(np.asarray(out_n, np.int64),
                                           pa.int64())})

    grams = docs.map_batches(explode, batch_format="pyarrow")

    def cross_doc(df):
        # one row per (gram, doc) -> group size IS the distinct-doc count
        keep = df.groupby("gram", sort=False)["doc_id"].transform("size")
        out = df[keep >= min_docs][["doc_id", "n_occ"]].rename(
            columns={"n_occ": "n_dup_grams"})
        out.insert(1, "n_grams", np.int64(0))
        return out

    dup_rows = grouped(grams, "gram", cross_doc)

    def per_doc(df):
        return (df.groupby("doc_id", sort=False, as_index=False)
                [["n_grams", "n_dup_grams"]].sum())

    unioned = docs.map_batches(totals, batch_format="pyarrow") \
                  .union(dup_rows)
    return grouped(unioned, "doc_id", per_doc).map_batches(
        lambda t: pa.table({
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "n_grams": pc.cast(t["n_grams"], pa.int64()),
            "n_dup_grams": pc.cast(t["n_dup_grams"], pa.int64())}),
        batch_format="pyarrow")


def _isqrt_u64(x: "np.ndarray") -> "np.ndarray":
    """Exact integer sqrt of a uint64 array (float sqrt + correction —
    the same adjustment the SQL oracle replays)."""
    import numpy as np

    s = np.sqrt(x.astype(np.float64)).astype(np.uint64)
    s = s - (s * s > x).astype(np.uint64)
    s = s + ((s + 1) * (s + 1) <= x).astype(np.uint64)
    return s


def temperature_sample_docs(sf_dir: str) -> "ray.data.Dataset":
    """Temperature-based data-mixture resampling (alpha = 0.5): keep
    each document with probability proportional to 1/sqrt(n_lang), so
    expected kept counts per language go as sqrt(n_lang) — the
    square-root temperature reweighting used to upweight low-resource
    languages in multilingual training mixes.  The dominant language is
    pinned at a 1/2 keep rate; rarer ones scale up, capped at 1.

    Deterministic and integer-exact end to end: the per-language keep
    test is ``knuth_hash(doc_id) * isqrt(n_lang) < 2^31 *
    isqrt(n_max)`` — no floats cross the decision boundary, so the SQL
    oracle replays it bit-for-bit.  Scale shape: one tiny lang-count
    aggregate, thresholds broadcast, one filter pass (zero shuffles of
    the corpus)."""
    import numpy as np

    from ray.data.aggregate import Count

    ds = _docs(sf_dir, ["doc_id", "lang"])
    counts = {r["lang"]: r["count()"] for r in
              ds.groupby("lang").aggregate(Count()).take_all()}
    n_max = max(counts.values())
    rhs = np.uint64((1 << 31)) * _isqrt_u64(
        np.array([n_max], np.uint64))[0]
    mult = {lang: _isqrt_u64(np.array([n], np.uint64))[0]
            for lang, n in counts.items()}

    def f(t: pa.Table, mult=mult, rhs=rhs) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (ids * np.uint64(2654435761)) % np.uint64(1 << 32)
        m = np.array([mult[v] for v in t["lang"].to_pylist()], np.uint64)
        return t.filter(pa.array(h * m < rhs))

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

def _bpe_encode_word(word: str, ranks: dict) -> list[str]:
    """Greedy BPE encode (Sennrich et al. 2016 apply rule): repeatedly
    merge the LOWEST-rank adjacent symbol pair, left-to-right within a
    pass, until no learned pair remains."""
    s = list(word) + ["</w>"]
    while len(s) > 1:
        best_rank, best = None, None
        for a, b in zip(s, s[1:]):
            r = ranks.get((a, b))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best = r, (a, b)
        if best is None:
            break
        a, b = best
        out, i = [], 0
        while i < len(s):
            if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(s[i])
                i += 1
        s = out
    return s


def bpe_apply_docs(sf_dir: str, n_merges: int = 30) -> "ray.data.Dataset":
    """Tokenize the corpus with the TRAINED BPE merges (the apply half
    of ``bpe_train_docs``) and return the corpus token-frequency table
    — (token, n), n desc / token asc.  This is the tokenize-and-count
    step a training-data pipeline runs after tokenizer training.

    Scale shape: the merge table is tiny (n_merges rows) and broadcasts
    once via ``ray.put``; the apply stage is an actor pool whose state
    is the rank dict PLUS a distinct-word encode cache — Zipf's law
    means a batch's value_counts collapses to few distinct words, and
    the cache makes re-encounters free across batches (setup once per
    actor, never per batch).  Each batch emits per-token partial counts
    (tiny), folded by one bucketed groupby.  Rows-only query (SQL
    cannot BPE); parity-tested against a naive per-document reference
    encode at sf0.001."""
    import pandas as pd
    import ray as _ray

    from mail_deduplicate_ray.stages.bucketing import grouped

    merges = bpe_train_docs(sf_dir, n_merges).take_all()
    ranks = {(m["left"], m["right"]): m["rank"] for m in merges}
    ref = _ray.put(ranks)

    class Apply:
        def __init__(self) -> None:
            self.ranks = _ray.get(ref)
            self.cache: dict[str, list[str]] = {}

        def __call__(self, t: pa.Table) -> pa.Table:
            la = pc.split_pattern_regex(pc.utf8_trim_whitespace(
                pc.fill_null(pc.cast(t["text"], pa.string()), "")),
                r"\s+").combine_chunks()
            s = pd.Series(la.flatten().to_numpy(zero_copy_only=False))
            vc = s[s != ""].value_counts()
            agg: dict[str, int] = {}
            for word, cnt in vc.items():
                toks = self.cache.get(word)
                if toks is None:
                    toks = _bpe_encode_word(word, self.ranks)
                    self.cache[word] = toks
                for tok in toks:
                    agg[tok] = agg.get(tok, 0) + int(cnt)
            return pa.table({
                "token": pa.array(list(agg.keys()), pa.string()),
                "n": pa.array(list(agg.values()), pa.int64())})

    from mail_deduplicate_ray.stages.bucketing import pool_size

    partials = _docs(sf_dir, ["text"]).map_batches(
        Apply, batch_format="pyarrow", batch_size=2048,
        concurrency=pool_size())

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("token", sort=False)["n"].sum().reset_index()

    return grouped(partials, "token", fold).sort(
        ["n", "token"], descending=[True, False])


def boilerplate_prefix_docs(sf_dir: str, k: int = 16) -> "ray.data.Dataset":
    """Boilerplate-prefix detection (the CCNet/C4-style leading-template
    screen): groups of documents whose NORMALIZED text shares the same
    first ``k`` characters — shared headers/templates a curation pass
    strips or collapses.  Output: (prefix, n_docs, min_doc_id) for every
    group of size >= 2, ordered by prefix.

    Scale shape: the prefix is computed per batch (lower + collapsed
    whitespace + slice, all pyarrow kernels) and the TEXT IS DROPPED
    before the shuffle — only k-byte prefixes move, one bucketed
    groupby, no driver state.  SQL-oracled (substr on the same
    normalization)."""
    from mail_deduplicate_ray.stages.bucketing import grouped

    def key(t: pa.Table) -> pa.Table:
        text = pc.fill_null(pc.cast(t["text"], pa.string()), "")
        norm = normalize.collapse_whitespace(pc.utf8_lower(text))
        return pa.table({
            "doc_id": t["doc_id"],
            "prefix": pc.utf8_slice_codeunits(norm, 0, k)})

    keyed = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        key, batch_format="pyarrow")

    def part(df) -> "pa.Table":
        g = (df.groupby("prefix", sort=False, as_index=False)
               .agg(n_docs=("doc_id", "size"), min_doc_id=("doc_id", "min")))
        g = g[g["n_docs"] >= 2]
        return pa.table({
            "prefix": pa.array(g["prefix"], pa.string()),
            "n_docs": pa.array(g["n_docs"].to_numpy(), pa.int64()),
            "min_doc_id": pa.array(g["min_doc_id"].to_numpy(), pa.int64())})

    return grouped(keyed, "prefix", part).sort("prefix")


def overlap_pairs_docs(sf_dir: str, k: int = 12) -> "ray.data.Dataset":
    """Suffix/prefix OVERLAP pairs — the shard-stitching screen: (a_id,
    b_id) where the LAST ``k`` characters of a's text equal the FIRST
    ``k`` of b's (both texts >= k chars, a != b).  Catches crawl
    segments split mid-document and re-ingested with overlapping
    boundaries, which whole-text and shingle dedup both under-weight.

    Scale shape: each doc emits two tiny rows — (key=first-k, role=head)
    and (key=last-k, role=tail) — text dropped before the ONE bucketed
    shuffle; each bucket forms bipartite tail x head pairs per key
    (string equality is exact by construction: the key IS the
    substring).  Hot keys cost |tails| x |heads| within one key — the
    same bounded-bucket argument as the LSH verify stage.  SQL-oracled
    (self-join on substr equality)."""
    from mail_deduplicate_ray.stages.bucketing import grouped

    def emit(t: pa.Table) -> pa.Table:
        txt = pc.fill_null(pc.cast(t["text"], pa.string()), "")
        sub = t.filter(pc.greater_equal(pc.utf8_length(txt), k))
        txt = pc.fill_null(pc.cast(sub["text"], pa.string()), "")
        heads = pc.utf8_slice_codeunits(txt, 0, k)
        # per-row last-k via reverse -> first-k -> reverse (slice offsets
        # are scalar-only in pyarrow); ASCII corpus -> codeunit == char
        tails = pc.utf8_reverse(pc.utf8_slice_codeunits(
            pc.utf8_reverse(txt), 0, k))
        def _arr(x):
            return x.combine_chunks() if isinstance(x, pa.ChunkedArray) else x

        ids = _arr(sub["doc_id"])
        n = sub.num_rows
        return pa.table({
            "doc_id": pa.concat_arrays([ids, ids]),
            "key": pa.concat_arrays([_arr(heads), _arr(tails)]),
            "role": pa.array(["h"] * n + ["t"] * n, pa.string())})

    keyed = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        emit, batch_format="pyarrow")

    def part(df) -> "pa.Table":
        import numpy as np
        a_out, b_out = [], []
        for _key, g in df.groupby("key", sort=False):
            tails = g.loc[g["role"] == "t", "doc_id"].to_numpy()
            heads = g.loc[g["role"] == "h", "doc_id"].to_numpy()
            if not len(tails) or not len(heads):
                continue
            a = np.repeat(tails, len(heads))
            b = np.tile(heads, len(tails))
            keep = a != b
            a_out.append(a[keep])
            b_out.append(b[keep])
        a = (np.concatenate(a_out) if a_out else np.empty(0, np.int64))
        b = (np.concatenate(b_out) if b_out else np.empty(0, np.int64))
        return pa.table({"a_id": pa.array(a.astype(np.int64), pa.int64()),
                         "b_id": pa.array(b.astype(np.int64), pa.int64())})

    return grouped(keyed, "key", part).sort(["a_id", "b_id"])


def frequent_templates_docs(sf_dir: str, n: int = 5,
                            min_docs: int = 3) -> "ray.data.Dataset":
    """Boilerplate TEMPLATE mining (the C4 "most common lines" analogue
    for a corpus without line structure): every word ``n``-gram that
    appears in >= ``min_docs`` DISTINCT documents, with its document
    frequency and total occurrence count — the template list a curation
    pass strips or caps.  Output: (gram, n_docs, n_occurrences),
    n_docs desc / gram asc.

    Scale shape: combiner-first like ``top_trigrams`` — each batch
    emits one (gram, n_docs_partial, n_occ_partial) row per DISTINCT
    gram in the batch (documents within a batch pre-aggregate), so the
    shuffle moves distinct-gram partials; one bucketed fold sums both
    counts and applies the HAVING.  SQL-oracled with the shared
    token-n-gram recipe.  The distinct-doc count is exact because a
    doc's grams live in exactly one batch row-group — each (gram, doc)
    pair contributes once to one partial."""
    import pandas as pd

    from mail_deduplicate_ray.stages.bucketing import grouped

    def partial(t: pa.Table) -> pa.Table:
        rows: dict[str, list[int]] = {}
        for text in t["text"].to_pylist():
            toks = (text or "").split()
            if len(toks) < n:
                continue
            per_doc: dict[str, int] = {}
            for i in range(len(toks) - n + 1):
                g = " ".join(toks[i:i + n])
                per_doc[g] = per_doc.get(g, 0) + 1
            for g, c in per_doc.items():
                slot = rows.get(g)
                if slot is None:
                    rows[g] = [1, c]
                else:
                    slot[0] += 1
                    slot[1] += c
        if not rows:
            return pa.table({"gram": pa.array([], pa.string()),
                             "nd": pa.array([], pa.int64()),
                             "no": pa.array([], pa.int64())})
        import numpy as np
        v = np.asarray(list(rows.values()), np.int64)
        return pa.table({"gram": pa.array(list(rows.keys()), pa.string()),
                         "nd": pa.array(v[:, 0], pa.int64()),
                         "no": pa.array(v[:, 1], pa.int64())})

    partials = _docs(sf_dir, ["text"]).map_batches(
        partial, batch_format="pyarrow")

    def fold(df: pd.DataFrame) -> pa.Table:
        g = (df.groupby("gram", sort=False, as_index=False)
               .agg(n_docs=("nd", "sum"), n_occurrences=("no", "sum")))
        g = g[g["n_docs"] >= min_docs]
        return pa.table({
            "gram": pa.array(g["gram"], pa.string()),
            "n_docs": pa.array(g["n_docs"].to_numpy(), pa.int64()),
            "n_occurrences": pa.array(g["n_occurrences"].to_numpy(),
                                      pa.int64())})

    return grouped(partials, "gram", fold).sort(
        ["n_docs", "gram"], descending=[True, False])


def similar_docs_topk(sf_dir: str, k: int = 3,
                      n_blocks: int = 8) -> "ray.data.Dataset":
    """Per-document top-``k`` MOST SIMILAR documents by exact
    character-trigram Jaccard — the similar-item retrieval surface
    (dedup's ranking sibling: no threshold, a full ranking per doc).
    Output: (doc_id, similar_id, rank), J desc / similar_id asc, only
    pairs sharing >= 1 trigram.

    Scale shape: the same distributed block self-join as
    ``knn_graph_embeddings`` — docs hash into ``n_blocks`` id blocks,
    each unordered block pair is scored by exactly ONE partition task
    (per-partition gram-code matrix, ONE integer matmul for all
    intersections), per-row partial top-k emitted in both directions,
    then a doc-bucketed merge sees <= k x n_blocks candidates per doc.
    Threshold-free top-k is inherently all-pairs work (prefix filters
    need a threshold to prune) — this is the exact-oracle baseline;
    at 10^12 scale the MinHash/LSH channels bound candidates and this
    ranking runs over those candidates instead.  SQL-oracled (both
    engines compute correctly-rounded double J from the same integer
    inter/union, so ranking + ties agree exactly).

    Collision caveat (shared with ``ngram_jaccard_pairs``): intersections
    count 64-bit gram HASHES (``_gram_sets``), the string-set oracle
    counts trigram strings — a cross-trigram xxhash64 collision within a
    doc pair would inflate the engine's intersection.  Accepted at
    ~2^-64 per pair; the oracle green run is the evidence it does not
    occur on the fixture."""
    import numpy as np

    from mail_deduplicate_ray.stages import bucketing

    def explode(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        sets = list(_gram_sets(t))
        n = len(ids)
        blk = (ids % n_blocks).astype(np.int64)
        reps = np.repeat(np.arange(n), n_blocks)
        other = np.tile(np.arange(n_blocks, dtype=np.int64), n)
        mine = blk[reps]
        lo = np.minimum(mine, other)
        hi = np.maximum(mine, other)
        # gram list column built ONCE from the flat uint64 buffer, then
        # replicated zero-copy-ish via take (no per-replica Python int
        # boxing — the knn_graph explode discipline)
        flat = (np.concatenate(sets) if sets
                else np.empty(0, np.uint64))
        offs = np.zeros(n + 1, np.int32)
        np.cumsum([len(x) for x in sets], out=offs[1:])
        grams_once = pa.ListArray.from_arrays(
            pa.array(offs, pa.int32()), pa.array(flat, pa.uint64()))
        return pa.table({
            "doc_id": pa.array(ids[reps], pa.int64()),
            "blk": pa.array(blk[reps], pa.int64()),
            "grams": grams_once.take(pa.array(reps, pa.int64())),
            "pk": pa.array(lo * n_blocks + hi, pa.int64())})

    exploded = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        explode, batch_format="pyarrow", batch_size=2048)

    def _matrix(sets, universe):
        m = np.zeros((len(sets), len(universe)), np.int32)
        for r, s in enumerate(sets):
            m[r, np.searchsorted(universe, s)] = 1
        return m

    def _partial_topk(inter, sizes_a, sizes_b, ids_a, ids_b):
        union = sizes_a[:, None] + sizes_b[None, :] - inter
        j = inter / union                      # correctly-rounded double
        j[inter == 0] = -1.0                  # only sharing pairs rank
        kk = min(k, j.shape[1])
        # stable argsort on (-J) with id-ascending columns keeps the
        # lowest-id winner on exact double ties (the oracle's rule)
        order = np.argsort(-j, axis=1, kind="stable")[:, :kk]
        rows = np.repeat(ids_a, kk)
        cols = ids_b[order].ravel()
        vals = np.take_along_axis(j, order, axis=1).ravel()
        keep = vals >= 0
        return rows[keep], cols[keep], vals[keep]

    def part(df) -> "pa.Table":
        ids_all = df["doc_id"].to_numpy()
        blk_all = df["blk"].to_numpy()
        sets_all = [np.asarray(g, np.uint64) for g in df["grams"]]
        pks = df["pk"].to_numpy()
        out_d, out_s, out_j = [], [], []
        order = np.argsort(pks, kind="stable")
        p_sorted = pks[order]
        bounds = np.flatnonzero(np.concatenate(
            ([True], p_sorted[1:] != p_sorted[:-1], [True])))
        for s, e in zip(bounds[:-1], bounds[1:]):
            idx = order[s:e]
            pk = int(p_sorted[s])
            i, j_blk = pk // n_blocks, pk % n_blocks
            sub_a = idx[blk_all[idx] == i]
            sub_a = sub_a[np.argsort(ids_all[sub_a])]
            if i == j_blk:
                if len(sub_a) < 2:
                    continue
                sets = [sets_all[x] for x in sub_a]
                uni = np.unique(np.concatenate(sets))
                m = _matrix(sets, uni)
                inter = m @ m.T
                np.fill_diagonal(inter, 0)
                sizes = np.array([len(s_) for s_ in sets])
                # self-pair exclusion: J of self set to -1 via inter=0
                r, c, v = _partial_topk(inter, sizes, sizes,
                                        ids_all[sub_a], ids_all[sub_a])
                out_d.append(r); out_s.append(c); out_j.append(v)
            else:
                sub_b = idx[blk_all[idx] == j_blk]
                sub_b = sub_b[np.argsort(ids_all[sub_b])]
                if not len(sub_a) or not len(sub_b):
                    continue
                sa = [sets_all[x] for x in sub_a]
                sb = [sets_all[x] for x in sub_b]
                uni = np.unique(np.concatenate(sa + sb))
                ma, mb = _matrix(sa, uni), _matrix(sb, uni)
                inter = ma @ mb.T
                za = np.array([len(s_) for s_ in sa])
                zb = np.array([len(s_) for s_ in sb])
                r, c, v = _partial_topk(inter, za, zb,
                                        ids_all[sub_a], ids_all[sub_b])
                out_d.append(r); out_s.append(c); out_j.append(v)
                r, c, v = _partial_topk(np.ascontiguousarray(inter.T),
                                        zb, za,
                                        ids_all[sub_b], ids_all[sub_a])
                out_d.append(r); out_s.append(c); out_j.append(v)
        if not out_d:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "similar_id": pa.array([], pa.int64()),
                             "jac": pa.array([], pa.float64())})
        return pa.table({
            "doc_id": pa.array(np.concatenate(out_d).astype(np.int64)),
            "similar_id": pa.array(np.concatenate(out_s).astype(np.int64)),
            "jac": pa.array(np.concatenate(out_j), pa.float64())})

    nb = max(8, (n_blocks * (n_blocks + 1)) // 2)
    partials = bucketing.grouped(exploded, "pk", part, nbuckets=nb,
                                 batch_format="pandas")

    def merge(df) -> "pa.Table":
        df = df.sort_values(["doc_id", "jac", "similar_id"],
                            ascending=[True, False, True],
                            kind="stable")
        df = df.drop_duplicates(subset=["doc_id", "similar_id"])
        df["rank"] = df.groupby("doc_id", sort=False).cumcount() + 1
        out = df[df["rank"] <= k]
        return pa.table({
            "doc_id": pa.array(out["doc_id"].to_numpy(), pa.int64()),
            "similar_id": pa.array(out["similar_id"].to_numpy(),
                                   pa.int64()),
            "rank": pa.array(out["rank"].to_numpy(), pa.int64())})

    return bucketing.grouped(partials, "doc_id", merge).sort(
        ["doc_id", "rank"])


# --- distributed Naive-Bayes classifier (train + apply in one run) -------

def _nb_tokens(t: "pa.Table") -> tuple:
    """(flat tokens, parent doc index) exactly matching the oracle's
    ``regexp_split_to_array(trim(lower(coalesce(text,''))), '\\s+')``
    with empty strings dropped (ASCII corpus: lower() agrees)."""
    import numpy as np
    txt = pc.utf8_trim_whitespace(pc.utf8_lower(
        pc.fill_null(pc.cast(t["text"], pa.string()), "")))
    toks = pc.split_pattern_regex(txt, pattern=r"\s+")
    flat = pc.list_flatten(toks)
    par = pc.list_parent_indices(toks)
    keep = pc.not_equal(flat, "")
    return (flat.filter(keep).to_numpy(zero_copy_only=False),
            par.filter(keep).to_numpy(zero_copy_only=False))


def nb_lang_classifier_docs(sf_dir: str) -> "ray.data.Dataset":
    """Distributed Naive-Bayes bag-of-words classifier — the
    fasttext-style language/quality screen of a training-data curation
    stack (train AND apply in one run, label = ``lang``).

    Scale shape: per-batch (lang, token) counts are pre-aggregated
    inside ``map_batches`` (combiner) and merged by ONE composite-key
    partial-sum shuffle (``bucketing.grouped_sum``); the model is built
    driver-side from the aggregated counts — O(vocab x langs), the same
    bounded-model-broadcast trade as ``bpe_train_docs`` and the
    ngram-Jaccard rarity ranks — and ships ONCE via ``ray.put``; apply
    is a stateless vectorized gather per batch (``pd.Index.get_indexer``
    -> ``np.add.at``), zero further shuffles.

    Determinism / oracle parity: Laplace-smoothed log-probs are
    quantized to integer MICRO-NATS, ``floor(1e6 * ln((c+1)/(N_l+V)))``
    (priors ``floor(1e6 * ln(d_l/D))``), so each doc's score is an
    ORDER-FREE integer sum and the whole train+apply path replays
    bit-exact in DuckDB; argmax ties break to the lexicographically
    smallest lang on both sides.  Output: (doc_id, pred_lang, score),
    score in micro-nats."""
    import math

    import numpy as np
    import pandas as pd
    import ray as _ray

    from mail_deduplicate_ray.stages import bucketing

    docs = _docs(sf_dir, ["doc_id", "text", "lang"])

    def count_partial(t: pa.Table) -> pa.Table:
        flat, par = _nb_tokens(t)
        lang = (t["lang"].to_numpy(zero_copy_only=False)[par]
                if len(flat) else np.empty(0, object))
        g = (pd.DataFrame({"lang": lang, "tok": flat})
             .groupby(["lang", "tok"], sort=False).size()
             .reset_index(name="c"))
        return pa.table({"lang": pa.array(g["lang"], pa.string()),
                         "tok": pa.array(g["tok"], pa.string()),
                         "c": pa.array(g["c"].to_numpy(), pa.int64())})

    # model counts collected as ARROW batches (one bounded table), not
    # row dicts — at a 1M-token vocab this is a single zero-copy concat
    # instead of 5M Python dicts on the driver
    count_tables = [
        b for b in bucketing.grouped_sum(
            docs.map_batches(count_partial, batch_format="pyarrow"),
            ["lang", "tok"], {"c": "c"}).iter_batches(
                batch_format="pyarrow")
        if b.num_rows]

    def lang_partial(t: pa.Table) -> pa.Table:
        vc = pd.Series(t["lang"].to_numpy(zero_copy_only=False)) \
            .value_counts()
        return pa.table({"lang": pa.array(vc.index.to_numpy(), pa.string()),
                         "d": pa.array(vc.to_numpy(), pa.int64())})

    dl: dict[str, int] = {}
    for r in docs.map_batches(lang_partial,
                              batch_format="pyarrow").take_all():
        dl[r["lang"]] = dl.get(r["lang"], 0) + int(r["d"])
    D = sum(dl.values())

    langs = sorted(dl)
    lidx = {l: i for i, l in enumerate(langs)}
    L = len(langs)
    cf = (pa.concat_tables(count_tables).to_pandas()
          if count_tables else pd.DataFrame({"lang": [], "tok": [],
                                             "c": []}))
    vocab = sorted(set(cf["tok"]))
    V = len(vocab)
    tindex = pd.Index(vocab)
    C = np.zeros((V + 1, L), np.int64)        # last row stays 0 (OOV)
    if len(cf):
        C[tindex.get_indexer(cf["tok"]),
          cf["lang"].map(lidx).to_numpy()] = cf["c"].to_numpy()
    N = C.sum(axis=0)
    # math.log (C libm), not np.log (SIMD may differ in the last ulp
    # from DuckDB's ln); distinct counts are few (Zipf), so memoize
    W = np.empty((V + 1, L), np.int64)
    for li in range(L):
        denom = int(N[li]) + V
        lut = {c: math.floor(1e6 * math.log((c + 1) / denom))
               for c in np.unique(C[:, li])}
        W[:, li] = np.vectorize(lut.__getitem__)(C[:, li])
    priors = np.array([math.floor(1e6 * math.log(dl[l] / D))
                       for l in langs], np.int64)
    ref = _ray.put((np.asarray(vocab, object), W, priors,
                    np.asarray(langs, object)))

    class _Score:
        def __init__(self, ref=ref):
            toks, W, pri, langs = _ray.get(ref)
            self.index = pd.Index(toks)
            self.W, self.pri, self.langs = W, pri, langs

        def __call__(self, t: pa.Table) -> pa.Table:
            flat, par = _nb_tokens(t)
            n = t.num_rows
            S = np.tile(self.pri, (n, 1))
            if len(flat):
                ids = self.index.get_indexer(flat)
                ids[ids < 0] = len(self.index)
                np.add.at(S, par, self.W[ids])
            best = S.argmax(axis=1)    # first max = smallest lang
            return pa.table({
                "doc_id": t["doc_id"],
                "pred_lang": pa.array(self.langs[best].tolist(),
                                      pa.string()),
                "score": pa.array(S[np.arange(n), best], pa.int64())})

    return docs.map_batches(_Score, batch_format="pyarrow",
                            concurrency=bucketing.pool_size()) \
        .sort("doc_id")
