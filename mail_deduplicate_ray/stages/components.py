"""Distributed connected components: min-label propagation over Ray Data.

Replaces the reference's driver-held hash index (deduplicate.py:710-717) with
a shuffle-native algorithm: every node starts labelled with its own id; each
round every node's label flows to its neighbors and every node adopts the
minimum label heard (hash-min propagation).  All grouping uses the bucketed
partition idiom (stages/bucketing.py): the shuffle key is an int bucket,
per-partition work is vectorized pandas (merge + groupby-min) — no
per-node Python calls.

Convergence: labels are monotonically non-increasing, so a round with
``sum(changed) == 0`` is a fixpoint; LSH candidate clusters are near-stars
(stages/candidates.py emits representative edges), so 2-4 rounds typical;
``max_rounds`` caps defensively.  For adversarial topologies (chains of
near-dup clusters with diameter ≫ rounds) ``method="star"`` selects
large/small-star contraction (:func:`star_contraction_components` —
PAPERS.md: Kiveris et al.), which converges in O(log n) rounds and
produces identical min labels (parity-tested on planted path graphs).

Determinism: labels are clip_id strings, min is lexicographic — identical
output at any parallelism (≙ min-path link target, deduplicate.py:1168).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from mail_deduplicate_ray.stages.bucketing import (BUCKET_COL, add_bucket,
                                                   arrow_clean, grouped,
                                                   hash_to_buckets)


def _both_directions(edges: "ray.data.Dataset") -> "ray.data.Dataset":
    def flip(t: pa.Table) -> pa.Table:
        fwd = pa.table({"node": t["src"], "nbr": t["dst"]})
        rev = pa.table({"node": t["dst"], "nbr": t["src"]})
        return pa.concat_tables([fwd, rev])
    return edges.map_batches(flip, batch_format="pyarrow")


def _driver_union_find(edges: "ray.data.Dataset") -> "ray.data.Dataset":
    """In-memory connected components for small edge sets (the candidate
    pair table is orders of magnitude smaller than the corpus) — fully
    vectorized: factorize node ids once, then alternate numpy hash-min
    passes over all edges with pointer-jumping label compression, so the
    pass count is O(log diameter) and each pass is O(edges) numpy, never a
    per-edge Python loop.  Produces the same min-label output as the
    distributed path (codes are sort-ordered, so integer min ==
    lexicographic min clip_id)."""
    srcs: list = []
    dsts: list = []
    for b in edges.select_columns(["src", "dst"]) \
                  .iter_batches(batch_format="pyarrow"):
        srcs.append(b["src"].to_numpy(zero_copy_only=False))
        dsts.append(b["dst"].to_numpy(zero_copy_only=False))
    if not srcs:
        return ray.data.from_arrow(pa.table({
            "node": pa.array([], pa.string()),
            "label": pa.array([], pa.string())}))
    flat = np.concatenate(srcs + dsts)
    codes, uniq = pd.factorize(flat, sort=True)
    m = len(srcs[0]) if len(srcs) == 1 else sum(len(s) for s in srcs)
    u, v = codes[:m], codes[m:]
    lab = np.arange(len(uniq), dtype=np.int64)
    while True:
        before = lab.copy()
        mn = np.minimum(lab[u], lab[v])
        np.minimum.at(lab, u, mn)
        np.minimum.at(lab, v, mn)
        while True:  # pointer jump to full compression
            nl = lab[lab]
            if np.array_equal(nl, lab):
                break
            lab = nl
        if np.array_equal(before, lab):
            break
    return ray.data.from_arrow(pa.table({
        "node": pa.array(uniq, pa.string()),
        "label": pa.array(uniq[lab], pa.string())}))


def _pointer_jump(labels: "ray.data.Dataset",
                  nbuckets: int) -> "ray.data.Dataset":
    """One label-compression round: label <- label[label] (bucketed
    self-join on the label column).  Interleaved with min-propagation this
    bounds total rounds at O(log diameter) instead of O(diameter) — chains
    of near-dup clusters (A~B~C~... from different LSH buckets) would
    otherwise need diameter rounds."""
    probe = labels.map_batches(
        lambda t: pa.table({"jk": t["label"], "node": t["node"],
                            "val": pa.nulls(t.num_rows, pa.string())}),
        batch_format="pyarrow")
    mapping = labels.map_batches(
        lambda t: pa.table({"jk": t["node"],
                            "node": pa.nulls(t.num_rows, pa.string()),
                            "val": t["label"]}),
        batch_format="pyarrow")

    def jump(df: pd.DataFrame) -> pd.DataFrame:
        maps = df[df["node"].isna()][["jk", "val"]]
        probes = df[df["node"].notna()][["jk", "node"]]
        m = probes.merge(maps, on="jk", how="left")
        return pd.DataFrame({"node": m["node"],
                             "label": m["val"].fillna(m["jk"])})

    tagged = probe.union(mapping)
    bucketed = add_bucket(tagged, "jk", nbuckets)
    return bucketed.groupby(BUCKET_COL).map_groups(
        lambda df: arrow_clean(jump(df.drop(columns=[BUCKET_COL]))),
        batch_format="pandas")


def _edge_fingerprint(edges: "ray.data.Dataset") -> tuple[int, int]:
    """Order-insensitive (count, wrapped-sum-of-row-hash) fingerprint of an
    edge table — the convergence test for star contraction.  Sum wraps in
    uint64; two DIFFERENT edge sets colliding on both count and sum is a
    ~2^-64 event, and a false match only ends iteration one round early on
    a set that then fails the (tested) label parity, never silently."""
    def part(t: pa.Table) -> pa.Table:
        h = (pd.util.hash_array(t["src"].to_numpy(zero_copy_only=False))
             * np.uint64(0x9E3779B97F4A7C15)
             ^ pd.util.hash_array(t["dst"].to_numpy(zero_copy_only=False)))
        # modular sum is order-independent, so vectorized wraparound is safe
        with np.errstate(over="ignore"):
            tot = int(np.add.reduce(h, dtype=np.uint64)) if len(h) else 0
        return pa.table({"cnt": pa.array([t.num_rows], pa.int64()),
                         "h": pa.array([tot & ((1 << 63) - 1)],
                                       pa.int64())})

    cnt = 0
    hs = 0
    for b in edges.map_batches(part, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow"):
        cnt += sum(b["cnt"].to_pylist())
        for v in b["h"].to_pylist():
            hs = (hs + v) & ((1 << 63) - 1)
    return cnt, hs


def _star_phase(edges: "ray.data.Dataset", large: bool,
                nbuckets: int) -> "ray.data.Dataset":
    """One large-star or small-star round (Kiveris et al., 'Connected
    Components in MapReduce and Beyond' — PAPERS.md).  Input and output
    edges are (src < dst) normalized strings; each input edge yields
    exactly ONE output edge, so the edge count never grows.

    large-star(u): m = min(Γ(u) ∪ {u}); emit (m, v) for v ∈ Γ(u), v > u
    small-star(u): over neighbors v < u only: m = min; emit (m, v) for
                   v ≠ m plus (m, u)
    """
    if large:
        rows = _both_directions(edges)
    else:
        # group at the LARGER endpoint; neighbors are all smaller
        rows = edges.map_batches(
            lambda t: pa.table({"node": t["dst"], "nbr": t["src"]}),
            batch_format="pyarrow")

    def part(df: pd.DataFrame) -> pd.DataFrame:
        node = df["node"].to_numpy()
        nbr = df["nbr"].to_numpy()
        order = np.lexsort((nbr, node))
        n_s, b_s = node[order], nbr[order]
        bounds = np.flatnonzero(np.concatenate(
            ([True], n_s[1:] != n_s[:-1], [True])))
        src_out: list = []
        dst_out: list = []
        for s, e in zip(bounds[:-1], bounds[1:]):
            u = n_s[s]
            nbrs = np.unique(b_s[s:e])  # sorted, deduped
            if large:
                m = nbrs[0] if nbrs[0] < u else u
                vs = nbrs[nbrs > u]
                src_out.extend([m] * len(vs))
                dst_out.extend(vs.tolist())
            else:
                m = nbrs[0]
                vs = nbrs[1:]
                src_out.extend([m] * (len(vs) + 1))
                dst_out.extend(vs.tolist())
                dst_out.append(u)
        return pd.DataFrame({"src": src_out, "dst": dst_out})

    return grouped(rows, "node", part, nbuckets)


def star_contraction_components(edges: "ray.data.Dataset",
                                max_rounds: int = 30,
                                nbuckets: int = 64,
                                ) -> tuple["ray.data.Dataset", int]:
    """Connected components by alternating LARGE-STAR / SMALL-STAR
    contraction — the provably O(log n)-round algorithm for adversarial
    topologies (long chains) where one-hop min propagation needs
    O(diameter) rounds (PAPERS.md: Kiveris et al.; the seam named in
    :func:`connected_components`).  Converges when a full round leaves
    the edge set unchanged (order-insensitive fingerprint); the final
    state is a star forest rooted at each component's min node, read off
    directly as the label table.  Returns (labels, rounds)."""
    cur = edges.map_batches(
        lambda t: t.select(["src", "dst"]), batch_format="pyarrow") \
        .materialize()
    fp = _edge_fingerprint(cur)
    rounds = 0
    while True:
        rounds += 1
        cur = _star_phase(cur, large=True, nbuckets=nbuckets)
        cur = _star_phase(cur, large=False, nbuckets=nbuckets) \
            .materialize()
        nfp = _edge_fingerprint(cur)
        if nfp == fp:
            break
        fp = nfp
        if rounds >= max_rounds:
            raise RuntimeError(
                f"star contraction did not converge in {max_rounds} "
                "rounds — raise max_rounds")

    def to_labels(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": pa.concat_arrays([t["dst"].combine_chunks(),
                                      t["src"].combine_chunks()]),
            "label": pa.concat_arrays([t["src"].combine_chunks(),
                                       t["src"].combine_chunks()])})

    labels = grouped(
        cur.map_batches(to_labels, batch_format="pyarrow"),
        "node", lambda df: df.drop_duplicates(subset=["node"]), nbuckets)
    return labels, rounds


def connected_components(edges: "ray.data.Dataset", max_rounds: int = 10,
                         nbuckets: int = 64,
                         driver_threshold: int = 2_000_000,
                         method: str = "hashmin",
                         ) -> "ray.data.Dataset":
    """edges(src,dst) -> labels(node,label); covers nodes appearing in edges
    (singletons are defaulted by attach_cluster_ids).

    Edge sets up to ``driver_threshold`` rows run in-memory union-find on
    the driver (≙ the reference's driver-held hash index — the edge table
    is the *duplicate pairs*, a small fraction of the corpus even at scale);
    beyond it, the distributed min-label propagation below runs entirely as
    bucketed shuffles.  Both produce identical min-label output.

    ``method="star"`` switches the distributed engine to large/small-star
    contraction (:func:`star_contraction_components`) — same labels,
    O(log n) rounds even on adversarial chain graphs where min
    propagation's per-round reach matters (parity- and round-count-tested
    on planted path graphs)."""
    if method not in ("hashmin", "star"):
        raise ValueError(f"unknown method {method!r}")
    n_edges = edges.count()
    if n_edges <= driver_threshold:
        return _driver_union_find(edges)
    if method == "star":
        labels, _ = star_contraction_components(edges, max(max_rounds, 30),
                                                nbuckets)
        return labels
    # partition count scales with the edge volume (~100k edges/partition):
    # tiny inputs (tests, forced-distributed runs) otherwise pay 64 shuffle
    # partitions of fixed overhead per round
    nbuckets = max(4, min(nbuckets, n_edges // 100_000 + 4))
    # block counts are re-bounded to ``nbuckets`` at every materialize:
    # each groupby/union round otherwise multiplies tiny blocks (observed
    # ~2x/round), and per-block scheduling overhead then dominates rounds
    adj = add_bucket(_both_directions(edges), "node", nbuckets) \
        .repartition(nbuckets).materialize()

    def init_labels(df: pd.DataFrame) -> pd.DataFrame:
        nodes = df["node"].drop_duplicates()
        return pd.DataFrame({"node": nodes, "label": nodes})

    labels = adj.groupby(BUCKET_COL).map_groups(
        lambda df: arrow_clean(init_labels(df)), batch_format="pandas") \
        .repartition(nbuckets).materialize()

    # Alternate min-label propagation with pointer-jumping compression:
    # propagation moves labels one hop per round, jumping halves chain
    # depth, so convergence (a propagation round with changed == 0 — a true
    # fixpoint: every edge label-constant => per-component constant = min)
    # arrives in O(log diameter) rounds, so ``max_rounds`` rounds cover
    # component diameter ~2^max_rounds; exceeding it raises loudly instead
    # of silently splitting clusters.
    hard_cap = max_rounds
    rounds = 0
    while True:
        # co-partition labels with adjacency by node-bucket, emit messages
        lab_b = add_bucket(labels, "node", nbuckets)
        tagged_l = lab_b.map_batches(
            lambda t: t.append_column("nbr", pa.nulls(t.num_rows, pa.string())),
            batch_format="pyarrow")
        tagged_e = adj.map_batches(
            lambda t: pa.table({"node": t["node"],
                                "label": pa.nulls(t.num_rows, pa.string()),
                                BUCKET_COL: t[BUCKET_COL],
                                "nbr": t["nbr"]}),
            batch_format="pyarrow")

        def send(df: pd.DataFrame) -> pd.DataFrame:
            ldf = df[df["nbr"].isna()][["node", "label"]]
            adf = df[df["nbr"].notna()][["node", "nbr"]]
            m = adf.merge(ldf, on="node", how="left")
            out = pd.DataFrame({"node": m["nbr"], "label": m["label"],
                                "is_self": 0})
            self_rows = pd.DataFrame({"node": ldf["node"],
                                      "label": ldf["label"], "is_self": 1})
            return pd.concat([out.dropna(subset=["label"]), self_rows],
                             ignore_index=True)

        msgs = tagged_l.union(tagged_e).groupby(BUCKET_COL).map_groups(
            lambda df: arrow_clean(send(df.drop(columns=[BUCKET_COL]))),
            batch_format="pandas")

        def adopt(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby("node", sort=False)["label"]
            new = g.min()
            old = df[df["is_self"] == 1].set_index("node")["label"]
            old = old[~old.index.duplicated()]
            out = new.reset_index()
            out.columns = ["node", "label"]
            out["changed"] = (out["label"]
                              != old.reindex(out["node"]).values).astype(int)
            return out

        new_labels = add_bucket(msgs, "node", nbuckets) \
            .groupby(BUCKET_COL).map_groups(
                lambda df: arrow_clean(adopt(df.drop(columns=[BUCKET_COL]))),
                batch_format="pandas").repartition(nbuckets).materialize()
        changed = int(new_labels.sum("changed") or 0)
        labels = new_labels.drop_columns(["changed"])
        rounds += 1
        if changed == 0:
            break
        if rounds >= hard_cap:
            raise RuntimeError(
                f"connected_components did not converge in {hard_cap} "
                f"rounds ({changed} labels still changing) — component "
                "diameter pathologically large; raise max_rounds")
        labels = _pointer_jump(labels, nbuckets) \
            .repartition(nbuckets).materialize()
    return labels


def attach_cluster_ids(rows: "ray.data.Dataset", labels: "ray.data.Dataset",
                       key: str = "clip_id",
                       num_partitions: int = 32,
                       broadcast_threshold: int = 5_000_000,
                       ) -> "ray.data.Dataset":
    """Attach cluster labels onto full rows.  Rows absent from ``labels``
    are singletons -> cluster_id = own key.

    Labels are the *duplicate* nodes only, so they are usually the small
    side: up to ``broadcast_threshold`` rows they travel once via
    ``ray.put`` as TWO ARROW ARRAYS and each batch runs a C++ hash
    lookup (``pc.index_in`` + take + coalesce) — no shuffle, and no
    Python dict: a dict broadcast re-pays its full pickle
    deserialization in EVERY task (measured 2.4 s -> 7.5 s across the
    391k -> 783k doubling, superlinear because both the dict and the
    task count scale), while Arrow buffers rehydrate zero-copy from
    the object store.  Bigger label sets use the hash-partitioned
    ``Dataset.join``."""
    names = list(rows.schema().names)
    n_labels = labels.count()

    if n_labels == 0:
        return rows.map_batches(
            lambda t: t.append_column("cluster_id", t[key]),
            batch_format="pyarrow")

    if n_labels <= broadcast_threshold:
        parts = [b for b in labels.iter_batches(batch_format="pyarrow")]
        lt = pa.concat_tables(parts).combine_chunks()
        ref = ray.put((lt["node"].combine_chunks(),
                       lt["label"].combine_chunks()))

        def lookup(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            nodes, labs = ray.get(ref)
            idx = pc.index_in(t[key], value_set=nodes)
            got = labs.take(idx)          # null where key has no label
            return t.append_column("cluster_id",
                                   pc.coalesce(got, t[key]))

        return rows.map_batches(lookup, batch_format="pyarrow")

    joined = rows.join(labels, "left_outer", num_partitions,
                       on=(key,), right_on=("node",))

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        cluster = pc.coalesce(t["label"], t[key])
        keepers = [n for n in t.schema.names if n in names]
        return t.select(keepers).append_column("cluster_id", cluster)

    return joined.map_batches(finish, batch_format="pyarrow")
