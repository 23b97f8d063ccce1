"""Property-based tests (hypothesis) for the core kernels — the reference
has no property testing (SURVEY.md §5); these harden the from-scratch
numeric code paths."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from mail_deduplicate_ray import codecs
from mail_deduplicate_ray.functions import minhash, shingles, simhash

TEXT = st.text(alphabet="abcdefgh ", min_size=0, max_size=400)


@settings(max_examples=30, deadline=None)
@given(TEXT, TEXT)
def test_minhash_estimates_jaccard(t1, t2):
    mh = minhash.MinHasher(128, 11, 16)
    flat, offs = shingles.batch_shingles([t1, t2], 5)
    sig = mh.signatures(flat, offs)
    s1 = set(shingles.shingle_hashes(t1, 5).tolist())
    s2 = set(shingles.shingle_hashes(t2, 5).tolist())
    if not s1 or not s2:
        # empty docs never collide
        assert minhash.est_jaccard(sig[0], sig[1]) == 0.0 or (s1 == s2)
        return
    true_j = len(s1 & s2) / len(s1 | s2)
    est = minhash.est_jaccard(sig[0], sig[1])
    assert abs(est - true_j) < 0.2  # 128 perms: >4 sigma bound


@settings(max_examples=30, deadline=None)
@given(TEXT)
def test_identical_texts_identical_signatures(t):
    mh = minhash.MinHasher(64, 3, 8)
    flat, offs = shingles.batch_shingles([t, t], 5)
    sig = mh.signatures(flat, offs)
    assert (sig[0] == sig[1]).all()


@settings(max_examples=20, deadline=None)
@given(st.lists(st.floats(min_value=-0.96875, max_value=0.96875, width=32,
                          allow_nan=False), min_size=8, max_size=2000),
       st.sampled_from([8000, 16000]))
def test_codec_roundtrip_snr_property(samples, sr):
    x = np.asarray(samples, dtype=np.float32)
    for codec, floor in (("pcm_s16le", 50.0), ("ulaw", 15.0)):
        y, sr2 = codecs.decode(codecs.encode(x, sr, codec), codec)
        assert sr2 == sr and len(y) == len(x)
        if np.abs(x).max() > 1e-3:  # SNR meaningless on silence
            assert codecs.snr_db(x, y) >= floor


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1),
                min_size=2, max_size=40))
def test_hamming_metric_properties(vals):
    a = np.array(vals, dtype=np.uint64)
    # identity, symmetry, triangle inequality on a few triples
    assert (simhash.hamming(a, a) == 0).all()
    b = np.roll(a, 1)
    assert (simhash.hamming(a, b) == simhash.hamming(b, a)).all()
    c = np.roll(a, 2)
    assert (simhash.hamming(a, c)
            <= simhash.hamming(a, b) + simhash.hamming(b, c)).all()


@settings(max_examples=30, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 30), st.integers(0, 30)),
                min_size=0, max_size=60))
def test_driver_union_find_matches_bruteforce(edge_ints):
    """_driver_union_find's min-label output == brute-force closure."""
    from mail_deduplicate_ray.synth import _closure
    pairs = [(f"n{a:02d}", f"n{b:02d}") for a, b in edge_ints if a != b]
    want = _closure(pairs)

    # independent brute force: repeated relaxation
    nodes = {n for p in pairs for n in p}
    label = {n: n for n in nodes}
    for _ in range(len(nodes) + 1):
        changed = False
        for a, b in pairs:
            m = min(label[a], label[b])
            if label[a] != m or label[b] != m:
                label[a] = label[b] = m
                changed = True
        if not changed:
            break
    assert want == label


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=600),
       st.integers(min_value=1, max_value=64))
def test_sliding_min_matches_naive(raw, w):
    h = np.frombuffer(raw, np.uint8).astype(np.uint64) * np.uint64(
        0x9E3779B97F4A7C15)
    if len(h) < w:
        return
    naive = np.lib.stride_tricks.sliding_window_view(h, w).min(axis=1)
    assert np.array_equal(shingles._sliding_min(h, w), naive)


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=1, max_size=500),
       st.integers(min_value=1, max_value=24))
def test_poly_hashes_match_windowed_formula(data, k):
    arr = np.frombuffer(data, np.uint8)
    if len(arr) < k:
        return
    win = np.lib.stride_tricks.sliding_window_view(arr, k)
    ref = np.full(win.shape[0], shingles._OFFS, dtype=np.uint64)
    for j in range(k):
        ref = ref * shingles._BASE + win[:, j].astype(np.uint64)
    assert np.array_equal(shingles._poly_hashes(arr, k), ref)


@settings(max_examples=40, deadline=None)
@given(st.text(alphabet="abcdefgh ", min_size=80, max_size=400),
       st.integers(min_value=0, max_value=300),
       st.integers(min_value=64, max_value=200))
def test_minimizer_subset_guarantee(container, start, length):
    # BASELINE.json north star: if P occurs in T and len(P) >= min_len,
    # then minimizers(P) is a SUBSET of minimizers(T) — in particular P's
    # global-min k-gram hash (the bipartite candidate probe) is in T's set
    k, min_len = 16, 64
    w = min_len - k + 1
    cb = container.encode("utf-8")
    start = min(start, max(0, len(cb) - min_len))
    pb = cb[start:start + length]
    if len(pb) < min_len:
        return
    mt = set(shingles.minimizers(
        np.frombuffer(cb, np.uint8), k, w).tolist())
    mp = shingles.minimizers(np.frombuffer(pb, np.uint8), k, w)
    assert set(mp.tolist()) <= mt
    assert int(mp.min()) in mt


@settings(max_examples=40, deadline=None)
@given(st.binary(min_size=1, max_size=400),
       st.binary(min_size=0, max_size=60))
def test_suffix_array_contains_matches_in(text, pattern):
    from mail_deduplicate_ray.functions.suffixarray import (sa_contains,
                                                            suffix_array)
    sa = suffix_array(np.frombuffer(text, np.uint8))
    assert sa_contains(text, sa, pattern) == (pattern in text)
    # and a guaranteed-present pattern
    if len(text) >= 3:
        sub = text[len(text) // 3: 2 * len(text) // 3]
        assert sa_contains(text, sa, sub)


# --- join-family properties (stages/joins.py) ------------------------------

_key_lists = st.lists(
    st.one_of(st.integers(min_value=0, max_value=6), st.none()),
    min_size=0, max_size=12)


def _frames(lkeys, rkeys):
    import pyarrow as pa

    import ray.data
    left = ray.data.from_arrow(pa.table({
        "k": pa.array(lkeys, pa.int64()),
        "lv": pa.array(range(len(lkeys)), pa.int64())}))
    right = ray.data.from_arrow(pa.table({
        "rk": pa.array(rkeys, pa.int64()),
        "rv": pa.array(range(len(rkeys)), pa.int64())}))
    return left, right


@settings(max_examples=12, deadline=None)
@given(lkeys=_key_lists, rkeys=_key_lists)
def test_shuffle_join_inner_matches_sql_reference(lkeys, rkeys):
    from mail_deduplicate_ray.stages.joins import shuffle_join
    left, right = _frames(lkeys, rkeys)
    got = sorted(
        shuffle_join(left, right, "k", "rk", nbuckets=2).to_pandas()
        .itertuples(index=False, name=None))
    # SQL reference: null keys never match
    exp = sorted((lk, li, ri)
                 for li, lk in enumerate(lkeys) if lk is not None
                 for ri, rk in enumerate(rkeys) if rk == lk)
    assert got == exp


@settings(max_examples=12, deadline=None)
@given(lkeys=_key_lists, rkeys=_key_lists)
def test_semi_anti_partition_left(lkeys, rkeys):
    from mail_deduplicate_ray.stages.joins import semi_anti_join
    left, right = _frames(lkeys, rkeys)
    semi = semi_anti_join(left, right, "k", "rk", nbuckets=2).to_pandas()
    anti = semi_anti_join(left, right, "k", "rk", anti=True,
                          nbuckets=2).to_pandas()

    def lv(df):  # empty Ray results drop the schema entirely
        return set(df["lv"]) if "lv" in df.columns else set()

    # semi and anti partition the left side exactly
    assert len(semi) + len(anti) == len(lkeys)
    assert lv(semi) | lv(anti) == set(range(len(lkeys)))
    rset = {k for k in rkeys if k is not None}
    exp_semi = {i for i, k in enumerate(lkeys)
                if k is not None and k in rset}
    assert lv(semi) == exp_semi


@settings(max_examples=12, deadline=None)
@given(
    lrows=st.lists(st.tuples(st.integers(0, 3),
                             st.one_of(st.integers(0, 50), st.none())),
                   min_size=0, max_size=10),
    rrows=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 50)),
                   min_size=0, max_size=10))
def test_asof_join_matches_naive_reference(lrows, rrows):
    import pyarrow as pa

    import ray.data

    from mail_deduplicate_ray.stages.joins import asof_join
    left = ray.data.from_arrow(pa.table({
        "k": pa.array([k for k, _ in lrows], pa.int64()),
        "t": pa.array([t for _, t in lrows], pa.int64()),
        "lv": pa.array(range(len(lrows)), pa.int64())}))
    right = ray.data.from_arrow(pa.table({
        "k": pa.array([k for k, _ in rrows], pa.int64()),
        "t": pa.array([t for _, t in rrows], pa.int64()),
        "rv": pa.array(range(len(rrows)), pa.int64())}))
    out = asof_join(left, right, key="k", on="t", nbuckets=2).to_pandas()
    assert len(out) == len(lrows)
    if not len(lrows):
        return  # empty Ray results drop the schema entirely
    out = out.sort_values("lv").reset_index(drop=True)
    for _, row in out.iterrows():
        li = int(row["lv"])
        lk, lt = lrows[li]
        if lt is None:
            assert row.isna()["rv"]
            continue
        # naive reference: the right row with the greatest t <= lt for
        # this key; ties broken like merge_asof (last in sort order)
        cand = [(t, ri) for ri, (rk, t) in enumerate(rrows)
                if rk == lk and t <= lt]
        if not cand:
            assert row.isna()["rv"]
        else:
            best_t = max(t for t, _ in cand)
            best_rvs = {ri for t, ri in cand if t == best_t}
            assert int(row["rv"]) in best_rvs


@given(st.integers(1, 40), st.integers(1, 40), st.integers(0, 2**32 - 1))
@settings(max_examples=30, deadline=None)
def test_bmp_roundtrip_property(h, w, seed):
    """Any (H, W, 3) uint8 image round-trips the BMP codec exactly —
    including widths whose 3-byte rows need 1-3 pad bytes."""
    import numpy as np

    from mail_deduplicate_ray.functions import imaging
    img = np.random.default_rng(seed).integers(0, 256, (h, w, 3),
                                               dtype=np.uint8)
    np.testing.assert_array_equal(
        img, imaging.decode_bmp(imaging.encode_bmp(img)))


@given(st.integers(2, 30), st.integers(2, 30), st.integers(0, 2**32 - 1))
@settings(max_examples=30, deadline=None)
def test_resize_bilinear_bounds_property(h, w, seed):
    """Bilinear output values stay within the input's [min, max] (convex
    combinations), and identity-size resize reproduces the input."""
    import numpy as np

    from mail_deduplicate_ray.functions import imaging
    img = np.random.default_rng(seed).integers(0, 256, (h, w)) \
        .astype(np.float64)
    out = imaging.resize_bilinear(img, max(1, h // 2), max(1, w // 2))
    assert out.min() >= img.min() - 1e-9
    assert out.max() <= img.max() + 1e-9
    np.testing.assert_allclose(imaging.resize_bilinear(img, h, w), img,
                               atol=1e-9)


@given(st.integers(0, 2**32 - 1), st.integers(-30, 30))
@settings(max_examples=30, deadline=None)
def test_tiny_embedding_brightness_invariant_property(seed, shift):
    """Mean-centering makes the tiny-image embedding EXACTLY invariant to
    uniform brightness shifts (while values stay unclipped)."""
    import numpy as np

    from mail_deduplicate_ray.functions import imaging
    # leave headroom so the shift never clips
    img = np.random.default_rng(seed).integers(40, 216, (24, 32)) \
        .astype(np.float32)
    a = imaging.tiny_embedding(img)
    b = imaging.tiny_embedding(img + shift)
    np.testing.assert_allclose(a, b, atol=1e-5)


@settings(max_examples=15, deadline=None)
@given(st.integers(0, 2 ** 32 - 1), st.integers(10_000, 80_000))
def test_cdc_cover_bounds_and_suffix_stability(seed, n):
    """FastCDC properties on arbitrary payloads: chunks cover the
    payload within [min, max] bounds, and appending data only disturbs
    the LAST chunk's neighborhood (content-defined suffix stability)."""
    from mail_deduplicate_ray.functions import cdc
    rng = np.random.default_rng(seed)
    data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
    ends = cdc.chunk_boundaries(data)
    lens = np.diff(np.concatenate(([0], ends)))
    assert ends[-1] == n
    assert (lens[:-1] >= cdc.MIN_SIZE).all()
    assert (lens <= cdc.MAX_SIZE).all()
    # append suffix: every boundary strictly before the old final chunk
    # must be preserved (the walk is deterministic left-to-right)
    tail = rng.integers(0, 256, 5000, dtype=np.uint8).tobytes()
    ends2 = cdc.chunk_boundaries(data + tail)
    stable = ends[:-1]  # all but the final (length-forced) cut
    assert set(stable).issubset(set(ends2.tolist()))


@settings(max_examples=20, deadline=None)
@given(st.integers(0, 2 ** 32 - 1), st.integers(8, 60),
       st.integers(8, 60))
def test_dtw_symmetry_and_nonnegativity(seed, n, m):
    from mail_deduplicate_ray.functions import audio_dsp
    rng = np.random.default_rng(seed)
    a = rng.normal(size=n)
    b = rng.normal(size=m)
    ab = audio_dsp.dtw_cost(a, b)
    ba = audio_dsp.dtw_cost(b, a)
    assert ab >= 0
    assert abs(ab - ba) < 1e-12  # band and recurrence are symmetric
    assert audio_dsp.dtw_cost(a, a) == 0.0


@settings(max_examples=20, deadline=None)
@given(st.integers(0, 2 ** 32 - 1))
def test_phash_brightness_invariance_property(seed):
    from mail_deduplicate_ray.functions import imaging
    rng = np.random.default_rng(seed)
    img = imaging.resize_bilinear(
        rng.integers(30, 226, (8, 8)).astype(np.float32), 64, 64) \
        .astype(np.uint8)
    h = imaging.phash64(img)
    for shift in (-20, -5, 5, 20):
        shifted = np.clip(img.astype(np.int16) + shift, 0, 255) \
            .astype(np.uint8)
        d = bin(h ^ imaging.phash64(shifted)).count("1")
        assert d <= 6, (shift, d)
