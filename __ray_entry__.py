"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (nor in mail_deduplicate_ray) calls ray.init()/ray.shutdown().

Column names match between queries() and oracle_sql() — the driver sorts
columns by name and hash-compares values.  Float outputs are avoided in
oracle-checked queries (integer cents/counts) so hashes are exact.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from mail_deduplicate_ray.functions.textstats import STOPWORDS
from mail_deduplicate_ray.pipelines import clips
from mail_deduplicate_ray.pipelines.docs import REGEXP_PATTERN


def entry() -> Any:
    """Flagship near-dup pipeline over the clips corpus derived from
    sf0.001 documents (decode -> signatures -> LSH/audio/containment
    candidates -> connected components -> settle)."""
    return clips.flagship_clusters("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from mail_deduplicate_ray.registry import queries as _q
    return _q()


_STOP_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)

# rolling_fingerprint's 8-byte polynomial window expanded to a closed
# form: h(i) = (OFFS*B^8 + sum_j byte[i+j] * B^(7-j)) mod 2^64 — each
# power reduced mod 2^64 so the HUGEINT partial products stay < 2^77
# (functions/textstats.py:80; ASCII corpus makes unicode() == byte)
_FP_B = 1099511628211
_FP_MOD = 1 << 64
_FP_OFFS = 14695981039346656037
_FP_OFFS_B8 = (_FP_OFFS * pow(_FP_B, 8, _FP_MOD)) % _FP_MOD
_FP_TERMS = " + ".join(
    f"unicode(substr(tx, CAST(i+{j} AS INT), 1))::HUGEINT"
    f" * {pow(_FP_B, 7 - j, _FP_MOD)}::HUGEINT" for j in range(8))

def _minhash_clusters_sql() -> str:
    """Full SQL replay of minhash_clusters_docs: the engine's EXACT
    MinHash-LSH path (normalize -> unique 8-char shingle polynomial ->
    128 multiply-add-mod-2^64 permutations -> 16-band XOR-fold bucket
    keys -> est-Jaccard >= 0.72 on the 1-byte signature fold -> CC with
    lexicographic-min labels).  The permutation/band constants are read
    from the SAME MinHasher the pipeline constructs (seed 0xC0FFEE), so
    the replay is bit-exact; multipliers are split hi/lo 32 bits so the
    mod-2^64 products stay inside HUGEINT, and the mod is a bitmask
    (int128 division measured 30x slower in DuckDB).  ASCII corpus
    assumption as elsewhere (unicode() == utf-8 byte)."""
    from mail_deduplicate_ray.functions.minhash import MinHasher
    mh = MinHasher(128, 0xC0FFEE, 16)
    m64 = _FP_MOD - 1
    perm_rows = ", ".join(
        f"({j}, {int(a) >> 32}, {int(a) & 0xFFFFFFFF}, {int(b)})"
        for j, (a, b) in enumerate(zip(mh.a, mh.b)))
    bw_rows = ", ".join(
        f"({bi}, {ri}, {int(w) >> 32}, {int(w) & 0xFFFFFFFF})"
        for bi in range(16) for ri, w in enumerate(mh.band_w[bi]))
    norm = (r"trim(regexp_replace(regexp_replace(lower(coalesce(text,'')),"
            r" '^(?:(?:re|fwd?): +|\[\w[\w_-]*\w?\] +|(?:um|uh|erm) +)+',"
            r" ''), '\s+', ' ', 'g'))")
    return f"""
        WITH RECURSIVE
        perms(j, a_hi, a_lo, b) AS MATERIALIZED (VALUES {perm_rows}),
        bw(band, ri, w_hi, w_lo) AS MATERIALIZED (VALUES {bw_rows}),
        t AS MATERIALIZED (SELECT doc_id, {norm} AS tx FROM documents),
        sh AS MATERIALIZED (
          SELECT DISTINCT doc_id,
            ({_FP_OFFS_B8}::HUGEINT + {_FP_TERMS})
                & {m64}::HUGEINT AS h
          FROM t, UNNEST(range(1, greatest(length(tx) - 6, 1))) u(i)
          WHERE length(tx) >= 8
          UNION
          SELECT DISTINCT doc_id,
            list_reduce([{_FP_OFFS}::HUGEINT] ||
              list_transform(range(1, length(tx)+1),
                i -> unicode(substr(tx, CAST(i AS INT), 1))::HUGEINT),
              (acc, x) -> (acc * {_FP_B} + x) & {m64}::HUGEINT) AS h
          FROM t WHERE length(tx) BETWEEN 1 AND 7
        ),
        sigj AS MATERIALIZED (
          SELECT doc_id, p.j,
            min((((h * p.a_hi) & 4294967295) * 4294967296
                 + h * p.a_lo + p.b) & {m64}::HUGEINT) AS s
          FROM sh, perms p GROUP BY doc_id, p.j
        ),
        sigall AS MATERIALIZED (
          SELECT t.doc_id,
                 coalesce(g.sig, list_transform(range(128),
                                                x -> {m64}::HUGEINT)) AS sig
          FROM t LEFT JOIN (SELECT doc_id, list(s ORDER BY j) AS sig
                            FROM sigj GROUP BY doc_id) g USING (doc_id)
        ),
        bk AS MATERIALIZED (
          SELECT doc_id, bw.band,
            bit_xor((((((sig[bw.band*8 + bw.ri + 1] * bw.w_hi)
                        & 4294967295) * 4294967296
                       + sig[bw.band*8 + bw.ri + 1] * bw.w_lo)
                      & {m64}::HUGEINT)) // 64) AS k
          FROM sigall, bw GROUP BY doc_id, bw.band
        ),
        cand AS MATERIALIZED (
          SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
          FROM bk a JOIN bk b ON a.band = b.band AND a.k = b.k
                              AND a.doc_id < b.doc_id
        ),
        pairs AS MATERIALIZED (
          SELECT a_id, b_id
          FROM cand JOIN sigall sa ON sa.doc_id = a_id
                    JOIN sigall sb ON sb.doc_id = b_id
          WHERE len(list_filter(range(1, 129),
                    i -> sa.sig[i] % 255 = sb.sig[i] % 255)) >= 93
        ),
        e AS (SELECT CAST(a_id AS VARCHAR) AS u,
                     CAST(b_id AS VARCHAR) AS v FROM pairs
              UNION ALL
              SELECT CAST(b_id AS VARCHAR), CAST(a_id AS VARCHAR)
              FROM pairs),
        walk(node, label) AS (
          SELECT CAST(doc_id AS VARCHAR), CAST(doc_id AS VARCHAR)
          FROM documents
          UNION
          SELECT e.u, walk.label FROM walk JOIN e ON e.v = walk.node),
        lab AS (SELECT node, min(label) AS cluster_id
                FROM walk GROUP BY node)
        SELECT CAST(node AS BIGINT) AS doc_id, cluster_id
        FROM lab ORDER BY doc_id
    """


def _hll_sql(p: int = 12) -> str:
    """Bit-exact SQL replay of approx_distinct_users (relational.py:677):
    SplitMix64 (functions/sketch.py:24) per DISTINCT user (HLL registers
    are max-folded, so hashing the distinct set gives identical
    registers), register = leading-zero rank of the (64-p)-bit suffix,
    and the EXACT-integer harmonic sum 2^64/S the engine's
    hll_estimate computes (S as HUGEINT here, Python int there) — no
    float-summation order dependence; floor(est + 0.5) on both sides.
    Multipliers are split hi/lo 32 bits so mod-2^64 products stay inside
    HUGEINT (the _minhash_clusters_sql trade); floor(log2(suffix)) is
    length(format('{:b}', x)) - 1, exact for any 52-bit value."""
    M = (1 << 64) - 1
    A = 0x9E3779B97F4A7C15
    C1, C2 = 0xBF58476D1CE4E5B9, 0x94D049BB133111EB
    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m)

    def mul64(x: str, c: int) -> str:
        ch, cl = c >> 32, c & 0xFFFFFFFF
        return (f"((((({x}) * {ch}::HUGEINT) & 4294967295::HUGEINT)"
                f" * 4294967296::HUGEINT + ({x}) * {cl}::HUGEINT)"
                f" & {M}::HUGEINT)")

    return f"""
        WITH u AS (SELECT DISTINCT user_id FROM events),
        s0 AS (SELECT ((user_id::HUGEINT + {A}::HUGEINT)
                       & {M}::HUGEINT) AS z FROM u),
        x1 AS (SELECT xor(z, z >> 30) AS x FROM s0),
        s1 AS (SELECT {mul64('x', C1)} AS z FROM x1),
        x2 AS (SELECT xor(z, z >> 27) AS x FROM s1),
        s2 AS (SELECT {mul64('x', C2)} AS z FROM x2),
        hh AS (SELECT xor(z, z >> 31) AS h FROM s2),
        rk AS (SELECT (h >> {64 - p})::BIGINT AS idx,
                      (h & {(1 << (64 - p)) - 1}::HUGEINT)::BIGINT
                          AS suffix FROM hh),
        regs AS (SELECT idx,
                   max(CASE WHEN suffix > 0
                       THEN {64 - p} - (length(format('{{:b}}', suffix)) - 1)
                       ELSE {64 - p + 1} END) AS r
                 FROM rk GROUP BY idx),
        agg AS (SELECT sum((1::HUGEINT << (64 - r))) AS s_present,
                       count(*) AS n_present FROM regs),
        est AS (SELECT
            ((CAST({alpha!r} AS DOUBLE) * {m}) * {m})
              * 18446744073709551616.0
              / CAST(s_present + ({m} - n_present) * (1::HUGEINT << 64)
                     AS DOUBLE) AS e,
            ({m} - n_present) AS zeros FROM agg)
        SELECT CAST(floor(CASE WHEN e <= CAST({2.5 * m!r} AS DOUBLE)
                               AND zeros > 0
                    THEN {m} * ln(CAST({m} AS DOUBLE) / zeros)
                    ELSE e END + 0.5) AS BIGINT) AS n_users_approx
        FROM est
    """


def _kcenter_sql(k: int = 16) -> str:
    """SQL replay of kcenter_sample_embeddings (ann.py:590): exact
    Gonzalez farthest-point as k chained argmax CTEs — seed at the
    smallest vec_id, then repeatedly take the point maximizing the
    running prefix-min cosine distance (ties to smallest vec_id), the
    same double-precision normalize/dot/least the engine computes.
    Distances are emitted as half-away-rounded integer micro-units
    (dist_q6) on both sides, so last-ulp summation-order differences
    between numpy matmul and list_dot_product cannot move the hash."""
    ctes = ["""u AS MATERIALIZED (
            SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE) /
                       (CASE WHEN nrm = 0 THEN 1.0 ELSE nrm END)) AS uv
            FROM (SELECT vec_id, embedding,
                         sqrt(list_sum(list_transform(embedding,
                              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                             AS nrm
                  FROM embeddings))""",
            "c0 AS MATERIALIZED (SELECT vec_id, uv FROM u ORDER BY vec_id LIMIT 1)",
            "m1 AS MATERIALIZED (SELECT u.vec_id, 1.0 - list_dot_product(u.uv, c0.uv)"
            " AS d FROM u CROSS JOIN c0)"]
    sel = ["SELECT 0::BIGINT AS rank, vec_id, 0::BIGINT AS dist_q6 FROM c0"]
    for r in range(1, k):
        ctes.append(
            f"c{r} AS MATERIALIZED (SELECT m{r}.vec_id, u.uv, m{r}.d FROM m{r} "
            f"JOIN u USING (vec_id) ORDER BY m{r}.d DESC, m{r}.vec_id "
            f"LIMIT 1)")
        sel.append(f"SELECT {r}::BIGINT AS rank, vec_id, "
                   f"CAST(round(d * 1000000) AS BIGINT) AS dist_q6 "
                   f"FROM c{r}")
        if r < k - 1:
            ctes.append(
                f"m{r + 1} AS MATERIALIZED (SELECT m{r}.vec_id, least(m{r}.d, "
                f"1.0 - list_dot_product(u.uv, c{r}.uv)) AS d FROM m{r} "
                f"JOIN u USING (vec_id) CROSS JOIN c{r})")
    return ("WITH " + ",\n        ".join(ctes) + "\n        "
            + "\n        UNION ALL ".join(sel) + "\n        ORDER BY rank")


# lang_id's marker-stopword sets (functions/textstats.py:16), one
# intersect-count per language; the CASE replays the dict-order
# first-strict-max tie-break (en > de > fr > es)
_LANG_SQL = {
    "en": "'the','and','of','is','with','for'",
    "de": "'der','die','und','ist','mit','das'",
    "fr": "'le','la','et','est','avec','les'",
    "es": "'el','la','y','es','con','los'",
}
_LANG_SCORES = ",\n                   ".join(
    f"len(list_intersect(tk, [{v}])) AS s_{k}"
    for k, v in _LANG_SQL.items())


def oracle_sql() -> dict[str, str]:
    d = {
        "exact_dedup_docs": """
            SELECT min(doc_id) AS keeper_id, count(*) AS n_copies
            FROM documents GROUP BY text
        """,
        "normalized_dedup_docs": """
            SELECT min(doc_id) AS keeper_id, count(*) AS n_copies
            FROM documents
            GROUP BY lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))
        """,
        "dup_group_size_histogram": """
            SELECT n_copies, count(*) AS n_groups
            FROM (SELECT count(*) AS n_copies
                  FROM documents GROUP BY text)
            GROUP BY n_copies ORDER BY n_copies
        """,
        "doc_hashes": """
            SELECT doc_id, sha256(text) AS text_sha FROM documents
        """,
        # word-order-invariant dedup: group on the sorted token multiset
        # (engine keys on sha256 of the sorted list — same partition)
        "bag_dedup_docs": """
            SELECT min(doc_id) AS keeper_id, count(*) AS n_copies
            FROM documents
            GROUP BY list_sort(regexp_split_to_array(trim(text), '\\s+'))
        """,
        "keep_biggest_per_lang": """
            SELECT lang, doc_id, n_chars FROM (
                SELECT lang, doc_id, n_chars,
                       max(n_chars) OVER (PARTITION BY lang) AS mx
                FROM documents)
            WHERE n_chars = mx
        """,
        "regexp_filter_docs": f"""
            SELECT doc_id, lang FROM documents
            WHERE regexp_matches(text, '{REGEXP_PATTERN}')
        """,
        "token_stats_per_lang": """
            SELECT lang,
                   count(*) AS n_docs,
                   CAST(sum(len(regexp_split_to_array(trim(text), '\\s+')))
                        AS BIGINT) AS sum_tokens,
                   CAST(sum(n_chars) AS BIGINT) AS sum_chars
            FROM documents GROUP BY lang
        """,
        "quality_scores": f"""
            SELECT doc_id,
                   len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
                   len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                   x -> x IN ({_STOP_SQL}))) AS n_stopwords,
                   length(regexp_replace(text, '[\\w\\s]', '', 'g')) AS n_punct
            FROM documents
        """,
        "bpe_token_counts": """
            SELECT doc_id,
                   len(regexp_extract_all(text,
                       '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\r]')) AS n_bpe_tokens
            FROM documents
        """,
        # per-doc top-3 most-similar by exact trigram Jaccard (both
        # engines rank by the correctly-rounded double i/u from the same
        # integers, ties -> similar_id asc)
        "similar_docs_topk": """
            WITH s AS (SELECT doc_id, list_distinct(list_transform(
                           generate_series(1, greatest(length(text) - 2, 1)),
                           i -> substr(text, i, 3))) AS grams
                       FROM documents),
            p AS (SELECT a.doc_id AS doc_id, b.doc_id AS similar_id,
                         len(list_intersect(a.grams, b.grams)) AS i,
                         len(a.grams) + len(b.grams) AS sz
                  FROM s a JOIN s b ON a.doc_id <> b.doc_id),
            r AS (SELECT doc_id, similar_id,
                         row_number() OVER (PARTITION BY doc_id
                             ORDER BY CAST(i AS DOUBLE)/(sz - i) DESC,
                                      similar_id ASC) AS rank
                  FROM p WHERE i >= 1)
            SELECT doc_id, similar_id, rank FROM r WHERE rank <= 3
            ORDER BY doc_id, rank
        """,
        # BFF incremental dedup — the engine's k=4 bloom probes are four
        # disjoint 20-bit sha256 hex slices, so SQL replays every bloom
        # decision exactly: base probe-set union via DISTINCT, a new doc
        # is kept iff >= 1 probe bit is absent from the union.
        "bloom_incremental_dedup_docs": """
            WITH basep AS (
              SELECT DISTINCT pos FROM (
                SELECT unnest([('0x' || substr(h, 1, 5))::BIGINT,
                               ('0x' || substr(h, 6, 5))::BIGINT,
                               ('0x' || substr(h, 11, 5))::BIGINT,
                               ('0x' || substr(h, 16, 5))::BIGINT]) AS pos
                FROM (SELECT sha256(coalesce(text, '')) AS h
                      FROM documents WHERE doc_id % 7 <> 0))
            ),
            newd AS (
              SELECT doc_id, n_chars, sha256(coalesce(text, '')) AS h
              FROM documents WHERE doc_id % 7 = 0
            ),
            newp AS (
              SELECT doc_id,
                     unnest([('0x' || substr(h, 1, 5))::BIGINT,
                             ('0x' || substr(h, 6, 5))::BIGINT,
                             ('0x' || substr(h, 11, 5))::BIGINT,
                             ('0x' || substr(h, 16, 5))::BIGINT]) AS pos
              FROM newd
            )
            SELECT d.doc_id, CAST(d.n_chars AS BIGINT) AS n_chars
            FROM newd d
            JOIN (SELECT DISTINCT doc_id FROM newp
                  WHERE pos NOT IN (SELECT pos FROM basep)) k
              USING (doc_id)
            ORDER BY doc_id
        """,
        # SimHash Hamming<=3 pairs — the SQL replays the ENGINE's exact
        # fingerprint (FNV-style token fold, per-bit majority vote: see
        # functions/shingles.py token_hashes + simhash.token_simhash) in
        # DuckDB HUGEINT arithmetic, then bit_count(xor()) over a
        # self-join replays the exact Hamming predicate (the engine's
        # pigeonhole banding has recall 1.0, so all-pairs == banded).
        "simhash_neardup_pairs": r"""
            WITH toks AS (
              SELECT doc_id, unnest(regexp_split_to_array(
                         trim(lower(text)), '\s+')) AS tok
              FROM documents WHERE trim(coalesce(text,'')) <> ''
            ),
            th AS (
              SELECT doc_id,
                list_reduce(
                  [14695981039346656037::HUGEINT] ||
                  list_transform(range(1, length(tok)+1),
                                 i -> unicode(tok[i])::HUGEINT),
                  (acc, x) -> (acc * 1099511628211 + x)
                              % 18446744073709551616::HUGEINT
                ) AS h
              FROM toks
            ),
            bits AS (
              SELECT doc_id, b.b AS b,
                     sum(CASE WHEN (h // (2::HUGEINT ^ b.b)::HUGEINT)
                                   % 2 = 1
                              THEN 1 ELSE -1 END) AS vote
              FROM th, (SELECT unnest(range(64)) AS b) b
              GROUP BY doc_id, b.b
            ),
            fps AS (
              SELECT d.doc_id, coalesce(f.fp, 0::HUGEINT)::UBIGINT AS fp
              FROM documents d LEFT JOIN (
                SELECT doc_id,
                       sum(CASE WHEN vote >= 0
                                THEN (2::HUGEINT ^ b)::HUGEINT
                                ELSE 0::HUGEINT END) AS fp
                FROM bits GROUP BY doc_id) f USING (doc_id)
            )
            SELECT a.doc_id AS a_id, b.doc_id AS b_id
            FROM fps a JOIN fps b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.fp, b.fp)) <= 3
            ORDER BY a_id, b_id
        """,
        # MinHash-LSH near-dup clustering — the flagship's text channel
        # replayed end-to-end in SQL (see _minhash_clusters_sql)
        "minhash_clusters_docs": _minhash_clusters_sql(),
        # HyperLogLog approximate distinct — SplitMix64 + exact-integer
        # harmonic sum replayed bit-for-bit (see _hll_sql)
        "approx_distinct_users": _hll_sql(),
        # exact Gonzalez k-center — 16 chained argmax CTEs, micro-unit
        # quantized distances (see _kcenter_sql)
        "kcenter_sample_embeddings": _kcenter_sql(),
        # Naive-Bayes classifier (docs.nb_lang_classifier_docs): same
        # tokenization, Laplace counts, micro-nat quantized weights
        # floor(1e6*ln(.)) and min-lang argmax tie-break — integer
        # score sums are order-free, so the replay is exact
        "nb_lang_classifier_docs": r"""
            WITH toks AS (
              SELECT doc_id, lang, t AS tok FROM (
                SELECT doc_id, lang, unnest(regexp_split_to_array(
                    trim(lower(coalesce(text,''))), '\s+')) AS t
                FROM documents)
              WHERE t <> ''
            ),
            counts AS (SELECT lang, tok, count(*)::BIGINT AS c
                       FROM toks GROUP BY lang, tok),
            nl AS (SELECT lang, count(*)::BIGINT AS n
                   FROM toks GROUP BY lang),
            vocab AS (SELECT count(DISTINCT tok) AS v FROM toks),
            langs AS (SELECT DISTINCT lang FROM documents),
            prior AS (SELECT lang,
                        CAST(floor(1000000 * ln(CAST(count(*) AS DOUBLE)
                             / (SELECT count(*) FROM documents)))
                             AS BIGINT) AS pw
                      FROM documents GROUP BY lang),
            wt AS (SELECT l.lang, vt.tok,
                     CAST(floor(1000000 * ln(
                         CAST(coalesce(c.c, 0) + 1 AS DOUBLE)
                         / (nl.n + vocab.v))) AS BIGINT) AS w
                   FROM (SELECT DISTINCT tok FROM toks) vt
                   CROSS JOIN langs l
                   JOIN nl ON nl.lang = l.lang
                   CROSS JOIN vocab
                   LEFT JOIN counts c
                     ON c.lang = l.lang AND c.tok = vt.tok),
            scored AS (
              SELECT d.doc_id, l.lang,
                     CAST(p.pw + coalesce(sum(w.w), 0) AS BIGINT) AS score
              FROM documents d
              CROSS JOIN langs l
              JOIN prior p ON p.lang = l.lang
              LEFT JOIN toks dt ON dt.doc_id = d.doc_id
              LEFT JOIN wt w ON w.lang = l.lang AND w.tok = dt.tok
              GROUP BY d.doc_id, l.lang, p.pw
            )
            SELECT doc_id, lang AS pred_lang, score FROM (
              SELECT *, row_number() OVER (PARTITION BY doc_id
                        ORDER BY score DESC, lang ASC) AS rn
              FROM scored)
            WHERE rn = 1 ORDER BY doc_id
        """,
        # per-doc SimHash fingerprints — the same HUGEINT replay of the
        # engine's FNV token fold + per-bit majority as the pairs oracle
        "simhash_docs": r"""
            WITH toks AS (
              SELECT doc_id, unnest(regexp_split_to_array(
                         trim(lower(text)), '\s+')) AS tok
              FROM documents WHERE trim(coalesce(text,'')) <> ''
            ),
            th AS (
              SELECT doc_id,
                list_reduce(
                  [14695981039346656037::HUGEINT] ||
                  list_transform(range(1, length(tok)+1),
                                 i -> unicode(tok[i])::HUGEINT),
                  (acc, x) -> (acc * 1099511628211 + x)
                              % 18446744073709551616::HUGEINT
                ) AS h
              FROM toks
            ),
            bits AS (
              SELECT doc_id, b.b AS b,
                     sum(CASE WHEN (h // (2::HUGEINT ^ b.b)::HUGEINT)
                                   % 2 = 1
                              THEN 1 ELSE -1 END) AS vote
              FROM th, (SELECT unnest(range(64)) AS b) b
              GROUP BY doc_id, b.b
            )
            SELECT d.doc_id, coalesce(f.fp, 0::HUGEINT)::UBIGINT AS simhash
            FROM documents d LEFT JOIN (
              SELECT doc_id,
                     sum(CASE WHEN vote >= 0
                              THEN (2::HUGEINT ^ b)::HUGEINT
                              ELSE 0::HUGEINT END) AS fp
              FROM bits GROUP BY doc_id) f USING (doc_id)
        """,
        # winnowing bottom-1 fingerprint: min over all 8-byte windows of
        # the rolling polynomial hash, closed-form per window (constants
        # above); texts shorter than the window hash whole via the same
        # list_reduce idiom as the simhash oracle
        "doc_fingerprints": f"""
            WITH t AS (SELECT doc_id, coalesce(text,'') AS tx
                       FROM documents)
            SELECT doc_id,
              CASE WHEN length(tx) = 0 THEN 0::UBIGINT
                   WHEN length(tx) < 8 THEN
                     list_reduce(
                       [{_FP_OFFS}::HUGEINT] ||
                       list_transform(range(1, length(tx)+1),
                           i -> unicode(substr(tx, CAST(i AS INT), 1))
                                ::HUGEINT),
                       (acc, x) -> (acc * {_FP_B} + x)
                                   % {_FP_MOD}::HUGEINT)::UBIGINT
                   ELSE list_min(list_transform(
                       range(1, length(tx) - 6),
                       i -> (({_FP_OFFS_B8}::HUGEINT + {_FP_TERMS})
                             % {_FP_MOD}::HUGEINT)))::UBIGINT
              END AS fingerprint
            FROM t
        """,
        # n-gram-heuristic language ID: CJK screen on the first 400
        # chars, else the marker-set intersect counts over the distinct
        # first-200 tokens, first strict max in dict order
        "lang_id_docs": f"""
            WITH t AS (SELECT doc_id, lang, coalesce(text,'') AS tx
                       FROM documents),
            tk AS (SELECT doc_id, lang, tx, list_distinct(
                       regexp_split_to_array(trim(lower(tx)),
                                             '\\s+')[1:200]) AS tk
                   FROM t),
            s AS (SELECT doc_id, lang, tx,
                   {_LANG_SCORES}
                  FROM tk)
            SELECT doc_id, lang,
              CASE WHEN regexp_matches(substr(tx, 1, 400),
                        '[\\x{{4e00}}-\\x{{9fff}}]') THEN 'zh'
                   WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es
                        THEN 'en'
                   WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
                   WHEN s_fr >= s_es THEN 'fr' ELSE 'es' END AS lang_pred
            FROM s
        """,
        # exact character-trigram-set Jaccard >= 0.6; the size-ratio join
        # predicate is an EXACT bound (J <= min/max set size), pure pruning
        "ngram_jaccard_pairs": """
            WITH s AS (
                SELECT doc_id,
                       list_distinct(list_transform(
                           generate_series(1, greatest(length(text) - 2, 1)),
                           i -> substr(text, i, 3))) AS grams
                FROM documents)
            SELECT a.doc_id AS a_id, b.doc_id AS b_id
            FROM s a JOIN s b
              ON a.doc_id < b.doc_id
             AND least(len(a.grams), len(b.grams))
                 >= 0.6 * greatest(len(a.grams), len(b.grams))
            WHERE len(list_intersect(a.grams, b.grams)) * 1.0
                  / (len(a.grams) + len(b.grams)
                     - len(list_intersect(a.grams, b.grams))) >= 0.6
        """,
        # edit-distance similarity join (PassJoin pigeonhole candidates,
        # banded-DP verify).  The MATERIALIZED chunk prefilter is EXACT:
        # <=4 edits touch <=4 of the 5 covering chunks of b.text, so one
        # chunk appears verbatim in a.text — it only prunes levenshtein()
        # calls (23.9 s -> 0.15 s at sf0.01; DuckDB's levenshtein is the
        # slow full-DP, and without MATERIALIZED the planner runs it
        # before the cheap containment filter)
        "levenshtein_neardup_pairs": """
            WITH c AS MATERIALIZED (
                SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                       a.text AS ta, b.text AS tb
                FROM documents a JOIN documents b
                  ON a.doc_id < b.doc_id
                 AND abs(length(a.text) - length(b.text)) <= 4
                 AND (position(substr(b.text, 1 + 0 * ((length(b.text) + 4) // 5),
                               ((length(b.text) + 4) // 5)) IN a.text) > 0
                   OR position(substr(b.text, 1 + 1 * ((length(b.text) + 4) // 5),
                               ((length(b.text) + 4) // 5)) IN a.text) > 0
                   OR position(substr(b.text, 1 + 2 * ((length(b.text) + 4) // 5),
                               ((length(b.text) + 4) // 5)) IN a.text) > 0
                   OR position(substr(b.text, 1 + 3 * ((length(b.text) + 4) // 5),
                               ((length(b.text) + 4) // 5)) IN a.text) > 0
                   OR position(substr(b.text, 1 + 4 * ((length(b.text) + 4) // 5),
                               ((length(b.text) + 4) // 5)) IN a.text) > 0))
            SELECT a_id, b_id FROM c WHERE levenshtein(ta, tb) <= 4
        """,
        # incremental-snapshot screen: NEW docs (doc_id%7=0) within
        # lev<=4 of any BASE doc, min matching base (same exact
        # pigeonhole-pruned predicate as levenshtein_neardup_pairs)
        "incremental_neardup_docs": """
            WITH c AS MATERIALIZED (
                SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                       a.text AS ta, b.text AS tb
                FROM documents a JOIN documents b
                  ON a.doc_id < b.doc_id
                 AND abs(length(a.text) - length(b.text)) <= 4
                 AND (position(substr(b.text, 1 + 0 * ((length(b.text) + 4) // 5),
                               ((length(b.text) + 4) // 5)) IN a.text) > 0
                   OR position(substr(b.text, 1 + 1 * ((length(b.text) + 4) // 5),
                               ((length(b.text) + 4) // 5)) IN a.text) > 0
                   OR position(substr(b.text, 1 + 2 * ((length(b.text) + 4) // 5),
                               ((length(b.text) + 4) // 5)) IN a.text) > 0
                   OR position(substr(b.text, 1 + 3 * ((length(b.text) + 4) // 5),
                               ((length(b.text) + 4) // 5)) IN a.text) > 0
                   OR position(substr(b.text, 1 + 4 * ((length(b.text) + 4) // 5),
                               ((length(b.text) + 4) // 5)) IN a.text) > 0)),
             p AS (SELECT a_id, b_id FROM c WHERE levenshtein(ta, tb) <= 4),
             e AS (SELECT a_id AS u, b_id AS v FROM p
                   UNION ALL SELECT b_id, a_id FROM p)
            SELECT u AS doc_id, min(v) AS base_id FROM e
            WHERE u % 7 = 0 AND v % 7 <> 0 GROUP BY u ORDER BY doc_id
        """,
        # per-doc distinctive terms: top-3 tokens by (tf DESC, df ASC,
        # token ASC) — the integer-exact tf-idf ranking core
        "distinctive_terms_docs": """
            WITH tok AS (SELECT doc_id,
                    unnest(regexp_split_to_array(trim(text), '\\s+'))
                        AS token
                FROM documents WHERE trim(text) <> ''),
            tf AS (SELECT doc_id, token, count(*) AS tf FROM tok
                   GROUP BY doc_id, token),
            df AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
            r AS (SELECT tf.doc_id, tf.token, row_number() OVER (
                      PARTITION BY tf.doc_id
                      ORDER BY tf.tf DESC, df.df ASC, tf.token ASC)
                      AS rank
                  FROM tf JOIN df USING (token))
            SELECT doc_id, token, CAST(rank AS BIGINT) AS rank
            FROM r WHERE rank <= 3 ORDER BY doc_id, rank
        """,
        # connected components over the lev<=4 pair graph, replayed in
        # SQL as a recursive-CTE closure (min reachable label) — the
        # independent truth for the distributed CC engine
        "levenshtein_clusters": """
            WITH RECURSIVE
             c AS MATERIALIZED (
                SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                       a.text AS ta, b.text AS tb
                FROM documents a JOIN documents b
                  ON a.doc_id < b.doc_id
                 AND abs(length(a.text) - length(b.text)) <= 4
                 AND (position(substr(b.text, 1 + 0 * ((length(b.text) + 4) // 5),
                               ((length(b.text) + 4) // 5)) IN a.text) > 0
                   OR position(substr(b.text, 1 + 1 * ((length(b.text) + 4) // 5),
                               ((length(b.text) + 4) // 5)) IN a.text) > 0
                   OR position(substr(b.text, 1 + 2 * ((length(b.text) + 4) // 5),
                               ((length(b.text) + 4) // 5)) IN a.text) > 0
                   OR position(substr(b.text, 1 + 3 * ((length(b.text) + 4) // 5),
                               ((length(b.text) + 4) // 5)) IN a.text) > 0
                   OR position(substr(b.text, 1 + 4 * ((length(b.text) + 4) // 5),
                               ((length(b.text) + 4) // 5)) IN a.text) > 0)),
             p AS MATERIALIZED (SELECT a_id, b_id FROM c
                                WHERE levenshtein(ta, tb) <= 4),
             e AS (SELECT a_id AS u, b_id AS v FROM p
                   UNION ALL SELECT b_id, a_id FROM p),
             walk(node, label) AS (
                SELECT doc_id, doc_id FROM documents
                UNION
                SELECT e.u, walk.label FROM walk JOIN e ON e.v = walk.node)
            SELECT node AS doc_id, min(label) AS cluster_id
            FROM walk GROUP BY node ORDER BY doc_id
        """,
        # per-cluster best representative: the closure above + keep the
        # longest doc per component (n_chars desc, doc_id asc) — the
        # settle-winner selection, fully SQL-replayed
        "cluster_best_docs": """
            WITH RECURSIVE
             c AS MATERIALIZED (
                SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                       a.text AS ta, b.text AS tb
                FROM documents a JOIN documents b
                  ON a.doc_id < b.doc_id
                 AND abs(length(a.text) - length(b.text)) <= 4
                 AND (position(substr(b.text, 1 + 0 * ((length(b.text) + 4) // 5),
                               ((length(b.text) + 4) // 5)) IN a.text) > 0
                   OR position(substr(b.text, 1 + 1 * ((length(b.text) + 4) // 5),
                               ((length(b.text) + 4) // 5)) IN a.text) > 0
                   OR position(substr(b.text, 1 + 2 * ((length(b.text) + 4) // 5),
                               ((length(b.text) + 4) // 5)) IN a.text) > 0
                   OR position(substr(b.text, 1 + 3 * ((length(b.text) + 4) // 5),
                               ((length(b.text) + 4) // 5)) IN a.text) > 0
                   OR position(substr(b.text, 1 + 4 * ((length(b.text) + 4) // 5),
                               ((length(b.text) + 4) // 5)) IN a.text) > 0)),
             p AS MATERIALIZED (SELECT a_id, b_id FROM c
                                WHERE levenshtein(ta, tb) <= 4),
             e AS (SELECT a_id AS u, b_id AS v FROM p
                   UNION ALL SELECT b_id, a_id FROM p),
             walk(node, label) AS (
                SELECT doc_id, doc_id FROM documents
                UNION
                SELECT e.u, walk.label FROM walk JOIN e ON e.v = walk.node),
             lab AS (SELECT node AS doc_id, min(label) AS cluster_id
                     FROM walk GROUP BY node)
            SELECT cluster_id, doc_id, n_chars FROM (
                SELECT lab.cluster_id, lab.doc_id, d.n_chars,
                       row_number() OVER (PARTITION BY lab.cluster_id
                           ORDER BY d.n_chars DESC, lab.doc_id ASC) AS rn
                FROM lab JOIN documents d USING (doc_id))
            WHERE rn = 1 ORDER BY cluster_id
        """,
        # leakage-free split: the levenshtein closure + Knuth-hash split
        # of the CLUSTER id (all near-dup members share a split)
        "leakage_free_splits_docs": """
            WITH RECURSIVE
             c AS MATERIALIZED (
                SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                       a.text AS ta, b.text AS tb
                FROM documents a JOIN documents b
                  ON a.doc_id < b.doc_id
                 AND abs(length(a.text) - length(b.text)) <= 4
                 AND (position(substr(b.text, 1 + 0 * ((length(b.text) + 4) // 5),
                               ((length(b.text) + 4) // 5)) IN a.text) > 0
                   OR position(substr(b.text, 1 + 1 * ((length(b.text) + 4) // 5),
                               ((length(b.text) + 4) // 5)) IN a.text) > 0
                   OR position(substr(b.text, 1 + 2 * ((length(b.text) + 4) // 5),
                               ((length(b.text) + 4) // 5)) IN a.text) > 0
                   OR position(substr(b.text, 1 + 3 * ((length(b.text) + 4) // 5),
                               ((length(b.text) + 4) // 5)) IN a.text) > 0
                   OR position(substr(b.text, 1 + 4 * ((length(b.text) + 4) // 5),
                               ((length(b.text) + 4) // 5)) IN a.text) > 0)),
             p AS MATERIALIZED (SELECT a_id, b_id FROM c
                                WHERE levenshtein(ta, tb) <= 4),
             e AS (SELECT a_id AS u, b_id AS v FROM p
                   UNION ALL SELECT b_id, a_id FROM p),
             walk(node, label) AS (
                SELECT doc_id, doc_id FROM documents
                UNION
                SELECT e.u, walk.label FROM walk JOIN e ON e.v = walk.node),
             lab AS (SELECT node AS doc_id, min(label) AS cluster_id
                     FROM walk GROUP BY node)
            SELECT doc_id, cluster_id,
                   CASE WHEN (CAST(cluster_id AS HUGEINT) * 2654435761)
                             % 4294967296 % 100 < 10 THEN 'test'
                        WHEN (CAST(cluster_id AS HUGEINT) * 2654435761)
                             % 4294967296 % 100 < 20 THEN 'val'
                        ELSE 'train' END AS split
            FROM lab ORDER BY doc_id
        """,
        # mixture rebalancing: downsample every language to the minority
        # language's mass via integer per-mille acceptance rates
        "mixture_rebalance_docs": """
            WITH c AS (SELECT lang, count(*) AS n FROM documents
                       GROUP BY lang),
            m AS (SELECT min(n) AS mn FROM c),
            r AS (SELECT lang, (1000 * mn) // n AS permille FROM c, m)
            SELECT d.doc_id, d.lang
            FROM documents d JOIN r USING (lang)
            WHERE (CAST(d.doc_id AS HUGEINT) * 2654435761)
                  % 4294967296 % 1000 < r.permille
            ORDER BY d.doc_id
        """,
        # deterministic global shuffle order: rank under the Knuth-hash
        # permutation (hash ties broken by doc_id)
        "global_shuffle_order_docs": """
            SELECT doc_id,
                   row_number() OVER (
                       ORDER BY (CAST(doc_id AS HUGEINT) * 2654435761)
                                % 4294967296, doc_id) - 1 AS position
            FROM documents ORDER BY doc_id
        """,
        # duplicate-span REMOVAL: delete every char covered by a
        # cross-doc 50-gram, reconcatenate the survivors (char-level
        # replay: covered set -> anti-join -> ordered string_agg)
        "dup_span_removal_docs": """
            WITH grams AS (
                SELECT doc_id, CAST(i AS BIGINT) AS pos,
                       substr(text, CAST(i+1 AS INT), 50) AS g
                FROM documents,
                     UNNEST(range(GREATEST(length(text) - 49, 0))) u(i)),
            dup AS (
                SELECT g FROM grams
                GROUP BY g HAVING count(DISTINCT doc_id) > 1),
            m AS (SELECT doc_id, pos FROM grams JOIN dup USING (g)),
            cov AS (
                SELECT DISTINCT doc_id, pos + j AS c
                FROM m, UNNEST(range(50)) u(j)),
            chars AS (
                SELECT d.doc_id, CAST(i AS BIGINT) AS c,
                       substr(d.text, CAST(i+1 AS INT), 1) AS ch
                FROM documents d, UNNEST(range(length(d.text))) u(i)),
            kept AS (
                SELECT ch.doc_id, ch.c, ch.ch
                FROM chars ch LEFT JOIN cov
                  ON cov.doc_id = ch.doc_id AND cov.c = ch.c
                WHERE cov.c IS NULL),
            agg AS (
                SELECT doc_id, string_agg(ch, '' ORDER BY c) AS clean_text,
                       count(*) AS n_kept
                FROM kept GROUP BY doc_id)
            SELECT d.doc_id,
                   coalesce(a.clean_text, '') AS clean_text,
                   length(d.text) - coalesce(a.n_kept, 0) AS n_removed
            FROM documents d LEFT JOIN agg a USING (doc_id)
            ORDER BY d.doc_id
        """,
        # per-language adaptive length gate: keep docs inside their own
        # language's [p5, p95] discrete quantiles
        "lang_adaptive_length_filter_docs": """
            WITH b AS (
                SELECT lang, quantile_disc(n_chars, 0.05) AS lo,
                       quantile_disc(n_chars, 0.95) AS hi
                FROM documents GROUP BY lang)
            SELECT d.doc_id, d.lang, d.n_chars
            FROM documents d JOIN b USING (lang)
            WHERE d.n_chars BETWEEN b.lo AND b.hi
            ORDER BY d.doc_id
        """,
        # paragraph(=10-token-chunk)-granularity dedup with document
        # reconstruction: every chunk keeps its globally-first
        # occurrence (doc_id, chunk_idx order), survivors reassemble
        "chunk_dedup_docs": """
            WITH toks AS (
                SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
            chunks AS (
                SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
                       array_to_string(ts[CAST(i*10+1 AS BIGINT)
                                          :CAST(i*10+10 AS BIGINT)],
                                       ' ') AS chunk
                FROM toks,
                     UNNEST(range(CAST(ceil(len(ts)/10.0) AS BIGINT))) u(i)),
            keep AS (
                SELECT doc_id, chunk_idx, chunk,
                       row_number() OVER (PARTITION BY chunk
                           ORDER BY doc_id, chunk_idx) AS rn
                FROM chunks)
            SELECT doc_id,
                   string_agg(chunk, ' ' ORDER BY chunk_idx) AS dedup_text,
                   count(*) AS n_kept
            FROM keep WHERE rn = 1
            GROUP BY doc_id ORDER BY doc_id
        """,
        # duplicate-span detection (Lee et al. 2022 exact-substring
        # dedup): positions covered by a 50-gram seen in >1 doc, merged
        # into maximal intervals via gaps-and-islands
        "dup_span_intervals_docs": """
            WITH grams AS (
                SELECT doc_id, CAST(i AS BIGINT) AS pos,
                       substr(text, CAST(i+1 AS INT), 50) AS g
                FROM documents,
                     UNNEST(range(GREATEST(length(text) - 49, 0))) u(i)),
            dup AS (
                SELECT g FROM grams
                GROUP BY g HAVING count(DISTINCT doc_id) > 1),
            m AS (SELECT doc_id, pos FROM grams JOIN dup USING (g)),
            isl AS (
                SELECT doc_id, pos,
                       CASE WHEN pos > coalesce(
                                max(pos) OVER (PARTITION BY doc_id
                                    ORDER BY pos ROWS BETWEEN UNBOUNDED
                                    PRECEDING AND 1 PRECEDING),
                                -100) + 50
                            THEN 1 ELSE 0 END AS brk
                FROM m),
            grp AS (
                SELECT doc_id, pos,
                       sum(brk) OVER (PARTITION BY doc_id
                           ORDER BY pos) AS gid
                FROM isl)
            SELECT doc_id, min(pos) AS start_pos, max(pos) + 49 AS end_pos
            FROM grp GROUP BY doc_id, gid
            ORDER BY doc_id, start_pos
        """,
        # exact-substring containment (suffix-array detector): contained
        # text strictly shorter, at least 64 chars (ASCII corpus: byte and
        # char lengths agree)
        # boilerplate-prefix groups: same normalization as
        # normalized_dedup_docs, first-16-char key, groups of >= 2
        "boilerplate_prefix_docs": """
            SELECT substr(lower(trim(regexp_replace(
                       coalesce(text, ''), '\\s+', ' ', 'g'))), 1, 16)
                       AS prefix,
                   count(*) AS n_docs, min(doc_id) AS min_doc_id
            FROM documents
            GROUP BY 1 HAVING count(*) >= 2
            ORDER BY prefix
        """,
        # suffix/prefix overlap (shard stitching): last 12 chars of a
        # equal first 12 of b (raw text, ASCII corpus)
        "overlap_pairs_docs": """
            SELECT a.doc_id AS a_id, b.doc_id AS b_id
            FROM documents a, documents b
            WHERE a.doc_id <> b.doc_id
              AND length(a.text) >= 12 AND length(b.text) >= 12
              AND substr(a.text, length(a.text) - 11, 12)
                  = substr(b.text, 1, 12)
            ORDER BY a_id, b_id
        """,
        "substring_pairs": """
            SELECT a.doc_id AS a_id, b.doc_id AS b_id
            FROM documents a, documents b
            WHERE a.doc_id <> b.doc_id
              AND length(b.text) >= 64
              AND length(b.text) < length(a.text)
              AND position(b.text IN a.text) > 0
        """,
        # deny-list redaction: RE2 on both sides (pyarrow + DuckDB), so
        # \b and alternation semantics agree exactly
        "scrub_docs": """
            SELECT doc_id,
                   CAST(len(regexp_extract_all(
                       text, '\\b(key|hash|value)\\b')) AS BIGINT)
                       AS n_redacted,
                   sha256(regexp_replace(
                       text, '\\b(key|hash|value)\\b', '<X>', 'g'))
                       AS scrubbed_sha
            FROM documents
        """,
        "token_repetition_docs": """
            SELECT doc_id,
                   CAST(len(regexp_split_to_array(trim(text), '\\s+'))
                        AS BIGINT) AS n_tokens,
                   CAST(len(list_distinct(
                       regexp_split_to_array(trim(text), '\\s+')))
                        AS BIGINT) AS n_distinct_tokens
            FROM documents
        """,
        # PII redaction: stepwise RE2 replacement replayed exactly —
        # order (email -> phone -> ipv4) is part of the contract
        "pii_redact_docs": """
            WITH s1 AS (
                SELECT doc_id,
                       len(regexp_extract_all(text,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'
                           )) AS n_email,
                       regexp_replace(text,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                           '<EMAIL>', 'g') AS t1
                FROM documents),
            s2 AS (
                SELECT doc_id, n_email,
                       len(regexp_extract_all(t1,
                           '\\+?\\d{3}[-. ]\\d{3}[-. ]\\d{4}')) AS n_phone,
                       regexp_replace(t1,
                           '\\+?\\d{3}[-. ]\\d{3}[-. ]\\d{4}',
                           '<PHONE>', 'g') AS t2
                FROM s1)
            SELECT doc_id,
                   regexp_replace(t2, '\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b',
                                  '<IP>', 'g') AS clean_text,
                   CAST(n_email AS BIGINT) AS n_email,
                   CAST(n_phone AS BIGINT) AS n_phone,
                   CAST(len(regexp_extract_all(t2,
                       '\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b')) AS BIGINT)
                       AS n_ipv4
            FROM s2 ORDER BY doc_id
        """,
        # Gopher within-doc repetition: most-frequent 2-/3-gram char
        # mass + duplicated-5-gram token coverage (integer-exact)
        "gopher_repetition_docs": """
            WITH base AS (
                SELECT doc_id, trim(coalesce(text, '')) AS tt,
                       length(coalesce(text, '')) AS text_chars
                FROM documents),
            toks AS (
                SELECT doc_id, CAST(u.i AS BIGINT) AS i,
                       a[CAST(u.i + 1 AS INT)] AS tok
                FROM (SELECT doc_id,
                             regexp_split_to_array(tt, '\\s+') AS a
                      FROM base WHERE tt <> '') b,
                     UNNEST(range(len(a))) u(i)),
            nt AS (SELECT doc_id, count(*) AS n_tokens
                   FROM toks GROUP BY doc_id),
            g2 AS (
                SELECT doc_id, tok || ' ' || lead(tok, 1) OVER w AS g
                FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY i)
                QUALIFY lead(tok, 1) OVER w IS NOT NULL),
            t2 AS (
                SELECT doc_id, cnt * length(g) AS top2_chars,
                       row_number() OVER (PARTITION BY doc_id
                                          ORDER BY cnt DESC, g ASC) AS rn
                FROM (SELECT doc_id, g, count(*) AS cnt
                      FROM g2 GROUP BY doc_id, g)),
            g3 AS (
                SELECT doc_id, tok || ' ' || lead(tok, 1) OVER w
                           || ' ' || lead(tok, 2) OVER w AS g
                FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY i)
                QUALIFY lead(tok, 2) OVER w IS NOT NULL),
            t3 AS (
                SELECT doc_id, cnt * length(g) AS top3_chars,
                       row_number() OVER (PARTITION BY doc_id
                                          ORDER BY cnt DESC, g ASC) AS rn
                FROM (SELECT doc_id, g, count(*) AS cnt
                      FROM g3 GROUP BY doc_id, g)),
            g5 AS (
                SELECT doc_id, i,
                       tok || ' ' || lead(tok, 1) OVER w
                           || ' ' || lead(tok, 2) OVER w
                           || ' ' || lead(tok, 3) OVER w
                           || ' ' || lead(tok, 4) OVER w AS g
                FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY i)
                QUALIFY lead(tok, 4) OVER w IS NOT NULL),
            d5 AS (SELECT doc_id, g FROM g5
                   GROUP BY doc_id, g HAVING count(*) >= 2),
            cov AS (SELECT DISTINCT g5.doc_id, g5.i + u.j AS p
                    FROM g5 JOIN d5 USING (doc_id, g),
                         UNNEST(range(5)) u(j)),
            c5 AS (SELECT doc_id, count(*) AS dup5_tokens
                   FROM cov GROUP BY doc_id)
            SELECT b.doc_id,
                   coalesce(nt.n_tokens, 0) AS n_tokens,
                   b.text_chars,
                   coalesce(t2.top2_chars, 0) AS top2_chars,
                   coalesce(t3.top3_chars, 0) AS top3_chars,
                   coalesce(c5.dup5_tokens, 0) AS dup5_tokens
            FROM base b
            LEFT JOIN nt USING (doc_id)
            LEFT JOIN (SELECT doc_id, top2_chars FROM t2 WHERE rn = 1)
                t2 USING (doc_id)
            LEFT JOIN (SELECT doc_id, top3_chars FROM t3 WHERE rn = 1)
                t3 USING (doc_id)
            LEFT JOIN c5 USING (doc_id)
            ORDER BY b.doc_id
        """,
        "vocab_coverage_docs": """
            WITH toks AS (
                SELECT doc_id,
                       unnest(regexp_split_to_array(trim(text), '\s+'))
                           AS tok
                FROM documents),
            vocab AS (
                SELECT tok FROM toks GROUP BY tok
                ORDER BY count(*) DESC, tok ASC LIMIT 200)
            SELECT doc_id,
                   count(*) AS n_tokens,
                   CAST(count(*) FILTER (tok IN (SELECT tok FROM vocab))
                        AS BIGINT) AS n_in_vocab
            FROM toks GROUP BY doc_id
        """,
        # sequence packing: doc_id-ordered exclusive prefix sum of token
        # counts -> capacity-2048 chunk assignment (window replay)
        "pack_sequences_docs": """
            WITH t AS (SELECT doc_id,
                CASE WHEN trim(text) = '' THEN 0
                     ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                END AS n_tokens
                FROM documents)
            SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
                   CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS BIGINT) AS start_offset,
                   CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) // 2048 AS BIGINT) AS chunk_id
            FROM t
        """,
        # boilerplate template mining: frequent word 5-grams with
        # document frequency (shared token-n-gram recipe)
        "frequent_templates_docs": """
            WITH tok AS (SELECT doc_id,
                    regexp_split_to_array(trim(text), '\\s+') AS ts
                FROM documents),
            g AS (SELECT doc_id,
                    unnest(list_transform(generate_series(1, len(ts)-4),
                        i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]
                             || ' ' || ts[i+3] || ' ' || ts[i+4])) AS gram
                  FROM tok WHERE len(ts) >= 5)
            SELECT gram, count(DISTINCT doc_id) AS n_docs,
                   count(*) AS n_occurrences
            FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 3
            ORDER BY n_docs DESC, gram ASC
        """,
        # cross-document duplicate 5-gram fraction: gram occurrence is
        # dup when its gram spans >= 2 distinct docs
        "dup_ngram_fraction_docs": """
            WITH tok AS (SELECT doc_id,
                    regexp_split_to_array(trim(text), '\\s+') AS ts
                FROM documents),
            g AS (SELECT doc_id,
                    unnest(list_transform(generate_series(1, len(ts)-4),
                        i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]
                             || ' ' || ts[i+3] || ' ' || ts[i+4])) AS gram
                  FROM tok WHERE len(ts) >= 5),
            nd AS (SELECT gram FROM g GROUP BY gram
                   HAVING count(DISTINCT doc_id) >= 2),
            dup AS (SELECT g.doc_id, count(*) AS n_dup FROM g
                    JOIN nd USING (gram) GROUP BY g.doc_id)
            SELECT tok.doc_id,
                   CAST(greatest(CASE WHEN trim(text) = '' THEN 0
                                      ELSE len(ts) END - 4, 0)
                        AS BIGINT) AS n_grams,
                   CAST(COALESCE(dup.n_dup, 0) AS BIGINT) AS n_dup_grams
            FROM tok JOIN documents USING (doc_id)
            LEFT JOIN dup ON tok.doc_id = dup.doc_id
        """,
        # corpus-trained bigram-LM rarity scoring: bigram counts over
        # the whole corpus, per-doc count of occurrences with corpus
        # count < 5
        "rare_bigram_docs": """
            WITH tok AS (SELECT doc_id,
                    regexp_split_to_array(trim(text), '\\s+') AS ts
                FROM documents),
            b AS (SELECT doc_id,
                    unnest(list_transform(generate_series(1, len(ts)-1),
                        i -> ts[i] || ' ' || ts[i+1])) AS bg
                  FROM tok WHERE len(ts) >= 2),
            cnt AS (SELECT bg, count(*) AS n FROM b GROUP BY bg),
            r AS (SELECT b.doc_id, count(*) FILTER (cnt.n < 5) AS n_rare,
                         count(*) AS n_bigrams
                  FROM b JOIN cnt USING (bg) GROUP BY b.doc_id)
            SELECT tok.doc_id,
                   CAST(COALESCE(r.n_bigrams, 0) AS BIGINT) AS n_bigrams,
                   CAST(COALESCE(r.n_rare, 0) AS BIGINT) AS n_rare
            FROM tok LEFT JOIN r ON tok.doc_id = r.doc_id
        """,
        # alpha=0.5 temperature mixture resampling; isqrt replayed
        # exactly via floor(sqrt)+/-1 correction, decision is pure
        # HUGEINT arithmetic so it is bit-identical to the engine
        "temperature_sample_docs": """
            WITH c AS (SELECT lang, count(*) AS n FROM documents
                       GROUP BY lang),
            s AS (SELECT lang, n,
                  CAST(floor(sqrt(CAST(n AS DOUBLE))) AS HUGEINT) AS s0
                  FROM c),
            w AS (SELECT lang, CASE
                    WHEN (s0+1)*(s0+1) <= n THEN s0+1
                    WHEN s0*s0 > n THEN s0-1 ELSE s0 END AS w FROM s),
            mx AS (SELECT max(w) AS wmax FROM w)
            SELECT d.doc_id, d.lang
            FROM documents d JOIN w USING (lang), mx
            WHERE (CAST(d.doc_id AS HUGEINT) * 2654435761) % 4294967296
                  * w.w < 2147483648 * mx.wmax
            ORDER BY doc_id
        """,
        # composed curation: exact-dedup winners -> token-count gate ->
        # deterministic per-lang k-sample (same Knuth hash as the
        # sampling oracles)
        "curate_docs": """
            WITH keepers AS (SELECT min(doc_id) AS doc_id
                             FROM documents GROUP BY text),
                 q AS (SELECT d.doc_id, d.lang,
                              len(regexp_split_to_array(trim(d.text),
                                                        '\s+')) AS n_tokens
                       FROM documents d
                       JOIN keepers k ON d.doc_id = k.doc_id),
                 f AS (SELECT * FROM q
                       WHERE n_tokens BETWEEN 10 AND 1000),
                 s AS (SELECT doc_id, lang, n_tokens, row_number() OVER (
                           PARTITION BY lang
                           ORDER BY (CAST(doc_id AS HUGEINT) * 2654435761)
                                    % 4294967296, doc_id) AS rn
                       FROM f)
            SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens
            FROM s WHERE rn <= 100 ORDER BY lang, doc_id
        """,
        # Knuth multiplicative hash sampling (deterministic, per-stratum
        # rate); HUGEINT avoids the BIGINT product overflow
        "stratified_sample_docs": """
            SELECT doc_id, lang FROM documents
            WHERE (CAST(doc_id AS HUGEINT) * 2654435761)
                  % 4294967296 % 100
                  < CASE WHEN lang = 'en' THEN 10 ELSE 30 END
            ORDER BY doc_id
        """,
        # trigram-containment decontamination vs the doc_id%97 eval split
        "decontaminate_docs": """
            WITH s AS (
                SELECT doc_id, list_distinct(list_transform(
                    generate_series(1, length(text) - 2),
                    i -> substr(text, i, 3))) AS grams
                FROM documents WHERE length(text) >= 3),
            e AS (SELECT * FROM s WHERE doc_id % 97 = 0),
            t AS (SELECT * FROM s WHERE doc_id % 97 <> 0)
            SELECT t.doc_id AS doc_id, e.doc_id AS eval_id,
                   CAST(len(list_intersect(t.grams, e.grams)) AS BIGINT)
                       AS n_shared,
                   CAST(len(t.grams) AS BIGINT) AS n_grams
            FROM t, e
            WHERE len(t.grams) > 0
              AND 100 * len(list_intersect(t.grams, e.grams))
                  >= 80 * len(t.grams)
            ORDER BY doc_id, eval_id
        """,
        "length_weighted_sample_docs": """
            SELECT doc_id, lang, n_chars FROM documents
            WHERE (CAST(doc_id AS HUGEINT) * 2654435761) % 4294967296
                  < LEAST(CAST(n_chars AS HUGEINT) * (4294967296 // 2000),
                          4294967296)
            ORDER BY doc_id
        """,
        "sample_k_per_lang": """
            SELECT doc_id, lang FROM (
                SELECT doc_id, lang, row_number() OVER (
                    PARTITION BY lang
                    ORDER BY (CAST(doc_id AS HUGEINT) * 2654435761)
                             % 4294967296, doc_id) AS rn
                FROM documents)
            WHERE rn <= 20 ORDER BY lang, doc_id
        """,
        "top_trigrams": """
            WITH grams AS (
                SELECT unnest(list_transform(
                    generate_series(1, length(text) - 2),
                    i -> substr(text, i, 3))) AS gram
                FROM documents WHERE length(text) >= 3)
            SELECT gram, count(*) AS n FROM grams
            GROUP BY gram ORDER BY n DESC, gram ASC LIMIT 100
        """,
        # Count-Min candidates -> exact rescan; output is EXACT so the
        # plain HAVING truth is the oracle
        "heavy_tokens": """
            SELECT tok, count(*) AS n
            FROM (SELECT unnest(regexp_split_to_array(trim(text), '\\s+'))
                      AS tok
                  FROM documents)
            GROUP BY tok HAVING count(*) >= 500
        """,
        "events_window_5m": """
            SELECT user_id,
                   CAST(floor(epoch(ts) / 300) AS BIGINT) AS window_id,
                   count(*) AS n_events
            FROM events GROUP BY 1, 2
        """,
        # each event belongs to the 5 one-minute-hop windows ending at
        # or after its minute cell: window w covers [w*60s, w*60s+300s)
        "events_hopping_window": """
            SELECT user_id,
                   CAST(floor(epoch(ts) / 60) - g AS BIGINT) AS window_id,
                   count(*) AS n_events
            FROM events, unnest(generate_series(0, 4)) AS t(g)
            GROUP BY 1, 2 ORDER BY user_id, window_id
        """,
        # streaming burst dedup: drop events whose same-(user, type)
        # predecessor is <= 60 s older (LAG semantics)
        "events_dedup_burst": """
            WITH x AS (
                SELECT event_id, user_id, event_type,
                       epoch_us(ts) AS ts_us,
                       lag(epoch_us(ts)) OVER (
                           PARTITION BY user_id, event_type
                           ORDER BY ts, event_id) AS prev
                FROM events)
            SELECT event_id, user_id, event_type, ts_us
            FROM x
            WHERE prev IS NULL OR ts_us - prev > 60000000
            ORDER BY event_id
        """,
        "events_sessions": """
            WITH ordered AS (
                SELECT user_id, event_id, epoch_us(ts) AS us,
                       CASE WHEN epoch_us(ts)
                                 - lag(epoch_us(ts)) OVER w > 1800000000
                            OR lag(epoch_us(ts)) OVER w IS NULL
                            THEN 1 ELSE 0 END AS new_session
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), tagged AS (
                SELECT *, sum(new_session) OVER (
                    PARTITION BY user_id ORDER BY us, event_id
                    ROWS UNBOUNDED PRECEDING) AS sid
                FROM ordered)
            SELECT user_id,
                   min(us) AS session_start_us,
                   max(us) AS session_end_us,
                   count(*) AS n_events
            FROM tagged GROUP BY user_id, sid
        """,
        "events_day_over_day": """
            SELECT day, n_events,
                   CAST(COALESCE(n_events - lag(n_events)
                                 OVER (ORDER BY day), 0) AS BIGINT)
                       AS delta
            FROM (SELECT strftime(ts, '%Y-%m-%d') AS day,
                         count(*) AS n_events
                  FROM events GROUP BY 1)
            ORDER BY day
        """,
        "events_hour_heatmap": """
            SELECT event_type, CAST(hour(ts) AS BIGINT) AS hour,
                   count(*) AS n_events
            FROM events GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "daily_conversion": """
            SELECT day,
                   CAST(count(*) FILTER (s) AS BIGINT) AS n_signup_users,
                   CAST(count(*) FILTER (p) AS BIGINT)
                       AS n_purchase_users,
                   CAST(count(*) FILTER (s AND p) AS BIGINT) AS n_both
            FROM (SELECT strftime(ts, '%Y-%m-%d') AS day, user_id,
                         bool_or(event_type = 'signup') AS s,
                         bool_or(event_type = 'purchase') AS p
                  FROM events GROUP BY 1, 2)
            GROUP BY day ORDER BY day
        """,
        "busiest_user_per_day": """
            SELECT day, user_id, n_events FROM (
                SELECT day, user_id, n_events, row_number() OVER (
                    PARTITION BY day
                    ORDER BY n_events DESC, user_id ASC) AS rn
                FROM (SELECT strftime(ts, '%Y-%m-%d') AS day, user_id,
                             count(*) AS n_events
                      FROM events GROUP BY 1, 2))
            WHERE rn = 1 ORDER BY day
        """,
        "events_per_day": """
            SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS n_events
            FROM events GROUP BY 1
        """,
        "orders_by_status": """
            SELECT o_orderstatus,
                   count(*) AS n_orders,
                   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS total_cents,
                   min(CAST(round(o_totalprice * 100) AS BIGINT)) AS min_cents,
                   max(CAST(round(o_totalprice * 100) AS BIGINT)) AS max_cents
            FROM orders GROUP BY o_orderstatus
        """,
        "keep_oldest_per_user": """
            SELECT user_id, event_id FROM (
                SELECT user_id, event_id, ts,
                       min(ts) OVER (PARTITION BY user_id) AS mn
                FROM events)
            WHERE ts = mn
        """,
        # TPC-H Q6 shape, integer-exact (cents x basis points)
        "forecast_revenue": """
            SELECT CAST(COALESCE(sum(round(l_extendedprice * 100)
                                     * round(l_discount * 100)), 0)
                        AS BIGINT) AS revenue_cents_bp,
                   count(*) AS n_lineitems
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1997-01-01'
              AND l_quantity < 24
              AND l_discount BETWEEN 0.05 AND 0.07
        """,
        "lineitem_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
                   CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                        AS BIGINT) AS sum_price_cents,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "top_spenders": """
            SELECT o_custkey,
                   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS total_cents
            FROM orders GROUP BY o_custkey
            ORDER BY total_cents DESC, o_custkey ASC LIMIT 25
        """,
        "revenue_by_nation": """
            SELECT n_name,
                   count(*) AS n_orders,
                   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS total_cents
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name ORDER BY n_name
        """,
        "region_revenue": """
            SELECT r_name,
                   count(*) AS n_orders,
                   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS total_cents
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name ORDER BY r_name
        """,
        "supplier_nation_balance": """
            SELECT n_name,
                   count(*) AS n_suppliers,
                   CAST(sum(CAST(round(s_acctbal * 100) AS BIGINT))
                        AS BIGINT) AS total_bal_cents
            FROM supplier JOIN nation ON s_nationkey = n_nationkey
            GROUP BY n_name ORDER BY n_name
        """,
        "part_brand_revenue": """
            SELECT p_brand,
                   count(*) AS n_items,
                   CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                        AS BIGINT) AS revenue_cents
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY p_brand ORDER BY p_brand
        """,
        "customers_without_orders": """
            SELECT c_custkey, c_name FROM customer
            WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                                    WHERE o_totalprice > 300000)
            ORDER BY c_custkey
        """,
        "priority_orders_semi": """
            SELECT o_orderpriority, count(*) AS n_orders
            FROM orders
            WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                                 WHERE l_quantity >= 48)
            GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
                "purchase_after_signup": """
            SELECT p.event_id AS event_id, p.user_id AS user_id,
                   s.event_id AS signup_event_id,
                   epoch_us(p.ts) - epoch_us(s.ts) AS wait_us
            FROM (SELECT * FROM events WHERE event_type = 'purchase') p
            ASOF JOIN (SELECT * FROM events WHERE event_type = 'signup') s
              ON p.user_id = s.user_id AND p.ts >= s.ts
            ORDER BY event_id
        """,
        "error_after_purchase": """
            SELECT * FROM (
                SELECT p.event_id AS event_id, p.user_id AS user_id,
                       e.event_id AS error_event_id,
                       epoch_us(e.ts) - epoch_us(p.ts) AS wait_us
                FROM (SELECT * FROM events
                      WHERE event_type = 'purchase') p
                ASOF JOIN (SELECT * FROM events
                           WHERE event_type = 'error') e
                  ON p.user_id = e.user_id AND e.ts >= p.ts)
            WHERE wait_us <= 86400000000
            ORDER BY event_id
        """,
        "purchase_day_views": """
            SELECT p.event_id AS event_id, p.user_id AS user_id,
                   strftime(p.ts, '%Y-%m-%d') AS day,
                   CAST(v.n_views AS BIGINT) AS n_views
            FROM (SELECT * FROM events WHERE event_type = 'purchase') p
            JOIN (SELECT user_id, strftime(ts, '%Y-%m-%d') AS day,
                         count(*) AS n_views
                  FROM events WHERE event_type = 'view'
                  GROUP BY 1, 2) v
              ON p.user_id = v.user_id
             AND strftime(p.ts, '%Y-%m-%d') = v.day
            ORDER BY event_id
        """,
        "views_before_purchase_1h": """
            SELECT p.event_id AS event_id, count(*) AS n_views_1h
            FROM events p JOIN events v
              ON p.user_id = v.user_id
             AND v.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts
            WHERE p.event_type = 'purchase' AND v.event_type = 'view'
            GROUP BY p.event_id ORDER BY event_id
        """,
        "cumulative_new_users": """
            WITH f AS (SELECT user_id,
                              min(strftime(ts, '%Y-%m-%d')) AS day
                       FROM events GROUP BY user_id),
                 d AS (SELECT day, count(*) AS n FROM f GROUP BY day)
            SELECT day, n AS n_new_users,
                   CAST(sum(n) OVER (ORDER BY day) AS BIGINT)
                       AS n_cum_users
            FROM d ORDER BY day
        """,
        "user_day_purchase_error_full": """
            SELECT COALESCE(p.user_id, e.user_id) AS user_id,
                   COALESCE(p.day, e.day) AS day,
                   COALESCE(p.n, 0) AS n_purchases,
                   COALESCE(e.n, 0) AS n_errors
            FROM (SELECT user_id, strftime(ts, '%Y-%m-%d') AS day,
                         count(*) AS n
                  FROM events WHERE event_type = 'purchase'
                  GROUP BY 1, 2) p
            FULL OUTER JOIN
                 (SELECT user_id, strftime(ts, '%Y-%m-%d') AS day,
                         count(*) AS n
                  FROM events WHERE event_type = 'error'
                  GROUP BY 1, 2) e
              ON p.user_id = e.user_id AND p.day = e.day
            ORDER BY user_id, day
        """,
        "cap_events_per_user_type": """
            SELECT event_id, user_id, event_type FROM (
                SELECT event_id, user_id, event_type, row_number() OVER (
                    PARTITION BY user_id, event_type
                    ORDER BY ts, event_id) AS rn
                FROM events)
            WHERE rn <= 5 ORDER BY event_id
        """,
        "user_event_pivot": """
            SELECT user_id,
                   count(*) FILTER (event_type = 'click') AS n_click,
                   count(*) FILTER (event_type = 'error') AS n_error,
                   count(*) FILTER (event_type = 'purchase') AS n_purchase,
                   count(*) FILTER (event_type = 'signup') AS n_signup,
                   count(*) FILTER (event_type = 'view') AS n_view
            FROM events GROUP BY user_id ORDER BY user_id
        """,
        "user_event_long": """
            WITH w AS (
                SELECT user_id,
                       count(*) FILTER (event_type = 'click') AS n_click,
                       count(*) FILTER (event_type = 'error') AS n_error,
                       count(*) FILTER (event_type = 'purchase')
                           AS n_purchase,
                       count(*) FILTER (event_type = 'signup') AS n_signup,
                       count(*) FILTER (event_type = 'view') AS n_view
                FROM events GROUP BY user_id)
            UNPIVOT w ON n_click, n_error, n_purchase, n_signup, n_view
            INTO NAME event_col VALUE n
            ORDER BY user_id, event_col
        """,
        "distinct_users_per_day": """
            SELECT strftime(ts, '%Y-%m-%d') AS day,
                   count(DISTINCT user_id) AS n_users
            FROM events GROUP BY day ORDER BY day
        """,
        "top3_orders_per_customer": """
            SELECT o_custkey, o_orderkey, cents, rank FROM (
                SELECT o_custkey, o_orderkey,
                       CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
                       row_number() OVER (
                           PARTITION BY o_custkey
                           ORDER BY round(o_totalprice * 100) DESC,
                                    o_orderkey ASC) AS rank
                FROM orders)
            WHERE rank <= 3 ORDER BY o_custkey, rank
        """,
        "user_cumulative_value": """
            SELECT event_id, user_id,
                   CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents
            FROM events ORDER BY event_id
        """,
        "purchase_and_error_users": """
            SELECT user_id FROM events WHERE event_type = 'purchase'
            INTERSECT
            SELECT user_id FROM events WHERE event_type = 'error'
            ORDER BY user_id
        """,
        "view_days_no_purchase": """
            SELECT user_id, strftime(ts, '%Y-%m-%d') AS day
            FROM events WHERE event_type = 'view'
            EXCEPT
            SELECT user_id, strftime(ts, '%Y-%m-%d') AS day
            FROM events WHERE event_type = 'purchase'
            ORDER BY user_id, day
        """,
        "nation_spend_rank": """
            SELECT n_name, c_custkey, total_cents, drank FROM (
                SELECT n_name, c_custkey, total_cents,
                       dense_rank() OVER (
                           PARTITION BY n_name
                           ORDER BY total_cents DESC) AS drank
                FROM (SELECT n_name, c_custkey,
                             CAST(sum(CAST(round(o_totalprice * 100)
                                           AS BIGINT)) AS BIGINT)
                                 AS total_cents
                      FROM orders
                      JOIN customer ON o_custkey = c_custkey
                      JOIN nation ON c_nationkey = n_nationkey
                      GROUP BY n_name, c_custkey))
            WHERE drank <= 10 ORDER BY n_name, drank, c_custkey
        """,
        "status_priority_rollup": """
            SELECT COALESCE(o_orderstatus, 'ALL') AS o_orderstatus,
                   COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
                   count(*) AS n_orders,
                   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS total_cents
            FROM orders
            GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
            ORDER BY o_orderstatus, o_orderpriority
        """,
        "status_priority_cube": """
            SELECT COALESCE(o_orderstatus, 'ALL') AS o_orderstatus,
                   COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
                   count(*) AS n_orders,
                   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS total_cents
            FROM orders
            GROUP BY CUBE(o_orderstatus, o_orderpriority)
            ORDER BY o_orderstatus, o_orderpriority
        """,
        "user_event_sequence": """
            SELECT user_id,
                   string_agg(substr(event_type, 1, 1), ''
                              ORDER BY ts, event_id) AS seq
            FROM events GROUP BY user_id ORDER BY user_id
        """,
        "orders_above_customer_avg": """
            SELECT o_orderkey, o_custkey, cents FROM (
                SELECT o_orderkey, o_custkey,
                       CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
                       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                            OVER (PARTITION BY o_custkey) AS BIGINT) AS s,
                       count(*) OVER (PARTITION BY o_custkey) AS n
                FROM orders)
            WHERE cents * n > s ORDER BY o_orderkey
        """,
        "order_price_median": """
            SELECT o_orderstatus,
                   CAST(2 * quantile_cont(
                       CAST(round(o_totalprice * 100) AS BIGINT), 0.5)
                        AS BIGINT) AS med2x_cents
            FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
        """,
        # rows without an extractable k are excluded BEFORE grouping on
        # both sides, so a type whose props never carry k is absent from
        # both (engine filters pre-aggregation)
        "props_k_stats": """
            SELECT event_type, count(k) AS n,
                   CAST(sum(k) AS BIGINT) AS sum_k,
                   min(k) AS min_k, max(k) AS max_k
            FROM (SELECT event_type,
                         CAST(json_extract_string(props, '$.k') AS BIGINT)
                             AS k
                  FROM events)
            WHERE k IS NOT NULL
            GROUP BY event_type ORDER BY event_type
        """,
        "priority_brand_revenue": """
            SELECT o_orderpriority, p_brand,
                   count(*) AS n_items,
                   CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                        AS BIGINT) AS revenue_cents
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN part ON l_partkey = p_partkey
            GROUP BY o_orderpriority, p_brand
            ORDER BY o_orderpriority, p_brand
        """,
        "order_price_histogram": """
            SELECT CAST(round(o_totalprice * 100) AS BIGINT) // 5000000
                       AS bin,
                   count(*) AS n_orders
            FROM orders GROUP BY bin ORDER BY bin
        """,
        "value_k_stats": """
            SELECT event_type, count(*) AS n,
                   CAST(sum(x) AS BIGINT) AS sum_x,
                   CAST(sum(y) AS BIGINT) AS sum_y,
                   CAST(sum(x * y) AS BIGINT) AS sum_xy,
                   CAST(sum(x * x) AS BIGINT) AS sum_x2,
                   CAST(sum(y * y) AS BIGINT) AS sum_y2
            FROM (SELECT event_type,
                         CAST(round(value * 100) AS BIGINT) AS x,
                         CAST(json_extract_string(props, '$.k') AS BIGINT)
                             AS y
                  FROM events)
            WHERE x IS NOT NULL AND y IS NOT NULL
            GROUP BY event_type ORDER BY event_type
        """,
        "day_retention_matrix": """
            WITH d AS (SELECT DISTINCT user_id,
                              strftime(ts, '%Y-%m-%d') AS day
                       FROM events)
            SELECT a.day AS day_a, b.day AS day_b,
                   count(*) AS n_users
            FROM d a JOIN d b
              ON a.user_id = b.user_id AND a.day < b.day
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "event_transitions": """
            SELECT prev || '>' || event_type AS transition,
                   count(*) AS n
            FROM (SELECT event_type,
                         lag(event_type) OVER (
                             PARTITION BY user_id
                             ORDER BY ts, event_id) AS prev
                  FROM events)
            WHERE prev IS NOT NULL
            GROUP BY 1 ORDER BY 1
        """,
        "user_max_event_gap": """
            SELECT user_id, count(g) AS n_gaps,
                   CAST(COALESCE(max(g), 0) AS BIGINT) AS max_gap_us
            FROM (SELECT user_id,
                         epoch_us(ts) - lag(epoch_us(ts)) OVER (
                             PARTITION BY user_id
                             ORDER BY ts, event_id) AS g
                  FROM events)
            GROUP BY user_id ORDER BY user_id
        """,
        # per-order global rank stats, integer-exact: n_less = rank()-1
        # over price cents (ties share), n_total = corpus size
        "order_price_rank_stats": """
            SELECT o_orderkey,
                   CAST(rank() OVER (ORDER BY round(o_totalprice * 100))
                        - 1 AS BIGINT) AS n_less,
                   CAST(count(*) OVER () AS BIGINT) AS n_total
            FROM orders ORDER BY o_orderkey
        """,
        "order_price_quantiles": """
            SELECT o_orderstatus,
                   CAST(unnest([25, 50, 75, 95]) AS BIGINT) AS q_pct,
                   unnest(quantile_disc(cents, [0.25, 0.5, 0.75, 0.95]))
                       AS value_cents
            FROM (SELECT o_orderstatus,
                         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
                  FROM orders)
            GROUP BY o_orderstatus ORDER BY o_orderstatus, q_pct
        """,
        "order_quartiles_ntile": """
            SELECT o_orderkey, o_orderstatus,
                   ntile(4) OVER (
                       PARTITION BY o_orderstatus
                       ORDER BY CAST(round(o_totalprice * 100) AS BIGINT),
                                o_orderkey) AS quartile
            FROM orders ORDER BY o_orderkey
        """,
        "ann_bruteforce_top10": """
            SELECT query_id, vec_id, rank FROM (
                SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
                       row_number() OVER (
                           PARTITION BY q.vec_id
                           ORDER BY list_cosine_similarity(q.embedding,
                                                           e.embedding) DESC,
                                    e.vec_id ASC) AS rank
                FROM embeddings q, embeddings e
                WHERE q.vec_id < 8)
            WHERE rank <= 10
        """,
        "embedding_neardup_pairs": """
            SELECT a.vec_id AS a_id, b.vec_id AS b_id
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.35
        """,
        # exact kNN graph: every vector's top-5 neighbors (cosine desc,
        # id asc) — the all-rows generalization of ann_bruteforce_top10
        "knn_graph_embeddings": """
            SELECT vec_id, neighbor_id, rank FROM (
                SELECT q.vec_id AS vec_id, e.vec_id AS neighbor_id,
                       row_number() OVER (
                           PARTITION BY q.vec_id
                           ORDER BY list_cosine_similarity(q.embedding,
                                                           e.embedding)
                                    DESC,
                                    e.vec_id ASC) AS rank
                FROM embeddings q, embeddings e
                WHERE q.vec_id <> e.vec_id)
            WHERE rank <= 5
        """,
        # per-node triangle counts over the undirected kNN graph (same
        # ranking CTE; wedge join closed against the edge set)
        "knn_triangles_embeddings": """
            WITH knn AS (
                SELECT vec_id, neighbor_id FROM (
                    SELECT q.vec_id AS vec_id, e.vec_id AS neighbor_id,
                           row_number() OVER (
                               PARTITION BY q.vec_id
                               ORDER BY list_cosine_similarity(
                                            q.embedding, e.embedding) DESC,
                                        e.vec_id ASC) AS rank
                    FROM embeddings q, embeddings e
                    WHERE q.vec_id <> e.vec_id)
                WHERE rank <= 5),
            und AS (
                SELECT DISTINCT least(vec_id, neighbor_id) AS a,
                                greatest(vec_id, neighbor_id) AS b
                FROM knn),
            adj AS (SELECT a AS u, b AS v FROM und
                    UNION ALL SELECT b, a FROM und),
            wedge AS (
                SELECT e1.u AS c, e1.v AS x, e2.v AS y
                FROM adj e1 JOIN adj e2
                  ON e1.u = e2.u AND e1.v < e2.v)
            SELECT w.c AS vec_id, count(*) AS n_triangles
            FROM wedge w JOIN und e ON w.x = e.a AND w.y = e.b
            GROUP BY w.c ORDER BY vec_id
        """,
        # the LSH-bucketed scale path must produce the SAME pair set as
        # the all-pairs truth (banded SRP, recall 1.0 at these scales)
        "embedding_neardup_pairs_lsh": """
            SELECT a.vec_id AS a_id, b.vec_id AS b_id
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.35
        """,
    }
    # structurally identical oracle: the bloom path must be checked
    # against EXACTLY the exact path's SQL (never allowed to drift)
    d["priority_orders_semi_bloom"] = d["priority_orders_semi"]
    return d
