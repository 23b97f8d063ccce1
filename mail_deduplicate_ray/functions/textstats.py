"""Text-analysis kernels for large-scale training-data pipelines:
language-ID (stopword/char heuristic), quality metrics, token counting,
rolling-hash document fingerprinting.  All vectorized (pyarrow.compute /
numpy) — no per-row Python in hot paths except the tiny lang vote.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# shared with the DuckDB oracles in __ray_entry__.py — keep in sync
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "for")

_LANG_MARKERS = {
    "en": {"the", "and", "of", "is", "with", "for"},
    "de": {"der", "die", "und", "ist", "mit", "das"},
    "fr": {"le", "la", "et", "est", "avec", "les"},
    "es": {"el", "la", "y", "es", "con", "los"},
}


def token_counts(text: pa.Array) -> pa.Array:
    """Whitespace-token count per row (vectorized)."""
    return pc.list_value_length(pc.utf8_split_whitespace(
        pc.utf8_trim_whitespace(text)))


def bpe_ish_token_counts(text: pa.Array) -> pa.Array:
    """GPT-2-style pre-tokenizer regex count (a BPE-ish proxy): runs of
    letters, runs of digits, single non-space symbols."""
    return pc.count_substring_regex(
        text, r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")


def stopword_counts(text: pa.Array) -> pa.Array:
    """Count of stopword tokens per row (word-boundary regex, vectorized)."""
    pat = r"(?i)\b(?:" + "|".join(STOPWORDS) + r")\b"
    return pc.count_substring_regex(text, pat)


def punct_counts(text: pa.Array) -> pa.Array:
    return pc.count_substring_regex(text, r"[^\w\s]")


def quality_table(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-doc integer quality metrics (floats avoided so results hash
    identically across engines)."""
    t = batch[text_col]
    return (batch.append_column("n_tokens",
                                pc.cast(token_counts(t), pa.int64()))
            .append_column("n_stopwords", pc.cast(stopword_counts(t), pa.int64()))
            .append_column("n_punct", pc.cast(punct_counts(t), pa.int64())))


def lang_id(texts: list[str]) -> list[str]:
    """n-gram/stopword heuristic language-ID.  CJK codepoints -> zh; else
    the language whose marker-stopword set scores highest (ties -> en)."""
    out = []
    for t in texts:
        t = t or ""
        if any("一" <= ch <= "鿿" for ch in t[:400]):
            out.append("zh")
            continue
        toks = set(t.lower().split()[:200])
        best, best_n = "en", -1
        for lang, markers in _LANG_MARKERS.items():
            n = len(toks & markers)
            if n > best_n:
                best, best_n = lang, n
        out.append(best)
    return out


_FP_BASE = np.uint64(1099511628211)
_FP_OFFS = np.uint64(14695981039346656037)


def rolling_fingerprint(text: str, k: int = 8) -> int:
    """Document fingerprint: minimum k-byte rolling polynomial hash
    (winnowing-style bottom-1 sketch) — stable under content reordering of
    identical windows, cheap to compare across corpora."""
    data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    if len(data) == 0:
        return 0
    if len(data) < k:
        win = data[None, :]
    else:
        win = np.lib.stride_tricks.sliding_window_view(data, k)
    h = np.full(win.shape[0], _FP_OFFS, dtype=np.uint64)
    for j in range(win.shape[1]):
        h = h * _FP_BASE + win[:, j].astype(np.uint64)
    return int(h.min())
