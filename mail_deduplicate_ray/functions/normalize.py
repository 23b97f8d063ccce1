"""Vectorized normalizers (pyarrow.compute kernels over whole columns).

Re-express the reference's per-header normalization family
(ref: mail.py:506-619) as Arrow-column kernels:

- M2 ``normalize_subject``  -> :func:`strip_leading_markers` (same regex shape)
- M3 ``normalize_content_type`` -> :func:`normalize_codec`
- M11 whitespace-stripped body hash input -> :func:`squash_whitespace`
- M1 whitespace collapse -> :func:`collapse_whitespace`

All take and return ``pyarrow.Array/ChunkedArray`` of strings.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# ref: mail.py:546 — r"(?i)^(?:(?:re|fwd?): +|\[\w[\w_-]*\w?\] +)+" ; generalized
# to transcript filler/list markers.
_LEADING_MARKERS = r"(?i)^(?:(?:re|fwd?): +|\[\w[\w_-]*\w?\] +|(?:um|uh|erm) +)+"


def strip_leading_markers(arr: pa.Array) -> pa.Array:
    return pc.replace_substring_regex(arr, _LEADING_MARKERS, "")


def collapse_whitespace(arr: pa.Array) -> pa.Array:
    """Collapse whitespace runs to single spaces + trim (ref: mail.py:526)."""
    return pc.utf8_trim_whitespace(pc.replace_substring_regex(arr, r"\s+", " "))


def squash_whitespace(arr: pa.Array) -> pa.Array:
    """Remove ALL whitespace (ref: mail.py:436 ``re.sub(r"\\s", "", line)``)."""
    return pc.replace_substring_regex(arr, r"\s", "")


def normalize_transcript(arr: pa.Array) -> pa.Array:
    """Canonical transcript for shingling: lower + markers stripped + ws-collapsed."""
    return collapse_whitespace(strip_leading_markers(pc.utf8_lower(arr)))


def normalize_codec(arr: pa.Array) -> pa.Array:
    """Keep only the codec type, drop parameters (ref: mail.py:548-565
    ``re.sub(";.*", "", ...)`` on Content-Type)."""
    return pc.utf8_trim_whitespace(
        pc.utf8_lower(pc.replace_substring_regex(arr, r";.*$", ""))
    )


def normalize_date(ts: pa.Array) -> pa.Array:
    """Timestamp -> UTC 'YYYY-MM-DD' string (ref: mail.py:567-576
    normalize_date — Date header parsed then truncated to a UTC day)."""
    return pc.strftime(ts, format="%Y-%m-%d")


def dur_bucket(dur_ms: pa.Array, width_ms: int) -> pa.Array:
    """Quantize duration so jittered re-encodes share the metadata key."""
    import pyarrow.compute as pc  # local alias for clarity
    return pc.cast(
        pc.floor(pc.divide(pc.cast(dur_ms, pa.float64()), float(width_ms))),
        pa.int64(),
    )
