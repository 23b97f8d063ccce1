"""mail_deduplicate_ray — a Ray-Data-native near-duplicate detection + clustering engine.

A from-scratch re-expression of the query/data-processing capabilities of
``kdeldycke/mail-deduplicate`` (reference read-only at /root/reference/) over
columnar Arrow tables of audio-clip + transcript pairs:

- exact dedup via canonical-metadata sha224 keys (ref: mail.py:409-439),
- near-dup via MinHash-over-shingles + LSH banding, SimHash/SRP over decoded-PCM
  spectral features, and contained-transcript detection,
- distributed connected components (min-label propagation) for cluster ids,
- per-cluster selection-strategy cascade with thresholds + greedy outlier
  eviction (ref: deduplicate.py:270-509, strategy.py),
- per-partition checkpoint/resume keyed by a config fingerprint
  (ref: cache.py:103-109, 248-263).

Everything runs as ``ray.data.Dataset`` pipelines: ``map_batches`` over
zero-copy Arrow batches, actor pools for stateful stages, explicit
groupby shuffles.  No module in this package calls ``ray.init``.
"""

from mail_deduplicate_ray.config import DedupConfig

__version__ = "0.1.0"

__all__ = ["DedupConfig", "__version__"]
