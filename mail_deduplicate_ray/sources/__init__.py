"""Sources: readers that normalize heterogeneous clip containers into the
one ``clips`` schema (≙ the reference's mailbox-format registry,
mail_box.py:243-287 — every BoxFormat parses into the same Message shape).
"""

from mail_deduplicate_ray.sources.clips_io import (read_clips,
                                                   read_clips_parquet,
                                                   read_clips_lance,
                                                   read_clips_jsonl,
                                                   read_clips_csv,
                                                   read_parquet_clean,
                                                   check_sources,
                                                   write_clips,
                                                   write_clips_lance)

__all__ = ["read_clips", "read_clips_parquet", "read_clips_lance",
           "read_clips_jsonl", "read_clips_csv", "read_parquet_clean",
           "check_sources", "write_clips", "write_clips_lance"]
