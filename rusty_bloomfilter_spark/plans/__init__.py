"""High-level query plans composed from the sketch operators."""

from .curate import curate_corpus
from .incremental import doc_fingerprints, incremental_dedup, merge_shard_frames
from .overlap import source_overlap
from .profile import bloom_stats_df, token_profile

__all__ = [
    "bloom_stats_df",
    "curate_corpus",
    "doc_fingerprints",
    "incremental_dedup",
    "merge_shard_frames",
    "source_overlap",
    "token_profile",
]
