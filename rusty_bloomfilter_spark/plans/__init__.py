"""High-level query plans composed from the sketch operators."""

from .profile import bloom_stats_df, token_profile

__all__ = ["bloom_stats_df", "token_profile"]
