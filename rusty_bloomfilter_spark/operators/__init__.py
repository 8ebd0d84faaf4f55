"""Distributed operators: sketch builders, tree merges, dedup,
similarity search, text analysis, checkpointing."""

from .aggregate import (
    build_by_key,
    build_sketch,
    collect_sketch_bytes,
    partition_sketches,
    tree_merge,
)
from .sketches import (
    BloomSketch,
    CmsSketch,
    HllSketch,
    KllQuantiles,
    flat_ngram_hashes,
    flatten_tokens,
)

__all__ = [
    "BloomSketch",
    "CmsSketch",
    "HllSketch",
    "KllQuantiles",
    "build_by_key",
    "build_sketch",
    "collect_sketch_bytes",
    "flat_ngram_hashes",
    "flatten_tokens",
    "partition_sketches",
    "tree_merge",
]
