"""Pure-numpy mergeable sketch cores (no Spark dependency).

Every sketch obeys the same algebra the reference pins for its Bloom
filter (`/root/reference/src/bloomfilter/mod.rs`, merge matrices at
mod.rs:621-761): merge is associative and commutative with an empty
identity, and serialization is canonical (a pure function of content),
so distributed tree-merges are order-independent.
"""

from .bloom import BloomFilter, merge_payloads, popcount_words
from .cms import CountMinSketch
from .hashing import hash_pair, km_indices, ngram_hashes, splitmix64, tokens_to_u64
from .hll import HyperLogLog
from .kll import KLLSketch
from .shape import Shape

__all__ = [
    "BloomFilter",
    "CountMinSketch",
    "HyperLogLog",
    "KLLSketch",
    "Shape",
    "hash_pair",
    "km_indices",
    "merge_payloads",
    "ngram_hashes",
    "popcount_words",
    "splitmix64",
    "tokens_to_u64",
]
