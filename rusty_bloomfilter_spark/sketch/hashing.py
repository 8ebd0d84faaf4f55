"""Vectorized hashing kernels (numpy, no per-row Python).

Design split mirrors the reference: the *index-expansion algebra* is
pinned (Kirsch-Mitzenmacher double hashing, h1 + i*h2 mod m, exactly as
`/root/reference/src/bloomfilter/hasher.rs:48-70`), while the byte-level
hash that produces (h1, h2) is a free choice (the reference takes
pre-hashed pairs in ``SimpleHasher``, hasher.rs:22-25). We use a
splitmix64-style finalizer over token ids — a published, public-domain
mixer (Steele et al., "Fast splittable pseudorandom number generators").

All functions operate on whole numpy arrays; Spark callers feed Arrow
batches, so there is never a per-row Python loop.
"""

from __future__ import annotations

import numpy as np

from .shape import Shape

_U64 = np.uint64
# splitmix64 constants (public domain reference implementation).
_GOLDEN = _U64(0x9E3779B97F4A7C15)
_MIX1 = _U64(0xBF58476D1CE4E5B9)
_MIX2 = _U64(0x94D049BB133111EB)
# Distinct stream tweak for the second hash of the K-M pair.
_H2_TWEAK = _U64(0xD6E8FEB86659FD93)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer. Input/output uint64."""
    with np.errstate(over="ignore"):
        z = (x + _GOLDEN).astype(_U64, copy=False)
        z = (z ^ (z >> _U64(30))) * _MIX1
        z = (z ^ (z >> _U64(27))) * _MIX2
        return z ^ (z >> _U64(31))


def hash_pair(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """uint64 values -> (h1, h2) independent 64-bit hash streams.

    Equivalent role to the reference's pre-hashed ``SimpleHasher
    {initial, increment}`` (hasher.rs:22-36): two 64-bit hashes per item.
    """
    v = np.ascontiguousarray(values).astype(_U64, copy=False)
    h1 = splitmix64(v)
    with np.errstate(over="ignore"):
        h2 = splitmix64(v ^ _H2_TWEAK)
    return h1, h2


def tokens_to_u64(tokens: np.ndarray) -> np.ndarray:
    """int32/int64 token ids -> uint64 domain (sign-safe reinterpret)."""
    t = np.asarray(tokens)
    if t.dtype == np.uint64:
        return t
    # Widen through int64 first so negative int32 stays injective.
    return t.astype(np.int64, copy=False).view(np.uint64)


# Odd multipliers give an injective-enough positional mix for n-grams.
_NGRAM_MULS = splitmix64(np.arange(1, 17, dtype=_U64) * _U64(0x2545F4914F6CDD1D))


def ngram_hashes(tokens: np.ndarray, n: int) -> np.ndarray:
    """All length-``n`` sliding-window n-grams of a 1-D token array ->
    one uint64 hash per n-gram (vectorized; len(out) = len(tokens)-n+1).
    """
    if n < 1 or n > len(_NGRAM_MULS):
        raise ValueError(f"ngram n must be in [1,{len(_NGRAM_MULS)}], got {n}")
    t = tokens_to_u64(tokens)
    if len(t) < n:
        return np.empty(0, dtype=_U64)
    if n == 1:
        return splitmix64(t)
    # r6: accumulate shifted slices instead of materializing the
    # (L, n) sliding-window product (strided view multiply measured
    # 3-20x slower). Wrap-add is associative/commutative mod 2^64, so
    # the accumulation order change is bit-identical.
    L = len(t) - n + 1
    with np.errstate(over="ignore"):
        acc = t[0:L] * _NGRAM_MULS[0]
        for j in range(1, n):
            acc += t[j : j + L] * _NGRAM_MULS[j]
    return splitmix64(acc)


def km_indices(h1: np.ndarray, h2: np.ndarray, shape: Shape) -> np.ndarray:
    """Kirsch-Mitzenmacher expansion: idx_i = (h1 + i*h2) mod m, i<k.

    Returns an (N, k) int64 array of bit indices. Matches the reference
    expansion at hasher.rs:48-70 exactly: the reference pre-reduces
    h1 %= m, h2 %= m and accumulates with a wrapped add, which computes
    precisely (h1 + i*h2) mod m; we compute the same congruence with
    pre-reduced uint64 vector arithmetic. No overflow: Shape enforces
    m <= 2^57 and k <= 64, so after reduction i*h2r < 64*2^57 = 2^63
    (beyond that bound the product would wrap and the congruence with
    the reference's wrapped-add loop would break — measured at m=2^62).
    """
    # NOTE: modulo by a *Python int* scalar hits numpy's fast unsigned
    # remainder path; `% np.uint64(m)` is ~40x slower (measured on
    # numpy 1.26). Keep these as Python ints.
    m = int(shape.m)
    h1r = h1.astype(_U64, copy=False) % m
    h2r = h2.astype(_U64, copy=False) % m
    i = np.arange(shape.k, dtype=_U64)
    with np.errstate(over="ignore"):
        idx = (h1r[:, None] + i[None, :] * h2r[:, None]) % m
    return idx.view(np.int64)
