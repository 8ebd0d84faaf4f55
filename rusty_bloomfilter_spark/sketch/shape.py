"""Bloom filter shape: configuration + the closed-form math.

Semantics follow the reference (`/root/reference/src/bloomfilter/mod.rs`):

- ``number_of_buckets`` = ceil(m/64)          (mod.rs:102-108)
- ``false_positives(n)`` = (1 - e^(-k*n/m))^k (mod.rs:115-120)
- ``estimate_n(c)``      = -(m/k)*ln(1 - c/m) (mod.rs:126-132)

Deliberate corrections vs the reference (documented in SURVEY.md §4):

- ``Shape.__eq__`` is a *correct* equality; the reference's
  ``equivalent_to`` (mod.rs:110-112) is inverted and never called.
- ``is_sparse`` uses the storage-parity rule the reference's comment
  *describes* (mod.rs:96-97) rather than the inverted code: a sparse
  encoding (4 bytes per set bit) wins iff ``4*bits < 8*buckets``.
- ``estimate_n(m)`` returns ``inf`` explicitly instead of ``-inf``/NaN.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

_LN2 = math.log(2.0)


@dataclass(frozen=True)
class Shape:
    """Bloom filter configuration: m bits, k hash functions."""

    m: int
    k: int

    # Upper bound on m so the vectorized K-M expansion (h1 + i*h2) mod m
    # never overflows uint64: with h2 pre-reduced (< m) and i < k <= 64,
    # i*h2 stays < 2^64 for every m below this. 2^57 bits is already a
    # 16 PiB dense filter — far past any realistic shape.
    MAX_M = 1 << 57

    def __post_init__(self) -> None:
        if self.m <= 0:
            raise ValueError(f"m must be positive, got {self.m}")
        if self.m > self.MAX_M:
            raise ValueError(
                f"m={self.m} exceeds 2^57; the K-M index expansion would "
                "overflow uint64 (and a dense filter would be >16 PiB)"
            )
        if self.k <= 0:
            raise ValueError(f"k must be positive, got {self.k}")
        if self.k > 64:
            raise ValueError(f"k must be <= 64, got {self.k}")

    # -- sizing ---------------------------------------------------------

    @classmethod
    def for_np(cls, n: int, p: float) -> "Shape":
        """Optimal shape for ``n`` expected items at false-positive rate
        ``p``: m = ceil(-n*ln(p)/(ln 2)^2), k = round((m/n)*ln 2).

        The published optimum; generalizes the closed form the reference
        pins at mod.rs:115-120.
        """
        if n <= 0:
            raise ValueError(f"n must be positive, got {n}")
        if not (0.0 < p < 1.0):
            raise ValueError(f"p must be in (0,1), got {p}")
        m = math.ceil(-n * math.log(p) / (_LN2 * _LN2))
        # clamp to the representable hash count: extreme p (< ~6e-20)
        # yields optimal k > 64; 64 hashes is the closest valid shape
        # (marginally conservative on m, never a constructor crash)
        k = min(64, max(1, round((m / n) * _LN2)))
        return cls(m=m, k=k)

    # -- physical width ---------------------------------------------------

    def number_of_buckets(self) -> int:
        """ceil(m/64): width of the dense representation in u64 words."""
        return (self.m + 63) // 64

    def number_of_bytes(self) -> int:
        return self.number_of_buckets() * 8

    # -- representation choice -------------------------------------------

    def is_sparse(self, bits: int) -> bool:
        """True iff a sparse (4-byte index per set bit) encoding is
        smaller than the dense one. Corrected rule (see module docstring).
        """
        return 4 * bits < 8 * self.number_of_buckets()

    # -- math -------------------------------------------------------------

    def false_positives(self, n: int) -> float:
        """p = (1 - e^(-k*n/m))^k — expected FPR after n inserts."""
        return math.pow(1.0 - math.exp(-self.k * n / self.m), self.k)

    def estimate_n(self, count: int) -> float:
        """n_hat = -(m/k) * ln(1 - c/m), c = popcount.

        Swamidass-Baldi estimator. Saturated filter (c == m) -> +inf.
        """
        if count < 0 or count > self.m:
            raise ValueError(f"count {count} out of range [0, {self.m}]")
        if count == self.m:
            return math.inf
        if count == 0:
            return 0.0  # avoid -0.0
        return -(self.m / self.k) * math.log(1.0 - count / self.m)

    # -- wire -------------------------------------------------------------

    def as_tuple(self) -> tuple[int, int]:
        return (self.m, self.k)
