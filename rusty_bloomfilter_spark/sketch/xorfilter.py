"""Xor filter — the STATIC tier of the approximate-membership family.

Graf & Lemire 2020 ("Xor Filters: Faster and Smaller Than Bloom and
Cuckoo Filters", ACM JEA); construction is the hypergraph peeling of
Botelho et al. 2007 (BDZ minimal perfect hashing), the same peeling
machinery sketch/iblt.py uses for set reconciliation.

Where it sits next to the siblings:

  * BloomFilter / BlockedBloomFilter — DYNAMIC and MERGEABLE (inserts
    any time, OR-merge); ~1.44·log2(1/p) bits/key.
  * CountingBloomFilter — DELETABLE (saturating counters).
  * XorFilter — STATIC: built ONCE from the complete key set, then
    immutable. In exchange: ~1.23·b bits/key with FPR exactly 2^-b
    (b = 16 here → 19.7 bits/key at FPR 1.5e-5, vs 23.1 bits/key for
    a Bloom filter at the same p), and membership costs exactly 3
    loads + 3 xors, independent of p.

Structure: array B of 3·c b-bit fingerprints (three segments of c).
Key x maps to one slot per segment via an INDEPENDENT per-stripe hash
(the IBLT lesson — K-M double hashing gives position patterns only
c^2 entropy and peeling then stalls; see iblt.py::_positions) plus a
b-bit fingerprint. Membership:

    fp(x) == B[h0(x)] ^ B[h1(x)] ^ B[h2(x)]

Construction peels the 3-partite hypergraph to a topological order
(vectorized in rounds: every slot of degree 1 peels its key
simultaneously), then assigns B in reverse peel order so the xor
identity holds for every inserted key — ZERO false negatives by
construction, false positives exactly at 2^-b for non-members. If
peeling stalls (hypergraph has a 2-core, probability ~O(1/c) at load
factor 1/1.23), the seed increments and the build retries — so the
result is a PURE FUNCTION of the distinct key SET (canonical bytes,
independent of input order/partitioning), even though it is not
mergeable.

NOT MERGEABLE: merge_in_place raises. The distributed composition is
one filter per file/shard (operators/pruning.py::xor_file_index) —
index rows union; payloads never merge. Rebuild, don't merge.

Reference parity: zero-false-negative membership contract per
/root/reference/src/bloomfilter/mod.rs:199-228; the static
space-optimal representation is from the public papers above (the
reference has no static variant).
"""

from __future__ import annotations

import struct

import numpy as np

from .hashing import splitmix64, tokens_to_u64

_MAGIC = b"RXOR"
# magic, version, bits, pad, c (slots per segment), seed, n_items
_HEADER = struct.Struct("<4sBBxxIIq")
_SEED_MIX = np.uint64(0x9E3779B97F4A7C15)
_STRIPE_SALTS = (
    np.uint64(0xD1B54A32D192ED03),
    np.uint64(0x8CB92BA72F3D8DD7),
    np.uint64(0xA24BAED4963EE407),
)
_FP_SALT = np.uint64(0x94D049BB133111EB)
_MAX_ATTEMPTS = 64


def _mix_seed(seed: int, salt: np.uint64) -> np.uint64:
    with np.errstate(over="ignore"):
        return splitmix64(np.uint64(seed) * _SEED_MIX ^ salt)


def _slots(keys: np.ndarray, c: int, seed: int) -> np.ndarray:
    """(n, 3) slot indices, one per segment, independent per stripe."""
    out = np.empty((keys.size, 3), dtype=np.int64)
    cc = np.uint64(c)
    with np.errstate(over="ignore"):
        for i, salt in enumerate(_STRIPE_SALTS):
            out[:, i] = (splitmix64(keys ^ _mix_seed(seed, salt)) % cc).astype(
                np.int64
            ) + i * c
    return out


def _fingerprints(keys: np.ndarray, seed: int) -> np.ndarray:
    with np.errstate(over="ignore"):
        return (splitmix64(keys ^ _mix_seed(seed, _FP_SALT)) & np.uint64(0xFFFF)).astype(
            np.uint16
        )


class XorFilter:
    """Immutable once built; query with ``contains_u64``/``contains_tokens``."""

    __slots__ = ("c", "seed", "slots_arr", "n_items")

    def __init__(self, c: int, seed: int, slots_arr: np.ndarray, n_items: int):
        if c < 1:
            raise ValueError("c must be >= 1")
        arr = np.ascontiguousarray(slots_arr, dtype=np.uint16)
        if arr.size != 3 * c:
            raise ValueError("slot array length mismatch")
        self.c = int(c)
        self.seed = int(seed)
        self.slots_arr = arr
        self.n_items = int(n_items)

    # -- construction --------------------------------------------------------

    @staticmethod
    def _capacity(n: int) -> int:
        # load factor 1/1.23 + fixed headroom so tiny sets still peel
        return max(2, int(np.ceil((1.23 * n + 32.0) / 3.0)))

    @classmethod
    def build_u64(cls, keys: np.ndarray) -> "XorFilter":
        """Build from a key batch (deduped internally). Deterministic:
        the result depends only on the distinct key SET — seeds are
        tried in fixed order until the hypergraph peels."""
        v = np.unique(np.asarray(keys).astype(np.uint64))
        c = cls._capacity(v.size)
        for seed in range(_MAX_ATTEMPTS):
            peeled = cls._peel(v, c, seed)
            if peeled is not None:
                order, pos = peeled
                return cls(c, seed, cls._assign(v, pos, order, seed, c), v.size)
        # probability ~ (O(1/c))^_MAX_ATTEMPTS — effectively unreachable;
        # fail loud rather than return a filter with false negatives
        raise ValueError(
            f"xor filter construction failed for n={v.size} after "
            f"{_MAX_ATTEMPTS} seeds"
        )

    @classmethod
    def build_tokens(cls, tokens: np.ndarray) -> "XorFilter":
        return cls.build_u64(tokens_to_u64(np.asarray(tokens)))

    @staticmethod
    def _peel(v: np.ndarray, c: int, seed: int):
        """Round-vectorized peeling: every degree-1 slot releases its key
        simultaneously. Returns (rounds of key-index arrays, (n,3) slot
        table) or None if a 2-core remains (retry with the next seed)."""
        n = v.size
        pos = _slots(v, c, seed)
        length = 3 * c
        flat = pos.ravel()
        counts = np.bincount(flat, minlength=length)
        idsum = np.zeros(length, dtype=np.int64)
        np.add.at(idsum, flat, np.repeat(np.arange(n, dtype=np.int64), 3))
        rounds: list[tuple[np.ndarray, np.ndarray]] = []
        remaining = n
        while remaining:
            single = np.flatnonzero(counts == 1)
            if single.size == 0:
                return None
            kid = idsum[single]
            # a key may own several degree-1 slots this round: peel it
            # once, at its first such slot
            uniq_kid, first = np.unique(kid, return_index=True)
            sel = single[first]
            prow = pos[uniq_kid].ravel()
            np.add.at(counts, prow, -1)
            np.add.at(idsum, prow, -np.repeat(uniq_kid, 3))
            rounds.append((uniq_kid, sel))
            remaining -= uniq_kid.size
        return rounds, pos

    @staticmethod
    def _assign(
        v: np.ndarray, pos: np.ndarray, rounds, seed: int, c: int
    ) -> np.ndarray:
        """Reverse peel order: when a key's slot is assigned, every other
        slot it touches is already final (later-peeled keys never touch
        it — its degree was 1 when peeled), so the xor identity holds
        with FINAL values. Same-round keys are independent (proved by
        the degree-1 property), so each round assigns vectorized."""
        slots_arr = np.zeros(3 * c, dtype=np.uint16)
        fps = _fingerprints(v, seed)
        for kid, sel in reversed(rounds):
            rows = pos[kid]
            val = (
                fps[kid]
                ^ slots_arr[rows[:, 0]]
                ^ slots_arr[rows[:, 1]]
                ^ slots_arr[rows[:, 2]]
            )
            # slots_arr[sel] is still 0, so the xor above is exactly the
            # other two slots ^ fingerprint
            slots_arr[sel] = val
        return slots_arr

    # -- queries -------------------------------------------------------------

    def contains_u64(self, keys: np.ndarray) -> np.ndarray:
        k = np.asarray(keys).astype(np.uint64, copy=False)
        pos = _slots(k, self.c, self.seed)
        want = _fingerprints(k, self.seed)
        got = (
            self.slots_arr[pos[:, 0]]
            ^ self.slots_arr[pos[:, 1]]
            ^ self.slots_arr[pos[:, 2]]
        )
        return want == got

    def contains_tokens(self, tokens: np.ndarray) -> np.ndarray:
        return self.contains_u64(tokens_to_u64(np.asarray(tokens)))

    @property
    def fpp(self) -> float:
        """Exact false-positive probability for non-members: 2^-16."""
        return 1.0 / 65536.0

    def size_bytes(self) -> int:
        return 6 * self.c

    # -- algebra (static: merging is a contract violation) -------------------

    def merge_in_place(self, other: "XorFilter") -> "XorFilter":
        raise ValueError(
            "XorFilter is static and cannot merge — rebuild from the "
            "union of the key sets (or keep one filter per file/shard "
            "and union the index rows, operators/pruning.py)"
        )

    def merge(self, other: "XorFilter") -> "XorFilter":
        return self.merge_in_place(other)

    # -- wire ----------------------------------------------------------------

    def to_bytes(self) -> bytes:
        """Canonical: the build is a pure function of the distinct key
        set (fixed seed order), so equal sets give equal bytes."""
        return (
            _HEADER.pack(_MAGIC, 1, 16, self.c, self.seed, self.n_items)
            + self.slots_arr.tobytes()
        )

    @classmethod
    def from_bytes(cls, data: bytes) -> "XorFilter":
        if len(data) < _HEADER.size:
            raise ValueError("not a serialized XorFilter (truncated header)")
        magic, version, bits, c, seed, n_items = _HEADER.unpack_from(data, 0)
        if magic != _MAGIC or version != 1:
            raise ValueError("not a serialized XorFilter")
        if bits != 16:
            raise ValueError(f"corrupt XorFilter payload: bits={bits}")
        if c < 1 or seed >= _MAX_ATTEMPTS:
            raise ValueError(f"corrupt XorFilter payload: c={c}, seed={seed}")
        body = memoryview(data)[_HEADER.size :]
        if len(body) != 6 * c:
            raise ValueError(
                f"corrupt XorFilter payload: {len(body)} body bytes for c={c}"
            )
        arr = np.frombuffer(body, dtype=np.uint16, count=3 * c).copy()
        return cls(c, seed, arr, n_items)

    def __eq__(self, other: object) -> bool:
        if not isinstance(other, XorFilter):
            return NotImplemented
        return (self.c, self.seed, self.n_items) == (
            other.c,
            other.seed,
            other.n_items,
        ) and bool(np.array_equal(self.slots_arr, other.slots_arr))
