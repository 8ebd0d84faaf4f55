"""Bloom-accelerated ANTI join (NOT IN / NOT EXISTS at corpus scale).

The semi-join direction is classic (q_bloom_join_prune: drop probe
rows that can't match BEFORE the join). The anti direction exploits
the reference's zero-false-negative contract
(/root/reference/src/bloomfilter/mod.rs:199-228) the other way round:

- a probe key that tests NEGATIVE is **certainly absent** from the
  build side — the row is part of the anti-join result and BYPASSES
  the join entirely (no shuffle, no match attempt);
- only probe-positive rows — the true matches plus an FP fraction
  <= p of the rest — go through the exact LEFT ANTI join, which kills
  the false positives.

Result is provably identical to the plain anti join; the exact join's
probe-side input shrinks from |probe| to |matching| + p*|rest|. At
100 TB, "orders NOT in the revoked set", "docs NOT in the previous
snapshot", "users NOT in the opt-out list" all run the anti join over
a small filtered survivor set instead of shuffling the whole fact
table: the filter broadcasts in O(bytes) even when the build side's
ROWS are too big to broadcast-join.

NULL semantics match SQL LEFT ANTI exactly: a NULL probe key never
equals anything, so those rows are routed straight to the certain
(kept) side; NULL build keys are excluded from the filter build (they
can never match either, and the null-fill would otherwise insert a
spurious key 0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sketches import BlockedBloomSketch, broadcast_probe_udf


def bloom_anti_join(
    probe: DataFrame,
    probe_key: str,
    build: DataFrame,
    build_key: str,
    *,
    p: float = 1e-3,
    n_keys: int | None = None,
) -> DataFrame:
    """Rows of ``probe`` with NO match in ``build`` (LEFT ANTI),
    Bloom-accelerated. ``n_keys`` sizes the filter (default: one
    count() of the build side — the same cost class as the build
    itself); ``p`` bounds the fraction of non-matching rows that still
    pay for exact verification."""
    build_keys = build.select(F.col(build_key).alias("k")).where(
        F.col("k").isNotNull()
    )
    n = n_keys if n_keys is not None else build_keys.count()
    sk = BlockedBloomSketch.for_np(n=max(int(n), 1024), p=p, col="k", scalar=True)
    payload, _ = sk.build_bytes(build_keys)

    pred = broadcast_probe_udf(payload, probe.sparkSession)(F.col(probe_key))
    key_null = F.col(probe_key).isNull()
    certain = probe.filter(key_null | ~pred)  # definitely unmatched: keep
    candidates = probe.filter(~key_null & pred)  # true matches + FP <= p
    verified = candidates.join(
        build_keys.withColumnRenamed("k", "_rbf_bk").distinct(),
        candidates[probe_key] == F.col("_rbf_bk"),
        "left_anti",
    )
    return certain.unionByName(verified)
