"""Bloom build planning: the reference's Shape math as a Catalyst pass.

Before a 100-TB membership build runs, someone has to answer: how many
bits per source filter, how many hash functions, how many shards does
the routed build need so no single task holds more than its memory
budget, and what FPR should we expect at the observed cardinality?
The reference answers per filter in Rust
(/root/reference/src/bloomfilter/mod.rs:85-132 — m = ceil(-n*ln p /
(ln 2)^2), k = (m/n)*ln 2, expected p = (1 - e^(-k n/m))^k); this
module answers for EVERY group in one declarative pass, so a plan for
10^6 per-user or per-source filters is itself a distributed frame, not
a driver loop.

Two cardinality feeds:

- ``plan_from_exact``: ndv via countDistinct — the oracle-able
  companion (used by contract q_bloom_shape_plan); costs a distinct
  shuffle, fine at audit scale.
- any (group, ndv) frame, e.g. HLL estimates out of
  operators/profile.py / the SQL ``hll_agg`` — the 100-TB path: the
  fused profile scan already produced the estimate, so planning costs
  ONE aggregate over sketch rows and never re-touches the corpus.

Cross-engine determinism: the transcendental constants
(-ln(p)/(ln 2)^2 and ln 2) are folded in PYTHON and inlined as double
literals into the Catalyst expressions — the oracle SQL inlines the
same ``repr`` strings, so ceil()/round() on both engines see bitwise-
identical products and the plan integers can never drift by an ulp of
a JVM-vs-C libm log. (``expected_fpp`` still evaluates exp/pow
engine-side; it is rounded to 6 decimals per the float convention.)

Shape parity is pinned in tests/test_planning.py: the Catalyst-derived
(m, k) equals sketch.shape.Shape.for_np for every group.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_LN2 = math.log(2.0)


def bloom_build_plan(
    ndv_df: DataFrame,
    p: float,
    shard_budget_bytes: int,
    ndv_col: str = "ndv",
) -> DataFrame:
    """Append the Bloom build plan to a (group..., ndv) frame.

    Adds: ``m`` (bits), ``k`` (hashes, clamped to [1, 64] like
    Shape.for_np), ``buckets`` (u64 words), ``filter_bytes``,
    ``n_shards`` (ceil(filter_bytes / shard_budget_bytes) — the routed
    build's fan-out so one shard fits a task), ``expected_fpp``
    ((1-e^(-k n/m))^k at n = ndv, rounded 6).

    Rows with NULL or non-positive ndv are dropped (a filter for zero
    items has no shape; Shape.for_np raises on n <= 0 for the same
    reason).
    """
    if not (0.0 < p < 1.0):
        raise ValueError(f"p must be in (0,1), got {p}")
    if shard_budget_bytes <= 0:
        raise ValueError(
            f"shard_budget_bytes must be positive, got {shard_budget_bytes}"
        )

    bits_per_item = -math.log(p) / (_LN2 * _LN2)  # folded in Python libm
    n = F.col(ndv_col).cast("double")
    planned = (
        ndv_df.where(F.col(ndv_col).isNotNull() & (F.col(ndv_col) > 0))
        .withColumn("m", F.ceil(n * F.lit(bits_per_item)).cast("bigint"))
        .withColumn(
            "k",
            F.least(
                F.lit(64).cast("bigint"),
                F.greatest(
                    F.lit(1).cast("bigint"),
                    F.round((F.col("m") / n) * F.lit(_LN2), 0).cast("bigint"),
                ),
            ),
        )
        .withColumn("buckets", F.expr("(m + 63) div 64"))
        .withColumn("filter_bytes", F.col("buckets") * 8)
        .withColumn(
            "n_shards",
            F.expr(f"(filter_bytes + {int(shard_budget_bytes)} - 1) "
                   f"div {int(shard_budget_bytes)}"),
        )
        .withColumn(
            "expected_fpp",
            F.round(
                F.pow(
                    F.lit(1.0) - F.exp(-(F.col("k") * n) / F.col("m")),
                    F.col("k"),
                ),
                6,
            ),
        )
    )
    return planned


def plan_from_exact(
    df: DataFrame,
    key_col: str,
    group_col: str,
    p: float,
    shard_budget_bytes: int,
) -> DataFrame:
    """Exact-cardinality plan: one distinct-aggregate per group, then
    the Shape pass. The oracle-able companion of feeding
    ``bloom_build_plan`` HLL estimates from the profile scan."""
    ndv = (
        df.where(F.col(key_col).isNotNull() & F.col(group_col).isNotNull())
        .groupBy(group_col)
        .agg(F.countDistinct(key_col).alias("ndv"))
    )
    return bloom_build_plan(ndv, p, shard_budget_bytes)
