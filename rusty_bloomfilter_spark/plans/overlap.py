"""Cross-source overlap analytics via Bloom union/intersection
estimators (reference ops: estimate_union mod.rs:48-54,
estimate_intersection mod.rs:38-40).

One keyed Bloom build (sketch rows only on the shuffle), then pairwise
estimates are O(pairs x sketch_bytes) driver-side numpy — at any data
scale the pairwise stage touches only sketch payloads, never rows.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame, SparkSession

from ..operators.sketches import BloomSketch
from ..sketch import BloomFilter, Shape


def source_overlap(
    spark: SparkSession,
    sequences: DataFrame,
    *,
    shape: Shape | None = None,
    key_col: str = "source",
) -> DataFrame:
    """-> (source_a, source_b, est_distinct_a, est_distinct_b,
    est_union, est_intersection) for every source pair."""
    shape = shape or Shape.for_np(n=1_000_000, p=1e-4)
    keyed = BloomSketch(shape).build_by_key(sequences, key_col)
    filters = {
        r["key"]: BloomFilter.from_bytes(bytes(r["payload"])) for r in keyed.collect()
    }
    rows = []
    for a, b in combinations(sorted(filters), 2):
        fa, fb = filters[a], filters[b]
        rows.append(
            (
                a,
                b,
                round(fa.estimate_n(), 2),
                round(fb.estimate_n(), 2),
                round(fa.estimate_union(fb), 2),
                round(fa.estimate_intersection(fb), 2),
            )
        )
    return spark.createDataFrame(
        rows,
        "source_a string, source_b string, est_distinct_a double, "
        "est_distinct_b double, est_union double, est_intersection double",
    )
