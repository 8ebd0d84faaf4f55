"""Exact cross-snapshot set reconciliation via IBLT difference.

The operator the estimate family builds toward: q_source_overlap_*
says HOW MUCH two snapshots share, incremental dedup flags NEW keys
against a persisted filter — this recovers the EXACT two-sided
symmetric difference (keys only in A, keys only in B) from two
difference-sized sketches, without ever shipping either key set.

Protocol (Eppstein et al. 2011, sketch/iblt.py):

  1. each snapshot folds its DISTINCT keys into an IBLT — one
     map-side partition build + tree merge (the standard sketch
     pipeline: only payload rows shuffle, canonical bytes);
  2. subtract: shared keys cancel cell-wise, leaving the sketch OF the
     difference;
  3. peel the ~O(d)-sized result back into the actual keys.

At 100 TB: two corpus scans (one per snapshot — each column-pruned to
the key), payload traffic O(max_diff) regardless of corpus size. The
classic alternative — a full-outer anti join — shuffles BOTH key sets;
this shuffles neither. Decode failure (difference larger than the
table was sized for) raises, never silently truncates; size
``max_diff`` from a KMV/HLL difference estimate when unknown
(q_kmv_overlap gives exactly that feed).

Reference parity: merge algebra axioms and K-M double hashing as the
reference Bloom core (mod.rs:621-761, hasher.rs:48-70); the
invertible extension follows the public IBLT papers.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from ..sketch import merge_sketch_payloads
from ..sketch.iblt import IBLT
from .aggregate import build_sketch
from .sketches import _scalar_values


def build_keyset_iblt(
    df: DataFrame, key_col: str, *, max_diff: int, k: int = 4
) -> DataFrame:
    """One (payload, n_items) row: the IBLT of the DISTINCT values of
    ``key_col`` (set semantics — the sketch XOR-cancels repeats, so the
    distinct() is load-bearing, not an optimization)."""
    keys = df.select(F.col(key_col).alias("key")).filter(F.col("key").isNotNull()).distinct()

    def update(acc: IBLT, batch) -> None:
        acc.add_u64(_scalar_values(batch, "key").astype(np.uint64))

    return build_sketch(
        keys, lambda: IBLT.for_diff(max_diff, k), update, merge_sketch_payloads,
        columns=["key"],
    )


def set_reconcile(
    snap_a: DataFrame,
    snap_b: DataFrame,
    key_col: str,
    *,
    max_diff: int,
    k: int = 4,
) -> DataFrame:
    """-> (key, side): every key in exactly one snapshot, side in
    {'only_a', 'only_b'}. Exact whenever the true difference fits
    ``max_diff``; raises ValueError on decode failure (undersized
    table), never a silently-partial answer."""
    spark = snap_a.sparkSession
    pa_ = build_keyset_iblt(snap_a, key_col, max_diff=max_diff, k=k).collect()[0]
    pb_ = build_keyset_iblt(snap_b, key_col, max_diff=max_diff, k=k).collect()[0]
    diff = IBLT.from_bytes(pa_["payload"]).subtract(IBLT.from_bytes(pb_["payload"]))
    only_a, only_b, complete = diff.peel()
    if not complete:
        raise ValueError(
            f"IBLT decode incomplete: difference exceeds max_diff={max_diff} "
            f"(recovered {only_a.size + only_b.size} keys before stalling) — "
            "rebuild with a larger bound (e.g. from a KMV difference estimate)"
        )
    rows = [(int(np.int64(x)), "only_a") for x in only_a] + [
        (int(np.int64(x)), "only_b") for x in only_b
    ]
    schema = StructType(
        [StructField("key", LongType()), StructField("side", StringType())]
    )
    return spark.createDataFrame(rows, schema)
