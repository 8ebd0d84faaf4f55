"""Sketch-driven range layout: KLL boundaries -> clustered files.

The third sketch-driven physical-planning operator (with skew.py's
salting plans and zonemap.py/pruning.py's file skipping): compute
BALANCED range-partition boundaries from a mergeable KLL quantile
sketch, lay the data out as one range-clustered file per bucket, and
the zone-map index over that layout turns every range predicate into a
narrow file subset.

Why not ``repartitionByRange``? Spark's RangePartitioner runs a hidden
driver-side SAMPLING job per write (an extra pass over the input, with
nondeterministic reservoir samples — two runs of the same job can cut
different boundaries). The KLL path is one mergeable scan (sketch rows
only shuffle), the boundaries are a value the pipeline can persist,
audit, and REUSE across snapshots (appending tomorrow's data to
yesterday's boundaries keeps file ranges aligned so zone maps stay
narrow), and the balance guarantee is published: each bucket holds a
quantile slice of width 1/n within the KLL rank error ~O(1/k).

Correctness never depends on where the boundaries land: bucket
assignment is a pure Catalyst expression, the final read re-applies the
exact predicate, and zone pruning is zero-FN — a bad boundary can only
cost balance, not rows (tests pin both).

Reference parity: composes the library's KLL merge algebra (the same
associative/commutative contract the reference pins for Bloom merges,
/root/reference/src/bloomfilter/mod.rs:621-761) into a layout planner;
the relational layer is ours.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sketch import KLLSketch
from .aggregate import collect_sketch_bytes
from .sketches import KllQuantiles


def range_boundaries(
    df: DataFrame, col: str, n_buckets: int, *, k: int = 200, fanout: int = 16
) -> tuple[list[float], float]:
    """(boundaries, rank_error): n_buckets-1 ascending cut points at
    ranks i/n_buckets, estimated from ONE mergeable KLL scan (no
    sampling job, no row shuffle). Duplicate cut points (heavy repeated
    values) are collapsed — callers get <= n_buckets-1 boundaries and
    correspondingly fewer, still-correct buckets."""
    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    payload, _ = collect_sketch_bytes(KllQuantiles(k=k, col=col).build(df, fanout=fanout))
    sk = KLLSketch.from_bytes(payload)
    qs = [i / n_buckets for i in range(1, n_buckets)]
    cuts = [float(sk.quantile(q)) for q in qs]
    uniq: list[float] = []
    for c in cuts:
        if not uniq or c > uniq[-1]:
            uniq.append(c)
    return uniq, sk.rank_error()


def assign_buckets(
    df: DataFrame, col: str, boundaries: list[float], *, bucket_col: str = "bucket"
) -> DataFrame:
    """bucket = #(boundaries < value), pure Catalyst (a sum of
    comparisons stays inside whole-stage codegen; boundaries are plan
    literals, never a join). NULL values land in bucket 0."""
    if not boundaries:
        return df.withColumn(bucket_col, F.lit(0))
    if sorted(boundaries) != list(boundaries):
        raise ValueError("boundaries must be ascending")
    expr = reduce(
        lambda a, b: a + b,
        [(F.col(col) > F.lit(b)).cast("int") for b in boundaries],
    )
    return df.withColumn(bucket_col, F.coalesce(expr, F.lit(0)))


def write_range_layout(
    df: DataFrame,
    path: str,
    col: str,
    n_buckets: int,
    *,
    k: int = 200,
    fanout: int = 16,
) -> tuple[list[float], float]:
    """Range-cluster ``df`` by ``col`` into one parquet file per bucket
    under ``path`` (hive dirs bucket=i/). Returns (boundaries,
    rank_error) so callers can persist them and append future snapshots
    against the SAME cuts.

    repartition on the bucket id puts each bucket in exactly one task,
    so partitionBy emits exactly one file per bucket dir;
    sortWithinPartitions additionally orders rows so parquet row-group
    stats are narrow INSIDE each file (page skipping stacks under the
    zone map's file skipping)."""
    boundaries, rank_err = range_boundaries(df, col, n_buckets, k=k, fanout=fanout)
    bucketed = assign_buckets(df, col, boundaries)
    (
        bucketed.repartition(max(n_buckets, 1), F.col("bucket"))
        .sortWithinPartitions(col)
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(path)
    )
    return boundaries, rank_err
