"""Small-file compaction planning — the lakehouse maintenance pass.

A 100-TB table accretes small files (streaming commits, per-task
outputs, late partitions); every query then pays per-file open/footer
cost and the scheduler drowns in splits. Compaction rewrites many
small files into few target-sized ones. The PLAN is the interesting
part and it is metadata-sized: one row per file, never per data row.

The planner is the order-preserving streaming packer: files sorted by
their min key (then name, for determinism), group = running row count
BEFORE the file, integer-divided by the target. Properties:

- every group except possibly the last holds >= target rows, and no
  group exceeds ``target + max_single_file`` (a file is never split);
- files adjacent in KEY ORDER land in the same group, so a
  range-clustered layout keeps its zone-map pruning power after
  compaction (groups own contiguous key ranges) — the reason this
  beats best-fit bin packing, which shuffles unrelated key ranges
  together and destroys min/max locality to save a few percent of
  slack;
- the rule is a plain window cumsum — auditable, deterministic, and
  expressible in ANSI SQL, which is how the contract oracle checks it.

``parquet_file_stats`` derives the per-file manifest from the data
lake itself (input_file_name + _metadata.file_size — the user-space
analogue of an Iceberg manifest scan); ``compact_files`` executes a
plan with ONE shuffle (hash by group) and writes exactly one file per
group via partitionBy, inner-joining on the broadcast plan.

Reference parity: the reference (/root/reference, Rust) has no storage
surface; this extends the engine's layout family (operators/layout.py
range/z-order writers, operators/zonemap.py pruning) with the
maintenance half of the lifecycle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def parquet_file_stats(
    spark: SparkSession, path: str, *, key_col: str | None = None
) -> DataFrame:
    """One row per physical parquet file: (file, n_rows, file_bytes
    [, min_key, max_key]). Runs as a single scan grouped by
    input_file_name — file-cardinality output, map-side combined."""
    df = spark.read.parquet(path)
    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        F.first(F.col("_metadata.file_size")).alias("file_bytes"),
    ]
    if key_col is not None:
        aggs += [
            F.min(key_col).alias("min_key"),
            F.max(key_col).alias("max_key"),
        ]
    return df.groupBy(F.input_file_name().alias("file")).agg(*aggs)


def compaction_plan(
    stats: DataFrame,
    *,
    file_col: str,
    rows_col: str,
    target: int,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """stats + ``grp``: order-preserving streaming packer (see module
    docstring). ``rows_col`` is whatever the target is denominated in —
    row counts for row-targeted groups, ``file_bytes`` for the usual
    128 MiB-style byte targets. The window is intentionally global
    (no partitionBy): the input is the file MANIFEST, whose cardinality
    is files-not-rows; planning a 10^6-file table on one task is
    milliseconds, and a global order is exactly what locality-
    preserving packing needs. Never point this at row data."""
    if target <= 0:
        raise ValueError(f"target must be positive, got {target}")
    order_cols = list(order_cols) if order_cols else [file_col]
    w = (
        Window.orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    before = F.sum(rows_col).over(w) - F.col(rows_col)
    return stats.withColumn(
        "grp", F.floor(before / F.lit(float(target))).cast("long")
    )


def compact_files(
    spark: SparkSession,
    path: str,
    plan: DataFrame,
    *,
    out_path: str,
    file_col: str = "file",
) -> int:
    """Execute a plan: read the source files, route every row to its
    group (broadcast inner join on the file name — files absent from
    the plan are NOT copied, so a partial plan is a partial compaction
    by design), one hash shuffle on ``grp``, exactly one output file
    per group under ``grp=<k>/``. Returns the number of groups."""
    p = plan.select(
        F.col(file_col).alias("_f"), F.col("grp").alias("_grp")
    )
    df = spark.read.parquet(path).withColumn("_f", F.input_file_name())
    routed = df.join(F.broadcast(p), "_f").drop("_f")
    routed.repartition("_grp").write.partitionBy("_grp").mode(
        "overwrite"
    ).parquet(out_path)
    return plan.select("grp").distinct().count()
