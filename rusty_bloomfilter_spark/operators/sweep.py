"""Distributed sweep-line: peak interval concurrency per day.

The classic "maximum concurrent sessions" analytic: given closed
intervals [s, e] (session spans, connection lifetimes, job runtimes),
find for each day the highest number of simultaneously-open intervals
and the first instant it is reached. Single-node SQL solves it with
one global running sum over +1/-1 boundary events — a sweep that does
NOT distribute: ORDER BY over all boundaries is one task.

Spark-first re-expression as a TWO-LEVEL PREFIX SUM (the classic
parallel-scan decomposition):

  1. intervals are split at day boundaries (each day's sweep then
     starts from concurrency 0 — no cross-partition carry at the day
     level, because a clamped sub-interval contributes +1 at its
     within-day start);
  2. boundary deltas aggregate per (day, t) — coincident boundaries
     collapse BEFORE any ordering, so tie order never matters;
  3. level 1: running sum within (day, hour-bucket) ordered by t —
     windows bounded by one hour's boundaries;
  4. level 2: per-bucket delta totals (24 rows/day) turn into bucket
     base offsets via a tiny per-day window; level at t = bucket base
     + within-bucket running sum;
  5. peak extraction is two-level too: argmax within each bucket
     (bounded window), then argmax over the 24 bucket winners.

Every window is bounded (one bucket's boundaries, or 24 rows per
day); no global sort, no driver data. The DuckDB oracle computes the
FLAT single-window sweep — the cross-engine hash match certifies the
decomposition is exactly a prefix sum.

All arithmetic is integer MICROSECONDS (`unix_micros` == DuckDB
``epoch_us`` on parquet timestamps — the proven cross-engine
convention; second-flooring would change gap/overlap decisions, the
event fixtures carry sub-second precision). Intervals are closed:
the -1 boundary lands at e + 1 µs.

Reference parity: sweep-line analytics extend /root/reference (a
membership library) per SURVEY §2.2's window-function category;
the two-level scan is textbook parallel prefix (Blelloch 1990).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DAY_US = 86_400_000_000
HOUR_US = 3_600_000_000


def peak_concurrency_by_day(
    intervals: DataFrame,
    start_col: str = "s",
    end_col: str = "e",
    bucket_us: int = HOUR_US,
) -> DataFrame:
    """(day, peak_concurrency, peak_at_us) per epoch-day touched by any
    interval. ``start_col``/``end_col`` are closed interval bounds in
    integer epoch-MICROSECONDS (e >= s required)."""
    iv = intervals.select(
        F.col(start_col).cast("long").alias("s"), F.col(end_col).cast("long").alias("e")
    )
    clamped = (
        iv.select(
            # integer `div`, not `/`: float division of ~1e15 micros is
            # one ulp from flipping a day-boundary quotient
            F.explode(
                F.sequence(
                    F.expr(f"s div {DAY_US}L"), F.expr(f"e div {DAY_US}L")
                )
            ).alias("d"),
            "s",
            "e",
        )
        .select(
            "d",
            F.greatest("s", F.col("d") * DAY_US).alias("cs"),
            F.least("e", (F.col("d") + 1) * DAY_US - 1).alias("ce"),
        )
    )
    bnd = clamped.select(
        "d",
        F.explode(
            F.array(
                F.struct(F.col("cs").alias("t"), F.lit(1).alias("delta")),
                F.struct((F.col("ce") + 1).alias("t"), F.lit(-1).alias("delta")),
            )
        ).alias("b"),
    ).select("d", "b.t", "b.delta")
    # coincident boundaries collapse before ordering -> tie-order-free
    lv = bnd.groupBy("d", "t").agg(F.sum("delta").alias("delta"))
    lv = lv.withColumn("h", F.expr(f"(t - d * {DAY_US}L) div {int(bucket_us)}L"))
    bucket_tot = lv.groupBy("d", "h").agg(F.sum("delta").alias("tot"))
    w_base = (
        Window.partitionBy("d").orderBy("h").rowsBetween(Window.unboundedPreceding, -1)
    )
    base = bucket_tot.withColumn("base", F.coalesce(F.sum("tot").over(w_base), F.lit(0)))
    w_run = Window.partitionBy("d", "h").orderBy("t")
    levels = (
        lv.join(base.select("d", "h", "base"), ["d", "h"])
        .withColumn("conc", F.sum("delta").over(w_run) + F.col("base"))
    )
    # two-level argmax: within bucket, then across the day's buckets
    w_hpick = Window.partitionBy("d", "h").orderBy(F.desc("conc"), "t")
    hour_winners = levels.withColumn("rn", F.row_number().over(w_hpick)).filter(
        F.col("rn") == 1
    )
    w_dpick = Window.partitionBy("d").orderBy(F.desc("conc"), "t")
    return (
        hour_winners.withColumn("rn2", F.row_number().over(w_dpick))
        .filter(F.col("rn2") == 1)
        .select(
            F.col("d").alias("day"),
            F.col("conc").cast("bigint").alias("peak_concurrency"),
            F.col("t").alias("peak_at_us"),
        )
    )
