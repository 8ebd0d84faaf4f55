"""Robust per-group outlier detection: median + MAD, not mean + stddev.

Mean/stddev outlier rules are circular — the outliers you're hunting
inflate the very stddev that is supposed to expose them (one 10^6x
bad sensor reading can hide every other anomaly in its group). The
median and the MAD (median absolute deviation) have a 50% breakdown
point: up to half the group can be garbage before the fence moves.
``1.4826 * MAD`` estimates sigma under normality (1/Phi^-1(3/4)), so
``k`` keeps its familiar z-score meaning.

Execution shape — three passes, each a map-side-partial aggregate of
(key, double) rows, and that's inherent, not laziness: the deviations
don't exist until the median does, and the fence doesn't exist until
the MAD does. Every inter-pass join BROADCASTS the tiny per-group
frame (group cardinality, not row cardinality), so no pass shuffles
anything but the aggregation itself.

Exact vs at-scale: ``approx_rel_err=None`` (default) uses Spark's
exact ``percentile`` aggregate — buffer memory grows with DISTINCT
values per group, fine for bounded-precision metrics, and required for
DuckDB oracle parity. At 100 TB with high-cardinality doubles pass
``approx_rel_err`` (e.g. 1e-4) to switch both medians to
``percentile_approx`` (GK sketch, bounded memory per group, mergeable
partial aggregation) — same plan shape, rank error at most rel_err.

Reference parity: the reference (/root/reference, Rust) has no
statistics surface; this is data-quality breadth for the engine,
sharing the t-digest/KLL family's "quantiles are the scale-safe
summary" design (sketch/tdigest.py, sketch/kll.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 1 / Phi^-1(0.75): scales MAD to a consistent sigma estimate under
# normality, so k=3 means "3 robust sigmas" like a z-score rule.
MAD_SIGMA = 1.4826


def _median(col: str, approx_rel_err: float | None) -> F.Column:
    if approx_rel_err is None:
        return F.expr(f"percentile({col}, 0.5)")
    acc = max(int(1.0 / approx_rel_err), 1)
    return F.expr(f"percentile_approx({col}, 0.5, {acc})")


def robust_group_fences(
    df: DataFrame,
    *,
    value_col: str,
    key_col: str,
    k: float = 3.0,
    approx_rel_err: float | None = None,
) -> DataFrame:
    """Per-group (key, n, med, mad, lo, hi): the robust fence is
    ``med +/- k * 1.4826 * mad``. Two aggregation passes."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    v, g = F.col(value_col), F.col(key_col)

    meds = df.groupBy(g.alias("_g")).agg(
        F.count(value_col).alias("n"),
        _median(value_col, approx_rel_err).alias("med"),
    )
    dev = df.join(F.broadcast(meds), g == F.col("_g")).withColumn(
        "_adev", F.abs(v - F.col("med"))
    )
    half = F.lit(float(k) * MAD_SIGMA)
    return (
        dev.groupBy(F.col("_g").alias(key_col))
        .agg(
            F.first("n").alias("n"),
            F.first("med").alias("med"),
            _median("_adev", approx_rel_err).alias("mad"),
        )
        .select(
            key_col,
            "n",
            "med",
            "mad",
            (F.col("med") - half * F.col("mad")).alias("lo"),
            (F.col("med") + half * F.col("mad")).alias("hi"),
        )
    )


def flag_outliers(
    df: DataFrame,
    *,
    value_col: str,
    key_col: str,
    k: float = 3.0,
    approx_rel_err: float | None = None,
) -> DataFrame:
    """Row-level variant: the input plus the group fence columns and
    ``is_outlier`` — the frame a curation pipeline filters on. NULL
    values are never outliers (both comparisons yield NULL -> false)."""
    fences = robust_group_fences(
        df,
        value_col=value_col,
        key_col=key_col,
        k=k,
        approx_rel_err=approx_rel_err,
    ).select(F.col(key_col).alias("_gs"), "med", "mad", "lo", "hi")
    v = F.col(value_col)
    return (
        df.join(F.broadcast(fences), F.col(key_col) == F.col("_gs"))
        .withColumn(
            "is_outlier",
            F.coalesce((v < F.col("lo")) | (v > F.col("hi")), F.lit(False)),
        )
        .drop("_gs")
    )


def robust_group_stats(
    df: DataFrame,
    *,
    value_col: str,
    key_col: str,
    k: float = 3.0,
    approx_rel_err: float | None = None,
) -> DataFrame:
    """Per-group summary with the outlier tally: (key, n, med, mad,
    lo, hi, n_outliers). Third pass over the rows (counting against a
    fence that only exists after pass 2), broadcast-joined like the
    others."""
    fences = robust_group_fences(
        df,
        value_col=value_col,
        key_col=key_col,
        k=k,
        approx_rel_err=approx_rel_err,
    )
    v = F.col(value_col)
    return (
        df.join(
            F.broadcast(fences.withColumnRenamed(key_col, "_gf")),
            F.col(key_col) == F.col("_gf"),
        )
        .groupBy(F.col("_gf").alias(key_col))
        .agg(
            F.first("n").alias("n"),
            F.first("med").alias("med"),
            F.first("mad").alias("mad"),
            F.first("lo").alias("lo"),
            F.first("hi").alias("hi"),
            F.sum(((v < F.col("lo")) | (v > F.col("hi"))).cast("long")).alias(
                "n_outliers"
            ),
        )
    )
