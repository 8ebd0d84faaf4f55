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


def trimmed_stats(
    df: DataFrame,
    key_col: str,
    value_col: str,
    id_col: str,
    *,
    trim_frac: float = 0.1,
) -> DataFrame:
    """Trimmed and winsorized means per key — the robust LOCATION tier
    next to robust_group_fences' robust SPREAD: drop (trimmed) or
    clamp (winsorized) the k = floor(trim_frac·n) most extreme rows at
    EACH end before averaging. The mean a reporting pass should quote
    when the MAD fences flag a heavy tail: plain avg follows the tail,
    the median ignores magnitude entirely, the 10% trimmed mean is the
    standard compromise (and the winsorized variant keeps n constant
    for variance bookkeeping).

    Determinism: the trim is RANK-based on the total order (value, id)
    — k is an integer per key, so WHICH rows are dropped/clamped is
    engine-exact; only the final double averages round(6). One window
    pass per key (rank from both ends) + one aggregate; input is a
    per-row frame, shuffled once on the key.

    NULL values are EXCLUDED before ranking (review fix): a NULL is
    not a measurement — under Spark's NULLS-FIRST default it would
    rank most-extreme-low and winsorize into a fabricated lo_edge
    value (while mean/trimmed_mean skip it), and it would diverge
    from SQL engines' NULLS-LAST ordering. n_rows counts the ranked
    (non-NULL) rows.
    """
    from pyspark.sql import Window

    if not 0.0 <= trim_frac < 0.5:
        raise ValueError(f"trim_frac must be in [0, 0.5), got {trim_frac}")
    v = F.col(value_col).cast("double")
    w_lo = Window.partitionBy(key_col).orderBy(
        F.col(value_col).asc(), F.col(id_col).asc()
    )
    w_hi = Window.partitionBy(key_col).orderBy(
        F.col(value_col).desc(), F.col(id_col).desc()
    )
    w_all = Window.partitionBy(key_col)
    base = df.filter(F.col(value_col).isNotNull()).select(
        F.col(key_col),
        v.alias("_v"),
        F.row_number().over(w_lo).alias("_rlo"),
        F.row_number().over(w_hi).alias("_rhi"),
        F.count("*").over(w_all).alias("_n"),
    )
    k = F.floor(F.lit(float(trim_frac)) * F.col("_n")).cast("bigint")
    kept = (F.col("_rlo") > k) & (F.col("_rhi") > k)
    # winsorize: rows inside the trim bands are replaced by the nearest
    # kept value = the (k+1)-th from that end
    lo_edge = F.max(F.when(F.col("_rlo") == k + 1, F.col("_v"))).over(w_all)
    hi_edge = F.max(F.when(F.col("_rhi") == k + 1, F.col("_v"))).over(w_all)
    wins = (
        F.when(F.col("_rlo") <= k, lo_edge)
        .when(F.col("_rhi") <= k, hi_edge)
        .otherwise(F.col("_v"))
    )
    enr = base.select(F.col(key_col), "_v", "_n", kept.alias("_kept"), wins.alias("_w"))
    return enr.groupBy(key_col).agg(
        F.max("_n").cast("bigint").alias("n_rows"),
        F.sum(F.when(F.col("_kept"), 1).otherwise(0)).alias("n_kept"),
        F.round(F.avg("_v"), 6).alias("mean"),
        F.round(F.avg(F.when(F.col("_kept"), F.col("_v"))), 6).alias(
            "trimmed_mean"
        ),
        F.round(F.avg("_w"), 6).alias("winsorized_mean"),
    )
