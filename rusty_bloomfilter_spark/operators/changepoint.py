"""CUSUM changepoint detection over keyed ordered series (Page 1954,
"Continuous Inspection Schemes", Biometrika 41; offline argmax form per
Hinkley 1971).

For a series x_1..x_n the cumulative deviation from the global mean is

    S_i = sum_{j<=i} x_j  -  i * mean(x)

and the most likely single mean-shift point is ``argmax_i |S_i|``.
With INTEGER-valued series (counts) we compute the n-scaled statistic

    G_i = n * S_i = n * prefix_i - i * total

entirely in BIGINT — no float mean, no rounding, bitwise-identical
across engines, which is what makes the contract query hash-matchable.
Overflow bound: |G_i| <= n * total; a 10-year daily series (n=3650) of
1e12-count days stays under 2^62.

Distributed shape: two window passes over the SAME partitioning key
(one hash Exchange total — the ordered prefix sum and the per-key
aggregates share it, and the final argmax row_number reuses it too);
no collect, no self-join. At 100 TB the state per key is O(1) beyond
the sort, and a skewed key holds one series, not a cross product.

Reference parity: the reference library (/root/reference/src/
bloomfilter/) has no time-series operators; this extends the engine's
drift family (operators/drift.py PSI, streaming/stateful.py windowed
drift) with an exact, point-in-time localization of WHEN a monitored
count series shifted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def cusum_changepoint(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
) -> DataFrame:
    """Most-likely mean-shift point per key.

    Input: one row per (key, order) with an integer ``value_col``.
    Output per key:

    - ``cp_at``: the order value at the argmax (earliest on ties)
    - ``cp_index`` / ``n_points``: 1-based position and series length
    - ``g_scaled``: n * S_i at the argmax, signed BIGINT (positive =
      the series ran ABOVE its mean before the break, i.e. a drop)
    - ``g_abs``: |g_scaled| — the break strength, comparable across
      keys of equal length and scale
    - ``mean_before`` / ``mean_after``: exact-ratio means of the two
      segments, rounded at 6 (identical formulation on both engines)
    """
    w_ord = (
        Window.partitionBy(key_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(key_col)
    v = F.col(value_col).cast("long")
    cur = (
        df.select(key_col, order_col, v.alias("_v"))
        .withColumn("_i", F.row_number().over(Window.partitionBy(key_col).orderBy(order_col)))
        .withColumn("_prefix", F.sum("_v").over(w_ord))
        .withColumn("_n", F.count("*").over(w_all))
        .withColumn("_total", F.sum("_v").over(w_all))
        .withColumn(
            "g_scaled", F.col("_n") * F.col("_prefix") - F.col("_i") * F.col("_total")
        )
    )
    pick = Window.partitionBy(key_col).orderBy(
        F.abs(F.col("g_scaled")).desc(), F.col(order_col).asc()
    )
    return (
        cur.withColumn("_rk", F.row_number().over(pick))
        .filter(F.col("_rk") == 1)
        .select(
            F.col(key_col),
            F.col(order_col).alias("cp_at"),
            F.col("_i").cast("long").alias("cp_index"),
            F.col("_n").alias("n_points"),
            F.col("g_scaled"),
            F.abs(F.col("g_scaled")).alias("g_abs"),
            F.round(F.col("_prefix").cast("double") / F.col("_i"), 6).alias("mean_before"),
            F.when(F.col("_n") > F.col("_i"),
                   F.round(
                       (F.col("_total") - F.col("_prefix")).cast("double")
                       / (F.col("_n") - F.col("_i")),
                       6,
                   ))
            .otherwise(F.lit(0.0))
            .alias("mean_after"),
        )
    )
