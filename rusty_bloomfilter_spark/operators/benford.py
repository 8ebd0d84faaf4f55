"""Benford first-digit conformity screening (Newcomb 1881, Benford
1938; audit-test form per Nigrini, "Benford's Law", Wiley 2012).

Naturally-generated positive quantities spanning several orders of
magnitude (amounts, populations, file sizes) have first significant
digits distributed as P(d) = log10(1 + 1/d); fabricated, defaulted, or
truncated data usually doesn't. This operator scores each group of a
table against that law — the classic data-quality screen for "did this
source invent its numbers" — emitting the chi-square statistic and
Nigrini's Mean Absolute Deviation with his published conformity bands.

Cross-engine exactness (what makes the contract query hash-match):

- The first digit comes from the STRING of a positive BIGINT
  (``substr(cast(v as varchar), 1, 1)``) — bitwise identical on every
  engine, no ``log10``/``pow`` boundary flips at powers of ten. Callers
  scale decimals to integers first (exact for DECIMAL(38,s) × 10^s).
- The nine Benford probabilities are folded in PYTHON and inlined as
  shortest-round-trip double literals on both engines (the
  operators/planning.py convention), so neither engine's libm is in
  the loop.
- Missing digits need no fill join: a zero-observation digit
  contributes exactly n·p_d to chi² and p_d to the MAD sum, so
  chi² = n + Σ_observed((obs−np)²/(np) − np) and
  MAD = (1 + Σ_observed(|obs/n − p| − p)) / 9 — algebraically identical
  to the filled form, one fewer shuffle, same formula in the oracle.

Distributed shape: one map-side-combinable corpus aggregate to
(key, digit) counts — ≤ 9·|keys| rows shuffle regardless of input size
— then a |keys|-scale re-aggregate. No joins, no windows over corpus
rows; the plan at 100 TB is a scan plus two tiny exchanges.

Reference parity: the reference library (/root/reference/src/
bloomfilter/) has no statistical-audit operators; this extends the
validation family (operators/validate.py) with a distributional check.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# log10(1 + 1/d) for d = 1..9, folded here so no engine's libm decides
# a hash. Shortest-round-trip reprs parse to identical doubles in both
# Spark (Java literal) and DuckDB (SQL literal).
BENFORD_P = {d: math.log10(1.0 + 1.0 / d) for d in range(1, 10)}

# Nigrini 2012 conformity bands on MAD (first-digit test):
#   <= 0.006 close, <= 0.012 acceptable, <= 0.015 marginal, else none.
MAD_MARGINAL = 0.015


def benford_first_digit(value_col: str):
    """First significant digit of a positive integer column, as int."""
    return F.substring(F.col(value_col).cast("string"), 1, 1).cast("int")


def benford_profile(
    df: DataFrame,
    key_col: str,
    value_col: str,
    min_n: int = 100,
) -> DataFrame:
    """Benford conformity per key over a positive-integer value column.

    Rows with NULL or non-positive values are excluded (Benford's law
    is about significant digits of positive magnitudes). Keys with
    fewer than ``min_n`` surviving rows are dropped — the chi-square
    approximation and Nigrini's bands are meaningless at tiny n.

    Output per key: ``n_values``, ``chi2`` (8 df), ``mad``
    (round(6) both), and ``conforms`` = mad <= 0.015.
    """
    if min_n < 1:
        raise ValueError(f"min_n must be >= 1, got {min_n}")
    digit = benford_first_digit(value_col)
    counts = (
        df.filter(F.col(value_col).isNotNull() & (F.col(value_col) > 0))
        .select(F.col(key_col), digit.alias("_d"))
        .groupBy(key_col, "_d")
        .agg(F.count("*").alias("_obs"))
    )
    # p_d as an inlined-literal CASE over the nine digits
    expr = None
    for d in range(1, 10):
        lit = F.lit(BENFORD_P[d])
        expr = F.when(F.col("_d") == d, lit) if expr is None else expr.when(
            F.col("_d") == d, lit
        )
    p = expr.otherwise(F.lit(0.0))
    w_n = F.sum("_obs").over(Window.partitionBy(key_col))
    scored = counts.withColumn("_n", w_n).withColumn("_p", p)
    np_ = F.col("_n").cast("double") * F.col("_p")
    obs = F.col("_obs").cast("double")
    chi_term = (obs - np_) * (obs - np_) / np_ - np_
    mad_term = F.abs(obs / F.col("_n").cast("double") - F.col("_p")) - F.col("_p")
    out = (
        scored.groupBy(key_col)
        .agg(
            F.max("_n").alias("n_values"),
            F.round(F.max("_n").cast("double") + F.sum(chi_term), 6).alias("chi2"),
            F.round((F.lit(1.0) + F.sum(mad_term)) / F.lit(9.0), 6).alias("mad"),
        )
        .filter(F.col("n_values") >= min_n)
        .withColumn("conforms", F.col("mad") <= F.lit(MAD_MARGINAL))
    )
    return out
