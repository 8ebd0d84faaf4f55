"""One-scan pairwise Pearson correlation matrix.

Feature-correlation profiling for training-data curation: which numeric
signals (lengths, scores, prices, ratios) are redundant, which quality
score actually tracks which outcome. The naive route — one ``corr()``
query per pair — reads the corpus C(k,2) times; this operator computes
EVERY pair in a single aggregate pass, because a Pearson correlation is
a pure function of sufficient statistics and Spark's ``corr``/``count``
aggregates all share one scan and one map-side partial-aggregation:
k=6 columns → 15 pairs → still exactly ONE corpus read and one
|groups|-row shuffle. The wide one-row-per-group result is then
unpivoted to the long (col_x, col_y, corr, n_pairs) form client code
wants, via an inline explode — no second shuffle.

Numerics: Spark's Pearson accumulator is the Welford-style centered
form (numerically stable at large-magnitude columns), as is DuckDB's —
both follow the SQL-standard definition, so round(6) hash-matches.
NULL handling is per-pair: a row drops from pair (a,b) only when a or
b is NULL (SQL corr semantics), so ``n_pairs`` is emitted per pair.

Distributed shape at 100 TB: the shuffle carries |groups| rows of
O(k²) doubles — corpus-size-independent; skew is impossible to
manufacture (per-group state is constant-size).

Reference parity: the reference library (/root/reference/src/
bloomfilter/) has no statistical profiling; this extends the profile
family (operators/profile.py one-scan ANALYZE) with second moments.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def correlation_matrix(
    df: DataFrame,
    cols: list[str],
    key_col: str | None = None,
    min_pairs: int = 2,
) -> DataFrame:
    """All pairwise Pearson correlations of ``cols`` in one scan.

    Output: one row per (group,) ordered pair with ``col_x`` <
    ``col_y`` in the order given, ``corr`` rounded at 6, and
    ``n_pairs`` (rows where both sides were non-NULL). Pairs with
    fewer than ``min_pairs`` co-observed rows, or zero variance on
    either side (corr undefined → NULL), are dropped.
    """
    if len(cols) < 2:
        raise ValueError(f"need >= 2 columns, got {cols}")
    if len(set(cols)) != len(cols):
        raise ValueError(f"duplicate columns in {cols}")
    if min_pairs < 2:
        raise ValueError(f"min_pairs must be >= 2, got {min_pairs}")
    pairs = list(combinations(cols, 2))
    aggs = []
    for a, b in pairs:
        x, y = F.col(a).cast("double"), F.col(b).cast("double")
        both = x.isNotNull() & y.isNotNull()
        # corr() itself raises DIVIDE_BY_ZERO under Spark 4 ANSI mode
        # when either side has zero variance; the explicit
        # covar/(sx·sy) form with try_divide yields NULL there (SQL /
        # DuckDB semantics) and the identical Pearson value elsewhere
        # (the n-1 factors cancel). NULL pairing must match corr(): the
        # moments only see rows where BOTH sides are non-NULL.
        xb = F.when(both, x)
        yb = F.when(both, y)
        r = F.try_divide(
            F.covar_samp(xb, yb), F.stddev_samp(xb) * F.stddev_samp(yb)
        )
        aggs.append(F.round(r, 6).alias(f"_c__{a}__{b}"))
        aggs.append(F.count(F.when(both, F.lit(1))).alias(f"_n__{a}__{b}"))
    grouped = df.groupBy(key_col) if key_col else df.groupBy()
    wide = grouped.agg(*aggs)
    structs = [
        F.struct(
            F.lit(a).alias("col_x"),
            F.lit(b).alias("col_y"),
            F.col(f"_c__{a}__{b}").alias("corr"),
            F.col(f"_n__{a}__{b}").alias("n_pairs"),
        )
        for a, b in pairs
    ]
    keep = [F.col(key_col)] if key_col else []
    long = wide.select(*keep, F.explode(F.array(*structs)).alias("_p")).select(
        *keep,
        F.col("_p.col_x").alias("col_x"),
        F.col("_p.col_y").alias("col_y"),
        F.col("_p.corr").alias("corr"),
        F.col("_p.n_pairs").alias("n_pairs"),
    )
    return long.filter(
        F.col("corr").isNotNull() & (F.col("n_pairs") >= min_pairs)
    )
