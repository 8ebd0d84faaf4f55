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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .cache import tie


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


def rank_sum_pairs(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Mann-Whitney U / Wilcoxon rank-sum test for every pair of groups.

    The TWO-sample companion of the one-sample KS audit
    (operators/gof.py): "do these two slices draw their values from
    the same distribution?" without binning (PSI) or normality
    assumptions (a t-test). Emits per (group_a < group_b):

        n_a, n_b, u_a  — the exact U statistic (from average ranks;
                         ties get the standard midrank)
        z              — normal approximation with the exact tie
                         correction sigma^2 = n_a n_b / 12 *
                         ((N+1) - sum(t^3 - t) / (N (N-1)))
        same_dist      — |z| <= 1.96 (5% two-sided)

    Cross-engine exactness: midranks are rank() + (tie_count - 1)/2 —
    rank() assigns the tie group's MIN rank in both engines, so the
    midrank is a deterministic function of the value multiset; U and
    the tie term are sums of those exact halves (doubles hold .5
    exactly), and z is one double expression, rounded to 6 dp.

    Scale shape: each group joins into its (|G| choose 2) pairs —
    groups are event types / feeds, a bounded set — and ranking is a
    per-pair window sort; the output is pair-count rows. At extreme
    per-pair volume, pre-aggregate to (pair, value, multiplicity) and
    rank distinct values instead.
    """
    ev = df.select(
        F.col(group_col).alias("g"), F.col(value_col).cast("double").alias("v")
    ).filter(F.col("v").isNotNull())
    types = ev.select("g").distinct()
    pairs = (
        types.alias("a")
        .join(types.alias("b"), F.col("a.g") < F.col("b.g"))
        .select(F.col("a.g").alias("ga"), F.col("b.g").alias("gb"))
    )
    expanded = ev.join(
        F.broadcast(pairs), (F.col("g") == F.col("ga")) | (F.col("g") == F.col("gb"))
    )
    w_rank = Window.partitionBy("ga", "gb").orderBy("v")
    w_tie = Window.partitionBy("ga", "gb", "v")
    ranked = expanded.select(
        "ga",
        "gb",
        "g",
        "v",
        (
            F.rank().over(w_rank).cast("double")
            + (F.count("*").over(w_tie) - 1).cast("double") / 2.0
        ).alias("midrank"),
        F.count("*").over(w_tie).alias("tie_n"),
    )
    agg = ranked.groupBy("ga", "gb").agg(
        F.sum(F.when(F.col("g") == F.col("ga"), 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("g") == F.col("gb"), 1).otherwise(0)).alias("n_b"),
        F.sum(
            F.when(F.col("g") == F.col("ga"), F.col("midrank")).otherwise(0.0)
        ).alias("r_a"),
        # each tie group of size t contributes t rows of (t^3 - t)/t = t^2 - 1
        F.sum(
            F.col("tie_n").cast("double") * F.col("tie_n") - 1.0
        ).alias("tie_term"),
    )
    n = (F.col("n_a") + F.col("n_b")).cast("double")
    u_a = F.col("r_a") - F.col("n_a").cast("double") * (F.col("n_a") + 1) / 2.0
    mu = F.col("n_a").cast("double") * F.col("n_b") / 2.0
    sigma2 = (
        F.col("n_a").cast("double")
        * F.col("n_b")
        / 12.0
        * ((n + 1.0) - F.col("tie_term") / (n * (n - 1.0)))
    )
    z = (u_a - mu) / F.sqrt(sigma2)
    return agg.select(
        F.col("ga").alias("group_a"),
        F.col("gb").alias("group_b"),
        "n_a",
        "n_b",
        F.round(u_a, 6).alias("u_a"),
        F.round(z, 6).alias("z"),
        (F.abs(F.round(z, 6)) <= 1.96).alias("same_dist"),
    )


def chi2_independence(
    df: DataFrame,
    col_a: str,
    col_b: str,
) -> DataFrame:
    """Pearson chi-square test of independence between two categorical
    columns, plus Cramér's V effect size — "is language independent of
    the source feed", the categorical counterpart of the numeric
    two-sample tests (rank-sum) and shape tests (KS, Benford).

    Zero cells are folded ANALYTICALLY (the benford.py identity):
    with e_ij = r_i * c_j / N,

        chi2 = sum_all (o - e)^2 / e  =  N * sum_OBSERVED o^2/(r_i c_j) - N

    so the aggregate touches only observed (a, b) cells — no R x C
    grid join, no zero-fill. Cramér's V = sqrt(chi2 / (N * (min(R,C)
    - 1))); dof = (R-1)(C-1).

    Cross-engine exactness: counts and marginals are exact BIGINTs;
    o^2/(r*c) is one double division per observed cell summed over a
    small frame, and the closing expressions are single double ops —
    6 dp. One corpus-sized (a, b) aggregate; marginals derive from it
    (persisted + tied, three consumers); output is ONE row.
    """
    cells = (
        df.select(F.col(col_a).alias("a"), F.col(col_b).alias("b"))
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
        .groupBy("a", "b")
        .agg(F.count("*").alias("o"))
        .persist()
    )
    ra = cells.groupBy("a").agg(F.sum("o").cast("bigint").alias("r"))
    cb = cells.groupBy("b").agg(F.sum("o").cast("bigint").alias("c"))
    n_row = cells.agg(
        F.sum("o").cast("bigint").alias("n"),
        F.count("*").alias("observed_cells"),
    )
    term = (
        F.col("o").cast("double")
        * F.col("o")
        / (F.col("r").cast("double") * F.col("c"))
    )
    folded = (
        cells.join(F.broadcast(ra), "a")
        .join(F.broadcast(cb), "b")
        .agg(F.sum(term).alias("s"))
    )
    levels = ra.agg(F.count("*").alias("r_levels")).crossJoin(
        cb.agg(F.count("*").alias("c_levels"))
    )
    chi2 = F.col("n").cast("double") * F.col("s") - F.col("n")
    min_rc = F.least("r_levels", "c_levels").cast("double")
    out = (
        folded.crossJoin(F.broadcast(n_row))
        .crossJoin(F.broadcast(levels))
        .select(
            "n",
            "r_levels",
            "c_levels",
            "observed_cells",
            ((F.col("r_levels") - 1) * (F.col("c_levels") - 1)).alias("dof"),
            F.round(chi2, 6).alias("chi2"),
            F.round(
                F.sqrt(
                    F.greatest(chi2, F.lit(0.0))
                    / (F.col("n").cast("double") * (min_rc - 1.0))
                ),
                6,
            ).alias("cramers_v"),
        )
    )
    return tie(out, cells)
