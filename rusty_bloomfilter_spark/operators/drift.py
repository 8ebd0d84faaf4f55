"""Population Stability Index (PSI): batch distribution-drift scoring.

The standard model-monitoring drift statistic — for each group (a
source, a snapshot, a time slice) against the whole corpus:

    PSI(g) = sum_over_bins (p_g - p_c) * ln(p_g / p_c)

computed over a fixed-width binning of a numeric column, with
Laplace-style smoothing so bins a group never hits contribute a finite
penalty instead of ln(0):

    p = (count + 0.5) / (N + 0.5 * B)      B = corpus's distinct bins

Rule-of-thumb reading (Siddiqi 2006, credit-scorecard practice, the
origin of the statistic): PSI < 0.1 stable, 0.1-0.25 moderate shift,
> 0.25 action needed. A training-data pipeline runs this per SOURCE
over sequence lengths / quality scores to catch a crawler or filter
change shifting a feed's distribution between snapshots — the batch
companion of streaming/stateful.windowed_drift (which scores token
distributions from AMS payloads); this one is EXACT and pure Catalyst.

Scale shape: the only corpus-sized work is one map-side-combinable
hash aggregate over (group, bin); everything after operates on frames
bounded by groups x bins (broadcast joins). The binned frame is
referenced three times (corpus marginals, group totals, the grid
join), so it is persisted and tied to the result per the cache
lifecycle (operators/cache.py) — without it the corpus scan would run
three times per action.

Reference parity: drift scoring is an extension beyond
/root/reference (a single-node membership library); the smoothing and
bin-set conventions are documented here and mirrored exactly by the
DuckDB oracle in contract.py (q_psi_drift).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cache import tie


def psi_drift(
    df: DataFrame,
    col: str,
    width: int,
    group_col: str,
) -> DataFrame:
    """Per-group PSI of ``col``'s fixed-width-binned distribution vs the
    whole corpus.

    -> (group_col, n_rows, n_bins, psi) — one row per group; ``psi``
    rounded to 6 decimals (cross-engine float convention), ``n_bins``
    the corpus-wide bin count every group is scored against.

    NULL values and NULL group keys are excluded (they belong to
    completeness checks — operators/validate.py — not drift).
    """
    if width <= 0:
        raise ValueError(f"width must be positive, got {width}")

    v = F.col(col).cast("bigint")
    binned = (
        df.where(v.isNotNull() & F.col(group_col).isNotNull())
        .select(
            F.col(group_col).alias("g"),
            F.floor(v / F.lit(int(width))).cast("bigint").alias("bin"),
        )
        .groupBy("g", "bin")
        .agg(F.count("*").alias("cnt"))
        .persist()
    )

    # Everything below is bounded by |groups| x |bins|.
    corpus_bins = binned.groupBy("bin").agg(F.sum("cnt").alias("c_cnt"))
    totals = corpus_bins.agg(
        F.sum("c_cnt").alias("n_tot"), F.count("*").alias("n_bins")
    )
    group_totals = binned.groupBy("g").agg(F.sum("cnt").alias("n_g"))

    grid = group_totals.crossJoin(F.broadcast(corpus_bins)).crossJoin(
        F.broadcast(totals)
    )
    joined = grid.join(binned, ["g", "bin"], "left").withColumn(
        "cnt", F.coalesce(F.col("cnt"), F.lit(0))
    )

    p_g = (F.col("cnt") + F.lit(0.5)) / (F.col("n_g") + F.lit(0.5) * F.col("n_bins"))
    p_c = (F.col("c_cnt") + F.lit(0.5)) / (
        F.col("n_tot") + F.lit(0.5) * F.col("n_bins")
    )
    term = (p_g - p_c) * F.log(p_g / p_c)

    result = (
        joined.groupBy("g", "n_g", "n_bins")
        .agg(F.round(F.sum(term), 6).alias("psi"))
        .select(
            F.col("g").alias(group_col),
            F.col("n_g").alias("n_rows"),
            F.col("n_bins").cast("bigint").alias("n_bins"),
            "psi",
        )
    )
    return tie(result, binned)


def psi_between(
    df_ref: DataFrame,
    df_new: DataFrame,
    col: str,
    width: int,
) -> float:
    """Classic two-snapshot PSI: how far ``df_new``'s distribution of
    ``col`` moved from the reference snapshot's.

        PSI = sum_bins (p_new - p_ref) * ln(p_new / p_ref)

    over the UNION of both snapshots' bin sets, with the same Laplace
    smoothing as ``psi_drift`` so one-sided bins penalize finitely.
    Returns a plain float (one number per column is the artifact a
    snapshot-comparison job reports). Two map-side-combinable
    aggregates (one per snapshot); the joined bin frame is bounded by
    the distinct-bin count.
    """
    if width <= 0:
        raise ValueError(f"width must be positive, got {width}")

    def bins(df: DataFrame, name: str) -> DataFrame:
        v = F.col(col).cast("bigint")
        return (
            df.where(v.isNotNull())
            .select(F.floor(v / F.lit(int(width))).cast("bigint").alias("bin"))
            .groupBy("bin")
            .agg(F.count("*").alias(name))
        )

    joined = (
        bins(df_ref, "c_ref")
        .join(bins(df_new, "c_new"), "bin", "full_outer")
        .select(
            F.coalesce("c_ref", F.lit(0)).alias("c_ref"),
            F.coalesce("c_new", F.lit(0)).alias("c_new"),
        )
    )
    row = joined.agg(
        F.sum("c_ref").alias("n_ref"),
        F.sum("c_new").alias("n_new"),
        F.count("*").alias("n_bins"),
        F.collect_list(F.struct("c_ref", "c_new")).alias("cells"),
    ).collect()[0]
    if not row["n_bins"]:
        return 0.0
    import math

    n_ref, n_new, nb = row["n_ref"] or 0, row["n_new"] or 0, row["n_bins"]
    psi = 0.0
    for cell in row["cells"]:  # bounded by distinct bins, never corpus rows
        p_ref = (cell["c_ref"] + 0.5) / (n_ref + 0.5 * nb)
        p_new = (cell["c_new"] + 0.5) / (n_new + 0.5 * nb)
        psi += (p_new - p_ref) * math.log(p_new / p_ref)
    return psi
