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
    width: float,
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

    # double, not bigint: a sub-integer column (quality score in [0,1])
    # would collapse into one bigint bin and drift would be invisible;
    # fractional widths are legal (round-4 review catch)
    v = F.col(col).cast("double")
    binned = (
        df.where(v.isNotNull() & ~F.isnan(v) & F.col(group_col).isNotNull())
        .select(
            F.col(group_col).alias("g"),
            F.floor(v / F.lit(float(width))).cast("bigint").alias("bin"),
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
    width: float,
) -> float:
    """Classic two-snapshot PSI: how far ``df_new``'s distribution of
    ``col`` moved from the reference snapshot's. One column; see
    ``psi_between_multi`` for the one-scan-per-snapshot batch form the
    snapshot-diff job uses."""
    return psi_between_multi(df_ref, df_new, {col: width})[col]


def psi_between_multi(
    df_ref: DataFrame,
    df_new: DataFrame,
    widths: dict[str, float],
) -> dict[str, float]:
    """PSI(new || ref) for MANY numeric columns in ONE aggregate per
    snapshot (the repo's one-scan discipline — a per-column pass would
    re-read both snapshots k times):

        PSI_c = sum_bins (p_new - p_ref) * ln(p_new / p_ref)

    over the union of both snapshots' bin sets per column, with the
    same Laplace smoothing as ``psi_drift``. ``widths`` maps column ->
    bin width; widths may be FRACTIONAL — values are binned as
    floor(value / width) in double, so sub-integer distributions (a
    quality score in [0,1]) spread across bins instead of collapsing
    into bigint 0 (round-4 review catch). NULL and NaN values are
    excluded. Columns with no non-null values on either side score 0.

    The joined bin frame is bounded by columns x distinct bins; corpus
    rows never leave the two map-side-combinable aggregates.
    """
    if not widths:
        return {}
    for c, w in widths.items():
        if w <= 0:
            raise ValueError(f"width must be positive for {c!r}, got {w}")

    def bins(df: DataFrame, name: str) -> DataFrame:
        structs = [
            F.struct(
                F.lit(c).alias("col"),
                F.floor(F.col(c).cast("double") / F.lit(float(w)))
                .cast("bigint")
                .alias("bin"),
                F.col(c).cast("double").alias("val"),
            )
            for c, w in widths.items()
        ]
        return (
            df.select(F.explode(F.array(*structs)).alias("s"))
            .select("s.col", "s.bin", "s.val")
            .where(F.col("val").isNotNull() & ~F.isnan("val"))
            .groupBy("col", "bin")
            .agg(F.count("*").alias(name))
        )

    joined = (
        bins(df_ref, "c_ref")
        .join(bins(df_new, "c_new"), ["col", "bin"], "full_outer")
        .select(
            "col",
            F.coalesce("c_ref", F.lit(0)).alias("c_ref"),
            F.coalesce("c_new", F.lit(0)).alias("c_new"),
        )
    )
    import math
    from collections import defaultdict

    cells = defaultdict(list)
    for r in joined.collect():  # bounded by columns x bins, never rows
        cells[r["col"]].append((r["c_ref"], r["c_new"]))
    out: dict[str, float] = {}
    for c in widths:
        rows = cells.get(c, [])
        if not rows:
            out[c] = 0.0
            continue
        n_ref = sum(cr for cr, _ in rows)
        n_new = sum(cn for _, cn in rows)
        nb = len(rows)
        psi = 0.0
        for cr, cn in rows:
            p_ref = (cr + 0.5) / (n_ref + 0.5 * nb)
            p_new = (cn + 0.5) / (n_new + 0.5 * nb)
            psi += (p_new - p_ref) * math.log(p_new / p_ref)
        out[c] = psi
    return out

