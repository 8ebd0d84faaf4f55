"""Distinct-novelty curves: how many NEVER-BEFORE-SEEN keys does each
successive period (crawl snapshot, day, dump) contribute?

Exact recounting is O(periods x corpus): "distinct users through day
i" re-scans everything before day i, per day. The sketch form is one
corpus scan: build one HLL per period (keyed build, map-side combine),
then prefix-merge the <=|periods| sketch ROWS in period order —
est_new(i) = est(S_1 ∪ … ∪ S_i) − est(S_1 ∪ … ∪ S_{i-1}). HLL union
is register-max, so the prefix states are exactly the sketches of the
true prefix unions (no compounding beyond the single-sketch bound).

Scale shape: the corpus never shuffles — only (period, payload)
sketch rows do (one per period per task before combine). The prefix
pass runs on one task over |periods| rows, which is the output size
anyway; nothing row-scale ever concentrates.

Reference scope: composition of the reference's merge algebra
(mod.rs:621-761 — associative/commutative union) into running prefix
states; no analogous surface exists in /root/reference.
"""
from __future__ import annotations

from typing import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sketch import HyperLogLog

__all__ = ["novelty_curve"]


def novelty_curve(
    df: DataFrame,
    period_col: str,
    key_col: str,
    p: int = 14,
) -> DataFrame:
    """-> (period, est_period, est_cumulative, est_new) per period.

    ``est_period`` is the period's own distinct estimate,
    ``est_cumulative`` the distinct count of the union of all periods
    so far (period order = ascending ``period_col``), ``est_new``
    their forward difference — the novelty the period contributed.

    Period order is STRING order (keyed sketch rows carry stringified
    keys): use lexicographically ordered period labels — ISO dates
    ('2024-01-31') or zero-padded counters ('snap-007') — never bare
    integers ('10' sorts before '2'). NULL periods are dropped.
    Estimates carry the standard 1.04/sqrt(2^p) HLL error; est_new of
    a small period against a large prefix inherits the absolute error
    of the prefix (the published caveat for differences).
    """
    from .sketches import HllSketch

    # NULL periods carry no position in the prefix order; drop them
    # (mirrors the null-key convention in sampling.kmv_group_sketches)
    df = df.where(F.col(period_col).isNotNull())
    keyed = HllSketch(p=p, col=key_col, scalar=True).build_by_key(df, period_col)

    def prefix(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        rows = []
        for b in batches:
            pdf = b.to_pandas()
            rows.extend(
                (k, bytes(pl)) for k, pl in zip(pdf["key"], pdf["payload"])
            )
        if not rows:
            return
        rows.sort(key=lambda r: r[0])
        acc = HyperLogLog(p)
        prev = 0.0
        out_period, out_est, out_cum, out_new = [], [], [], []
        for k, payload in rows:
            sk = HyperLogLog.from_bytes(payload)
            acc.merge_in_place(sk)
            cum = acc.estimate()
            out_period.append(k)
            out_est.append(round(sk.estimate(), 2))
            out_cum.append(round(cum, 2))
            out_new.append(round(cum - prev, 2))
            prev = cum
        # explicit types: from_pandas over list-built columns infers
        # null type when a column is empty (CLAUDE.md mapInArrow rule)
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(out_period, type=pa.string()),
                pa.array(out_est, type=pa.float64()),
                pa.array(out_cum, type=pa.float64()),
                pa.array(out_new, type=pa.float64()),
            ],
            names=["period", "est_period", "est_cumulative", "est_new"],
        )

    # one task over |periods| sketch rows — the output size itself
    return keyed.repartition(1).mapInArrow(
        prefix,
        schema="period string, est_period double, est_cumulative double, est_new double",
    )
