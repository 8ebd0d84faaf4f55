"""Token-distribution SHIFT between two sources: which tokens' counts
moved the most from corpus slice A to corpus slice B?

The question behind "did this crawl snapshot change?", "what did the
filter remove?", and "how does domain X differ from domain Y" — ranked
signed count differences c_A(tok) - c_B(tok), not ratios (KL-style
drift is q_source_token_drift; this is the per-token ledger).

Exact form (``token_shift_exact``): one scan of the two slices, one
conditional aggregate bounded by vocab — fine whenever the token
id space is enumerable.

Sketch form (``token_shift_topk_cs``): the linear-sketch trick.
CountSketch is a LINEAR map of the frequency vector, so
sketch(A) - sketch(B) (sketch/ams.py::CountSketch.subtract) is
exactly the sketch of the signed difference stream — the operation
sign-less summaries (CMS/Bloom/HLL) cannot express. One fused
build_multi_by_key scan builds (CountSketch, Misra-Gries) per side;
only sketch rows shuffle; the driver holds payloads, never token data.
Candidates come with a PROVABLE superset guarantee: |c_A - c_B| > T
implies c_A > T or c_B > T (counts are non-negative), and each side's
MG candidates_above(T) is a superset of its tokens above T whenever
T >= N_side/(capacity+1) — so every token whose shift exceeds
max(N_A, N_B)/(capacity+1) is guaranteed to surface. Estimated
differences carry the CountSketch error ~sqrt(F2(A-B)/w) per query,
audited in-row by the contract query.

Reference scope: composition of mergeable-summary algebra over the
reference's token model; no analogous surface in /root/reference.
"""
from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sketch import CountSketch, MisraGries, merge_sketch_payloads

__all__ = ["token_shift_exact", "token_shift_topk_cs"]


def token_shift_exact(
    seq: DataFrame,
    source_col: str,
    source_a: str,
    source_b: str,
    *,
    k: int = 50,
    tokens_col: str = "tokens",
) -> DataFrame:
    """-> (tok, freq_a, freq_b, diff) — top ``k`` tokens by |diff|,
    ties broken by tok. One pruned scan (the source filter pushes to
    the file scan), one vocab-bounded conditional aggregate."""
    toks = seq.filter(F.col(source_col).isin(source_a, source_b)).select(
        source_col, F.explode(tokens_col).alias("tok")
    )
    counts = toks.groupBy("tok").agg(
        F.sum(F.when(F.col(source_col) == source_a, 1).otherwise(0))
        .cast("bigint")
        .alias("freq_a"),
        F.sum(F.when(F.col(source_col) == source_b, 1).otherwise(0))
        .cast("bigint")
        .alias("freq_b"),
    )
    return (
        counts.withColumn("diff", F.col("freq_a") - F.col("freq_b"))
        .orderBy(F.abs(F.col("diff")).desc(), "tok")
        .limit(k)
    )


def token_shift_topk_cs(
    seq: DataFrame,
    source_col: str,
    source_a: str,
    source_b: str,
    *,
    k: int = 50,
    d: int = 5,
    w: int = 1 << 16,
    mg_capacity: int = 1024,
    tokens_col: str = "tokens",
) -> DataFrame:
    """-> (tok, diff_est, err_bound) — top ``k`` candidate tokens by
    estimated |c_A - c_B| from a CountSketch difference, candidates
    from each side's Misra-Gries summary (provable superset above
    max(N_A,N_B)/(capacity+1); see module docstring).

    ``err_bound`` is 3·sqrt(F2_est(A-B)/w) — three per-row standard
    deviations of the CountSketch point estimate on the difference
    stream, F2 estimated from the same difference sketch.
    """
    from .aggregate import build_multi_by_key
    from .sketches import arrow_flat_tokens

    def upd(acc, batch) -> None:
        flat = arrow_flat_tokens(batch, tokens_col)
        if flat.size:
            acc.add_tokens(flat.astype(np.int64, copy=False))

    specs = [
        ("cs", lambda: CountSketch(d, w), upd, merge_sketch_payloads),
        ("mg", lambda: MisraGries(mg_capacity), upd, merge_sketch_payloads),
    ]
    pair = seq.filter(F.col(source_col).isin(source_a, source_b)).select(
        source_col, tokens_col
    )
    rows = {
        r["key"]: r
        for r in build_multi_by_key(
            pair, source_col, specs, columns=[source_col, tokens_col]
        ).collect()
    }
    spark = seq.sparkSession
    out_schema = "tok bigint, diff_est bigint, err_bound double"
    # build_multi_by_key stringifies keys; match the caller's values the
    # same way so non-string source columns (int ids) still resolve
    key_a, key_b = str(source_a), str(source_b)
    if key_a not in rows and key_b not in rows:
        return spark.createDataFrame([], out_schema)

    def side(name: str) -> tuple[CountSketch, MisraGries]:
        r = rows.get(name)
        if r is None:  # absent slice sketches as empty — diff is just the other side
            return CountSketch(d, w), MisraGries(mg_capacity)
        return (
            CountSketch.from_bytes(bytes(r["payload_cs"])),
            MisraGries.from_bytes(bytes(r["payload_mg"])),
        )

    cs_a, mg_a = side(key_a)
    cs_b, mg_b = side(key_b)
    diff = cs_a.subtract(cs_b)
    cands = np.union1d(mg_a.candidates_above(0), mg_b.candidates_above(0))
    if cands.size == 0:
        return spark.createDataFrame([], out_schema)
    est = diff.query_u64(cands)
    err = 3.0 * float(np.sqrt(max(diff.f2(), 0) / w))
    order = np.lexsort((cands.view(np.int64), -np.abs(est)))[:k]
    data = [
        (int(cands.view(np.int64)[i]), int(est[i]), round(err, 2)) for i in order
    ]
    return spark.createDataFrame(data, out_schema)
