"""Heavy hitters: distributed top-k token frequencies.

Exact top-k via groupBy is fine until the key cardinality explodes; at
10^12 tokens the classic scalable pattern is:

1. per-partition local top-K' candidates (K' = k * margin) from an
   in-memory exact count of the partition (mapInArrow, no shuffle) —
   any global top-k member must be a local top-K' member in at least
   one partition if margin covers the partition skew; with uniform
   partitioning the standard margin is a few x.
2. union candidates (tiny shuffle: K' rows per partition),
3. CMS point estimates for the candidate set (one-sided error, never
   underestimates), or an exact second pass restricted to candidates
   (a bloom/IN-filtered semi-join aggregation).

`topk_by_cms` is the sketch path; `topk_exact_candidates` is the
verified two-pass path whose result equals the full exact groupBy at
test scale.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sketch import MisraGries
from .sketches import CmsSketch, MgSketch, arrow_flat_tokens, dedup_counts


def _local_top_candidates(df: DataFrame, col: str, k_local: int) -> DataFrame:
    """Per-partition exact counts -> local top-k_local candidate rows
    (tok, local_freq). No shuffle of token data.

    Counts fold PER BATCH into a running (distinct, count) pair — the
    task never buffers the partition's flattened token stream (GBs at
    the 10^12-token framing) and never sorts it whole (cache-hostile
    at 10M+ int64, CLAUDE.md); memory is O(partition distinct), the
    same bound the exact count itself needs. Each batch counts via the
    bincount fold (dedup_counts) when its value range allows, batch-
    local np.unique otherwise."""

    def tops(batches):
        import pyarrow as pa

        rv = np.empty(0, dtype=np.int64)  # running distinct values
        rc = np.empty(0, dtype=np.int64)  # running counts
        for batch in batches:
            flat = arrow_flat_tokens(batch, col)
            if not flat.size:
                continue
            dc = dedup_counts(flat)
            bv, bcnt = dc if dc is not None else np.unique(flat, return_counts=True)
            both = np.concatenate([rv, bv.astype(np.int64, copy=False)])
            w = np.concatenate([rc, bcnt.astype(np.int64, copy=False)])
            rv, inv = np.unique(both, return_inverse=True)
            rc = np.bincount(inv, weights=w).astype(np.int64)
        if rv.size:
            if rv.size > k_local:
                sel = np.argpartition(rc, -k_local)[-k_local:]
                rv, rc = rv[sel], rc[sel]
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(rv.tolist(), type=pa.int64()),
                    pa.array(rc.tolist(), type=pa.int64()),
                ],
                names=["tok", "local_freq"],
            )

    return df.select(col).mapInArrow(tops, schema="tok bigint, local_freq bigint")


def topk_by_cms(
    df: DataFrame,
    k: int = 20,
    *,
    col: str = "tokens",
    margin: int = 4,
    d: int = 5,
    w: int = 1 << 16,
) -> DataFrame:
    """-> (tok, freq_est) top-k by CMS estimate over the candidate set.
    CMS never underestimates, so no true heavy hitter can be displaced
    by an *underestimate*; overestimates are bounded by eps*N w.h.p."""
    spark = df.sparkSession
    cand = (
        _local_top_candidates(df, col, k * margin)
        .groupBy("tok")
        .agg(F.sum("local_freq").alias("lower_bound"))
        .orderBy(F.desc("lower_bound"), "tok")
        .limit(k * margin)
    )
    cs = CmsSketch(d=d, w=w, col=col)
    payload, _ = cs.build_bytes(df)
    toks = np.array([r["tok"] for r in cand.collect()], dtype=np.int64)
    if toks.size == 0:
        return spark.createDataFrame([], "tok bigint, freq_est bigint")
    est = cs.estimate_counts(payload, toks)
    order = np.lexsort((toks, -est))[:k]
    rows = [(int(toks[i]), int(est[i])) for i in order]
    return spark.createDataFrame(rows, "tok bigint, freq_est bigint")


def heavy_hitters_mg(
    df: DataFrame, *, col: str = "tokens", denom: int = 500, capacity: int | None = None
) -> DataFrame:
    """EXACT frequent items above N/denom — tokens whose global count
    satisfies ``freq * denom > N`` — via a Misra–Gries candidate pass
    plus an exact recount of the candidates only.

    Why this beats `topk_exact_candidates` at 100 TB: the MG summary's
    deterministic bound (est <= true <= est + err_ub, err_ub <=
    N/(capacity+1)) makes the candidate set a PROVABLE superset of
    every token above the threshold under ANY data distribution and
    ANY partitioning — there is no margin contract to violate. A token
    spread thin across 100k partitions still survives the tree merge
    because decrements are globally bounded, not per-partition. Cost:
    one corpus scan building O(capacity)-sized mergeable summaries
    (only summary rows shuffle), one candidate-restricted recount scan
    (broadcast semi-join pushed into the exploded scan), candidate set
    <= capacity rows on the driver.

    Threshold arithmetic is integer-exact (freq * denom > N) so the
    result hash-matches a SQL ``HAVING count(*) * denom > total``
    oracle bit-for-bit — no float threshold ties.
    """
    if denom < 2:
        raise ValueError("denom must be >= 2")
    cap = int(capacity) if capacity is not None else 4 * denom
    if cap + 1 < denom:
        # guarantee needs N/(cap+1) <= N/denom
        raise ValueError(f"capacity {cap} too small for denom {denom} (need >= denom-1)")
    payload, n = MgSketch(capacity=cap, col=col).build_bytes(df)
    spark = df.sparkSession
    if n == 0:
        return spark.createDataFrame([], "tok bigint, freq bigint")
    summary = MisraGries.from_bytes(payload)
    cand_tokens = summary.candidates_above(n // denom).view(np.int64)
    if cand_tokens.size == 0:
        return spark.createDataFrame([], "tok bigint, freq bigint")
    cand = spark.createDataFrame(
        [(int(t),) for t in cand_tokens], "tok bigint"
    )
    ex = df.select(F.explode(col).alias("tok"))
    return (
        ex.join(F.broadcast(cand), "tok", "left_semi")
        .groupBy("tok")
        .agg(F.count("*").alias("freq"))
        .where(F.col("freq") * F.lit(denom) > F.lit(n))
        .orderBy(F.desc("freq"), "tok")
    )


def topk_exact_candidates(
    df: DataFrame, k: int = 20, *, col: str = "tokens", margin: int = 4
) -> DataFrame:
    """Two-pass exact top-k: candidates from local tops, then an exact
    recount restricted to candidates (broadcast IN-filter pushed into
    the exploded scan). Equals full groupBy top-k whenever the margin
    covers partition skew — pinned by tests.

    MARGIN CONTRACT (when this can be wrong): a global heavy hitter is
    found iff it reaches the local top-(k*margin) of at least one
    partition. A token spread THIN across partitions — below every
    partition's k*margin'th local count — never becomes a candidate
    even when its global sum belongs in the top k. Formally, with P
    partitions, a missed hitter must have local count < the k*margin'th
    local count in every partition, so its global count is < P * that
    threshold; equivalently, the result is exact whenever
    k*margin >= the number of tokens that locally out-count any true
    top-k member in each partition. Zipf-ish token distributions
    satisfy this with margin of a few; adversarial uniform-noise
    distributions (each partition dominated by partition-local tokens)
    do not — raise margin toward the per-partition distinct count, or
    fall back to the full groupBy (tests/test_topk_margin.py pins both
    the failure mode and the recovery)."""
    cand = (
        _local_top_candidates(df, col, k * margin)
        .groupBy("tok")
        .agg(F.sum("local_freq").alias("lb"))
        .orderBy(F.desc("lb"), "tok")
        .limit(k * margin)
        .select("tok")
    )
    ex = df.select(F.explode(col).alias("tok"))
    return (
        ex.join(F.broadcast(cand), "tok", "left_semi")
        .groupBy("tok")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), "tok")
        .limit(k)
    )
