"""Inverted-index builder: token -> posting list + stats.

The search-index write path of a token corpus: for each token, the
sorted list of documents containing it (posting list), its document
frequency (df) and collection frequency (cf). Entirely Catalyst —
explode, a per-(token, doc) pre-aggregation that both computes tf and
DEDUPLICATES (exactly one row per posting), then
``sort_array(collect_list(...))`` over those distinct rows for a
DETERMINISTIC posting order (a bare collect_list order is
partition-dependent and would break cross-engine pinning; the dedup
lives in the groupBy, not in a collect_set).

Scale shape: the shuffle carries (token, doc_id) DISTINCT pairs — the
posting mass itself, which is the output being built, so it is
inherent, not overhead. ``min_df`` prunes hapax/rare tokens BEFORE the
list aggregation (the df count aggregate is map-side combined and
cheap), which is how a 100-TB index build caps its largest lists'
memory: the heavy tail of rare tokens never reaches the list agg.
Posting lists of stop-word-grade tokens are the residual hot groups;
cap them upstream with a stop-list filter if df_ub x id-width exceeds
task memory (the Misra-Gries summary from operators/topk.py identifies
them in one scan).

Reference parity: the reference has no relational layer; this is the
pipeline composition the task brief's text-analysis family implies,
with determinism pinned cross-engine (contract q_inverted_index).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def posting_lists(
    seq: DataFrame,
    *,
    doc_col: str = "doc_id",
    tokens_col: str = "tokens",
    min_df: int = 1,
) -> DataFrame:
    """-> (token, df, cf, postings) — postings ascending-sorted doc
    ids, df = #distinct docs, cf = total occurrences. Deterministic
    under any partitioning (sorted set semantics)."""
    if min_df < 1:
        raise ValueError("min_df must be >= 1")
    pairs = seq.select(doc_col, F.explode(tokens_col).alias("token"))
    per_doc = pairs.groupBy("token", doc_col).agg(
        F.count(F.lit(1)).alias("tf")
    )
    if min_df > 1:
        # prune rare tokens BEFORE any list is collected: the df count
        # is a map-side-combined aggregate over (token, doc) rows, and
        # the surviving-token set is vocab-bounded (broadcastable)
        keep = (
            per_doc.groupBy("token")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") >= min_df)
            .select("token")
        )
        per_doc = per_doc.join(F.broadcast(keep), "token", "left_semi")
    return per_doc.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.sum("tf").cast("long").alias("cf"),
        F.sort_array(F.collect_list(F.col(doc_col))).alias("postings"),
    )
