"""Corpus-curation relational operators: per-key frequency capping and
deterministic token-budget sequence packing.

Both are pure-Catalyst (window functions + hash aggregates, zero
Python in the row path) so they inherit whole-stage codegen, AQE skew
handling, and partition-pruned scans for free. They complement the
sketch pipeline: a 100-TB curation run caps hot domains and packs the
survivors into fixed-context training windows right after dedup.

Reference parity: the reference library (``/root/reference/src/
bloomfilter/mod.rs``) has no relational surface; these extend the
§2.2 dataflow categories (window functions, aggregations) with the
two curation steps an LLM-data pipeline runs around the sketches.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def frequency_cap(
    df: DataFrame,
    key: str | Column,
    cap: int,
    order_by: Sequence[Column],
) -> DataFrame:
    """Keep at most ``cap`` rows per ``key``, ranked by ``order_by``.

    Adds two columns: ``cap_rank`` (1-based rank within the key) and
    ``kept`` (rank <= cap). The caller chooses whether to filter or to
    audit the drops; returning the flag keeps one plan serving both.

    ``order_by`` MUST be a total order (include a unique tiebreaker
    such as doc_id) or ``kept`` is nondeterministic across runs — the
    classic silent-resample bug in curation reruns.

    Scale: one shuffle on ``key``; a hot domain concentrates in one
    task, which AQE's skew-split cannot fix for window functions —
    for pathological keys, pre-filter with a per-key threshold from a
    sketch pass (t-digest of the order column per key) so only
    near-the-cut rows enter the window. At typical domain skew
    (<10^7 rows/domain) the single-task sort is fine.
    """
    w = Window.partitionBy(key).orderBy(*order_by)
    return df.withColumn("cap_rank", F.row_number().over(w)).withColumn(
        "kept", F.col("cap_rank") <= F.lit(int(cap))
    )


def pack_sequences(
    seq: DataFrame,
    capacity: int,
    key: str = "source",
    order_col: Column | None = None,
    n_tok_col: str = "n_tok",
) -> DataFrame:
    """Assign documents to fixed-capacity training-context bins.

    Deterministic contiguous packing: within each ``key`` partition,
    documents are laid end-to-end in ``order_col`` order into a token
    stream; a document's ``bin`` is the index of the ``capacity``-token
    window its FIRST token lands in (floor(start_offset / capacity)).
    This is the chunking used by fixed-context pretraining packers
    that concatenate-and-split rather than bin-pack: no reordering, no
    iteration, exactly reproducible — so shard boundaries stay stable
    across reruns (resumability requirement of the north rule).

    Returns (key, bin, n_docs, bin_tokens): documents per bin and the
    token mass STARTING in each bin (a document longer than
    ``capacity`` contributes all its tokens to its starting bin; the
    overflow spills into the next window at tensorization time).

    Scale: one shuffle on ``key`` + an in-partition sort for the
    running sum, then a map-side-combinable hash aggregate. The
    cumulative sum is per-key, never global — no single-task global
    ordering bottleneck.
    """
    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    order = order_col if order_col is not None else F.col("doc_id").cast("bigint")
    w = Window.partitionBy(key).orderBy(order)
    cum = F.sum(n_tok_col).over(w)
    start = cum - F.col(n_tok_col)
    return (
        seq.withColumn("bin", F.floor(start / F.lit(float(capacity))))
        .groupBy(key, "bin")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(n_tok_col).cast("bigint").alias("bin_tokens"),
        )
    )
