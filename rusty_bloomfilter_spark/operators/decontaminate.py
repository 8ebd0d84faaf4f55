"""Training-data decontamination: flag training documents that share
token n-grams with an evaluation/benchmark set.

The Bloom filter's ZERO-FALSE-NEGATIVE guarantee is the whole point
here: build one filter over every n-gram of the eval set, probe every
n-gram of every training document — a document sharing ANY true n-gram
with the eval set is flagged with certainty (leaks cannot slip
through); false positives only ever over-remove, at a rate bounded by
the configured p times grams-per-doc.

Scale shape: the eval set is tiny next to the corpus, so its filter is
a broadcast payload; the corpus is scanned once with a vectorized
per-row gram-hash + membership kernel (Arrow flatten -> numpy, no
per-row Python); output is one narrow row per document.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sketch import BlockedBloomFilter
from .sketches import (
    BlockedBloomSketch,
    arrow_flat_tokens,
    arrow_row_lengths,
    flat_ngram_hashes,
)

DECON_SCHEMA = "doc_id string, n_grams bigint, n_hits bigint, contaminated boolean"


def eval_ngram_filter(
    eval_seq: DataFrame,
    *,
    ngram: int = 8,
    p: float = 1e-6,
    expected_grams: int | None = None,
    fanout: int = 16,
) -> tuple[bytes, int]:
    """Build the broadcastable Bloom payload over every within-row
    n-gram of the eval set. ``expected_grams`` defaults to the eval
    set's total token count (an upper bound on its gram count)."""
    if expected_grams is None:
        expected_grams = int(
            eval_seq.agg(F.sum(F.size("tokens")).cast("bigint")).collect()[0][0] or 1
        )
    sk = BlockedBloomSketch.for_np(n=max(expected_grams, 1), p=p, ngram=ngram)
    return sk.build_bytes(eval_seq, fanout=fanout)


def decontaminate(
    train_seq: DataFrame,
    eval_seq: DataFrame,
    *,
    ngram: int = 8,
    p: float = 1e-6,
    min_hits: int = 1,
    spark: SparkSession | None = None,
) -> DataFrame:
    """-> (doc_id, n_grams, n_hits, contaminated) per training doc.

    ``contaminated`` is True when >= min_hits of the doc's n-grams
    might appear in the eval set. Zero false negatives: every doc that
    truly shares >= min_hits n-grams IS flagged. Expected spurious
    flags <= p * n_grams per clean doc (raise min_hits for long docs
    if p * len exceeds your tolerance).
    """
    spark = spark or train_seq.sparkSession
    payload, _ = eval_ngram_filter(eval_seq, ngram=ngram, p=p)
    bc = spark.sparkContext.broadcast(payload)
    n = ngram
    thresh = min_hits

    def probe(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        import pyarrow as pa

        bf = BlockedBloomFilter.from_bytes(bc.value)
        for batch in batches:
            if batch.num_rows == 0:
                continue
            ids = batch.column("doc_id").to_pylist()
            flat = arrow_flat_tokens(batch, "tokens")
            lengths = arrow_row_lengths(batch, "tokens")
            n_grams_row = np.maximum(lengths - (n - 1), 0)
            hits_row = np.zeros(len(ids), dtype=np.int64)
            h = flat_ngram_hashes(flat, lengths, n)
            if h.size:
                hit = bf.contains_hashes(h).astype(np.int64)
                # per-doc segment sums via prefix-sum differences: exact
                # for zero-gram docs anywhere in the batch (clamped
                # reduceat misattributed the last doc's trailing hits
                # to trailing zero-gram docs)
                c = np.concatenate(([0], np.cumsum(hit)))
                ends = np.cumsum(n_grams_row)
                hits_row = c[ends] - c[ends - n_grams_row]
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, type=pa.string()),
                    pa.array(n_grams_row.tolist(), type=pa.int64()),
                    pa.array(hits_row.tolist(), type=pa.int64()),
                    pa.array((hits_row >= thresh).tolist(), type=pa.bool_()),
                ],
                names=["doc_id", "n_grams", "n_hits", "contaminated"],
            )

    return train_seq.select("doc_id", "tokens").mapInArrow(probe, schema=DECON_SCHEMA)
