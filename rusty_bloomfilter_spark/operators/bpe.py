"""Distributed BPE merge training over tokenized sequences
(byte-pair encoding; Sennrich, Haddow & Birch 2016, "Neural Machine
Translation of Rare Words with Subword Units" — the published greedy
merge-learning loop, Spark-distributed).

One BPE training iteration is: count every within-row adjacent token
pair across the corpus, take the most frequent pair, replace its
left-to-right non-overlapping occurrences with a fresh token id.
This module runs that loop Spark-first:

- pair counting is pure Catalyst (injective int64 pair keys via
  ``functions.text.adjacent_pair_keys``; groupBy does map-side partial
  aggregation, the shuffle carries (pair, count) rows only);
- the argmax is one collected row per iteration;
- replacement is a vectorized numpy kernel inside ``mapInArrow``
  (flatten once, boundary-guarded adjacent match, non-overlap
  resolution over the MATCH positions only — never a per-token loop);
- each iteration's sequences are persisted and the previous iteration
  unpersisted, so the lineage does not stack n_merges map layers at
  execution time. For long production runs, checkpoint every ~50
  merges (operators/checkpoint.py) to truncate lineage on disk.

Determinism: argmax ties break on (freq desc, left asc, right asc),
and replacement is a pure row-local function — the learned merge table
is identical for any partitioning (asserted in tests against a pure-
Python reference BPE).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import adjacent_pair_keys

# pair-key base: must exceed the largest token id the vocab can GROW to
# (initial vocab + merges); 2^20 keeps keys < 2^40, exact in int64.
PAIR_BASE = 1 << 20


def apply_merge_flat(
    flat: np.ndarray, lengths: np.ndarray, a: int, b: int, new_id: int
) -> tuple[np.ndarray, np.ndarray]:
    """Replace left-to-right non-overlapping (a, b) adjacencies with
    new_id in a flattened ragged array. Row boundaries never merge."""
    if flat.size < 2:
        return flat, lengths
    row_of = np.repeat(np.arange(len(lengths)), lengths)
    mask = (flat[:-1] == a) & (flat[1:] == b) & (row_of[:-1] == row_of[1:])
    idx = np.flatnonzero(mask)
    if idx.size == 0:
        return flat, lengths
    # non-overlap resolution: standard BPE is greedy left-to-right, so
    # a match starting where the previous kept match ended is skipped
    # ("aaa" + merge(a,a) -> (aa, a)). Loop runs over MATCHES only.
    kept = []
    last = -2
    for i in idx:
        if i > last + 1:
            kept.append(i)
            last = i
    kept = np.asarray(kept, dtype=np.int64)
    out = flat.copy()
    out[kept] = new_id
    drop = np.zeros(len(flat), dtype=bool)
    drop[kept + 1] = True
    new_flat = out[~drop]
    new_lengths = lengths - np.bincount(row_of[kept], minlength=len(lengths))
    return new_flat, new_lengths


def _replace_stage(df: DataFrame, a: int, b: int, new_id: int) -> DataFrame:
    def kernel(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        import pyarrow as pa

        for batch in batches:
            if batch.num_rows == 0:
                continue
            ids = batch.column("doc_id").to_pylist()
            col = batch.column("tokens")
            flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
            lengths = np.nan_to_num(
                col.value_lengths().to_numpy(zero_copy_only=False), nan=0.0
            ).astype(np.int64)
            new_flat, new_lengths = apply_merge_flat(flat, lengths, a, b, new_id)
            offsets = np.concatenate(([0], np.cumsum(new_lengths)))
            arr = pa.ListArray.from_arrays(
                pa.array(offsets, type=pa.int32()),
                pa.array(new_flat, type=pa.int32()),
            )
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, type=pa.string()), arr], names=["doc_id", "tokens"]
            )

    return df.mapInArrow(kernel, schema="doc_id string, tokens array<int>")


def learn_bpe_merges(
    sequences: DataFrame,
    n_merges: int,
    *,
    vocab: int = 50257,
    min_freq: int = 2,
) -> tuple[list[tuple[int, int, int, int]], DataFrame]:
    """Learn ``n_merges`` BPE merges over the corpus.

    -> (merge_table, merged_sequences): merge_table rows are
    (left, right, new_id, freq) in learning order; merged_sequences is
    (doc_id, tokens) with every merge applied. Stops early when no pair
    reaches ``min_freq``.

    Contract: token ids must be in [0, vocab) and the GROWN vocab
    (vocab + n_merges) must fit under PAIR_BASE, else the injective
    pair key left*PAIR_BASE+right silently collides.
    """
    if vocab + n_merges > PAIR_BASE:
        raise ValueError(
            f"vocab + n_merges = {vocab + n_merges} exceeds PAIR_BASE={PAIR_BASE}; "
            "pair keys would collide"
        )
    cur = sequences.select(
        F.col("doc_id").cast("string").alias("doc_id"), F.col("tokens")
    ).persist()
    # materialize so each iteration counts over stable input, and check
    # the token-id contract in the same pass (BOTH bounds: a negative
    # id collides pair keys just as silently as an oversized one)
    bounds = cur.agg(
        F.max(F.array_max("tokens")).alias("mx"), F.min(F.array_min("tokens")).alias("mn")
    ).collect()[0]
    if bounds["mx"] is not None and (bounds["mx"] >= vocab or bounds["mn"] < 0):
        cur.unpersist()
        raise ValueError(
            f"token ids must be in [0, vocab={vocab}); saw min={bounds['mn']}, "
            f"max={bounds['mx']}"
        )
    merges: list[tuple[int, int, int, int]] = []
    try:
        for t in range(n_merges):
            top = (
                cur.select(
                    F.explode(adjacent_pair_keys(F.col("tokens"), vocab=PAIR_BASE)).alias("pair")
                )
                .groupBy("pair")
                .agg(F.count("*").alias("freq"))
                .orderBy(F.desc("freq"), F.asc("pair"))
                .limit(1)
                .collect()
            )
            if not top or top[0]["freq"] < min_freq:
                break
            pair, freq = int(top[0]["pair"]), int(top[0]["freq"])
            a, b = pair // PAIR_BASE, pair % PAIR_BASE
            new_id = vocab + t
            merges.append((a, b, new_id, freq))
            nxt = _replace_stage(cur, a, b, new_id).persist()
            nxt.count()
            cur.unpersist()
            cur = nxt
    except Exception:
        cur.unpersist()
        raise
    return merges, cur
