"""Streaming exact-dedup with BOUNDED state: one Bloom payload per
fingerprint-hash shard as ``applyInPandasWithState`` group state.

The 100-TB ingest problem: native ``stream.dropDuplicates([fp])`` is
exact but its state grows by one row PER DISTINCT KEY — at 10^12 docs
that is the whole key set resident in the state store. Holding a
Bloom filter per shard instead caps TOTAL state at
``n_shards × ⌈m/64⌉ × 8`` bytes forever, with the usual one-sided
trade (zero false negatives, reference contract
/root/reference/src/bloomfilter/mod.rs:199-228): a doc whose
fingerprint was already admitted is NEVER emitted again; a novel doc
is wrongly dropped at rate ≤ the configured p — the standard
curation-side trade (cf. the batch incremental dedup,
plans/incremental.py, which makes the same one).

Sharding is the same uniform md5/xxhash routing as the batch sharded
build (operators/sharded.py): each shard's filter is sized for
n_total/n_shards keys and lives in its own state-store group, so state
updates parallelize across shards and no single task deserializes more
than one filter.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.sketches import _series_probe_values
from ..sketch import BloomFilter, Shape, sketch_from_bytes

_DEDUP_OUTPUT = "fp string"
_DEDUP_STATE = "payload binary"
_KEY_COL = "_rbf_fp_key"
_SHARD_COL = "_rbf_fp_shard"


def streaming_bloom_dedup(
    stream_df: DataFrame,
    *,
    fp_col: str,
    n_total: int,
    p: float = 1e-6,
    n_shards: int = 16,
) -> DataFrame:
    """Emit each fingerprint's FIRST occurrence only, across all
    micro-batches, with state bounded by the filter size — not by the
    stream's key count.

    Emits (fp string) rows in update mode: a fingerprint appears in
    the output at most once ever (zero FN — once admitted, every later
    occurrence probes positive and is suppressed); a novel fingerprint
    is silently dropped with probability ≤ ``p`` (false positive).
    Within a batch the first occurrence wins and later copies are
    suppressed exactly. ``n_total`` sizes each shard's filter for
    n_total/n_shards expected keys.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    # ceil, like the batch sharded build (operators/sharded.py): floor
    # would undersize every shard when n_total % n_shards != 0 and the
    # documented <= p drop bound would not hold
    shape = Shape.for_np(max(1, -(-n_total // n_shards)), p)

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            (payload,) = state.get
            bf = sketch_from_bytes(bytes(payload))
        else:
            bf = BloomFilter.empty(shape)
        outs: list[pd.DataFrame] = []
        for pdf in pdfs:
            if not len(pdf):
                continue
            keys = _series_probe_values(pdf[_KEY_COL])
            # within-batch keep-first: fold to first occurrence per key
            order = np.sort(np.unique(keys, return_index=True)[1])
            keys_u = keys[order]
            fps_u = pdf[fp_col].to_numpy()[order]
            novel = ~bf.contains_tokens(keys_u)
            if novel.any():
                bf.add_tokens(keys_u[novel])
                outs.append(pd.DataFrame({"fp": fps_u[novel].astype(str)}))
        # update state BEFORE yielding: the runtime may not resume the
        # generator past its last yield, which would lose the state write
        state.update((bf.to_bytes(),))
        yield from outs

    keyed = stream_df.select(
        F.col(fp_col).cast("string").alias(fp_col),
        F.xxhash64(fp_col).alias(_KEY_COL),
        F.pmod(F.xxhash64(F.xxhash64(fp_col)), F.lit(n_shards)).alias(_SHARD_COL),
    )
    return keyed.groupBy(_SHARD_COL).applyInPandasWithState(
        update,
        outputStructType=_DEDUP_OUTPUT,
        stateStructType=_DEDUP_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
