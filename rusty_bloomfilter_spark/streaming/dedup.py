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


_GEN_OUTPUT = "fp string, gen timestamp"
# newest is carried EXPLICITLY: reconstructing it as max(gens) forgets a
# horizon advanced by a batch that recorded nothing (every row suppressed),
# and a later late row would then be accepted above the true floor —
# violating the (G+1)-window re-emission guarantee (round-4 review catch)
_GEN_STATE = "newest bigint, gens array<bigint>, payloads array<binary>"


def _duration_seconds(window: str) -> int:
    from .stateful import _duration_seconds as _ds

    return _ds(window)


def streaming_bloom_dedup_generational(
    stream_df: DataFrame,
    *,
    fp_col: str,
    ts_col: str = "ts",
    window: str = "1 day",
    generations: int = 7,
    n_per_gen: int,
    p: float = 1e-6,
    n_shards: int = 16,
) -> DataFrame:
    """RECENCY-scoped streaming dedup: suppress re-occurrences of a
    fingerprint within a trailing horizon of ``generations`` event-time
    windows, then re-admit — with state bounded by the filter bytes,
    never by the key count OR the stream length.

    ``streaming_bloom_dedup`` above never forgets: right for
    "one emission per doc EVER", wrong for feeds where a re-post after
    a quiet period is a genuinely new document (news re-syndication,
    re-crawls, retention-limited stores). This variant keeps one Bloom
    filter PER GENERATION (= event-time window) per shard, a ring that
    rotates as event time advances:

    - a row is suppressed iff its key probes positive in ANY retained
      generation (zero FN within the horizon — Bloom false positives
      can only OVER-suppress, never double-emit);
    - a novel key is recorded in its own row's generation and emitted
      as (fp, gen);
    - generations older than ``2 * generations`` windows behind the
      newest are pruned; rows older than ``generations - 1`` windows
      behind the newest are CLAMPED up to that acceptance floor before
      recording (the windowed_sliding_distinct rule: acceptance
      tighter than retention). Clamping a late row can only extend its
      suppression reach — conservative in the direction the dedup
      contract allows.

    Guarantees (any arrival order, proven by the slot arithmetic —
    record slot >= true gen, re-emission requires the slot pruned,
    i.e. newest >= slot + 2G windows, and the new emission's clamped
    gen >= newest - (G-1) windows >= slot + (G+1) windows):

    - at most ONE emission per fingerprint within any trailing span of
      ``generations`` windows;
    - after an emission, suppression lasts at most ``2*generations``
      windows of event time — a re-post beyond that always re-emits.

    State: ``n_shards x 2*generations x filter_bytes`` total, with
    each generation's filter sized for ``n_per_gen / n_shards`` keys
    at FPR ``p``. NULL timestamps are dropped (NaT folds to the int64
    sentinel and would fabricate a year-1677 generation).
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    if generations < 1:
        raise ValueError(f"generations must be >= 1, got {generations}")
    win_sec = _duration_seconds(window)
    keep = 2 * generations
    shape = Shape.for_np(max(1, -(-n_per_gen // n_shards)), p)

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            newest_raw, gens_raw, payloads_raw = state.get
            gens: dict[int, BloomFilter] = {
                int(g): sketch_from_bytes(bytes(b))
                for g, b in zip(gens_raw, payloads_raw)
            }
            newest = int(newest_raw) if newest_raw is not None else None
        else:
            gens = {}
            newest = None
        outs: list[pd.DataFrame] = []
        for pdf in pdfs:
            # NULL ts would fabricate a year-1677 generation (NaT
            # sentinel); a NULL fp would probe as key 0 and emit 'None'
            pdf = pdf[pdf[ts_col].notna() & pdf[fp_col].notna()]
            if not len(pdf):
                continue
            epochs = (pdf[ts_col].astype("int64") // 1_000_000_000).to_numpy()
            ws = epochs - (epochs % win_sec)
            batch_newest = int(ws.max())
            newest = batch_newest if newest is None else max(newest, batch_newest)
            # retention first: generations the new horizon obsoletes
            # stop counting before any probe in this batch
            floor_keep = newest - (keep - 1) * win_sec
            gens = {g: f for g, f in gens.items() if g >= floor_keep}
            floor_accept = newest - (generations - 1) * win_sec
            ws = np.maximum(ws, floor_accept)  # clamp late rows up
            keys = _series_probe_values(pdf[_KEY_COL])
            # within-batch keep-first per key, preserving row order
            order = np.sort(np.unique(keys, return_index=True)[1])
            keys_u, ws_u = keys[order], ws[order]
            fps_u = pdf[fp_col].to_numpy()[order]
            seen = np.zeros(len(keys_u), dtype=bool)
            for f in gens.values():
                seen |= f.contains_tokens(keys_u)
                if seen.all():
                    break
            if not seen.all():
                novel = ~seen
                for g in np.unique(ws_u[novel]):
                    sel = novel & (ws_u == g)
                    gens.setdefault(int(g), BloomFilter.empty(shape)).add_tokens(
                        keys_u[sel]
                    )
                outs.append(
                    pd.DataFrame(
                        {
                            "fp": fps_u[novel].astype(str),
                            "gen": pd.to_datetime(ws_u[novel], unit="s"),
                        }
                    )
                )
        state.update(
            (
                int(newest) if newest is not None else None,
                [int(g) for g in sorted(gens)],
                [gens[g].to_bytes() for g in sorted(gens)],
            )
        )
        yield from outs

    keyed = stream_df.select(
        F.col(fp_col).cast("string").alias(fp_col),
        F.col(ts_col).alias(ts_col),
        F.xxhash64(fp_col).alias(_KEY_COL),
        F.pmod(F.xxhash64(F.xxhash64(fp_col)), F.lit(n_shards)).alias(_SHARD_COL),
    )
    return keyed.groupBy(_SHARD_COL).applyInPandasWithState(
        update,
        outputStructType=_GEN_OUTPUT,
        stateStructType=_GEN_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
