"""Custom stateful streaming operator: per-key running sketches via
``applyInPandasWithState``.

Keeps one serialized sketch per group as stream state (HLL here — any
sketch with the mergeable protocol works) and emits the refreshed
estimate every micro-batch. This is the applyInPandasWithState shape:
arbitrary per-key state the built-in windowed aggregates can't express
(a sketch is not a sum), updated with whole Arrow-fed pandas batches —
no per-row Python.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.sketches import _series_probe_values
from ..sketch import HyperLogLog

_OUTPUT_SCHEMA = "key string, distinct_est double, n_items bigint"
_STATE_SCHEMA = "payload binary"


def running_distinct_by_key(
    stream_df: DataFrame,
    *,
    key_col: str,
    value_col: str,
    p: int = 14,
) -> DataFrame:
    """Streaming per-key distinct-count sketch: groupBy(key) +
    applyInPandasWithState holding an HLL payload per key. Emits
    (key, distinct_est, n_items) per key per micro-batch."""

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            (payload,) = state.get
            hll = HyperLogLog.from_bytes(bytes(payload))
        else:
            hll = HyperLogLog(p)
        for pdf in pdfs:
            vals = _series_probe_values(pdf[value_col])
            if len(vals):
                hll.add_tokens(vals)
        state.update((hll.to_bytes(),))
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "distinct_est": [hll.estimate()],
                "n_items": [hll.n_items],
            }
        )

    return (
        stream_df.groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=_OUTPUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


_WINDIST_OUTPUT = "window_start timestamp, distinct_est double, n_items bigint"
_WINDIST_STATE = "payload binary"


def windowed_distinct(
    stream_df: DataFrame,
    *,
    ts_col: str = "ts",
    value_col: str = "user_id",
    window: str = "1 hour",
    p: int = 14,
    watermark: str | None = None,
) -> DataFrame:
    """Streaming per-event-time-window distinct estimate via an HLL
    held as group state: O(2^p) bytes per window regardless of stream
    length — the built-in windowed approx_count_distinct can't expose
    or checkpoint its sketch, this one IS the sketch (mergeable with
    any batch-built HLL payload of the same p).

    Emits (window_start, distinct_est, n_items) per window per
    micro-batch (output mode update). ``watermark`` bounds total state
    exactly like windowed_topk_tokens: a window's HLL is dropped once
    the watermark passes its end."""

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            (payload,) = state.get
            hll = HyperLogLog.from_bytes(bytes(payload))
        else:
            hll = HyperLogLog(p)
        for pdf in pdfs:
            vals = _series_probe_values(pdf[value_col])
            if len(vals):
                hll.add_tokens(vals)
        state.update((hll.to_bytes(),))
        if timeout:
            state.setTimeoutTimestamp(key[1])  # expire at window end
        yield pd.DataFrame(
            {
                "window_start": [key[0]],
                "distinct_est": [hll.estimate()],
                "n_items": [hll.n_items],
            }
        )

    from pyspark.sql import functions as F

    timeout = watermark is not None
    if timeout:
        stream_df = stream_df.withWatermark(ts_col, watermark)
    win = F.window(ts_col, window)
    windowed = stream_df.select(
        "*", win["start"].alias("window_start"), win["end"].alias("window_end")
    )
    return windowed.groupBy("window_start", "window_end").applyInPandasWithState(
        update,
        outputStructType=_WINDIST_OUTPUT,
        stateStructType=_WINDIST_STATE,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.EventTimeTimeout if timeout else GroupStateTimeout.NoTimeout
        ),
    )


_TOPK_OUTPUT = "window_start timestamp, tok bigint, est_freq bigint, rank int"
_TOPK_STATE = "payload binary, cand array<bigint>"


def windowed_topk_tokens(
    stream_df: DataFrame,
    *,
    ts_col: str = "ts",
    tokens_col: str = "tokens",
    window: str = "1 hour",
    k: int = 10,
    d: int = 4,
    w: int = 1 << 14,
    watermark: str | None = None,
) -> DataFrame:
    """Streaming per-window heavy hitters: the classic CMS+candidates
    algorithm as applyInPandasWithState. State per event-time window =
    (CMS payload, 2k candidate tokens); every micro-batch folds the
    batch's tokens into the CMS, re-estimates candidates ∪ the batch's
    distinct tokens, keeps the top 2k as state and emits the top k.

    Candidate semantics: a token is (re)considered at every batch it
    appears in, scored by its CMS estimate over the window's WHOLE
    history — so a hitter that accumulates across batches enters the
    top-k at the first batch where its cumulative estimate qualifies.
    State is O(d*w + 2k) per window regardless of stream length.

    ``watermark`` (e.g. "2 hours") bounds TOTAL state for unbounded
    streams: event-time timeout drops a window's state once the
    watermark passes its end — late data beyond the watermark is
    discarded with it, the standard trade.
    """
    from ..sketch import CountMinSketch

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()  # watermark passed this window's end
            return
        if state.exists:
            payload, cand = state.get
            cms = CountMinSketch.from_bytes(bytes(payload))
            candidates = set(int(t) for t in cand)
        else:
            cms = CountMinSketch(d, w)
            candidates = set()
        batch_distinct: set[int] = set()
        for pdf in pdfs:
            arrs = [np.asarray(a) for a in pdf[tokens_col].to_numpy() if a is not None and len(a)]
            if not arrs:
                continue
            flat = np.concatenate(arrs).astype(np.int64, copy=False)
            cms.add_tokens(flat)
            batch_distinct.update(np.unique(flat).tolist())
        candidates |= batch_distinct
        if not candidates:
            return
        toks = np.fromiter(candidates, dtype=np.int64, count=len(candidates))
        est = cms.query_tokens(toks)
        order = np.lexsort((toks, -est))  # est desc, tok asc tiebreak
        keep = order[: 2 * k]
        state.update((cms.to_bytes(), [int(t) for t in toks[keep]]))
        if timeout:
            state.setTimeoutTimestamp(key[1])  # expire at window end
        top = order[:k]
        yield pd.DataFrame(
            {
                "window_start": [key[0]] * len(top),
                "tok": toks[top],
                "est_freq": est[top],
                "rank": np.arange(1, len(top) + 1, dtype=np.int32),
            }
        )

    from pyspark.sql import functions as F

    timeout = watermark is not None
    if timeout:
        stream_df = stream_df.withWatermark(ts_col, watermark)
    win = F.window(ts_col, window)
    windowed = stream_df.select(
        "*", win["start"].alias("window_start"), win["end"].alias("window_end")
    )
    return (
        windowed.groupBy("window_start", "window_end")
        .applyInPandasWithState(
            update,
            outputStructType=_TOPK_OUTPUT,
            stateStructType=_TOPK_STATE,
            outputMode="update",
            timeoutConf=(
                GroupStateTimeout.EventTimeTimeout if timeout else GroupStateTimeout.NoTimeout
            ),
        )
    )


_QUANT_OUTPUT = (
    "window_start timestamp, n_items bigint, q double, value double"
)
_QUANT_STATE = "payload binary"


def windowed_quantiles(
    stream_df: DataFrame,
    *,
    ts_col: str = "ts",
    value_col: str = "value",
    window: str = "1 hour",
    qs: tuple = (0.5, 0.95, 0.99),
    k: int = 200,
    watermark: str | None = None,
) -> DataFrame:
    """Streaming per-window quantiles via a KLL sketch as
    applyInPandasWithState state — the observability staple (p50/p95/
    p99 per window) with O(k·log(n/k)) state per live window instead of
    buffering the window's values. Every micro-batch folds the batch's
    values into the window's sketch and re-emits the requested
    quantiles over the window's WHOLE history so far (update mode; the
    last emission per window is the final answer). Estimates carry the
    published KLL normalized rank error ~O(1/k). ``watermark`` bounds
    total state via event-time timeout, as in windowed_topk_tokens."""
    qs = tuple(float(q) for q in qs)
    if not qs or not all(0.0 <= q <= 1.0 for q in qs):
        raise ValueError("qs must be fractions in [0, 1]")

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        from ..sketch import KLLSketch

        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            sk = KLLSketch.from_bytes(bytes(state.get[0]))
        else:
            sk = KLLSketch(k)
        for pdf in pdfs:
            vals = pdf[value_col].dropna().to_numpy(dtype=np.float64)
            if vals.size:
                sk.update_batch(vals)
        if sk.n_items == 0:
            return
        state.update((sk.to_bytes(),))
        if timeout:
            state.setTimeoutTimestamp(key[1])  # expire at window end
        yield pd.DataFrame(
            {
                "window_start": [key[0]] * len(qs),
                "n_items": [sk.n_items] * len(qs),
                "q": list(qs),
                "value": [float(sk.quantile(q)) for q in qs],
            }
        )

    from pyspark.sql import functions as F

    timeout = watermark is not None
    if timeout:
        stream_df = stream_df.withWatermark(ts_col, watermark)
    win = F.window(ts_col, window)
    windowed = stream_df.select(
        "*", win["start"].alias("window_start"), win["end"].alias("window_end")
    )
    return (
        windowed.groupBy("window_start", "window_end")
        .applyInPandasWithState(
            update,
            outputStructType=_QUANT_OUTPUT,
            stateStructType=_QUANT_STATE,
            outputMode="update",
            timeoutConf=(
                GroupStateTimeout.EventTimeTimeout if timeout else GroupStateTimeout.NoTimeout
            ),
        )
    )


_DRIFT_OUTPUT = (
    "source string, window_start timestamp, n_tokens bigint, "
    "cosine double, drift double"
)
_DRIFT_STATE = "payload binary"


def windowed_drift(
    stream_df: DataFrame,
    reference_payload: bytes,
    *,
    ts_col: str = "ts",
    tokens_col: str = "tokens",
    source_col: str = "source",
    window: str = "1 hour",
    watermark: str | None = None,
) -> DataFrame:
    """Streaming token-DISTRIBUTION drift monitor: per (source, window),
    accumulate a CountSketch (sketch/ams.py) over the window's tokens
    and emit the cosine similarity between the window's frequency
    vector and a batch-built REFERENCE CountSketch — entirely from
    payloads: cos = <a,b> / sqrt(F2(a)·F2(b)), with <a,b> the unbiased
    AMS inner product and F2 the second moments. ``drift = 1 - cos`` is
    scale-invariant (a small window of the same distribution scores ~0;
    a shifted token distribution scores high), so the monitor needs no
    token dictionary, no join against the reference corpus, and O(d·w)
    state per live window regardless of stream length — the 100-TB
    guardrail that pages a human when tomorrow's crawl stops looking
    like the training distribution.

    ``reference_payload`` must be a CountSketch with the same (d, w)
    (build it in batch: AmsSketch(...).build_bytes(corpus)); dimension
    mismatch fails loudly at the first window. ``watermark`` bounds
    total state via event-time timeout, as in windowed_topk_tokens.
    """
    from ..sketch import CountSketch

    ref = CountSketch.from_bytes(reference_payload)  # validate eagerly
    d_, w_ = ref.d, ref.w

    ref_cache: dict = {}  # one deserialized reference per python worker

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        from ..sketch import CountSketch

        if state.hasTimedOut:
            state.remove()
            return
        reference = ref_cache.get("ref")
        if reference is None:
            # read-only after this (inner_product/f2 don't mutate), so
            # one parse per worker instead of one per group per batch
            reference = ref_cache["ref"] = CountSketch.from_bytes(reference_payload)
        if state.exists:
            cs = CountSketch.from_bytes(bytes(state.get[0]))
        else:
            cs = CountSketch(d_, w_)
        for pdf in pdfs:
            arrs = [
                np.asarray(a)
                for a in pdf[tokens_col].to_numpy()
                if a is not None and len(a)
            ]
            if arrs:
                cs.add_tokens(np.concatenate(arrs).astype(np.int64, copy=False))
        if cs.n_items == 0:
            return
        state.update((cs.to_bytes(),))
        if timeout:
            state.setTimeoutTimestamp(key[2])  # expire at window end
        f2w = cs.f2()
        f2r = reference.f2()
        inner = cs.inner_product(reference)
        cos = inner / np.sqrt(float(f2w) * float(f2r)) if f2w > 0 and f2r > 0 else 0.0
        cos = float(min(1.0, max(-1.0, cos)))  # estimator jitter clamp
        yield pd.DataFrame(
            {
                "source": [key[0]],
                "window_start": [key[1]],
                "n_tokens": [cs.n_items],
                "cosine": [cos],
                "drift": [1.0 - cos],
            }
        )

    from pyspark.sql import functions as F

    timeout = watermark is not None
    if timeout:
        stream_df = stream_df.withWatermark(ts_col, watermark)
    win = F.window(ts_col, window)
    windowed = stream_df.select(
        "*", win["start"].alias("window_start"), win["end"].alias("window_end")
    )
    return (
        windowed.groupBy(source_col, "window_start", "window_end")
        .applyInPandasWithState(
            update,
            outputStructType=_DRIFT_OUTPUT,
            stateStructType=_DRIFT_STATE,
            outputMode="update",
            timeoutConf=(
                GroupStateTimeout.EventTimeTimeout if timeout else GroupStateTimeout.NoTimeout
            ),
        )
    )
