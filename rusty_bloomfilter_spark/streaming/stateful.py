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


_SLIDING_OUTPUT = (
    "key string, window_start timestamp, trailing_est double, n_windows bigint"
)
_SLIDING_STATE = "starts array<long>, payloads array<binary>"

_UNIT_SEC = {"second": 1, "minute": 60, "hour": 3600, "day": 86400, "week": 604800}


def _duration_seconds(window: str) -> int:
    parts = window.strip().split()
    if len(parts) != 2:
        raise ValueError(f"window must look like '1 day', got {window!r}")
    n, unit = parts
    unit = unit.rstrip("s")
    if unit not in _UNIT_SEC or int(n) <= 0:
        raise ValueError(f"unsupported window {window!r}")
    return int(n) * _UNIT_SEC[unit]


def windowed_sliding_distinct(
    stream_df: DataFrame,
    *,
    key_col: str,
    ts_col: str = "ts",
    value_col: str = "user_id",
    window: str = "1 day",
    trailing: int = 7,
    p: int = 14,
) -> DataFrame:
    """Streaming TRAILING-window distinct ("7-day actives per source",
    live): for every event-time window, the distinct estimate over that
    window AND the ``trailing - 1`` before it — the stateful
    counterpart of operators/sliding.py::sliding_distinct_hll.

    Unlike ``windowed_distinct`` (state keyed per window, so no
    cross-window reach), this keys state by ``key_col`` and keeps the
    last ``2 * trailing`` windows' HLL payloads per key as group state
    (O(2·trailing·2^p) bytes per key, stream-length-independent —
    sparse wire keeps barely-filled windows small). Each micro-batch
    folds its rows into the touched windows' sketches and re-emits the
    trailing merge for every touched window (output mode update; take
    the LAST emission per (key, window), the q_streaming_windowed_topk
    convention). Register-max union is exact on states, so every
    trailing estimate keeps the plain 1.04/sqrt(2^p) bound.

    Lateness contract: rows more than ``trailing`` windows behind the
    newest window in state are DROPPED, not accepted — the acceptance
    horizon is deliberately TIGHTER than the ``2·trailing`` retention
    horizon so that every accepted window's full trailing range is
    still retained: accepting (and re-emitting) a window whose
    predecessors were already pruned would emit a degraded merge that
    OVERWRITES the earlier complete one under the last-emission-wins
    convention — the silent undercount this contract exists to
    prevent. NULL timestamps are dropped (a NaT folds to the int64
    sentinel and would fabricate a year-1677 window).

    Scale note: state concentrates per KEY — deploy keyed by a real
    entity (source, tenant). A single global key makes one state group
    the row sink; for a global trailing curve at corpus scale use the
    batch path (per-day payload merge) over checkpointed sketches.
    """
    if trailing < 1:
        raise ValueError(f"trailing must be >= 1, got {trailing}")
    win_sec = _duration_seconds(window)
    keep = 2 * trailing

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            starts_raw, payloads_raw = state.get
            windows = {
                int(s): HyperLogLog.from_bytes(bytes(b))
                for s, b in zip(starts_raw, payloads_raw)
            }
        else:
            windows = {}
        # acceptance horizon: trailing windows behind the newest in
        # state — tighter than the keep-based retention floor, so every
        # accepted window's trailing predecessors (if they ever had
        # data) are guaranteed still retained and its re-emission is
        # never a degraded merge (round-4 review finding)
        horizon_floor = max(windows) - trailing * win_sec if windows else None
        touched: set[int] = set()
        for pdf in pdfs:
            pdf = pdf[pdf[ts_col].notna()]  # NaT -> int64 sentinel window
            if not len(pdf):
                continue
            epochs = (pdf[ts_col].astype("int64") // 1_000_000_000).to_numpy()
            ws_all = epochs - (epochs % win_sec)
            vals = _series_probe_values(pdf[value_col])
            for ws in np.unique(ws_all):
                ws = int(ws)
                if horizon_floor is not None and ws < horizon_floor:
                    continue  # beyond the lateness horizon: drop, never restart
                sel = vals[ws_all == ws]
                if not len(sel):
                    continue
                windows.setdefault(ws, HyperLogLog(p)).add_tokens(sel)
                touched.add(ws)
        # emit BEFORE pruning: a wide batch may touch windows whose
        # trailing predecessors are about to fall off the retained
        # horizon, and their merge must still see everything this
        # update knows (prune-then-emit degraded old windows to
        # n_windows=1 — caught by the multi-day-batch test)
        out_ws, out_est, out_n = [], [], []
        for ws in sorted(touched):
            lo = ws - (trailing - 1) * win_sec
            acc = HyperLogLog(p)
            n = 0
            for s, h in windows.items():
                if lo <= s <= ws:
                    acc.merge_in_place(h)
                    n += 1
            out_ws.append(pd.Timestamp(ws, unit="s"))
            out_est.append(acc.estimate())
            out_n.append(n)
        if windows:
            newest = max(windows)
            floor = newest - (keep - 1) * win_sec
            windows = {s: h for s, h in windows.items() if s >= floor}
        state.update(
            (
                [int(s) for s in sorted(windows)],
                [windows[s].to_bytes() for s in sorted(windows)],
            )
        )
        if not touched:
            return
        yield pd.DataFrame(
            {
                "key": [str(key[0])] * len(out_ws),
                "window_start": out_ws,
                "trailing_est": out_est,
                "n_windows": out_n,
            }
        )

    return stream_df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=_SLIDING_OUTPUT,
        stateStructType=_SLIDING_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
