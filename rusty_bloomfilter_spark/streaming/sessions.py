"""Streaming gap-based sessionization via ``applyInPandasWithState``.

The stateful counterpart of the batch sessionize query (contract
q_sessionize): per key, events within ``gap`` of the previous event
belong to the same session. State per key is O(1) — just the OPEN
session's (start, last_ts, n_events) — stream-length-independent,
which is the whole point: the batch formulation needs the full
per-user history under a window sort; the stream needs three numbers.

Emission protocol (what makes the replay hash-matchable against batch
SQL): every micro-batch emits (a) each session CLOSED by this batch's
events, final, and (b) the still-open session's current snapshot.
Snapshots of the same session share their ``session_start_us`` key and
grow monotonically in (end, n), so "last emission per (key, start)
wins" — the post-replay reduction ``groupBy(key, start).agg(max(end),
max(n))`` — reconstructs exactly the batch result. Correctness needs
arrival to respect event time ACROSS batches per key (a time-ordered
replay / watermarked source); within a batch any order is fine (the
update sorts).

Timestamps travel as BIGINT MICROSECONDS end to end (Spark
``unix_micros`` == DuckDB ``epoch_us`` on the same parquet values) —
no double rounding, no timezone, exact cross-engine hashes. Gap
boundary: ``next - last <= gap_us`` extends, strictly greater closes
(identical to the lag-window batch formulation).

Reference parity: beyond /root/reference (no streaming); completes the
sessionize surface (batch q_sessionize / operators.markov session
breaks) with the bounded-state streaming form.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUT_SCHEMA = (
    "user_id bigint, session_start_us bigint, session_end_us bigint, n_events bigint"
)
_STATE_SCHEMA = "start_us bigint, last_us bigint, n bigint"


def streaming_sessionize(
    stream_df: DataFrame,
    *,
    key_col: str,
    ts_us_col: str,
    gap_us: int,
) -> DataFrame:
    """Sessionize a stream of (key, ts_us) rows; emits closed sessions
    finally and the open session's snapshot each batch (see module
    docstring for the exactly-once reduction)."""
    if gap_us <= 0:
        raise ValueError(f"gap_us must be positive, got {gap_us}")

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        ts: list[int] = []
        for pdf in pdfs:
            ts.extend(int(v) for v in pdf[ts_us_col].dropna())
        if not ts:
            return
        ts.sort()
        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = ts[0], ts[0] - gap_us - 1, 0  # forces "new"
        out_start, out_end, out_n = [], [], []
        for t in ts:
            if t - last <= gap_us and n > 0:
                last = t
                n += 1
            else:
                if n > 0:  # close the previous session, final emission
                    out_start.append(start)
                    out_end.append(last)
                    out_n.append(n)
                start, last, n = t, t, 1
        # snapshot of the still-open session (superseded by a later
        # emission with the same start if it grows or closes)
        out_start.append(start)
        out_end.append(last)
        out_n.append(n)
        state.update((start, last, n))
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(out_start),
                "session_start_us": out_start,
                "session_end_us": out_end,
                "n_events": out_n,
            }
        )

    return stream_df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def finalize_sessions(emitted: DataFrame) -> DataFrame:
    """Reduce replayed emissions to the final session table: last
    snapshot per (key, session_start) — monotone in (end, n), so max
    is exact."""
    return emitted.groupBy("user_id", "session_start_us").agg(
        F.max("session_end_us").alias("session_end_us"),
        F.max("n_events").alias("n_events"),
    )
