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
            vals = pdf[value_col].to_numpy(dtype=np.int64, na_value=0)
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
