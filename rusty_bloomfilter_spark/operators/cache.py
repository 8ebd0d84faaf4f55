"""Persisted-intermediate lifecycle.

Several operators persist an intermediate frame because a self-join on
a mapInArrow/applyInPandas output recomputes the producing stage per
join side (Spark 4.1; see CLAUDE.md). The persist is required by the
plan, but without a lifecycle each call would leak a cached RDD for
the session's lifetime. This module ties every returned DataFrame to
its persisted dependencies:

- ``tie(result, *deps)`` records the deps and installs a weakref
  finalizer: when the RESULT DataFrame is garbage-collected, its deps
  unpersist (non-blocking) — long-running pipelines stop accumulating
  executor storage even when callers never think about caching.
- ``free(result)`` unpersists the deps explicitly, for deterministic
  cleanup once the caller has materialized (collected / written) the
  result. After ``free`` the result stays CORRECT but re-materializing
  it recomputes the producing stage per join side.
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame

_FINALIZERS: "weakref.WeakKeyDictionary[DataFrame, weakref.finalize]" = (
    weakref.WeakKeyDictionary()
)


def _unpersist_all(deps: list[DataFrame]) -> None:
    for d in deps:
        try:
            d.unpersist(blocking=False)
        except Exception:
            pass  # session already stopped; nothing to free


def tie(result: DataFrame, *deps: DataFrame) -> DataFrame:
    """Return ``result`` with ``deps`` scheduled for unpersist when the
    result is garbage-collected (or ``free``d explicitly)."""
    fin = weakref.finalize(result, _unpersist_all, list(deps))
    fin.atexit = False  # never block interpreter shutdown on the JVM
    _FINALIZERS[result] = fin
    return result


def free(result: DataFrame) -> None:
    """Unpersist the persisted dependencies tied to ``result`` now.
    No-op for DataFrames with no tied deps."""
    fin = _FINALIZERS.pop(result, None)
    if fin is not None:
        fin()
