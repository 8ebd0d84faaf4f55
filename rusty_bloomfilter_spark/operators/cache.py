"""Persisted-intermediate lifecycle.

Several operators persist an intermediate frame because a self-join on
a mapInArrow/applyInPandas output recomputes the producing stage per
join side (Spark 4.1; see CLAUDE.md). The persist is required by the
plan, but without a lifecycle each call would leak a cached RDD for
the session's lifetime. This module ties every returned DataFrame to
its persisted dependencies:

- ``tie(result, *deps)`` stores the deps on the result object and in a
  bounded FIFO of live dep-sets. When more than ``MAX_LIVE`` tied
  results exist, the OLDEST dep-set is unpersisted — so a long-running
  pipeline's cached-RDD footprint is bounded by the newest MAX_LIVE
  operator calls, while the frames a just-built plan needs stay
  persisted through materialization.
- ``free(result)`` unpersists the deps explicitly, for deterministic
  cleanup once the caller has materialized (collected / written) the
  result. After ``free`` the result stays CORRECT but re-materializing
  it recomputes the producing stage per join side.

A GC finalizer on the returned wrapper was tried and REVERTED: callers
chain transformations off the result (``minhash_dedup(df).orderBy(...)``),
so the tied wrapper is garbage-collected at plan-construction time and
the deps would unpersist before any action runs — silently nullifying
the persist the self-join plan requires. Lifetime here is therefore
call-ordered (FIFO cap), not GC-ordered.
"""

from __future__ import annotations

import os
import threading
from collections import deque

from pyspark.sql import DataFrame

_DEPS_ATTR = "_rbf_tied_deps"

# Bounded FIFO of (deps list) for live tied results, oldest first.
# NOTE: eviction is call-ordered, not materialization-ordered — a driver
# that constructs more than MAX_LIVE tied plans before running any action
# loses the oldest persist (recompute on use, never wrong results). Size
# the cap to the pipeline's plan fan-out via RBF_CACHE_MAX_LIVE or
# set_max_live() when that pattern applies.
MAX_LIVE = int(os.environ.get("RBF_CACHE_MAX_LIVE", "8"))
_LIVE: deque[list[DataFrame]] = deque()
_LOCK = threading.Lock()  # multi-threaded drivers share the FIFO


def set_max_live(n: int) -> None:
    """Resize the live-dep-set cap (evicting oldest if shrinking)."""
    global MAX_LIVE
    evicted: list[list[DataFrame]] = []
    with _LOCK:
        MAX_LIVE = int(n)
        while len(_LIVE) > MAX_LIVE:
            evicted.append(_LIVE.popleft())
    for deps in evicted:
        _unpersist_all(deps)


def _unpersist_all(deps: list[DataFrame]) -> None:
    for d in deps:
        try:
            d.unpersist(blocking=False)
        except Exception:
            pass  # session already stopped; nothing to free


def tie(result: DataFrame, *deps: DataFrame) -> DataFrame:
    """Return ``result`` with ``deps`` registered for bounded-lifetime
    unpersist (evicted FIFO after MAX_LIVE further tied calls, or
    freed explicitly via ``free``)."""
    dep_list = list(deps)
    setattr(result, _DEPS_ATTR, dep_list)
    evicted: list[list[DataFrame]] = []
    with _LOCK:
        _LIVE.append(dep_list)
        while len(_LIVE) > MAX_LIVE:
            evicted.append(_LIVE.popleft())
    for deps_ in evicted:  # unpersist outside the lock (py4j call)
        _unpersist_all(deps_)
    return result


def free(result: DataFrame) -> None:
    """Unpersist the persisted dependencies tied to ``result`` now.
    No-op for DataFrames with no tied deps."""
    dep_list = getattr(result, _DEPS_ATTR, None)
    if dep_list is None:
        return
    with _LOCK:
        try:
            _LIVE.remove(dep_list)
        except ValueError:
            pass  # already evicted by the FIFO cap
    _unpersist_all(dep_list)
    delattr(result, _DEPS_ATTR)
