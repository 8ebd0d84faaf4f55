"""Declarative data-quality validation in ONE corpus scan.

The gate a training-data pipeline runs on every snapshot before any
downstream job trusts it (the Deequ / Great-Expectations role, public
designs both): declare constraints, evaluate them all in a single
pass, get back an auditable report frame. At 100 TB the discipline is
the same as operators/profile.py — the validation job must cost one
read:

- EXACT constraints (row count, completeness, min/max value bounds)
  are evaluated from the ``df.observe`` metrics that ride the profile
  scan — zero extra jobs, Catalyst aggregates, no row reaches Python.
- APPROXIMATE constraints (distinct-count ranges, uniqueness ratios)
  are evaluated from the HLL estimates folded into the SAME pass via
  aggregate.build_multi, and are bound-AWARE: a check only fails when
  the estimate is outside the allowed range by more than the sketch's
  published error slack (4 x 1.04/sqrt(2^p)), so a failing approximate
  check is a real violation, not sketch noise. Results carry
  ``exact=False`` so a report consumer can always tell which kind of
  evidence it is looking at.

Reference parity: validation is an extension beyond /root/reference;
the approximate checks inherit the mergeable-HLL machinery whose
algebra the reference pins for Bloom (mod.rs:621-761 merge matrices).
Contract q_psi_drift / q_data_validation + tests/test_validate.py pin
the behavior; the exact half hash-matches a DuckDB oracle re-deriving
every metric from plain SQL aggregates.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

from .profile import ColumnProfile, profile_table


@dataclass(frozen=True)
class Completeness:
    """Non-null fraction of ``column`` must be >= ``min_fraction``."""

    column: str
    min_fraction: float = 1.0


@dataclass(frozen=True)
class ValueRange:
    """Exact min/max of ``column`` must lie within [lo, hi]; either
    bound may be None (unchecked). Emits one result row per declared
    bound (``value_min`` / ``value_max``)."""

    column: str
    lo: float | None = None
    hi: float | None = None


@dataclass(frozen=True)
class RowCount:
    """Table row count in [lo, hi] (hi None = unbounded)."""

    lo: int = 1
    hi: int | None = None


@dataclass(frozen=True)
class ApproxNdvRange:
    """HLL distinct-count of ``column`` within [lo, hi], padded by the
    sketch's published error so only real violations fail."""

    column: str
    lo: float
    hi: float


@dataclass(frozen=True)
class ApproxUniqueness:
    """ndv / non-null-count of ``column`` >= ``min_ratio`` (1.0 = key
    candidate), padded by the HLL error slack."""

    column: str
    min_ratio: float = 1.0


Check = Completeness | ValueRange | RowCount | ApproxNdvRange | ApproxUniqueness


@dataclass(frozen=True)
class CheckResult:
    check: str          # kind: completeness / value_min / value_max / ...
    column: str         # "" for table-level checks
    observed: float
    lo: float | None
    hi: float | None
    passed: bool
    exact: bool         # False = sketch-backed with bound slack applied


def _require(profiles: dict[str, ColumnProfile], column: str) -> ColumnProfile:
    if column not in profiles:
        raise KeyError(f"no profile for column {column!r}")
    return profiles[column]


def validate_table(df: DataFrame, checks: list[Check]) -> list[CheckResult]:
    """Evaluate every check from ONE profile pass over ``df``.

    Returns results in check-declaration order (ValueRange expands to
    one row per declared bound). Raises on checks naming columns the
    frame lacks, and on ValueRange over all-NULL or non-numeric-
    orderable columns (no min/max to compare).
    """
    columns: list[str] = []
    for c in checks:
        col = getattr(c, "column", None)
        if col is not None and col not in columns:
            if col not in df.columns:
                raise KeyError(f"check references missing column {col!r}")
            columns.append(col)
    if columns:
        profiles = {p.column: p for p in profile_table(df, columns)}
        n_rows = next(iter(profiles.values())).n_rows
    else:
        # RowCount-only suite: one exact count, no profile pass (the
        # first column might be a type profile_table doesn't handle)
        profiles = {}
        n_rows = df.count()

    out: list[CheckResult] = []
    for c in checks:
        if isinstance(c, Completeness):
            prof = _require(profiles, c.column)
            frac = 1.0 - prof.null_fraction if n_rows else 0.0
            out.append(
                CheckResult("completeness", c.column, frac,
                            c.min_fraction, None, frac >= c.min_fraction, True)
            )
        elif isinstance(c, ValueRange):
            prof = _require(profiles, c.column)
            if c.lo is None and c.hi is None:
                raise ValueError(f"ValueRange({c.column}) declares no bound")
            if prof.min_value is None:
                raise ValueError(
                    f"ValueRange({c.column}): column is all NULL or unordered"
                )
            if c.lo is not None:
                v = float(prof.min_value)
                out.append(
                    CheckResult("value_min", c.column, v, float(c.lo), None,
                                v >= float(c.lo), True)
                )
            if c.hi is not None:
                v = float(prof.max_value)
                out.append(
                    CheckResult("value_max", c.column, v, None, float(c.hi),
                                v <= float(c.hi), True)
                )
        elif isinstance(c, RowCount):
            hi = float(c.hi) if c.hi is not None else None
            ok = n_rows >= c.lo and (c.hi is None or n_rows <= c.hi)
            out.append(
                CheckResult("row_count", "", float(n_rows), float(c.lo), hi,
                            ok, True)
            )
        elif isinstance(c, ApproxNdvRange):
            prof = _require(profiles, c.column)
            slack = 4.0 * prof.ndv_rel_error
            est = prof.ndv_est
            # padded estimate interval must intersect [lo, hi]
            ok = est * (1.0 + slack) >= c.lo and est / (1.0 + slack) <= c.hi
            out.append(
                CheckResult("approx_ndv", c.column, est, float(c.lo),
                            float(c.hi), ok, False)
            )
        elif isinstance(c, ApproxUniqueness):
            prof = _require(profiles, c.column)
            nonnull = n_rows - prof.n_nulls
            ratio = prof.ndv_est / nonnull if nonnull else 0.0
            slack = 4.0 * prof.ndv_rel_error
            ok = ratio * (1.0 + slack) >= c.min_ratio
            out.append(
                CheckResult("approx_uniqueness", c.column, ratio,
                            float(c.min_ratio), None, ok, False)
            )
        else:  # pragma: no cover - exhaustive over Check
            raise TypeError(f"unknown check type {type(c).__name__}")
    return out
