#!/usr/bin/env python
"""Snapshot-diff job (spark-submit entry point).

    spark-submit --py-files dist/rusty_bloomfilter_spark.zip \
        jobs/compare_snapshots.py \
        --old /data/snapshot_2024_01.parquet \
        --new /data/snapshot_2024_02.parquet \
        [--columns n_tok,n_chars,source] [--psi-width 16] \
        [--psi-threshold 0.25] [--out /artifacts/diff.json]

What changed between two snapshots of the same table, measured — the
report a curation pipeline files next to every refresh:

- row-count delta;
- per column (one profile pass per snapshot — exact nulls/min/max as
  observe metrics, HLL ndv in the same scan): completeness drift,
  range drift, distinct-count ratio with the sketch bound alongside;
- per NUMERIC column: the classic two-snapshot PSI
  (operators/drift.py::psi_between) over the union bin set — the
  standard stability score (rule of thumb: <0.1 stable, 0.1-0.25
  moderate, >0.25 investigate).

Exit code 0 iff no numeric column's PSI exceeds ``--psi-threshold``
(the gate direction: a silent distribution shift should fail loudly;
completeness/range regressions belong in jobs/validate_table.py).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--old", required=True)
    ap.add_argument("--new", required=True)
    ap.add_argument(
        "--columns", default=None, help="comma-separated (default: shared columns)"
    )
    ap.add_argument(
        "--psi-width",
        type=float,
        default=None,
        help="fixed bin width for every numeric column "
        "(default: ~50 bins over each column's reference range)",
    )
    ap.add_argument("--psi-threshold", type=float, default=0.25)
    ap.add_argument("--out", default=None)
    ap.add_argument("--cpus", type=int, default=0, help="local[N] when no master set")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    builder = SparkSession.builder.appName("rusty_bloomfilter_spark-snapshot-diff")
    if args.cpus:
        builder = builder.master(f"local[{args.cpus}]")
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from rusty_bloomfilter_spark.operators.drift import psi_between_multi
    from rusty_bloomfilter_spark.operators.profile import profile_table

    old, new = spark.read.parquet(args.old), spark.read.parquet(args.new)
    if args.columns:
        cols = [c for c in args.columns.split(",") if c]
    else:
        cols = [c for c in old.columns if c in set(new.columns)]
    missing = [c for c in cols if c not in old.columns or c not in new.columns]
    if missing:
        raise SystemExit(f"columns absent from a snapshot: {missing}")

    p_old = {p.column: p for p in profile_table(old, cols)}
    p_new = {p.column: p for p in profile_table(new, cols)}
    numeric = {
        f.name
        for f in old.schema.fields
        if f.name in cols and f.dataType.typeName() in
        ("byte", "short", "integer", "long", "float", "double")
    }

    report: dict = {
        "old": args.old,
        "new": args.new,
        "rows_old": next(iter(p_old.values())).n_rows if p_old else old.count(),
        "rows_new": next(iter(p_new.values())).n_rows if p_new else new.count(),
        "columns": {},
    }
    # per-column bin widths: --psi-width if given, else ~50 bins over
    # the reference range (sub-integer columns need fractional widths —
    # a fixed integer width would collapse a [0,1] score into one bin)
    widths: dict[str, float] = {}
    for c in numeric:
        if args.psi_width is not None:
            widths[c] = args.psi_width
        else:
            a = p_old[c]
            if a.min_value is None or a.max_value is None:
                continue  # all-NULL reference: no binnable range
            span = float(a.max_value) - float(a.min_value)
            widths[c] = span / 50.0 if span > 0 else 1.0
    # ONE aggregate per snapshot for every numeric column together
    psis = psi_between_multi(old, new, widths) if widths else {}
    worst_psi = 0.0
    for c in cols:
        a, b = p_old[c], p_new[c]
        entry = {
            "null_fraction_old": a.null_fraction,
            "null_fraction_new": b.null_fraction,
            "min_old": a.min_value, "min_new": b.min_value,
            "max_old": a.max_value, "max_new": b.max_value,
            "ndv_old": a.ndv_est, "ndv_new": b.ndv_est,
            "ndv_ratio": (b.ndv_est / a.ndv_est) if a.ndv_est else None,
            "ndv_rel_error": a.ndv_rel_error,
        }
        if c in psis:
            entry["psi"] = psis[c]
            entry["psi_bin_width"] = widths[c]
            worst_psi = max(worst_psi, psis[c])
        report["columns"][c] = entry
    report["worst_psi"] = worst_psi
    report["psi_threshold"] = args.psi_threshold
    report["stable"] = worst_psi <= args.psi_threshold

    payload = json.dumps(report, indent=2, default=str)
    if args.out:
        Path(args.out).write_text(payload)
    print(payload)
    spark.stop()
    raise SystemExit(0 if report["stable"] else 1)


if __name__ == "__main__":
    main()
