#!/usr/bin/env python
"""Data-quality gate job (spark-submit entry point).

    spark-submit --py-files dist/rusty_bloomfilter_spark.zip \
        jobs/validate_table.py \
        --input /data/snapshot.parquet \
        [--require-complete doc_id,text] [--unique doc_id] \
        [--row-count-min 1000] [--row-count-max 1000000000000] \
        [--value-range 'n_tok:1:100000'] [--ndv-range 'lang:1:500'] \
        [--checks /specs/checks.json] [--out /artifacts/report.json]

ONE profile pass over the snapshot (operators/validate.py /
operators/profile.py: exact stats as observe metrics, HLL estimates in
the same scan) evaluates every declared constraint and emits a
machine-readable report. Exit code 0 iff every check passed — the job
a pipeline puts between "snapshot landed" and "downstream may read it".

``--checks`` takes a JSON file with a list of objects:
    {"kind": "completeness", "column": "doc_id", "min_fraction": 1.0}
    {"kind": "value_range", "column": "n_tok", "lo": 1, "hi": 100000}
    {"kind": "row_count", "lo": 1000}
    {"kind": "approx_ndv", "column": "lang", "lo": 1, "hi": 500}
    {"kind": "approx_unique", "column": "doc_id", "min_ratio": 1.0}
The convenience flags append to that list.
"""

from __future__ import annotations

import argparse
import json
import sys
from dataclasses import asdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _build_checks(args) -> list:
    from rusty_bloomfilter_spark.operators.validate import (
        ApproxNdvRange,
        ApproxUniqueness,
        Completeness,
        RowCount,
        ValueRange,
    )

    kinds = {
        "completeness": lambda s: Completeness(
            s["column"], float(s.get("min_fraction", 1.0))
        ),
        "value_range": lambda s: ValueRange(
            s["column"],
            None if s.get("lo") is None else float(s["lo"]),
            None if s.get("hi") is None else float(s["hi"]),
        ),
        "row_count": lambda s: RowCount(
            int(s.get("lo", 1)), None if s.get("hi") is None else int(s["hi"])
        ),
        "approx_ndv": lambda s: ApproxNdvRange(
            s["column"], float(s["lo"]), float(s["hi"])
        ),
        "approx_unique": lambda s: ApproxUniqueness(
            s["column"], float(s.get("min_ratio", 1.0))
        ),
    }
    checks = []
    if args.checks:
        for spec in json.loads(Path(args.checks).read_text()):
            checks.append(kinds[spec["kind"]](spec))
    for col in filter(None, (args.require_complete or "").split(",")):
        checks.append(kinds["completeness"]({"column": col}))
    for col in filter(None, (args.unique or "").split(",")):
        checks.append(kinds["approx_unique"]({"column": col}))
    if args.row_count_min is not None or args.row_count_max is not None:
        lo = 1 if args.row_count_min is None else args.row_count_min  # 0 is valid
        checks.append(kinds["row_count"]({"lo": lo, "hi": args.row_count_max}))
    for spec in args.value_range or []:
        col, lo, hi = spec.split(":")
        checks.append(
            kinds["value_range"](
                {"column": col, "lo": lo or None, "hi": hi or None}
            )
        )
    for spec in args.ndv_range or []:
        col, lo, hi = spec.split(":")
        checks.append(kinds["approx_ndv"]({"column": col, "lo": lo, "hi": hi}))
    if not checks:
        raise SystemExit("no checks declared (see --help)")
    return checks


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--checks", default=None, help="JSON spec file")
    ap.add_argument("--require-complete", default=None, help="comma-separated columns")
    ap.add_argument("--unique", default=None, help="comma-separated columns")
    ap.add_argument("--row-count-min", type=int, default=None)
    ap.add_argument("--row-count-max", type=int, default=None)
    ap.add_argument(
        "--value-range", action="append", default=None, help="col:lo:hi (empty = open)"
    )
    ap.add_argument("--ndv-range", action="append", default=None, help="col:lo:hi")
    ap.add_argument("--out", default=None, help="write JSON here (default: stdout)")
    ap.add_argument("--cpus", type=int, default=0, help="local[N] when no master set")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    builder = SparkSession.builder.appName("rusty_bloomfilter_spark-validate")
    if args.cpus:
        builder = builder.master(f"local[{args.cpus}]")
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from rusty_bloomfilter_spark.operators.validate import validate_table

    df = spark.read.parquet(args.input)
    results = validate_table(df, _build_checks(args))
    report = {
        "input": args.input,
        "passed": all(r.passed for r in results),
        "n_checks": len(results),
        "n_failed": sum(not r.passed for r in results),
        "results": [asdict(r) for r in results],
    }
    payload = json.dumps(report, indent=2, default=str)
    if args.out:
        Path(args.out).write_text(payload)
    print(payload)
    spark.stop()
    raise SystemExit(0 if report["passed"] else 1)


if __name__ == "__main__":
    main()
