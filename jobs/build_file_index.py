#!/usr/bin/env python
"""Per-file pruning-index builder/prober (spark-submit entry point).

    # build: one index row per parquet file of --input
    spark-submit --py-files dist/rusty_bloomfilter_spark.zip \
        jobs/build_file_index.py build \
        --input /data/table --index /artifacts/table.bloomidx \
        --kind bloom --key-col o_orderkey [--n-per-file 250000] [--p 0.001]

    # probe: which files might contain any of the keys?
    spark-submit ... jobs/build_file_index.py probe \
        --input /data/table --index /artifacts/table.bloomidx \
        --key-col o_orderkey --keys 42,99,123 [--verify]

The operational face of the file-skipping family
(operators/pruning.py + operators/zonemap.py): build once per
snapshot, store the index NEXT TO the data as a parquet artifact
(checkpoint-shaped: file, payload/stats, n_items, n_rows), probe at
query time to open a handful of files instead of the corpus.

Index kinds and when to pick each:
- ``bloom`` — mergeable, map-side build (no row shuffle), p
  configurable; re-layouts OR-merge via compact_index.
- ``xor``   — STATIC, ~15% smaller at FPR 2^-16 with flat 3-probe
  lookups; build shuffles (file, key) rows once; rebuild per layout,
  never merge.
- ``zone``  — exact min/max ranges (the RANGE predicate companion);
  built map-side from the scan, or from parquet footers alone via
  zone_index_from_footers when the data was already written.

``probe --verify`` re-runs the lookup as a full-scan IN filter and
asserts row equality — the zero-false-negative contract, checked
against production data on demand.

Exit codes: build 0 on success; probe 0 (verify passed or skipped),
2 (verify mismatch — index is STALE relative to the data: rebuild).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def build_index(spark, input_path: str, kind: str, key_col: str, *, n_per_file: int, p: float):
    from rusty_bloomfilter_spark.operators.pruning import (
        bloom_file_index,
        xor_file_index,
    )
    from rusty_bloomfilter_spark.operators.zonemap import zone_map_index
    from rusty_bloomfilter_spark.sketch import Shape

    df = spark.read.parquet(input_path)
    if kind == "bloom":
        return bloom_file_index(df, Shape.for_np(n_per_file, p), key_col=key_col)
    if kind == "xor":
        return xor_file_index(df, key_col=key_col)
    if kind == "zone":
        return zone_map_index(df, col=key_col)
    raise ValueError(f"unknown index kind {kind!r} (bloom|xor|zone)")


def probe_index(
    spark, input_path: str, index_path: str, key_col: str, keys: list[int],
    *, verify: bool, lower=None, upper=None,
):
    """Returns (report dict, ok bool). Membership probe (``keys``) for
    bloom/xor indexes; range probe (``lower``/``upper``) for zone
    indexes — the schema of the artifact decides which is legal."""
    from pyspark.sql import functions as F

    from rusty_bloomfilter_spark.operators.pruning import bloom_pruned_read
    from rusty_bloomfilter_spark.operators.zonemap import zone_pruned_read

    index = spark.read.parquet(index_path)
    total_files = index.select("file").distinct().count()
    if "payload" in index.columns:
        if not keys:
            raise ValueError("membership index: probe with --keys")
        rows, files_read = bloom_pruned_read(
            spark, input_path, index, keys, key_col=key_col
        )
    else:
        if lower is None and upper is None:
            raise ValueError("zone index: probe with --lo/--hi range bounds")
        rows, files_read = zone_pruned_read(
            spark, input_path, index, col=key_col, lower=lower, upper=upper
        )
    report = {
        "total_files": total_files,
        "files_read": files_read,
        "prune_ratio": round(1.0 - files_read / total_files, 4) if total_files else 0.0,
        "n_keys": len(keys),
    }
    ok = True
    if verify:
        base = spark.read.parquet(input_path)
        if "payload" in index.columns:
            full = base.filter(F.col(key_col).isin([int(k) for k in keys]))
        else:
            cond = F.lit(True)
            if lower is not None:
                cond = cond & (F.col(key_col) >= F.lit(lower))
            if upper is not None:
                cond = cond & (F.col(key_col) <= F.lit(upper))
            full = base.filter(cond)
        n_pruned = rows.count()
        n_full = full.count()
        report["verify"] = {"pruned_rows": n_pruned, "full_scan_rows": n_full}
        ok = n_pruned == n_full
    else:
        report["matched_rows"] = rows.count()
    return report, ok


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["build", "probe"])
    ap.add_argument("--input", required=True, help="data parquet path")
    ap.add_argument("--index", required=True, help="index artifact parquet path")
    ap.add_argument("--key-col", required=True)
    ap.add_argument("--kind", default="bloom", choices=["bloom", "xor", "zone"])
    ap.add_argument("--n-per-file", type=int, default=250_000)
    ap.add_argument("--p", type=float, default=0.001)
    ap.add_argument("--keys", default="", help="comma-separated probe keys")
    # int-first parsing: float bounds on a BIGINT key silently round at
    # 2^53 and --verify can't catch it (both filters use the same
    # rounded literal) — the false-negative class CLAUDE.md guards
    def _num(v: str):
        try:
            return int(v)
        except ValueError:
            return float(v)

    ap.add_argument("--lo", type=_num, default=None, help="zone range lower bound (numeric)")
    ap.add_argument("--hi", type=_num, default=None, help="zone range upper bound (numeric)")
    ap.add_argument("--verify", action="store_true")
    ap.add_argument("--cpus", type=int, default=0, help="local[N] when no master set")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    builder = SparkSession.builder.appName("rusty_bloomfilter_spark-file-index")
    if args.cpus:
        builder = builder.master(f"local[{args.cpus}]")
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if args.mode == "build":
        idx = build_index(
            spark, args.input, args.kind, args.key_col,
            n_per_file=args.n_per_file, p=args.p,
        )
        idx.write.mode("overwrite").parquet(args.index)
        summary = spark.read.parquet(args.index).agg(
            {"n_rows": "sum", "file": "count"}
        ).collect()[0]
        print(json.dumps({
            "kind": args.kind,
            "index_rows": summary["count(file)"],
            "data_rows_indexed": summary["sum(n_rows)"],
        }))
        raise SystemExit(0)

    keys = [int(k) for k in args.keys.split(",") if k.strip()]
    if not keys and args.lo is None and args.hi is None:
        raise SystemExit("probe mode needs --keys (membership) or --lo/--hi (zone)")
    report, ok = probe_index(
        spark, args.input, args.index, args.key_col, keys,
        verify=args.verify, lower=args.lo, upper=args.hi,
    )
    print(json.dumps(report))
    raise SystemExit(0 if ok else 2)


if __name__ == "__main__":
    main()
