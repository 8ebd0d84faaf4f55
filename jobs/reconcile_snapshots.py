#!/usr/bin/env python
"""Exact snapshot key reconciliation (spark-submit entry point).

    spark-submit --py-files dist/rusty_bloomfilter_spark.zip \
        jobs/reconcile_snapshots.py \
        --old /data/snapshot_2024_01.parquet \
        --new /data/snapshot_2024_02.parquet \
        --key doc_id [--max-diff 100000] [--max-allowed 0] \
        [--out /artifacts/reconcile.json]

The exact-key companion of jobs/compare_snapshots.py (which measures
DISTRIBUTION drift): WHICH keys disappeared and WHICH appeared between
two snapshots, recovered from two IBLT difference sketches
(sketch/iblt.py) — payload traffic O(max_diff) regardless of snapshot
size; neither key set shuffles or leaves its scan. The report a
pipeline files when a refresh must be key-accountable (retention
deletes, opt-outs, licensing removals).

--max-diff sizes the tables (default: 1/8 of the smaller snapshot's
row count, floor 1024). If the true difference exceeds it, the job
FAILS with the resize hint rather than printing a partial diff.
--max-allowed gates the exit code: exit 0 iff
|removed| + |added| <= max-allowed (default 0 — any key churn fails;
set it to the churn budget of the pipeline stage).

String keys are hashed to 60-bit ids with the repo's md5 convention
(exact on both engines; report carries the hash, joinable back to
either snapshot by recomputing it).
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
    ap.add_argument("--key", required=True, help="key column (int or string)")
    ap.add_argument("--max-diff", type=int, default=0, help="IBLT sizing bound")
    ap.add_argument("--max-allowed", type=int, default=0, help="churn budget")
    ap.add_argument("--sample-keys", type=int, default=50, help="keys listed in report")
    ap.add_argument("--out", default=None)
    ap.add_argument("--cpus", type=int, default=0, help="local[N] when no master set")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    builder = SparkSession.builder.appName("rusty_bloomfilter_spark-reconcile")
    if args.cpus:
        builder = builder.master(f"local[{args.cpus}]")
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from rusty_bloomfilter_spark.operators.reconcile import set_reconcile

    old, new = spark.read.parquet(args.old), spark.read.parquet(args.new)
    for df, name in ((old, "--old"), (new, "--new")):
        if args.key not in df.columns:
            raise SystemExit(f"{name} snapshot has no column {args.key!r}")

    def keyed(df):
        t = dict(df.dtypes)[args.key]
        c = F.col(args.key)
        if t in ("tinyint", "smallint", "int", "bigint"):
            return df.select(c.cast("long").alias("key"))
        # md5 60-bit convention (cross-engine exact, sign-safe)
        return df.select(
            F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10)
            .cast("long")
            .alias("key")
        )

    a, b = keyed(old), keyed(new)
    if args.max_diff:
        max_diff = args.max_diff
    else:
        max_diff = max(1024, min(old.count(), new.count()) // 8)

    diff = set_reconcile(a, b, "key", max_diff=max_diff)  # raises if undersized
    rows = diff.collect()
    removed = sorted(r["key"] for r in rows if r["side"] == "only_a")
    added = sorted(r["key"] for r in rows if r["side"] == "only_b")

    report = {
        "old": args.old,
        "new": args.new,
        "key": args.key,
        "max_diff": max_diff,
        "n_removed": len(removed),
        "n_added": len(added),
        "removed_sample": removed[: args.sample_keys],
        "added_sample": added[: args.sample_keys],
        "churn_budget": args.max_allowed,
        "ok": len(removed) + len(added) <= args.max_allowed,
    }
    text = json.dumps(report, indent=2, default=str)
    print(text)
    if args.out:
        Path(args.out).write_text(text)
    raise SystemExit(0 if report["ok"] else 1)


if __name__ == "__main__":
    main()
