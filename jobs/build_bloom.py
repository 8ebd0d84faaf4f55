#!/usr/bin/env python
"""Resumable Bloom-build job (spark-submit entry point).

    spark-submit --py-files dist/rusty_bloomfilter_spark.zip \
        jobs/build_bloom.py \
        --input /data/sequences.parquet --ckpt /ckpt/bloom_job1 \
        --out /artifacts/corpus.bloom --n 1000000000 --p 1e-4 \
        [--kind blocked|classic] [--ngram 1] [--col tokens] [--cpus N]

Builds one filter over the token (n-gram) stream of a sequences table,
checkpointing one sketch row per input file (resume skips finished
files), and writes the merged filter + a metrics JSON (sketch bytes,
fill ratio, estimate, lineage counts) next to it.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--n", type=float, required=True, help="expected distinct items")
    ap.add_argument("--p", type=float, default=1e-4, help="target FPR")
    ap.add_argument("--kind", choices=["blocked", "classic"], default="blocked")
    ap.add_argument("--ngram", type=int, default=1)
    ap.add_argument("--col", default="tokens")
    ap.add_argument("--fanout", type=int, default=16)
    ap.add_argument("--cpus", type=int, default=0, help="local[N] when no master set")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    builder = SparkSession.builder.appName("rusty_bloomfilter_spark-build-bloom")
    if args.cpus:  # convenience for local runs; on a cluster the master
        builder = builder.master(f"local[{args.cpus}]")  # comes from spark-submit
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from rusty_bloomfilter_spark.operators.checkpoint import build_with_checkpoint
    from rusty_bloomfilter_spark.operators.sketches import BlockedBloomSketch, BloomSketch
    from rusty_bloomfilter_spark.sketch import (
        merge_sketch_payloads,
        sketch_from_bytes,
    )

    if args.kind == "blocked":
        sk = BlockedBloomSketch.for_np(n=int(args.n), p=args.p, col=args.col, ngram=args.ngram)
    else:
        sk = BloomSketch.for_np(n=int(args.n), p=args.p, col=args.col, ngram=args.ngram)

    report = build_with_checkpoint(
        spark,
        args.input,
        args.ckpt,
        sk._empty,
        sk._update,
        merge_sketch_payloads,
        columns=[args.col],
        fanout=args.fanout,
    )

    os.makedirs(os.path.dirname(os.path.abspath(args.out)) or ".", exist_ok=True)
    with open(args.out, "wb") as fh:
        fh.write(report.payload)
    filt = sketch_from_bytes(report.payload)
    metrics = {
        **report.metrics(),
        "kind": args.kind,
        "ngram": args.ngram,
        "fill_ratio": round(filt.fill_ratio(), 6),
        "estimate_n_distinct": round(filt.estimate_n(), 1),
        "configured_p": args.p,
        # duplicates add no bits: predict FPR at the estimated DISTINCT load
        "predicted_fpr_at_distinct": (
            filt.false_positives(int(filt.estimate_n()))
            if hasattr(filt, "false_positives")
            else filt.shape.false_positives(int(filt.estimate_n()))
        ),
    }
    with open(args.out + ".metrics.json", "w") as fh:
        json.dump(metrics, fh, indent=2)
    print(json.dumps(metrics))
    spark.stop()


if __name__ == "__main__":
    main()
