#!/usr/bin/env python
"""Bloom semi-join job: filter a table by membership in a saved filter.

    spark-submit --py-files dist/rusty_bloomfilter_spark.zip \
        jobs/probe_bloom.py --filter /artifacts/corpus.bloom \
        --input /data/candidates.parquet --col token \
        --out /data/matched.parquet [--mode rows|stats]

`rows` writes the rows whose `col` might be in the filter (zero false
negatives; FPR bounded by the filter's configured p). `stats` only
reports hit counts — the cheap diagnostic pass.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--filter", required=True, help="saved sketch payload file")
    ap.add_argument("--input", required=True)
    ap.add_argument("--col", required=True)
    ap.add_argument("--out", default=None)
    ap.add_argument("--mode", choices=["rows", "stats"], default="stats")
    ap.add_argument("--cpus", type=int, default=0)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    builder = SparkSession.builder.appName("rusty_bloomfilter_spark-probe")
    if args.cpus:
        builder = builder.master(f"local[{args.cpus}]")
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from rusty_bloomfilter_spark.operators.sketches import BlockedBloomSketch, BloomSketch
    from rusty_bloomfilter_spark.sketch import BlockedBloomFilter, sketch_from_bytes

    payload = open(args.filter, "rb").read()
    filt = sketch_from_bytes(payload)
    sk_cls = BlockedBloomSketch if isinstance(filt, BlockedBloomFilter) else BloomSketch
    sk = (
        BlockedBloomSketch(filt, col=args.col, scalar=True)
        if sk_cls is BlockedBloomSketch
        else BloomSketch(filt.shape, col=args.col, scalar=True)
    )

    df = spark.read.parquet(args.input)
    if args.mode == "rows":
        probe = sk.might_contain_udf(payload, spark)
        matched = df.filter(probe(F.col(args.col)))
        matched.write.mode("overwrite").parquet(args.out)
        stats = {"rows_in": df.count(), "rows_matched": matched.count(), "out": args.out}
    else:
        hits, total = sk.count_contained(
            df.select(F.col(args.col).alias(args.col)), payload, spark
        )
        stats = {"probes": total, "hits": hits, "hit_rate": round(hits / max(total, 1), 8)}
    print(json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    main()
