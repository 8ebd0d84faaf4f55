#!/usr/bin/env python
"""Shuffle/join planning job (spark-submit entry point).

    spark-submit --py-files dist/rusty_bloomfilter_spark.zip \
        jobs/plan_shuffle.py \
        --input /data/facts.parquet --key user_id \
        [--right /data/dim.parquet --right-key user_id] \
        [--partitions 2000] [--out /artifacts/plan.json] [--cpus N]

ONE fused sketch scan per input (CountSketch F2 + HLL ndv + Misra-Gries
hot keys; sketch rows only shuffle — the key itself never does) emits a
machine-readable physical-planning artifact:

- single input:  the skew profile + per-key salting plan
  (operators/skew.py) for a groupBy/shuffle on --key;
- with --right:  the join advice (operators/advisor.py) —
  broadcast / shuffle / shuffle_salted, salt fan-out, and the CMS
  inner-product join-size estimate;
- with --lsh-threshold: additionally, the MinHash-LSH band/row plan
  (operators/dedup.py::lsh_plan) for a near-dup pass at that target
  Jaccard — pure driver arithmetic, no extra jobs.

The JSON is the artifact a pipeline persists next to its data so every
downstream job (and every human) can see WHY a shuffle was salted or a
side broadcast — measured planning, not guessed.
"""

from __future__ import annotations

import argparse
import json
import sys
from dataclasses import asdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--key", required=True, help="scalar int shuffle/join key column")
    ap.add_argument("--right", default=None, help="optional join right side")
    ap.add_argument("--right-key", default=None, help="right key column (default: --key)")
    ap.add_argument("--partitions", type=int, default=200)
    ap.add_argument("--overload", type=float, default=2.0)
    ap.add_argument("--broadcast-rows", type=int, default=1_000_000)
    ap.add_argument(
        "--lsh-threshold",
        type=float,
        default=None,
        help="also emit an LSH (bands, rows) plan for this target Jaccard",
    )
    ap.add_argument("--lsh-hashes", type=int, default=128)
    ap.add_argument(
        "--lsh-fp-weight",
        type=float,
        default=1.0,
        help="candidate-volume weight: raise when the LSH self-join shuffle is the bottleneck",
    )
    ap.add_argument("--out", default=None, help="write JSON here (default: stdout)")
    ap.add_argument("--cpus", type=int, default=0, help="local[N] when no master set")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    builder = SparkSession.builder.appName("rusty_bloomfilter_spark-plan-shuffle")
    if args.cpus:
        builder = builder.master(f"local[{args.cpus}]")
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    left = spark.read.parquet(args.input)
    report: dict = {"input": args.input, "key": args.key, "partitions": args.partitions}

    if args.right is None:
        from rusty_bloomfilter_spark.operators.skew import key_skew_profile

        prof = key_skew_profile(left, args.key)
        plan = prof.salting_plan(args.partitions, overload=args.overload)
        report.update(
            {
                "mode": "skew_profile",
                "n_rows": prof.n_rows,
                "f2_est": prof.f2_est,
                "ndv_est": prof.ndv_est,
                "avg_multiplicity": prof.avg_multiplicity,
                "collision_mult": prof.collision_mult,
                "uniformity_ratio": prof.uniformity_ratio,
                "f2_rel_error": prof.f2_rel_error,
                "ndv_rel_error": prof.ndv_rel_error,
                "hot_keys": [asdict(h) for h in prof.hot_keys[:16]],
                "salting_plan": {str(k): v for k, v in plan.items()},
            }
        )
    else:
        from rusty_bloomfilter_spark.operators.advisor import (
            advise_join,
            profile_join_side,
        )

        rkey = args.right_key or args.key
        right = spark.read.parquet(args.right)
        pl = profile_join_side(left.select(args.key), args.key)
        pr = profile_join_side(right.select(rkey), rkey)
        adv = advise_join(
            pl,
            pr,
            broadcast_rows=args.broadcast_rows,
            n_partitions=args.partitions,
            overload=args.overload,
        )
        report.update({"mode": "join_advice", "right": args.right, **asdict(adv)})

    if args.lsh_threshold is not None:
        from rusty_bloomfilter_spark.operators.dedup import lsh_plan

        report["lsh_plan"] = lsh_plan(
            args.lsh_threshold,
            n_hashes=args.lsh_hashes,
            fp_weight=args.lsh_fp_weight,
        )

    payload = json.dumps(report, indent=2, default=str)
    if args.out:
        Path(args.out).write_text(payload)
    print(payload)
    spark.stop()


if __name__ == "__main__":
    main()
