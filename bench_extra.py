#!/usr/bin/env python
"""Round-6 optimization harness: per-component isolation benchmarks
(guide §1.4 noop-sink methodology) + prototype-vs-current equality
checks. NOT the driver bench — bench.py is frozen; numbers from here
are cited in OPTIMIZATION_r06.md.

Usage: python bench_extra.py [component ...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf1.0),
       SPARK_GRAFT_CPUS, BE_REPS (default 3: min over reps)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import functions as F  # noqa: E402


def build_spark(cpus: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("rusty_bloomfilter_spark-bench-extra")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "90g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "40000")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def rows_key(rows):
    """Order-independent canonical form of a collect() result."""
    return sorted(tuple(r) for r in rows)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("BE_REPS", "3"))
    want = set(sys.argv[1:])

    spark = build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    from rusty_bloomfilter_spark import contract
    from rusty_bloomfilter_spark.operators.cache import free
    from rusty_bloomfilter_spark.operators.dedup import (
        minhash_candidate_pairs,
        minhash_dedup,
        minhash_signatures,
    )
    from rusty_bloomfilter_spark.operators.similarity import ann_bruteforce_topk
    from rusty_bloomfilter_spark.plans import token_profile
    from rusty_bloomfilter_spark.sources import load_table, sequences_from_documents

    docs = load_table(spark, sf_dir, "documents")
    embeddings = load_table(spark, sf_dir, "embeddings")
    qmap = contract.queries()

    results: dict[str, float] = {}
    checks: dict[str, bool] = {}

    def timed(name, fn):
        if want and name not in want:
            return
        best = None
        for _ in range(reps):
            spark.sparkContext.setJobDescription(name)
            t0 = time.time()
            fn()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        spark.sparkContext.setJobDescription(None)
        results[name] = round(best, 3)
        print(f"  {name}: {results[name]}s", file=sys.stderr)

    # ---- token pipeline -------------------------------------------------
    timed("tok_full", lambda: noop(sequences_from_documents(spark, sf_dir)))
    timed("heavy_cur", lambda: qmap["q_heavy_tokens_exact"](spark, sf_dir).collect())
    timed(
        "tokprof_cur",
        lambda: token_profile(spark, sequences_from_documents(spark, sf_dir)).collect(),
    )

    # ---- minhash --------------------------------------------------------
    sequences_from_documents(spark, sf_dir).repartition(8).write.mode(
        "overwrite"
    ).parquet("/tmp/bx_dedup_seq.parquet")
    dedup_seq = spark.read.parquet("/tmp/bx_dedup_seq.parquet")

    timed("minhash_sigs", lambda: noop(minhash_signatures(dedup_seq)))

    if not want or "minhash_cand_count" in want:
        sigs = minhash_signatures(dedup_seq).persist()
        r = 128 // 32
        band_cols = F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(31)),
                lambda i: F.xxhash64(F.slice("sig", i * r + 1, r), i),
            )
        )
        buckets = sigs.select("doc_id", band_cols.alias("band", "bucket"))
        l, rr = buckets.alias("l"), buckets.alias("r")
        coll = l.join(
            rr,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        ).select(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
        n_coll = coll.count()
        n_pairs = coll.distinct().count()
        print(f"  collisions={n_coll} distinct_pairs={n_pairs}", file=sys.stderr)
        sigs.unpersist()

    def run_minhash_cur():
        pairs = minhash_dedup(dedup_seq, threshold=0.35)
        pairs.count()
        free(pairs)

    timed("minhash_cur", run_minhash_cur)

    # ---- ANN ------------------------------------------------------------
    qids = [0, 7, 42, 99, 123]
    timed("ann_cur", lambda: ann_bruteforce_topk(embeddings, qids, k=5).collect())

    # ---- relational -----------------------------------------------------
    timed("pricing_cur", lambda: qmap["q_pricing_summary"](spark, sf_dir).collect())

    def pricing_prod18():
        li = load_table(spark, sf_dir, "lineitem")
        dec = lambda c: F.col(c).cast("decimal(18,4)")  # noqa: E731
        prod = (dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))).cast(
            "decimal(18,8)"
        )
        return (
            li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("date"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
                F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
                F.sum(prod).cast("double").alias("sum_disc_price"),
                F.count("*").alias("count_order"),
            )
        )

    timed("pricing_prod18", lambda: pricing_prod18().collect())
    if not want or {"pricing_cur", "pricing_prod18"} & want:
        a = rows_key(qmap["q_pricing_summary"](spark, sf_dir).collect())
        b = rows_key(pricing_prod18().collect())
        checks["pricing_prod18_eq"] = a == b

    timed(
        "orders_agg_only",
        lambda: noop(
            load_table(spark, sf_dir, "orders")
            .groupBy("o_custkey")
            .agg(
                F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
                .cast("double")
                .alias("t"),
                F.count("*").alias("n"),
            )
        ),
    )
    timed("topcust_cur", lambda: qmap["q_top_customers"](spark, sf_dir).collect())

    print(json.dumps({"sf_dir": sf_dir, "results": results, "checks": checks}))
    spark.stop()


if __name__ == "__main__":
    main()
