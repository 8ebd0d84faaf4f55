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
    from rusty_bloomfilter_spark.operators.dedup import minhash_dedup
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

    words = F.filter(F.split(F.col("text"), r"\s+"), lambda w: w != F.lit(""))

    # ---- corpus stats (once, untimed) -----------------------------------
    if not want or "stats" in want:
        st = docs.agg(
            F.count("*").alias("n_docs"),
            F.sum(F.length("text")).alias("text_bytes"),
            F.sum(F.size(words)).alias("n_words"),
        ).collect()[0]
        dw = docs.select(F.explode(words).alias("w")).select(
            F.countDistinct("w").alias("dw")
        ).collect()[0]
        print(
            f"  corpus: {st['n_docs']} docs, {st['text_bytes']} text bytes, "
            f"{st['n_words']} words, {dw['dw']} distinct words",
            file=sys.stderr,
        )

    # ---- token pipeline isolation ---------------------------------------
    timed("docs_scan", lambda: noop(docs.select("doc_id", "text", "source")))
    timed(
        "words_split",
        lambda: noop(docs.select(F.size(words).alias("nw"))),
    )
    timed("tok_full", lambda: noop(sequences_from_documents(spark, sf_dir)))

    timed("heavy_cur", lambda: qmap["q_heavy_tokens_exact"](spark, sf_dir).collect())

    def heavy_dict():
        wc = (
            docs.select(F.explode(words).alias("w"))
            .groupBy("w")
            .agg(F.count("*").alias("c"))
        )
        tok = (
            F.conv(F.substring(F.md5("w"), 1, 8), 16, 10).cast("long") % 50257
        ).cast("int")
        return (
            wc.select(tok.alias("tok"), "c")
            .groupBy("tok")
            .agg(F.sum("c").alias("freq"))
            .orderBy(F.desc("freq"), "tok")
            .limit(25)
        )

    timed("heavy_dict", lambda: heavy_dict().collect())
    if not want or {"heavy_cur", "heavy_dict"} & want:
        a = rows_key(qmap["q_heavy_tokens_exact"](spark, sf_dir).collect())
        b = rows_key(heavy_dict().collect())
        checks["heavy_dict_eq"] = a == b

    timed(
        "tokprof_cur",
        lambda: token_profile(spark, sequences_from_documents(spark, sf_dir)).collect(),
    )

    # ---- minhash --------------------------------------------------------
    from rusty_bloomfilter_spark.operators.dedup import (
        minhash_candidate_pairs,
        minhash_signatures,
    )

    # pre-tokenized corpus exactly as bench.py prepares it
    sequences_from_documents(spark, sf_dir).repartition(8).write.mode(
        "overwrite"
    ).parquet("/tmp/bx_dedup_seq.parquet")
    dedup_seq = spark.read.parquet("/tmp/bx_dedup_seq.parquet")

    timed("minhash_sigs", lambda: noop(minhash_signatures(dedup_seq)))

    def run_minhash_cur():
        pairs = minhash_dedup(dedup_seq, threshold=0.35)
        pairs.count()
        free(pairs)

    timed("minhash_cur", run_minhash_cur)

    def minhash_slim(threshold=0.35, n_hashes=128, bands=32):
        from rusty_bloomfilter_spark.operators.cache import tie

        r = n_hashes // bands
        band_cols = F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda i: F.xxhash64(F.slice("sig", i * r + 1, r), i),
            )
        )
        sigs = minhash_signatures(dedup_seq, n_hashes=n_hashes).persist()
        buckets = sigs.select("doc_id", band_cols.alias("band", "bucket"))
        left = buckets.alias("l")
        right = buckets.alias("r")
        cand = (
            left.join(
                right,
                (F.col("l.band") == F.col("r.band"))
                & (F.col("l.bucket") == F.col("r.bucket"))
                & (F.col("l.doc_id") < F.col("r.doc_id")),
            )
            .select(F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b"))
            .dropDuplicates(["doc_a", "doc_b"])
        )
        sa = sigs.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"))
        sb = sigs.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"))
        pairs = (
            cand.join(sa, "doc_a")
            .join(sb, "doc_b")
            .select(
                "doc_a",
                "doc_b",
                (
                    F.aggregate(
                        F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
                        F.lit(0),
                        lambda acc, v: acc + v,
                    ).cast("double")
                    / F.lit(n_hashes)
                ).alias("est_jaccard"),
            )
            .filter(F.col("est_jaccard") >= threshold)
        )
        return tie(pairs, sigs)

    def run_minhash_slim():
        pairs = minhash_slim()
        pairs.count()
        free(pairs)

    timed("minhash_slim", run_minhash_slim)
    if not want or {"minhash_cur", "minhash_slim"} & want:
        a = rows_key(minhash_dedup(dedup_seq, threshold=0.35).collect())
        b = rows_key(minhash_slim().collect())
        checks["minhash_slim_eq"] = a == b

    # ---- ANN ------------------------------------------------------------
    qids = [0, 7, 42, 99, 123]
    timed("ann_cur", lambda: ann_bruteforce_topk(embeddings, qids, k=5).collect())

    def ann_norm():
        from pyspark.sql import Window

        sq_sum = lambda c: F.aggregate(  # noqa: E731
            F.transform(c, lambda x: x * x), F.lit(0.0), lambda s, v: s + v
        )
        base = embeddings.select(
            F.col("vec_id").alias("id"),
            F.col("embedding").cast("array<double>").alias("v"),
        ).withColumn("nv", F.sqrt(sq_sum(F.col("v"))))
        queries = base.filter(F.col("id").isin(qids)).select(
            F.col("id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("nv").alias("nq"),
        )
        dot = F.aggregate(
            F.zip_with("qv", "v", lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v
        )
        scored = (
            base.crossJoin(F.broadcast(queries))
            .filter(F.col("id") != F.col("query_id"))
            .select(
                "query_id",
                F.col("id").alias("neighbor_id"),
                F.round(dot / (F.col("nv") * F.col("nq")), 6).alias("cosine"),
            )
        )
        w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 5)
            .select("query_id", "neighbor_id", "cosine", "rank")
        )

    timed("ann_norm", lambda: ann_norm().collect())
    if not want or {"ann_cur", "ann_norm"} & want:
        a = rows_key(ann_bruteforce_topk(embeddings, qids, k=5).collect())
        b = rows_key(ann_norm().collect())
        checks["ann_norm_eq"] = a == b

    # ---- relational -----------------------------------------------------
    timed(
        "lineitem_scan",
        lambda: noop(
            load_table(spark, sf_dir, "lineitem").select(
                "l_quantity", "l_extendedprice", "l_discount",
                "l_returnflag", "l_linestatus", "l_shipdate",
            )
        ),
    )
    timed("pricing_cur", lambda: qmap["q_pricing_summary"](spark, sf_dir).collect())

    def pricing_dec18():
        li = load_table(spark, sf_dir, "lineitem")
        dec = lambda c: F.col(c).cast("decimal(18,4)")  # noqa: E731
        return (
            li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("date"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
                F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
                F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
                .cast("double")
                .alias("sum_disc_price"),
                F.count("*").alias("count_order"),
            )
        )

    timed("pricing_dec18", lambda: pricing_dec18().collect())
    if not want or {"pricing_cur", "pricing_dec18"} & want:
        a = rows_key(qmap["q_pricing_summary"](spark, sf_dir).collect())
        b = rows_key(pricing_dec18().collect())
        checks["pricing_dec18_eq"] = a == b

    timed("topcust_cur", lambda: qmap["q_top_customers"](spark, sf_dir).collect())

    print(json.dumps({"sf_dir": sf_dir, "results": results, "checks": checks}))
    spark.stop()


if __name__ == "__main__":
    main()
