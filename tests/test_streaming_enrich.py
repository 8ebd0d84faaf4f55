"""Stream-static enrichment: replay-split invariance vs the batch
join, inner-join semantics, and the static/streaming guards."""

import pytest
from pyspark.sql import functions as F


def _replay(spark, tmp_path, rows, n_files):
    src = str(tmp_path / f"src{n_files}")
    df = spark.createDataFrame(rows, "uid long, v double")
    df.repartition(n_files).write.mode("overwrite").parquet(src)
    return (
        spark.readStream.schema("uid long, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )


def _run(spark, agg, name, tmp_path):
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / (name + "_ckpt")))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    return {(r["seg"]): (r["n"], r["s"]) for r in spark.table(name).collect()}


def test_enrich_matches_batch_and_split_invariant(spark, tmp_path):
    from rusty_bloomfilter_spark.streaming.enrich import stream_static_enrich

    rows = [(i % 7, float(i)) for i in range(200)]
    dim = spark.createDataFrame(
        [(k, "seg%d" % (k % 3)) for k in range(5)], "k long, seg string"
    )
    # batch truth (inner join drops uid 5, 6)
    batch = {
        r["seg"]: (r["n"], r["s"])
        for r in spark.createDataFrame(rows, "uid long, v double")
        .join(dim, F.col("uid") == F.col("k"))
        .groupBy("seg")
        .agg(F.count("*").alias("n"), F.round(F.sum("v"), 6).alias("s"))
        .collect()
    }
    for n_files in (1, 4):
        stream = _replay(spark, tmp_path, rows, n_files)
        joined = stream_static_enrich(stream, dim, on=F.col("uid") == F.col("k"))
        agg = joined.groupBy("seg").agg(
            F.count("*").alias("n"), F.round(F.sum("v"), 6).alias("s")
        )
        got = _run(spark, agg, f"enrich_{n_files}", tmp_path)
        assert got == batch  # split-invariant AND batch-equal


def test_enrich_guards(spark, tmp_path):
    from rusty_bloomfilter_spark.streaming.enrich import stream_static_enrich

    static = spark.createDataFrame([(1, 1.0)], "uid long, v double")
    dim = spark.createDataFrame([(1, "a")], "k long, seg string")
    with pytest.raises(ValueError, match="must be a streaming frame"):
        stream_static_enrich(static, dim, on=F.col("uid") == F.col("k"))
    stream = _replay(spark, tmp_path, [(1, 1.0)], 1)
    stream2 = _replay(spark, tmp_path, [(2, 1.0)], 1)
    with pytest.raises(ValueError, match="STATIC"):
        stream_static_enrich(stream, stream2, on=F.col("uid") == F.col("k"))
