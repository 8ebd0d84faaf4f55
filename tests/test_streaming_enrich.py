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


# -- stream_stream_interval_join --------------------------------------------


def _ts_rows():
    import datetime as dt

    base = dt.datetime(2024, 5, 1, 12, 0, 0)
    mk = lambda m: base + dt.timedelta(minutes=m)
    # user 1: purchase at +60 attributed to views at +10, +59 (not +61,
    # not -5 relative to window [0,60]); user 2: no views
    return [
        (1, "view", mk(10)),
        (1, "view", mk(59)),
        (1, "view", mk(61)),   # after the purchase: excluded
        (1, "view", mk(-5)),   # > 1h before: excluded
        (1, "purchase", mk(60)),
        (2, "purchase", mk(30)),
        (3, "view", mk(30)),   # view without purchase
    ]


def test_interval_join_matches_batch(spark, tmp_path):
    from rusty_bloomfilter_spark.streaming.enrich import (
        stream_stream_interval_join,
    )

    src = str(tmp_path / "attr_src")
    df = spark.createDataFrame(_ts_rows(), "uid long, kind string, ts timestamp")
    df.coalesce(1).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema("uid long, kind string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    p = stream.filter(F.col("kind") == "purchase").select(
        F.col("uid").alias("puid"), F.col("ts").alias("pts")
    )
    v = stream.filter(F.col("kind") == "view").select(
        F.col("uid").alias("vuid"), F.col("ts").alias("vts")
    )
    pairs = stream_stream_interval_join(
        p, v,
        left_key="puid", right_key="vuid",
        left_ts="pts", right_ts="vts",
        before="1 HOUR", after="0 SECONDS", watermark="2 hours",
    ).select("puid", "pts", "vts")
    q = (
        pairs.writeStream.outputMode("append")
        .format("memory")
        .queryName("attr_t")
        .option("checkpointLocation", str(tmp_path / "attr_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    got = sorted(
        (r["puid"], r["vts"].minute) for r in spark.table("attr_t").collect()
    )
    assert got == [(1, 10), (1, 59)]


def test_interval_join_guards(spark, tmp_path):
    import pytest

    from rusty_bloomfilter_spark.streaming.enrich import (
        stream_stream_interval_join,
    )

    static = spark.createDataFrame([(1, None)], "puid long, pts timestamp")
    kw = dict(
        left_key="puid", right_key="vuid", left_ts="pts", right_ts="vts",
        before="1 HOUR", after="0 SECONDS", watermark="1 hour",
    )
    with pytest.raises(ValueError, match="both sides must be streaming"):
        stream_stream_interval_join(static, static, **kw)


def test_interval_join_backquoted_identifiers(spark, tmp_path):
    # review fix: a reserved-word column name must parse as a COLUMN
    from rusty_bloomfilter_spark.streaming.enrich import (
        stream_stream_interval_join,
    )

    src = str(tmp_path / "bq_src")
    df = spark.createDataFrame(_ts_rows(), "uid long, kind string, ts timestamp")
    df.coalesce(1).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema("uid long, kind string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    # `order` is a SQL reserved word; backquoting must keep it a column
    p = stream.filter(F.col("kind") == "purchase").select(
        F.col("uid").alias("order"), F.col("ts").alias("pts")
    )
    v = stream.filter(F.col("kind") == "view").select(
        F.col("uid").alias("vuid"), F.col("ts").alias("vts")
    )
    pairs = stream_stream_interval_join(
        p, v,
        left_key="order", right_key="vuid",
        left_ts="pts", right_ts="vts",
        before="1 HOUR", after="0 SECONDS", watermark="2 hours",
    ).select(F.col("order"), "vts")
    q = (
        pairs.writeStream.outputMode("append")
        .format("memory")
        .queryName("attr_bq")
        .option("checkpointLocation", str(tmp_path / "bq_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    got = sorted((r["order"], r["vts"].minute) for r in spark.table("attr_bq").collect())
    assert got == [(1, 10), (1, 59)]


# -- late-data accounting ----------------------------------------------------


def test_progress_drop_stats_counts_planted_stragglers(spark, tmp_path):
    import datetime as dt
    import os
    import shutil
    import glob

    from rusty_bloomfilter_spark.streaming.metrics import progress_drop_stats

    base = dt.datetime(2024, 6, 1)
    on_time = [(i, base + dt.timedelta(minutes=10 * i)) for i in range(30)]
    late = [(100 + i, base + dt.timedelta(seconds=i)) for i in range(7)]
    src = str(tmp_path / "late")
    os.makedirs(src, exist_ok=True)
    for i, rows in enumerate([on_time[:15], on_time[15:], late]):
        part = str(tmp_path / f"p{i}")
        spark.createDataFrame(rows, "uid long, ts timestamp").coalesce(1).write.mode(
            "overwrite"
        ).parquet(part)
        (f,) = glob.glob(part + "/part-*.parquet")
        dst = os.path.join(src, f"b{i}.parquet")
        shutil.copy(f, dst)
        os.utime(dst, (1_600_000_000 + i, 1_600_000_000 + i))
    stream = (
        spark.readStream.schema("uid long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.withWatermark("ts", "30 minutes")
        .dropDuplicates(["uid", "ts"])
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("late_t")
        .option("checkpointLocation", str(tmp_path / "late_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    stats = progress_drop_stats(q)
    assert stats["n_input_rows"] == 37
    assert stats["n_dropped_late"] == 7   # exactly the planted stragglers
    assert stats["n_batches"] >= 3
    assert spark.table("late_t").count() == 30
