"""Streaming Bloom dedup: bounded-state keep-first across micro-batches."""

import numpy as np
import pandas as pd
import pytest

from rusty_bloomfilter_spark.streaming import streaming_bloom_dedup


def _run_dedup(spark, tmp_path, pdf, name, **kw):
    src = str(tmp_path / f"{name}_src")
    batch_df = spark.createDataFrame(pdf)
    batch_df.repartition(4).write.parquet(src)
    stream = (
        spark.readStream.schema(batch_df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = streaming_bloom_dedup(stream, fp_col="fp", **kw)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return [r["fp"] for r in spark.sql(f"select fp from {name}").collect()]


def test_keep_first_across_micro_batches(spark, tmp_path):
    # 300 docs, 100 distinct fingerprints, each repeated 3x and spread
    # across 4 files => duplicates arrive in LATER micro-batches too
    rng = np.random.default_rng(7)
    fps = [f"fp-{i:05d}" for i in range(100)] * 3
    rng.shuffle(fps)
    pdf = pd.DataFrame({"fp": fps, "other": np.arange(300)})
    emitted = _run_dedup(
        spark, tmp_path, pdf, "sbd_first", n_total=1_000, p=1e-8, n_shards=4
    )
    # zero FN: no fingerprint is ever emitted twice
    assert len(emitted) == len(set(emitted))
    # p=1e-8 over 100 keys: expected FP drops ~1e-6 — all novel survive
    assert sorted(set(emitted)) == sorted({f"fp-{i:05d}" for i in range(100)})


def test_false_positive_rate_bounded(spark, tmp_path):
    # all-novel stream through a tight filter: survivors must be >=
    # (1 - generous FP slack) of input, and never more than input
    n = 2_000
    pdf = pd.DataFrame({"fp": [f"u-{i:06d}" for i in range(n)]})
    emitted = _run_dedup(
        spark, tmp_path, pdf, "sbd_fpr", n_total=n, p=1e-3, n_shards=4
    )
    assert len(emitted) == len(set(emitted))
    dropped = n - len(emitted)
    # configured p=1e-3: expect ~2 wrong drops; 40 = 20x slack
    assert dropped <= 40


def test_validates_shards(spark):
    with pytest.raises(ValueError):
        streaming_bloom_dedup(
            spark.readStream.format("rate").load(), fp_col="x", n_total=10, n_shards=0
        )
