"""Streaming sessionization vs a pandas batch oracle: cross-batch
session stitching, gap boundary (<= extends, > closes), per-key
isolation, monotone-snapshot finalization, and guards."""

import glob
import os
import shutil
import time
import uuid

import pandas as pd
import pytest

from rusty_bloomfilter_spark.streaming.sessions import (
    finalize_sessions,
    streaming_sessionize,
)

H = 3_600_000_000  # one hour in microseconds
GAP = 4 * H


def _batch_oracle(rows, gap_us):
    """Plain lag-based sessionization over all rows at once."""
    out = {}
    by_key = {}
    for k, us in rows:
        by_key.setdefault(k, []).append(us)
    for k, ts in by_key.items():
        ts.sort()
        start = last = ts[0]
        n = 1
        for t in ts[1:]:
            if t - last <= gap_us:
                last, n = t, n + 1
            else:
                out[(k, start)] = (last, n)
                start = last = t
                n = 1
        out[(k, start)] = (last, n)
    return out


def _replay(spark, tmp_path, batches, gap_us=GAP):
    name = "sess_" + uuid.uuid4().hex[:8]
    src = str(tmp_path / f"{name}_src")
    os.makedirs(src, exist_ok=True)
    schema = "user_id bigint, ts_us bigint"
    for i, part in enumerate(batches):
        spark.createDataFrame(part, schema).coalesce(1).write.parquet(
            str(tmp_path / f"{name}_p{i}")
        )
        (f,) = glob.glob(str(tmp_path / f"{name}_p{i}" / "part-*.parquet"))
        shutil.copy(f, os.path.join(src, f"batch_{i}.parquet"))
        time.sleep(1.1)
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    out = streaming_sessionize(stream, key_col="user_id", ts_us_col="ts_us", gap_us=gap_us)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    final = finalize_sessions(spark.table(name)).collect()
    return {
        (r["user_id"], r["session_start_us"]): (r["session_end_us"], r["n_events"])
        for r in final
    }


def test_cross_batch_stitching_matches_batch_oracle(spark, tmp_path):
    # u1: one session spanning batches (gap-adjacent across the cut),
    # then a separate later session; u2: a session per batch
    rows_b1 = [(1, 0), (1, 2 * H), (2, 0)]
    rows_b2 = [(1, 5 * H), (1, 20 * H), (2, 30 * H)]
    rows_b3 = [(1, 22 * H), (2, 31 * H)]
    all_rows = rows_b1 + rows_b2 + rows_b3
    got = _replay(spark, tmp_path, [rows_b1, rows_b2, rows_b3])
    assert got == _batch_oracle(all_rows, GAP)
    # u1's first session stitched across the batch cut: 0..5h, 3 events
    assert got[(1, 0)] == (5 * H, 3)


def test_gap_boundary_exact(spark, tmp_path):
    # diff == gap extends; diff == gap + 1us closes
    rows = [(7, 0), (7, GAP), (7, 2 * GAP + 1)]
    got = _replay(spark, tmp_path, [rows])
    assert got == {(7, 0): (GAP, 2), (7, 2 * GAP + 1): (2 * GAP + 1, 1)}


def test_open_session_snapshot_superseded(spark, tmp_path):
    # a session that grows every batch must appear ONCE, final size
    batches = [[(9, i * H)] for i in range(4)]  # 1h apart, one per batch
    got = _replay(spark, tmp_path, batches)
    assert got == {(9, 0): (3 * H, 4)}


def test_unsorted_within_batch(spark, tmp_path):
    rows = [(3, 2 * H), (3, 0), (3, H)]  # shuffled inside one batch
    got = _replay(spark, tmp_path, [rows])
    assert got == {(3, 0): (2 * H, 3)}


def test_gap_guard(spark):
    df = spark.readStream.format("rate").load()
    with pytest.raises(ValueError):
        streaming_sessionize(df, key_col="value", ts_us_col="timestamp", gap_us=0)
