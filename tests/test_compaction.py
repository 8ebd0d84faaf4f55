"""Compaction planner (operators/compaction.py): physical-file path —
manifest from real parquet files, plan properties (no split, bounded
overflow, key-contiguous groups), and a rewrite whose content equals
the source byte-for-row."""

import os

import pytest
from pyspark.sql import functions as F

from rusty_bloomfilter_spark.operators.compaction import (
    compact_files,
    compaction_plan,
    parquet_file_stats,
)


@pytest.fixture(scope="module")
def small_files(spark, tmp_path_factory):
    """A range-clustered table written as 12 skewed small files."""
    path = str(tmp_path_factory.mktemp("lake") / "t")
    df = spark.range(0, 6000).select(
        F.col("id").alias("k"),
        (F.col("id") % 97).alias("payload"),
        # 12 files with linearly growing sizes: file j owns keys with
        # floor(sqrt(k / 40)) == j (sizes ~40*(2j+1))
        F.floor(F.sqrt(F.col("id") / 40)).cast("int").alias("f"),
    )
    df.repartition("f").write.partitionBy("f").mode("overwrite").parquet(path)
    return path


def test_manifest_plan_and_rewrite_roundtrip(spark, small_files, tmp_path):
    stats = parquet_file_stats(spark, small_files, key_col="k").persist()
    srows = stats.collect()
    assert len(srows) == 13  # floor(sqrt(6000/40)) in 0..12
    assert all(r["file_bytes"] > 0 and r["n_rows"] > 0 for r in srows)
    total = sum(r["n_rows"] for r in srows)
    assert total == 6000

    target = 1500
    plan = compaction_plan(
        stats,
        file_col="file",
        rows_col="n_rows",
        target=target,
        order_cols=["min_key", "file"],
    ).persist()
    prow = plan.collect()
    max_file = max(r["n_rows"] for r in prow)
    by_grp: dict = {}
    for r in prow:
        by_grp.setdefault(r["grp"], []).append(r)
    # bounded overflow: no group exceeds target + one file
    for g, files in by_grp.items():
        assert sum(r["n_rows"] for r in files) < target + max_file, g
    # key-contiguous groups: ranges ordered by grp never interleave
    order = sorted(by_grp)
    for a, b in zip(order, order[1:]):
        assert max(r["max_key"] for r in by_grp[a]) < min(
            r["min_key"] for r in by_grp[b]
        )

    out = str(tmp_path / "compacted")
    n_groups = compact_files(spark, small_files, plan, out_path=out)
    assert n_groups == len(by_grp)
    # exactly one data file per group directory
    for g in by_grp:
        files = [
            f
            for f in os.listdir(os.path.join(out, f"_grp={g}"))
            if f.endswith(".parquet")
        ]
        assert len(files) == 1, (g, files)
    # content equality: compacted == source, row for row
    src = spark.read.parquet(small_files).select("k", "payload")
    dst = spark.read.parquet(out).select("k", "payload")
    assert dst.count() == 6000
    assert src.exceptAll(dst).count() == 0 and dst.exceptAll(src).count() == 0
    stats.unpersist()
    plan.unpersist()


def test_partial_plan_and_validation(spark, small_files, tmp_path):
    stats = parquet_file_stats(spark, small_files, key_col="k")
    plan = compaction_plan(
        stats, file_col="file", rows_col="n_rows", target=10**9
    )
    assert plan.select("grp").distinct().count() == 1  # everything fits grp 0
    # byte-denominated packing works the same way
    bplan = compaction_plan(
        stats, file_col="file", rows_col="file_bytes", target=1
    )
    assert bplan.select("grp").distinct().count() == stats.count()
    with pytest.raises(ValueError, match="target must be positive"):
        compaction_plan(stats, file_col="file", rows_col="n_rows", target=0)
    # a partial plan copies only the planned files
    one = plan.orderBy("min_key").limit(1)
    out = str(tmp_path / "partial")
    assert compact_files(spark, small_files, one, out_path=out) == 1
    [kept] = one.collect()
    assert spark.read.parquet(out).count() == kept["n_rows"]
