"""File-index CLI job: build/probe round trips for all three index
kinds via the importable functions, stale-index verify mismatch."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def laid(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("fidx") / "data")
    spark.range(0, 4000).select(
        (F.col("id") * 37 % 100_003).alias("key"), (F.col("id") % 97).alias("v")
    ).repartitionByRange(6, "key").write.mode("overwrite").parquet(d)
    return d


@pytest.mark.parametrize("kind", ["bloom", "xor"])
def test_membership_index_build_probe_verify(spark, laid, tmp_path, kind):
    from jobs.build_file_index import build_index, probe_index

    idx_path = str(tmp_path / f"idx_{kind}")
    build_index(spark, laid, kind, "key", n_per_file=1000, p=0.001).write.mode(
        "overwrite"
    ).parquet(idx_path)
    probe = [
        r["key"]
        for r in spark.read.parquet(laid).filter(F.col("key") < 5000).collect()
    ]
    report, ok = probe_index(spark, laid, idx_path, "key", probe, verify=True)
    assert ok and report["verify"]["pruned_rows"] == report["verify"]["full_scan_rows"]
    assert 0 < report["files_read"] < report["total_files"]  # actually prunes


def test_zone_index_range_probe(spark, laid, tmp_path):
    from jobs.build_file_index import build_index, probe_index

    idx_path = str(tmp_path / "idx_zone")
    build_index(spark, laid, "zone", "key", n_per_file=0, p=0.1).write.mode(
        "overwrite"
    ).parquet(idx_path)
    report, ok = probe_index(
        spark, laid, idx_path, "key", [], verify=True, lower=0, upper=8000
    )
    assert ok and report["files_read"] < report["total_files"]
    # zone index probed with keys instead of a range: loud error
    with pytest.raises(ValueError, match="lo"):
        probe_index(spark, laid, idx_path, "key", [1, 2], verify=False)


def test_stale_index_fails_verify(spark, laid, tmp_path):
    from jobs.build_file_index import build_index, probe_index

    idx_path = str(tmp_path / "idx_stale")
    build_index(spark, laid, "bloom", "key", n_per_file=1000, p=0.001).write.mode(
        "overwrite"
    ).parquet(idx_path)
    # data gains rows the index has never seen -> verify must FAIL
    extra = str(tmp_path / "extra")
    spark.range(0, 10).select(
        F.lit(999_999_937).alias("key"), F.lit(0).cast("long").alias("v")
    ).write.mode("overwrite").parquet(extra)
    import glob
    import shutil

    for f in glob.glob(extra + "/part-*.parquet"):
        shutil.copy(f, laid + "/zz-late-arrival.parquet")
    try:
        report, ok = probe_index(
            spark, laid, idx_path, "key", [999_999_937], verify=True
        )
        assert not ok
        assert report["verify"]["pruned_rows"] < report["verify"]["full_scan_rows"]
    finally:
        import os

        os.remove(laid + "/zz-late-arrival.parquet")
