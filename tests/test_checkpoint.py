"""Checkpoint/resume: idempotent rebuild, partial-failure resume,
bitwise-identical final sketch (SURVEY.md §5 integration plan)."""

import numpy as np
import pytest

from rusty_bloomfilter_spark.operators.checkpoint import build_with_checkpoint
from rusty_bloomfilter_spark.operators.sketches import BloomSketch, flatten_tokens
from rusty_bloomfilter_spark.sketch import BloomFilter, Shape, merge_payloads

SHAPE = Shape.for_np(n=100_000, p=1e-3)


@pytest.fixture(scope="module")
def seq_parquet(spark, sequences_pdf, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("seq") / "sequences")
    spark.createDataFrame(sequences_pdf).repartition(6).write.parquet(path)
    return path


def _build(spark, seq_parquet, ckpt_dir):
    sk = BloomSketch(SHAPE)
    return build_with_checkpoint(
        spark,
        seq_parquet,
        ckpt_dir,
        sk._empty,
        sk._update,
        merge_payloads,
        columns=["tokens"],
    )


def test_checkpoint_build_and_resume(spark, sequences_pdf, seq_parquet, tmp_path):
    ckpt = str(tmp_path / "ckpt")
    r1 = _build(spark, seq_parquet, ckpt)
    assert r1.built_files > 0 and r1.resumed_files == 0

    oracle = BloomFilter.empty(SHAPE).add_tokens(
        np.concatenate(list(sequences_pdf["tokens"]))
    )
    assert BloomFilter.from_bytes(r1.payload).words.tobytes() == oracle.words.tobytes()
    assert r1.n_items == oracle.n_items

    # full resume: nothing rebuilt, identical bytes
    r2 = _build(spark, seq_parquet, ckpt)
    assert r2.built_files == 0
    assert r2.resumed_files == r1.total_files
    assert r2.payload == r1.payload and r2.n_items == r1.n_items


def test_checkpoint_partial_failure_resume(spark, sequences_pdf, seq_parquet, tmp_path):
    """Simulate a crash that persisted only some files' sketches: drop
    half the checkpoint rows, rerun, final sketch must be identical."""
    ckpt = str(tmp_path / "ckpt2")
    r1 = _build(spark, seq_parquet, ckpt)

    ckpt_df = spark.read.parquet(ckpt)
    files = sorted(r["file"] for r in ckpt_df.select("file").distinct().collect())
    kept = files[: len(files) // 2]
    partial = str(tmp_path / "ckpt2_partial")
    ckpt_df.filter(ckpt_df.file.isin(kept)).write.parquet(partial)

    r2 = _build(spark, seq_parquet, partial)
    assert r2.resumed_files == len(kept)
    assert r2.built_files == r1.total_files - len(kept)
    assert r2.payload == r1.payload
    assert r2.n_items == r1.n_items
    assert r2.metrics()["sketch_bytes"] == len(r1.payload)
