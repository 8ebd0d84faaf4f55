"""Incremental cross-snapshot dedup (plans/incremental.py)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from rusty_bloomfilter_spark.plans.incremental import (
    doc_fingerprints,
    incremental_dedup,
    merge_shard_frames,
)


@pytest.fixture(scope="module")
def snapshots(spark):
    rng = np.random.default_rng(53)
    texts = [
        " ".join(f"w{rng.integers(0, 5000)}" for _ in range(rng.integers(10, 60)))
        for _ in range(600)
    ]
    prev = spark.createDataFrame(
        pd.DataFrame({"doc_id": np.arange(600, dtype=np.int64), "text": texts})
    )
    # new snapshot: 200 genuinely novel docs + 150 re-identified copies
    novel_texts = [
        " ".join(f"n{rng.integers(0, 5000)}" for _ in range(rng.integers(10, 60)))
        for _ in range(200)
    ]
    dup_ids = list(range(0, 300, 2))  # 150 docs copied from prev
    new = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": np.concatenate(
                    [np.arange(10_000, 10_200), np.arange(20_000, 20_000 + len(dup_ids))]
                ).astype(np.int64),
                "text": novel_texts + [texts[i] for i in dup_ids],
            }
        )
    )
    return prev, new, len(dup_ids)


def test_zero_fn_and_bounded_overremoval(spark, snapshots):
    prev, new, n_dups = snapshots
    out = incremental_dedup(prev, new, expected_docs=10_000, p=1e-6, n_shards=8)
    flags = {r["doc_id"]: r["probably_seen"] for r in out["flags"].collect()}
    assert len(flags) == 350
    # zero FN: every planted duplicate flagged
    for did in range(20_000, 20_000 + n_dups):
        assert flags[did] is True, did
    # bounded over-removal: at p=1e-6 over 200 novel docs, expect 0 FPs
    false_pos = [d for d, seen in flags.items() if seen and d < 20_000]
    assert len(false_pos) == 0
    novel_ids = {r["doc_id"] for r in out["novel"].select("doc_id").collect()}
    assert novel_ids == set(range(10_000, 10_200))
    out["seen"].unpersist()


def test_updated_frame_covers_both_snapshots(spark, snapshots):
    """The updated frame (seen OR novel) must flag EVERY document of
    prev ∪ novel as seen — the V3-ready state."""
    prev, new, _ = snapshots
    out = incremental_dedup(prev, new, expected_docs=10_000, p=1e-6, n_shards=8)
    sk = out["sketch"]
    updated = out["updated"].persist()
    assert updated.count() == 8  # one row per shard, re-merged
    everything = doc_fingerprints(prev).unionByName(doc_fingerprints(out["novel"]))
    flags = sk.flag_contained(everything, updated, id_col="doc_id")
    assert flags.filter(~F.col("probably_seen")).count() == 0  # zero FN
    updated.unpersist()
    out["seen"].unpersist()


def test_second_snapshot_only_scans_itself(spark, snapshots):
    """The incremental property: processing V2 probes V2's fingerprints
    against the persisted frame — prev text is never re-read in the
    flags plan (no scan of the prev DataFrame below flag_contained)."""
    import contextlib
    import io

    prev, new, _ = snapshots
    out = incremental_dedup(prev, new, expected_docs=10_000, p=1e-6, n_shards=8)
    out["seen"].count()  # frame materialized once (the V1 ingest cost)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out["flags"].explain("formatted")
    plan = buf.getvalue()
    # the flags plan reads the persisted sketch frame (InMemory scan),
    # not a rebuild of prev's fingerprints
    assert "InMemoryTableScan" in plan
    out["seen"].unpersist()


def test_incremental_dedup_string_doc_ids(spark):
    """String doc ids (the curate plan and crawl corpora emit them) must
    work end-to-end: a raw cast('long') crashed under ANSI or NULLed
    every id (round-4 review, CONFIRMED repro). Ids are keyed by
    xxhash64; planted dups still flag with zero FN."""
    from pyspark.sql import functions as F

    from rusty_bloomfilter_spark.plans.incremental import incremental_dedup

    prev = spark.range(100).select(
        F.concat(F.lit("doc-"), F.col("id")).alias("doc_id"),
        F.concat(F.lit("text body number "), F.col("id")).alias("text"),
    )
    # 30 new docs; ids 0-9 repeat prev CONTENT (planted dups)
    new = spark.range(200, 230).select(
        F.concat(F.lit("doc-"), F.col("id")).alias("doc_id"),
        F.when(
            F.col("id") < 210,
            F.concat(F.lit("text body number "), F.col("id") - 200),
        )
        .otherwise(F.concat(F.lit("fresh text "), F.col("id")))
        .alias("text"),
    )
    out = incremental_dedup(prev, new, expected_docs=1000, n_shards=4)
    flags = {r.doc_id: r.probably_seen for r in out["flags"].collect()}
    assert len(flags) == 30
    assert sum(flags.values()) >= 10  # zero FN on the planted dups
    novel = out["novel"].collect()
    assert {r.doc_id for r in novel} <= {f"doc-{i}" for i in range(210, 230)}
    out["seen"].unpersist()
