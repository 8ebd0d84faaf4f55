"""Regression tests for the round-3 ADVICE findings (all five fixed in
round 4):

1. cache.py: MAX_LIVE configurable + thread-safe FIFO.
2. incremental.py: seen frame tied (no bare leaked persist).
3. sharded.py flag_contained: NULL ids fail loudly instead of silently
   casting NaN -> INT64_MIN.
4. sampling.py kmv_overlap: sketch frame persisted + tied.
5. aggregate.py: tree_merge/build_multi take the partition count from
   the input frame, not .rdd on the transformed plan.
"""

import threading

import pytest


# ---------------------------------------------------------------------------
# 1. cache.py — set_max_live + concurrent tie() safety
# ---------------------------------------------------------------------------


def test_cache_set_max_live_evicts_oldest(spark):
    from rusty_bloomfilter_spark.operators import cache

    old = cache.MAX_LIVE
    try:
        # drain FIFO entries left over by earlier tests in this session,
        # then restore headroom so our 4 ties cannot self-evict
        cache.set_max_live(0)
        cache.set_max_live(8)
        frames = []
        for i in range(4):
            f = spark.range(10 + i).persist()
            f.count()
            cache.tie(spark.range(1), f)
            frames.append(f)
        assert all(f.storageLevel.useMemory for f in frames)
        cache.set_max_live(2)  # shrink: two oldest dep-sets unpersist
        assert not frames[0].storageLevel.useMemory
        assert not frames[1].storageLevel.useMemory
        assert frames[2].storageLevel.useMemory
        assert frames[3].storageLevel.useMemory
    finally:
        cache.set_max_live(old)


def test_cache_tie_concurrent_threads(spark):
    """The FIFO deque is lock-guarded: hammering tie/free from several
    threads must neither corrupt the deque nor raise."""
    from rusty_bloomfilter_spark.operators import cache

    errors = []

    def worker(seed: int):
        try:
            for i in range(25):
                dep = spark.range(seed * 100 + i)
                res = cache.tie(spark.range(1), dep)
                if i % 3 == 0:
                    cache.free(res)
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(s,)) for s in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    with cache._LOCK:
        assert len(cache._LIVE) <= cache.MAX_LIVE


def test_cache_max_live_env_is_int():
    from rusty_bloomfilter_spark.operators import cache

    assert isinstance(cache.MAX_LIVE, int) and cache.MAX_LIVE >= 1


# ---------------------------------------------------------------------------
# 3. sharded flag_contained — NULL id rejected loudly
# ---------------------------------------------------------------------------


def test_flag_contained_null_id_raises(spark):
    from pyspark.sql import functions as F

    from rusty_bloomfilter_spark.operators.sharded import ShardedBloomSketch

    sk = ShardedBloomSketch(n_total=10_000, p=1e-4, n_shards=4, col="fp", scalar=True)
    build = spark.range(100).select(F.xxhash64(F.col("id")).alias("fp"))
    sketch_df = sk.build(build)
    probes = spark.createDataFrame(
        [(1, 11), (None, 22), (3, 33)], "doc_id bigint, x bigint"
    ).select("doc_id", F.xxhash64(F.col("x")).alias("fp"))
    with pytest.raises(Exception, match="NULL"):
        sk.flag_contained(probes, sketch_df, id_col="doc_id").collect()


def test_flag_contained_nonnull_ids_roundtrip(spark):
    """Sanity companion: non-null ids keep working and ids survive the
    Arrow round-trip exactly (the failure mode was silent corruption)."""
    from pyspark.sql import functions as F

    from rusty_bloomfilter_spark.operators.sharded import ShardedBloomSketch

    sk = ShardedBloomSketch(n_total=10_000, p=1e-4, n_shards=4, col="fp", scalar=True)
    src = spark.range(50).select(
        (F.col("id") + 10**12).alias("doc_id"), F.xxhash64(F.col("id")).alias("fp")
    )
    sketch_df = sk.build(src)
    flags = sk.flag_contained(src, sketch_df, id_col="doc_id").collect()
    ids = sorted(r["doc_id"] for r in flags)
    assert ids == [10**12 + i for i in range(50)]
    assert all(r["probably_seen"] for r in flags)  # zero FN


# ---------------------------------------------------------------------------
# 4. kmv_overlap — sketch frame persisted during the pair expansion
# ---------------------------------------------------------------------------


def test_kmv_overlap_persists_sketch_frame(spark):
    from pyspark.sql import functions as F

    from rusty_bloomfilter_spark.operators import cache
    from rusty_bloomfilter_spark.operators.sampling import kmv_overlap

    df = spark.range(3000).select(
        (F.col("id") % 3).cast("string").alias("grp"),
        (F.col("id") % 700).alias("key"),
    )
    out = kmv_overlap(df, "grp", "key", k=64)
    deps = getattr(out, cache._DEPS_ATTR, None)
    assert deps, "kmv_overlap result is not tied to its sketch frame"
    assert any(d.storageLevel.useMemory or d.storageLevel.useDisk for d in deps)
    assert out.count() == 3  # 3 unordered pairs of 3 groups
    cache.free(out)
    assert not any(d.storageLevel.useMemory for d in deps)


# ---------------------------------------------------------------------------
# 5. tree_merge / build_multi — no .rdd on the transformed plan
# ---------------------------------------------------------------------------


def test_tree_merge_accepts_n_parts_without_rdd(spark, monkeypatch):
    """With n_parts supplied, tree_merge must never touch .rdd on the
    sketch frame (AQE can eagerly materialize query stages there)."""
    from pyspark.sql import DataFrame

    from rusty_bloomfilter_spark.operators.aggregate import tree_merge
    from rusty_bloomfilter_spark.operators.sketches import BlockedBloomSketch
    from rusty_bloomfilter_spark.sources import synthetic_sequences

    from rusty_bloomfilter_spark.operators.aggregate import partition_sketches
    from rusty_bloomfilter_spark.sketch import merge_sketch_payloads

    seq = synthetic_sequences(spark, 500, num_partitions=4)
    sk = BlockedBloomSketch.for_np(n=50_000, p=1e-3)
    sketch_df = partition_sketches(seq, sk._empty, sk._update, columns=[sk.col])

    def boom(self):  # any .rdd access on the transformed frame fails the test
        raise AssertionError(".rdd touched despite n_parts")

    monkeypatch.setattr(DataFrame, "rdd", property(boom))
    merged = tree_merge(sketch_df, merge_sketch_payloads, fanout=16, n_parts=4)
    # plan construction must succeed without .rdd; undo to materialize
    monkeypatch.undo()
    rows = merged.collect()
    assert len(rows) == 1 and rows[0]["n_items"] > 0
