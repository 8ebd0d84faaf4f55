"""Sharded Bloom filter: membership past single-task filter sizes.

Pins: zero FN through shard routing (both build plans), FPR bound,
map-side == routed bitwise shard payloads, shard-wise merge algebra,
near-uniform shard load, missing-shard probe semantics.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from rusty_bloomfilter_spark.operators.sharded import ShardedBloomSketch, shard_of
from rusty_bloomfilter_spark.sketch.hashing import splitmix64, tokens_to_u64


@pytest.fixture(scope="module")
def shard_corpus(spark):
    rng = np.random.default_rng(17)
    n = 1200
    pdf = pd.DataFrame(
        {
            "doc_id": [f"d{i}" for i in range(n)],
            "tokens": [
                rng.integers(0, 2_000_000, size=rng.integers(20, 90), dtype=np.int32)
                for _ in range(n)
            ],
        }
    )
    return spark.createDataFrame(pdf).repartition(6), pdf


def _all_tokens(pdf):
    return np.concatenate(list(pdf["tokens"])).astype(np.int64)


def test_sharded_zero_fn_both_plans(spark, shard_corpus):
    df, pdf = shard_corpus
    toks = _all_tokens(pdf)
    sk = ShardedBloomSketch(n_total=200_000, p=1e-4, n_shards=16)
    for routed in (False, True):
        sketch_df = sk.build(df, routed=routed)
        hits, total = sk.count_contained(df, sketch_df, spark)
        assert total == len(toks)
        assert hits == total, f"false negatives with routed={routed}"


def test_sharded_routed_equals_mapside_bitwise(spark, shard_corpus):
    """Same data -> identical shard payloads from either build plan
    (merge algebra is canonical OR, routing is deterministic)."""
    df, _ = shard_corpus
    sk = ShardedBloomSketch(n_total=200_000, p=1e-4, n_shards=8)
    a = {r["shard"]: (bytes(r["payload"]), r["n_items"]) for r in sk.build(df).collect()}
    b = {
        r["shard"]: (bytes(r["payload"]), r["n_items"])
        for r in sk.build(df, routed=True, shuffle_partitions=5).collect()
    }
    assert a == b
    assert set(a) == set(range(8))  # every shard populated at this size


def test_sharded_fpr_bounded(spark, shard_corpus):
    df, pdf = shard_corpus
    sk = ShardedBloomSketch(n_total=200_000, p=1e-3, n_shards=16)
    sketch_df = sk.build(df).persist()
    # probe a disjoint domain
    absent = spark.createDataFrame(
        pd.DataFrame(
            {"tokens": [np.arange(10**8 + i * 5000, 10**8 + (i + 1) * 5000, dtype=np.int64) for i in range(20)]}
        )
    )
    fp, total = sk.count_contained(absent, sketch_df, spark)
    sketch_df.unpersist()
    assert total == 100_000
    # observed FPR <= 3x configured p (slack for a 100k sample)
    assert fp / total <= 3e-3


def test_sharded_merge_of_two_corpora(spark, shard_corpus):
    """Union of two builds' sketch frames + per-shard re-merge == build
    of the union corpus; zero FN over both halves."""
    from rusty_bloomfilter_spark.sketch import merge_sketch_payloads

    df, pdf = shard_corpus
    half = len(pdf) // 2
    d1 = spark.createDataFrame(pdf.iloc[:half])
    d2 = spark.createDataFrame(pdf.iloc[half:])
    sk = ShardedBloomSketch(n_total=200_000, p=1e-4, n_shards=8)

    def merge_shard(mpdf):
        return pd.DataFrame(
            {
                "shard": [int(mpdf["shard"].iloc[0])],
                "payload": [merge_sketch_payloads([bytes(p) for p in mpdf["payload"]])],
                "n_items": [int(mpdf["n_items"].sum())],
            }
        )

    merged = (
        sk.build(d1)
        .unionByName(sk.build(d2))
        .groupBy("shard")
        .applyInPandas(merge_shard, "shard int, payload binary, n_items bigint")
    )
    whole = sk.build(df)
    got = {r["shard"]: bytes(r["payload"]) for r in merged.collect()}
    want = {r["shard"]: bytes(r["payload"]) for r in whole.collect()}
    assert got == want


def test_shard_load_near_uniform(spark, shard_corpus):
    df, pdf = shard_corpus
    sk = ShardedBloomSketch(n_total=200_000, p=1e-4, n_shards=8)
    stats = {r["shard"]: r for r in sk.stats(sk.build(df)).collect()}
    toks = _all_tokens(pdf)
    n = len(toks)
    assert sum(r["n_items"] for r in stats.values()) == n
    mean = n / 8
    for r in stats.values():
        assert abs(r["n_items"] - mean) / mean < 0.15  # hash routing is uniform
        assert 0 < r["fill_ratio"] < 0.5


def test_probe_of_missing_shard_counts_misses(spark):
    """Probing a corpus whose tokens route to shards the build never
    saw must count them as misses, not fail."""
    build_df = spark.createDataFrame(
        pd.DataFrame({"tokens": [np.array([1, 2, 3], dtype=np.int64)]})
    )
    sk = ShardedBloomSketch(n_total=1000, p=1e-4, n_shards=32)
    sketch_df = sk.build(build_df)
    assert sketch_df.count() <= 3  # at most 3 shards touched
    probe_df = spark.createDataFrame(
        pd.DataFrame({"tokens": [np.arange(500, 600, dtype=np.int64)]})
    )
    hits, total = sk.count_contained(probe_df, sketch_df, spark)
    assert total == 100 and hits <= 1  # all-but-FP miss


def test_shard_routing_independent_of_filter_bits():
    """The routing hash must differ from the filter's insertion hash
    (identical hashes would correlate shard choice with block choice)."""
    toks = np.arange(10_000, dtype=np.int64)
    h = splitmix64(tokens_to_u64(toks))
    shards = shard_of(h, 16)
    blocks = (h >> np.uint64(32)) % 97
    # chi-square-ish: shard x (block mod 2) contingency near uniform
    for b in (0, 1):
        sel = shards[blocks % 2 == b]
        counts = np.bincount(sel, minlength=16)
        assert counts.std() / counts.mean() < 0.1


def test_probe_merges_unremerged_union_frames(spark, shard_corpus):
    """Probing a unioned-but-not-remerged sketch frame (two rows per
    shard) must merge in the probe task — zero FN over BOTH corpora."""
    df, pdf = shard_corpus
    half = len(pdf) // 2
    d1 = spark.createDataFrame(pdf.iloc[:half])
    d2 = spark.createDataFrame(pdf.iloc[half:])
    sk = ShardedBloomSketch(n_total=200_000, p=1e-4, n_shards=8)
    unioned = sk.build(d1).unionByName(sk.build(d2))  # no re-merge
    hits, total = sk.count_contained(df, unioned, spark)
    assert total == len(_all_tokens(pdf))
    assert hits == total  # would show false negatives before the fix


def test_routed_build_shuffles_distinct_hashes_not_tokens(spark):
    """Round-4 shuffle-width regression: the routed build's routing
    frame emits per-batch DISTINCT hashes with multiplicities, so on a
    duplicate-heavy corpus the shuffled row count tracks the vocabulary
    (50 here), not the token count (50,000) — while cnt still sums to
    the exact token count and the built filter matches the map-side
    plan bitwise (covered by test_sharded_routed_equals_mapside_bitwise)."""
    import pandas as pd
    from pyspark.sql import functions as F

    n_rows, row_len, vocab = 1000, 50, 50
    pdf = pd.DataFrame(
        {
            "doc_id": [str(i) for i in range(n_rows)],
            "tokens": [
                np.arange(vocab, dtype=np.int64).tolist() for _ in range(n_rows)
            ],
        }
    )
    df = spark.createDataFrame(pdf).repartition(4)
    sk = ShardedBloomSketch(n_total=10_000, p=1e-3, n_shards=4)
    routing = sk._hash_rows(df, with_counts=True)
    agg = routing.agg(
        F.count("*").alias("rows"), F.sum("cnt").alias("tokens")
    ).collect()[0]
    assert agg["tokens"] == n_rows * vocab  # exact multiplicity accounting
    # <= vocab distinct hashes per map partition (4 partitions)
    assert agg["rows"] <= 4 * vocab, f"shuffle rows {agg['rows']} not deduped"
    # and the build over this frame still inserts every token exactly
    sketch_df = sk.build(df, routed=True)
    total_items = sketch_df.agg(F.sum("n_items")).collect()[0][0]
    assert total_items == n_rows * vocab
