"""t-digest: accuracy (tail-weighted), merge algebra, Spark build."""

import numpy as np
import pytest

from rusty_bloomfilter_spark.sketch import TDigest, merge_sketch_payloads

RNG = np.random.default_rng(42)


def rank_of(sorted_vals, x):
    return np.searchsorted(sorted_vals, x) / len(sorted_vals)


def test_quantile_accuracy_including_tails():
    vals = RNG.lognormal(0, 1.5, size=200_000)
    td = TDigest(compression=200)
    for lo in range(0, len(vals), 10_000):
        td.update_batch(vals[lo : lo + 10_000])
    s = np.sort(vals)
    for q in (0.0001, 0.01, 0.25, 0.5, 0.75, 0.99, 0.9999):
        est = td.quantile(q)
        err = abs(rank_of(s, est) - q)
        # tail-weighted bound: generous mid-range, tight tails
        tol = 0.005 if 0.1 < q < 0.9 else 0.002
        assert err <= tol, (q, est, err)
    assert td.quantile(0.0) == s[0]
    assert td.quantile(1.0) == s[-1]


def test_merge_matches_single_stream():
    parts = [RNG.normal(0, 1, 30_000) for _ in range(5)]
    whole = TDigest(100)
    whole.update_batch(np.concatenate(parts))
    digests = [TDigest(100).update_batch(p) for p in parts]
    merged = digests[0].merge(digests[1]).merge(digests[2]).merge(digests[3]).merge(digests[4])
    s = np.sort(np.concatenate(parts))
    for q in (0.01, 0.5, 0.99):
        assert abs(rank_of(s, merged.quantile(q)) - q) < 0.01
        assert abs(merged.quantile(q) - whole.quantile(q)) < 0.05
    assert merged.n_items == len(s)
    # identity + payload merge dispatch
    empty = TDigest(100)
    assert merge_sketch_payloads([empty.to_bytes(), whole.to_bytes()])
    rt = TDigest.from_bytes(whole.to_bytes())
    assert rt.n_items == whole.n_items
    assert rt.quantile(0.5) == whole.quantile(0.5)


def test_compression_mismatch_and_garbage():
    with pytest.raises(ValueError):
        TDigest(100).merge_in_place(TDigest(200))
    with pytest.raises(ValueError):
        TDigest.from_bytes(b"nonsense")


def test_spark_tdigest_quantiles(spark, sequences_pdf):
    from rusty_bloomfilter_spark.operators.sketches import TDigestQuantiles

    df = spark.createDataFrame(sequences_pdf).repartition(6)
    qs = [0.05, 0.5, 0.95]
    got = TDigestQuantiles(compression=200, col="n_tok").quantiles(df, qs)
    vals = np.sort(sequences_pdf["n_tok"].to_numpy())
    for q, est in zip(qs, got):
        assert abs(rank_of(vals, est) - q) <= 0.03
