"""Percentile-rank normalization: broadcast-KLL ranks vs exact
cume_dist, plus the rank_batch kernel itself."""
import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rusty_bloomfilter_spark.operators.percentiles import percentile_normalize
from rusty_bloomfilter_spark.sketch import KLLSketch


def test_rank_batch_matches_scalar_rank():
    rng = np.random.default_rng(3)
    sk = KLLSketch(200)
    data = rng.lognormal(3, 1, 50_000)
    sk.update_batch(data)
    probes = np.concatenate([rng.choice(data, 50), [data.min() - 1, data.max() + 1]])
    batch = sk.rank_batch(probes)
    for v, r in zip(probes, batch):
        assert r == pytest.approx(sk.rank(float(v)))
    # NaN in, NaN out; empty sketch -> all NaN
    assert np.isnan(sk.rank_batch(np.array([np.nan]))[0])
    assert np.isnan(KLLSketch(200).rank_batch(np.array([1.0]))).all()


def test_rank_batch_within_published_error():
    rng = np.random.default_rng(11)
    data = rng.lognormal(3, 1, 200_000)
    sk = KLLSketch(200)
    for lo in range(0, data.size, 37_000):  # streamed in uneven chunks
        sk.update_batch(data[lo : lo + 37_000])
    probes = np.quantile(data, [0.01, 0.1, 0.5, 0.9, 0.99])
    true_ranks = np.array([(data <= p).mean() for p in probes])
    est = sk.rank_batch(probes)
    assert np.abs(est - true_ranks).max() <= 3 * sk.rank_error()


@pytest.fixture(scope="module")
def values_df(spark):
    rng = np.random.default_rng(5)
    vals = rng.integers(1, 500, 3000).tolist()
    rows = [(i, int(v)) for i, v in enumerate(vals)] + [(3000, None)]
    return spark.createDataFrame(rows, schema="id bigint, v int"), vals


def test_percentile_normalize_tracks_cume_dist(values_df):
    df, vals = values_df
    out = percentile_normalize(df, "v", k=200)
    exact = {
        r.id: r.pct
        for r in df.where(F.col("v").isNotNull())
        .withColumn("pct", F.cume_dist().over(Window.orderBy("v")))
        .collect()
    }
    rank_err = KLLSketch(200).rank_error()
    got = out.collect()
    assert len(got) == len(vals) + 1
    for r in got:
        if r.v is None:
            assert r.pct_est is None or np.isnan(r.pct_est)
        else:
            assert abs(r.pct_est - exact[r.id]) <= 3 * rank_err, (r, exact[r.id])


def test_percentile_normalize_partitioning_stays_in_bound(values_df):
    # KLL compaction depends on merge order (unlike the bitwise-
    # invariant Bloom/HLL/CMS algebra), so different partitionings give
    # DIFFERENT summaries — but every one stays inside the published
    # rank error, which is the operator's actual contract
    df, _ = values_df
    a = dict(
        (r.id, r.pct_est)
        for r in percentile_normalize(df.repartition(7), "v").collect()
        if r.v is not None
    )
    b = dict(
        (r.id, r.pct_est)
        for r in percentile_normalize(df.coalesce(1), "v").collect()
        if r.v is not None
    )
    rank_err = KLLSketch(200).rank_error()
    assert a.keys() == b.keys()
    worst = max(abs(a[i] - b[i]) for i in a)
    assert worst <= 2 * 3 * rank_err


# -- weighted_length_quantiles ----------------------------------------------


def test_weighted_quantiles_bruteforce(spark):
    import numpy as np
    import pytest

    from rusty_bloomfilter_spark.operators.percentiles import (
        weighted_length_quantiles,
    )

    rng = np.random.default_rng(19)
    rows = [("a", f"d{i:03d}", int(rng.integers(1, 500))) for i in range(50)]
    df = spark.createDataFrame(rows, "source string, doc_id string, n_tok long")
    got = weighted_length_quantiles(df, pcts=(50, 90)).collect()[0]
    ws = sorted(w for _, _, w in rows)
    tot = sum(ws)

    def pick(p):
        cum = 0
        for w in ws:
            cum += w
            if 100 * cum >= p * tot:
                return w

    assert got["total_weight"] == tot and got["n_docs"] == 50
    assert got["w_p50"] == pick(50)
    assert got["w_p90"] == pick(90)


def test_weighted_vs_doc_median_on_skew(spark):
    import pytest

    from rusty_bloomfilter_spark.operators.percentiles import (
        weighted_length_quantiles,
    )

    # 9 tiny docs + 1 giant: doc-median is 1 but the median TOKEN
    # lives in the giant
    rows = [("s", f"d{i}", 1) for i in range(9)] + [("s", "d9", 1000)]
    df = spark.createDataFrame(rows, "source string, doc_id string, n_tok long")
    got = weighted_length_quantiles(df, pcts=(50,)).collect()[0]
    assert got["w_p50"] == 1000
    with pytest.raises(ValueError, match="pcts"):
        weighted_length_quantiles(df, pcts=(0,))
