"""Bloom union/intersection estimators as a distributed query
(reference mod.rs:38-54) vs exact distinct overlaps."""

import numpy as np
import pandas as pd
import pytest

from rusty_bloomfilter_spark.plans import source_overlap
from rusty_bloomfilter_spark.sketch import Shape


@pytest.fixture(scope="module")
def overlap_df(spark):
    """Three sources with controlled distinct-token overlap."""
    rng = np.random.default_rng(13)
    shared = rng.choice(100_000, size=2000, replace=False).astype(np.int32)
    only = {
        s: rng.choice(np.arange(200_000, 400_000), size=3000, replace=False).astype(np.int32)
        for s in ("a", "b", "c")
    }
    pools = {
        "a": np.concatenate([shared, only["a"]]),
        "b": np.concatenate([shared[:1000], only["b"]]),
        "c": only["c"],
    }
    rows = []
    for s, pool in pools.items():
        for i in range(120):
            rows.append((f"{s}-{i}", rng.choice(pool, size=150).astype(np.int32), s))
    pdf = pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "tokens": [r[1] for r in rows],
            "n_tok": [150] * len(rows),
            "source": [r[2] for r in rows],
        }
    )
    return spark.createDataFrame(pdf), pools


def test_source_overlap_estimates(spark, overlap_df):
    df, pools = overlap_df
    out = {
        (r["source_a"], r["source_b"]): r
        for r in source_overlap(spark, df, shape=Shape.for_np(n=100_000, p=1e-4)).collect()
    }
    seen = {s: None for s in pools}
    # exact distinct per source actually sampled into docs
    import numpy as np

    pdf = df.toPandas()
    actual = {
        s: np.unique(np.concatenate(list(pdf.loc[pdf.source == s, "tokens"])))
        for s in pools
    }
    for (a, b), r in out.items():
        exact_union = len(np.union1d(actual[a], actual[b]))
        exact_inter = len(np.intersect1d(actual[a], actual[b]))
        assert r["est_union"] == pytest.approx(exact_union, rel=0.03)
        assert r["est_intersection"] == pytest.approx(exact_inter, rel=0.1, abs=60)
    # ordering sanity: a∩b >> a∩c (c is disjoint)
    assert out[("a", "b")]["est_intersection"] > 5 * max(
        out[("a", "c")]["est_intersection"], 1
    )


def test_source_overlap_is_lazy_no_driver_collect(spark):
    """The pairwise stage must run executor-side: constructing the
    overlap DataFrame triggers no Spark job (previously every per-key
    payload was collect()ed to the driver at plan time)."""
    from pyspark.sql import functions as F

    from rusty_bloomfilter_spark.plans import source_overlap
    from rusty_bloomfilter_spark.sketch import Shape

    def boom(batches):
        raise RuntimeError("executed during planning")
        yield  # pragma: no cover

    poisoned = (
        spark.range(10)
        .select(
            F.concat(F.lit("s"), F.col("id") % 3).alias("source"),
            F.array(F.col("id").cast("int")).alias("tokens"),
        )
        .mapInArrow(boom, schema="source string, tokens array<int>")
    )
    df = source_overlap(spark, poisoned, shape=Shape.for_np(n=1000, p=1e-3))
    import pytest

    with pytest.raises(Exception, match="executed during planning"):
        df.count()


def test_hll_union_intersection_estimates():
    """HLL set algebra: union via register max (exact HLL semantics),
    intersection via inclusion-exclusion — within compounded error
    bounds on known overlaps."""
    import numpy as np

    from rusty_bloomfilter_spark.sketch import HyperLogLog

    rng = np.random.default_rng(21)
    a_keys = rng.choice(10**9, 60_000, replace=False)
    b_keys = np.concatenate([a_keys[:20_000], rng.choice(10**9, 40_000, replace=False) + 10**10])
    a = HyperLogLog(p=14).add_tokens(a_keys.astype(np.int64))
    b = HyperLogLog(p=14).add_tokens(b_keys.astype(np.int64))
    true_union = len(np.union1d(a_keys, b_keys))
    union = a.estimate_union(b)
    assert abs(union - true_union) / true_union < 3 * a.relative_error()
    # union estimate == merged-sketch estimate (same registers)
    assert union == a.merge(b).estimate()
    inter = a.estimate_intersection(b)
    # inclusion-exclusion compounds three estimates' errors
    assert abs(inter - 20_000) / 20_000 < 9 * a.relative_error()
    # mismatched precision rejected
    import pytest as _pytest

    with _pytest.raises(ValueError, match="precision mismatch"):
        a.estimate_union(HyperLogLog(p=12))


def test_source_overlap_null_keys_excluded_cheaply(spark, overlap_df):
    """Rows with a NULL group key can never appear in a pair (NULL < x
    is NULL) — they are filtered BEFORE the keyed build so no sketch is
    built for them, and the named-source pairs still come out."""
    from pyspark.sql import functions as F

    df, _pools = overlap_df
    with_null = df.withColumn(
        "source",
        F.when(F.xxhash64("doc_id") % 7 == 0, None).otherwise(F.col("source")),
    )
    rows = source_overlap(spark, with_null, sketch="hll").collect()
    assert len(rows) == 3  # a-b, a-c, b-c
    for r in rows:
        assert r.source_a is not None and r.source_b is not None
