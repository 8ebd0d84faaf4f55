"""Deterministic hash-order sampling + KMV distinct sketch."""

import contextlib
import io

import numpy as np
import pytest
from pyspark.sql import functions as F

from rusty_bloomfilter_spark.operators.sampling import (
    HASH_DOMAIN,
    bottom_k_by,
    bottom_k_sample,
    kmv_distinct,
)


@pytest.fixture(scope="module")
def seq_df(spark, sequences_pdf):
    return spark.createDataFrame(sequences_pdf)


def test_bottom_k_partition_invariant(spark, seq_df):
    a = [tuple(r) for r in bottom_k_sample(seq_df.repartition(2), "doc_id", 25).collect()]
    b = [tuple(r) for r in bottom_k_sample(seq_df.repartition(13), "doc_id", 25).collect()]
    assert a == b and len(a) == 25
    hashes = [h for _, h in a]
    assert hashes == sorted(hashes)


def test_bottom_k_sample_stability_under_growth(spark, seq_df):
    """Adding rows can only displace survivors, never reorder them:
    the k-sample of a subset is a superset-prefix relation."""
    small = {r["key"] for r in bottom_k_sample(seq_df.limit(500), "doc_id", 20).collect()}
    full_rows = bottom_k_sample(seq_df, "doc_id", 2000).collect()
    full_rank = {r["key"]: i for i, r in enumerate(full_rows)}
    # every sampled-from-subset key still hashes into the same global order
    ranked = sorted(small, key=lambda k: full_rank[k])
    assert [full_rank[k] >= 0 for k in ranked]


def test_bottom_k_uses_take_ordered_plan(spark, seq_df):
    """No full sort / no global shuffle: Spark plans orderBy+limit as
    TakeOrderedAndProject (per-partition top-k, driver merge)."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bottom_k_sample(seq_df, "doc_id", 25).explain("formatted")
    assert "TakeOrderedAndProject" in buf.getvalue()


def test_bottom_k_by_strata_counts(spark, seq_df):
    out = bottom_k_by(seq_df, "source", "doc_id", 7).collect()
    per = {}
    for r in out:
        per.setdefault(r["stratum"], []).append(r["h"])
    n_sources = seq_df.select("source").distinct().count()
    assert len(per) == n_sources
    for hs in per.values():
        assert len(hs) == 7 and hs == sorted(hs)


def test_kmv_estimate_accuracy(spark):
    """KMV rel. error is ~1/sqrt(k-2); assert within 4x that bound for
    a known distinct count."""
    n_distinct = 40_000
    df = spark.range(n_distinct * 2).select((F.col("id") % n_distinct).alias("k"))
    k = 512
    row = kmv_distinct(df, "k", k=k).collect()[0]
    est = row["est_distinct"]
    rel = abs(est - n_distinct) / n_distinct
    assert rel < 4.0 / np.sqrt(k - 2), (est, rel)
    assert row["n_hashes"] == k and 0 < row["kth_hash"] < HASH_DOMAIN


def test_kmv_small_domain_exact(spark):
    """Fewer distinct keys than k -> the exact count, not an estimate."""
    df = spark.range(1000).select((F.col("id") % 37).alias("k"))
    row = kmv_distinct(df, "k", k=256).collect()[0]
    assert row["n_hashes"] == 37 and row["est_distinct"] == 37.0


def test_kmv_overlap_exact_when_union_fits(spark):
    """Pairs whose union has < k distinct keys: estimates are EXACT."""
    from rusty_bloomfilter_spark.operators.sampling import kmv_overlap

    rows = [("A", f"k{i}") for i in range(30)] + [("B", f"k{i}") for i in range(20, 60)]
    df = spark.createDataFrame(rows, "grp string, key string")
    out = kmv_overlap(df, "grp", "key", k=256).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["source_a"], r["source_b"]) == ("A", "B")
    assert r["n_union_sample"] == 60
    assert r["est_union"] == 60.0
    assert r["est_intersection"] == 10.0
    assert r["est_a_minus_b"] == 20.0  # k0..k19
    assert r["est_b_minus_a"] == 30.0  # k30..k59
    assert r["jaccard"] == pytest.approx(10 / 60, abs=1e-6)


def test_kmv_overlap_estimates_within_bound(spark):
    """Planted overlap, union >> k: estimates land within the KMV
    relative-error envelope (~1/sqrt(k-2), generous 3x here)."""
    from rusty_bloomfilter_spark.operators.sampling import kmv_overlap

    k = 256
    n, shared = 5000, 1500
    rows = [("A", f"a{i}") for i in range(n - shared)]
    rows += [("B", f"b{i}") for i in range(n - shared)]
    rows += [(g, f"s{i}") for g in ("A", "B") for i in range(shared)]
    df = spark.createDataFrame(rows, "grp string, key string").repartition(7)
    r = kmv_overlap(df, "grp", "key", k=k).collect()[0]
    true_union = 2 * (n - shared) + shared
    rel = 3 / (k - 2) ** 0.5
    assert abs(r["est_union"] - true_union) / true_union < rel
    assert abs(r["est_intersection"] - shared) / shared < 3 * rel  # rho compounds
    only = n - shared  # |A \ B| == |B \ A| by construction
    assert abs(r["est_a_minus_b"] - only) / only < 3 * rel
    assert abs(r["est_b_minus_a"] - only) / only < 3 * rel
    # the three selectors partition the union sample exactly
    assert r["est_a_minus_b"] + r["est_b_minus_a"] + r["est_intersection"] == pytest.approx(
        r["est_union"], rel=1e-9
    )
    assert abs(r["jaccard"] - shared / true_union) < 0.1


def test_kmv_overlap_partition_invariant(spark):
    """Deterministic: identical output for any input partitioning."""
    from rusty_bloomfilter_spark.operators.sampling import kmv_overlap

    rows = [(f"g{i % 3}", f"key-{i % 400}") for i in range(2000)]
    df = spark.createDataFrame(rows, "grp string, key string")
    a = sorted(map(tuple, kmv_overlap(df.repartition(2), "grp", "key", k=64).collect()))
    b = sorted(map(tuple, kmv_overlap(df.repartition(13), "grp", "key", k=64).collect()))
    assert a == b and len(a) == 3


def test_null_keys_ignored_everywhere(spark):
    """NULL keys carry no identity: Spark sorts NULLS FIRST but DuckDB
    NULLS LAST, so keeping them would silently break cross-engine
    parity and occupy sketch slots. All four entry points drop them."""
    from rusty_bloomfilter_spark.operators.sampling import (
        bottom_k_by,
        bottom_k_sample,
        kmv_distinct,
        kmv_group_sketches,
        kmv_overlap,
    )

    rows = [("A", "k1"), ("A", None), ("B", "k2"), ("B", None), ("A", "k3")]
    df = spark.createDataFrame(rows, "grp string, key string")
    assert all(r["h"] is not None for r in bottom_k_sample(df, "key", 10).collect())
    assert all(r["h"] is not None for r in bottom_k_by(df, "grp", "key", 10).collect())
    assert all(r["h"] is not None for r in kmv_group_sketches(df, "grp", "key", 10).collect())
    kd = kmv_distinct(df, "key", k=5).collect()[0]
    assert kd["n_hashes"] == 3 and kd["est_distinct"] == 3.0
    ov = kmv_overlap(df, "grp", "key", k=5).collect()[0]
    assert ov["n_union_sample"] == 3  # k1,k2,k3 — no NULL slot


def test_weighted_sample_proportional_to_weight(spark):
    """A-ES property: inclusion probability scales with weight. With
    weights 10:1 over two equal-size populations and k = 10% of keys,
    heavy keys must dominate the sample (binomial bound, det. hash)."""
    from rusty_bloomfilter_spark.operators.sampling import weighted_bottom_k

    rows = [(f"heavy-{i}", 10.0) for i in range(1000)]
    rows += [(f"light-{i}", 1.0) for i in range(1000)]
    df = spark.createDataFrame(rows, "key string, w double")
    out = weighted_bottom_k(df, "key", "w", 200).collect()
    heavy = sum(1 for r in out if r["key"].startswith("heavy"))
    # E[heavy] ~ 183 of 200 at 10:1 odds (without-replacement tilt);
    # any deterministic-hash draw lands well above 150
    assert heavy >= 150, heavy
    assert all(r["score"] >= 0 for r in out)
    # ordered output, scores ascending
    scores = [r["score"] for r in out]
    assert scores == sorted(scores)


def test_weighted_sample_partition_invariant_and_mergeable(spark):
    from rusty_bloomfilter_spark.operators.sampling import weighted_bottom_k

    rows = [(f"k{i}", 1.0 + (i % 7)) for i in range(3000)]
    df = spark.createDataFrame(rows, "key string, w double")
    a = [tuple(r) for r in weighted_bottom_k(df.repartition(3), "key", "w", 64).collect()]
    b = [tuple(r) for r in weighted_bottom_k(df.repartition(11), "key", "w", 64).collect()]
    assert a == b
    # merge property: bottom-k of (bottom-k of halves) == bottom-k of whole
    h1 = spark.createDataFrame(rows[:1500], "key string, w double")
    h2 = spark.createDataFrame(rows[1500:], "key string, w double")
    part = weighted_bottom_k(h1, "key", "w", 64).unionByName(
        weighted_bottom_k(h2, "key", "w", 64)
    )
    merged = [
        tuple(r) for r in part.orderBy("score", "key").limit(64).collect()
    ]
    assert merged == a


def test_weighted_sample_excludes_nulls_and_nonpositive(spark):
    from rusty_bloomfilter_spark.operators.sampling import weighted_bottom_k

    rows = [("a", 2.0), (None, 5.0), ("b", 0.0), ("c", -1.0), ("d", 1.0)]
    df = spark.createDataFrame(rows, "key string, w double")
    keys = {r["key"] for r in weighted_bottom_k(df, "key", "w", 10).collect()}
    assert keys == {"a", "d"}


# -- fixed_width_histogram --------------------------------------------------


def test_fixed_width_histogram_bins_and_bounds(spark):
    from pyspark.sql import functions as F

    from rusty_bloomfilter_spark.operators.sampling import fixed_width_histogram

    df = spark.range(100).select(
        (F.col("id") % 3).cast("string").alias("g"), F.col("id").alias("v")
    )
    rows = fixed_width_histogram(df, "v", 10, group_col="g").collect()
    # every bin: lo = bin*10, hi = lo+10, and counts re-derive exactly
    import collections

    want = collections.Counter((str(i % 3), i // 10) for i in range(100))
    got = {(r.g, r.bin): r.n_rows for r in rows}
    assert got == dict(want)
    for r in rows:
        assert r.lo == r.bin * 10 and r.hi == r.lo + 10


def test_fixed_width_histogram_ungrouped_nulls_and_total(spark):
    from pyspark.sql import functions as F

    from rusty_bloomfilter_spark.operators.sampling import fixed_width_histogram

    df = spark.range(50).select(
        F.when(F.col("id") % 5 == 0, None).otherwise(F.col("id")).alias("v")
    )
    rows = fixed_width_histogram(df, "v", 8).collect()
    assert sum(r.n_rows for r in rows) == 40  # NULLs excluded
    assert all(r.n_rows > 0 for r in rows)  # sparse: no empty bins


def test_fixed_width_histogram_counts_merge(spark):
    """Mergeability: histogram(A union B) == binwise sum of the parts."""
    from pyspark.sql import functions as F

    from rusty_bloomfilter_spark.operators.sampling import fixed_width_histogram

    a = spark.range(0, 60).select(F.col("id").alias("v"))
    b = spark.range(30, 90).select(F.col("id").alias("v"))
    whole = {
        r.bin: r.n_rows
        for r in fixed_width_histogram(a.union(b), "v", 16).collect()
    }
    pa_ = {r.bin: r.n_rows for r in fixed_width_histogram(a, "v", 16).collect()}
    pb = {r.bin: r.n_rows for r in fixed_width_histogram(b, "v", 16).collect()}
    merged = {k: pa_.get(k, 0) + pb.get(k, 0) for k in set(pa_) | set(pb)}
    assert whole == merged


def test_fixed_width_histogram_rejects_nonpositive_width(spark):
    import pytest

    from rusty_bloomfilter_spark.operators.sampling import fixed_width_histogram

    with pytest.raises(ValueError, match="width"):
        fixed_width_histogram(spark.range(1), "id", 0)
