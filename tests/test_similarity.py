"""ANN: brute-force exactness vs numpy oracle; LSH recall vs brute."""

import numpy as np
import pandas as pd
import pytest

from rusty_bloomfilter_spark.operators.similarity import ann_bruteforce_topk, ann_lsh_topk


@pytest.fixture(scope="module")
def emb_df(spark):
    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((200, 32)).astype(np.float32)
    pdf = pd.DataFrame(
        {"vec_id": np.arange(200, dtype=np.int64), "embedding": [v for v in vecs]}
    )
    return spark.createDataFrame(pdf).repartition(4), vecs


def numpy_topk(vecs, qid, k):
    v = vecs.astype(np.float64)
    q = v[qid]
    sims = (v @ q) / (np.linalg.norm(v, axis=1) * np.linalg.norm(q))
    sims[qid] = -np.inf
    order = np.lexsort((np.arange(len(v)), -np.round(sims, 6)))
    return [(int(i), round(float(sims[i]), 6)) for i in order[:k]]


def test_bruteforce_matches_numpy(spark, emb_df):
    df, vecs = emb_df
    qids = [0, 17, 99]
    out = ann_bruteforce_topk(df, qids, k=5).collect()
    got = {}
    for r in out:
        got.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"], r["cosine"]))
    for q in qids:
        mine = [(n, c) for _, n, c in sorted(got[q])]
        oracle = numpy_topk(vecs, q, 5)
        assert [n for n, _ in mine] == [n for n, _ in oracle]
        for (_, cm), (_, co) in zip(mine, oracle):
            assert cm == pytest.approx(co, abs=2e-6)


def test_lsh_recall_vs_bruteforce(spark, emb_df):
    df, vecs = emb_df
    qids = list(range(0, 40, 4))
    brute = ann_bruteforce_topk(df, qids, k=3).collect()
    lsh = ann_lsh_topk(df, qids, k=3, n_planes=16, bands=8).collect()
    bset = {(r["query_id"], r["neighbor_id"]) for r in brute}
    lset = {(r["query_id"], r["neighbor_id"]) for r in lsh}
    recall = len(bset & lset) / len(bset)
    assert recall >= 0.5  # 8 bands of 2 bits: generous candidate net
    # every LSH hit must carry the exact cosine (re-ranked)
    bcos = {(r["query_id"], r["neighbor_id"]): r["cosine"] for r in brute}
    for r in lsh:
        key = (r["query_id"], r["neighbor_id"])
        if key in bcos:
            assert r["cosine"] == pytest.approx(bcos[key], abs=1e-9)


def test_ivf_centroids_partition_invariant(spark):
    """Hash-ordered init + Lloyd partial sums -> identical centroids
    regardless of input partitioning (no RNG anywhere)."""
    import numpy as np

    from rusty_bloomfilter_spark.operators.similarity import ivf_train_centroids
    from rusty_bloomfilter_spark.sources import load_table

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    c2 = ivf_train_centroids(emb.repartition(2), n_centroids=8, iters=3)
    c7 = ivf_train_centroids(emb.repartition(7), n_centroids=8, iters=3)
    assert np.allclose(c2, c7, atol=1e-12)
    assert np.allclose(np.linalg.norm(c2, axis=1), 1.0)


def test_ivf_recall_and_exact_degeneration(spark):
    from rusty_bloomfilter_spark.operators.similarity import (
        ann_bruteforce_topk,
        ann_ivf_topk,
    )
    from rusty_bloomfilter_spark.sources import load_table

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    qids = [0, 7, 42, 99, 123]
    want = {(r["query_id"], r["neighbor_id"]) for r in ann_bruteforce_topk(emb, qids, k=5).collect()}
    # uniform random embeddings are IVF's worst case; nprobe=8/16 still
    # recalls >= 0.85
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_ivf_topk(emb, qids, k=5, n_centroids=16, nprobe=8).collect()
    }
    assert len(got & want) / len(want) >= 0.85
    # probing every list degenerates to the exact result
    exact = {
        (r["query_id"], r["neighbor_id"], r["cosine"])
        for r in ann_ivf_topk(emb, qids, k=5, n_centroids=8, nprobe=8).collect()
    }
    bf = {
        (r["query_id"], r["neighbor_id"], r["cosine"])
        for r in ann_bruteforce_topk(emb, qids, k=5).collect()
    }
    assert exact == bf


def test_ivf_index_parquet_roundtrip_and_no_retrain(spark, tmp_path, monkeypatch):
    """Train once, persist, reload, probe — the probe path must run NO
    Lloyd/assignment stages (train is monkeypatched to explode), and the
    reloaded index must reproduce the fresh ann_ivf_topk result."""
    import rusty_bloomfilter_spark.operators.similarity as sim
    from rusty_bloomfilter_spark.operators.similarity import IvfIndex, ann_ivf_topk
    from rusty_bloomfilter_spark.sources import load_table

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    qids = [0, 7, 42, 99, 123]
    fresh = {
        (r["query_id"], r["neighbor_id"], r["cosine"], r["rank"])
        for r in ann_ivf_topk(emb, qids, k=5, n_centroids=8, nprobe=8).collect()
    }

    idx = IvfIndex.train(emb, n_centroids=8, iters=4)
    path = str(tmp_path / "ivf_idx")
    idx.write(path)
    reloaded = IvfIndex.read(spark, path)
    assert np.allclose(reloaded.centroids, idx.centroids, atol=1e-15)

    # no second training: any Lloyd/assignment call now explodes
    def boom(*a, **kw):
        raise AssertionError("probe path must not retrain/reassign")

    monkeypatch.setattr(sim, "ivf_train_centroids", boom)
    monkeypatch.setattr(sim, "ivf_assign", boom)
    got = {
        (r["query_id"], r["neighbor_id"], r["cosine"], r["rank"])
        for r in reloaded.probe(emb, qids, k=5, nprobe=8).collect()
    }
    assert got == fresh
    # second batch, still no retraining, partition pruning on cluster
    got2 = reloaded.probe(emb, [3, 55], k=3, nprobe=2)
    assert got2.count() == 6


def test_ann_ivf_topk_accepts_prebuilt_index(spark):
    from rusty_bloomfilter_spark.operators.similarity import IvfIndex, ann_ivf_topk
    from rusty_bloomfilter_spark.sources import load_table

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    idx = IvfIndex.train(emb, n_centroids=8, iters=4)
    a = ann_ivf_topk(emb, [5, 9], k=4, nprobe=8, index=idx).collect()
    b = ann_ivf_topk(emb, [5, 9], k=4, n_centroids=8, nprobe=8).collect()
    assert {tuple(r) for r in a} == {tuple(r) for r in b}


def test_lsh_tolerates_null_and_ragged_embeddings(spark, emb_df):
    """One NULL or wrong-width embedding row must not abort the LSH job
    (round-4 review, CONFIRMED crash): invalid rows drop out, matching
    the brute-force path's tolerance."""
    from pyspark.sql import functions as F

    df, _vecs = emb_df
    dirty = df.withColumn(
        "embedding",
        F.when(F.col("vec_id") == 150, F.lit(None))
        .when(F.col("vec_id") == 151, F.expr("slice(embedding, 1, 5)"))
        .otherwise(F.col("embedding")),
    )
    out = ann_lsh_topk(dirty, [0, 17], k=3, dim=32).collect()
    assert out, "valid rows must still produce neighbors"
    ids = {r.neighbor_id for r in out}
    assert 150 not in ids and 151 not in ids


def test_lsh_rejects_indivisible_bands(spark, emb_df):
    df, _ = emb_df
    with pytest.raises(ValueError, match="divisible"):
        ann_lsh_topk(df, [0], k=2, n_planes=20, bands=8, dim=32)


def test_ivf_assign_tolerates_null_embeddings(spark, emb_df):
    from pyspark.sql import functions as F

    from rusty_bloomfilter_spark.operators.similarity import (
        ivf_assign,
        ivf_train_centroids,
    )

    df, _ = emb_df
    dirty = df.withColumn(
        "embedding",
        F.when(F.col("vec_id") == 7, F.lit(None)).otherwise(F.col("embedding")),
    )
    C = ivf_train_centroids(dirty, n_centroids=4, iters=2)
    assigned = ivf_assign(dirty, C).collect()
    ids = {r.id for r in assigned}
    assert 7 not in ids and len(ids) == 199


def test_ivf_index_train_persists_assignments(spark, emb_df):
    """train() must persist the assignment frame (probe() reuses it
    without re-running the corpus assignment scan) and free() must
    release it."""
    from rusty_bloomfilter_spark.operators.similarity import IvfIndex

    df, _ = emb_df
    jsc = spark.sparkContext._jsc
    base = jsc.getPersistentRDDs().size()
    idx = IvfIndex.train(df, n_centroids=4, iters=1)
    try:
        assert idx.probe(df, [0], k=2).count() > 0  # materializes the cache
        assert jsc.getPersistentRDDs().size() == base + 1
        assert idx.assignments.storageLevel.useMemory
    finally:
        idx.free()
    assert jsc.getPersistentRDDs().size() == base
