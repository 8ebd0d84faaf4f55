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
