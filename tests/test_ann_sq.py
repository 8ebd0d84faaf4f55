"""Int8 scalar-quantized ANN: codec bounds and recall vs exact."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def emb_df(spark):
    rng = np.random.default_rng(47)
    vecs = rng.normal(size=(200, 64)).astype(np.float64)
    rows = [(i, v.tolist()) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    return df, vecs


def test_quantization_bounds(spark, emb_df):
    from pyspark.sql import functions as F

    from rusty_bloomfilter_spark.operators.similarity import quantize_sq8_expr

    df, vecs = emb_df
    q = df.select(quantize_sq8_expr(F.col("embedding")).alias("q")).collect()
    for row in q:
        arr = np.array(row["q"])
        assert np.abs(arr).max() == 127  # the max-|v| element hits the rail
        assert np.abs(arr).max() <= 127 and arr.dtype.kind == "i"


def test_zero_vector_filtered(spark):
    from rusty_bloomfilter_spark.operators.similarity import ann_sq_topk

    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [0.0, 0.0]), (2, [2.0, 1.0]), (3, [1.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    out = ann_sq_topk(df, [0], k=3).collect()
    ids = {r["neighbor_id"] for r in out}
    assert 1 not in ids and len(out) == 2


def test_recall_and_error_vs_exact(spark, emb_df):
    from rusty_bloomfilter_spark.operators.similarity import (
        ann_bruteforce_topk,
        ann_sq_topk,
    )

    df, vecs = emb_df
    probes = [0, 13, 77, 150, 199]
    exact = ann_bruteforce_topk(df, probes, k=5).collect()
    sq = ann_sq_topk(df, probes, k=5).collect()
    ex = {}
    for r in exact:
        ex.setdefault(r["query_id"], {})[r["neighbor_id"]] = r["cosine"]
    got = {}
    for r in sq:
        got.setdefault(r["query_id"], {})[r["neighbor_id"]] = r["cosine_sq"]
    hits = total = 0
    for q in probes:
        hits += len(set(ex[q]) & set(got[q]))
        total += 5
        # quantized cosine close to exact cosine for overlapping picks
        for n in set(ex[q]) & set(got[q]):
            assert abs(ex[q][n] - got[q][n]) < 0.02
    recall = hits / total
    assert recall >= 0.8, recall  # int8 @ 64 dims is near-lossless
