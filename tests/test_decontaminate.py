"""Decontamination: zero-FN eval-leak detection via broadcast Bloom."""

import numpy as np
import pandas as pd
import pytest

from rusty_bloomfilter_spark.operators.decontaminate import decontaminate


@pytest.fixture(scope="module")
def contamination_corpus(spark):
    rng = np.random.default_rng(47)
    NG = 8
    eval_docs = [rng.integers(0, 50257, size=60, dtype=np.int32) for _ in range(10)]
    train = []
    labels = {}
    for i in range(200):
        doc = rng.integers(0, 50257, size=rng.integers(30, 120), dtype=np.int32)
        doc_id = f"train-{i:04d}"
        if i % 10 == 0:
            # plant a verbatim eval passage (>= NG tokens) inside
            src = eval_docs[(i // 10) % len(eval_docs)]
            passage = src[5 : 5 + 20]
            pos = rng.integers(0, len(doc) - len(passage))
            doc = np.concatenate([doc[:pos], passage, doc[pos:]])
            labels[doc_id] = True
        else:
            labels[doc_id] = False
        train.append((doc_id, doc))
    eval_pdf = pd.DataFrame(
        {"doc_id": [f"eval-{i}" for i in range(10)], "tokens": eval_docs}
    )
    train_pdf = pd.DataFrame(
        {"doc_id": [d for d, _ in train], "tokens": [t for _, t in train]}
    )
    return (
        spark.createDataFrame(train_pdf),
        spark.createDataFrame(eval_pdf),
        labels,
        eval_docs,
        {d: t for d, t in train},
        NG,
    )


def test_zero_false_negatives_on_planted_leaks(spark, contamination_corpus):
    train_df, eval_df, labels, eval_docs, train_toks, NG = contamination_corpus
    out = {r["doc_id"]: r for r in decontaminate(train_df, eval_df, ngram=NG).collect()}
    assert len(out) == len(labels)
    for doc_id, leaked in labels.items():
        if leaked:
            # zero FN: every planted doc flagged, with >= the planted
            # passage's gram count as hits
            assert out[doc_id]["contaminated"], doc_id
            assert out[doc_id]["n_hits"] >= 20 - NG + 1


def test_hits_bounded_by_exact_overlap_plus_fpr(spark, contamination_corpus):
    """n_hits never undercounts the true shared-gram count (one-sided),
    and clean docs' spurious flag rate stays tiny at p=1e-6."""
    from rusty_bloomfilter_spark.sketch.hashing import ngram_hashes

    train_df, eval_df, labels, eval_docs, train_toks, NG = contamination_corpus
    eval_grams = set()
    for d in eval_docs:
        eval_grams.update(ngram_hashes(d, NG).tolist())
    out = {r["doc_id"]: r for r in decontaminate(train_df, eval_df, ngram=NG).collect()}
    spurious = 0
    for doc_id, r in out.items():
        true_hits = sum(
            1 for g in ngram_hashes(train_toks[doc_id], NG).tolist() if g in eval_grams
        )
        assert r["n_hits"] >= true_hits  # one-sided (FPs only add)
        if not labels[doc_id] and r["contaminated"] and true_hits == 0:
            spurious += 1
    assert spurious <= 2  # p=1e-6 x ~100 grams/doc x 180 clean docs


def test_min_hits_threshold(spark, contamination_corpus):
    train_df, eval_df, labels, *_ = contamination_corpus
    strict = {
        r["doc_id"]: r["contaminated"]
        for r in decontaminate(train_df, eval_df, ngram=8, min_hits=5).collect()
    }
    for doc_id, leaked in labels.items():
        if leaked:  # planted passages share 13 grams >> 5
            assert strict[doc_id]
