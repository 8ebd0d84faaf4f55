"""Distributed BPE merge training vs a pure-Python reference."""

import numpy as np
import pandas as pd
import pytest

from rusty_bloomfilter_spark.operators.bpe import (
    PAIR_BASE,
    apply_merge_flat,
    learn_bpe_merges,
)


def ref_bpe(docs, n_merges, vocab, min_freq=2):
    """Sequential greedy BPE, the textbook algorithm."""
    docs = [list(map(int, d)) for d in docs]
    merges = []
    for t in range(n_merges):
        counts = {}
        for d in docs:
            for i in range(len(d) - 1):
                counts[(d[i], d[i + 1])] = counts.get((d[i], d[i + 1]), 0) + 1
        if not counts:
            break
        (a, b), freq = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0] * PAIR_BASE + kv[0][1])
        )
        if freq < min_freq:
            break
        new_id = vocab + t
        merges.append((a, b, new_id, freq))
        out_docs = []
        for d in docs:
            out = []
            i = 0
            while i < len(d):
                if i + 1 < len(d) and d[i] == a and d[i + 1] == b:
                    out.append(new_id)
                    i += 2
                else:
                    out.append(d[i])
                    i += 1
            out_docs.append(out)
        docs = out_docs
    return merges, docs


def test_apply_merge_flat_greedy_semantics():
    # "aaa" -> (aa, a); "aaaa" -> (aa, aa); boundary never merges
    flat = np.array([7, 7, 7, 7, 7, 7, 7], dtype=np.int64)
    lengths = np.array([3, 4])
    new_flat, new_lengths = apply_merge_flat(flat, lengths, 7, 7, 99)
    assert new_flat.tolist() == [99, 7, 99, 99]
    assert new_lengths.tolist() == [2, 2]
    # cross-row adjacency must NOT merge
    flat2 = np.array([1, 2, 1, 2], dtype=np.int64)
    nf, nl = apply_merge_flat(flat2, np.array([3, 1]), 2, 1, 50)
    assert nf.tolist() == [1, 50, 2] and nl.tolist() == [2, 1]


def test_learn_bpe_matches_reference(spark):
    rng = np.random.default_rng(31)
    vocab = 24
    docs = [rng.integers(0, vocab, size=rng.integers(4, 40)).tolist() for _ in range(120)]
    pdf = pd.DataFrame(
        {"doc_id": [f"d{i:03d}" for i in range(120)], "tokens": [np.array(d, dtype=np.int32) for d in docs]}
    )
    df = spark.createDataFrame(pdf)
    merges, merged = learn_bpe_merges(df, n_merges=8, vocab=vocab)
    ref_merges, ref_docs = ref_bpe(docs, 8, vocab)
    assert merges == ref_merges and len(merges) == 8
    got = {r["doc_id"]: list(r["tokens"]) for r in merged.collect()}
    for i, d in enumerate(ref_docs):
        assert got[f"d{i:03d}"] == d, f"doc d{i:03d}"
    merged.unpersist()


def test_learn_bpe_partition_invariant_and_early_stop(spark):
    rng = np.random.default_rng(33)
    docs = [rng.integers(0, 6, size=10).tolist() for _ in range(20)]
    pdf = pd.DataFrame(
        {"doc_id": [f"d{i}" for i in range(20)], "tokens": [np.array(d, dtype=np.int32) for d in docs]}
    )
    df = spark.createDataFrame(pdf)
    m2, s2 = learn_bpe_merges(df.repartition(2), n_merges=5, vocab=6)
    m7, s7 = learn_bpe_merges(df.repartition(7), n_merges=5, vocab=6)
    assert m2 == m7
    s2.unpersist(), s7.unpersist()
    # min_freq early stop: a corpus where every pair is unique
    tiny = spark.createDataFrame(
        pd.DataFrame({"doc_id": ["x"], "tokens": [np.arange(5, dtype=np.int32)]})
    )
    m, s = learn_bpe_merges(tiny, n_merges=3, vocab=50257, min_freq=2)
    assert m == []
    s.unpersist()
