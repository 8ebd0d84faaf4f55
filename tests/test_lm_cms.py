"""CMS-backed bigram-LM scorer vs the exact table-join scorer."""
import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from rusty_bloomfilter_spark.operators.lm import bigram_lm_scores_cms


def _py_scores(rows, vocab):
    uni: Counter = Counter()
    pairs: Counter = Counter()
    for _, toks in rows:
        uni.update(toks)
        pairs.update(zip(toks, toks[1:]))
    out = {}
    for doc, toks in rows:
        if len(toks) < 2:
            continue
        lps = [
            math.log((pairs[(a, b)] + 1) / (uni[a] + vocab))
            for a, b in zip(toks, toks[1:])
        ]
        out[doc] = (len(lps), round(sum(lps) / len(lps), 6))
    return out


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        ("d0", [5, 6, 7, 5, 6, 7, 5, 6]),   # fluent: repeated transitions
        ("d1", [5, 6, 7, 8, 9, 5, 6]),
        ("d2", [31, 17, 43, 2, 29]),          # garbage: all-hapax pairs
        ("d3", [5, 6]),
        ("d4", [44]),                          # single token: no pairs
        ("d5", []),                            # empty row ending the set
    ]
    df = spark.createDataFrame(rows, schema="doc_id string, tokens array<int>")
    return df, rows


def test_cms_equals_python_oracle_when_collision_free(corpus):
    df, rows = corpus
    vocab = 50
    got = {
        r.doc_id: (r.n_pairs, r.lm_score_cms)
        for r in bigram_lm_scores_cms(df, vocab=vocab, w=1 << 14).collect()
    }
    # tiny distinct-key set + wide sketch => collision-free => exact
    assert got == _py_scores(rows, vocab)


def test_short_and_empty_docs_excluded(corpus):
    df, _ = corpus
    ids = {r.doc_id for r in bigram_lm_scores_cms(df, vocab=50).collect()}
    assert ids == {"d0", "d1", "d2", "d3"}


def test_ranking_survives_heavy_collisions(corpus):
    df, rows = corpus
    # w=16 forces collisions; the fluent doc must still outrank garbage
    got = {
        r.doc_id: r.lm_score_cms
        for r in bigram_lm_scores_cms(df, vocab=50, d=3, w=16).collect()
    }
    assert got["d0"] > got["d2"]
    # CMS only OVERestimates counts: numerator can only grow, and the
    # unigram denominators here are exact-or-larger too; per-pair error
    # is bounded by ln(1 + over/(c+1)) - pin scores stay finite & sane
    assert all(-20 < v < 0 for v in got.values())


def test_partitioning_invariance(corpus):
    df, _ = corpus
    a = sorted(map(tuple, bigram_lm_scores_cms(df.repartition(7), vocab=50).collect()))
    b = sorted(map(tuple, bigram_lm_scores_cms(df.coalesce(1), vocab=50).collect()))
    assert a == b


def test_matches_exact_spark_scorer(spark, corpus):
    df, _ = corpus
    from rusty_bloomfilter_spark.operators.dedup import bigram_lm_scores

    ex = {
        (r.doc_id, r.n_pairs): r.lm_score
        for r in bigram_lm_scores(df, vocab=50257).collect()
    }
    cm = {
        (r.doc_id, r.n_pairs): r.lm_score_cms
        for r in bigram_lm_scores_cms(df, vocab=50257).collect()
    }
    assert ex == cm


# -- bigram_entropy ---------------------------------------------------------


def test_bigram_entropy_matches_bruteforce(spark):
    import math
    from collections import Counter

    import pytest

    from rusty_bloomfilter_spark.operators.lm import bigram_entropy

    rows = [
        ("a", [1, 2, 1, 2, 1, 2, 3]),
        ("a", [2, 1, 2, 1]),
        ("b", [5, 5, 5, 5, 5]),
    ]
    df = spark.createDataFrame(rows, "source string, tokens array<int>")
    got = {r["source"]: r for r in bigram_entropy(df).collect()}

    for g in ("a", "b"):
        pairs = []
        for src, toks in rows:
            if src == g:
                pairs += list(zip(toks, toks[1:]))
        c = Counter(pairs)
        n = len(pairs)
        ca = Counter(a for a, _ in pairs)
        cb = Counter(b for _, b in pairs)
        h_cond = -sum(v * math.log(v / ca[a]) for (a, _), v in c.items()) / n
        h_right = -sum(v * math.log(cb[b] / n) for (_, b), v in c.items()) / n
        r = got[g]
        assert r["n_pairs"] == n
        assert r["h_cond"] == pytest.approx(h_cond, abs=1e-6)
        assert r["h_right"] == pytest.approx(h_right, abs=1e-6)
        assert r["mutual_info"] == pytest.approx(h_right - h_cond, abs=1e-6)
    # constant text: every next token is pinned -> zero conditional entropy
    assert got["b"]["h_cond"] == 0.0 and got["b"]["h_right"] == 0.0


def test_bigram_entropy_template_vs_shuffled(spark):
    import numpy as np

    from rusty_bloomfilter_spark.operators.lm import bigram_entropy

    rng = np.random.default_rng(6)
    template = [int(x) for x in ([7, 8, 9, 10] * 100)]
    shuffled = [int(x) for x in rng.integers(7, 11, size=400)]
    df = spark.createDataFrame(
        [("tmpl", template), ("rand", shuffled)], "source string, tokens array<int>"
    )
    got = {r["source"]: r for r in bigram_entropy(df).collect()}
    # deterministic cycle: H(next|prev) = 0 but H(next) = ln 4
    assert got["tmpl"]["h_cond"] == 0.0
    assert got["tmpl"]["mutual_info"] > 1.3
    # iid uniform: next is unpredictable, MI near 0
    assert got["rand"]["h_cond"] > 1.2 and got["rand"]["mutual_info"] < 0.1
