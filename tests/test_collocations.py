"""PMI collocation mining vs a pure-python oracle."""
import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from rusty_bloomfilter_spark.operators.collocations import pmi_collocations

VOCAB = 50261


def _py_pmi(rows, min_count, top_n):
    uni: Counter = Counter()
    pairs: Counter = Counter()
    n_tokens = 0
    n_pairs = 0
    for toks in rows:
        uni.update(toks)
        n_tokens += len(toks)
        n_pairs += max(len(toks) - 1, 0)
        pairs.update(zip(toks, toks[1:]))
    out = []
    for (a, b), c in pairs.items():
        if c < min_count:
            continue
        pmi = round(
            math.log(c * n_tokens * n_tokens / (n_pairs * uni[a] * uni[b])), 6
        )
        out.append((a, b, c, pmi))
    out.sort(key=lambda r: (-r[3], r[0], r[1]))
    return out[:top_n]


@pytest.fixture(scope="module")
def seq(spark):
    # phrase-heavy corpus: (7,8) always adjacent, (1,2) often adjacent,
    # 9 frequent-but-unassociated filler
    rows = [
        [7, 8, 9, 1, 2, 9, 7, 8],
        [9, 9, 7, 8, 1, 2, 9],
        [1, 9, 2, 7, 8, 9, 9],
        [7, 8, 7, 8, 9, 1, 2],
        [3],
        [],
    ]
    return (
        spark.createDataFrame(
            [(str(i), r) for i, r in enumerate(rows)],
            schema="doc_id string, tokens array<int>",
        ),
        rows,
    )


def test_pmi_matches_python_oracle(seq):
    df, rows = seq
    got = [
        (r.left_tok, r.right_tok, r.pair_freq, r.pmi)
        for r in pmi_collocations(df, min_count=2, top_n=10).collect()
    ]
    assert got == _py_pmi(rows, 2, 10)


def test_pmi_association_beats_frequency(seq):
    df, rows = seq
    top = pmi_collocations(df, min_count=2, top_n=3).collect()
    # the true phrases (1,2) and (7,8) rank above everything even
    # though token 9 is the most frequent unigram; the frequent-but-
    # unassociated (9,9) pair scores negative PMI and never surfaces
    pair_set = {(r.left_tok, r.right_tok) for r in top}
    assert {(1, 2), (7, 8)} <= pair_set
    assert (9, 9) not in pair_set
    assert top[0].pmi >= top[1].pmi >= top[2].pmi


def test_min_count_filters_hapax_pairs(seq):
    df, rows = seq
    got = pmi_collocations(df, min_count=3, top_n=50).collect()
    truth = _py_pmi(rows, 3, 50)
    assert [(r.left_tok, r.right_tok) for r in got] == [
        (a, b) for a, b, _, _ in truth
    ]
    assert all(r.pair_freq >= 3 for r in got)


def test_partitioning_invariance(seq):
    df, rows = seq
    a = pmi_collocations(df.repartition(7), min_count=2, top_n=10).collect()
    b = pmi_collocations(df.coalesce(1), min_count=2, top_n=10).collect()
    assert a == b


def test_min_count_validation(seq):
    df, _ = seq
    with pytest.raises(ValueError, match="min_count"):
        pmi_collocations(df, min_count=0)
