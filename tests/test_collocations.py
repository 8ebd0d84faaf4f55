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


# ---------------------------------------------------------------------------
# skip-gram (windowed) PMI
# ---------------------------------------------------------------------------

from rusty_bloomfilter_spark.operators.collocations import skipgram_pmi  # noqa: E402


def _py_skipgram(rows, window, min_count, top_n):
    uni: Counter = Counter()
    pairs: Counter = Counter()
    n_tokens = 0
    n_pairs = 0
    for toks in rows:
        uni.update(toks)
        n_tokens += len(toks)
        n_pairs += sum(max(len(toks) - d, 0) for d in range(1, window + 1))
        for i, a in enumerate(toks):
            for d in range(1, window + 1):
                if i + d < len(toks):
                    b = toks[i + d]
                    pairs[(min(a, b), max(a, b))] += 1
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


def test_skipgram_matches_python_oracle(seq):
    df, rows = seq
    for window in (1, 2, 3):
        got = skipgram_pmi(df, window=window, min_count=2, top_n=50).collect()
        want = _py_skipgram(rows, window, 2, 50)
        assert [(r.left_tok, r.right_tok, r.pair_freq, r.pmi) for r in got] == want


def test_skipgram_sees_gapped_association(spark):
    # (5, 6) ALWAYS with one filler between, never adjacent: invisible
    # to adjacency PMI, top-ranked by skip-gram PMI at window 2
    rows = [[5, i, 6] for i in range(20, 40)] * 2
    df = spark.createDataFrame([(r,) for r in rows], "tokens array<int>")
    adj = {(r.left_tok, r.right_tok) for r in pmi_collocations(df, min_count=2).collect()}
    assert (5, 6) not in adj
    sg = skipgram_pmi(df, window=2, min_count=2, top_n=5).collect()
    assert (sg[0].left_tok, sg[0].right_tok) == (5, 6)
    assert sg[0].pair_freq == 40


def test_skipgram_symmetric_canonical_counts(spark):
    # (a b) and (b a) occurrences fold into one unordered pair
    rows = [[1, 2], [2, 1], [1, 2]]
    df = spark.createDataFrame([(r,) for r in rows], "tokens array<int>")
    got = skipgram_pmi(df, window=1, min_count=1, top_n=5).collect()
    assert len(got) == 1
    assert (got[0].left_tok, got[0].right_tok, got[0].pair_freq) == (1, 2, 3)


def test_skipgram_guards(seq):
    df, _ = seq
    with pytest.raises(ValueError, match="window"):
        skipgram_pmi(df, window=0)
    with pytest.raises(ValueError, match="min_count"):
        skipgram_pmi(df, min_count=0)
