"""Vocabulary growth (Heaps) + per-source token KL: brute-force checks."""

import math

import numpy as np
import pytest


@pytest.fixture(scope="module")
def small_seq(spark):
    rng = np.random.default_rng(23)
    rows = []
    for s, (lo, hi) in [("a", (0, 40)), ("b", (20, 120)), ("c", (0, 400))]:
        for i in range(30):
            toks = rng.integers(lo, hi, size=int(rng.integers(5, 60))).tolist()
            rows.append((f"{s}{i:03d}", toks, len(toks), s))
    return spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string"
    ), rows


def test_token_kl_matches_numpy(small_seq):
    from rusty_bloomfilter_spark.operators.drift import token_kl_by_source

    df, rows = small_seq
    got = {r["source"]: r.asDict() for r in token_kl_by_source(df).collect()}

    from collections import Counter

    corpus = Counter()
    per_src: dict[str, Counter] = {}
    for _, toks, _, s in rows:
        per_src.setdefault(s, Counter()).update(toks)
        corpus.update(toks)
    n_corpus = sum(corpus.values())
    for s, cnt in per_src.items():
        n_s = sum(cnt.values())
        ent = -sum(c / n_s * math.log(c / n_s) for c in cnt.values())
        cross = -sum(
            c / n_s * math.log(corpus[t] / n_corpus) for t, c in cnt.items()
        )
        kl = sum(
            c / n_s * math.log((c / n_s) / (corpus[t] / n_corpus))
            for t, c in cnt.items()
        )
        g = got[s]
        assert g["n_tokens"] == n_s and g["vocab"] == len(cnt)
        assert abs(g["entropy"] - ent) < 1e-5
        assert abs(g["cross_entropy"] - cross) < 1e-5
        assert abs(g["kl_nats"] - kl) < 1e-5
        assert g["kl_nats"] >= 0  # Gibbs' inequality
        assert abs((g["cross_entropy"] - g["entropy"]) - g["kl_nats"]) < 3e-6


def test_token_kl_single_source_is_zero(spark):
    from rusty_bloomfilter_spark.operators.drift import token_kl_by_source

    df = spark.createDataFrame(
        [("d1", [1, 2, 2, 3], 4, "only"), ("d2", [3, 1], 2, "only")],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    row = token_kl_by_source(df).collect()[0]
    assert row["kl_nats"] == 0.0  # p == q when one source IS the corpus


def test_vocab_growth_curve_exact(small_seq):
    from rusty_bloomfilter_spark.operators.vocab import vocab_growth_curve

    df, rows = small_seq
    got = vocab_growth_curve(df).collect()
    by_src: dict[str, list] = {}
    for _, toks, _, s in sorted(rows, key=lambda r: r[0]):
        by_src.setdefault(s, []).append(toks)
    # brute force: distinct vocab and token total after each prefix
    expect = {}
    for s, docs in by_src.items():
        seen: set = set()
        cum = 0
        for r, toks in enumerate(docs, start=1):
            cum += len(toks)
            before = len(seen)
            seen.update(toks)
            expect[(s, r)] = (cum, len(seen), len(seen) - before)
    assert len(got) == sum(len(d) for d in by_src.values())
    for row in got:
        cum, vocab, new = expect[(row["source"], row["r"])]
        assert (row["cum_tokens"], row["cum_vocab"], row["new_types"]) == (
            cum,
            vocab,
            new,
        )


def test_heaps_fit_recovers_power_law(spark):
    from rusty_bloomfilter_spark.operators.vocab import heaps_fit

    # synthetic exact power-law curve V = 3 * n^0.5: the OLS must
    # recover beta and ln K to rounding precision
    rows = [
        ("s", r, int(100 * r), 0, int(round(3.0 * math.sqrt(100 * r))))
        for r in range(1, 60)
    ]
    curve = spark.createDataFrame(
        rows, "source string, r int, cum_tokens long, new_types int, cum_vocab long"
    )
    fit = heaps_fit(curve).collect()[0]
    assert abs(fit["heaps_beta"] - 0.5) < 0.01
    assert abs(fit["heaps_lnk"] - math.log(3.0)) < 0.05
