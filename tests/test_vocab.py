"""Vocabulary growth (Heaps): brute-force checks."""

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
