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


# -- oov_rate ---------------------------------------------------------------


def test_oov_rate_bruteforce_and_ties(spark):
    from collections import Counter

    import pytest

    from rusty_bloomfilter_spark.operators.vocab import oov_rate

    rows = [
        ("a", [1, 1, 1, 2, 2, 3]),
        ("a", [1, 4, 5]),
        ("b", [2, 2, 6, 6, 6, 7]),
    ]
    df = spark.createDataFrame(rows, "source string, tokens array<int>")
    # counts: 1->4, 2->4, 6->3, 3/4/5/7->1 ; V=3 with tie-break by token
    # asc -> vocab = {1, 2, 6}
    got = {r["source"]: r for r in oov_rate(df, vocab_size=3).collect()}
    all_toks = {"a": [1, 1, 1, 2, 2, 3, 1, 4, 5], "b": [2, 2, 6, 6, 6, 7]}
    vocab = {1, 2, 6}
    for g, toks in all_toks.items():
        c = Counter(toks)
        oov_occ = sum(v for t, v in c.items() if t not in vocab)
        r = got[g]
        assert r["total_tokens"] == len(toks)
        assert r["oov_occurrences"] == oov_occ
        assert r["oov_rate"] == pytest.approx(oov_occ / len(toks), abs=1e-6)
        assert r["oov_types"] == sum(1 for t in c if t not in vocab)
        assert r["distinct_types"] == len(c)
    with pytest.raises(ValueError, match="vocab_size"):
        oov_rate(df, vocab_size=0)


def test_oov_rate_full_vocab_is_zero(spark):
    from rusty_bloomfilter_spark.operators.vocab import oov_rate

    df = spark.createDataFrame(
        [("a", [1, 2, 3]), ("b", [3, 4])], "source string, tokens array<int>"
    )
    got = {r["source"]: r for r in oov_rate(df, vocab_size=100).collect()}
    assert all(r["oov_rate"] == 0.0 and r["oov_occurrences"] == 0 for r in got.values())


def test_oov_two_stage_vocab_cut_is_exact(spark):
    # review fix: bucketed pre-cut before the global top-V rank — the
    # result must equal the naive global cut on an adversarial count
    # profile (many ties at the boundary)
    from collections import Counter

    from rusty_bloomfilter_spark.operators.vocab import oov_rate

    toks = [t for t in range(200) for _ in range(1 + (t % 3))]
    df = spark.createDataFrame([("s", toks)], "source string, tokens array<int>")
    got = oov_rate(df, vocab_size=50).collect()[0]
    c = Counter(toks)
    vocab = set(
        t for t, _ in sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    )
    oov_occ = sum(v for t, v in c.items() if t not in vocab)
    assert got["oov_occurrences"] == oov_occ
    assert got["oov_types"] == sum(1 for t in c if t not in vocab)


def test_lexical_richness_bruteforce(spark):
    from collections import Counter

    import pytest

    from rusty_bloomfilter_spark.operators.vocab import lexical_richness

    rows = [
        ("a", [1, 1, 2, 3, 4, 4, 4]),  # hapax: 2,3  dis: 1
        ("b", [7, 7, 7, 7]),           # no hapax
    ]
    df = spark.createDataFrame(rows, "source string, tokens array<int>")
    got = {r["source"]: r for r in lexical_richness(df).collect()}
    a = got["a"]
    assert a["n_types"] == 4 and a["n_tokens"] == 7
    assert a["n_hapax"] == 2 and a["n_dis"] == 1
    assert a["hapax_type_share"] == pytest.approx(2 / 4)
    assert a["hapax_mass_share"] == pytest.approx(2 / 7, abs=1e-6)
    assert a["type_token_ratio"] == pytest.approx(4 / 7, abs=1e-6)
    b = got["b"]
    assert b["n_hapax"] == 0 and b["hapax_mass_share"] == 0.0
