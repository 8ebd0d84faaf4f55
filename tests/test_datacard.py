"""Dataset card vs hand-computed truth on a planted corpus."""

import math

import pytest

from rusty_bloomfilter_spark.operators.datacard import dataset_card

LONG_A = "alpha beta gamma " * 30  # 90 tokens
LONG_B = "delta epsilon " * 40  # 80 tokens
SHORT = "tiny doc"  # 2 tokens


def test_card_matches_hand_computation(spark):
    rows = [
        (1, LONG_A, "en", "cc"),
        (2, LONG_A, "en", "cc"),  # exact dup of 1 (same 40-char prefix)
        (3, LONG_B, "en", "wiki"),
        (4, SHORT, "fr", "cc"),
        (5, SHORT + " x", "fr", "cc"),  # shares SHORT's 40-char prefix
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string"
    ).repartition(3)
    out = dataset_card(df).collect()[0].asDict()

    ntoks = [90, 90, 80, 2, 3]
    assert out["n_docs"] == 5
    assert out["n_tokens"] == sum(ntoks)
    assert out["n_chars"] == sum(len(r[1]) for r in rows)
    assert out["n_sources"] == 2 and out["n_langs"] == 2
    assert out["top_source"] == "cc"
    assert out["top_source_share"] == pytest.approx(4 / 5, abs=1e-6)
    # fps: LONG_A prefix (x2), LONG_B prefix, SHORT-ish prefix (x2,
    # both shorter than 40 chars so "tiny doc" vs "tiny doc x" DIFFER)
    assert out["n_distinct_fp"] == 4
    assert out["dup_rate"] == pytest.approx(1 - 4 / 5, abs=1e-6)
    # language entropy: en=3, fr=2 of 5
    h = -(3 / 5) * math.log(3 / 5) - (2 / 5) * math.log(2 / 5)
    assert out["lang_entropy_nats"] == pytest.approx(h, abs=1e-6)
    assert out["median_ntok"] == pytest.approx(80.0, abs=1e-9)
    assert out["mean_ntok"] == pytest.approx(sum(ntoks) / 5, abs=1e-6)
    assert out["pct_short"] == pytest.approx(2 / 5, abs=1e-6)  # ntok < 50


def test_single_language_entropy_zero(spark):
    rows = [(i, "a b c", "en", "s") for i in range(3)]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string"
    )
    out = dataset_card(df).collect()[0]
    assert out["lang_entropy_nats"] == pytest.approx(0.0, abs=1e-9)
    assert out["n_langs"] == 1


# -- pareto_coverage --------------------------------------------------------


def test_pareto_matches_bruteforce(spark):
    import numpy as np
    import pytest

    from rusty_bloomfilter_spark.operators.datacard import pareto_coverage

    rng = np.random.default_rng(17)
    rows = []
    for g in ("a", "b"):
        for i in range(40):
            rows.append((g, f"{g}-{i:04d}", int(rng.zipf(1.6))))
    df = spark.createDataFrame(rows, "source string, doc_id string, n_tok long")
    got = {r["source"]: r for r in pareto_coverage(df).collect()}
    for g in ("a", "b"):
        ws = sorted(
            [(w, i) for s, i, w in rows if s == g], key=lambda t: (-t[0], t[1])
        )
        tot = sum(w for w, _ in ws)
        cum, k = 0, 0
        for w, _ in ws:
            if 100 * cum < 80 * tot:
                k += 1
            cum += w
        dec = (len(ws) + 9) // 10
        top_share = sum(w for w, _ in ws[:dec]) / tot
        r = got[g]
        assert r["n_docs"] == 40 and r["total_weight"] == tot
        assert r["docs_to_threshold"] == k
        assert r["frac_docs_to_threshold"] == pytest.approx(k / 40, abs=1e-6)
        assert r["top_decile_share"] == pytest.approx(top_share, abs=1e-6)


def test_pareto_extremes_and_guard(spark):
    import pytest

    from rusty_bloomfilter_spark.operators.datacard import pareto_coverage

    # one giant doc + 9 tiny: the giant alone crosses 80%
    rows = [("g", "d0", 1000)] + [("g", f"d{i}", 1) for i in range(1, 10)]
    # perfectly flat: need 80% of the docs
    rows += [("f", f"d{i}", 10) for i in range(10)]
    df = spark.createDataFrame(rows, "source string, doc_id string, n_tok long")
    got = {r["source"]: r for r in pareto_coverage(df).collect()}
    assert got["g"]["docs_to_threshold"] == 1
    assert got["f"]["docs_to_threshold"] == 8
    with pytest.raises(ValueError, match="threshold_pct"):
        pareto_coverage(df, threshold_pct=100)


def test_pareto_zero_weight_group_no_crash(spark):
    # review fix: _tot = 0 -> NULL share, never ANSI DIVIDE_BY_ZERO
    from rusty_bloomfilter_spark.operators.datacard import pareto_coverage

    df = spark.createDataFrame(
        [("z", "d1", 0), ("z", "d2", 0)], "source string, doc_id string, n_tok long"
    )
    got = pareto_coverage(df).collect()[0]
    assert got["total_weight"] == 0 and got["top_decile_share"] is None
