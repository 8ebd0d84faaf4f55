"""topk_exact_candidates margin contract: the documented failure mode
(adversarial partition-local skew hides a thin-spread global heavy
hitter) and its recovery with a sufficient margin.

Fixture: every "partition row" carries NOISE distinct local tokens
repeated 3x, plus ONE occurrence of the global token 777. Locally 777
(count 1) is below every noise token (count 3), so with
k*margin < NOISE it never enters any local candidate list — yet
globally count(777) = P outweighs every noise token's global 3.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

NOISE = 50  # distinct noise tokens per partition row
P = 8  # partition rows


@pytest.fixture(scope="module")
def adversarial_df(spark):
    rows = []
    for p in range(P):
        toks = np.repeat(np.arange(p * 1000, p * 1000 + NOISE, dtype=np.int32), 3)
        toks = np.concatenate([toks, np.array([777], dtype=np.int32)])
        rows.append((f"part-{p}", toks))
    pdf = pd.DataFrame({"doc_id": [d for d, _ in rows], "tokens": [t for _, t in rows]})
    return spark.createDataFrame(pdf).repartition(P, "doc_id")


def exact_topk(df, k):
    return (
        df.select(F.explode("tokens").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), "tok")
        .limit(k)
    )


def test_margin_failure_mode_is_real(spark, adversarial_df):
    """k*margin=20 < NOISE=50: token 777 (global count 8, the TRUE
    top-1) is invisible to every local candidate list — the documented
    miss. If this ever starts passing 777 through, the contract docs
    are stale."""
    from rusty_bloomfilter_spark.operators.topk import topk_exact_candidates

    truth = exact_topk(adversarial_df, 5).collect()
    assert truth[0]["tok"] == 777 and truth[0]["freq"] == P
    got = topk_exact_candidates(adversarial_df, k=5, margin=4).collect()
    assert all(r["tok"] != 777 for r in got)
    assert all(r["freq"] == 3 for r in got)  # only noise tokens survive


def test_sufficient_margin_recovers_exactness(spark, adversarial_df):
    """k*margin >= NOISE+1 makes 777 a local candidate everywhere ->
    result equals the full groupBy top-k."""
    from rusty_bloomfilter_spark.operators.topk import topk_exact_candidates

    want = [(r["tok"], r["freq"]) for r in exact_topk(adversarial_df, 5).collect()]
    got = [
        (r["tok"], r["freq"])
        for r in topk_exact_candidates(adversarial_df, k=5, margin=11).collect()
    ]
    assert got == want
    assert got[0] == (777, P)


def test_zipf_distribution_needs_only_small_margin(spark):
    """The non-adversarial case the default margin is built for: on a
    Zipf-distributed corpus (real token frequencies) the two-pass
    result equals full groupBy at the default margin."""
    from rusty_bloomfilter_spark.operators.topk import topk_exact_candidates

    rng = np.random.default_rng(3)
    pdf = pd.DataFrame(
        {
            "doc_id": [f"d{i}" for i in range(400)],
            "tokens": [
                (rng.zipf(1.3, size=120) % 50257).astype(np.int32) for _ in range(400)
            ],
        }
    )
    seq = spark.createDataFrame(pdf).repartition(6)
    want = [(r["tok"], r["freq"]) for r in exact_topk(seq, 20).collect()]
    got = [
        (r["tok"], r["freq"]) for r in topk_exact_candidates(seq, k=20, margin=4).collect()
    ]
    assert got == want
