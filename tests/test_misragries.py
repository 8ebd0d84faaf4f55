"""Misra–Gries summary: deterministic bounds, mergeable algebra, wire
hardening, and the distributed exact-heavy-hitter operator — including
the adversarial thin-spread distribution where the local-top-k margin
contract FAILS but the MG guarantee holds (the reason this operator
exists next to topk_exact_candidates)."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from rusty_bloomfilter_spark.sketch import MisraGries, merge_sketch_payloads, sketch_from_bytes
from rusty_bloomfilter_spark.sketch.hashing import tokens_to_u64


def zipf_stream(n=200_000, vocab=50_000, seed=7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.zipf(1.3, size=n).clip(max=vocab).astype(np.int64)


def exact_counts(stream: np.ndarray) -> dict[int, int]:
    v, c = np.unique(stream, return_counts=True)
    return dict(zip(v.tolist(), c.tolist()))


# ---------------------------------------------------------------------------
# core bounds
# ---------------------------------------------------------------------------


def test_bounds_zipf_small_capacity():
    """est <= true <= est + err_ub for EVERY key, err_ub <= N/(cap+1),
    with a capacity tiny vs the distinct count (forces decrements)."""
    stream = zipf_stream()
    truth = exact_counts(stream)
    assert len(truth) > 2_000  # capacity 256 really is under pressure
    mg = MisraGries(capacity=256)
    mg.add_tokens(stream)
    assert mg.n_items == stream.size
    assert mg.err_ub <= stream.size // (mg.capacity + 1)
    keys = np.array(list(truth), dtype=np.int64)
    est = mg.query_tokens(keys)
    true = np.array([truth[k] for k in keys.tolist()])
    assert np.all(est <= true)
    assert np.all(true <= est + mg.err_ub)


def test_guaranteed_superset_of_heavy_hitters():
    stream = zipf_stream(seed=11)
    truth = exact_counts(stream)
    mg = MisraGries(capacity=256)
    mg.add_tokens(stream)
    thresh = stream.size // (mg.capacity + 1)
    stored = set(mg.keys.view(np.int64).tolist())
    heavy = {k for k, c in truth.items() if c > thresh}
    assert heavy, "fixture must contain real heavy hitters"
    assert heavy <= stored
    # candidates_above(thresh) keeps every heavy hitter too
    cands = set(mg.candidates_above(thresh).view(np.int64).tolist())
    assert heavy <= cands


def test_for_threshold_sizing():
    mg = MisraGries.for_threshold(0.01)
    assert mg.capacity + 1 > 100
    with pytest.raises(ValueError):
        MisraGries.for_threshold(1.5)
    with pytest.raises(ValueError):
        MisraGries(capacity=0)


def test_weighted_add_matches_repeat():
    vals = np.array([3, 9, 3, 9, 9, 27], dtype=np.int64)
    a = MisraGries(capacity=8).add_tokens(vals)
    b = MisraGries(capacity=8).add_u64(
        tokens_to_u64(np.array([3, 9, 27], dtype=np.int64)),
        np.array([2, 3, 1], dtype=np.int64),
    )
    assert a == b and a.n_items == b.n_items == 6
    with pytest.raises(ValueError):
        MisraGries(capacity=8).add_u64(
            tokens_to_u64(np.array([1], dtype=np.int64)), np.array([-1])
        )


# ---------------------------------------------------------------------------
# merge algebra (guarantee-level: bounds hold for ANY partitioning and
# merge order; bytes are canonical per state, not per merge order)
# ---------------------------------------------------------------------------


@settings(max_examples=25, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    parts=st.integers(2, 6),
    cap=st.sampled_from([16, 64, 256]),
)
def test_merge_any_order_preserves_bounds(seed, parts, cap):
    rng = np.random.default_rng(seed)
    stream = rng.zipf(1.4, size=20_000).clip(max=5_000).astype(np.int64)
    truth = exact_counts(stream)
    cuts = np.sort(rng.integers(0, stream.size, size=parts - 1))
    pieces = np.split(stream, cuts)
    summaries = [MisraGries(capacity=cap).add_tokens(p) for p in pieces]
    order = rng.permutation(len(summaries))
    acc = summaries[order[0]]
    for i in order[1:]:
        acc.merge_in_place(summaries[i])
    assert acc.n_items == stream.size
    assert acc.err_ub <= stream.size // (cap + 1)
    keys = np.array(list(truth), dtype=np.int64)
    est = acc.query_tokens(keys)
    true = np.array([truth[k] for k in keys.tolist()])
    assert np.all(est <= true)
    assert np.all(true <= est + acc.err_ub)
    thresh = stream.size // (cap + 1)
    stored = set(acc.keys.view(np.int64).tolist())
    assert {k for k, c in truth.items() if c > thresh} <= stored


def test_merge_via_generic_payload_path():
    """merge_sketch_payloads dispatches by magic and merges MG payloads."""
    a = MisraGries(capacity=32).add_tokens(np.arange(100) % 7)
    b = MisraGries(capacity=32).add_tokens(np.arange(50) % 3)
    merged = sketch_from_bytes(merge_sketch_payloads([a.to_bytes(), b.to_bytes()]))
    assert isinstance(merged, MisraGries)
    assert merged.n_items == 150
    with pytest.raises(ValueError):
        a.merge_in_place(MisraGries(capacity=64))


# ---------------------------------------------------------------------------
# wire
# ---------------------------------------------------------------------------


def test_wire_roundtrip_canonical():
    mg = MisraGries(capacity=128).add_tokens(zipf_stream(n=30_000, seed=5))
    blob = mg.to_bytes()
    back = MisraGries.from_bytes(blob)
    assert back == mg
    assert back.n_items == mg.n_items and back.err_ub == mg.err_ub
    assert back.to_bytes() == blob


def test_wire_rejects_forged_payloads():
    mg = MisraGries(capacity=4).add_tokens(np.array([1, 2, 3], dtype=np.int64))
    blob = bytearray(mg.to_bytes())
    with pytest.raises(ValueError):
        MisraGries.from_bytes(b"XXXX" + bytes(blob[4:]))
    with pytest.raises(ValueError):
        MisraGries.from_bytes(bytes(blob[:10]))  # truncated header
    with pytest.raises(ValueError):
        MisraGries.from_bytes(bytes(blob[:-8]))  # wrong body length
    # n_keys > capacity
    import struct

    hdr = struct.Struct("<4sBxxxIQQQ")
    forged = hdr.pack(b"RMGS", 1, 2, 3, 3, 0) + bytes(48)
    with pytest.raises(ValueError):
        MisraGries.from_bytes(forged)
    # descending keys (uint64-wrap pair: a diff-based check would miss it)
    keys = np.array([5, 2, 9], dtype=np.uint64)
    counts = np.ones(3, dtype=np.int64)
    forged = hdr.pack(b"RMGS", 1, 4, 3, 3, 0) + keys.tobytes() + counts.tobytes()
    with pytest.raises(ValueError):
        MisraGries.from_bytes(forged)
    # non-positive counter
    keys = np.array([2, 5, 9], dtype=np.uint64)
    counts = np.array([1, 0, 1], dtype=np.int64)
    forged = hdr.pack(b"RMGS", 1, 4, 3, 2, 0) + keys.tobytes() + counts.tobytes()
    with pytest.raises(ValueError):
        MisraGries.from_bytes(forged)


# ---------------------------------------------------------------------------
# distributed operator
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def zipf_df(spark):
    rng = np.random.default_rng(19)
    pdf = pd.DataFrame(
        {
            "doc_id": [f"d{i}" for i in range(500)],
            "tokens": [
                rng.zipf(1.3, size=rng.integers(40, 200)).clip(max=50_000).astype(np.int32)
                for _ in range(500)
            ],
        }
    )
    return spark.createDataFrame(pdf).repartition(8)


def test_heavy_hitters_mg_exact_vs_groupby(spark, zipf_df):
    from pyspark.sql import functions as F

    from rusty_bloomfilter_spark.operators.topk import heavy_hitters_mg

    got = {(r["tok"], r["freq"]) for r in heavy_hitters_mg(zipf_df, denom=200).collect()}
    ex = zipf_df.select(F.explode("tokens").alias("tok")).groupBy("tok").agg(
        F.count("*").alias("freq")
    )
    n = ex.agg(F.sum("freq")).collect()[0][0]
    want = {
        (r["tok"], r["freq"])
        for r in ex.where(F.col("freq") * 200 > F.lit(n)).collect()
    }
    assert want, "fixture must have heavy tokens"
    assert got == want


def test_heavy_hitters_mg_beats_margin_contract(spark):
    """The topk margin-contract adversary (thin-spread hitter behind
    partition-local noise): topk_exact_candidates misses token 777 at
    small margins (pinned in test_topk_margin), heavy_hitters_mg finds
    exactly {777} because the MG bound is global, not per-partition."""
    NOISE, P = 50, 8
    rows = []
    for p in range(P):
        toks = np.repeat(np.arange(p * 1000, p * 1000 + NOISE, dtype=np.int32), 3)
        rows.append((f"part-{p}", np.concatenate([toks, np.array([777], dtype=np.int32)])))
    pdf = pd.DataFrame({"doc_id": [d for d, _ in rows], "tokens": [t for _, t in rows]})
    df = spark.createDataFrame(pdf).repartition(P, "doc_id")
    from rusty_bloomfilter_spark.operators.topk import heavy_hitters_mg

    # N = 8*151 = 1208; 777 has freq 8 (8*160 > 1208), noise freq 3 (480 < 1208)
    got = [(r["tok"], r["freq"]) for r in heavy_hitters_mg(df, denom=160).collect()]
    assert got == [(777, P)]


def test_heavy_hitters_mg_validation_and_empty(spark):
    from rusty_bloomfilter_spark.operators.topk import heavy_hitters_mg

    empty = spark.createDataFrame([], "doc_id string, tokens array<int>")
    assert heavy_hitters_mg(empty, denom=40).count() == 0
    with pytest.raises(ValueError):
        heavy_hitters_mg(empty, denom=1)
    with pytest.raises(ValueError):
        heavy_hitters_mg(empty, denom=400, capacity=16)


def test_mg_sql_surface(spark, zipf_df):
    """mg_agg / mg_candidates registered as SQL functions: the grouped
    payload's candidate set contains every true heavy hitter."""
    from pyspark.sql import functions as F

    from rusty_bloomfilter_spark.functions.sql_sketches import register_sketch_sql

    register_sketch_sql(spark, mg_capacity=256, prefix="t1_")
    zipf_df.createOrReplaceTempView("mg_docs")
    n = int(spark.sql("SELECT sum(size(tokens)) AS n FROM mg_docs").collect()[0]["n"])
    got = spark.sql(
        f"SELECT t1_mg_candidates(t1_mg_agg(tokens), {n // 257}) AS cand FROM mg_docs"
    ).collect()[0]["cand"]
    ex = zipf_df.select(F.explode("tokens").alias("tok")).groupBy("tok").count()
    heavy = {r["tok"] for r in ex.where(F.col("count") > n // 257).collect()}
    assert heavy and heavy <= set(got)
