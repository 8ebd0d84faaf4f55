"""frequency_cap / pack_sequences (operators/curation.py) unit tests:
cap semantics, deterministic tiebreak, packing closed form vs a numpy
re-derivation, and degenerate inputs."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from rusty_bloomfilter_spark.operators.curation import frequency_cap, pack_sequences


def _docs(spark):
    rows = [
        # (doc_id, source, n_chars) — 'a' has 5 docs incl. an n_chars tie
        ("d1", "a", 100),
        ("d2", "a", 300),
        ("d3", "a", 300),
        ("d4", "a", 50),
        ("d5", "a", 200),
        ("d6", "b", 10),
        ("d7", "b", 20),
    ]
    return spark.createDataFrame(rows, "doc_id string, source string, n_chars long")


def test_frequency_cap_keeps_top_n_per_key(spark):
    out = frequency_cap(
        _docs(spark), "source", 3, [F.col("n_chars").desc(), F.col("doc_id").asc()]
    )
    kept = {r.doc_id for r in out.filter("kept").collect()}
    # source a top-3 by (n_chars desc, doc_id asc): d2(300), d3(300), d5(200)
    assert kept == {"d2", "d3", "d5", "d6", "d7"}
    ranks = {r.doc_id: r.cap_rank for r in out.collect()}
    assert ranks["d2"] == 1 and ranks["d3"] == 2  # tie broken by doc_id
    assert ranks["d4"] == 5 and not [
        r for r in out.collect() if r.doc_id == "d4" and r.kept
    ]


def test_frequency_cap_deterministic_across_runs(spark):
    df = _docs(spark)
    order = [F.col("n_chars").desc(), F.col("doc_id").asc()]
    a = sorted((r.doc_id, r.cap_rank) for r in frequency_cap(df, "source", 2, order).collect())
    b = sorted((r.doc_id, r.cap_rank) for r in frequency_cap(df, "source", 2, order).collect())
    assert a == b


def _pack_oracle(ids, toks, cap):
    """numpy closed form: bin = floor(start/cap) in id order."""
    order = np.argsort(ids, kind="stable")
    toks = np.asarray(toks)[order]
    starts = np.cumsum(toks) - toks
    bins = starts // cap
    out = {}
    for b, t in zip(bins, toks):
        n, s = out.get(int(b), (0, 0))
        out[int(b)] = (n + 1, s + int(t))
    return out


@pytest.mark.parametrize("cap", [8, 64, 1000])
def test_pack_sequences_matches_numpy_closed_form(spark, cap):
    rng = np.random.default_rng(7)
    ids = np.arange(200)
    toks = rng.integers(1, 40, size=200)
    seq = spark.createDataFrame(
        [(str(i), "s", int(t)) for i, t in zip(ids, toks)],
        "doc_id string, source string, n_tok long",
    )
    got = {
        int(r.bin): (r.n_docs, r.bin_tokens)
        for r in pack_sequences(seq, capacity=cap, key="source").collect()
    }
    assert got == _pack_oracle(ids, toks, cap)


def test_pack_sequences_long_doc_starts_bin(spark):
    # a doc longer than capacity contributes ALL its tokens to its
    # starting bin; the next doc starts in the spilled-past window
    seq = spark.createDataFrame(
        [("1", "s", 10), ("2", "s", 300), ("3", "s", 10)],
        "doc_id string, source string, n_tok long",
    )
    got = {int(r.bin): (r.n_docs, r.bin_tokens) for r in pack_sequences(seq, 100).collect()}
    # starts: 0, 10, 310 -> bins 0, 0, 3
    assert got == {0: (2, 310), 3: (1, 10)}


def test_pack_sequences_per_key_independent(spark):
    seq = spark.createDataFrame(
        [("1", "a", 60), ("2", "a", 60), ("1", "b", 60), ("2", "b", 60)],
        "doc_id string, source string, n_tok long",
    )
    rows = pack_sequences(seq, 100).collect()
    by_key = {(r.source, int(r.bin)): (r.n_docs, r.bin_tokens) for r in rows}
    # each key restarts at offset 0: starts 0 and 60 -> bins 0 and 0
    assert by_key == {("a", 0): (2, 120), ("b", 0): (2, 120)}


def test_pack_sequences_rejects_bad_capacity(spark):
    seq = spark.createDataFrame(
        [("1", "s", 1)], "doc_id string, source string, n_tok long"
    )
    with pytest.raises(ValueError):
        pack_sequences(seq, 0)


def test_mixture_replicate_exact_copies(spark):
    import pandas as pd

    from rusty_bloomfilter_spark.operators.curation import (
        hash_bucket_expr,
        mixture_replicate,
    )

    pdf = pd.DataFrame(
        {
            "doc_id": [f"d{i}" for i in range(400)],
            "source": (["a"] * 100 + ["b"] * 100 + ["c"] * 100 + ["d"] * 100),
            "n_tok": list(range(400)),
        }
    )
    df = spark.createDataFrame(pdf)
    weights = {"a": 2.5, "b": 1.0, "c": 0.25, "d": 0.0}
    out = mixture_replicate(df, weights, key="source", id_col="doc_id")
    got = {
        (r["doc_id"], r["epoch"]) for r in out.select("doc_id", "epoch").collect()
    }
    # reconstruct the expected copy count from the same salted bucket
    buckets = {
        r["doc_id"]: r["b"]
        for r in df.select(
            "doc_id",
            hash_bucket_expr(
                F.concat(F.col("doc_id"), F.lit("#rep"))
            ).alias("b"),
        ).collect()
    }
    import math

    want = set()
    for _, row in pdf.iterrows():
        w = weights[row["source"]]
        copies = int(math.floor(w)) + (
            1 if buckets[row["doc_id"]] < round((w - math.floor(w)) * 1e6) else 0
        )
        for e in range(copies):
            want.add((row["doc_id"], e))
    assert got == want
    # fractional halves actually split the population both ways
    a_counts = [sum(1 for d, _ in got if d == f"d{i}") for i in range(100)]
    assert {2, 3} == set(a_counts)  # weight 2.5: 2 or 3 copies each
    assert all(n == 0 for n in (sum(1 for d, _ in got if d == f"d{i}") for i in range(300, 400)))


def test_mixture_replicate_default_weight_and_guards(spark):
    from rusty_bloomfilter_spark.operators.curation import mixture_replicate

    df = spark.createDataFrame(
        [("x1", "unlisted"), ("x2", "unlisted")], "doc_id string, source string"
    )
    out = mixture_replicate(df, {"a": 2.0}, default_weight=1.0)
    assert out.count() == 2  # default passes rows through once
    assert [r["epoch"] for r in out.collect()] == [0, 0]
    with pytest.raises(ValueError):
        mixture_replicate(df, {"a": -0.5})


# -- filter_sweep -----------------------------------------------------------


def test_filter_sweep_matches_bruteforce(spark):
    import numpy as np
    import pytest

    from rusty_bloomfilter_spark.operators.curation import filter_sweep

    rng = np.random.default_rng(9)
    rows = [
        (("a" if i % 3 else "b"), round(float(rng.uniform(0, 1)), 6), int(rng.integers(10, 500)))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "src string, s double, chars bigint").repartition(4)
    ts = [0.0, 0.25, 0.5, 0.75, 0.9]
    got = {
        (r["src"], r["threshold"]): r
        for r in filter_sweep(df, "src", "s", ts, mass_col="chars").collect()
    }
    for src in ("a", "b"):
        sub = [(s, c) for g, s, c in rows if g == src]
        n, m = len(sub), sum(c for _, c in sub)
        for t in ts:
            kept = [(s, c) for s, c in sub if s >= t]
            r = got[(src, t)]
            assert r["docs_kept"] == len(kept)
            assert r["mass_kept"] == sum(c for _, c in kept)
            assert r["frac_docs"] == pytest.approx(len(kept) / n, abs=1e-6)
            assert r["frac_mass"] == pytest.approx(sum(c for _, c in kept) / m, abs=1e-6)


def test_filter_sweep_monotone_and_guards(spark):
    import pytest

    from rusty_bloomfilter_spark.operators.curation import filter_sweep

    rows = [("a", float(i) / 10, 100) for i in range(10)]
    df = spark.createDataFrame(rows, "src string, s double, chars bigint")
    out = sorted(
        filter_sweep(df, "src", "s", [0.0, 0.3, 0.7], mass_col="chars").collect(),
        key=lambda r: r["threshold"],
    )
    kept = [r["docs_kept"] for r in out]
    assert kept == sorted(kept, reverse=True)  # retention is monotone down
    assert out[0]["frac_docs"] == 1.0  # threshold 0 keeps everything
    with pytest.raises(ValueError, match="non-empty"):
        filter_sweep(df, "src", "s", [])
    with pytest.raises(ValueError, match="duplicate"):
        filter_sweep(df, "src", "s", [0.1, 0.1])
    # no mass column: counts still correct, frac_mass NULL
    nm = filter_sweep(df, "src", "s", [0.5]).collect()[0]
    assert nm["docs_kept"] == 5 and nm["frac_mass"] is None


# -- chunk_windows ----------------------------------------------------------


def test_chunk_windows_tiling_and_content(spark):
    import hashlib

    import pytest

    from rusty_bloomfilter_spark.operators.curation import chunk_windows

    rows = [
        ("short", list(range(5))),     # n <= size: one chunk
        ("exact", list(range(8))),     # n == size: one chunk
        ("long", list(range(20))),     # ceil((20-8)/4)+1 = 4 chunks
        ("empty", []),                 # excluded
    ]
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
    out = chunk_windows(df, size=8, stride=4)
    got = {}
    for r in out.collect():
        got.setdefault(r["doc_id"], []).append(r)
    assert "empty" not in got
    assert len(got["short"]) == 1 and got["short"][0]["chunk_len"] == 5
    assert len(got["exact"]) == 1 and got["exact"][0]["chunk_len"] == 8
    chunks = sorted(got["long"], key=lambda r: r["chunk_idx"])
    assert [(c["start"], c["chunk_len"]) for c in chunks] == [
        (0, 8), (4, 8), (8, 8), (12, 8)
    ]
    assert [c["is_last"] for c in chunks] == [False, False, False, True]
    # every token covered (tiling)
    covered = set()
    for c in chunks:
        covered.update(range(c["start"], c["start"] + c["chunk_len"]))
    assert covered == set(range(20))
    # content md5 pins the exact slice
    toks = list(range(20))
    want = hashlib.md5(",".join(map(str, toks[4:12])).encode()).hexdigest()
    assert chunks[1]["chunk_md5"] == want
    with pytest.raises(ValueError, match="stride"):
        chunk_windows(df, size=8, stride=9)
    with pytest.raises(ValueError, match="size"):
        chunk_windows(df, size=0, stride=1)


def test_chunk_windows_short_tail(spark):
    from rusty_bloomfilter_spark.operators.curation import chunk_windows

    df = spark.createDataFrame([("d", list(range(10)))], "doc_id string, tokens array<int>")
    out = sorted(chunk_windows(df, size=8, stride=4).collect(), key=lambda r: r["chunk_idx"])
    # ceil((10-8)/4)+1 = 2 chunks; tail runs short (len 6), flagged last
    assert [(c["start"], c["chunk_len"], c["is_last"]) for c in out] == [
        (0, 8, False), (4, 6, True)
    ]
