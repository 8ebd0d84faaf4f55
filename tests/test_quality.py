"""Compression-ratio quality signal: planted repetitive/high-entropy
documents land in the right tails, NULL/empty semantics, profile math."""

import hashlib

import pytest


def test_ratio_brackets_and_null_semantics(spark):
    from pyspark.sql import functions as F

    from rusty_bloomfilter_spark.operators.quality import compression_ratio

    chain, h = [], b"x"
    for _ in range(60):
        h = hashlib.md5(h).digest()
        chain.append(h.hex())
    rows = [
        ("rep", "all work and no play " * 100),
        ("hex", "".join(chain)),
        ("prose", "The quick brown fox jumps over the lazy dog near the river bank."),
        ("empty", ""),
        ("null", None),
    ]
    df = spark.createDataFrame(rows, "k string, text string")
    got = {
        r["k"]: r["r"]
        for r in df.select("k", compression_ratio(F.col("text")).alias("r")).collect()
    }
    assert got["rep"] < 0.05          # repeated phrase: deep repetitive tail
    assert 0.5 < got["hex"] < 0.75    # hex: 4 bits/char entropy floor ~0.5
    assert 0.3 < got["prose"] < 1.1   # short prose pays header overhead
    assert got["empty"] is None and got["null"] is None
    # python-side exactness pin for one value
    import zlib

    b = rows[0][1].encode()
    assert got["rep"] == pytest.approx(round(len(zlib.compress(b, 6)) / len(b), 6))


def test_profile_fractions_and_guard(spark):
    from rusty_bloomfilter_spark.operators.quality import compressibility_profile

    rows = [
        ("a", "spam spam spam spam " * 200),   # repetitive
        ("a", "normal sentence with a perfectly ordinary amount of structure here."),
        ("b", "".join(hashlib.md5(bytes([i])).hexdigest() for i in range(50))),
    ]
    df = spark.createDataFrame(rows, "k string, text string")
    got = {r["k"]: r for r in compressibility_profile(df, "k", "text").collect()}
    assert got["a"]["n_docs"] == 2
    assert got["a"]["frac_repetitive"] == pytest.approx(0.5)
    assert got["b"]["frac_repetitive"] == 0.0
    with pytest.raises(ValueError, match="low"):
        compressibility_profile(df, "k", "text", low=0.9, high=0.5)
