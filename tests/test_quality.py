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


# -- readability ------------------------------------------------------------


def test_readability_hand_computed(spark):
    from pyspark.sql import functions as F

    from rusty_bloomfilter_spark.functions.text import readability_exprs

    # "The cat sat. It ran fast!" -> 6 words, 2 sentences,
    # syllables: the(1) cat(1) sat.(1) it(1) ran(1) fast!(1) = 6
    rows = [(1, "The cat sat. It ran fast!"), (2, ""), (3, "rhythm myth")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    r = readability_exprs(F.col("text"))
    got = {
        row["doc_id"]: row
        for row in df.select(
            "doc_id", *[r[k].alias(k) for k in r]
        ).collect()
    }
    one = got[1]
    assert one["n_words"] == 6 and one["n_sentences"] == 2 and one["n_syllables"] == 6
    wps, spw = 6 / 2, 6 / 6
    assert one["fre"] == pytest.approx(round(206.835 - 1.015 * wps - 84.6 * spw, 4))
    assert one["fk_grade"] == pytest.approx(round(0.39 * wps + 11.8 * spw - 15.59, 4))
    # empty text: zero words, NULL scores (never fake readable)
    assert got[2]["n_words"] == 0 and got[2]["fre"] is None
    # vowel-less words clamp to 1 syllable each ('y' counts: myth has y)
    assert got[3]["n_syllables"] == 2


def test_readability_direction(spark):
    from pyspark.sql import functions as F

    from rusty_bloomfilter_spark.functions.text import readability_exprs

    simple = "The dog is big. The cat is small. We run a lot. It is fun."
    dense = (
        "Notwithstanding heretofore promulgated administrative determinations, "
        "organizational restructuring necessitates comprehensive reevaluation."
    )
    df = spark.createDataFrame([(1, simple), (2, dense)], "doc_id int, text string")
    r = readability_exprs(F.col("text"))
    got = {x["doc_id"]: x["fre"] for x in df.select("doc_id", r["fre"].alias("fre")).collect()}
    assert got[1] > 70 > got[2]  # conversational prose reads easy; legalese doesn't


def test_profile_null_docs_leave_tail_denominator(spark):
    # review fix: NULL-ratio docs count in n_docs but NOT in fractions
    from rusty_bloomfilter_spark.operators.quality import compressibility_profile

    rows = [
        ("a", "spam spam spam spam " * 200),  # repetitive (scored)
        ("a", ""),                            # unscored
        ("a", None),                          # unscored
    ]
    df = spark.createDataFrame(rows, "k string, text string")
    got = compressibility_profile(df, "k", "text").collect()[0]
    assert got["n_docs"] == 3 and got["n_scored"] == 1
    # the one scored doc is repetitive: fraction is 1.0 OF SCORED, not 1/3
    assert got["frac_repetitive"] == 1.0


# -- encoding audit ---------------------------------------------------------


def test_encoding_exprs_hand_computed(spark):
    from pyspark.sql import functions as F

    from rusty_bloomfilter_spark.functions.text import encoding_exprs

    rows = [
        (1, "plain ascii"),
        (2, "tab\tand\nnewline are fine"),      # tab/LF are NOT control hits
        (3, "bell\x07 and esc\x1b"),            # 2 control chars
        (4, "café über straße"), # 3 non-ASCII, no ctrl
        (5, "mojibake �� here"),      # 2 replacement chars
    ]
    df = spark.createDataFrame(rows, "i int, text string")
    e = encoding_exprs(F.col("text"))
    got = {
        r["i"]: r
        for r in df.select("i", *[e[k].alias(k) for k in e]).collect()
    }
    assert got[1]["n_ctrl"] == 0 and got[1]["n_non_ascii"] == 0
    assert got[2]["n_ctrl"] == 0  # tab and newline excluded by design
    assert got[3]["n_ctrl"] == 2
    assert got[4]["n_non_ascii"] == 3 and got[4]["n_ctrl"] == 0
    assert got[5]["n_replacement"] == 2
    # replacement chars also count as non-ASCII
    assert got[5]["n_non_ascii"] == 2


# -- pseudonymization -------------------------------------------------------


def test_pseudonym_referential_consistency(spark):
    import pytest
    from pyspark.sql import functions as F

    from rusty_bloomfilter_spark.functions.text import pseudonym_expr

    a = spark.createDataFrame([(1,), (2,), (None,)], "k long")
    b = spark.createDataFrame([(1,), (3,)], "k long")
    pa = a.select(pseudonym_expr(F.col("k"), "s1").alias("p"), "k")
    pb = b.select(pseudonym_expr(F.col("k"), "s1").alias("p"), "k")
    rows = {r["k"]: r["p"] for r in pa.collect()}
    # NULL keys stay NULL (no shared fake owner)
    assert rows[None] is None
    assert rows[1] is not None and len(rows[1]) == 16
    # same key + same salt -> same pseudonym ACROSS frames: join survives
    joined = pa.join(pb, on="p").collect()
    assert len(joined) == 1
    # salt rotation severs linkage
    pb2 = b.select(pseudonym_expr(F.col("k"), "s2").alias("p"))
    assert pa.join(pb2, on="p").count() == 0
    with pytest.raises(ValueError, match="salt"):
        pseudonym_expr(F.col("k"), "")


def test_duckdb_pseudonym_parity_guards(spark):
    # review fix: the SQL twin must accept exactly what the Spark twin
    # accepts, and a quoted salt must render as legal SQL
    import duckdb
    import pytest
    from pyspark.sql import functions as F

    from rusty_bloomfilter_spark.functions.text import (
        duckdb_pseudonym,
        pseudonym_expr,
    )

    with pytest.raises(ValueError, match="salt"):
        duckdb_pseudonym("k", "")
    frag = duckdb_pseudonym("k", "rot'26")
    got_sql = duckdb.sql(f"SELECT {frag} AS p FROM (SELECT 7 AS k)").fetchone()[0]
    got_spark = (
        spark.createDataFrame([(7,)], "k long")
        .select(pseudonym_expr(F.col("k"), "rot'26").alias("p"))
        .collect()[0]["p"]
    )
    assert got_sql == got_spark
