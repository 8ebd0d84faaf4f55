"""Edit-distance-1 join (operators/strings.py): the symmetric-delete
candidate set must be COMPLETE for distance <= 1 (zero false
negatives — the project-wide discipline) and the levenshtein verify
must be SOUND (zero false positives), pinned against a brute-force
dynamic-programming oracle on a randomized fixture."""

import random

import pytest
from pyspark.sql import functions as F

from rusty_bloomfilter_spark.operators.strings import (
    deletion_variants,
    edit_distance_pairs,
)


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _pairs(spark, rows):
    df = spark.createDataFrame(rows, "id long, s string")
    got = edit_distance_pairs(df, id_col="id", str_col="s").collect()
    return {(r["id_a"], r["id_b"]): r["dist"] for r in got}


def test_all_edit_kinds_and_the_transposition_trap(spark):
    rows = [
        (1, "spark"),
        (2, "spark"),   # equal -> dist 0
        (3, "sparks"),  # insertion -> dist 1
        (4, "spurk"),   # substitution -> dist 1
        (5, "spak"),    # deletion -> dist 1
        (6, "sprak"),   # TRANSPOSITION: shares deletion variants with
                        # "spark" ("srak"/"spak"... actually "sark"?) but
                        # lev("spark","sprak") = 2 -> must NOT pair with 1
        (7, "zzzzz"),   # far from everything
    ]
    got = _pairs(spark, rows)
    want = {}
    for i, (ia, sa) in enumerate(rows):
        for ib, sb in rows[i + 1 :]:
            d = _lev(sa, sb)
            if d <= 1:
                want[(ia, ib)] = d
    assert got == want
    assert got[(1, 2)] == 0
    assert (1, 6) not in got  # transposition = distance 2, verify kills it
    assert all(ib != 7 and ia != 7 for ia, ib in got)


def test_matches_bruteforce_on_random_corpus(spark):
    rng = random.Random(42)
    alpha = "abc"  # tiny alphabet -> dense collisions, worst case for blocking
    rows = [
        (i, "".join(rng.choice(alpha) for _ in range(rng.randint(0, 6))))
        for i in range(80)
    ]
    got = _pairs(spark, rows)
    want = {}
    for i, (ia, sa) in enumerate(rows):
        for ib, sb in rows[i + 1 :]:
            d = _lev(sa, sb)
            if d <= 1:
                want[(ia, ib)] = d
    assert got == want  # complete AND sound, including empty strings


def test_max_len_guard_drops_long_strings(spark):
    rows = [(1, "a" * 300), (2, "a" * 300), (3, "ab"), (4, "ab")]
    got = _pairs(spark, rows)
    assert got == {(3, 4): 0}  # the 300-char twins are excluded by default
    df = spark.createDataFrame(rows, "id long, s string")
    unguarded = edit_distance_pairs(df, id_col="id", str_col="s", max_len=None)
    assert {(r["id_a"], r["id_b"]) for r in unguarded.collect()} == {(1, 2), (3, 4)}


def test_deletion_variants_are_distinct_and_catalyst_only(spark):
    df = spark.createDataFrame([("aaa",)], "s string")
    [row] = df.select(deletion_variants("s").alias("v")).collect()
    assert sorted(row["v"]) == ["aa", "aaa"]  # repeated-char deletions collapse
    # plan stays JVM-side: no BatchEvalPython / ArrowEval nodes
    plan = df.select(deletion_variants("s"))._jdf.queryExecution().toString()
    assert "Python" not in plan
