"""Capstone curation pipeline: planted dups removed, quality gate
applied, survivors' bloom has zero FN."""

import numpy as np
import pandas as pd

from rusty_bloomfilter_spark.plans import curate_corpus
from rusty_bloomfilter_spark.sketch import BlockedBloomFilter


def test_curate_corpus(spark):
    rng = np.random.default_rng(17)
    letters = list("abcdefghijklmnop")
    words = ["".join(rng.choice(letters, size=6)) for _ in range(500)]
    rows = []
    # 30 good docs
    for i in range(30):
        text = " ".join(rng.choice(words, size=60))
        rows.append((i, text, "en", "cc", len(text)))
    # exact duplicates of the first 5 (new ids)
    for j in range(5):
        rows.append((100 + j, rows[j][1], "en", "cc", rows[j][4]))
    # near-duplicates of docs 5..9 (one word changed)
    for j in range(5, 10):
        toks = rows[j][1].split()
        toks[3] = "CHANGEDWORD"
        text = " ".join(toks)
        rows.append((200 + j, text, "en", "cc", len(text)))
    # junk: too short / non-alpha
    rows.append((900, "a b", "en", "cc", 3))
    rows.append((901, "1234 5678 !!!! " * 10, "en", "cc", 150))
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source", "n_chars"])
    docs = spark.createDataFrame(pdf)

    out = curate_corpus(
        spark, docs, min_tokens=8, min_alpha_ratio=0.5, jaccard_threshold=0.5,
        bloom_n=100_000, bloom_p=1e-3,
    )
    s = out["stats"]
    assert s["docs_in"] == 42
    assert s["docs_after_quality"] == 40  # junk gated out
    assert s["docs_after_exact_dedup"] == 35  # 5 exact dups removed
    assert s["docs_out"] == 30  # 5 near-dups removed
    surv_ids = {r["doc_id"] for r in out["sequences"].select("doc_id").collect()}
    # keep-lowest is by STRING doc_id ("205" < "5"), so near-dup pairs
    # (5..9, 205..209) keep the 20x ids
    expect = {str(i) for i in range(30) if i < 5 or i > 9} | {str(200 + j) for j in range(5, 10)}
    assert surv_ids == expect
    # zero FN on surviving tokens
    bf = BlockedBloomFilter.from_bytes(out["bloom_payload"])
    toks = np.concatenate(
        [np.array(r["tokens"]) for r in out["sequences"].select("tokens").collect()]
    )
    assert bool(bf.contains_tokens(toks).all())
    assert s["tokens_out"] == len(toks)


def test_curate_lang_gate_and_holdout(spark):
    """Language gating + deterministic eval holdout: holdout ∪ train ==
    survivors, disjoint, holdout identical across runs/partitionings."""
    from pyspark.sql import functions as F

    from rusty_bloomfilter_spark.plans import curate_corpus
    from rusty_bloomfilter_spark.sources import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    out = curate_corpus(
        spark,
        docs,
        min_tokens=8,
        min_alpha_ratio=0.3,
        jaccard_threshold=0.6,
        bloom_n=500_000,
        langs=["en"],
        holdout_k=20,
    )
    assert out["stats"]["docs_holdout"] == 20
    train_ids = {r["doc_id"] for r in out["sequences"].select("doc_id").collect()}
    held_ids = {r["doc_id"] for r in out["holdout"].select("doc_id").collect()}
    assert len(held_ids) == 20 and not (train_ids & held_ids)
    assert out["stats"]["docs_out"] == len(train_ids)
    # determinism under different partitioning
    out2 = curate_corpus(
        spark,
        docs.repartition(7),
        min_tokens=8,
        min_alpha_ratio=0.3,
        jaccard_threshold=0.6,
        bloom_n=500_000,
        langs=["en"],
        holdout_k=20,
    )
    held2 = {r["doc_id"] for r in out2["holdout"].select("doc_id").collect()}
    assert held2 == held_ids


def test_curate_single_materialization(spark):
    """Round-3 verdict regression: the old stats block ran four bare
    .count() actions plus the bloom build over un-persisted lineage,
    re-running the quality gate + dedup joins ~22x per document
    (measured 4400 accumulator hits for 200 docs). With the persisted
    stage outputs the gate must process each document a small constant
    number of times (1x cache build + at most one racy branch re-read),
    including a caller-side action on the returned sequences frame."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    from rusty_bloomfilter_spark.operators.cache import free

    rng = np.random.default_rng(17)
    letters = list("abcdefghijklmnop")
    words = ["".join(rng.choice(letters, size=6)) for _ in range(500)]
    n = 200
    rows = [(i, " ".join(rng.choice(words, size=60)), "en", "cc", 100) for i in range(n)]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source", "n_chars"])
    docs = spark.createDataFrame(pdf).repartition(4)

    acc = spark.sparkContext.accumulator(0)

    @pandas_udf("string")
    def spy(s: pd.Series) -> pd.Series:
        acc.add(len(s))
        return s

    spied = docs.withColumn("text", spy("text"))
    out = curate_corpus(
        spark, spied, min_tokens=8, min_alpha_ratio=0.5,
        jaccard_threshold=0.5, bloom_n=100_000, bloom_p=1e-3,
    )
    out["sequences"].count()  # caller action must hit the survivors cache
    # post-fix measures 2n (one gated-cache build + one concurrent
    # branch read before the cache lands); pre-fix was 22n
    assert acc.value <= 3 * n, f"pipeline re-executed: {acc.value} text reads for {n} docs"
    assert out["stats"]["docs_out"] == n
    free(out["sequences"])


def test_curate_holdout_cache_freed(spark):
    """Round-4 review regression: with holdout_k > 0 the returned
    sequences frame is DERIVED from the persisted survivors frame, so
    free(out["sequences"]) must unpersist the underlying cache (tie
    targets survivors_all, not the derived plan) — no session-lifetime
    cache leak."""
    import numpy as np

    from rusty_bloomfilter_spark.operators.cache import free

    jsc = spark.sparkContext._jsc.sc()
    baseline = jsc.getPersistentRDDs().size()

    rng = np.random.default_rng(23)
    letters = list("abcdefghijklmnop")
    words = ["".join(rng.choice(letters, size=6)) for _ in range(300)]
    rows = [(i, " ".join(rng.choice(words, size=40)), "en", "cc", 100) for i in range(120)]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source", "n_chars"])
    out = curate_corpus(
        spark, spark.createDataFrame(pdf).repartition(4),
        min_tokens=8, min_alpha_ratio=0.5, jaccard_threshold=0.5,
        bloom_n=50_000, bloom_p=1e-3, holdout_k=10,
    )
    assert out["stats"]["docs_holdout"] == 10
    free(out["sequences"])
    import time
    for _ in range(40):  # unpersist is async
        if jsc.getPersistentRDDs().size() <= baseline:
            break
        time.sleep(0.25)
    assert jsc.getPersistentRDDs().size() <= baseline, (
        "survivors cache leaked after free() in the holdout path"
    )
