"""PMI collocation mining: which adjacent token pairs co-occur far
more often than their unigram frequencies predict?

pmi(a,b) = ln( p(a,b) / (p(a)·p(b)) ) with p(a,b) = c_ab / N_pairs and
p(a) = c_a / N_tokens — the classic collocation statistic (Church &
Hanks 1990). A curation pipeline runs it per crawl snapshot to surface
boilerplate phrases ("all rights reserved"), mined spam templates, and
tokenizer-merge candidates beyond raw pair frequency (BPE's argmax —
see operators/bpe.py — favors frequent pairs; PMI favors ASSOCIATED
pairs whose parts are rare apart).

Scale shape: ONE corpus scan feeds two hash aggregates — pair counts
(map-side combined; shuffle bounded by distinct adjacent pairs, at
most min(total_tokens, vocab²) rows) and unigram counts (bounded by
vocab). The unigram table and the one-row totals are broadcast, so the
pair frame never reshuffles after its own aggregate; nothing scales
with corpus row count except the initial scan. All arithmetic is
integer counts until the final ln(), so the statistic reproduces
bit-identically cross-engine (rounded 6 dp — single-ln values match
the way q_token_entropy's do).

Reference scope: no analogous surface exists in /root/reference (the
reference is a membership-sketch library); this is a training-pipeline
extension over the same token model (pre-hashed int32 ids < vocab).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import adjacent_pair_keys, skipgram_pair_keys

__all__ = ["pmi_collocations", "skipgram_pmi"]


def pmi_collocations(
    seq: DataFrame,
    *,
    tokens_col: str = "tokens",
    min_count: int = 5,
    top_n: int = 50,
    vocab: int = 50261,
) -> DataFrame:
    """-> (left_tok, right_tok, pair_freq, pmi) — the ``top_n``
    adjacent pairs by PMI among pairs seen at least ``min_count``
    times, deterministically ordered (round(pmi,6) DESC, left, right).

    ``min_count`` is essential, not cosmetic: a pair seen once between
    two hapax tokens maximizes raw PMI (the well-known low-count
    pathology), so unfiltered PMI surfaces noise. The ordering key is
    the ROUNDED pmi so the top-``top_n`` cut is reproducible across
    engines whose ln() may differ in the last ulp.
    """
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    toks = seq.select(F.explode(tokens_col).alias("tok"))
    uni = toks.groupBy("tok").agg(F.count("*").alias("uni_freq"))
    pairs = (
        seq.select(F.explode(adjacent_pair_keys(F.col(tokens_col), vocab)).alias("pair"))
        .groupBy("pair")
        .agg(F.count("*").alias("pair_freq"))
        .filter(F.col("pair_freq") >= min_count)
        .select(
            F.expr(f"pair DIV {vocab}").alias("left_tok"),
            (F.col("pair") % vocab).alias("right_tok"),
            "pair_freq",
        )
    )
    totals = seq.select(
        F.sum(F.size(tokens_col)).cast("bigint").alias("n_tokens"),
        F.sum(F.greatest(F.size(tokens_col) - 1, F.lit(0)))
        .cast("bigint")
        .alias("n_pairs"),
    )
    # unigram table is vocab-bounded and totals are one row: broadcast
    # both so the pair frame never moves after its own aggregate
    scored = (
        pairs.join(
            F.broadcast(uni.select(F.col("tok").alias("left_tok"), F.col("uni_freq").alias("left_freq"))),
            "left_tok",
        )
        .join(
            F.broadcast(uni.select(F.col("tok").alias("right_tok"), F.col("uni_freq").alias("right_freq"))),
            "right_tok",
        )
        .join(F.broadcast(totals))
        .withColumn(
            "pmi",
            F.round(
                F.log(
                    (
                        F.col("pair_freq").cast("double")
                        * F.col("n_tokens")
                        * F.col("n_tokens")
                    )
                    / (
                        F.col("n_pairs").cast("double")
                        * F.col("left_freq")
                        * F.col("right_freq")
                    )
                ),
                6,
            ),
        )
    )
    return (
        scored.select("left_tok", "right_tok", "pair_freq", "pmi")
        .orderBy(F.desc("pmi"), "left_tok", "right_tok")
        .limit(top_n)
    )


def skipgram_pmi(
    seq: DataFrame,
    *,
    tokens_col: str = "tokens",
    window: int = 3,
    min_count: int = 5,
    top_n: int = 50,
    vocab: int = 50261,
) -> DataFrame:
    """-> (left_tok, right_tok, pair_freq, pmi) over UNORDERED windowed
    co-occurrences: every token paired with its partners at distances
    1..window (the word2vec skip-gram context, symmetric canonical key
    least/greatest) instead of strict adjacency — surfacing ASSOCIATED
    terms that rarely sit next to each other ("terms"/"conditions"
    with a word between). Same deterministic contract as
    pmi_collocations: integer counts until one ln(), cut ordered by
    the ROUNDED pmi.

    Scale shape is unchanged: pairs are generated MAP-SIDE by a
    Catalyst transform (no join, no window function — the fan-out is
    window x tokens rows into a map-side-combined aggregate), the pair
    frame is bounded by distinct co-occurring pairs, unigrams by
    vocab, and both the unigram table and the one-row totals
    broadcast. N_pairs = sum_rows sum_{d=1..w} max(n_tok - d, 0),
    computed exactly in the same pass.
    """
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    toks = seq.select(F.explode(tokens_col).alias("tok"))
    uni = toks.groupBy("tok").agg(F.count("*").alias("uni_freq"))
    pairs = (
        seq.select(
            F.explode(skipgram_pair_keys(F.col(tokens_col), window, vocab)).alias("pair")
        )
        .groupBy("pair")
        .agg(F.count("*").alias("pair_freq"))
        .filter(F.col("pair_freq") >= min_count)
        .select(
            F.expr(f"pair DIV {vocab}").alias("left_tok"),
            (F.col("pair") % vocab).alias("right_tok"),
            "pair_freq",
        )
    )
    n_pairs_row = None
    for d in range(1, window + 1):
        term = F.greatest(F.size(tokens_col) - d, F.lit(0))
        n_pairs_row = term if n_pairs_row is None else n_pairs_row + term
    totals = seq.select(
        F.sum(F.size(tokens_col)).cast("bigint").alias("n_tokens"),
        F.sum(n_pairs_row).cast("bigint").alias("n_pairs"),
    )
    scored = (
        pairs.join(
            F.broadcast(uni.select(F.col("tok").alias("left_tok"), F.col("uni_freq").alias("left_freq"))),
            "left_tok",
        )
        .join(
            F.broadcast(uni.select(F.col("tok").alias("right_tok"), F.col("uni_freq").alias("right_freq"))),
            "right_tok",
        )
        .join(F.broadcast(totals))
        .withColumn(
            "pmi",
            F.round(
                F.log(
                    (
                        F.col("pair_freq").cast("double")
                        * F.col("n_tokens")
                        * F.col("n_tokens")
                    )
                    / (
                        F.col("n_pairs").cast("double")
                        * F.col("left_freq")
                        * F.col("right_freq")
                    )
                ),
                6,
            ),
        )
    )
    return (
        scored.select("left_tok", "right_tok", "pair_freq", "pmi")
        .orderBy(F.desc("pmi"), "left_tok", "right_tok")
        .limit(top_n)
    )
