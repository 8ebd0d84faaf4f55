"""Bigram-LM fluency scoring from count-min payloads — the
sketch-replaces-table form of operators/dedup.py::bigram_lm_scores.

The exact scorer joins every document's exploded pairs against the
corpus BIGRAM table — min(total_pairs, vocab²) rows, billions at GPT-2
vocab on a large corpus, so the join is an unavoidable corpus-scale
shuffle (dedup.py deliberately shuffle-merge-hints it). The sketch
form replaces that table with two count-min payloads (bigram + unigram
counts), built in ONE corpus scan each and BROADCAST — a few MB
regardless of corpus size — so scoring becomes a map-only pass: no
pair shuffle, no join, nothing corpus-scale moves. This is the
canonical CMS trade (Cormode & Muthukrishnan 2005): counts come back
overestimated by at most eps·N = (2/w)·N with probability ≥ 1−e^−d
per probe, so scores drift by a bounded, one-sided-per-count amount
while document RANKING — the thing a quality filter consumes — is
preserved (pinned in tests + the contract audit).

Scoring is batch-vectorized: Arrow list columns flatten zero-copy,
pair keys and log-probs compute over the whole batch, per-document
means come from prefix-sum differences (never clamped reduceat — see
CLAUDE.md), and the payloads deserialize via sketch_from_bytes inside
the worker (closing over the class would make cloudpickle serialize it
by value).

Reference scope: composition of count-min semantics over the
reference's token model; no analogous surface in /root/reference.
"""
from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bigram_lm_scores_cms"]

_PAIR_BASE = 1 << 20  # matches dedup.bigram_lm_scores (token ids < 2^20)


def bigram_lm_scores_cms(
    sequences: DataFrame,
    *,
    vocab: int = 50257,
    d: int = 5,
    w: int = 1 << 17,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """-> (doc_id, n_pairs, lm_score_cms) for docs with >= 2 tokens.

    score(doc) = mean over adjacent pairs (a,b) of
    ln((cms2[a,b] + 1) / (cms1[a] + vocab)) — identical arithmetic to
    the exact scorer with CMS point queries in place of table counts.
    Each payload is d·w·8 bytes (5 MiB at the defaults) broadcast once;
    the corpus never shuffles.
    """
    from ..functions.text import adjacent_pair_keys
    from .sketches import CmsSketch

    pairs_arr = sequences.select(
        adjacent_pair_keys(F.col(tokens_col), vocab=_PAIR_BASE).alias("pairs")
    )
    pair_payload, _ = CmsSketch(d, w, col="pairs").build_bytes(pairs_arr)
    uni_payload, _ = CmsSketch(d, w, col=tokens_col).build_bytes(
        sequences.select(tokens_col)
    )
    sc = sequences.sparkSession.sparkContext
    bc2 = sc.broadcast(pair_payload)
    bc1 = sc.broadcast(uni_payload)

    def score(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from ..sketch import sketch_from_bytes
        from .sketches import arrow_flat_tokens, arrow_row_lengths

        cms2 = sketch_from_bytes(bc2.value)
        cms1 = sketch_from_bytes(bc1.value)
        for b in batches:
            flat = arrow_flat_tokens(b, tokens_col).astype(np.int64, copy=False)
            lens = arrow_row_lengths(b, tokens_col)
            ids = b.column(b.schema.get_field_index(id_col)).to_pylist()
            n_pair_rows = np.maximum(lens - 1, 0)
            keep = n_pair_rows > 0
            if not keep.any():
                continue
            if flat.size >= 2:
                ends = np.cumsum(lens)
                # pair position i joins flat[i], flat[i+1]; drop the
                # positions that straddle a row boundary (i == end-1)
                mask = np.ones(flat.size - 1, dtype=bool)
                cut = ends[(ends > 0) & (ends < flat.size)] - 1
                mask[cut] = False
                pair_keys = (flat[:-1] * _PAIR_BASE + flat[1:])[mask]
                left = flat[:-1][mask]
            else:
                pair_keys = left = np.empty(0, dtype=np.int64)
            c2 = cms2.query_tokens(pair_keys).astype(np.float64)
            c1 = cms1.query_tokens(left).astype(np.float64)
            lp = np.log((c2 + 1.0) / (c1 + float(vocab)))
            # per-doc mean via prefix-sum differences over the masked
            # (row-boundary-free) positions, whose per-row counts are
            # exactly max(len-1, 0)
            csum = np.concatenate(([0.0], np.cumsum(lp)))
            seg_ends = np.cumsum(n_pair_rows)
            seg = csum[seg_ends] - csum[seg_ends - n_pair_rows]
            means = np.round(
                seg[keep] / n_pair_rows[keep].astype(np.float64), 6
            )
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(
                        [i for i, k in zip(ids, keep) if k], type=pa.string()
                    ),
                    pa.array(n_pair_rows[keep], type=pa.int64()),
                    pa.array(means, type=pa.float64()),
                ],
                names=["doc_id", "n_pairs", "lm_score_cms"],
            )

    return sequences.select(id_col, tokens_col).mapInArrow(
        score, schema="doc_id string, n_pairs bigint, lm_score_cms double"
    )


def bigram_entropy(
    df: DataFrame,
    *,
    group_col: str = "source",
    tokens_col: str = "tokens",
    vocab: int = 50261,
) -> DataFrame:
    """Per-group bigram information profile: conditional entropy
    H(next | prev) = −(1/N)·Σ_ab c_ab·ln(c_ab / c_a·), the right-
    marginal unigram entropy H(next), and their difference — the
    mutual information I(prev; next) — all in nats. The
    PREDICTABILITY axis of the text-statistics family: Zipf/Heaps read
    the frequency and growth laws, KL/keyness read BETWEEN-group
    shifts, this reads WITHIN-text structure — template/boilerplate
    corpora have low H(next|prev) (each token pins the next), shuffled
    or high-entropy corpora sit near H(next) with MI ≈ 0. It is also
    the exact average log-loss (base e) of the un-smoothed bigram LM
    q_bigram_lm_scores scores documents with.

    Distributed shape: ONE corpus scan explodes map-side adjacent-pair
    keys (functions/text.py::adjacent_pair_keys — no join, no window
    over tokens) into a map-side-combinable (group, pair) count;
    marginals are window sums OVER that vocab²-bounded frame, and the
    final row set is |groups|. Key decode uses subtract-then-divide
    ((pk − pk % vocab)/vocab), exact in doubles below 2^53 — the same
    engine-portable integer trick the sweep/shift operators pin.
    """
    from ..functions.text import adjacent_pair_keys

    pairs = df.select(
        F.col(group_col).alias("_g"),
        F.explode(adjacent_pair_keys(F.col(tokens_col), vocab)).alias("_pk"),
    )
    pc = pairs.groupBy("_g", "_pk").agg(F.count("*").alias("_c"))
    left = ((F.col("_pk") - F.col("_pk") % vocab) / vocab).cast("long")
    right = (F.col("_pk") % vocab).cast("long")
    from pyspark.sql import Window

    base = pc.select(
        "_g", "_c", left.alias("_a"), right.alias("_b")
    )
    w_a = Window.partitionBy("_g", "_a")
    w_b = Window.partitionBy("_g", "_b")
    w_g = Window.partitionBy("_g")
    enriched = base.select(
        "_g",
        "_c",
        F.sum("_c").over(w_a).alias("_ca"),
        F.sum("_c").over(w_b).alias("_cb"),
        F.sum("_c").over(w_g).alias("_n"),
    )
    c = F.col("_c").cast("double")
    h_cond = -F.sum(c * F.log(c / F.col("_ca"))) / F.first("_n")
    h_right = -F.sum(c * F.log(F.col("_cb") / F.col("_n"))) / F.first("_n")
    out = enriched.groupBy("_g").agg(
        F.first("_n").alias("n_pairs"),
        F.round(h_cond, 6).alias("h_cond"),
        F.round(h_right, 6).alias("h_right"),
        F.round(h_right - h_cond, 6).alias("mutual_info"),
    )
    return out.select(
        F.col("_g").alias(group_col),
        F.col("n_pairs").cast("bigint").alias("n_pairs"),
        "h_cond",
        "h_right",
        "mutual_info",
    )
