"""Winnowing document fingerprints (MOSS) + shared-fingerprint overlap.

Schleimer, Wilkerson & Aiken 2003 ("Winnowing: Local Algorithms for
Document Fingerprinting") — the fingerprint selection behind MOSS:
hash every k-gram, slide a window of w consecutive k-gram hashes, and
record the *rightmost minimal* hash of each window. Guarantees:

  * any shared substring of at least w + k - 1 tokens between two
    documents yields at least one shared fingerprint (zero false
    negatives at that match length — the property a dedup /
    plagiarism pass actually relies on);
  * expected density 2 / (w + 1) — the selected sketch is a constant
    fraction of the token stream, independent of content.

This sits between exact span dedup (``spans.py`` — every L-window
keyed, corpus-scale explode) and MinHash (``dedup.py`` — whole-doc
set resemblance): winnowing is *positional and local* like spans but
ships only ~2/(w+1) of the windows, and unlike MinHash it localises
*where* documents overlap, not just that they do.

Spark-first shape
-----------------
Fingerprint selection is a single map-side ``mapInArrow`` pass — zero
shuffle, no per-row Python: each Arrow batch flattens the ragged token
column once and the whole selection is numpy slice algebra. (A pure
Catalyst array formulation exists but is pathological: a higher-order
``transform(sequence(..), q -> array_min(slice(keys, ..)))`` re-inlines
the *entire* keys/grams/tokenize expression chain into the lambda, so
every window re-evaluates the tokenizer — O(P^2) md5 calls per row,
measured as a multi-minute hang at sf0.01. The kernel is O(P·w).)

Cross-engine-exact integer math (the DuckDB oracle renders the same):

  grams   g_i = t_i·2526168121 + t_{i+1}·50261 + t_{i+2}   (injective
          for vocab < 50261; the same polynomial as functions/text.py's
          rolling fingerprint)
  mix     h_i = (g_i · 48271) mod 2147483647               (Lehmer /
          MINSTD step — decorrelates the window-min choice from raw
          token magnitude; g·48271 < 2^63, overflow-free both engines)
  pack    key_i = (h_i << POS_BITS) + (POS_MASK - i)
          min(key) == rightmost minimal h — the paper's tie rule —
          because later positions pack to SMALLER low bits
  select  per window end q >= w-1: min(key[q-w+1 .. q]); fingerprint
          = key >> POS_BITS (positions dropped after selection, so
          repeated selections of one gram dedupe to one fingerprint)

Documents with fewer than w k-grams degrade to one fingerprint (the
global minimum) — the paper's behaviour for |doc| < w + k - 1.
POS_BITS=27 supports documents up to 134M tokens; h < 2^31 keeps the
packed key < 2^58, inside both engines' BIGINT.

The overlap join groups postings per fingerprint (one shuffle), drops
stop-fingerprints shared by more than ``df_cap`` documents (bounds the
pair fan-out exactly like the tf-idf df cap — at 100 TB a boilerplate
fingerprint otherwise yields a quadratic bucket), and generates
candidate pairs INSIDE each posting array with nested Catalyst
transforms over the ≤ df_cap-element doc lists — no self-join. The
fingerprint frame feeds two aggregations (postings + per-doc counts),
so callers get it persisted and ``tie``d per the repo lifecycle rule.

Reference parity: /root/reference/src/bloomfilter/mod.rs has no
substring surface; this extends SURVEY §2.2 dedup with the standard
public fingerprinting algorithm (paper above), re-expressed as a
shuffle-free vectorized selection.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from .cache import tie

POS_BITS = 27
POS_MASK = (1 << POS_BITS) - 1
MIX_MUL = 48271  # MINSTD multiplier (Park-Miller)
MIX_MOD = 2147483647  # 2^31 - 1
_A, _B = 2526168121, 50261  # 3-gram polynomial (functions/text.py parity)


def winnow_kernel(flat: np.ndarray, lengths: np.ndarray, w: int = 4) -> tuple[np.ndarray, np.ndarray]:
    """(row_idx, fingerprint) pairs for one flattened ragged batch.

    ``flat`` is the concatenated int64 token stream, ``lengths`` the
    per-row token counts (every row must have >= 3 tokens — filter
    upstream). Pure numpy; deterministic; per-row distinct output.
    """
    if flat.size == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    v = flat.astype(np.int64, copy=False)
    # within-row 3-gram hashes: hash the whole stream, drop windows that
    # cross row boundaries (same masking trick as flat_ngram_hashes)
    g = v[:-2] * _A + v[1:-1] * _B + v[2:]
    row_of = np.repeat(np.arange(len(lengths), dtype=np.int64), lengths)
    keep = row_of[: g.size] == row_of[2 : 2 + g.size]
    g = g[keep]
    rid = row_of[: keep.size][keep]  # row of each surviving gram
    n_g = lengths - 2  # grams per row (all >= 1)
    # local gram index within its row (the paper's position for ties)
    gram_starts = np.concatenate(([0], np.cumsum(n_g)[:-1]))
    q = np.arange(g.size, dtype=np.int64) - gram_starts[rid]
    h = (g * MIX_MUL) % MIX_MOD
    key = (h << POS_BITS) + (POS_MASK - q)

    out_rid: list[np.ndarray] = []
    out_fp: list[np.ndarray] = []
    # rows with >= w grams: window-end q in [w-1, n_g); windows never
    # cross rows because q >= w-1 implies the whole window is local
    if key.size >= w:
        m = np.minimum.reduce([key[i : key.size - (w - 1) + i] for i in range(w)])
        ends = np.flatnonzero(q >= w - 1)
        if ends.size:
            out_rid.append(rid[ends])
            out_fp.append(m[ends - (w - 1)] >> POS_BITS)
    # rows with < w grams: single global-min fingerprint
    short = np.flatnonzero(n_g < w)
    if short.size:
        mins = np.minimum.reduceat(key, gram_starts)  # all segments non-empty
        out_rid.append(short)
        out_fp.append(mins[short] >> POS_BITS)
    rids = np.concatenate(out_rid) if out_rid else np.empty(0, np.int64)
    fps = np.concatenate(out_fp) if out_fp else np.empty(0, np.int64)
    # per-row distinct: fp < 2^31, rid < batch rows — pack and unique
    packed = np.unique((rids << 31) | fps)
    return packed >> 31, packed & ((1 << 31) - 1)


def winnow_fingerprints(
    seq: DataFrame,
    k: int = 3,
    w: int = 4,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, fp) — one row per distinct winnowed fingerprint per doc.

    One map-only Arrow pass, zero shuffle; expected output ~ 2/(w+1) of
    the corpus gram count. Catalyst prunes every other column at scan.
    """
    if k != 3:  # the 3-constant polynomial is injective only for k=3
        raise NotImplementedError("winnowing gram hash is fixed at k=3")
    if w < 1:
        raise ValueError("window w must be >= 1")

    def run(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        import pyarrow as pa

        from .sketches import arrow_flat_tokens, arrow_row_lengths

        for batch in batches:
            ids = batch.column("doc_id")
            if isinstance(ids, pa.ChunkedArray):
                ids = ids.combine_chunks()
            flat = arrow_flat_tokens(batch, "tokens").astype(np.int64)
            lengths = arrow_row_lengths(batch, "tokens")
            rids, fps = winnow_kernel(flat, lengths, w)
            yield pa.RecordBatch.from_arrays(
                [ids.take(pa.array(rids, type=pa.int64())), pa.array(fps, type=pa.int64())],
                names=["doc_id", "fp"],
            )

    src = seq.filter(F.size(tokens_col) >= k).select(
        F.col(id_col).cast("string").alias("doc_id"), F.col(tokens_col).alias("tokens")
    )
    out_schema = StructType(
        [StructField("doc_id", StringType()), StructField("fp", LongType())]
    )
    return src.mapInArrow(run, schema=out_schema)


def winnow_overlap_pairs(
    fps: DataFrame,
    min_shared: int = 2,
    df_cap: int = 20,
) -> DataFrame:
    """Document pairs ranked by shared winnowed fingerprints.

    Output: (doc_a, doc_b, shared_fps, containment) where containment
    = shared / min(|fps_a|, |fps_b|) — the MOSS report score.

    Scale shape: ONE shuffle groups postings per fingerprint;
    fingerprints held by > df_cap docs are dropped (stop-fingerprint
    cap — the quadratic-bucket guard); pairs are generated inside the
    ≤ df_cap posting arrays with nested Catalyst transforms (≤
    df_cap·(df_cap-1)/2 per fingerprint, no self-join, no second
    corpus pass); the final per-pair count and the per-doc count join
    shuffle only candidate pairs — a tiny fraction of the corpus.

    ``fps`` feeds two aggregation branches (postings + per-doc
    counts): it is persisted here and tied to the result — call
    ``cache.free(result)`` when done, or rely on the FIFO cap.
    """
    fps = fps.persist()
    posting = (
        fps.groupBy("fp")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("docs"))
        .filter((F.size("docs") >= 2) & (F.size("docs") <= df_cap))
    )
    pairs = posting.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(0), F.size("docs") - 2),
                    lambda i: F.transform(
                        F.slice(F.col("docs"), i + 2, F.size("docs")),
                        lambda b: F.struct(
                            F.element_at(F.col("docs"), i + 1).alias("doc_a"),
                            b.alias("doc_b"),
                        ),
                    ),
                )
            )
        ).alias("p")
    ).select("p.doc_a", "p.doc_b")
    shared = (
        pairs.groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("shared_fps"))
        .filter(F.col("shared_fps") >= min_shared)
    )
    counts = fps.groupBy("doc_id").agg(F.count("*").alias("n_fp"))
    out = (
        shared.join(counts.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .withColumnRenamed("n_fp", "n_fp_a")
        .join(counts.withColumnRenamed("doc_id", "doc_b"), "doc_b")
        .withColumnRenamed("n_fp", "n_fp_b")
        .select(
            "doc_a",
            "doc_b",
            "shared_fps",
            F.round(
                F.col("shared_fps").cast("double") / F.least("n_fp_a", "n_fp_b"),
                6,
            ).alias("containment"),
        )
    )
    return tie(out, fps)
