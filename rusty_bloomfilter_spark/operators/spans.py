"""Exact repeated-span (substring-level) deduplication.

Document-level dedup (md5 / MinHash / SimHash in ``dedup.py``) misses
the dominant duplication mode in crawl corpora: *spans* — boilerplate,
license headers, quoted passages — repeated inside otherwise-distinct
documents. Lee et al. 2022 ("Deduplicating Training Data Makes
Language Models Better") remove exact duplicate token substrings of
length >= L with a corpus-wide suffix array; a suffix array does not
distribute, so the scalable re-expression used here (and in public
Spark pipelines) is window-granular:

  1. every L-token window of every document gets a content key
     (md5 over the '-'-joined token ids — 128-bit, collision-free at
     any realistic corpus size, and exactly reproducible in DuckDB
     for the oracle);
  2. a window occurrence is *duplicated* iff its key occurs more than
     once corpus-wide AND it is not the canonical first occurrence
     (min (doc_id, pos) — so one copy of every span always survives,
     exactly Lee et al.'s keep-one semantics at window granularity);
  3. per document, overlapping/adjacent duplicated windows merge into
     maximal spans (gaps-and-islands over pos), giving the spans a
     cleaner would cut.

Pure Catalyst end-to-end: the explode, the per-key window aggregates
and the per-doc island windows are all JVM-side — no Python in the
row path. Scale shape: window rows ~= corpus token count; they flow
through ONE corpus pass — occurrence counts and canonical owners come
from window functions over the key partition, not a groupBy+self-join
(which would run the explode+md5 stage once per join side: identical
exchanges are reusable, an aggregate side and a probe side are not).
The surviving duplicated occurrences — a tiny fraction — shuffle once
more on doc_id for the island merge. No driver-side data, no
cartesian products, no persist of corpus-scale intermediates.

Canonical owners are struct-ordered (doc_id, pos) minima, so doc ids
may be any orderable type — strings, 64-bit hashes — with no
arithmetic-overflow ceiling.

Reference parity: the reference library (/root/reference/src/
bloomfilter/mod.rs) has no substring surface; this extends SURVEY
§2.2's dedup category with the training-data op its users run next.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def window_key_expr(tokens: Column, i: Column, length: int) -> Column:
    """md5 content key of the ``length``-token window starting at
    0-based offset ``i`` (DuckDB renders the identical string:
    md5(array_to_string(tokens[i+1:i+L], '-')))."""
    ids = F.transform(
        F.slice(tokens, i + 1, length), lambda t: t.cast("string")
    )
    return F.md5(F.concat_ws("-", ids))


def token_windows(
    seq: DataFrame,
    length: int,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
) -> DataFrame:
    """(doc_id, pos, key): one row per L-token window per document.

    Documents shorter than ``length`` tokens contribute no windows
    (they cannot contain an L-token duplicate). The explode multiplies
    rows by ~n_tok but each output row is ~50 bytes — the same row
    volume as any shingling pass, and it flows straight into a keyed
    window stage without materializing. ``id_col`` keeps its input
    type (any orderable type works; nothing is cast)."""
    if length < 2:
        raise ValueError(f"window length must be >= 2, got {length}")
    tokens = F.col(tokens_col)
    wins = F.when(
        F.size(tokens) >= length,
        F.transform(
            F.sequence(F.lit(0), F.size(tokens) - length),
            lambda i: F.struct(
                i.cast("long").alias("pos"),
                window_key_expr(tokens, i, length).alias("key"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<pos:bigint,key:string>>"))
    return seq.select(
        F.col(id_col).alias("doc_id"), F.explode(wins).alias("w")
    ).select("doc_id", F.col("w.pos").alias("pos"), F.col("w.key").alias("key"))


def duplicated_windows(wins: DataFrame, min_count: int = 2) -> DataFrame:
    """Window occurrences whose key repeats corpus-wide, minus each
    key's canonical first occurrence (struct-min (doc_id, pos)): the
    set of window starts a span cut would remove.

    Occurrence counts and owners come from window functions over the
    key partition — ONE shuffle, one pass over the window rows. The
    groupBy+join alternative reads the corpus (and recomputes the
    explode+md5 stage) once per join side, because an aggregate plan
    and a probe plan never share an exchange."""
    owner = F.struct("doc_id", "pos")
    wk = Window.partitionBy("key")
    return (
        wins.withColumn("cnt", F.count(F.lit(1)).over(wk))
        .withColumn("min_owner", F.min(owner).over(wk))
        .where(
            (F.col("cnt") >= F.lit(int(min_count))) & (owner != F.col("min_owner"))
        )
        .select("doc_id", "pos")
    )


def merge_window_spans(dup: DataFrame, length: int) -> DataFrame:
    """Merge duplicated window starts into maximal per-doc spans.

    Classic gaps-and-islands: windows [p, p+L) and [q, q+L) with q > p
    belong to one span iff q - p <= L (overlapping or exactly
    adjacent). Returns (doc_id, span_start, span_end) with end
    exclusive. Per-doc window sort only — never a global ordering.
    """
    w = Window.partitionBy("doc_id").orderBy("pos")
    brk = F.when(
        F.col("pos") - F.lag("pos").over(w) > F.lit(int(length)), 1
    ).otherwise(0)
    island = F.sum(brk).over(
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        dup.withColumn("island", island)
        .groupBy("doc_id", "island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(int(length))).alias("span_end"),
        )
        .select("doc_id", "span_start", "span_end")
    )


def cut_spans(
    seq: DataFrame,
    length: int,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    min_count: int = 2,
) -> DataFrame:
    """Apply side of repeated-span dedup: (doc_id, tokens, tokens_clean)
    with every duplicated span's tokens removed and the canonical first
    occurrence of every span kept (keep-one semantics, so no content is
    lost corpus-wide). Documents with no duplicated spans pass through
    unchanged.

    The cut is a per-doc positional filter against that doc's merged
    span list (LEFT join on doc_id, spans aggregated to an array —
    per-doc span counts are tiny, so the O(n_tok * n_spans) lambda
    stays cheap and JVM-side). The join key is doc_id: the corpus
    shuffles once, the span frame is the tiny side.
    """
    tokens = F.col(tokens_col)
    wins = token_windows(seq, length, id_col=id_col, tokens_col=tokens_col)
    spans = merge_window_spans(duplicated_windows(wins, min_count=min_count), length)
    per_doc = spans.groupBy("doc_id").agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("spans")
    )
    base = seq.select(F.col(id_col).alias("doc_id"), tokens.alias("tokens"))
    joined = base.join(per_doc, "doc_id", "left").withColumn(
        "spans", F.coalesce(F.col("spans"), F.array())
    )
    covered = lambda i: F.exists(  # noqa: E731 — readability over def
        F.col("spans"),
        lambda s: (i >= s["span_start"]) & (i < s["span_end"]),
    )
    kept_idx = F.filter(
        F.sequence(F.lit(0), F.size("tokens") - 1),
        lambda i: ~covered(i.cast("long")),
    )
    # size==0 guard: Spark's sequence(0, -1) is [0, -1] (descending
    # step), not empty — same trap as rolling_fingerprint_expr
    clean = F.when(
        F.size("tokens") > 0,
        F.transform(kept_idx, lambda i: F.get("tokens", i)),
    ).otherwise(F.col("tokens"))
    return joined.select("doc_id", "tokens", clean.alias("tokens_clean"))


def span_dedup_stats(
    seq: DataFrame,
    length: int,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    min_count: int = 2,
) -> DataFrame:
    """Per-document repeated-span summary: (doc_id, n_dup_spans,
    dup_tokens) — how many maximal duplicated spans a cut pass would
    remove from each document and how many tokens they cover. Documents
    with no duplicated spans are absent (join back against the corpus
    for a dense frame). Deterministic: the canonical-owner rule makes
    the kept copy unique, so reruns and re-partitionings agree."""
    wins = token_windows(seq, length, id_col=id_col, tokens_col=tokens_col)
    spans = merge_window_spans(duplicated_windows(wins, min_count=min_count), length)
    return spans.groupBy("doc_id").agg(
        F.count("*").alias("n_dup_spans"),
        F.sum(F.col("span_end") - F.col("span_start")).cast("bigint").alias("dup_tokens"),
    )
