"""Dataset card: the one-row corpus datasheet.

Every curated training corpus ships with a datasheet (Gebru et al.,
"Datasheets for Datasets", CACM 2021): how big, from where, in what
languages, how duplicated, how long are the documents. This operator
computes the quantitative half in ONE corpus scan plus tiny bounded
aggregates — the numbers a mixing/curation decision actually reads,
as a frame (so it parquets, diffs across snapshots, and joins into
dashboards).

Every emitted value is an exact integer or a deterministic function of
exact integers (ratios round(6); the single-ln entropy follows the
q_token_entropy / keyness precedent), so the whole card hash-matches a
plain-SQL oracle — the card is an auditable artifact, not a estimate.

Distributed shape: one pass over documents computes the global
aggregates (counts, token/char sums, exact distinct fingerprints via a
pre-aggregated distinct, length quantile); the per-source and
per-language distributions are map-side-combined aggregates bounded by
|sources| and |langs|; everything reassembles by broadcast cross joins
of one-row/tiny frames. Nothing but the scan scales with the corpus.

Reference parity: beyond /root/reference (membership sketches only);
the card's dedup-rate line is where the reference's Bloom machinery
plugs in at 100 TB (estimate the distinct count instead of the exact
distinct when fingerprints outgrow a shuffle — q_hll_distinct_tokens
is that path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import token_count_expr


def dataset_card(
    docs: DataFrame,
    *,
    text_col: str = "text",
    source_col: str = "source",
    lang_col: str = "lang",
    fp_prefix: int = 40,
    short_doc_tokens: int = 50,
) -> DataFrame:
    """One-row datasheet over a documents table.

    Columns: n_docs, n_tokens, n_chars, n_sources, n_langs,
    top_source / top_source_share, lang_entropy_nats (Shannon over the
    language distribution), n_distinct_fp / dup_rate (md5 of the first
    ``fp_prefix`` chars — the exact-dedup fingerprint), median_ntok,
    mean_ntok, pct_short (docs with < ``short_doc_tokens`` tokens).
    """
    base = docs.select(
        F.md5(F.substring(F.col(text_col), 1, fp_prefix)).alias("_fp"),
        token_count_expr(F.col(text_col)).cast("long").alias("_ntok"),
        F.length(F.col(text_col)).cast("long").alias("_nchars"),
        F.col(source_col).alias("_src"),
        F.col(lang_col).alias("_lang"),
    )
    g = base.agg(
        F.count("*").alias("n_docs"),
        F.sum("_ntok").alias("n_tokens"),
        F.sum("_nchars").alias("n_chars"),
        F.countDistinct("_fp").alias("n_distinct_fp"),
        F.round(F.expr("percentile(_ntok, 0.5)"), 6).alias("median_ntok"),
        F.round(F.avg("_ntok"), 6).alias("mean_ntok"),
        F.sum((F.col("_ntok") < short_doc_tokens).cast("long")).alias("_n_short"),
    )
    src = base.groupBy("_src").agg(F.count("*").alias("_c"))
    top_src = src.orderBy(F.desc("_c"), F.asc("_src")).limit(1).select(
        F.col("_src").alias("top_source"), F.col("_c").alias("_top_c")
    )
    n_src = src.agg(F.count("*").alias("n_sources"))
    lang = base.groupBy("_lang").agg(F.count("*").alias("_c"))
    # Shannon entropy from exact integer counts: H = ln(N) - sum(c*ln c)/N
    lang_agg = lang.agg(
        F.count("*").alias("n_langs"),
        F.sum(F.col("_c").cast("double") * F.log(F.col("_c").cast("double"))).alias(
            "_clnc"
        ),
    )
    return (
        g.crossJoin(F.broadcast(n_src))
        .crossJoin(F.broadcast(top_src))
        .crossJoin(F.broadcast(lang_agg))
        .select(
            "n_docs",
            "n_tokens",
            "n_chars",
            "n_sources",
            "n_langs",
            "top_source",
            F.round(F.col("_top_c").cast("double") / F.col("n_docs"), 6).alias(
                "top_source_share"
            ),
            F.round(
                F.log(F.col("n_docs").cast("double"))
                - F.col("_clnc") / F.col("n_docs"),
                6,
            ).alias("lang_entropy_nats"),
            "n_distinct_fp",
            F.round(
                F.lit(1.0)
                - F.col("n_distinct_fp").cast("double") / F.col("n_docs"),
                6,
            ).alias("dup_rate"),
            "median_ntok",
            "mean_ntok",
            F.round(F.col("_n_short").cast("double") / F.col("n_docs"), 6).alias(
                "pct_short"
            ),
        )
    )


def pareto_coverage(
    df: DataFrame,
    *,
    group_col: str = "source",
    id_col: str = "doc_id",
    weight_col: str = "n_tok",
    threshold_pct: int = 80,
) -> DataFrame:
    """Concentration profile of a weight (token mass) per group: how
    many documents carry ``threshold_pct``% of the tokens, and what
    share the top decile of documents holds — the Pareto companion to
    the datasheet's entropy line. A source where 2% of docs carry 80%
    of tokens is a few-giant-documents feed (one bad scrape dominates
    training mass); a flat profile is many-small-docs. Both need
    different dedup/chunking treatment, which is why this runs before
    ``chunk_windows``/``pack_sequences`` parameter choices.

    Exactness: the threshold test is pure BIGINT arithmetic —
    100·(running sum BEFORE this doc) < pct·total — so no float
    boundary can flip a count cross-engine; only the two emitted
    shares divide. Deterministic total order (weight desc, id asc).

    Distributed shape: windows partitioned by group over the
    |docs|-per-group frame (the input is one row per doc already);
    one aggregate after. At 100 TB run it on the (group, doc, n_tok)
    projection — three columns, pruned at the scan.
    """
    from pyspark.sql import Window

    if not 0 < threshold_pct < 100:
        raise ValueError(f"threshold_pct must be in (0,100), got {threshold_pct}")
    w_ord = (
        Window.partitionBy(group_col)
        .orderBy(F.col(weight_col).desc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(group_col)
    wt = F.col(weight_col).cast("bigint")
    base = df.select(
        F.col(group_col),
        F.col(id_col),
        wt.alias("_w"),
        F.sum(wt).over(w_ord).alias("_cum"),
        F.sum(wt).over(w_all).alias("_tot"),
        F.count("*").over(w_all).alias("_n"),
        F.row_number().over(
            Window.partitionBy(group_col).orderBy(
                F.col(weight_col).desc(), F.col(id_col).asc()
            )
        ).alias("_rk"),
    )
    before = F.col("_cum") - F.col("_w")
    in_head = F.lit(100) * before < F.lit(threshold_pct) * F.col("_tot")
    decile = F.col("_rk") <= F.floor((F.col("_n") + 9) / 10).cast("bigint")
    return base.groupBy(group_col).agg(
        F.count("*").alias("n_docs"),
        F.max("_tot").alias("total_weight"),
        F.sum(F.when(in_head, 1).otherwise(0)).alias("docs_to_threshold"),
        F.round(
            F.sum(F.when(in_head, 1).otherwise(0)) / F.count("*"), 6
        ).alias("frac_docs_to_threshold"),
        # try_divide: an all-zero-weight group has _tot=0; ANSI throws
        F.round(
            F.try_divide(
                F.sum(F.when(decile, F.col("_w")).otherwise(0)), F.max("_tot")
            ),
            6,
        ).alias("top_decile_share"),
    )
