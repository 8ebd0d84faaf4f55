"""Vocabulary growth (Heaps' law) per corpus slice.

Heaps' law: the distinct-type count V(n) of a natural-language corpus
grows as V(n) ~= K * n^beta with beta typically 0.4-0.6. A corpus
whose vocabulary curve is too flat (template/boilerplate floods, a
looping crawler) or too steep (random noise, OCR garbage, wrong
charset) fails the fit — the distributional health check that
complements the Zipf slope (contract.q_zipf_slope): Zipf reads the
frequency axis, Heaps reads the growth axis of the same phenomenon.

Construction (exact, pure Catalyst):

  1. rank documents within each group by doc_id (any stable unique
     key works — the fit is invariant to reasonable orders);
  2. cum_tokens(r) = running token total;
  3. a type's FIRST rank = min(r) over its occurrences — so
     new_types(r) counts types debuting at rank r, and the running sum
     of new_types is exactly the distinct-vocabulary curve V(r)
     (the min-first-rank trick: one corpus-sized aggregate instead of
     a distinct-count per prefix, which would be O(docs) passes);
  4. per-group OLS of ln V on ln n gives (beta, ln K) — closed form
     covar_pop/var_pop, the same map-reducible moments as
     q_zipf_slope, mirrored verbatim by DuckDB's regr_slope /
     regr_intercept.

Scale shape: one corpus explode into a (group, token) hash aggregate
(map-side combinable) + one corpus pass for ranks. The rank window
sorts each group's doc keys — inherently sequential per group; at
100 TB rank at snapshot/day granularity instead of per-document (pass
a coarser id_col) so each group's window holds bounded rows. All
frames after the two aggregates are bounded by groups x ranks.

Reference parity: growth-curve analysis extends /root/reference (a
membership library) per SURVEY §2.2's aggregation category; Heaps /
Herdan law per the public literature (Herdan 1960, Heaps 1978).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def vocab_growth_curve(
    seq: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
) -> DataFrame:
    """(group, r, cum_tokens, new_types, cum_vocab) — the exact
    vocabulary-growth curve of each group, one row per document rank."""
    w_rank = Window.partitionBy(group_col).orderBy(id_col)
    ranked = seq.select(
        F.col(group_col).alias("group"),
        F.col(id_col).alias("id"),
        F.col(tokens_col).alias("tokens"),
        F.size(tokens_col).alias("n_tok"),
    ).withColumn("r", F.row_number().over(Window.partitionBy("group").orderBy("id")))
    w_cum = Window.partitionBy("group").orderBy("r")
    curve = ranked.select(
        "group", "r", F.sum("n_tok").over(w_cum).cast("bigint").alias("cum_tokens")
    )
    firsts = (
        ranked.select("group", "r", F.explode("tokens").alias("tok"))
        .groupBy("group", "tok")
        .agg(F.min("r").alias("first_r"))
    )
    new_at = firsts.groupBy("group", "first_r").agg(F.count("*").alias("new_types"))
    return (
        curve.join(
            new_at.withColumnRenamed("first_r", "r"), ["group", "r"], "left"
        )
        .withColumn("new_types", F.coalesce("new_types", F.lit(0)))
        .withColumn(
            "cum_vocab", F.sum("new_types").over(w_cum).cast("bigint")
        )
        .select(
            F.col("group").alias(group_col),
            "r",
            "cum_tokens",
            "new_types",
            "cum_vocab",
        )
    )


def heaps_fit(curve: DataFrame, group_col: str = "source") -> DataFrame:
    """Per-group Heaps fit over a vocab_growth_curve frame:
    (group, n_docs, total_tokens, vocab, heaps_beta, heaps_lnk) with
    V(n) ~= exp(heaps_lnk) * n^heaps_beta. Closed-form OLS in log-log
    space (slope = covar_pop/var_pop), 4 dp — the same cross-engine
    float contract as q_zipf_slope."""
    x = F.log(F.col("cum_tokens").cast("double"))
    y = F.log(F.col("cum_vocab").cast("double"))
    pts = curve.select(group_col, x.alias("x"), y.alias("y"), "cum_tokens", "cum_vocab")
    slope = F.covar_pop("x", "y") / F.var_pop("x")
    return pts.groupBy(group_col).agg(
        F.count("*").alias("n_docs"),
        F.max("cum_tokens").alias("total_tokens"),
        F.max("cum_vocab").alias("vocab"),
        F.round(slope, 4).alias("heaps_beta"),
        F.round(F.avg("y") - slope * F.avg("x"), 4).alias("heaps_lnk"),
    )


def oov_rate(
    df: DataFrame,
    *,
    group_col: str = "source",
    tokens_col: str = "tokens",
    vocab_size: int,
) -> DataFrame:
    """Out-of-vocabulary rate per group against a frequency-built
    reference vocabulary: the top ``vocab_size`` tokens by corpus
    count (ties broken by token id — fully deterministic), then per
    group the fraction of token OCCURRENCES and distinct token TYPES
    falling outside it. The tokenizer-fit audit: a source whose OOV
    rate is an outlier is being shredded into fallback bytes by the
    tokenizer (code vs a prose-trained vocab, wrong language, emoji
    dumps) and will train badly regardless of its quality scores.

    Distributed shape: ONE corpus explode into a map-side-combinable
    (group, token) count; the global vocabulary derives from that
    frame (sum over groups, window top-V), everything after is bounded
    by groups × vocab — the corpus is scanned once. The counts frame
    is persisted and tied (two consumers: vocab build + the rate
    aggregate).
    """
    from .cache import tie

    if vocab_size < 1:
        raise ValueError(f"vocab_size must be >= 1, got {vocab_size}")
    st = (
        df.select(F.col(group_col).alias("_g"), F.explode(tokens_col).alias("_t"))
        .groupBy("_g", "_t")
        .agg(F.count("*").alias("_c"))
        .persist()
    )
    gt = st.groupBy("_t").agg(F.sum("_c").alias("_n"))
    # two-stage top-V: a global unpartitioned row_number would funnel
    # EVERY distinct token (Heaps-law: 10^8+ on byte-noisy crawl data)
    # through one task. Per-bucket top-V first — each bucket's top-V is
    # a superset of the global top-V members hashed into it, so the
    # global rank over <= 32·V survivors is exact, and the single task
    # sees a bounded frame regardless of vocabulary size.
    w_bkt = Window.partitionBy("_bkt").orderBy(
        F.col("_n").desc(), F.col("_t").asc()
    )
    survivors = (
        gt.withColumn("_bkt", F.pmod(F.hash("_t"), F.lit(32)))
        .withColumn("_brk", F.row_number().over(w_bkt))
        .filter(F.col("_brk") <= vocab_size)
    )
    w = Window.orderBy(F.col("_n").desc(), F.col("_t").asc())
    vocab = (
        survivors.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= vocab_size)
        .select("_t")
    )
    joined = st.join(
        F.broadcast(vocab.withColumn("_in", F.lit(True))), on="_t", how="left"
    )
    out = joined.groupBy("_g").agg(
        F.sum("_c").alias("total_tokens"),
        F.sum(F.when(F.col("_in").isNull(), F.col("_c")).otherwise(0)).alias(
            "oov_occurrences"
        ),
        F.sum(F.when(F.col("_in").isNull(), 1).otherwise(0)).alias("oov_types"),
        F.count("*").alias("distinct_types"),
    )
    out = out.select(
        F.col("_g").alias(group_col),
        "total_tokens",
        "oov_occurrences",
        F.round(F.col("oov_occurrences") / F.col("total_tokens"), 6).alias(
            "oov_rate"
        ),
        F.col("oov_types").cast("bigint").alias("oov_types"),
        F.col("distinct_types").cast("bigint").alias("distinct_types"),
    )
    return tie(out, st)


def lexical_richness(
    df: DataFrame,
    *,
    group_col: str = "source",
    tokens_col: str = "tokens",
) -> DataFrame:
    """Hapax-based lexical richness per group: how much of the
    vocabulary — and how much of the token MASS — comes from types
    seen only once or twice within the group. The third axis of the
    lexical family: Zipf reads the head's slope, Heaps reads growth,
    this reads the TAIL's weight (hapax share ≈ 0.5 of types is
    normal prose; a collapsed hapax share means boilerplate/templated
    text, an inflated one means OCR noise or tokenizer shredding —
    the same pathologies the OOV audit sees from the vocabulary side).
    Also emits the type-token ratio, the classic (length-confounded)
    richness summary.

    One corpus explode into a map-side-combinable (group, token)
    count; everything after is one aggregate over the groups × vocab
    frame. Exact integers except the three round(6) ratios.
    """
    st = (
        df.select(F.col(group_col).alias("_g"), F.explode(tokens_col).alias("_t"))
        .groupBy("_g", "_t")
        .agg(F.count("*").alias("_c"))
    )
    return st.groupBy("_g").agg(
        F.count("*").alias("n_types"),
        F.sum("_c").alias("n_tokens"),
        F.sum(F.when(F.col("_c") == 1, 1).otherwise(0)).alias("n_hapax"),
        F.sum(F.when(F.col("_c") == 2, 1).otherwise(0)).alias("n_dis"),
        F.round(
            F.sum(F.when(F.col("_c") == 1, 1).otherwise(0)) / F.count("*"), 6
        ).alias("hapax_type_share"),
        F.round(
            F.sum(F.when(F.col("_c") == 1, F.col("_c")).otherwise(0))
            / F.sum("_c"),
            6,
        ).alias("hapax_mass_share"),
        F.round(F.count("*") / F.sum("_c"), 6).alias("type_token_ratio"),
    ).select(
        F.col("_g").alias(group_col),
        F.col("n_types").cast("bigint").alias("n_types"),
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.col("n_hapax").cast("bigint").alias("n_hapax"),
        F.col("n_dis").cast("bigint").alias("n_dis"),
        "hapax_type_share",
        "hapax_mass_share",
        "type_token_ratio",
    )
