"""Driver-contract query registry: Spark queries + DuckDB oracles.

Every exact-answer query has a DuckDB oracle producing identical
column names and values (driver compares row count + schema +
order-insensitive value hash). Sketch-estimate queries are registered
without an oracle (rows-only check) since approximate values are not
hash-comparable; their accuracy is pinned in pytest instead.

Conventions for oracle parity:
- every computed column aliased identically on both sides
- money sums go through DECIMAL(38,4) (both engines exact) then round
- float ratios rounded to 6 dp on both sides
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .functions.text import DEFAULT_VOCAB
from .functions import (
    DUCKDB_TOKENIZE,
    duckdb_lang_id,
    lang_id_expr,
    quality_exprs,
    token_count_expr,
    tokenize_md5,
)
from .sources import load_table, sequences_from_documents
from .functions.sqlhash import (
    cms_table_ctes as _cms_ctes,
    hll_estimate_select as _hll_est,
    hll_rows_ctes as _hll_rows,
    sm64_pair_ctes as _sm64_ctes,
)

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def _scratch_dir(kind: str) -> str:
    """Deterministic per-process scratch dir, WIPED on every call.

    The streaming/catalog/checkpoint queries run repeatedly (driver
    sweep + local gate + smoke suite); a mkdtemp per invocation
    accumulated an unbounded pile of full table copies under /tmp
    (round-4 review finding). Fresh CONTENT per call is still required
    — a stale streaming checkpoint would skip already-processed files
    and emit an empty table — so the fixed path is removed and
    recreated rather than reused."""
    import os
    import shutil
    import tempfile

    path = os.path.join(tempfile.gettempdir(), f"rbf_contract_{os.getpid()}_{kind}")
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    return path


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# Driver-window ordering. The round driver verifies only the FIRST 50
# entries of queries() (measured: r2 and r3 CORRECTNESS files each hold
# exactly 50 rows). Registration stays append-only; queries() emits an
# explicit priority order instead:
#   1. _WINDOW_FIRST — never/least-recently driver-verified (r3 positions
#      51-65 that have NO CORRECTNESS row in any round, the four queries
#      that were green in r2 but fell out of the r3 window, and
#      q_sharded_bloom which hard-errored in r3 and is fixed this round).
#   2. Anything registered but named in neither list — i.e. queries NEW
#      this round — so additions land inside the window automatically.
#   3. Remaining queries in registration order.
#   4. _WINDOW_LAST — thrice-green (r1+r2+r3) stable basics; re-verifying
#      them a fourth time is the least informative use of the window.
# ---------------------------------------------------------------------------
# Round-5 rotation (final round): the driver verifies only the FIRST 50
# queries() entries. 102 of 201 registered queries have never received a
# driver CORRECTNESS row; 89 of those are oracle-backed. _WINDOW_FIRST
# holds 42 of them (oracle-backed first, registration age second, per
# VERDICT r4 item 2) incl. the three rows-only->oracle conversion targets
# (q_join_size_est / q_user_novelty_hll / q_kll_ntok_by_source); queries
# NEW this round auto-sort into positions 43+ (see queries()), so up to 8
# additions still land inside the window. Remaining never-appeared queries
# head _WINDOW_MIDDLE; r5 additions beyond 8 would evict them, so prefer
# deepening oracles over widening the count this round.
_WINDOW_FIRST = [  # r6 rotation (VERIFY_SCHEDULE.md): never driver-verified, registration order
    "q_streaming_attribution",
    "q_streaming_enrich",
    "q_regional_volume",
    "q_erasure_manifest",
    "q_cohort_ltv",
    "q_dedup_savings",
    "q_weighted_length_quantiles",
    "q_lexical_richness",
    "q_trimmed_stats",
    "q_pareto_coverage",
    "q_bigram_entropy",
    "q_rfm_segments",
    "q_cluster_quality",
    "q_oov_rate",
    "q_chunk_windows",
    "q_readability",
    "q_seasonality_dow",
    "q_fd_audit",
    "q_filter_sweep",
    "q_daily_acf",
    "q_jsonl_scan",
    "q_gap_fill",
    "q_theilsen_trend",
    "q_benford_audit",
    "q_feature_correlations",
    "q_jaccard_join",
    "q_tfidf_cosine_pairs",
    "q_fk_audit",
    "q_dataset_card",
    "q_skipgram_pmi",
    "q_containment_join",
    "q_winnow_overlap",
    "q_vocab_growth",
    "q_token_dispersion",
    "q_bm25_search",
    "q_ann_sq",
    "q_peak_concurrency",
    "q_set_reconcile",
    "q_source_similarity",
    "q_interarrival_ks",
    "q_value_ranksum",
    "q_survival_km",
    "q_lang_source_chi2",
    "q_streaming_drift",
    "q_key_skew_profile",
    "q_embedding_spectrum",
    "q_sliding_distinct_hll",
    "q_bigram_lm_cms",
    "q_token_shift_cs",
    "q_ntok_percentile_kll",
    "q_streaming_sliding_distinct",
    "q_streaming_generational_dedup",
    "q_value_quantiles_dd",
    "q_streaming_late_audit",
    "q_compressibility",
    "q_lsh_recall_audit",
    "q_ann_ivf",
    "q_media_stats",
    "q_source_overlap_hll",
    "q_incremental_dedup",
    "q_sharded_bloom",
    "q_decontaminate",
    "q_bpe_learn",
    "q_curate_corpus",
    "q_tdigest_quantiles",
    "q_streaming_windowed_topk",
    "q_checkpoint_resume",
    "q_user_distinct_hll",
    "q_counting_bloom_revoke",
    "q_streaming_bloom_dedup",
    "q_bloom_source_profile",
    "q_bloom_probe",
    "q_hll_distinct_tokens",
    "q_cms_top_tokens",
    "q_kll_quantiles",
    "q_minhash_near_dups",
    "q_simhash_near_dups",
    "q_embedding_near_dups",
    "q_ann_lsh",
    "q_media_features",
    "q_source_overlap_bloom",
    "q_bloom_doc_ids",
    "q_topk_cms",
]

_WINDOW_MIDDLE = [  # stale-first (last green round shown)
    "q_embedding_near_dups_exact",  # r3
    "q_incremental_dedup_exact",  # r3
    "q_anti_join",  # r3
    "q_keep_latest",  # r3
    "q_correlated_subquery",  # r3
    "q_asof_join",  # r3
    "q_range_join",  # r3
    "q_ngram_jaccard",  # r3
    "q_bottomk_sample",  # r3
    "q_weighted_sample",  # r3
    "q_salted_skew_build",  # r4
    "q_mp4_frame_plan",  # r4
    "q_container_stats",  # r4
    "q_video_near_dups",  # r4
    "q_stratified_sample",  # r4
    "q_kmv_distinct",  # r4
    "q_kmv_overlap",  # r4
    "q_bpe_merge_pairs",  # r4
    "q_contamination_exact",  # r4
    "q_bigram_lm_scores",  # r4
    "q_repetition_filters",  # r4
    "q_quantiles_exact",  # r4
    "q_pivot_status",  # r4
    "q_grouping_sets",  # r4
    "q_cube_events",  # r4
    "q_streaming_windowed_counts",  # r4
    "q_catalog_scan",  # r4
    "q_dup_clusters",  # r4
    "q_pii_scrub",  # r4
    "q_token_entropy",  # r4
    "q_bloom_join_prune",  # r4
    "q_domain_cap",  # r4
    "q_pack_sequences",  # r4
    "q_ntok_histogram",  # r4
    "q_span_dedup",  # r4
    "q_span_cut",  # r4
    "q_temperature_mix",  # r4
    "q_shard_manifest",  # r4
    "q_split_manifest",  # r4
    "q_epoch_shuffle",  # r4
    "q_json_props",  # r4
    "q_zipf_slope",  # r4
    "q_user_novelty_exact",  # r4
    "q_ntok_quantiles_by_source",  # r4
    "q_bloom_pruned_read",  # r4
    "q_streaming_dedup",  # r4
    "q_embedding_centroids",  # r4
    "q_heavy_tokens_mg",  # r5
    "q_zone_pruned_read",  # r5
    "q_range_layout_prune",  # r5
    "q_zorder_pruned_read",  # r5
    "q_event_funnel",  # r5
    "q_rolling_revenue",  # r5
    "q_compaction_plan",  # r5
    "q_pagerank",  # r5
    "q_value_outliers",  # r5
    "q_similar_names",  # r5
    "q_retention_cohorts",  # r5
    "q_table_profile",  # r5
    "q_join_advisor",  # r5
    "q_hll_rollup",  # r5
    "q_inverted_index",  # r5
    "q_key_skew_exact",  # r5
    "q_xor_pruned_read",  # r5
    "q_source_token_drift",  # r5
    "q_tfidf_top_terms",  # r5
    "q_embedding_gram",  # r5
    "q_collocations_pmi",  # r5
    "q_sliding_distinct",  # r5
    "q_token_shift_exact",  # r5
    "q_ntok_percentile_exact",  # r5
    "q_psi_drift",  # r5
    "q_bloom_shape_plan",  # r5
    "q_data_validation",  # r5
    "q_streaming_sessionize",  # r5
    "q_bloom_anti_join",  # r5
    "q_mixture_replicate",  # r5
    "q_bloom_inner_join",  # r5
    "q_scd2_history",  # r5
    "q_scd2_apply",  # r5
    "q_event_transitions",  # r5
    "q_triangle_count",  # r5
    "q_distinctive_terms",  # r5
    "q_debounce",  # r5
    "q_cooccurrence_lift",  # r5
    "q_cusum_changepoint",  # r5
    "q_join_size_est",  # r5
    "q_user_novelty_hll",  # r5
    "q_kll_ntok_by_source",  # r5
    "q_html_extract",  # r5
    "q_daily_trend",  # r5
    "q_pseudonym_join",  # r5
    "q_storage_profile",  # r5
    "q_encoding_audit",  # r5
    "q_data_diff",  # r5
    "q_index_append",  # r5
    "q_partitioned_scan",  # r5
]

_WINDOW_LAST = [  # >=3 green rounds
    "q_pricing_summary",  # [1, 2, 3]
    "q_top_customers",  # [1, 2, 3]
    "q_events_by_type",  # [1, 2, 3]
    "q_distinct_users_exact",  # [1, 2, 3]
    "q_token_counts",  # [1, 2, 3]
    "q_heavy_tokens_exact",  # [1, 2, 3]
    "q_ngram_distinct",  # [1, 2, 3]
    "q_lang_distribution",  # [1, 2, 3]
    "q_quality_scores",  # [1, 2, 3]
    "q_lang_id",  # [1, 2, 3]
    "q_doc_fingerprints",  # [1, 2, 3]
    "q_exact_dedup",  # [1, 2, 3]
    "q_events_quantiles",  # [1, 2, 3]
    "q_ann_bruteforce",  # [1, 2, 3]
    "q_source_overlap_exact",  # [1, 2, 3]
    "q_topk_two_pass",  # [1, 2, 3]
    "q_rollup_revenue",  # [1, 2, 3]
    "q_window_user_ranks",  # [1, 2, 3]
    "q_set_ops",  # [1, 2, 3]
    "q_sessionize",  # [1, 2, 3]
    "q_token_count_bpe",  # [1, 2, 3]
    "q_rolling_fingerprint",  # [1, 2, 3]
]


def queries() -> dict[str, QueryFn]:
    ordered: dict[str, QueryFn] = {}
    for n in _WINDOW_FIRST:
        if n in _QUERIES:
            ordered[n] = _QUERIES[n]
    known = set(_WINDOW_FIRST) | set(_WINDOW_MIDDLE) | set(_WINDOW_LAST)
    for n, fn in _QUERIES.items():  # queries NEW this round: inside the window
        if n not in ordered and n not in known:
            ordered.setdefault(n, fn)
    for section in (_WINDOW_MIDDLE, _WINDOW_LAST):
        for n in section:
            if n in _QUERIES:
                ordered[n] = _QUERIES[n]
    return ordered


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)


# ===========================================================================
# Relational exact queries (Catalyst-native; scans prune + push down)
# ===========================================================================


@register(
    "q_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) AS sum_base_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(38,4)) * (1 - CAST(l_discount AS DECIMAL(38,4)))) AS DOUBLE) AS sum_disc_price,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: two-key groupBy with decimal-exact money sums."""
    li = load_table(spark, sf_dir, "lineitem")
    # r6: money flows through 1e4-SCALED LONGS per row instead of
    # double->decimal casts. Spark's double->decimal cast (and round())
    # goes through BigDecimal(Double.toString) — a string parse and
    # allocation per value, measured 3x the whole aggregate's cost at
    # sf1.0 (dec sums 1.33s vs 0.43s scaled-long). floor(x*1e4 + 0.5)
    # is HALF_UP in pure double math (the q_ann_sq codec precedent) and
    # is row-for-row equal to CAST(x AS DECIMAL(38,4)) on this data
    # domain (4-dp money values; audited 0 mismatches over every row of
    # all four SFs, pinned in tests/test_money_scaling.py). The scaled
    # sums are exact integers; dividing back as decimal(30,0)/10^4
    # (scale-6 quotient, no precision-loss adjustment) and casting to
    # double reproduces the oracle's decimal-sum-then-double bit-exactly.
    sc4 = lambda c: F.floor(F.col(c) * 10000 + F.lit(0.5)).cast("long")  # noqa: E731
    d5 = F.lit(10000).cast("decimal(5,0)")
    d9 = F.lit(100000000).cast("decimal(9,0)")
    # per-row product: (1e4*ep) * (1e4 - 1e4*disc) = 1e8 * ep*(1-disc),
    # an exact integer <= ~1e13/row; summed in decimal(20,0) (compact
    # per-partition partials, exact at any corpus size)
    disc_scaled = (
        sc4("l_extendedprice") * (F.lit(10000).cast("long") - sc4("l_discount"))
    ).cast("decimal(20,0)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            (F.sum(sc4("l_quantity")).cast("decimal(30,0)") / d5)
            .cast("double")
            .alias("sum_qty"),
            (F.sum(sc4("l_extendedprice")).cast("decimal(30,0)") / d5)
            .cast("double")
            .alias("sum_base_price"),
            (F.sum(disc_scaled).cast("decimal(28,0)") / d9)
            .cast("double")
            .alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "q_top_customers",
    oracle="""
    SELECT c.c_custkey AS custkey, c.c_name AS name,
           CAST(sum(CAST(o.o_totalprice AS DECIMAL(38,4))) AS DOUBLE) AS total_spent,
           count(*) AS n_orders
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1, 2
    ORDER BY total_spent DESC, custkey
    LIMIT 20
    """,
)
def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast join (customer is the small dim) + top-k.

    r6 shape: aggregate orders by the long custkey FIRST, then attach
    c_name by broadcast join on the ~|customers| aggregated rows —
    instead of joining every order row to its customer and hash-
    aggregating on a (long, string) composite key. The inner join
    filters identically before or after the aggregate (c_custkey is
    unique), and decimal(18,4) keeps the money sum on the compact-long
    path (exact; see q_pricing_summary).
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    # 1e4-scaled-long money sum (see q_pricing_summary: the per-row
    # double->decimal cast is a BigDecimal string parse, 2.7x the whole
    # aggregate; floor-scaling audited row-equal on all SFs)
    sc4 = F.floor(F.col("o_totalprice") * 10000 + F.lit(0.5)).cast("long")
    agg = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        (F.sum(sc4).cast("decimal(30,0)") / F.lit(10000).cast("decimal(5,0)"))
        .cast("double")
        .alias("total_spent"),
        F.count("*").alias("n_orders"),
    )
    return (
        agg.join(F.broadcast(c), agg.custkey == c.c_custkey)
        .select("custkey", F.col("c_name").alias("name"), "total_spent", "n_orders")
        .orderBy(F.desc("total_spent"), "custkey")
        .limit(20)
    )


@register(
    "q_events_by_type",
    oracle="""
    SELECT event_type,
           count(*) AS n_events,
           count(DISTINCT user_id) AS n_users,
           CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
    FROM events GROUP BY event_type
    """,
)
def q_events_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("total_value"),
    )


@register(
    "q_distinct_users_exact",
    oracle="SELECT count(DISTINCT user_id) AS n_users FROM events",
)
def q_distinct_users_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact companion of the HLL distinct estimate."""
    return load_table(spark, sf_dir, "events").agg(
        F.countDistinct("user_id").alias("n_users")
    )


# ===========================================================================
# Token pipeline (cross-engine md5 tokenizer => exact oracles)
# ===========================================================================

_SEQ_CTE = f"""
    WITH sequences AS (
        SELECT CAST(doc_id AS VARCHAR) AS doc_id,
               {DUCKDB_TOKENIZE("text")} AS tokens,
               source
        FROM documents
    )
"""


@register(
    "q_token_counts",
    oracle=_SEQ_CTE
    + """
    SELECT t.source, t.n_docs, t.n_tokens, d.distinct_tokens
    FROM (SELECT source, count(*) AS n_docs, CAST(sum(len(tokens)) AS BIGINT) AS n_tokens
          FROM sequences GROUP BY source) t
    JOIN (SELECT source, count(DISTINCT tok) AS distinct_tokens
          FROM (SELECT source, unnest(tokens) AS tok FROM sequences) u
          GROUP BY source) d USING (source)
    """,
)
def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token totals + exact distinct — the exact companion the
    Bloom/HLL estimates are judged against. Token ids reproduce
    bit-identically in DuckDB via the md5 tokenizer."""
    seq = sequences_from_documents(spark, sf_dir)
    distinct = (
        seq.select("source", F.explode("tokens").alias("tok"))
        .groupBy("source")
        .agg(F.countDistinct("tok").alias("distinct_tokens"))
    )
    totals = seq.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("n_tokens"),
    )
    return totals.join(distinct, "source").select(
        "source", "n_docs", "n_tokens", "distinct_tokens"
    )


@register(
    "q_heavy_tokens_exact",
    oracle=_SEQ_CTE
    + """
    SELECT tok, count(*) AS freq
    FROM (SELECT unnest(tokens) AS tok FROM sequences) t
    GROUP BY tok ORDER BY freq DESC, tok LIMIT 25
    """,
)
def q_heavy_tokens_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters — the CMS top-k companion.

    r6 rewrite (same result, same oracle): count WORDS first, md5 only
    the distinct words. The old explode(tokenize(text)) paid one md5
    per occurrence — and 3x that, because the Generate's inferred
    size/isnotnull filter re-evaluated the whole tokenize expression
    twice more (plans/r06/q_heavy_tokens_exact_before.txt). Token
    frequency = sum of word frequencies over words mapping to the id,
    so aggregating words (cheap strings, map-side combined) and
    hashing each distinct word once is value-identical: measured
    4.53s -> 1.15s at sf1.0 before the tokenize fan-out landed.
    """
    from .sources import fan_out_small_scan

    docs = fan_out_small_scan(
        spark,
        load_table(spark, sf_dir, "documents"),
        path=f"{sf_dir}/documents.parquet",
    )
    words = F.filter(F.split(F.col("text"), r"\s+"), lambda w: w != F.lit(""))
    tok = (
        F.conv(F.substring(F.md5("w"), 1, 8), 16, 10).cast("long")
        % DEFAULT_VOCAB
    ).cast("int")
    return (
        docs.select(F.explode(words).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
        .select(tok.alias("tok"), "c")
        .groupBy("tok")
        .agg(F.sum("c").alias("freq"))
        .orderBy(F.desc("freq"), "tok")
        .limit(25)
    )


@register(
    "q_heavy_tokens_mg",
    oracle=_SEQ_CTE
    + """
    , toks AS (SELECT unnest(tokens) AS tok FROM sequences)
    SELECT tok, count(*) AS freq
    FROM toks GROUP BY tok
    HAVING count(*) * 40 > (SELECT count(*) FROM toks)
    ORDER BY freq DESC, tok
    """,
)
def q_heavy_tokens_mg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT frequent tokens above N/40 via the Misra-Gries candidate
    pass (operators/topk.py::heavy_hitters_mg): deterministic summary
    bound => the candidate set provably contains every true hitter
    under any partitioning (no margin contract), then one exact
    recount restricted to candidates. Integer threshold arithmetic
    (freq*40 > N) keeps the cut bit-identical to the SQL HAVING."""
    from .operators.topk import heavy_hitters_mg

    seq = sequences_from_documents(spark, sf_dir)
    return heavy_hitters_mg(seq, col="tokens", denom=40, capacity=64)


@register(
    "q_ngram_distinct",
    oracle=_SEQ_CTE
    + """
    SELECT doc_id, len(tokens) AS n_tok,
           len(list_distinct(list_transform(range(len(tokens) - 2),
               i -> CAST(tokens[i+1] AS BIGINT) * 2526168121 + CAST(tokens[i+2] AS BIGINT) * 50261 + tokens[i+3]))) AS distinct_3grams
    FROM sequences
    WHERE len(tokens) >= 3
    ORDER BY doc_id
    LIMIT 100
    """,
)
def q_ngram_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct within-row 3-gram count per doc (exact; n-gram key is a
    positional polynomial both engines compute identically in int64)."""
    seq = sequences_from_documents(spark, sf_dir)
    # key = t0 * 50261^2 + t1 * 50261 + t2 (50261 = first prime > vocab)
    grams = F.transform(
        F.sequence(F.lit(0), F.size("tokens") - 3),
        lambda i: F.element_at("tokens", i + 1).cast("long") * F.lit(2526168121).cast("long")
        + F.element_at("tokens", i + 2).cast("long") * 50261
        + F.element_at("tokens", i + 3).cast("long"),
    )
    return (
        seq.filter(F.size("tokens") >= 3)
        .select(
            "doc_id",
            F.col("n_tok"),
            F.size(F.array_distinct(grams)).alias("distinct_3grams"),
        )
        .orderBy("doc_id")
        .limit(100)
    )


# ===========================================================================
# Text analysis (cross-engine expressions => exact oracles)
# ===========================================================================


@register(
    "q_lang_distribution",
    oracle="SELECT lang, source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars "
    "FROM documents GROUP BY lang, source",
)
def q_lang_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    )


@register(
    "q_quality_scores",
    oracle=r"""
    SELECT doc_id,
           length(text) AS n_chars,
           len(list_filter(regexp_split_to_array(text, '\s+'), w -> w <> '')) AS n_tok,
           round(len(list_filter(list_filter(regexp_split_to_array(lower(text), '\s+'), w -> w <> ''),
                 w -> list_contains(['the','a','of','and','to','in','is','it','for','on'], w)))::DOUBLE
                 / len(list_filter(regexp_split_to_array(text, '\s+'), w -> w <> '')), 6) AS stopword_ratio,
           round(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE / length(text), 6) AS alpha_ratio
    FROM documents
    ORDER BY doc_id LIMIT 200
    """,
)
def q_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality features (subset that is exactly
    SQL-renderable in both engines)."""
    docs = load_table(spark, sf_dir, "documents")
    q = quality_exprs(F.col("text"))
    return (
        docs.select(
            "doc_id",
            q["n_chars"].alias("n_chars"),
            q["n_tok"].alias("n_tok"),
            q["stopword_ratio"].alias("stopword_ratio"),
            q["alpha_ratio"].alias("alpha_ratio"),
        )
        .orderBy("doc_id")
        .limit(200)
    )


@register(
    "q_lang_id",
    oracle=None,  # set below after duckdb_lang_id renders
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language ID vs the labeled lang column: confusion
    counts. Heuristic is deterministic and identically rendered in
    DuckDB (oracle pins the whole scoring pipeline)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.col("lang").alias("labeled"), lang_id_expr(F.col("text")).alias("predicted"))
        .groupBy("labeled", "predicted")
        .agg(F.count("*").alias("n_docs"))
    )


from .functions.text import duckdb_lang_id as _dd_lang  # noqa: E402

_ORACLES["q_lang_id"] = (
    "SELECT lang AS labeled, "
    + _dd_lang("text")
    + " AS predicted, count(*) AS n_docs FROM documents GROUP BY 1, 2"
)


@register(
    "q_doc_fingerprints",
    oracle="""
    SELECT prefix_fp, count(*) AS n_docs, min(doc_id) AS keep_doc_id
    FROM (SELECT doc_id, md5(substr(text, 1, 40)) AS prefix_fp FROM documents) t
    GROUP BY prefix_fp HAVING count(*) > 1
    """,
)
def q_doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-fingerprint dup groups (full-text md5 finds none in the
    synthetic corpus; 40-char prefixes collide, exercising the
    fingerprint-dedup shape with a non-empty result)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.md5(F.substring("text", 1, 40)).alias("prefix_fp"))
        .groupBy("prefix_fp")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("keep_doc_id"))
        .filter(F.col("n_docs") > 1)
    )


@register(
    "q_exact_dedup",
    oracle="""
    SELECT count(*) AS n_groups, CAST(sum(n_docs) AS BIGINT) AS n_docs,
           CAST(sum(n_docs - 1) AS BIGINT) AS n_redundant
    FROM (SELECT md5(text) AS fp, count(*) AS n_docs FROM documents GROUP BY 1) g
    """,
)
def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup summary over full-text fingerprints."""
    from .operators.dedup import exact_dedup_groups

    groups = exact_dedup_groups(load_table(spark, sf_dir, "documents"))
    return groups.agg(
        F.count("*").alias("n_groups"),
        F.sum("n_docs").cast("bigint").alias("n_docs"),
        F.sum(F.col("n_docs") - 1).cast("bigint").alias("n_redundant"),
    )


@register(
    "q_events_quantiles",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.5), 6) AS p50,
           round(quantile_cont(value, 0.9), 6) AS p90,
           round(quantile_cont(value, 0.99), 6) AS p99
    FROM events GROUP BY event_type
    """,
)
def q_events_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated quantiles (the KLL oracle companion)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
    )


@register(
    "q_ann_bruteforce",
    oracle="""
    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
           round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cosine
    FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
    WHERE a.vec_id IN (0, 7, 42, 99, 123)
    QUALIFY row_number() OVER (PARTITION BY a.vec_id
                               ORDER BY list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) DESC,
                                        b.vec_id) <= 5
    """,
)
def q_ann_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 neighbors for 5 query vectors; DuckDB oracle
    computes the identical double-precision cosine."""
    from .operators.similarity import ann_bruteforce_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return ann_bruteforce_topk(emb, [0, 7, 42, 99, 123], k=5).drop("rank")


# ===========================================================================
# Sketch queries (estimates: rows-only driver check; accuracy pinned
# in pytest against exact companions)
# ===========================================================================


def _bloom_profile_oracle() -> str:
    from .sketch import Shape
    from .sketch.bloom import _HEADER

    sh = Shape.for_np(n=200_000, p=1e-4)
    m, k = sh.m, sh.k
    a = repr(-(sh.m / sh.k))
    dense = sh.number_of_bytes()
    hdr = _HEADER.size
    return (
        _SEQ_CTE
        + f""",
tk AS (SELECT source, unnest(tokens) AS tok FROM sequences),
dk AS (SELECT DISTINCT source, CAST(tok AS UBIGINT) AS k FROM tk),
{_sm64_ctes('bs', 'SELECT k, source FROM dk', ', source')},
bits AS (SELECT DISTINCT source,
         (CAST(h1 % {m} AS BIGINT) + t.i * CAST(h2 % {m} AS BIGINT)) % {m}
             AS bit
         FROM bsh CROSS JOIN (SELECT unnest(range({k})) AS i) t),
pc AS (SELECT source, CAST(count(*) AS BIGINT) AS card
       FROM bits GROUP BY source),
{_hll_rows('bq', 'SELECT k, source FROM dk', 14, ', source')},
rg AS (SELECT source, idx, max(rank) AS r FROM bqr GROUP BY source, idx),
he AS ({_hll_est('rg', 'source')}),
ex AS (SELECT source, CAST(count(*) AS BIGINT) AS n_seqs,
              CAST(sum(len(tokens)) AS BIGINT) AS n_tokens
       FROM sequences GROUP BY source)
SELECT ex.source, ex.n_seqs, ex.n_tokens,
       ex.n_tokens AS bloom_n_items,
       pc.card AS bloom_bits,
       CASE WHEN pc.card = 0 THEN 0.0
            ELSE {a} * ln(1.0 - pc.card / {m}) END AS bloom_estimate_n,
       pc.card / CAST({m} AS DOUBLE) AS bloom_fill_ratio,
       CAST({hdr} + CASE WHEN 4 * pc.card < {dense} THEN 4 * pc.card
                         ELSE {dense} END AS BIGINT) AS bloom_bytes,
       he.est AS distinct_tokens_est
FROM ex
JOIN pc ON pc.source = ex.source
JOIN he ON he.source = ex.source
"""
    )


@register("q_bloom_source_profile", oracle=_bloom_profile_oracle())
def q_bloom_source_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: per-source exact counts + Bloom/HLL sketch metrics.
    FULLY oracle-backed (r5): the DuckDB oracle rebuilds every
    source's K-M bit set and HLL registers bit-for-bit
    (functions/sqlhash.py), so the popcount, the Swamidass-Baldi
    estimate, the fill ratio, the HLL distinct estimate AND the
    canonical wire size (header + sparse 4*bits vs dense, the
    corrected Shape.is_sparse rule) all hash-match cross-engine —
    the entry() flagship's semantics, bit-verified."""
    from .plans import token_profile

    return token_profile(spark, sequences_from_documents(spark, sf_dir))


@register(
    "q_salted_skew_build",
    oracle=f"""
    SELECT CASE WHEN CAST(doc_id AS BIGINT) % 5 < 4 THEN 'head' ELSE source END AS skew_key,
           CAST(sum(len({DUCKDB_TOKENIZE("text")})) AS BIGINT) AS n_tokens
    FROM documents
    GROUP BY 1
    """,
)
def q_salted_skew_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The north rule's explicit skew handling, driver-visible: 80% of
    documents collapse onto one 'head' key, then per-key Bloom sketches
    build through the SALTED two-level merge (groupBy(key, salt) then
    groupBy(key) — aggregate.build_by_key salt=4, plan shape gated in
    tests/test_plans.py). Per-key n_items is an exact occurrence count
    that must survive both merge levels, so the query hash-matches a
    plain SQL GROUP BY — correctness of the skew path, not just
    liveness. Hot-key row data never concentrates: stage 1 emits one
    sketch row per (partition, key), and the salt bounds any single
    merge task's fan-in."""
    from .operators.sketches import BlockedBloomSketch

    seq = sequences_from_documents(spark, sf_dir).withColumn(
        "skew_key",
        F.when(F.col("doc_id").cast("long") % 5 < 4, F.lit("head")).otherwise(
            F.col("source")
        ),
    )
    sk = BlockedBloomSketch.for_np(n=200_000, p=1e-3)
    keyed = sk.build_by_key(seq.select("skew_key", "tokens"), "skew_key", salt=4)
    return keyed.select(
        F.col("key").alias("skew_key"), F.col("n_items").alias("n_tokens")
    )


def _bloom_probe_oracle() -> str:
    from .sketch.blocked import _SALT, BlockedBloomFilter

    nb = BlockedBloomFilter.for_np(n=500_000, p=1e-4).n_blocks
    salts = ", ".join(f"({j}, {int(s)})" for j, s in enumerate(_SALT))
    return (
        _SEQ_CTE
        + f""",
tok AS (SELECT unnest(tokens) AS tok FROM sequences),
ins AS (SELECT DISTINCT CAST(tok AS UBIGINT) AS k FROM tok),
{_sm64_ctes('bi', 'SELECT k FROM ins')},
ibits AS (SELECT DISTINCT CAST((h1 >> 32) % {nb} AS BIGINT) AS block, s.j,
          CAST(((CAST(h1 % 4294967296 AS HUGEINT) * s.salt) % 4294967296)
               AS BIGINT) >> 27 AS bit
          FROM bih CROSS JOIN (VALUES {salts}) s(j, salt)),
{_sm64_ctes('bp',
                'SELECT CAST(tok AS UBIGINT) AS k, tok FROM '
                '(SELECT unnest(range(1000000, 1200000)) AS tok)',
                ', tok')},
pbits AS (SELECT tok, CAST((h1 >> 32) % {nb} AS BIGINT) AS block, s.j,
          CAST(((CAST(h1 % 4294967296 AS HUGEINT) * s.salt) % 4294967296)
               AS BIGINT) >> 27 AS bit
          FROM bph CROSS JOIN (VALUES {salts}) s(j, salt)),
fhits AS (SELECT p.tok FROM pbits p
          JOIN ibits i ON p.block = i.block AND p.j = i.j AND p.bit = i.bit
          GROUP BY p.tok HAVING count(*) = 8),
ni AS (SELECT CAST(sum(len(tokens)) AS BIGINT) AS n FROM sequences),
fh AS (SELECT CAST(count(*) AS BIGINT) AS false_hits FROM fhits)
SELECT ni.n AS n_inserted, ni.n AS present_hits, ni.n AS present_probes,
       fh.false_hits, CAST(200000 AS BIGINT) AS n_probes,
       round(fh.false_hits / CAST(200000 AS BIGINT), 8) AS observed_fpr
FROM ni CROSS JOIN fh
"""
    )


@register("q_bloom_probe", oracle=_bloom_probe_oracle())
def q_bloom_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a Bloom over all tokens, probe present + disjoint-domain
    tokens: (hits_present == n_present pins zero FN; fp_rate vs p).
    FULLY oracle-backed (r5): the DuckDB oracle rebuilds the Parquet
    split-block layout bit-for-bit — splitmix64 item hash
    (functions/sqlhash.py), block = (h >> 32) mod n_blocks, word-j bit
    = top-5 of (low32 * SALT_j) — and probes the same 200k disjoint
    ids, so the FALSE-POSITIVE count itself hash-matches cross-engine.
    The oracle renders present_hits as the exact occurrence total,
    which IS the zero-false-negative guarantee: any FN would break the
    driver's value hash."""
    from .operators.sketches import BlockedBloomSketch

    seq = sequences_from_documents(spark, sf_dir)
    sk = BlockedBloomSketch.for_np(n=500_000, p=1e-4)
    payload, n_items = sk.build_bytes(seq)
    hits, total = sk.count_contained(seq, payload, spark)
    probe_udf = sk.might_contain_udf(payload, spark)
    absent = spark.range(10**6, 10**6 + 200_000).select(
        F.col("id").cast("int").alias("tok")
    )
    fp = absent.select(probe_udf("tok").cast("long").alias("h")).agg(
        F.sum("h").alias("false_hits"), F.count("*").alias("n_probes")
    )
    return fp.select(
        F.lit(n_items).alias("n_inserted"),
        F.lit(hits).alias("present_hits"),
        F.lit(total).alias("present_probes"),
        "false_hits",
        "n_probes",
        F.round(F.col("false_hits") / F.col("n_probes"), 8).alias("observed_fpr"),
    )


def _hll_tokens_oracle() -> str:
    return (
        _SEQ_CTE
        + f""",
tk AS (SELECT source, unnest(tokens) AS tok FROM sequences),
dk AS (SELECT DISTINCT source, CAST(tok AS UBIGINT) AS k FROM tk),
{_hll_rows('hd', 'SELECT k, source FROM dk', 14, ', source')},
rg AS (SELECT source, idx, max(rank) AS r FROM hdr GROUP BY source, idx),
es AS ({_hll_est('rg', 'source')}),
ex AS (SELECT source, CAST(count(DISTINCT tok) AS BIGINT) AS distinct_exact
       FROM tk GROUP BY source)
SELECT ex.source, ex.distinct_exact, round(es.est, 2) AS distinct_est,
       round(abs(round(es.est, 2) - ex.distinct_exact) / ex.distinct_exact, 6)
           AS rel_err
FROM ex JOIN es ON ex.source = es.source
"""
    )


@register("q_hll_distinct_tokens", oracle=_hll_tokens_oracle())
def q_hll_distinct_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL distinct-token estimates per source next to exact counts.
    FULLY oracle-backed: the DuckDB oracle rebuilds each source's
    registers bit-for-bit from the parity tokenizer's ids (splitmix64
    + exact clz CTEs, functions/sqlhash.py) and runs the same
    estimator, so distinct_est itself hash-matches; 2-dp rounding
    absorbs summation-order ulps."""
    from .operators.sketches import HllSketch
    from .sketch import HyperLogLog

    seq = sequences_from_documents(spark, sf_dir)
    keyed = HllSketch(p=14).build_by_key(seq, "source")

    def stats(batches):
        import pyarrow as pa

        for b in batches:
            pdf = b.to_pandas()
            # explicit types: from_pandas over zero-row / object columns
            # infers null type and breaks the declared schema at read
            # time (CLAUDE.md mapInArrow rule)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(pdf["key"].tolist(), type=pa.string()),
                    pa.array(
                        [
                            round(HyperLogLog.from_bytes(bytes(p)).estimate(), 2)
                            for p in pdf["payload"]
                        ],
                        type=pa.float64(),
                    ),
                ],
                names=["source", "distinct_est"],
            )

    est = keyed.mapInArrow(stats, schema="source string, distinct_est double")
    exact = (
        seq.select("source", F.explode("tokens").alias("tok"))
        .groupBy("source")
        .agg(F.countDistinct("tok").alias("distinct_exact"))
    )
    return exact.join(est, "source").withColumn(
        "rel_err",
        F.round(F.abs(F.col("distinct_est") - F.col("distinct_exact")) / F.col("distinct_exact"), 6),
    )


def _cms_top_oracle() -> str:
    return (
        _SEQ_CTE
        + f""",
tk AS (SELECT unnest(tokens) AS tok FROM sequences),
ex AS (SELECT tok, CAST(count(*) AS BIGINT) AS freq_exact FROM tk
       GROUP BY tok ORDER BY freq_exact DESC, tok LIMIT 20),
{_cms_ctes('ct', 'SELECT CAST(tok AS UBIGINT) AS k FROM tk', 5, 32768)},
{_sm64_ctes('pt', 'SELECT CAST(tok AS UBIGINT) AS k, tok FROM ex', ', tok')},
pcols AS (SELECT tok, t.r,
          (CAST(h1 % 32768 AS BIGINT) + t.r * CAST(h2 % 32768 AS BIGINT))
              % 32768 AS col
          FROM pth CROSS JOIN (SELECT unnest(range(5)) AS r) t),
pest AS (SELECT p.tok, CAST(min(COALESCE(c.c, 0)) AS BIGINT) AS freq_est
         FROM pcols p LEFT JOIN ctcnt c ON c.r = p.r AND c.col = p.col
         GROUP BY p.tok)
SELECT ex.tok, ex.freq_exact, pest.freq_est FROM ex JOIN pest ON ex.tok = pest.tok
"""
    )


@register("q_cms_top_tokens", oracle=_cms_top_oracle())
def q_cms_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CMS frequency estimates for the exact top-20 tokens: estimate
    must be >= exact (one-sided CMS guarantee), small overestimate.
    FULLY oracle-backed: the DuckDB oracle rebuilds the d x w CMS
    table cell-for-cell (splitmix64 CTEs, functions/sqlhash.py) and
    probes the same min-over-rows cells, so freq_est hash-matches."""
    import numpy as np

    from .operators.sketches import CmsSketch

    seq = sequences_from_documents(spark, sf_dir)
    exact = (
        seq.select(F.explode("tokens").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("freq_exact"))
        .orderBy(F.desc("freq_exact"), "tok")
        .limit(20)
    )
    cs = CmsSketch(d=5, w=1 << 15)
    payload, _ = cs.build_bytes(seq)
    rows = exact.collect()
    toks = np.array([r["tok"] for r in rows], dtype=np.int64)
    est = cs.estimate_counts(payload, toks)
    out = [
        (int(t), int(r["freq_exact"]), int(e))
        for t, r, e in zip(toks, rows, est)
    ]
    return spark.createDataFrame(out, "tok int, freq_exact bigint, freq_est bigint")


_KLLQ_ORACLE = "\nUNION ALL\n".join(
    f"SELECT CAST({q} AS DOUBLE) AS q,"
    f" round(CAST(quantile_cont(value, {q}) AS DOUBLE), 6) AS exact,"
    f" 1 AS kll_in_bound FROM events"
    for q in (0.1, 0.5, 0.9, 0.99)
)


@register("q_kll_quantiles", oracle=_KLLQ_ORACLE)
def q_kll_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KLL quantile estimates for events.value, certified against
    exact. Oracle-backed via the in-bound-flag pattern
    (q_kll_ntok_by_source precedent): KLL payloads are merge-order-
    dependent so raw estimates can't hash-match cross-engine; instead
    the exact quantiles hash-match and each estimate must land between
    the exact quantile values at q ± 3x the published rank-error bound
    — the oracle emits literal 1s, so an accuracy regression under any
    partitioning fails the driver's value hash."""
    from .operators.sketches import KllQuantiles
    from .sketch.kll import KLLSketch

    eps3 = 3.0 * KLLSketch(200).rank_error()
    ev = load_table(spark, sf_dir, "events")
    qs = [0.1, 0.5, 0.9, 0.99]
    est = KllQuantiles(k=200, col="value").quantiles(ev, qs)
    bounds = ev.agg(
        *[F.expr(f"percentile(value, {q})").alias(f"p{i}") for i, q in enumerate(qs)],
        *[
            F.expr(f"percentile(value, {max(q - eps3, 0.0)!r})").alias(f"lo{i}")
            for i, q in enumerate(qs)
        ],
        *[
            F.expr(f"percentile(value, {min(q + eps3, 1.0)!r})").alias(f"hi{i}")
            for i, q in enumerate(qs)
        ],
    ).collect()[0]
    rows = [
        (
            q,
            round(float(bounds[f"p{i}"]), 6),
            1 if bounds[f"lo{i}"] <= est[i] <= bounds[f"hi{i}"] else 0,
        )
        for i, q in enumerate(qs)
    ]
    return spark.createDataFrame(rows, "q double, exact double, kll_in_bound int")


# ===========================================================================
# Dedup / similarity (LSH candidates: rows-only; exactness pinned in tests)
# ===========================================================================


def _minhash_ctes(prefix: str, seq_rel: str) -> str:
    """CTE chain rebuilding the MinHash LSH pipeline over a relation
    ``seq_rel`` with (doc_id VARCHAR, tokens array<int>): 3-gram
    positional-mix + splitmix64 shingle hashes, the 128 affine perms
    mod the Mersenne prime in the same uint64 wrap order as
    minhash_signatures, per-doc signature minima (empty docs -> all-M
    signatures), banded candidates via band-slice equality (equivalent
    to the xxhash64 bucket join up to 2^-64 collisions). Final CTE
    ``<prefix>mt`` exposes (doc_a, doc_b, ej) — every band-sharing
    pair with its exact matching-perm Jaccard estimate; callers apply
    their own threshold."""
    from .operators.dedup import _MERSENNE, _perm_coeffs
    from .sketch.hashing import _NGRAM_MULS

    a, b = _perm_coeffs(128)
    perms = ", ".join(
        f"({i}, {int(a[i])}::UBIGINT, {int(b[i])}::UBIGINT)" for i in range(128)
    )
    m1, m2, m3 = (int(x) for x in _NGRAM_MULS[:3])
    mod64 = 1 << 64
    mers = _MERSENNE
    acc = (
        f"CAST((CAST(tokens[i+1] AS HUGEINT) * {m1}"
        f" + CAST(tokens[i+2] AS HUGEINT) * {m2}"
        f" + CAST(tokens[i+3] AS HUGEINT) * {m3}) % {mod64} AS UBIGINT)"
    )
    # v = ((h * a) mod 2^64 + b) mod 2^64, then mod the Mersenne prime —
    # the numpy uint64 wrap order in minhash_signatures
    ha = (
        f"CAST(((CAST(h AS HUGEINT) % 4294967296) * p.a"
        f" + (((CAST(h AS HUGEINT) // 4294967296) * p.a) % 4294967296)"
        f" * 4294967296) % {mod64} AS UBIGINT)"
    )
    v = f"CAST((CAST({ha} AS HUGEINT) + p.b) % {mod64} AS UBIGINT) % {mers}"
    x = prefix
    return f"""{x}sh AS (SELECT doc_id,
       unnest(list_transform(range(greatest(len(tokens) - 2, 0)),
                             i -> {acc})) AS acc
       FROM {seq_rel}),
{_sm64_ctes(x + 'q', f'SELECT acc AS k, doc_id FROM {x}sh', ', doc_id')},
{x}hv AS (SELECT doc_id, h1 AS h FROM {x}qh),
{x}pv AS (SELECT doc_id, p.i, {v} AS v
       FROM {x}hv CROSS JOIN (VALUES {perms}) p(i, a, b)),
{x}sg AS (SELECT doc_id, i, min(v) AS s FROM {x}pv GROUP BY doc_id, i),
{x}grid AS (SELECT d.doc_id, p.i FROM (SELECT doc_id FROM {seq_rel}) d
         CROSS JOIN (SELECT unnest(range(128)) AS i) p),
{x}sigf AS (SELECT g.doc_id, g.i, COALESCE(s.s, {mers}::UBIGINT) AS s
         FROM {x}grid g LEFT JOIN {x}sg s ON s.doc_id = g.doc_id AND s.i = g.i),
{x}bb AS (SELECT doc_id, i // 4 AS band,
              string_agg(CAST(s AS VARCHAR), ',' ORDER BY i) AS key
       FROM {x}sigf GROUP BY doc_id, i // 4),
{x}cand AS (SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
         FROM {x}bb l JOIN {x}bb r ON l.band = r.band AND l.key = r.key
                            AND l.doc_id < r.doc_id),
{x}mt AS (SELECT c.doc_a, c.doc_b,
              sum(CASE WHEN sa.s = sb.s THEN 1 ELSE 0 END) / 128.0 AS ej
       FROM {x}cand c
       JOIN {x}sigf sa ON sa.doc_id = c.doc_a
       JOIN {x}sigf sb ON sb.doc_id = c.doc_b AND sb.i = sa.i
       GROUP BY c.doc_a, c.doc_b)"""


def _minhash_oracle() -> str:
    return (
        _SEQ_CTE
        + f""",
{_minhash_ctes('m', 'sequences')}
SELECT doc_a, doc_b, ej AS est_jaccard FROM mmt WHERE ej >= 0.35
"""
    )


@register("q_minhash_near_dups", oracle=_minhash_oracle())
def q_minhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidate pairs over the corpus (word
    3-gram shingles, 128 perms, 32 bands). FULLY oracle-backed (r5):
    minhash is deterministic end-to-end — 3-gram positional-mix +
    splitmix64 shingle hashes, affine perms mod the Mersenne prime in
    the same uint64 wrap order, per-doc minima — so the DuckDB oracle
    rebuilds every signature bit-for-bit; band membership is rendered
    as band-SLICE equality (Spark buckets by xxhash64 of the slice,
    which partitions docs identically to slice equality up to 2^-64
    collisions), and est_jaccard = matching-perm fraction is exact
    dyadic arithmetic. The LSH candidate SET and its scores
    hash-match cross-engine."""
    from .operators.dedup import minhash_dedup

    seq = sequences_from_documents(spark, sf_dir)
    return minhash_dedup(seq, threshold=0.35).orderBy("doc_a", "doc_b")


def _simhash_oracle() -> str:
    bitw = ", ".join(f"({b}, {1 << b}::HUGEINT)" for b in range(64))
    return (
        _SEQ_CTE
        + f""",
tk AS (SELECT doc_id, unnest(tokens) AS tok FROM sequences),
{_sm64_ctes('sx', 'SELECT CAST(tok AS UBIGINT) AS k, doc_id FROM tk', ', doc_id')},
hb AS (SELECT doc_id, h1 AS h FROM sxh),
bt AS (SELECT doc_id, b.b,
              sum(CASE WHEN (h >> CAST(b.b AS INTEGER)) & 1 = 1
                       THEN 1 ELSE -1 END) AS s
       FROM hb CROSS JOIN (SELECT unnest(range(64)) AS b) b
       GROUP BY doc_id, b.b),
sigx AS (SELECT doc_id, sum(CASE WHEN s > 0 THEN p.w ELSE 0::HUGEINT END) AS x
         FROM bt JOIN (VALUES {bitw}) p(b, w) ON p.b = bt.b
         GROUP BY doc_id),
sg AS (SELECT doc_id,
              CASE WHEN x >= 9223372036854775808
                   THEN CAST(x - 18446744073709551616 AS BIGINT)
                   ELSE CAST(x AS BIGINT) END AS sh
       FROM sigx),
allsig AS (SELECT d.doc_id, COALESCE(s.sh, 0) AS sh
           FROM (SELECT doc_id FROM sequences) d
           LEFT JOIN sg s ON s.doc_id = d.doc_id)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.sh, b.sh)) AS hamming
FROM allsig a JOIN allsig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sh, b.sh)) <= 3
"""
    )


@register("q_simhash_near_dups", oracle=_simhash_oracle())
def q_simhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash Hamming-ball near-dups. FULLY oracle-backed (r5): the
    64-bit sign-sum signature is a pure function of the token-hash
    multiset (splitmix64 bits, ±1 sums, sign per bit — the
    unpack/pack byte-order gymnastics in simhash_signatures cancel,
    leaving simhash bit b = sign of the bit-b sum), so the DuckDB
    oracle rebuilds every signature bit-for-bit. The multi-block
    pigeonhole guarantees the candidate join loses NO pair within the
    radius, so the verified output equals the plain all-pairs
    Hamming-<=3 set the oracle computes — LSH recall = 1 by
    construction, now cross-engine verified."""
    from .operators.dedup import simhash_near_dups, simhash_signatures

    seq = sequences_from_documents(spark, sf_dir)
    return simhash_near_dups(simhash_signatures(seq), max_hamming=3).orderBy(
        "doc_a", "doc_b"
    )


@register("q_embedding_near_dups")
def q_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import embedding_near_dups

    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_near_dups(emb, threshold=0.35, n_planes=16, bands=8).orderBy(
        "id_a", "id_b"
    )


@register(
    "q_embedding_near_dups_exact",
    oracle="""
    SELECT id_a, id_b, cosine FROM (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cosine
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    ) t WHERE cosine >= 0.35
    """,
)
def q_embedding_near_dups_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact all-pairs cosine >= threshold — the hash-matched oracle
    companion of q_embedding_near_dups (whose LSH candidates are not
    SQL-expressible). Quadratic by definition: the small-corpus
    baseline; embedding_near_dups is the bucketed scale path."""
    from .operators.dedup import _cosine_expr

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select(
        F.col("vec_id").alias("id"), F.col("embedding").cast("array<double>").alias("v")
    )
    a = base.select(F.col("id").alias("id_a"), F.col("v").alias("va"))
    b = base.select(F.col("id").alias("id_b"), F.col("v").alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(_cosine_expr(F.col("va"), F.col("vb")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= 0.35)
    )


@register("q_ann_lsh")
def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.similarity import ann_lsh_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return ann_lsh_topk(emb, [0, 7, 42, 99, 123], k=5, n_planes=16, bands=8)


@register("q_media_features")
def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: deterministic fake media -> feature
    extraction (decode stubbed; Spark machinery real)."""
    from .operators.multimodal import extract_features, synthetic_media

    media = synthetic_media(spark, 200)
    feats = extract_features(media)
    return feats.groupBy("kind").agg(
        F.count("*").alias("n_media"),
        F.round(F.avg(F.element_at("feature", 1)), 6).alias("avg_f0"),
        F.sum("n_bytes").alias("total_bytes"),
    )


@register("q_ann_ivf")
def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN (coarse spherical-k-means quantizer, nprobe inverted
    lists, exact re-rank): recall vs brute force pinned in pytest;
    nprobe == n_centroids degenerates to the exact result."""
    from .operators.similarity import ann_ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return ann_ivf_topk(emb, [0, 7, 42, 99, 123], k=5, n_centroids=16, nprobe=8)


@register("q_media_stats")
def q_media_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL media decode, distributed: WAV (PCM16), BMP (24-bit), PNG
    (zlib inflate), and baseline JPEG (pure-numpy huffman + IDCT,
    jpeg.py) payloads are decoded inside mapInArrow — ids ≡ 1 (mod 8)
    in the synthetic table are 4:2:0 JPEGs, so this query exercises the
    lossy compressed path end to end. Per-kind aggregate of real
    audio/image statistics. (MP3/MP4 container parsing lives in
    q_container_stats / q_mp4_frame_plan; their codec-payload decode
    stays stubbed — ffmpeg absent.)"""
    from .operators.multimodal import media_stats, synthetic_real_media

    stats = media_stats(synthetic_real_media(spark, 120))
    return stats.groupBy("kind").agg(
        F.count("*").alias("n_media"),
        F.round(F.avg("rms"), 4).alias("avg_rms"),
        F.round(F.avg("zero_cross_rate"), 4).alias("avg_zcr"),
        F.round(F.avg("duration_ms"), 4).alias("avg_duration_ms"),
        F.round(F.avg("width"), 4).alias("avg_width"),
        F.round(F.avg("mean_g"), 4).alias("avg_mean_g"),
        F.sum("n_bytes").alias("total_bytes"),
    )


@register(
    "q_mp4_frame_plan",
    oracle="""
    WITH vids AS (
      SELECT i AS media_id,
             CAST(24 + (i % 40) AS BIGINT) AS n_frames,
             CAST(20 + (i % 5) * 10 AS BIGINT) AS delta_ms
      FROM range(0, 90) t(i) WHERE i % 3 <> 2
    ),
    frames AS (
      SELECT v.media_id, v.delta_ms, g.j AS frame_idx,
             CAST(200 + ((v.media_id*31 + g.j*17) % 512) AS BIGINT) AS byte_len,
             CAST(32 + COALESCE(SUM(200 + ((v.media_id*31 + g.j*17) % 512))
                OVER (PARTITION BY v.media_id ORDER BY g.j
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS byte_off
      FROM vids v, LATERAL (SELECT unnest(generate_series(0, v.n_frames - 1)) AS j) g
    ),
    ticks AS (
      SELECT v.media_id, g.tick_ms
      FROM vids v, LATERAL (
        SELECT unnest(generate_series(0, v.n_frames * v.delta_ms - 1, 250)) AS tick_ms
      ) g
    )
    SELECT t.media_id, t.tick_ms, f.frame_idx,
           f.frame_idx * f.delta_ms AS frame_ts_ms, f.byte_off, f.byte_len
    FROM ticks t JOIN frames f
      ON f.media_id = t.media_id AND f.frame_idx = t.tick_ms // f.delta_ms
    """,
)
def q_mp4_frame_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL MP4 container parsing with an arithmetic cross-check: the
    synthetic video table's payloads are structurally valid ISO BMFF
    files whose sample tables (stts/stsc/stsz/stco) are closed-form
    functions of the id. Spark PARSES THE BYTES (operators.containers)
    and emits a ranged-read frame-sampling plan — one row per 250 ms
    tick with the covering frame's absolute byte range — while the
    DuckDB oracle re-derives the identical rows from the closed form
    without touching a byte. A hash match proves the box walker,
    chunk-offset expansion, and timestamp math end to end. At 100 TB
    this plan is what turns "decode every video" into "ranged-read only
    the sampled frames"."""
    from .operators.multimodal import frame_sample_plan_bytes, synthetic_video_media

    media = synthetic_video_media(spark, 90)
    return frame_sample_plan_bytes(media, every_ms=250)


@register(
    "q_container_stats",
    oracle="""
    SELECT i AS media_id,
           CASE WHEN i % 3 = 2 THEN 'mp3' ELSE 'mp4' END AS container,
           CASE WHEN i % 3 = 2 THEN 'mp3' ELSE 'avc1' END AS codec,
           CAST(CASE WHEN i % 3 = 2 THEN 20 + (i % 30)
                     ELSE 24 + (i % 40) END AS BIGINT) AS n_frames,
           CASE WHEN i % 3 = 2
                THEN round((20 + (i % 30)) * 1152 * 1000.0 / 44100, 6)
                ELSE CAST((24 + (i % 40)) * (20 + (i % 5) * 10) AS DOUBLE)
           END AS duration_ms,
           CAST(CASE WHEN i % 3 = 2 THEN 44100 END AS INTEGER) AS sample_rate,
           CAST(CASE WHEN i % 3 <> 2 THEN 160 + (i % 4) * 80 END AS INTEGER) AS width,
           CAST(CASE WHEN i % 3 <> 2 THEN 120 + (i % 3) * 60 END AS INTEGER) AS height
    FROM range(0, 90) t(i)
    """,
)
def q_container_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-media container metadata, no sample decode: MP4 box-tree
    walk (mvhd/tkhd/mdhd/stsd + sample tables) and MPEG-1 Layer III
    frame-header walk (bitrate/samplerate tables, ID3v2 skip), both
    pure byte-structure parsers in operators.containers. The oracle
    re-derives every field from the generator's closed form — a hash
    match pins frame counts, durations (exact integer-sample
    arithmetic), dimensions, and codec fourcc extraction."""
    from .operators.multimodal import container_stats, synthetic_video_media

    return container_stats(synthetic_video_media(spark, 90))


@register(
    "q_video_near_dups",
    oracle="""
    SELECT i AS media_a,
           i + 100 AS media_b,
           CAST(((24 + (i % 40)) * (20 + (i % 5) * 10) - 1) // 250 + 1 AS BIGINT)
             AS n_common_frames
    FROM range(0, 60) t(i) WHERE i % 3 <> 2
    """,
)
def q_video_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video near-duplicate detection by sampled-frame CONTENT hashes,
    hash-matched: each synthetic MP4 is unioned with an exact copy
    under media_id+100, frames are sampled every 250 ms, their byte
    ranges sliced out of mdat via the parsed sample tables and
    md5-hashed, and pairs sharing >= 2 frame hashes are emitted. Every
    (i, i+100) pair must appear with n_common_frames equal to the
    closed-form sampling-tick count — and NO cross-video pair may
    appear. Cross-video distinctness is a VERIFIED property of the
    generator, not a construction guarantee: the filler is
    position-derived, so two videos sharing a frame at the same
    (offset, length) would hash equal — tests/test_containers.py::
    test_synthetic_videos_have_distinct_frames pins that the sizes
    formula never aligns two ids' frames, so a formula tweak fails in
    pytest rather than as a confusing oracle mismatch here. The
    oracle catches spurious collisions or a candidate-generation bug.
    The video analogue of MinHash-LSH text
    dedup: candidates meet only inside a frame-hash bucket, no
    all-pairs work, only 3-column rows shuffle."""
    from .operators.multimodal import frame_hash_near_dups, synthetic_video_media

    # video rows only: sampled_frame_hashes also handles MP3 audio (the
    # retagged-copy dedup case, pinned in pytest), which would add
    # audio pairs this oracle's closed form does not model
    m = synthetic_video_media(spark, 60).filter(F.col("kind") == "video")
    copies = m.withColumn("media_id", F.col("media_id") + F.lit(100))
    return frame_hash_near_dups(m.unionByName(copies), every_ms=250, min_common=2)


@register(
    "q_source_overlap_exact",
    oracle=_SEQ_CTE
    + """
    SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_common_tokens
    FROM (SELECT DISTINCT source, unnest(tokens) AS tok FROM sequences) a
    JOIN (SELECT DISTINCT source, unnest(tokens) AS tok FROM sequences) b
      ON a.tok = b.tok AND a.source < b.source
    GROUP BY 1, 2 ORDER BY 1, 2 LIMIT 50
    """,
)
def q_source_overlap_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct-token overlap between source pairs — the exact
    companion of the Bloom intersection estimator."""
    seq = sequences_from_documents(spark, sf_dir)
    d = seq.select("source", F.explode("tokens").alias("tok")).distinct()
    a = d.alias("a")
    b = d.alias("b")
    return (
        a.join(b, (F.col("a.tok") == F.col("b.tok")) & (F.col("a.source") < F.col("b.source")))
        .groupBy(F.col("a.source").alias("source_a"), F.col("b.source").alias("source_b"))
        .agg(F.count("*").alias("n_common_tokens"))
        .orderBy("source_a", "source_b")
        .limit(50)
    )


def _overlap_bloom_oracle() -> str:
    from .sketch import Shape

    sh = Shape.for_np(n=200_000, p=1e-4)
    m, k = sh.m, sh.k
    a = repr(-(sh.m / sh.k))  # same eval order as Shape.estimate_n
    return (
        _SEQ_CTE
        + f""",
tk AS (SELECT source, unnest(tokens) AS tok FROM sequences),
dk AS (SELECT DISTINCT source, CAST(tok AS UBIGINT) AS k FROM tk
       WHERE source IS NOT NULL),
{_sm64_ctes('ob', 'SELECT k, source FROM dk', ', source')},
bits AS (SELECT DISTINCT source,
         (CAST(h1 % {m} AS BIGINT) + t.i * CAST(h2 % {m} AS BIGINT)) % {m}
             AS bit
         FROM obh CROSS JOIN (SELECT unnest(range({k})) AS i) t),
pcx AS (SELECT source, CAST(count(*) AS BIGINT) AS c FROM bits GROUP BY source),
srcs AS (SELECT DISTINCT source FROM sequences WHERE source IS NOT NULL),
pc AS (SELECT s.source, COALESCE(p.c, 0) AS c
       FROM srcs s LEFT JOIN pcx p ON p.source = s.source),
pairs AS (SELECT a.source AS sa, b.source AS sb
          FROM pc a JOIN pc b ON a.source < b.source),
inter AS (SELECT x.source AS sa, y.source AS sb,
                 CAST(count(*) AS BIGINT) AS ci
          FROM bits x JOIN bits y ON x.bit = y.bit AND x.source < y.source
          GROUP BY x.source, y.source),
cards AS (SELECT p.sa, p.sb, pa.c AS ca, pb.c AS cb,
                 pa.c + pb.c - COALESCE(i.ci, 0) AS cu
          FROM pairs p
          JOIN pc pa ON pa.source = p.sa
          JOIN pc pb ON pb.source = p.sb
          LEFT JOIN inter i ON i.sa = p.sa AND i.sb = p.sb)
SELECT sa AS source_a, sb AS source_b,
       CASE WHEN ca = 0 THEN 0.0
            ELSE round({a} * ln(1.0 - ca / {m}), 2) END AS est_distinct_a,
       CASE WHEN cb = 0 THEN 0.0
            ELSE round({a} * ln(1.0 - cb / {m}), 2) END AS est_distinct_b,
       CASE WHEN cu = 0 THEN 0.0
            ELSE round({a} * ln(1.0 - cu / {m}), 2) END AS est_union,
       round(CASE WHEN ca = 0 THEN 0.0 ELSE {a} * ln(1.0 - ca / {m}) END
             + CASE WHEN cb = 0 THEN 0.0 ELSE {a} * ln(1.0 - cb / {m}) END
             - CASE WHEN cu = 0 THEN 0.0 ELSE {a} * ln(1.0 - cu / {m}) END,
             2) AS est_intersection
FROM cards ORDER BY source_a, source_b LIMIT 50
"""
    )


@register("q_source_overlap_bloom", oracle=_overlap_bloom_oracle())
def q_source_overlap_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom union/intersection estimates per source pair (reference
    estimators mod.rs:38-54 as a distributed query); accuracy vs the
    exact companion is pinned in tests. FULLY oracle-backed (r5): the
    DuckDB oracle rebuilds every source's K-M bit set exactly
    (splitmix64 pair + (h1 + i*h2) mod m, functions/sqlhash.py),
    popcounts unions by inclusion-exclusion on bit overlap, and
    applies the same Swamidass-Baldi estimator -(m/k)*ln(1-c/m) — so
    the reference's estimate_n / estimate_union /
    estimate_intersection OUTPUTS hash-match cross-engine."""
    from .plans import source_overlap
    from .sketch import Shape

    seq = sequences_from_documents(spark, sf_dir)
    return source_overlap(spark, seq, shape=Shape.for_np(n=200_000, p=1e-4)).orderBy(
        "source_a", "source_b"
    ).limit(50)


def _overlap_hll_oracle() -> str:
    pair_est = _hll_est("urg", "sa, sb", 14)
    src_est = _hll_est("rg", "source", 14)
    return (
        _SEQ_CTE
        + f""",
tk AS (SELECT source, unnest(tokens) AS tok FROM sequences),
dk AS (SELECT DISTINCT source, CAST(tok AS UBIGINT) AS k FROM tk
       WHERE source IS NOT NULL),
{_hll_rows('oh', 'SELECT k, source FROM dk', 14, ', source')},
rg AS (SELECT source, idx, max(rank) AS r FROM ohr GROUP BY source, idx),
sex AS ({src_est}),
srcs AS (SELECT DISTINCT source FROM sequences WHERE source IS NOT NULL),
se AS (SELECT s.source, COALESCE(x.est, 0.0) AS est
       FROM srcs s LEFT JOIN sex x ON x.source = s.source),
pairs AS (SELECT a.source AS sa, b.source AS sb
          FROM se a JOIN se b ON a.source < b.source),
urg AS (SELECT p.sa, p.sb, r.idx, max(r.r) AS r
        FROM pairs p JOIN rg r ON r.source = p.sa OR r.source = p.sb
        GROUP BY p.sa, p.sb, r.idx),
uex AS ({pair_est}),
ue AS (SELECT p.sa, p.sb, COALESCE(x.est, 0.0) AS est
       FROM pairs p LEFT JOIN uex x ON x.sa = p.sa AND x.sb = p.sb)
SELECT p.sa AS source_a, p.sb AS source_b,
       round(ea.est, 2) AS est_distinct_a,
       round(eb.est, 2) AS est_distinct_b,
       round(u.est, 2) AS est_union,
       round(greatest(0.0, ea.est + eb.est - u.est), 2) AS est_intersection
FROM pairs p
JOIN se ea ON ea.source = p.sa
JOIN se eb ON eb.source = p.sb
JOIN ue u ON u.sa = p.sa AND u.sb = p.sb
ORDER BY source_a, source_b LIMIT 50
"""
    )


@register("q_source_overlap_hll", oracle=_overlap_hll_oracle())
def q_source_overlap_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL-based source-pair overlap (register-max union + inclusion-
    exclusion intersection): 16 KB per key vs the Bloom variant's m/8
    bytes; accuracy vs q_source_overlap_exact pinned in pytest. FULLY
    oracle-backed (r5): the DuckDB oracle rebuilds per-source
    registers bit-for-bit, takes the same register-wise max for each
    pair union (the union sketch IS the sketch of the union), and
    runs the same Flajolet estimator — estimates hash-match at 2 dp
    cross-engine (functions/sqlhash.py)."""
    from .plans import source_overlap

    seq = sequences_from_documents(spark, sf_dir)
    return source_overlap(spark, seq, sketch="hll").orderBy("source_a", "source_b").limit(50)


@register("q_bloom_doc_ids")
def q_bloom_doc_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom over doc_ids (strings hashed JVM-side with xxhash64 — the
    north star's 'token n-grams and doc_ids'): zero FN on every present
    id, FPR on a disjoint probe set."""
    from .operators.sketches import BlockedBloomSketch

    seq = sequences_from_documents(spark, sf_dir)
    hashed = seq.select(F.xxhash64("doc_id").alias("h"))
    sk = BlockedBloomSketch.for_np(n=100_000, p=1e-4, col="h", scalar=True)
    payload, n = sk.build_bytes(hashed)
    hits, total = sk.count_contained(hashed, payload, spark)
    absent = spark.range(10**7, 10**7 + 100_000).select(
        F.xxhash64(F.concat(F.lit("absent-"), F.col("id"))).alias("h")
    )
    fp_hits, fp_total = sk.count_contained(absent, payload, spark)
    return spark.createDataFrame(
        [(n, hits, total, fp_hits, fp_total, round(fp_hits / fp_total, 8))],
        "n_inserted bigint, present_hits bigint, present_probes bigint, "
        "false_hits bigint, n_probes bigint, observed_fpr double",
    )


def _sharded_bloom_oracle() -> str:
    import numpy as np

    from .operators.sharded import SHARD_SALT
    from .sketch.blocked import _SALT, BlockedBloomFilter

    nb = BlockedBloomFilter.for_np(
        n=max(1, int(np.ceil(500_000 / 16))), p=1e-4
    ).n_blocks
    m_bits = nb * 256
    salts = ", ".join(f"({j}, {int(s)})" for j, s in enumerate(_SALT))
    ss = int(SHARD_SALT)
    return (
        _SEQ_CTE
        + f""",
tok AS (SELECT unnest(tokens) AS tok FROM sequences),
dtok AS (SELECT DISTINCT CAST(tok AS UBIGINT) AS k FROM tok),
{_sm64_ctes('sb', 'SELECT k FROM dtok')},
hs AS (SELECT h1 AS h FROM sbh),
{_sm64_ctes('sr', f'SELECT xor(h, {ss}::UBIGINT) AS k, h FROM hs', ', h')},
hr AS (SELECT h, CAST(h1 % 16 AS BIGINT) AS shard FROM srh),
ibits AS (SELECT DISTINCT shard, CAST((h >> 32) % {nb} AS BIGINT) AS block,
          s.j,
          CAST(((CAST(h % 4294967296 AS HUGEINT) * s.salt) % 4294967296)
               AS BIGINT) >> 27 AS bit
          FROM hr CROSS JOIN (VALUES {salts}) s(j, salt)),
fill AS (SELECT shard, round(count(*) / CAST({m_bits} AS DOUBLE), 8) AS fr
         FROM ibits GROUP BY shard),
ap AS (SELECT unnest(range(100000000, 100100000)) AS v),
{_sm64_ctes('pb', 'SELECT CAST(v AS UBIGINT) AS k FROM ap')},
ph AS (SELECT h1 AS h FROM pbh),
{_sm64_ctes('pr', f'SELECT xor(h, {ss}::UBIGINT) AS k, h FROM ph', ', h')},
phr AS (SELECT h, CAST(h1 % 16 AS BIGINT) AS shard FROM prh),
pbits AS (SELECT h, shard, CAST((h >> 32) % {nb} AS BIGINT) AS block, s.j,
          CAST(((CAST(h % 4294967296 AS HUGEINT) * s.salt) % 4294967296)
               AS BIGINT) >> 27 AS bit
          FROM phr CROSS JOIN (VALUES {salts}) s(j, salt)),
fhits AS (SELECT p.h FROM pbits p
          JOIN ibits i ON p.shard = i.shard AND p.block = i.block
                       AND p.j = i.j AND p.bit = i.bit
          GROUP BY p.h HAVING count(*) = 8),
ni AS (SELECT CAST(sum(len(tokens)) AS BIGINT) AS n FROM sequences),
fh AS (SELECT CAST(count(*) AS BIGINT) AS false_hits FROM fhits)
SELECT (SELECT CAST(count(DISTINCT shard) AS BIGINT) FROM hr) AS n_shards,
       ni.n AS n_inserted,
       round((SELECT max(fr) FROM fill), 8) AS max_fill,
       ni.n AS present_hits, ni.n AS present_probes,
       fh.false_hits, CAST(100000 AS BIGINT) AS n_probes,
       round(fh.false_hits / CAST(100000 AS BIGINT), 8) AS observed_fpr
FROM ni CROSS JOIN fh
"""
    )


@register("q_sharded_bloom", oracle=_sharded_bloom_oracle())
def q_sharded_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sharded blocked-Bloom membership (operators/sharded.py) — the
    scale path for filters too big for one task at 10^12 tokens. Builds
    via the routed plan (token hashes shuffled once by shard, per-task
    memory = one partition's shard filters), probes every corpus token
    (zero FN asserted) plus a disjoint domain (observed FPR). FULLY
    oracle-backed (r5): the DuckDB oracle reproduces the independent
    routing hash (sm64(h XOR shard-salt) mod S), rebuilds every
    shard's Parquet-SBBF bit set exactly, and probes the same 100k
    disjoint ids — so shard routing, per-shard max fill, the
    false-positive count, AND the zero-FN guarantee (present_hits
    rendered as the exact occurrence total) all hash-match."""
    from .operators.sharded import ShardedBloomSketch

    seq = sequences_from_documents(spark, sf_dir)
    sk = ShardedBloomSketch(n_total=500_000, p=1e-4, n_shards=16)
    sketch_df = sk.build(seq, routed=True).persist()
    stats = sk.stats(sketch_df).agg(
        F.count("*").alias("n_shards"),
        F.sum("n_items").alias("n_inserted"),
        F.max("fill_ratio").alias("max_fill"),
    ).collect()[0]
    hits, total = sk.count_contained(seq, sketch_df, spark)
    assert hits == total, (hits, total)  # zero FN through shard routing
    # Build the absent-probe frame JVM-side: pandas->Spark inference of
    # numpy-ndarray cells only works when Arrow conversion is enabled,
    # which the round driver's session does NOT set (round-3 regression).
    absent = spark.range(10).select(
        F.sequence(
            F.lit(10**8) + F.col("id") * F.lit(10_000),
            F.lit(10**8) + (F.col("id") + F.lit(1)) * F.lit(10_000) - F.lit(1),
        ).alias("tokens")
    )
    fp_hits, fp_total = sk.count_contained(absent, sketch_df, spark)
    sketch_df.unpersist()
    return spark.createDataFrame(
        [
            (
                int(stats["n_shards"]), int(stats["n_inserted"]),
                round(float(stats["max_fill"]), 8), hits, total,
                fp_hits, fp_total, round(fp_hits / fp_total, 8),
            )
        ],
        "n_shards bigint, n_inserted bigint, max_fill double, present_hits bigint, "
        "present_probes bigint, false_hits bigint, n_probes bigint, observed_fpr double",
    )


def _snapshot_split(spark: SparkSession, sf_dir: str):
    """Deterministic prev/new snapshot construction over documents:
    prev = doc_id % 4 != 1; new = doc_id % 4 == 1 PLUS re-identified
    copies (doc_id + 10^9) of every doc_id % 10 == 0 doc — planted
    cross-snapshot duplicates. Reproducible verbatim in DuckDB."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    prev = docs.filter(F.col("doc_id") % 4 != 1)
    planted = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + F.lit(10**9)).alias("doc_id"), "text"
    )
    new = docs.filter(F.col("doc_id") % 4 == 1).unionByName(planted)
    return prev, new


_SNAPSHOT_CTE = """
    WITH prev AS (SELECT doc_id, text FROM documents WHERE doc_id % 4 != 1),
         new_docs AS (
            SELECT doc_id, text FROM documents WHERE doc_id % 4 = 1
            UNION ALL
            SELECT doc_id + 1000000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
         )
"""


@register(
    "q_incremental_dedup_exact",
    oracle=_SNAPSHOT_CTE
    + """
    SELECT n.doc_id AS doc_id FROM new_docs n
    WHERE md5(n.text) IN (SELECT md5(text) FROM prev)
    ORDER BY doc_id
    """,
)
def q_incremental_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT companion of the incremental-dedup sketch: new-snapshot
    docs whose content fingerprint appears in the previous snapshot
    (hash-matched vs DuckDB)."""
    prev, new = _snapshot_split(spark, sf_dir)
    return (
        new.join(
            prev.select(F.md5("text").alias("fp")).distinct(),
            F.md5(new["text"]) == F.col("fp"),
            "left_semi",
        )
        .select("doc_id")
        .orderBy("doc_id")
    )


@register("q_incremental_dedup")
def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental cross-snapshot dedup via the sharded fingerprint
    filter (plans/incremental.py): zero FN (every true duplicate
    flagged — asserted in-query against the exact companion), FP-rate
    bounded over-removal. Summary row so the driver check is stable."""
    from .plans.incremental import incremental_dedup

    prev, new = _snapshot_split(spark, sf_dir)
    out = incremental_dedup(prev, new, expected_docs=500_000, p=1e-6, n_shards=8)
    flagged = {
        r["doc_id"] for r in out["flags"].filter("probably_seen").collect()
    }
    exact = {r["doc_id"] for r in q_incremental_dedup_exact(spark, sf_dir).collect()}
    assert exact <= flagged, "zero-FN violated: a true duplicate was not flagged"
    n_new = new.count()
    out["seen"].unpersist()
    return spark.createDataFrame(
        [
            (
                n_new,
                len(exact),
                len(flagged),
                len(flagged) - len(exact),  # false positives (over-removal)
                n_new - len(flagged),
            )
        ],
        "n_new bigint, n_true_dups bigint, n_flagged bigint, n_false_pos bigint, n_novel bigint",
    )


@register(
    "q_topk_two_pass",
    oracle=_SEQ_CTE
    + """
    SELECT tok, count(*) AS freq
    FROM (SELECT unnest(tokens) AS tok FROM sequences) t
    GROUP BY tok ORDER BY freq DESC, tok LIMIT 25
    """,
)
def q_topk_two_pass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalable two-pass top-k (local candidates + exact recount) must
    equal the full exact groupBy top-k — same oracle as
    q_heavy_tokens_exact proves it."""
    from .operators.topk import topk_exact_candidates

    seq = sequences_from_documents(spark, sf_dir)
    return topk_exact_candidates(seq, k=25, margin=6)


@register("q_topk_cms")
def q_topk_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-path top-k (CMS estimates over local-top candidates)."""
    from .operators.topk import topk_by_cms

    seq = sequences_from_documents(spark, sf_dir)
    return topk_by_cms(seq, k=25, margin=6)


@register(
    "q_rollup_revenue",
    oracle="""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) AS revenue,
           count(*) AS n_rows
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (Catalyst-native, composable with sketch
    aggs via one sketch row per grouping set)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(38,4)"))
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_rows"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "revenue",
            "n_rows",
        )
    )


@register(
    "q_window_user_ranks",
    oracle="""
    SELECT event_id, user_id, event_type,
           row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS seq_no,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS running_value
    FROM events
    QUALIFY seq_no <= 3
    ORDER BY user_id, seq_no LIMIT 200
    """,
)
def q_window_user_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window functions: per-user event ordering + running sums."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "event_id",
            "user_id",
            "event_type",
            F.row_number().over(w).alias("seq_no"),
            F.round(F.sum("value").over(w.rowsBetween(W.unboundedPreceding, 0)), 6).alias(
                "running_value"
            ),
        )
        .filter(F.col("seq_no") <= 3)
        .orderBy("user_id", "seq_no")
        .limit(200)
    )


@register(
    "q_set_ops",
    oracle="""
    WITH clickers AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
         viewers  AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'view')
    SELECT 'intersect' AS op, count(*) AS n FROM (SELECT * FROM clickers INTERSECT SELECT * FROM viewers)
    UNION ALL
    SELECT 'except' AS op, count(*) AS n FROM (SELECT * FROM clickers EXCEPT SELECT * FROM viewers)
    UNION ALL
    SELECT 'union' AS op, count(*) AS n FROM (SELECT * FROM clickers UNION SELECT * FROM viewers)
    """,
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational set operations (intersect / except / union distinct),
    counted in ONE action: the three labeled set results union into a
    single groupBy instead of three separate .count() jobs."""
    ev = load_table(spark, sf_dir, "events")
    clickers = ev.filter(F.col("event_type") == "click").select("user_id").distinct()
    viewers = ev.filter(F.col("event_type") == "view").select("user_id").distinct()
    labeled = (
        clickers.intersect(viewers).select(F.lit("intersect").alias("op"))
        .unionAll(clickers.exceptAll(viewers).distinct().select(F.lit("except").alias("op")))
        .unionAll(clickers.union(viewers).distinct().select(F.lit("union").alias("op")))
    )
    counts = labeled.groupBy("op").agg(F.count("*").alias("n"))
    # groupBy drops empty sets; an empty 'except' must still report 0
    ops = spark.createDataFrame([("intersect",), ("except",), ("union",)], "op string")
    return ops.join(counts, "op", "left").select(
        "op", F.coalesce("n", F.lit(0)).cast("bigint").alias("n")
    )


@register(
    "q_anti_join",
    oracle="""
    SELECT c.c_custkey AS custkey, c.c_acctbal AS acctbal
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 350000)
    ORDER BY custkey LIMIT 100
    """,
)
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join (NOT EXISTS): customers with no large order — left_anti
    against the filtered key set, broadcast (the filter is pushed below
    the distinct, so the broadcast side is a pruned key list)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    big = o.filter(F.col("o_totalprice") > 350000).select("o_custkey").distinct()
    return (
        c.join(F.broadcast(big), c.c_custkey == F.col("o_custkey"), "left_anti")
        .select(F.col("c_custkey").alias("custkey"), F.col("c_acctbal").alias("acctbal"))
        .orderBy("custkey")
        .limit(100)
    )


@register(
    "q_keep_latest",
    oracle="""
    SELECT user_id, event_id AS last_event_id, event_type AS last_event_type
    FROM (SELECT user_id, event_id, event_type,
                 row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
          FROM events) t
    WHERE rn = 1 ORDER BY user_id LIMIT 200
    """,
)
def q_keep_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-latest-version-per-key dedup (the standard CDC/compaction
    shape): window row_number over (key, ts desc), keep rank 1."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("event_type").alias("last_event_type"),
        )
        .orderBy("user_id")
        .limit(200)
    )


@register(
    "q_correlated_subquery",
    oracle="""
    SELECT c.c_custkey AS custkey,
           round(CAST(c.c_acctbal AS DOUBLE), 6) AS acctbal
    FROM customer c
    WHERE c.c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
                         WHERE c2.c_nationkey = c.c_nationkey)
    ORDER BY custkey LIMIT 150
    """,
)
def q_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (above-per-nation-average balance),
    expressed in Spark SQL — Catalyst de-correlates it into an
    aggregate + join."""
    c = load_table(spark, sf_dir, "customer")
    c.createOrReplaceTempView("customer_csq")
    return spark.sql(
        """
        SELECT c.c_custkey AS custkey,
               round(CAST(c.c_acctbal AS DOUBLE), 6) AS acctbal
        FROM customer_csq c
        WHERE c.c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer_csq c2
                             WHERE c2.c_nationkey = c.c_nationkey)
        ORDER BY custkey LIMIT 150
        """
    )


@register(
    "q_sessionize",
    oracle="""
    WITH flagged AS (
        SELECT user_id,
               CASE WHEN epoch(ts) - lag(epoch(ts)) OVER w IS NULL
                         OR epoch(ts) - lag(epoch(ts)) OVER w > 1800
                    THEN 1 ELSE 0 END AS new_session
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    )
    SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions,
           count(*) AS n_events
    FROM flagged GROUP BY user_id
    """,
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (lag + conditional cumsum windows)."""
    from .operators.temporal import session_stats

    ev = load_table(spark, sf_dir, "events")
    return session_stats(ev, gap_minutes=30).select("user_id", "n_sessions", "n_events")


@register(
    "q_asof_join",
    oracle="""
    WITH clicks AS (
        SELECT user_id, ts, round(max(value), 6) AS last_click_value
        FROM events WHERE event_type = 'click' GROUP BY user_id, ts
    ), views AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'
    )
    SELECT v.event_id, v.user_id, c.last_click_value
    FROM views v ASOF LEFT JOIN clicks c
      ON v.user_id = c.user_id AND v.ts >= c.ts
    """,
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for every 'view' event, the value of the user's
    latest 'click' at or before it — hash-matched against DuckDB's
    native ASOF JOIN. The right side is pre-aggregated to one row per
    (user, ts) so the backward match is deterministic on both engines."""
    from .operators.temporal import asof_join

    ev = load_table(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.round(F.max("value"), 6).alias("last_click_value"))
    )
    views = ev.filter(F.col("event_type") == "view").select("event_id", "user_id", "ts")
    out = asof_join(views, clicks, on="ts", by="user_id", direction="backward")
    return out.select("event_id", "user_id", "last_click_value")


@register(
    "q_range_join",
    oracle="""
    WITH ev AS (SELECT event_id, user_id, event_type, epoch(ts) AS t, value FROM events),
         c AS (SELECT event_id, user_id, t FROM ev WHERE event_type = 'click'),
         v AS (SELECT user_id, t, value FROM ev WHERE event_type = 'view')
    SELECT c.event_id, count(*) AS n_views,
           CAST(sum(CAST(v.value AS DECIMAL(38,6))) AS DOUBLE) AS sum_view_value
    FROM c JOIN v ON v.user_id = c.user_id AND v.t >= c.t - 1800 AND v.t <= c.t
    GROUP BY c.event_id
    """,
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: per click, the same user's views in the preceding 30
    minutes — the binned equi-join operator vs DuckDB's native
    inequality join (hash-matched, so bin edges are provably exact)."""
    from .operators.temporal import range_join

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.col("ts").cast("timestamp").cast("double").alias("t"),
        "value",
    )
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "t")
    views = ev.filter(F.col("event_type") == "view").select("user_id", "t", "value")
    j = range_join(clicks, views, on="t", lower=-1800.0, upper=0.0, by="user_id")
    return j.groupBy("event_id").agg(
        F.count("*").alias("n_views"),
        F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("sum_view_value"),
    )


@register(
    "q_token_count_bpe",
    oracle="""
    SELECT doc_id,
           len(regexp_extract_all(text, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+')) AS n_bpe_tokens,
           len(list_filter(regexp_split_to_array(text, '\\s+'), w -> w <> '')) AS n_ws_tokens
    FROM documents ORDER BY doc_id LIMIT 300
    """,
)
def q_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting both ways: whitespace and the BPE-ish regex
    pretokenizer (GPT-2-style, RE2-compatible subset) — identical in
    DuckDB."""
    from .functions.text import bpe_pretokenize_expr

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            F.size(bpe_pretokenize_expr("text")).alias("n_bpe_tokens"),
            token_count_expr(F.col("text")).alias("n_ws_tokens"),
        )
        .orderBy("doc_id")
        .limit(300)
    )


from .functions.text import duckdb_rolling_fingerprint as _dd_rfp  # noqa: E402


@register(
    "q_rolling_fingerprint",
    oracle=_SEQ_CTE
    + f"""
    SELECT fp, count(*) AS n_docs
    FROM (SELECT {_dd_rfp('tokens')} AS fp FROM sequences WHERE len(tokens) >= 3) t
    GROUP BY fp HAVING count(*) > 0 ORDER BY n_docs DESC, fp LIMIT 100
    """,
)
def q_rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash fingerprint groups (min 3-gram polynomial per doc)."""
    from .functions.text import rolling_fingerprint_expr

    seq = sequences_from_documents(spark, sf_dir)
    return (
        seq.filter(F.size("tokens") >= 3)
        .select(rolling_fingerprint_expr(F.col("tokens")).alias("fp"))
        .groupBy("fp")
        .agg(F.count("*").alias("n_docs"))
        .orderBy(F.desc("n_docs"), "fp")
        .limit(100)
    )


@register(
    "q_ngram_jaccard",
    oracle=_SEQ_CTE
    + """
    , shingles AS (
        SELECT doc_id,
               list_distinct(list_transform(range(len(tokens) - 2),
                   i -> CAST(tokens[i+1] AS BIGINT) * 2526168121
                        + CAST(tokens[i+2] AS BIGINT) * 50261
                        + tokens[i+3])) AS sh
        FROM sequences WHERE len(tokens) >= 3
    ), fps AS (
        SELECT CAST(doc_id AS VARCHAR) AS doc_id, md5(substr(text, 1, 40)) AS fp
        FROM documents
    ), cand AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
    )
    SELECT c.doc_a, c.doc_b,
           round(len(list_intersect(sa.sh, sb.sh))::DOUBLE
                 / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))), 6) AS jaccard
    FROM cand c
    JOIN shingles sa ON sa.doc_id = c.doc_a
    JOIN shingles sb ON sb.doc_id = c.doc_b
    WHERE len(list_intersect(sa.sh, sb.sh)) > 0
    """,
)
def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard over prefix-fingerprint candidate pairs,
    hash-matched against DuckDB's list_intersect on identical polynomial
    shingle keys. The operator broadcast-semi-joins candidates BEFORE
    the shingle self-join (the 100 TB-safe ordering)."""
    from .operators.dedup import ngram_jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    fps = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.md5(F.substring("text", 1, 40)).alias("fp"),
    )
    cand = (
        fps.alias("a")
        .join(fps.alias("b"), (F.col("a.fp") == F.col("b.fp")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
    )
    seq = sequences_from_documents(spark, sf_dir)
    pairs = ngram_jaccard_pairs(seq, cand, shingle=3, exact_keys=True)
    return pairs.select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))


@register(
    "q_bottomk_sample",
    oracle="""
    SELECT CAST(doc_id AS VARCHAR) AS key,
           CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
    FROM documents ORDER BY h, key LIMIT 50
    """,
)
def q_bottomk_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-order sample: the 50 smallest-md5-hash doc
    ids — reproducible bit-for-bit in DuckDB (cross-engine sampling)."""
    from .operators.sampling import bottom_k_sample

    return bottom_k_sample(load_table(spark, sf_dir, "documents"), "doc_id", 50)


@register(
    "q_weighted_sample",
    oracle="""
    SELECT CAST(doc_id AS VARCHAR) AS key,
           CAST(n_chars AS DOUBLE) AS weight,
           round(-ln((CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS DOUBLE) + 1.0)
                     / 1152921504606846976.0) / CAST(n_chars AS DOUBLE), 10) AS score
    FROM documents WHERE n_chars > 0
    ORDER BY score, key LIMIT 50
    """,
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sample without replacement (Efraimidis–Spirakis A-ES,
    weight = document length): P(doc sampled) ∝ n_chars — the
    quality-weighted corpus-mixing primitive, deterministic enough to
    hash-match a SQL oracle (the randomness IS the content hash)."""
    from .operators.sampling import weighted_bottom_k

    return weighted_bottom_k(load_table(spark, sf_dir, "documents"), "doc_id", "n_chars", 50)


@register(
    "q_stratified_sample",
    oracle="""
    SELECT source AS stratum, key, h FROM (
        SELECT source, CAST(doc_id AS VARCHAR) AS key,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
        FROM documents
    ) t
    QUALIFY row_number() OVER (PARTITION BY stratum ORDER BY h, key) <= 5
    """,
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source deterministic sample: 5 smallest-hash docs per
    stratum (window top-k, one shuffle on the stratum key)."""
    from .operators.sampling import bottom_k_by

    return bottom_k_by(load_table(spark, sf_dir, "documents"), "source", "doc_id", 5)


@register(
    "q_kmv_distinct",
    oracle="""
    WITH h AS (
        SELECT DISTINCT CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
        FROM events
    ), b AS (SELECT h FROM h ORDER BY h LIMIT 256)
    SELECT count(*) AS n_hashes, max(h) AS kth_hash,
           round(CASE WHEN count(*) < 256 THEN CAST(count(*) AS DOUBLE)
                      ELSE 255.0 * 1152921504606846976.0 / max(h) END, 4) AS est_distinct
    FROM b
    """,
)
def q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (bottom-k) distinct-user estimate — the one sketch whose
    ESTIMATE hash-matches a SQL oracle exactly, because the k-th
    smallest md5 hash is a pure deterministic function of the data
    (Bar-Yossef et al.; unlike HLL's engine-private registers)."""
    from .operators.sampling import kmv_distinct

    out = kmv_distinct(load_table(spark, sf_dir, "events"), "user_id", k=256)
    return out.select("n_hashes", "kth_hash", F.round("est_distinct", 4).alias("est_distinct"))


@register(
    "q_kmv_overlap",
    oracle="""
    WITH hashed AS (
        SELECT DISTINCT event_type AS grp,
               CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
        FROM events
    ), topk AS (
        SELECT grp, h FROM hashed
        QUALIFY row_number() OVER (PARTITION BY grp ORDER BY h) <= 64
    ), pairs AS (
        SELECT a.grp AS ga, b.grp AS gb
        FROM (SELECT DISTINCT grp FROM topk) a
        JOIN (SELECT DISTINCT grp FROM topk) b ON a.grp < b.grp
    ), sides AS (
        SELECT p.ga, p.gb, t.h, 1 AS in_a, 0 AS in_b
        FROM pairs p JOIN topk t ON t.grp = p.ga
        UNION ALL
        SELECT p.ga, p.gb, t.h, 0, 1
        FROM pairs p JOIN topk t ON t.grp = p.gb
    ), merged AS (
        SELECT ga, gb, h, max(in_a) AS ia, max(in_b) AS ib
        FROM sides GROUP BY ga, gb, h
    ), x AS (
        SELECT * FROM merged
        QUALIFY row_number() OVER (PARTITION BY ga, gb ORDER BY h) <= 64
    ), stats AS (
        SELECT ga, gb, count(*) AS n, max(h) AS kth, sum(ia * ib) AS n_both,
               sum(ia * (1 - ib)) AS n_a_only, sum((1 - ia) * ib) AS n_b_only
        FROM x GROUP BY ga, gb
    ), est AS (
        SELECT *, CASE WHEN n < 64 THEN CAST(n AS DOUBLE)
                       ELSE 63.0 * 1152921504606846976.0 / kth END AS est_union
        FROM stats
    )
    SELECT ga AS source_a, gb AS source_b, n AS n_union_sample,
           round(est_union, 6) AS est_union,
           round((CAST(n_both AS DOUBLE) / n) * est_union, 6) AS est_intersection,
           round((CAST(n_a_only AS DOUBLE) / n) * est_union, 6) AS est_a_minus_b,
           round((CAST(n_b_only AS DOUBLE) / n) * est_union, 6) AS est_b_minus_a,
           round(CAST(n_both AS DOUBLE) / n, 6) AS jaccard
    FROM est
    """,
)
def q_kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV pairwise set-operation ESTIMATES (union / intersection /
    Jaccard of distinct users across event types, Beyer et al. 2007)
    that hash-match a SQL oracle exactly — like q_kmv_distinct, the
    bottom-k hash sketch is a pure deterministic function of the data,
    so even the estimates are cross-engine reproducible."""
    from .operators.sampling import kmv_overlap

    return kmv_overlap(load_table(spark, sf_dir, "events"), "event_type", "user_id", k=64)


@register(
    "q_bpe_merge_pairs",
    oracle=_SEQ_CTE
    + """
    SELECT pair // 50261 AS left_tok, pair % 50261 AS right_tok, count(*) AS freq
    FROM (SELECT unnest(list_transform(range(len(tokens) - 1),
              i -> CAST(tokens[i+1] AS BIGINT) * 50261 + tokens[i+2])) AS pair
          FROM sequences WHERE len(tokens) >= 2) t
    GROUP BY 1, 2 ORDER BY freq DESC, left_tok, right_tok LIMIT 25
    """,
)
def q_bpe_merge_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BPE merge-learning primitive: corpus-wide adjacent-pair
    counts, top 25 — one merge-training iteration is exactly "count
    all adjacent pairs, take the argmax". Pure Catalyst (injective
    int64 pair keys), hash-matched cross-engine."""
    from .functions.text import adjacent_pair_keys

    seq = sequences_from_documents(spark, sf_dir)
    return (
        seq.select(F.explode(adjacent_pair_keys(F.col("tokens"))).alias("pair"))
        .groupBy("pair")
        .agg(F.count("*").alias("freq"))
        .select(
            F.expr("pair DIV 50261").alias("left_tok"),
            (F.col("pair") % 50261).alias("right_tok"),
            "freq",
        )
        .orderBy(F.desc("freq"), "left_tok", "right_tok")
        .limit(25)
    )


@register(
    "q_contamination_exact",
    oracle=_SEQ_CTE
    + """
    , grams AS (
        SELECT doc_id, unnest(list_distinct(list_transform(range(len(tokens) - 2),
            i -> CAST(tokens[i+1] AS BIGINT) * 2526168121
                 + CAST(tokens[i+2] AS BIGINT) * 50261 + tokens[i+3]))) AS g
        FROM sequences WHERE len(tokens) >= 3
    ), eval_g AS (SELECT DISTINCT g FROM grams WHERE CAST(doc_id AS BIGINT) < 50),
       train_g AS (SELECT doc_id, g FROM grams WHERE CAST(doc_id AS BIGINT) >= 50)
    SELECT t.doc_id, count(*) AS shared_grams
    FROM train_g t JOIN eval_g e USING (g)
    GROUP BY t.doc_id ORDER BY shared_grams DESC, doc_id LIMIT 100
    """,
)
def q_contamination_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact eval-contamination companion: distinct 3-grams each
    'training' doc (ids >= 50) shares with the 'eval' docs (ids < 50),
    via a broadcast gram join — hash-matched cross-engine."""
    from .operators.dedup import shingle_sets_poly

    seq = sequences_from_documents(spark, sf_dir)
    grams = shingle_sets_poly(seq, shingle=3)
    is_eval = F.col("doc_id").cast("bigint") < 50
    eval_g = grams.filter(is_eval).select("shingle_hash").distinct()
    train_g = grams.filter(~is_eval)
    return (
        train_g.join(F.broadcast(eval_g), "shingle_hash")
        .groupBy("doc_id")
        .agg(F.count("*").alias("shared_grams"))
        .orderBy(F.desc("shared_grams"), "doc_id")
        .limit(100)
    )


@register("q_decontaminate")
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom decontamination sweep (8-gram leak detection, zero FN):
    summary over the same eval/train split as q_contamination_exact;
    one-sidedness and planted-leak recall are pinned in pytest."""
    from .operators.decontaminate import decontaminate

    seq = sequences_from_documents(spark, sf_dir)
    is_eval = F.col("doc_id").cast("bigint") < 50
    out = decontaminate(seq.filter(~is_eval), seq.filter(is_eval), ngram=8)
    return out.agg(
        F.count("*").alias("n_train_docs"),
        F.sum(F.col("contaminated").cast("long")).alias("n_flagged"),
        F.sum("n_hits").alias("total_hits"),
        F.sum("n_grams").alias("total_grams"),
    )


@register(
    "q_bigram_lm_scores",
    oracle=_SEQ_CTE
    + """
    , pairs AS (
        SELECT doc_id, unnest(list_transform(range(len(tokens) - 1),
            i -> CAST(tokens[i+1] AS BIGINT) * 1048576 + tokens[i+2])) AS pair
        FROM sequences WHERE len(tokens) >= 2
    ), bigram AS (SELECT pair, count(*) AS c2 FROM pairs GROUP BY pair),
       unigram AS (SELECT tok, count(*) AS c1
                   FROM (SELECT unnest(tokens) AS tok FROM sequences) GROUP BY tok)
    SELECT p.doc_id, count(*) AS n_pairs,
           round(avg(ln((b.c2 + 1)::DOUBLE / (u.c1 + 50257))), 6) AS lm_score
    FROM pairs p
    JOIN bigram b USING (pair)
    JOIN unigram u ON u.tok = p.pair // 1048576
    GROUP BY p.doc_id
    """,
)
def q_bigram_lm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-style quality filter: per-doc mean log-likelihood
    under an add-one-smoothed corpus bigram LM — hash-matched against
    the identical arithmetic in DuckDB."""
    from .operators.dedup import bigram_lm_scores

    seq = sequences_from_documents(spark, sf_dir)
    return bigram_lm_scores(seq)


@register("q_bpe_learn")
def q_bpe_learn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE merge training (5 iterations of count -> argmax
    -> vectorized replace): emits the learned merge table. Deterministic
    and partition-invariant, pinned against a sequential reference BPE
    in pytest (the iterative loop is not one-shot SQL-expressible, so
    rows-only here)."""
    from .operators.bpe import learn_bpe_merges

    seq = sequences_from_documents(spark, sf_dir)
    merges, merged = learn_bpe_merges(seq, n_merges=5, vocab=50257)
    merged.unpersist()
    return spark.createDataFrame(
        merges, "left_tok bigint, right_tok bigint, new_id bigint, freq bigint"
    )


from .functions.text import duckdb_repetition as _dd_rep  # noqa: E402

_REP = _dd_rep("tokens")


@register(
    "q_repetition_filters",
    oracle=_SEQ_CTE
    + f"""
    SELECT doc_id,
           {_REP['dup_3gram_ratio']} AS dup_3gram_ratio,
           {_REP['top_token_ratio']} AS top_token_ratio
    FROM sequences ORDER BY doc_id LIMIT 150
    """,
)
def q_repetition_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality filters (duplicate-3-gram ratio,
    top-token share) — pure Catalyst, hash-matched cross-engine."""
    from .functions.text import repetition_exprs

    seq = sequences_from_documents(spark, sf_dir)
    r = repetition_exprs(F.col("tokens"))
    return (
        seq.select(
            "doc_id",
            r["dup_3gram_ratio"].alias("dup_3gram_ratio"),
            r["top_token_ratio"].alias("top_token_ratio"),
        )
        .orderBy("doc_id")
        .limit(150)
    )


def _curate_oracle() -> str:
    import math

    from .functions.text import DUCKDB_TOKENIZE
    from .sketch.blocked import _HEADER as _BHEADER
    from .sketch.blocked import _SALT, BlockedBloomFilter

    nb = BlockedBloomFilter.for_np(n=500_000, p=1e-4).n_blocks
    m_bits = nb * 256
    wire = _BHEADER.size + nb * 32
    lnfac = repr(math.log(1.0 - 1.0 / 32.0))
    salts = ", ".join(f"({j}, {int(s)})" for j, s in enumerate(_SALT))
    return f"""
WITH gated AS (
  SELECT doc_id, text FROM documents
  WHERE len(list_filter(regexp_split_to_array(text, '\\s+'), w -> w <> '')) >= 8
    AND round(CASE WHEN length(text) > 0
                   THEN length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                        * 1.0 / length(text)
                   ELSE 0.0 END, 6) >= 0.3
),
keep AS (SELECT min(doc_id) AS doc_id FROM gated GROUP BY md5(text)),
csequences AS (SELECT CAST(g.doc_id AS VARCHAR) AS doc_id,
                      {DUCKDB_TOKENIZE('g.text')} AS tokens
               FROM gated g JOIN keep k ON g.doc_id = k.doc_id),
{_minhash_ctes('c', 'csequences')},
dropped AS (SELECT DISTINCT doc_b AS doc_id FROM cmt WHERE ej >= 0.6),
surv AS (SELECT s.doc_id, s.tokens FROM csequences s
         LEFT JOIN dropped d ON s.doc_id = d.doc_id WHERE d.doc_id IS NULL),
stok AS (SELECT unnest(tokens) AS tok FROM surv),
sdt AS (SELECT DISTINCT CAST(tok AS UBIGINT) AS k FROM stok),
{_sm64_ctes('cb', 'SELECT k FROM sdt')},
cbits AS (SELECT DISTINCT CAST((h1 >> 32) % {nb} AS BIGINT) AS block, s.j,
          CAST(((CAST(h1 % 4294967296 AS HUGEINT) * s.salt) % 4294967296)
               AS BIGINT) >> 27 AS bit
          FROM cbh CROSS JOIN (VALUES {salts}) s(j, salt)),
card AS (SELECT CAST(count(*) AS BIGINT) AS c FROM cbits)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS docs_in,
       (SELECT CAST(count(*) AS BIGINT) FROM gated) AS docs_after_quality,
       (SELECT CAST(count(*) AS BIGINT) FROM keep) AS docs_after_exact_dedup,
       (SELECT CAST(count(*) AS BIGINT) FROM surv) AS docs_out,
       (SELECT CAST(COALESCE(sum(len(tokens)), 0) AS BIGINT) FROM surv)
           AS tokens_out,
       CASE WHEN c = 0 THEN 0.0
            ELSE round({nb} * ln(1.0 - c / CAST({m_bits} AS DOUBLE))
                       / {lnfac}, 1) END AS distinct_tokens_est,
       round(c / CAST({m_bits} AS DOUBLE), 6) AS bloom_fill_ratio,
       CAST({wire} AS BIGINT) AS bloom_bytes
FROM card
"""


@register("q_curate_corpus", oracle=_curate_oracle())
def q_curate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation pipeline stats (quality gate -> exact dedup
    -> MinHash near-dedup -> tokenize -> final Bloom); the capstone
    composition of the library's operators. FULLY oracle-backed (r5):
    the DuckDB oracle replays the ENTIRE pipeline — whitespace/alpha
    quality gate, md5 exact-dedup keep-min rule, the bit-exact MinHash
    LSH drop set (_minhash_ctes) at threshold 0.6, tokenizer-parity
    token counts, and the final split-block filter's fill/estimate/
    wire size from an exactly rebuilt bit set — so every number in the
    stats row hash-matches cross-engine."""
    from .plans import curate_corpus

    out = curate_corpus(
        spark,
        load_table(spark, sf_dir, "documents"),
        min_tokens=8,
        min_alpha_ratio=0.3,
        jaccard_threshold=0.6,
        bloom_n=500_000,
    )
    s = out["stats"]
    return spark.createDataFrame(
        [tuple(s.values())],
        ", ".join(f"{k} {'double' if isinstance(v, float) else 'bigint'}" for k, v in s.items()),
    )


_TDQ_ORACLE = "\nUNION ALL\n".join(
    f"SELECT CAST({q} AS DOUBLE) AS q,"
    f" round(CAST(quantile_cont(value, {q}) AS DOUBLE), 6) AS exact,"
    f" 1 AS td_in_bound, 1 AS kll_in_bound FROM events"
    for q in (0.01, 0.5, 0.99)
)


@register("q_tdigest_quantiles", oracle=_TDQ_ORACLE)
def q_tdigest_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-digest + KLL quantiles of events.value, certified against
    exact (both quantile sketches the north rule names). Oracle-backed
    via in-bound flags: both sketches are merge-order-dependent, so
    the exact quantiles hash-match and each estimate must land between
    the exact quantile values at q ± margin — 0.03 rank margin for the
    t-digest (the bound tests/test_tdigest.py pins for the Spark
    path) and 3x the published rank error for KLL. Oracle emits
    literal 1s; a flipped flag fails the driver hash."""
    from .operators.sketches import KllQuantiles, TDigestQuantiles
    from .sketch.kll import KLLSketch

    td_m = 0.03
    kll_m = 3.0 * KLLSketch(200).rank_error()
    ev = load_table(spark, sf_dir, "events")
    qs = [0.01, 0.5, 0.99]
    td = TDigestQuantiles(compression=200, col="value").quantiles(ev, qs)
    kll = KllQuantiles(k=200, col="value").quantiles(ev, qs)
    aggs = [
        F.expr(f"percentile(value, {q})").alias(f"p{i}") for i, q in enumerate(qs)
    ]
    for name, m in (("t", td_m), ("k", kll_m)):
        aggs += [
            F.expr(f"percentile(value, {max(q - m, 0.0)!r})").alias(f"{name}lo{i}")
            for i, q in enumerate(qs)
        ]
        aggs += [
            F.expr(f"percentile(value, {min(q + m, 1.0)!r})").alias(f"{name}hi{i}")
            for i, q in enumerate(qs)
        ]
    b = ev.agg(*aggs).collect()[0]
    rows = [
        (
            q,
            round(float(b[f"p{i}"]), 6),
            1 if b[f"tlo{i}"] <= td[i] <= b[f"thi{i}"] else 0,
            1 if b[f"klo{i}"] <= kll[i] <= b[f"khi{i}"] else 0,
        )
        for i, q in enumerate(qs)
    ]
    return spark.createDataFrame(
        rows, "q double, exact double, td_in_bound int, kll_in_bound int"
    )


@register(
    "q_quantiles_exact",
    oracle="""
    SELECT CAST(0.01 AS DOUBLE) AS q, round(CAST(quantile_cont(value, 0.01) AS DOUBLE), 6) AS exact FROM events
    UNION ALL
    SELECT CAST(0.5 AS DOUBLE), round(CAST(quantile_cont(value, 0.5) AS DOUBLE), 6) FROM events
    UNION ALL
    SELECT CAST(0.99 AS DOUBLE), round(CAST(quantile_cont(value, 0.99) AS DOUBLE), 6) FROM events
    """,
)
def q_quantiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hash-matched EXACT companion of q_tdigest_quantiles: the same
    (q, exact) pairs the sketch query emits estimates next to, verified
    against DuckDB's quantile_cont (Spark `percentile` uses the same
    linear interpolation)."""
    ev = load_table(spark, sf_dir, "events")
    qs = [0.01, 0.5, 0.99]
    exact = ev.agg(
        *[F.round(F.expr(f"percentile(value, {q})"), 6).alias(f"p{i}") for i, q in enumerate(qs)]
    ).collect()[0]
    return spark.createDataFrame(
        [(float(q), float(exact[i])) for i, q in enumerate(qs)], "q double, exact double"
    )


@register(
    "q_pivot_status",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(38,4)) END) AS DOUBLE) AS qty_F,
           CAST(sum(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(38,4)) END) AS DOUBLE) AS qty_O
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide aggregation) via Spark's native .pivot()."""
    li = load_table(spark, sf_dir, "lineitem")
    out = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.sum(F.col("l_quantity").cast("decimal(38,4)")))
    )
    return out.select(
        "l_returnflag",
        F.col("F").cast("double").alias("qty_F"),
        F.col("O").cast("double").alias("qty_O"),
    )


@register(
    "q_grouping_sets",
    oracle="""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           count(*) AS n,
           CAST(sum(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
    """,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form under ROLLUP/CUBE) via
    Spark SQL — one aggregation pass, grouping-set expansion in
    Catalyst."""
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem_gs")
    return spark.sql(
        """
        SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
               coalesce(l_linestatus, 'ALL') AS linestatus,
               count(*) AS n,
               CAST(sum(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS qty
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
        """
    )


@register(
    "q_cube_events",
    oracle="""
    SELECT coalesce(event_type, 'ALL') AS event_type,
           coalesce(CAST(user_id % 4 AS VARCHAR), 'ALL') AS user_bucket,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
    FROM events GROUP BY CUBE (event_type, CAST(user_id % 4 AS VARCHAR))
    """,
)
def q_cube_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets over events."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "user_bucket", (F.col("user_id") % 4).cast("string")
    )
    return (
        ev.cube("event_type", "user_bucket")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("total_value"),
        )
        .select(
            F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
            F.coalesce("user_bucket", F.lit("ALL")).alias("user_bucket"),
            "n",
            "total_value",
        )
    )


# ===========================================================================
# Streaming (Structured Streaming executions inside the batch contract:
# file-source micro-batches, trigger(availableNow), memory/foreachBatch
# sinks — deterministic final tables over bounded replays)
# ===========================================================================


def _stream_events_source(spark: SparkSession, sf_dir: str, n_files: int = 4):
    """Materialize events as an n-file parquet dir so the file stream
    source yields n micro-batches (maxFilesPerTrigger=1) — a genuine
    incremental execution, not a single-batch degenerate run."""
    ev = load_table(spark, sf_dir, "events")
    src = _scratch_dir("stream_src")
    ev.repartition(n_files).write.mode("overwrite").parquet(src)
    return spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(src)


_T0 = 1_600_000_000  # fixed epoch base for replay-file mtimes


def _stream_fp_source(spark: SparkSession, sf_dir: str, n_files: int = 4):
    """Documents prefix-fingerprint column replayed as n micro-batches —
    the ONE source both streaming-dedup queries read, so the exact and
    Bloom variants can never silently dedup different key sets."""
    docs = load_table(spark, sf_dir, "documents").select(
        F.md5(F.substring("text", 1, 40)).alias("fp")
    )
    src = _scratch_dir("sdedup_src")
    docs.repartition(n_files).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema("fp string").option("maxFilesPerTrigger", 1).parquet(src)
    )
    return docs, stream


def _await_stream(q, seconds: int = 300) -> None:
    """awaitTermination with the timeout actually enforced: on expiry
    the query is stopped and a clear error raised — otherwise callers
    would read racing snapshots of a memory sink a live query is still
    appending to (and leak the active stream)."""
    if not q.awaitTermination(seconds):
        q.stop()
        raise TimeoutError(f"streaming query {q.name} did not finish in {seconds}s")


@register(
    "q_streaming_windowed_counts",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(38,4))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_streaming_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming event-time windowed aggregation, HASH-MATCHED
    against batch SQL: the events table replayed as 4 file-source
    micro-batches, groupBy(window(ts, 1h), event_type) with exact
    count + DECIMAL sum, complete output mode to a memory sink. The
    final table is split-invariant (complete mode re-emits every
    window's total state), so it must equal DuckDB's batch answer
    bit-for-bit — streaming correctness, not just liveness."""
    import uuid

    stream = _stream_events_source(spark, sf_dir)
    agg = (
        stream.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(38,4)")).cast("double").alias("total_value"),
        )
    )
    name = "rbf_stream_counts_" + uuid.uuid4().hex[:8]
    ckpt = _scratch_dir("stream_ckpt")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    _await_stream(q)
    # date_format of the NTZ window start is timezone-FREE (no session-tz
    # dependence — the driver session may not run in UTC), unlike an
    # epoch cast which routes NTZ -> LTZ through the session zone
    return spark.table(name).select(
        F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        "n_events",
        "total_value",
    )


@register("q_streaming_windowed_topk")
def q_streaming_windowed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator in the driver contract:
    windowed_topk_tokens (applyInPandasWithState, CMS + candidate set
    per event-time window, O(d*w + 2k) state) over the documents token
    stream replayed as 3 micro-batches. foreachBatch records every
    update-mode emission with its batch id; the final table keeps each
    window's LAST emission — the top-k after the window saw all its
    data. Registered rows-only (CMS estimates aren't one-shot SQL);
    estimate accuracy is pinned in tests/test_multimodal_streaming.py
    (test_windowed_topk_tokens_stream) against exact batch counts."""
    from .streaming.stateful import windowed_topk_tokens

    seq = sequences_from_documents(spark, sf_dir).select(
        # deterministic synthetic event time: hour = doc_id % 6
        F.timestamp_seconds(
            F.lit(1704067200) + (F.col("doc_id").cast("long") % 6) * 3600
        ).alias("ts"),
        "tokens",
    )
    src = _scratch_dir("topk_src")
    seq.repartition(3).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(seq.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    out = windowed_topk_tokens(stream, ts_col="ts", tokens_col="tokens", window="1 hour", k=10)

    emissions: list = []

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        for r in batch_df.collect():  # k rows per active window: tiny
            emissions.append((batch_id, r))

    ckpt = _scratch_dir("topk_ckpt")
    q = (
        out.writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    _await_stream(q)
    last_batch: dict = {}
    for bid, r in emissions:
        key = r["window_start"]
        if key not in last_batch or bid > last_batch[key]:
            last_batch[key] = bid
    final = [
        (int(r["window_start"].timestamp()), int(r["tok"]), int(r["est_freq"]), int(r["rank"]))
        for bid, r in emissions
        if bid == last_batch[r["window_start"]]
    ]
    final.sort()
    return spark.createDataFrame(
        final, "window_epoch bigint, tok bigint, est_freq bigint, rank int"
    )


@register("q_streaming_drift")
def q_streaming_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming distribution-drift monitor in the driver contract
    (streaming/stateful.py::windowed_drift): a batch-built reference
    CountSketch, then the documents token stream replayed as
    micro-batches with HALF the sources' token ids shifted out of the
    reference range. Drift per (source-group, window) = 1 - cosine
    between frequency vectors, computed ENTIRELY from sketch payloads
    (AMS inner product + F2) — no token dictionary, no join, O(d*w)
    state per window. In-query gates: every unshifted window scores
    drift < 0.1, every shifted window > 0.5 (detection, not just
    liveness). Rows-only (the estimator is not one-shot SQL); the
    planted-drift detection is pinned again in
    tests/test_multimodal_streaming.py::test_windowed_drift_monitor."""
    from .operators.sketches import AmsSketch
    from .streaming.stateful import windowed_drift

    seq = sequences_from_documents(spark, sf_dir)
    ref_payload, _ = AmsSketch(d=5, w=4096, col="tokens").build_bytes(
        seq.select("tokens")
    )
    # group A keeps reference tokens; group B shifts ids out of range
    shifted = seq.select(
        F.timestamp_seconds(
            F.lit(1704067200) + (F.col("doc_id").cast("long") % 4) * 3600
        ).alias("ts"),
        F.when(F.col("doc_id").cast("long") % 2 == 0, F.lit("stable"))
        .otherwise(F.lit("shifted"))
        .alias("grp"),
        F.when(
            F.col("doc_id").cast("long") % 2 == 0, F.col("tokens")
        )
        .otherwise(F.transform("tokens", lambda t: t + F.lit(1_000_000)))
        .alias("tokens"),
    )
    src = _scratch_dir("drift_src")
    shifted.repartition(3).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(shifted.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = windowed_drift(
        stream, ref_payload, ts_col="ts", tokens_col="tokens",
        source_col="grp", window="1 hour",
    )
    emissions: list = []

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        for r in batch_df.collect():  # one row per active (grp, window)
            emissions.append(r)

    ckpt = _scratch_dir("drift_ckpt")
    q = (
        out.writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    _await_stream(q)
    last: dict = {}
    for r in emissions:  # last emission per (grp, window) = max n_tokens
        key = (r["source"], r["window_start"])
        if key not in last or r["n_tokens"] > last[key]["n_tokens"]:
            last[key] = r
    if not last:
        raise AssertionError("drift monitor emitted nothing")
    for (grp, _), r in last.items():
        if grp == "stable" and r["drift"] >= 0.1:
            raise AssertionError(f"stable group drifted: {r}")
        if grp == "shifted" and r["drift"] <= 0.5:
            raise AssertionError(f"shifted group not detected: {r}")
    final = sorted(
        (r["source"], int(r["window_start"].timestamp()), int(r["n_tokens"]),
         round(float(r["drift"]), 4))
        for r in last.values()
    )
    return spark.createDataFrame(
        final, "grp string, window_epoch bigint, n_tokens bigint, drift double"
    )


# ===========================================================================
# Catalog-table scan (the Iceberg stand-in: the runtime jar is absent
# and unvendorable — proof in sources/__init__.py — so the SAME
# spark.read.table API is exercised against a session-catalog managed
# table, with partition pruning asserted at runtime)
# ===========================================================================


@register(
    "q_catalog_scan",
    oracle=_SEQ_CTE
    + """
    SELECT source, count(*) AS n_docs,
           CAST(sum(len(tokens)) AS BIGINT) AS n_tokens
    FROM sequences
    WHERE source IN ('src3', 'src7')
    GROUP BY source
    """,
)
def q_catalog_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Managed-catalog table read through the same ``spark.read.table``
    surface an Iceberg catalog serves: sequences written as a
    source-partitioned managed table, re-read by table NAME with a
    partition predicate. Self-gating: raises unless the physical plan
    shows the partition filter reached the scan (so at 10^12 rows only
    2 of 20 source partitions are listed, not filtered post-read).
    Hash-matched against DuckDB over the original documents."""
    import contextlib
    import io

    table = "rbf_catalog_sequences"
    seq = sequences_from_documents(spark, sf_dir)
    # EXTERNAL table at a fresh temp location: the default warehouse dir
    # lives under the driver's CWD (may be read-only) and outlives the
    # per-session metastore (an orphaned location blocks CREATE), so a
    # managed table is environment-fragile; the catalog/pruning surface
    # under test is identical either way
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    loc = _scratch_dir("catalog_tbl")
    seq.write.mode("overwrite").partitionBy("source").format("parquet").option(
        "path", loc
    ).saveAsTable(table)
    scan = spark.read.table(table).filter(F.col("source").isin("src3", "src7"))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        scan.explain("formatted")
    plan = buf.getvalue()
    if "PartitionFilters" not in plan or "source" not in plan.split("PartitionFilters", 1)[1][:200]:
        raise AssertionError(
            "partition predicate did not reach the catalog scan:\n" + plan[:2000]
        )
    return scan.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("n_tokens"),
    )


@register("q_checkpoint_resume")
def q_checkpoint_resume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The north rule's resumability pillar, driver-visible: the corpus
    is written as a multi-file parquet input, a partial run checkpoints
    HALF the files' per-file sketch rows (simulated crash), then
    build_with_checkpoint resumes — it must rebuild only the missing
    files and the resumed filter must be BITWISE-IDENTICAL to a direct
    uncheckpointed build (asserted in-query; merge algebra makes the
    split invisible). Emits the lineage metrics a production job logs.
    Rows-only: the payload-equality assert is the real gate."""
    from .operators.aggregate import partition_sketches
    from .operators.checkpoint import build_with_checkpoint
    from .operators.sketches import BlockedBloomSketch
    from .sketch import merge_sketch_payloads

    seq = sequences_from_documents(spark, sf_dir).select("tokens")
    src = _scratch_dir("ckpt_src")
    seq.repartition(6).write.mode("overwrite").parquet(src)

    sk = BlockedBloomSketch.for_np(n=500_000, p=1e-4)

    # direct build (no checkpoint) — the bitwise oracle
    direct = partition_sketches(
        spark.read.parquet(src), sk._empty, sk._update, columns=["tokens"]
    )
    from .operators.aggregate import tree_merge

    drow = tree_merge(direct, merge_sketch_payloads, fanout=8).collect()[0]

    # simulated crash: checkpoint only half the input files
    files = sorted(spark.read.parquet(src).inputFiles())
    half = files[: len(files) // 2]
    ckpt = _scratch_dir("ckpt_dir") + "/ckpt"
    from .operators.checkpoint import _file_sketches

    _file_sketches(
        spark.read.parquet(*half), sk._empty, sk._update, columns=["tokens"]
    ).write.mode("overwrite").parquet(ckpt)

    report = build_with_checkpoint(
        spark, src, ckpt, sk._empty, sk._update, merge_sketch_payloads,
        columns=["tokens"], fanout=8,
    )
    assert report.payload == bytes(drow["payload"]), "resume != direct build"
    assert report.n_items == int(drow["n_items"])
    assert 0 < report.resumed_files < report.total_files  # genuine resume
    assert report.built_files == report.total_files - report.resumed_files
    m = report.metrics()
    from .sketch import BlockedBloomFilter

    filt = BlockedBloomFilter.from_bytes(report.payload)
    return spark.createDataFrame(
        [
            (
                m["total_files"], m["resumed_files"], m["built_files"],
                m["n_items"], m["sketch_bytes"],
                round(filt.fill_ratio(), 6), 1,
            )
        ],
        "total_files int, resumed_files int, built_files int, n_items bigint, "
        "sketch_bytes bigint, fill_ratio double, bitwise_equal int",
    )


# ===========================================================================
# Round 4 additions: cluster resolution, PII scrub, entropy quality
# ===========================================================================


@register(
    "q_dup_clusters",
    oracle="""
    WITH RECURSIVE
    docs40 AS (
        SELECT CAST(doc_id AS VARCHAR) AS doc_id, text
        FROM documents WHERE length(text) >= 40
    ),
    pre AS (SELECT doc_id, md5(substr(text, 1, 40)) AS fp FROM docs40),
    suf AS (
        SELECT doc_id, md5(substr(text, length(text) - 39, 40)) AS fp
        FROM docs40
    ),
    epairs AS (
        SELECT a.doc_id AS src, b.doc_id AS dst
        FROM pre a JOIN pre b ON a.fp = b.fp AND a.doc_id <> b.doc_id
        UNION
        SELECT a.doc_id, b.doc_id
        FROM suf a JOIN suf b ON a.fp = b.fp AND a.doc_id <> b.doc_id
    ),
    reach(node, lab) AS (
        SELECT src, src FROM epairs
        UNION
        SELECT e.dst, r.lab FROM reach r JOIN epairs e ON e.src = r.node
    ),
    comp AS (SELECT node AS doc_id, min(lab) AS cluster_id FROM reach GROUP BY node)
    SELECT c.doc_id, c.cluster_id, s.n_members
    FROM comp c
    JOIN (SELECT cluster_id, count(*) AS n_members FROM comp GROUP BY cluster_id) s
      USING (cluster_id)
    """,
)
def q_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-CLUSTER resolution: connected components over the union
    of prefix-fingerprint and suffix-fingerprint candidate pairs, so
    transitive chains (A~B by prefix, B~C by suffix) land in one group.
    Spark side runs iterative hash-to-min label propagation
    (operators/cluster.py) to exact convergence; the oracle computes
    the same components with a DuckDB recursive CTE — a hash-match
    pins the whole iterative algorithm, not just one round."""
    from .operators.cluster import dup_clusters

    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") >= 40)
    docs = docs.select(F.col("doc_id").cast("string").alias("doc_id"), "text")
    pre = docs.select("doc_id", F.md5(F.substring("text", 1, 40)).alias("fp"))
    suf = docs.select(
        "doc_id",
        F.md5(F.expr("substring(text, length(text) - 39, 40)")).alias("fp"),
    )

    def _star_edges(fps: DataFrame) -> DataFrame:
        # STAR edges (every doc -> min doc sharing its fp), not all
        # pairs: a D-doc duplicate group yields D-1 edges instead of
        # D·(D-1) — same connected components, no quadratic blowup on
        # the hot fingerprint at corpus scale. The oracle builds the
        # clique pairs (small SF); components are identical by
        # construction.
        hubs = fps.groupBy("fp").agg(
            F.min("doc_id").alias("doc_a"), F.count("*").alias("n_docs")
        )
        return (
            fps.join(hubs.filter(F.col("n_docs") >= 2), "fp")
            .filter(F.col("doc_id") != F.col("doc_a"))
            .select("doc_a", F.col("doc_id").alias("doc_b"))
        )

    edges = _star_edges(pre).union(_star_edges(suf))
    return dup_clusters(edges)


@register(
    "q_pii_scrub",
    oracle="""
    WITH planted AS (
        SELECT CAST(doc_id AS VARCHAR) AS doc_id,
               text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@example.com or +1-555-'
                    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text2
        FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(text2,
                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT)
               AS n_emails,
           CAST(len(regexp_extract_all(text2, '\\+?1?-?555-[0-9]{4}')) AS BIGINT)
               AS n_phones,
           md5(regexp_replace(regexp_replace(text2,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                   '<EMAIL>', 'g'),
               '\\+?1?-?555-[0-9]{4}', '<PHONE>', 'g')) AS clean_md5
    FROM planted
    """,
)
def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction (curation-pipeline scrub pass): plant
    deterministic emails/phones keyed by doc_id, then count and redact
    them with pure-Catalyst regexp_count/regexp_replace (JVM regex and
    DuckDB RE2 agree on this pattern subset). Hash-matching md5(clean
    text) pins the exact redaction output per row. Scale: one narrow
    projection, no shuffle, no Python."""
    from .functions.text import pii_redact, pii_counts

    docs = load_table(spark, sf_dir, "documents")
    planted = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or +1-555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("text2"),
    )
    n_emails, n_phones = pii_counts(F.col("text2"))
    return planted.select(
        "doc_id",
        n_emails.alias("n_emails"),
        n_phones.alias("n_phones"),
        F.md5(pii_redact(F.col("text2"))).alias("clean_md5"),
    )


@register(
    "q_token_entropy",
    oracle=_SEQ_CTE
    + """
    , t AS (
        SELECT doc_id, len(tokens) AS n_tok, unnest(tokens) AS token
        FROM sequences WHERE len(tokens) > 0
    ),
    c AS (SELECT doc_id, n_tok, token, count(*) AS c FROM t GROUP BY ALL)
    SELECT doc_id,
           round(ln(n_tok) - sum(c * ln(c)) / n_tok, 6) AS entropy
    FROM c GROUP BY doc_id, n_tok
    """,
)
def q_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Shannon entropy of the token distribution — the
    low-entropy filter every curation pipeline runs (boilerplate and
    repeated-phrase docs score low). H = ln(n) - sum(c·ln c)/n over
    token multiplicities; pure Catalyst (explode + two hash
    aggregates, map-side partial agg shrinks the shuffle to distinct
    (doc, token) rows). Hash-matched to 1e-6 against DuckDB."""
    from .functions.text import doc_token_entropy

    seq = sequences_from_documents(spark, sf_dir).filter(F.size("tokens") > 0)
    return doc_token_entropy(seq)


@register(
    "q_bloom_join_prune",
    oracle="""
    SELECT c.c_mktsegment,
           CAST(sum(CAST(o.o_totalprice AS DECIMAL(38,4))) AS DOUBLE) AS revenue,
           count(*) AS n_orders
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_acctbal > 9000
    GROUP BY c.c_mktsegment
    """,
)
def q_bloom_join_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-join pruning — the library's flagship join use: build a
    blocked-Bloom filter over the selective build side's keys
    (customers with c_acctbal > 9000, ~10%), broadcast the payload,
    and drop probe-side orders whose o_custkey definitely doesn't
    match BEFORE the exact join. Zero false negatives ⇒ the pruned
    join aggregate is bitwise the plain join (the oracle); false
    positives survive the prune but die in the exact join. At 100 TB
    with a build side too big to broadcast-join, the O(bytes) filter
    still broadcasts, cutting the probe-side shuffle by the key
    selectivity; the small-side count used for sizing is the same
    cost class as the filter build itself."""
    from .operators.sketches import BlockedBloomSketch

    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000)
    n_keys = cust.count()
    sk = BlockedBloomSketch.for_np(n=max(n_keys, 1024), p=1e-3, col="h", scalar=True)
    payload, _ = sk.build_bytes(cust.select(F.col("c_custkey").alias("h")))
    orders = load_table(spark, sf_dir, "orders")
    pruned = orders.filter(sk.might_contain_udf(payload, spark)(F.col("o_custkey")))
    return (
        pruned.join(cust, pruned.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(38,4)"))
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_orders"),
        )
    )


_JS_EPS_FULL = repr(__import__("math").e / 65536)
_JS_ORACLE = f"""
WITH
{_cms_ctes('ja', 'SELECT CAST(l_orderkey AS UBIGINT) AS k FROM lineitem', 5, 65536)},
{_cms_ctes('jb', 'SELECT CAST(o_orderkey AS UBIGINT) AS k FROM orders', 5, 65536)},
ip AS (SELECT a.r, sum(CAST(a.c AS HUGEINT) * b.c) AS dot
       FROM jacnt a JOIN jbcnt b ON a.r = b.r AND a.col = b.col GROUP BY a.r),
est AS (SELECT CAST(min(dot) AS BIGINT) AS est_join_size FROM ip),
ex AS (SELECT CAST(count(*) AS BIGINT) AS exact_join_size
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
ns AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS n_left,
              (SELECT CAST(count(*) AS BIGINT) FROM orders) AS n_right)
SELECT n_left, n_right, exact_join_size, est_join_size,
       {round(__import__("math").e / 65536, 8)!r} AS eps,
       CASE WHEN est_join_size <= exact_join_size + {_JS_EPS_FULL} * n_left * n_right
            THEN 1 ELSE 0 END AS within_bound
FROM ns, ex, est
"""


@register("q_join_size_est", oracle=_JS_ORACLE)
def q_join_size_est(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-size estimation from two mergeable CMS sketches
    (Cormode–Muthukrishnan inner product): |lineitem ⋈ orders| on
    orderkey estimated WITHOUT touching row pairs — each side is one
    scan reduced to a d×w table, the estimate is a driver-side inner
    product of two payloads. At 100 TB this is the planner's
    join-cardinality probe: O(sketch) bytes moved vs an actual join.
    In-query asserts pin the one-sided bound (est ≥ exact) and the
    eps·N_a·N_b error cap at delta confidence. FULLY oracle-backed —
    including the estimate itself: the DuckDB oracle rebuilds both CMS
    tables bit-for-bit (splitmix64 rendered as wrapping HUGEINT SQL,
    functions/sqlhash.py) and takes the same min-over-rows inner
    product, so est_join_size hash-matches cross-engine. Sums are
    exact: cell products at this scale are < 2^53, so Spark's float64
    accumulation and DuckDB's HUGEINT agree integer-for-integer."""
    from .operators.sketches import CmsSketch
    from .sketch.cms import CountMinSketch

    li = load_table(spark, sf_dir, "lineitem").select(F.col("l_orderkey").alias("k"))
    od = load_table(spark, sf_dir, "orders").select(F.col("o_orderkey").alias("k"))
    sk = CmsSketch(d=5, w=65536, col="k", scalar=True)
    pa_bytes, n_a = sk.build_bytes(li)
    pb_bytes, n_b = sk.build_bytes(od)
    ca, cb = CountMinSketch.from_bytes(pa_bytes), CountMinSketch.from_bytes(pb_bytes)
    est = ca.inner_product(cb)
    exact = li.join(od, "k").count()
    eps, _delta = ca.error_bound()
    cap = exact + eps * n_a * n_b
    assert est >= exact, (est, exact)  # one-sided estimator
    assert est <= cap, (est, cap)
    return spark.createDataFrame(
        [(n_a, n_b, exact, est, round(float(eps), 8), 1 if est <= cap else 0)],
        "n_left bigint, n_right bigint, exact_join_size bigint, "
        "est_join_size bigint, eps double, within_bound int",
    )


@register(
    "q_domain_cap",
    oracle="""
    WITH ranked AS (
        SELECT CAST(doc_id AS VARCHAR) AS doc_id, source,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY n_chars DESC, CAST(doc_id AS VARCHAR) ASC
               ) AS cap_rank
        FROM documents
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN cap_rank <= 20 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept,
           md5(string_agg(CASE WHEN cap_rank <= 20 THEN doc_id END,
                          ',' ORDER BY doc_id)) AS kept_md5
    FROM ranked GROUP BY source
    """,
)
def q_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source frequency capping — the domain-cap pass every crawl
    curation pipeline runs (keep the best N documents per domain so
    hot domains can't dominate the training mix). Ranks docs within
    each source by (n_chars DESC, doc_id ASC) — a total order, so the
    kept set is deterministic across reruns — and keeps the top 20.
    md5 over the comma-joined sorted kept ids pins exact MEMBERSHIP,
    not just counts. Pure Catalyst: one shuffle on source, window
    rank, hash aggregate (operators/curation.frequency_cap)."""
    from .operators.curation import frequency_cap

    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("doc_id"), "source", "n_chars"
    )
    ranked = frequency_cap(
        docs, "source", 20, [F.col("n_chars").desc(), F.col("doc_id").asc()]
    )
    return ranked.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.when(F.col("kept"), 1).otherwise(0)).cast("bigint").alias("n_kept"),
        F.md5(
            F.concat_ws(
                ",",
                F.sort_array(F.collect_list(F.when(F.col("kept"), F.col("doc_id")))),
            )
        ).alias("kept_md5"),
    )


@register(
    "q_pack_sequences",
    oracle=_SEQ_CTE
    + """
    , s AS (
        SELECT source, CAST(doc_id AS BIGINT) AS id, len(tokens) AS n_tok
        FROM sequences
    ),
    c AS (
        SELECT source, n_tok,
               sum(n_tok) OVER (PARTITION BY source ORDER BY id) AS cum
        FROM s
    )
    SELECT source,
           CAST(floor((cum - n_tok) / 2048.0) AS BIGINT) AS bin,
           count(*) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS bin_tokens
    FROM c GROUP BY source, bin
    """,
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for fixed-context pretraining: lay each
    source's documents end-to-end in doc_id order and bin them into
    2048-token context windows (bin = floor(start_offset/capacity) —
    the deterministic concatenate-and-split packer, so shard
    boundaries are stable across reruns/resumes). Per-key running sum
    (never a global sort) + map-side-combinable aggregate
    (operators/curation.pack_sequences); hash-matched against DuckDB
    computing the same closed form over the parity tokenizer."""
    from .operators.curation import pack_sequences

    seq = sequences_from_documents(spark, sf_dir)
    return pack_sequences(seq, capacity=2048, key="source")


# Shared window-key / canonical-owner / gaps-and-islands derivation for
# the two span queries (q_span_dedup finds spans; q_span_cut applies the
# cut). ONE source of truth for the span semantics — window length 8,
# the 1e9 owner packing, island gap > 8 — so the two oracles cannot
# drift apart (appended after _SEQ_CTE).
_SPAN_CTE = """
    , tok AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, tokens FROM sequences),
    wins AS (
        SELECT doc_id,
               unnest(range(len(tokens) - 7)) AS pos,
               unnest(list_transform(range(len(tokens) - 7),
                      i -> md5(array_to_string(tokens[i+1:i+8], '-')))) AS key
        FROM tok WHERE len(tokens) >= 8
    ),
    owners AS (
        SELECT key, count(*) AS cnt,
               min(doc_id * 1000000000 + pos) AS min_owner
        FROM wins GROUP BY key
    ),
    dup AS (
        SELECT w.doc_id, w.pos
        FROM wins w JOIN owners o USING (key)
        WHERE o.cnt > 1 AND w.doc_id * 1000000000 + w.pos <> o.min_owner
    ),
    brk AS (
        SELECT doc_id, pos,
               CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 8
                    THEN 1 ELSE 0 END AS b
        FROM dup
    ),
    isl AS (
        SELECT doc_id, pos,
               sum(b) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS UNBOUNDED PRECEDING) AS island
        FROM brk
    ),
    spans AS (
        SELECT doc_id, island, min(pos) AS s, max(pos) + 8 AS e
        FROM isl GROUP BY doc_id, island
    )
"""


@register(
    "q_ntok_histogram",
    oracle=_SEQ_CTE
    + """
    , s AS (SELECT source, len(tokens) AS n_tok FROM sequences)
    SELECT source,
           CAST(floor(n_tok / 16.0) AS BIGINT) AS bin,
           CAST(CAST(floor(n_tok / 16.0) AS BIGINT) * 16 AS BIGINT) AS lo,
           CAST((CAST(floor(n_tok / 16.0) AS BIGINT) + 1) * 16 AS BIGINT) AS hi,
           count(*) AS n_rows
    FROM s GROUP BY source, bin
    """,
)
def q_ntok_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source fixed-width histogram of sequence lengths (bin width
    16 tokens) — the distribution-shape pass run before choosing the
    packing capacity (where the n_tok mass sits; how fat the tail
    pack_sequences will split). Exact and mergeable by construction
    (bin counts add); one map-side-combinable hash aggregate, shuffled
    rows capped at tasks x bins — shard_manifest's scale shape
    (operators/sampling.fixed_width_histogram)."""
    from .operators.sampling import fixed_width_histogram

    seq = sequences_from_documents(spark, sf_dir).withColumn(
        "n_tok", F.size("tokens")
    )
    return fixed_width_histogram(seq, "n_tok", 16, group_col="source")


@register(
    "q_span_dedup",
    oracle=_SEQ_CTE
    + _SPAN_CTE
    + """
    SELECT doc_id, count(*) AS n_dup_spans,
           CAST(sum(e - s) AS BIGINT) AS dup_tokens
    FROM spans GROUP BY doc_id
    """,
)
def q_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact repeated-SPAN dedup (Lee et al. 2022's substring dedup,
    re-expressed window-granular so it distributes): every 8-token
    window gets an md5 content key; occurrences whose key repeats
    corpus-wide — minus the canonical first occurrence, so one copy of
    every span survives — merge into maximal per-doc spans
    (gaps-and-islands). Returns per doc the span count and covered
    token mass a cut pass would remove. Pure Catalyst
    (operators/spans.py): ONE corpus pass — counts and owners are
    window functions over the key partition (a groupBy+self-join
    would run the explode+md5 stage twice) — then the duplicated
    occurrences, a tiny fraction, shuffle once on doc_id.
    Hash-matched against DuckDB computing the identical keys over the
    parity tokenizer (the oracle's arithmetic owner min equals the
    struct min for pos < 1e9)."""
    from .operators.spans import span_dedup_stats

    seq = sequences_from_documents(spark, sf_dir).withColumn(
        "doc_id", F.col("doc_id").cast("bigint")
    )
    return span_dedup_stats(seq, length=8)


@register(
    "q_span_cut",
    oracle=_SEQ_CTE
    + _SPAN_CTE
    + """
    , per_doc AS (
        SELECT doc_id, flatten(list(range(s, e))) AS cov
        FROM spans GROUP BY doc_id
    ),
    cut AS (
        SELECT t.doc_id, t.tokens,
               CASE WHEN p.cov IS NULL THEN t.tokens
                    ELSE list_transform(
                           list_filter(range(len(t.tokens)),
                                       i -> NOT list_contains(p.cov, i)),
                           i -> t.tokens[i+1])
               END AS clean
        FROM tok t LEFT JOIN per_doc p USING (doc_id)
    )
    SELECT doc_id, CAST(len(tokens) AS BIGINT) AS n_tok,
           CAST(len(clean) AS BIGINT) AS n_clean,
           -- array_to_string([]) is NULL in DuckDB but concat_ws over
           -- an empty array is '' in Spark: coalesce to match
           md5(coalesce(array_to_string(clean, '-'), '')) AS clean_md5
    FROM cut
    """,
)
def q_span_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPLY side of repeated-span dedup: the cleaned token stream with
    every duplicated span removed and the canonical first occurrence
    kept (keep-one — no content lost corpus-wide). md5 over the
    '-'-joined cleaned ids pins the EXACT post-cut content of every
    document, not just counts; DuckDB re-derives the same spans and
    the same cut independently. One corpus shuffle on doc_id for the
    span join (operators/spans.cut_spans); the span side is tiny."""
    from .operators.spans import cut_spans

    seq = sequences_from_documents(spark, sf_dir).withColumn(
        "doc_id", F.col("doc_id").cast("bigint")
    )
    clean = cut_spans(seq, length=8)
    ids = F.transform(F.col("tokens_clean"), lambda t: t.cast("string"))
    return clean.select(
        "doc_id",
        F.size("tokens").cast("bigint").alias("n_tok"),
        F.size("tokens_clean").cast("bigint").alias("n_clean"),
        F.md5(F.concat_ws("-", ids)).alias("clean_md5"),
    )


@register(
    "q_temperature_mix",
    oracle=_SEQ_CTE
    + """
    , s AS (
        SELECT source, doc_id, len(tokens) AS n_tok FROM sequences
    ),
    agg AS (
        SELECT source, CAST(sum(n_tok) AS BIGINT) AS n_key_tokens
        FROM s GROUP BY source
    ),
    tot AS (SELECT CAST(sum(n_key_tokens) AS BIGINT) AS total FROM agg),
    r AS (
        SELECT source,
               CAST(floor(least(1.0, 0.25 * sqrt(CAST(total AS DOUBLE)
                    / CAST(n_key_tokens AS DOUBLE))) * 1000000) AS BIGINT) AS thr
        FROM agg, tot
    ),
    b AS (
        SELECT source, n_tok,
               ('0x' || substr(md5(doc_id), 1, 8))::BIGINT % 1000000 AS bucket
        FROM s
    )
    SELECT b.source, count(*) AS n_docs,
           CAST(sum(CASE WHEN bucket < thr THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN bucket < thr THEN n_tok ELSE 0 END) AS BIGINT)
               AS kept_tokens,
           min(thr) AS thr
    FROM b JOIN r USING (source) GROUP BY b.source
    """,
)
def q_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-0.5 domain-mixing sample — the data-mixing pass that
    flattens the crawl's natural domain skew before pretraining. The
    alpha=1/2 acceptance rule min(1, 0.25*sqrt(N/n_s)) needs no
    cross-domain normalizer, so thresholds are exact integers on both
    engines (correctly-rounded /, sqrt, * over exact integer token
    counts — no accumulation-order float drift); the keep decision is
    an int64 comparison of an md5 bucket against the threshold:
    deterministic across runs, engines, partitionings. One map-side
    aggregate + one BROADCAST join (operators/curation.py:
    temperature_sample) — the corpus never shuffles."""
    from .operators.curation import temperature_sample

    seq = sequences_from_documents(spark, sf_dir)
    sampled = temperature_sample(seq, key="source", budget_frac=0.25)
    return sampled.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.when(F.col("kept"), 1).otherwise(0)).cast("bigint").alias("n_kept"),
        F.sum(F.when(F.col("kept"), F.col("n_tok")).otherwise(0))
        .cast("bigint")
        .alias("kept_tokens"),
        F.min("thr").alias("thr"),
    )


@register(
    "q_shard_manifest",
    oracle=_SEQ_CTE
    + """
    , s AS (
        SELECT doc_id, len(tokens) AS n_tok,
               ('0x' || substr(md5(doc_id), 1, 8))::BIGINT % 32 AS shard
        FROM sequences
    )
    SELECT shard, count(*) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens,
           md5(string_agg(doc_id, ',' ORDER BY doc_id)) AS ids_md5
    FROM s GROUP BY shard
    """,
)
def q_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Output-shard manifest — the write-planning pass at the end of a
    curation pipeline: route every tokenized document to one of 32
    balanced output shards by a stable md5 hash of its id (pick
    n_shards = corpus_bytes / target_shard_bytes at 100 TB; the same
    expression feeds ``repartition(n, "shard").write``). ids_md5 pins
    exact shard MEMBERSHIP across engines, not just counts. The
    assignment is a map-side expression — zero shuffle — and the
    manifest is one map-side-combinable hash aggregate, so shuffled
    rows are O(tasks x 32) regardless of corpus size
    (operators/sharding.shard_manifest)."""
    from .operators.sharding import shard_manifest

    seq = sequences_from_documents(spark, sf_dir)
    return shard_manifest(
        seq, 32, id_col="doc_id", weight_col="n_tok"
    ).select(
        "shard",
        "n_docs",
        F.col("n_weight").alias("n_tokens"),
        "ids_md5",
    )


@register(
    "q_split_manifest",
    oracle="""
    WITH b AS (
        SELECT lang, n_chars,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                   % 1000000 AS bucket
        FROM documents
    )
    SELECT CASE WHEN bucket < 980000 THEN 'train'
                WHEN bucket < 990000 THEN 'val'
                ELSE 'test' END AS split,
           lang, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS n_weight
    FROM b GROUP BY split, lang
    """,
)
def q_split_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leak-free train/val/test assignment audited per language.
    split = disjoint range test on md5-bucket(doc_id): a document is
    in exactly one split, forever — re-running the pipeline, adding
    data, or changing partitioning cannot move a test document into
    train (the contamination property). The manifest verifies the
    98/1/1 fractions hold and every language reaches val/test. Pure
    map-side expression + one hash aggregate
    (operators/sharding.split_manifest)."""
    from .operators.sharding import split_manifest

    docs = load_table(spark, sf_dir, "documents")
    return split_manifest(
        docs,
        {"train": 0.98, "val": 0.01, "test": 0.01},
        id_col="doc_id",
        weight_col="n_chars",
        strata_col="lang",
    )


@register(
    "q_epoch_shuffle",
    oracle="""
    WITH k AS (
        SELECT doc_id,
               ('0x' || substr(md5('3:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                   AS ekey
        FROM documents
    )
    SELECT doc_id,
           CAST(ekey % 8 AS INTEGER) AS shard,
           CAST(row_number() OVER (
               PARTITION BY ekey % 8 ORDER BY ekey, doc_id
           ) AS INTEGER) AS pos
    FROM k
    """,
)
def q_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-epoch training order (epoch 3, 8 workers):
    every document gets a fresh pseudorandom (shard, pos) from
    md5(epoch:doc_id) — workers stream their shard by pos and jointly
    reproduce the epoch order with no stored permutation and no RNG
    state. shard/key are map-side expressions; pos is a window
    partitioned BY SHARD (one hash shuffle on the uniform key, each
    task sorts one worker's slice — never a global single-task sort).
    Hash-matched: both engines derive the identical permutation
    (operators/sharding.epoch_shuffle)."""
    from .operators.sharding import epoch_shuffle

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return epoch_shuffle(docs, epoch=3, n_shards=8)


@register(
    "q_json_props",
    oracle="""
    SELECT event_type,
           count(*) AS n_events,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k,
           CAST(count(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS n_k
    FROM events GROUP BY event_type
    """,
)
def q_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured property extraction — every event pipeline
    carries a JSON blob column; pulling typed fields out of it must
    stay JVM-side (Catalyst get_json_object, codegen'd Jackson parse)
    rather than a Python UDF. Sums stay integer-exact on both engines.
    At 100 TB the parse is map-side; only the |event_types|-row
    aggregate shuffles."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.select("event_type", k.alias("k")).groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum("k").cast("bigint").alias("sum_k"),
        F.count("k").cast("bigint").alias("n_k"),
    )


_USER_HLL_ORACLE = f"""
WITH
dk AS (SELECT DISTINCT user_id, CAST(event_id AS UBIGINT) AS k FROM events),
{_hll_rows('ud', 'SELECT k, user_id FROM dk', 14, ', user_id')},
rg AS (SELECT user_id, idx, max(rank) AS r FROM udr GROUP BY user_id, idx),
es AS ({_hll_est('rg', 'user_id')}),
nz AS (SELECT user_id,
              CAST(CASE WHEN 4 * count(*) < 16384 THEN 16 + 4 * count(*)
                        ELSE 16 + 16384 END AS BIGINT) AS wire_bytes
       FROM rg GROUP BY user_id),
ex AS (SELECT user_id, CAST(count(DISTINCT event_id) AS BIGINT)
           AS distinct_exact FROM events GROUP BY user_id)
SELECT ex.user_id, ex.distinct_exact, round(es.est, 2) AS distinct_est,
       nz.wire_bytes,
       round(abs(round(es.est, 2) - ex.distinct_exact) / ex.distinct_exact, 6)
           AS rel_err
FROM ex JOIN es ON ex.user_id = es.user_id JOIN nz ON ex.user_id = nz.user_id
"""


@register("q_user_distinct_hll", oracle=_USER_HLL_ORACLE)
def q_user_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-USER HLL distinct-event estimates — the many-small-groups
    keyed build (150 users x ~67 events at sf0.01; millions of users
    at 100 TB). Each group's register state is nearly empty, so the
    canonical wire chooser (sketch/hll.py v2) serializes sorted
    (idx,rank) words instead of 2^p raw registers: wire_bytes shows
    the per-group payload the shuffle actually moves (~260 B, not
    16 KiB — a ~60x reduction in keyed-sketch shuffle volume, the
    cost that dominates per-entity sketching at corpus scale). The
    estimate rides linear counting at this fill, so rel_err is tiny;
    pinned <= 3*1.04/sqrt(m) in tests/test_hll_sparse.py. FULLY
    oracle-backed: the DuckDB oracle rebuilds every user's registers
    bit-for-bit (functions/sqlhash.py), runs the same estimator, and
    derives wire_bytes from the sparse-wire formula 16 + 4*nnz (the
    chooser is a pure function of register state, so nnz is
    SQL-computable — hll.py v2 invariant)."""
    from .operators.sketches import HllSketch
    from .sketch import HyperLogLog

    ev = load_table(spark, sf_dir, "events")
    keyed = HllSketch(p=14, col="event_id", scalar=True).build_by_key(
        ev, "user_id"
    )

    def stats(batches):
        import pyarrow as pa

        for b in batches:
            pdf = b.to_pandas()
            payloads = [bytes(p) for p in pdf["payload"]]
            # explicit types: from_pandas infers null type for empty /
            # object columns (CLAUDE.md mapInArrow rule)
            yield pa.RecordBatch.from_arrays(
                [
                    # keyed builds carry the key as string; cast back
                    pa.array(pdf["key"].astype("int64").tolist(), type=pa.int64()),
                    pa.array(
                        [
                            round(HyperLogLog.from_bytes(p).estimate(), 2)
                            for p in payloads
                        ],
                        type=pa.float64(),
                    ),
                    pa.array([len(p) for p in payloads], type=pa.int64()),
                ],
                names=["user_id", "distinct_est", "wire_bytes"],
            )

    est = keyed.mapInArrow(
        stats, schema="user_id bigint, distinct_est double, wire_bytes bigint"
    )
    exact = ev.groupBy("user_id").agg(
        F.countDistinct("event_id").alias("distinct_exact")
    )
    return (
        exact.join(est, "user_id")
        .withColumn(
            "rel_err",
            F.round(
                F.abs(F.col("distinct_est") - F.col("distinct_exact"))
                / F.col("distinct_exact"),
                6,
            ),
        )
        .orderBy("user_id")
    )


@register(
    "q_zipf_slope",
    oracle=_SEQ_CTE
    + """
    , freqs AS (
        SELECT source, tok, count(*) AS freq
        FROM (SELECT source, unnest(tokens) AS tok FROM sequences) t
        GROUP BY source, tok
    ), ranked AS (
        SELECT source, ln(row_number() OVER (
                   PARTITION BY source ORDER BY freq DESC, tok)) AS x,
               ln(CAST(freq AS DOUBLE)) AS y
        FROM freqs
    )
    SELECT source, count(*) AS n_types,
           round(regr_slope(y, x), 4) AS zipf_slope,
           round(regr_intercept(y, x), 4) AS zipf_intercept
    FROM ranked GROUP BY source
    """,
)
def q_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit per source: OLS slope/intercept of ln(freq) on
    ln(rank) over the source's token frequency table. Natural corpora
    sit near slope -1; a synthetic/corrupted source shows up as a
    flat or cliffed curve — the distributional health check a
    curation pipeline runs per crawl snapshot. Catalyst end to end:
    explode -> (source,tok) count -> rank window -> closed-form OLS
    (slope = covar_pop/var_pop), all map-reducible aggregates; the
    widest shuffle is |sources| x vocab rows, independent of corpus
    row count. Rounded to 4 dp: the OLS moments are sums of thousands
    of ln() terms whose float addition order differs across engines
    (~1e-13 relative), far inside 1e-4."""
    seq = sequences_from_documents(spark, sf_dir)
    freqs = (
        seq.select("source", F.explode("tokens").alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count("*").alias("freq"))
    )
    w = Window.partitionBy("source").orderBy(F.col("freq").desc(), F.col("tok"))
    ranked = freqs.select(
        "source",
        F.log(F.row_number().over(w).cast("double")).alias("x"),
        F.log(F.col("freq").cast("double")).alias("y"),
    )
    slope = F.covar_pop("x", "y") / F.var_pop("x")
    mean_y, mean_x = F.avg("y"), F.avg("x")
    return ranked.groupBy("source").agg(
        F.count("*").alias("n_types"),
        F.round(slope, 4).alias("zipf_slope"),
        F.round(mean_y - slope * mean_x, 4).alias("zipf_intercept"),
    )


@register(
    "q_user_novelty_exact",
    oracle="""
    WITH days AS (
        SELECT strftime(ts, '%Y-%m-%d') AS day, user_id FROM events
    ), firsts AS (
        SELECT user_id, min(day) AS first_day FROM days GROUP BY user_id
    ), per_day AS (
        SELECT day, count(DISTINCT user_id) AS n_active FROM days GROUP BY day
    ), novel AS (
        SELECT first_day AS day, count(*) AS n_new FROM firsts GROUP BY first_day
    )
    SELECT p.day, p.n_active,
           COALESCE(n.n_new, 0) AS n_new,
           CAST(sum(COALESCE(n.n_new, 0)) OVER (ORDER BY p.day) AS BIGINT)
               AS cum_distinct
    FROM per_day p LEFT JOIN novel n ON n.day = p.day
    """,
)
def q_user_novelty_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact novelty curve — per day: active users, NEVER-seen-before
    users, cumulative distinct users. The exact form needs the
    min-first-day trick (one extra shuffle on user_id) and at 100 TB
    the 'distinct so far' recount this replaces is O(days x corpus);
    the HLL companion (q_user_novelty_hll) gets the same curve from
    one corpus scan + |days| sketch rows."""
    ev = load_table(spark, sf_dir, "events").select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"), "user_id"
    )
    per_day = ev.groupBy("day").agg(
        F.countDistinct("user_id").alias("n_active")
    )
    novel = (
        ev.groupBy("user_id")
        .agg(F.min("day").alias("day"))
        .groupBy("day")
        .agg(F.count("*").alias("n_new"))
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        per_day.join(novel, "day", "left")
        .withColumn("n_new", F.coalesce("n_new", F.lit(0)))
        .withColumn("cum_distinct", F.sum("n_new").over(w).cast("bigint"))
    )


_NOVELTY_HLL_ORACLE = f"""
WITH
ev AS (SELECT strftime(ts, '%Y-%m-%d') AS day, CAST(user_id AS UBIGINT) AS k
       FROM events),
{_hll_rows('nh', 'SELECT DISTINCT day, k FROM ev', 14, ', day')},
rg AS (SELECT day, idx, max(rank) AS r FROM nhr GROUP BY day, idx),
dl AS (SELECT DISTINCT day FROM rg),
pde AS ({_hll_est('rg', 'day')}),
cumr AS (SELECT d.day, r.idx, max(r.r) AS r FROM dl d
         JOIN rg r ON r.day <= d.day GROUP BY d.day, r.idx),
cume AS ({_hll_est('cumr', 'day')}),
curve AS (SELECT p.day, round(p.est, 2) AS est_period,
                 round(c.est, 2) AS est_cumulative,
                 round(c.est - COALESCE(lag(c.est) OVER (ORDER BY c.day), 0.0),
                       2) AS est_new
          FROM pde p JOIN cume c ON p.day = c.day),
daysx AS (SELECT strftime(ts, '%Y-%m-%d') AS day, user_id FROM events),
firsts AS (SELECT user_id, min(day) AS first_day FROM daysx GROUP BY user_id),
per_day AS (SELECT day, count(DISTINCT user_id) AS n_active
            FROM daysx GROUP BY day),
novel AS (SELECT first_day AS day, count(*) AS n_new
          FROM firsts GROUP BY first_day),
exacts AS (SELECT p.day, p.n_active,
                  CAST(sum(COALESCE(n.n_new, 0)) OVER (ORDER BY p.day)
                       AS BIGINT) AS cum_distinct
           FROM per_day p LEFT JOIN novel n ON n.day = p.day)
SELECT e.day, e.n_active, e.cum_distinct, v.est_period, v.est_cumulative,
       v.est_new,
       round(abs(v.est_cumulative - e.cum_distinct), 2) AS cum_abs_err
FROM exacts e JOIN curve v ON e.day = v.day
"""


@register("q_user_novelty_hll", oracle=_NOVELTY_HLL_ORACLE)
def q_user_novelty_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL novelty curve (operators/novelty.py): per-day sketches from
    ONE corpus scan, prefix-merged in day order — est_new(i) =
    est(prefix_i) - est(prefix_{i-1}); register-max union means each
    prefix state IS the sketch of the true prefix union. Joined to the
    exact curve; abs_err columns pin accuracy in-row (rel bound pinned
    in tests/test_novelty.py). FULLY oracle-backed — the ESTIMATES
    hash-match too: the DuckDB oracle rebuilds the per-day registers
    bit-for-bit (splitmix64 + exact integer clz via functions/
    sqlhash.py), takes the same running register max for prefixes, and
    evaluates the same Flajolet estimator with linear-counting
    correction; the 2-dp rounding the curve already applies absorbs
    cross-engine last-ulp summation-order differences."""
    from .operators.novelty import novelty_curve

    ev = load_table(spark, sf_dir, "events").select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"), "user_id"
    )
    curve = novelty_curve(ev, "day", "user_id").withColumnRenamed(
        "period", "day"
    )
    exact = q_user_novelty_exact(spark, sf_dir).select(
        "day", "n_active", "cum_distinct"
    )
    return (
        exact.join(curve, "day")
        .withColumn(
            "cum_abs_err",
            F.round(F.abs(F.col("est_cumulative") - F.col("cum_distinct")), 2),
        )
        .orderBy("day")
    )


@register(
    "q_ntok_quantiles_by_source",
    oracle=_SEQ_CTE
    + """
    SELECT source,
           round(CAST(quantile_cont(len(tokens), 0.5) AS DOUBLE), 6)
               AS p50_exact,
           round(CAST(quantile_cont(len(tokens), 0.95) AS DOUBLE), 6)
               AS p95_exact
    FROM sequences GROUP BY source
    """,
)
def q_ntok_quantiles_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-SOURCE exact sequence-length quantiles — the keyed exact
    companion of q_kll_ntok_by_source. Spark `percentile` and DuckDB
    `quantile_cont` share linear interpolation, so the keyed GROUP BY
    hash-matches. At 100 TB the exact form needs a full sort-per-group
    (percentile buffers every value); the sketch companion holds
    O(k log n) per group."""
    seq = sequences_from_documents(spark, sf_dir)
    return seq.groupBy("source").agg(
        F.round(F.expr("percentile(size(tokens), 0.5D)"), 6).alias("p50_exact"),
        F.round(F.expr("percentile(size(tokens), 0.95D)"), 6).alias("p95_exact"),
    )


@register(
    "q_kll_ntok_by_source",
    oracle=_SEQ_CTE
    + """
    SELECT source,
           round(CAST(quantile_cont(len(tokens), 0.5) AS DOUBLE), 6)
               AS p50_exact,
           round(CAST(quantile_cont(len(tokens), 0.95) AS DOUBLE), 6)
               AS p95_exact,
           1 AS p50_in_bound, 1 AS p95_in_bound
    FROM sequences GROUP BY source
    """,
)
def q_kll_ntok_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-SOURCE KLL sequence-length quantiles, certified against the
    exact values — the keyed mergeable-quantile path (one sketch per
    source via map-side combine; sketch rows only shuffle). KLL is the
    one merge-order-DEPENDENT sketch in the repo (compaction coin
    order varies with partitioning), so its raw estimates can never
    hash-match a cross-engine oracle; instead the query emits the
    exact quantiles (hash-matched) plus in-bound FLAGS: the estimate
    must land between the exact quantile values at q ± 3x the
    published rank-error bound (2.296/k^0.9, k=200 — the same 3x
    margin q_ntok_percentile_kll pins). The oracle emits literal 1s,
    so any accuracy regression under ANY partitioning flips a flag and
    fails the driver's value hash."""
    from .operators.sketches import KllQuantiles
    from .sketch.kll import KLLSketch

    eps3 = 3.0 * KLLSketch(200).rank_error()
    seq = sequences_from_documents(spark, sf_dir).withColumn(
        "n_tok", F.size("tokens")
    )
    est = (
        KllQuantiles(k=200, col="n_tok")
        .quantiles_by_key(seq, "source", [0.5, 0.95])
        .groupBy("key")
        .pivot("q", [0.5, 0.95])
        .agg(F.first("value"))
        .select(
            F.col("key").alias("source"),
            F.col("`0.5`").alias("p50_est"),
            F.col("`0.95`").alias("p95_est"),
        )
    )
    bounds = seq.groupBy("source").agg(
        F.expr(f"percentile(size(tokens), {max(0.5 - eps3, 0.0)!r}D)").alias("lo50"),
        F.expr(f"percentile(size(tokens), {min(0.5 + eps3, 1.0)!r}D)").alias("hi50"),
        F.expr(f"percentile(size(tokens), {max(0.95 - eps3, 0.0)!r}D)").alias("lo95"),
        F.expr(f"percentile(size(tokens), {min(0.95 + eps3, 1.0)!r}D)").alias("hi95"),
    )
    exact = q_ntok_quantiles_by_source(spark, sf_dir)
    return (
        exact.join(est, "source")
        .join(bounds, "source")
        .select(
            "source",
            "p50_exact",
            "p95_exact",
            F.when(
                F.col("p50_est").between(F.col("lo50"), F.col("hi50")), 1
            ).otherwise(0).alias("p50_in_bound"),
            F.when(
                F.col("p95_est").between(F.col("lo95"), F.col("hi95")), 1
            ).otherwise(0).alias("p95_in_bound"),
        )
        .orderBy("source")
    )


@register("q_counting_bloom_revoke")
def q_counting_bloom_revoke(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DELETABLE membership — counting Bloom filter revocation
    (sketch/counting.py, operators/sketches.CountingBloomSketch):
    build the corpus filter AND the revoke-set filter (docs of one
    source) through the same mergeable partition-build + tree-merge
    pipeline, subtract ONCE driver-side on two payloads, then probe
    every doc distributed. Invariants surfaced in-row: zero false
    negatives for surviving docs (remaining_present == n_remaining),
    n_sticky == 0 (no counter saturated, so the deletion was exact),
    and revoked docs mostly gone (revoked_present small, FP-bounded).
    At 100 TB this is how DMCA/opt-out removal works WITHOUT
    rebuilding membership from the survivors. Rows-only: sketch-state
    semantics; algebra pinned in tests/test_counting.py."""
    from .operators.sketches import CountingBloomSketch
    from .sketch import CountingBloomFilter

    docs = load_table(spark, sf_dir, "documents").select(
        F.xxhash64("doc_id").alias("key"),
        (F.col("source") == F.lit("src1")).alias("revoked"),
    )
    sk = CountingBloomSketch.for_np(n=50_000, p=1e-6, col="key")
    corpus_payload, n_docs = sk.build_bytes(docs)
    revoke_payload, n_revoked = sk.build_bytes(docs.filter("revoked"))

    cbf = CountingBloomFilter.from_bytes(corpus_payload)
    n_sticky = cbf.subtract_in_place(
        CountingBloomFilter.from_bytes(revoke_payload)
    )
    probe = sk.might_contain_udf(cbf.to_bytes(), spark)
    flags = docs.withColumn("present", probe(F.col("key")))
    stats = flags.groupBy("revoked").agg(
        F.count("*").alias("n"),
        F.sum(F.col("present").cast("long")).alias("n_present"),
    ).collect()
    by = {bool(r.revoked): r for r in stats}
    return spark.createDataFrame(
        [
            (
                int(n_docs),
                int(n_revoked),
                int(by[False].n),
                int(by[False].n_present),
                int(by.get(True).n_present if True in by else 0),
                int(n_sticky),
                round(cbf.saturation_ratio(), 8),
            )
        ],
        "n_docs bigint, n_revoked bigint, n_remaining bigint, "
        "remaining_present bigint, revoked_present bigint, "
        "n_sticky bigint, saturation_ratio double",
    )


@register(
    "q_zone_pruned_read",
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        WHERE o_orderkey BETWEEN (SELECT max(o_orderkey) // 4 FROM orders)
                             AND (SELECT max(o_orderkey) // 2 FROM orders)
    """,
)
def q_zone_pruned_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map FILE PRUNING for RANGE predicates (operators/zonemap.py
    — the companion to q_bloom_pruned_read's point lookups): lay orders
    out range-partitioned across 8 parquet files, build one min/max
    stats row per FILE over o_orderkey (pure Catalyst — the
    user-controlled analogue of Iceberg manifest min-max bounds), then
    answer a BETWEEN over a quarter of the key range by reading only
    the files whose bounds intersect it. Exact bounds give zero false
    negatives, so the pruned scan is provably equal to the oracle's
    full-scan BETWEEN — exactly what the hash check verifies; an
    in-query gate asserts files were genuinely skipped. At 100 TB this
    is manifest-level partition pruning as a first-class, rebuildable
    operator."""
    from .operators.zonemap import zone_map_index, zone_pruned_read

    orders = load_table(spark, sf_dir, "orders")
    scratch = _scratch_dir("zmap")
    orders.repartitionByRange(8, "o_orderkey").write.mode("overwrite").parquet(scratch)
    laid = spark.read.parquet(scratch)
    index = zone_map_index(laid, col="o_orderkey")
    max_key = orders.agg(F.max("o_orderkey")).collect()[0][0]
    rows, files_read = zone_pruned_read(
        spark, scratch, index, col="o_orderkey",
        lower=max_key // 4, upper=max_key // 2,
    )
    if not 0 < files_read < 8:  # the range layout must actually prune
        raise AssertionError(f"zone map failed to prune: {files_read}/8 files")
    return rows.select("o_orderkey", "o_custkey", "o_totalprice")


@register(
    "q_range_layout_prune",
    oracle="""
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_totalprice BETWEEN 50000.0 AND 120000.0
    """,
)
def q_range_layout_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KLL-driven range layout end to end (operators/layout.py): cut 8
    balanced boundaries from ONE mergeable quantile scan (no hidden
    RangePartitioner sampling job, boundaries persistable across
    snapshots), write one range-clustered file per bucket, zone-map the
    layout, and answer a BETWEEN by reading only intersecting files.
    In-query gates: files genuinely pruned, and every bucket's row
    count within the published KLL rank-error of the even share.
    Hash-matched vs DuckDB's full-scan BETWEEN — layout can never
    change results (zero-FN pruning + exact final predicate), only
    balance, and both are asserted."""
    from .operators.layout import write_range_layout
    from .operators.zonemap import zone_map_index, zone_pruned_read

    orders = load_table(spark, sf_dir, "orders")
    scratch = _scratch_dir("rlayout")
    boundaries, rank_err = write_range_layout(orders, scratch, "o_totalprice", 8)
    laid = spark.read.parquet(scratch)
    index = zone_map_index(laid, col="o_totalprice")
    stats = index.select("file", "n_rows").collect()
    total = sum(r["n_rows"] for r in stats)
    n_files = len(stats)
    if n_files != len(boundaries) + 1:
        raise AssertionError(f"{n_files} files for {len(boundaries)} cuts")
    ideal = total / n_files
    worst = max(r["n_rows"] for r in stats)
    if worst > ideal * (1 + n_files * 3 * rank_err) + 1:
        raise AssertionError(f"unbalanced layout: worst file {worst} vs ideal {ideal}")
    rows, files_read = zone_pruned_read(
        spark, scratch, index, col="o_totalprice", lower=50_000.0, upper=120_000.0
    )
    if not 0 < files_read < n_files:
        raise AssertionError(f"layout failed to prune: {files_read}/{n_files}")
    return rows.select("o_orderkey", "o_totalprice")


@register(
    "q_zorder_pruned_read",
    oracle="""
        WITH mk AS (SELECT max(o_orderkey) AS m FROM orders)
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders, mk
        WHERE o_orderkey BETWEEN m // 8 AND (3 * m) // 8
          AND o_totalprice BETWEEN 60000.0 AND 150000.0
    """,
)
def q_zorder_pruned_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-ORDER layout end to end (operators/layout.py write_zorder_
    layout): per-column boundaries from ONE fused KLL scan, Morton
    z-value as a pure Catalyst expression, file cuts from an EXACT tiny
    z-histogram (no RangePartitioner sampling job anywhere), one
    curve-segment file per dir, zone maps over BOTH columns, and a
    conjunctive two-range predicate answered by the per-file bounds
    INTERSECTION (zone_pruned_read_multi). In-query gates: each single
    column's prune alone keeps files the other dimension then removes
    (the multi-dim win a 1-D range layout cannot give), the combined
    read touches <= half the files, and files are balanced within the
    greedy histogram-cut guarantee. Hash-matched vs DuckDB's full-scan
    conjunction — the curve can never change results (zero-FN bounds +
    exact final predicate), only which files are opened. At 100 TB this
    is OPTIMIZE ZORDER BY as a first-class, deterministic, snapshot-
    reusable operator."""
    from .operators.layout import write_zorder_layout
    from .operators.zonemap import zone_map_index, zone_prune, zone_pruned_read_multi

    orders = load_table(spark, sf_dir, "orders")
    scratch = _scratch_dir("zorder")
    layout = write_zorder_layout(
        orders, scratch, ["o_orderkey", "o_totalprice"], 16, bits=3
    )
    n_files = layout.n_files  # 16, or fewer if a cut hit the top cell
    if not 8 <= n_files <= 16:
        raise AssertionError(f"degenerate z layout: {n_files} files")
    laid = spark.read.parquet(scratch)
    idx_key = zone_map_index(laid, col="o_orderkey")
    idx_price = zone_map_index(laid, col="o_totalprice")
    max_key = orders.agg(F.max("o_orderkey")).collect()[0][0]
    lo, hi = max_key // 8, (3 * max_key) // 8
    bounds = {"o_orderkey": (lo, hi), "o_totalprice": (60000.0, 150000.0)}
    per_dim = {
        "o_orderkey": len(zone_prune(idx_key, lower=lo, upper=hi)),
        "o_totalprice": len(zone_prune(idx_price, lower=60000.0, upper=150000.0)),
    }
    stats = idx_key.select("n_rows").collect()
    if len(stats) != n_files:
        raise AssertionError(f"{len(stats)} files written, expected {n_files}")
    ideal = sum(r["n_rows"] for r in stats) / n_files
    worst = max(r["n_rows"] for r in stats)
    if worst > ideal * 1.6 + 2:  # greedy exact-histogram cut guarantee
        raise AssertionError(f"unbalanced z layout: worst {worst} vs ideal {ideal}")
    rows, files_read = zone_pruned_read_multi(
        spark, scratch,
        {"o_orderkey": idx_key, "o_totalprice": idx_price},
        bounds,
    )
    if not 0 < files_read <= n_files // 2:
        raise AssertionError(f"z layout failed to prune: {files_read}/{n_files}")
    for col, kept in per_dim.items():
        if not files_read < kept < n_files:  # both dims must contribute
            raise AssertionError(
                f"dimension {col} did not contribute to pruning: "
                f"{kept} kept alone vs {files_read} combined of {n_files}"
            )
    return rows.select("o_orderkey", "o_custkey", "o_totalprice")


@register(
    "q_event_funnel",
    oracle="""
        WITH w1 AS (
            SELECT user_id, ts, event_type,
                   min(CASE WHEN event_type = 'view' THEN ts END)
                       OVER (PARTITION BY user_id) AS t0
            FROM events WHERE event_type IN ('view', 'click', 'purchase')
        ), w2 AS (
            SELECT *, min(CASE WHEN event_type = 'click' AND ts >= t0
                               AND epoch(ts) <= epoch(t0) + 86400 THEN ts END)
                          OVER (PARTITION BY user_id) AS t1
            FROM w1
        ), w3 AS (
            SELECT *, min(CASE WHEN event_type = 'purchase' AND ts >= t1
                               AND epoch(ts) <= epoch(t0) + 86400 THEN ts END)
                          OVER (PARTITION BY user_id) AS t2
            FROM w2
        ), pu AS (
            SELECT user_id, max(t0) AS t0, max(t1) AS t1, max(t2) AS t2
            FROM w3 GROUP BY user_id
        )
        SELECT 1 AS step, 'view' AS step_name, CAST(count(t0) AS BIGINT) AS n_users,
               CAST(round(count(t0) * 1.0 / count(t0), 6) AS DOUBLE) AS conv FROM pu
        UNION ALL
        SELECT 2, 'click', CAST(count(t1) AS BIGINT),
               CAST(round(count(t1) * 1.0 / count(t0), 6) AS DOUBLE) FROM pu
        UNION ALL
        SELECT 3, 'purchase', CAST(count(t2) AS BIGINT),
               CAST(round(count(t2) * 1.0 / count(t0), 6) AS DOUBLE) FROM pu
    """,
)
def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel with a conversion window (operators/funnel.py):
    view -> click -> purchase within 24h of the first view, reach time
    of step k = min event time at/after step k-1's reach. ONE shuffle
    total: the funnel-type filter reaches the parquet scan, a single
    hash-partition by user feeds the chained conditional-min windows
    (shared partitioning — Catalyst stacks the Window nodes over one
    Exchange+Sort, and the per-user groupBy reuses the partitioning
    with no further Exchange), and the summary is a one-row aggregate
    unpivoted via stack. Hash-matched against DuckDB's identical
    window-chain formulation (fractional-second epochs on both sides —
    a long cast would truncate and disagree at the window edge). An
    in-query gate asserts step counts are non-increasing."""
    from .operators.funnel import funnel

    events = load_table(spark, sf_dir, "events")
    out = funnel(
        events, ["view", "click", "purchase"], within_seconds=86400
    )
    counts = [r["n_users"] for r in out.orderBy("step").collect()]
    if counts != sorted(counts, reverse=True):
        raise AssertionError(f"funnel counts increased: {counts}")
    return out


@register(
    "q_rolling_revenue",
    oracle="""
        WITH d AS (
            SELECT o_orderpriority AS priority, CAST(o_orderdate AS DATE) AS day,
                   sum(CAST(o_totalprice AS DECIMAL(38,4))) AS rev
            FROM orders GROUP BY 1, 2
        )
        SELECT priority, CAST(day AS VARCHAR) AS day, CAST(rev AS DOUBLE) AS rev,
               CAST(sum(rev) OVER (
                    PARTITION BY priority
                    ORDER BY date_diff('day', DATE '1970-01-01', day)
                    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) AS rev_7d
        FROM d
    """,
)
def q_rolling_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-calendar-day revenue per priority class
    (operators/temporal.trailing_day_sum): pre-aggregate to one row per
    (priority, day) FIRST — the RANGE window then runs over the small
    aggregated frame with one Exchange on the key, never over raw
    orders — and frame by day DISTANCE, not row count: a ROWS frame
    silently widens across calendar gaps, a RANGE frame over the
    integer day index does not (pinned with a gap fixture in pytest).
    Money sums stay DECIMAL(38,4) through the window on both engines
    and cast to double only at the edge; hash-matched vs DuckDB's
    identical RANGE formulation."""
    from .operators.temporal import trailing_day_sum

    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderdate").cast("date").alias("day"),
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(38,4)")).alias("rev"))
    out = trailing_day_sum(
        daily, "rev", key_col="priority", date_col="day", days=7, out_col="rev_7d"
    )
    return out.select(
        "priority",
        F.col("day").cast("string").alias("day"),
        F.col("rev").cast("double").alias("rev"),
        F.col("rev_7d").cast("double").alias("rev_7d"),
    )


@register(
    "q_compaction_plan",
    oracle="""
        WITH stats AS (
            SELECT CAST(FLOOR(SQRT(o_orderkey)) AS BIGINT) AS file_id,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   min(o_orderkey) AS min_key
            FROM orders GROUP BY 1
        ),
        c AS (
            SELECT file_id, n_rows, min_key,
                   sum(n_rows) OVER (
                       ORDER BY min_key, file_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) - n_rows AS before
            FROM stats
        )
        SELECT file_id, n_rows, min_key,
               CAST(FLOOR(before / 1000.0) AS BIGINT) AS grp
        FROM c
    """,
)
def q_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planning (operators/compaction.py): the
    order-preserving streaming packer — files sorted by min key, group
    = floor(cumulative rows BEFORE the file / target) — so a range-
    clustered layout keeps contiguous key ranges (and therefore its
    zone-map pruning power) after compaction; no file is ever split and
    no group exceeds target + one file. The manifest here is derived
    relationally (pseudo-files = floor(sqrt(o_orderkey)), linearly
    growing sizes — realistically skewed) so DuckDB can replay the
    IDENTICAL window-cumsum rule; the physical-file path
    (input_file_name + _metadata.file_size manifest, one-shuffle
    one-file-per-group rewrite) is pinned in tests/test_compaction.py.
    The plan window is deliberately global: it runs over the
    file-cardinality manifest, never row data. Hash-matched."""
    from .operators.compaction import compaction_plan

    orders = load_table(spark, sf_dir, "orders")
    stats = orders.groupBy(
        F.floor(F.sqrt(F.col("o_orderkey"))).cast("long").alias("file_id")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("o_orderkey").alias("min_key"),
    )
    return compaction_plan(
        stats,
        file_col="file_id",
        rows_col="n_rows",
        target=1000,
        order_cols=["min_key", "file_id"],
    )


from .operators.graph import pagerank_oracle_sql as _pagerank_oracle_sql

_PAGERANK_EDGES_CTE = """
    SELECT src, dst FROM (
        SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
                        's' || CAST(l_suppkey AS VARCHAR) AS dst
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey) p
    UNION ALL
    SELECT dst AS src, src AS dst FROM (
        SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
                        's' || CAST(l_suppkey AS VARCHAR) AS dst
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey) q
"""


@register(
    "q_pagerank",
    oracle=_pagerank_oracle_sql(_PAGERANK_EDGES_CTE, iters=5, damping=0.85),
)
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the symmetrized customer<->supplier trade graph
    (operators/graph.pagerank): 5 damped power iterations as relational
    ops — the invariant (src, dst, outdeg) edge frame is partitioned by
    src and persisted ONCE, so each iteration reshuffles only the
    node-sized rank frame; ranks localCheckpoint every round (iterative
    plans otherwise grow until the driver dies — cluster.py lesson).
    Hash-matched against the SAME fixed-point-free formulation unrolled
    into 5 chained CTEs in DuckDB (rank * N rounded at 6 keeps ~6
    significant digits; node namespacing 'c'/'s' prevents key
    collisions between the two id spaces)."""
    from .operators.graph import pagerank

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    pairs = (
        orders.join(lineitem, orders["o_orderkey"] == lineitem["l_orderkey"])
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    edges = pairs.union(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    ranks = pagerank(edges, iters=5, damping=0.85)
    n = ranks.count()  # node count: one scalar over the checkpointed frame
    return ranks.select(
        "v", F.round(F.col("r") * F.lit(float(n)), 6).alias("rank_scaled")
    )


@register(
    "q_value_outliers",
    oracle="""
        WITH med AS (
            SELECT event_type, count(value) AS n, median(value) AS med
            FROM events GROUP BY 1
        ),
        mad AS (
            SELECT e.event_type, median(abs(e.value - m.med)) AS mad
            FROM events e JOIN med m USING (event_type) GROUP BY 1
        ),
        fences AS (
            SELECT med.event_type, med.n, med.med, mad.mad,
                   med.med - 3 * 1.4826 * mad.mad AS lo,
                   med.med + 3 * 1.4826 * mad.mad AS hi
            FROM med JOIN mad USING (event_type)
        )
        SELECT f.event_type, f.n,
               round(f.med, 6) AS med, round(f.mad, 6) AS mad,
               round(f.lo, 6) AS lo, round(f.hi, 6) AS hi,
               CAST(sum(CASE WHEN e.value < f.lo OR e.value > f.hi
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        FROM events e JOIN fences f USING (event_type)
        GROUP BY 1, 2, 3, 4, 5, 6
    """,
)
def q_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-type outlier fences over event values
    (operators/outliers.robust_group_stats): exact median + MAD with a
    50% breakdown point instead of the self-contaminating mean/stddev
    rule; fence = med +/- 3 * 1.4826 * MAD. Three aggregation passes of
    (key, double) rows — inherent, the fence doesn't exist until the
    MAD does — every inter-pass join broadcasting the per-group frame.
    Hash-matched vs the identical median/MAD construction in DuckDB
    (medians interpolate the same on both engines; floats rounded at
    the edge, fences compared unrounded)."""
    from .operators.outliers import robust_group_stats

    events = load_table(spark, sf_dir, "events")
    out = robust_group_stats(
        events, value_col="value", key_col="event_type", k=3.0
    )
    return out.select(
        "event_type",
        "n",
        F.round("med", 6).alias("med"),
        F.round("mad", 6).alias("mad"),
        F.round("lo", 6).alias("lo"),
        F.round("hi", 6).alias("hi"),
        "n_outliers",
    )


@register(
    "q_similar_names",
    oracle="""
        WITH t AS (SELECT c_custkey AS id, c_name AS s FROM customer)
        SELECT a.id AS id_a, b.id AS id_b,
               CAST(levenshtein(a.s, b.s) AS BIGINT) AS dist
        FROM t a JOIN t b ON a.id < b.id AND levenshtein(a.s, b.s) <= 1
    """,
)
def q_similar_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance-<=1 name pairs (operators/strings.py symmetric-
    delete blocking): deletion-variant keys are generated inside
    whole-stage codegen, ONE equi-join shuffle of short variant rows
    replaces the O(n^2) all-pairs scan, and every bucket collision is
    re-verified with the exact JVM levenshtein (complete by the
    symmetric-delete property, sound by the verify). The DuckDB oracle
    IS the quadratic formulation — feasible at sf0.01, which is exactly
    why the blocked plan is the one that survives 100 TB and the oracle
    isn't. Hash-matched."""
    from .operators.strings import edit_distance_pairs

    customer = load_table(spark, sf_dir, "customer")
    return edit_distance_pairs(
        customer.select("c_custkey", "c_name"),
        id_col="c_custkey",
        str_col="c_name",
    )


@register(
    "q_retention_cohorts",
    oracle="""
        WITH b AS (
            SELECT user_id, CAST(ts AS DATE) AS d,
                   min(CAST(ts AS DATE)) OVER (PARTITION BY user_id) AS cohort
            FROM events
        ), a AS (
            SELECT user_id, cohort,
                   CAST(floor(date_diff('day', cohort, d) / 7.0) AS INT) AS period
            FROM b
        ), c AS (
            SELECT CAST(cohort AS VARCHAR) AS cohort, period,
                   CAST(count(DISTINCT user_id) AS BIGINT) AS n_active
            FROM a GROUP BY 1, 2
        )
        SELECT cohort, period, n_active,
               CAST(round(n_active * 1.0 /
                    max(CASE WHEN period = 0 THEN n_active END)
                        OVER (PARTITION BY cohort), 6) AS DOUBLE) AS retention
        FROM c
    """,
)
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention (operators/retention.py): users grouped by
    FIRST-activity date, exact distinct actives per (cohort, period of
    7 days since). Day-difference arithmetic only — no
    date_trunc('week'), whose week-start convention differs across
    engines — which is exactly why the whole frame hash-matches
    DuckDB. One user-partitioned window pass computes cohorts (no
    self-join), one (cohort, period) aggregate carries triples only.
    In-query gate: every cohort's period-0 retention is exactly 1.0."""
    from .operators.retention import retention_cohorts

    events = load_table(spark, sf_dir, "events")
    out = retention_cohorts(events).withColumn(
        "cohort", F.col("cohort").cast("string")
    )
    bad = out.filter((F.col("period") == 0) & (F.col("retention") != 1.0)).count()
    if bad:
        raise AssertionError(f"{bad} cohorts with period-0 retention != 1")
    return out


@register(
    "q_table_profile",
    oracle="""
        SELECT 'o_custkey' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(*) - count(o_custkey) AS BIGINT) AS n_nulls,
               CAST(min(o_custkey) AS DOUBLE) AS min_num,
               CAST(max(o_custkey) AS DOUBLE) AS max_num,
               CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
        FROM orders
        UNION ALL
        SELECT 'o_totalprice', CAST(count(*) AS BIGINT),
               CAST(count(*) - count(o_totalprice) AS BIGINT),
               CAST(min(o_totalprice) AS DOUBLE), CAST(max(o_totalprice) AS DOUBLE),
               CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
        FROM orders
        UNION ALL
        SELECT 'o_orderstatus', CAST(count(*) AS BIGINT),
               CAST(count(*) - count(o_orderstatus) AS BIGINT),
               CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
               CAST(min(o_orderstatus) AS VARCHAR), CAST(max(o_orderstatus) AS VARCHAR)
        FROM orders
    """,
)
def q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style one-scan profiler (operators/profile.py): exact
    row/null/min/max stats ride the sketch pass as df.observe metrics
    while the SAME scan folds every column into an HLL (ndv), numeric
    columns into a KLL (quantiles), and integer columns into a
    Misra-Gries (hot values) — one job, sketch rows only on the
    shuffle. The returned frame is the EXACT half, hash-matched against
    DuckDB's full aggregates; the estimates are audited in-query
    against exact counterparts within their published bounds (HLL
    1.04/sqrt(2^p), KLL rank error). At 100 TB this is the per-snapshot
    statistics pass every layout/advisor decision in the repo feeds
    on, at the cost of one corpus read."""
    from .operators.profile import profile_table

    orders = load_table(spark, sf_dir, "orders")
    cols = ["o_custkey", "o_totalprice", "o_orderstatus"]
    by = {p.column: p for p in profile_table(orders, cols)}
    exact = orders.agg(
        F.countDistinct("o_custkey").alias("ndv_cust"),
        F.countDistinct("o_orderstatus").alias("ndv_status"),
        F.expr("percentile(o_totalprice, 0.5)").alias("p50"),
    ).collect()[0]
    for col, exact_ndv in (
        ("o_custkey", exact["ndv_cust"]),
        ("o_orderstatus", exact["ndv_status"]),
    ):
        p = by[col]
        if abs(p.ndv_est - exact_ndv) > 4 * p.ndv_rel_error * exact_ndv + 1:
            raise AssertionError(
                f"{col} ndv estimate {p.ndv_est} vs exact {exact_ndv} out of bound"
            )
    price = by["o_totalprice"]
    est_p50 = price.quantiles[0.5]
    rank = (
        orders.filter(F.col("o_totalprice") <= F.lit(est_p50)).count() / price.n_rows
    )
    if abs(rank - 0.5) > 3 * price.quantile_rank_error + 1e-3:
        raise AssertionError(f"p50 estimate rank {rank} outside KLL bound")
    rows = [
        (
            p.column,
            p.n_rows,
            p.n_nulls,
            float(p.min_value) if p.column != "o_orderstatus" else None,
            float(p.max_value) if p.column != "o_orderstatus" else None,
            p.min_value if p.column == "o_orderstatus" else None,
            p.max_value if p.column == "o_orderstatus" else None,
        )
        for p in (by[c] for c in cols)
    ]
    return spark.createDataFrame(
        rows,
        "col_name string, n_rows bigint, n_nulls bigint, "
        "min_num double, max_num double, min_str string, max_str string",
    )


@register(
    "q_join_advisor",
    oracle="""
        SELECT c_mktsegment,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE) AS revenue
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
    """,
)
def q_join_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-driven join planning end to end (operators/advisor.py):
    ONE fused CMS+HLL+MG scan per side profiles the join key, the
    advisor picks the strategy (customer is the small side here, so
    broadcast — at 100 TB the decision that avoids shuffling the fact
    table entirely), execute_join applies it, and the joined aggregate
    hash-matches DuckDB's plain join: strategy choices can never change
    results, only physical shape. In-query gates: the advice IS
    broadcast_right, BroadcastHashJoin IS in the executed plan, and the
    CMS inner-product size estimate brackets the exact join size
    (every order has a valid customer, so exact = |orders|) within the
    published eps*Na*Nb cap."""
    import contextlib
    import io

    from .operators.advisor import advise_join, execute_join, profile_join_side
    from .sketch import CountMinSketch

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    pf = profile_join_side(orders.select("o_custkey"), "o_custkey")
    pd_ = profile_join_side(cust.select("o_custkey"), "o_custkey")
    adv = advise_join(pf, pd_, broadcast_rows=max(pd_.n_rows, 1))
    if adv.strategy != "broadcast_right":
        raise AssertionError(f"expected broadcast_right, got {adv.strategy}")
    eps, _delta = CountMinSketch.from_bytes(pf.cms_payload).error_bound()
    exact_out = pf.n_rows  # FK join: every order matches one customer
    if not exact_out <= adv.est_out_rows <= exact_out + eps * pf.n_rows * pd_.n_rows:
        raise AssertionError(f"join-size estimate out of bound: {adv}")
    joined = execute_join(orders, cust, "o_custkey", adv)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        joined.explain("formatted")
    if "BroadcastHashJoin" not in buf.getvalue():
        raise AssertionError("advised broadcast join did not broadcast")
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(38,4)")).cast("double").alias("revenue"),
    )


@register(
    "q_hll_rollup",
    oracle="""
        WITH e AS (
            SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, user_id
            FROM events
        )
        SELECT event_type, day,
               CAST(2 - GROUPING(event_type) - GROUPING(day) AS INT) AS level,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct
        FROM e GROUP BY ROLLUP(event_type, day)
    """,
)
def q_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count CUBE (operators/cube.py): ONE scan
    builds a per-(type, day) HLL cell (map-side combined), then every
    coarser level — per-type subtotals and the grand total — comes from
    merging CELL PAYLOADS, never re-reading the corpus (an exact
    GROUPING SETS re-aggregates the data once per level; at 100 TB the
    rollup moves |cells| x 16 KiB instead). Merge-exactness (the
    reference's algebra, mod.rs:621-761) makes each rolled payload
    bitwise the direct build of that group, so every level keeps the
    plain 1.04/sqrt(2^p) bound — asserted in-query against the exact
    rollup on every row (estimates AND occurrence counts); the emitted
    deterministic columns hash-match DuckDB's GROUP BY ROLLUP."""
    from .operators.cube import hll_rollup

    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    rolled = hll_rollup(ev, ["event_type", "day"], "user_id", p=14)
    exact = ev.rollup("event_type", "day").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.countDistinct("user_id").cast("long").alias("exact_distinct"),
        (F.lit(2) - F.grouping("event_type") - F.grouping("day"))
        .cast("int")
        .alias("level"),
    )
    joined = rolled.join(
        exact,
        on=[
            rolled["event_type"].eqNullSafe(exact["event_type"]),
            rolled["day"].eqNullSafe(exact["day"]),
            rolled["level"] == exact["level"],
        ],
        how="full_outer",
    )
    se = 1.04 / (2.0 ** 7)  # p=14 -> 1.04/sqrt(2^14)
    bad = joined.filter(
        F.col("est_distinct").isNull()
        | F.col("exact_distinct").isNull()
        | (F.col("n_items") != F.col("n_rows"))
        | (
            F.abs(F.col("est_distinct") - F.col("exact_distinct"))
            > F.greatest(F.lit(3.0) * F.lit(se) * F.col("exact_distinct"), F.lit(3.0))
        )
    ).count()
    if bad:
        raise AssertionError(f"{bad} rollup cells failed the HLL bound / count audit")
    return exact.select("event_type", "day", "level", "n_rows", "exact_distinct")


@register(
    "q_inverted_index",
    oracle=_SEQ_CTE
    + """
    , pairs AS (
        SELECT doc_id, unnest(tokens) AS token FROM sequences
    ), per_doc AS (
        SELECT token, doc_id, count(*) AS tf FROM pairs GROUP BY token, doc_id
    ), idx AS (
        SELECT token,
               CAST(count(*) AS BIGINT) AS df,
               CAST(sum(tf) AS BIGINT) AS cf,
               md5(string_agg(doc_id, ',' ORDER BY doc_id)) AS postings_md5
        FROM per_doc GROUP BY token HAVING count(*) >= 2
    )
    SELECT CAST(token AS BIGINT) AS token, df, cf, postings_md5
    FROM idx ORDER BY df DESC, token LIMIT 100
    """,
)
def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build (operators/postings.py): per token the
    SORTED posting list (deterministic under any partitioning — a bare
    collect_list would be partition-ordered), df and cf, with rare
    tokens (df < 2) pruned BEFORE any list is collected (the map-side-
    combined df pass + broadcast semi-join keeps the heavy hapax tail
    out of collect_list memory — the 100-TB index build's cap). Posting
    MEMBERSHIP AND ORDER are pinned by md5 over the comma-joined list,
    hash-matched against DuckDB re-deriving identical lists."""
    from .operators.postings import posting_lists

    seq = sequences_from_documents(spark, sf_dir)
    idx = posting_lists(seq, min_df=2)
    return (
        idx.select(
            "token",
            "df",
            "cf",
            F.md5(F.concat_ws(",", F.col("postings"))).alias("postings_md5"),
        )
        .orderBy(F.desc("df"), "token")
        .limit(100)
    )


def _skewed_key_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> one BIGINT shuffle key per row, 80% collapsed onto
    key 7 (the numeric twin of q_salted_skew_build's 'head' key; cold
    keys offset past any doc_id so they never collide with 7)."""
    docs = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("long")
    return docs.select(
        F.when(did % 5 < 4, F.lit(7).cast("long"))
        .otherwise(did + F.lit(1_000_000))
        .alias("key")
    )


_SKEW_KEY_SQL = """
    SELECT CASE WHEN CAST(doc_id AS BIGINT) % 5 < 4 THEN 7
                ELSE CAST(doc_id AS BIGINT) + 1000000 END AS key
    FROM documents
"""


@register(
    "q_key_skew_exact",
    oracle=f"""
        WITH keyed AS ({_SKEW_KEY_SQL}),
             counts AS (SELECT key, count(*) AS c FROM keyed GROUP BY key)
        SELECT CAST(sum(c) AS BIGINT)   AS f1,
               CAST(sum(c * c) AS BIGINT) AS f2,
               CAST(count(*) AS BIGINT) AS ndv,
               arg_max(key, c)          AS hot_key,
               CAST(max(c) AS BIGINT)   AS hot_count
        FROM counts
    """,
)
def q_key_skew_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact skew moments of a hot shuffle key, pure Catalyst: per-key
    counts then F1 = sum(c), F2 = sum(c^2) (the second frequency
    moment), ndv, and the argmax hot key. This is the exact companion
    that q_key_skew_profile's one-scan sketch estimates audit against —
    and at 100 TB it is also the job you CANNOT afford on a hot key
    (the GROUP BY shuffles the very key being diagnosed), which is why
    the sketch path exists."""
    counts = (
        _skewed_key_frame(spark, sf_dir)
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return counts.agg(
        F.sum("c").cast("long").alias("f1"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("f2"),
        F.count(F.lit(1)).cast("long").alias("ndv"),
        F.max_by("key", "c").alias("hot_key"),
        F.max("c").cast("long").alias("hot_count"),
    )


@register("q_key_skew_profile")
def q_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-driven skew diagnosis (operators/skew.py): ONE corpus
    scan folds the key column into CountSketch (F2, sketch/ams.py) +
    HLL (ndv) + Misra-Gries (which keys are hot) via build_multi — only
    sketch rows shuffle, no key data ever concentrates — then emits the
    salting plan the salted build (q_salted_skew_build) would execute.
    In-query audit vs the exact Catalyst moments: F2 within 3x
    sqrt(2/w), ndv within 3x 1.04/sqrt(2^p), MG bounds bracket the true
    hot count, and the hot key is identified exactly. Merge algebra per
    the reference's axioms (mod.rs:621-761): the profile is partition-
    order invariant."""
    from .operators.skew import key_skew_profile

    keyed = _skewed_key_frame(spark, sf_dir)
    prof = key_skew_profile(keyed, "key", w=8192, mg_capacity=64)
    exact = (
        keyed.groupBy("key")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(
            F.sum("c").alias("f1"),
            F.sum(F.col("c") * F.col("c")).alias("f2"),
            F.count(F.lit(1)).alias("ndv"),
            F.max_by("key", "c").alias("hot_key"),
            F.max("c").alias("hot_count"),
        )
        .collect()[0]
    )
    f2_rel = abs(prof.f2_est - exact["f2"]) / exact["f2"]
    ndv_rel = abs(prof.ndv_est - exact["ndv"]) / exact["ndv"]
    if f2_rel > 3 * prof.f2_rel_error:
        raise AssertionError(f"F2 estimate out of bound: rel err {f2_rel}")
    if ndv_rel > 3 * prof.ndv_rel_error:
        raise AssertionError(f"ndv estimate out of bound: rel err {ndv_rel}")
    if prof.n_rows != exact["f1"]:
        raise AssertionError("row count drifted between scan and exact job")
    top = prof.hot_keys[0]
    if top.key != exact["hot_key"] or not top.est <= exact["hot_count"] <= top.ub:
        raise AssertionError("MG hot-key bounds failed to bracket the truth")
    plan = prof.salting_plan(n_partitions=32)
    return spark.createDataFrame(
        [
            (
                int(prof.n_rows),
                int(prof.f2_est),
                round(float(f2_rel), 6),
                int(round(prof.ndv_est)),
                round(float(ndv_rel), 6),
                round(float(prof.uniformity_ratio), 3),
                int(top.key),
                round(float(top.share_ub), 6),
                int(plan.get(top.key, 0)),
            )
        ],
        schema=(
            "f1 bigint, f2_est bigint, f2_rel_err double, ndv_est bigint, "
            "ndv_rel_err double, uniformity_ratio double, hot_key bigint, "
            "hot_share_ub double, salt_fanout int"
        ),
    )


@register(
    "q_bloom_pruned_read",
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        WHERE o_orderkey % 997 = 0
    """,
)
def q_bloom_pruned_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-indexed FILE PRUNING (operators/pruning.py): lay orders out
    range-partitioned across 8 parquet files, build one Bloom sketch per
    FILE over o_orderkey (the user-controlled analogue of Iceberg /
    parquet row-group Bloom metadata, reusing checkpoint._file_sketches),
    then answer a point-lookup by reading ONLY the files whose filter
    might contain a probe key. Zero false negatives (reference contract
    mod.rs:199-228) make the pruned scan provably equal to the oracle's
    full-scan IN-filter — which is exactly what the hash check verifies.
    At 100 TB this turns a corpus-wide point lookup into a handful of
    file reads."""
    from .operators.pruning import bloom_file_index, bloom_pruned_read
    from .sketch import Shape

    orders = load_table(spark, sf_dir, "orders")
    scratch = _scratch_dir("prune")
    orders.repartitionByRange(8, "o_orderkey").write.mode("overwrite").parquet(scratch)
    laid = spark.read.parquet(scratch)
    # n sized for ~sf1 per-file counts; zero-FN holds regardless of n
    index = bloom_file_index(laid, Shape.for_np(250_000, 0.001), key_col="o_orderkey")
    keys = [
        r["o_orderkey"]
        for r in laid.filter(F.col("o_orderkey") % 997 == 0)
        .select("o_orderkey")
        .collect()
    ]
    rows, _files_read = bloom_pruned_read(
        spark, scratch, index, keys, key_col="o_orderkey"
    )
    return rows.select("o_orderkey", "o_custkey", "o_totalprice")


@register(
    "q_xor_pruned_read",
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        WHERE o_orderkey % 17 = 3
          AND o_orderkey * 8 <= (SELECT max(o_orderkey) FROM orders)
    """,
)
def q_xor_pruned_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STATIC xor-filter file pruning (sketch/xorfilter.py +
    operators/pruning.py::xor_file_index): the space-optimal static
    tier of the AMQ family — ~19.7 bits/key at FPR exactly 2^-16 vs a
    Bloom row's 23.1 bits/key at the same p, built once per file by
    hypergraph peeling (Graf & Lemire 2020) and immutable after. Same
    index schema as the Bloom file index, so prune_files/
    bloom_pruned_read run unchanged via magic dispatch. The probe keys
    sit in the LOW o_orderkey band of a range-partitioned layout, so
    the index actually skips files; zero FN (reference contract
    mod.rs:199-228 — here by construction of the xor identity) makes
    the pruned scan hash-equal to the oracle's full-scan filter."""
    from .operators.pruning import bloom_pruned_read, xor_file_index

    orders = load_table(spark, sf_dir, "orders")
    scratch = _scratch_dir("xorprune")
    orders.repartitionByRange(8, "o_orderkey").write.mode("overwrite").parquet(scratch)
    laid = spark.read.parquet(scratch)
    index = xor_file_index(laid, key_col="o_orderkey")
    hi = laid.agg(F.max("o_orderkey").alias("m")).collect()[0]["m"]
    keys = [
        r["o_orderkey"]
        for r in laid.filter(
            (F.col("o_orderkey") % 17 == 3) & (F.col("o_orderkey") * 8 <= hi)
        )
        .select("o_orderkey")
        .collect()
    ]
    rows, _files_read = bloom_pruned_read(
        spark, scratch, index, keys, key_col="o_orderkey"
    )
    return rows.select("o_orderkey", "o_custkey", "o_totalprice")


@register(
    "q_streaming_dedup",
    oracle="SELECT DISTINCT md5(substr(text, 1, 40)) AS fp FROM documents",
)
def q_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming EXACT dedup, hash-matched against batch SQL: the
    documents table (with its planted prefix-fingerprint duplicates)
    replayed as 4 file-source micro-batches through Spark's native
    stateful ``dropDuplicates`` — keep-first across batches, append
    mode, so the memory sink accumulates each fingerprint exactly once
    and the final table IS the batch DISTINCT set regardless of how
    the stream was split. State here grows with the key count (exact);
    the bounded-state scale path is streaming/dedup.py's Bloom-state
    variant (q_streaming_bloom_dedup)."""
    import uuid

    _docs, stream = _stream_fp_source(spark, sf_dir)
    name = "rbf_stream_dedup_" + uuid.uuid4().hex[:8]
    ckpt = _scratch_dir("sdedup_ckpt")
    q = (
        stream.dropDuplicates(["fp"])
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    _await_stream(q)
    return spark.table(name)


@register("q_streaming_bloom_dedup")
def q_streaming_bloom_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BOUNDED-STATE streaming dedup (streaming/dedup.py): one Bloom
    payload per fingerprint shard as applyInPandasWithState state —
    total state is n_shards x filter bytes FOREVER, vs dropDuplicates'
    one-state-row per distinct key (the difference at 10^12 docs).
    Invariants surfaced in-row against the exact batch answer:
    n_dup_emissions == 0 (zero FN — an admitted fingerprint is never
    emitted again) and n_wrongly_dropped small (FP-bounded, configured
    p=1e-8 over ~476 keys). Rows-only: sketch-state semantics; the
    keep-first contract is pinned in tests/test_streaming_dedup.py."""
    import uuid

    from .streaming import streaming_bloom_dedup

    docs, stream = _stream_fp_source(spark, sf_dir)
    out = streaming_bloom_dedup(stream, fp_col="fp", n_total=5_000, p=1e-8, n_shards=4)
    name = "rbf_sbloom_dedup_" + uuid.uuid4().hex[:8]
    ckpt = _scratch_dir("sbdedup_ckpt")
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    _await_stream(q)
    emitted = spark.table(name)
    exact = docs.select("fp").distinct()
    n_emitted = emitted.count()
    n_dup_emissions = n_emitted - emitted.distinct().count()
    n_exact = exact.count()
    n_wrongly_dropped = n_exact - exact.join(emitted, "fp", "left_semi").count()
    return spark.createDataFrame(
        [(int(docs.count()), int(n_exact), int(n_emitted),
          int(n_dup_emissions), int(n_wrongly_dropped))],
        "n_in bigint, n_distinct_exact bigint, n_emitted bigint, "
        "n_dup_emissions bigint, n_wrongly_dropped bigint",
    )


@register(
    "q_embedding_centroids",
    oracle="""
        -- DuckDB v1.0 lacks WITH ORDINALITY; the synthetic embeddings
        -- table is fixed 64-dim, so a constant series recovers positions
        -- (a dim mismatch would surface as a row-count/hash FAIL)
        SELECT label, CAST(i - 1 AS INT) AS pos,
               round(avg(embedding[CAST(i AS INT)]), 6) AS centroid,
               count(*) AS n_vecs
        FROM embeddings CROSS JOIN generate_series(1, 64) AS t(i)
        GROUP BY 1, 2
    """,
)
def q_embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding CENTROIDS, Catalyst end to end: posexplode
    the vector column, one hash aggregate over (label, dim) — the
    domain-drift / cluster-health diagnostic of an embedding corpus.
    Map-side combine caps the shuffle at tasks x |labels| x dim rows,
    independent of corpus size; no Python touches a row. avg runs in
    double on both engines; round(6) per the cross-engine float
    convention (contract header)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select("label", F.posexplode("embedding").alias("pos", "v"))
        .groupBy("label", "pos")
        .agg(
            F.round(F.avg("v"), 6).alias("centroid"),
            F.count("*").alias("n_vecs"),
        )
        .orderBy("label", "pos")
    )


@register(
    "q_source_token_drift",
    oracle=_SEQ_CTE
    + """
    , toks AS (SELECT source, unnest(tokens) AS tok FROM sequences),
    per_src AS (SELECT source, tok, count(*) AS c FROM toks GROUP BY 1, 2),
    src_tot AS (SELECT source, sum(c) AS n_src FROM per_src GROUP BY 1),
    gmarg   AS (SELECT tok, sum(c) AS g FROM per_src GROUP BY 1),
    tot     AS (SELECT sum(c) AS n_tot FROM per_src)
    SELECT source,
           CAST(n_src AS BIGINT) AS n_tokens,
           round(sum((c::DOUBLE / n_src)
                     * ln((c::DOUBLE / n_src) / (g::DOUBLE / n_tot))), 6)
               AS kl_drift
    FROM per_src JOIN src_tot USING (source) JOIN gmarg USING (tok)
         CROSS JOIN tot
    GROUP BY source, n_src
    """,
)
def q_source_token_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-distribution DRIFT: KL(P_source || P_corpus)
    over unigram frequencies — the snapshot/domain shift diagnostic a
    curation pipeline runs before mixing a new source into training
    data (a source whose token distribution diverges from the corpus
    gets flagged for re-weighting; compare q_temperature_mix).

    Scale shape: ONE corpus scan (structurally — a single lineage, no
    self-joins; separate aggregate branches would rescan, ReuseExchange
    does NOT canonicalize them together, measured) feeds a map-side-
    combinable (source, tok) count whose shuffle is bounded by
    sources x vocab, not corpus size. The per-source, per-token, and
    grand totals are WINDOW sums over that vocab-sized frame; the
    unpartitioned grand-total window moves sources x vocab rows to one
    task — corpus-size-independent, ~1M rows at web scale. KL sums
    ~vocab doubles of magnitude <=1e-4, so cross-engine addition order
    stays far inside the round(6) convention."""
    seq = sequences_from_documents(spark, sf_dir)
    per_src = (
        seq.select("source", F.explode("tokens").alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count("*").alias("c"))
    )
    enriched = (
        per_src.withColumn("n_src", F.sum("c").over(Window.partitionBy("source")))
        .withColumn("g", F.sum("c").over(Window.partitionBy("tok")))
        .withColumn("n_tot", F.sum("c").over(Window.partitionBy()))
    )
    p_s = F.col("c").cast("double") / F.col("n_src")
    p_g = F.col("g").cast("double") / F.col("n_tot")
    return (
        enriched.groupBy("source", "n_src")
        .agg(F.round(F.sum(p_s * F.log(p_s / p_g)), 6).alias("kl_drift"))
        .select(
            "source",
            F.col("n_src").cast("bigint").alias("n_tokens"),
            "kl_drift",
        )
    )


@register(
    "q_tfidf_top_terms",
    oracle=_SEQ_CTE
    + """
    , toks AS (SELECT source, unnest(tokens) AS tok FROM sequences),
    per     AS (SELECT source, tok, count(*) AS c FROM toks GROUP BY 1, 2),
    src_tot AS (SELECT source, sum(c) AS n_src FROM per GROUP BY 1),
    dfreq   AS (SELECT tok, count(*) AS df FROM per GROUP BY 1),
    ns      AS (SELECT count(DISTINCT source) AS n_sources FROM per),
    scored  AS (
        SELECT source, tok,
               round((c::DOUBLE / n_src)
                     * ln(n_sources::DOUBLE / df), 6) AS score
        FROM per JOIN src_tot USING (source) JOIN dfreq USING (tok)
             CROSS JOIN ns
    )
    SELECT source,
           CAST(row_number() OVER (PARTITION BY source
                                   ORDER BY score DESC, tok) AS INT) AS rn,
           tok, score
    FROM scored
    QUALIFY rn <= 5
    """,
)
def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 TF-IDF terms per SOURCE (each source treated as one
    "document" over the corpus vocabulary) — the domain keyword
    extraction a curation pipeline runs to label what a new crawl
    source is actually about before mixing it in.

    Scale shape: one corpus scan feeds a map-side-combinable
    (source, tok) count; everything downstream (per-source totals,
    document frequency, the rank window) operates on the vocab-sized
    frame, so shuffles are bounded by sources x vocab — corpus-size-
    independent. The source-count scalar joins back via a broadcast
    1-row cross join (no driver collect). Determinism: rank orders by
    the ROUNDED score (round-6 per the cross-engine float convention)
    with tok as the full tie-break, identical on both engines."""
    seq = sequences_from_documents(spark, sf_dir)
    per = (
        seq.select("source", F.explode("tokens").alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count("*").alias("c"))
    )
    enriched = per.withColumn(
        "n_src", F.sum("c").over(Window.partitionBy("source"))
    ).withColumn("df", F.count("*").over(Window.partitionBy("tok")))
    n_sources = per.select(F.countDistinct("source").alias("n_sources"))
    tf = F.col("c").cast("double") / F.col("n_src")
    idf = F.log(F.col("n_sources").cast("double") / F.col("df"))
    scored = enriched.crossJoin(F.broadcast(n_sources)).select(
        "source", "tok", F.round(tf * idf, 6).alias("score")
    )
    rank_w = Window.partitionBy("source").orderBy(
        F.col("score").desc(), F.col("tok").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(rank_w))
        .filter(F.col("rn") <= 5)
        .select("source", "rn", "tok", "score")
    )


@register(
    "q_embedding_gram",
    oracle="""
        -- exact corpus Gram, upper triangle; constant series indexes the
        -- fixed 64-dim vectors (DuckDB v1.0 lacks WITH ORDINALITY). The
        -- +0 after round() normalizes -0.0 on both engines.
        SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j,
               round(sum(CAST(embedding[CAST(i + 1 AS INT)] AS DOUBLE)
                         * CAST(embedding[CAST(j + 1 AS INT)] AS DOUBLE)), 6) + 0 AS g
        FROM embeddings
        CROSS JOIN generate_series(0, 63) t(i)
        CROSS JOIN generate_series(0, 63) u(j)
        WHERE i <= j AND embedding IS NOT NULL AND len(embedding) = 64
        GROUP BY 1, 2
    """,
)
def q_embedding_gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact one-pass distributed Gram/covariance of the embedding
    corpus (operators/spectral.py::embedding_gram): each task folds its
    Arrow batches through one BLAS X^T X into a d x d accumulator;
    only d x d payloads shuffle (tree merge), so the plan is
    corpus-size-independent past the scan. The upper-triangle frame is
    d(d+1)/2 rows — bounded by embedding WIDTH, never corpus size.
    Products/sums in float64 on both engines, round-6 per the
    cross-engine float convention."""
    from .operators.spectral import embedding_gram

    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_gram(emb, 64)


@register("q_embedding_spectrum")  # estimates: rows-only + in-row bound audit
def q_embedding_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-16 spectrum of the corpus Gram via Frequent Directions
    (sketch/freqdirs.py — Misra-Gries lifted to matrices), self-audited
    in-row against the exact Gram eigenvalues: the FD sandwich plus
    Weyl's inequality certify 0 <= exact - est <= delta per component,
    and the `in_bound` column witnesses it for the driver's rows-only
    check. ell*d state (vs d^2 exact) is the scale path when d^2
    outgrows a task."""
    from .operators.spectral import embedding_spectrum

    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_spectrum(emb, ell=16, dim=64)


@register(
    "q_collocations_pmi",
    oracle=_SEQ_CTE
    + """
    , pairs AS (
        SELECT pair // 50261 AS left_tok, pair % 50261 AS right_tok,
               count(*) AS pair_freq
        FROM (SELECT unnest(list_transform(range(len(tokens) - 1),
                  i -> CAST(tokens[i+1] AS BIGINT) * 50261 + tokens[i+2])) AS pair
              FROM sequences WHERE len(tokens) >= 2) t
        GROUP BY 1, 2 HAVING count(*) >= 5
    ), uni AS (
        SELECT tok, count(*) AS uni_freq
        FROM (SELECT unnest(tokens) AS tok FROM sequences) u GROUP BY tok
    ), totals AS (
        SELECT CAST(sum(len(tokens)) AS BIGINT) AS n_tokens,
               CAST(sum(greatest(len(tokens) - 1, 0)) AS BIGINT) AS n_pairs
        FROM sequences
    )
    SELECT left_tok, right_tok, pair_freq,
           round(ln(CAST(pair_freq AS DOUBLE) * n_tokens * n_tokens
                    / (CAST(n_pairs AS DOUBLE) * l.uni_freq * r.uni_freq)),
                 6) AS pmi
    FROM pairs
    JOIN uni l ON l.tok = left_tok
    JOIN uni r ON r.tok = right_tok
    CROSS JOIN totals
    ORDER BY pmi DESC, left_tok, right_tok LIMIT 50
    """,
)
def q_collocations_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PMI collocation mining (operators/collocations.py): top-50
    adjacent token pairs by pointwise mutual information among pairs
    seen >= 5 times — the association statistic that surfaces
    boilerplate phrases and tokenizer-merge candidates raw frequency
    misses. One corpus scan, two map-side-combined hash aggregates
    (pair counts bounded by distinct adjacent pairs, unigrams bounded
    by vocab); unigrams and totals broadcast, so nothing reshuffles
    with corpus size. Integer counts until the final single ln(),
    rounded 6 dp both engines; the top-50 cut orders by the ROUNDED
    pmi so the limit boundary is reproducible cross-engine."""
    from .operators.collocations import pmi_collocations

    seq = sequences_from_documents(spark, sf_dir)
    return pmi_collocations(seq, min_count=5, top_n=50)


@register(
    "q_sliding_distinct",
    oracle="""
    WITH ev AS (
        SELECT CAST(ts AS DATE) AS day, user_id FROM events
    ), d AS (SELECT DISTINCT day FROM ev)
    SELECT strftime(d.day, '%Y-%m-%d') AS day,
           count(DISTINCT e.user_id) AS distinct_ids
    FROM d JOIN ev e ON e.day BETWEEN d.day - 6 AND d.day
    GROUP BY 1
    """,
)
def q_sliding_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact trailing-7-day active users per observed day
    (operators/sliding.py::sliding_distinct_exact). Distinct counts
    don't subtract, so the scalable exact plan expands each event
    map-side into the <=7 window days it reaches — one shuffle of
    (window_day, user) pairs, map-side-deduplicated, never a per-day
    recount of the trailing corpus. Hash-matched vs DuckDB's
    range-join formulation; the HLL companion
    (q_sliding_distinct_hll) gets the same curve from one scan plus
    |days| sketch rows."""
    from .operators.sliding import sliding_distinct_exact

    ev = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    return sliding_distinct_exact(ev, "day", "user_id", days=7)


@register("q_sliding_distinct_hll")  # estimate: rows-only + in-row audit
def q_sliding_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day actives from per-day HLL sketches
    (operators/sliding.py::sliding_distinct_hll): ONE corpus scan
    builds a sketch per day; every window is a payload merge over <=7
    sketch ROWS — the production "N-day actives" pattern where window
    length never changes scan count. Register-max union is exact on
    states, so each window keeps the plain 1.04/sqrt(2^p) bound;
    in-row audit joins the exact companion and witnesses rel_err
    within 3x the bound for the driver's rows-only check."""
    from .operators.sliding import sliding_distinct_exact, sliding_distinct_hll

    p = 14
    ev = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    est = sliding_distinct_hll(ev, "day", "user_id", days=7, p=p)
    exact = sliding_distinct_exact(ev, "day", "user_id", days=7)
    bound = 3 * 1.04 / (2.0**p) ** 0.5
    return (
        exact.join(est, "day")
        .withColumn(
            "rel_err",
            F.round(
                F.abs(F.col("distinct_est") - F.col("distinct_ids"))
                / F.col("distinct_ids"),
                6,
            ),
        )
        .withColumn("in_bound", F.col("rel_err") <= F.lit(bound))
        .orderBy("day")
    )


@register("q_bigram_lm_cms")  # estimate: rows-only + in-row audit
def q_bigram_lm_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM fluency scores from broadcast count-min payloads
    (operators/lm.py) — the sketch-replaces-table form of
    q_bigram_lm_scores: the corpus bigram table (vocab²-bounded,
    billions of rows at 100 TB, an unavoidable shuffle-merge join in
    the exact plan) collapses to two ~5 MiB CMS payloads broadcast to
    a map-only vectorized scorer; nothing corpus-scale shuffles.
    In-row audit joins the exact companion per doc: abs_err carries
    the CMS count-overestimate drift (<= ln(1+eps·N/(c+1)) per pair,
    eps = 2/w). On this corpus the distinct pair set (~vocab'^2 for
    the small generator vocab) 5-row-collides with P~1e-9, so scores
    are exactly equal — in_bound gates abs_err <= 1e-3 with that
    margin documented, not assumed."""
    from .operators.dedup import bigram_lm_scores
    from .operators.lm import bigram_lm_scores_cms

    seq = sequences_from_documents(spark, sf_dir)
    exact = bigram_lm_scores(seq)
    est = bigram_lm_scores_cms(seq)
    return (
        exact.join(est, ["doc_id", "n_pairs"])
        .withColumn(
            "abs_err", F.round(F.abs(F.col("lm_score_cms") - F.col("lm_score")), 6)
        )
        .withColumn("in_bound", F.col("abs_err") <= 1e-3)
        .orderBy("doc_id")
    )


@register(
    "q_token_shift_exact",
    oracle=_SEQ_CTE
    + """
    SELECT tok, freq_a, freq_b, freq_a - freq_b AS diff
    FROM (
        SELECT tok,
               CAST(sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS freq_a,
               CAST(sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS BIGINT) AS freq_b
        FROM (SELECT source, unnest(tokens) AS tok FROM sequences
              WHERE source IN ('src0', 'src1')) t
        GROUP BY tok
    )
    ORDER BY abs(freq_a - freq_b) DESC, tok LIMIT 50
    """,
)
def q_token_shift_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact token-distribution shift ledger between two sources
    (operators/shift.py::token_shift_exact): top-50 tokens by
    |c_src0 - c_src1|. One pruned scan (the source IN-filter pushes to
    the file scan), one vocab-bounded conditional aggregate — the
    'what exactly changed between slices' companion to the KL-style
    q_source_token_drift. Hash-matched (integer counts, total order
    abs-desc then tok)."""
    from .operators.shift import token_shift_exact

    seq = sequences_from_documents(spark, sf_dir)
    return token_shift_exact(seq, "source", "src0", "src1", k=50)


@register("q_token_shift_cs")  # estimate: rows-only + in-row audit
def q_token_shift_cs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token shift from a CountSketch DIFFERENCE
    (operators/shift.py::token_shift_topk_cs): CountSketch is a linear
    map of the frequency vector, so sketch(A) - sketch(B)
    (sketch/ams.py::CountSketch.subtract) IS the sketch of the signed
    difference stream — the query sign-less summaries cannot express.
    One fused CountSketch+Misra-Gries scan per side, sketch rows only
    on the shuffle; candidates carry the MG provable-superset
    guarantee (every token with |shift| > max(N_a,N_b)/(cap+1)
    surfaces). In-row audit joins the exact counts: abs_err vs the
    3-sigma CountSketch bound carried per row as err_bound."""
    from .operators.shift import token_shift_exact, token_shift_topk_cs

    seq = sequences_from_documents(spark, sf_dir)
    est = token_shift_topk_cs(seq, "source", "src0", "src1", k=50)
    exact_all = (
        seq.filter(F.col("source").isin("src0", "src1"))
        .select("source", F.explode("tokens").alias("tok"))
        .groupBy("tok")
        .agg(
            F.sum(F.when(F.col("source") == "src0", 1).otherwise(0))
            .cast("bigint")
            .alias("freq_a"),
            F.sum(F.when(F.col("source") == "src1", 1).otherwise(0))
            .cast("bigint")
            .alias("freq_b"),
        )
        .withColumn("diff_exact", F.col("freq_a") - F.col("freq_b"))
        .select("tok", "diff_exact")
    )
    return (
        est.join(exact_all, "tok", "left")
        .withColumn("diff_exact", F.coalesce(F.col("diff_exact"), F.lit(0)))
        .withColumn("abs_err", F.abs(F.col("diff_est") - F.col("diff_exact")))
        .withColumn("in_bound", F.col("abs_err") <= F.col("err_bound"))
        .orderBy(F.abs(F.col("diff_est")).desc(), "tok")
    )


@register(
    "q_ntok_percentile_exact",
    oracle=_SEQ_CTE
    + """
    SELECT doc_id, n_tok,
           round(cume_dist() OVER (ORDER BY n_tok), 6) AS pct
    FROM (SELECT doc_id, len(tokens) AS n_tok FROM sequences) t
    """,
)
def q_ntok_percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentile rank (cume_dist) of every document's token
    count — the global-order window that costs a single-partition sort
    of the corpus at scale; this is the exact companion the broadcast-
    KLL normalizer (q_ntok_percentile_kll) is audited against.
    Ties share a cume_dist value, so the result is deterministic under
    any partitioning; hash-matched at round-6."""
    seq = sequences_from_documents(spark, sf_dir)
    return seq.select(
        "doc_id",
        "n_tok",
        F.round(F.cume_dist().over(Window.orderBy("n_tok")), 6).alias("pct"),
    )


@register("q_ntok_percentile_kll")  # estimate: rows-only + in-row audit
def q_ntok_percentile_kll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile-rank normalization from a broadcast KLL payload
    (operators/percentiles.py::percentile_normalize) — the quality-
    pipeline primitive 'drop the bottom p% by X' WITHOUT the global
    sort the exact cume_dist needs: one mergeable-sketch scan (sketch
    rows only on the shuffle) + one map-only annotate pass. KLL bounds
    RANK error directly — exactly the emitted quantity — so the in-row
    audit gates abs_err <= 3x the published rank error uniformly, at
    every value, not just at pinned quantiles."""
    from .operators.percentiles import percentile_normalize
    from .sketch import KLLSketch

    k = 200
    seq = sequences_from_documents(spark, sf_dir).select("doc_id", "n_tok")
    est = percentile_normalize(seq, "n_tok", k=k)
    exact = seq.select(
        "doc_id", F.cume_dist().over(Window.orderBy("n_tok")).alias("pct_exact")
    )
    bound = 3 * KLLSketch(k).rank_error()
    return (
        est.join(exact, "doc_id")
        .withColumn(
            "abs_err", F.round(F.abs(F.col("pct_est") - F.col("pct_exact")), 6)
        )
        .withColumn("in_bound", F.col("abs_err") <= F.lit(bound))
        .select("doc_id", "n_tok", F.round("pct_est", 6).alias("pct_est"),
                F.round("pct_exact", 6).alias("pct_exact"), "abs_err", "in_bound")
        .orderBy("doc_id")
    )


@register("q_streaming_sliding_distinct")  # estimate: rows-only + audit
def q_streaming_sliding_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming trailing-window actives in the driver contract
    (streaming/stateful.py::windowed_sliding_distinct): per event type,
    the distinct users over the trailing FIVE 1-week event-time
    windows — live "35-day actives" — with cross-window HLL payloads as
    applyInPandasWithState group state (O(2·trailing·2^p) per key,
    stream-length-independent). The events table replays as 3
    micro-batches; the operator's acceptance horizon guarantees no
    re-emission is ever a degraded merge, so each (key, window)'s LAST
    emission is the final state. In-row audit joins the exact batch
    trailing distinct (map-side window expansion, the
    q_sliding_distinct plan shape): rel_err within 3x the HLL bound.
    trailing=5 is sized so the 5-week event span (all SFs) fits the
    trailing-window ACCEPTANCE horizon — the replay is unordered, and
    a row arriving more than `trailing` windows behind the newest seen
    would otherwise be dropped under the documented lateness bound
    (correct for a stream, a miscount for this replay)."""
    from .streaming.stateful import windowed_sliding_distinct

    p = 14
    trailing = 5
    week = 604800
    ev = load_table(spark, sf_dir, "events").select(
        "ts", "event_type", "user_id"
    )
    src = _scratch_dir("slide_src")
    ev.repartition(3).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    out = windowed_sliding_distinct(
        stream,
        key_col="event_type",
        ts_col="ts",
        value_col="user_id",
        window="1 week",
        trailing=trailing,
        p=p,
    )
    emissions: list = []

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        for r in batch_df.collect():  # rows per active (key, window): tiny
            emissions.append((batch_id, r))

    ckpt = _scratch_dir("slide_ckpt")
    q = (
        out.writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    _await_stream(q)
    last: dict = {}
    for bid, r in emissions:
        key = (r["key"], int(r["window_start"].timestamp()))
        if key not in last or bid >= last[key][0]:
            last[key] = (bid, float(r["trailing_est"]))
    est = spark.createDataFrame(
        [(k, w, round(e, 2)) for (k, w), (_, e) in sorted(last.items())],
        "event_type string, window_epoch bigint, trailing_est double",
    )
    # exact batch companion: expand each event into the trailing
    # windows it reaches, one (window, key) distinct aggregate
    base = ev.select(
        "event_type",
        "user_id",
        (
            (F.col("ts").cast("timestamp").cast("long") / week).cast("long") * week
        ).alias("w0"),
    )
    expanded = base.select(
        "event_type",
        "user_id",
        F.explode(
            F.sequence(F.lit(0), F.lit(trailing - 1))
        ).alias("i"),
        "w0",
    ).select(
        "event_type", "user_id", (F.col("w0") + F.col("i") * week).alias("window_epoch")
    )
    observed = base.select("event_type", F.col("w0").alias("window_epoch")).distinct()
    exact = (
        expanded.join(observed, ["event_type", "window_epoch"], "left_semi")
        .groupBy("event_type", "window_epoch")
        .agg(F.countDistinct("user_id").alias("distinct_exact"))
    )
    bound = 3 * 1.04 / (2.0**p) ** 0.5
    return (
        exact.join(est, ["event_type", "window_epoch"])
        .withColumn(
            "rel_err",
            F.round(
                F.abs(F.col("trailing_est") - F.col("distinct_exact"))
                / F.col("distinct_exact"),
                6,
            ),
        )
        .withColumn("in_bound", F.col("rel_err") <= F.lit(bound))
        .orderBy("event_type", "window_epoch")
    )


# ===========================================================================
# Round-4 continuation II: PSI drift, Bloom shape planning, data validation
# ===========================================================================


@register(
    "q_psi_drift",
    oracle=_SEQ_CTE
    + """
    , s AS (SELECT source AS g,
                   CAST(floor(len(tokens) / 16.0) AS BIGINT) AS bin
            FROM sequences),
    b  AS (SELECT g, bin, count(*) AS cnt FROM s GROUP BY 1, 2),
    cb AS (SELECT bin, CAST(sum(cnt) AS BIGINT) AS c_cnt FROM b GROUP BY 1),
    t  AS (SELECT CAST(sum(c_cnt) AS BIGINT) AS n_tot,
                  count(*) AS n_bins FROM cb),
    gt AS (SELECT g, CAST(sum(cnt) AS BIGINT) AS n_g FROM b GROUP BY 1),
    grid AS (SELECT g, n_g, bin, c_cnt, n_tot, n_bins
             FROM gt CROSS JOIN cb CROSS JOIN t),
    j AS (SELECT grid.g, grid.n_g, grid.n_bins, grid.c_cnt, grid.n_tot,
                 coalesce(b.cnt, 0) AS cnt
          FROM grid LEFT JOIN b ON grid.g = b.g AND grid.bin = b.bin)
    SELECT g AS source,
           n_g AS n_rows,
           CAST(n_bins AS BIGINT) AS n_bins,
           round(sum(((cnt + 0.5e0) / (n_g + 0.5e0 * n_bins)
                      - (c_cnt + 0.5e0) / (n_tot + 0.5e0 * n_bins))
                     * ln(((cnt + 0.5e0) / (n_g + 0.5e0 * n_bins))
                          / ((c_cnt + 0.5e0) / (n_tot + 0.5e0 * n_bins)))),
                 6) AS psi
    FROM j GROUP BY 1, 2, 3
    """,
)
def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index per source over the n_tok
    distribution (bin width 16) vs the whole corpus — the standard
    snapshot-drift gate (operators/drift.py): Laplace-smoothed
    p = (cnt+0.5)/(N+0.5*B) over the corpus's bin set so unseen bins
    penalize finitely. One map-side-combinable corpus aggregate; all
    later frames are bounded by sources x bins and broadcast-joined.
    Hash-matched against DuckDB computing the identical smoothing
    (double literals 0.5e0 keep DuckDB out of DECIMAL arithmetic);
    psi rounded 6 per the float convention."""
    from .operators.drift import psi_drift

    seq = sequences_from_documents(spark, sf_dir)
    return psi_drift(seq, "n_tok", 16, "source")


@register(
    "q_bloom_shape_plan",
    oracle=_SEQ_CTE
    + """
    , nd AS (SELECT source, count(DISTINCT tok) AS ndv
             FROM (SELECT source, unnest(tokens) AS tok FROM sequences) u
             GROUP BY source),
    p1 AS (SELECT source, CAST(ndv AS BIGINT) AS ndv,
                  CAST(ceil(ndv * 19.170116754734877e0) AS BIGINT) AS m
           FROM nd),
    p2 AS (SELECT *,
                  CAST(LEAST(64, GREATEST(1,
                       CAST(round((m / CAST(ndv AS DOUBLE))
                                  * 0.6931471805599453e0) AS BIGINT)))
                       AS BIGINT) AS k
           FROM p1),
    p3 AS (SELECT *, (m + 63) // 64 AS buckets FROM p2),
    p4 AS (SELECT *, buckets * 8 AS filter_bytes FROM p3)
    SELECT source, ndv, m, k,
           CAST(buckets AS BIGINT) AS buckets,
           CAST(filter_bytes AS BIGINT) AS filter_bytes,
           CAST((filter_bytes + 4096 - 1) // 4096 AS BIGINT) AS n_shards,
           round(pow(1.0e0 - exp(-(k * CAST(ndv AS DOUBLE)) / m), k), 6)
               AS expected_fpp
    FROM p4
    """,
)
def q_bloom_shape_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's Shape math (mod.rs:85-132) as a distributed
    planning pass (operators/planning.py): per-source optimal
    m = ceil(-n ln p/(ln 2)^2), k = clamp(round((m/n) ln 2), 1, 64),
    dense width, and the routed-build shard fan-out for a 4 KiB/task
    budget — a plan frame, not a driver loop, so it holds for 10^6
    groups. Transcendental constants are folded in Python and inlined
    as double literals on BOTH engines, so the ceil/round integers are
    bitwise-reproducible. Hash-matched on the exact-ndv feed; the
    100-TB feed (HLL estimates from the same machinery the profile
    scan uses) is audited in-query: per source the HLL estimate must
    sit within 4x its published rel error of the exact ndv, which
    bounds the planned m by the same factor (m is linear in n)."""
    from .operators.planning import plan_from_exact
    from .operators.sketches import HllSketch
    from .sketch import HyperLogLog

    seq = sequences_from_documents(spark, sf_dir)
    toks = seq.select("source", F.explode("tokens").alias("tok"))
    plan = plan_from_exact(toks, "tok", "source", p=1e-4, shard_budget_bytes=4096)

    hll_p = 14
    keyed = HllSketch(p=hll_p, col="tok", scalar=True).build_by_key(toks, "source")
    est = {
        r["key"]: HyperLogLog.from_bytes(bytes(r["payload"])).estimate()
        for r in keyed.select("key", "payload").collect()  # sketch rows only
    }
    bound = 4.0 * 1.04 / (2.0**hll_p) ** 0.5
    for r in plan.select("source", "ndv").collect():  # k-bounded (|sources|)
        n_hll = est[str(r["source"])]
        if abs(n_hll - r["ndv"]) > bound * r["ndv"] + 1:
            raise AssertionError(
                f"HLL plan feed for {r['source']}: est {n_hll} vs exact "
                f"{r['ndv']} outside 4x bound"
            )
    return plan


@register(
    "q_data_validation",
    oracle="""
    SELECT 'row_count' AS check_name, '' AS col_name,
           CAST(count(*) AS DOUBLE) AS observed,
           100.0e0 AS lo, 1.0e12 AS hi,
           count(*) >= 100 AND count(*) <= 1000000000000 AS passed
    FROM documents
    UNION ALL
    -- round(6) on BOTH sides per the cross-engine float convention:
    -- today these fractions are exactly 1.0, but the first snapshot
    -- with a null would otherwise hash-diverge from the Spark side's
    -- rounded observed value
    SELECT 'completeness', 'doc_id',
           round(CAST(count(doc_id) AS DOUBLE) / count(*), 6),
           1.0e0, NULL, count(doc_id) = count(*) FROM documents
    UNION ALL
    SELECT 'completeness', 'text',
           round(CAST(count(text) AS DOUBLE) / count(*), 6),
           1.0e0, NULL, count(text) = count(*) FROM documents
    UNION ALL
    SELECT 'completeness', 'lang',
           round(CAST(count(lang) AS DOUBLE) / count(*), 6),
           1.0e0, NULL, count(lang) = count(*) FROM documents
    UNION ALL
    SELECT 'value_min', 'n_chars', CAST(min(n_chars) AS DOUBLE),
           1.0e0, NULL, min(n_chars) >= 1 FROM documents
    UNION ALL
    SELECT 'value_max', 'n_chars', CAST(max(n_chars) AS DOUBLE),
           NULL, 100000.0e0, max(n_chars) <= 100000 FROM documents
    """,
)
def q_data_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style one-scan data-quality gate (operators/validate.py):
    row count, per-column completeness, and exact value bounds ride a
    single profile pass as observe metrics; approximate checks (doc_id
    uniqueness, lang distinct-count range) evaluate HLL estimates from
    the SAME pass with the sketch's published error as slack — asserted
    in-query (their observed values are estimates, not SQL-derivable)
    and excluded from the hashed frame, which carries the exact half
    only. At 100 TB this is the per-snapshot trust gate: one corpus
    read, sketch rows on the shuffle, booleans out."""
    from .operators.validate import (
        ApproxNdvRange,
        ApproxUniqueness,
        Completeness,
        RowCount,
        ValueRange,
        validate_table,
    )

    docs = load_table(spark, sf_dir, "documents")
    results = validate_table(
        docs,
        [
            RowCount(lo=100, hi=10**12),
            Completeness("doc_id"),
            Completeness("text"),
            Completeness("lang"),
            ValueRange("n_chars", lo=1, hi=100000),
            ApproxUniqueness("doc_id", min_ratio=1.0),
            ApproxNdvRange("lang", lo=1, hi=50),
        ],
    )
    approx = [r for r in results if not r.exact]
    if not approx or not all(r.passed for r in approx):
        raise AssertionError(f"approximate checks failed: {approx}")
    rows = [
        (r.check, r.column, round(r.observed, 6), r.lo, r.hi, r.passed)
        for r in results
        if r.exact
    ]
    return spark.createDataFrame(
        rows,
        "check_name string, col_name string, observed double, "
        "lo double, hi double, passed boolean",
    )


def _stream_events_ordered(spark: SparkSession, sf_dir: str, n_files: int = 4):
    """Events replayed as TIME-ORDERED micro-batches (file mtimes set
    the FileStreamSource order): recency-scoped operators need arrival
    to roughly follow event time — a random split would teleport the
    acceptance horizon to the stream's end in batch 1 and clamp
    everything (the generational dedup handles that correctly, but the
    query's re-admittance gate would then be vacuous)."""
    import glob
    import os
    import shutil

    ev = load_table(spark, sf_dir, "events").select(
        "ts", F.col("user_id").cast("string").alias("fp")
    )
    bounds = ev.agg(
        F.min(F.col("ts").cast("timestamp").cast("double")).alias("lo"),
        F.max(F.col("ts").cast("timestamp").cast("double")).alias("hi"),
    ).collect()[0]
    src = _scratch_dir("gen_dedup_src")
    os.makedirs(src, exist_ok=True)
    span = (bounds["hi"] - bounds["lo"]) or 1.0
    for i in range(n_files):
        lo = bounds["lo"] + span * i / n_files
        hi = bounds["hi"] + 1 if i == n_files - 1 else bounds["lo"] + span * (i + 1) / n_files
        part_dir = _scratch_dir(f"gen_dedup_part{i}")
        sec = F.col("ts").cast("timestamp").cast("double")  # NTZ: via timestamp
        ev.where((sec >= lo) & (sec < hi)).coalesce(1).write.mode(
            "overwrite"
        ).parquet(part_dir)
        (f,) = glob.glob(os.path.join(part_dir, "part-*.parquet"))
        dst = os.path.join(src, f"batch_{i}.parquet")
        shutil.copy(f, dst)
        # explicit increasing mtimes pin micro-batch order with no
        # wall-clock sleep (review fix: 3 helpers x 4 files x 1.1s of
        # pure latency per contract run, gone)
        os.utime(dst, (_T0 + i, _T0 + i))
    stream = (
        spark.readStream.schema("ts timestamp, fp string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    return ev, stream


_SESSION_GAP_US = 4 * 3600 * 1_000_000  # 4 hours


def _stream_sessions_ordered(spark: SparkSession, sf_dir: str, n_files: int = 4):
    """Events as (user_id, ts_us) TIME-ORDERED micro-batches for the
    streaming sessionizer (cross-batch event-time order per key is the
    operator's arrival contract; see _stream_events_ordered)."""
    import glob
    import os
    import shutil

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    bounds = ev.agg(F.min("ts_us").alias("lo"), F.max("ts_us").alias("hi")).collect()[0]
    src = _scratch_dir("sess_src")
    os.makedirs(src, exist_ok=True)
    span = (bounds["hi"] - bounds["lo"]) or 1
    for i in range(n_files):
        lo = bounds["lo"] + span * i // n_files
        hi = bounds["hi"] + 1 if i == n_files - 1 else bounds["lo"] + span * (i + 1) // n_files
        part_dir = _scratch_dir(f"sess_part{i}")
        ev.where((F.col("ts_us") >= lo) & (F.col("ts_us") < hi)).coalesce(1).write.mode(
            "overwrite"
        ).parquet(part_dir)
        (f,) = glob.glob(os.path.join(part_dir, "part-*.parquet"))
        dst = os.path.join(src, f"batch_{i}.parquet")
        shutil.copy(f, dst)
        # explicit increasing mtimes pin micro-batch order with no
        # wall-clock sleep (review fix: 3 helpers x 4 files x 1.1s of
        # pure latency per contract run, gone)
        os.utime(dst, (_T0 + i, _T0 + i))
    return (
        spark.readStream.schema("user_id bigint, ts_us bigint")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )


@register(
    "q_streaming_sessionize",
    oracle=f"""
    WITH e AS (
      SELECT user_id, epoch_us(ts) AS us FROM events
    ), marked AS (
      SELECT user_id, us,
             CASE WHEN lag(us) OVER w IS NULL
                  OR us - lag(us) OVER w > {_SESSION_GAP_US} THEN 1
                  ELSE 0 END AS brk
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)
    ), sess AS (
      SELECT user_id, us,
             sum(brk) OVER (PARTITION BY user_id ORDER BY us
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS sid
      FROM marked
    )
    SELECT user_id,
           strftime(make_timestamp(min(us)), '%Y-%m-%d %H:%M:%S.%f')
             AS session_start,
           strftime(make_timestamp(max(us)), '%Y-%m-%d %H:%M:%S.%f')
             AS session_end,
           CAST(count(*) AS BIGINT) AS n_events
    FROM sess GROUP BY user_id, sid
    ORDER BY user_id, session_start
    """,
)
def q_streaming_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming gap-based sessionization, HASH-MATCHED against the
    batch lag-window SQL (streaming/sessions.py::streaming_sessionize):
    the events stream replayed as 4 time-ordered micro-batches through
    applyInPandasWithState holding only the OPEN session per user (O(1)
    state, stream-length-independent — the batch form needs the whole
    per-user history under a sort). Sessions closed by a batch emit
    finally; the open session emits a monotone snapshot per batch, and
    the post-replay reduction (last emission per (user, start) wins)
    reconstructs exactly the batch result. Timestamps travel as BIGINT
    microseconds (unix_micros == epoch_us on the same parquet values)
    and render as wall-clock strings, so the hash is tz-robust."""
    import uuid

    from .streaming.sessions import finalize_sessions, streaming_sessionize

    stream = _stream_sessions_ordered(spark, sf_dir)
    out = streaming_sessionize(
        stream, key_col="user_id", ts_us_col="ts_us", gap_us=_SESSION_GAP_US
    )
    name = "rbf_sessionize_" + uuid.uuid4().hex[:8]
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", _scratch_dir("sess_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    _await_stream(q)
    final = finalize_sessions(spark.table(name))
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return final.select(
        "user_id",
        F.date_format(F.timestamp_micros(F.col("session_start_us")), fmt).alias(
            "session_start"
        ),
        F.date_format(F.timestamp_micros(F.col("session_end_us")), fmt).alias(
            "session_end"
        ),
        "n_events",
    ).orderBy("user_id", "session_start")


@register("q_streaming_generational_dedup")
def q_streaming_generational_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RECENCY-scoped bounded-state streaming dedup
    (streaming/dedup.py::streaming_bloom_dedup_generational): one Bloom
    filter per event-time generation per shard, rotating as event time
    advances — total state n_shards x 2G x filter bytes FOREVER, and
    unlike q_streaming_bloom_dedup a fingerprint is RE-ADMITTED once
    its generation leaves the trailing horizon (re-posts after a quiet
    period are new documents again). In-query gates pin the published
    guarantees on the replayed events stream (user_id as fingerprint,
    2-day windows, G=2): (1) no fp ever emitted twice within the same
    generation, (2) consecutive emissions per fp are >= (G+1) windows
    apart — the any-arrival-order floor the slot arithmetic proves,
    (3) every distinct fp is emitted at least once (p=1e-8: zero
    FP-suppression expected at 150 keys), (4) re-admittance actually
    happens (> 0 fps emitted more than once over the 30-day span).
    Rows-only: emission timing is stateful-replay semantics, not
    SQL-derivable."""
    import uuid

    from .streaming import streaming_bloom_dedup_generational

    G, win_days = 2, 2
    ev, stream = _stream_events_ordered(spark, sf_dir)
    out = streaming_bloom_dedup_generational(
        stream,
        fp_col="fp",
        ts_col="ts",
        window=f"{win_days} days",
        generations=G,
        n_per_gen=2_000,
        p=1e-8,
        n_shards=4,
    )
    name = "rbf_gen_dedup_" + uuid.uuid4().hex[:8]
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", _scratch_dir("gen_dedup_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    _await_stream(q)
    emitted = spark.table(name)

    from pyspark.sql import Window

    w = Window.partitionBy("fp").orderBy("gen")
    gaps = emitted.withColumn("prev", F.lag("gen").over(w)).withColumn(
        "gap_sec",
        F.col("gen").cast("double") - F.col("prev").cast("double"),
    )
    n_gap_violations = gaps.where(
        F.col("prev").isNotNull()
        & (F.col("gap_sec") < (G + 1) * win_days * 86400)
    ).count()
    n_dup_same_gen = emitted.count() - emitted.distinct().count()
    n_fp = ev.select("fp").distinct().count()
    n_missing = n_fp - emitted.select("fp").distinct().count()
    n_readmitted = (
        emitted.groupBy("fp").count().where(F.col("count") > 1).count()
    )
    if n_gap_violations or n_dup_same_gen or n_missing:
        raise AssertionError(
            f"generational dedup invariants violated: gap={n_gap_violations} "
            f"dup={n_dup_same_gen} missing={n_missing}"
        )
    if n_readmitted == 0:
        raise AssertionError("no re-admittance over a 30-day recurring stream")
    return spark.createDataFrame(
        [(
            int(ev.count()), int(n_fp), int(emitted.count()),
            int(n_readmitted), int(n_missing), int(n_gap_violations),
            int(n_dup_same_gen),
        )],
        "n_in bigint, n_fp bigint, n_emitted bigint, n_readmitted bigint, "
        "n_missing bigint, n_gap_violations bigint, n_dup_same_gen bigint",
    )


@register(
    "q_bloom_anti_join",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus
    FROM orders o
    WHERE NOT EXISTS (SELECT 1 FROM customer c
                      WHERE c.c_custkey = o.o_custkey
                        AND c.c_acctbal > 9000)
    """,
)
def q_bloom_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-accelerated ANTI join (operators/bloomjoin.py): orders
    whose customer is NOT in the high-balance set. Zero FN flipped
    around — a negative probe proves absence, so ~90% of orders BYPASS
    the exact join entirely; only true matches + an FP fraction <= p
    pay for verification, and the exact LEFT ANTI kills the FPs, so
    the result is provably the plain anti join (the oracle). The
    100-TB shape of NOT IN (revoked set / previous snapshot / opt-out
    list): the filter broadcasts in O(bytes) even when the build
    side's rows can't. FP-bounded candidate fraction pinned in
    tests/test_bloomjoin.py."""
    from .operators.bloomjoin import bloom_anti_join

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus"
    )
    rich = load_table(spark, sf_dir, "customer").filter(
        F.col("c_acctbal") > 9000
    )
    return bloom_anti_join(orders, "o_custkey", rich, "c_custkey", p=1e-3)


@register(
    "q_mixture_replicate",
    oracle=_SEQ_CTE
    + """
    , s AS (
        SELECT source, doc_id, len(tokens) AS n_tok,
               CAST(substr(source, 4) AS INT) AS si,
               ('0x' || substr(md5(doc_id || '#rep'), 1, 8))::BIGINT
                   % 1000000 AS bucket
        FROM sequences
    ),
    w AS (
        SELECT *,
               CASE WHEN si < 5 THEN 2 WHEN si < 10 THEN 1 ELSE 0 END
                   AS n_full,
               CASE WHEN si < 5 THEN 500000 WHEN si < 10 THEN 0
                    ELSE 250000 END AS thr
        FROM s
    ),
    c AS (
        SELECT source, doc_id, n_tok,
               n_full + CASE WHEN bucket < thr THEN 1 ELSE 0 END AS copies
        FROM w
    ),
    e AS (
        SELECT source, doc_id, n_tok, unnest(range(copies)) AS epoch
        FROM c WHERE copies > 0
    )
    SELECT source, CAST(epoch AS INT) AS epoch,
           count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens
    FROM e GROUP BY 1, 2
    """,
)
def q_mixture_replicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mixture UPSAMPLING (operators/curation.py::
    mixture_replicate) — the replication half of data mixing: sources
    src0-4 weighted 2.5 (2 full copies + an md5-bucket half), src5-9
    passed through at 1.0, src10-19 downsampled to 0.25 — one weight
    spec drives both directions. The fractional copy is the same
    engine-exact md5-bucket rule as q_temperature_mix ('#rep'-salted
    so it decorrelates from other sampling passes); output carries a
    0-based epoch index per copy for downstream per-epoch shuffling.
    Pure Catalyst: broadcast |keys|-row spec + map-side explode — the
    corpus never shuffles. Hash-matched per (source, epoch) on doc and
    token counts."""
    from .operators.curation import mixture_replicate

    weights = {
        f"src{i}": (2.5 if i < 5 else (1.0 if i < 10 else 0.25))
        for i in range(20)
    }
    seq = sequences_from_documents(spark, sf_dir)
    out = mixture_replicate(seq, weights, key="source", id_col="doc_id")
    return out.groupBy("source", "epoch").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("n_tokens"),
    )


@register(
    "q_bloom_inner_join",
    oracle="""
    SELECT o.o_orderpriority, l.l_returnflag,
           count(*) AS n_items,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(38,4))) AS DOUBLE)
               AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderpriority = '1-URGENT'
    GROUP BY 1, 2
    """,
)
def q_bloom_inner_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bilateral Bloom join (operators/bloomjoin.py::bloom_inner_join,
    Mackert & Lohman 1986's filter shipping in broadcast form):
    lineitem ⋈ urgent orders with BOTH sides pruned by the other's
    filter before any row shuffles — ~80% of lineitem rows (non-urgent
    orders' items) drop at the scan; both filters are built from the
    original sides (building from a pruned side would re-run its
    pruned plan twice — review finding). Zero FN ⇒
    the pruned join aggregate is bitwise the plain join (the oracle);
    FPs ride along and die in the exact join. The 100-TB fact⋈fact
    shape where neither side broadcasts as rows but both filters do."""
    from .operators.bloomjoin import bloom_inner_join

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_extendedprice"
    )
    urgent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_orderkey", "o_orderpriority")
    joined = bloom_inner_join(li, "l_orderkey", urgent, "o_orderkey", p=1e-3)
    return joined.groupBy("o_orderpriority", "l_returnflag").agg(
        F.count("*").alias("n_items"),
        F.sum(F.col("l_extendedprice").cast("decimal(38,4)"))
        .cast("double")
        .alias("revenue"),
    )


@register(
    "q_scd2_history",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_type, ts, event_id,
               CASE WHEN lag(event_id) OVER w IS NULL
                      OR event_type IS DISTINCT FROM lag(event_type) OVER w
                    THEN 1 ELSE 0 END AS chg
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), runs AS (
        SELECT user_id, event_type, ts,
               sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS version
        FROM ordered
    ), hist AS (
        SELECT user_id, CAST(version AS BIGINT) AS version,
               min(event_type) AS event_type,
               min(ts) AS valid_from,
               CAST(count(*) AS BIGINT) AS n_rows
        FROM runs GROUP BY 1, 2
    )
    SELECT user_id, event_type, version, valid_from,
           lead(valid_from) OVER wv AS valid_to,
           lead(valid_from) OVER wv IS NULL AS is_current,
           n_rows
    FROM hist
    WINDOW wv AS (PARTITION BY user_id ORDER BY version)
    """,
)
def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 compression of a change log (operators/scd.py::
    scd2_compress): each user's event_type stream collapses into
    effective-dated versions — a new version opens iff the attribute
    IS DISTINCT FROM the previous row's (null-safe), valid_to is the
    next version's valid_from (half-open tiling, NULL while current).
    ONE hash partition by key serves the lag window, the conditional
    cumsum, the (key, version) group-by (key is a subset of the
    grouping keys, so the Exchange is reused) and the lead window —
    plan-gated in tests/test_scd.py. Hash-matched against the same
    run-length formulation in DuckDB (IS DISTINCT FROM on both
    engines; (ts, event_id) total order per key)."""
    from .operators.scd import scd2_compress

    ev = load_table(spark, sf_dir, "events")
    return scd2_compress(
        ev,
        key_col="user_id",
        attr_cols=["event_type"],
        ts_col="ts",
        tiebreak_cols=["event_id"],
    )


_SCD2_APPLY_SNAPSHOT_TS = "2024-02-01 00:00:00"


@register(
    "q_scd2_apply",
    oracle=f"""
    WITH base AS (
        SELECT user_id, event_type, ts, event_id FROM events
        WHERE ts < TIMESTAMP '2024-01-16' AND user_id % 5 != 0
    ), ordered AS (
        SELECT user_id, event_type, ts, event_id,
               CASE WHEN lag(event_id) OVER w IS NULL
                      OR event_type IS DISTINCT FROM lag(event_type) OVER w
                    THEN 1 ELSE 0 END AS chg
        FROM base
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), runs AS (
        SELECT user_id, event_type, ts,
               sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS version
        FROM ordered
    ), hist AS (
        SELECT user_id, CAST(version AS BIGINT) AS version,
               min(event_type) AS event_type,
               min(ts) AS valid_from
        FROM runs GROUP BY 1, 2
    ), history AS (
        SELECT user_id, event_type, version, valid_from,
               lead(valid_from) OVER wv AS valid_to
        FROM hist
        WINDOW wv AS (PARTITION BY user_id ORDER BY version)
    ), snap AS (
        SELECT user_id, event_type FROM events
        WHERE user_id % 3 != 0
        QUALIFY row_number() OVER (
            PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
    ), cur AS (
        SELECT * FROM history WHERE valid_to IS NULL
    ), j AS (
        SELECT cur.user_id AS h_key, cur.event_type AS h_attr,
               cur.version AS version, cur.valid_from AS valid_from,
               snap.user_id AS s_key, snap.event_type AS s_attr
        FROM cur FULL OUTER JOIN snap ON cur.user_id = snap.user_id
    ), merged AS (
        SELECT user_id, event_type, version, valid_from, valid_to
        FROM history WHERE valid_to IS NOT NULL
        UNION ALL
        SELECT h_key, h_attr, version, valid_from, CAST(NULL AS TIMESTAMP)
        FROM j WHERE h_key IS NOT NULL AND s_key IS NOT NULL
                 AND h_attr IS NOT DISTINCT FROM s_attr
        UNION ALL
        SELECT h_key, h_attr, version, valid_from, CAST(NULL AS TIMESTAMP)
        FROM j WHERE h_key IS NOT NULL AND s_key IS NULL
        UNION ALL
        SELECT h_key, h_attr, version, valid_from,
               TIMESTAMP '{_SCD2_APPLY_SNAPSHOT_TS}'
        FROM j WHERE h_key IS NOT NULL AND s_key IS NOT NULL
                 AND h_attr IS DISTINCT FROM s_attr
        UNION ALL
        SELECT coalesce(h_key, s_key), s_attr,
               CAST(coalesce(version + 1, 1) AS BIGINT),
               TIMESTAMP '{_SCD2_APPLY_SNAPSHOT_TS}', CAST(NULL AS TIMESTAMP)
        FROM j WHERE s_key IS NOT NULL
                 AND (h_key IS NULL OR h_attr IS DISTINCT FROM s_attr)
    )
    SELECT user_id, event_type, version, valid_from, valid_to,
           valid_to IS NULL AS is_current
    FROM merged
    """,
)
def q_scd2_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO for a versioned dimension (operators/scd.py::
    scd2_apply): the first half-month's change log compresses into a
    base history, then a point-in-time snapshot (each user's latest
    event_type, keys user_id%3!=0) merges in at 2024-02-01 — changed
    keys close and reopen, brand-new keys (user_id%5==0, excluded from
    the base) open at version 1, keys missing from the snapshot are
    retained open. The current slice joins the snapshot ONCE; closed
    history rows never re-enter a shuffle. Hash-matched against the
    identical merge arithmetic as DuckDB CTEs (IS DISTINCT FROM change
    tests on both engines)."""
    from .operators.scd import scd2_apply, scd2_compress

    ev = load_table(spark, sf_dir, "events")
    base = ev.filter(
        (F.col("ts") < F.expr("TIMESTAMP '2024-01-16'"))
        & (F.col("user_id") % 5 != 0)
    )
    history = scd2_compress(
        base,
        key_col="user_id",
        attr_cols=["event_type"],
        ts_col="ts",
        tiebreak_cols=["event_id"],
    ).drop("n_rows")
    wsnap = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    snap = (
        ev.filter(F.col("user_id") % 3 != 0)
        .withColumn("_rn", F.row_number().over(wsnap))
        .filter(F.col("_rn") == 1)
        .select("user_id", "event_type")
    )
    merged = scd2_apply(
        history,
        snap,
        key_col="user_id",
        attr_cols=["event_type"],
        snapshot_ts=_SCD2_APPLY_SNAPSHOT_TS,
    )
    return merged.select(
        "user_id", "event_type", "version", "valid_from", "valid_to", "is_current"
    )


@register(
    "q_event_transitions",
    oracle="""
    WITH nxt AS (
        SELECT event_type AS src_state,
               lead(event_type) OVER w AS dst_state,
               ts, lead(ts) OVER w AS next_ts
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), t AS (
        SELECT src_state, dst_state, CAST(count(*) AS BIGINT) AS n
        FROM nxt
        WHERE dst_state IS NOT NULL
          AND next_ts <= ts + INTERVAL 30 MINUTE
        GROUP BY 1, 2
    )
    SELECT src_state, dst_state, n,
           round(n / sum(n) OVER (PARTITION BY src_state), 6) AS prob
    FROM t
    """,
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over user event streams
    (operators/markov.py::transition_matrix): lead window pairs each
    event with the user's next one, pairs separated by more than 30
    minutes are session breaks (interval arithmetic, tz-free — same
    convention as sessionize), counts row-normalize into ML transition
    probabilities. ONE events-sized shuffle (the lead window's user
    partition — plan-gated); the (src, dst) aggregate is map-side
    partial over |types|^2 keys and the normalizing sum is a window on
    the matrix itself, never a second events pass. Hash-matched vs the
    identical lead/ratio formulation in DuckDB, probabilities rounded
    at 6 on both engines."""
    from .operators.markov import transition_matrix

    ev = load_table(spark, sf_dir, "events")
    out = transition_matrix(
        ev,
        key_col="user_id",
        state_col="event_type",
        ts_col="ts",
        tiebreak_cols=["event_id"],
        max_gap_minutes=30,
    )
    return out.select(
        "src_state", "dst_state", "n", F.round("prob", 6).alias("prob")
    )


@register(
    "q_triangle_count",
    oracle="""
    WITH lines AS (
        SELECT l_orderkey, l_suppkey FROM lineitem WHERE l_quantity >= 48
    ), e AS (
        SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v
        FROM lines a JOIN lines b
          ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
    ), tri AS (
        SELECT e1.u AS a, e1.v AS b, e2.v AS c
        FROM e e1
        JOIN e e2 ON e1.u = e2.u AND e1.v < e2.v
        JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v
    )
    SELECT node, CAST(count(*) AS BIGINT) AS n_triangles FROM (
        SELECT a AS node FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
    ) GROUP BY node
    """,
)
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts on the supplier co-occurrence graph
    (operators/graph.py::triangle_counts): suppliers are adjacent iff
    they ship high-quantity lines in the same order (within-order pair
    fan-out is bounded by lines-per-order, never all-pairs). The
    operator orients each edge from its (degree, node)-smaller endpoint
    — out-degree O(sqrt(m)) on ANY graph, so the wedge self-join does
    m^{3/2} work where a hub would make the naive form quadratic — and
    each triangle is owned by its order-minimal apex exactly once; the
    oriented frame is persisted (three references) and tied. The oracle
    enumerates the same triangle set with plain node-id orientation —
    the set is orientation-invariant, which is exactly what the hash
    match certifies."""
    from .operators.graph import triangle_counts

    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 48)
    lines = li.select("l_orderkey", "l_suppkey")
    other = lines.select(
        F.col("l_orderkey").alias("r_orderkey"), F.col("l_suppkey").alias("r_suppkey")
    )
    edges = (
        lines.join(
            other,
            (F.col("l_orderkey") == F.col("r_orderkey"))
            & (F.col("l_suppkey") < F.col("r_suppkey")),
        )
        .select(F.col("l_suppkey").alias("src"), F.col("r_suppkey").alias("dst"))
        .distinct()
    )
    return triangle_counts(edges)


from .operators.keyness import distinctive_terms_oracle_sql as _keyness_oracle  # noqa: E402


@register(
    "q_distinctive_terms",
    oracle=_keyness_oracle(min_count=5, round_digits=7),
)
def q_distinctive_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dunning log-likelihood keyness per source (operators/keyness.py
    ::distinctive_terms): which tokens characterize each documents
    slice vs the rest of the corpus. ONE corpus-sized explode+groupBy
    (map-side partial); totals are aggregates OF the count frame, the
    |sources|-row totals broadcast. The hash-compared score is
    mi_nats = G2/(2N) — O(1) magnitude, so cross-engine ln() last-ulp
    noise (which grows with N in raw G2) cancels and sits ~8 orders
    below the 1e-7 rounding step; the row SET is decided by exact
    integer arithmetic only (min_count + the k11*N > ct*ns cross-
    product), so no float ever picks rows. Hash-matched vs the same
    xlx algebra in DuckDB over the parity tokenizer."""
    from .operators.keyness import distinctive_terms

    docs = load_table(spark, sf_dir, "documents")
    out = distinctive_terms(docs, min_count=5)
    return out.select(
        "source",
        "token",
        "n_in_key",
        "n_elsewhere",
        F.round("mi_nats", 7).alias("mi_nats"),
    )


@register(
    "q_debounce",
    oracle="""
    WITH d AS (
        SELECT user_id, event_type, event_id, ts,
               lag(ts) OVER (
                   PARTITION BY user_id, event_type
                   ORDER BY ts, event_id
               ) AS prev
        FROM events
    )
    SELECT user_id, event_type, event_id, ts
    FROM d
    WHERE prev IS NULL OR ts > prev + INTERVAL 10 MINUTE
    """,
)
def q_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burst suppression (operators/temporal.py::debounce): per
    (user, event_type) stream, keep only the FIRST event of every
    within-10-minute chain — the retry-storm collapse a telemetry
    pipeline runs before counting anything. The keep flag is a single
    lag window (ONE events-sized shuffle, the same partitioning the
    downstream per-user aggregate would reuse); chain membership is
    gap-transitive, so a long storm collapses to one row even when its
    tail is hours from its head. event_id tiebreak makes same-instant
    ordering total on both engines; hash-matched against the identical
    lag/interval formulation in DuckDB."""
    from .operators.temporal import debounce

    ev = load_table(spark, sf_dir, "events")
    out = debounce(
        ev,
        user_col="user_id",
        ts_col="ts",
        type_col="event_type",
        gap_minutes=10,
        tiebreak_cols=["event_id"],
    )
    return out.select("user_id", "event_type", "event_id", "ts")


@register(
    "q_cooccurrence_lift",
    oracle="""
    WITH ki AS (
        SELECT DISTINCT user_id AS key, event_type AS item FROM events
    ), nk AS (
        SELECT count(DISTINCT key) AS n_keys FROM ki
    ), per_item AS (
        SELECT item, count(*) AS n_item FROM ki GROUP BY item
    ), pairs AS (
        SELECT a.item AS item_a, b.item AS item_b,
               CAST(count(*) AS BIGINT) AS n_both
        FROM ki a JOIN ki b ON a.key = b.key AND a.item <> b.item
        GROUP BY 1, 2
        HAVING count(*) >= 2
    )
    SELECT item_a, item_b, n_both,
           CAST(na.n_item AS BIGINT) AS n_a,
           CAST(nb.n_item AS BIGINT) AS n_b,
           CAST(nk.n_keys AS BIGINT) AS n_keys,
           round(n_both / nk.n_keys, 6) AS support,
           round(n_both / na.n_item, 6) AS confidence,
           round(n_both * nk.n_keys / (na.n_item * nb.n_item), 6) AS lift
    FROM pairs
    JOIN per_item na ON na.item = item_a
    JOIN per_item nb ON nb.item = item_b
    CROSS JOIN nk
    """,
)
def q_cooccurrence_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association over user behavior (operators/assoc.py
    ::cooccurrence_lift): support / confidence / lift for every ordered
    pair of distinct event types co-occurring in a user. Events
    collapse to DISTINCT (user, type) FIRST — the only corpus-sized
    aggregate, persisted+tied so its four consumers scan the corpus
    once — then the per-user pair join fans out at most |types|^2 rows
    per user (a 10^6-click bot contributes the same one row as anyone),
    and the |types|^2-row matrix takes two broadcast joins for the
    per-type marginals. All counts exact integers; each ratio is ONE
    float division of exact ints (products << 2^53), rounded at 6 on
    both engines — hash-matched vs the identical formulation in
    DuckDB."""
    from .operators.assoc import cooccurrence_lift

    ev = load_table(spark, sf_dir, "events")
    out = cooccurrence_lift(
        ev, key_col="user_id", item_col="event_type", min_users=2
    )
    return out.select(
        "item_a",
        "item_b",
        "n_both",
        "n_a",
        "n_b",
        "n_keys",
        F.round("support", 6).alias("support"),
        F.round("confidence", 6).alias("confidence"),
        F.round("lift", 6).alias("lift"),
    )


_DDQ_ORACLE = """
WITH ranked AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events
)
SELECT event_type,
       max(CASE WHEN rn = CAST(floor(0.5 * (n - 1)) AS BIGINT) + 1
                THEN value END) AS p50_exact,
       max(CASE WHEN rn = CAST(floor(0.99 * (n - 1)) AS BIGINT) + 1
                THEN value END) AS p99_exact,
       1 AS p50_in_bound, 1 AS p99_in_bound
FROM ranked GROUP BY event_type
"""


@register("q_value_quantiles_dd", oracle=_DDQ_ORACLE)
def q_value_quantiles_dd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RELATIVE-error quantiles per event type via DDSketch
    (sketch/ddsketch.py, operators/sketches.DDQuantiles) — the
    tail-precision companion to the KLL rank-error path: at p99 of a
    heavy-tailed value column the estimate is within alpha*|x| of the
    true item, where KLL's rank eps blurs by the inverse tail density.
    Audit is STRICT: the exact side is the item at the same rank
    floor(q*(n-1)) DDSketch targets (window row_number, no collect),
    so in_bound asserts rel_err <= alpha with no interpolation slack.
    DDSketch's bucket counts are a pure function of the input multiset
    — canonical bytes under ANY partitioning (the reference's
    Bloom-merge bitwise contract, mod.rs:621-761, extended to
    quantiles) — so the distributed build equals a single-node build
    exactly. At 100 TB: one scan, O(buckets)-sized sketch rows are the
    only shuffle for the estimate side. Oracle-backed (r5) via the
    bound-flag pattern: exact rank-item values hash-match and the
    strict rel_err <= alpha audit becomes the flag the oracle pins at
    literal 1 (DDSketch bucket indexing rides float log, so rendering
    the estimate itself cross-engine would be boundary-fragile —
    flags are robust)."""
    from .operators.sketches import DDQuantiles

    alpha = 0.01
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    qs = [0.5, 0.99]

    est = (
        DDQuantiles(alpha, col="value")
        .quantiles_by_key(ev, "event_type", qs)
        .groupBy("key")
        .pivot("q", qs)
        .agg(F.first("value"))
        .select(
            F.col("key").alias("event_type"),
            F.col("`0.5`").alias("p50_dd"),
            F.col("`0.99`").alias("p99_dd"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("value")
    ranked = ev.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count("*").over(Window.partitionBy("event_type"))
    )
    exact = (
        ranked.filter(
            (F.col("rn") == F.floor(F.lit(0.5) * (F.col("n") - 1)) + 1)
            | (F.col("rn") == F.floor(F.lit(0.99) * (F.col("n") - 1)) + 1)
        )
        .withColumn(
            "which",
            F.when(
                F.col("rn") == F.floor(F.lit(0.5) * (F.col("n") - 1)) + 1, "p50"
            ).otherwise("p99"),
        )
        .groupBy("event_type")
        .pivot("which", ["p50", "p99"])
        .agg(F.first("value"))
        .select(
            "event_type",
            F.col("p50").alias("p50_exact"),
            F.col("p99").alias("p99_exact"),
        )
    )
    return (
        exact.join(est, "event_type")
        .withColumn(
            "p50_rel_err",
            F.round(F.abs(F.col("p50_dd") - F.col("p50_exact")) / F.abs("p50_exact"), 6),
        )
        .withColumn(
            "p99_rel_err",
            F.round(F.abs(F.col("p99_dd") - F.col("p99_exact")) / F.abs("p99_exact"), 6),
        )
        .select(
            "event_type",
            "p50_exact",
            "p99_exact",
            (F.col("p50_rel_err") <= alpha).cast("int").alias("p50_in_bound"),
            (F.col("p99_rel_err") <= alpha).cast("int").alias("p99_in_bound"),
        )
        .orderBy("event_type")
    )


@register(
    "q_cusum_changepoint",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1, 2
    ), cur AS (
      SELECT event_type, day,
             row_number() OVER (PARTITION BY event_type ORDER BY day) AS i,
             CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY day
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS prefix,
             count(*) OVER (PARTITION BY event_type) AS n,
             CAST(sum(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS total
      FROM daily
    )
    SELECT event_type, CAST(day AS VARCHAR) AS cp_at, i AS cp_index, n AS n_points,
           n * prefix - i * total AS g_scaled,
           abs(n * prefix - i * total) AS g_abs,
           round(CAST(prefix AS DOUBLE) / i, 6) AS mean_before,
           CASE WHEN n > i
                THEN round(CAST(total - prefix AS DOUBLE) / (n - i), 6)
                ELSE 0.0 END AS mean_after
    FROM cur
    QUALIFY row_number() OVER (PARTITION BY event_type
                               ORDER BY abs(n * prefix - i * total) DESC, day ASC) = 1
    ORDER BY event_type
    """,
)
def q_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHEN did each monitored series shift — offline CUSUM argmax
    (operators/changepoint.py::cusum_changepoint, Page 1954 / Hinkley
    1971) over daily event counts per type. The statistic is the
    n-scaled cumulative deviation G_i = n*prefix_i - i*total, computed
    entirely in BIGINT (no float mean), so Spark and DuckDB agree
    bitwise and the query hash-matches. One hash Exchange on the key
    serves the prefix sum, the per-key totals, and the argmax pick;
    the complement to the drift family (PSI says IF, this says WHEN
    and HOW BIG via the exact segment means)."""
    from .operators.changepoint import cusum_changepoint

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("day")
    )
    daily = ev.groupBy("event_type", "day").agg(F.count("*").alias("cnt"))
    out = cusum_changepoint(daily, "event_type", "day", "cnt")
    return out.withColumn(
        "cp_at", F.date_format("cp_at", "yyyy-MM-dd")
    ).orderBy("event_type")


@register(
    "q_daily_trend",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(count(*) AS DOUBLE) AS cnt
      FROM events GROUP BY 1, 2
    ), x AS (
      SELECT event_type, day, cnt,
             CAST(date_diff('day', DATE '2024-01-15', day) AS DOUBLE) AS xd
      FROM daily
    )
    SELECT event_type,
           round(regr_slope(cnt, xd), 6) AS slope_per_day,
           round(regr_intercept(cnt, xd), 6) AS intercept,
           round(regr_r2(cnt, xd), 6) AS r2,
           CAST(regr_count(cnt, xd) AS BIGINT) AS n_days,
           CAST(min(day) AS VARCHAR) AS first_day,
           CAST(max(day) AS VARCHAR) AS last_day,
           round(regr_intercept(cnt, xd) + regr_slope(cnt, xd) *
                 CAST(date_diff('day', DATE '2024-01-15', min(day)) AS DOUBLE),
                 6) AS fitted_first,
           round(regr_intercept(cnt, xd) + regr_slope(cnt, xd) *
                 CAST(date_diff('day', DATE '2024-01-15', max(day)) AS DOUBLE),
                 6) AS fitted_last
    FROM x
    GROUP BY event_type
    HAVING regr_count(cnt, xd) >= 2 AND regr_slope(cnt, xd) IS NOT NULL
    ORDER BY event_type
    """,
)
def q_daily_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOW FAST is each monitored series moving — per-type OLS trend
    (operators/trend.py::group_trend) over daily event counts: slope
    per day, value at the reference day, r² linearity, and the fitted
    endpoints. The whole fit is one map-side-combinable hash aggregate
    of SQL-standard regr_* sufficient statistics (|keys| rows of six
    doubles shuffle, corpus-size-independent); the axis is centered at
    a reference day inside the window so every emitted number is
    observation-sized and the cross-engine ulp noise sits far below the
    round(6) hash step. Completes the drift triad: PSI says IF, CUSUM
    says WHEN, this says HOW FAST."""
    from .operators.trend import group_trend

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("day")
    )
    daily = ev.groupBy("event_type", "day").agg(F.count("*").alias("cnt"))
    out = group_trend(daily, "event_type", "day", "cnt", ref_day="2024-01-15")
    return (
        out.withColumn("first_day", F.date_format("first_day", "yyyy-MM-dd"))
        .withColumn("last_day", F.date_format("last_day", "yyyy-MM-dd"))
        .orderBy("event_type")
    )


@register("q_streaming_late_audit")
def q_streaming_late_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATE-DATA accounting (streaming/metrics.py::progress_drop_stats):
    a watermark is a contract to DROP data, and the only record of how
    much is the per-batch numRowsDroppedByWatermark counter — this
    query reads it. The stateful operator is dropDuplicates, chosen
    deliberately: its state rows are INPUT rows, so the counter is an
    exact late-row count (under a windowed aggregation the same
    counter counts post-partial-aggregation STATE rows — one per
    late window, not one per late row — a measured trap this query's
    docstring is the record of). Three micro-batches: two in time
    order, then a batch of planted stragglers a full 7 hours behind
    the advanced watermark. Rows-only with in-query gates: dropped ==
    planted, emitted == on-time, and emitted + dropped == input
    (exact conservation — dedup state never holds rows back)."""
    import datetime as dt
    import glob
    import os
    import shutil
    import uuid

    from .streaming.metrics import progress_drop_stats

    base = dt.datetime(2024, 6, 1, 0, 0, 0)
    on_time = [
        (i % 7, base + dt.timedelta(minutes=5 * i)) for i in range(96)
    ]  # 0h .. 8h in two halves; all (uid, ts) pairs unique
    stragglers = [
        (i % 7, base + dt.timedelta(minutes=i, seconds=30)) for i in range(25)
    ]  # back at hour 0: far behind the watermark after batch 2
    src = _scratch_dir("late_src")
    os.makedirs(src, exist_ok=True)
    batches = [on_time[:48], on_time[48:], stragglers]
    for i, rows in enumerate(batches):
        part_dir = _scratch_dir(f"late_part{i}")
        spark.createDataFrame(rows, "uid long, ts timestamp").coalesce(
            1
        ).write.mode("overwrite").parquet(part_dir)
        (f,) = glob.glob(os.path.join(part_dir, "part-*.parquet"))
        dst = os.path.join(src, f"batch_{i}.parquet")
        shutil.copy(f, dst)
        os.utime(dst, (_T0 + i, _T0 + i))
    stream = (
        spark.readStream.schema("uid long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    deduped = stream.withWatermark("ts", "1 hour").dropDuplicates(["uid", "ts"])
    name = "rbf_late_" + uuid.uuid4().hex[:8]
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", _scratch_dir("late_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    _await_stream(q)
    stats = progress_drop_stats(q)
    n_emitted = spark.table(name).count()
    n_planted = len(stragglers)
    return spark.createDataFrame(
        [
            (
                stats["n_input_rows"],
                stats["n_dropped_late"],
                stats["n_batches"],
                n_emitted,
                n_planted,
                stats["n_dropped_late"] == n_planted,
                n_emitted == len(on_time),
                n_emitted + stats["n_dropped_late"] == stats["n_input_rows"],
            )
        ],
        "n_input bigint, n_dropped_late bigint, n_batches bigint, "
        "n_emitted bigint, n_planted bigint, "
        "drop_gate boolean, emit_gate boolean, conservation_gate boolean",
    )


def _pseudonym_oracle() -> str:
    from .functions.text import duckdb_pseudonym

    pe = duckdb_pseudonym("e.user_id", "rot-2026-08")
    pc = duckdb_pseudonym("c.c_custkey", "rot-2026-08")
    return f"""
    WITH ev AS (
      SELECT {pe} AS pseu, e.user_id, e.event_type FROM events e
    ), cu AS (
      SELECT {pc} AS pseu, c.c_custkey, c.c_mktsegment FROM customer c
    )
    SELECT cu.c_mktsegment AS segment,
           CAST(count(*) AS BIGINT) AS n_events_pseudonym_join,
           CAST(count(DISTINCT ev.pseu) AS BIGINT) AS n_users_pseudonym,
           CAST((SELECT count(*) FROM events e2 JOIN customer c2
                 ON e2.user_id = c2.c_custkey
                 WHERE c2.c_mktsegment = cu.c_mktsegment) AS BIGINT)
             AS n_events_raw_join
    FROM ev JOIN cu ON ev.pseu = cu.pseu
    GROUP BY cu.c_mktsegment
    ORDER BY segment
    """


@register("q_pseudonym_join", oracle=_pseudonym_oracle())
def q_pseudonym_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted pseudonymization with REFERENTIAL CONSISTENCY
    (functions/text.py::pseudonym_expr) — the privacy tier between
    pii_scrub (destroys the value) and erasure (destroys the row):
    events and customers re-keyed under the same salt, then joined ON
    THE PSEUDONYMS; the per-segment counts must equal the raw-key join
    computed independently in the same query (both columns emitted —
    the hash certifies joins survive re-keying), while rotating the
    salt severs all history at once. Pure Catalyst md5, 1:1 DuckDB
    rendering."""
    from .functions.text import pseudonym_expr

    ev = load_table(spark, sf_dir, "events").select(
        pseudonym_expr(F.col("user_id"), "rot-2026-08").alias("pseu"),
        "user_id",
        "event_type",
    )
    cu = load_table(spark, sf_dir, "customer").select(
        pseudonym_expr(F.col("c_custkey"), "rot-2026-08").alias("cpseu"),
        "c_custkey",
        "c_mktsegment",
    )
    pj = (
        ev.join(cu, on=F.col("pseu") == F.col("cpseu"))
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").alias("n_events_pseudonym_join"),
            F.countDistinct("pseu").alias("n_users_pseudonym"),
        )
    )
    raw = (
        load_table(spark, sf_dir, "events")
        .join(
            load_table(spark, sf_dir, "customer"),
            on=F.col("user_id") == F.col("c_custkey"),
        )
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(F.count("*").alias("n_events_raw_join"))
    )
    return pj.join(raw, on="segment").orderBy("segment")


_STORAGE_SNAPSHOT = "/root/testdata/sf0.01/lineitem.parquet"


@register(
    "q_storage_profile",
    oracle=f"""
    SELECT path_in_schema AS column_name,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(total_compressed_size) AS BIGINT) AS compressed_bytes,
           CAST(sum(total_uncompressed_size) AS BIGINT) AS uncompressed_bytes,
           CAST(sum(num_values) AS BIGINT) AS n_values,
           round(sum(total_uncompressed_size)
                 / NULLIF(sum(total_compressed_size), 0), 4)
             AS compression_ratio
    FROM parquet_metadata('{_STORAGE_SNAPSHOT}')
    GROUP BY 1 ORDER BY 1
    """,
)
def q_storage_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column storage profile from parquet FOOTERS only
    (operators/zonemap.py::storage_profile): compressed/uncompressed
    bytes, chunk and value counts, compression ratio per column — the
    table-bloat report behind every drop-a-column / recode /
    re-sort-for-compression decision, priced in KB footer reads (data
    pages never touched; paths parallelized, the driver opens no
    footer). Both engines read ONE FIXED snapshot (the driver's sf0.01
    lineitem) because oracle SQL is static — the check is two
    INDEPENDENT parquet implementations (pyarrow footers vs DuckDB
    parquet_metadata()) agreeing on every byte count of the same
    files; data scale is meaningless for a metadata reader."""
    from .operators.zonemap import storage_profile

    return storage_profile(spark, _STORAGE_SNAPSHOT).orderBy("column_name")


def _encoding_oracle() -> str:
    from .functions.text import duckdb_encoding

    e = duckdb_encoding("text")
    return f"""
    WITH allrows AS (
      SELECT source, text FROM documents
      UNION ALL
      SELECT '_planted', 'bad' || chr(7) || 'ctrl' || chr(65533) ||
             'caf' || chr(233)
      UNION ALL
      SELECT '_planted', 'clean ascii only'
    ), feats AS (
      SELECT source, {e['n_ctrl']} AS n_ctrl,
             {e['n_replacement']} AS n_repl,
             {e['n_non_ascii']} AS n_na,
             {e['n_chars']} AS n_ch
      FROM allrows
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN n_ctrl > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS docs_with_ctrl,
           CAST(sum(CASE WHEN n_repl > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS docs_with_replacement,
           CAST(sum(n_na) AS BIGINT) AS total_non_ascii,
           CAST(sum(n_ch) AS BIGINT) AS total_chars,
           round(sum(n_na) / NULLIF(sum(n_ch), 0), 6) AS non_ascii_ratio
    FROM feats GROUP BY source ORDER BY source
    """


@register("q_encoding_audit", oracle=_encoding_oracle())
def q_encoding_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encoding/mojibake audit (functions/text.py::encoding_exprs):
    per-source C0-control-character docs, U+FFFD replacement-character
    docs (the smoking gun of a wrong-charset decode upstream), and the
    exact non-ASCII character mass — the byte-hygiene gate run before
    any tokenizer sees the corpus. Two planted docs (one with BEL +
    U+FFFD + é, one clean) make the audit visibly fire and pin the
    regex semantics cross-engine; integer sums keep everything exact
    except one round(6) ratio of sums. Hash-matched."""
    from .functions.text import encoding_exprs

    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    planted = spark.createDataFrame(
        [
            ("_planted", "bad\x07ctrl�café"),
            ("_planted", "clean ascii only"),
        ],
        "source string, text string",
    )
    e = encoding_exprs(F.col("text"))
    feats = docs.unionByName(planted).select(
        "source",
        e["n_ctrl"].alias("n_ctrl"),
        e["n_replacement"].alias("n_repl"),
        e["n_non_ascii"].alias("n_na"),
        e["n_chars"].alias("n_ch"),
    )
    return (
        feats.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("n_ctrl") > 0, 1).otherwise(0)).alias(
                "docs_with_ctrl"
            ),
            F.sum(F.when(F.col("n_repl") > 0, 1).otherwise(0)).alias(
                "docs_with_replacement"
            ),
            F.sum("n_na").alias("total_non_ascii"),
            F.sum("n_ch").alias("total_chars"),
            F.round(
                F.try_divide(F.sum("n_na"), F.sum("n_ch")), 6
            ).alias("non_ascii_ratio"),
        )
        .orderBy("source")
    )


@register(
    "q_data_diff",
    oracle="""
    WITH a AS (
      SELECT o_orderkey AS k, o_orderstatus AS st, o_totalprice AS pr,
             o_orderpriority AS pp
      FROM orders
    ), b AS (
      SELECT k,
             CASE WHEN k % 97 = 0 THEN 'X' ELSE st END AS st,
             CASE WHEN k % 89 = 0 THEN pr + 1 ELSE pr END AS pr,
             pp
      FROM a WHERE k % 997 <> 0
      UNION ALL
      SELECT k + 10000000, 'N', pr, pp FROM a WHERE k % 499 = 0
    ), j AS (
      SELECT coalesce(a.k, b.k) AS k,
             a.k IS NOT NULL AS ina, b.k IS NOT NULL AS inb,
             a.st AS ast, b.st AS bst, a.pr AS apr, b.pr AS bpr,
             a.pp AS app, b.pp AS bpp
      FROM a FULL OUTER JOIN b ON a.k = b.k
    )
    SELECT CAST(sum(CASE WHEN ina AND inb THEN 1 ELSE 0 END) AS BIGINT)
             AS n_common,
           CAST(sum(CASE WHEN NOT ina THEN 1 ELSE 0 END) AS BIGINT)
             AS n_added,
           CAST(sum(CASE WHEN NOT inb THEN 1 ELSE 0 END) AS BIGINT)
             AS n_removed,
           CAST(sum(CASE WHEN ina AND inb
                          AND (ast IS DISTINCT FROM bst
                               OR apr IS DISTINCT FROM bpr
                               OR app IS DISTINCT FROM bpp)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_changed_rows,
           CAST(sum(CASE WHEN ina AND inb AND ast IS DISTINCT FROM bst
                         THEN 1 ELSE 0 END) AS BIGINT) AS changed_st,
           CAST(sum(CASE WHEN ina AND inb AND apr IS DISTINCT FROM bpr
                         THEN 1 ELSE 0 END) AS BIGINT) AS changed_pr,
           CAST(sum(CASE WHEN ina AND inb AND app IS DISTINCT FROM bpp
                         THEN 1 ELSE 0 END) AS BIGINT) AS changed_pp
    FROM j
    """,
)
def q_data_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level snapshot CONTENT diff (operators/reconcile.py::
    snapshot_diff) — the third snapshot-comparison tier: IBLT recovers
    WHICH keys churned, PSI says whether distributions moved, this
    says what actually changed cell-by-cell (the data-diff a
    bad-backfill investigation reads). Snapshot 2 is derived from
    orders with deterministic edits (status flips at %97, price bumps
    at %89, deletions at %997, additions at %499 — identical
    arithmetic both engines), and the one-row diff must count exactly
    those. NULL-safe equality (eqNullSafe ≡ IS DISTINCT FROM).
    Hash-matched."""
    from .operators.reconcile import snapshot_diff

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("st"),
        F.col("o_totalprice").alias("pr"),
        F.col("o_orderpriority").alias("pp"),
    )
    kept = o.filter(F.col("k") % 997 != 0).select(
        "k",
        F.when(F.col("k") % 97 == 0, F.lit("X")).otherwise(F.col("st")).alias("st"),
        F.when(F.col("k") % 89 == 0, F.col("pr") + 1).otherwise(F.col("pr")).alias("pr"),
        "pp",
    )
    added = o.filter(F.col("k") % 499 == 0).select(
        (F.col("k") + 10_000_000).alias("k"),
        F.lit("N").alias("st"),
        "pr",
        "pp",
    )
    snap2 = kept.unionByName(added)
    return snapshot_diff(o, snap2, key_col="k", compare_cols=["st", "pr", "pp"])


@register(
    "q_index_append",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_orderkey % 501 = 0
    """,
)
def q_index_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL file-index maintenance (operators/pruning.py::
    compact_index, driver-visible): snapshot 1 (even order keys) lands
    and gets indexed; snapshot 2 (odd keys) is APPENDED to the same
    table directory and ONLY its new files are indexed; compact_index
    unions the two index frames (per-file OR-merge handles split
    rows). The pruned point-lookup over the combined table must equal
    the oracle's full-scan filter — the zero-FN contract surviving the
    append loop a daily-snapshot table lives by, without ever
    re-indexing old files."""
    from .operators.pruning import (
        bloom_file_index,
        bloom_pruned_read,
        compact_index,
    )
    from .sketch import Shape

    orders = load_table(spark, sf_dir, "orders")
    scratch = _scratch_dir("idxappend")
    shape = Shape.for_np(250_000, 0.001)
    orders.filter(F.col("o_orderkey") % 2 == 0).repartitionByRange(
        4, "o_orderkey"
    ).write.mode("overwrite").parquet(scratch)
    snap1_files = set(spark.read.parquet(scratch).inputFiles())
    idx1 = bloom_file_index(
        spark.read.parquet(scratch), shape, key_col="o_orderkey"
    ).localCheckpoint()  # pin snapshot-1 rows before the append changes the dir
    orders.filter(F.col("o_orderkey") % 2 == 1).repartitionByRange(
        4, "o_orderkey"
    ).write.mode("append").parquet(scratch)
    new_files = sorted(
        set(spark.read.parquet(scratch).inputFiles()) - snap1_files
    )
    idx2 = bloom_file_index(
        spark.read.option("basePath", scratch).parquet(*new_files),
        shape,
        key_col="o_orderkey",
    )
    index = compact_index(idx1, idx2)
    keys = [
        r["o_orderkey"]
        for r in spark.read.parquet(scratch)
        .filter(F.col("o_orderkey") % 501 == 0)
        .select("o_orderkey")
        .collect()
    ]
    rows, _files_read = bloom_pruned_read(
        spark, scratch, index, keys, key_col="o_orderkey"
    )
    return rows.select("o_orderkey", "o_custkey", "o_totalprice")


@register(
    "q_partitioned_scan",
    oracle="""
    SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day, user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(38,4))) AS DOUBLE) AS total_value
    FROM events
    WHERE event_type IN ('purchase', 'signup')
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def q_partitioned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style PARTITIONED layout + partition-pruned read: events
    written partitionBy(event_type) (the directory-level pruning tier
    ABOVE the file-level zone/Bloom/xor indexes — a predicate on the
    partition column prunes whole directories in the driver's file
    index, before any file is even listed for I/O), then an IN-filter
    read that must touch only 2 of 5 partitions. The plan gate lives
    in tests/test_plans.py (PartitionFilters carries the predicate,
    and a partition-count assertion); the hash check here pins that
    pruning loses no rows — the pruned scan aggregates exactly like
    the oracle's full-table filter. The partition column is restored
    to its position in the output (partitionBy moves it to the
    directory key)."""
    ev = load_table(spark, sf_dir, "events")
    scratch = _scratch_dir("hivepart")
    ev.write.mode("overwrite").partitionBy("event_type").parquet(scratch)
    laid = spark.read.parquet(scratch)
    return (
        laid.filter(F.col("event_type").isin("purchase", "signup"))
        .groupBy(
            F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"), "user_id"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(38,4)"))
            .cast("double")
            .alias("total_value"),
        )
        .orderBy("day", "user_id")
    )


def _stream_events_typed_ordered(spark: SparkSession, sf_dir: str, n_files: int = 4):
    """(user_id, event_type, ts) TIME-ORDERED micro-batches — the
    typed-timestamp replay for watermarked stream-stream joins (range-
    disjoint batches keep every row inside the watermark tolerance)."""
    import glob
    import os
    import shutil

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.col("ts").cast("timestamp").alias("ts")
    )
    us = F.unix_micros(F.col("ts"))
    b = ev.agg(F.min(us).alias("lo"), F.max(us).alias("hi")).collect()[0]
    src = _scratch_dir("sattr_src")
    os.makedirs(src, exist_ok=True)
    span = (b["hi"] - b["lo"]) or 1
    for i in range(n_files):
        lo = b["lo"] + span * i // n_files
        hi = b["hi"] + 1 if i == n_files - 1 else b["lo"] + span * (i + 1) // n_files
        part_dir = _scratch_dir(f"sattr_part{i}")
        ev.where((us >= lo) & (us < hi)).coalesce(1).write.mode(
            "overwrite"
        ).parquet(part_dir)
        (f,) = glob.glob(os.path.join(part_dir, "part-*.parquet"))
        dst = os.path.join(src, f"batch_{i}.parquet")
        shutil.copy(f, dst)
        # explicit increasing mtimes pin micro-batch order with no
        # wall-clock sleep (review fix: 3 helpers x 4 files x 1.1s of
        # pure latency per contract run, gone)
        os.utime(dst, (_T0 + i, _T0 + i))
    return (
        spark.readStream.schema("user_id bigint, event_type string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )


@register(
    "q_streaming_attribution",
    oracle="""
    SELECT p.user_id,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(count(DISTINCT p.ts) AS BIGINT) AS n_attributed_purchases
    FROM (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT user_id, ts FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id
     AND v.ts >= p.ts - INTERVAL 1 HOUR
     AND v.ts <= p.ts
    GROUP BY 1 ORDER BY 1
    """,
)
def q_streaming_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM interval join (streaming/enrich.py::
    stream_stream_interval_join) — the attribution query: views within
    the hour BEFORE each purchase, both sides streaming with 2-hour
    watermarks bounding the join state (right rows evict once the
    watermark passes vts+1h; left once it passes pts — state is
    O(horizon), never O(stream)). Inner matches emit on arrival (the
    watermark gates cleanup, not emission), and the range-disjoint
    time-ordered replay keeps every needed row inside the horizon, so
    the appended pair set aggregates to EXACTLY the batch interval
    join — hash-matched."""
    import uuid

    from .streaming.enrich import stream_stream_interval_join

    stream = _stream_events_typed_ordered(spark, sf_dir)
    purchases = stream.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("puid"), F.col("ts").alias("pts")
    )
    views = stream.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("vuid"), F.col("ts").alias("vts")
    )
    pairs = stream_stream_interval_join(
        purchases,
        views,
        left_key="puid",
        right_key="vuid",
        left_ts="pts",
        right_ts="vts",
        before="1 HOUR",
        after="0 SECONDS",
        watermark="2 hours",
    ).select("puid", "pts", "vts")
    name = "rbf_sattr_" + uuid.uuid4().hex[:8]
    q = (
        pairs.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", _scratch_dir("sattr_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    _await_stream(q)
    return (
        spark.table(name)
        .groupBy(F.col("puid").alias("user_id"))
        .agg(
            F.count("*").alias("n_pairs"),
            F.countDistinct("pts").alias("n_attributed_purchases"),
        )
        .orderBy("user_id")
    )


@register(
    "q_streaming_enrich",
    oracle="""
    SELECT c.c_mktsegment AS segment, e.event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(e.value AS DECIMAL(38,4))) AS DOUBLE) AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def q_streaming_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STATIC enrichment join (streaming/enrich.py::
    stream_static_enrich): the events feed replayed as 4 micro-batches
    is joined per batch against the static customer dimension
    (broadcast — zero join state, no watermark: the one streaming join
    that is free at scale), then aggregated per (segment, event_type)
    in complete mode. A STREAMING query whose final table HASH-MATCHES
    the batch SQL join — replay-split invariance is exactly what the
    value hash certifies."""
    import uuid

    from .streaming.enrich import stream_static_enrich

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    src = _scratch_dir("senrich_src")
    ev.repartition(4).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(
            "event_id bigint, user_id bigint, event_type string, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    joined = stream_static_enrich(
        stream, cust, on=F.col("user_id") == F.col("c_custkey")
    )
    agg = joined.groupBy(
        F.col("c_mktsegment").alias("segment"), "event_type"
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(38,4)"))
        .cast("double")
        .alias("total_value"),
    )
    name = "rbf_senrich_" + uuid.uuid4().hex[:8]
    ckpt = _scratch_dir("senrich_ckpt")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    _await_stream(q)
    return spark.table(name).orderBy("segment", "event_type")


@register(
    "q_regional_volume",
    oracle="""
    SELECT n_name AS nation,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(38,4))
                    * (1 - CAST(l_discount AS DECIMAL(38,4)))) AS DOUBLE)
             AS revenue,
           CAST(count(*) AS BIGINT) AS n_lineitems
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND c_nationkey = s_nationkey
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n_name ORDER BY n_name
    """,
)
def q_regional_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped local-supplier volume: the six-table join
    (customer ⋈ orders ⋈ lineitem ⋈ supplier ⋈ nation ⋈ region) with
    the local-supply correlation c_nationkey = s_nationkey, a region
    filter, and a one-year window — the relational join-breadth
    workout: the three dimension tables broadcast (plus supplier —
    10k rows at sf1), the date filter pushes into the orders scan, and
    the only real shuffles are the customer⋈orders and orders⋈lineitem
    fact joins. Money through DECIMAL(38,4) then DOUBLE per the
    convention; hash-matched."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    dec = lambda c: F.col(c).cast("decimal(38,4)")  # noqa: E731
    joined = (
        cust.join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
            ),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
    )
    return (
        joined.groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_lineitems"),
        )
        .orderBy("nation")
    )


@register(
    "q_erasure_manifest",
    oracle="""
    SELECT 'events' AS table_name,
           CAST(count(*) AS BIGINT) AS n_rows_total,
           CAST(sum(CASE WHEN user_id % 13 = 3 AND user_id < 2000 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_rows_affected,
           CAST(count(DISTINCT CASE WHEN user_id % 13 = 3 AND user_id < 2000 THEN user_id END)
             AS BIGINT) AS n_subjects_present,
           round(sum(CASE WHEN user_id % 13 = 3 AND user_id < 2000 THEN 1 ELSE 0 END)
                 / count(*), 6) AS frac_rows
    FROM events
    UNION ALL
    SELECT 'orders',
           CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN o_custkey % 13 = 3 AND o_custkey < 2000 THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(DISTINCT CASE WHEN o_custkey % 13 = 3 AND o_custkey < 2000 THEN o_custkey END)
             AS BIGINT),
           round(sum(CASE WHEN o_custkey % 13 = 3 AND o_custkey < 2000 THEN 1 ELSE 0 END)
                 / count(*), 6)
    FROM orders
    UNION ALL
    SELECT 'lineitem_via_orders',
           CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN o_custkey % 13 = 3 AND o_custkey < 2000 THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(DISTINCT CASE WHEN o_custkey % 13 = 3 AND o_custkey < 2000 THEN o_custkey END)
             AS BIGINT),
           round(sum(CASE WHEN o_custkey % 13 = 3 AND o_custkey < 2000 THEN 1 ELSE 0 END)
                 / count(*), 6)
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ORDER BY table_name
    """,
)
def q_erasure_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-erasure impact manifest (operators/integrity.py::
    erasure_manifest): given a broadcast data-subject key list (here
    ids ≡ 3 mod 13 — the arithmetic form so the oracle needs no
    registry table), how many rows and distinct subjects each table
    would lose — including lineitem reached TRANSITIVELY through its
    order's customer. The relational companion to the sketch-side
    revocation (q_counting_bloom_revoke deletes from membership state;
    this scopes the row deletes and leaves the audit trail). One scan
    per table with a broadcast left-join mark. Hash-matched."""
    from .operators.integrity import erasure_manifest

    ev = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    subjects = spark.range(0, 2000).filter(F.col("id") % 13 == 3).select(
        F.col("id").alias("subject")
    )
    li_keyed = li.join(
        orders.select("o_orderkey", "o_custkey"),
        on=li["l_orderkey"] == F.col("o_orderkey"),
    )
    out = erasure_manifest(
        subjects,
        [
            ("events", ev, "user_id"),
            ("orders", orders, "o_custkey"),
            ("lineitem_via_orders", li_keyed, "o_custkey"),
        ],
    )
    return out.orderBy("table_name")


@register(
    "q_cohort_ltv",
    oracle="""
    WITH first AS (
      SELECT o_custkey AS c, min(o_orderdate) AS f FROM orders GROUP BY 1
    ), firsts AS (
      SELECT c, year(f) * 12 + month(f) AS cm,
             strftime(f, '%Y-%m') AS cohort
      FROM first
    ), tagged AS (
      SELECT fr.cohort,
             CAST(year(o.o_orderdate) * 12 + month(o.o_orderdate) - fr.cm
               AS INT) AS period,
             CAST(o.o_totalprice AS DECIMAL(38,4)) AS amt
      FROM orders o JOIN firsts fr ON o.o_custkey = fr.c
    ), sizes AS (
      SELECT cohort, CAST(count(*) AS BIGINT) AS n_customers
      FROM firsts GROUP BY 1
    ), per AS (
      SELECT cohort, period, sum(amt) AS rev FROM tagged GROUP BY 1, 2
    ), cum AS (
      SELECT cohort, period, CAST(rev AS DOUBLE) AS period_revenue,
             CAST(sum(rev) OVER (
               PARTITION BY cohort ORDER BY period
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS DOUBLE) AS cum_revenue
      FROM per
    )
    SELECT cohort AS cohort_month, period, n_customers,
           round(period_revenue, 6) AS period_revenue,
           round(cum_revenue, 6) AS cum_revenue,
           round(cum_revenue / n_customers, 6) AS ltv_per_customer
    FROM cum JOIN sizes USING (cohort)
    ORDER BY cohort_month, period
    """,
)
def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves (operators/retention.py::
    cohort_ltv) — the revenue companion to q_retention_cohorts:
    first-order-month cohorts, cumulative revenue per cohort customer
    by month-period ("are newer cohorts monetizing faster"). Integer
    month arithmetic (year·12+month — no months_between float
    semantics), money through DECIMAL(38,4) then DOUBLE; one
    |customers| aggregate broadcast back for the period tag, one
    (cohort, period) aggregate, cumulative windows over the tiny
    result frame. Hash-matched."""
    from .operators.retention import cohort_ltv

    orders = load_table(spark, sf_dir, "orders")
    return cohort_ltv(orders).orderBy("cohort_month", "period")


@register(
    "q_dedup_savings",
    oracle=f"""
    WITH base AS (
      SELECT source, doc_id,
             md5(substr(text, 1, 40)) AS fp,
             CAST(len({DUCKDB_TOKENIZE("text")}) AS BIGINT) AS w,
             row_number() OVER (
               PARTITION BY md5(substr(text, 1, 40)) ORDER BY doc_id ASC
             ) AS rn
      FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(w) AS BIGINT) AS total_tokens,
           CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_docs,
           CAST(sum(CASE WHEN rn > 1 THEN w ELSE 0 END) AS BIGINT)
             AS dup_tokens,
           round(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) / count(*), 6)
             AS frac_dup_docs,
           round(sum(CASE WHEN rn > 1 THEN w ELSE 0 END) / sum(w), 6)
             AS frac_dup_tokens
    FROM base GROUP BY source ORDER BY source
    """,
)
def q_dedup_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-dedup SAVINGS report per source (operators/dedup.py::
    dedup_savings): duplicate docs under the keep-first-by-id
    fingerprint rule and the token mass they waste — the sizing read
    before a corpus-rewrite dedup pass and the attribution read after
    (duplicates attach to the COPY's source, so a mirror feed shows in
    its own row). Same plan shape and cost as one exact_dedup
    candidate pass (one fingerprint exchange). Hash-matched vs the
    identical DuckDB window algebra."""
    from .functions.text import tokenize_md5
    from .operators.dedup import dedup_savings

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "source",
        "doc_id",
        F.md5(F.substring("text", 1, 40)).alias("fp"),
        F.size(tokenize_md5(F.col("text"))).alias("n_tok"),
    )
    return dedup_savings(base).orderBy("source")


@register(
    "q_weighted_length_quantiles",
    oracle=_SEQ_CTE
    + """
    , base AS (
      SELECT source, CAST(len(tokens) AS BIGINT) AS w,
             sum(CAST(len(tokens) AS BIGINT)) OVER (
               PARTITION BY source ORDER BY len(tokens) ASC, doc_id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             sum(CAST(len(tokens) AS BIGINT)) OVER (PARTITION BY source) AS tot
      FROM sequences
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(max(tot) AS BIGINT) AS total_weight,
           CAST(min(CASE WHEN 100 * cum >= 50 * tot THEN w END) AS BIGINT)
             AS w_p50,
           CAST(min(CASE WHEN 100 * cum >= 90 * tot THEN w END) AS BIGINT)
             AS w_p90
    FROM base GROUP BY source ORDER BY source
    """,
)
def q_weighted_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOKEN-weighted document-length quantiles per source
    (operators/percentiles.py::weighted_length_quantiles): the length
    of the document the median (and p90) TOKEN lives in — what a
    typical token's context looks like, vs the doc-weighted median's
    typical document. Converts the Pareto skew into the quantile the
    chunk/pack parameter choice needs. Selection is pure BIGINT
    arithmetic on the deterministic (weight, id) order — exact integer
    quantiles, no interpolation, no float boundary. Hash-matched."""
    from .operators.percentiles import weighted_length_quantiles

    seq = sequences_from_documents(spark, sf_dir)
    return weighted_length_quantiles(seq).orderBy("source")


@register(
    "q_lexical_richness",
    oracle=_SEQ_CTE
    + """
    , tok AS (SELECT source AS g, unnest(tokens) AS t FROM sequences),
    st AS (SELECT g, t, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1, 2)
    SELECT g AS source,
           CAST(count(*) AS BIGINT) AS n_types,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
           CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dis,
           round(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) / count(*), 6)
             AS hapax_type_share,
           round(sum(CASE WHEN c = 1 THEN c ELSE 0 END) / sum(c), 6)
             AS hapax_mass_share,
           round(count(*) / sum(c), 6) AS type_token_ratio
    FROM st GROUP BY g ORDER BY g
    """,
)
def q_lexical_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hapax-based lexical richness per source (operators/vocab.py::
    lexical_richness): hapax/dis legomena counts, their type and mass
    shares, and the type-token ratio — the TAIL's weight next to
    Zipf's head slope and Heaps' growth (collapsed hapax share =
    boilerplate; inflated = OCR noise/tokenizer shredding, the same
    pathologies the OOV audit sees from the vocabulary side). One
    corpus explode into a map-side-combinable (source, token) count,
    one aggregate after. Hash-matched."""
    from .operators.vocab import lexical_richness

    seq = sequences_from_documents(spark, sf_dir)
    return lexical_richness(seq).orderBy("source")


@register(
    "q_trimmed_stats",
    oracle="""
    WITH base AS (
      SELECT event_type, CAST(value AS DOUBLE) AS v,
             row_number() OVER (
               PARTITION BY event_type ORDER BY value ASC, event_id ASC) AS rlo,
             row_number() OVER (
               PARTITION BY event_type ORDER BY value DESC, event_id DESC) AS rhi,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM events
    ), enr AS (
      SELECT event_type, v, n,
             CAST(floor(0.1 * n) AS BIGINT) AS k,
             max(CASE WHEN rlo = CAST(floor(0.1 * n) AS BIGINT) + 1 THEN v END)
               OVER (PARTITION BY event_type) AS lo_edge,
             max(CASE WHEN rhi = CAST(floor(0.1 * n) AS BIGINT) + 1 THEN v END)
               OVER (PARTITION BY event_type) AS hi_edge,
             rlo, rhi
      FROM base
    )
    SELECT event_type,
           CAST(max(n) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN rlo > k AND rhi > k THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           round(avg(v), 6) AS mean,
           round(avg(CASE WHEN rlo > k AND rhi > k THEN v END), 6)
             AS trimmed_mean,
           round(avg(CASE WHEN rlo <= k THEN lo_edge
                          WHEN rhi <= k THEN hi_edge
                          ELSE v END), 6) AS winsorized_mean
    FROM enr GROUP BY event_type ORDER BY event_type
    """,
)
def q_trimmed_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trimmed + winsorized means per event type (operators/
    outliers.py::trimmed_stats) — the robust LOCATION tier next to the
    MAD fences' robust spread: rank-based 10% trim at each end on the
    deterministic (value, event_id) total order, so WHICH rows drop or
    clamp is engine-exact and only the final averages round(6). One
    window pass + one aggregate per key. Hash-matched vs DuckDB's
    identical rank algebra."""
    from .operators.outliers import trimmed_stats

    ev = load_table(spark, sf_dir, "events")
    return trimmed_stats(ev, "event_type", "value", "event_id").orderBy(
        "event_type"
    )


@register(
    "q_pareto_coverage",
    oracle=_SEQ_CTE
    + """
    , base AS (
      SELECT source, doc_id, CAST(len(tokens) AS BIGINT) AS w,
             sum(CAST(len(tokens) AS BIGINT)) OVER (
               PARTITION BY source ORDER BY len(tokens) DESC, doc_id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             sum(CAST(len(tokens) AS BIGINT)) OVER (PARTITION BY source) AS tot,
             count(*) OVER (PARTITION BY source) AS n,
             row_number() OVER (
               PARTITION BY source ORDER BY len(tokens) DESC, doc_id ASC) AS rk
      FROM sequences
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(max(tot) AS BIGINT) AS total_weight,
           CAST(sum(CASE WHEN 100 * (cum - w) < 80 * tot THEN 1 ELSE 0 END)
             AS BIGINT) AS docs_to_threshold,
           round(sum(CASE WHEN 100 * (cum - w) < 80 * tot THEN 1 ELSE 0 END)
                 / count(*), 6) AS frac_docs_to_threshold,
           round(sum(CASE WHEN rk <= floor((n + 9) / 10) THEN w ELSE 0 END)
                 / max(tot), 6) AS top_decile_share
    FROM base GROUP BY source ORDER BY source
    """,
)
def q_pareto_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-mass concentration per source (operators/datacard.py::
    pareto_coverage): how many documents carry 80% of the tokens, and
    the top decile's share — the Pareto companion to the datasheet (a
    few-giant-documents feed needs different dedup/chunking treatment
    than a flat one, so this runs before chunk/pack parameter
    choices). The threshold test is pure BIGINT arithmetic
    (100·before < 80·total — no float boundary can flip a count);
    deterministic (weight desc, doc_id asc) total order. Hash-matched
    vs DuckDB's identical window algebra."""
    from .operators.datacard import pareto_coverage

    seq = sequences_from_documents(spark, sf_dir)
    return pareto_coverage(seq).orderBy("source")


@register(
    "q_bigram_entropy",
    oracle=_SEQ_CTE
    + """
    , pk AS (
      SELECT source AS g,
             unnest(list_transform(range(len(tokens) - 1),
                    i -> CAST(tokens[i+1] AS BIGINT) * 50261 + tokens[i+2]))
               AS pk
      FROM sequences WHERE len(tokens) >= 2
    ), pc AS (
      SELECT g, pk, CAST(count(*) AS BIGINT) AS c FROM pk GROUP BY 1, 2
    ), base AS (
      SELECT g, c, (pk - pk % 50261) / 50261 AS a, pk % 50261 AS b FROM pc
    ), enr AS (
      SELECT g, c,
             sum(c) OVER (PARTITION BY g, a) AS ca,
             sum(c) OVER (PARTITION BY g, b) AS cb,
             sum(c) OVER (PARTITION BY g) AS n
      FROM base
    )
    SELECT g AS source,
           CAST(max(n) AS BIGINT) AS n_pairs,
           round(-sum(c::DOUBLE * ln(c::DOUBLE / ca)) / max(n), 6) AS h_cond,
           round(-sum(c::DOUBLE * ln(cb::DOUBLE / n)) / max(n), 6) AS h_right,
           round((-sum(c::DOUBLE * ln(cb::DOUBLE / n)) / max(n))
                 - (-sum(c::DOUBLE * ln(c::DOUBLE / ca)) / max(n)), 6)
             AS mutual_info
    FROM enr GROUP BY g ORDER BY g
    """,
)
def q_bigram_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source bigram information profile (operators/lm.py::
    bigram_entropy): conditional entropy H(next|prev), unigram
    H(next), and their gap — mutual information — in nats. The
    PREDICTABILITY axis of the text-statistics family (Zipf/Heaps read
    frequency/growth laws, KL reads between-group shift, this reads
    within-text structure: template corpora pin each next token, MI≈0
    means shuffled); also the exact average log-loss of the unsmoothed
    bigram LM. One corpus scan of map-side pair keys into a (source,
    pair) count; marginals are window sums over the vocab²-bounded
    frame. Hash-matched vs DuckDB's identical window algebra."""
    from .operators.lm import bigram_entropy

    seq = sequences_from_documents(spark, sf_dir)
    return bigram_entropy(seq).orderBy("source")


@register(
    "q_rfm_segments",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey AS c,
             date_diff('day', max(o_orderdate),
                       (SELECT max(o_orderdate) FROM orders)) AS rec,
             count(*) AS freq,
             sum(CAST(o_totalprice AS DECIMAL(38,4))) AS money
      FROM orders GROUP BY 1
    ), scored AS (
      SELECT ntile(5) OVER (ORDER BY rec ASC, c ASC) AS r_score,
             ntile(5) OVER (ORDER BY freq ASC, c ASC) AS f_score,
             ntile(5) OVER (ORDER BY money ASC, c ASC) AS m_score,
             money
      FROM per_cust
    )
    SELECT r_score, f_score, m_score,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(max(money) AS DOUBLE) AS max_monetary,
           CAST(sum(money) AS DOUBLE) AS total_monetary
    FROM scored GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
)
def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation (operators/retention.py::
    rfm_segments): recency/frequency/monetary quintile scores with a
    fully deterministic (metric, customer) ordering, aggregated to the
    segment grid — behavioral tiering before sampling/marketing. One
    map-side-combinable corpus aggregate to |customers| rows, three
    ntile windows over that frame, one ≤5³ grid aggregate; money
    through DECIMAL(38,4) per the cross-engine convention.
    Hash-matched because the total order makes every ntile bucket
    engine-exact."""
    from .operators.retention import rfm_segments

    orders = load_table(spark, sf_dir, "orders")
    out = rfm_segments(orders)
    return out.select(
        "r_score",
        "f_score",
        "m_score",
        "n_customers",
        F.col("max_monetary").cast("double").alias("max_monetary"),
        F.col("total_monetary").cast("double").alias("total_monetary"),
    ).orderBy("r_score", "f_score", "m_score")


@register(
    "q_cluster_quality",
    oracle="""
    -- constant 1..64 series recovers positions (q_embedding_centroids
    -- convention; a dim mismatch surfaces as a row-count/hash FAIL)
    WITH e AS (
      SELECT vec_id, label, CAST(i AS INT) AS pos,
             embedding[CAST(i AS INT)] AS v
      FROM embeddings CROSS JOIN generate_series(1, 64) AS t(i)
    ), cent AS (
      SELECT label, pos, avg(v) AS m FROM e GROUP BY 1, 2
    ), pd AS (
      SELECT e.vec_id, e.label,
             sqrt(sum((e.v - c.m) * (e.v - c.m))) AS dist
      FROM e JOIN cent c ON e.label = c.label AND e.pos = c.pos
      GROUP BY 1, 2
    ), s AS (
      SELECT label, avg(dist) AS s_i, CAST(count(*) AS BIGINT) AS n_vecs
      FROM pd GROUP BY 1
    ), dmat AS (
      SELECT a.label AS la, b.label AS lb,
             sqrt(sum((a.m - b.m) * (a.m - b.m))) AS d
      FROM cent a JOIN cent b ON a.pos = b.pos AND a.label <> b.label
      GROUP BY 1, 2
    ), ratios AS (
      SELECT la, sa.n_vecs, sa.s_i,
             round((sa.s_i + sb.s_i) / d, 6) AS r, lb
      FROM dmat JOIN s sa ON sa.label = la JOIN s sb ON sb.label = lb
    ), per_label AS (
      SELECT la, n_vecs, s_i, r, lb
      FROM ratios
      QUALIFY row_number() OVER (
        PARTITION BY la ORDER BY r DESC, lb DESC
      ) = 1
    ), db AS (
      SELECT round(avg(r), 6) AS db_index FROM per_label
    )
    SELECT la AS label, n_vecs, round(s_i, 6) AS scatter,
           r AS worst_ratio, CAST(lb AS INT) AS worst_neighbor, db_index
    FROM per_label CROSS JOIN db
    ORDER BY label
    """,
)
def q_cluster_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Davies–Bouldin label-cluster quality over the embedding corpus
    (operators/spectral.py::cluster_quality): per-label scatter, the
    worst separation ratio and which neighbor attains it, plus the
    corpus DB index — the label-health diagnostic after
    q_embedding_centroids (centroids say WHERE each domain sits, this
    says WHICH domains collapsed into each other — the pair a
    dedup/mixing pass reviews first). One persisted posexplode feeds
    both passes; everything after the per-vector aggregate is
    |labels|²-bounded. Hash-matched vs DuckDB's constant-series
    rendering at round(6)."""
    from .operators.spectral import cluster_quality

    emb = load_table(spark, sf_dir, "embeddings")
    return cluster_quality(emb).orderBy("label")


@register(
    "q_oov_rate",
    oracle=_SEQ_CTE
    + """
    , tok AS (SELECT source AS g, unnest(tokens) AS t FROM sequences),
    st AS (SELECT g, t, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1, 2),
    gt AS (SELECT t, sum(c) AS n FROM st GROUP BY 1),
    vocab AS (
      SELECT t FROM gt
      QUALIFY row_number() OVER (ORDER BY n DESC, t ASC) <= 500
    )
    SELECT st.g AS source,
           CAST(sum(c) AS BIGINT) AS total_tokens,
           CAST(sum(CASE WHEN v.t IS NULL THEN c ELSE 0 END) AS BIGINT)
             AS oov_occurrences,
           round(sum(CASE WHEN v.t IS NULL THEN c ELSE 0 END) / sum(c), 6)
             AS oov_rate,
           CAST(sum(CASE WHEN v.t IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS oov_types,
           CAST(count(*) AS BIGINT) AS distinct_types
    FROM st LEFT JOIN vocab v ON st.t = v.t
    GROUP BY 1 ORDER BY 1
    """,
)
def q_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary audit (operators/vocab.py::oov_rate): per
    source, the fraction of token occurrences and types outside the
    top-500 frequency-built reference vocabulary (deterministic
    count-desc/token-asc cut) — the tokenizer-fit check: an OOV
    outlier source is being shredded into fallback bytes (code against
    a prose vocab, wrong language) and trains badly regardless of its
    quality scores. One corpus explode into a map-side-combinable
    (source, token) count (persisted + tied, two consumers);
    everything downstream bounded by sources × vocab. Hash-matched vs
    DuckDB's QUALIFY rendering."""
    from .operators.vocab import oov_rate

    seq = sequences_from_documents(spark, sf_dir)
    return oov_rate(seq, vocab_size=500).orderBy("source")


_CHUNK_SIZE, _CHUNK_STRIDE = 48, 32


@register(
    "q_chunk_windows",
    oracle=_SEQ_CTE
    + f"""
    , c AS (
      SELECT doc_id, tokens, len(tokens) AS n,
             CASE WHEN len(tokens) <= {_CHUNK_SIZE} THEN 1
                  ELSE CAST((len(tokens) - {_CHUNK_SIZE} + {_CHUNK_STRIDE} - 1)
                            // {_CHUNK_STRIDE} AS INT) + 1
             END AS n_chunks
      FROM sequences WHERE len(tokens) > 0
    )
    SELECT doc_id,
           CAST(i AS INT) AS chunk_idx,
           CAST(i * {_CHUNK_STRIDE} AS INT) AS start,
           CAST(least(i * {_CHUNK_STRIDE} + {_CHUNK_SIZE}, n)
                - i * {_CHUNK_STRIDE} AS INT) AS chunk_len,
           md5(array_to_string(
             tokens[i * {_CHUNK_STRIDE} + 1
                    : least(i * {_CHUNK_STRIDE} + {_CHUNK_SIZE}, n)], ','))
             AS chunk_md5,
           i = n_chunks - 1 AS is_last
    FROM c, LATERAL (SELECT unnest(range(0, n_chunks)) AS i)
    ORDER BY doc_id, chunk_idx
    """,
)
def q_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window training-chunk manifest (operators/curation.py::
    chunk_windows): every tokenized document cut into size-48 windows
    advancing by 32 (16-token overlap carries context across cuts) —
    the step between raw docs and pack_sequences (packing fills
    context windows with whole SHORT docs; chunking makes LONG docs
    fit at all). chunk_md5 pins the exact token content of every
    window cross-engine; the manifest ships instead of materialized
    slices. Map-side sequence()+explode, no shuffle. Hash-matched vs
    DuckDB's 1-based list-slice rendering."""
    from .operators.curation import chunk_windows

    seq = sequences_from_documents(spark, sf_dir)
    return chunk_windows(
        seq, size=_CHUNK_SIZE, stride=_CHUNK_STRIDE
    ).orderBy("doc_id", "chunk_idx")


def _readability_oracle() -> str:
    from .functions.text import duckdb_readability

    r = duckdb_readability("text")
    return f"""
    SELECT doc_id,
           {r['n_words']} AS n_words,
           {r['n_sentences']} AS n_sentences,
           {r['n_syllables']} AS n_syllables,
           {r['fre']} AS fre,
           {r['fk_grade']} AS fk_grade
    FROM documents
    ORDER BY doc_id LIMIT 200
    """


@register("q_readability", oracle=_readability_oracle())
def q_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch Reading Ease + Flesch–Kincaid grade per document
    (functions/text.py::readability_exprs) — the register/fluency tier
    of the quality family: ratio features catch structural junk,
    compression catches repetition and entropy, readability catches
    text whose sentence and word shapes sit far from prose (legalese,
    keyword stuffing). Pure Catalyst higher-order functions over one
    word array; min-1 clamps for sentences and per-word syllables make
    the classic approximations total. Hash-matched vs the 1:1 DuckDB
    rendering at round(4)."""
    from .functions.text import readability_exprs

    docs = load_table(spark, sf_dir, "documents")
    r = readability_exprs(F.col("text"))
    return (
        docs.select(
            "doc_id",
            r["n_words"].alias("n_words"),
            r["n_sentences"].alias("n_sentences"),
            r["n_syllables"].alias("n_syllables"),
            r["fre"].alias("fre"),
            r["fk_grade"].alias("fk_grade"),
        )
        .orderBy("doc_id")
        .limit(200)
    )


@register(
    "q_seasonality_dow",
    oracle="""
    WITH daily AS (
      SELECT event_type AS k, isodow(CAST(ts AS DATE)) AS dow,
             CAST(count(*) AS DOUBLE) AS x
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ), dowm AS (
      SELECT k, dow, avg(x) AS m FROM daily GROUP BY 1, 2
    ), peak AS (
      SELECT k, dow AS peak_dow, round(m, 6) AS peak_avg
      FROM (
        SELECT k, dow, m,
               row_number() OVER (
                 PARTITION BY k ORDER BY round(m, 6) DESC, dow DESC
               ) AS rn
        FROM dowm
      ) WHERE rn = 1
    ), r AS (
      SELECT d.k, CAST(count(*) AS BIGINT) AS n_days,
             var_pop(d.x) AS vt, var_pop(d.x - m.m) AS vr
      FROM daily d JOIN dowm m USING (k, dow) GROUP BY 1
    )
    SELECT r.k AS event_type, r.n_days,
           round(greatest(0.0, 1.0 - vr / NULLIF(vt, 0)), 6)
             AS seasonal_strength,
           CAST(p.peak_dow AS INT) AS peak_dow,
           p.peak_avg
    FROM r JOIN peak p ON r.k = p.k
    ORDER BY event_type
    """,
)
def q_seasonality_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality strength per event type (operators/
    trend.py::seasonal_strength_dow): the Hyndman strength statistic
    1 − var(residual)/var(series) with the 7 day-of-week means as the
    seasonal fit, plus the peak ISO day. ACF says whether the series
    remembers; this says how much of its variance the weekly shape
    explains. Two map-side-combinable aggregates + one broadcast join
    of the |keys|·7 means frame. Hash-matched vs DuckDB's identical
    decomposition (max-of-struct ≡ ORDER BY m DESC, dow DESC)."""
    from .operators.trend import seasonal_strength_dow

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("day")
    )
    daily = ev.groupBy("event_type", "day").agg(F.count("*").alias("cnt"))
    return seasonal_strength_dow(daily, "event_type", "day", "cnt").orderBy(
        "event_type"
    )


@register("q_compressibility")
def q_compressibility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DEFLATE compressibility quality profile (operators/quality.py):
    per-source mean zlib ratio + fractions in the repetitive tail
    (boilerplate/spam compresses far below prose) and the high-entropy
    tail (base64/hex/minified blobs) — the Gopher-family repetition
    signal the Catalyst ratio features can't express. One scoring scan
    (per-payload C call, same cost class as the multimodal codecs)
    into one map-side-combinable aggregate. Rows-only (zlib is not
    SQL-expressible); in-query gates: a planted repeated-phrase doc
    must land deep in the repetitive tail, a planted md5-chain hex doc
    in the high-entropy tail, and every real source mean must sit in
    (0, 1.1]."""
    import hashlib

    from .operators.quality import compressibility_profile

    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    chain, h = [], b"seed"
    for _ in range(80):
        h = hashlib.md5(h).digest()
        chain.append(h.hex())
    planted = spark.createDataFrame(
        [
            ("_planted_rep", "click here to buy now " * 150),
            ("_planted_rand", "".join(chain)),
        ],
        "source string, text string",
    )
    out = compressibility_profile(
        docs.unionByName(planted), "source", "text"
    )
    gate = (
        F.when(F.col("source") == "_planted_rep", F.col("mean_ratio") < 0.2)
        .when(F.col("source") == "_planted_rand", F.col("mean_ratio") > 0.55)
        .otherwise(
            (F.col("mean_ratio") > 0) & (F.col("mean_ratio") <= 1.1)
        )
    )
    return out.withColumn("gate_ok", gate).orderBy("source")


_FD_RULES = [
    ("o_orderkey", "o_custkey"),      # key -> anything: FD by uniqueness
    ("o_orderkey", "o_orderstatus"),
    ("o_custkey", "o_orderkey"),      # reversed: violated (customers reorder)
    ("o_custkey", "o_orderpriority"),
    ("o_orderdate", "o_orderstatus"),
]


def _fd_oracle() -> str:
    """Programmatic DuckDB rendering of the identical per-rule FD
    audit; NULL dependents count as a value of their own (count(*) >
    count(dep) adds one), NULL determinants are excluded."""
    parts = []
    for det, dep in _FD_RULES:
        parts.append(f"""
        SELECT '{det} -> {dep}' AS rule,
               CAST(count(*) AS BIGINT) AS n_det_values,
               CAST(coalesce(sum(CASE WHEN fan > 1 THEN 1 ELSE 0 END), 0)
                 AS BIGINT) AS n_violating_dets,
               CAST(coalesce(max(fan), 0) AS INT) AS max_fanout,
               coalesce(sum(CASE WHEN fan > 1 THEN 1 ELSE 0 END), 0) = 0
                 AS is_fd
        FROM (
          SELECT {det} AS det,
                 count(DISTINCT {dep})
                   + CASE WHEN count(*) > count({dep}) THEN 1 ELSE 0 END AS fan
          FROM orders WHERE {det} IS NOT NULL GROUP BY 1
        )""")
    return "\nUNION ALL ".join(parts) + "\nORDER BY rule"


@register("q_fd_audit", oracle=_fd_oracle())
def q_fd_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency audit (operators/integrity.py::fd_audit) —
    the intra-table complement of q_fk_audit: does every determinant
    map to exactly one dependent? A violated "obvious" FD is the
    symptom of an upstream join fanning rows out; a confirmed FD is a
    license to normalize a wide fact table. Five rules over orders
    (both key-backed FDs, a reversed non-FD, and the constant
    shippriority). Per rule: one det-cardinality groupBy over a
    two-column projection, map-side combined; NULL dependents count as
    their own value, NULL determinants are excluded. Hash-matched vs
    the identical per-rule DuckDB algebra."""
    from .operators.integrity import fd_audit

    orders = load_table(spark, sf_dir, "orders")
    return fd_audit(orders, _FD_RULES).orderBy("rule")


_SWEEP_TS = [round(i * 0.03, 2) for i in range(11)]  # 0.00 .. 0.30


def _filter_sweep_oracle() -> str:
    """DuckDB rendering of the identical one-aggregate threshold sweep
    (conditional sums -> UNION-ALL unpivot, mirroring Spark's stack());
    the score expression is the q_quality_scores stopword_ratio."""
    conds = "\n             ".join(
        f"sum(CASE WHEN s >= CAST({t!r} AS DOUBLE) THEN 1 ELSE 0 END) AS n{i},\n"
        f"             sum(CASE WHEN s >= CAST({t!r} AS DOUBLE) THEN n_chars ELSE 0 END) AS m{i},"
        for i, t in enumerate(_SWEEP_TS)
    ).rstrip(",")
    unions = "\n      UNION ALL ".join(
        f"SELECT source, n, m, CAST({t!r} AS DOUBLE) AS threshold, "
        f"n{i} AS docs_kept, m{i} AS mass_kept FROM wide"
        for i, t in enumerate(_SWEEP_TS)
    )
    return rf"""
    WITH scored AS (
      SELECT source, n_chars,
             round(len(list_filter(list_filter(regexp_split_to_array(lower(text), '\s+'), w -> w <> ''),
                   w -> list_contains(['the','a','of','and','to','in','is','it','for','on'], w)))::DOUBLE
                   / len(list_filter(regexp_split_to_array(text, '\s+'), w -> w <> '')), 6) AS s
      FROM documents
    ), wide AS (
      SELECT source, count(*) AS n, sum(n_chars) AS m,
             {conds}
      FROM scored GROUP BY 1
    ), long AS (
      {unions}
    )
    SELECT source, threshold,
           CAST(docs_kept AS BIGINT) AS docs_kept,
           round(docs_kept / n, 6) AS frac_docs,
           CAST(mass_kept AS BIGINT) AS mass_kept,
           round(mass_kept / NULLIF(m, 0), 6) AS frac_mass
    FROM long ORDER BY source, threshold
    """


@register("q_filter_sweep", oracle=_filter_sweep_oracle())
def q_filter_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-filter RETENTION SWEEP (operators/curation.py::
    filter_sweep): for 11 candidate stopword-ratio cutoffs, how many
    documents and how much character mass survive per source — the
    decision table read BEFORE committing a corpus-scale delete (pick
    the knee; watch for a source cliff-dropping, the filter-bias
    fairness check). ONE map-side-combinable aggregate with 22
    conditional sums — no explode-by-threshold row multiplication, no
    histogram intermediary; adding a threshold adds a column, not a
    pass. Hash-matched vs DuckDB's identical conditional-sum algebra."""
    from .functions.text import quality_exprs
    from .operators.curation import filter_sweep

    docs = load_table(spark, sf_dir, "documents")
    q = quality_exprs(F.col("text"))
    scored = docs.select(
        "source", "n_chars", q["stopword_ratio"].alias("s")
    )
    return filter_sweep(
        scored, "source", "s", _SWEEP_TS, mass_col="n_chars"
    ).orderBy("source", "threshold")


def _acf_oracle(max_lag: int = 7) -> str:
    """DuckDB rendering of the identical sample-ACF algebra (wide lead
    windows -> per-key aggregate -> UNION-ALL unpivot, mirroring
    Spark's stack())."""
    leads = ",\n             ".join(
        f"lead(x, {k}) OVER w AS l{k}" for k in range(1, max_lag + 1)
    )
    nums = ",\n             ".join(
        f"sum((x - xbar) * (l{k} - xbar)) AS n{k}" for k in range(1, max_lag + 1)
    )
    unions = "\n      UNION ALL ".join(
        f"SELECT event_type, n_days, ss, {k} AS lag, n{k} AS num FROM agg"
        for k in range(1, max_lag + 1)
    )
    return f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(count(*) AS DOUBLE) AS x
      FROM events GROUP BY 1, 2
    ), base AS (
      SELECT event_type, x,
             avg(x) OVER (PARTITION BY event_type) AS xbar,
             {leads}
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day)
    ), agg AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
             sum((x - xbar) * (x - xbar)) AS ss,
             {nums}
      FROM base GROUP BY 1
    ), long AS (
      {unions}
    )
    SELECT event_type, CAST(lag AS INT) AS lag,
           round(num / NULLIF(ss, 0), 6) AS acf,
           n_days,
           round(1.96 / sqrt(n_days), 6) AS ci,
           abs(round(num / NULLIF(ss, 0), 6)) > round(1.96 / sqrt(n_days), 6)
             AS is_significant
    FROM long ORDER BY event_type, lag
    """


@register("q_daily_acf", oracle=_acf_oracle())
def q_daily_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample autocorrelation per event type (operators/trend.py::acf):
    r_k for lags 1..7 over the daily count series, with the ±1.96/√n
    white-noise band — the seasonality/memory diagnostic completing
    the series family (trend says HOW FAST, CUSUM says WHEN, ACF says
    WHETHER THE SERIES REMEMBERS — a weekly cycle lights up r_7, white
    noise stays inside the band). One hash exchange on the key carries
    the mean window, all lead windows, and the final aggregate; output
    |keys|·7 rows. Hash-matched vs DuckDB's identical centered-product
    algebra at round(6)."""
    from .operators.trend import acf

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("day")
    )
    daily = ev.groupBy("event_type", "day").agg(F.count("*").alias("cnt"))
    return acf(daily, "event_type", "day", "cnt", max_lag=7).orderBy(
        "event_type", "lag"
    )


@register(
    "q_jsonl_scan",
    oracle="""
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           md5(string_agg(md5(text), ',' ORDER BY doc_id)) AS text_md5,
           3 AS n_quarantined
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
)
def q_jsonl_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL ingest with corrupt-line quarantine (sources/read_jsonl +
    split_corrupt) — the format a curation pipeline reads FIRST. The
    documents table is round-tripped through JSON Lines with THREE
    malformed lines injected; the reader takes the schema as a
    contract (zero inference passes over the corpus), routes the bad
    lines to the corrupt column instead of silently NULLing them into
    plausible empty documents (the PERMISSIVE default), and the good
    rows hash-match the original table EXACTLY — text_md5 pins every
    byte of every document through the JSON escape/unescape round
    trip, per source in doc_id order; n_quarantined pins the bad-line
    count cross-engine as a constant."""
    import os

    from .sources import read_jsonl, split_corrupt

    docs = load_table(spark, sf_dir, "documents")
    scratch = _scratch_dir("jsonl")
    docs.write.mode("overwrite").json(scratch)
    with open(os.path.join(scratch, "bad-lines.json"), "w") as fh:
        fh.write('{"doc_id": 1, "text": unquoted}\n')
        fh.write("not json at all\n")
        fh.write('{"doc_id": "trailing...\n')
    raw = read_jsonl(
        spark,
        scratch,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    good, bad = split_corrupt(raw)
    n_bad = bad.count()
    sorted_hashes = F.array_sort(
        F.collect_list(F.struct(F.col("doc_id"), F.md5("text").alias("h")))
    )
    return (
        good.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.md5(
                F.array_join(F.transform(sorted_hashes, lambda s: s["h"]), ",")
            ).alias("text_md5"),
        )
        .withColumn("n_quarantined", F.lit(n_bad).cast("int"))
        .orderBy("source")
    )


@register(
    "q_gap_fill",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, max(value) AS v
      FROM events GROUP BY 1, 2
    ), obs AS (
      SELECT * FROM daily WHERE day(day) % 7 NOT IN (2, 5)
    ), spans AS (
      SELECT event_type, min(day) d0, max(day) d1 FROM obs GROUP BY 1
    ), cal AS (
      SELECT s.event_type, CAST(u.d AS DATE) AS day
      FROM spans s,
           LATERAL (SELECT unnest(generate_series(s.d0, s.d1, INTERVAL 1 DAY)) AS d) u
    )
    SELECT c.event_type, CAST(c.day AS VARCHAR) AS day,
           round(last_value(o.v IGNORE NULLS) OVER w, 6) AS peak_value,
           o.v IS NOT NULL AS is_observed,
           CAST(date_diff('day',
                last_value(CASE WHEN o.v IS NOT NULL THEN c.day END IGNORE NULLS)
                  OVER w,
                c.day) AS INT) AS fill_age_days
    FROM cal c LEFT JOIN obs o USING (event_type, day)
    WINDOW w AS (PARTITION BY c.event_type ORDER BY c.day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ORDER BY c.event_type, c.day
    """,
)
def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar densification + LOCF (operators/temporal.py::
    gap_fill_locf): per-type daily peak values with deterministic
    "feed-outage" days removed (day-of-month % 7 ∈ {2,5} — the same
    gap pattern at every SF), then the series re-densified over each
    key's span with the last observation carried forward, an
    is_observed flag, and fill_age_days staleness. The resample step
    downstream windows silently assume: a trailing mean over the
    sparse frame would average observed days only. Calendar rows come
    from map-side sequence() per key span (never a driver loop), the
    carry-forward is one last(ignorenulls) window per key — one hash
    exchange end to end. Hash-matched vs DuckDB's generate_series +
    IGNORE-NULLS window rendering."""
    from .operators.temporal import gap_fill_locf

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("day"), "value"
    )
    daily = ev.groupBy("event_type", "day").agg(F.max("value").alias("v"))
    obs = daily.filter(~(F.dayofmonth("day") % 7).isin(2, 5))
    out = gap_fill_locf(obs, "event_type", "day", "v")
    return out.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.round("v", 6).alias("peak_value"),
        "is_observed",
        "fill_age_days",
    ).orderBy("event_type", "day")


@register(
    "q_theilsen_trend",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(count(*) AS DOUBLE) AS y
      FROM events GROUP BY 1, 2
    ), x AS (
      SELECT event_type,
             CAST(date_diff('day', DATE '2024-01-15', day) AS DOUBLE) AS x,
             y
      FROM daily
    ), pairs AS (
      SELECT a.event_type, (b.y - a.y) / (b.x - a.x) AS s
      FROM x a JOIN x b ON a.event_type = b.event_type AND a.x < b.x
    ), sl AS (
      SELECT event_type, quantile_cont(s, 0.5) AS slope,
             CAST(count(*) AS BIGINT) AS n_pairs
      FROM pairs GROUP BY 1
    )
    SELECT x.event_type,
           round(sl.slope, 6) AS ts_slope_per_day,
           round(quantile_cont(x.y - sl.slope * x.x, 0.5), 6) AS ts_intercept,
           CAST(count(*) AS BIGINT) AS n_days,
           sl.n_pairs
    FROM x JOIN sl ON x.event_type = sl.event_type
    GROUP BY x.event_type, sl.slope, sl.n_pairs
    HAVING count(*) >= 2
    ORDER BY x.event_type
    """,
)
def q_theilsen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROBUST trend per event type — Theil–Sen median-of-pairwise-slopes
    (operators/trend.py::theil_sen_trend) next to q_daily_trend's OLS:
    up to ~29% corrupted days leave the estimate unmoved where one
    spike drags OLS arbitrarily, so the OLS-vs-Theil–Sen gap is the
    series' outlier alarm. The corpus collapses to the |keys|·|days|
    daily frame in one map-side-combinable aggregate BEFORE pairing
    (persisted + tied; the pair join is days²-per-key, never corpus²);
    every pairwise slope is one IEEE division and the median is the
    SQL-standard interpolated percentile, so DuckDB hash-matches at
    round(6)."""
    from .operators.trend import theil_sen_trend

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("day")
    )
    daily = ev.groupBy("event_type", "day").agg(F.count("*").alias("cnt"))
    out = theil_sen_trend(daily, "event_type", "day", "cnt", ref_day="2024-01-15")
    return out.orderBy("event_type")


def _benford_oracle() -> str:
    """Oracle with the SAME Python-folded log10(1+1/d) literals the
    Spark operator inlines (operators/benford.py::BENFORD_P) — neither
    engine's libm decides the hash."""
    from .operators.benford import BENFORD_P

    case = " ".join(f"WHEN {d} THEN {BENFORD_P[d]!r}" for d in range(1, 10))
    return f"""
    WITH vals AS (
      SELECT o_orderpriority AS priority,
             CAST(floor(o_totalprice) AS BIGINT) AS v
      FROM orders
    ), digits AS (
      SELECT priority,
             CAST(substr(CAST(v AS VARCHAR), 1, 1) AS INT) AS d,
             CAST(count(*) AS BIGINT) AS obs
      FROM vals WHERE v IS NOT NULL AND v > 0 GROUP BY 1, 2
    ), scored AS (
      SELECT priority, d, obs,
             CAST(sum(obs) OVER (PARTITION BY priority) AS BIGINT) AS n,
             CASE d {case} ELSE 0.0 END AS p
      FROM digits
    ), agg AS (
      SELECT priority AS o_orderpriority, n AS n_values,
             round(CAST(n AS DOUBLE)
                   + sum((CAST(obs AS DOUBLE) - n*p) * (CAST(obs AS DOUBLE) - n*p)
                         / (n*p) - n*p), 6) AS chi2,
             round((1.0 + sum(abs(CAST(obs AS DOUBLE) / n - p) - p)) / 9.0,
                   6) AS mad
      FROM scored GROUP BY priority, n
    )
    SELECT o_orderpriority, n_values, chi2, mad,
           mad <= 0.015 AS conforms
    FROM agg WHERE n_values >= 100
    ORDER BY o_orderpriority
    """


@register("q_benford_audit", oracle=_benford_oracle())
def q_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Did each slice of the ledger invent its numbers — Benford
    first-digit conformity (operators/benford.py::benford_profile) of
    order totals per priority class: chi-square (8 df) and Nigrini MAD
    with his 0.015 marginal band. First digits come from BIGINT string
    prefixes (floor() first — DuckDB CAST(double AS BIGINT) rounds,
    Spark truncates), the nine Benford probabilities are Python-folded
    literals on both engines, and absent digits fold in analytically
    (chi² = n + Σ_obs((o−np)²/np − np)), so the whole audit
    hash-matches. One map-side-combined corpus aggregate; ≤ 9·|keys|
    rows ever shuffle."""
    from .operators.benford import benford_profile

    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority"),
        F.floor("o_totalprice").cast("long").alias("v"),
    )
    return benford_profile(orders, "o_orderpriority", "v", min_n=100).orderBy(
        "o_orderpriority"
    )


_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def _corr_oracle() -> str:
    """UNION-ALL-per-pair oracle mirroring the one-scan matrix (DuckDB
    reads the parquet per branch; the SPARK side is what must be one
    scan)."""
    from itertools import combinations

    branches = []
    for a, b in combinations(_CORR_COLS, 2):
        branches.append(
            f"""
      SELECT l_returnflag, '{a}' AS col_x, '{b}' AS col_y,
             round(corr({a}, {b}), 6) AS corr,
             CAST(count(CASE WHEN {a} IS NOT NULL AND {b} IS NOT NULL
                        THEN 1 END) AS BIGINT) AS n_pairs
      FROM lineitem GROUP BY 1"""
        )
    u = "\n      UNION ALL\n".join(branches)
    return f"""
    SELECT * FROM ({u})
    WHERE corr IS NOT NULL AND n_pairs >= 2
    ORDER BY l_returnflag, col_x, col_y
    """


@register("q_feature_correlations", oracle=_corr_oracle())
def q_feature_correlations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which numeric signals are redundant — ALL pairwise Pearson
    correlations of the lineitem measures per return flag in ONE scan
    (operators/stats.py::correlation_matrix): the 6 corr + 6 count
    aggregates share a single map-side partial pass, the shuffle is
    |groups| rows of O(k²) doubles, and the wide row unpivots to long
    form with an inline explode (no second shuffle). The naive
    per-pair formulation reads the corpus C(k,2) times — the oracle
    does exactly that, which is the point of the comparison."""
    from .operators.stats import correlation_matrix

    li = load_table(spark, sf_dir, "lineitem").select("l_returnflag", *_CORR_COLS)
    return correlation_matrix(li, _CORR_COLS, key_col="l_returnflag").orderBy(
        "l_returnflag", "col_x", "col_y"
    )


def _ppjoin_oracle() -> str:
    from .functions.text import duckdb_shingle_key_array

    sh = duckdb_shingle_key_array("tokens", 3)
    return f"""
    WITH seq AS (
      SELECT doc_id, {DUCKDB_TOKENIZE("text")} AS tokens FROM documents
    ), sets AS (
      SELECT doc_id, {sh} AS ts FROM seq
    ), ne AS (
      SELECT doc_id, ts, len(ts) AS n FROM sets WHERE len(ts) > 0
    ), p AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             len(list_intersect(a.ts, b.ts)) AS inter,
             a.n + b.n - len(list_intersect(a.ts, b.ts)) AS uni
      FROM ne a JOIN ne b ON a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b, CAST(inter AS BIGINT) AS inter,
           CAST(uni AS BIGINT) AS union_sz,
           round(CAST(inter AS DOUBLE) / uni, 6) AS jaccard
    FROM p WHERE CAST(inter AS DOUBLE) / uni >= 0.5
    ORDER BY doc_a, doc_b
    """


@register("q_jaccard_join", oracle=_ppjoin_oracle())
def q_jaccard_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EVERY document pair with 3-gram-shingle Jaccard >= 0.5 — the
    exact, zero-false-negative similarity self-join
    (operators/ppjoin.py::jaccard_similarity_join, prefix-filtering per
    Chaudhuri 2006 / Xiao 2008) that audits what the MinHash+LSH path
    (q_minhash_near_dups) only approximates. The oracle is DuckDB's
    QUADRATIC list_intersect join — the spec; the Spark plan touches
    only prefix-token collisions (rarest-first ordering, lossless
    length filter, exact verify), never |docs|² pairs. Shingle keys are
    the injective cross-engine polynomial (functions/text.py::
    shingle_key_array == duckdb_shingle_key_array)."""
    from .functions.text import shingle_key_array
    from .operators.ppjoin import jaccard_similarity_join

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", tokenize_md5(F.col("text")).alias("tokens")
    )
    sets = docs.select("doc_id", shingle_key_array(F.col("tokens"), 3).alias("sh"))
    out = jaccard_similarity_join(sets, "doc_id", "sh", tau=0.5)
    return out.select(
        "doc_a", "doc_b", "inter", "union_sz", F.round("jaccard", 6).alias("jaccard")
    ).orderBy("doc_a", "doc_b")


@register(
    "q_tfidf_cosine_pairs",
    oracle=_SEQ_CTE
    + """
    , tf AS (
      SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
      FROM (SELECT doc_id, unnest(tokens) AS tok FROM sequences) GROUP BY 1, 2
    ), dfreq AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
    ), nd AS (SELECT count(DISTINCT doc_id) AS n FROM tf),
    w AS (
      SELECT t.doc_id, t.tok,
             t.tf * (ln((CAST(n AS DOUBLE) + 1.0) / (CAST(df AS DOUBLE) + 1.0))
                     + 1.0) AS w
      FROM tf t JOIN dfreq USING (tok) CROSS JOIN nd
      WHERE df >= 1 AND CAST(df AS DOUBLE) <= 0.5 * n
    ), nrm AS (
      SELECT doc_id, sqrt(sum(w * w)) AS nn FROM w GROUP BY 1
    ), u AS (
      SELECT w.doc_id, tok, w / nn AS uw FROM w JOIN nrm USING (doc_id)
    ), pairsums AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(count(*) AS BIGINT) AS n_common,
             sum(a.uw * b.uw) AS cosine
      FROM u a JOIN u b ON a.tok = b.tok AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, n_common, round(cosine, 6) AS cosine
    FROM pairsums WHERE cosine >= 0.3
    ORDER BY doc_a, doc_b
    """,
)
def q_tfidf_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """More-like-this, exactly — every document pair with TF-IDF
    cosine >= 0.3 over the df-bounded vocabulary
    (operators/tfidf.py::tfidf_cosine_pairs): sparse dot products via
    an inverted-index token equi-join, never a |docs|² loop; the
    df <= 0.5·N stop-word cut is both the standard metric definition
    and the bound on join fan-out (sum_t C(df_t, 2)). The weighted
    complement to the set-based joins: q_jaccard_join treats every
    shingle equally, this ranks by term rarity. Smooth-idf ln() ulp
    noise sits far below round(6) (the keyness precedent)."""
    from .operators.tfidf import tfidf_cosine_pairs

    seq = sequences_from_documents(spark, sf_dir)
    return tfidf_cosine_pairs(seq, 0.3, max_df_ratio=0.5).select(
        "doc_a", "doc_b", "n_common", F.round("cosine", 6).alias("cosine")
    ).orderBy("doc_a", "doc_b")


_FK_RELATIONSHIPS = [
    ("customer_nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("events_customer", "events", "user_id", "customer", "c_custkey"),
    ("lineitem_orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem_part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem_supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders_customer", "orders", "o_custkey", "customer", "c_custkey"),
]


def _fk_oracle() -> str:
    def block(name, child, ck, parent, pk):
        ckeys = (
            f"(SELECT {ck} AS k, CAST(count(*) AS BIGINT) AS rws FROM {child} "
            f"WHERE {ck} IS NOT NULL GROUP BY 1)"
        )
        return f"""
    SELECT '{name}' AS relationship, n_child_rows, n_null_fk, n_child_keys,
           n_orphan_keys, n_orphan_rows,
           CASE WHEN n_child_rows - n_null_fk > 0
                THEN round(CAST(n_orphan_rows AS DOUBLE)
                           / (n_child_rows - n_null_fk), 6)
                ELSE 0.0 END AS orphan_row_rate,
           n_parent_keys,
           CASE WHEN n_parent_keys > 0
                THEN round(CAST(n_matched AS DOUBLE) / n_parent_keys, 6)
                ELSE 0.0 END AS parent_coverage
    FROM (
      SELECT CAST((SELECT count(*) FROM {child}) AS BIGINT) AS n_child_rows,
             CAST((SELECT count(*) FROM {child} WHERE {ck} IS NULL) AS BIGINT)
               AS n_null_fk,
             CAST((SELECT count(*) FROM {ckeys} c) AS BIGINT) AS n_child_keys,
             CAST((SELECT count(*) FROM {ckeys} c WHERE NOT EXISTS
                   (SELECT 1 FROM {parent} p WHERE p.{pk} = c.k)) AS BIGINT)
               AS n_orphan_keys,
             CAST(coalesce((SELECT sum(rws) FROM {ckeys} c WHERE NOT EXISTS
                   (SELECT 1 FROM {parent} p WHERE p.{pk} = c.k)), 0) AS BIGINT)
               AS n_orphan_rows,
             CAST((SELECT count(DISTINCT {pk}) FROM {parent}) AS BIGINT)
               AS n_parent_keys,
             CAST((SELECT count(*) FROM {ckeys} c WHERE EXISTS
                   (SELECT 1 FROM {parent} p WHERE p.{pk} = c.k)) AS BIGINT)
               AS n_matched
    )"""

    u = "\n    UNION ALL\n".join(block(*r) for r in _FK_RELATIONSHIPS)
    return f"SELECT * FROM (\n{u}\n    ) ORDER BY relationship"


@register("q_fk_audit", oracle=_fk_oracle())
def q_fk_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Is the snapshot relationally sound — the cross-table half of
    validation (operators/integrity.py::fk_audit): for all six declared
    FK relationships, orphan keys/rows (should be 0), NULL-FK counts,
    and parent-key coverage (a collapsing coverage is the classic
    symptom of an upstream join silently dropping a shard). Child keys
    collapse to DISTINCT with multiplicity BEFORE the anti probe, so
    only key-cardinality rows shuffle; at 100 TB the anti join is
    exactly the bloom_anti_join shape. Every number is an exact integer
    or a round(6) ratio — hash-matched."""
    from .operators.integrity import fk_audit

    rels = [
        (name, load_table(spark, sf_dir, child), ck, load_table(spark, sf_dir, parent), pk)
        for name, child, ck, parent, pk in _FK_RELATIONSHIPS
    ]
    return fk_audit(rels).orderBy("relationship")


@register(
    "q_dataset_card",
    oracle=r"""
    WITH base AS (
      SELECT md5(substr(text, 1, 40)) AS fp,
             CAST(len(list_filter(regexp_split_to_array(text, '\s+'),
                                  w -> w <> '')) AS BIGINT) AS ntok,
             CAST(length(text) AS BIGINT) AS nchars,
             source, lang
      FROM documents
    ), g AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(ntok) AS BIGINT) AS n_tokens,
             CAST(sum(nchars) AS BIGINT) AS n_chars,
             CAST(count(DISTINCT fp) AS BIGINT) AS n_distinct_fp,
             round(quantile_cont(ntok, 0.5), 6) AS median_ntok,
             round(avg(ntok), 6) AS mean_ntok,
             CAST(sum(CASE WHEN ntok < 50 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_short
      FROM base
    ), src AS (SELECT source, count(*) AS c FROM base GROUP BY 1),
    top_src AS (SELECT source AS top_source, c AS top_c FROM src
                ORDER BY c DESC, source ASC LIMIT 1),
    nsrc AS (SELECT CAST(count(*) AS BIGINT) AS n_sources FROM src),
    lg AS (SELECT lang, count(*) AS c FROM base GROUP BY 1),
    langa AS (SELECT CAST(count(*) AS BIGINT) AS n_langs,
                     sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) AS clnc
              FROM lg)
    SELECT n_docs, n_tokens, n_chars, n_sources, n_langs, top_source,
           round(CAST(top_c AS DOUBLE) / n_docs, 6) AS top_source_share,
           round(ln(CAST(n_docs AS DOUBLE)) - clnc / n_docs, 6)
             AS lang_entropy_nats,
           n_distinct_fp,
           round(1.0 - CAST(n_distinct_fp AS DOUBLE) / n_docs, 6) AS dup_rate,
           median_ntok, mean_ntok,
           round(CAST(n_short AS DOUBLE) / n_docs, 6) AS pct_short
    FROM g CROSS JOIN nsrc CROSS JOIN top_src CROSS JOIN langa
    """,
)
def q_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus DATASHEET in one row (operators/datacard.py::
    dataset_card, Gebru et al. 2021's quantitative half): size, source
    concentration, language entropy, exact-dedup rate, document-length
    profile. One corpus scan + |sources|/|langs|-bounded aggregates
    reassembled by broadcast cross joins; every value is an exact
    integer or a round(6) function of exact integers, so the card is
    an auditable hash-matched artifact — parquet it per snapshot and
    diff across rounds (jobs/compare_snapshots.py is the drift gate
    over the same idea)."""
    from .operators.datacard import dataset_card

    return dataset_card(load_table(spark, sf_dir, "documents"))


def _skipgram_oracle() -> str:
    from .functions.text import duckdb_skipgram_pair_keys

    pairs = duckdb_skipgram_pair_keys("tokens", window=3)
    n_pairs_row = " + ".join(f"greatest(len(tokens) - {d}, 0)" for d in (1, 2, 3))
    return (
        _SEQ_CTE
        + f"""
    , pairs AS (
        SELECT pair // 50261 AS left_tok, pair % 50261 AS right_tok,
               count(*) AS pair_freq
        FROM (SELECT unnest({pairs}) AS pair FROM sequences) t
        GROUP BY 1, 2 HAVING count(*) >= 5
    ), uni AS (
        SELECT tok, count(*) AS uni_freq
        FROM (SELECT unnest(tokens) AS tok FROM sequences) u GROUP BY tok
    ), totals AS (
        SELECT CAST(sum(len(tokens)) AS BIGINT) AS n_tokens,
               CAST(sum({n_pairs_row}) AS BIGINT) AS n_pairs
        FROM sequences
    )
    SELECT left_tok, right_tok, pair_freq,
           round(ln(CAST(pair_freq AS DOUBLE) * n_tokens * n_tokens
                    / (CAST(n_pairs AS DOUBLE) * l.uni_freq * r.uni_freq)),
                 6) AS pmi
    FROM pairs
    JOIN uni l ON l.tok = left_tok
    JOIN uni r ON r.tok = right_tok
    CROSS JOIN totals
    ORDER BY pmi DESC, left_tok, right_tok LIMIT 50
    """
    )


@register("q_skipgram_pmi", oracle=_skipgram_oracle())
def q_skipgram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed co-occurrence PMI (operators/collocations.py::
    skipgram_pmi): top-50 UNORDERED token pairs co-occurring within
    distance 3 (the word2vec skip-gram context) by pointwise mutual
    information — associated terms that rarely sit adjacent, which the
    adjacency statistic (q_collocations_pmi) can't see. Pairs are
    generated MAP-SIDE by a Catalyst transform (canonical
    least/greatest key; no join, no window function), so the only
    corpus-sized cost is the scan + a map-side-combined aggregate;
    unigrams and totals broadcast. Integer counts until one ln(),
    cut ordered by the ROUNDED pmi — cross-engine reproducible."""
    from .operators.collocations import skipgram_pmi

    seq = sequences_from_documents(spark, sf_dir)
    return skipgram_pmi(seq, window=3, min_count=5, top_n=50)


def _containment_oracle() -> str:
    from .functions.text import duckdb_shingle_key_array

    sh = duckdb_shingle_key_array("tokens", 3)
    return f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id,
             substr(text, 1, CAST(n_chars // 3 AS INT)) AS text
      FROM documents WHERE doc_id % 17 = 0
    ), seq AS (
      SELECT doc_id, {DUCKDB_TOKENIZE("text")} AS tokens FROM corpus
    ), sets AS (
      SELECT doc_id, {sh} AS ts FROM seq
    ), ne AS (
      SELECT doc_id, ts, len(ts) AS n FROM sets WHERE len(ts) > 0
    ), p AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             len(list_intersect(a.ts, b.ts)) AS inter, a.n AS na
      FROM ne a JOIN ne b ON a.doc_id <> b.doc_id
    )
    SELECT doc_a, doc_b, CAST(inter AS BIGINT) AS inter,
           CAST(na AS BIGINT) AS size_a,
           round(CAST(inter AS DOUBLE) / na, 6) AS containment
    FROM p WHERE CAST(inter AS DOUBLE) / na >= 0.8
    ORDER BY doc_a, doc_b
    """


@register("q_containment_join", oracle=_containment_oracle())
def q_containment_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which documents are EXCERPTS of others — the directed
    containment join |a∩b|/|a| >= 0.8
    (operators/ppjoin.py::containment_join): a short doc fully quoted
    inside a long one has tiny Jaccard but containment ~1, the
    cross-document case the within-corpus span operators don't cover.
    The query PLANTS the excerpts (first third of every 17th document,
    identical construction in the oracle) so the asymmetric direction
    is genuinely exercised: 30 of the 80 sf0.01 pairs are
    excerpt→original. Candidates = a's rarest-first PREFIX against b's
    FULL inverted index (complete by the prefix-filter counting
    argument; one-sided length filter — no upper bound on |b|, that
    asymmetry is the point), then exact verify."""
    from .functions.text import shingle_key_array
    from .operators.ppjoin import containment_join

    docs = load_table(spark, sf_dir, "documents")
    excerpts = docs.filter(F.col("doc_id") % 17 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.col("text").substr(
            F.lit(1), F.floor(F.col("n_chars") / 3).cast("int")
        ).alias("text"),
    )
    corpus = docs.select("doc_id", "text").unionByName(excerpts)
    sets = corpus.select(
        "doc_id",
        shingle_key_array(tokenize_md5(F.col("text")), 3).alias("sh"),
    )
    out = containment_join(sets, "doc_id", "sh", tau=0.8)
    return out.select(
        "doc_a",
        "doc_b",
        "inter",
        "size_a",
        F.round("containment", 6).alias("containment"),
    ).orderBy("doc_a", "doc_b")


@register("q_lsh_recall_audit")
def q_lsh_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How much does the MinHash+LSH shortcut actually miss — the
    sketch-vs-truth audit the exact join (q_jaccard_join) makes
    possible: ground truth = prefix-filtered EXACT Jaccard pairs
    (zero FN by construction), candidate = the production LSH path
    (128 perms, 32 bands, est >= 0.5). Emits recall on the
    high-similarity stratum (true J >= 0.7, where the S-curve
    1-(1-s^r)^b predicts ~1), precision against true J >= 0.5 (every
    LSH pair re-verified exactly via ngram_jaccard_pairs), and the
    mean |est - true| of the 128-perm estimator (sigma =
    sqrt(s(1-s)/128) ~ 0.044). Deterministic end to end (seeded
    perms), but MinHash isn't SQL-renderable: rows-only registration
    with in-row audit gates; the same gates are pinned in pytest.
    All joins here are pair-frame-sized (<< corpus)."""
    from .functions.text import shingle_key_array
    from .operators.dedup import minhash_dedup, ngram_jaccard_pairs
    from .operators.ppjoin import jaccard_similarity_join

    seq = sequences_from_documents(spark, sf_dir)
    sets = seq.select("doc_id", shingle_key_array(F.col("tokens"), 3).alias("sh"))
    exact = jaccard_similarity_join(sets, "doc_id", "sh", tau=0.5).select(
        "doc_a", "doc_b", F.col("jaccard").alias("true_j")
    )
    lsh = minhash_dedup(seq, threshold=0.5).select("doc_a", "doc_b", "est_jaccard")
    truth_of_lsh = ngram_jaccard_pairs(
        seq, lsh.select("doc_a", "doc_b"), shingle=3, exact_keys=True
    ).select("doc_a", "doc_b", F.col("jaccard").alias("true_j"))
    lsh_scored = lsh.join(truth_of_lsh, ["doc_a", "doc_b"], "left").withColumn(
        "true_j", F.coalesce("true_j", F.lit(0.0))
    )
    hit = exact.join(
        lsh.select("doc_a", "doc_b"), ["doc_a", "doc_b"], "left_semi"
    )
    ex_agg = exact.agg(
        F.count("*").alias("n_exact"),
        F.sum((F.col("true_j") >= 0.7).cast("long")).alias("n_exact_hi"),
    )
    hit_agg = hit.agg(
        F.sum((F.col("true_j") >= 0.7).cast("long")).alias("hits_hi")
    )
    lsh_agg = lsh_scored.agg(
        F.count("*").alias("n_lsh"),
        F.sum((F.col("true_j") >= 0.5).cast("long")).alias("n_lsh_true"),
        F.avg(F.abs(F.col("est_jaccard") - F.col("true_j"))).alias("_mae"),
    )
    row = ex_agg.crossJoin(hit_agg).crossJoin(lsh_agg)
    recall_hi = F.when(
        F.col("n_exact_hi") > 0,
        F.col("hits_hi").cast("double") / F.col("n_exact_hi"),
    ).otherwise(F.lit(1.0))
    precision = F.when(
        F.col("n_lsh") > 0, F.col("n_lsh_true").cast("double") / F.col("n_lsh")
    ).otherwise(F.lit(1.0))
    return row.select(
        "n_exact",
        "n_exact_hi",
        "n_lsh",
        "n_lsh_true",
        "hits_hi",
        F.round(recall_hi, 6).alias("recall_hi"),
        F.round(precision, 6).alias("precision"),
        F.round(F.coalesce(F.col("_mae"), F.lit(0.0)), 6).alias("mean_abs_est_err"),
        (F.round(recall_hi, 6) >= 0.9).alias("recall_ok"),
        (F.round(F.coalesce(F.col("_mae"), F.lit(0.0)), 6) <= 0.15).alias("err_ok"),
    )


@register(
    "q_winnow_overlap",
    oracle=_SEQ_CTE
    + """
    , grams AS (
        SELECT doc_id,
               list_transform(range(len(tokens) - 2),
                 i -> ((CAST(tokens[i+1] AS BIGINT) * 2526168121
                        + CAST(tokens[i+2] AS BIGINT) * 50261
                        + tokens[i+3]) * 48271) % 2147483647) AS hs
        FROM sequences WHERE len(tokens) >= 3
    ), keys AS (
        SELECT doc_id,
               list_transform(range(len(hs)),
                 i -> (hs[i+1] << 27) + (134217727 - i)) AS ks
        FROM grams
    ), sel AS (
        SELECT doc_id,
               CASE WHEN len(ks) < 4 THEN [list_min(ks)]
                    ELSE list_transform(range(3, len(ks)),
                           q -> list_min(ks[q-2:q+1])) END AS sels
        FROM keys
    ), fps AS (
        SELECT DISTINCT doc_id, s >> 27 AS fp
        FROM (SELECT doc_id, unnest(sels) AS s FROM sel)
    ), capped AS (
        SELECT fp FROM fps GROUP BY fp HAVING count(*) BETWEEN 2 AND 20
    ), shared AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared_fps
        FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
        WHERE a.fp IN (SELECT fp FROM capped)
        GROUP BY 1, 2 HAVING count(*) >= 2
    ), counts AS (SELECT doc_id, count(*) AS n_fp FROM fps GROUP BY doc_id)
    SELECT doc_a, doc_b, shared_fps,
           round(CAST(shared_fps AS DOUBLE) / least(ca.n_fp, cb.n_fp), 6) AS containment
    FROM shared
    JOIN counts ca ON ca.doc_id = doc_a
    JOIN counts cb ON cb.doc_id = doc_b
    ORDER BY containment DESC, shared_fps DESC, doc_a, doc_b LIMIT 100
    """,
)
def q_winnow_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (MOSS, Schleimer et al. 2003) fingerprint overlap:
    k=3-gram Lehmer-mixed hashes, window w=4 rightmost-min selection as
    ONE map-side Arrow pass (zero shuffle), then shared-fingerprint
    document pairs via per-fingerprint postings with a df cap — no
    self-join, candidate pairs generated inside the posting arrays.
    Hash-matched against a DuckDB list-algebra rendering of the exact
    same integer selection (same polynomial, mix, packed tie-break)."""
    from .operators.winnow import winnow_fingerprints, winnow_overlap_pairs

    seq = sequences_from_documents(spark, sf_dir)
    fps = winnow_fingerprints(seq, k=3, w=4)
    return (
        winnow_overlap_pairs(fps, min_shared=2, df_cap=20)
        .orderBy(F.desc("containment"), F.desc("shared_fps"), "doc_a", "doc_b")
        .limit(100)
    )


@register(
    "q_vocab_growth",
    oracle=_SEQ_CTE
    + """
    , ranked AS (
        SELECT source, doc_id, len(tokens) AS n_tok, tokens,
               row_number() OVER (PARTITION BY source ORDER BY doc_id) AS r
        FROM sequences
    ), curve AS (
        SELECT source, r,
               CAST(sum(n_tok) OVER (PARTITION BY source ORDER BY r) AS BIGINT) AS cum_tokens
        FROM ranked
    ), firsts AS (
        SELECT source, tok, min(r) AS first_r
        FROM (SELECT source, r, unnest(tokens) AS tok FROM ranked) t
        GROUP BY source, tok
    ), new_at AS (
        SELECT source, first_r AS r, count(*) AS new_types FROM firsts GROUP BY 1, 2
    ), full_curve AS (
        SELECT c.source, c.r, c.cum_tokens,
               CAST(sum(COALESCE(n.new_types, 0))
                    OVER (PARTITION BY c.source ORDER BY c.r) AS BIGINT) AS cum_vocab
        FROM curve c LEFT JOIN new_at n ON n.source = c.source AND n.r = c.r
    )
    SELECT source, count(*) AS n_docs,
           max(cum_tokens) AS total_tokens, max(cum_vocab) AS vocab,
           round(regr_slope(ln(CAST(cum_vocab AS DOUBLE)), ln(CAST(cum_tokens AS DOUBLE))), 4) AS heaps_beta,
           round(regr_intercept(ln(CAST(cum_vocab AS DOUBLE)), ln(CAST(cum_tokens AS DOUBLE))), 4) AS heaps_lnk
    FROM full_curve GROUP BY source ORDER BY source
    """,
)
def q_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary growth per source (operators/vocab.py):
    exact V(n) curve via the min-first-rank trick (one corpus-sized
    (source, token) aggregate — no per-prefix distinct counts), then a
    closed-form log-log OLS (covar_pop/var_pop) mirrored by DuckDB's
    regr_slope/regr_intercept at 4 dp, the q_zipf_slope float
    contract. Reads the growth axis of the same distributional-health
    phenomenon whose frequency axis q_zipf_slope reads."""
    from .operators.vocab import heaps_fit, vocab_growth_curve

    seq = sequences_from_documents(spark, sf_dir)
    return heaps_fit(vocab_growth_curve(seq)).orderBy("source")


@register(
    "q_token_dispersion",
    oracle=_SEQ_CTE
    + """
    , sc AS (
        SELECT source AS src, tok, count(*) AS c
        FROM (SELECT source, unnest(tokens) AS tok FROM sequences) t
        GROUP BY 1, 2
    ), src_tot AS (
        SELECT src, CAST(sum(c) AS BIGINT) AS n_s FROM sc GROUP BY src
    ), nrow AS (SELECT CAST(sum(n_s) AS BIGINT) AS n FROM src_tot),
    top AS (
        SELECT tok, src AS top_source, c AS top_c
        FROM (SELECT tok, src, c,
                     row_number() OVER (PARTITION BY tok ORDER BY c DESC, src) AS rn
              FROM sc) r
        WHERE rn = 1
    ), tt AS (SELECT tok, CAST(sum(c) AS BIGINT) AS total FROM sc GROUP BY tok),
    per AS (
        SELECT s.tok, t.total, count(*) AS n_sources,
               round(0.5 + 0.5 * sum(abs(CAST(c AS DOUBLE) / t.total
                                         - CAST(n_s AS DOUBLE) / nrow.n)
                                     - CAST(n_s AS DOUBLE) / nrow.n), 6) AS dp,
               round(1.0 / sum((CAST(c AS DOUBLE) / t.total)
                               * (CAST(c AS DOUBLE) / t.total)), 6) AS eff_sources
        FROM sc s JOIN src_tot USING (src) JOIN tt t USING (tok) CROSS JOIN nrow
        WHERE t.total >= 10
        GROUP BY s.tok, t.total
    )
    SELECT p.tok, p.total, p.n_sources, top.top_source,
           round(CAST(top.top_c AS DOUBLE) / p.total, 6) AS top_share,
           p.dp, p.eff_sources
    FROM per p JOIN top USING (tok)
    ORDER BY dp DESC, tok LIMIT 200
    """,
)
def q_token_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gries' DP dispersion + inverse-Simpson concentration per token
    (operators/dispersion.py): the per-TOKEN burstiness screen that
    separates vocabulary from boilerplate/spam markers. Absent sources
    folded analytically (no token x source grid join); one corpus
    aggregate, everything downstream vocab x sources-bounded.
    Hash-matched at 6 dp with a deterministic dominant-source
    tie-break (count desc, then source)."""
    from .operators.dispersion import token_dispersion

    seq = sequences_from_documents(spark, sf_dir)
    return (
        token_dispersion(seq, min_total=10)
        .orderBy(F.desc("dp"), "tok")
        .limit(200)
    )


@register(
    "q_bm25_search",
    oracle=_SEQ_CTE
    + """
    , freqs AS (
        SELECT tok, count(*) AS freq
        FROM (SELECT unnest(tokens) AS tok FROM sequences) t GROUP BY tok
    ), terms AS (
        SELECT tok FROM (
            SELECT tok, row_number() OVER (ORDER BY freq DESC, tok) AS rn FROM freqs
        ) r WHERE rn BETWEEN 11 AND 15
    ), stats AS (
        SELECT count(*) AS n_docs, avg(CAST(len(tokens) AS DOUBLE)) AS avgdl
        FROM sequences
    ), occ AS (
        SELECT doc_id, len(tokens) AS dl, tok
        FROM (SELECT doc_id, tokens, unnest(tokens) AS tok FROM sequences) u
        WHERE tok IN (SELECT tok FROM terms)
    ), tf AS (
        SELECT doc_id, dl, tok, count(*) AS tf FROM occ GROUP BY 1, 2, 3
    ), dfs AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok)
    SELECT doc_id, count(*) AS n_terms_hit,
           round(sum(
               ln(1.0 + (stats.n_docs - dfs.df + 0.5) / (dfs.df + 0.5))
               * (CAST(tf AS DOUBLE) * 2.2
                  / (tf + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / stats.avgdl)))
           ), 6) AS score
    FROM tf JOIN dfs USING (tok) CROSS JOIN stats
    GROUP BY doc_id
    ORDER BY score DESC, doc_id LIMIT 25
    """,
)
def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 retrieval (operators/bm25.py, Lucene idf form,
    k1=1.2, b=0.75) for a deterministic 5-term probe: global-frequency
    ranks 11-15 (mid-head terms — rare enough to discriminate, common
    enough to hit many docs; tie-break by token id). The corpus
    explode is semi-joined against the broadcast probe terms BEFORE
    aggregation, so only query-term occurrences shuffle; document
    length rides in the tf group key (no second corpus join).
    Hash-matched at 6 dp; top-25 cut on the ROUNDED score with doc_id
    tie-break."""
    from .operators.bm25 import bm25_rank

    seq = sequences_from_documents(spark, sf_dir)
    freqs = (
        seq.select(F.explode("tokens").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("freq"))
    )
    w = Window.orderBy(F.desc("freq"), "tok")
    terms = (
        freqs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn").between(11, 15))
        .select("tok")
    )
    return (
        bm25_rank(seq, terms, k1=1.2, b=0.75)
        .orderBy(F.desc("score"), "doc_id")
        .limit(25)
    )


@register(
    "q_ann_sq",
    oracle="""
    WITH qz AS (
        SELECT vec_id,
               list_transform(embedding::DOUBLE[],
                              x -> floor(x / s * 127.0 + 0.5)) AS q
        FROM (SELECT vec_id, embedding,
                     list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) AS s
              FROM embeddings) t
        WHERE s > 0
    )
    SELECT query_id, neighbor_id, cosine_sq FROM (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               round(list_cosine_similarity(a.q, b.q), 6) AS cosine_sq,
               row_number() OVER (
                   PARTITION BY a.vec_id
                   ORDER BY round(list_cosine_similarity(a.q, b.q), 6) DESC,
                            b.vec_id) AS rn
        FROM qz a JOIN qz b ON b.vec_id <> a.vec_id
        WHERE a.vec_id IN (0, 7, 42, 99, 123)
    ) r WHERE rn <= 5
    """,
)
def q_ann_sq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar-quantized cosine top-5 (operators/similarity.py::
    ann_sq_topk) for the same 5 probes as q_ann_bruteforce — the
    embedding-COMPRESSION tier of the ANN family (LSH/IVF prune
    candidates; SQ shrinks vectors 4x, the page-cache lever at 100 TB).
    floor(x+0.5) half-up on both engines (Spark round() is HALF_UP,
    DuckDB's HALF_EVEN); the quantized ranking is a deterministic
    function of exact integer dot products, hash-matched; recall vs
    the exact ranking is pinned in tests/test_ann_sq.py."""
    from .operators.similarity import ann_sq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return ann_sq_topk(emb, [0, 7, 42, 99, 123], k=5).drop("rank")


@register(
    "q_peak_concurrency",
    oracle="""
    WITH ev AS (SELECT user_id, epoch_us(ts) AS t FROM events),
    flagged AS (
        SELECT user_id, t,
               CASE WHEN lag(t) OVER w IS NULL OR t - lag(t) OVER w > 1800000000
                    THEN 1 ELSE 0 END AS ns
        FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY t)
    ), sess AS (
        SELECT user_id, t,
               CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY t
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
        FROM flagged
    ), iv AS (
        SELECT min(t) AS s, max(t) AS e FROM sess GROUP BY user_id, sid
    ), split AS (
        SELECT unnest(range(s // 86400000000, e // 86400000000 + 1)) AS d, s, e
        FROM iv
    ), cl AS (
        SELECT d, greatest(s, d * 86400000000) AS cs,
               least(e, (d + 1) * 86400000000 - 1) AS ce
        FROM split
    ), bnd AS (
        SELECT d, cs AS t, 1 AS delta FROM cl
        UNION ALL SELECT d, ce + 1, -1 FROM cl
    ), lv AS (
        SELECT d, t, CAST(sum(delta) AS BIGINT) AS delta FROM bnd GROUP BY d, t
    ), run AS (
        SELECT d, t, CAST(sum(delta) OVER (PARTITION BY d ORDER BY t) AS BIGINT) AS conc
        FROM lv
    )
    SELECT d AS day, conc AS peak_concurrency, t AS peak_at_us
    FROM (SELECT d, t, conc,
                 row_number() OVER (PARTITION BY d ORDER BY conc DESC, t) AS rn
          FROM run) r
    WHERE rn = 1 ORDER BY day
    """,
)
def q_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per day (operators/sweep.py): the
    sweep-line +1/-1 running sum re-expressed as a TWO-LEVEL prefix sum
    — day-split intervals (each day's sweep starts at 0, no carry),
    per-(day, t) delta collapse (tie-order-free), hour-bucket running
    sums + 24-row base-offset windows, two-level argmax. The DuckDB
    oracle runs the FLAT single-window sweep; the hash match certifies
    the decomposition. All integer micros (unix_micros == epoch_us)."""
    from .operators.sweep import peak_concurrency_by_day
    from .operators.temporal import session_intervals

    ev = load_table(spark, sf_dir, "events")
    iv = session_intervals(ev, gap_minutes=30)
    return peak_concurrency_by_day(iv, "s_us", "e_us").orderBy("day")


@register(
    "q_set_reconcile",
    oracle="""
    WITH a AS (
        SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS key
        FROM documents
    ), b AS (
        SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS key
        FROM documents WHERE doc_id % 17 <> 0
        UNION ALL
        SELECT CAST(('0x' || substr(md5('new-' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
        FROM documents WHERE doc_id % 29 = 0
    )
    SELECT key, 'only_a' AS side FROM a WHERE key NOT IN (SELECT key FROM b)
    UNION ALL
    SELECT key, 'only_b' AS side FROM b WHERE key NOT IN (SELECT key FROM a)
    ORDER BY side, key
    """,
)
def q_set_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT two-sided snapshot diff from IBLT difference sketches
    (sketch/iblt.py + operators/reconcile.py, Eppstein et al. 2011):
    snapshot B deterministically drops every 17th doc and adds a key
    per 29th; each side folds its distinct keys into a
    difference-sized invertible table (payload rows only shuffle,
    canonical bytes), subtract cancels the shared ~91%, and peeling
    recovers the actual differing keys — hash-matched against the
    NOT-IN oracle. The un-sketched alternative shuffles both key sets;
    this ships O(max_diff) cells. Decode failure raises, never
    truncates."""
    from .operators.reconcile import set_reconcile

    docs = load_table(spark, sf_dir, "documents")
    key_a = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10).cast(
        "long"
    )
    key_new = F.conv(
        F.substring(F.md5(F.concat(F.lit("new-"), F.col("doc_id").cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")
    snap_a = docs.select(key_a.alias("key"))
    snap_b = docs.filter(F.col("doc_id") % 17 != 0).select(key_a.alias("key")).unionByName(
        docs.filter(F.col("doc_id") % 29 == 0).select(key_new.alias("key"))
    )
    n_docs = docs.count()
    out = set_reconcile(snap_a, snap_b, "key", max_diff=max(64, n_docs // 8))
    return out.orderBy("side", "key")


@register(
    "q_source_similarity",
    oracle=_SEQ_CTE
    + """
    , sc AS (
        SELECT source AS src, tok, count(*) AS c
        FROM (SELECT source, unnest(tokens) AS tok FROM sequences) t
        GROUP BY 1, 2
    ), norms AS (
        SELECT src, CAST(sum(c * c) AS BIGINT) AS nn FROM sc GROUP BY src
    ), dots AS (
        SELECT a.src AS src_a, b.src AS src_b,
               CAST(sum(a.c * b.c) AS BIGINT) AS dot,
               count(*) AS shared_tokens
        FROM sc a JOIN sc b USING (tok)
        WHERE a.src < b.src
        GROUP BY 1, 2
    )
    SELECT src_a, src_b, shared_tokens,
           round(CAST(dot AS DOUBLE)
                 / (sqrt(CAST(na.nn AS DOUBLE)) * sqrt(CAST(nb.nn AS DOUBLE))), 6) AS cosine
    FROM dots
    JOIN norms na ON na.src = src_a
    JOIN norms nb ON nb.src = src_b
    ORDER BY cosine DESC, src_a, src_b LIMIT 100
    """,
)
def q_source_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source-level unigram cosine (operators/dispersion.py::
    source_cosine_pairs): the feed-duplication screen — two crawls of
    one site pair at cosine ~1 before any document comparison runs.
    Dot products and norms are exact BIGINT sums (bitwise cross-engine);
    one double division at the end, 6 dp. Vocab-bounded inverted-index
    join, |S|^2 output rows."""
    from .operators.dispersion import source_cosine_pairs

    seq = sequences_from_documents(spark, sf_dir)
    return (
        source_cosine_pairs(seq)
        .orderBy(F.desc("cosine"), "src_a", "src_b")
        .limit(100)
    )


@register(
    "q_interarrival_ks",
    oracle="""
    WITH ev AS (SELECT event_type AS grp, epoch_us(ts) AS t FROM events),
    d2 AS (
        SELECT grp, dt_us FROM (
            SELECT grp, t - lag(t) OVER (PARTITION BY grp ORDER BY t) AS dt_us FROM ev
        ) x WHERE dt_us IS NOT NULL
    ), stats AS (
        SELECT grp, count(*) AS n, CAST(sum(dt_us) AS BIGINT) AS sum_dt
        FROM d2 GROUP BY grp
    ), ranked AS (
        SELECT grp, dt_us,
               row_number() OVER (PARTITION BY grp ORDER BY dt_us) AS i
        FROM d2
    ), scored AS (
        SELECT r.grp, s.n, s.sum_dt,
               round(max(greatest(
                   CAST(i AS DOUBLE) / s.n
                     - (1.0 - exp(-(CAST(s.n AS DOUBLE) / s.sum_dt) * CAST(dt_us AS DOUBLE))),
                   (1.0 - exp(-(CAST(s.n AS DOUBLE) / s.sum_dt) * CAST(dt_us AS DOUBLE)))
                     - CAST(i - 1 AS DOUBLE) / s.n)), 6) AS ks_stat
        FROM ranked r JOIN stats s USING (grp)
        WHERE s.n >= 10
        GROUP BY r.grp, s.n, s.sum_dt
    )
    SELECT grp AS event_type, n,
           round(CAST(n AS DOUBLE) / sum_dt * 1000000.0, 6) AS lambda_per_s,
           ks_stat,
           round(1.358 / sqrt(CAST(n AS DOUBLE)), 6) AS ks_crit_05,
           ks_stat <= round(1.358 / sqrt(CAST(n AS DOUBLE)), 6) AS exponential_ok
    FROM scored ORDER BY event_type
    """,
)
def q_interarrival_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type Kolmogorov-Smirnov exponential goodness-of-fit on
    inter-arrival micros (operators/gof.py): the Poisson-traffic audit
    that flags retry storms / bots (large D) where the drift family
    (PSI/CUSUM/trend) sees only level changes. Integer-micro gaps, a
    tie-invariant ranked ECDF, one double CDF expression both engines,
    6 dp — hash-matched."""
    from .operators.gof import interarrival_ks

    ev = load_table(spark, sf_dir, "events")
    return interarrival_ks(ev).orderBy("event_type")


@register(
    "q_value_ranksum",
    oracle="""
    WITH ev AS (
        SELECT event_type AS g, CAST(value AS DOUBLE) AS v
        FROM events WHERE value IS NOT NULL
    ), types AS (SELECT DISTINCT g FROM ev),
    pairs AS (SELECT a.g AS ga, b.g AS gb FROM types a JOIN types b ON a.g < b.g),
    expanded AS (
        SELECT p.ga, p.gb, e.g, e.v FROM ev e JOIN pairs p ON e.g = p.ga OR e.g = p.gb
    ), ranked AS (
        SELECT ga, gb, g, v,
               CAST(rank() OVER (PARTITION BY ga, gb ORDER BY v) AS DOUBLE)
                 + (CAST(count(*) OVER (PARTITION BY ga, gb, v) AS DOUBLE) - 1) / 2.0 AS midrank,
               count(*) OVER (PARTITION BY ga, gb, v) AS tie_n
        FROM expanded
    ), agg AS (
        SELECT ga, gb,
               CAST(sum(CASE WHEN g = ga THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
               CAST(sum(CASE WHEN g = gb THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
               sum(CASE WHEN g = ga THEN midrank ELSE 0.0 END) AS r_a,
               sum(CAST(tie_n AS DOUBLE) * tie_n - 1.0) AS tie_term
        FROM ranked GROUP BY ga, gb
    )
    SELECT group_a, group_b, n_a, n_b, u_a, z, abs(z) <= 1.96 AS same_dist
    FROM (
        SELECT ga AS group_a, gb AS group_b, n_a, n_b,
               round(r_a - CAST(n_a AS DOUBLE) * (n_a + 1) / 2.0, 6) AS u_a,
               round((r_a - CAST(n_a AS DOUBLE) * (n_a + 1) / 2.0
                      - CAST(n_a AS DOUBLE) * n_b / 2.0)
                     / sqrt(CAST(n_a AS DOUBLE) * n_b / 12.0
                            * ((CAST(n_a + n_b AS DOUBLE) + 1.0)
                               - tie_term / (CAST(n_a + n_b AS DOUBLE)
                                             * (CAST(n_a + n_b AS DOUBLE) - 1.0)))), 6) AS z
        FROM agg
    ) s ORDER BY group_a, group_b
    """,
)
def q_value_ranksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U / rank-sum test for every event-type pair over
    the value column (operators/stats.py::rank_sum_pairs): the
    TWO-sample distribution comparison next to the one-sample KS —
    binning-free (vs PSI) and normality-free (vs a t-test). Midranks
    are rank() + (ties-1)/2 — multiples of 0.5 whose sums stay exact
    in doubles, so U and the tie correction are bitwise cross-engine;
    z is one double expression, 6 dp. Hash-matched."""
    from .operators.stats import rank_sum_pairs

    ev = load_table(spark, sf_dir, "events")
    return rank_sum_pairs(ev, "event_type", "value").orderBy("group_a", "group_b")


@register(
    "q_survival_km",
    oracle="""
    WITH ev AS (SELECT user_id AS u, epoch_us(ts) AS t FROM events),
    flagged AS (
        SELECT u, t,
               CASE WHEN lag(t) OVER w IS NULL OR t - lag(t) OVER w > 1800000000
                    THEN 1 ELSE 0 END AS ns
        FROM ev WINDOW w AS (PARTITION BY u ORDER BY t)
    ), sess AS (
        SELECT u, t,
               CAST(sum(ns) OVER (PARTITION BY u ORDER BY t
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
        FROM flagged
    ), iv AS (SELECT min(t) AS s, max(t) AS e FROM sess GROUP BY u, sid),
    hz AS (SELECT max(e) AS h FROM iv),
    durs AS (
        SELECT (e - s) // 60000000 AS dur,
               (hz.h - e > 1800000000) AS complete
        FROM iv CROSS JOIN hz
    ), d_i AS (
        SELECT dur AS t_unit, count(*) AS d_events FROM durs WHERE complete GROUP BY dur
    ), hist AS (
        SELECT dur AS t_unit, count(*) AS cnt FROM durs GROUP BY dur
    ), tot AS (SELECT count(*) AS total FROM durs),
    at_risk AS (
        SELECT t_unit,
               CAST(tot.total - COALESCE(sum(cnt) OVER (
                   ORDER BY t_unit ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS BIGINT) AS n_risk
        FROM hist CROSS JOIN tot
    )
    SELECT d.t_unit, a.n_risk, d.d_events,
           round(exp(sum(CASE WHEN d.d_events < a.n_risk
                              THEN ln(1.0 - CAST(d.d_events AS DOUBLE) / a.n_risk)
                              ELSE 0.0 END) OVER (
               ORDER BY d.t_unit ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           )) * min(CASE WHEN d.d_events = a.n_risk THEN 0.0 ELSE 1.0 END) OVER (
               ORDER BY d.t_unit ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 6) AS survival
    FROM d_i d JOIN at_risk a USING (t_unit)
    ORDER BY t_unit
    """,
)
def q_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve over SESSION durations in minutes
    (operators/survival.py over temporal.session_intervals): sessions
    ending within 30 minutes of the observation horizon are
    right-censored — they feed the at-risk set without counting as
    completions, the correction a plain duration histogram misses at
    the data boundary (sf0.01: 9549 sessions, 7 censored, 37-point
    curve). Integer micro arithmetic; the running product is
    exp(cumsum(ln)) of exact BIGINT rationals, 6 dp; hash-matched
    against the flat single-window DuckDB formulation."""
    from .operators.survival import km_curve
    from .operators.temporal import session_intervals

    ev = load_table(spark, sf_dir, "events")
    iv = session_intervals(ev, gap_minutes=30)
    return km_curve(
        iv, "s_us", "e_us", unit_us=60_000_000, censor_us=30 * 60 * 1_000_000
    ).orderBy("t_unit")


@register(
    "q_lang_source_chi2",
    oracle="""
    WITH cells AS (
        SELECT lang AS a, source AS b, count(*) AS o
        FROM documents WHERE lang IS NOT NULL AND source IS NOT NULL
        GROUP BY 1, 2
    ), ra AS (SELECT a, CAST(sum(o) AS BIGINT) AS r FROM cells GROUP BY a),
    cb AS (SELECT b, CAST(sum(o) AS BIGINT) AS c FROM cells GROUP BY b),
    nrow AS (
        SELECT CAST(sum(o) AS BIGINT) AS n, count(*) AS observed_cells FROM cells
    ), folded AS (
        SELECT sum(CAST(o AS DOUBLE) * o / (CAST(r AS DOUBLE) * c)) AS s
        FROM cells JOIN ra USING (a) JOIN cb USING (b)
    ), lv AS (
        SELECT (SELECT count(*) FROM ra) AS r_levels,
               (SELECT count(*) FROM cb) AS c_levels
    )
    SELECT n, r_levels, c_levels, observed_cells,
           (r_levels - 1) * (c_levels - 1) AS dof,
           round(CAST(n AS DOUBLE) * s - n, 6) AS chi2,
           round(sqrt(greatest(CAST(n AS DOUBLE) * s - n, 0.0)
                      / (CAST(n AS DOUBLE)
                         * (CAST(least(r_levels, c_levels) AS DOUBLE) - 1.0))), 6)
               AS cramers_v
    FROM folded CROSS JOIN nrow CROSS JOIN lv
    """,
)
def q_lang_source_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence of language vs source feed over the
    documents table (operators/stats.py::chi2_independence) + Cramér's
    V effect size — the categorical member of the statistical-audit
    family. Zero cells folded analytically (chi2 = N·Σ_obs o²/(r·c)
    − N), so the aggregate touches only observed cells; one row out,
    hash-matched at 6 dp."""
    from .operators.stats import chi2_independence

    docs = load_table(spark, sf_dir, "documents")
    return chi2_independence(docs, "lang", "source")


# ===========================================================================
# HTML boilerplate extraction (round-5: the crawl-curation stage the r4
# verdict flagged as the one missing text-pipeline tier)
# ===========================================================================


def _html_extract_oracle() -> str:
    from .operators.html import (
        LINK_WEIGHT,
        MIN_CHARS,
        duckdb_clean_segment,
        duckdb_link_count,
        duckdb_segments,
        duckdb_strip_blocks,
    )

    page = (
        "'<!DOCTYPE html><html><head><title>' || source || ' · doc ' || doc_id"
        " || '</title><style>p{margin:0} .x{color:red}</style>"
        "<script src=\"a.js\"></script></head><body>"
        "<nav><ul><li><a href=\"/\">Home</a></li>"
        "<li><a href=\"/about\">About</a></li>"
        "<li><a href=\"/contact\">Contact</a></li></ul></nav>"
        "<header><h1>' || source || '</h1></header>"
        "<!-- rendered ' || doc_id || ' --><div id=\"main\"><p>'"
        " || substr(text, 1, CAST(floor(len(text) / 2) AS INT)) || '</p><p>'"
        " || substr(text, CAST(floor(len(text) / 2) AS INT) + 1)"
        " || ' &amp; more &lt;escaped&gt;</p></div>"
        "<aside><p>Related: <a href=\"/r1\">one</a> <a href=\"/r2\">two</a>"
        " <a href=\"/r3\">three</a></p></aside>"
        "<footer><p>© corp — <a href=\"/tos\">terms</a></p></footer>"
        "<script>var x=1;</script></body></html>'"
    )
    return f"""
    WITH pages AS (
        SELECT CAST(doc_id AS VARCHAR) AS doc_id, {page} AS html
        FROM documents
    ), segs AS (
        SELECT doc_id, len(html) AS n_chars_html,
               unnest({duckdb_segments(duckdb_strip_blocks('html'))}) AS seg,
               generate_subscripts({duckdb_segments(duckdb_strip_blocks('html'))}, 1)
                   AS seg_idx
        FROM pages
    ), scored AS (
        SELECT doc_id, n_chars_html, seg_idx,
               {duckdb_clean_segment('seg')} AS txt,
               {duckdb_link_count('seg')} AS n_links
        FROM segs WHERE trim(seg) <> ''
    ), docs AS (
        SELECT doc_id, any_value(n_chars_html) AS n_chars_html,
               count(*) AS n_segments,
               CAST(sum(CASE WHEN len(txt) >= {MIN_CHARS}
                             AND n_links * {LINK_WEIGHT} < len(txt)
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
               string_agg(CASE WHEN len(txt) >= {MIN_CHARS}
                               AND n_links * {LINK_WEIGHT} < len(txt)
                          THEN txt END, ' ' ORDER BY seg_idx) AS text
        FROM scored GROUP BY doc_id
    )
    SELECT doc_id, n_chars_html, n_segments, n_kept,
           CAST(len(COALESCE(text, '')) AS BIGINT) AS n_chars_text,
           md5(COALESCE(text, '')) AS text_md5,
           round(len(COALESCE(text, '')) * 1.0 / n_chars_html, 6)
               AS text_density,
           CASE WHEN contains(COALESCE(text, ''), 'Home')
                  OR contains(COALESCE(text, ''), 'var x=1')
                  OR contains(COALESCE(text, ''), '© corp')
                THEN 1 ELSE 0 END AS boilerplate_leak
    FROM docs
    """


@register("q_html_extract", oracle=_html_extract_oracle())
def q_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML boilerplate extraction (operators/html.py) over synthetic
    crawl pages built deterministically from the documents fixture:
    every page wraps the doc text in a realistic shell (title, style,
    script, link-dense nav, header, comment, main div split into two
    paragraphs with planted HTML entities, link-heavy aside, footer,
    inline script). The extractor removes boilerplate containers,
    splits block segments, keeps content by the densitometric rule
    (len >= 25, n_links*20 < len), cleans and re-joins — all Catalyst,
    explode/groupBy shape (no HOF-over-derived-array re-inlining;
    CLAUDE.md winnow lesson). Pinned by text_md5 per document — the
    extracted CONTENT, not just counts, hash-matches the identical
    RE2/Java-regex-common rendering in DuckDB; boilerplate_leak
    asserts none of the planted nav/script/footer markers survive
    (expected constant 0)."""
    from .operators.html import extract_text

    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("doc_id"), "source", "text"
    )
    half = F.floor(F.length("text") / 2).cast("int")
    page = F.concat(
        F.lit("<!DOCTYPE html><html><head><title>"),
        F.col("source"),
        F.lit(" · doc "),
        F.col("doc_id"),
        F.lit(
            '</title><style>p{margin:0} .x{color:red}</style>'
            '<script src="a.js"></script></head><body>'
            '<nav><ul><li><a href="/">Home</a></li>'
            '<li><a href="/about">About</a></li>'
            '<li><a href="/contact">Contact</a></li></ul></nav>'
            "<header><h1>"
        ),
        F.col("source"),
        F.lit("</h1></header><!-- rendered "),
        F.col("doc_id"),
        F.lit(' --><div id="main"><p>'),
        F.substring(F.col("text"), F.lit(1), half),
        F.lit("</p><p>"),
        F.col("text").substr(half + 1, F.length("text")),
        F.lit(
            " &amp; more &lt;escaped&gt;</p></div>"
            '<aside><p>Related: <a href="/r1">one</a> <a href="/r2">two</a>'
            ' <a href="/r3">three</a></p></aside>'
            '<footer><p>© corp — <a href="/tos">terms</a></p></footer>'
            "<script>var x=1;</script></body></html>"
        ),
    )
    pages = docs.select("doc_id", page.alias("html"))
    out = extract_text(pages, "html", "doc_id")
    sized = pages.select("doc_id", F.length("html").alias("n_chars_html"))
    return (
        out.join(sized, "doc_id")
        .select(
            "doc_id",
            "n_chars_html",
            "n_segments",
            "n_kept",
            F.length("text").cast("bigint").alias("n_chars_text"),
            F.md5("text").alias("text_md5"),
            F.round(
                F.length("text") * F.lit(1.0) / F.col("n_chars_html"), 6
            ).alias("text_density"),
            F.when(
                F.col("text").contains("Home")
                | F.col("text").contains("var x=1")
                | F.col("text").contains("© corp"),
                1,
            )
            .otherwise(0)
            .alias("boilerplate_leak"),
        )
        .orderBy("doc_id")
    )
