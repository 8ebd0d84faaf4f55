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

from .functions import (
    DUCKDB_TOKENIZE,
    duckdb_lang_id,
    lang_id_expr,
    quality_exprs,
    token_count_expr,
    tokenize_md5,
)
from .sources import load_table, sequences_from_documents

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return dict(_QUERIES)


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
    dec = lambda c: F.col(c).cast("decimal(38,4)")  # noqa: E731
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
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
    """Broadcast join (customer is the small dim) + top-k."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_custkey").alias("custkey"), F.col("c_name").alias("name"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(38,4)"))
            .cast("double")
            .alias("total_spent"),
            F.count("*").alias("n_orders"),
        )
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
    """Exact heavy hitters — the CMS top-k companion."""
    seq = sequences_from_documents(spark, sf_dir)
    return (
        seq.select(F.explode("tokens").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), "tok")
        .limit(25)
    )


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
