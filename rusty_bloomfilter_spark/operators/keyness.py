"""Distinctive terms per corpus slice: Dunning log-likelihood keyness.

Which tokens characterize a source? For every (source, token) the 2x2
contingency table against the rest of the corpus

        k11 = count(token, source)      k12 = count(token, elsewhere)
        k21 = other tokens in source    k22 = other tokens elsewhere

is scored with Dunning's (1993) log-likelihood ratio

    G2 = 2 * [ sum xlx(k_ij) - sum xlx(row totals)
               - sum xlx(col totals) + xlx(N) ],   xlx(k) = k*ln(k)

the corpus-linguistics standard that stays calibrated on rare counts
where chi-squared breaks. We emit ``mi_nats = G2 / (2N)`` — the mutual
information of the table in nats — instead of raw G2: it is O(1)
magnitude, so a fixed-decimal rounding keeps cross-engine ln()
last-ulp noise (which scales with N in G2 but cancels in G2/2N) far
below the rounding step, making the score hash-comparable between
Spark and DuckDB. The over-representation gate (keep tokens MORE
frequent in the source than the corpus rate) is the exact integer
cross-product k11 * N > c_t * n_s — no float enters the row set.

Execution shape (the one you'd want at 100 TB):

- ONE corpus-sized pass: explode + groupBy (source, token) with
  map-side partial aggregation; every later step runs on the count
  frame, bounded by |sources| x |vocab|;
- token totals and source totals are second-level aggregates OF THE
  COUNT FRAME (never a second corpus scan); the source-totals join is
  a broadcast (|sources| rows), the token-totals join shuffles only
  count rows;
- the score is whole-stage-codegen'd column math — no UDFs.

Reference parity: the reference (/root/reference, Rust, 978 LoC) has
no text surface; this extends the engine's corpus-analysis category
(collocations.py PMI, lm.py bigram scoring, tfidf in dedup.py) with
slice-vs-corpus contrast under the same exactness discipline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import DEFAULT_VOCAB, DUCKDB_TOKENIZE, tokenize_md5


def _xlx(c: Column) -> Column:
    """k * ln(k) with xlx(0) = 0 (the 0*ln(0) limit)."""
    return F.when(c > 0, c.cast("double") * F.log(c.cast("double"))).otherwise(
        F.lit(0.0)
    )


def distinctive_terms(
    docs: DataFrame,
    *,
    text_col: str = "text",
    key_col: str = "source",
    min_count: int = 5,
    vocab: int = DEFAULT_VOCAB,
) -> DataFrame:
    """-> (key, token, n_in_key, n_elsewhere, mi_nats): tokens
    over-represented in a slice vs the corpus, scored by G2/(2N) in
    nats, ``min_count`` occurrences in the slice required."""
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")

    tok = docs.select(
        F.col(key_col).alias("key"),
        F.explode(tokenize_md5(F.col(text_col), vocab)).alias("token"),
    )
    st = tok.groupBy("key", "token").agg(F.count(F.lit(1)).alias("k11"))

    tot_t = st.groupBy("token").agg(F.sum("k11").alias("ct"))
    tot_s = st.groupBy("key").agg(F.sum("k11").alias("ns"))
    nn = st.agg(F.sum("k11").alias("n"))

    j = (
        st.join(tot_t, "token")
        .join(F.broadcast(tot_s), "key")
        .crossJoin(F.broadcast(nn))
        .filter(
            (F.col("k11") >= min_count)
            # integer cross-product: source rate > corpus rate, exact
            & (F.col("k11") * F.col("n") > F.col("ct") * F.col("ns"))
        )
    )
    k11, ct, ns, n = (F.col(c) for c in ("k11", "ct", "ns", "n"))
    g2 = 2.0 * (
        _xlx(k11)
        + _xlx(ct - k11)
        + _xlx(ns - k11)
        + _xlx(n - ct - ns + k11)
        - _xlx(ct)
        - _xlx(n - ct)
        - _xlx(ns)
        - _xlx(n - ns)
        + _xlx(n)
    )
    return j.select(
        F.col("key").alias(key_col),
        "token",
        F.col("k11").alias("n_in_key"),
        (ct - k11).alias("n_elsewhere"),
        (g2 / (2.0 * n.cast("double"))).alias("mi_nats"),
    )


def distinctive_terms_oracle_sql(
    *,
    table: str = "documents",
    text_col: str = "text",
    key_col: str = "source",
    min_count: int = 5,
    vocab: int = DEFAULT_VOCAB,
    round_digits: int = 7,
) -> str:
    """The matching DuckDB formulation (same tokenizer, same integer
    gate, same xlx algebra; mi_nats rounded at ``round_digits``)."""

    def xlx(e: str) -> str:
        return f"(CASE WHEN ({e}) > 0 THEN ({e}) * ln({e}) ELSE 0.0 END)"

    return f"""
    WITH tok AS (
        SELECT {key_col} AS key,
               unnest({DUCKDB_TOKENIZE(text_col, vocab)}) AS token
        FROM {table}
    ), st AS (
        SELECT key, token, CAST(count(*) AS BIGINT) AS k11
        FROM tok GROUP BY 1, 2
    ), tot_t AS (
        SELECT token, CAST(sum(k11) AS BIGINT) AS ct FROM st GROUP BY 1
    ), tot_s AS (
        SELECT key, CAST(sum(k11) AS BIGINT) AS ns FROM st GROUP BY 1
    ), nn AS (
        SELECT CAST(sum(k11) AS BIGINT) AS n FROM st
    )
    SELECT st.key AS {key_col}, st.token,
           st.k11 AS n_in_key,
           tot_t.ct - st.k11 AS n_elsewhere,
           round((
             {xlx('st.k11')} + {xlx('tot_t.ct - st.k11')}
             + {xlx('tot_s.ns - st.k11')}
             + {xlx('nn.n - tot_t.ct - tot_s.ns + st.k11')}
             - {xlx('tot_t.ct')} - {xlx('nn.n - tot_t.ct')}
             - {xlx('tot_s.ns')} - {xlx('nn.n - tot_s.ns')}
             + {xlx('nn.n')}
           ) / CAST(nn.n AS DOUBLE), {round_digits}) AS mi_nats
    FROM st JOIN tot_t USING (token) JOIN tot_s USING (key), nn
    WHERE st.k11 >= {min_count}
      AND st.k11 * nn.n > tot_t.ct * tot_s.ns
    """
