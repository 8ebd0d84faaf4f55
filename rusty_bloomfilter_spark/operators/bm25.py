"""BM25 ranked retrieval over the token corpus.

Okapi BM25 (Robertson & Walker 1994; the Lucene-default scoring
function) for a bag-of-tokens query Q against every document:

    score(d, Q) = sum_{t in Q} idf(t) * tf_td * (k1 + 1)
                  / (tf_td + k1 * (1 - b + b * |d| / avgdl))

    idf(t) = ln(1 + (N - df_t + 0.5) / (df_t + 0.5))   (Lucene form —
             strictly positive even for df > N/2)

The query-DOC retrieval complement of the doc-doc similarity family
(tfidf.py cosine pairs, ppjoin.py Jaccard): "which documents answer
this probe" rather than "which documents duplicate each other" — the
eval-retrieval / contamination-inspection primitive.

Scale shape: the corpus explode is SEMI-JOINED against the broadcast
query-term list BEFORE any aggregation, so only occurrences of query
terms (|Q| postings, a vanishing corpus fraction) reach the (doc,
term) tf aggregate; document length rides along in the group key (no
second corpus join). df per term and the final per-doc score both
aggregate that small frame. Corpus-wide stats (N, avgdl) come from
one column-pruned pass over n_tok. No corpus shuffle, no Python.

Reference parity: retrieval scoring extends /root/reference
(membership library) per SURVEY §2.2's aggregation category; formula
per the public literature above, mirrored exactly by the DuckDB
oracle (contract.q_bm25_search).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cache import tie


def bm25_rank(
    seq: DataFrame,
    terms: Sequence[int] | DataFrame,
    k1: float = 1.2,
    b: float = 0.75,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_terms_hit, score) for every document matching at
    least one query term. ``terms`` is a token-id list or a one-column
    DataFrame ("tok"). Score rounded to 6 dp (sums of <= |Q| doubles)."""
    if not isinstance(terms, DataFrame):
        terms = seq.sparkSession.createDataFrame(
            [(int(t),) for t in terms], "tok int"
        )
    stats = seq.agg(
        F.count("*").alias("n_docs"),
        F.avg(F.size(tokens_col).cast("double")).alias("avgdl"),
    )
    occ = seq.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokens_col).alias("dl"),
        F.explode(tokens_col).alias("tok"),
    ).join(F.broadcast(terms), "tok")
    # tf is tiny (matching docs x |Q|) but feeds TWO consumers (df and
    # the score join); without a persist the corpus semi-join scan runs
    # twice per action (plan-audited: 0 InMemoryTableScan before).
    tf = occ.groupBy("doc_id", "dl", "tok").agg(F.count("*").alias("tf")).persist()
    df_t = tf.groupBy("tok").agg(F.count("*").alias("df"))
    idf = F.log(
        1.0
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    term_score = idf * (
        F.col("tf").cast("double")
        * (k1 + 1.0)
        / (
            F.col("tf")
            + k1 * (1.0 - b + b * F.col("dl").cast("double") / F.col("avgdl"))
        )
    )
    out = (
        tf.join(F.broadcast(df_t), "tok")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_terms_hit"),
            F.round(F.sum(term_score), 6).alias("score"),
        )
    )
    return tie(out, tf)
