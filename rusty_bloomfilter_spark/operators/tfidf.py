"""Exact TF-IDF cosine similarity self-join over an inverted index.

The classic "more-like-this" primitive (Salton's vector space model;
smooth-idf per the standard formulation): documents as L2-normalized
tf·idf vectors, similarity = dot product, computed SPARSELY — the only
pairs that ever materialize are those sharing at least one surviving
vocabulary term, found by an equi-join on the token (an inverted-index
walk), never a |docs|² loop.

Why this is exact, not approximate: the metric is DEFINED over the
bounded vocabulary (min_df <= df <= max_df_ratio·N). Within that
vocabulary every shared-term pair gets its full dot product (cosine of
disjoint vectors is 0 < threshold, correctly absent). The df cap is
not a heuristic dropped on top — it's the standard stop-word cut, and
it is also what bounds the join: a token of document frequency d
contributes C(d,2) candidate rows, so total join work is
sum_t C(df_t, 2) <= max_df²·|vocab| — corpus-shaped, not quadratic.
At 100 TB the cap is the knob: df <= 0.5·N here (contract corpus);
production near-dup search wants df <= ~1e4 absolute.

idf = ln((N+1)/(df+1)) + 1 (smooth-idf): engine libm ln() differences
are ~1 ulp and sit ~9 orders below the round(6) contract step (the
keyness operator set this precedent).

Distributed shape: tf aggregate (map-side combined) → df aggregate →
co-partitioned tf⋈df on the token → per-doc norm aggregate → unit
weights persisted+tied (self-join recompute rule) → token equi-join →
pair aggregate. Every shuffle is on a key Catalyst hash-partitions;
the pair aggregate is map-side combinable.

Reference parity: the reference library (/root/reference/src/
bloomfilter/) has no ranking/similarity search; this extends the
similarity family (dedup.py, similarity.py, ppjoin.py) with the
weighted-vector metric those set-based operators can't express.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cache import tie


def tfidf_cosine_pairs(
    sequences: DataFrame,
    threshold: float,
    *,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    min_df: int = 1,
    max_df_ratio: float = 0.5,
) -> DataFrame:
    """All document pairs with TF-IDF cosine >= threshold.

    Returns (doc_a, doc_b, n_common, cosine) with doc_a < doc_b and
    cosine a double in [threshold, 1]. Documents whose every token
    falls outside the df bounds have a zero vector and never pair.
    """
    if not (0.0 < threshold <= 1.0):
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    if min_df < 1:
        raise ValueError(f"min_df must be >= 1, got {min_df}")
    if not (0.0 < max_df_ratio <= 1.0):
        raise ValueError(f"max_df_ratio must be in (0, 1], got {max_df_ratio}")

    tf = (
        sequences.select(F.col(id_col).alias("_id"), F.explode(tokens_col).alias("_tok"))
        .groupBy("_id", "_tok")
        .agg(F.count("*").alias("_tf"))
    )
    dfreq = tf.groupBy("_tok").agg(F.count("*").alias("_df"))
    n_docs = tf.agg(F.countDistinct("_id").alias("_n"))

    idf = F.log((F.col("_n").cast("double") + 1.0) / (F.col("_df").cast("double") + 1.0)) + 1.0
    w = (
        tf.join(dfreq, "_tok")
        .crossJoin(F.broadcast(n_docs))
        .filter(
            (F.col("_df") >= min_df)
            & (F.col("_df").cast("double") <= F.lit(max_df_ratio) * F.col("_n"))
        )
        .withColumn("_w", F.col("_tf").cast("double") * idf)
        .select("_id", "_tok", "_w")
    )
    norms = w.groupBy("_id").agg(F.sqrt(F.sum(F.col("_w") * F.col("_w"))).alias("_nrm"))
    unit = (
        w.join(norms, "_id")
        .select("_id", "_tok", (F.col("_w") / F.col("_nrm")).alias("_u"))
        .persist()
    )
    a = unit.select(F.col("_tok"), F.col("_id").alias("_ida"), F.col("_u").alias("_ua"))
    b = unit.select(F.col("_tok"), F.col("_id").alias("_idb"), F.col("_u").alias("_ub"))
    pairs = (
        a.join(b, "_tok")
        .filter(F.col("_ida") < F.col("_idb"))
        .groupBy("_ida", "_idb")
        .agg(
            F.count("*").alias("n_common"),
            F.sum(F.col("_ua") * F.col("_ub")).alias("cosine"),
        )
        .filter(F.col("cosine") >= F.lit(threshold))
        .select(
            F.col("_ida").alias("doc_a"),
            F.col("_idb").alias("doc_b"),
            F.col("n_common").cast("long").alias("n_common"),
            F.col("cosine"),
        )
    )
    return tie(pairs, unit)
