"""Similarity search over embedding columns (array<float>).

Two paths, both returning (query_id, neighbor_id, cosine, rank):

- brute-force top-k: broadcast the (small) query set against every
  vector; cosine is pure JVM column algebra (zip_with/aggregate inside
  whole-stage codegen), top-k via window rank. The exactness baseline
  and the right plan whenever |queries| is broadcastable — the scan
  side stays a single pass, no shuffle of the corpus.
- IVF-style LSH: random-hyperplane sign buckets prune the corpus to
  candidates sharing a sign-band with the query, then exact cosine
  re-rank within candidates. At 100 TB the bucket join replaces the
  full crossJoin scan per query batch.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import _cosine_expr


def ann_bruteforce_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k neighbors for each query id (excluding self).
    Deterministic tie-break: (cosine desc, neighbor_id asc)."""
    base = embeddings.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    queries = base.filter(F.col("id").isin(query_ids)).select(
        F.col("id").alias("query_id"), F.col("v").alias("qv")
    )
    scored = (
        base.crossJoin(F.broadcast(queries))
        .filter(F.col("id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("id").alias("neighbor_id"),
            F.round(_cosine_expr(F.col("qv"), F.col("v")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def ann_lsh_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    *,
    n_planes: int = 16,
    bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
) -> DataFrame:
    """Approximate top-k: candidates = vectors sharing >= 1 sign-band
    with the query (random hyperplanes, Charikar), exact cosine re-rank
    within candidates. Recall measured against ann_bruteforce_topk in
    tests; scale path for corpora too big to scan per query."""
    dim = len(embeddings.select(vec_col).first()[0])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    bits_per_band = n_planes // bands

    def sig_rows(batches):
        import pyarrow as pa

        for batch in batches:
            ids = batch.column("id").to_numpy(zero_copy_only=False)
            vecs = np.stack(batch.column("v").to_numpy(zero_copy_only=False))
            proj = (vecs @ planes.T) > 0
            sig = np.zeros(len(ids), dtype=np.int64)
            for j in range(n_planes):
                sig |= proj[:, j].astype(np.int64) << j
            yield pa.RecordBatch.from_pydict({"id": ids.tolist(), "sig": sig.tolist()})

    base = embeddings.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    sigs = base.mapInArrow(sig_rows, schema="id bigint, sig bigint")
    mask = (1 << bits_per_band) - 1
    band_exp = F.posexplode(
        F.array(*[
            F.shiftrightunsigned(F.col("sig"), b * bits_per_band).bitwiseAND(F.lit(mask))
            for b in range(bands)
        ])
    )
    buckets = sigs.select("id", band_exp.alias("band", "bucket")).persist()
    q_buckets = buckets.filter(F.col("id").isin(query_ids)).select(
        F.col("id").alias("query_id"), "band", "bucket"
    )
    cand = (
        buckets.join(F.broadcast(q_buckets), ["band", "bucket"])
        .filter(F.col("id") != F.col("query_id"))
        .select("query_id", F.col("id").alias("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    qv = base.filter(F.col("id").isin(query_ids)).select(
        F.col("id").alias("query_id"), F.col("v").alias("qv")
    )
    scored = (
        cand.join(F.broadcast(qv), "query_id")
        .join(base.withColumnRenamed("id", "neighbor_id"), "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(_cosine_expr(F.col("qv"), F.col("v")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
