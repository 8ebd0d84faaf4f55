"""Similarity search over embedding columns (array<float>).

Three paths, all returning (query_id, neighbor_id, cosine, rank):

- brute-force top-k: broadcast the (small) query set against every
  vector; cosine is pure JVM column algebra (zip_with/aggregate inside
  whole-stage codegen), top-k via window rank. The exactness baseline
  and the right plan whenever |queries| is broadcastable — the scan
  side stays a single pass, no shuffle of the corpus.
- LSH: random-hyperplane sign buckets prune the corpus to candidates
  sharing a sign-band with the query, then exact cosine re-rank within
  candidates. At 100 TB the bucket join replaces the full crossJoin
  scan per query batch.
- IVF (inverted file): a coarse spherical-k-means quantizer partitions
  the corpus into n_centroids inverted lists; queries probe only their
  nprobe nearest lists. Training is the classic distributed Lloyd
  loop — broadcast centroids, per-partition partial sums (the only
  shuffled bytes are (n_centroids x dim) partials), driver update —
  with DETERMINISTIC hash-order initialization (no RNG, reproducible
  across partitionings). The standard big-corpus ANN layout (FAISS
  IVF-Flat semantics, Spark-distributed).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .cache import tie
from .dedup import _dot_expr, _norm_expr


def _stack_rows(col, dim: int) -> tuple[np.ndarray, np.ndarray]:
    """Arrow list column -> (matrix, valid_mask): rows that are NULL or
    not exactly ``dim`` wide are masked out instead of crashing
    np.stack with a ragged object array (round-4 review, CONFIRMED —
    one NULL embedding aborted the whole LSH/IVF job while the
    brute-force path tolerated it)."""
    arrs = col.to_numpy(zero_copy_only=False)
    valid = np.fromiter(
        (a is not None and len(a) == dim for a in arrs),
        dtype=bool,
        count=len(arrs),
    )
    if not valid.any():
        return np.empty((0, dim), dtype=np.float64), valid
    mat = np.stack([np.asarray(a, dtype=np.float64) for a in arrs[valid]])
    return mat, valid


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
    # Precompute each side's norm ONCE (r6): _cosine_expr per pair runs
    # 3 higher-order-function folds — ‖v‖ was recomputed for every
    # (row, query) pair and ‖q‖ for every row. Factoring the norms out
    # leaves 1 fold (the dot product) per pair. Value-identical: the
    # norm folds are the same expressions evaluated once, and IEEE
    # multiply/divide on the same doubles yields the same double.
    sq_sum = lambda c: F.aggregate(  # noqa: E731
        F.transform(c, lambda x: x * x), F.lit(0.0), lambda s, v: s + v
    )
    base = embeddings.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    ).withColumn("nv", F.sqrt(sq_sum(F.col("v"))))
    queries = base.filter(F.col("id").isin(query_ids)).select(
        F.col("id").alias("query_id"), F.col("v").alias("qv"), F.col("nv").alias("nq")
    )
    dot = F.aggregate(
        F.zip_with("qv", "v", lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v
    )
    scored = (
        base.crossJoin(F.broadcast(queries))
        .filter(F.col("id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("id").alias("neighbor_id"),
            F.round(dot / (F.col("nq") * F.col("nv")), 6).alias("cosine"),
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
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: candidates = vectors sharing >= 1 sign-band
    with the query (random hyperplanes, Charikar), exact cosine re-rank
    within candidates. Recall measured against ann_bruteforce_topk in
    tests; scale path for corpora too big to scan per query.

    Pass ``dim`` (the embedding width) to keep plan construction lazy;
    omitting it falls back to a driver ``first()`` — an extra Spark job.
    """
    if n_planes % bands:
        raise ValueError(
            f"n_planes ({n_planes}) must be divisible by bands ({bands}); "
            "the remainder planes would be computed but never bucketed"
        )
    if dim is None:
        dim = len(embeddings.select(vec_col).first()[0])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    bits_per_band = n_planes // bands

    def sig_rows(batches):
        import pyarrow as pa

        for batch in batches:
            ids = batch.column("id").to_numpy(zero_copy_only=False)
            vecs, valid = _stack_rows(batch.column("v"), dim)
            ids = ids[valid]  # NULL/ragged rows drop out, like brute force
            if not len(ids):
                continue
            proj = (vecs @ planes.T) > 0
            sig = np.zeros(len(ids), dtype=np.int64)
            for j in range(n_planes):
                sig |= proj[:, j].astype(np.int64) << j
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids.tolist(), type=pa.int64()),
                    pa.array(sig.tolist(), type=pa.int64()),
                ],
                names=["id", "sig"],
            )

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
    based = base.withColumn("nv", _norm_expr(F.col("v")))  # norm once/vector (r6)
    qv = based.filter(F.col("id").isin(query_ids)).select(
        F.col("id").alias("query_id"), F.col("v").alias("qv"), F.col("nv").alias("nq")
    )
    scored = (
        cand.join(F.broadcast(qv), "query_id")
        .join(based.withColumnRenamed("id", "neighbor_id"), "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot_expr(F.col("qv"), F.col("v")) / (F.col("nq") * F.col("nv")), 6
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
    return tie(out, buckets)


# ---------------------------------------------------------------------------
# IVF: coarse quantizer + inverted lists
# ---------------------------------------------------------------------------


def ivf_train_centroids(
    embeddings: DataFrame,
    *,
    n_centroids: int = 16,
    iters: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Spherical k-means coarse quantizer, distributed Lloyd loop.

    Initialization is hash-ordered (the n_centroids vectors whose ids
    hash smallest) — deterministic for any partitioning, no RNG.
    Each iteration: broadcast the (n_centroids, dim) matrix, every
    partition emits one partial (sums, counts) row, the driver reduces
    and renormalizes. Shuffled bytes per iteration: partitions x
    n_centroids x dim doubles — independent of corpus size.
    """
    spark = embeddings.sparkSession
    base = embeddings.select(
        F.col(id_col).cast("string").alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    init = (
        base.select("v", F.xxhash64("id").alias("h"))
        .orderBy("h")
        .limit(n_centroids)
        .collect()
    )
    C = np.stack([np.asarray(r["v"], dtype=np.float64) for r in init])
    C /= np.linalg.norm(C, axis=1, keepdims=True) + 1e-12

    for _ in range(iters):
        bc = spark.sparkContext.broadcast(C)

        def partials(batches):
            import pyarrow as pa

            Cl = bc.value
            sums = np.zeros_like(Cl)
            counts = np.zeros(len(Cl), dtype=np.int64)
            for b in batches:
                if b.num_rows == 0:
                    continue
                V, _valid = _stack_rows(b.column("v"), Cl.shape[1])
                if not len(V):
                    continue
                Vn = V / (np.linalg.norm(V, axis=1, keepdims=True) + 1e-12)
                assign = np.argmax(Vn @ Cl.T, axis=1)
                np.add.at(sums, assign, Vn)  # n_centroids rows: tiny target
                counts += np.bincount(assign, minlength=len(Cl))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(range(len(Cl)), type=pa.int32()),
                    pa.array([row.tolist() for row in sums], type=pa.list_(pa.float64())),
                    pa.array(counts.tolist(), type=pa.int64()),
                ],
                names=["cid", "s", "n"],
            )

        rows = base.select("v").mapInArrow(
            partials, schema="cid int, s array<double>, n bigint"
        ).collect()
        # the broadcast is fully consumed by the collect — destroy it or
        # every Lloyd iteration leaks one (n_centroids x dim) matrix on
        # driver + executors for the session (round-4 review)
        bc.destroy()
        sums = np.zeros_like(C)
        counts = np.zeros(len(C), dtype=np.int64)
        for r in rows:
            sums[r["cid"]] += np.asarray(r["s"])
            counts[r["cid"]] += r["n"]
        nonempty = counts > 0
        C[nonempty] = sums[nonempty] / counts[nonempty, None]
        C /= np.linalg.norm(C, axis=1, keepdims=True) + 1e-12
    return C


def ivf_assign(
    embeddings: DataFrame,
    centroids: np.ndarray,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """-> (id, cluster): nearest-centroid inverted-list assignment
    (broadcast matmul per Arrow batch)."""
    spark = embeddings.sparkSession
    bc = spark.sparkContext.broadcast(centroids)

    def assign(batches):
        import pyarrow as pa

        Cl = bc.value
        for b in batches:
            if b.num_rows == 0:
                continue
            ids = np.asarray(b.column("id").to_pylist(), dtype=object)
            V, valid = _stack_rows(b.column("v"), Cl.shape[1])
            ids = ids[valid]  # NULL/ragged rows get no assignment
            if not len(ids):
                continue
            Vn = V / (np.linalg.norm(V, axis=1, keepdims=True) + 1e-12)
            a = np.argmax(Vn @ Cl.T, axis=1)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array([int(i) for i in ids], type=pa.int64()),
                    pa.array(a.tolist(), type=pa.int32()),
                ],
                names=["id", "cluster"],
            )

    base = embeddings.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    return base.mapInArrow(assign, schema="id bigint, cluster int")


class IvfIndex:
    """A trained IVF index as a reusable / persistable artifact.

    A real 100 TB user trains ONCE and probes many times; retraining
    the quantizer and reassigning the corpus per query batch (the
    round-2 shape of ``ann_ivf_topk``) wastes iters+1 corpus scans per
    batch. This artifact holds the (n_centroids, dim) centroid matrix
    (driver-side numpy, a few MB at most) plus the (id, cluster)
    assignment frame, and round-trips through parquet:

        idx = IvfIndex.train(embeddings, n_centroids=64)
        idx.write("/warehouse/ivf_idx")            # once
        idx = IvfIndex.read(spark, "/warehouse/ivf_idx")
        idx.probe(embeddings, query_ids, k=5)      # many times, no Lloyd

    The assignments parquet is partitioned by cluster, so a probe's
    inverted-list read prunes to nprobe/n_centroids of the files.
    """

    def __init__(self, centroids: np.ndarray, assignments: DataFrame):
        self.centroids = np.asarray(centroids, dtype=np.float64)
        self.assignments = assignments

    @classmethod
    def train(
        cls,
        embeddings: DataFrame,
        *,
        n_centroids: int = 16,
        iters: int = 4,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> "IvfIndex":
        C = ivf_train_centroids(
            embeddings, n_centroids=n_centroids, iters=iters,
            id_col=id_col, vec_col=vec_col,
        )
        # persist: every probe() references the assignment frame — left
        # lazy, each probe would re-run the corpus-wide assignment scan,
        # exactly the waste this artifact exists to avoid (round-4
        # review). The artifact OWNS the cache: free() releases it
        # (write()+read() gives the parquet-backed layout instead).
        assigned = ivf_assign(embeddings, C, id_col=id_col, vec_col=vec_col).persist()
        return cls(C, assigned)

    def free(self) -> None:
        """Release the persisted assignment frame (train() path only;
        a read() index scans its pruned parquet instead)."""
        self.assignments.unpersist(blocking=False)

    def write(self, path: str) -> None:
        spark = self.assignments.sparkSession
        cent = spark.createDataFrame(
            [(int(i), row.tolist()) for i, row in enumerate(self.centroids)],
            "cid int, v array<double>",
        )
        cent.coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")
        (
            self.assignments.write.mode("overwrite")
            .partitionBy("cluster")
            .parquet(f"{path}/assignments")
        )

    @classmethod
    def read(cls, spark, path: str) -> "IvfIndex":
        rows = spark.read.parquet(f"{path}/centroids").orderBy("cid").collect()
        C = np.stack([np.asarray(r["v"], dtype=np.float64) for r in rows])
        assigned = spark.read.parquet(f"{path}/assignments").select("id", "cluster")
        return cls(C, assigned)

    def probe(
        self,
        embeddings: DataFrame,
        query_ids: list[int],
        k: int = 5,
        *,
        nprobe: int = 4,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> DataFrame:
        """Top-k per query over the nprobe nearest inverted lists —
        NO training or assignment stages run here."""
        return _ivf_probe(
            embeddings, self.centroids, self.assignments, query_ids, k,
            nprobe=nprobe, id_col=id_col, vec_col=vec_col,
        )


def ann_ivf_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    *,
    n_centroids: int = 16,
    nprobe: int = 4,
    iters: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    index: IvfIndex | None = None,
) -> DataFrame:
    """IVF ANN: probe only the nprobe inverted lists nearest each
    query, exact cosine re-rank inside them. Candidate volume is
    ~corpus * nprobe / n_centroids instead of the full scan; recall vs
    brute force is pinned in tests (raise nprobe to trade speed for
    recall, nprobe == n_centroids degenerates to exact).

    Pass ``index`` (an ``IvfIndex``, trained once / read from parquet)
    to skip the Lloyd loop and corpus reassignment entirely."""
    if index is None:
        index = IvfIndex.train(
            embeddings, n_centroids=n_centroids, iters=iters,
            id_col=id_col, vec_col=vec_col,
        )
    return index.probe(
        embeddings, query_ids, k, nprobe=nprobe, id_col=id_col, vec_col=vec_col
    )


def _ivf_probe(
    embeddings: DataFrame,
    C: np.ndarray,
    assigned: DataFrame,
    query_ids: list[int],
    k: int,
    *,
    nprobe: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    spark = embeddings.sparkSession
    base = embeddings.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    qrows = base.filter(F.col("id").isin(query_ids)).collect()
    probe_rows = []
    for r in qrows:
        qv = np.asarray(r["v"], dtype=np.float64)
        qv = qv / (np.linalg.norm(qv) + 1e-12)
        for cid in np.argsort(-(C @ qv))[:nprobe]:
            probe_rows.append((int(r["id"]), int(cid)))
    probes = spark.createDataFrame(probe_rows, "query_id bigint, cluster int")
    cand = (
        assigned.join(F.broadcast(probes), "cluster")
        .filter(F.col("id") != F.col("query_id"))
        .select("query_id", F.col("id").alias("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    based = base.withColumn("nv", _norm_expr(F.col("v")))  # norm once/vector (r6)
    qv_df = based.filter(F.col("id").isin(query_ids)).select(
        F.col("id").alias("query_id"), F.col("v").alias("qv"), F.col("nv").alias("nq")
    )
    scored = (
        cand.join(F.broadcast(qv_df), "query_id")
        .join(based.withColumnRenamed("id", "neighbor_id"), "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot_expr(F.col("qv"), F.col("v")) / (F.col("nq") * F.col("nv")), 6
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


# ---------------------------------------------------------------------------
# Scalar quantization (int8 SQ — the embedding-compression scale path)
# ---------------------------------------------------------------------------


def quantize_sq8_expr(v: Column) -> Column:
    """Symmetric per-vector int8 scalar quantization (the FAISS
    SQ8-style codec): q_i = floor(v_i / max|v| * 127 + 0.5), stored as
    array<bigint> for exact cross-engine integer dot products.

    floor(x + 0.5) instead of round(): Spark rounds HALF_UP, DuckDB
    HALF_EVEN — floor(+0.5) is the same deterministic half-up in both.
    The per-vector scale cancels inside cosine, so quantized cosine
    needs NO dequantization. Zero vectors quantize to NULL (callers
    filter them; cosine is undefined there anyway).
    """
    scale = F.array_max(F.transform(v, lambda x: F.abs(x)))
    return F.when(
        scale > 0,
        F.transform(v, lambda x: F.floor(x / scale * 127.0 + 0.5).cast("long")),
    )


def ann_sq_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k cosine neighbors in int8-quantized space.

    The compression tier of the ANN family: brute-force is the oracle,
    LSH/IVF prune the CANDIDATE set, SQ shrinks the VECTORS — 4x less
    I/O and memory bandwidth per scanned row (float32 -> int8), which
    at 100 TB is the difference between an embedding table that fits
    the cluster's page cache and one that doesn't. Production systems
    compose them (IVF over SQ-coded vectors); here SQ is scored
    exhaustively so its ranking quality is measurable in isolation
    (recall vs exact pinned in tests; the contract query hash-matches
    the deterministic quantized ranking itself).

    Same scale shape as ann_bruteforce_topk: queries broadcast, one
    map-side pass over the embedding table, TakeOrderedAndProject
    top-k per query. Quantization is pure Catalyst; dot products are
    exact integers (|q| <= 127, dim-bounded), so the ranking is
    bitwise-reproducible across engines and partitionings.
    """
    base = embeddings.select(
        F.col(id_col).alias("id"),
        quantize_sq8_expr(F.col(vec_col).cast("array<double>"))
        .cast("array<double>")
        .alias("q"),
    ).filter(F.col("q").isNotNull()).withColumn(
        "nv", _norm_expr(F.col("q"))  # norm once/vector (r6)
    )
    queries = base.filter(F.col("id").isin(query_ids)).select(
        F.col("id").alias("query_id"), F.col("q").alias("qq"), F.col("nv").alias("nq")
    )
    scored = (
        base.crossJoin(F.broadcast(queries))
        .filter(F.col("id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("id").alias("neighbor_id"),
            F.round(
                _dot_expr(F.col("qq"), F.col("q")) / (F.col("nq") * F.col("nv")), 6
            ).alias("cosine_sq"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sq"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sq", "rank")
    )
