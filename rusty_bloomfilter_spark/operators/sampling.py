"""Deterministic hash-order sampling + KMV (bottom-k) distinct sketch.

Training pipelines need samples that are (a) reproducible across runs
and engines, (b) mergeable/scalable, (c) usable as a distinct-count
sketch. Hash-order sampling gives all three: rank every key by a
content hash and keep the k smallest. The k-th smallest hash is the
classic KMV / bottom-k estimator (Bar-Yossef et al. 2002): with D
distinct keys uniformly hashed into [0, 2^60), E[h_(k)] ~ k/D * 2^60,
so D_hat = (k-1) * 2^60 / h_(k).

Everything here is deterministic and cross-engine: the hash is the
first 15 hex chars of md5 (60 bits, fits BIGINT in both engines), so
DuckDB oracles reproduce samples AND estimates bit-for-bit — a sketch
whose output hash-matches an exact SQL oracle.

Scale shape: bottom-k is Spark's TakeOrderedAndProject — each task
keeps its local k, the driver merges P*k rows, no full sort, no big
shuffle. The per-stratum variant shuffles once on the stratum key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

HASH_BITS = 60
HASH_DOMAIN = 1 << HASH_BITS


def content_hash60(col) -> "F.Column":
    """60-bit content hash of a string column: first 15 hex chars of
    md5, as BIGINT. Identical in DuckDB (see duckdb_hash60)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def duckdb_hash60(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def bottom_k_sample(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """Deterministic k-row sample: the k rows whose key hashes smallest.
    -> (key, h) ordered by h. Same rows on any engine, any run, any
    partitioning; adding data can only displace rows, never reshuffle
    the survivors' relative order."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    return (
        df.select(F.col(key_col).cast("string").alias("key"))
        .select("key", content_hash60(F.col("key")).alias("h"))
        .orderBy("h", "key")
        .limit(k)
    )


def bottom_k_by(df: DataFrame, strata_col: str, key_col: str, k: int) -> DataFrame:
    """Stratified deterministic sample: k smallest-hash keys per
    stratum. One shuffle on the stratum key; window top-k inside.
    -> (stratum, key, h)."""
    hashed = df.select(
        F.col(strata_col).cast("string").alias("stratum"),
        F.col(key_col).cast("string").alias("key"),
    ).select("stratum", "key", content_hash60(F.col("key")).alias("h"))
    w = Window.partitionBy("stratum").orderBy("h", "key")
    return (
        hashed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def kmv_distinct(df: DataFrame, key_col: str, k: int = 256) -> DataFrame:
    """KMV distinct-count estimate: D_hat = (k-1) * 2^60 / h_(k) over
    the k smallest DISTINCT key hashes. Deterministic — the estimate is
    a pure function of the data, so a SQL oracle reproduces it exactly
    (unlike HLL, whose register layout is engine-private).

    -> single row (n_hashes, kth_hash, est_distinct). When the table
    has fewer than k distinct keys the sample IS the distinct set and
    the exact count is returned instead.
    """
    if k < 2:
        raise ValueError(f"KMV needs k >= 2 (estimator uses k-1), got {k}")
    hashes = (
        df.select(F.col(key_col).cast("string").alias("key"))
        .select(content_hash60(F.col("key")).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
    )
    agg = hashes.agg(
        F.count("*").alias("n_hashes"), F.max("h").alias("kth_hash")
    )
    return agg.select(
        "n_hashes",
        "kth_hash",
        F.when(
            F.col("n_hashes") < k, F.col("n_hashes").cast("double")
        )
        .otherwise(
            F.lit(float(k - 1)) * F.lit(float(HASH_DOMAIN)) / F.col("kth_hash").cast("double")
        )
        .alias("est_distinct"),
    )
