"""Output sharding + train/validation splits for tokenized corpora.

The last stage of a 100-TB curation pipeline writes the surviving,
tokenized documents as N balanced shards (so 1000 trainer workers can
each stream ~N/1000 files without coordination) and assigns every
document to exactly one split (train/val/test) with no leakage across
reruns, engines, or partitionings.

Both decisions here are **pure functions of the document id** — the
first 8 hex chars of md5(doc_id) interpreted as an integer (the same
convention as operators/curation.hash_bucket_expr, reproducible in
DuckDB as ``('0x' || substr(md5(id),1,8))::BIGINT``):

- shard   = h mod n_shards          (uniform, so shards balance)
- split   = range test on h mod 10^6 (disjoint ranges: leak-free by
            construction — a document cannot be in two splits)

Scale shape: assignment is a map-side expression (no shuffle, no RNG
state, no driver round-trip); the manifest is one hash aggregate on
the shard/split key — map-side combine reduces each task's output to
at most n_shards rows, so the single shuffle moves O(tasks x shards)
tiny rows regardless of corpus size. Writing the shards themselves is
``df.repartition(n_shards, "shard").write`` — one shuffle, balanced
by the same uniform hash, no skew (hot domains spread across all
shards because the key is the per-document hash, not the domain).

Reference scope note: /root/reference/src/bloomfilter has no sharding
surface; this is pipeline machinery the Bloom-filter library's users
need around it (cited as an extension in SURVEY.md round-4 additions).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .curation import hash_bucket_expr, _MICRO

__all__ = [
    "shard_assignment",
    "shard_manifest",
    "split_assignment",
    "split_manifest",
    "write_shards",
    "epoch_shuffle",
]


def shard_assignment(
    df: DataFrame, n_shards: int, id_col: str = "doc_id"
) -> DataFrame:
    """Add a ``shard`` column in [0, n_shards) — stable hash of the id.

    Deterministic across runs/engines/partitionings (md5-prefix mod);
    uniform, so expected shard size is |df|/n_shards with binomial
    concentration — pick n_shards = ceil(corpus_bytes / target_shard
    _bytes) and every shard lands within a few percent of target.
    """
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    return df.withColumn(
        "shard", hash_bucket_expr(F.col(id_col), buckets=n_shards)
    )


def shard_manifest(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    weight_col: str | None = None,
) -> DataFrame:
    """Per-shard manifest: (shard, n_docs[, n_weight], ids_md5).

    ``ids_md5`` pins exact shard MEMBERSHIP (md5 over the sorted
    comma-joined ids), not just counts — two engines that route even
    one document differently produce different digests. One hash
    aggregate; map-side combine caps shuffled rows at tasks*n_shards.
    (The membership digest itself is for tests/contract verification;
    a production manifest would drop it and stay fully streaming.)
    """
    assigned = shard_assignment(df, n_shards, id_col=id_col)
    aggs = [F.count("*").alias("n_docs")]
    if weight_col is not None:
        aggs.append(F.sum(weight_col).cast("bigint").alias("n_weight"))
    aggs.append(
        F.md5(
            F.concat_ws(",", F.sort_array(F.collect_list(F.col(id_col))))
        ).alias("ids_md5")
    )
    return assigned.groupBy("shard").agg(*aggs)


def _split_thresholds(fractions: dict[str, float]) -> list[tuple[str, int]]:
    """-> [(name, exclusive upper bucket bound)], cumulative over _MICRO.

    Fractions must sum to 1 (±1e-9). Bounds are exact integers —
    floor(cum * 10^6) — so both engines make identical range tests.
    """
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    bounds: list[tuple[str, int]] = []
    cum = 0.0
    for name, frac in fractions.items():
        if frac < 0:
            raise ValueError(f"negative fraction for {name!r}: {frac}")
        cum += frac
        bounds.append((name, int(cum * _MICRO + 0.5)))
    bounds[-1] = (bounds[-1][0], _MICRO)  # close the last range exactly
    return bounds


def split_assignment(
    df: DataFrame,
    fractions: dict[str, float] | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Add a ``split`` column — leak-free train/val/test assignment.

    Each document's bucket (md5 hash mod 10^6) is tested against
    disjoint cumulative ranges, so membership is exclusive by
    construction and stable under any re-partitioning or re-run —
    the property that matters for contamination: a doc that was in
    ``test`` last month is in ``test`` forever.
    """
    if fractions is None:
        fractions = {"train": 0.98, "val": 0.01, "test": 0.01}
    bounds = _split_thresholds(fractions)
    bucket = hash_bucket_expr(F.col(id_col), buckets=_MICRO)
    case = F.when(bucket < F.lit(bounds[0][1]), F.lit(bounds[0][0]))
    for name, b in bounds[1:-1]:
        case = case.when(bucket < F.lit(b), F.lit(name))
    case = case.otherwise(F.lit(bounds[-1][0]))
    return df.withColumn("split", case)


def split_manifest(
    df: DataFrame,
    fractions: dict[str, float] | None = None,
    id_col: str = "doc_id",
    weight_col: str | None = None,
    strata_col: str | None = None,
) -> DataFrame:
    """Per-(split[, stratum]) counts — the audit table one checks
    before training: split sizes near target fractions, every stratum
    (language, source) represented in val/test. One hash aggregate."""
    assigned = split_assignment(df, fractions, id_col=id_col)
    keys = ["split"] + ([strata_col] if strata_col else [])
    aggs = [F.count("*").alias("n_docs")]
    if weight_col is not None:
        aggs.append(F.sum(weight_col).cast("bigint").alias("n_weight"))
    return assigned.groupBy(*keys).agg(*aggs)


def epoch_shuffle(
    df: DataFrame,
    epoch: int,
    n_shards: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-epoch training order: add (shard, pos).

    Trainers need every epoch to visit the corpus in a fresh uniform
    order, reproducibly, with zero stored RNG state. The shuffle key
    is the first 8 hex chars of ``md5(epoch || ':' || id)`` — a new
    pseudorandom permutation per epoch derived purely from the id:

    - ``shard``  = key mod n_shards — which trainer worker streams
      the doc this epoch (re-dealt every epoch, unlike the static
      ``shard_assignment`` used for the physical write layout);
    - ``pos``    = rank of (key, id) WITHIN the shard — the order the
      worker reads its slice.

    Workers reading their own shard by ``pos`` jointly reproduce the
    epoch's global order without any coordination or a stored
    permutation table.

    Scale shape: key/shard are map-side expressions; ``pos`` is a
    window partitioned BY SHARD — one hash shuffle on the uniform
    shard key and a per-task sort of ~|df|/n_shards rows. Never a
    global unpartitioned ``row_number`` (that collapses the corpus
    onto one task); at 100 TB set n_shards to the trainer world size
    and each task sorts one worker's slice.
    """
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    from pyspark.sql import Window

    key = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(":", F.lit(str(int(epoch))), F.col(id_col).cast("string"))
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    with_key = df.withColumn("_ekey", key).withColumn(
        "shard", (F.col("_ekey") % F.lit(int(n_shards))).cast("int")
    )
    w = Window.partitionBy("shard").orderBy("_ekey", id_col)
    return with_key.withColumn("pos", F.row_number().over(w)).drop("_ekey")


def write_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
    weight_col: str | None = None,
) -> DataFrame:
    """Route every row to its shard and write ONE parquet file per
    shard under ``path/shard=<i>/``; return the WRITE-JOB TOTALS
    (one row: n_rows, n_weight) observed during the same write job —
    Observation cannot group, so the per-shard breakdown comes from
    ``shard_manifest`` over a read-back, which the layout test pins.

    ``repartition(2*n_shards, "shard")`` is the single shuffle: every
    row of a shard hashes to ONE task, so each shard is exactly one
    file regardless of which task writes it. Hash placement collides
    shards balls-in-bins style; over-partitioning by 2x halves the
    collision rate so write tasks stay balanced within a small factor
    (do NOT use repartitionByRange here — the range partitioner runs
    a SAMPLING pass over the input, executing the upstream plan
    twice: at 100 TB that is a second corpus scan, and it double-
    counts df.observe metrics — measured in the regression test).
    The manifest (counts + weights) is collected with ``df.observe``
    ON the write action itself; readers can audit the layout against
    ``shard_manifest`` of a read-back.

    At 100 TB: n_shards = ceil(corpus_bytes / target_shard_bytes);
    nothing here is driver-side except the n_shards-row manifest.
    """
    from pyspark.sql import Observation

    assigned = shard_assignment(df, n_shards, id_col=id_col)
    aggs = [
        F.count("*").alias("n_rows"),
    ]
    if weight_col is not None:
        aggs.append(F.sum(weight_col).cast("bigint").alias("n_weight"))
    obs = Observation("write_shards")
    observed = assigned.observe(obs, *aggs)
    (
        observed.repartition(2 * n_shards, "shard")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
    spark = df.sparkSession
    totals = obs.get
    rows = [
        (
            int(totals["n_rows"]),
            int(totals["n_weight"]) if weight_col is not None else None,
        )
    ]
    return spark.createDataFrame(rows, "n_rows bigint, n_weight bigint")
