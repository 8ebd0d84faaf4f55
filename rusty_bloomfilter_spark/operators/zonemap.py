"""Zone-map (min/max) file pruning — range-predicate scan skipping.

Complements the Bloom file index (operators/pruning.py): the Bloom
index answers POINT lookups, a zone map answers RANGE predicates. One
row per parquet file holds the exact min/max of the indexed column
(plus null and row counts) — the user-controlled analogue of parquet
column-chunk statistics / Iceberg manifest min-max bounds, but
persistable and mergeable as its own tiny frame, so it survives
engine boundaries and snapshot unions. Because the bounds are exact,
interval-overlap pruning has ZERO false negatives: the pruned scan is
provably equal to the full scan for any bounded predicate on the
indexed column (a row with lower <= v <= upper in file f forces
lo_f <= upper and hi_f >= lower, so f always survives).

Entirely Catalyst — no sketch payloads, no Python in any row path:

- the index is ONE hash aggregate keyed by ``input_file_name()``
  (map-side combined, so the shuffle carries at most tasks x files
  four-column rows, independent of corpus row count);
- pruning is a filter over the file-count-sized index frame (only
  surviving file NAMES are collected — there is nothing bulky to
  collect);
- the pruned read is ``parquet(*survivors)`` plus the exact predicate,
  which Catalyst pushes into the parquet scan (row-group/page skipping
  stacks on top of the file skipping).

At 100 TB this is the difference between scanning a corpus and
scanning the handful of files whose key range intersects the query —
the same plan shape an Iceberg manifest prune would produce, with the
index under user control (rebuildable, unionable across snapshots,
compactable).

Reference parity: the reference is an in-memory sketch library with no
I/O; the zero-false-negative pruning contract mirrors the spirit of
its ``contains`` guarantee (/root/reference/src/bloomfilter/
mod.rs:199-228). The file-pruning composition is ours.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .pruning import _checked_file_name

# the fixed index schema: one row per file (or per read-split of a
# file — compact_zone_index collapses those), column-name-independent
# so indexes over different columns/tables compact with the same code
ZONE_COLUMNS = ("file", "lo", "hi", "n_nulls", "n_rows")


def zone_map_index(df: DataFrame, *, col: str) -> DataFrame:
    """One stats row per input parquet file over an orderable ``col``
    -> (file, lo, hi, n_nulls, n_rows).

    ``df`` must come straight from a file source (``input_file_name()``
    must be non-empty; frames that passed a shuffle/join lose it — the
    prune/compact steps fail loud on empty names). ``lo``/``hi`` keep
    the column's own type (long, double, string, timestamp, ...); they
    are NULL only when every row in the file is NULL, in which case the
    file can never match a range predicate and is always pruned.
    """
    return df.groupBy(F.input_file_name().alias("file")).agg(
        F.min(col).alias("lo"),
        F.max(col).alias("hi"),
        F.sum(F.col(col).isNull().cast("bigint")).alias("n_nulls"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def compact_zone_index(*indexes: DataFrame) -> DataFrame:
    """Union zone-map snapshots and collapse to one row per FILE.

    Two sources of multi-row files: one big file read as several splits
    (several rows in ONE snapshot) and the same file re-indexed across
    snapshots. min/max compose exactly (min of mins, max of maxes), so
    the compacted bounds are the bounds of the file's full contents
    under any union order. n_nulls/n_rows add — exact when rows cover
    disjoint slices; re-indexing identical content double-counts them
    but leaves the BOUNDS (and therefore every pruning decision)
    unchanged, same contract as pruning.compact_index. The merge is one
    hash aggregate over index-sized rows.
    """
    if not indexes:
        raise ValueError("compact_zone_index needs at least one index frame")
    unioned = indexes[0]
    for extra in indexes[1:]:
        unioned = unioned.unionByName(extra)
    return _validated(
        unioned.groupBy("file").agg(
            F.min("lo").alias("lo"),
            F.max("hi").alias("hi"),
            F.sum("n_nulls").alias("n_nulls"),
            F.sum("n_rows").alias("n_rows"),
        )
    )


def _validated(index: DataFrame) -> DataFrame:
    """Fail loud (Catalyst raise_error, no Python in the row path) on an
    empty file name — the signature of an index built over a frame that
    was not straight from a file source (input_file_name() returns ''
    after a shuffle/join or on an in-memory frame). A broken index has
    ONE group (file='') whose lo/hi span the whole data, so any
    intersecting probe hits the row and raises; survivors additionally
    re-check in `_checked_file_name` at collect time."""
    return index.withColumn(
        "file",
        F.when(
            F.col("file") == "",
            F.raise_error(
                F.lit(
                    "index row with empty file name: zone_map_index input "
                    "must come straight from a file source "
                    "(input_file_name() was '')"
                )
            ),
        ).otherwise(F.col("file")),
    )


def _bounds_condition(lower, upper):
    """Files whose [lo, hi] interval can intersect [lower, upper].
    All-NULL files (lo IS NULL) never match a range predicate."""
    if lower is None and upper is None:
        raise ValueError(
            "zone pruning needs at least one bound (lower/upper); an "
            "unbounded read is a full scan — do that explicitly"
        )
    cond = F.col("lo").isNotNull()
    if upper is not None:
        cond = cond & (F.col("lo") <= F.lit(upper))
    if lower is not None:
        cond = cond & (F.col("hi") >= F.lit(lower))
    return cond


def zone_prune(index: DataFrame, *, lower=None, upper=None) -> list[str]:
    """File names whose min/max interval intersects [lower, upper]
    (either bound may be None for a one-sided predicate; both None is
    rejected). Zero FN: every file truly holding a matching row
    survives. Only names come back to the driver — the index frame is
    file-count-sized, the survivors a subset of that."""
    rows = (
        _validated(index)
        .filter(_bounds_condition(lower, upper))
        .select("file")
        .distinct()
        .collect()
    )
    return sorted(_checked_file_name(r["file"]) for r in rows)


def zone_pruned_read(
    spark: SparkSession,
    input_path: str,
    index: DataFrame,
    *,
    col: str,
    lower=None,
    upper=None,
) -> tuple[DataFrame, int]:
    """Range scan via the zone map: read only files whose bounds
    intersect [lower, upper], then filter exactly. Returns
    (rows, files_read); the rows are IDENTICAL to the full-scan range
    filter (zero FN), with files_read <= total files (usually <<, on a
    layout clustered by ``col``)."""
    files = zone_prune(index, lower=lower, upper=upper)
    pred = F.lit(True)
    if lower is not None:
        pred = pred & (F.col(col) >= F.lit(lower))
    if upper is not None:
        pred = pred & (F.col(col) <= F.lit(upper))
    if not files:
        empty = spark.read.parquet(input_path).filter(F.lit(False))
        return empty, 0
    # basePath keeps hive-partition columns in the schema of a
    # leaf-file read, so pruned and full scans have identical schemas
    rows = (
        spark.read.option("basePath", input_path).parquet(*files).filter(pred)
    )
    return rows, len(files)


def zone_pruned_read_multi(
    spark: SparkSession,
    input_path: str,
    indexes: dict[str, DataFrame],
    bounds: dict[str, tuple],
) -> tuple[DataFrame, int]:
    """Range scan over SEVERAL indexed columns at once: a file survives
    only if EVERY column's [lo, hi] interval intersects that column's
    predicate — the read path for a z-order layout, where each file is
    a rectangle in the joint space and a conjunctive range predicate
    prunes on every clustered dimension independently. Zero FN composes:
    a row matching all predicates forces its file to survive every
    per-column prune, so the intersection keeps it.

    ``bounds`` maps column -> (lower, upper) (either side None for a
    one-sided predicate); ``indexes`` must hold a zone-map frame per
    bounded column. Returns (rows, files_read) with the exact
    conjunctive predicate re-applied, identical to the full scan."""
    if not bounds:
        raise ValueError("zone_pruned_read_multi needs at least one bounded column")
    missing = [c for c in bounds if c not in indexes]
    if missing:
        raise ValueError(f"no zone-map index for bounded column(s) {missing}")
    survivors: set[str] | None = None
    for c, (lower, upper) in bounds.items():
        files = set(zone_prune(indexes[c], lower=lower, upper=upper))
        survivors = files if survivors is None else survivors & files
    pred = F.lit(True)
    for c, (lower, upper) in bounds.items():
        if lower is not None:
            pred = pred & (F.col(c) >= F.lit(lower))
        if upper is not None:
            pred = pred & (F.col(c) <= F.lit(upper))
    if not survivors:
        empty = spark.read.parquet(input_path).filter(F.lit(False))
        return empty, 0
    rows = (
        spark.read.option("basePath", input_path)
        .parquet(*sorted(survivors))
        .filter(pred)
    )
    return rows, len(survivors)


def _part_files(input_path: str) -> list[str]:
    """Parquet part files under a table path: a single file, a flat
    directory, or a hive-partitioned tree (recursive — the layout
    q_partitioned_scan writes must be discoverable too). Sorted for
    deterministic task assignment."""
    import glob as _glob
    import os

    root = input_path[len("file:") :] if input_path.startswith("file:") else input_path
    if os.path.isfile(root):
        return [root]
    return sorted(
        set(_glob.glob(os.path.join(root, "**", "*.parquet"), recursive=True))
    )


def zone_index_from_footers(
    spark: SparkSession,
    input_path: str,
    *,
    col: str,
    files: list[str] | None = None,
) -> DataFrame:
    """Build the SAME (file, lo, hi, n_nulls, n_rows) index as
    ``zone_map_index`` from parquet FOOTER statistics only — no data
    scan. At 100 TB this is the difference between a corpus-priced
    index build and a seconds-priced one: each task opens only its
    files' footers (KB-sized) and folds row-group min/max/null-count
    stats; the data pages are never touched. Parquet writers (Spark,
    pyarrow) store exact statistics for numeric columns, so the result
    is row-for-row identical to the scan-built index (pytest-pinned).

    Distribution: file paths are parallelized into a small frame and
    footers are read inside ``mapInPandas`` — driver never opens a
    footer, so millions of files spread across the cluster.

    Restrictions (fail loud, never silently wrong):
    - numeric/temporal physical types only: parquet may TRUNCATE
      binary/string min-max stats, which would break the zero-false-
      negative pruning contract -> NotImplementedError;
    - a row group with values but no statistics raises ValueError
      (an index silently missing a file's bounds would un-prune
      nothing but missing BOUNDS would prune wrongly).

    All-NULL files yield lo = hi = NULL, matching zone_map_index (such
    files never match a range predicate and are always pruned).
    """
    if files is None:
        files = _part_files(input_path)
    if not files:
        raise ValueError(f"no parquet part files found under {input_path!r}")

    schema = spark.read.parquet(*files[:1]).schema
    if col not in schema.names:
        raise ValueError(f"column {col!r} not found in {files[0]!r}")
    sample_type = schema[col].dataType
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    out_schema = StructType(
        [
            StructField("file", StringType()),
            StructField("lo", sample_type),
            StructField("hi", sample_type),
            StructField("n_nulls", LongType()),
            StructField("n_rows", LongType()),
        ]
    )

    paths = spark.createDataFrame([(p,) for p in files], "path string").repartition(
        min(len(files), 64)
    )

    _ALLOWED = {"INT32", "INT64", "FLOAT", "DOUBLE", "INT96"}

    def read_footers(batches):
        import pandas as pd
        import pyarrow.parquet as pq
        from pathlib import Path

        for pdf in batches:
            rows = []
            for p in pdf["path"]:
                local = p[len("file:") :] if str(p).startswith("file:") else str(p)
                md = pq.ParquetFile(local).metadata
                col_idx = next(
                    (i for i in range(md.num_columns) if md.schema.column(i).name == col),
                    None,
                )
                if col_idx is None:
                    raise ValueError(f"column {col!r} not found in {p}")
                phys = md.schema.column(col_idx).physical_type
                if phys not in _ALLOWED:
                    raise NotImplementedError(
                        f"footer stats for physical type {phys} (column {col!r}) may "
                        "be truncated; build this index with zone_map_index instead"
                    )
                lo = hi = None
                nulls = 0
                for rg in range(md.num_row_groups):
                    c = md.row_group(rg).column(col_idx)
                    st = c.statistics
                    if st is None or not st.has_null_count:
                        raise ValueError(f"row group {rg} of {p} has no statistics")
                    nulls += st.null_count
                    if st.num_values == 0:
                        continue  # all-NULL chunk: no bounds to fold
                    if not st.has_min_max:
                        raise ValueError(
                            f"row group {rg} of {p} has values but no min/max stats"
                        )
                    lo = st.min if lo is None else min(lo, st.min)
                    hi = st.max if hi is None else max(hi, st.max)
                rows.append(
                    (Path(local).resolve().as_uri(), lo, hi, nulls, md.num_rows)
                )
            yield pd.DataFrame(
                rows, columns=["file", "lo", "hi", "n_nulls", "n_rows"]
            )

    return paths.mapInPandas(read_footers, schema=out_schema)


def storage_profile(
    spark: SparkSession,
    input_path: str,
    *,
    files: list[str] | None = None,
) -> DataFrame:
    """Per-COLUMN storage profile from parquet footers only — the
    table-bloat report ("which column eats the bytes, and does its
    encoding earn its keep"): for every leaf column, chunk count,
    compressed and uncompressed byte totals, and value count, summed
    over all row groups of all files. The input to every
    drop-a-column / recode / re-sort-for-compression decision, priced
    in footer reads (KB per file — the zone_index_from_footers
    economics; data pages never touched).

    Distribution: file paths parallelized, footers read inside
    ``mapInPandas``, one |columns|-bounded aggregate after — the
    driver opens no footer. DuckDB's ``parquet_metadata()`` reads the
    identical footer fields, which is what makes the driver contract
    hash-matchable.
    """
    if files is None:
        files = _part_files(input_path)
    if not files:
        raise ValueError(f"no parquet part files found under {input_path!r}")

    paths = spark.createDataFrame([(p,) for p in files], "path string").repartition(
        min(len(files), 64)
    )

    def read_footers(batches):
        import pandas as pd
        import pyarrow.parquet as pq

        for pdf in batches:
            rows = []
            for p in pdf["path"]:
                local = p[len("file:") :] if str(p).startswith("file:") else str(p)
                md = pq.ParquetFile(local).metadata
                for rg in range(md.num_row_groups):
                    g = md.row_group(rg)
                    for ci in range(g.num_columns):
                        c = g.column(ci)
                        rows.append(
                            (
                                c.path_in_schema,
                                c.total_compressed_size,
                                c.total_uncompressed_size,
                                c.num_values,
                            )
                        )
            if rows:
                yield pd.DataFrame(
                    rows, columns=["column_name", "comp", "uncomp", "nvals"]
                )

    chunks = paths.mapInPandas(
        read_footers,
        schema="column_name string, comp long, uncomp long, nvals long",
    )
    return chunks.groupBy("column_name").agg(
        F.count("*").alias("n_chunks"),
        F.sum("comp").alias("compressed_bytes"),
        F.sum("uncomp").alias("uncompressed_bytes"),
        F.sum("nvals").alias("n_values"),
        F.round(
            F.try_divide(F.sum("uncomp"), F.sum("comp")), 4
        ).alias("compression_ratio"),
    )
