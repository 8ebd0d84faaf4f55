"""Direct-scan sketch builds: Spark schedules files, pyarrow reads them.

Alternative to the standard pipeline (JVM parquet scan -> Arrow ->
python worker): distribute the FILE LIST as a tiny DataFrame and let
each task read its files with pyarrow inside mapInArrow. Spark still
owns scheduling, retries, and the merge tree; the scan bytes skip the
JVM.

Measured honestly on this host (warm, back-to-back at local[8]): the
STANDARD path wins (~10.9 vs ~7.4 M tokens/s) — Spark's vectorized
parquet reader + Arrow hop is efficient, and pyarrow's own read path
doesn't beat it per-core once its internal thread pool is contended.
Keep this variant for the cases it's genuinely for:

- object-store reads where the python worker can stream s3:// via
  fsspec and the JVM round-trip adds real latency,
- file-granular custom formats the JVM reader can't project,
- one-task-per-file builds whose outputs feed the file-level
  checkpoint/lineage table directly (same unit as resume).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from .aggregate import MergePayloadsFn, tree_merge

FILE_SKETCH_SCHEMA = "file string, payload binary, n_items bigint, n_rows bigint"

# update fn over a pyarrow RecordBatch (same signature as aggregate.py)
UpdateFn = Callable[[Any, "pa.RecordBatch"], None]


def list_parquet_files(spark: SparkSession, input_path: str) -> list[str]:
    return sorted(p.removeprefix("file:") for p in spark.read.parquet(input_path).inputFiles())


def file_sketches_direct(
    spark: SparkSession,
    files: list[str],
    make_empty: Callable[[], Any],
    update: UpdateFn,
    *,
    columns: list[str],
    tasks: int | None = None,
    batch_rows: int = 65536,
) -> DataFrame:
    """One sketch row per file, built by direct pyarrow reads."""
    tasks = tasks or min(len(files), spark.sparkContext.defaultParallelism * 2) or 1
    file_df = spark.createDataFrame([(f,) for f in files], "file string").repartition(tasks)

    def build(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        import pyarrow as pa
        import pyarrow.parquet as pq

        out_files: list[str] = []
        payloads: list[bytes] = []
        n_items: list[int] = []
        n_rows: list[int] = []
        for fbatch in batches:
            for path in fbatch.column("file").to_pylist():
                acc = make_empty()
                rows = 0
                table = pq.read_table(path, columns=columns)
                for rb in table.to_batches(max_chunksize=batch_rows):
                    update(acc, rb)
                    rows += rb.num_rows
                out_files.append(path)
                payloads.append(acc.to_bytes())
                n_items.append(acc.n_items)
                n_rows.append(rows)
        if out_files:
            yield pa.RecordBatch.from_pydict(
                {
                    "file": out_files,
                    "payload": payloads,
                    "n_items": n_items,
                    "n_rows": n_rows,
                }
            )

    return file_df.mapInArrow(build, schema=FILE_SKETCH_SCHEMA)


def build_sketch_direct(
    spark: SparkSession,
    input_path: str,
    make_empty: Callable[[], Any],
    update: UpdateFn,
    merge_payloads: MergePayloadsFn,
    *,
    columns: list[str],
    fanout: int = 16,
    tasks: int | None = None,
) -> tuple[bytes, int]:
    """Full direct-scan pipeline: file list -> per-file sketches
    (pyarrow reads in workers) -> tree merge -> (payload, n_items)."""
    files = list_parquet_files(spark, input_path)
    sketches = file_sketches_direct(
        spark, files, make_empty, update, columns=columns, tasks=tasks
    )
    merged = tree_merge(
        sketches.select("payload", "n_items"),
        merge_payloads,
        fanout=fanout,
        empty_payload=make_empty().to_bytes(),
    ).collect()
    return bytes(merged[0]["payload"]), int(merged[0]["n_items"])
