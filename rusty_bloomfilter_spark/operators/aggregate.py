"""Distributed sketch aggregation: the tree-merge topology.

PySpark has no vectorized custom-Aggregator API, so the idiomatic (and
north-rule-mandated explicit) substitute is:

    stage 1  mapInPandas      one sketch row per *input partition*
                              (map-side combine: row data never
                              shuffles — only O(sketch_bytes) rows do)
    stage 2  repartition(fanout) + mapInPandas     partial OR-merge
    stage 3  repartition(1)   + mapInPandas        final merge

This is exactly ``RDD.treeAggregate(depth=2)`` expressed in DataFrame
form (semantics pinned by the reference's merge matrices,
/root/reference/src/bloomfilter/mod.rs:621-761: merges are associative
and commutative, so any tree shape yields the same bytes).

Scale notes (1000-executor / 100 TB framing):
- Stage 1 scans row data once, in place — zero row shuffle. The only
  shuffled bytes are P sketch payloads (P = input partitions), each
  O(m/8). At P=100k partitions and a 16 MB filter that is ~1.6 TB of
  payloads in the worst case — which is why fanout is a tree, not a
  single reducer: each stage-2 task merges P/fanout payloads, and the
  final task merges only `fanout` of them.
- Keyed builds (``build_by_key``) shuffle one sketch row per
  (partition, key): the classic partial-agg pattern. A skewed key
  (hot `source`) therefore costs nothing extra at stage 1 — its rows
  are already spread across partitions — and its merge fan-in is
  bounded by the partition count, optionally salted down further.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SKETCH_SCHEMA = "payload binary, n_items bigint"
KEYED_SKETCH_SCHEMA = "key string, payload binary, n_items bigint"

# An adapter is (make_empty, update(acc, batch) -> None, payload merge
# fn). `update` receives a *pyarrow RecordBatch*: list columns flatten
# zero-copy (ListArray.values), roughly 2x cheaper end-to-end than the
# pandas conversion for ragged token arrays (measured local[32]).
UpdateFn = Callable[[Any, pa.RecordBatch], None]
MergePayloadsFn = Callable[[list[bytes]], bytes]


def partition_sketches(
    df: DataFrame,
    make_empty: Callable[[], Any],
    update: UpdateFn,
    *,
    columns: list[str] | None = None,
) -> DataFrame:
    """Stage 1: fold every Arrow batch of each partition into one local
    sketch; emit one (payload, n_items) row per partition. Column-prunes
    before the UDF so the parquet scan reads only what the sketch needs.
    """
    if columns:
        df = df.select(*columns)

    def build(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        acc = make_empty()
        for batch in batches:
            update(acc, batch)
        yield pa.RecordBatch.from_pydict(
            {"payload": [acc.to_bytes()], "n_items": [acc.n_items]}
        )

    return df.mapInArrow(build, schema=SKETCH_SCHEMA)


def tree_merge(
    sketch_df: DataFrame,
    merge_payloads: MergePayloadsFn,
    *,
    fanout: int = 16,
    empty_payload: bytes | None = None,
) -> DataFrame:
    """Stages 2+3: depth-2 tree reduction over sketch rows. Returns a
    single-row DataFrame (payload, n_items). ``empty_payload`` (the
    sketch identity) is emitted when the input has no rows at all."""

    def merge_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        payloads: list[bytes] = []
        n_items = 0
        for pdf in batches:
            payloads.extend(bytes(p) for p in pdf["payload"])
            n_items += int(pdf["n_items"].sum())
        if payloads:
            yield pd.DataFrame({"payload": [merge_payloads(payloads)], "n_items": [n_items]})

    def merge_final(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        payloads: list[bytes] = []
        n_items = 0
        for pdf in batches:
            payloads.extend(bytes(p) for p in pdf["payload"])
            n_items += int(pdf["n_items"].sum())
        if not payloads and empty_payload is not None:
            yield pd.DataFrame({"payload": [empty_payload], "n_items": [0]})
        elif payloads:
            yield pd.DataFrame({"payload": [merge_payloads(payloads)], "n_items": [n_items]})

    level1 = sketch_df.repartition(fanout).mapInPandas(merge_partition, schema=SKETCH_SCHEMA)
    return level1.repartition(1).mapInPandas(merge_final, schema=SKETCH_SCHEMA)


def build_sketch(
    df: DataFrame,
    make_empty: Callable[[], Any],
    update: UpdateFn,
    merge_payloads: MergePayloadsFn,
    *,
    columns: list[str] | None = None,
    fanout: int = 16,
) -> DataFrame:
    """Full pipeline: partition build -> tree merge -> single sketch row."""
    return tree_merge(
        partition_sketches(df, make_empty, update, columns=columns),
        merge_payloads,
        fanout=fanout,
        empty_payload=make_empty().to_bytes(),
    )


def collect_sketch_bytes(sketch_df: DataFrame) -> tuple[bytes, int]:
    """Driver-side: pull the single merged (payload, n_items) row."""
    rows = sketch_df.collect()
    if not rows:
        raise ValueError("sketch pipeline produced no rows (empty input?)")
    return bytes(rows[0]["payload"]), int(rows[0]["n_items"])


def build_by_key(
    df: DataFrame,
    key_col: str,
    make_empty: Callable[[], Any],
    update: UpdateFn,
    merge_payloads: MergePayloadsFn,
    *,
    columns: list[str] | None = None,
    salt: int = 0,
) -> DataFrame:
    """Per-key sketches with map-side combine.

    Stage 1 (mapInPandas) folds each partition's rows into one sketch
    *per key present in the partition* — the hot key's row data never
    concentrates. Stage 2 groupBy(key) merges the tiny sketch rows.
    ``salt > 0`` adds an intermediate merge level: groupBy(key, salt)
    first, bounding any single task's fan-in to partitions/salt — use
    when the partition count is huge (the north rule's explicit skew
    handling).
    """
    cols = columns or df.columns
    if key_col not in cols:
        cols = [key_col, *cols]
    df = df.select(*cols)

    def build(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import numpy as np

        accs: dict[str, Any] = {}
        for batch in batches:
            keys = batch.column(key_col).to_numpy(zero_copy_only=False)
            for key in np.unique(keys):
                acc = accs.get(key)
                if acc is None:
                    acc = accs[key] = make_empty()
                update(acc, batch.filter(pa.array(keys == key)))
        if accs:
            yield pa.RecordBatch.from_pydict(
                {
                    "key": [str(k) for k in accs],
                    "payload": [a.to_bytes() for a in accs.values()],
                    "n_items": [a.n_items for a in accs.values()],
                }
            )

    partial = df.mapInArrow(build, schema=KEYED_SKETCH_SCHEMA)

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        merged = merge_payloads([bytes(p) for p in pdf["payload"]])
        return pd.DataFrame(
            {
                "key": [pdf["key"].iloc[0]],
                "payload": [merged],
                "n_items": [int(pdf["n_items"].sum())],
            }
        )

    if salt > 0:
        salted = partial.withColumn("_salt", F.pmod(F.xxhash64(F.col("payload")), F.lit(salt)))

        def merge_salted(pdf: pd.DataFrame) -> pd.DataFrame:
            return merge_group(pdf)

        level1 = salted.groupBy("key", "_salt").applyInPandas(merge_salted, KEYED_SKETCH_SCHEMA)
        return level1.groupBy("key").applyInPandas(merge_group, KEYED_SKETCH_SCHEMA)
    return partial.groupBy("key").applyInPandas(merge_group, KEYED_SKETCH_SCHEMA)
