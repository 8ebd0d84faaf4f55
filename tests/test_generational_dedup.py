"""Generational (recency-scoped) streaming Bloom dedup."""

import datetime as dt
import glob
import os
import shutil
import time

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from rusty_bloomfilter_spark.streaming import streaming_bloom_dedup_generational

DAY = 86400


def _replay(spark, tmp_path, name, batches, **kw):
    """Replay pandas frames as ordered micro-batches; return emitted pdf."""
    src_dir = str(tmp_path / f"{name}_src")
    os.makedirs(src_dir, exist_ok=True)
    schema = "ts timestamp, fp string"
    for i, part in enumerate(batches):
        spark.createDataFrame(part, schema).coalesce(1).write.parquet(
            str(tmp_path / f"{name}_part{i}")
        )
        (f,) = glob.glob(str(tmp_path / f"{name}_part{i}" / "part-*.parquet"))
        shutil.copy(f, os.path.join(src_dir, f"batch_{i}.parquet"))
        time.sleep(1.1)  # order file mtimes => micro-batch order
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    out = streaming_bloom_dedup_generational(stream, fp_col="fp", **kw)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    return spark.table(name).toPandas()


def test_generational_emission_schedule(spark, tmp_path):
    """Hand-computed ring rotation: G=2 (keep 4), daily in-order batches.

    A occurs every day 0..9 -> emitted at days 0, 4, 8 (slot pruned
    once newest >= slot + 2G windows). B at days 0 and 3 -> the day-3
    copy still probes the retained day-0 slot (suppressed). C at days
    0 and 5 -> slot pruned, re-admitted."""
    base = dt.datetime(2024, 5, 1)
    days = {
        "A": list(range(10)),
        "B": [0, 3],
        "C": [0, 5],
    }
    rows = [(base + dt.timedelta(days=d), fp) for fp, ds in days.items() for d in ds]
    # plus an exact within-batch duplicate of A on day 0
    rows.append((base + dt.timedelta(hours=1), "A"))
    pdf = pd.DataFrame(rows, columns=["ts", "fp"]).sort_values("ts")
    batches = [pdf[pdf.ts.dt.day == base.day + d] for d in range(10)]
    emitted = _replay(
        spark, tmp_path, "gen_sched", [b for b in batches if len(b)],
        window="1 day", generations=2, n_per_gen=100, p=1e-8, n_shards=1,
    )
    got = {
        fp: sorted((g - base).days for g in grp["gen"])
        for fp, grp in emitted.groupby("fp")
    }
    assert got == {"A": [0, 4, 8], "B": [0], "C": [0, 5]}


def test_generational_late_row_clamped(spark, tmp_path):
    """A late row beyond the acceptance floor is clamped UP (recorded
    and emitted at the floor generation), then suppresses re-posts."""
    base = dt.datetime(2024, 5, 1)
    b1 = pd.DataFrame(
        [(base + dt.timedelta(days=5), "X"), (base, "L")], columns=["ts", "fp"]
    )  # one batch spanning days 0..5: L is 5 windows late vs newest
    b2 = pd.DataFrame([(base + dt.timedelta(days=5, hours=2), "L")],
                      columns=["ts", "fp"])  # probes the clamped slot
    b3 = pd.DataFrame([(base + dt.timedelta(days=9), "L")],
                      columns=["ts", "fp"])  # slot 4 pruned by then
    emitted = _replay(
        spark, tmp_path, "gen_late", [b1, b2, b3],
        window="1 day", generations=2, n_per_gen=100, p=1e-8, n_shards=1,
    )
    got = {
        fp: sorted((g - base).days for g in grp["gen"])
        for fp, grp in emitted.groupby("fp")
    }
    # L's day-0 row clamps to the acceptance floor (newest - (G-1) = day 4)
    assert got == {"X": [5], "L": [4, 9]}


def test_generational_matches_greedy_oracle(spark, tmp_path):
    """Random recurrence, in-order daily batches, 4 shards: emissions
    must equal a per-shard greedy simulation of the documented slot
    semantics exactly (p=1e-8 -> no FP suppression expected)."""
    base = dt.datetime(2024, 5, 1)
    rng = np.random.default_rng(11)
    fps = [f"k-{i:04d}" for i in range(200)]
    n_days, G = 20, 3
    rows = []
    for d in range(n_days):
        for fp in rng.choice(fps, size=60, replace=False):
            rows.append((base + dt.timedelta(days=d, hours=int(rng.integers(0, 24))), fp))
    pdf = pd.DataFrame(rows, columns=["ts", "fp"]).sort_values("ts")
    batches = [g for _, g in pdf.groupby(pdf.ts.dt.floor("D")) if len(g)]
    emitted = _replay(
        spark, tmp_path, "gen_oracle", batches,
        window="1 day", generations=G, n_per_gen=500, p=1e-8, n_shards=4,
    )
    # shard routing exactly as the operator computes it
    shard_rows = (
        spark.createDataFrame(pd.DataFrame({"fp": fps}))
        .select("fp", F.pmod(F.xxhash64(F.xxhash64("fp")), F.lit(4)).alias("s"))
        .collect()
    )
    shard = {r["fp"]: r["s"] for r in shard_rows}

    keep = 2 * G
    state: dict[int, dict[int, set]] = {s: {} for s in range(4)}
    newest: dict[int, int | None] = {s: None for s in range(4)}
    want = set()
    for b in batches:
        per_shard: dict[int, pd.DataFrame] = {}
        for s in range(4):
            sel = b[[shard[f] == s for f in b.fp]]
            if len(sel):
                per_shard[s] = sel
        for s, sb in per_shard.items():
            gens = (sb.ts.astype("int64") // 1_000_000_000 // DAY * DAY).to_numpy()
            nw = int(gens.max())
            newest[s] = nw if newest[s] is None else max(newest[s], nw)
            floor_keep = newest[s] - (keep - 1) * DAY
            state[s] = {g: v for g, v in state[s].items() if g >= floor_keep}
            floor_accept = newest[s] - (G - 1) * DAY
            gens = np.maximum(gens, floor_accept)
            seen_in_batch = set()
            for fp, g in zip(sb.fp.to_numpy(), gens):
                if fp in seen_in_batch:
                    continue
                seen_in_batch.add(fp)
                if any(fp in v for v in state[s].values()):
                    continue
                state[s].setdefault(int(g), set()).add(fp)
                want.add((fp, int(g)))
    got = {
        (r.fp, int(pd.Timestamp(r.gen).timestamp())) for r in emitted.itertuples()
    }
    assert got == want
    # invariant: consecutive emissions per fp are > (G+1) windows apart
    em = emitted.sort_values(["fp", "gen"])
    gaps = em.groupby("fp")["gen"].diff().dropna()
    assert (gaps >= pd.Timedelta(days=G + 1)).all()


def test_generational_guards(spark):
    df = spark.createDataFrame([], "ts timestamp, fp string")
    with pytest.raises(ValueError):
        streaming_bloom_dedup_generational(
            df, fp_col="fp", n_per_gen=10, n_shards=0
        )
    with pytest.raises(ValueError):
        streaming_bloom_dedup_generational(
            df, fp_col="fp", n_per_gen=10, generations=0
        )


def test_generational_null_hygiene(spark, tmp_path):
    """NULL ts (NaT sentinel generation) and NULL fp (key-0 probe,
    'None' emission) rows are dropped, not folded in."""
    base = dt.datetime(2024, 5, 1)
    b = pd.DataFrame(
        [(base, "A"), (pd.NaT, "B"), (base, None)], columns=["ts", "fp"]
    )
    emitted = _replay(
        spark, tmp_path, "gen_nulls", [b],
        window="1 day", generations=2, n_per_gen=10, p=1e-8, n_shards=1,
    )
    assert list(emitted["fp"]) == ["A"]
    assert (emitted["gen"] == base).all()


def test_generational_suppressed_batch_still_advances_horizon(spark, tmp_path):
    """Round-4 review scenario: a batch whose rows are ALL suppressed
    (nothing recorded) must still advance the persisted horizon —
    reconstructing newest from max(gens) would accept a later late row
    above the true floor and break the (G+1)-window re-emission
    guarantee."""
    base = dt.datetime(2024, 5, 1)

    def at(day, fp):
        return (base + dt.timedelta(days=day), fp)

    b1 = pd.DataFrame([at(10, "X")], columns=["ts", "fp"])
    b2 = pd.DataFrame([at(13, "Y")], columns=["ts", "fp"])
    b3 = pd.DataFrame([at(14, "Y")], columns=["ts", "fp"])  # suppressed only
    b4 = pd.DataFrame([at(11, "X")], columns=["ts", "fp"])  # late re-post
    emitted = _replay(
        spark, tmp_path, "gen_horizon", [b1, b2, b3, b4],
        window="1 day", generations=2, n_per_gen=50, p=1e-8, n_shards=1,
    )
    got = {
        fp: sorted((g - base).days for g in grp["gen"])
        for fp, grp in emitted.groupby("fp")
    }
    # with the persisted horizon (newest=14), X's late day-11 row clamps
    # to day 13 -> gap 3 = G+1 (the guarantee); a max(gens)=13 horizon
    # would clamp to day 12 and violate it
    assert got == {"X": [10, 13], "Y": [13]}
    gaps = (
        emitted.sort_values(["fp", "gen"]).groupby("fp")["gen"].diff().dropna()
    )
    assert (gaps >= pd.Timedelta(days=3)).all()
