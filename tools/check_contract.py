#!/usr/bin/env python
"""Local mirror of the round driver's correctness gate.

Runs every `__spark_entry__.queries()` entry at sf0.01 via Spark AND its
`oracle_sql()` (if present) via DuckDB on the same parquet tables, then
compares row count + column names + an order-insensitive value hash
(columns sorted by name, rows sorted, values canonicalized).

Usage: python tools/check_contract.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import hashlib
import sys
import time
from pathlib import Path

import duckdb
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(df: pd.DataFrame) -> tuple[int, list[str], str]:
    cols = sorted(df.columns)
    df = df[cols].copy()
    for c in cols:
        s = df[c]
        if s.dtype == object:
            df[c] = s.map(
                lambda v: tuple(v) if isinstance(v, (list, tuple)) or hasattr(v, "tolist") and not isinstance(v, (str, bytes)) else v
            )
        if pd.api.types.is_float_dtype(s):
            df[c] = s.round(6)
    rows = sorted(
        tuple(str(v) for v in row) for row in df.itertuples(index=False, name=None)
    )
    h = hashlib.sha256("\n".join("|".join(r) for r in rows).encode()).hexdigest()[:16]
    return len(df), cols, h


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and "/" in sys.argv[1] else "/root/testdata/sf0.01"
    only = [a for a in sys.argv[1:] if "/" not in a]

    import __spark_entry__ as entry_mod
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("contract-check")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        # NO arrow.pyspark.enabled here: the round driver's session does not
        # set it, and enabling it locally hid the r3 q_sharded_bloom failure
        # (pandas->Spark ndarray inference only works under Arrow conversion).
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    names = only or list(qs)
    failures = 0
    for name in names:
        if name not in qs:
            print(f"{name:<28} MISSING from queries()")
            failures += 1
            continue
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
        except Exception as e:
            print(f"{name:<28} SPARK ERROR: {type(e).__name__}: {str(e)[:200]}")
            failures += 1
            continue
        spark_s = time.time() - t0
        if name not in oracles:
            print(f"{name:<28} rows-only: {len(sdf)} rows  [{spark_s:.1f}s] cols={sorted(sdf.columns)}")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"{name:<28} ORACLE ERROR: {type(e).__name__}: {str(e)[:200]}")
            failures += 1
            continue
        sn, sc, sh = canon(sdf)
        on, oc, oh = canon(odf)
        ok = (sn, sc, sh) == (on, oc, oh)
        status = "OK " if ok else "FAIL"
        print(f"{name:<28} {status} rows {sn}/{on}  hash {sh}/{oh}  [{spark_s:.1f}s]")
        if not ok:
            failures += 1
            if sc != oc:
                print(f"    cols spark={sc} oracle={oc}")
            if sn == on and sc == oc:
                merged = sdf[sorted(sdf.columns)].merge(
                    odf[sorted(odf.columns)], how="outer", indicator=True
                )
                diff = merged[merged["_merge"] != "both"]
                print(diff.head(6).to_string())
    spark.stop()
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
