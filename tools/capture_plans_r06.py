#!/usr/bin/env python
"""Capture .explain("formatted") for the round-6 optimization targets.

Usage: python tools/capture_plans_r06.py <outdir> <suffix> [query ...]
e.g.   python tools/capture_plans_r06.py plans/r06 before
Writes <outdir>/<query>_<suffix>.txt. Spark 4.1: explainString via
_jdf is gone — capture explain() stdout (CLAUDE.md).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    outdir = Path(sys.argv[1])
    suffix = sys.argv[2]
    only = set(sys.argv[3:])
    outdir.mkdir(parents=True, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from bench_extra import build_spark

    spark = build_spark(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")

    from rusty_bloomfilter_spark import contract
    from rusty_bloomfilter_spark.operators.dedup import minhash_dedup
    from rusty_bloomfilter_spark.operators.similarity import ann_bruteforce_topk
    from rusty_bloomfilter_spark.plans import token_profile
    from rusty_bloomfilter_spark.sources import load_table, sequences_from_documents

    qmap = contract.queries()
    embeddings = load_table(spark, sf_dir, "embeddings")
    seq = sequences_from_documents(spark, sf_dir)

    targets = {
        "q_minhash_dedup": lambda: minhash_dedup(seq, threshold=0.35),
        "q_ann_bruteforce": lambda: ann_bruteforce_topk(
            embeddings, [0, 7, 42, 99, 123], k=5
        ),
        "q_token_profile": lambda: token_profile(spark, seq),
        "q_heavy_tokens_exact": lambda: qmap["q_heavy_tokens_exact"](spark, sf_dir),
        "q_pricing_summary": lambda: qmap["q_pricing_summary"](spark, sf_dir),
        "q_top_customers": lambda: qmap["q_top_customers"](spark, sf_dir),
    }
    for name, mk in targets.items():
        if only and name not in only:
            continue
        df = mk()
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        (outdir / f"{name}_{suffix}.txt").write_text(buf.getvalue())
        print(f"wrote {outdir}/{name}_{suffix}.txt", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
