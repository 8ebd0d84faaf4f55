#!/usr/bin/env python
"""Corpus health report job (spark-submit entry point).

    spark-submit --py-files dist/rusty_bloomfilter_spark.zip \
        jobs/corpus_report.py \
        --input /data/documents.parquet \
        [--vocab-size 50000] [--max-oov-rate 0.2] \
        [--min-mean-ratio 0.2] [--max-frac-repetitive 0.2] \
        [--out /artifacts/corpus_report.json]

The one-stop curation DIAGNOSTIC artifact, complementing
jobs/validate_table.py's pass/fail constraint gate: where validate
answers "may downstream read this snapshot", this answers "what is in
it and which sources need attention BEFORE it becomes training data".
One JSON document with four sections, each backed by a
contract-verified operator:

- ``card``      — the one-row datasheet (operators/datacard.py)
- ``sources``   — per-source compressibility profile (zlib
  repetition/entropy tails, operators/quality.py) merged with the
  OOV-rate tokenizer-fit audit (operators/vocab.py) and the Pareto
  token-mass concentration (operators/datacard.py)
- ``gates``     — optional thresholds evaluated per source; the exit
  code is 0 iff every gated source passes (same contract as
  validate_table: wire it between "snapshot landed" and "mix into
  training data")

Execution cost: the card and each per-source profile are one corpus
scan each (the operators are single-pass by design); nothing here
collects row-level data — every frame brought to the driver is
|sources|-bounded.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def build_report(
    spark,
    docs,
    *,
    vocab_size: int = 50_000,
    max_oov_rate: float | None = None,
    min_mean_ratio: float | None = None,
    max_frac_repetitive: float | None = None,
) -> dict:
    """Assemble the report dict from a documents DataFrame (doc_id,
    text, lang, source, n_chars). Importable for tests; main() wraps
    it for spark-submit."""
    from pyspark.sql import functions as F

    from rusty_bloomfilter_spark.functions.text import tokenize_md5
    from rusty_bloomfilter_spark.operators.datacard import (
        dataset_card,
        pareto_coverage,
    )
    from rusty_bloomfilter_spark.operators.quality import compressibility_profile
    from rusty_bloomfilter_spark.operators.vocab import oov_rate

    card = dataset_card(docs).collect()[0].asDict()

    comp = {
        r["source"]: r.asDict()
        for r in compressibility_profile(docs, "source", "text").collect()
    }
    toks = tokenize_md5(F.col("text"))
    seq = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        toks.alias("tokens"),
        F.col("source"),
    )
    oov = {
        r["source"]: r.asDict()
        for r in oov_rate(seq, vocab_size=vocab_size).collect()
    }
    par = {
        r["source"]: r.asDict()
        for r in pareto_coverage(
            seq.withColumn("n_tok", F.size("tokens"))
        ).collect()
    }

    sources = {}
    for src in sorted(set(comp) | set(oov) | set(par)):
        entry: dict = {}
        for section, d in (("compress", comp), ("oov", oov), ("pareto", par)):
            row = d.get(src, {})
            entry[section] = {k: v for k, v in row.items() if k != "source"}
        sources[src] = entry

    gates = []
    for src, entry in sources.items():
        if max_oov_rate is not None:
            rate = entry["oov"].get("oov_rate")
            gates.append(
                {
                    "source": src,
                    "gate": "max_oov_rate",
                    "value": rate,
                    "limit": max_oov_rate,
                    "passed": rate is not None and rate <= max_oov_rate,
                }
            )
        if min_mean_ratio is not None:
            mr = entry["compress"].get("mean_ratio")
            gates.append(
                {
                    "source": src,
                    "gate": "min_mean_ratio",
                    "value": mr,
                    "limit": min_mean_ratio,
                    "passed": mr is not None and mr >= min_mean_ratio,
                }
            )
        if max_frac_repetitive is not None:
            fr = entry["compress"].get("frac_repetitive")
            gates.append(
                {
                    "source": src,
                    "gate": "max_frac_repetitive",
                    "value": fr,
                    "limit": max_frac_repetitive,
                    # a source with NO scored docs has no evidence either
                    # way: fail loud rather than silently pass
                    "passed": fr is not None and fr <= max_frac_repetitive,
                }
            )
    return {
        "card": card,
        "sources": sources,
        "gates": gates,
        "all_passed": all(g["passed"] for g in gates),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="documents parquet path")
    ap.add_argument("--vocab-size", type=int, default=50_000)
    ap.add_argument("--max-oov-rate", type=float, default=None)
    ap.add_argument("--min-mean-ratio", type=float, default=None)
    ap.add_argument("--max-frac-repetitive", type=float, default=None)
    ap.add_argument("--out", default=None, help="write JSON here (default: stdout)")
    ap.add_argument("--cpus", type=int, default=0, help="local[N] when no master set")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    builder = SparkSession.builder.appName("rusty_bloomfilter_spark-corpus-report")
    if args.cpus:
        builder = builder.master(f"local[{args.cpus}]")
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    report = build_report(
        spark,
        spark.read.parquet(args.input),
        vocab_size=args.vocab_size,
        max_oov_rate=args.max_oov_rate,
        min_mean_ratio=args.min_mean_ratio,
        max_frac_repetitive=args.max_frac_repetitive,
    )
    text = json.dumps(report, indent=2, default=str)
    if args.out:
        Path(args.out).write_text(text)
    else:
        print(text)
    raise SystemExit(0 if report["all_passed"] else 1)


if __name__ == "__main__":
    main()
