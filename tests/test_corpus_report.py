"""Corpus health report job: section assembly, gate logic, and the
spark-submit CLI wrapper (importable build_report)."""

import pytest


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "a perfectly ordinary sentence about the weather today.", "en", "clean", 55),
        (2, "another normal document with some words in it for testing.", "en", "clean", 59),
        (3, "buy now " * 400, "en", "spammy", 3200),
        (4, "spam spam spam spam " * 300, "en", "spammy", 6000),
    ]
    return spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )


def test_report_sections_and_gates(spark, docs):
    from jobs.corpus_report import build_report

    rep = build_report(
        spark,
        docs,
        vocab_size=10_000,
        max_oov_rate=1.0,
        min_mean_ratio=0.15,
        max_frac_repetitive=0.5,
    )
    assert rep["card"]["n_docs"] == 4 and rep["card"]["n_sources"] == 2
    assert set(rep["sources"]) == {"clean", "spammy"}
    for src, entry in rep["sources"].items():
        assert {"compress", "oov", "pareto"} <= set(entry)
        assert entry["pareto"]["n_docs"] == 2
    # the spammy source is wall-to-wall repetitive: its gate fails
    by = {(g["source"], g["gate"]): g for g in rep["gates"]}
    assert not by[("spammy", "max_frac_repetitive")]["passed"]
    assert by[("clean", "max_frac_repetitive")]["passed"]
    assert rep["all_passed"] is False
    # JSON-serializable end to end (the artifact contract)
    import json

    json.dumps(rep, default=str)


def test_report_no_gates_passes(spark, docs):
    from jobs.corpus_report import build_report

    rep = build_report(spark, docs)
    assert rep["gates"] == [] and rep["all_passed"] is True
