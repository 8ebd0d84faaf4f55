"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship per-source token-profile plan on
/root/testdata/sf0.001. ``queries()`` exposes every implemented
operator from SURVEY.md §2; ``oracle_sql()`` gives the DuckDB oracle
for each exact-answer query (sketch estimates are registered without
an oracle -> rows-only check, as the contract allows).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from rusty_bloomfilter_spark.plans import token_profile  # noqa: E402
from rusty_bloomfilter_spark.sources import sequences_from_documents  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: per-source Bloom+HLL token profile of the sf0.001
    documents corpus (tokenized JVM-side into the sequences shape)."""
    seq = sequences_from_documents(spark, "/root/testdata/sf0.001")
    return token_profile(spark, seq)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from rusty_bloomfilter_spark import contract

    return contract.queries()


def oracle_sql() -> dict[str, str]:
    from rusty_bloomfilter_spark import contract

    return contract.oracle_sql()
