"""Every contract query must CONSTRUCT AND EXECUTE under a session shaped
like the round driver's — in particular WITHOUT
spark.sql.execution.arrow.pyspark.enabled (the driver never sets it).

Round-3 regression this guards: q_sharded_bloom passed every local gate
(which enabled Arrow) but hard-errored in the driver because a
createDataFrame(pd.DataFrame(...)) with numpy-ndarray cells only infers a
schema under Arrow conversion. Environment-sensitive constructors must be
caught BEFORE the driver runs.

Runs at sf0.001 so the whole 65+-query sweep fits the suite budget; this
checks executability (rows materialize, schema stable), not correctness —
tools/check_contract.py at sf0.01 is the value gate.
"""

import pytest

SF_DIR = "/root/testdata/sf0.001"

_ARROW_CONF = "spark.sql.execution.arrow.pyspark.enabled"


@pytest.fixture(scope="module")
def driverlike_spark(spark):
    """The shared session with Arrow conversion OFF (runtime-settable),
    mirroring the round driver; restored afterwards for other modules."""
    prev = spark.conf.get(_ARROW_CONF, None)
    spark.conf.set(_ARROW_CONF, "false")
    yield spark
    if prev is not None:
        spark.conf.set(_ARROW_CONF, prev)


def _all_query_names():
    from rusty_bloomfilter_spark import contract

    return list(contract.queries())


@pytest.mark.parametrize("name", _all_query_names())
def test_query_executes_driverlike(driverlike_spark, name):
    from rusty_bloomfilter_spark import contract

    fn = contract.queries()[name]
    df = fn(driverlike_spark, SF_DIR)
    rows = df.count()
    assert rows >= 0
    assert df.schema.fieldNames(), f"{name}: empty schema"


def test_oracle_names_subset_of_queries():
    from rusty_bloomfilter_spark import contract

    q = set(contract.queries())
    o = set(contract.oracle_sql())
    assert o <= q, f"oracles without queries: {o - q}"


def test_window_ordering_stable():
    """queries() must emit every registered query exactly once, with the
    never/least-verified block first (driver checks only the first 50)."""
    from rusty_bloomfilter_spark import contract

    names = list(contract.queries())
    assert len(names) == len(set(names)) == len(contract._QUERIES)
    first = [n for n in contract._WINDOW_FIRST if n in contract._QUERIES]
    assert names[: len(first)] == first
