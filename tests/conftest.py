import numpy as np
import pytest


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .appName("rusty_bloomfilter_spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sequences_pdf():
    """Deterministic local sequences table (pandas) — the numpy oracle
    side of Spark-vs-oracle bitwise comparisons."""
    rng = np.random.default_rng(42)
    n = 2000
    lengths = rng.integers(8, 128, size=n)
    rows = {
        "doc_id": [f"doc-{i:012d}" for i in range(n)],
        "tokens": [rng.integers(0, 50257, size=ln, dtype=np.int32) for ln in lengths],
        "n_tok": lengths.astype(np.int32),
        "source": rng.choice(
            ["cc", "github", "wiki", "books", "arxiv"], size=n, p=[0.62, 0.18, 0.10, 0.06, 0.04]
        ),
    }
    import pandas as pd

    return pd.DataFrame(rows)
