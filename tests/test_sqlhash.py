"""Parity tests for the DuckDB-SQL rendering of the sketch hash kernels
(functions/sqlhash.py): the rendered splitmix64 / K-M pair / HLL
(bucket, rank) must be BIT-IDENTICAL to the numpy kernels for random
uint64 inputs, and the rendered CMS table must equal the numpy-built
table cell-for-cell. These are the primitives the fully-oracle-backed
sketch contract queries (q_join_size_est, q_user_novelty_hll,
q_hll_distinct_tokens, q_cms_top_tokens, q_user_distinct_hll) stand on.
"""

import duckdb
import numpy as np
import pandas as pd
import pytest

from rusty_bloomfilter_spark.functions.sqlhash import (
    cms_table_ctes,
    hll_estimate_select,
    hll_rows_ctes,
    sm64_pair_ctes,
)
from rusty_bloomfilter_spark.sketch.cms import CountMinSketch
from rusty_bloomfilter_spark.sketch.hashing import hash_pair
from rusty_bloomfilter_spark.sketch.hll import HyperLogLog, _clz_rank


def _row_sorted(a, b):
    """Stack two columns and sort ROWS (lexsort by (a, b)) — preserves
    pairing, unlike an independent per-column sort."""
    order = np.lexsort((b, a))
    return np.stack([a[order], b[order]], axis=1)


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


def _vals(n=5000, seed=11):
    rng = np.random.default_rng(seed)
    v = rng.integers(0, 2**64, n, dtype=np.uint64)
    # force the boundary cases the binary searches branch on
    v[:4] = [0, 1, 2**63, 2**64 - 1]
    return v


def test_sm64_pair_bit_identical(con):
    v = _vals()
    h1, h2 = hash_pair(v)
    con.register("tv", pd.DataFrame({"x": v}))
    sql = (
        "WITH "
        + sm64_pair_ctes("t", "SELECT CAST(x AS UBIGINT) AS k FROM tv")
        + " SELECT h1, h2 FROM th"
    )
    got = con.execute(sql).fetchdf()
    # Order-insensitive but PAIR-preserving compare: sort whole rows
    # (lexsort), never columns independently — a per-column sort would
    # let a cross-row h1/h2 permutation bug pass (r5 review catch).
    exp = _row_sorted(h1, h2)
    got_arr = _row_sorted(
        got["h1"].to_numpy(dtype=np.uint64), got["h2"].to_numpy(dtype=np.uint64)
    )
    assert np.array_equal(exp, got_arr)


def test_hll_rows_bit_identical(con):
    v = _vals(seed=12)
    p = 14
    h1, _ = hash_pair(v)
    idx = (h1 >> np.uint64(64 - p)).astype(np.int64)
    rank = np.minimum(_clz_rank(h1 << np.uint64(p)), 64 - p + 1)
    con.register("tv2", pd.DataFrame({"x": v}))
    sql = (
        "WITH "
        + hll_rows_ctes("t", "SELECT CAST(x AS UBIGINT) AS k FROM tv2", p)
        + " SELECT idx, rank FROM tr"
    )
    got = con.execute(sql).fetchdf()
    exp = _row_sorted(idx.astype(np.uint64), rank.astype(np.uint64))
    gr = _row_sorted(
        got["idx"].to_numpy(dtype=np.uint64), got["rank"].to_numpy(dtype=np.uint64)
    )
    assert np.array_equal(exp, gr)


def test_hll_estimate_matches_kernel(con):
    v = _vals(n=20000, seed=13)
    sk = HyperLogLog(14).add_hashes(hash_pair(v)[0])
    con.register("tv3", pd.DataFrame({"x": v}))
    sql = (
        "WITH "
        + hll_rows_ctes("t", "SELECT CAST(x AS UBIGINT) AS k FROM tv3", 14)
        + ", rg AS (SELECT 1 AS g, idx, max(rank) AS r FROM tr GROUP BY idx) "
        + hll_estimate_select("rg", "g", 14)
    )
    est = con.execute(sql).fetchone()[1]
    # identical registers; summation order may differ in the last ulp
    assert est == pytest.approx(sk.estimate(), rel=1e-12)


def test_cms_table_cell_for_cell(con):
    v = _vals(n=8000, seed=14)
    d, w = 5, 4096
    sk = CountMinSketch(d, w)
    h1, h2 = hash_pair(v)
    sk.add_hashes(h1, h2)
    con.register("tv4", pd.DataFrame({"x": v}))
    sql = (
        "WITH "
        + cms_table_ctes("t", "SELECT CAST(x AS UBIGINT) AS k FROM tv4", d, w)
        + " SELECT r, col, c FROM tcnt"
    )
    got = con.execute(sql).fetchdf()
    table = np.zeros((d, w), dtype=np.int64)
    table[got["r"].to_numpy(), got["col"].to_numpy()] = got["c"].to_numpy()
    assert np.array_equal(table, sk.table.astype(np.int64))
