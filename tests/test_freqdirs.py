"""GramMatrix / FrequentDirections: exactness, the FD spectral
sandwich under any partitioning and merge order, wire hardening, and
the distributed operators vs a numpy oracle."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from rusty_bloomfilter_spark.sketch import (
    FrequentDirections,
    GramMatrix,
    merge_sketch_payloads,
    sketch_from_bytes,
)


def rand_rows(n, dim, seed):
    rng = np.random.default_rng(seed)
    # low-rank-ish + noise: a realistic embedding spectrum
    basis = rng.normal(size=(6, dim))
    return rng.normal(size=(n, 6)) @ basis + 0.05 * rng.normal(size=(n, dim))


# ---------------------------------------------------------------------------
# GramMatrix
# ---------------------------------------------------------------------------


def test_gram_exact_and_mergeable():
    a = rand_rows(500, 16, 1)
    g = GramMatrix(16).add_rows(a)
    assert np.allclose(g.g, a.T @ a)
    assert g.n_items == 500 and np.isclose(g.fro_sq, (a * a).sum())
    # split anywhere, merge in any order: bitwise-identical is NOT
    # required for float adds, but equality to float tolerance is
    parts = np.split(a, [100, 250, 400])
    payloads = [GramMatrix(16).add_rows(p).to_bytes() for p in parts]
    m = sketch_from_bytes(merge_sketch_payloads(payloads[::-1]))
    assert np.allclose(m.g, a.T @ a)
    assert m.n_items == 500
    with pytest.raises(ValueError):
        GramMatrix(16).merge_in_place(GramMatrix(8))
    with pytest.raises(ValueError):
        GramMatrix(16).add_rows(np.ones((3, 5)))


def test_gram_wire():
    g = GramMatrix(8).add_rows(rand_rows(50, 8, 2))
    back = GramMatrix.from_bytes(g.to_bytes())
    assert back == g and back.n_items == g.n_items
    with pytest.raises(ValueError):
        GramMatrix.from_bytes(g.to_bytes()[:-8])
    with pytest.raises(ValueError):
        GramMatrix.from_bytes(b"XXXX" + g.to_bytes()[4:])
    vals, vecs = g.eigh()
    assert np.all(np.diff(vals) <= 1e-9)  # descending


# ---------------------------------------------------------------------------
# FrequentDirections — the sandwich 0 <= x'(A'A - B'B)x <= delta
# ---------------------------------------------------------------------------


def _sandwich_ok(a: np.ndarray, fd: FrequentDirections) -> None:
    diff = a.T @ a - (lambda b: b.T @ b)(fd.rows())
    eig = np.linalg.eigvalsh(diff)
    tol = 1e-8 * max(1.0, fd.fro_sq)
    assert eig.min() >= -tol, f"B overshoots A: {eig.min()}"
    assert eig.max() <= fd.delta + tol, f"undershoot {eig.max()} > delta {fd.delta}"
    assert fd.delta <= fd.fro_sq / fd.ell + tol


def test_fd_sandwich_single_stream():
    a = rand_rows(3000, 32, 3)
    fd = FrequentDirections(8, 32).add_rows(a)
    assert fd.n_items == 3000
    _sandwich_ok(a, fd)
    # top directions actually captured: est within delta of exact
    exact = np.linalg.eigvalsh(a.T @ a)[::-1]
    est = fd.singular_values() ** 2
    assert abs(exact[0] - est[0]) <= fd.delta + 1e-6


@settings(max_examples=15, deadline=None)
@given(seed=st.integers(0, 2**31 - 1), parts=st.integers(2, 5), ell=st.sampled_from([4, 8, 16]))
def test_fd_merge_any_order_preserves_sandwich(seed, parts, ell):
    rng = np.random.default_rng(seed)
    a = rand_rows(1200, 24, seed)
    cuts = np.sort(rng.integers(0, a.shape[0], size=parts - 1))
    pieces = np.split(a, cuts)
    sketches = [FrequentDirections(ell, 24).add_rows(p) for p in pieces]
    order = rng.permutation(len(sketches))
    acc = sketches[order[0]]
    for i in order[1:]:
        acc.merge_in_place(sketches[i])
    assert acc.n_items == a.shape[0]
    _sandwich_ok(a, acc)


def test_fd_merge_via_generic_payload_path():
    a, b = rand_rows(300, 16, 7), rand_rows(200, 16, 8)
    pa_, pb = (
        FrequentDirections(6, 16).add_rows(a).to_bytes(),
        FrequentDirections(6, 16).add_rows(b).to_bytes(),
    )
    m = sketch_from_bytes(merge_sketch_payloads([pa_, pb]))
    assert isinstance(m, FrequentDirections)
    _sandwich_ok(np.vstack([a, b]), m)
    with pytest.raises(ValueError):
        FrequentDirections(6, 16).merge_in_place(FrequentDirections(8, 16))


def test_fd_wire_hardening():
    fd = FrequentDirections(4, 8).add_rows(rand_rows(100, 8, 9))
    blob = fd.to_bytes()
    back = FrequentDirections.from_bytes(blob)
    assert back == fd and back.delta == fd.delta and back.to_bytes() == blob
    with pytest.raises(ValueError):
        FrequentDirections.from_bytes(blob[:-8])
    with pytest.raises(ValueError):
        FrequentDirections.from_bytes(blob[:10])
    import struct

    hdr = struct.Struct("<4sBxxxIIIxxxxQdd")
    with pytest.raises(ValueError):  # n_rows > ell
        FrequentDirections.from_bytes(hdr.pack(b"RFDS", 1, 2, 4, 3, 3, 0.0, 0.0) + bytes(96))
    with pytest.raises(ValueError):  # negative delta
        FrequentDirections.from_bytes(hdr.pack(b"RFDS", 1, 4, 4, 1, 1, -1.0, 0.0) + bytes(32))
    nan_row = np.full((1, 4), np.nan).tobytes()
    with pytest.raises(ValueError):  # non-finite rows
        FrequentDirections.from_bytes(hdr.pack(b"RFDS", 1, 4, 4, 1, 1, 0.0, 1.0) + nan_row)
    with pytest.raises(ValueError):
        FrequentDirections(1, 4)  # ell < 2


# ---------------------------------------------------------------------------
# distributed operators
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def emb_df(spark):
    mat = rand_rows(600, 16, 21).astype(np.float32)
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(600, dtype=np.int64),
            "embedding": [mat[i] for i in range(600)],
        }
    )
    # plant a NULL and a ragged row: operators must skip, not abort
    pdf.at[5, "embedding"] = None
    pdf.at[17, "embedding"] = mat[17][:7]
    return spark.createDataFrame(pdf).repartition(6), np.delete(mat, [5, 17], axis=0)


def test_embedding_gram_distributed_matches_numpy(spark, emb_df):
    from rusty_bloomfilter_spark.operators.spectral import embedding_gram

    df, clean = emb_df
    rows = embedding_gram(df, 16, round_dp=None).collect()
    got = np.zeros((16, 16))
    for r in rows:
        got[r["i"], r["j"]] = r["g"]
        got[r["j"], r["i"]] = r["g"]
    want = clean.astype(np.float64).T @ clean.astype(np.float64)
    assert np.allclose(got, want, atol=1e-8)


def test_embedding_spectrum_distributed_in_bound(spark, emb_df):
    from rusty_bloomfilter_spark.operators.spectral import embedding_spectrum

    df, clean = emb_df
    rows = embedding_spectrum(df, ell=6, dim=16).collect()
    assert len(rows) == 6
    assert all(r["in_bound"] for r in rows)
    ex = np.linalg.eigvalsh(clean.astype(np.float64).T @ clean.astype(np.float64))[::-1]
    for r in rows:
        assert np.isclose(r["sigma_sq_exact"], ex[r["component"]], rtol=1e-6)


def test_gram_sql_surface(spark, emb_df):
    """gram_agg / gram_eigvals SQL functions match the numpy Gram."""
    from rusty_bloomfilter_spark.functions.sql_sketches import register_sketch_sql

    df, clean = emb_df
    register_sketch_sql(spark, gram_dim=16, prefix="t2_")
    df.createOrReplaceTempView("gram_vecs")
    got = spark.sql(
        "SELECT t2_gram_eigvals(t2_gram_agg(embedding)) AS e FROM gram_vecs"
    ).collect()[0]["e"]
    want = np.linalg.eigvalsh(clean.astype(np.float64).T @ clean.astype(np.float64))[::-1]
    assert np.allclose(np.array(got), want, atol=1e-6)


# -- Davies–Bouldin cluster quality -----------------------------------------


def test_cluster_quality_matches_numpy(spark):
    import numpy as np
    import pytest

    from rusty_bloomfilter_spark.operators.spectral import cluster_quality

    rng = np.random.default_rng(13)
    dim, rows = 8, []
    centers = {0: np.zeros(dim), 1: np.full(dim, 5.0), 2: np.full(dim, -4.0)}
    pts = {}
    vid = 0
    for lab, c in centers.items():
        pts[lab] = c + rng.normal(0, 0.5, size=(30, dim))
        for p in pts[lab]:
            rows.append((vid, lab, [float(x) for x in p]))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, label int, embedding array<float>")
    got = {r["label"]: r for r in cluster_quality(df).collect()}

    # numpy oracle (float32 storage: compare at 1e-4)
    cents = {l: np.asarray(p, dtype=np.float32).astype(float).mean(0) for l, p in pts.items()}
    s = {
        l: float(np.mean(np.linalg.norm(np.asarray(p, dtype=np.float32).astype(float) - cents[l], axis=1)))
        for l, p in pts.items()
    }
    ratios = {}
    for i in centers:
        ratios[i] = max(
            ((s[i] + s[j]) / np.linalg.norm(cents[i] - cents[j]), j)
            for j in centers
            if j != i
        )
    db = np.mean([r for r, _ in ratios.values()])
    for lab in centers:
        assert got[lab]["n_vecs"] == 30
        assert got[lab]["scatter"] == pytest.approx(s[lab], abs=1e-4)
        assert got[lab]["worst_ratio"] == pytest.approx(ratios[lab][0], abs=1e-4)
        assert got[lab]["worst_neighbor"] == ratios[lab][1]
        assert got[lab]["db_index"] == pytest.approx(db, abs=1e-4)
    # geometry sanity: 0's nearest trouble is the closer center (-4), i.e. 2
    assert got[0]["worst_neighbor"] == 2


def test_cluster_quality_tight_vs_overlapping(spark):
    import numpy as np

    from rusty_bloomfilter_spark.operators.spectral import cluster_quality

    rng = np.random.default_rng(14)

    def frame(spread):
        rows, vid = [], 0
        for lab, c in ((0, 0.0), (1, 3.0)):
            for _ in range(25):
                v = (c + rng.normal(0, spread, 4)).astype(float)
                rows.append((vid, lab, [float(x) for x in v]))
                vid += 1
        return spark.createDataFrame(rows, "vec_id long, label int, embedding array<float>")

    tight = cluster_quality(frame(0.1)).collect()[0]["db_index"]
    blurry = cluster_quality(frame(2.0)).collect()[0]["db_index"]
    assert tight < 0.3 < blurry  # well-separated clusters score far lower


def test_cluster_quality_identical_centroids_report_inf(spark):
    # review fix: collapsed clusters (d = 0) are the case the diagnostic
    # exists for — report +inf, never an ANSI DIVIDE_BY_ZERO crash
    import math

    from rusty_bloomfilter_spark.operators.spectral import cluster_quality

    rows = []
    vid = 0
    for lab in (0, 1):  # identical point sets under two labels
        for i in range(5):
            rows.append((vid, lab, [float(i), float(-i), 1.0]))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, label int, embedding array<float>")
    got = {r["label"]: r for r in cluster_quality(df).collect()}
    assert math.isinf(got[0]["worst_ratio"]) and got[0]["worst_neighbor"] == 1
    assert math.isinf(got[0]["db_index"])
