"""Spectral analytics over embedding columns: one-pass distributed
Gram/covariance (exact) and Frequent Directions (sketched), both
mergeable through the standard tree-merge topology.

The 100-TB shape: each task folds its Arrow batches into ONE d x d
Gram (a BLAS X^T X per batch — no per-row Python) or one ell x d FD
workspace; only those fixed-size payloads shuffle. Eigen/SVD work on
the merged result is driver-side on a d x d / ell x d array —
independent of corpus size. Use GramMatrix while d^2 comfortably fits
a task (d=4096 ~ 128 MB); switch to FrequentDirections when d is
large enough that d^2 doesn't, or when only the top spectrum is
needed: ell*d state with the certified spectral undershoot ``delta``
shipped in the payload.

``dim`` is threaded explicitly everywhere (house rule: no driver
``first()`` job at plan-construction time).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
from pyspark.sql import DataFrame

from ..sketch import FrequentDirections, GramMatrix, merge_sketch_payloads
from .aggregate import build_sketch, collect_sketch_bytes
from .similarity import _stack_rows


class GramSketch:
    """Distributed exact Gram accumulator over an array<float> column.
    NULL / wrong-width rows are skipped (same tolerance contract as the
    ANN operators — one bad row must not abort a corpus job)."""

    def __init__(self, dim: int, *, vec_col: str = "embedding"):
        self.dim = dim
        self.vec_col = vec_col

    def _empty(self) -> GramMatrix:
        return GramMatrix(self.dim)

    def _update(self, acc: GramMatrix, batch) -> None:
        mat, _ = _stack_rows(batch.column(self.vec_col), self.dim)
        if mat.shape[0]:
            acc.add_rows(mat)

    _merge = staticmethod(merge_sketch_payloads)

    def build(self, df: DataFrame, *, fanout: int = 16) -> DataFrame:
        return build_sketch(
            df, self._empty, self._update, self._merge, columns=[self.vec_col], fanout=fanout
        )

    def build_bytes(self, df: DataFrame, *, fanout: int = 16) -> tuple[bytes, int]:
        return collect_sketch_bytes(self.build(df, fanout=fanout))


class FreqDirsSketch:
    """Distributed Frequent Directions over an array<float> column."""

    def __init__(self, ell: int, dim: int, *, vec_col: str = "embedding"):
        self.ell = ell
        self.dim = dim
        self.vec_col = vec_col

    def _empty(self) -> FrequentDirections:
        return FrequentDirections(self.ell, self.dim)

    def _update(self, acc: FrequentDirections, batch) -> None:
        mat, _ = _stack_rows(batch.column(self.vec_col), self.dim)
        if mat.shape[0]:
            acc.add_rows(mat)

    _merge = staticmethod(merge_sketch_payloads)

    def build(self, df: DataFrame, *, fanout: int = 16) -> DataFrame:
        return build_sketch(
            df, self._empty, self._update, self._merge, columns=[self.vec_col], fanout=fanout
        )

    def build_bytes(self, df: DataFrame, *, fanout: int = 16) -> tuple[bytes, int]:
        return collect_sketch_bytes(self.build(df, fanout=fanout))


def embedding_gram(
    df: DataFrame, dim: int, *, vec_col: str = "embedding", round_dp: int | None = 6
) -> DataFrame:
    """Exact corpus Gram as an upper-triangle DataFrame (i, j, g).

    Result size is dim*(dim+1)/2 rows — a function of the embedding
    WIDTH, never the corpus, so the driver-side construction is
    k-bounded in the same sense as a collected top-k. ``round_dp``
    rounds entries for cross-engine comparison (float32 inputs summed
    in float64; reorder noise ~1e-13 at the test scale)."""
    payload, _ = GramSketch(dim, vec_col=vec_col).build_bytes(df)
    g = GramMatrix.from_bytes(payload).g
    iu, ju = np.triu_indices(dim)
    vals = g[iu, ju]
    if round_dp is not None:
        vals = np.round(vals, round_dp) + 0.0  # +0.0 normalizes -0.0
    rows = [(int(a), int(b), float(v)) for a, b, v in zip(iu, ju, vals)]
    return df.sparkSession.createDataFrame(rows, "i int, j int, g double")


def embedding_spectrum(
    df: DataFrame, ell: int, dim: int, *, vec_col: str = "embedding"
) -> DataFrame:
    """Top spectrum of the corpus Gram, self-auditing: one FD pass
    (the scale path) AND one exact Gram pass, emitting per component
    (component, sigma_sq_est, sigma_sq_exact, delta, in_bound) where
    the FD sandwich + Weyl's inequality certify
    0 <= sigma_sq_exact - sigma_sq_est <= delta for every component.
    ``in_bound`` is evaluated in-row so a rows-only driver check still
    witnesses the bound (house pattern for estimate queries)."""
    fd_payload, _ = FreqDirsSketch(ell, dim, vec_col=vec_col).build_bytes(df)
    fd = FrequentDirections.from_bytes(fd_payload)
    g_payload, _ = GramSketch(dim, vec_col=vec_col).build_bytes(df)
    exact = GramMatrix.from_bytes(g_payload).eigh()[0]

    sv = fd.singular_values()
    est = np.zeros(ell, dtype=np.float64)
    est[: sv.size] = sv * sv
    ex = np.maximum(exact[:ell], 0.0)  # eigh noise can dip -1e-12
    # sandwich with a relative epsilon for driver-side float noise
    tol = 1e-9 * max(1.0, fd.fro_sq)
    rows = [
        (
            int(i),
            float(est[i]),
            float(ex[i]),
            float(fd.delta),
            bool(ex[i] - est[i] >= -tol and ex[i] - est[i] <= fd.delta + tol),
        )
        for i in range(ell)
    ]
    return df.sparkSession.createDataFrame(
        rows, "component int, sigma_sq_est double, sigma_sq_exact double, delta double, in_bound boolean"
    )
