"""Wave-26 semantics: feature correlation matrix, PCA power iteration."""

from __future__ import annotations

import biosets_spark.queries.wave26  # noqa: F401  (registers the wave)
from biosets_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def test_feature_correlation_matrix_properties(spark):
    rows = QUERIES["q_feature_correlation"].fn(spark, SF_SMOKE).collect()
    assert len(rows) == 36  # upper triangle of 8x8 incl. diagonal
    cells = {(r["i"], r["j"]): r["corr"] for r in rows}
    for i in range(1, 9):
        assert cells[(i, i)] == 1.0  # diagonal exactly 1
        for j in range(i, 9):
            assert -1.0 - 1e-9 <= cells[(i, j)] <= 1.0 + 1e-9
            assert i <= j  # upper triangle only


def test_pca_power_is_dominant_direction(spark):
    import math

    rows = QUERIES["q_pca_power"].fn(spark, SF_SMOKE).collect()
    assert len(rows) == 64
    v = [r["loading"] for r in sorted(rows, key=lambda r: r["pos"])]
    # L-inf normalized: max |component| is exactly 1 after the sweep
    assert math.isclose(max(abs(x) for x in v), 1.0, abs_tol=1e-9)
    # a power iterate of a PSD matrix from a positive start stays a
    # genuine direction (not collapsed to zero)
    assert sum(x * x for x in v) > 1.0


def test_pca_power_agrees_with_numpy(spark):
    """Differential check of the sweep itself: numpy replicates the
    same centered scatter matrix and the same three normalized sweeps;
    the distributed iterate must match the dense one to ~1e-6 (the
    sweep, not a converged eigenvector, is the operator under test —
    this embedding cloud's top eigenvalues are near-degenerate, so
    convergence takes O(100) sweeps and production runs to tolerance).
    Also checks the Rayleigh quotient grows monotonically, which is
    what each sweep guarantees."""
    import numpy as np

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    X = np.array([[round(float(x), 6) for x in r["embedding"]]
                  for r in emb.collect()])
    m = np.round(
        np.array([float(np.sum(np.round(c, 6))) for c in X.T]) / len(X), 6)
    Xc = np.round(X - m, 6)
    S = Xc.T @ Xc
    v = np.full(64, 0.125)
    rq = []
    for _ in range(3):
        u = S @ v
        rq.append(float(v @ S @ v) / float(v @ v))
        v = np.round(u / np.max(np.abs(u)), 10)
    rows = QUERIES["q_pca_power"].fn(spark, SF_SMOKE).collect()
    got = np.array([r["loading"] for r in sorted(rows, key=lambda r: r["pos"])])
    assert float(np.max(np.abs(got - v))) < 1e-6, np.max(np.abs(got - v))
    assert rq == sorted(rq)  # each sweep increases the Rayleigh quotient
