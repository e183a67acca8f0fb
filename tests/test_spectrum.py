"""k-eigenpair utilities (operators/spectrum.py; reference
networkit/algebraic.py:140 symmetricEigenvectors, :242
laplacianEigenvectors, :287 adjacencyEigenvectors)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from icebug_spark.operators import spectrum


def _sym(spark, pairs):
    both = pairs + [(b, a) for a, b in pairs]
    return spark.createDataFrame(sorted(set(both)), "src LONG, dst LONG")


def _vecs_matrix(df, nodes):
    got = {r["id"]: r["vec"] for r in df.collect()}
    return np.array([got[v] for v in nodes])


def test_symmetric_eigenpairs_reference_ordering():
    """cutoff+1 largest ("LA") / smallest ("SA"), sorted ASCENDING by
    algebraic eigenvalue — the reference's sorted(zip(w, ...)) contract."""
    rng = np.random.RandomState(7)
    a = rng.randn(8, 8)
    a = a + a.T
    ref_vals = np.linalg.eigvalsh(a)  # ascending
    vals, vecs = spectrum.symmetric_eigenpairs(a, cutoff=2, reverse=False)
    assert np.allclose(vals, ref_vals[-3:])
    assert all(vals[i] <= vals[i + 1] for i in range(len(vals) - 1))
    vals_s, _ = spectrum.symmetric_eigenpairs(a, cutoff=2, reverse=True)
    assert np.allclose(vals_s, ref_vals[:3])
    # each returned column is a unit eigenvector of its eigenvalue
    for i, lam in enumerate(vals):
        v = vecs[:, i]
        assert np.allclose(a @ v, lam * v, atol=1e-9)
        assert np.isclose(np.linalg.norm(v), 1.0)


def test_adjacency_eigenvectors_golden_c4(spark):
    """C4 adjacency spectrum is {-2, 0, 0, 2}."""
    c4 = _sym(spark, [(0, 1), (1, 2), (2, 3), (3, 0)])
    vals, df = spectrum.adjacency_eigenvectors(c4)
    assert np.allclose(sorted(vals), [-2.0, 0.0, 0.0, 2.0], atol=1e-9)
    m = _vecs_matrix(df, [0, 1, 2, 3])
    # columns are eigenvectors of the actual adjacency
    a = np.array([[0, 1, 0, 1], [1, 0, 1, 0], [0, 1, 0, 1], [1, 0, 1, 0]], float)
    for i, lam in enumerate(vals):
        assert np.allclose(a @ m[:, i], lam * m[:, i], atol=1e-9)


def test_laplacian_eigenvectors_golden_path(spark):
    """P3 Laplacian spectrum is {0, 1, 3}; Fiedler vector signs split
    the path at the middle node."""
    p3 = _sym(spark, [(0, 1), (1, 2)])
    vals, df = spectrum.laplacian_eigenvectors(p3)
    assert np.allclose(vals, [0.0, 1.0, 3.0], atol=1e-9)
    m = _vecs_matrix(df, [0, 1, 2])
    fiedler = m[:, 1]
    assert np.sign(fiedler[0]) != np.sign(fiedler[2])
    # cutoff selects the k smallest with reverse=True
    vals2, _ = spectrum.laplacian_eigenvectors(p3, cutoff=1, reverse=True)
    assert np.allclose(vals2, [0.0, 1.0], atol=1e-9)


def test_power_iteration_matches_dense(spark):
    """Distributed shifted power iteration + deflation vs numpy on a
    weighted barbell-ish fixture: two triangles joined by one bridge."""
    pairs = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (2, 3)]
    g = _sym(spark, pairs)
    vals_d, df_d = spectrum.laplacian_eigenvectors(g, cutoff=2, reverse=True)
    vals_p, df_p = spectrum.laplacian_eigenvectors_power(g, k=3, reverse=True)
    assert np.allclose(sorted(vals_p), vals_d, atol=1e-5)
    # Fiedler component (2nd smallest) must separate the two triangles
    m = _vecs_matrix(df_p, list(range(6)))
    fiedler = m[:, 1]
    left, right = fiedler[:3], fiedler[3:]
    assert np.sign(left).tolist() == [np.sign(left[0])] * 3
    assert np.sign(right).tolist() == [np.sign(right[0])] * 3
    assert np.sign(left[0]) != np.sign(right[0])


def test_power_iteration_forward_largest(spark):
    p3 = _sym(spark, [(0, 1), (1, 2)])
    vals, _ = spectrum.laplacian_eigenvectors_power(p3, k=1, reverse=False)
    assert np.allclose(vals, [3.0], atol=1e-6)


def test_dense_guard_names_distributed_path(spark):
    eu = _sym(spark, [(i, i + 1) for i in range(20)])
    with pytest.raises(ValueError, match="laplacian_eigenvectors_power"):
        spectrum.dense_adjacency(eu, max_nodes=5)
    with pytest.raises(ValueError, match="k <= 3"):
        spectrum.laplacian_eigenvectors_power(eu, k=4)
