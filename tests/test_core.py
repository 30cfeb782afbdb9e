"""Core object-model tests: construction, formats, conversions, element
access, pending tuples, pytree behavior.  Differential oracle: scipy/numpy.
(Test strategy per SURVEY.md section 4: differential testing against an
executable spec.)"""

import numpy as np
import pytest
import scipy.sparse as sps

import graphblas_tpu as gb
from graphblas_tpu import Matrix, Scalar, Vector
from graphblas_tpu.core import errors as E

FORMATS = [gb.SPARSE, gb.BITMAP, gb.HYPER]
ORIENTS = [gb.ROW, gb.COL]


def random_scipy(rng, m, n, density=0.2, dtype=np.float64):
    nnz = int(m * n * density)
    r = rng.integers(0, m, nnz)
    c = rng.integers(0, n, nnz)
    v = rng.standard_normal(nnz).astype(dtype)
    if np.issubdtype(dtype, np.integer):
        v = rng.integers(-10, 10, nnz).astype(dtype)
    return sps.csr_matrix((v, (r, c)), shape=(m, n))


def assert_same(A: Matrix, S):
    got = A.to_scipy().toarray()
    want = S.toarray() if hasattr(S, "toarray") else np.asarray(S)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=0)


def test_build_and_roundtrip(rng):
    S = random_scipy(rng, 20, 30)
    A = Matrix.from_scipy(S)
    assert A.shape == (20, 30)
    assert A.nvals == S.nnz
    assert_same(A, S)


def test_build_from_coo_with_dup(rng):
    rows = np.array([0, 1, 0, 1, 0])
    cols = np.array([0, 1, 0, 1, 2])
    vals = np.array([1.0, 2.0, 3.0, 4.0, 5.0])
    A = Matrix.from_coo(rows, cols, vals, (2, 3), dup="plus")
    assert A.nvals == 3
    assert A[0, 0] == 4.0
    assert A[1, 1] == 6.0
    assert A[0, 2] == 5.0
    B = Matrix.from_coo(rows, cols, vals, (2, 3), dup="second")
    assert B[0, 0] == 3.0
    C = Matrix.from_coo(rows, cols, vals, (2, 3), dup="max")
    assert C[0, 0] == 3.0
    D = Matrix.from_coo(rows, cols, vals, (2, 3), dup="first")
    assert D[0, 0] == 1.0


@pytest.mark.parametrize("fmt", FORMATS + [gb.FULL])
@pytest.mark.parametrize("orient", ORIENTS)
def test_format_conversions(rng, fmt, orient):
    if fmt == gb.FULL:
        dense = rng.standard_normal((7, 9))
        A = Matrix.from_dense(dense)
        B = A.to_format(fmt, orient)
        assert_same(B, dense)
        C = B.to_format(gb.SPARSE, gb.COL)
        # zeros are entries in a full matrix
        assert C.nvals == 63
        assert_same(C, dense)
        return
    S = random_scipy(rng, 13, 11, 0.3)
    A = Matrix.from_scipy(S)
    B = A.to_format(fmt, orient)
    assert B.fmt == fmt and B.orient == orient
    B.check()
    assert_same(B, S)
    # round trip back
    C = B.to_format(gb.SPARSE, gb.ROW)
    C.check()
    assert_same(C, S)
    assert C.nvals == S.nnz


def test_hyper_roundtrip(rng):
    # mostly-empty rows: hypersparse natural habitat
    S = sps.csr_matrix(([1.0, 2.0, 3.0], ([5, 900, 900], [3, 0, 7])),
                       shape=(1000, 10))
    A = Matrix.from_scipy(S).to_format(gb.HYPER)
    assert A.fmt == gb.HYPER
    assert int(A.h.shape[0]) == 2
    A.check()
    assert_same(A, S)
    assert_same(A.to_format(gb.SPARSE), S)


def test_element_access(rng):
    S = random_scipy(rng, 10, 10, 0.3)
    A = Matrix.from_scipy(S)
    d = S.toarray()
    nz = S.nonzero()
    i, j = int(nz[0][0]), int(nz[1][0])
    assert A[i, j] == d[i, j]
    assert A.is_stored_element(i, j)
    zi, zj = np.argwhere(d == 0)[0]
    with pytest.raises(E.NoValue):
        A[int(zi), int(zj)]
    with pytest.raises(E.InvalidIndex):
        A[100, 0]


def test_set_remove_element_sparse(rng):
    S = random_scipy(rng, 8, 8, 0.3)
    A = Matrix.from_scipy(S)
    A[3, 4] = 99.0
    A[3, 4] = 77.0      # overwrite (last wins)
    nz = list(zip(*S.nonzero()))
    (ri, rj) = nz[0]
    A.remove_element(int(ri), int(rj))
    A.wait()
    d = S.toarray()
    d[3, 4] = 77.0
    d[ri, rj] = 0.0
    want = sps.csr_matrix(d)
    assert A.nvals == want.nnz
    assert_same(A, want)


def test_set_element_bitmap(rng):
    dense = rng.standard_normal((5, 5))
    A = Matrix.from_dense(dense).to_format(gb.BITMAP)
    A[2, 2] = 42.0
    A.remove_element(1, 1)
    A.wait()
    d = dense.copy()
    d[2, 2] = 42.0
    assert A[2, 2] == 42.0
    assert not A.is_stored_element(1, 1)
    assert A.nvals == 24


def test_vector(rng):
    v = Vector.from_coo([1, 5, 7], [1.0, 2.0, 3.0], 10)
    assert v.size == 10
    assert v.nvals == 3
    assert v[5] == 2.0
    with pytest.raises(E.NoValue):
        v[0]
    dense, present = v.to_dense_1d()
    assert dense[7] == 3.0
    assert present.sum() == 3
    w = Vector.from_dense(np.arange(4.0))
    assert w.nvals == 4
    assert w[2] == 2.0


def test_scalar():
    s = Scalar.from_value(3.5)
    assert not s.is_empty
    assert s.value() == 3.5
    t = Scalar(gb.types.FP64)
    assert t.is_empty


def test_dup_and_clear(rng):
    S = random_scipy(rng, 6, 6, 0.4)
    A = Matrix.from_scipy(S)
    B = A.dup()
    A.clear()
    assert A.nvals == 0
    assert B.nvals == S.nnz


def test_iso(rng):
    A = Matrix.from_coo([0, 1, 2], [0, 1, 2], 7.0, (3, 3), iso=True)
    assert A.iso
    assert A.nvals == 3
    assert A[1, 1] == 7.0
    assert_same(A, np.diag([7.0, 7.0, 7.0]))


def test_pytree_jit(rng):
    import jax
    S = random_scipy(rng, 10, 10, 0.3)
    A = Matrix.from_scipy(S)

    @jax.jit
    def scale_vals(mat):
        return mat.values * 2.0

    np.testing.assert_allclose(np.asarray(scale_vals(A)),
                               np.asarray(A.values) * 2.0)
    leaves, treedef = jax.tree_util.tree_flatten(A)
    A2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert_same(A2, S)


def test_typecast():
    from graphblas_tpu.core import types as T
    assert np.asarray(T.cast(np.float64(2.7), T.INT32)) == 3
    assert np.asarray(T.cast(np.float64(-2.5), T.INT32)) == -2  # rint: to even
    assert np.asarray(T.cast(np.float64(np.nan), T.INT8)) == 0
    assert np.asarray(T.cast(np.float64(1e30), T.INT8)) == 127
    assert np.asarray(T.cast(np.int32(5), T.BOOL))
    assert np.asarray(T.cast(np.complex128(1 + 2j), T.FP64)) == 1.0


def test_memory_usage_and_check(rng):
    S = random_scipy(rng, 10, 10, 0.3)
    A = Matrix.from_scipy(S)
    assert A.memory_usage() > 0
    A.check()
