"""User-defined struct/array types (reference: GrB_Type_new with C structs;
Demo/Program/gauss_demo.c — Gaussian integers {real, imag} with custom
add/mult ops and a custom semiring; wildtype_demo.c — double[4][4])."""

import numpy as np
import pytest

import graphblas_tpu as gb
from graphblas_tpu.core import types as T


GAUSS = T.struct_type("Gauss", np.int64, (2,))


def gauss_add(x, y):
    return x + y


def gauss_mult(x, y):
    import jax.numpy as jnp
    xr, xi = x[..., 0], x[..., 1]
    yr, yi = y[..., 0], y[..., 1]
    return jnp.stack([xr * yr - xi * yi, xr * yi + xi * yr], axis=-1)


ADD = gb.binary_op(gauss_add, "gauss_add", commutative=True)
MULT = gb.binary_op(gauss_mult, "gauss_mult")
ADD_MON = gb.make_monoid(ADD, identity=np.array([0, 0]))
GAUSS_SR = gb.make_semiring(ADD_MON, MULT, "gauss_plus_times")


def _gm(rng, m, n):
    """Dense gauss matrix + numpy complex mirror."""
    re = rng.integers(-3, 4, (m, n))
    im = rng.integers(-3, 4, (m, n))
    vals = np.stack([re, im], axis=-1).astype(np.int64)
    A = gb.Matrix((m, n), GAUSS, gb.FULL, values=__import__("jax.numpy",
                  fromlist=["asarray"]).asarray(vals))
    return A, re + 1j * im


def test_struct_build_and_extract(rng):
    rows = np.array([0, 1, 2, 1])
    cols = np.array([1, 0, 2, 0])
    vals = np.array([[1, 2], [3, 4], [5, 6], [10, 10]], np.int64)
    A = gb.Matrix.from_coo(rows, cols, vals, (3, 3), dtype=GAUSS, dup=ADD)
    assert A.nvals == 3
    r, c, v = A.coo()
    v = np.asarray(v)
    k = list(zip(np.asarray(r).tolist(), np.asarray(c).tolist()))
    got = dict(zip(k, v.tolist()))
    assert got[(1, 0)] == [13, 14]     # dup combined under gauss_add
    assert got[(0, 1)] == [1, 2]


def test_struct_ewise_add(rng):
    A, ca = _gm(rng, 4, 5)
    B, cb = _gm(rng, 4, 5)
    C = gb.ewise_add(A, B, ADD)
    cv, cp = C.to_dense_pair()
    got = np.asarray(cv)
    want = ca + cb
    np.testing.assert_array_equal(got[..., 0], want.real)
    np.testing.assert_array_equal(got[..., 1], want.imag)


def test_struct_mxm_gauss_semiring(rng):
    A, ca = _gm(rng, 4, 3)
    B, cb = _gm(rng, 3, 5)
    C = gb.mxm(A, B, GAUSS_SR)
    cv, cp = C.to_dense_pair()
    got = np.asarray(cv)
    want = ca @ cb
    np.testing.assert_array_equal(got[..., 0], want.real)
    np.testing.assert_array_equal(got[..., 1], want.imag)


def test_struct_reduce_scalar(rng):
    A, ca = _gm(rng, 4, 5)
    s = gb.reduce_scalar(A, ADD_MON)
    assert s.tolist() == [int(ca.real.sum()), int(ca.imag.sum())]


def test_struct_apply(rng):
    A, ca = _gm(rng, 3, 3)
    CONJ = gb.unary_op(lambda x: x * np.array([1, -1]), "gauss_conj")
    C = gb.apply(A, CONJ)
    cv, _ = C.to_dense_pair()
    got = np.asarray(cv)
    np.testing.assert_array_equal(got[..., 1], -ca.imag)


def test_wildtype_4x4(rng):
    """wildtype_demo analog: double[4][4] entries, ewise 'scale-add'."""
    WT = T.struct_type("wildtype", np.float64, (4, 4))
    va = rng.standard_normal((2, 2, 4, 4))
    import jax.numpy as jnp
    A = gb.Matrix((2, 2), WT, gb.FULL, values=jnp.asarray(va))
    B = gb.Matrix((2, 2), WT, gb.FULL, values=jnp.asarray(va * 2))
    C = gb.ewise_mult(A, B, gb.binary_op(lambda x, y: x + y, "wt_add"))
    cv, _ = C.to_dense_pair()
    np.testing.assert_allclose(np.asarray(cv), va * 3)
