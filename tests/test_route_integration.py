"""Routing-engine integration: Matrix.optimize(), the spmv_arrays dispatch
tier, routed fused algorithms, and plan serialization (VERDICT r1 #1/#9)."""

import numpy as np
import pytest
import scipy.sparse as sps

import jax.numpy as jnp

import graphblas_tpu as gb
from graphblas_tpu.algorithms import graph as GALG
from graphblas_tpu.core import semiring as SR
from graphblas_tpu.kernels import spmv_route as SPRT

pytestmark = pytest.mark.slow


def _graph(rng, n, deg):
    nnz = n * deg
    S = sps.csr_matrix((rng.standard_normal(nnz).astype(np.float32),
                        (rng.integers(0, n, nnz), rng.integers(0, n, nnz))),
                       shape=(n, n))
    S.sum_duplicates()
    return S


def test_optimize_routes_public_mxv(rng):
    n = 1500
    S = _graph(rng, n, 4)
    A = gb.Matrix.from_scipy(S)
    Ar = A.optimize()
    assert SPRT.plan_for(Ar.indptr, Ar.indices, Ar.values, Ar.shape,
                         build=False) is not None
    x = rng.standard_normal(n).astype(np.float32)
    y = gb.mxv(Ar, gb.Vector.from_dense(x), SR.PLUS_TIMES)
    yv, yp = y.to_dense_1d()
    want = S @ x
    np.testing.assert_allclose(np.asarray(yv), want, rtol=2e-4, atol=2e-4)


def test_bfs_fused_routed_matches(rng):
    n = 800
    S = _graph(rng, n, 3)
    A = gb.Matrix.from_scipy(S)
    base = np.asarray(GALG.bfs_levels_fused(A, 0))
    routed = np.asarray(GALG.bfs_levels_fused(A, 0, optimize=True))
    np.testing.assert_array_equal(base, routed)


def test_pagerank_fused_routed_matches(rng):
    n = 600
    S = _graph(rng, n, 4)
    S.data[:] = np.abs(S.data)
    A = gb.Matrix.from_scipy(S)
    r0, it0 = GALG.pagerank_fused(A, max_iter=25)
    r1, it1 = GALG.pagerank_fused(A, max_iter=25, optimize=True)
    np.testing.assert_allclose(np.asarray(r0), np.asarray(r1),
                               rtol=1e-4, atol=1e-7)


def test_plan_save_load_roundtrip(rng, tmp_path):
    n = 1000
    S = _graph(rng, n, 4)
    plan = SPRT.SpmvRoutePlan(S.indptr, S.indices, S.data, (n, n))
    path = tmp_path / "plan.npz"
    SPRT.save_plan(plan, path)
    plan2 = SPRT.load_plan(path)
    x = rng.standard_normal(n).astype(np.float32)
    y1 = np.asarray(SPRT.spmv_route(jnp.asarray(x), plan))
    y2 = np.asarray(SPRT.spmv_route(jnp.asarray(x), plan2))
    np.testing.assert_array_equal(y1, y2)
    want = S.astype(np.float64) @ x.astype(np.float64)
    err = np.abs(y1 - want).max() / (np.abs(want).max() + 1e-30)
    assert err < 1e-5


def test_optimize_with_plan_path(rng, tmp_path):
    n = 900
    S = _graph(rng, n, 3)
    path = str(tmp_path / "m.plan.npz")
    A = gb.Matrix.from_scipy(S)
    Ar = A.optimize(plan_path=path)
    import os
    assert os.path.exists(path)
    # a fresh matrix object loads the saved plan instead of rebuilding
    B = gb.Matrix.from_scipy(S)
    SPRT._plan_cache.clear()
    Br = B.optimize(plan_path=path)
    x = rng.standard_normal(n).astype(np.float32)
    y = gb.mxv(Br, gb.Vector.from_dense(x), SR.PLUS_TIMES)
    yv, _ = y.to_dense_1d()
    np.testing.assert_allclose(np.asarray(yv), S @ x, rtol=2e-4, atol=2e-4)
