"""Semiring-generic routed SpMV (round-5 ask #3): min-plus / max-second /
plus-times through kernels/spmv_route.spmv_route_monoid, plus routed SSSP.

Reference analog: the semiring-generic saxpy factory
(Source/Factories/GB_AxB_factory.c:15-36); SSSP = GrB_vxm MIN_PLUS loop."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

from graphblas_tpu.kernels import spmv_route as SPRT


def _dense_minplus(S, x):
    n = S.shape[0]
    D = np.full((n, n), np.inf, np.float32)
    D[S.nonzero()] = np.asarray(S[S.nonzero()]).ravel()
    return (D + x[None, :]).min(axis=1), D


@pytest.fixture(scope="module")
def hubfree():
    n = 3000
    S = sp.random(n, n, density=0.008, format="csr", random_state=9,
                  dtype=np.float32)
    x = np.abs(np.random.default_rng(7).standard_normal(n)) \
        .astype(np.float32)
    plan = SPRT.SpmvRoutePlan(S.indptr, S.indices, S.data, (n, n))
    return S, x, plan


@pytest.fixture(scope="module")
def hubbed():
    n = 3000
    S = sp.random(n, n, density=0.008, format="csr", random_state=3,
                  dtype=np.float32).tolil()
    S[:, 5] = 1.5
    S[7, :] = 2.5
    S = S.tocsr().astype(np.float32)
    x = np.abs(np.random.default_rng(7).standard_normal(n)) \
        .astype(np.float32)
    plan = SPRT.SpmvRoutePlan(S.indptr, S.indices, S.data, (n, n))
    return S, x, plan


@pytest.mark.parametrize("fix", ["hubfree", "hubbed"])
def test_minplus_route(fix, request):
    S, x, plan = request.getfixturevalue(fix)
    assert SPRT.monoid_tier_ok(plan)
    want, _ = _dense_minplus(S, x)
    y = SPRT.spmv_route_monoid(jnp.asarray(x), plan, add="min", mul="plus")
    assert y is not None
    assert np.isclose(np.asarray(y), want, rtol=1e-5, atol=1e-5).all()


def test_plus_times_monoid_matches_cumsum(hubfree):
    S, x, plan = hubfree
    y = np.asarray(SPRT.spmv_route_monoid(jnp.asarray(x), plan,
                                          add="plus", mul="times"))
    yref = np.asarray(SPRT.spmv_route(jnp.asarray(x), plan))
    err = np.abs(y - yref).max() / (np.abs(yref).max() + 1e-30)
    assert err < 2e-5


def test_max_second_route(hubbed):
    S, x, plan = hubbed
    _, D = _dense_minplus(S, x)
    want = np.where(D < np.inf, x[None, :], -np.inf).max(axis=1)
    y = np.asarray(SPRT.spmv_route_monoid(jnp.asarray(x), plan,
                                          add="max", mul="second"))
    assert np.isclose(y, want, rtol=1e-6, atol=1e-6).all()


def test_min_first_empty_rows():
    # empty rows must come out as the identity (+inf), not 0
    n = 1024
    rows = np.array([0, 0, 5], np.int64)
    cols = np.array([1, 2, 3], np.int64)
    vals = np.array([4.0, 2.0, 7.0], np.float32)
    S = sp.csr_matrix((vals, (rows, cols)), shape=(n, n))
    plan = SPRT.SpmvRoutePlan(S.indptr, S.indices, S.data, (n, n))
    x = np.ones(n, np.float32)
    y = np.asarray(SPRT.spmv_route_monoid(jnp.asarray(x), plan,
                                          add="min", mul="first"))
    assert y[0] == 2.0 and y[5] == 7.0
    assert np.isinf(y[1]) and np.isinf(y[1000])


def test_routed_sssp_vs_scipy():
    import graphblas_tpu as gb
    from graphblas_tpu.algorithms import graph as G
    n = 2000
    S = sp.random(n, n, density=0.004, format="csr", random_state=12,
                  dtype=np.float64)
    S.data = np.abs(S.data) + 0.01
    coo = S.tocoo()
    A = gb.Matrix.from_coo(coo.row, coo.col,
                           coo.data.astype(np.float32), (n, n))
    d = np.asarray(G.sssp(A, 0, optimize=True))
    from scipy.sparse.csgraph import dijkstra
    want = dijkstra(S.astype(np.float64), directed=True, indices=0)
    assert np.isclose(d, want, rtol=1e-5, atol=1e-5,
                      equal_nan=False).all() or \
        (np.isinf(d) == np.isinf(want)).all() and \
        np.isclose(d[np.isfinite(want)], want[np.isfinite(want)],
                   rtol=1e-5).all()
