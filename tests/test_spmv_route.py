"""Routing-engine SpMV stage tests (kernels/spmv_route.py)."""

import numpy as np
import pytest
import scipy.sparse as sps

import jax.numpy as jnp

from graphblas_tpu.kernels import spmv_route as SPR

pytestmark = pytest.mark.slow


def _rand_csr(rng, m, n, deg):
    nnz = m * deg
    S = sps.csr_matrix((rng.standard_normal(nnz).astype(np.float32),
                        (rng.integers(0, m, nnz), rng.integers(0, n, nnz))),
                       shape=(m, n))
    S.sum_duplicates()
    return S


def test_gather_products_matches_expansion(rng):
    m, n, deg = 300, 40000, 6
    S = _rand_csr(rng, m, n, deg)
    plan = SPR.GatherPlan(jnp.asarray(S.indptr), jnp.asarray(S.indices),
                          jnp.asarray(S.data), (m, n))
    x = rng.standard_normal(n).astype(np.float32)
    prods = np.asarray(SPR.gather_products(jnp.asarray(x), plan,
                                           interpret=True)).reshape(-1)
    # every real product must equal val * x[col] at its packed position
    # exactly (the gather is a lane selection, not an approximation)
    want = (S.data.astype(np.float32) * x[S.indices]).astype(np.float32)
    np.testing.assert_array_equal(prods[plan.pos], want)
    # padding carries exact zeros
    real = np.zeros(prods.shape[0], bool)
    real[plan.pos] = True
    assert (prods[~real] == 0).all()


@pytest.mark.parametrize("m,n,deg", [(500, 3000, 4), (2000, 50000, 10)])
def test_spmv_route_end_to_end(rng, m, n, deg):
    S = _rand_csr(rng, m, n, deg)
    plan = SPR.SpmvRoutePlan(jnp.asarray(S.indptr), jnp.asarray(S.indices),
                             jnp.asarray(S.data), (m, n))
    x = rng.standard_normal(n).astype(np.float32)
    y = np.asarray(SPR.spmv_route(jnp.asarray(x), plan, interpret=True))
    want = (S.astype(np.float64) @ x.astype(np.float64))
    err = np.abs(y - want).max() / (np.abs(want).max() + 1e-30)
    assert err < 1e-5, err
