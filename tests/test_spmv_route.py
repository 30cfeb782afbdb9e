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


def test_exact_reduce_beats_global_cumsum(rng):
    """The exact reduce keeps float prefixes row-local: row sums no longer
    difference two tile-scale cumsum values, so large-magnitude near-
    cancelling rows stay accurate (the legacy global-cumsum path loses
    ~sqrt(tile-elems) ulps; measured 3e-3 relerr at the 2^24 zipf demo)."""
    m = n = 1 << 13
    S = _rand_csr(rng, m, n, 20)
    S.data *= 1e3                       # amplify cancellation
    plan = SPR.SpmvRoutePlan(S.indptr, S.indices, S.data, (m, n))
    x = rng.standard_normal(n).astype(np.float32)
    want = S.astype(np.float64) @ x.astype(np.float64)
    scale = np.abs(want).mean() + 1e-30
    y = np.asarray(SPR.spmv_route(jnp.asarray(x), plan, interpret=True))
    err_exact = np.abs(y - want).max() / scale
    plan.lastidx8 = plan.samerow8 = None     # legacy differencing path
    y2 = np.asarray(SPR.spmv_route(jnp.asarray(x), plan, interpret=True))
    err_old = np.abs(y2 - want).max() / scale
    assert err_exact < 5e-6, err_exact
    assert err_exact < err_old / 4


def test_exact_reduce_edge_shapes(rng):
    """Structure stress for the exact reduce: interleaved empty rows
    (width-0 sentinel slots), one giant row spanning many sublane rows
    (deep carry chain), a single entry, and non-128-multiple dims."""
    m = n = 3000
    cases = [
        sps.csr_matrix((rng.standard_normal(m * 4).astype(np.float32),
                        (rng.integers(0, m // 3, m * 4) * 3,
                         rng.integers(0, n, m * 4))), shape=(m, n)),
        sps.csr_matrix((rng.standard_normal(20000).astype(np.float32),
                        (np.zeros(20000, np.int64),
                         rng.integers(0, n, 20000))), shape=(m, n)),
        sps.csr_matrix((np.array([2.5], np.float32),
                        (np.array([7]), np.array([11]))), shape=(m, n)),
        sps.csr_matrix((rng.standard_normal(5000).astype(np.float32),
                        (rng.integers(0, 1021, 5000),
                         rng.integers(0, 777, 5000))), shape=(1021, 777)),
    ]
    for S in cases:
        S.sum_duplicates()
        plan = SPR.SpmvRoutePlan(S.indptr, S.indices, S.data, S.shape)
        x = rng.standard_normal(S.shape[1]).astype(np.float32)
        y = np.asarray(SPR.spmv_route(jnp.asarray(x), plan,
                                      interpret=True))
        ref = S.astype(np.float64) @ x.astype(np.float64)
        err = np.abs(y - ref).max() / (np.abs(ref).max() + 1e-30)
        assert err < 2e-5, (S.shape, err)


def test_exact_reduce_carry_chain(rng):
    """Heavy rows span many sublane rows; the (tail, no-sentinel) carry
    chain (cg_stages > 0) must thread their mass across row boundaries."""
    n = 1 << 13
    nnz = n * 20
    rows = (n * (rng.random(nnz) ** 3)).astype(np.int64)
    cols = np.minimum((rng.zipf(1.5, nnz) - 1) % n, n - 1)
    vals = (rng.standard_normal(nnz) * 100).astype(np.float32)
    S = sps.csr_matrix((vals, (rows, cols)), shape=(n, n))
    S.sum_duplicates()
    plan = SPR.SpmvRoutePlan(S.indptr, S.indices, S.data, (n, n))
    assert plan.cg_stages > 0
    x = rng.standard_normal(n).astype(np.float32)
    y = np.asarray(SPR.spmv_route(jnp.asarray(x), plan, interpret=True))
    want = S.astype(np.float64) @ x.astype(np.float64)
    err = np.abs(y - want).max() / (np.abs(want).mean() + 1e-30)
    assert err < 5e-5, err


def test_route_ds_fp64(rng):
    """fp64 tier: double-single (hi/lo f32) route executor.  Backward-
    style error (scaled by the row 1-norm |A||x|) must sit at the ds
    design bound ~2^-48 * reduce depth — far below f32's 2^-24."""
    n = 2048
    S = sps.random(n, n, density=0.01, format="csr",
                   random_state=np.random.RandomState(7),
                   dtype=np.float64)
    S.data[:] = rng.standard_normal(S.nnz) * 1e3
    plan = SPR.SpmvRoutePlan(S.indptr, S.indices, S.data, (n, n))
    assert plan.g.val_lo is not None
    x = rng.standard_normal(n) * 1e2
    y = SPR.spmv_route_ds(jnp.asarray(x), plan, interpret=True)
    assert y is not None and y.dtype == jnp.float64
    want = S @ x
    Sa = S.copy()
    Sa.data = np.abs(Sa.data)
    scale = np.maximum(Sa @ np.abs(x), 1e-30)
    scaled = np.abs(np.asarray(y) - want) / scale
    assert scaled.max() < 1e-13, scaled.max()
    # heavy-row split path: hub row exercises extra_owner on the ds tier
    Sh = S.tolil()
    Sh[3, :] = rng.standard_normal(n)
    Sh = Sh.tocsr()
    plan2 = SPR.SpmvRoutePlan(Sh.indptr, Sh.indices, Sh.data, (n, n))
    y2 = SPR.spmv_route_ds(jnp.asarray(x), plan2, interpret=True)
    want2 = Sh @ x
    Sa2 = Sh.copy()
    Sa2.data = np.abs(Sa2.data)
    sc2 = np.abs(np.asarray(y2) - want2) / np.maximum(Sa2 @ np.abs(x),
                                                      1e-30)
    assert sc2.max() < 1e-13, sc2.max()


def test_route_ds_plan_roundtrip(rng, tmp_path):
    """f64 plans serialize with the lo plane and reload ds-capable."""
    n = 1024
    S = sps.random(n, n, density=0.02, format="csr",
                   random_state=np.random.RandomState(8),
                   dtype=np.float64)
    plan = SPR.SpmvRoutePlan(S.indptr, S.indices, S.data, (n, n))
    p = str(tmp_path / "plan64.npz")
    SPR.save_plan(plan, p)
    plan2 = SPR.load_plan(p)
    assert plan2.g.val_lo is not None
    x = rng.standard_normal(n)
    y = np.asarray(SPR.spmv_route_ds(jnp.asarray(x), plan2,
                                     interpret=True))
    np.testing.assert_allclose(y, S @ x, rtol=1e-12, atol=1e-9)
