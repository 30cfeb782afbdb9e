"""Power-law inputs through the routing engine (VERDICT r1 #2): hub
columns ride virtual windows, heavy rows split into sub-rows."""

import numpy as np
import pytest
import scipy.sparse as sps

import jax.numpy as jnp

from graphblas_tpu.kernels import spmv_route as SPRT

pytestmark = pytest.mark.slow


def _check(S, rng, atol_scale=1e-5):
    n = S.shape[0]
    plan = SPRT.SpmvRoutePlan(S.indptr, S.indices, S.data, S.shape)
    x = rng.standard_normal(S.shape[1]).astype(np.float32)
    y = np.asarray(SPRT.spmv_route(jnp.asarray(x), plan))
    want = S.astype(np.float64) @ x.astype(np.float64)
    err = np.abs(y - want).max() / (np.abs(want).max() + 1e-30)
    assert err < atol_scale, err
    return plan


def test_hub_column(rng):
    n = 4000
    # one mega column holding 60% of all entries + uniform background
    r1 = rng.integers(0, n, 6000)
    c1 = np.full(6000, 17)
    r2 = rng.integers(0, n, 4000)
    c2 = rng.integers(0, n, 4000)
    S = sps.csr_matrix((rng.standard_normal(10000).astype(np.float32),
                        (np.concatenate([r1, r2]), np.concatenate([c1, c2]))),
                       shape=(n, n))
    S.sum_duplicates()
    plan = _check(S, rng)
    assert plan.g.Wv >= 1          # virtual window allocated


def test_zipf_columns(rng):
    n = 5000
    nnz = 30000
    cols = (rng.zipf(1.4, nnz) - 1) % n
    rows = rng.integers(0, n, nnz)
    S = sps.csr_matrix((rng.standard_normal(nnz).astype(np.float32),
                        (rows, cols)), shape=(n, n))
    S.sum_duplicates()
    plan = _check(S, rng)
    # padding must stay sane despite the skew
    assert plan.g.padded_frac < 16


def test_heavy_row_split(rng, monkeypatch):
    monkeypatch.setattr(SPRT, "_row_caps", lambda TR: (64,))
    n = 1200
    r1 = np.full(500, 7)
    c1 = rng.choice(n, 500, replace=False)
    r2 = rng.integers(0, n, 3000)
    c2 = rng.integers(0, n, 3000)
    S = sps.csr_matrix((rng.standard_normal(3500).astype(np.float32),
                        (np.concatenate([r1, r2]), np.concatenate([c1, c2]))),
                       shape=(n, n))
    S.sum_duplicates()
    plan = _check(S, rng)
    assert plan.extra_owner is not None
    assert plan.m_sub > plan.m


def test_heavy_row_and_hub_roundtrip_serialization(rng, monkeypatch,
                                                   tmp_path):
    monkeypatch.setattr(SPRT, "_row_caps", lambda TR: (128,))
    n = 1500
    r1 = np.full(400, 3)
    c1 = rng.choice(n, 400, replace=False)
    r2 = rng.integers(0, n, 3000)
    c2 = np.full(3000, 99)          # hub column
    S = sps.csr_matrix((rng.standard_normal(3400).astype(np.float32),
                        (np.concatenate([r1, r2]), np.concatenate([c1, c2]))),
                       shape=(n, n))
    S.sum_duplicates()
    plan = _check(S, rng)
    path = tmp_path / "p.npz"
    SPRT.save_plan(plan, path)
    plan2 = SPRT.load_plan(path)
    x = rng.standard_normal(n).astype(np.float32)
    y1 = np.asarray(SPRT.spmv_route(jnp.asarray(x), plan))
    y2 = np.asarray(SPRT.spmv_route(jnp.asarray(x), plan2))
    np.testing.assert_array_equal(y1, y2)
