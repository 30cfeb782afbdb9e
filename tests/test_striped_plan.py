"""Striped route plans: the pow2-lattice padding diet (round-5).

A single route domain is quantized to a pow2 tile count; build_plan
escapes the lattice by splitting rows into stripes whose tile counts sum
to a tighter cover (ROOFLINE_BUDGET lever 2).  Reference analog:
GB_ek_slice balanced partitioning (Source/GB_ek_slice.c:9-20)."""

import numpy as np
import pytest
import scipy.sparse as sp

from graphblas_tpu.kernels import spmv_route as SPRT


def test_stripe_tile_split_logic():
    # F just past a pow2 boundary: stripes win
    assert SPRT._stripe_tile_split(79) == [64, 16]
    assert SPRT._stripe_tile_split(65) == [64, 16]
    assert SPRT._stripe_tile_split(129) == [128, 16]
    assert SPRT._stripe_tile_split(144) == [128, 16]
    # exact pow2 or near the next pow2: single plan
    assert SPRT._stripe_tile_split(64) is None
    assert SPRT._stripe_tile_split(100) is None  # 64+64 == 128, no win
    assert SPRT._stripe_tile_split(8) is None    # below the gather floor
    # small min_t (test-scale graphs)
    assert SPRT._stripe_tile_split(3, min_t=1) == [2, 1]


def test_striped_plan_end_to_end(monkeypatch, tmp_path):
    monkeypatch.setattr(SPRT, "_STRIPE_MIN_NNZ", 1)
    monkeypatch.setattr(SPRT, "_STRIPE_MIN_ROWS", 1)
    orig = SPRT._stripe_tile_split
    monkeypatch.setattr(SPRT, "_stripe_tile_split",
                        lambda F, min_t=16: orig(F, min_t=1))
    rng = np.random.default_rng(11)
    m, n = 200_000, 16_384
    S = sp.random(m, n, density=5.0 / n, format="csr", random_state=5,
                  dtype=np.float32)
    plan = SPRT.build_plan(S.indptr, S.indices, S.data, (m, n))
    assert isinstance(plan, SPRT.StripedSpmvPlan), \
        "expected a striped plan at this geometry"
    assert plan.nnz_total == S.nnz and plan.m == m
    x = rng.standard_normal(n).astype(np.float32)
    import jax.numpy as jnp
    y = np.asarray(SPRT.spmv_route(jnp.asarray(x), plan))
    want = S.astype(np.float64) @ x.astype(np.float64)
    err = np.abs(y - want).max() / (np.abs(want).max() + 1e-30)
    assert err < 1e-5, err
    # save/load round-trip keeps stripes and results bit-identical
    p = str(tmp_path / "plan")
    SPRT.save_plan(plan, p)
    plan2 = SPRT.load_plan(p)
    assert isinstance(plan2, SPRT.StripedSpmvPlan)
    assert plan2.bounds == plan.bounds
    y2 = np.asarray(SPRT.spmv_route(jnp.asarray(x), plan2))
    assert np.array_equal(y, y2)


def test_striped_plan_ds(monkeypatch):
    monkeypatch.setattr(SPRT, "_STRIPE_MIN_NNZ", 1)
    monkeypatch.setattr(SPRT, "_STRIPE_MIN_ROWS", 1)
    orig = SPRT._stripe_tile_split
    monkeypatch.setattr(SPRT, "_stripe_tile_split",
                        lambda F, min_t=16: orig(F, min_t=1))
    rng = np.random.default_rng(3)
    m, n = 200_000, 16_384
    S = sp.random(m, n, density=5.0 / n, format="csr", random_state=6,
                  dtype=np.float64)
    plan = SPRT.build_plan(S.indptr, S.indices, S.data, (m, n))
    if not isinstance(plan, SPRT.StripedSpmvPlan):
        pytest.skip("geometry did not stripe")
    import jax.numpy as jnp
    x = rng.standard_normal(n).astype(np.float32)
    y = SPRT.spmv_route_ds(jnp.asarray(x), plan)
    if y is None:
        pytest.skip("a stripe fell off the fused/ds path")
    want = S @ x.astype(np.float64)
    err = np.abs(np.asarray(y) - want).max() / (np.abs(want).max() + 1e-30)
    assert err < 1e-12, err


@pytest.mark.slow
def test_multiwindow_fused_tiles():
    """RBL < TR (striped tail geometry): route tiles span wpt windows;
    the fused gather stacks wpt window strips (f32 + double-single +
    monoid all served -- the round-5 regression where the DS tier
    returned None on the tail stripe)."""
    import jax.numpy as jnp
    rng = np.random.default_rng(4)
    m, n = 20_000, 262_144
    S = sp.random(m, n, density=24.0 / n, format="csr", random_state=8,
                  dtype=np.float64)
    plan = SPRT.SpmvRoutePlan(S.indptr, S.indices, S.data, (m, n))
    fuse, wpt, _, _ = SPRT._fuse_geometry(plan.g, plan.gp.TR)
    assert fuse and wpt > 1
    x = rng.standard_normal(n).astype(np.float32)
    want = S @ x.astype(np.float64)
    y = np.asarray(SPRT.spmv_route(jnp.asarray(x), plan))
    assert np.abs(y - want).max() / np.abs(want).max() < 1e-4
    yd = SPRT.spmv_route_ds(jnp.asarray(x), plan)
    assert yd is not None
    assert np.abs(np.asarray(yd) - want).max() / np.abs(want).max() < 1e-9
