"""Static routing engine tests (kernels/static_route.py): Benes planner,
Clos tile routing, and the Pallas executors in interpret mode (the real
TPU run is measured in experiments/benes_exec.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from graphblas_tpu.kernels import static_route as SRT

pytestmark = pytest.mark.slow


def _apply_numpy(x, dists, masks):
    x = x.copy()
    for d, m in zip(dists, masks):
        idx = np.arange(x.shape[1]) ^ d
        x = np.where(m, x[:, idx], x)
    return x


@pytest.mark.parametrize("M", [2, 4, 8, 64, 256])
def test_benes_route_all_sizes(rng, M):
    B = 32
    perm = np.stack([rng.permutation(M) for _ in range(B)])
    dists, masks = SRT.benes_route(perm)
    assert len(masks) == (2 * int(np.log2(M)) - 1)
    x = rng.standard_normal((B, M))
    out = _apply_numpy(x, dists, masks)
    np.testing.assert_array_equal(out, np.take_along_axis(x, perm, 1))


def test_sublane_permute_interpret(rng):
    R = 64
    perm = np.stack([rng.permutation(R) for _ in range(128)])  # per lane
    dists, masks = SRT.benes_route(perm)
    bits = SRT.pack_masks(masks).T.copy()                      # (R, 128)
    x = rng.standard_normal((R, 128)).astype(np.float32)
    out = np.asarray(SRT.sublane_permute(jnp.asarray(x), jnp.asarray(bits),
                                         dists, interpret=True))
    want = np.take_along_axis(x.T, perm, 1).T
    np.testing.assert_array_equal(out, want)


@pytest.mark.parametrize("R", [8, 64])
def test_clos_route_tile_permutation(rng, R):
    L = 128
    N = R * L
    perm = rng.permutation(N)
    plan = SRT.clos_route(perm, R, L)
    x = rng.standard_normal((R, L)).astype(np.float32)
    out = np.asarray(SRT.tile_permute(jnp.asarray(x), plan, interpret=True))
    want = x.reshape(-1)[perm].reshape(R, L)
    np.testing.assert_array_equal(out, want)


def test_clos_route_identity_and_reverse(rng):
    R, L = 16, 128
    N = R * L
    for perm in (np.arange(N), np.arange(N)[::-1].copy()):
        plan = SRT.clos_route(perm, R, L)
        x = rng.standard_normal((R, L)).astype(np.float32)
        out = np.asarray(SRT.tile_permute(jnp.asarray(x), plan,
                                          interpret=True))
        np.testing.assert_array_equal(out, x.reshape(-1)[perm].reshape(R, L))


@pytest.mark.parametrize("tiles", [2, 4])
def test_global_permute_interpret(rng, tiles):
    from graphblas_tpu.kernels.static_route import (GlobalPermutePlan,
                                                    global_permute, TILE_R)
    n = tiles * TILE_R * 128 - 777        # non-tile-aligned
    perm = rng.permutation(n)
    plan = GlobalPermutePlan(perm, n)
    x = rng.standard_normal(n).astype(np.float32)
    out = np.asarray(global_permute(jnp.asarray(x), plan, interpret=True))
    np.testing.assert_array_equal(out, x[perm])
