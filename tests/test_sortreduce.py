"""Sort-reduce SpGEMM fast tier: kernel-level and op-level differential
tests (vs scipy and the classic argsort ESC path)."""

import numpy as np
import pytest
import scipy.sparse as sps

import jax.numpy as jnp

import graphblas_tpu as gb
from graphblas_tpu.core import monoid as MON
from graphblas_tpu.core import semiring as SR
from graphblas_tpu.kernels import sortreduce as SRD
from graphblas_tpu.ops import mxm as MXM


def _rand_csr(rng, m, n, density, dtype=np.float32):
    S = sps.random(m, n, density=density, random_state=np.random.RandomState(
        int(rng.integers(1 << 30))), format="csr", dtype=np.float64)
    S.data = (rng.standard_normal(S.nnz)).astype(dtype)
    if dtype == np.bool_:
        S.data = np.ones(S.nnz, np.bool_)
    S.eliminate_zeros()
    return S.astype(dtype)


@pytest.mark.slow
def test_kernel_multi_cap(rng):
    for C in (128, 512):
        R = 9
        S = R * (C // 128)
        lens = rng.integers(0, C + 1, R)
        keys = np.full((R, C), SRD.SENTINEL, np.int32)
        vals = np.zeros((R, C), np.float32)
        for r in range(R):
            L = lens[r]
            keys[r, :L] = rng.integers(0, 40, L)
            vals[r, :L] = rng.standard_normal(L).astype(np.float32)
        ok, ov = SRD.sort_reduce_rows(
            jnp.asarray(keys.reshape(S, 128)),
            jnp.asarray(vals.reshape(S, 128)), C, MON.PLUS, interpret=True)
        ok = np.asarray(ok).reshape(R, C)
        ov = np.asarray(ov).reshape(R, C)
        for r in range(R):
            m = ok[r] != SRD.SENTINEL
            want = {}
            for k, v in zip(keys[r], vals[r]):
                if k != SRD.SENTINEL:
                    want[k] = want.get(k, 0.0) + v
            assert np.array_equal(ok[r][m], np.array(sorted(want), np.int32))
            assert np.allclose(ov[r][m],
                               [want[k] for k in sorted(want)], atol=1e-4)


@pytest.mark.parametrize("dtype", [
    np.float32,
    pytest.param(np.int32, marks=pytest.mark.slow),
    pytest.param(np.bool_, marks=pytest.mark.slow),
])
def test_spgemm_fast_vs_scipy(rng, dtype):
    m = k = n = 60
    A = _rand_csr(rng, m, k, 0.2, dtype)
    B = _rand_csr(rng, k, n, 0.2, dtype)
    Ag = gb.Matrix.from_scipy(A)
    Bg = gb.Matrix.from_scipy(B)
    sr = SR.LOR_LAND if dtype == np.bool_ else SR.PLUS_TIMES
    C = gb.mxm(Ag, Bg, sr)
    got = C.to_scipy().toarray()
    if dtype == np.bool_:
        want = (A.astype(np.int64) @ B.astype(np.int64)).toarray() > 0
        assert np.array_equal(got.astype(bool), want)
    else:
        want = (A.astype(np.float64) @ B.astype(np.float64)).toarray()
        assert np.allclose(got, want, atol=1e-3)


@pytest.mark.slow
def test_spgemm_fast_heavy_row_fallback(rng, monkeypatch):
    # shrink the caps so dense rows overflow the top class and take the
    # argsort fallback; mixed classes + fallback must merge in row order
    monkeypatch.setattr(SRD, "CAPS", (128, 256))
    m = k = n = 50
    A = _rand_csr(rng, m, k, 0.15)
    # one hub row with many entries -> flops > 256
    hub = sps.csr_matrix((np.ones(40, np.float32),
                          (np.zeros(40, np.int64),
                           rng.choice(k, 40, replace=False))), shape=(m, k))
    A = (A + hub).tocsr()
    B = _rand_csr(rng, k, n, 0.4)
    C = gb.mxm(gb.Matrix.from_scipy(A), gb.Matrix.from_scipy(B),
               SR.PLUS_TIMES)
    want = (A.astype(np.float64) @ B.astype(np.float64)).toarray()
    assert np.allclose(C.to_scipy().toarray(), want, atol=1e-3)


def test_spgemm_fast_masked_matches_classic(rng):
    m = k = n = 48
    A = _rand_csr(rng, m, k, 0.25)
    B = _rand_csr(rng, k, n, 0.25)
    M = _rand_csr(rng, m, n, 0.3)
    Ag, Bg = gb.Matrix.from_scipy(A), gb.Matrix.from_scipy(B)
    Mg = gb.Matrix.from_scipy(M)
    desc = gb.Descriptor(mask_structure=True)
    C1 = gb.mxm(Ag, Bg, SR.PLUS_TIMES, mask=Mg, desc=desc)
    # classic path: fp64 is ineligible for the fast tier
    C2 = gb.mxm(Ag, Bg, SR.PLUS_TIMES, mask=Mg, desc=desc,
                out_dtype=gb.types.FP64)
    got = C1.to_scipy().toarray()
    want = np.asarray(C2.to_scipy().toarray(), np.float64)
    assert np.allclose(got, want, atol=1e-3)


@pytest.mark.slow
def test_spgemm_fast_min_plus(rng):
    m = k = n = 40
    A = _rand_csr(rng, m, k, 0.2)
    B = _rand_csr(rng, k, n, 0.2)
    C = gb.mxm(gb.Matrix.from_scipy(A), gb.Matrix.from_scipy(B),
               SR.MIN_PLUS)
    Ad = np.where(A.toarray() != 0, A.toarray(), np.inf)
    Bd = np.where(B.toarray() != 0, B.toarray(), np.inf)
    want = np.min(Ad[:, :, None] + Bd[None, :, :], axis=1)
    got = C.to_scipy().toarray()
    pat = ~np.isinf(want)
    # absent entries in got are 0; compare on the pattern
    assert np.allclose(got[pat], want[pat], atol=1e-3)
