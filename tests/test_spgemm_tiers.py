"""Pin the alternative SpGEMM tiers (GB_SPGEMM_TIER=v1 scan-expansion
engine, =classic argsort ESC) against the default SELL engine and scipy
(round-4: the v1 tier regressed to dead code once SELL became default —
this keeps every dispatchable tier exercised)."""

import numpy as np
import pytest
import scipy.sparse as sps

import graphblas_tpu as gb
from graphblas_tpu.core import semiring as SR
from graphblas_tpu.core.descriptor import Descriptor


def _rand(n, nnz, seed, dtype=np.float32):
    rng = np.random.default_rng(seed)
    S = sps.csr_matrix(
        (rng.integers(1, 5, nnz).astype(dtype),
         (rng.integers(0, n, nnz), rng.integers(0, n, nnz))),
        shape=(n, n))
    S.sum_duplicates()
    return S


@pytest.mark.parametrize("tier", ["v1", "classic"])
def test_tier_unmasked_plus_times(tier, monkeypatch):
    monkeypatch.setenv("GB_SPGEMM_TIER", tier)
    S = _rand(150, 1200, 0)
    A = gb.Matrix.from_scipy(S)
    C = gb.mxm(A, A, SR.PLUS_TIMES)
    want = S @ S
    got = C.to_scipy()
    assert got.nnz == want.nnz
    assert abs(got - want).max() < 1e-4


@pytest.mark.parametrize("tier", ["v1", "classic"])
@pytest.mark.parametrize("comp", [False, True])
def test_tier_masked(tier, comp, monkeypatch):
    monkeypatch.setenv("GB_SPGEMM_TIER", tier)
    S = _rand(120, 900, 1)
    A = gb.Matrix.from_scipy(S)
    M = gb.select(A, gb.operators.TRIL, -1)
    d = Descriptor(mask_structure=True, mask_complement=comp)
    C = gb.mxm(A, A, SR.PLUS_TIMES, mask=M, desc=d)
    ref = (S @ S).toarray()
    Mm = sps.tril(S, -1).toarray() != 0
    want = np.where(~Mm if comp else Mm, ref, 0)
    got = C.to_scipy().toarray()
    assert np.allclose(got, want, rtol=1e-4)


@pytest.mark.parametrize("tier", ["v1", "classic"])
def test_tier_min_plus_int(tier, monkeypatch):
    monkeypatch.setenv("GB_SPGEMM_TIER", tier)
    from graphblas_tpu.core import types as T
    S = _rand(100, 700, 2, np.int32)
    A = gb.Matrix.from_scipy(S)
    C = gb.mxm(A, A, SR.MIN_PLUS, out_dtype=T.INT64)
    D = S.toarray().astype(np.int64)
    BIG = np.int64(1) << 40
    Dm = np.where(D != 0, D, BIG)
    want = np.minimum.reduce(
        Dm[:, :, None] + Dm[None, :, :], axis=1)
    pat = ((D != 0).astype(np.int64) @ (D != 0).astype(np.int64)) > 0
    got = C.to_scipy().toarray()
    assert np.array_equal(got[pat], want[pat])


def test_tier_v1_pair_counts(monkeypatch):
    monkeypatch.setenv("GB_SPGEMM_TIER", "v1")
    from graphblas_tpu.core import types as T
    S = _rand(100, 900, 3)
    A = gb.Matrix.from_scipy(S)
    C = gb.mxm(A, A, SR.PLUS_PAIR, out_dtype=T.INT64)
    want = ((S != 0).astype(np.int64) @ (S != 0).astype(np.int64))
    got = C.to_scipy()
    assert abs(got - want).nnz == 0
