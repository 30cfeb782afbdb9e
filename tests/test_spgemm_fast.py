"""Differential tests for the scan-based fast SpGEMM tier
(ops/spgemm_fast.py): fill-forward expansion + in-VMEM sort-reduce,
against scipy oracles.  Reference behavior being mirrored:
Source/GB_AxB_saxpy3_template.c (unmasked), GB_AxB_dot3_template.c
(masked work = flops into mask)."""

import numpy as np
import pytest
import scipy.sparse as sp

pytestmark = pytest.mark.slow

import graphblas_tpu as gb
from graphblas_tpu.core.descriptor import Descriptor
from graphblas_tpu.ops import mxm as MXM


@pytest.fixture(scope="module")
def skewed():
    rng = np.random.default_rng(3)
    n = 400
    rowsizes = rng.zipf(1.4, n).clip(0, 150)
    rows = np.repeat(np.arange(n), rowsizes)
    cols = rng.integers(0, n, rows.size)
    S = sp.csr_matrix(
        (rng.standard_normal(rows.size).astype(np.float32), (rows, cols)),
        shape=(n, n))
    S.sum_duplicates()
    return S


def _err(Cs, Ref):
    d = abs(Cs - Ref)
    return float(d.max()) if d.nnz else 0.0


def test_fast_tier_plus_times(skewed, burble_capture=None):
    S = skewed
    A = gb.Matrix.from_scipy(S)
    C = gb.mxm(A, A, gb.semiring.PLUS_TIMES)
    Ref = (S @ S).astype(np.float32)
    assert C.to_scipy().nnz == Ref.nnz
    assert _err(C.to_scipy(), Ref) < 1e-4


def test_fast_tier_masked_and_complement(skewed):
    S = skewed
    n = S.shape[0]
    A = gb.Matrix.from_scipy(S)
    Ref = (S @ S).astype(np.float32)
    M = sp.random(n, n, density=0.05, format="csr", dtype=np.float32,
                  random_state=11)
    Mg = gb.Matrix.from_scipy((M != 0).astype(np.float32))
    Cm = gb.mxm(A, A, gb.semiring.PLUS_TIMES, mask=Mg,
                desc=Descriptor(mask_structure=True))
    refm = Ref.multiply((M != 0).astype(np.float32))
    refm.eliminate_zeros()
    assert _err(Cm.to_scipy(), refm) < 1e-4
    Cc = gb.mxm(A, A, gb.semiring.PLUS_TIMES, mask=Mg,
                desc=Descriptor(mask_structure=True, mask_complement=True))
    refc = np.where(~(M != 0).toarray(), Ref.toarray(), 0)
    assert float(np.abs(Cc.to_scipy().toarray() - refc).max()) < 1e-4


def test_fast_tier_plus_pair_int64_triangle(skewed):
    import graphblas_tpu.algorithms.graph as GALG
    S = skewed
    A = gb.Matrix.from_scipy(S)
    ntri = GALG.triangle_count(A)
    P = (S != 0).astype(np.int64)
    L = sp.tril(P, -1).tocsr()
    assert int(ntri) == int((L @ L.T).multiply(L).sum())


def test_fast_tier_multiblock_and_fallback(skewed, monkeypatch):
    """Tiny flop block forces multiple row blocks; a dense-ish hub row
    exceeds the top sort class and rides the classic argsort fallback
    inside the fast driver."""
    rng = np.random.default_rng(9)
    S = skewed.copy().tolil()
    S[7, :] = rng.standard_normal(S.shape[1]).astype(np.float32)
    S = S.tocsr()
    S.sum_duplicates()
    monkeypatch.setattr(MXM, "SPGEMM_FLOP_BLOCK", 1 << 14)
    A = gb.Matrix.from_scipy(S)
    C = gb.mxm(A, A, gb.semiring.PLUS_TIMES)
    Ref = (S @ S).astype(np.float32)
    assert C.to_scipy().nnz == Ref.nnz
    assert _err(C.to_scipy(), Ref) < 1e-3


def test_fast_tier_first_second(skewed):
    S = skewed
    n = S.shape[0]
    Si = sp.csr_matrix((np.arange(1, S.nnz + 1, dtype=np.int32)
                        % 97 + 1, S.indices, S.indptr), shape=S.shape)
    A = gb.Matrix.from_scipy(Si)
    got = gb.mxm(A, A, gb.semiring.MIN_FIRST).to_scipy().toarray()
    big = np.iinfo(np.int32).max
    res = np.full((n, n), big, np.int64)
    for i in range(n):
        sl = slice(Si.indptr[i], Si.indptr[i + 1])
        for k, av in zip(Si.indices[sl], Si.data[sl]):
            js = Si.indices[Si.indptr[k]:Si.indptr[k + 1]]
            np.minimum.at(res[i], js, av)
    present = res != big
    assert (np.where(present, got, 0) == np.where(present, res, 0)).all()
    # SECOND: values come from B -> needs the bv gather path
    got2 = gb.mxm(A, A, gb.semiring.MAX_SECOND).to_scipy().toarray()
    res2 = np.zeros((n, n), np.int64)
    for i in range(n):
        sl = slice(Si.indptr[i], Si.indptr[i + 1])
        for k in Si.indices[sl]:
            s2 = slice(Si.indptr[k], Si.indptr[k + 1])
            np.maximum.at(res2[i], Si.indices[s2], Si.data[s2])
    assert (np.where(present, got2, 0) == np.where(present, res2, 0)).all()


def test_fast_tier_valued_mask(skewed):
    """Non-structural mask: zero-valued mask entries are NOT in the
    effective mask (reference: GB_AxB_dot3 with M not structural)."""
    S = skewed
    n = S.shape[0]
    rng = np.random.default_rng(11)
    Ref = (S @ S).astype(np.float32).tocsr()
    M = Ref.copy()
    M.data = rng.integers(0, 2, M.nnz).astype(np.float32)  # half zeros
    A = gb.Matrix.from_scipy(S)
    Mg = gb.Matrix.from_scipy(M)
    C = gb.mxm(A, A, gb.semiring.PLUS_TIMES, mask=Mg)
    Meff = M.copy()
    Meff.eliminate_zeros()
    want = Ref.multiply(Meff.astype(bool))
    assert _err(C.to_scipy(), want) < 1e-4
    # complemented valued mask
    Cc = gb.mxm(A, A, gb.semiring.PLUS_TIMES, mask=Mg,
                desc=Descriptor(mask_complement=True))
    wantc = Ref - Ref.multiply(Meff.astype(bool))
    assert _err(Cc.to_scipy(), wantc) < 1e-4
