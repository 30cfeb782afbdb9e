"""Wide-key SELL SpGEMM: n >= 2^23 inputs run the lexicographic
(rank, column) 2-plane sort (round-4 ask #9; the packed int32 key capped
n at 2^23).  Reduced density, exercised at n = 2^26 vs scipy."""

import numpy as np
import pytest
import scipy.sparse as sps

import graphblas_tpu as gb
from graphblas_tpu.core import semiring as SR

N = 1 << 26


def _mats(seed=1):
    rng = np.random.default_rng(seed)
    ra = np.repeat(np.arange(200), 10)
    ca = rng.integers(0, N, 2000)
    A = gb.Matrix.from_coo(ra, ca,
                           rng.integers(1, 5, 2000).astype(np.float32),
                           (N, N))
    rb = ca[rng.permutation(2000)]
    cb = rng.integers(0, N, 2000)
    B = gb.Matrix.from_coo(rb, cb,
                           rng.integers(1, 5, 2000).astype(np.float32),
                           (N, N))
    to_sp = lambda M: sps.csr_matrix(  # noqa: E731
        (np.asarray(M.values), np.asarray(M.indices),
         np.asarray(M.indptr)), shape=(N, N))
    return A, B, to_sp(A), to_sp(B)


@pytest.mark.slow
def test_wide_unmasked():
    A, B, Sa, Sb = _mats()
    C = gb.mxm(A, B, SR.PLUS_TIMES)
    want = Sa @ Sb
    got = C.to_scipy()
    d = abs(got - want)
    assert got.nnz == want.nnz
    assert (d.max() if d.nnz else 0) < 1e-4


@pytest.mark.slow
def test_wide_masked():
    A, B, Sa, Sb = _mats()
    C = gb.mxm(A, B, SR.PLUS_TIMES)
    Cc = C.to_scipy().tocoo()
    sel = np.arange(Cc.nnz) % 2 == 0
    M = gb.Matrix.from_coo(Cc.row[sel], Cc.col[sel],
                           np.ones(sel.sum(), np.float32), (N, N))
    Cm = gb.mxm(A, B, SR.PLUS_TIMES, mask=M)
    pat = sps.csr_matrix((np.ones(sel.sum(), np.float32),
                          (Cc.row[sel], Cc.col[sel])), shape=(N, N))
    want = (Sa @ Sb).multiply(pat)
    want.eliminate_zeros()
    got = Cm.to_scipy()
    d = abs(got - want)
    assert got.nnz == want.nnz
    assert (d.max() if d.nnz else 0) < 1e-4
