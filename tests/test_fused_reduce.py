"""Fused mxm+reduce (mxm_reduce_scalar): equality with the public
mxm + reduce_scalar pair, and engagement of the fused SELL path
(round-4; reference pipeline: GB_AxB_dot3 + GB_reduce_to_scalar)."""

import numpy as np
import pytest
import scipy.sparse as sps

import graphblas_tpu as gb
from graphblas_tpu.core import semiring as SR
from graphblas_tpu.core import monoid as MON
from graphblas_tpu.core import types as T
from graphblas_tpu.core.descriptor import Descriptor
from graphblas_tpu.ops.mxm import mxm_reduce_scalar


def _rand(n, nnz, seed):
    rng = np.random.default_rng(seed)
    S = sps.csr_matrix(
        (rng.integers(1, 5, nnz).astype(np.float32),
         (rng.integers(0, n, nnz), rng.integers(0, n, nnz))),
        shape=(n, n))
    S.sum_duplicates()
    return S


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("structure", [True, False])
def test_fused_equals_unfused_masked(seed, structure):
    S = _rand(200, 1400, seed)
    A = gb.Matrix.from_scipy(S)
    M = gb.select(A, gb.operators.TRIL, -1)
    d = Descriptor(mask_structure=structure, transpose1=True)
    acc = mxm_reduce_scalar(M, M, SR.PLUS_PAIR, mask=M, desc=d)
    C = gb.mxm(M, M, SR.PLUS_PAIR, mask=M, desc=d, out_dtype=T.INT64)
    want = int(gb.reduce_scalar(C, MON.PLUS, out_dtype=T.INT64))
    assert acc is not None, "fused path must engage for plus_pair int"
    assert int(acc) == want


def test_fused_unmasked_plus_times_int():
    S = _rand(150, 900, 7)
    A = gb.Matrix.from_scipy(S)
    Ai = A.astype(T.INT32)
    acc = mxm_reduce_scalar(Ai, Ai, SR.PLUS_TIMES)
    C = gb.mxm(Ai, Ai, SR.PLUS_TIMES, out_dtype=T.INT64)
    want = int(gb.reduce_scalar(C, MON.PLUS, out_dtype=T.INT64))
    if acc is not None:
        assert int(acc) == want


def test_fused_declines_float():
    S = _rand(100, 500, 3)
    A = gb.Matrix.from_scipy(S)
    # float ztype: fused path declines (int-exact accumulators only)
    assert mxm_reduce_scalar(A, A, SR.PLUS_TIMES) is None


@pytest.mark.parametrize("comp", [True, False])
def test_fused_masked_complement(comp):
    """pair1 kernel's want_token branches (round-4 1-plane counter)."""
    S = _rand(180, 1300, 5)
    A = gb.Matrix.from_scipy(S)
    M = gb.select(A, gb.operators.TRIL, -1)
    d = Descriptor(mask_structure=True, mask_complement=comp,
                   transpose1=True)
    acc = mxm_reduce_scalar(M, M, SR.PLUS_PAIR, mask=M, desc=d)
    C = gb.mxm(M, M, SR.PLUS_PAIR, mask=M, desc=d, out_dtype=T.INT64)
    want = int(gb.reduce_scalar(C, MON.PLUS, out_dtype=T.INT64))
    assert acc is not None
    assert int(acc) == want
