"""Host-side tests for the one-hot SpMV bucket-grid Plan (the no-plan
TPU fallback tier of ops/mxm.spmv_arrays).  The Pallas kernel body is
TPU-only (PrefetchScalarGridSpec + pltpu.bitcast do not interpret), but
the Plan layout is pure numpy and its invariants — every entry lands in
its bucket's chunk range with its value, padding slots are exact no-ops
(col=0, val=0) — are what the kernel's correctness rides on.

reference analog: the saxpy task-slice invariants of
Source/GB_AxB_saxpy3_slice_balanced.c (entries partitioned into tasks,
every task within its bucket budget)."""

import numpy as np
import scipy.sparse as sps

from graphblas_tpu.kernels import spmv_onehot as OH


def _random_csr(rng, m, n, nnz):
    r = rng.integers(0, m, nnz)
    c = rng.integers(0, n, nnz)
    v = rng.standard_normal(nnz).astype(np.float32)
    S = sps.csr_matrix((v, (r, c)), shape=(m, n))
    S.sum_duplicates()
    return S


def test_plan_layout_reconstructs_matrix(rng):
    m = n = 3 * OH.STRIP // 2          # forces a 2x2 strip grid
    S = _random_csr(rng, m, n, 20000)
    p = OH.Plan(S.indptr, S.indices, S.data, (m, n))
    cenc = np.asarray(p.cenc).reshape(-1)
    renc = np.asarray(p.renc).reshape(-1)
    val = np.asarray(p.val).reshape(-1)
    rc = np.asarray(p.rc)
    # rebuild COO from the plan: chunk k holds strip (rc[k]//nc, rc[k]%nc)
    chunk = np.arange(cenc.shape[0]) // p.cap
    rs, cs = rc[chunk] // p.nc, rc[chunk] % p.nc
    rows = rs * OH.STRIP + renc.astype(np.int64)
    cols = cs * OH.STRIP + cenc.astype(np.int64)
    got = sps.csr_matrix((val, (rows, cols)), shape=(m, n))
    got.sum_duplicates()
    # padding slots contribute val=0 at (strip-local 0,0) — drop explicit 0s
    got.eliminate_zeros()
    want = S.copy()
    want.eliminate_zeros()
    assert (abs(got - want)).max() == 0


def test_plan_chunk_budget_and_padding():
    rng = np.random.default_rng(3)
    m = n = OH.STRIP
    S = _random_csr(rng, m, n, 50000)
    p = OH.Plan(S.indptr, S.indices, S.data, (m, n))
    assert p.cap % 128 == 0 and p.cap <= OH.MAXCAP
    assert p.nchunks % OH.CPS == 0
    assert p.padded_frac >= 1.0
    # every real entry is in some chunk: total vals match
    assert np.count_nonzero(np.asarray(p.val)) == np.count_nonzero(S.data)


def test_plan_for_identity_cache():
    rng = np.random.default_rng(4)
    m = n = 1024
    S = _random_csr(rng, m, n, 5000)
    ip, ix, vv = S.indptr, S.indices, S.data
    p1 = OH.plan_for(ip, ix, vv, (m, n))
    p2 = OH.plan_for(ip, ix, vv, (m, n))
    assert p1 is p2                     # hit: same arrays
    vv2 = vv.copy()
    p3 = OH.plan_for(ip, ix, vv2, (m, n))
    assert p3 is not p1                 # different values => new plan


def test_eligible_gates_backend_and_size():
    # on the CPU test backend the kernel must never be selected
    assert not OH.eligible(1024, 1024, 100)
