"""The numpy fallback paths behind every native fast sweep must stay
byte-identical to the native results — they are the portability story on
hosts without the C library (reference analog: generic kernels backing
every factory kernel, Source/GB_AxB_saxpy3.c generic path)."""

import numpy as np
import pytest

from graphblas_tpu.kernels import spmv_route as SPRT
from graphblas_tpu.kernels import static_route as SRT
from graphblas_tpu.utils import native as NV


def _random_csr(rng, n, deg):
    import scipy.sparse as sps
    r = np.repeat(np.arange(n, dtype=np.int64), deg)
    c = rng.integers(0, n, n * deg)
    v = rng.standard_normal(n * deg).astype(np.float32)
    S = sps.csr_matrix((v, (r, c)), shape=(n, n))
    S.sum_duplicates()
    return S


def test_monotone_pack_numpy_matches_native(rng, monkeypatch):
    R = 256
    T = 3
    marked = np.stack([np.sort(rng.choice(R * 128, 700, replace=False))
                       for _ in range(T)]).astype(np.int64)
    fast = NV.monotone_pack(marked, R)
    assert fast is not None
    monkeypatch.setattr(NV, "monotone_pack", lambda *a, **k: None)
    slow = SRT.monotone_pack_plan(marked, R)
    assert np.array_equal(fast[0], slow[0])
    assert np.array_equal(fast[1], slow[1])


def test_monotone_pack_rejects_bad_R():
    marked = np.arange(8, dtype=np.int64)[None, :]
    assert NV.monotone_pack(marked, 48) is None  # not a power of two


def test_plan_numpy_fallback_pipeline(rng, monkeypatch):
    """Build a full SpmvRoutePlan with every native sweep disabled; the
    numpy pipeline must produce a working plan (checked through the
    interpret-mode executor on a small graph)."""
    n, deg = 1024, 4
    S = _random_csr(rng, n, deg)
    # every native sweep with a numpy twin (rank_by_key/sort_by_key_i32
    # are load-bearing primitives with no twin; fill_assign/free_src_counts
    # only run inside the native fill_counts branch)
    for fn in ("gather_pack", "gather_finalize", "fill_counts",
               "route_perm", "monotone_pack"):
        monkeypatch.setattr(NV, fn, lambda *a, **k: None)
    plan = SPRT.SpmvRoutePlan(S.indptr.astype(np.int32),
                              S.indices.astype(np.int32),
                              S.data, (n, n))
    x = rng.standard_normal(n).astype(np.float32)
    y = np.asarray(SPRT.spmv_route(x, plan, interpret=True))
    want = S @ x
    err = np.abs(y - want).max() / (np.abs(want).max() + 1e-30)
    assert err < 1e-3


def test_plan_native_and_numpy_agree(rng):
    n, deg = 512, 6
    S = _random_csr(rng, n, deg)
    p_nat = SPRT.SpmvRoutePlan(S.indptr.astype(np.int32),
                               S.indices.astype(np.int32),
                               S.data, (n, n))
    x = rng.standard_normal(n).astype(np.float32)
    y = np.asarray(SPRT.spmv_route(x, p_nat, interpret=True))
    want = S @ x
    assert np.abs(y - want).max() / np.abs(want).max() < 1e-3
