"""Differential test harness: run a library op and its spec-oracle mimic on
random matrices and compare (values + pattern), the way the reference's
Test/test*.m scripts compare GB_mex_* against GB_spec_* (SURVEY.md §4)."""

import numpy as np
import scipy.sparse as sps

import graphblas_tpu as gb
from graphblas_tpu.spec.oracle import SpecMat


def random_gb(rng, m, n, density=0.25, dtype=np.float64, fmt=gb.SPARSE,
              orient=gb.ROW, klass=gb.Matrix):
    """Random matrix in both library and spec form."""
    nnz = max(0, int(round(m * n * density)))
    r = rng.integers(0, m, nnz)
    c = rng.integers(0, n, nnz)
    if np.issubdtype(np.dtype(dtype), np.bool_):
        v = rng.integers(0, 2, nnz).astype(dtype)
    elif np.issubdtype(np.dtype(dtype), np.integer):
        v = rng.integers(-7, 8, nnz).astype(dtype)
    elif np.issubdtype(np.dtype(dtype), np.complexfloating):
        v = (rng.standard_normal(nnz) + 1j * rng.standard_normal(nnz)
             ).astype(dtype)
    else:
        v = rng.standard_normal(nnz).astype(dtype)
    # dedup keeping last (SECOND), matching setElement semantics
    if klass is gb.Vector:
        assert n == 1
        A = gb.Vector.from_coo(r, v, m, dtype=dtype, dup="second")
    else:
        A = gb.Matrix.from_coo(r, c, v, (m, n), dtype=dtype, dup="second",
                               orient=orient)
    if fmt != gb.SPARSE:
        A = A.to_format(fmt)
    return A, SpecMat.from_gb(A)


def random_mask(rng, m, n, density=0.5, klass=gb.Matrix, fmt=gb.SPARSE):
    return random_gb(rng, m, n, density, np.bool_, fmt=fmt, klass=klass)


def assert_matches(got_gb, want_spec: SpecMat, rtol=1e-10, atol=1e-12,
                   msg=""):
    gv, gp = (np.asarray(x) for x in got_gb.to_dense_pair())
    np.testing.assert_array_equal(gp, want_spec.pattern,
                                  err_msg=f"pattern mismatch {msg}")
    wv = want_spec.values
    if np.issubdtype(wv.dtype, np.floating) or np.issubdtype(
            wv.dtype, np.complexfloating):
        np.testing.assert_allclose(gv[gp], wv[want_spec.pattern],
                                   rtol=rtol, atol=atol,
                                   err_msg=f"values mismatch {msg}")
    else:
        np.testing.assert_array_equal(gv[gp], wv[want_spec.pattern],
                                      err_msg=f"values mismatch {msg}")
