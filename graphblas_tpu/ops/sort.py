"""GxB_Matrix_sort: sort values within each row (or column via transpose
descriptor) — reference: Source/GB_sort.c.  One lax.sort with two keys
(row-segment, value) replaces the typed parallel mergesorts
(GB_msort_1/2/3)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core import config as CFG
from ..core.descriptor import NULL, Descriptor
from ..core.matrix import HYPER, INDEX, ROW, SPARSE, Matrix
from ..core.ops import BinaryOp
from ..kernels import segment as K
from .transpose import maybe_transpose


def sort(A: Matrix, op: BinaryOp | None = None, *, ascending=True,
         desc: Descriptor = NULL):
    """Returns (C, P): C(i,k) = k-th sorted value of row i (entries packed
    left), P(i,k) = original column index.  ``op`` may be a comparator
    BinaryOp (LT for ascending — the default — or GT for descending)."""
    user_cmp = None
    if op is not None:
        if op.name == "GrB_GT":
            ascending = False
        elif op.name == "GrB_LT":
            ascending = True
        else:
            # arbitrary user comparator (reference: GB_sort.c:9-24 sorts
            # under ANY binop defining a strict weak order).  A general
            # comparator admits no key transform, so this tier sorts on
            # the host with functools.cmp_to_key over the comparator —
            # functional parity; the LT/GT fast path stays on-device.
            user_cmp = op
    A = maybe_transpose(A, desc.transpose0)
    S = A.to_format(SPARSE, ROW)
    rows, cols = S._coords()
    vals = S._vals_expanded()
    nnz = int(vals.shape[0])
    if user_cmp is not None:
        return _sort_user_cmp(A, S, rows, cols, vals, nnz, user_cmp)
    CFG.burble("sort: %d entries %s", nnz, "asc" if ascending else "desc")
    if nnz == 0:
        C = Matrix(A.shape, A.dtype, SPARSE, ROW)
        P = Matrix(A.shape, A.dtype, SPARSE, ROW)
        return C, P
    sv = vals if ascending else _neg_order(vals)
    srows, svals_k, svals, scols = jax.lax.sort(
        (rows.astype(jnp.int64), sv, vals, cols.astype(jnp.int64)),
        num_keys=2)
    # rank within row = position - row start
    starts = S.indptr.astype(jnp.int64)[srows]
    rank = jnp.arange(nnz, dtype=jnp.int64) - starts
    indptr = S.indptr
    C = Matrix(A.shape, A.dtype, SPARSE, ROW, indptr=indptr,
               indices=rank.astype(INDEX), values=svals)
    from ..core import types as T
    P = Matrix(A.shape, T.INT64, SPARSE, ROW, indptr=indptr,
               indices=rank.astype(INDEX), values=scols)
    return C, P


def _neg_order(vals):
    dt = np.dtype(vals.dtype)
    if np.issubdtype(dt, np.bool_):
        return ~vals
    return -vals.astype(np.float64) if np.issubdtype(dt, np.unsignedinteger) \
        else -vals


def _sort_user_cmp(A, S, rows, cols, vals, nnz, op):
    """Host comparator tier for GxB_Matrix_sort with a user binop."""
    import functools as _ft
    CFG.burble("sort: %d entries user comparator (host tier)", nnz)
    from ..core import types as T
    if nnz == 0:
        C = Matrix(A.shape, A.dtype, SPARSE, ROW)
        P = Matrix(A.shape, T.INT64, SPARSE, ROW)
        return C, P
    rows_h = np.asarray(rows)
    cols_h = np.asarray(cols)
    vals_h = np.asarray(vals)
    fn = op.fn

    def cmp(a, b):
        if bool(np.asarray(fn(jnp.asarray(vals_h[a]),
                              jnp.asarray(vals_h[b])))):
            return -1
        if bool(np.asarray(fn(jnp.asarray(vals_h[b]),
                              jnp.asarray(vals_h[a])))):
            return 1
        return 0

    order = np.empty(nnz, np.int64)
    ip = np.asarray(S.indptr)
    key = _ft.cmp_to_key(cmp)
    for r in range(A.nrows):
        lo, hi = int(ip[r]), int(ip[r + 1])
        seg = sorted(range(lo, hi), key=key)
        order[lo:hi] = seg
    svals = jnp.asarray(vals_h[order])
    scols = jnp.asarray(cols_h[order].astype(np.int64))
    rank = jnp.arange(nnz, dtype=jnp.int64) - \
        S.indptr.astype(jnp.int64)[jnp.asarray(rows_h[order])]
    C = Matrix(A.shape, A.dtype, SPARSE, ROW, indptr=S.indptr,
               indices=rank.astype(INDEX), values=svals)
    P = Matrix(A.shape, T.INT64, SPARSE, ROW, indptr=S.indptr,
               indices=rank.astype(INDEX), values=scols)
    return C, P
