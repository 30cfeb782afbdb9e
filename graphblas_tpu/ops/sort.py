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
    if op is not None:
        ascending = op.name != "GrB_GT"
    A = maybe_transpose(A, desc.transpose0)
    S = A.to_format(SPARSE, ROW)
    rows, cols = S._coords()
    vals = S._vals_expanded()
    nnz = int(vals.shape[0])
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
