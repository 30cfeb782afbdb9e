"""GrB_Matrix_diag / GxB_Vector_diag (reference: Source/GB_Matrix_diag.c,
GxB_Vector_diag)."""

from __future__ import annotations

import jax.numpy as jnp

from ..core import errors as E
from ..core.matrix import BITMAP, FULL, HYPER, INDEX, ROW, SPARSE, Matrix, Vector
from ..kernels import segment as K


def diag(v, k: int = 0) -> Matrix:
    """Matrix with vector v on the k-th diagonal (GrB_Matrix_diag)."""
    n = v.nrows
    dim = n + abs(k)
    Vs = v.to_format(SPARSE)
    pos, _ = Vs._coords()
    vals = Vs._vals_expanded()
    rows = pos.astype(jnp.int64) + (0 if k >= 0 else -k)
    cols = pos.astype(jnp.int64) + (k if k >= 0 else 0)
    # already sorted by row (pos ascending)
    indptr = K.indptr_from_sorted(rows, dim, INDEX)
    return Matrix((dim, dim), v.dtype, SPARSE, ROW, indptr=indptr,
                  indices=cols.astype(INDEX), values=vals)


def vector_diag(A: Matrix, k: int = 0) -> Vector:
    """v = k-th diagonal of A (GxB_Vector_diag)."""
    m, n = A.shape
    if k >= 0:
        dlen = min(m, n - k)
    else:
        dlen = min(m + k, n)
    if dlen <= 0:
        raise E.InvalidValue(f"diagonal {k} outside matrix {A.shape}")
    S = A.to_format(SPARSE, ROW) if A.fmt != SPARSE else A.to_orient(ROW)
    rows, cols = S._coords()
    on_diag = cols.astype(jnp.int64) - rows.astype(jnp.int64) == k
    cnt, (dr, dv) = K.compact(on_diag, rows, S._vals_expanded())
    pos = dr.astype(jnp.int64) - (0 if k >= 0 else -k)
    indptr = jnp.asarray([0, cnt], INDEX)
    return Vector((dlen, 1), A.dtype, SPARSE,
                  indptr=indptr, indices=pos.astype(INDEX), values=dv)
