"""GxB_Matrix_resize / GxB_Matrix_reshape (reference: Source/GB_resize.c,
GB_reshape.c)."""

from __future__ import annotations

import jax.numpy as jnp

from ..core import errors as E
from ..core.matrix import BITMAP, FULL, HYPER, INDEX, ROW, SPARSE, Matrix
from ..kernels import segment as K


def resize(A: Matrix, nrows: int, ncols: int) -> Matrix:
    """Change dimensions in place semantics (returns new matrix); entries
    outside the new bounds are dropped."""
    if A._pending:
        A.wait()
    if (nrows, ncols) == A.shape:
        return A.dup()
    if A.fmt in (BITMAP, FULL):
        v, p = A.to_dense_pair()
        nv = jnp.zeros((nrows, ncols), A.dtype.np_dtype)
        npat = jnp.zeros((nrows, ncols), bool)
        rmin, cmin = min(nrows, A.nrows), min(ncols, A.ncols)
        nv = nv.at[:rmin, :cmin].set(v[:rmin, :cmin])
        npat = npat.at[:rmin, :cmin].set(p[:rmin, :cmin])
        return Matrix((nrows, ncols), A.dtype, BITMAP, A.orient, values=nv,
                      bitmap=npat)
    S = A.to_format(SPARSE) if A.fmt == HYPER else A
    rows, cols = S._coords()
    keep = (rows < nrows) & (cols < ncols)
    cnt, (kr, kc, kv) = K.compact(keep, rows, cols, S._vals_expanded())
    vec, idx, nvec, veclen = ((kr, kc, nrows, ncols) if S.orient == ROW
                              else (kc, kr, ncols, nrows))
    indptr = K.indptr_from_sorted(vec, nvec, INDEX)  # order preserved
    return Matrix((nrows, ncols), A.dtype, SPARSE, S.orient, indptr=indptr,
                  indices=idx, values=kv)


def reshape(A: Matrix, nrows: int, ncols: int, by_col: bool = True) -> Matrix:
    """Reinterpret entries by linear index (GxB_Matrix_reshape); by_col
    matches the reference default (column-major linearization)."""
    if nrows * ncols != A.nrows * A.ncols:
        raise E.DimensionMismatch(
            f"reshape: {A.shape} -> ({nrows},{ncols}) size mismatch")
    S = A.to_format(SPARSE, ROW) if A.fmt != SPARSE else A.to_orient(ROW)
    rows, cols = S._coords()
    if by_col:
        lin = cols.astype(jnp.int64) * A.nrows + rows.astype(jnp.int64)
        nr = (lin % nrows).astype(jnp.int64)
        nc = (lin // nrows).astype(jnp.int64)
    else:
        lin = rows.astype(jnp.int64) * A.ncols + cols.astype(jnp.int64)
        nr = (lin // ncols).astype(jnp.int64)
        nc = (lin % ncols).astype(jnp.int64)
    vals = S._vals_expanded()
    order, skeys = K.sort_coo(nr, nc, ncols)
    svec, sidx = K.key_split(skeys, ncols)
    indptr = K.indptr_from_sorted(svec, nrows, INDEX)
    return Matrix((nrows, ncols), A.dtype, SPARSE, ROW, indptr=indptr,
                  indices=sidx, values=vals[order])
