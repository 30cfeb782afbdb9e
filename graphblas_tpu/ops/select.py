"""GrB_select: keep entries passing an IndexUnaryOp predicate (reference:
Source/GB_select.h — sparse phase1/phase2 + bitmap paths + positional
specializations; 6.2k LoC there collapse to one predicated compaction)."""

from __future__ import annotations

import jax.numpy as jnp

from ..core import config as CFG
from ..core.descriptor import NULL, Descriptor
from ..core.matrix import BITMAP, FULL, HYPER, INDEX, SPARSE, Matrix
from ..core.ops import IndexUnaryOp
from ..kernels import segment as K
from .masker import writeback
from .transpose import maybe_transpose


def select(A: Matrix, op: IndexUnaryOp, thunk=0, *, C=None, mask=None,
           accum=None, desc: Descriptor = NULL, out_dtype=None):
    A = maybe_transpose(A, desc.transpose0)
    thunk = jnp.asarray(thunk)
    CFG.burble("select %s (%s)", op.name, A.fmt)
    if A.fmt in (BITMAP, FULL):
        v, p = A.to_dense_pair()
        ii = jnp.broadcast_to(jnp.arange(A.nrows, dtype=jnp.int64)[:, None],
                              A.shape)
        jj = jnp.broadcast_to(jnp.arange(A.ncols, dtype=jnp.int64)[None, :],
                              A.shape)
        keep = (op.fn(v, ii, jj, thunk) != 0) & p
        zv = jnp.where(keep, v, jnp.zeros((), A.dtype.np_dtype))
        Tm = Matrix(A.shape, A.dtype, BITMAP, A.orient, values=zv,
                    bitmap=keep)
    else:
        S = A.to_format(SPARSE) if A.fmt == HYPER else A
        rows, cols = S._coords()
        vals = S._vals_expanded()
        keep = op.fn(vals, rows.astype(jnp.int64), cols.astype(jnp.int64),
                     thunk) != 0
        vec, idx = (rows, cols) if S.orient == "row" else (cols, rows)
        cnt, (fvec, fidx, fv) = K.compact(keep, vec, idx, vals)
        indptr = K.indptr_from_sorted(fvec, S._nvec_dim(), INDEX)
        Tm = Matrix(A.shape, A.dtype, SPARSE, S.orient, indptr=indptr,
                    indices=fidx, values=fv)
    klass = type(A) if C is None else None
    return writeback(C, mask, accum, Tm, desc, out_dtype, out_class=klass)
