"""GrB_extract: C<M> = accum(C, A(I,J)) (reference: Source/GB_subref.c,
GB_extract.c — 12 fine-task subref methods collapse to a vectorized
renumber+compact, with a dense gather path for duplicate indices)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core import config as CFG
from ..core import errors as E
from ..core.descriptor import NULL, Descriptor
from ..core.matrix import BITMAP, FULL, HYPER, INDEX, ROW, SPARSE, Matrix, Vector
from ..kernels import segment as K
from .masker import writeback
from .transpose import maybe_transpose


def normalize_index(I, n: int) -> np.ndarray:
    """Resolve GrB_ALL / slice (GxB_RANGE/STRIDE/BACKWARDS analog) / array
    to a concrete numpy index array."""
    if I is None:
        return np.arange(n, dtype=np.int64)
    if isinstance(I, slice):
        return np.arange(*I.indices(n), dtype=np.int64)
    if isinstance(I, range):
        return np.asarray(list(I), dtype=np.int64)
    arr = np.asarray(I, dtype=np.int64).reshape(-1)
    if arr.size and (arr.min() < 0 or arr.max() >= n):
        raise E.IndexOutOfBounds(f"index out of range [0,{n})")
    return arr


def extract(A: Matrix, I=None, J=None, *, C=None, mask=None, accum=None,
            desc: Descriptor = NULL, out_dtype=None, out_class=None):
    A = maybe_transpose(A, desc.transpose0)
    Iv = normalize_index(I, A.nrows)
    Jv = normalize_index(J, A.ncols)
    if isinstance(A, Vector) or (A.ncols == 1 and out_class is Vector):
        out_class = out_class or Vector
    Tm = extract_pattern(A, Iv, Jv)
    return writeback(C, mask, accum, Tm, desc, out_dtype,
                     out_class=out_class)


def extract_pattern(A: Matrix, Iv: np.ndarray, Jv: np.ndarray) -> Matrix:
    """A(I,J) with renumbered indices (no accum/mask)."""
    ni, nj = len(Iv), len(Jv)
    dup_i = len(np.unique(Iv)) != ni
    dup_j = len(np.unique(Jv)) != nj
    if A.fmt in (BITMAP, FULL) or dup_i or dup_j:
        CFG.burble("extract: dense gather path")
        v, p = A.to_dense_pair()
        ii = jnp.asarray(Iv)
        jj = jnp.asarray(Jv)
        sv = v[ii][:, jj]
        sp = p[ii][:, jj]
        out = Matrix((ni, nj), A.dtype, BITMAP, A.orient, values=sv,
                     bitmap=sp)
        return out
    CFG.burble("extract: sparse renumber path")
    S = A.to_format(SPARSE) if A.fmt == HYPER else A
    # selection masks + new-index maps
    row_map = np.full(A.nrows, -1, np.int64)
    row_map[Iv] = np.arange(ni)
    col_map = np.full(A.ncols, -1, np.int64)
    col_map[Jv] = np.arange(nj)
    rm = jnp.asarray(row_map)
    cm = jnp.asarray(col_map)
    nnz = int(S.indices.shape[0])
    by_row = S.orient == ROW
    nvec, veclen = (ni, nj) if by_row else (nj, ni)
    vals = S._vals_expanded()
    cnt_d, nr, nc = _extract_phase1(S._nvec_dim())(
        S.indptr, S.indices, rm, cm)
    cnt = int(cnt_d)
    if cnt == 0:
        return Matrix((ni, nj), A.dtype, SPARSE, S.orient,
                      indptr=jnp.zeros(nvec + 1, INDEX),
                      indices=jnp.zeros(0, INDEX), values=vals[:0])
    if cnt * 4 >= nnz:
        # one fused sentinel-sort pipeline (dropped entries sort last);
        # one dispatch replaces the eager compact+sort+split+indptr tail
        indptr, sidx, svals = _extract_finish(nvec, veclen, by_row)(
            nr, nc, vals)
        return Matrix((ni, nj), A.dtype, SPARSE, S.orient, indptr=indptr,
                      indices=sidx[:cnt], values=svals[:cnt])
    # sparse selection (cnt << nnz): compact first, then sort the survivors
    keep = (nr >= 0) & (nc >= 0)
    src = K._compact_gather(keep, cnt)
    kr, kc, kv = nr[src], nc[src], vals[src]
    vec, idx = (kr, kc) if by_row else (kc, kr)
    keys = K.make_key(vec, idx, veclen)
    skeys, svals = K.sort_with_payload(keys, kv)
    svec, sidx = K.key_split(skeys, veclen)
    indptr = K.indptr_from_sorted(svec, nvec, INDEX)
    return Matrix((ni, nj), A.dtype, SPARSE, S.orient, indptr=indptr,
                  indices=sidx, values=svals)


_extract_jits: dict = {}


def _extract_phase1(store_nvec: int):
    """Jitted renumber + keep-count (one dispatch)."""
    import jax
    key = ("p1", store_nvec)
    fn = _extract_jits.get(key)
    if fn is None:
        def run(indptr, indices, rm, cm):
            nnz = indices.shape[0]
            rows = K.expand_rowids(indptr, nnz, store_nvec)
            nr = rm[rows]
            nc = cm[indices]
            cnt = jnp.sum(((nr >= 0) & (nc >= 0)).astype(jnp.int64))
            return cnt, nr, nc

        fn = jax.jit(run)
        _extract_jits[key] = fn
    return fn


def _extract_finish(nvec: int, veclen: int, by_row: bool):
    """Jitted sentinel-sort finisher: dropped entries get a sentinel key
    and sort last; counts scatter-drop them, callers slice [:cnt]."""
    import jax
    key = ("fin", nvec, veclen, by_row)
    fn = _extract_jits.get(key)
    if fn is None:
        SENT = jnp.int64(2**62)

        def run(nr, nc, vals):
            vec, idx = (nr, nc) if by_row else (nc, nr)
            keep = (nr >= 0) & (nc >= 0)
            keys = jnp.where(keep,
                             vec.astype(jnp.int64) * veclen
                             + idx.astype(jnp.int64), SENT)
            skeys, svals = K.sort_with_payload(keys, vals)
            svec = jnp.where(skeys != SENT, skeys // veclen,
                             nvec).astype(jnp.int32)
            sidx = (skeys % veclen).astype(INDEX)
            indptr = K.indptr_from_sorted(svec, nvec, INDEX)
            return indptr, sidx, svals

        fn = jax.jit(run)
        if len(_extract_jits) > 64:
            _extract_jits.clear()
        _extract_jits[key] = fn
    return fn
