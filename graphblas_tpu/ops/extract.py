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
    rows, cols = S._coords()
    # selection masks + new-index maps
    row_map = np.full(A.nrows, -1, np.int64)
    row_map[Iv] = np.arange(ni)
    col_map = np.full(A.ncols, -1, np.int64)
    col_map[Jv] = np.arange(nj)
    rm = jnp.asarray(row_map)
    cm = jnp.asarray(col_map)
    nr = rm[rows]
    nc = cm[cols]
    keep = (nr >= 0) & (nc >= 0)
    vals = S._vals_expanded()
    nnz = int(S.indices.shape[0])
    cnt = int(jnp.sum(keep))
    if cnt == nnz:
        # permutation / GrB_ALL extract keeps everything: skip the three
        # compaction gathers (random gathers are the costly primitive)
        kr, kc, kv = nr, nc, vals
    else:
        src = K._compact_gather(keep, cnt) if cnt else None
        if cnt == 0:
            kr = kc = jnp.zeros(0, nr.dtype)
            kv = vals[:0]
        else:
            kr, kc, kv = nr[src], nc[src], vals[src]
    if S.orient == ROW:
        vec, idx, nvec, veclen = kr, kc, ni, nj
    else:
        vec, idx, nvec, veclen = kc, kr, nj, ni
    # values ride the sort as a fused payload plane (no post-sort gather)
    keys = K.make_key(vec, idx, veclen)
    skeys, svals = K.sort_with_payload(keys, kv)
    svec, sidx = K.key_split(skeys, veclen)
    indptr = K.indptr_from_sorted(svec, nvec, INDEX)
    return Matrix((ni, nj), A.dtype, SPARSE, S.orient, indptr=indptr,
                  indices=sidx, values=svals)
