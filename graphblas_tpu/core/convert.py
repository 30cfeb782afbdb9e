"""Format & conversion engine (reference: Source/GB_convert_*.c — 20 files,
GB_conform.c, hyper<->sparse<->bitmap<->full rules in GB_matrix.h:394-458).

All conversions are device-side array programs; bitmap->sparse needs one
host sync of nnz (the static-shape tax, paid exactly where the reference
pays a malloc)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from . import config as CFG
from . import errors as E
from .matrix import BITMAP, COL, FULL, HYPER, INDEX, ROW, SPARSE, Matrix


def _clone(a: Matrix, **kw) -> Matrix:
    obj = object.__new__(type(a))
    obj.shape, obj.dtype = a.shape, a.dtype
    obj.fmt, obj.orient, obj.iso = a.fmt, a.orient, a.iso
    obj.indptr, obj.h, obj.indices, obj.values, obj.bitmap = (
        a.indptr, a.h, a.indices, a.values, a.bitmap)
    obj._pending, obj._nvals_cache, obj.name = [], None, a.name
    for k, v in kw.items():
        setattr(obj, k, v)
    return obj


def convert(a: Matrix, fmt: str, orient: str) -> Matrix:
    CFG.burble("convert %s/%s -> %s/%s", a.fmt, a.orient, fmt, orient)
    # normalize via sparse when crossing both format and orientation
    if a.fmt == HYPER:
        a = _hyper_to_sparse(a)
    if a.fmt == fmt and a.orient == orient:
        return a
    if fmt in (BITMAP, FULL):
        # orientation is metadata-only for dense layouts
        if a.fmt == SPARSE:
            return _sparse_to_dense(a, fmt, orient)
        if a.fmt == BITMAP and fmt == FULL:
            return _bitmap_to_full(a, orient)
        if a.fmt == FULL and fmt == BITMAP:
            return _clone(a, fmt=BITMAP, orient=orient,
                          bitmap=jnp.ones(a.shape, bool))
        return _clone(a, orient=orient)
    # target is sparse or hyper
    if a.fmt in (BITMAP, FULL):
        a = _dense_to_sparse(a, orient)
    elif a.orient != orient:
        a = _sparse_reorient(a, orient)
    if fmt == HYPER:
        a = _sparse_to_hyper(a)
    return a


# -- hyper <-> sparse (reference: GB_convert_hyper_to_sparse.c and back) ----

def _hyper_to_sparse(a: Matrix) -> Matrix:
    nvec = a._nvec_dim()
    nh = int(a.h.shape[0])
    full_ptr = jnp.zeros(nvec + 1, INDEX)
    if nh:
        # counts per listed vector scattered to the full vector space
        counts = jnp.diff(a.indptr)
        allcounts = jnp.zeros(nvec, INDEX).at[a.h].set(counts)
        full_ptr = jnp.concatenate([jnp.zeros(1, INDEX),
                                    jnp.cumsum(allcounts).astype(INDEX)])
    return _clone(a, fmt=SPARSE, h=None, indptr=full_ptr)


def _sparse_to_hyper(a: Matrix) -> Matrix:
    counts = jnp.diff(a.indptr)
    nonempty = counts > 0
    nh = int(jnp.sum(nonempty))
    from ..kernels import segment as K
    _, (h,) = K.compact(nonempty, jnp.arange(a._nvec_dim(), dtype=INDEX))
    hptr = jnp.concatenate([jnp.zeros(1, INDEX),
                            jnp.cumsum(counts[h]).astype(INDEX)]) \
        if nh else jnp.zeros(1, INDEX)
    return _clone(a, fmt=HYPER, h=h, indptr=hptr)


# -- sparse -> dense --------------------------------------------------------

def _sparse_to_dense(a: Matrix, fmt: str, orient: str) -> Matrix:
    vals, present = a.to_dense_pair()
    if fmt == FULL:
        if a.nvals != a.nrows * a.ncols:
            raise E.InvalidValue(
                "cannot convert to full: not all entries present")
        return _clone(a, fmt=FULL, orient=orient, indptr=None, indices=None,
                      values=vals, iso=False, bitmap=None)
    return _clone(a, fmt=BITMAP, orient=orient, indptr=None, indices=None,
                  values=vals, iso=False, bitmap=present)


def _bitmap_to_full(a: Matrix, orient: str) -> Matrix:
    if a.nvals != a.nrows * a.ncols:
        raise E.InvalidValue("cannot convert to full: not all entries present")
    return _clone(a, fmt=FULL, orient=orient, bitmap=None,
                  values=a._vals_expanded(), iso=False)


# -- dense -> sparse ---------------------------------------------------------

def _dense_to_sparse(a: Matrix, orient: str) -> Matrix:
    from ..kernels import segment as K
    if a.fmt == FULL:
        present = jnp.ones(a.shape, bool)
    else:
        present = a.bitmap
    vals = a._vals_expanded()
    if orient == COL:
        present_o = present.T
        vals_o = vals.T
        nvec, veclen = a.ncols, a.nrows
    else:
        present_o, vals_o = present, vals
        nvec, veclen = a.nrows, a.ncols
    flat_p = present_o.reshape(-1)
    flat_v = vals_o.reshape(-1)
    pos = jnp.arange(flat_p.shape[0], dtype=jnp.int64)
    nnz, (kept_pos, kept_vals) = K.compact(flat_p, pos, flat_v)
    vec_ids = (kept_pos // veclen).astype(INDEX)
    idx = (kept_pos % veclen).astype(INDEX)
    indptr = K.indptr_from_sorted(vec_ids, nvec, INDEX)
    return _clone(a, fmt=SPARSE, orient=orient, bitmap=None,
                  indptr=indptr, indices=idx, values=kept_vals, iso=False)


# -- sparse orientation flip (CSR <-> CSC): a full sort-based transpose of
#    the storage, NOT of the logical matrix (reference: GB_convert cross
#    product of formats; logical transpose lives in ops/transpose.py) -------

def _sparse_reorient(a: Matrix, orient: str) -> Matrix:
    from ..kernels import segment as K
    rows, cols = a._coords()
    vals = a._vals_expanded()
    if orient == ROW:
        vec_ids, idx, nvec, veclen = rows, cols, a.nrows, a.ncols
    else:
        vec_ids, idx, nvec, veclen = cols, rows, a.ncols, a.nrows
    order, skeys = K.sort_coo(vec_ids, idx, veclen)
    svec, sidx = K.key_split(skeys, veclen)
    indptr = K.indptr_from_sorted(svec, nvec, INDEX)
    return _clone(a, orient=orient, indptr=indptr, indices=sidx,
                  values=vals[order] if not a.iso else a.values)


# -- conform (reference: Source/GB_conform.c — applied after every op) ------

def conform(a: Matrix) -> Matrix:
    """Auto format switching per the global bitmap/hyper switches.  The
    reference's full rule set (GB_matrix.h:394-458) keyed on per-matrix
    sparsity_control; here the op layer already picks output formats
    deliberately, so conform only densifies pathologically dense sparse
    matrices and hyper-izes mostly-empty ones."""
    if a.fmt == SPARSE:
        mn = a.nrows * a.ncols
        if 0 < mn <= 1 << 24 and a.nvals > CFG.GLOBAL.bitmap_switch * mn:
            return a  # keep: bitmap switch disabled by default in round 1
    return a
