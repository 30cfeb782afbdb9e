"""Element access: extractElement / isStoredElement (reference:
Source/GB_Element.h, GB_setElement.c — set/remove live on Matrix via the
pending-tuple queue)."""

from __future__ import annotations

import numpy as np

from ..core import errors as E
from ..core.matrix import BITMAP, FULL, HYPER, ROW, SPARSE
from ..kernels import segment as K


def _locate(A, i, j):
    """(found: bool, flat position into A.indices) for sparse formats."""
    import jax.numpy as jnp
    if A.orient == ROW:
        vec, idx = i, j
    else:
        vec, idx = j, i
    if A.fmt == HYPER:
        # hyper-hash analog (reference: GB_hyper_hash_lookup.h): direct
        # lookup of vec in the hyperlist, no hyper->sparse conversion
        hh = np.asarray(A.h)
        p = int(np.searchsorted(hh, vec))
        if p >= len(hh) or hh[p] != vec:
            return False, 0
        S = A
        lo = int(S.indptr[p])
        hi = int(S.indptr[p + 1])
    else:
        S = A
        lo = int(S.indptr[vec])
        hi = int(S.indptr[vec + 1])
    if lo == hi:
        return False, 0
    seg = np.asarray(S.indices[lo:hi])
    p = np.searchsorted(seg, idx)
    if p < len(seg) and seg[p] == idx:
        return True, lo + int(p)
    return False, 0


def is_stored(A, i, j) -> bool:
    i, j = int(i), int(j)
    if not (0 <= i < A.nrows and 0 <= j < A.ncols):
        raise E.InvalidIndex(f"({i},{j}) outside {A.shape}")
    if A.fmt == FULL:
        return True
    if A.fmt == BITMAP:
        return bool(A.bitmap[i, j])
    found, _ = _locate(A, i, j)
    return found


def extract_element(A, i, j):
    i, j = int(i), int(j)
    if not (0 <= i < A.nrows and 0 <= j < A.ncols):
        raise E.InvalidIndex(f"({i},{j}) outside {A.shape}")
    if A.fmt == FULL:
        v = A.iso_value() if A.iso else A.values[i, j]
        return np.asarray(v)[()]
    if A.fmt == BITMAP:
        if not bool(A.bitmap[i, j]):
            raise E.NoValue((i, j))
        v = A.iso_value() if A.iso else A.values[i, j]
        return np.asarray(v)[()]
    found, pos = _locate(A, i, j)
    if not found:
        raise E.NoValue((i, j))
    v = A.iso_value() if A.iso else A.values[pos]
    return np.asarray(v)[()]
