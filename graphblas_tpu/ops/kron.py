"""GrB_kronecker (reference: Source/GB_kroner.c).  All nnzA*nnzB products
materialize via index arithmetic (no expansion search needed: the product
grid is regular), then one sort builds the output."""

from __future__ import annotations

import jax.numpy as jnp

from ..core import config as CFG
from ..core import types as T
from ..core.descriptor import NULL, Descriptor
from ..core.matrix import BITMAP, FULL, HYPER, INDEX, ROW, SPARSE, Matrix
from ..core.types import cast
from ..kernels import segment as K
from .masker import writeback
from .transpose import maybe_transpose


def kron(A: Matrix, B: Matrix, op, *, C=None, mask=None, accum=None,
         desc: Descriptor = NULL, out_dtype=None):
    A = maybe_transpose(A, desc.transpose0)
    B = maybe_transpose(B, desc.transpose1)
    zt = T.lookup(out_dtype) if out_dtype else op.out_type(A.dtype, B.dtype)
    As = A.to_format(SPARSE, ROW)
    Bs = B.to_format(SPARSE, ROW)
    nnzA = int(As.indices.shape[0])
    nnzB = int(Bs.indices.shape[0])
    m, n = A.shape
    p, q = B.shape
    out_shape = (m * p, n * q)
    CFG.burble("kron: %d x %d products", nnzA, nnzB)
    if nnzA == 0 or nnzB == 0:
        Tm = Matrix(out_shape, zt, SPARSE, ROW)
        return writeback(C, mask, accum, Tm, desc, out_dtype)
    ar, ac = As._coords()
    br, bc = Bs._coords()
    av = As._vals_expanded()
    bv = Bs._vals_expanded()
    F = nnzA * nnzB
    idx = jnp.arange(F, dtype=jnp.int64)
    ea = idx // nnzB
    eb = idx % nnzB
    i = ar[ea].astype(jnp.int64) * p + br[eb].astype(jnp.int64)
    j = ac[ea].astype(jnp.int64) * q + bc[eb].astype(jnp.int64)
    vals = cast(op.fn(av[ea], bv[eb]), zt)
    keys = i * out_shape[1] + j
    order = jnp.argsort(keys)
    skeys = keys[order]
    svec, sidx = K.key_split(skeys, out_shape[1])
    indptr = K.indptr_from_sorted(svec, out_shape[0], INDEX)
    Tm = Matrix(out_shape, zt, SPARSE, ROW, indptr=indptr, indices=sidx,
                values=vals[order])
    return writeback(C, mask, accum, Tm, desc, out_dtype)
