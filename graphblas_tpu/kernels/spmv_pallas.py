"""Pallas SpMV kernel (plus-times, fp32/fp64): the saxpy-family hot-path
replacement (reference: Source/GB_AxB_saxpy3*, Template/GB_AxB_saxpy5_*).

TPU-native design:
  * "Sliced-ELL" layout: rows grouped into blocks of RB rows; each block's
    entries padded to the block-max capacity (rounded to the lane width).
    Padding entries carry (col=0, val=0) — a no-op under plus-times.
  * The dense x vector lives wholly in VMEM (eligibility-gated by size);
    column gathers are VMEM-local, never HBM random access.
  * Per-block accumulation is scatter-free: entries are reduced onto the
    block's RB rows with a one-hot x product matmul on the MXU (the
    Gustavson dense-accumulator idea, recast for a systolic array).
  * The grid streams entry blocks HBM->VMEM with automatic double
    buffering (one pl.BlockSpec per operand).

Falls back (ops/mxm.spmv_arrays) to the XLA gather+segment-sum path when
ineligible.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RB = 256          # rows per block
TILE = 1024       # entries reduced per MXU step
VMEM_BUDGET = 96 * 1024 * 1024  # v5e VMEM is 128 MiB; leave headroom


def eligible(m: int, n: int, nnz: int) -> bool:
    # x + y + entry buffers must fit VMEM comfortably
    return (n * 4 + RB * 4) < VMEM_BUDGET // 4 and nnz > 0


class Plan:
    """Cached sliced-ELL repack of one CSR matrix."""

    __slots__ = ("lrow", "col", "val", "nb", "cap", "m")

    def __init__(self, indptr, indices, values, m):
        ip = np.asarray(indptr)
        nb = -(-m // RB)
        starts = ip[np.minimum(np.arange(nb) * RB, m)]
        ends = ip[np.minimum(np.arange(1, nb + 1) * RB, m)]
        cap = int((ends - starts).max()) if nb else 0
        cap = max(-(-cap // TILE) * TILE, TILE)
        idx = np.asarray(indices)
        val = np.asarray(values)
        lrow = np.zeros((nb, cap), np.int32)
        col = np.zeros((nb, cap), np.int32)
        v = np.zeros((nb, cap), val.dtype)
        rowids = np.repeat(np.arange(m, dtype=np.int32), np.diff(ip))
        for b in range(nb):
            s, e = starts[b], ends[b]
            k = e - s
            lrow[b, :k] = rowids[s:e] - b * RB
            col[b, :k] = idx[s:e]
            v[b, :k] = val[s:e]
            lrow[b, k:] = RB  # padding -> dropped row
        self.lrow = jnp.asarray(lrow)
        self.col = jnp.asarray(col)
        self.val = jnp.asarray(v)
        self.nb, self.cap, self.m = nb, cap, m


_plan_cache: dict = {}


def plan_for(indptr, indices, values, m) -> Plan:
    # See spmv_onehot.plan_for: strong refs pin the ids, identity
    # re-checked on hit, so address reuse can't serve a stale plan.
    key = (id(indptr), id(indices), id(values), m)
    ent = _plan_cache.get(key)
    if ent is not None and ent[0] is indptr and ent[1] is indices \
            and ent[2] is values:
        return ent[3]
    if len(_plan_cache) > 16:
        _plan_cache.clear()
    p = Plan(indptr, indices, values, m)
    _plan_cache[key] = (indptr, indices, values, p)
    return p


def _kernel(lrow_ref, col_ref, val_ref, x_ref, y_ref):
    cap = col_ref.shape[1]
    x = x_ref[:]
    acc = jnp.zeros((RB, 1), jnp.float32)
    for t in range(cap // TILE):
        sl = pl.ds(t * TILE, TILE)
        cols = col_ref[0, sl]
        vals = val_ref[0, sl]
        lrow = lrow_ref[0, sl]
        g = x[cols]                      # VMEM gather
        prod = (vals * g).astype(jnp.float32)
        onehot = (lrow[None, :] == jax.lax.broadcasted_iota(
            jnp.int32, (RB, TILE), 0)).astype(jnp.float32)
        acc = acc + jax.lax.dot_general(
            onehot, prod[:, None],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    y_ref[0, :] = acc[:, 0]


def spmv(indptr, indices, values, x, m: int):
    """y = A @ x (plus-times) via the sliced-ELL Pallas kernel."""
    p = plan_for(indptr, indices, values, m)
    n = x.shape[0]
    xf = x.astype(jnp.float32)
    y = pl.pallas_call(
        _kernel,
        grid=(p.nb,),
        in_specs=[
            pl.BlockSpec((1, p.cap), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p.cap), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p.cap), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n,), lambda b: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, RB), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p.nb, RB), jnp.float32),
    )(p.lrow, p.col, p.val.astype(jnp.float32), xf)
    return y.reshape(-1)[:m].astype(x.dtype)
