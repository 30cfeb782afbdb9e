"""Routing-engine SpMV: gather -> static permutation -> cumsum reduce.

The third-generation SpMV (after the XLA substrate at 0.05 Gnnz/s and the
one-hot MXU kernel at 1.1 Gnnz/s): every data movement is planned on the
host per matrix and executed as static vector ops (see
kernels/static_route.py and experiments/ROUTER_DESIGN.md).

  Stage A (gather+multiply, CSC-window order):  entries are packed so
    row s of a window block holds only entries whose column residue is
    s mod 128; the x-gather is then ONE lane-shuffle
    (take_along_axis(tile(X_w^T, R), hi)) per window — measured
    185 Gelem/s class, and EXACT in fp32 (a selection, not a matmul).
  Stage B (route): global_permute moves products from gather order to
    CSR row-sorted order with one sentinel slot per row and row-aligned
    destination tiles (plan-side dummies carry 0.0, the + identity).
  Stage C (reduce, fused into stage B's phase 2): per destination tile:
    raster cumsum (lane scan + sublane scan), an in-tile selection
    permute bringing each row's end-slot cumsum value to the front
    block, and a shifted difference -> Y_T y-values per tile.  Tiles
    cover exactly Y_T consecutive rows each, so the final y is a
    reshape+slice — no gather anywhere.

Restriction (v1): plus-times over fp32, n <= ~2M (x fits VMEM windows).
The plan is host-built and cached per matrix; building it costs ~O(nnz
log^2) numpy time (the reference analog: building a hypersparse format).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import static_route as SRT

WIN = 16384           # x window (128 sublanes x 128 lanes after transpose)


class GatherPlan:
    """Stage-A packing: entries CSC-windowed and residue-interleaved."""

    __slots__ = ("hi", "val", "W", "RB", "n", "nnz", "eid")

    def __init__(self, indptr, indices, values, shape):
        m, n = shape
        ip = np.asarray(indptr)
        ci = np.asarray(indices).astype(np.int64)
        vv = np.asarray(values).astype(np.float32)
        nnz = ci.shape[0]
        ri = np.repeat(np.arange(m, dtype=np.int64), np.diff(ip))
        W = -(-n // WIN)
        w = ci // WIN
        res = ci & 127
        hi = (ci >> 7) & 127
        # rows cycle through residues: entry with residue r in window w
        # goes to packed row w*RB + (k*128 + r) for its k-th slot
        order = np.argsort(w * 128 + res, kind="stable")
        counts = np.bincount((w * 128 + res)[order], minlength=W * 128)
        kmax = int(counts.max()) if nnz else 1
        RB = (-(-kmax // 128)) * 128        # rows per window (mult of 128)
        starts = np.zeros(W * 128 + 1, np.int64)
        np.cumsum(counts, out=starts[1:])
        slot = np.empty(nnz, np.int64)
        slot[order] = np.arange(nnz) - starts[(w * 128 + res)[order]]
        # packed position: window-block row = (slot//128)*128 + res,
        # lane = slot % 128
        prow = w * RB + (slot // 128) * 128 + res
        plane = slot % 128
        pos = prow * 128 + plane
        hi_arr = np.zeros(W * RB * 128, np.int8)
        val_arr = np.zeros(W * RB * 128, np.float32)
        hi_arr[pos] = hi.astype(np.int8)
        val_arr[pos] = vv
        # identity of the product at each packed position (row id), -1=pad
        eid = np.full(W * RB * 128, -1, np.int64)
        eid[pos] = ri
        self.hi = jnp.asarray(hi_arr.reshape(W * RB, 128))
        self.val = jnp.asarray(val_arr.reshape(W * RB, 128))
        self.W, self.RB = W, RB
        self.n, self.nnz = n, nnz
        self.eid = eid                      # host-side, for the route plan

    @property
    def padded_frac(self):
        return self.W * self.RB * 128 / max(1, self.nnz)


def _gather_kernel(xt_ref, hi_ref, val_ref, out_ref, *, RB):
    # xt block: (128, 128) = window x transposed (row = residue)
    xt = xt_ref[:]
    tab = jnp.tile(xt, (RB // 128, 1))          # row s -> residue s%128
    g = jnp.take_along_axis(tab, hi_ref[:].astype(jnp.int32), axis=1)
    out_ref[:] = g * val_ref[:]


def gather_products(x, plan: GatherPlan, *, interpret=False):
    """prods (W*RB, 128) f32: product values in packed gather order."""
    W, RB = plan.W, plan.RB
    npad = W * WIN
    xp = jnp.pad(x.astype(jnp.float32), (0, npad - x.shape[0]))
    # window-transposed x: row = residue (col & 127), lane = col >> 7
    xt = jnp.swapaxes(xp.reshape(W, 128, 128), 1, 2).reshape(W * 128, 128)
    kernel = functools.partial(_gather_kernel, RB=RB)
    f = pl.pallas_call(
        kernel,
        grid=(W,),
        in_specs=[
            pl.BlockSpec((128, 128), lambda wi: (wi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, 128), lambda wi: (wi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, 128), lambda wi: (wi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((RB, 128), lambda wi: (wi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((W * RB, 128), jnp.float32),
        interpret=interpret,
    )
    with jax.enable_x64(False):
        return f(xt, plan.hi, plan.val)


# ---------------------------------------------------------------------------
# stages B+C: route products to CSR order; fused cumsum reduce
# ---------------------------------------------------------------------------

class SpmvRoutePlan:
    """Full engine plan for one CSR matrix (cached per matrix)."""

    __slots__ = ("g", "gp", "selii", "selbits", "selio", "seldists",
                 "T", "YT_ROWS", "m", "n")

    def __init__(self, indptr, indices, values, shape):
        m, n = shape
        self.m, self.n = m, n
        self.g = GatherPlan(indptr, indices, values, shape)
        counts = np.diff(np.asarray(indptr)).astype(np.int64)
        TR = SRT.TILE_R
        slots = TR * 128
        # rows per destination tile: uniform, 128-aligned, sized so every
        # tile's entries + sentinels fit its slot budget
        N_src = (self.g.W * self.g.RB * 128)
        avg = (counts.mean() if m else 0.0) + 1.0
        YT_ROWS = max(int(slots / avg / 128 * 0.90) // 8 * 8, 8)
        while True:
            Y_T = YT_ROWS * 128
            # enough tiles for all rows AND for every gather slot (the
            # route is a bijection: N_src <= N_dst must hold)
            T = max(-(-m // Y_T), -(-N_src // slots))
            mpad = T * Y_T
            cpad = np.zeros(mpad, np.int64)
            cpad[:m] = counts
            per_tile = (cpad + 1).reshape(T, Y_T).sum(axis=1)
            if per_tile.max() <= slots or YT_ROWS == 8:
                break
            YT_ROWS -= 8
        self.T, self.YT_ROWS = T, YT_ROWS
        N_dst = T * slots
        # destination slot of every product: rows in order, one sentinel
        # slot after each row, rows never straddle tiles
        row_of = np.repeat(np.arange(mpad, dtype=np.int64),
                           (cpad + 1))                      # incl sentinel
        tile_of_row = np.arange(mpad) // Y_T
        # slot offsets: restart at each tile boundary
        width = cpad + 1
        tile_first_row = tile_of_row * Y_T
        cum = np.zeros(mpad + 1, np.int64)
        np.cumsum(width, out=cum[1:])
        tile_base_cum = cum[tile_first_row]                 # per row
        row_off = cum[:mpad] - tile_base_cum                # within tile
        # per-entry destination (entries of row i at off..off+c-1; sentinel
        # at off + c)
        gs = self.g
        eid = gs.eid
        real = np.flatnonzero(eid >= 0)
        r_ids = eid[real]
        assert N_src == gs.W * gs.RB * 128
        # order entries within a row arbitrarily: stable sort by row
        order = np.argsort(r_ids, kind="stable")
        within = np.empty(real.shape[0], np.int64)
        rstart = np.zeros(mpad + 1, np.int64)
        np.cumsum(np.bincount(r_ids, minlength=mpad), out=rstart[1:])
        within[order] = np.arange(real.shape[0]) - rstart[r_ids[order]]
        dst_slot = (tile_of_row[r_ids] * slots + row_off[r_ids] + within)
        # the permutation: dest -> source (bijectified by the route plan)
        assert N_src <= N_dst, (N_src, N_dst)
        perm = np.full(N_dst, -1, np.int64)
        perm[dst_slot] = real
        # fill remaining dests with remaining sources (all zero-valued).
        # Shuffle the pairing: a monotone filler map concentrates into few
        # (src-tile, dst-tile) buckets and blows up the route's slab size.
        used = np.zeros(N_dst, bool)
        used[real] = True
        free_dst = np.flatnonzero(perm < 0)
        free_src = np.flatnonzero(~used)[: free_dst.shape[0]]
        perm[free_dst] = np.random.default_rng(0x5eed).permutation(free_src)
        self.gp = SRT.GlobalPermutePlan(perm, N_dst)
        # selection permute per dest tile: position p (< Y_T) pulls the
        # sentinel slot of tile-row p (cumsum through that row)
        sent_slot = row_off + cpad                           # within tile
        sel = np.empty((T, slots), np.int64)
        base = np.arange(slots, dtype=np.int64)
        for t in range(T):
            pp = np.full(slots, -1, np.int64)
            rows_t = np.arange(t * Y_T, (t + 1) * Y_T)
            pp[: Y_T] = sent_slot[rows_t]
            usedt = np.zeros(slots, bool)
            usedt[sent_slot[rows_t]] = True
            fd = np.flatnonzero(pp < 0)
            fs = np.flatnonzero(~usedt)
            pp[fd] = fs
            sel[t] = pp
        ii, dists, bits, io = SRT.clos_route_batch(sel, TR)
        self.selii = jnp.asarray(ii.astype(np.int8))
        self.selbits = jnp.asarray(bits)
        self.selio = jnp.asarray(io.astype(np.int8))
        self.seldists = tuple(int(d) for d in dists)


def _raster_cumsum(x):
    """Inclusive cumsum in row-major raster order over an (R, 128) tile."""
    R = x.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    k = 1
    while k < 128:
        sh = pltpu.roll(x, k, 1)
        x = x + jnp.where(lane >= k, sh, 0.0)
        k *= 2
    rowi = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    # inclusive scan of the per-row totals down the sublanes, then shift
    # by one row for the exclusive prefix
    tot = jax.lax.broadcast_in_dim(x[:, 127], x.shape, (0,))
    k = 1
    while k < R:
        tot = tot + jnp.where(rowi >= k, pltpu.roll(tot, k, 0), 0.0)
        k *= 2
    excl = jnp.where(rowi >= 1, pltpu.roll(tot, 1, 0), 0.0)
    return x + excl


def _phase2ext_kernel(x_ref, ii_ref, bits_ref, io_ref,
                      sii_ref, sbits_ref, sio_ref, y_ref,
                      *, dists, seldists, R, rows_in, YT_ROWS):
    x = x_ref[:].reshape(rows_in, 128)
    if rows_in < R:
        x = jnp.concatenate(
            [x, jnp.zeros((R - rows_in, 128), x.dtype)], axis=0)
    # finish the global route (phase-2 Clos)
    x = jnp.take_along_axis(x, ii_ref[:].astype(jnp.int32), axis=1)
    x = SRT._benes_stages(x, bits_ref[:], dists, R)
    x = jnp.take_along_axis(x, io_ref[:].astype(jnp.int32), axis=1)
    tile = x[: SRT.TILE_R, :]
    # fused reduce: raster cumsum, select row-end slots, difference
    cs = _raster_cumsum(tile)
    cs = jnp.take_along_axis(cs, sii_ref[:].astype(jnp.int32), axis=1)
    cs = SRT._benes_stages(cs, sbits_ref[:], seldists, SRT.TILE_R)
    cs = jnp.take_along_axis(cs, sio_ref[:].astype(jnp.int32), axis=1)
    sel = cs[:YT_ROWS, :]
    a = pltpu.roll(sel, 1, 1)
    b = pltpu.roll(a, 1, 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, sel.shape, 1)
    rowi = jax.lax.broadcasted_iota(jnp.int32, sel.shape, 0)
    prev = jnp.where(lane == 0, b, a)
    prev = jnp.where((lane == 0) & (rowi == 0), 0.0, prev)
    y_ref[:] = sel - prev


def spmv_route(x, plan: SpmvRoutePlan, *, interpret=False):
    """y = A @ x (plus-times fp32) through the routing engine."""
    gp = plan.gp
    T2, R1, R2 = gp.T, gp.R1, gp.R2
    rows_pp = gp.rows_pp
    prods = gather_products(x, plan.g, interpret=interpret)
    # pad product array to the route domain and run phase 1
    N_dst = T2 * SRT.TILE_R * 128
    pf = prods.reshape(-1)
    pf = jnp.pad(pf, (0, N_dst - pf.shape[0]))
    xp = pf.reshape(-1, 128)
    k1 = functools.partial(SRT._phase_kernel, dists=gp.dists1, R=R1,
                           rows_in=SRT.TILE_R, rows_out=T2 * rows_pp)
    cp = (None if interpret else
          pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024))
    phase1 = pl.pallas_call(
        k1,
        grid=(T2,),
        in_specs=[
            pl.BlockSpec((SRT.TILE_R, 128), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R1, 128), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R1, 128), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R1, 128), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T2 * rows_pp, 128), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T2 * T2 * rows_pp, 128),
                                       jnp.float32),
        interpret=interpret,
        compiler_params=cp,
    )
    k2 = functools.partial(_phase2ext_kernel, dists=gp.dists2,
                           seldists=plan.seldists, R=R2,
                           rows_in=T2 * rows_pp, YT_ROWS=plan.YT_ROWS)
    phase2 = pl.pallas_call(
        k2,
        grid=(T2,),
        in_specs=[
            pl.BlockSpec((T2, 1, rows_pp, 128), lambda t: (0, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R2, 128), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R2, 128), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R2, 128), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SRT.TILE_R, 128), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SRT.TILE_R, 128), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SRT.TILE_R, 128), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((plan.YT_ROWS, 128), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T2 * plan.YT_ROWS, 128),
                                       jnp.float32),
        interpret=interpret,
        compiler_params=cp,
    )
    with jax.enable_x64(False):
        mid = phase1(xp, gp.ii1, gp.bits1, gp.io1)
        mid4 = mid.reshape(T2, T2, rows_pp, 128)
        y = phase2(mid4, gp.ii2, gp.bits2, gp.io2,
                   plan.selii, plan.selbits, plan.selio)
    return y.reshape(-1)[: plan.m]
