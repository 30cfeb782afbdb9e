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
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import static_route as SRT


_dbg_t = [None]


def _dbg(stage):
    import os
    import time as _time
    if os.environ.get("GB_PLAN_DEBUG"):
        rss = 0
        try:
            with open("/proc/self/status") as f:
                for ln in f:
                    if ln.startswith("VmRSS"):
                        rss = int(ln.split()[1]) // 1024
        except Exception:
            pass
        now = _time.perf_counter()
        dt = 0.0 if _dbg_t[0] is None else now - _dbg_t[0]
        _dbg_t[0] = now
        print(f"[plan] {stage}  rss={rss}MB  +{dt:.2f}s", flush=True)


WIN = 16384           # x window (128 sublanes x 128 lanes after transpose)


class GatherPlan:
    """Stage-A packing: entries CSC-windowed and residue-interleaved.

    ``RB`` is the capacity rows per window (max entries in one (window,
    residue) class, 128-rounded).  ``RBL >= RB`` is the LAYOUT rows per
    window: the route plan passes a larger value so the packed blocks
    spread uniformly over the route domain — real sources then land
    evenly across source tiles, which is what lets the balanced filler
    level every (src-tile, dst-tile) bucket to the minimum slab height.

    Power-law columns (the GAP graphs' defining property, SURVEY.md §7):
    a heavy column concentrates all its entries into one (window, residue)
    class and would blow RB up by orders of magnitude.  Hub columns are
    therefore rerouted to VIRTUAL windows: their entries split into
    <=RB-entry chunks, each chunk owning one table cell, and the virtual
    tables are built from x at run time by one small gather
    (x[vcells] — #cells = 16384 per virtual window, a few windows total)."""

    __slots__ = ("hi", "val", "val_lo", "W", "Wv", "vcells", "RB", "RBL",
                 "n", "nnz", "pos", "_tmp")

    def __init__(self, indptr, indices, values, shape, defer=False):
        from ..utils import native as NV
        m, n = shape
        ci = np.ascontiguousarray(indices, np.int64)
        values = np.asarray(values)
        if values.dtype == np.float64:
            # double-single split: v = hi + lo with hi,lo f32 (representable
            # precision ~2^-49 relative; see spmv_route_ds)
            vv = values.astype(np.float32)
            vv_lo = (values - vv.astype(np.float64)).astype(np.float32)
        else:
            vv = np.ascontiguousarray(values, np.float32)
            vv_lo = None
        nnz = ci.shape[0]
        W = -(-n // WIN)
        packed = NV.gather_pack(ci, n, WIN, W) if nnz else None
        if packed is not None:
            # one native sweep: class key, lane id, per-class counts
            key, hi, cls_cnt = packed
        else:
            w0 = ci // WIN
            res0 = ci & 127
            key = w0 * 128 + res0
            hi = (ci >> 7) & 127
            cls_cnt = np.bincount(key, minlength=W * 128) if nnz else \
                np.zeros(W * 128, np.int64)
        # -- hub columns -> virtual windows ------------------------------
        # Data-driven: a class ((window, residue) pair) overloads either
        # from one mega column or a cluster of medium ones.  For every
        # class above the load target, hub its largest columns until the
        # remainder fits; hub entries split into <=cap chunks which
        # BIN-PACK into virtual classes (many chunks share a class, each
        # on its own table lane), so hub space stays proportional.
        cls_mean = max(nnz // (W * 128), 1)
        CAPT = max((3 * cls_mean) // 2, 384)
        over = np.flatnonzero(cls_cnt > CAPT)
        Wv = 0
        vcells = None
        if over.size:
            colcnt = NV.colcount(ci, n)   # lazy: only hub detection needs it
            ww, rr = over // 128, over % 128
            cols_mat = (ww[:, None] * WIN + rr[:, None]
                        + 128 * np.arange(128)[None, :])
            cols_mat = np.minimum(cols_mat, n - 1)
            cnt_mat = colcnt[cols_mat]
            ordd = np.argsort(-cnt_mat, axis=1, kind="stable")
            scnt = np.take_along_axis(cnt_mat, ordd, axis=1)
            rem = cls_cnt[over][:, None] - np.cumsum(scnt, axis=1)
            hubn = np.minimum((rem > CAPT).sum(axis=1) + 1, 128)
            pick = np.arange(128)[None, :] < hubn[:, None]
            hub_cols = np.unique(
                np.take_along_axis(cols_mat, ordd, axis=1)[pick])
            hub_cols = hub_cols[colcnt[hub_cols] > 0]
            hub_mark = np.zeros(n, bool)
            hub_mark[hub_cols] = True
            ishub = hub_mark[ci]
            cap = (-(-CAPT // 128)) * 128
            hcnt = colcnt[hub_cols]
            nchunks = -(-hcnt // cap)
            chunk_base = np.zeros(hub_cols.size + 1, np.int64)
            np.cumsum(nchunks, out=chunk_base[1:])
            total_chunks = int(chunk_base[-1])
            ch_col = np.repeat(hub_cols, nchunks)
            ch_in_col = (np.arange(total_chunks, dtype=np.int64)
                         - np.repeat(chunk_base[:-1], nchunks))
            # entries round-robin across the column's chunks (below), so
            # chunk k of a column holds floor/ceil(cnt/nchunks) entries
            # drawn uniformly from the column's ROW RANGE — row-ordered
            # chunking concentrated whole chunks into single destination
            # tiles and defeated the bucket leveling
            ch_sz = (np.repeat(hcnt // nchunks, nchunks)
                     + (ch_in_col < np.repeat(hcnt % nchunks, nchunks)))
            # next-fit decreasing pack: chunks -> virtual classes
            order_c = np.argsort(-ch_sz, kind="stable")
            cls_of = np.empty(total_chunks, np.int64)
            lane_of = np.empty(total_chunks, np.int64)
            cls_id, load, lanes = 0, 0, 0
            for cidx in order_c:
                sz = int(ch_sz[cidx])
                if load + sz > cap or lanes >= 128:
                    cls_id += 1
                    load, lanes = 0, 0
                cls_of[cidx] = cls_id
                lane_of[cidx] = lanes
                load += sz
                lanes += 1
            n_vcls = cls_id + 1
            Wv = -(-n_vcls // 128)
            # rank hub entries within their column (appearance order)
            hcol_id = np.searchsorted(hub_cols, ci[ishub])
            r_in_col, _ = NV.rank_by_key(hcol_id, hub_cols.size)
            r_in_col = r_in_col.astype(np.int64)
            j = chunk_base[hcol_id] + r_in_col % nchunks[hcol_id]
            key[ishub] = (W + cls_of[j] // 128) * 128 + cls_of[j] % 128
            hi[ishub] = lane_of[j]
            # runtime table sources: cell (res, lane) of vw holds x[col]
            vcells = np.zeros(Wv * 16384, np.int32)
            vcells[(cls_of // 128) * 16384 + (cls_of % 128) * 128
                   + lane_of] = ch_col.astype(np.int32)
        # rows cycle through residues: entry with residue r in window w
        # goes to packed row w*RBL + (k*128 + r) for its k-th slot
        _dbg("gather: hub done")
        slot, counts = NV.rank_by_key(key, (W + Wv) * 128)
        kmax = int(counts.max()) if nnz else 1
        RB = (-(-kmax // 128)) * 128        # capacity rows (mult of 128)
        self.W, self.Wv, self.RB = W + Wv, Wv, RB
        self.vcells = (jnp.asarray(vcells.reshape(Wv * 128, 128))
                       if Wv else None)
        self.n, self.nnz = n, nnz
        self._tmp = (hi, slot, vv, key, counts, vv_lo)
        if not defer:
            self.finalize()

    def finalize(self, rows_layout=None):
        from ..utils import native as NV
        hi, slot, vv, key, counts, vv_lo = self._tmp
        RBL = int(rows_layout) if rows_layout else self.RB
        assert RBL >= self.RB and RBL % 128 == 0
        W = self.W
        # spread each (window, residue) class's occupied 128-row bands
        # evenly over the layout block, with a per-class hashed rotation:
        # floor(j*Q/P) is injective for Q >= P and rotation mod Q keeps it
        # so, while decorrelating the band patterns of different classes —
        # real entries then land uniformly across the route's source tiles
        res_n = NV.gather_finalize(key, slot, counts, vv, hi, W, RBL)
        if res_n is not None:
            hi_arr, val_arr, pos = res_n
            _dbg("gather: finalize scatters done")
            self.hi = jnp.asarray(hi_arr)
            self.val = jnp.asarray(val_arr)
        else:
            Q = RBL // 128
            P = np.maximum(-(-counts[key] // 128), 1)   # bands per class
            base = (key * np.int64(2654435761)) % Q
            band = (base + (slot // 128) * Q // P) % Q
            prow = (key // 128) * RBL + band * 128 + (key % 128)
            plane = slot % 128
            pos = prow * 128 + plane
            hi_arr = np.full(W * RBL * 128, -1, np.int8)  # -1 = dummy
            val_arr = np.zeros(W * RBL * 128, np.float32)
            hi_arr[pos] = hi.astype(np.int8)
            val_arr[pos] = vv
            _dbg("gather: finalize scatters done")
            self.hi = jnp.asarray(hi_arr.reshape(W * RBL, 128))
            self.val = jnp.asarray(val_arr.reshape(W * RBL, 128))
        if vv_lo is not None:
            lo_arr = np.zeros(W * RBL * 128, np.float32)
            lo_arr[pos] = vv_lo
            self.val_lo = jnp.asarray(lo_arr.reshape(W * RBL, 128))
        else:
            self.val_lo = None
        _dbg("gather: device upload done")
        self.RBL = RBL
        self.pos = pos                      # host-side, for the route plan
        self._tmp = None

    @property
    def padded_frac(self):
        return self.W * self.RBL * 128 / max(1, self.nnz)


def _gather_kernel(xt_ref, hi_ref, val_ref, out_ref, *, RB):
    # xt block: (128, 128) = window x transposed (row = residue)
    xt = xt_ref[:]
    tab = jnp.tile(xt, (-(-RB // 128), 1))[:RB]  # row s -> residue s%128
    idx = jnp.maximum(hi_ref[:].astype(jnp.int32), 0)  # -1 = dummy slot
    g = jnp.take_along_axis(tab, idx, axis=1)
    out_ref[:] = g * val_ref[:]


def _fuse_geometry(gs, TR):
    """(fuse, wpt, win_block_rows, win_index_div) for the fused gather:
    RBL >= TR -> one window strip serves RBL/TR tiles (wpt=1, index
    t // ratio); RBL < TR -> each tile spans TR/RBL windows (wpt > 1,
    block of wpt strips at index t)."""
    RBL = gs.RBL
    if RBL % TR == 0:
        return True, 1, 128, RBL // TR
    if TR % RBL == 0:
        return True, TR // RBL, (TR // RBL) * 128, 1
    return False, 1, 128, 1


def _auto_interpret(interpret):
    if interpret is None:
        return jax.default_backend() == "cpu"
    return interpret


def gather_products(x, plan: GatherPlan, *, interpret=False):
    """prods (W*RBL, 128) f32: product values in packed gather order."""
    interpret = _auto_interpret(interpret)
    W, RB = plan.W, plan.RBL
    # window-transposed x: row = residue (col & 127), lane = col >> 7;
    # virtual (hub) windows' tables are gathered from x by the plan's
    # cell->column map (one small gather; hubs are few)
    xt = _window_xt(x, plan)
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

def _next_pow2(x):
    p = 1
    while p < x:
        p *= 2
    return p


def _fill_balanced(perm, T, slots):
    """Pair free destinations with free sources so every (src-tile,
    dst-tile) bucket levels out: the route's slab height rows_pp is driven
    by the max bucket count, so leveled fillers keep the Clos domain at
    its minimum (R1 == TILE_R) instead of the ~2x a random pairing costs.
    The pairing solves a tiny transportation problem on the T x T bucket
    grid (greedy water-filling with per-bucket capacity).  Counting and
    assignment are single native sweeps (the numpy flatnonzero/bincount/
    sort pipeline was ~12 s of the 2^18 plan build on this fault-bound
    single-core host)."""
    from ..utils import native as NV
    nat = NV.fill_counts(perm, slots, T)
    if nat is not None:
        real, D, used = nat
        K = int(D.sum())
        if K == 0:
            return perm
        S = NV.free_src_counts(used, K, slots, T)
        free_dst = free_src = None
    else:
        used = np.zeros(perm.shape[0], bool)
        used[perm[perm >= 0]] = True
        free_dst = np.flatnonzero(perm < 0)
        free_src = np.flatnonzero(~used)[: free_dst.shape[0]]
        real_dst = np.flatnonzero(perm >= 0)
        real = np.bincount(
            (perm[real_dst] // slots) * T + real_dst // slots,
            minlength=T * T).reshape(T, T)
        S = np.bincount(free_src // slots, minlength=T)  # supply per s
        D = np.bincount(free_dst // slots, minlength=T)  # demand per d
    def _ru8_rows(elems):
        rows = -(-int(elems) // 128)
        return -(-rows // 8) * 8
    cap_rows = max(8, _ru8_rows(-(-slots // T)), _ru8_rows(int(real.max())))
    ok = False
    for _ in range(4):
        cap = cap_rows * 128
        fill = np.zeros((T, T), np.int64)
        srem = S.astype(np.int64).copy()
        ok = True
        # most-constrained demand first, drawing from the largest
        # remaining supplies — preserves scarce supplies for later tiles
        for d in np.argsort(-D, kind="stable"):
            srt = np.argsort(-srem, kind="stable")
            avail = np.minimum(srem[srt],
                               np.maximum(cap - real[srt, d], 0))
            take = np.diff(np.minimum(np.cumsum(avail), D[d]), prepend=0)
            fill[srt, d] = take
            srem[srt] -= take
            if take.sum() != D[d]:
                ok = False
                break
        if ok:
            break
        cap_rows += 8
    if not ok:
        # give up on leveling: random pairing (correct, just more padding)
        if free_dst is None:
            free_dst = np.flatnonzero(perm < 0)
            free_src = np.flatnonzero(used == 0)[: free_dst.shape[0]]
        perm[free_dst] = np.random.default_rng(0x5eed).permutation(free_src)
        return perm
    if free_dst is None:
        # native single-sweep assignment (same pairing as the numpy path)
        assert NV.fill_assign(perm, used, fill, slots, T)
        return perm
    # hand each free source (s-major order) a destination tile per quota,
    # then stable-sort by that tile to align with free_dst (d-major order)
    d_assign = np.repeat(np.tile(np.arange(T, dtype=np.int32), T),
                         fill.reshape(-1))
    order = NV.sort_by_key_i32(d_assign, T)
    perm[free_dst] = free_src[order]
    return perm


def _compose_plan_planes(plan):
    """Fold the two interior lane gathers out of the executor (round-5
    router diet, experiments/ROOFLINE_BUDGET.md):

      * phase-1's INPUT lane gather ``ii1`` is a per-row lane permutation
        of the same rows the ``hi``/``val`` plan planes live on — apply it
        to those planes at PLAN time (hi' = hi[r, ii1[r]], same for val),
        and the executor's first take_along_axis disappears;
      * phase-1's OUTPUT lane gather ``io1`` and phase-2's INPUT gather
        ``ii2`` act back-to-back on each physical mid row (the row passes
        through HBM unchanged between the phases, only re-blocked), so
        they compose into one plane: ii2'[r2] = io1[r1][ii2[r2]].

    take_along_axis is the slowest primitive in the engine (~185 Gelem/s
    vs ~920 for a roll+select stage, experiments/calib.py): dropping 2 of
    the 6 per-slot gathers is ~9%% of the SpMV.  Row mapping for the
    compose: dest tile t', local row r2 = s*rows_pp + j  <->  phase-1
    grid s, out row t'*rows_pp + j  (the mid4 (T,1,rows_pp,128) BlockSpec
    read in ``spmv_route``)."""
    from ..utils import native as NV
    gp, gs = plan.gp, plan.g
    if gp.ii1 is None:
        return                               # already composed
    T, R1, R2, rows_pp = gp.T, gp.R1, gp.R2, gp.rows_pp
    TR = getattr(gp, "TR", SRT.TILE_R)
    ii1_8 = np.ascontiguousarray(np.asarray(gp.ii1), np.int8)
    io1 = np.ascontiguousarray(np.asarray(gp.io1), np.int8)
    ii2 = np.array(np.asarray(gp.ii2), np.int8)          # writable copy
    hi = np.array(np.asarray(gs.hi), np.int8)
    val = np.array(np.asarray(gs.val), np.float32)
    val_lo = (np.array(np.asarray(gs.val_lo), np.float32)
              if getattr(gs, "val_lo", None) is not None else None)
    if NV.compose_gather(hi, val, val_lo, ii1_8, TR, R1)             and NV.compose_ii2(ii2, io1, T, rows_pp, R1, R2):
        gs.hi = jnp.asarray(hi)
        gs.val = jnp.asarray(val)
        if val_lo is not None:
            gs.val_lo = jnp.asarray(val_lo)
    else:
        # --- numpy fallback ----------------------------------------------
        ii1 = ii1_8.astype(np.int32)
        G = hi.shape[0]                      # W * RBL gather rows
        g = np.arange(G, dtype=np.int64)
        i1rows = (g // TR) * R1 + (g % TR)   # per-row lane map of row g
        sel = ii1[i1rows]
        gs.hi = jnp.asarray(np.take_along_axis(hi, sel, axis=1))
        gs.val = jnp.asarray(np.take_along_axis(val, sel, axis=1))
        if val_lo is not None:
            gs.val_lo = jnp.asarray(
                np.take_along_axis(val_lo, sel, axis=1))
        npp = T * rows_pp
        tp = np.repeat(np.arange(T, dtype=np.int64), npp)  # dest tile
        r2 = np.tile(np.arange(npp, dtype=np.int64), T)
        src_row = (r2 // rows_pp) * R1 + tp * rows_pp + (r2 % rows_pp)
        ii2_live = ii2.reshape(T, R2, 128)[:, :npp, :].reshape(-1, 128)
        comp = np.take_along_axis(io1[src_row],
                                  ii2_live.astype(np.int32), axis=1)
        ii2 = np.array(ii2.reshape(T, R2, 128))
        ii2[:, :npp, :] = comp.reshape(T, npp, 128)
        ii2 = ii2.reshape(T * R2, 128)
    gp.ii2 = jnp.asarray(ii2.reshape(T * R2, 128))
    gp.ii1 = None
    gp.io1 = None


ROW_CAP = SRT.TILE_R * 64     # split rows beyond this into sub-rows


def _row_caps(TR):
    return (TR * 64, TR * 16, TR * 4, TR, 254)


class SpmvRoutePlan:
    """Full engine plan for one CSR matrix (cached per matrix).

    Rows never straddle destination tiles, so a row with more entries than
    a tile's slot budget (power-law out-degree) is split into sub-rows of
    <= ROW_CAP entries: the first chunk keeps the row's position, extra
    chunks append past m, and the final y adds them back with one tiny
    scatter-add (extra chunks are few)."""

    __slots__ = ("g", "gp", "sel_lidx", "sel_bits", "T", "TR", "YT_ROWS",
                 "m", "m_sub", "n", "extra_owner", "_device",
                 "lastidx8", "samerow8", "cg_stages", "rowstart8",
                 "pack_up")

    def __init__(self, indptr, indices, values, shape):
        m0, n = shape
        self.m, self.n = m0, n
        self.g = GatherPlan(indptr, indices, values, shape, defer=True)
        ip = np.ascontiguousarray(indptr, np.int64)
        counts0 = np.diff(ip)
        N_cap = (self.g.W * self.g.RB * 128)
        # adaptive tile size: keep the route tile count T <= ~256 so the
        # slab height stays above the 8-sublane floor (T >> 256 would
        # multiply the Benes domain by 8T/2048) — GAP-scale inputs use
        # bigger tiles instead of more of them
        need = int(N_cap * 1.2) + m0
        TR = SRT.TILE_R
        while need > 256 * TR * 128 and TR < 16384:
            TR *= 2
        self.TR = TR
        slots = TR * 128

        def split_heavy(cap):
            nxtra = np.maximum(-(-counts0 // cap) - 1, 0)
            if not nxtra.any():
                return counts0, m0, None, None, None
            heavy = np.flatnonzero(nxtra)
            extra_base = np.zeros(m0 + 1, np.int64)
            np.cumsum(nxtra, out=extra_base[1:])
            K = int(extra_base[-1])
            ri0 = np.repeat(np.arange(m0, dtype=np.int64), counts0)
            within0 = np.arange(self.g.nnz, dtype=np.int64) - np.repeat(
                ip[:-1], counts0)
            chunk = within0 // cap
            row_of = np.where(chunk == 0, ri0,
                              m0 + extra_base[ri0] + chunk - 1)
            within_of = within0 % cap
            owner = np.repeat(heavy, nxtra[heavy]).astype(np.int32)
            cs = np.empty(m0 + K, np.int64)
            cs[:m0] = np.minimum(counts0, cap)
            rem = np.repeat(counts0[heavy], nxtra[heavy]) - cap * (
                np.arange(K) - np.repeat(extra_base[heavy], nxtra[heavy])
                + 1)
            cs[m0:] = np.minimum(rem, cap)
            return cs, m0 + K, row_of, within_of, owner

        # rows per destination tile: uniform, 128-aligned, sized so every
        # tile's entries + sentinels fit its slot budget.  Heavy rows are
        # chunked at row_cap; if chunks still overflow a tile (clumped
        # extras), retry with a smaller cap.
        fitted = False
        for row_cap in _row_caps(TR):
            (counts, m, row_of_entry, within_of_entry,
             owner) = split_heavy(row_cap)
            avg = (counts.mean() if m else 0.0) + 1.0
            YT_ROWS = max(int(slots / avg / 128 * 0.90) // 8 * 8, 8)
            while True:
                Y_T = YT_ROWS * 128
                # enough tiles for all rows AND for every gather slot (the
                # route is a bijection: N_src <= N_dst must hold); T rounds
                # up to a power of two so leveled buckets hit
                # rows_pp*T == TILE_R exactly (minimum Clos route domain)
                T = _next_pow2(max(-(-m // Y_T), -(-N_cap // slots)))
                mpad = T * Y_T
                cpad = np.zeros(mpad, np.int64)
                cpad[:m] = counts
                per_tile = (cpad + 1).reshape(T, Y_T).sum(axis=1)
                if per_tile.max() <= slots:
                    fitted = True
                    break
                if YT_ROWS == 8:
                    break
                YT_ROWS -= 8
            if fitted:
                break
        assert fitted, "route plan: rows do not fit any tile budget"
        self.extra_owner = jnp.asarray(owner) if owner is not None else None
        self.m_sub = m
        # spread both sides uniformly over the T route tiles so the real
        # (src-tile, dst-tile) buckets stay near nnz/T^2 and fillers can
        # level them at the minimum slab height:
        #   src: pad each gather window block to RB_lay rows;
        #   dst: shrink rows-per-tile toward ceil(m / T).
        RB_lay = max(self.g.RB, ((T * TR) // self.g.W) // 128 * 128)
        self.g.finalize(RB_lay)
        rows_per_tile = -(-m // T)
        spread_rows = -(-rows_per_tile // 128)
        spread = max(8, -(-spread_rows // 8) * 8)
        if spread < YT_ROWS:
            YT_ROWS = spread
            Y_T = YT_ROWS * 128
            mpad = T * Y_T
            cpad = np.zeros(mpad, np.int64)
            cpad[:m] = counts
            per_tile = (cpad + 1).reshape(T, Y_T).sum(axis=1)
            assert per_tile.max() <= slots
        self.T, self.YT_ROWS = T, YT_ROWS
        N_dst = T * slots
        gs = self.g
        N_src = gs.W * gs.RBL * 128
        assert N_src <= N_dst, (N_src, N_dst)
        # destination slot of every product (rows in order, one sentinel
        # slot after each row, rows never straddle tiles) + the partial
        # permutation, one native sweep; numpy fallback below
        from ..utils import native as NV
        nat = NV.route_perm(cpad, Y_T, slots, ip, m, row_of_entry,
                            within_of_entry, np.asarray(gs.pos), N_dst)
        if nat is not None:
            perm, sent_flat = nat
            row_off = None
        else:
            tile_of_row = np.arange(mpad) // Y_T
            # slot offsets: restart at each tile boundary
            width = cpad + 1
            tile_first_row = tile_of_row * Y_T
            cum = np.zeros(mpad + 1, np.int64)
            np.cumsum(width, out=cum[1:])
            tile_base_cum = cum[tile_first_row]             # per row
            row_off = cum[:mpad] - tile_base_cum            # within tile
            # entries of row i at off..off+c-1 (CSR is row-major, so the
            # within-row rank is position minus the row start)
            if row_of_entry is not None:
                ri, within = row_of_entry, within_of_entry
            else:
                ri = np.repeat(np.arange(m, dtype=np.int64), counts)
                within = np.arange(gs.nnz, dtype=np.int64) - np.repeat(
                    ip[:-1], counts)
            dst_slot = (tile_of_row[ri] * slots + row_off[ri] + within)
            perm = np.full(N_dst, -1, np.int64)
            perm[dst_slot] = gs.pos
            sent_flat = row_off + cpad
        _dbg("perm scatter done")
        perm = _fill_balanced(perm, T, slots)
        _dbg("fill_balanced done")
        self.gp = SRT.GlobalPermutePlan(perm, N_dst, tile_r=TR)
        _dbg("global permute plan done")
        # selection pack per dest tile: the sentinel slot of tile-row p
        # (the cumsum through that row) is delivered to raster position p
        # by a monotone concentrator — plan is pure rank arithmetic
        sent_slot = sent_flat.reshape(T, Y_T)                # within tile
        # row-start flags per slot (semiring-generic reduce: the segmented
        # scan restarts at these; sentinel slots carry the add identity so
        # an empty row reduces to the identity — reference analog: the
        # monoid identity seeds of GB_reduce_to_scalar)
        rs = np.zeros((T, slots), np.int8)
        rs[:, 0] = 1
        nxt = sent_slot + 1                                  # next row start
        ok_ = nxt < slots
        flat_rs = (np.arange(T, dtype=np.int64)[:, None] * slots + nxt)[ok_]
        rs.reshape(-1)[flat_rs] = 1
        self.rowstart8 = jnp.asarray(rs.reshape(T * TR, 128))
        lidx, bits = SRT.monotone_pack_plan_up(sent_slot, TR)
        self.pack_up = True
        _dbg("sel pack done")
        self.sel_lidx = jnp.asarray(lidx)
        self.sel_bits = jnp.asarray(bits)
        # ---- exact-reduce side data --------------------------------------
        # The reduce differences a GLOBAL raster cumsum at row-end
        # sentinels; at 2M-slot tiles the running prefix dwarfs individual
        # row sums and cancellation costs ~sqrt(tile) ulps (measured 3e-3
        # relerr on the 2^24 zipf demo).  Fix: keep the float cumsum LOCAL
        # to each 128-lane sublane row, and carry row remainders across
        # sublane rows through a short (tail, no-sentinel) chain whose
        # magnitudes stay row-sized.  Per-slot plan data: the lane of the
        # last sentinel in each sublane row (-1 if none) and, in packed
        # space, whether a sentinel shares its sublane row with its
        # predecessor (then its row sum is a LOCAL difference).
        subrow = (sent_slot >> 7).astype(np.int64)           # (T, Y_T)
        lane_s = (sent_slot & 127).astype(np.int8)
        keyr = (np.arange(T, dtype=np.int64)[:, None] * TR + subrow)
        kf, lf = keyr.reshape(-1), lane_s.reshape(-1)
        lastpos = np.flatnonzero(
            np.diff(kf, append=kf[-1] + 1) != 0)             # keyr sorted
        lastlane = np.full(T * TR, -1, np.int8)
        lastlane[kf[lastpos]] = lf[lastpos]
        self.lastidx8 = jnp.asarray(
            np.ascontiguousarray(
                np.broadcast_to(lastlane[:, None], (T * TR, 128))))
        same = np.zeros((T, Y_T), np.int8)
        same[:, 1:] = subrow[:, 1:] == subrow[:, :-1]
        self.samerow8 = jnp.asarray(same.reshape(T * YT_ROWS, 128))
        gaps = np.diff(subrow, axis=1)
        need = int(max(gaps.max() if gaps.size else 0,
                       subrow[:, 0].max() + 1))
        self.cg_stages = 0 if need <= 1 else int(np.ceil(np.log2(need)))
        _dbg("exact-reduce side data done")
        _compose_plan_planes(self)
        _dbg("gather compose done")

    @property
    def nnz_total(self):
        return self.g.nnz

    @property
    def has_exact(self):
        return getattr(self, "lastidx8", None) is not None

    @property
    def n_slots(self):
        return self.T * self.TR * 128

    @property
    def padded_frac(self):
        return self.n_slots / max(1, self.g.nnz)


class StripedSpmvPlan:
    """Row-striped route plan: the matrix's rows are partitioned into
    contiguous stripes, each carrying its own SpmvRoutePlan with its own
    power-of-two tile count.

    Why: a single route domain is quantized to a pow2 tile count (the
    8-sublane slab quantum + pow2 Benes force T | TR/8, see
    experiments/ROOFLINE_BUDGET.md lever 2) — a graph needing 79 tiles
    pays for 128 (padded_frac 2.0 on the 2^20/16.7M bench graph).  Two
    stripes of 64 + 16 tiles cover the same need at 80 tiles
    (padded_frac ~1.27): the pow2 lattice is escaped by SUMS of powers
    of two.  Each stripe is an independent sub-matrix plan (rows are a
    contiguous CSR slice, columns global); y = concat(stripe ys).

    Reference analog: GB_ek_slice partitions work into balanced chunks
    (Source/GB_ek_slice.c:9-20); here the partition is chosen to sit on
    the route lattice rather than per-thread."""

    __slots__ = ("plans", "bounds", "m", "n", "_device")

    def __init__(self, plans, bounds, m, n):
        self.plans = tuple(plans)
        self.bounds = tuple(int(b) for b in bounds)
        self.m, self.n = int(m), int(n)

    @property
    def nnz_total(self):
        return sum(p.g.nnz for p in self.plans)

    @property
    def has_exact(self):
        return all(p.has_exact for p in self.plans)

    @property
    def n_slots(self):
        return sum(p.n_slots for p in self.plans)

    @property
    def padded_frac(self):
        return self.n_slots / max(1, self.nnz_total)


_STRIPE_MIN_NNZ = 1 << 22      # below: single plan (dispatch dominates)
_STRIPE_MIN_ROWS = 1 << 16


def plan_has_lo(plan):
    """True when the plan carries the double-single lo value plane."""
    plans = plan.plans if isinstance(plan, StripedSpmvPlan) else (plan,)
    return all(getattr(p.g, "val_lo", None) is not None for p in plans)


def _stripe_tile_split(F, min_t=16):
    """Decompose a tile need F into [t1, t2] (t1 pow2 >= t2 pow2) when
    that beats next_pow2(F); else None (single plan)."""
    if F <= min_t:
        return None
    single = _next_pow2(F)
    t1 = single // 2 if single > F else single
    if t1 >= F:
        return None                      # F is itself a power of two
    rem = F - t1
    t2 = max(min_t, _next_pow2(rem))
    if t1 + t2 >= single or t2 > t1:
        return None
    return [t1, t2]


def build_plan(indptr, indices, values, shape, force_single=None):
    """Build the best route plan for a CSR matrix: a StripedSpmvPlan when
    the tile need falls badly off the pow2 lattice, else a single
    SpmvRoutePlan.  ``GB_ROUTE_STRIPES=0`` forces single-plan mode."""
    if force_single is None:
        force_single = os.environ.get("GB_ROUTE_STRIPES", "1") == "0"
    indptr = np.asarray(indptr)
    indices = np.asarray(indices)
    values = np.asarray(values)
    m, n = shape
    nnz = indices.shape[0]
    if force_single or nnz < _STRIPE_MIN_NNZ or m < _STRIPE_MIN_ROWS:
        return SpmvRoutePlan(indptr, indices, values, shape)
    # estimate the tile need the way SpmvRoutePlan.__init__ derives T:
    # gather capacity (with ~13% class skew) and row capacity per tile.
    # Per-row tile cost = max of the two constraints, so the stripe cut
    # lands each stripe under its pow2 budget on BOTH axes.
    TR = SRT.TILE_R
    slots = TR * 128
    need_est = int(nnz * 1.35) + m
    while need_est > 256 * TR * 128 and TR < 16384:
        TR *= 2
        slots = TR * 128
    counts = np.diff(indptr)

    def est_T(b0, b1):
        # pre-pow2 tile need of rows [b0, b1): mirrors __init__'s
        # T-derivation (row budget Y_T from the stripe's own mean degree;
        # gather capacity with ~13% class skew)
        m_s = b1 - b0
        if m_s <= 0:
            return 0
        nnz_s = int(indptr[b1] - indptr[b0])
        avg = nnz_s / m_s + 1.0
        ytr = max(int(slots / avg / 128 * 0.90) // 8 * 8, 8)
        return max(-(-m_s // (ytr * 128)), -(-int(nnz_s * 1.13) // slots))

    F = est_T(0, m)
    split = _stripe_tile_split(F)
    if split is None:
        return SpmvRoutePlan(indptr, indices, values, shape)
    t1, t2 = split
    # largest prefix whose tile need fits t1 (monotone -> binary search)
    lo, hi = 1, m - 1
    while lo < hi:
        mid = (lo + hi + 1) // 2
        if est_T(0, mid) <= t1:
            lo = mid
        else:
            hi = mid - 1
    b = lo
    if est_T(b, m) > t2:
        return SpmvRoutePlan(indptr, indices, values, shape)
    ip1 = indptr[: b + 1]
    e1 = int(ip1[-1])
    p1 = SpmvRoutePlan(ip1, indices[:e1], values[:e1], (b, n))
    ip2 = indptr[b:] - indptr[b]
    p2 = SpmvRoutePlan(ip2, indices[e1:], values[e1:], (m - b, n))
    from ..core import config as CFG
    CFG.burble("route plan: stripes T=[%d,%d] rows=[%d,%d] padded=%.2f",
               p1.T, p2.T, b, m - b,
               (p1.n_slots + p2.n_slots) / max(1, nnz))
    return StripedSpmvPlan([p1, p2], [0, b, m], m, n)


# ---------------------------------------------------------------------------
# pytree registration: plans must flow into jit as ARGUMENTS, not captured
# constants — under the axon tunnel the HLO (with baked constants) ships to
# a remote compile service, and bench-scale plans (~1 GB) exceed its
# request limit.  As pytrees the arrays ride the normal donation path.
# ---------------------------------------------------------------------------

def _register_plan_pytrees():
    def flat_gather(g):
        return ((g.hi, g.val, g.vcells, getattr(g, "val_lo", None)),
                (g.W, g.Wv, g.RB, g.RBL, g.n, g.nnz))

    def unflat_gather(aux, leaves):
        g = object.__new__(GatherPlan)
        g.hi, g.val, g.vcells, g.val_lo = leaves
        g.W, g.Wv, g.RB, g.RBL, g.n, g.nnz = aux
        g.pos = None
        g._tmp = None
        return g

    jax.tree_util.register_pytree_node(GatherPlan, flat_gather,
                                       unflat_gather)

    def flat_gp(gp):
        return ((gp.ii1, gp.bits1, gp.io1, gp.ii2, gp.bits2, gp.io2),
                (gp.T, gp.TR, gp.rows_pp, gp.R1, gp.R2, gp.npad,
                 gp.dists1, gp.dists2))

    def unflat_gp(aux, leaves):
        gp = object.__new__(SRT.GlobalPermutePlan)
        (gp.ii1, gp.bits1, gp.io1, gp.ii2, gp.bits2, gp.io2) = leaves
        (gp.T, gp.TR, gp.rows_pp, gp.R1, gp.R2, gp.npad, gp.dists1,
         gp.dists2) = aux
        return gp

    jax.tree_util.register_pytree_node(SRT.GlobalPermutePlan, flat_gp,
                                       unflat_gp)

    def flat_plan(p):
        return ((p.g, p.gp, p.sel_lidx, p.sel_bits,
                 p.extra_owner, getattr(p, "lastidx8", None),
                 getattr(p, "samerow8", None),
                 getattr(p, "rowstart8", None)),
                (p.T, p.TR, p.YT_ROWS, p.m, p.m_sub, p.n,
                 getattr(p, "cg_stages", 0), getattr(p, "pack_up", False)))

    def unflat_plan(aux, leaves):
        p = object.__new__(SpmvRoutePlan)
        (p.g, p.gp, p.sel_lidx, p.sel_bits,
         p.extra_owner, p.lastidx8, p.samerow8, p.rowstart8) = leaves
        (p.T, p.TR, p.YT_ROWS, p.m, p.m_sub, p.n,
         p.cg_stages, p.pack_up) = aux
        return p

    jax.tree_util.register_pytree_node(SpmvRoutePlan, flat_plan,
                                       unflat_plan)

    def flat_sp(sp):
        return (sp.plans, (sp.bounds, sp.m, sp.n))

    def unflat_sp(aux, leaves):
        sp = object.__new__(StripedSpmvPlan)
        sp.plans = tuple(leaves)
        sp.bounds, sp.m, sp.n = aux
        return sp

    jax.tree_util.register_pytree_node(StripedSpmvPlan, flat_sp, unflat_sp)


_register_plan_pytrees()


# ---------------------------------------------------------------------------
# plan cache + serialization (the plan is a storage format: reference
# analog GxB pack/unpack move semantics + the hyper-hash built per matrix)
# ---------------------------------------------------------------------------

def plan_to_device(plan: "SpmvRoutePlan") -> "SpmvRoutePlan":
    """Device-resident copy of a plan (leaves as committed jax Arrays),
    cached on the plan object.  Plans load as lazily-mmapped numpy; numpy
    leaves passed to a jitted function are re-transferred host->device on
    EVERY call (seconds per call over a remote-TPU tunnel at bench scale).
    device_put once, then every algorithm/bench call reuses the resident
    copy.  (reference analog: GxB pack move semantics — the plan lives
    where the compute is, Source/GB_import.c)"""
    dp = getattr(plan, "_device", None)
    if dp is None:
        leaves, treedef = jax.tree_util.tree_flatten(plan)
        dp = jax.tree_util.tree_unflatten(
            treedef, [jax.device_put(np.asarray(l)) for l in leaves])
        object.__setattr__(plan, "_device", dp)
        object.__setattr__(dp, "_device", dp)
    return dp


_plan_cache: dict = {}


def plan_for(indptr, indices, values, shape, build=True):
    """Per-matrix cached SpmvRoutePlan.  Strong refs pin the source array
    ids and identity is re-checked on hit (see spmv_onehot.plan_for).
    With ``build=False`` only returns an already-cached plan (plan
    construction costs seconds-to-minutes: callers opt in via
    Matrix.optimize() or algorithm entry points)."""
    key = (id(indptr), id(indices), id(values), shape)
    ent = _plan_cache.get(key)
    if ent is not None and ent[0] is indptr and ent[1] is indices \
            and ent[2] is values:
        return ent[3]
    if not build:
        return None
    p = build_plan(np.asarray(indptr), np.asarray(indices),
                   np.asarray(values), shape)
    if len(_plan_cache) > 4:
        _plan_cache.clear()
    _plan_cache[key] = (indptr, indices, values, p)
    return p


def register_plan(indptr, indices, values, shape, plan):
    """Associate a (de)serialized plan with a matrix's arrays."""
    key = (id(indptr), id(indices), id(values), shape)
    if len(_plan_cache) > 4:
        _plan_cache.clear()
    _plan_cache[key] = (indptr, indices, values, plan)


_PLAN_SCALARS = ("T", "TR", "YT_ROWS", "m", "m_sub", "n")
_GP_SCALARS = ("T", "TR", "rows_pp", "R1", "R2", "npad")
_GP_ARRAYS = ("ii1", "bits1", "io1", "ii2", "bits2", "io2")


def save_plan(plan: "SpmvRoutePlan", path):
    """Serialize a route plan so plan build amortizes across runs
    (VERDICT r1 #9: the plan is a storage format).

    Layout: a DIRECTORY of raw .npy files (one per array).  Loading uses
    np.load(mmap_mode="r"): plan pages are file-backed, so the load costs
    page-cache reads instead of anonymous first-touch faults — on this
    VM's slow-fault kernel that's the difference between ~2 s and ~190 s
    for a bench-scale plan.  The directory keeps the exact given name
    (even a trailing .npz) so callers' os.path.exists checks keep
    working.  A legacy single-file .npz is still readable."""
    if isinstance(plan, StripedSpmvPlan):
        if os.path.isfile(path):
            os.remove(path)
        os.makedirs(path, exist_ok=True)
        np.save(os.path.join(path, "stripes.npy"),
                np.asarray(plan.bounds, np.int64))
        for k, p in enumerate(plan.plans):
            save_plan(p, os.path.join(path, f"stripe{k}"))
        return
    blob = _plan_blob(plan)
    if os.path.isfile(path):
        os.remove(path)
    os.makedirs(path, exist_ok=True)
    for k, v in blob.items():
        np.save(os.path.join(path, k + ".npy"), v)


def _plan_blob(plan):
    blob = {}
    for k in _PLAN_SCALARS:
        blob["p_" + k] = np.int64(getattr(plan, k))
    for k in ("sel_lidx", "sel_bits"):
        blob[k] = np.asarray(getattr(plan, k))
    for k in _GP_SCALARS:
        blob["gp_" + k] = np.int64(getattr(plan.gp, k))
    for k in _GP_ARRAYS:
        v = getattr(plan.gp, k)
        if v is not None:            # ii1/io1 are plan-composed away
            blob["gp_" + k] = np.asarray(v)
    blob["gp_dists1"] = np.asarray(plan.gp.dists1, np.int64)
    blob["gp_dists2"] = np.asarray(plan.gp.dists2, np.int64)
    for k in ("W", "Wv", "RB", "RBL", "n", "nnz"):
        blob["g_" + k] = np.int64(getattr(plan.g, k))
    blob["g_hi"] = np.asarray(plan.g.hi)
    blob["g_val"] = np.asarray(plan.g.val)
    if getattr(plan.g, "val_lo", None) is not None:
        blob["g_val_lo"] = np.asarray(plan.g.val_lo)
    blob["g_vcells"] = (np.asarray(plan.g.vcells) if plan.g.vcells
                        is not None else np.zeros((0, 128), np.int32))
    blob["extra_owner"] = (np.asarray(plan.extra_owner)
                           if plan.extra_owner is not None
                           else np.zeros(0, np.int32))
    if getattr(plan, "lastidx8", None) is not None:
        # store the per-sublane-row lane index UNbroadcast (128x smaller)
        blob["sel_last"] = np.asarray(plan.lastidx8)[:, 0]
        blob["sel_same"] = np.asarray(plan.samerow8)
        blob["p_cg_stages"] = np.int64(plan.cg_stages)
    if getattr(plan, "rowstart8", None) is not None:
        blob["rowstart8"] = np.asarray(plan.rowstart8)
    blob["p_pack_up"] = np.int64(1 if getattr(plan, "pack_up", False)
                                 else 0)
    return blob


class _DirBlob:
    """dict-like view over a directory of .npy files, loaded mmap'd."""

    def __init__(self, d):
        self._d = d

    def __getitem__(self, k):
        return np.load(os.path.join(self._d, k + ".npy"), mmap_mode="r")


def load_plan(path) -> "SpmvRoutePlan":
    if os.path.isdir(path):
        sf = os.path.join(path, "stripes.npy")
        if os.path.exists(sf):
            bounds = np.load(sf)
            plans = [load_plan(os.path.join(path, f"stripe{k}"))
                     for k in range(len(bounds) - 1)]
            return StripedSpmvPlan(plans, bounds, int(bounds[-1]),
                                   plans[0].n)
        z = _DirBlob(path)
    else:
        z = np.load(path)
    plan = object.__new__(SpmvRoutePlan)
    for k in _PLAN_SCALARS:
        setattr(plan, k, int(z["p_" + k]))
    plan.sel_lidx = jnp.asarray(z["sel_lidx"])
    try:
        plan.sel_bits = jnp.asarray(z["sel_bits"])
    except (KeyError, FileNotFoundError):
        # pre-merge blob: separate up/down masks
        nb = int(np.log2(plan.TR))
        plan.sel_bits = jnp.asarray(np.asarray(z["sel_bitsU"])
                                    | (np.asarray(z["sel_bitsD"]) << nb))
    gp = object.__new__(SRT.GlobalPermutePlan)
    for k in _GP_SCALARS:
        setattr(gp, k, int(z["gp_" + k]))
    for k in _GP_ARRAYS:
        try:
            setattr(gp, k, jnp.asarray(z["gp_" + k]))
        except (KeyError, FileNotFoundError):
            setattr(gp, k, None)     # composed-format blob: no ii1/io1
    gp.dists1 = tuple(int(d) for d in z["gp_dists1"])
    gp.dists2 = tuple(int(d) for d in z["gp_dists2"])
    plan.gp = gp
    g = object.__new__(GatherPlan)
    for k in ("W", "Wv", "RB", "RBL", "n", "nnz"):
        setattr(g, k, int(z["g_" + k]))
    g.hi = jnp.asarray(z["g_hi"])
    g.val = jnp.asarray(z["g_val"])
    try:
        g.val_lo = jnp.asarray(z["g_val_lo"])
    except (KeyError, FileNotFoundError):
        g.val_lo = None
    g.vcells = jnp.asarray(z["g_vcells"]) if z["g_vcells"].size else None
    g.pos = None
    g._tmp = None
    plan.g = g
    eo = z["extra_owner"]
    plan.extra_owner = jnp.asarray(eo) if eo.size else None
    try:
        lastlane = np.asarray(z["sel_last"])
        plan.lastidx8 = jnp.asarray(np.ascontiguousarray(
            np.broadcast_to(lastlane[:, None], (lastlane.shape[0], 128))))
        plan.samerow8 = jnp.asarray(z["sel_same"])
        plan.cg_stages = int(z["p_cg_stages"])
    except (KeyError, FileNotFoundError):
        # legacy plan (pre exact-reduce): old differencing kernel
        plan.lastidx8 = None
        plan.samerow8 = None
        plan.cg_stages = 0
    try:
        plan.rowstart8 = jnp.asarray(z["rowstart8"])
    except (KeyError, FileNotFoundError):
        plan.rowstart8 = None        # pre-monoid blob: plus-only plan
    try:
        plan.pack_up = bool(int(z["p_pack_up"]))
    except (KeyError, FileNotFoundError):
        plan.pack_up = False         # dual-roll pack blob
    _compose_plan_planes(plan)   # no-op on composed-format blobs
    return plan


def _pack(x, bits, TR, pack_up):
    return (SRT._pack_stages_up(x, bits, TR) if pack_up
            else SRT._pack_stages(x, bits, TR))


_NO_MXU_CUMSUM = bool(os.environ.get("GB_NO_MXU_CUMSUM"))


def _lane_cumsum_mxu(L):
    """Inclusive per-sublane-row prefix sum along lanes via THREE exact
    bf16 planes on the MXU (x = h1+h2+h3 captures all 24 mantissa bits;
    each plane rides one (R,128)x(128,128) matmul against an upper-
    triangular ones matrix, f32 accumulation).  Error class matches the
    7-stage roll cumsum; replaces ~21 VPU ops with MXU work (round-5
    reduce diet)."""
    # build the triangular constant through f32: selecting bf16 by an i1
    # mask forces an (8,128)->(16,128) mask relayout Mosaic cannot lower
    # on v5e; the f32 select + downcast lowers fine (and pallas forbids
    # captured device-array constants, so it must be built in-kernel)
    ii = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    U = (ii <= jj).astype(jnp.float32).astype(jnp.bfloat16)

    def dot(a):
        return jax.lax.dot_general(a, U, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    h1 = L.astype(jnp.bfloat16)
    r1 = L - h1.astype(jnp.float32)
    h2 = r1.astype(jnp.bfloat16)
    r2 = r1 - h2.astype(jnp.float32)
    h3 = r2.astype(jnp.bfloat16)
    return dot(h1) + (dot(h2) + dot(h3))


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
                      slidx_ref, sb_ref, y_ref,
                      *, dists, R, rows_in, YT_ROWS, TR, pack_up=False):
    x = x_ref[:].reshape(rows_in, 128)
    if rows_in < R:
        x = jnp.concatenate(
            [x, jnp.zeros((R - rows_in, 128), x.dtype)], axis=0)
    # finish the global route (phase-2 Clos)
    x = jnp.take_along_axis(x, ii_ref[:].astype(jnp.int32), axis=1)
    x = SRT._benes_stages(x, bits_ref[:], dists, R)
    x = jnp.take_along_axis(x, io_ref[:].astype(jnp.int32), axis=1)
    tile = x[: TR, :]
    # fused reduce: raster cumsum, pack row-end slots to the front block
    # (lane placement gather + monotone concentrator), difference
    cs = _raster_cumsum(tile)
    cs = jnp.take_along_axis(cs, slidx_ref[:].astype(jnp.int32), axis=1)
    cs = _pack(cs, sb_ref[:], TR, pack_up)
    sel = cs[:YT_ROWS, :]
    a = pltpu.roll(sel, 1, 1)
    b = pltpu.roll(a, 1, 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, sel.shape, 1)
    rowi = jax.lax.broadcasted_iota(jnp.int32, sel.shape, 0)
    prev = jnp.where(lane == 0, b, a)
    prev = jnp.where((lane == 0) & (rowi == 0), 0.0, prev)
    y_ref[:] = sel - prev


def _phase2ext_exact_kernel(x_ref, ii_ref, bits_ref, io_ref,
                            slidx_ref, sb_ref, li_ref, sr_ref, y_ref,
                            *, dists, R, rows_in, YT_ROWS, TR, cg_stages,
                            pack_up=False):
    """Exact-reduce variant: the float cumsum stays LOCAL to each 128-lane
    sublane row; cross-row mass rides a (tail, no-sentinel) linear-
    recurrence chain whose terms are row-sized, so row sums never
    difference two tile-scale prefixes (relerr ~eps*row instead of
    ~eps*sqrt(tile-elems)).  li: lane of last row-end sentinel per sublane
    row (-1 = none, broadcast over lanes); sr: packed-space flag, sentinel
    shares its sublane row with its predecessor."""
    x = x_ref[:].reshape(rows_in, 128)
    if rows_in < R:
        x = jnp.concatenate(
            [x, jnp.zeros((R - rows_in, 128), x.dtype)], axis=0)
    x = jnp.take_along_axis(x, ii_ref[:].astype(jnp.int32), axis=1)
    x = SRT._benes_stages(x, bits_ref[:], dists, R)
    x = jnp.take_along_axis(x, io_ref[:].astype(jnp.int32), axis=1)
    tile = x[: TR, :]
    lane = jax.lax.broadcasted_iota(jnp.int32, tile.shape, 1)
    rowi = jax.lax.broadcasted_iota(jnp.int32, tile.shape, 0)
    # per-sublane-row inclusive lane cumsum (local prefixes only);
    # MXU 3-plane matmul unless disabled (GB_NO_MXU_CUMSUM=1)
    if _NO_MXU_CUMSUM:
        L = tile
        k = 1
        while k < 128:
            L = L + jnp.where(lane >= k, pltpu.roll(L, k, 1), 0.0)
            k *= 2
    else:
        L = _lane_cumsum_mxu(tile)
    # widen the int8 plan blocks before comparing: Mosaic on v5e cannot
    # lower cmpi on i8 vectors ("Target does not support this comparison")
    li = li_ref[:].astype(jnp.int32)
    anys = (li >= 0)
    lastL = jnp.take_along_axis(
        L, jnp.maximum(li, 0), axis=1)
    rowtot = jax.lax.broadcast_in_dim(L[:, 127], L.shape, (0,))
    tail = rowtot - jnp.where(anys, lastL, 0.0)   # mass after last sentinel
    g = jnp.where(anys, 0.0, 1.0)
    # carry chain c_r = tail_r + g_r * c_{r-1}; cg_stages covers the
    # longest sentinel-free sublane-row run (0 stages when every row has
    # a sentinel — the common short-row case)
    c = tail
    for s in range(cg_stages):
        k = 1 << s
        c = c + g * jnp.where(rowi >= k, pltpu.roll(c, k, 0), 0.0)
        g = g * jnp.where(rowi >= k, pltpu.roll(g, k, 0), 1.0)
    carry = jnp.where(rowi >= 1, pltpu.roll(c, 1, 0), 0.0)
    # inject the carry into the whole row: first-in-row sentinels read
    # carry + local prefix directly; later sentinels difference two values
    # sharing the carry (both row-local in magnitude)
    Lp = L + carry
    cs = jnp.take_along_axis(Lp, slidx_ref[:].astype(jnp.int32), axis=1)
    cs = _pack(cs, sb_ref[:], TR, pack_up)
    sel = cs[:YT_ROWS, :]
    a = pltpu.roll(sel, 1, 1)
    b = pltpu.roll(a, 1, 0)
    lane2 = jax.lax.broadcasted_iota(jnp.int32, sel.shape, 1)
    prev = jnp.where(lane2 == 0, b, a)
    y_ref[:] = sel - jnp.where(sr_ref[:].astype(jnp.int32) != 0, prev, 0.0)


def _xt_table(xt, rows_in, wpt, rbl):
    """Window table covering one route tile: with wpt == 1 the tile
    lives in one window strip (tab = tile(strip)); with wpt > 1 (striped
    tail plans where RBL < TR) the tile spans wpt consecutive windows —
    stack each strip tiled over its RBL-row sub-block."""
    if wpt == 1:
        return jnp.tile(xt, (rows_in // 128, 1))
    xt3 = xt.reshape(wpt, 128, 128)
    return jnp.concatenate(
        [jnp.tile(xt3[k], (rbl // 128, 1)) for k in range(wpt)], axis=0)


def _gather_phase1_kernel(xt_ref, hi_ref, val_ref, bits_ref,
                          y_ref, *, dists, R, rows_in, rows_out, wpt=1,
                          rbl=0):
    """Fused stage A + phase 1: products never round-trip through HBM
    (saves 8 B/slot of traffic — the single largest block after the plan
    arrays).  Valid when route tiles and gather windows nest either way
    (RBL %% TR == 0, one-or-more tiles per window, or TR %% RBL == 0,
    wpt windows per tile — the striped tail case) and the gather domain
    covers the route domain.  The phase-1 lane gathers are plan-composed
    away (ii1 folded into hi/val, io1 into phase-2's ii2)."""
    tab = _xt_table(xt_ref[:], rows_in, wpt, rbl)
    idx = jnp.maximum(hi_ref[:].astype(jnp.int32), 0)  # -1 = dummy slot
    g = jnp.take_along_axis(tab, idx, axis=1)
    x = g * val_ref[:]
    if rows_in < R:
        x = jnp.concatenate(
            [x, jnp.zeros((R - rows_in, 128), x.dtype)], axis=0)
    x = SRT._benes_stages(x, bits_ref[:], dists, R)
    y_ref[:] = x[:rows_out, :]


def _phase1_noii_kernel(x_ref, bits_ref, y_ref, *, dists, R, rows_in,
                        rows_out):
    """Unfused phase 1 on a pre-gathered product array whose lanes already
    carry the ii1 permutation (plan-composed into hi/val)."""
    x = x_ref[:]
    if rows_in < R:
        x = jnp.concatenate(
            [x, jnp.zeros((R - rows_in, 128), x.dtype)], axis=0)
    x = SRT._benes_stages(x, bits_ref[:], dists, R)
    y_ref[:] = x[:rows_out, :]


# ---------------------------------------------------------------------------
# fp64 tier: double-single arithmetic over (hi, lo) f32 value planes.
#
# The reference's headline dtype is fp64 (FactoryKernels cover all 13
# types, Source/GB_AxB__plus_times_fp64.c); the TPU VPU has no native
# f64, so values ride as UNEVALUATED f32 SUMS v = hi + lo (double-single:
# ~2^-49 representable relative precision).  The ROUTING stages are
# value-agnostic selections — the same plan drives both planes, loaded
# once per kernel — only the multiply and the reduce change:
#   * products: Dekker TwoProd on the hi parts (exact, no FMA needed)
#     plus the f32 cross terms ah*xl + al*xh (al*xl < 2^-48 rel, dropped);
#   * reduce: the lane cumsum / carry chain / sentinel differencing run
#     as compensated TwoSum chains on both planes.
# Error bound: each TwoSum/TwoProd keeps ~2^-48 relative accuracy and the
# reduce depth is log2(128) + cg_stages + 2.  The reduce differences
# sublane-row-local prefixes, so the ABSOLUTE row error is
# ~2^-48 * (local prefix mass): scaled by the row 1-norm |A||x| that is
# ~1e-14 for typical rows (measured p99.99 = 1.4e-13 at bench scale on
# v5e, median 4e-15), while a near-empty row sharing a sublane row with
# heavy neighbors can show up to 2^-48 * (neighbor mass / row mass)
# relative (measured max 3.8e-11 on one degree-1 row of 2^20) — the same
# neighborhood-conditioning the f32 engine has at 2^-24.  |values| must
# stay below 2^103 (Dekker split multiplies by 2^12+1).
# ---------------------------------------------------------------------------

def _two_sum(a, b):
    """Error-free transform: a + b = s + e exactly (Knuth TwoSum)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def _two_prod(a, b):
    """Error-free transform: a * b = p + e exactly (Dekker, FMA-free)."""
    p = a * b
    ca = a * 4097.0
    ah = ca - (ca - a)
    al = a - ah
    cb = b * 4097.0
    bh = cb - (cb - b)
    bl = b - bh
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def _ds_add(h1, l1, h2, l2):
    s, e = _two_sum(h1, h2)
    return s, e + (l1 + l2)


def _gather_phase1_ds_kernel(xth_ref, xtl_ref, hi_ref, vh_ref, vl_ref,
                             bits_ref, yh_ref, yl_ref,
                             *, dists, R, rows_in, rows_out, wpt=1,
                             rbl=0):
    """Fused gather + TwoProd + phase-1 route on (hi, lo) planes.  The
    plan blocks (hi/bits) load ONCE and route both planes; the phase-1
    lane gathers are plan-composed away (see _compose_plan_planes)."""
    idx = jnp.maximum(hi_ref[:].astype(jnp.int32), 0)  # -1 = dummy slot
    gh = jnp.take_along_axis(_xt_table(xth_ref[:], rows_in, wpt, rbl),
                             idx, axis=1)
    gl = jnp.take_along_axis(_xt_table(xtl_ref[:], rows_in, wpt, rbl),
                             idx, axis=1)
    vh = vh_ref[:]
    ph, pe = _two_prod(vh, gh)
    pl_ = pe + (vh * gl + vl_ref[:] * gh)

    def route(x):
        if rows_in < R:
            x = jnp.concatenate(
                [x, jnp.zeros((R - rows_in, 128), x.dtype)], axis=0)
        return SRT._benes_stages(x, bits_ref[:], dists, R)

    yh_ref[:] = route(ph)[:rows_out, :]
    yl_ref[:] = route(pl_)[:rows_out, :]


def _phase2ext_exact_ds_kernel(xh_ref, xl_ref, ii_ref, bits_ref, io_ref,
                               slidx_ref, sb_ref, li_ref, sr_ref,
                               yh_ref, yl_ref, *, dists, R, rows_in,
                               YT_ROWS, TR, cg_stages, pack_up=False):
    """Double-single variant of _phase2ext_exact_kernel: same local-prefix
    + carry-chain structure, every float add replaced by a compensated
    TwoSum on the (hi, lo) planes."""
    def finish_route(x):
        x = x.reshape(rows_in, 128)
        if rows_in < R:
            x = jnp.concatenate(
                [x, jnp.zeros((R - rows_in, 128), x.dtype)], axis=0)
        x = jnp.take_along_axis(x, ii_ref[:].astype(jnp.int32), axis=1)
        x = SRT._benes_stages(x, bits_ref[:], dists, R)
        x = jnp.take_along_axis(x, io_ref[:].astype(jnp.int32), axis=1)
        return x[:TR, :]

    Lh = finish_route(xh_ref[:])
    Ll = finish_route(xl_ref[:])
    lane = jax.lax.broadcasted_iota(jnp.int32, Lh.shape, 1)
    rowi = jax.lax.broadcasted_iota(jnp.int32, Lh.shape, 0)
    k = 1
    while k < 128:
        m = lane >= k
        ah = jnp.where(m, pltpu.roll(Lh, k, 1), 0.0)
        al = jnp.where(m, pltpu.roll(Ll, k, 1), 0.0)
        Lh, Ll = _ds_add(Lh, Ll, ah, al)
        k *= 2
    li = li_ref[:].astype(jnp.int32)
    anys = (li >= 0)
    lasth = jnp.take_along_axis(Lh, jnp.maximum(li, 0), axis=1)
    lastl = jnp.take_along_axis(Ll, jnp.maximum(li, 0), axis=1)
    toth = jax.lax.broadcast_in_dim(Lh[:, 127], Lh.shape, (0,))
    totl = jax.lax.broadcast_in_dim(Ll[:, 127], Ll.shape, (0,))
    th, tl = _ds_add(toth, totl, -jnp.where(anys, lasth, 0.0),
                     -jnp.where(anys, lastl, 0.0))
    g = jnp.where(anys, 0.0, 1.0)
    ch, cl = th, tl
    for s in range(cg_stages):
        k = 1 << s
        m = rowi >= k
        ah = jnp.where(m, g * pltpu.roll(ch, k, 0), 0.0)
        al = jnp.where(m, g * pltpu.roll(cl, k, 0), 0.0)
        ch, cl = _ds_add(ch, cl, ah, al)
        g = g * jnp.where(m, pltpu.roll(g, k, 0), 1.0)
    carh = jnp.where(rowi >= 1, pltpu.roll(ch, 1, 0), 0.0)
    carl = jnp.where(rowi >= 1, pltpu.roll(cl, 1, 0), 0.0)
    Lh, Ll = _ds_add(Lh, Ll, carh, carl)
    sl = slidx_ref[:].astype(jnp.int32)
    csh = _pack(jnp.take_along_axis(Lh, sl, axis=1), sb_ref[:], TR,
                pack_up)
    csl = _pack(jnp.take_along_axis(Ll, sl, axis=1), sb_ref[:], TR,
                pack_up)
    selh = csh[:YT_ROWS, :]
    sell = csl[:YT_ROWS, :]
    ah = pltpu.roll(selh, 1, 1)
    al = pltpu.roll(sell, 1, 1)
    bh = pltpu.roll(ah, 1, 0)
    bl = pltpu.roll(al, 1, 0)
    lane2 = jax.lax.broadcasted_iota(jnp.int32, selh.shape, 1)
    prevh = jnp.where(lane2 == 0, bh, ah)
    prevl = jnp.where(lane2 == 0, bl, al)
    sub = sr_ref[:].astype(jnp.int32) != 0
    oh, ol = _ds_add(selh, sell, -jnp.where(sub, prevh, 0.0),
                     -jnp.where(sub, prevl, 0.0))
    yh_ref[:] = oh
    yl_ref[:] = ol


def _window_xt(x, g: GatherPlan):
    """Window-transposed x table (+ virtual hub windows), shared by the
    fused and standalone gather paths."""
    Wr = g.W - g.Wv
    npad = Wr * WIN
    xp = jnp.pad(x.astype(jnp.float32), (0, npad - x.shape[0]))
    xt = jnp.swapaxes(xp.reshape(Wr, 128, 128), 1, 2).reshape(Wr * 128, 128)
    if g.Wv:
        xt = jnp.concatenate([xt, xp[g.vcells]], axis=0)
    return xt


# kill switches for the round-trip-saving executor variants: legacy mode
# (GB_ROUTE_LEGACY=1 or force_legacy=True) runs the unfused gather +
# global-cumsum reduce proven on hardware, so a Mosaic regression in the
# newer kernels degrades throughput, not correctness
_FORCE_LEGACY = bool(os.environ.get("GB_ROUTE_LEGACY"))


def spmv_route(x, plan, *, interpret=None, force_legacy=None):
    """y = A @ x (plus-times fp32) through the routing engine.
    ``interpret=None`` auto-selects interpret mode on the CPU backend so
    routed paths stay testable on the CI mesh.  Accepts a striped plan
    (per-stripe sub-SpMVs, y = concat)."""
    if isinstance(plan, StripedSpmvPlan):
        return jnp.concatenate(
            [spmv_route(x, p, interpret=interpret,
                        force_legacy=force_legacy) for p in plan.plans])
    interpret = _auto_interpret(interpret)
    legacy = _FORCE_LEGACY if force_legacy is None else force_legacy
    gp = plan.gp
    T2, R1, R2 = gp.T, gp.R1, gp.R2
    TR = getattr(gp, "TR", SRT.TILE_R)
    rows_pp = gp.rows_pp
    N_dst = T2 * TR * 128
    gs = plan.g
    N_src = gs.W * gs.RBL * 128
    can_fuse, wpt, win_rows, ratio = _fuse_geometry(gs, TR)
    fuse = can_fuse and (N_src == N_dst) and not legacy
    cp = (None if interpret else
          pltpu.CompilerParams(vmem_limit_bytes=120 * 1024 * 1024))
    if fuse:
        k1 = functools.partial(_gather_phase1_kernel, dists=gp.dists1,
                               R=R1, rows_in=TR, rows_out=T2 * rows_pp,
                               wpt=wpt, rbl=gs.RBL)
        phase1 = pl.pallas_call(
            k1,
            grid=(T2,),
            in_specs=[
                pl.BlockSpec((win_rows, 128), lambda t: (t // ratio, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TR, 128), lambda t: (t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TR, 128), lambda t: (t, 0),
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
    else:
        prods = gather_products(x, plan.g, interpret=interpret)
        # pad product array to the route domain and run phase 1 (the
        # product lanes already carry ii1 — composed into hi/val)
        pf = prods.reshape(-1)
        pf = jnp.pad(pf, (0, N_dst - pf.shape[0]))
        xp = pf.reshape(-1, 128)
        k1 = functools.partial(_phase1_noii_kernel, dists=gp.dists1, R=R1,
                               rows_in=TR, rows_out=T2 * rows_pp)
        phase1 = pl.pallas_call(
            k1,
            grid=(T2,),
            in_specs=[
                pl.BlockSpec((TR, 128), lambda t: (t, 0),
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
    exact = getattr(plan, "lastidx8", None) is not None and not legacy
    specs2 = [
        pl.BlockSpec((T2, 1, rows_pp, 128), lambda t: (0, t, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((R2, 128), lambda t: (t, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((R2, 128), lambda t: (t, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((R2, 128), lambda t: (t, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((TR, 128), lambda t: (t, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((TR, 128), lambda t: (t, 0),
                     memory_space=pltpu.VMEM),
    ]
    if exact:
        k2 = functools.partial(_phase2ext_exact_kernel, dists=gp.dists2,
                               R=R2, rows_in=T2 * rows_pp,
                               YT_ROWS=plan.YT_ROWS, TR=TR,
                               cg_stages=plan.cg_stages,
                               pack_up=getattr(plan, "pack_up", False))
        specs2 += [
            pl.BlockSpec((TR, 128), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((plan.YT_ROWS, 128), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
        ]
    else:
        k2 = functools.partial(_phase2ext_kernel, dists=gp.dists2, R=R2,
                               rows_in=T2 * rows_pp, YT_ROWS=plan.YT_ROWS,
                               TR=TR,
                               pack_up=getattr(plan, "pack_up", False))
    phase2 = pl.pallas_call(
        k2,
        grid=(T2,),
        in_specs=specs2,
        out_specs=pl.BlockSpec((plan.YT_ROWS, 128), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T2 * plan.YT_ROWS, 128),
                                       jnp.float32),
        interpret=interpret,
        compiler_params=cp,
    )
    with jax.enable_x64(False):
        if fuse:
            mid = phase1(_window_xt(x, gs), gs.hi, gs.val, gp.bits1)
        else:
            mid = phase1(xp, gp.bits1)
        mid4 = mid.reshape(T2, T2, rows_pp, 128)
        if exact:
            y = phase2(mid4, gp.ii2, gp.bits2, gp.io2,
                       plan.sel_lidx, plan.sel_bits,
                       plan.lastidx8, plan.samerow8)
        else:
            y = phase2(mid4, gp.ii2, gp.bits2, gp.io2,
                       plan.sel_lidx, plan.sel_bits)
    y = y.reshape(-1)
    if plan.extra_owner is not None:
        # heavy-row sub-rows: add the extra chunks' partial sums back
        return y[: plan.m].at[plan.extra_owner].add(
            y[plan.m: plan.m_sub])
    return y[: plan.m]


def spmv_route_ds(x, plan, *, interpret=None):
    """y = A @ x in fp64 through the routing engine, carried as
    double-single (hi, lo) f32 planes (see the fp64-tier comment above).
    Requires a plan built from f64 values (plan.g.val_lo), the fused
    gather layout, and the exact-reduce side data; returns an f64 vector.
    Returns None when the plan cannot drive this tier (caller falls back
    to the XLA substrate)."""
    if isinstance(plan, StripedSpmvPlan):
        ys = [spmv_route_ds(x, p, interpret=interpret) for p in plan.plans]
        if any(y is None for y in ys):
            return None
        return jnp.concatenate(ys)
    interpret = _auto_interpret(interpret)
    gp = plan.gp
    gs = plan.g
    if getattr(gs, "val_lo", None) is None \
            or getattr(plan, "lastidx8", None) is None:
        return None
    T2, R1, R2 = gp.T, gp.R1, gp.R2
    TR = getattr(gp, "TR", SRT.TILE_R)
    rows_pp = gp.rows_pp
    N_dst = T2 * TR * 128
    N_src = gs.W * gs.RBL * 128
    can_fuse, wpt, win_rows, ratio = _fuse_geometry(gs, TR)
    if not (can_fuse and (N_src == N_dst)):
        return None
    cp = (None if interpret else
          pltpu.CompilerParams(vmem_limit_bytes=120 * 1024 * 1024))
    k1 = functools.partial(_gather_phase1_ds_kernel, dists=gp.dists1,
                           R=R1, rows_in=TR, rows_out=T2 * rows_pp,
                           wpt=wpt, rbl=gs.RBL)
    bspec = lambda r: pl.BlockSpec((r, 128), lambda t: (t, 0),  # noqa: E731
                                   memory_space=pltpu.VMEM)
    win_spec = pl.BlockSpec((win_rows, 128), lambda t: (t // ratio, 0),
                            memory_space=pltpu.VMEM)
    mid_shape = jax.ShapeDtypeStruct((T2 * T2 * rows_pp, 128), jnp.float32)
    phase1 = pl.pallas_call(
        k1,
        grid=(T2,),
        in_specs=[win_spec, win_spec, bspec(TR), bspec(TR), bspec(TR),
                  bspec(R1)],
        out_specs=(pl.BlockSpec((T2 * rows_pp, 128), lambda t: (t, 0),
                                memory_space=pltpu.VMEM),) * 2,
        out_shape=(mid_shape, mid_shape),
        interpret=interpret,
        compiler_params=cp,
    )
    k2 = functools.partial(_phase2ext_exact_ds_kernel, dists=gp.dists2,
                           R=R2, rows_in=T2 * rows_pp,
                           YT_ROWS=plan.YT_ROWS, TR=TR,
                           cg_stages=plan.cg_stages,
                           pack_up=getattr(plan, "pack_up", False))
    mid_spec = pl.BlockSpec((T2, 1, rows_pp, 128), lambda t: (0, t, 0, 0),
                            memory_space=pltpu.VMEM)
    y_shape = jax.ShapeDtypeStruct((T2 * plan.YT_ROWS, 128), jnp.float32)
    phase2 = pl.pallas_call(
        k2,
        grid=(T2,),
        in_specs=[mid_spec, mid_spec, bspec(R2), bspec(R2), bspec(R2),
                  bspec(TR), bspec(TR), bspec(TR), bspec(plan.YT_ROWS)],
        out_specs=(pl.BlockSpec((plan.YT_ROWS, 128), lambda t: (t, 0),
                                memory_space=pltpu.VMEM),) * 2,
        out_shape=(y_shape, y_shape),
        interpret=interpret,
        compiler_params=cp,
    )
    x64 = x.astype(jnp.float64)
    xh = x64.astype(jnp.float32)
    xl = (x64 - xh.astype(jnp.float64)).astype(jnp.float32)
    with jax.enable_x64(False):
        mh, ml = phase1(_window_xt(xh, gs), _window_xt(xl, gs),
                        gs.hi, gs.val, gs.val_lo, gp.bits1)
        mh4 = mh.reshape(T2, T2, rows_pp, 128)
        ml4 = ml.reshape(T2, T2, rows_pp, 128)
        yh, yl = phase2(mh4, ml4, gp.ii2, gp.bits2, gp.io2,
                        plan.sel_lidx, plan.sel_bits,
                        plan.lastidx8, plan.samerow8)
    y = yh.reshape(-1).astype(jnp.float64) \
        + yl.reshape(-1).astype(jnp.float64)
    if plan.extra_owner is not None:
        return y[: plan.m].at[plan.extra_owner].add(
            y[plan.m: plan.m_sub])
    return y[: plan.m]


# ---------------------------------------------------------------------------
# semiring-generic tier: routed SpMV over any (add-monoid, multiply) pair
# of {min,max,plus} x {plus,times,first,second,pair} on f32 planes.
#
# The ROUTING stages are value-agnostic selections, so one plan drives
# every semiring; what changes is (a) the multiply in the gather stage,
# (b) the padding/dummy injection value (the add identity, marked by
# hi = -1 dummy slots), and (c) the reduce: non-invertible monoids (min,
# max) cannot difference a cumsum at sentinels, so the reduce runs as a
# SEGMENTED inclusive scan restarting at row-start flags (rowstart8
# plane), with the same sublane-row carry chain as the exact kernel.
# Sentinel slots carry the identity, so empty rows reduce to it (min-plus
# SSSP: unreached = +inf, exactly the LAGraph convention).
#
# Reference analog: the semiring-generic saxpy factory expansion
# (Source/Factories/GB_AxB_factory.c:15-36) — here the "expansion" is a
# functools.partial over (ident, add, mul) traced by XLA per semiring.
# ---------------------------------------------------------------------------

_INF = float(np.inf)

MONOID_FNS = {
    "plus": (0.0, lambda a, b: a + b, "add"),
    "min": (_INF, jnp.minimum, "min"),
    "max": (-_INF, jnp.maximum, "max"),
}

MULT_FNS = {
    "times": lambda g, v: g * v,
    "plus": lambda g, v: g + v,
    "first": lambda g, v: v,      # first(a_ik, x_k) = A value
    "second": lambda g, v: g,     # second(a_ik, x_k) = x value
    "pair": lambda g, v: jnp.full_like(g, 1.0),
}


def _gather_phase1_monoid_kernel(xt_ref, hi_ref, val_ref, bits_ref, y_ref,
                                 *, dists, R, rows_in, rows_out, ident,
                                 mul, wpt=1, rbl=0):
    tab = _xt_table(xt_ref[:], rows_in, wpt, rbl)
    idxr = hi_ref[:].astype(jnp.int32)
    g = jnp.take_along_axis(tab, jnp.maximum(idxr, 0), axis=1)
    p = mul(g, val_ref[:])
    x = jnp.where(idxr < 0, jnp.float32(ident), p)   # dummies -> identity
    if rows_in < R:
        x = jnp.concatenate(
            [x, jnp.full((R - rows_in, 128), jnp.float32(ident))], axis=0)
    x = SRT._benes_stages(x, bits_ref[:], dists, R)
    y_ref[:] = x[:rows_out, :]


def _phase2_monoid_kernel(x_ref, ii_ref, bits_ref, io_ref, slidx_ref,
                          sb_ref, rs_ref, y_ref, *, dists, R, rows_in,
                          YT_ROWS, TR, cstages, ident, add,
                          pack_up=False):
    """Segmented-scan reduce: rowstart flags restart the scan; cross-
    sublane-row mass rides a (value, has-start) carry chain."""
    x = x_ref[:].reshape(rows_in, 128)
    if rows_in < R:
        x = jnp.concatenate(
            [x, jnp.full((R - rows_in, 128), jnp.float32(ident))], axis=0)
    x = jnp.take_along_axis(x, ii_ref[:].astype(jnp.int32), axis=1)
    x = SRT._benes_stages(x, bits_ref[:], dists, R)
    x = jnp.take_along_axis(x, io_ref[:].astype(jnp.int32), axis=1)
    L = x[:TR, :]
    F = (rs_ref[:] != 0).astype(jnp.int32)
    lane = jax.lax.broadcasted_iota(jnp.int32, L.shape, 1)
    rowi = jax.lax.broadcasted_iota(jnp.int32, L.shape, 0)
    k = 1
    while k < 128:            # segmented inclusive scan along lanes
        Lk = pltpu.roll(L, k, 1)
        Fk = pltpu.roll(F, k, 1)
        m = (lane >= k) & (F == 0)
        L = jnp.where(m, add(Lk, L), L)
        F = jnp.where(lane >= k, F | Fk, F)
        k *= 2
    # carry chain over sublane rows: c_r = Fr ? V_r : add(c_{r-1}, V_r)
    V = jax.lax.broadcast_in_dim(L[:, 127], L.shape, (0,))
    Fr = jax.lax.broadcast_in_dim(F[:, 127], F.shape, (0,))
    c = V
    g = jnp.where(Fr != 0, 0, 1)
    for s_ in range(cstages):
        k = 1 << s_
        cin = pltpu.roll(c, k, 0)
        gin = pltpu.roll(g, k, 0)
        m = (rowi >= k) & (g == 1)
        c = jnp.where(m, add(cin, c), c)
        g = jnp.where(rowi >= k, g * gin, g)
    carry = jnp.where(rowi >= 1, pltpu.roll(c, 1, 0), jnp.float32(ident))
    L = jnp.where(F == 0, add(carry, L), L)   # inject into open prefixes
    cs = jnp.take_along_axis(L, slidx_ref[:].astype(jnp.int32), axis=1)
    cs = _pack(cs, sb_ref[:], TR, pack_up)
    y_ref[:] = cs[:YT_ROWS, :]


def monoid_tier_ok(plan):
    """Static predicate: can spmv_route_monoid drive this plan?"""
    plans = plan.plans if isinstance(plan, StripedSpmvPlan) else (plan,)
    return all(getattr(p, "rowstart8", None) is not None for p in plans)


def spmv_route_monoid(x, plan, *, add="min", mul="plus", interpret=None):
    """y = A (add.mul) x through the routing engine for a generic
    semiring (f32 value planes).  Returns None when the plan cannot
    drive this tier (no rowstart plane / unfused layout) — callers fall
    back to the XLA substrate.  add='plus' pairs are better served by
    ``spmv_route`` (cumsum-difference reduce); this path exists for the
    non-invertible monoids (min/max: SSSP, widest-path, lor-land)."""
    if isinstance(plan, StripedSpmvPlan):
        ys = [spmv_route_monoid(x, p, add=add, mul=mul,
                                interpret=interpret) for p in plan.plans]
        if any(y is None for y in ys):
            return None
        return jnp.concatenate(ys)
    interpret = _auto_interpret(interpret)
    ident, addf, atname = MONOID_FNS[add]
    mulf = MULT_FNS[mul]
    gp = plan.gp
    gs = plan.g
    if getattr(plan, "rowstart8", None) is None:
        return None
    T2, R1, R2 = gp.T, gp.R1, gp.R2
    TR = getattr(gp, "TR", SRT.TILE_R)
    rows_pp = gp.rows_pp
    N_dst = T2 * TR * 128
    N_src = gs.W * gs.RBL * 128
    can_fuse, wpt, win_rows, ratio = _fuse_geometry(gs, TR)
    fuse = can_fuse and (N_src == N_dst)
    cp = (None if interpret else
          pltpu.CompilerParams(vmem_limit_bytes=120 * 1024 * 1024))
    cstages = min(plan.cg_stages + 1, int(np.log2(TR)))
    bspec = lambda r: pl.BlockSpec((r, 128), lambda t: (t, 0),  # noqa: E731
                                   memory_space=pltpu.VMEM)
    if fuse:
        k1 = functools.partial(_gather_phase1_monoid_kernel,
                               dists=gp.dists1, R=R1, rows_in=TR,
                               rows_out=T2 * rows_pp, ident=ident,
                               mul=mulf, wpt=wpt, rbl=gs.RBL)
        phase1 = pl.pallas_call(
            k1,
            grid=(T2,),
            in_specs=[
                pl.BlockSpec((win_rows, 128), lambda t: (t // ratio, 0),
                             memory_space=pltpu.VMEM),
                bspec(TR), bspec(TR), bspec(R1),
            ],
            out_specs=pl.BlockSpec((T2 * rows_pp, 128), lambda t: (t, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((T2 * T2 * rows_pp, 128),
                                           jnp.float32),
            interpret=interpret,
            compiler_params=cp,
        )
    else:
        # unfused: standalone gather (hub/virtual-window layouts), then
        # phase 1 on the identity-padded product array
        prods = _gather_products_monoid(x, gs, ident, mulf,
                                        interpret=interpret)
        pf = prods.reshape(-1)
        pf = jnp.concatenate(
            [pf, jnp.full((N_dst - pf.shape[0],), jnp.float32(ident))])
        xp = pf.reshape(-1, 128)
        k1 = functools.partial(_phase1_monoid_noii_kernel, dists=gp.dists1,
                               R=R1, rows_in=TR, rows_out=T2 * rows_pp,
                               ident=ident)
        phase1 = pl.pallas_call(
            k1,
            grid=(T2,),
            in_specs=[bspec(TR), bspec(R1)],
            out_specs=pl.BlockSpec((T2 * rows_pp, 128), lambda t: (t, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((T2 * T2 * rows_pp, 128),
                                           jnp.float32),
            interpret=interpret,
            compiler_params=cp,
        )
    k2 = functools.partial(_phase2_monoid_kernel, dists=gp.dists2, R=R2,
                           rows_in=T2 * rows_pp, YT_ROWS=plan.YT_ROWS,
                           TR=TR, cstages=cstages, ident=ident, add=addf,
                           pack_up=getattr(plan, "pack_up", False))
    phase2 = pl.pallas_call(
        k2,
        grid=(T2,),
        in_specs=[
            pl.BlockSpec((T2, 1, rows_pp, 128), lambda t: (0, t, 0, 0),
                         memory_space=pltpu.VMEM),
            bspec(R2), bspec(R2), bspec(R2), bspec(TR), bspec(TR),
            bspec(TR),
        ],
        out_specs=pl.BlockSpec((plan.YT_ROWS, 128), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T2 * plan.YT_ROWS, 128),
                                       jnp.float32),
        interpret=interpret,
        compiler_params=cp,
    )
    with jax.enable_x64(False):
        if fuse:
            mid = phase1(_window_xt(x, gs), gs.hi, gs.val, gp.bits1)
        else:
            mid = phase1(xp, gp.bits1)
        mid4 = mid.reshape(T2, T2, rows_pp, 128)
        y = phase2(mid4, gp.ii2, gp.bits2, gp.io2,
                   plan.sel_lidx, plan.sel_bits, plan.rowstart8)
    y = y.reshape(-1)
    if plan.extra_owner is not None:
        base = y[: plan.m]
        extra = y[plan.m: plan.m_sub]
        base = getattr(base.at[plan.extra_owner], atname)(extra)
        return base
    return y[: plan.m]


def _phase1_monoid_noii_kernel(x_ref, bits_ref, y_ref, *, dists, R,
                               rows_in, rows_out, ident):
    x = x_ref[:]
    if rows_in < R:
        x = jnp.concatenate(
            [x, jnp.full((R - rows_in, 128), jnp.float32(ident))], axis=0)
    x = SRT._benes_stages(x, bits_ref[:], dists, R)
    y_ref[:] = x[:rows_out, :]


def _gather_products_monoid(x, gplan: GatherPlan, ident, mulf, *,
                            interpret=False):
    """Standalone monoid gather: like gather_products but with the
    semiring multiply and identity-valued dummy slots (hi = -1)."""
    interpret = _auto_interpret(interpret)
    W, RB = gplan.W, gplan.RBL
    xt = _window_xt(x, gplan)

    def kern(xt_ref, hi_ref, val_ref, out_ref):
        tab = jnp.tile(xt_ref[:], (-(-RB // 128), 1))[:RB]
        idxr = hi_ref[:].astype(jnp.int32)
        g = jnp.take_along_axis(tab, jnp.maximum(idxr, 0), axis=1)
        p = mulf(g, val_ref[:])
        out_ref[:] = jnp.where(idxr < 0, jnp.float32(ident), p)

    f = pl.pallas_call(
        kern,
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
        return f(xt, gplan.hi, gplan.val)
