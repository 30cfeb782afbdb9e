"""Static routing engine: plan-time Benes/Clos routing + Pallas executors.

The TensorCore has no scatter/gather; every sparse kernel reduces to
moving values between two static orders.  This module turns a STATIC
permutation (known at plan time, per matrix) into a fixed sequence of
vector ops:

  * ``benes_route`` (host, numpy, batched): routes arbitrary permutations
    onto a Benes pair-exchange network — 2*log2(M)-1 stages, masks packed
    as one int32 bitfield per element (M <= 2^16).  Routing is the
    union-of-matchings 2-coloring, vectorized with pointer doubling (no
    cycle walking).
  * ``clos_route`` (host): routes an arbitrary permutation of an (R, L)
    tile onto lane-perm(in) -> per-lane sublane-Benes -> lane-perm(out)
    (a 3-stage Clos network).  The lane stages are routed by recursive
    Euler splitting of the (src-row x dst-row) L-regular bipartite
    multigraph — each split is the same orbit 2-coloring.
  * ``sublane_permute`` (Pallas): applies per-lane-column Benes networks
    to an (R, 128) tile — roll+select stages, measured ~20 Gelem/s for a
    full 17-stage permutation on v5e (experiments/benes_exec.py).
  * ``tile_permute`` (Pallas): arbitrary (R, 128) tile permutation =
    dim1 lane gather -> sublane_permute -> dim1 lane gather.

Planned consumer (next iteration): the 3-stage SpMV
(ROUTER_DESIGN.md — windowed gather -> 2-phase bucket route built from
tile_permute + DMA -> cumsum reduce), plus transpose/sort/builder.

Reference counterpart: none — this replaces the reference's reliance on
random-access memory (Gustavson hash tables, qsort) with plan-time
routing, the way a systolic/vector machine wants it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils import native


# ---------------------------------------------------------------------------
# plan time: Benes routing (batched over independent columns)
# ---------------------------------------------------------------------------

def _route_level(src):
    """One Benes level, batched.  src: (B, M) permutations (out = x[src]).
    Returns (mask_in, mask_out, perm_upper, perm_lower)."""
    B, M = src.shape
    h = M // 2
    src = src.astype(np.int32, copy=False)
    base = (np.arange(B, dtype=np.int32) * M)[:, None]
    ar = np.arange(M, dtype=np.int32)[None, :]
    srcf = src.ravel()
    inv = np.empty_like(src)
    np.put_along_axis(inv, src, np.broadcast_to(ar, (B, M)).copy(), 1)
    # 2-color the union of the IN matching (i <-> i^h) and the OUT
    # matching (i <-> source feeding the paired output)
    q = srcf[(inv ^ h) + base]
    from ..utils import native as NV
    flat_q = (q.astype(np.int64) + base).ravel()
    flat_in = ((np.broadcast_to(ar, (B, M)) ^ h).astype(np.int64)
               + base).ravel()
    cn = NV.cycle_2color(flat_in, flat_q)
    if cn is not None:
        color = cn.reshape(B, M)
    else:
        nxt = q ^ h
        rep = np.broadcast_to(ar, (B, M)).copy()
        jump = nxt + base
        for _ in range(int(np.ceil(np.log2(max(M, 2)))) + 1):
            np.minimum(rep, rep.ravel()[jump], out=rep)
            jump = jump.ravel()[jump]
        prep = rep.ravel()[q + base]
        color = (rep > prep).astype(np.int8)
    swap_in = color[:, :h] == 1
    mask_in = np.concatenate([swap_in, swap_in], axis=1)
    srccolor = color.ravel()[src + base]
    swap_out = srccolor[:, :h] == 1
    mask_out = np.concatenate([swap_out, swap_out], axis=1)
    src_lo, src_hi = src[:, :h], src[:, h:]
    up_src = np.where(swap_out, src_hi, src_lo)
    lo_src = np.where(swap_out, src_lo, src_hi)
    return mask_in, mask_out, up_src % h, lo_src % h


def benes_route(perm):
    """(dists, masks) for a full Benes network.  perm: (B, M), M = 2^k,
    out = x[perm] per row.  Stage s swaps i <-> i^dists[s] where
    masks[s][b, i] (symmetric in each pair).  Iterative over levels: all
    2^l same-size subproblems route as one batched call."""
    B, M = perm.shape
    if M == 1:
        return [], []
    front, back = [], []
    cur = perm
    size = M
    while size > 2:
        mi, mo, pu, pl_ = _route_level(cur)
        front.append(mi.reshape(B, M))
        back.append(mo.reshape(B, M))
        nb, half = cur.shape[0], size // 2
        cur = np.stack([pu, pl_], axis=1).reshape(nb * 2, half)
        size = half
    swap = (cur[:, :1] == 1)
    center = np.concatenate([swap, swap], 1).reshape(B, M)
    masks = front + [center] + back[::-1]
    half_dists = [M >> (l + 1) for l in range(len(front))]
    dists = half_dists + [1] + half_dists[::-1]
    return dists, masks


def benes_dists(M):
    """Stage exchange distances for a Benes network on M = 2^k."""
    if M == 1:
        return []
    if M == 2:
        return [1]
    log2M = int(np.log2(M))
    half = [M >> (l + 1) for l in range(log2M - 1)]
    return half + [1] + half[::-1]


def benes_route_packed(perm):
    """(dists, bits): like benes_route + pack_masks, but routed by the
    native O(n) cycle-walk planner when available (~50x the numpy path)."""
    from ..utils import native as NV
    B, M = perm.shape
    bits = NV.benes_route_bits(np.ascontiguousarray(perm))
    if bits is None:
        dists, masks = benes_route(perm)
        return dists, (pack_masks(masks) if masks
                       else np.zeros((B, M), np.int32))
    return benes_dists(M), bits


def pack_masks(masks):
    """Bit-pack per-stage masks into one int32 per element (<= 31 stages,
    i.e. M <= 2^16).  masks[s]: (B, M) -> bits: (B, M) int32."""
    assert len(masks) <= 31
    bits = np.zeros(masks[0].shape, np.int32)
    for s, m in enumerate(masks):
        bits |= (m.astype(np.int32) << s)
    return bits


# ---------------------------------------------------------------------------
# plan time: Clos routing for full (R, L) tile permutations
# ---------------------------------------------------------------------------

def _cycle_2color(pair_a, pair_b, max_cycle=None):
    """2-color elements so paired elements (under either matching) get
    opposite colors.  pair_a/pair_b: (N,) int arrays (involutions).
    Returns colors (N,) in {0, 1}.  Same orbit trick as Benes routing.
    ``max_cycle`` bounds the doubling rounds (cycles never exceed the
    subproblem size when keys encode independent subproblems)."""
    from ..utils import native as NV
    cn = NV.cycle_2color(pair_a, pair_b)
    if cn is not None:                   # native O(n) cycle walk
        return cn
    n = pair_a.shape[0]
    nxt = pair_b[pair_a]                 # same-color step
    rep = np.arange(n, dtype=np.int64)
    jump = nxt.astype(np.int64)
    bound = max_cycle if max_cycle is not None else n
    for _ in range(int(np.ceil(np.log2(max(bound, 2)))) + 1):
        new = np.minimum(rep, rep[jump])
        if np.array_equal(new, rep):
            break
        rep = new
        jump = jump[jump]
    prep = rep[pair_a]                   # partner (opposite-color) orbit
    return (rep > prep).astype(np.int8)


def _euler_split(src_key, dst_key, max_cycle=None):
    """Split a multigraph with even degree at every key into two halves
    (True = second half), balanced per key on BOTH sides.  Keys may encode
    (group, tile, row) so many independent subproblems split in one call.

    Pair edges arbitrarily at each src key and at each dst key;
    alternating colors along the resulting pairing cycles yields a
    balanced split (each key keeps exactly half its edges per side)."""
    E = src_key.shape[0]
    def pairing(keys):
        order = np.argsort(keys, kind="stable")
        mate = np.empty(E, np.int64)
        o = order.reshape(-1, 2)
        mate[o[:, 0]] = o[:, 1]
        mate[o[:, 1]] = o[:, 0]
        return mate
    return _cycle_2color(pairing(src_key), pairing(dst_key),
                         max_cycle=max_cycle).astype(bool)


def clos_route_batch(perms, R, L=128):
    """Route a BATCH of (R, L)-tile permutations (perms: (T, R*L),
    out.flat = x.flat[perm] per tile) onto 3-stage Clos networks:

        stage 1: per-row lane gather   (idx_in:  (T*R, L) int32)
        stage 2: per-lane sublane Benes (dists, packed mask bits (T*R, L))
        stage 3: per-row lane gather   (idx_out: (T*R, L) int32)

    All T tiles route in one vectorized pass per Euler level: the lane
    assignment recursively Euler-splits the (src-row x dst-row) L-regular
    multigraphs, with (group, tile) baked into the split keys so every
    subproblem splits simultaneously (Hall/Birkhoff routing)."""
    perms = np.asarray(perms, np.int64)
    T, N = perms.shape
    assert N == R * L
    E = T * N
    src_pos = perms.reshape(-1)
    dst_pos = np.tile(np.arange(N, dtype=np.int64), T)
    tile = np.repeat(np.arange(T, dtype=np.int64), N)
    src_row = src_pos // L
    dst_row = dst_pos // L
    from ..utils import native as NV
    lane = NV.clos_lanes(src_row, dst_row, tile, R, L, T)
    if lane is None:
        lane = np.zeros(E, np.int32)
        group = np.zeros(E, np.int64)
        width = L
        while width > 1:
            skey = (group * T + tile) * R + src_row
            dkey = (group * T + tile) * R + dst_row
            hi = _euler_split(skey, dkey, max_cycle=2 * width * R)
            lane[hi] += width // 2
            group = group * 2 + hi
            width //= 2
    # stage-1: element at (tile, src_row, src_lane) moves to lane[e]
    idx_in = np.empty((T * R, L), np.int32)
    idx_in[tile * R + src_row, lane] = (src_pos % L).astype(np.int32)
    # stage-2: per (tile, lane): sublane permutation src_row -> dst_row
    perm_mid = np.empty((T * L, R), np.int32)
    perm_mid[tile * L + lane, dst_row] = src_row.astype(np.int32)
    dists, bits_tl = benes_route_packed(perm_mid)    # (T*L, R)
    bits = np.ascontiguousarray(
        bits_tl.reshape(T, L, R).transpose(0, 2, 1)).reshape(T * R, L)
    # stage-3: element now at (tile, dst_row, lane) -> its dst lane
    idx_out = np.empty((T * R, L), np.int32)
    idx_out[tile * R + dst_row, dst_pos % L] = lane
    return idx_in, dists, bits, idx_out


def clos_route(perm_flat, R, L=128):
    """Single-tile clos_route (see clos_route_batch)."""
    perm_flat = np.asarray(perm_flat, np.int64)
    ii, dists, bits, io = clos_route_batch(perm_flat[None, :], R, L)
    return ii, dists, bits, io


# ---------------------------------------------------------------------------
# plan time: monotone packing (concentrator) — no cycle walking needed
# ---------------------------------------------------------------------------

def monotone_pack_plan(marked, R, L=128):
    """Plan a 2-step monotone compaction on (R, L) tiles: the k-th marked
    element of tile t (raster positions ``marked[t]``, SORTED, at most L per
    sublane) is delivered to raster position k.

        step a: one per-sublane lane gather places each marked value at its
                destination LANE (take_along_axis, plan = lidx int8);
        step b: log2(R) sublane-shift stages move it to its destination
                SUBLANE via LSB-first bit-correction — monotone routes are
                non-blocking on the ascending butterfly, so masks follow
                from pure rank arithmetic (no Euler/Benes cycle walks).

    Returns (lidx int8 (T*R, L), bits int32) where bits packs BOTH stage
    masks: bit b marks positions receiving from below at stage 2^b, bit
    nb+b positions receiving from above (the two are disjoint per
    position, so 2*nb <= 32 bits suffice for R <= 2^16).
    Raises ValueError if a collision is detected (caller falls back to a
    full Clos route; cannot happen for sorted inputs per the lemma)."""
    marked = np.asarray(marked, np.int64)
    T, K = marked.shape
    nb = int(np.log2(R))
    assert (1 << nb) == R and nb <= 16
    fast = native.monotone_pack(marked, R)
    if fast is not None:
        return fast
    tt = np.repeat(np.arange(T, dtype=np.int64), K)
    mm = marked.reshape(-1)
    s_of = mm >> 7
    j = np.tile(np.arange(K, dtype=np.int64), T)
    dest_lane = j & 127
    dest_sub = j >> 7
    lidx = np.zeros((T * R, L), np.int8)
    lidx[tt * R + s_of, dest_lane] = (mm & 127).astype(np.int8)
    bitsU = np.zeros((T * R, L), np.int32)
    bitsD = np.zeros((T * R, L), np.int32)
    q = s_of.copy()
    for b in range(nb):
        d = 1 << b
        delta = ((dest_sub >> b) & 1) - ((q >> b) & 1)
        newq = q + delta * d
        key = (tt * R + newq) * L + dest_lane
        if len(np.unique(key)) != T * K:
            raise ValueError("monotone_pack_plan: collision")
        up = delta < 0
        dn = delta > 0
        bitsU[tt[up] * R + newq[up], dest_lane[up]] |= np.int32(1 << b)
        bitsD[tt[dn] * R + newq[dn], dest_lane[dn]] |= np.int32(1 << b)
        stay = delta == 0
        if ((bitsU[tt[stay] * R + q[stay], dest_lane[stay]] >> b) & 1).any() \
           or ((bitsD[tt[stay] * R + q[stay], dest_lane[stay]] >> b)
               & 1).any():
            raise ValueError("monotone_pack_plan: stayer clobbered")
        q = newq
    if not np.array_equal(q, dest_sub):
        raise ValueError("monotone_pack_plan: did not converge")
    return lidx, bitsU | (bitsD << nb)


def _pack_stages(x, bits, R):
    """Executor for monotone_pack_plan step b (use inside Pallas kernels)."""
    nb = int(np.log2(R))
    for b in range(nb):
        d = 1 << b
        fromdn = pltpu.roll(x, R - d, 0)          # x[i] <- x[i + d]
        fromup = pltpu.roll(x, d, 0)              # x[i] <- x[i - d]
        mU = ((bits >> b) & 1) == 1
        mD = ((bits >> (nb + b)) & 1) == 1
        x = jnp.where(mU, fromdn, jnp.where(mD, fromup, x))
    return x


def monotone_pack_plan_up(marked, R, L=128):
    """UP-ONLY concentrator plan (round-5 pack diet): the k-th marked
    raster position of tile t is delivered to raster position k using
    LSB-first OFFSET SUBTRACTION — element at sublane q with destination
    sublane dq <= q moves up by bit b of (q - dq) at stage 2^b.

    Collision-freeness (proof): within one lane, positions q_i and
    destinations dq_i are both strictly increasing.  Suppose element 2
    (at q2, moving) lands on element 1 (at q1, staying) at stage b:
    then q2 - q1 = 2^b with both remaining offsets ≡ 0 (mod 2^b), and
    bit b of off1 = 0, of off2 = 1.  But off2 - off1 =
    (q2 - q1) - (dq2 - dq1) = 2^b - (dq2 - dq1) with 1 <= dq2 - dq1,
    so |off2 - off1| < 2^b while also ≡ 0 (mod 2^b) — forcing
    off2 == off1, contradicting the differing bit b.  QED.

    Executor cost: 1 roll + 1 select per stage (_pack_stages_up) vs the
    dual-roll 2 rolls + 2 selects of _pack_stages.
    Returns (lidx int8 (T*R, L), bits int32 (T*R, L))."""
    marked = np.asarray(marked, np.int64)
    T, K = marked.shape
    nb = int(np.log2(R))
    assert (1 << nb) == R and nb <= 31
    tt = np.repeat(np.arange(T, dtype=np.int64), K)
    mm = marked.reshape(-1)
    q = mm >> 7
    j = np.tile(np.arange(K, dtype=np.int64), T)
    dest_lane = j & 127
    dq = j >> 7
    off = q - dq
    assert (off >= 0).all(), "monotone_pack_plan_up: downward move"
    lidx = np.zeros((T * R, L), np.int8)
    lidx[tt * R + q, dest_lane] = (mm & 127).astype(np.int8)
    bits = np.zeros((T * R, L), np.int32)
    pos = q.copy()
    for b in range(nb):
        d = np.int64(1) << b
        take = (off & d) != 0
        pos = pos - np.where(take, d, 0)
        bits[tt[take] * R + pos[take], dest_lane[take]] |= np.int32(1 << b)
    assert np.array_equal(pos, dq), "monotone_pack_plan_up: not converged"
    return lidx, bits


def _pack_stages_up(x, bits, R):
    """Executor for monotone_pack_plan_up (1 roll + 1 select per stage)."""
    nb = int(np.log2(R))
    for b in range(nb):
        d = 1 << b
        frombelow = pltpu.roll(x, R - d, 0)       # x[i] <- x[i + d]
        m = ((bits >> b) & 1) == 1
        x = jnp.where(m, frombelow, x)
    return x


# ---------------------------------------------------------------------------
# executors
# ---------------------------------------------------------------------------

def _benes_stages(x, bits, dists, R):
    iota = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    for s, d in enumerate(dists):
        up = pltpu.roll(x, R - d, 0)
        dn = pltpu.roll(x, d, 0)
        swapped = jnp.where((iota & d) == 0, up, dn)
        m = ((bits >> s) & 1) == 1
        x = jnp.where(m, swapped, x)
    return x


def sublane_permute(x, bits, dists, *, interpret=False):
    """Apply per-lane-column Benes networks to an (R, 128) array.
    x: (R, 128); bits: (R, 128) int32 packed stage masks; dists: tuple.
    ~20 Gelem/s for a 17-stage (R=512) permutation on v5e."""
    R = x.shape[0]
    dists = tuple(int(d) for d in dists)

    def kernel(x_ref, bits_ref, y_ref):
        y_ref[:] = _benes_stages(x_ref[:], bits_ref[:], dists, R)

    f = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret)
    with jax.enable_x64(False):   # Mosaic cannot lower int64 index math
        return f(x, bits)


def tile_permute(x, plan, *, interpret=False):
    """Apply an arbitrary static (R, 128) tile permutation (from
    ``clos_route``): lane gather -> sublane Benes -> lane gather."""
    idx_in, dists, bits, idx_out = plan
    R = x.shape[0]
    dists = tuple(int(d) for d in dists)

    def kernel(x_ref, ii_ref, bits_ref, io_ref, y_ref):
        x1 = jnp.take_along_axis(x_ref[:], ii_ref[:], axis=1)
        x2 = _benes_stages(x1, bits_ref[:], dists, R)
        y_ref[:] = jnp.take_along_axis(x2, io_ref[:], axis=1)

    f = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret)
    with jax.enable_x64(False):   # Mosaic cannot lower int64 index math
        return f(x, jnp.asarray(idx_in), jnp.asarray(bits),
                 jnp.asarray(idx_out))


# ---------------------------------------------------------------------------
# global (HBM-scale) static permutation: 2-phase bucket route
# ---------------------------------------------------------------------------

TILE_R = 2048           # rows per tile (x 128 lanes = 262144 elements);
#                         large enough that 8-row slab alignment costs ~25%


def _next_pow2(x):
    p = 1
    while p < x:
        p *= 2
    return p


class GlobalPermutePlan:
    """Plan for out.flat = x.flat[perm] at HBM scale.

    Phase 1 (grid over source tiles): Clos-permute each (TILE_R, 128)
    source tile so elements destined for destination tile d occupy the
    d-th rows_pp-row slab of the output block; slabs are uniformly padded
    so ALL addressing is plain BlockSpec index maps (no ragged DMA).
    Phase 2 (grid over destination tiles): gather the per-source slabs of
    one destination (a strided 4-D block), Clos-permute to the exact
    final order.  Per-element plan data: 2 x (int8 lane idx pair + int32
    packed Benes masks) streamed alongside the values."""

    __slots__ = ("T", "TR", "rows_pp", "R1", "R2", "npad",
                 "ii1", "bits1", "io1", "ii2", "bits2", "io2", "dists1",
                 "dists2")

    def __init__(self, perm, n, tile_r=TILE_R):
        R = self.TR = int(tile_r)
        tile_elems = R * 128
        T = -(-n // tile_elems)
        npad = T * tile_elems
        perm = np.asarray(perm, np.int64)
        full = np.arange(npad, dtype=np.int64)
        full[: perm.shape[0]] = perm
        src = full                                # out[p] = x[src[p]]
        from ..utils import native as NV
        from ..kernels.spmv_route import _dbg
        counts = NV.gp_counts(src, T, tile_elems)
        if counts is None:
            s_tile = src // tile_elems
            d_tile = np.repeat(np.arange(T, dtype=np.int64), tile_elems)
            key = s_tile * T + d_tile
            # slot of each element within its (s,d) slab (stable rank)
            slot, counts = NV.rank_by_key(key, T * T)
            slot = slot.astype(np.int64)
        else:
            slot = None
        rows_pp = max(-(-int(counts.max()) // 128), 1)
        rows_pp = -(-rows_pp // 8) * 8            # sublane-aligned slabs
        self.T, self.rows_pp = T, rows_pp
        R1 = _next_pow2(max(R, T * rows_pp))
        R2 = R1
        self.R1, self.R2, self.npad = R1, R2, npad
        M1 = R1 * 128

        if slot is None:
            # native single-sweep builders: each phase's partial perm
            # (-1 = free dst) comes from one C++ pass over src with no
            # npad-sized intermediates; only one T*M1 buffer live at a
            # time (phase-2 is built after phase-1 is consumed)
            perm1 = NV.gp_scatter(src, T, tile_elems, rows_pp, M1, 1)
            _dbg("gp: perm1 scatter done")
            res = NV.clos_route_tiles(perm1.reshape(T, M1), R1)
            _dbg("gp: clos1 done")
            assert res is not None
            ii, bits, io = res
            self.ii1 = jnp.asarray(ii)
            self.dists1 = tuple(int(d) for d in benes_dists(R1))
            self.bits1 = jnp.asarray(bits)
            self.io1 = jnp.asarray(io)
            del perm1
            perm2 = NV.gp_scatter(src, T, tile_elems, rows_pp, M1, 2)
            _dbg("gp: perm2 scatter done")
            ii, bits, io = NV.clos_route_tiles(perm2.reshape(T, M1), R2)
            _dbg("gp: clos2 done")
            self.ii2 = jnp.asarray(ii)
            self.dists2 = self.dists1
            self.bits2 = jnp.asarray(bits)
            self.io2 = jnp.asarray(io)
            return

        # ---- numpy fallback (no native library) ------------------------
        # input position of element e in its source tile:
        p_in = src % tile_elems
        # staging position: slab d, then slot
        p_mid = d_tile * (rows_pp * 128) + slot
        # phase-2: element e sits (for dst tile d) at concat position
        #   s_tile(e) * rows_pp * 128 + slot(e)
        p_cat = s_tile * (rows_pp * 128) + slot
        p_out = np.tile(np.arange(tile_elems, dtype=np.int64), T)
        perm1 = _bijectify(s_tile, p_mid, p_in, T, R1 * 128)
        (self.ii1, self.dists1, self.bits1,
         self.io1) = _clos_batch(perm1, R1)
        perm2 = _bijectify(d_tile, p_out, p_cat, T, R2 * 128)
        (self.ii2, self.dists2, self.bits2,
         self.io2) = _clos_batch(perm2, R2)


def _bijectify(tiles, dst_local, src_local, T, M):
    """Per-tile partial map dst_local <- src_local completed to full
    permutations (T, M): unused destinations are matched to unused sources
    in order (per tile: both free lists are tile-sorted, and free counts
    match per tile, so positional pairing aligns)."""
    perm = np.full(T * M, -1, np.int64)
    used = np.zeros(T * M, bool)
    perm[tiles * M + dst_local] = src_local
    used[tiles * M + src_local] = True
    free_dst = np.flatnonzero(perm < 0)
    free_src = np.flatnonzero(~used)
    perm[free_dst] = free_src % M
    return perm.reshape(T, M)


def _clos_batch(perms, R):
    """Batched clos routing; returns stacked device arrays (T*R, 128)."""
    ii, dists, bits, io = clos_route_batch(perms, R)
    return (jnp.asarray(ii.astype(np.int8)), tuple(int(x) for x in dists),
            jnp.asarray(bits), jnp.asarray(io.astype(np.int8)))


def _phase_kernel(x_ref, ii_ref, bits_ref, io_ref, y_ref, *, dists, R,
                  rows_in, rows_out):
    x = x_ref[:]
    if rows_in < R:
        x = jnp.concatenate(
            [x, jnp.zeros((R - rows_in, 128), x.dtype)], axis=0)
    x = jnp.take_along_axis(x, ii_ref[:].astype(jnp.int32), axis=1)
    x = _benes_stages(x, bits_ref[:], dists, R)
    x = jnp.take_along_axis(x, io_ref[:].astype(jnp.int32), axis=1)
    y_ref[:] = x[:rows_out, :]


def global_permute(x, plan: GlobalPermutePlan, *, interpret=False):
    """out.flat[p] = x.flat[perm[p]] for an fp32 array of n elements,
    executed as two Clos-permute passes with BlockSpec-only addressing."""
    T, R1, R2 = plan.T, plan.R1, plan.R2
    TR = getattr(plan, "TR", TILE_R)
    rows_pp = plan.rows_pp
    n = x.shape[0]
    xp = jnp.pad(x.reshape(-1), (0, plan.npad - n)).reshape(-1, 128)

    k1 = functools.partial(_phase_kernel, dists=plan.dists1, R=R1,
                           rows_in=TR, rows_out=T * rows_pp)
    stage = pl.pallas_call(
        k1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((TR, 128), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R1, 128), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R1, 128), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R1, 128), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T * rows_pp, 128), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T * T * rows_pp, 128), jnp.float32),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
    )
    k2 = functools.partial(_phase_kernel, dists=plan.dists2, R=R2,
                           rows_in=T * rows_pp, rows_out=TR)

    def k2_wrap(x_ref, ii_ref, bits_ref, io_ref, y_ref):
        blk = x_ref[:]                           # (T, 1, rows_pp, 128)
        flat = blk.reshape(T * rows_pp, 128)

        class _R:                                # tiny shim: same protocol
            def __getitem__(self, s):
                return flat[s]
        k2(_R(), ii_ref, bits_ref, io_ref, y_ref)

    phase2 = pl.pallas_call(
        k2_wrap,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((T, 1, rows_pp, 128), lambda t: (0, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R2, 128), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R2, 128), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R2, 128), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TR, 128), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T * TR, 128), jnp.float32),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
    )
    with jax.enable_x64(False):
        mid = stage(xp, plan.ii1, plan.bits1, plan.io1)
        mid4 = mid.reshape(T, T, rows_pp, 128)
        out = phase2(mid4, plan.ii2, plan.bits2, plan.io2)
    return out.reshape(-1)[:n].reshape(x.shape)
