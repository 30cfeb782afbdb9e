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
    # same-color step: OUT edge then IN edge
    q = srcf[(inv ^ h) + base]
    nxt = q ^ h
    # orbit representative via pointer doubling (min element of nxt-orbit)
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

def _cycle_2color(pair_a, pair_b):
    """2-color elements so paired elements (under either matching) get
    opposite colors.  pair_a/pair_b: (N,) int arrays (involutions).
    Returns colors (N,) in {0, 1}.  Same orbit trick as Benes routing."""
    n = pair_a.shape[0]
    nxt = pair_b[pair_a]                 # same-color step
    rep = np.arange(n, dtype=np.int64)
    jump = nxt.astype(np.int64)
    for _ in range(int(np.ceil(np.log2(max(n, 2)))) + 1):
        np.minimum(rep, rep[jump], out=rep)
        jump = jump[jump]
    prep = rep[pair_a]                   # partner (opposite-color) orbit
    return (rep > prep).astype(np.int8)


def _euler_split(src_rows, dst_rows, R):
    """Split an L-regular bipartite multigraph (edges e: src_rows[e] ->
    dst_rows[e], L even) into two (L/2)-regular halves.  Returns a bool
    array: True = edge assigned to the second half.

    Pair edges arbitrarily at each src vertex and at each dst vertex;
    alternating colors along the resulting pairing cycles yields a
    balanced split (each vertex keeps exactly half its edges per side)."""
    E = src_rows.shape[0]
    def pairing(rows):
        order = np.argsort(rows, kind="stable")
        mate = np.empty(E, np.int64)
        o = order.reshape(-1, 2)
        mate[o[:, 0]] = o[:, 1]
        mate[o[:, 1]] = o[:, 0]
        return mate
    return _cycle_2color(pairing(src_rows), pairing(dst_rows)).astype(bool)


def clos_route(perm_flat, R, L=128):
    """Route an arbitrary permutation of an (R, L) tile (row-major flat,
    out.flat = x.flat[perm_flat]) onto:

        stage 1: per-row lane gather   (idx_in:  (R, L) int32)
        stage 2: per-lane sublane Benes (dists, packed mask bits (R, L))
        stage 3: per-row lane gather   (idx_out: (R, L) int32)

    Returns (idx_in, dists, bits, idx_out).  Requires L a power of two
    and R even... (R power of two for the Benes stage).

    Lane assignment: recursively Euler-split the (src-row x dst-row)
    L-regular multigraph into single-matchings; matching k routes through
    lane k (Hall/Birkhoff routing of a 3-stage Clos)."""
    perm_flat = np.asarray(perm_flat, np.int64)
    N = R * L
    assert perm_flat.shape == (N,)
    dst_pos = np.arange(N)
    src_pos = perm_flat
    src_row = src_pos // L
    dst_row = dst_pos // L
    # recursively split edges into L single matchings -> middle lane
    lane = np.zeros(N, np.int32)
    groups = [np.arange(N)]
    width = L
    while width > 1:
        new_groups = []
        for g in groups:
            hi = _euler_split(src_row[g], dst_row[g], R)
            lane[g[hi]] += width // 2
            new_groups.append(g[~hi])
            new_groups.append(g[hi])
        groups = new_groups
        width //= 2
    # stage-1: element at (src_row, src_lane) must move to lane[e]
    idx_in = np.empty((R, L), np.int32)     # idx_in[r, l] = source lane
    idx_in[src_row, lane] = (src_pos % L).astype(np.int32)
    # stage-2: per middle lane, sublane permutation src_row -> dst_row
    perm_mid = np.empty((L, R), np.int32)   # (lane, dst_row) -> src_row
    perm_mid[lane, dst_row] = src_row.astype(np.int32)
    dists, masks = benes_route(perm_mid)    # batched over lanes
    bits = pack_masks(masks).T.copy() if masks else np.zeros((R, L), np.int32)
    # (masks are (L, R); executor wants (R, L))
    # stage-3: element now at (dst_row, lane[e]) must reach its dst lane
    idx_out = np.empty((R, L), np.int32)
    idx_out[dst_row, dst_pos % L] = lane
    return idx_in, dists, bits, idx_out


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
