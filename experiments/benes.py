"""Plan-time Benes routing (pure numpy, batched) — groundwork for the
static-routing permutation engine (see ROUTER_DESIGN.md).

A Benes network on M = 2^k elements realizes ANY permutation in
2*log2(M) - 1 stages of pair-exchange switches; stage s exchanges element
i with element i XOR d (d = M/2, M/4, ..., 2, 1, 2, ..., M/2).  On TPU a
stage is `where(mask, x[i^d], x)` built from `pltpu.roll` + select with
PLAN-TIME masks (measured 920 Gelem/s/stage).

Routing is the classic 2-coloring of the union of the input-pair and
output-pair matchings, fully vectorized over a batch:

  * nxt[p] = src[inv[p] ^ h] ^ h (an OUT edge then an IN edge) is a
    permutation whose orbits are exactly the two parity classes of each
    union cycle — nodes in one orbit share a color.
  * every OUT edge connects the two orbits of one cycle, so coloring is
    just: orbit rep (min element, by pointer doubling) vs the partnered
    orbit's rep.  No cycle walking.

`benes_route(perm)` returns per-stage swap masks for a batch of
independent permutations; perm[b, j] = input position whose element must
end at output j (out = x[perm]).
"""

from __future__ import annotations

import numpy as np


def _route_level(src):
    """One Benes level, batched.  src: (B, M) permutations (out = x[src]).
    Returns (mask_in, mask_out, perm_upper, perm_lower).

    Inner loops use flat int32 indexing (2-4x faster than
    take_along_axis for these shapes)."""
    B, M = src.shape
    h = M // 2
    src = src.astype(np.int32, copy=False)
    base = (np.arange(B, dtype=np.int32) * M)[:, None]
    ar = np.arange(M, dtype=np.int32)[None, :]
    srcf = src.ravel()
    inv = np.empty_like(src)
    np.put_along_axis(inv, src, np.broadcast_to(ar, (B, M)).copy(), 1)
    # same-color step: OUT edge (to the source feeding our output's pair)
    # then IN edge
    q = srcf[(inv ^ h) + base]                  # OUT partner (opposite color)
    nxt = q ^ h                                 # then IN partner (same color)
    # orbit representative via pointer doubling (min element of nxt-orbit)
    rep = np.broadcast_to(ar, (B, M)).copy()
    jump = nxt + base
    for _ in range(int(np.ceil(np.log2(max(M, 2)))) + 1):
        repf = rep.ravel()
        np.minimum(rep, repf[jump], out=rep)
        jumpf = jump.ravel()
        jump = jumpf[jump]
    prep = rep.ravel()[q + base]                # partner orbit's rep
    color = (rep > prep).astype(np.int8)        # deterministic, consistent
    # stage-1 swap mask: input pair (i, i^h), i<h: upper half receives the
    # color-0 member, so swap iff color[i] == 1
    swap_in = color[:, :h] == 1
    mask_in = np.concatenate([swap_in, swap_in], axis=1)
    # last-stage swap mask: output pair (j, j^h), j<h: the upper
    # subnetwork delivers (at sub-slot j) the member whose source is
    # color-0; swap iff out j's own source is color-1
    srccolor = color.ravel()[src + base]
    swap_out = srccolor[:, :h] == 1
    mask_out = np.concatenate([swap_out, swap_out], axis=1)
    # sub-permutations: upper sub-net output slot j serves whichever of
    # outputs (j, j^h) has the color-0 source; its element sits at upper
    # sub-input slot (source mod h)
    src_lo, src_hi = src[:, :h], src[:, h:]
    take_hi = swap_out                          # out j's source is color-1
    up_src = np.where(take_hi, src_hi, src_lo)
    lo_src = np.where(take_hi, src_lo, src_hi)
    return mask_in, mask_out, up_src % h, lo_src % h


def benes_route(perm):
    """(dists, masks) for a full Benes network.  perm: (B, M), M = 2^k.
    Stage s swaps i <-> i^dists[s] where masks[s][b, i] (symmetric).

    Iterative: all 2^l same-size subproblems of recursion level l are
    routed as ONE batched `_route_level` call, so total work is
    O(B*M*log^2 M) numpy element-ops with log M passes per level."""
    B, M = perm.shape
    if M == 1:
        return [], []
    front, back = [], []
    cur = perm                       # (B * 2^l, M >> l)
    size = M
    while size > 2:
        mi, mo, pu, pl = _route_level(cur)
        front.append(mi.reshape(B, M))
        back.append(mo.reshape(B, M))
        # children interleaved so block order matches position order
        nb, half = cur.shape[0], size // 2
        cur = np.stack([pu, pl], axis=1).reshape(nb * 2, half)
        size = half
    # center: size-2 switches
    swap = (cur[:, :1] == 1)
    center = np.concatenate([swap, swap], 1).reshape(B, M)
    masks = front + [center] + back[::-1]
    half_dists = [M >> (l + 1) for l in range(len(front))]
    dists = half_dists + [1] + half_dists[::-1]
    return dists, masks


def apply_network(x, dists, masks):
    """Simulate the roll+select executor: stage s swaps i <-> i^d."""
    x = x.copy()
    for d, m in zip(dists, masks):
        idx = np.arange(x.shape[1]) ^ d
        x = np.where(m, x[:, idx], x)
    return x


if __name__ == "__main__":
    rng = np.random.default_rng(0)
    for M in (2, 4, 8, 32, 128, 512):
        B = 64
        perm = np.stack([rng.permutation(M) for _ in range(B)])
        dists, masks = benes_route(perm)
        x = np.arange(M)[None, :].repeat(B, 0) + 1000 * np.arange(B)[:, None]
        out = apply_network(x, dists, masks)
        want = np.take_along_axis(x, perm, 1)
        ok = (out == want).all()
        print(f"M={M:4d}: stages={len(masks):2d} ok={ok}")
        assert ok, f"Benes routing broken at M={M}"
    # plan-cost smoke: 16K columns of M=512 (a full bench-scale tile set)
    import time
    B, M = 1 << 14, 512
    perm = np.argsort(rng.random((B, M)), axis=1)
    t0 = time.perf_counter()
    dists, masks = benes_route(perm)
    t1 = time.perf_counter()
    out = apply_network(np.broadcast_to(np.arange(M), (B, M)).copy(),
                        dists, masks)
    assert (out == perm).all()
    print(f"routing {B}x{M} ({B*M/1e6:.1f}M elems): {t1-t0:.2f}s plan, "
          f"{len(masks)} stages — all correct")
