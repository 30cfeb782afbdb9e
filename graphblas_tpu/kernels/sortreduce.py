"""In-VMEM per-row bitonic sort + segmented monoid reduce — the SpGEMM
"shared hash table" replacement (reference: the saxpy3 fine-task hash/
Gustavson accumulators, Source/GB_AxB_saxpy3_template.c:108-484).

The ESC SpGEMM expands products row-contiguously; grouping duplicates only
ever needs to sort WITHIN one output row.  A global argsort of F 64-bit
keys (XLA bitonic over HBM) costs hundreds of seconds at F~2^28; this
kernel instead pads each row's product run to a power-of-two capacity C,
lays the runs out C-aligned in a (S, 128) VMEM-tiled array, and runs a
classic bitonic network over each run with pltpu.roll compare-exchange
passes (~680 Ge/s per pass on v5e), then a segmented inclusive scan under
the add monoid and a run-end extraction — all in one Pallas kernel, no
data-dependent control flow.

Layout contract: flat slot p holds (key, val) of row r = p // C at
in-row position posC = p & (C-1); rows never straddle the C-aligned
blocks, so every roll distance d < C stays inside one row's run and the
XOR-partner selection masks are pure iota arithmetic (no plan data).

Keys are int32 (the column index j; j < 2^31 always since dimensions are
int32).  Pad slots carry key = SENTINEL (sorts last) and val = monoid
identity.  Output: okeys has the unique key at each run's LAST slot and
SENTINEL elsewhere; ovals has the monoid-combined run total there.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SENTINEL = np.int32(2**31 - 1)

# per-row capacity classes (pow2; x4 steps keep compile variants few and
# mean padding ~1.6x); rows with more products fall back to XLA argsort
CAPS = (128, 512, 2048, 8192, 32768)


def _flat_shift(x, s, SB):
    """x shifted DOWN by s flat slots (result[p] = x[p - s]) over the
    (SB, 128) raster; s < 128 or a multiple of 128."""
    if s >= 128:
        return pltpu.roll(x, s // 128, 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    lr = pltpu.roll(x, s, 1)            # within-sublane lane shift
    sr = pltpu.roll(lr, 1, 0)           # previous sublane for wrapped lanes
    return jnp.where(lane < s, sr, lr)


def _xor_partner(x, d, SB):
    """x at the XOR partner: result[p] = x[p ^ d]; d a power of two."""
    if d < 128:
        lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        up = pltpu.roll(x, 128 - d, 1)  # x[p + d] (within sublane)
        dn = pltpu.roll(x, d, 1)        # x[p - d]
        return jnp.where((lane & d) == 0, up, dn)
    ds = d // 128
    sub = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    up = pltpu.roll(x, SB - ds, 0)      # x[p + d]
    dn = pltpu.roll(x, ds, 0)           # x[p - d]
    return jnp.where((sub & ds) == 0, up, dn)


def _posC(shape, C):
    sub = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    return ((sub * 128) + lane) & (C - 1)


def _sort_reduce_body(kx, vx, C, SB, add_fn, tx=None, want_token=True,
                      kx2=None):
    """Sort + segmented reduce of one block.  With ``tx`` (int32, 1 =
    mask token / 2 = product, 0 = pad), tokens ride the same sort, the
    2-bit channel reduces with bitwise OR over each run, and a run's
    output survives only if it saw a product AND token presence matches
    ``want_token`` — the dot3 mask filter without any key lookups
    (reference: Source/GB_AxB_dot3_template.c's mask-driven pattern).

    ``kx2``: optional SECOND key plane for a lexicographic (kx, kx2)
    sort — the wide-key mode lifting the n < 2^23 packed-key bound
    (round-4 ask #9): kx carries the row rank, kx2 the raw column."""
    posC = _posC(kx.shape, C)
    # ---- bitonic sort (ascending per C-run) -------------------------------
    # flag arithmetic stays in int32: Mosaic (2026-08 toolchain) lowers
    # bool==bool vector compares through i8 and cannot truncate i8->i1
    logC = C.bit_length() - 1
    for k in range(1, logC + 1):
        # direction bit as raw int32 (asc when bit_k == 0); never build
        # i1==i1 compares — Mosaic folds casts and can't lower them
        bit_k = (posC >> k) & 1 if k < logC \
            else jnp.zeros(kx.shape, jnp.int32)
        for j in range(k - 1, -1, -1):
            d = 1 << j
            pk = _xor_partner(kx, d, SB)
            pv = _xor_partner(vx, d, SB)
            bit_d = (posC >> j) & 1
            take_min = bit_k == bit_d
            if kx2 is None:
                lt_i = (pk < kx).astype(jnp.int32)
                gt_i = (pk > kx).astype(jnp.int32)
            else:
                pk2 = _xor_partner(kx2, d, SB)
                eq_i = (pk == kx).astype(jnp.int32)
                lt_i = ((pk < kx).astype(jnp.int32)
                        | (eq_i & (pk2 < kx2).astype(jnp.int32)))
                gt_i = ((pk > kx).astype(jnp.int32)
                        | (eq_i & (pk2 > kx2).astype(jnp.int32)))
            swap = jnp.where(take_min, lt_i, gt_i) != 0
            kx = jnp.where(swap, pk, kx)
            vx = jnp.where(swap, pv, vx)
            if kx2 is not None:
                kx2 = jnp.where(swap, pk2, kx2)
            if tx is not None:
                pt = _xor_partner(tx, d, SB)
                tx = jnp.where(swap, pt, tx)
    # ---- segmented inclusive scan over duplicate runs ---------------------
    # flags ride in int32 lanes: pltpu.roll of i1 vectors does not lower
    prev_k = _flat_shift(kx, 1, SB)
    if kx2 is None:
        neq_i = (kx != prev_k).astype(jnp.int32)
    else:
        prev_k2 = _flat_shift(kx2, 1, SB)
        neq_i = ((kx != prev_k).astype(jnp.int32)
                 | (kx2 != prev_k2).astype(jnp.int32))
    flag_i = (((posC == 0).astype(jnp.int32)
               + neq_i) != 0).astype(jnp.int32)
    v = vx
    t = tx
    f = flag_i
    s = 1
    while s < C:
        v_in = _flat_shift(v, s, SB)
        f_in = _flat_shift(f, s, SB)
        beyond_i = (posC < s).astype(jnp.int32)
        stop = (f | beyond_i) != 0
        v = jnp.where(stop, v, add_fn(v_in, v))
        if t is not None:
            t_in = _flat_shift(t, s, SB)
            t = jnp.where(stop, t, t_in | t)
        f = f | f_in | beyond_i
        s *= 2
    # ---- run-end extraction ----------------------------------------------
    # next element (p + 1) via the inverse flat shift: roll up by 1
    lane = jax.lax.broadcasted_iota(jnp.int32, kx.shape, 1)

    def nxt(a):
        lu = pltpu.roll(a, 127, 1)
        su = pltpu.roll(lu, SB - 1, 0)
        return jnp.where(lane == 127, su, lu)

    if kx2 is None:
        run_end = (posC == C - 1) | (kx != nxt(kx))
    else:
        run_end = ((posC == C - 1) | (kx != nxt(kx))
                   | (kx2 != nxt(kx2)))
    keep = run_end & (kx != SENTINEL)
    if tx is not None:
        tok_bit = 1 if want_token else 0
        keep = keep & ((t & 2) != 0) & ((t & 1) == tok_bit)
    okeys = jnp.where(keep, kx, jnp.full(kx.shape, SENTINEL, jnp.int32))
    if kx2 is not None:
        okeys2 = jnp.where(keep, kx2,
                           jnp.full(kx.shape, SENTINEL, jnp.int32))
        return okeys, okeys2, v
    return okeys, v


@functools.lru_cache(maxsize=64)
def _kernel_fn(C, SB, monoid, val_dtype_name, logical, interpret):
    """Compiled sort-reduce over (S, 128) arrays, blocked SB sublanes at a
    time.  ``monoid`` is the (frozen, hashable) Monoid object; ``logical``
    marks bool semantics carried in int32 lanes."""
    raw = monoid.op

    if logical:
        def add_fn(a, b):
            return raw(a.astype(jnp.bool_),
                       b.astype(jnp.bool_)).astype(jnp.int32)
    else:
        def add_fn(a, b):
            return raw(a, b)

    def kernel(k_ref, v_ref, ok_ref, ov_ref):
        ok, ov = _sort_reduce_body(k_ref[:], v_ref[:], C, SB, add_fn)
        ok_ref[:] = ok
        ov_ref[:] = ov

    grid_blk = pl.BlockSpec((SB, 128), lambda i: (i, 0))
    vdt = jnp.dtype(val_dtype_name)

    def run(keys, vals):
        S = keys.shape[0]
        nblk = S // SB
        f = pl.pallas_call(
            kernel,
            grid=(nblk,),
            in_specs=[grid_blk, grid_blk],
            out_specs=[grid_blk, grid_blk],
            out_shape=[jax.ShapeDtypeStruct((S, 128), jnp.int32),
                       jax.ShapeDtypeStruct((S, 128), vdt)],
            interpret=bool(interpret))
        with jax.enable_x64(False):
            return f(keys, vals)

    return jax.jit(run)


@functools.lru_cache(maxsize=64)
def _kernel_fn_tok(C, SB, monoid, val_dtype_name, logical, want_token,
                   interpret):
    """Compiled token-channel sort-reduce (the in-sort dot3 mask filter)."""
    raw = monoid.op

    if logical:
        def add_fn(a, b):
            return raw(a.astype(jnp.bool_),
                       b.astype(jnp.bool_)).astype(jnp.int32)
    else:
        def add_fn(a, b):
            return raw(a, b)

    def kernel(k_ref, v_ref, t_ref, ok_ref, ov_ref):
        ok, ov = _sort_reduce_body(k_ref[:], v_ref[:], C, SB, add_fn,
                                   tx=t_ref[:], want_token=want_token)
        ok_ref[:] = ok
        ov_ref[:] = ov

    grid_blk = pl.BlockSpec((SB, 128), lambda i: (i, 0))
    vdt = jnp.dtype(val_dtype_name)

    def run(keys, vals, toks):
        S = keys.shape[0]
        nblk = S // SB
        f = pl.pallas_call(
            kernel,
            grid=(nblk,),
            in_specs=[grid_blk, grid_blk, grid_blk],
            out_specs=[grid_blk, grid_blk],
            out_shape=[jax.ShapeDtypeStruct((S, 128), jnp.int32),
                       jax.ShapeDtypeStruct((S, 128), vdt)],
            interpret=bool(interpret))
        with jax.enable_x64(False):
            return f(keys, vals, toks)

    return jax.jit(run)


def sort_reduce_rows(keys, vals, C, monoid, *, logical=False,
                     interpret=False):
    """Sort each C-aligned run of ``keys`` ascending (carrying ``vals``),
    combine equal-key runs under the add monoid, and return (okeys, ovals):
    unique keys at run-end slots (SENTINEL elsewhere) and their combined
    values.

    keys: (S, 128) int32 with S * 128 a multiple of C; vals: (S, 128) of
    an int32/float32-class dtype (bool semantics via ``logical=True``).
    S is padded to the kernel's block multiple internally.
    """
    C = int(C)
    S = keys.shape[0]
    row_sub = max(C // 128, 1)
    # ~512-sublane blocks (256 KB per f32 operand), at least one row
    SB = row_sub * max(1, 512 // row_sub)
    pad = (-S) % SB
    if pad:
        keys = jnp.concatenate(
            [keys, jnp.full((pad, 128), SENTINEL, jnp.int32)])
        vals = jnp.concatenate(
            [vals, jnp.zeros((pad, 128), vals.dtype)])
    fn = _kernel_fn(C, SB, monoid, np.dtype(vals.dtype).name,
                    bool(logical), bool(interpret))
    ok, ov = fn(keys, vals)
    if pad:
        ok, ov = ok[:S], ov[:S]
    return ok, ov


def _sort_pair1_body(kx, C, SB, want_token):
    """1-plane masked PAIR counter (round-4; TC's hot kernel).

    kx packs (rank << (jb+1)) | (column << 1) | is_product.  Mask tokens
    are UNIQUE per (rank, column) (mask patterns are duplicate-free), so
    after the ascending sort a product run's token twin — if present —
    sits immediately before the run start with key == run_key - 1.  The
    twin bit is detected post-sort from adjacency and rides the COUNT
    plane at bit 20 (run lengths < C <= 2^20), so the whole kernel moves
    TWO planes (key + count) instead of key + value + token."""
    posC = _posC(kx.shape, C)
    logC = C.bit_length() - 1
    for k in range(1, logC + 1):
        bit_k = (posC >> k) & 1 if k < logC \
            else jnp.zeros(kx.shape, jnp.int32)
        for j in range(k - 1, -1, -1):
            d = 1 << j
            pk = _xor_partner(kx, d, SB)
            bit_d = (posC >> j) & 1
            take_min = bit_k == bit_d
            lt_i = (pk < kx).astype(jnp.int32)
            gt_i = (pk > kx).astype(jnp.int32)
            swap = jnp.where(take_min, lt_i, gt_i) != 0
            kx = jnp.where(swap, pk, kx)
    # post-sort: per-slot count init (products = 1) + twin bit at starts
    TWIN = jnp.int32(1) << 20
    is_prod = (kx & 1)                      # sentinel is odd but huge
    prev_k = _flat_shift(kx, 1, SB)
    start_i = (((posC == 0).astype(jnp.int32)
                + (kx != prev_k).astype(jnp.int32)) != 0).astype(jnp.int32)
    twin = (start_i != 0) & (prev_k == kx - 1) & (posC != 0)
    v = is_prod * jnp.where(kx == SENTINEL, 0, 1) \
        + jnp.where(twin, TWIN, 0)
    f = start_i
    s = 1
    while s < C:
        v_in = _flat_shift(v, s, SB)
        f_in = _flat_shift(f, s, SB)
        beyond_i = (posC < s).astype(jnp.int32)
        stop = (f | beyond_i) != 0
        v = jnp.where(stop, v, v_in + v)
        f = f | f_in | beyond_i
        s *= 2
    lane = jax.lax.broadcasted_iota(jnp.int32, kx.shape, 1)
    lu = pltpu.roll(kx, 127, 1)
    su = pltpu.roll(lu, SB - 1, 0)
    next_k = jnp.where(lane == 127, su, lu)
    run_end = (posC == C - 1) | (kx != next_k)
    cnt = v & (TWIN - 1)
    has_twin = (v & TWIN) != 0
    keep = run_end & (kx != SENTINEL) & (is_prod != 0) & (cnt > 0)
    keep = keep & (has_twin if want_token else ~has_twin)
    return jnp.where(keep, cnt, 0)


@functools.lru_cache(maxsize=16)
def _kernel_fn_pair1(C, SB, want_token, interpret):
    def kernel(k_ref, ov_ref):
        ov_ref[:] = _sort_pair1_body(k_ref[:], C, SB, want_token)

    grid_blk = pl.BlockSpec((SB, 128), lambda i: (i, 0))

    def run(keys):
        S = keys.shape[0]
        nblk = S // SB
        f = pl.pallas_call(
            kernel,
            grid=(nblk,),
            in_specs=[grid_blk],
            out_specs=[grid_blk],
            out_shape=[jax.ShapeDtypeStruct((S, 128), jnp.int32)],
            interpret=bool(interpret))
        with jax.enable_x64(False):
            return f(keys)[0]

    return jax.jit(run)


def sort_reduce_pair1(keys, C, *, want_token=True, interpret=False):
    """Masked PAIR count kernel: returns per-slot counts (kept run ends
    hold the product count, everything else 0); see _sort_pair1_body."""
    C = int(C)
    # the twin flag lives at bit 20 of the count plane: product-run
    # lengths (< C) and the flag must not collide (ADVICE r4)
    assert C <= (1 << 20), "sort_reduce_pair1: C exceeds the TWIN-bit budget"
    S = keys.shape[0]
    row_sub = max(C // 128, 1)
    SB = row_sub * max(1, 512 // row_sub)
    pad = (-S) % SB
    if pad:
        keys = jnp.concatenate(
            [keys, jnp.full((pad, 128), SENTINEL, jnp.int32)])
    fn = _kernel_fn_pair1(C, SB, bool(want_token), bool(interpret))
    ov = fn(keys)
    if pad:
        ov = ov[:S]
    return ov


@functools.lru_cache(maxsize=64)
def _kernel_fn_wide(C, SB, monoid, val_dtype_name, logical, tok,
                    want_token, interpret):
    """Compiled lexicographic-(rank, column) sort-reduce (wide-key mode,
    n < 2^31; round-4 ask #9).  ``tok`` adds the token channel."""
    raw = monoid.op

    if logical:
        def add_fn(a, b):
            return raw(a.astype(jnp.bool_),
                       b.astype(jnp.bool_)).astype(jnp.int32)
    else:
        def add_fn(a, b):
            return raw(a, b)

    if tok:
        def kernel(kh_ref, kl_ref, v_ref, t_ref, okh_ref, okl_ref,
                   ov_ref):
            okh, okl, ov = _sort_reduce_body(
                kh_ref[:], v_ref[:], C, SB, add_fn, tx=t_ref[:],
                want_token=want_token, kx2=kl_ref[:])
            okh_ref[:] = okh
            okl_ref[:] = okl
            ov_ref[:] = ov
    else:
        def kernel(kh_ref, kl_ref, v_ref, okh_ref, okl_ref, ov_ref):
            okh, okl, ov = _sort_reduce_body(
                kh_ref[:], v_ref[:], C, SB, add_fn, kx2=kl_ref[:])
            okh_ref[:] = okh
            okl_ref[:] = okl
            ov_ref[:] = ov

    grid_blk = pl.BlockSpec((SB, 128), lambda i: (i, 0))
    vdt = jnp.dtype(val_dtype_name)
    n_in = 4 if tok else 3

    def run(*arrays):
        S = arrays[0].shape[0]
        nblk = S // SB
        f = pl.pallas_call(
            kernel,
            grid=(nblk,),
            in_specs=[grid_blk] * n_in,
            out_specs=[grid_blk] * 3,
            out_shape=[jax.ShapeDtypeStruct((S, 128), jnp.int32),
                       jax.ShapeDtypeStruct((S, 128), jnp.int32),
                       jax.ShapeDtypeStruct((S, 128), vdt)],
            interpret=bool(interpret))
        with jax.enable_x64(False):
            return f(*arrays)

    return jax.jit(run)


def sort_reduce_rows_wide(keysh, keysl, vals, C, monoid, *, toks=None,
                          want_token=True, logical=False, interpret=False):
    """Lexicographic (rank, column) variant of sort_reduce_rows[_tok]:
    two int32 key planes instead of one packed key, so the column plane
    carries a full int32 (n < 2^31).  Returns (okeysh, okeysl, ovals)."""
    C = int(C)
    S = keysh.shape[0]
    row_sub = max(C // 128, 1)
    SB = row_sub * max(1, 512 // row_sub)
    pad = (-S) % SB
    if pad:
        keysh = jnp.concatenate(
            [keysh, jnp.full((pad, 128), SENTINEL, jnp.int32)])
        keysl = jnp.concatenate(
            [keysl, jnp.full((pad, 128), SENTINEL, jnp.int32)])
        vals = jnp.concatenate([vals, jnp.zeros((pad, 128), vals.dtype)])
        if toks is not None:
            toks = jnp.concatenate(
                [toks, jnp.zeros((pad, 128), jnp.int32)])
    fn = _kernel_fn_wide(C, SB, monoid, np.dtype(vals.dtype).name,
                         bool(logical), toks is not None,
                         bool(want_token), bool(interpret))
    args = (keysh, keysl, vals) if toks is None else \
        (keysh, keysl, vals, toks)
    okh, okl, ov = fn(*args)
    if pad:
        okh, okl, ov = okh[:S], okl[:S], ov[:S]
    return okh, okl, ov


def sort_reduce_rows_tok(keys, vals, toks, C, monoid, *, want_token=True,
                         logical=False, interpret=False):
    """sort_reduce_rows with a token channel: ``toks`` int32 carries 1 for
    mask tokens, 2 for products, 0 for pads; a run's output survives only
    if it contains a product and its token presence equals
    ``want_token`` (False = complemented mask)."""
    C = int(C)
    S = keys.shape[0]
    row_sub = max(C // 128, 1)
    SB = row_sub * max(1, 512 // row_sub)
    pad = (-S) % SB
    if pad:
        keys = jnp.concatenate(
            [keys, jnp.full((pad, 128), SENTINEL, jnp.int32)])
        vals = jnp.concatenate(
            [vals, jnp.zeros((pad, 128), vals.dtype)])
        toks = jnp.concatenate(
            [toks, jnp.zeros((pad, 128), jnp.int32)])
    fn = _kernel_fn_tok(C, SB, monoid, np.dtype(vals.dtype).name,
                        bool(logical), bool(want_token), bool(interpret))
    ok, ov = fn(keys, vals, toks)
    if pad:
        ok, ov = ok[:S], ov[:S]
    return ok, ov
