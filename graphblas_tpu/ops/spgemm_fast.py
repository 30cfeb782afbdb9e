"""Scan-based fast SpGEMM tier: ESC with fill-forward expansion.

The reference's saxpy3 (Source/GB_AxB_saxpy3_template.c:108-484) walks
B(k,:) rows through a per-task Gustavson/hash accumulator — a scalar
pointer-chasing loop a TPU cannot run.  Round-1's replacement expanded
every product with a wide per-product binary search (~10 XLA gathers of
F elements at the ~0.12 Ge/s scalar-loop rate) and ran EAGERLY, paying
the ~30 ms axon dispatch floor for every one of hundreds of ops per row
block.  This module replaces that with a TPU-idiomatic pipeline where
per-product work is one scatter, one cumulative max, and at most two
gathers, and each (row-class x block) is a SINGLE jitted call:

  host  (O(nnzA) numpy): for each A entry e = (i, k) of the block, the
        padded slot where its product run starts, and two packed int64
        words  (local_e << 32) | payload  carrying (a) the B-position
        offset of the run and (b) the bits of A's value.
  device: scatter-max the packed words at the run starts, then ONE
        cumulative max fills every product slot with its run's word
        (runs start in ascending local_e order, so the running max IS
        the latest run — a fill-forward scan in one vector op).  From
        the filled words: b_pos = payload + slot, j = B.indices[b_pos],
        bv = B.values[b_pos] — the only per-product gathers left, and
        the PAIR/FIRST multiplies skip the value gather entirely.
        Products then sort-combine in VMEM (kernels/sortreduce) and the
        per-row output counts come from a row-axis reduction, not a
        scatter-add.  An optional sparse mask (dot3 analog,
        Source/GB_AxB_dot3_template.c) filters keys inside the same
        compiled call.

Rows whose flop count exceeds the largest sort class fall back to the
classic argsort ESC path in ops/mxm.py (via the ``classic_block``
callback).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core import config as CFG
from ..core.matrix import HYPER, INDEX, ROW, SPARSE, Matrix
from ..core.types import cast
from ..kernels import sortreduce as SRD

import os as _os
import time as _time

_SPG_DBG = bool(_os.environ.get("GB_SPGEMM_DEBUG"))
_dbg_t = [None]


def _sdbg(stage, *sync):
    """Stage timer (GB_SPGEMM_DEBUG=1): forces a device sync on the given
    arrays so wall deltas attribute to real stages, not dispatch queues."""
    if not _SPG_DBG:
        return
    for a in sync:
        try:
            np.asarray(jnp.sum(a))
        except Exception:
            pass
    now = _time.perf_counter()
    dt = 0.0 if _dbg_t[0] is None else now - _dbg_t[0]
    _dbg_t[0] = now
    print(f"[spgemm] {stage}  +{dt:.3f}s", flush=True)


# payload bias: adjB = bstart - pos must map into [0, 2^32).  pos <
# 2^28 is asserted (padded class domains beyond that fall back).
_BIAS = np.int64(1) << 28
_LOW32 = np.int64((1 << 32) - 1)

# value dtypes carried natively by the sort-reduce kernel; small ints
# widen to int32 (PLUS/TIMES wrap identically mod 2^k after the final
# narrowing cast, MIN/MAX/bitwise are exact in the wider type)
KDT = {
    np.dtype(np.bool_): (np.int32, True),
    np.dtype(np.int8): (np.int32, False),
    np.dtype(np.uint8): (np.int32, False),
    np.dtype(np.int16): (np.int32, False),
    np.dtype(np.uint16): (np.int32, False),
    np.dtype(np.int32): (np.int32, False),
    np.dtype(np.float32): (np.float32, False),
}


def eligible(sr, zt):
    from ..core import config as _cfg
    if not _cfg.GLOBAL.pallas_enabled:
        return False
    if sr.mult.positional:
        return False
    if getattr(zt, "shape", None):          # user struct types
        return False
    dt = np.dtype(zt.np_dtype)
    if dt in KDT:
        return True
    # PAIR multiply with a 64-bit int accumulator: per-key sums are
    # bounded by the sort-class cap (< 2^31), so int32 accumulation is
    # exact and widens on output — this is the triangle-count semiring
    # (plus_pair_int64, BASELINE config 3).
    if dt in (np.dtype(np.int64), np.dtype(np.uint64)) \
            and sr.mult.name == "GrB_ONEB":
        return True
    return False


def _kdt_for(sr, zt):
    dt = np.dtype(zt.np_dtype)
    if dt in KDT:
        return KDT[dt]
    return (np.int32, False)      # int64 PAIR case


# ---------------------------------------------------------------------------
# the jitted per-class pipeline
# ---------------------------------------------------------------------------

_pipe_cache = {}


def _class_pipeline(C, Rc_pad, n, sr, kdt_name, logical, need_av,
                    need_bv, mode_av, masked, mask_comp, interpret):
    """Build (and cache) the jitted pipeline for one class signature.
    E_pad is NOT part of the signature — the entry arrays are plain
    dynamic-length jit args, so only (C, Rc_pad) shape the executable.
    With ``masked``, mask entries arrive as token runs past nnzB in BiX
    (see spgemm_esc_fast) and the filter happens inside the sort —
    no key lookups (the former binary search cost ~23 full-domain
    gathers per class call)."""
    key = (C, Rc_pad, n, id(sr), kdt_name, logical, need_av,
           need_bv, mode_av, masked, mask_comp, interpret)
    fn = _pipe_cache.get(key)
    if fn is not None:
        return fn
    kdt = jnp.dtype(kdt_name)
    mult = sr.mult
    add = sr.add
    D = Rc_pad * C

    def run(pos, p1, p2, flopc, Bi, Bv, nnzB_s):
        nnzBx = Bi.shape[0]
        buf1 = jnp.full((D,), -1, jnp.int64).at[pos].max(p1, mode="drop")
        fil1 = jax.lax.cummax(buf1, axis=0)
        adjB = (fil1 & _LOW32) - _BIAS
        sidx = jnp.arange(D, dtype=jnp.int64)
        b_pos = jnp.clip(adjB + sidx, 0, nnzBx - 1)
        cpos = jax.lax.broadcasted_iota(jnp.int32, (Rc_pad, C), 1)
        valid = (cpos < flopc[:, None]).reshape(-1)
        j = Bi[b_pos].astype(jnp.int32)
        av = bv = None
        if need_av:
            buf2 = jnp.full((D,), -1, jnp.int64).at[pos].max(
                p2, mode="drop")
            fil2 = jax.lax.cummax(buf2, axis=0)
            av = jax.lax.bitcast_convert_type(
                (fil2 & _LOW32).astype(jnp.uint32),
                jnp.float32 if kdt == jnp.float32 else jnp.int32)
        if need_bv:
            bv = Bv[b_pos]
        if mode_av == "pair":
            prod = jnp.ones((D,), kdt)
        elif mode_av == "first":
            prod = av.astype(kdt)
        elif mode_av == "second":
            prod = bv.astype(kdt)
        else:
            prod = mult.fn(av, bv).astype(kdt)
        if logical:
            prod = prod.astype(jnp.int32)
        ident = jnp.asarray(add.identity_for(np.dtype(kdt_name)),
                            prod.dtype)
        keys = jnp.where(valid, j, SRD.SENTINEL)
        prod = jnp.where(keys != SRD.SENTINEL, prod, ident)
        if masked:
            tok = b_pos >= nnzB_s
            prod = jnp.where(tok, ident, prod)
            tx = jnp.where(valid, jnp.where(tok, 1, 2), 0) \
                .astype(jnp.int32)
            ok, ov = SRD.sort_reduce_rows_tok(
                keys.reshape(D // 128, 128), prod.reshape(D // 128, 128),
                tx.reshape(D // 128, 128), C, add,
                want_token=not mask_comp, logical=logical,
                interpret=interpret)
        else:
            ok, ov = SRD.sort_reduce_rows(
                keys.reshape(D // 128, 128), prod.reshape(D // 128, 128),
                C, add, logical=logical, interpret=interpret)
        okr = ok.reshape(Rc_pad, C)
        counts = jnp.sum(okr != SRD.SENTINEL, axis=1).astype(jnp.int64)
        return ok, ov, counts

    fn = jax.jit(run)
    _pipe_cache[key] = fn
    return fn


def _pow2_at_least(x, lo=8):
    p = lo
    while p < x:
        p *= 2
    return p


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------

def host_arrays(Ar, Br, cumf, sr, zt):
    """One-time host copies shared across blocks: A's column ids, A's
    values in kernel-dtype bit form, the cumulative flop array, B's row
    pointers."""
    kdt_np, _ = _kdt_for(sr, zt)
    Ai_h = np.asarray(Ar.indices).astype(np.int64)
    mname = sr.mult.name
    if mname in ("GrB_ONEB", "GrB_SECOND"):
        Avb_h = None
    else:
        av = np.asarray(Ar._vals_expanded()).astype(kdt_np)
        Avb_h = av.view(np.uint32).astype(np.int64)
    cumf_h = np.asarray(cumf).astype(np.int64)
    Bp_h = np.asarray(Br.indptr).astype(np.int64)
    return Ai_h, Avb_h, cumf_h, Bp_h


def spgemm_esc_fast(Ar, Br, cumf, ip_h, row_cum_h, F, sr, zt, m, n, mask,
                    desc, interpret, classic_block, flop_block):
    """Row-block-tiled driver (peak padded memory O(flop_block))."""
    _sdbg("driver start")
    hostA = host_arrays(Ar, Br, cumf, sr, zt)
    _sdbg("host_arrays")
    masked = mask is not None and mask.fmt in (SPARSE, HYPER)
    if masked:
        # mask entries become in-sort TOKENS (see sortreduce): each
        # masked output row's class budget grows by its mask degree, and
        # B's index array is extended with the mask's so token runs ride
        # the same fill-forward expansion.  Valued masks filter to their
        # effective structure here, once, on the host.
        Mr = mask.to_format(SPARSE, ROW)
        mip_h = np.asarray(Mr.indptr).astype(np.int64)
        mi_h = np.asarray(Mr.indices)
        if not desc.mask_structure:
            mvals = np.asarray(Mr._vals_expanded())
            keep = mvals != 0
            if not keep.all():
                kcum = np.zeros(mi_h.shape[0] + 1, np.int64)
                np.cumsum(keep, out=kcum[1:])
                mip_h = kcum[mip_h]
                mi_h = mi_h[keep]
        mdeg_all = np.diff(mip_h)
        BiX = jnp.concatenate(
            [Br.indices, jnp.asarray(mi_h.astype(INDEX))])
    else:
        mip_h = None
        mdeg_all = None
        BiX = Br.indices
    nnzB_real = int(Br.indices.shape[0])
    # block split on PADDED slot cost (a row pads to its sort-class cap,
    # so 1-flop rows cost 128 slots — raw-flop splitting could blow the
    # padded domain 128x); fallback rows (> top cap) cost raw flops
    flops_all = row_cum_h[1:] - row_cum_h[:-1]
    load_all = flops_all if not masked else \
        flops_all + np.where(flops_all > 0, mdeg_all, 0)
    caps = np.asarray(SRD.CAPS, np.int64)
    cls_all = np.searchsorted(caps, load_all)
    pad_cost = np.where(
        cls_all < len(SRD.CAPS), caps[np.minimum(cls_all, len(caps) - 1)],
        flops_all)
    pad_cost[flops_all == 0] = 0
    pad_cum = np.zeros(m + 1, np.int64)
    np.cumsum(pad_cost, out=pad_cum[1:])
    starts = [0]
    while starts[-1] < m:
        r0 = starts[-1]
        r1 = int(np.searchsorted(pad_cum, pad_cum[r0] + flop_block,
                                 side="right")) - 1
        starts.append(max(r1, r0 + 1))
    CFG.burble("spgemm-fast: %d row blocks (scan-expand)",
               len(starts) - 1)
    ips, idxs, cvs = [], [], []
    _sdbg("block split")
    for r0, r1 in zip(starts[:-1], starts[1:]):
        indptr_b, uidx, cv = _block(
            Ar, Br, hostA, ip_h, row_cum_h, r0, r1, sr, zt, n,
            mip_h, BiX, nnzB_real, masked, desc, interpret,
            classic_block)
        ips.append(np.diff(np.asarray(indptr_b)))
        idxs.append(uidx)
        cvs.append(cv)
    counts = np.concatenate(ips) if len(ips) > 1 else ips[0]
    indptr = np.zeros(m + 1, np.int64)
    np.cumsum(counts, out=indptr[1:])
    uidx = jnp.concatenate(idxs) if len(idxs) > 1 else idxs[0]
    cv = jnp.concatenate(cvs) if len(cvs) > 1 else cvs[0]
    return Matrix((m, n), zt, SPARSE, ROW,
                  indptr=jnp.asarray(indptr.astype(INDEX)), indices=uidx,
                  values=cv)


def _block(Ar, Br, hostA, ip_h, row_cum_h, r0, r1, sr, zt, n,
           mip_h, BiX, nnzB_real, masked, desc, interpret, classic_block):
    Ai_h, Avb_h, cumf_h, Bp_h = hostA
    kdt_np, logical = _kdt_for(sr, zt)
    kdt_name = np.dtype(kdt_np).name
    nb = r1 - r0
    flops_r = row_cum_h[r0 + 1:r1 + 1] - row_cum_h[r0:r1]
    deg_r = ip_h[r0 + 1:r1 + 1] - ip_h[r0:r1]
    if masked:
        mdeg_r = mip_h[r0 + 1:r1 + 1] - mip_h[r0:r1]
        load_r = flops_r + mdeg_r
    else:
        mdeg_r = None
        load_r = flops_r
    cls = np.searchsorted(np.asarray(SRD.CAPS, np.int64), load_r)
    cls[flops_r == 0] = -1

    mname = sr.mult.name
    mode_av = ("pair" if mname == "GrB_ONEB" else
               "first" if mname == "GrB_FIRST" else
               "second" if mname == "GrB_SECOND" else "general")
    need_av = mode_av in ("first", "general")
    need_bv = mode_av in ("second", "general")
    if need_bv:
        Bv_dev = Br._vals_expanded().astype(kdt_np)
        if masked:
            # token b_pos indexes past nnzB: extend with identity slots
            Bv_dev = jnp.concatenate(
                [Bv_dev, jnp.zeros((int(BiX.shape[0]) - nnzB_real,),
                                   kdt_np)])
    else:
        Bv_dev = jnp.zeros(0, kdt_np)

    counts_by_row = jnp.zeros((nb,), jnp.int64)
    streams = []          # (ok, ov, sel, C, Rc) padded class outputs

    for ci, C in enumerate(SRD.CAPS):
        sel = np.flatnonzero(cls == ci)
        if sel.size == 0:
            continue
        rows_c = sel + r0
        Rc = sel.size
        Rc_pad = _pow2_at_least(Rc)
        counts = deg_r[sel]
        starts = ip_h[rows_c]
        if masked:
            # one extra pseudo-entry per row with mask entries: its run
            # is the row's token slots [flops, flops+mdeg), reading
            # column ids from the mask region of BiX
            has_tok = (mdeg_r[sel] > 0).astype(np.int64)
            counts2 = counts + has_tok
        else:
            has_tok = None
            counts2 = counts
        E = int(counts.sum())
        cum0 = np.zeros(Rc, np.int64)
        np.cumsum(counts[:-1], out=cum0[1:])
        within = np.arange(E, dtype=np.int64) - np.repeat(cum0, counts)
        e_idx = np.repeat(starts, counts) + within
        rowslot = np.repeat(np.arange(Rc, dtype=np.int64), counts)
        c_start = cumf_h[e_idx] - row_cum_h[np.repeat(rows_c, counts)]
        pos = rowslot * C + c_start
        assert Rc_pad * C < (1 << 28), \
            "spgemm-fast: padded class domain exceeds payload bias"
        ka = Ai_h[e_idx]
        adjB = Bp_h[ka] - pos + _BIAS
        # run-start ranks must ascend with pos; tokens slot in after
        # their row's products
        cum2 = np.zeros(Rc, np.int64)
        np.cumsum(counts2[:-1], out=cum2[1:])
        loc = (cum2[rowslot] + within + 1) << 32
        packed1 = loc | adjB
        packed2 = (loc | Avb_h[e_idx]) if need_av \
            else np.zeros(0, np.int64)
        if masked and has_tok.any():
            tsel = np.flatnonzero(has_tok)
            pos_t = tsel * C + flops_r[sel[tsel]]
            adjB_t = (nnzB_real + mip_h[rows_c[tsel]]) - pos_t + _BIAS
            loc_t = (cum2[tsel] + counts[tsel] + 1) << 32
            pos = np.concatenate([pos, pos_t])
            packed1 = np.concatenate([packed1, loc_t | adjB_t])
            if need_av:
                packed2 = np.concatenate([packed2, loc_t])
            E += tsel.size
        # pad entry arrays to pow2 buckets so jit executables are shared
        # across blocks (pads scatter packed=-1 at slot 0: never wins)
        E_pad = _pow2_at_least(max(E, 1), lo=1 << 10)
        if E_pad > E:
            pw = E_pad - E
            pos = np.concatenate([pos, np.zeros(pw, np.int64)])
            packed1 = np.concatenate([packed1, np.full(pw, -1, np.int64)])
            if need_av:
                packed2 = np.concatenate(
                    [packed2, np.full(pw, -1, np.int64)])
        flopc = np.zeros(Rc_pad, np.int32)
        flopc[:Rc] = load_r[sel]

        fn = _class_pipeline(C, Rc_pad, n, sr, kdt_name, logical,
                             need_av, need_bv, mode_av, masked,
                             bool(desc.mask_complement), interpret)
        _sdbg(f"class C={C} host prep (E={E})")
        ok, ov, counts_c = fn(
            jnp.asarray(pos), jnp.asarray(packed1), jnp.asarray(packed2),
            jnp.asarray(flopc), BiX, Bv_dev,
            jnp.int64(nnzB_real))
        _sdbg(f"class C={C} pipeline", counts_c)
        counts_c = counts_c[:Rc]
        counts_by_row = counts_by_row.at[jnp.asarray(sel)].set(counts_c)
        streams.append((ok, ov, jnp.asarray(sel), C, Rc))

    # fallback rows (flops beyond the top class): classic argsort ESC
    fb = np.flatnonzero(cls == len(SRD.CAPS))
    fb_stream = None
    if fb.size:
        uvec, uidx, cv, counts_fb = classic_block(fb, r0)
        vk = cv.astype(kdt_np) if not logical else cv.astype(jnp.int32)
        rowidx = jnp.searchsorted(jnp.asarray((fb + r0).astype(np.int64)),
                                  uvec).astype(jnp.int64)
        counts_by_row = counts_by_row.at[jnp.asarray(fb)].set(counts_fb)
        fb_stream = (uvec, uidx.astype(jnp.int32), vk, rowidx,
                     jnp.concatenate([jnp.zeros(1, jnp.int64),
                                      jnp.cumsum(counts_fb)]))

    indptr = jnp.concatenate([jnp.zeros(1, jnp.int64),
                              jnp.cumsum(counts_by_row)])
    nnz_tot = int(indptr[-1])
    _sdbg("indptr+nnz sync")
    uidx_out = jnp.zeros((nnz_tot,), INDEX)
    cv_out = jnp.zeros((nnz_tot,), kdt_np)
    # direct placement: sort-reduce leaves each row's outputs at run-end
    # slots, so the within-row output rank is a row-wise prefix count
    # (vector cumsum) and the destination is pure arithmetic — no
    # gather-based compaction (the former K.compact cost 4 full-domain
    # scalar-rate passes per class)
    for ok, ov, sel_d, C, Rc in streams:
        okr = ok.reshape(-1, C)
        valid = okr != SRD.SENTINEL
        rank = jnp.cumsum(valid.astype(jnp.int32), axis=1) - 1
        base = jnp.full((okr.shape[0],), nnz_tot, jnp.int64)
        base = base.at[: Rc].set(indptr[sel_d])
        dest = jnp.where(valid, base[:, None] + rank, nnz_tot)
        df = dest.reshape(-1)
        uidx_out = uidx_out.at[df].set(ok.reshape(-1).astype(INDEX),
                                       mode="drop")
        cv_out = cv_out.at[df].set(ov.reshape(-1).astype(kdt_np),
                                   mode="drop")
    if fb_stream is not None:
        uvec, jk, vk, rowidx, cstart = fb_stream
        k_in = jnp.arange(jk.shape[0], dtype=jnp.int64)
        dest = indptr[uvec - r0] + (k_in - cstart[rowidx])
        uidx_out = uidx_out.at[dest].set(jk.astype(INDEX))
        cv_out = cv_out.at[dest].set(vk)
    _sdbg("direct placement", cv_out)
    if logical:
        cv_out = cv_out.astype(np.bool_)
    else:
        cv_out = cast(cv_out, zt)
    return indptr.astype(INDEX), uidx_out, cv_out
