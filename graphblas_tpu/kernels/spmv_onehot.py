"""Bucket-grid one-hot SpMV kernel ("Design M").

The TPU has no hardware scatter/gather on the TensorCore: XLA lowers both
to ~8-cycle/element scalar loops (measured 0.12 Gelem/s), which caps any
gather+segment-sum SpMV at ~0.05 Gnnz/s.  This kernel instead routes BOTH
the x-gather and the y-scatter through the MXU as one-hot matmuls, with the
VPU building the one-hot masks arithmetically — measured ~1.4 Gentries/s
on v5e, ~25x the XLA substrate.

Reference counterpart: the saxpy3 Gustavson/hash kernel family
(Source/GB_AxB_saxpy3*.c) — its hash tables have no TPU analog; the
bucket-grid + one-hot matmul is the systolic-array-native replacement.

Design:
  * Plan time (host, cached per matrix): entries are binned into a
    (row-strip x col-strip) bucket grid, strips of 8192.  Buckets are
    split into chunks of <= MAXCAP entries; each chunk's (row-strip,
    col-strip) comes from a scalar-prefetched code.
  * Entry arrays are stored (nchunks, cap) — chunk per row, entries along
    lanes (compact HBM layout; an (N, 1) array would get a T(8,128) tiled
    layout, a 128x blowup).  The kernel loads CPS chunks per grid step and
    keeps entries on the LANE axis end to end: sublane slices/broadcasts
    are native-cheap and the MXU absorbs transposition via contraction
    dims (an explicit per-block transpose costs ~7 ms/SpMV at bench
    scale — experiments/onehot_ablate3.py).
  * Per chunk at bucket (r, c):
      gather:  t1 = onehot64(cenc>>7) @ X_strip(64,128)        [MXU]
               g  = sum(t1 * onehot128(cenc&127), axis=1)      [VPU]
      scatter: Y_strip(64,128) += onehot64(renc>>7)^T @
                                  (onehot128(renc&127) * g * val)  [MXU]
    One-hots are built with relu(1 - |idx - iota|) — exact 0/1 in bf16,
    no boolean vectors (avoids a Mosaic i1-relayout bug).
  * fp32 accuracy: x is fed to the MXU as a bf16 (hi, lo) split pair
    (via integer mantissa masking — an astype round-trip would be elided
    by --xla_allow_excess_precision), and the scatter operand likewise.
    Resulting relative error ~2^-16 (vs 2^-24 pure-f32); integer/boolean
    values up to 2^16 are exact.  A 3-way split would reach full fp32 at
    ~15% extra cost if needed.
  * x and y live whole in VMEM (eligibility-gated: n <= ~1.5M).

Experiments and the measured design space live in experiments/ (gather
probes, roll/butterfly rates).  Next iteration (planned): a static-routing
permutation engine (plan-time routes + roll-select butterflies at the
measured 920 Gelem/s) replacing the one-hot select — projected ~5x
further.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

STRIP = 8192          # rows/cols per strip (64 sublanes x 128 lanes)
MAXN = 3 << 19        # x + y (+ bf16 splits) must fit VMEM
MAXCAP = 2048         # entries per chunk (bounds VMEM intermediates)
CPS = 8               # chunks per grid step (amortizes per-step overhead)


class Plan:
    """Bucket-grid layout of one CSR matrix (cached per matrix id)."""

    __slots__ = ("cenc", "renc", "val", "rc", "nr", "nc", "cap",
                 "m", "n", "nchunks", "nnz")

    def __init__(self, indptr, indices, values, shape):
        m, n = shape
        ip = np.asarray(indptr)
        ci = np.asarray(indices).astype(np.int64)
        vv = np.asarray(values).astype(np.float32)
        nnz = ci.shape[0]
        ri = np.repeat(np.arange(m, dtype=np.int64), np.diff(ip))
        nr = -(-m // STRIP)
        nc = -(-n // STRIP)
        nb = nr * nc
        b = (ri // STRIP) * nc + (ci // STRIP)          # bucket id
        order = np.argsort(b, kind="stable")
        bs = b[order]
        counts = np.bincount(bs, minlength=nb)
        cap = int(counts.max()) if nnz else 128
        cap = min(max(-(-cap // 128) * 128, 128), MAXCAP)
        chn = np.maximum(1, -(-counts // cap))
        chunk_of_bucket = np.zeros(nb + 1, np.int64)
        np.cumsum(chn, out=chunk_of_bucket[1:])
        nchunks = int(chunk_of_bucket[-1])
        nchunks = -(-nchunks // CPS) * CPS   # pad to whole grid steps
        # (padding chunks carry rc=0 and val=0: they add 0 to strip (0,0))
        starts = np.zeros(nb + 1, np.int64)
        np.cumsum(counts, out=starts[1:])
        slot = np.arange(nnz) - starts[bs]
        pos = (chunk_of_bucket[bs] + slot // cap) * cap + slot % cap
        cenc = np.zeros(nchunks * cap, np.float32)
        renc = np.zeros(nchunks * cap, np.float32)
        val = np.zeros(nchunks * cap, np.float32)
        cenc[pos] = (ci[order] % STRIP).astype(np.float32)
        renc[pos] = (ri[order] % STRIP).astype(np.float32)
        val[pos] = vv[order]

        self.cenc = jnp.asarray(cenc.reshape(nchunks, cap))
        self.renc = jnp.asarray(renc.reshape(nchunks, cap))
        self.val = jnp.asarray(val.reshape(nchunks, cap))
        rc_np = np.zeros(nchunks, np.int32)
        rc_real = np.repeat(np.arange(nb, dtype=np.int32), chn)
        rc_np[:rc_real.shape[0]] = rc_real
        self.rc = jnp.asarray(rc_np)
        self.nr, self.nc, self.cap = nr, nc, cap
        self.m, self.n = m, n
        self.nchunks = nchunks
        self.nnz = nnz

    @property
    def padded_frac(self):
        return self.nchunks * self.cap / max(1, self.nnz)


_plan_cache: dict = {}


def plan_for(indptr, indices, values, shape) -> Plan:
    # Strong references to the source arrays ride in the entry so their
    # ids can never be recycled while the entry lives (a bare id() key
    # could silently serve a stale plan to a new matrix reusing the same
    # addresses); identity is re-checked on hit.
    key = (id(indptr), id(indices), id(values), shape)
    ent = _plan_cache.get(key)
    if ent is not None and ent[0] is indptr and ent[1] is indices \
            and ent[2] is values:
        return ent[3]
    if len(_plan_cache) > 8:
        _plan_cache.clear()
    p = Plan(indptr, indices, values, shape)
    _plan_cache[key] = (indptr, indices, values, p)
    return p


def eligible(m: int, n: int, nnz: int) -> bool:
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    return n <= MAXN and m <= MAXN and nnz > 0


def _onehotT(idx_row, width, E):
    """Transposed one-hot: (width, E) from a (1, E) index row.  The
    sublane broadcast of idx_row is native-cheap (register replication);
    exact 0/1 arithmetic, no boolean vectors (Mosaic i1-relayout bug)."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (width, E), 0).astype(
        jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(idx_row - iota))


def _kernel(rc_ref, cenc_ref, renc_ref, val_ref, xhi_ref, xlo_ref, y_ref,
            *, cap, nc):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        y_ref[:] = jnp.zeros_like(y_ref)

    # Entries stay on the LANE axis end to end: sublane slices/broadcasts
    # are native-cheap, and the MXU absorbs the transposition through the
    # contraction dims.  (The earlier sublane-major variant needed a
    # (CPS, cap) -> (cap, CPS) transpose per block costing ~7 ms/SpMV each
    # at bench scale — see experiments/onehot_ablate3.py.)
    dg = (((0,), (0,)), ((), ()))   # contract sublane dims
    dsc = (((1,), (1,)), ((), ()))  # contract lane (entry) dims
    for j in range(CPS):
        # all index math in int32 (x64 mode would inject int64, which
        # Mosaic cannot lower)
        rc = rc_ref[step * CPS + j]
        r = jax.lax.div(rc, jnp.int32(nc))
        c = jax.lax.rem(rc, jnp.int32(nc))
        Xh = xhi_ref[pl.ds(c * 64, 64), :]
        Xl = xlo_ref[pl.ds(c * 64, 64), :]
        ce = cenc_ref[j:j + 1, :]           # (1, cap) sublane slice
        chi = jnp.floor(ce * (1.0 / 128.0))
        clo = ce - 128.0 * chi
        ohcT = _onehotT(chi, 64, cap).astype(jnp.bfloat16)   # (64, cap)
        t1hT = jax.lax.dot_general(Xh, ohcT, dg,
                                   preferred_element_type=jnp.float32)
        t1lT = jax.lax.dot_general(Xl, ohcT, dg,
                                   preferred_element_type=jnp.float32)
        # t1?T: (128, cap) — row l = x value at lane l, per entry
        ohlT = _onehotT(clo, 128, cap)
        g = (jnp.sum(t1hT * ohlT, axis=0, keepdims=True)
             + jnp.sum(t1lT * ohlT, axis=0, keepdims=True) * (1.0 / 512.0))
        prod = g * val_ref[j:j + 1, :]      # (1, cap)
        re = renc_ref[j:j + 1, :]
        rhi = jnp.floor(re * (1.0 / 128.0))
        rlo = re - 128.0 * rhi
        ohrT = _onehotT(rhi, 64, cap).astype(jnp.bfloat16)   # (64, cap)
        pbT = _onehotT(rlo, 128, cap) * prod                 # (128, cap)
        # hi/lo split via mantissa masking (see _run_inner for why)
        pbi = pltpu.bitcast(pbT, jnp.uint32)
        pbh_f32 = pltpu.bitcast(pbi & jnp.uint32(0xFFFF0000), jnp.float32)
        pbh = pbh_f32.astype(jnp.bfloat16)
        pbl = ((pbT - pbh_f32) * 512.0).astype(jnp.bfloat16)
        y2 = (jax.lax.dot_general(ohrT, pbh, dsc,
                                  preferred_element_type=jnp.float32)
              + jax.lax.dot_general(ohrT, pbl, dsc,
                                    preferred_element_type=jnp.float32)
              * (1.0 / 512.0))
        ys = pl.ds(r * 64, 64)
        y_ref[ys, :] = y_ref[ys, :] + y2


@functools.partial(jax.jit, static_argnums=(5, 6, 7, 8, 9))
def _run_inner(rc, cenc, renc, val, xpad2, cap, nr, nc, nchunks,
               interpret=False):
    # split x for exact-fp32 MXU feed; the hi part is produced by integer
    # mantissa masking, NOT by a bf16 round-trip — XLA runs with
    # --xla_allow_excess_precision, which elides f32->bf16->f32 round-trips
    # and would silently zero the low part.  Low part pre-scaled by 2^9
    # (exact exponent shift).
    xi = jax.lax.bitcast_convert_type(xpad2, jnp.uint32)
    xhi_f32 = jax.lax.bitcast_convert_type(
        xi & np.uint32(0xFFFF0000), jnp.float32)
    xhi = xhi_f32.astype(jnp.bfloat16)          # exact: mantissa truncated
    xlo = ((xpad2 - xhi_f32) * 512.0).astype(jnp.bfloat16)
    kernel = functools.partial(_kernel, cap=cap, nc=nc)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nchunks // CPS,),
        in_specs=[
            pl.BlockSpec((CPS, cap), lambda s, rc_ref: (s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CPS, cap), lambda s, rc_ref: (s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CPS, cap), lambda s, rc_ref: (s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    y = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nr * 64, 128), jnp.float32),
        interpret=interpret,
    )(rc, cenc, renc, val, xhi, xlo)
    return y


def _run(rc, cenc, renc, val, xpad2, cap, nr, nc, nchunks,
         interpret=False):
    # trace in strict-int32 mode: Mosaic cannot lower the int64 index math
    # that jax_enable_x64 (required by the GraphBLAS type system) injects
    with jax.enable_x64(False):
        return _run_inner(rc, cenc, renc, val, xpad2, cap, nr, nc,
                          nchunks, interpret)


def spmv(indptr, indices, values, x, m: int, interpret=None):
    """y = A @ x (plus-times, fp32-class accuracy) via the bucket-grid
    one-hot kernel.  ``interpret=None`` auto-selects interpret mode on
    the CPU backend so the tier stays testable on the CI mesh."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    p = plan_for(indptr, indices, values, (m, int(x.shape[0])))
    npad = p.nc * STRIP
    xpad = jnp.pad(x.astype(jnp.float32), (0, npad - x.shape[0]))
    y = _run(p.rc, p.cenc, p.renc, p.val, xpad.reshape(p.nc * 64, 128),
             p.cap, p.nr, p.nc, p.nchunks, bool(interpret))
    return y.reshape(-1)[:m].astype(x.dtype)
