"""Ablate the production one-hot kernel: time chained SpMVs with pieces
disabled (wrong results, speed only). Knob via argv[1]:
  full      - as shipped
  1tr       - single transpose reused for cenc/renc/val
  notr      - no transposes (use raw block, wrong math)
  noscatter - skip scatter matmuls + y write
  nogather  - skip gather matmuls/select (prod = val)
"""
import sys, time, functools
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from graphblas_tpu.kernels import spmv_onehot as OH

MODE = sys.argv[1] if len(sys.argv) > 1 else "full"
CPS = OH.CPS

def _onehot(idx_col, width, E):
    iota = jax.lax.broadcasted_iota(jnp.int32, (E, width), 1).astype(jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(idx_col - iota))

def make_kernel(cap, nc):
    def _kernel(rc_ref, cenc_ref, renc_ref, val_ref, xhi_ref, xlo_ref, y_ref):
        step = pl.program_id(0)
        @pl.when(step == 0)
        def _():
            y_ref[:] = jnp.zeros_like(y_ref)
        if MODE == "notr":
            blk = cenc_ref[:]  # (CPS, cap) no transpose: fabricate columns
            cencT = rencT = valT = jnp.swapaxes(blk, 0, 1) * 0.0 + 1.0 if False else None
        if MODE in ("full", "noscatter", "nogather"):
            cencT = jnp.swapaxes(cenc_ref[:], 0, 1)
            rencT = jnp.swapaxes(renc_ref[:], 0, 1)
            valT = jnp.swapaxes(val_ref[:], 0, 1)
        elif MODE == "1tr":
            cencT = jnp.swapaxes(cenc_ref[:], 0, 1)
            rencT = cencT
            valT = cencT
        elif MODE == "notr":
            z = jnp.zeros((cap, CPS), jnp.float32)
            cencT = rencT = valT = z
        dn = (((1,), (0,)), ((), ()))
        dnT = (((0,), (0,)), ((), ()))
        for j in range(CPS):
            rc = rc_ref[step * CPS + j]
            r = jax.lax.div(rc, jnp.int32(nc))
            c = jax.lax.rem(rc, jnp.int32(nc))
            Xh = xhi_ref[pl.ds(c * 64, 64), :]
            Xl = xlo_ref[pl.ds(c * 64, 64), :]
            ce = cencT[:, j:j + 1]
            chi = jnp.floor(ce * (1.0 / 128.0))
            clo = ce - 128.0 * chi
            if MODE == "nogather":
                prod = valT[:, j:j + 1]
            else:
                ohc = _onehot(chi, 64, cap).astype(jnp.bfloat16)
                t1h = jax.lax.dot_general(ohc, Xh, dn, preferred_element_type=jnp.float32)
                t1l = jax.lax.dot_general(ohc, Xl, dn, preferred_element_type=jnp.float32)
                ohl = _onehot(clo, 128, cap)
                g = (jnp.sum(t1h * ohl, axis=1, keepdims=True)
                     + jnp.sum(t1l * ohl, axis=1, keepdims=True) * (1.0/512.0))
                prod = g * valT[:, j:j + 1]
            if MODE == "noscatter":
                continue
            re = rencT[:, j:j + 1]
            rhi = jnp.floor(re * (1.0 / 128.0))
            rlo = re - 128.0 * rhi
            ohr = _onehot(rhi, 64, cap).astype(jnp.bfloat16)
            pb = _onehot(rlo, 128, cap) * prod
            pbi = pltpu.bitcast(pb, jnp.uint32)
            pbh_f32 = pltpu.bitcast(pbi & jnp.uint32(0xFFFF0000), jnp.float32)
            pbh = pbh_f32.astype(jnp.bfloat16)
            pbl = ((pb - pbh_f32) * 512.0).astype(jnp.bfloat16)
            y2 = (jax.lax.dot_general(ohr, pbh, dnT, preferred_element_type=jnp.float32)
                  + jax.lax.dot_general(ohr, pbl, dnT, preferred_element_type=jnp.float32)
                  * (1.0/512.0))
            ys = pl.ds(r * 64, 64)
            y_ref[ys, :] = y_ref[ys, :] + y2
    return _kernel

def main():
    import scipy.sparse as sps
    n = 1 << 20; deg = 16
    rng = np.random.default_rng(0)
    S = sps.csr_matrix((np.ones(n*deg, np.float32),
                        (rng.integers(0,n,n*deg), rng.integers(0,n,n*deg))), shape=(n,n))
    S.sum_duplicates()
    p = OH.plan_for(jnp.asarray(S.indptr, jnp.int32), jnp.asarray(S.indices, jnp.int32),
                    jnp.asarray(S.data), (n, n))
    print(f"cap={p.cap} nchunks={p.nchunks} pad={p.padded_frac:.2f}")
    with jax.enable_x64(False):
        xpad = np.zeros(p.nc * OH.STRIP, np.float32); xpad[:n] = rng.standard_normal(n)
        x2 = jnp.asarray(xpad.reshape(p.nc * 64, 128))
        kernel = make_kernel(p.cap, p.nc)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(p.nchunks // CPS,),
            in_specs=[pl.BlockSpec((CPS, p.cap), lambda s, rc: (s, 0), memory_space=pltpu.VMEM)]*3
                     + [pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
        pc = pl.pallas_call(kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((p.nr * 64, 128), jnp.float32))
        @jax.jit
        def chained(rc, cenc, renc, val, x2):
            def body(i, x2):
                xi = jax.lax.bitcast_convert_type(x2, jnp.uint32)
                xh32 = jax.lax.bitcast_convert_type(xi & np.uint32(0xFFFF0000), jnp.float32)
                xh = xh32.astype(jnp.bfloat16)
                xl = ((x2 - xh32) * 512.0).astype(jnp.bfloat16)
                y = pc(rc, cenc, renc, val, xh, xl)
                return y * jnp.float32(1.0/16)
            return jnp.sum(jax.lax.fori_loop(0, 50, body, x2))
        args = (p.rc, p.cenc, p.renc, p.val, x2)
        r = float(np.asarray(chained(*args)))
        t0 = time.perf_counter()
        r = float(np.asarray(chained(*args)))
        dt = (time.perf_counter()-t0)/50
        print(f"{MODE}: {dt*1e3:.2f} ms/SpMV  {S.nnz/dt/1e9:.3f} Gnnz/s")

main()
