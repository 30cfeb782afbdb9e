"""Engine SpMV timing v3: numpy-side plan build (no tunnel round-trips),
per-stage timings (gather / phase1 / phase2), wall-clock rate from K
back-to-back async dispatches synced once (kernels serialize on device)."""
import sys, time
import numpy as np
import scipy.sparse as sps
import jax, jax.numpy as jnp
from graphblas_tpu.kernels import spmv_route as SPR
from graphblas_tpu.kernels import static_route as SRT
import functools
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

n = int(sys.argv[1]); deg = int(sys.argv[2]) if len(sys.argv) > 2 else 16
rng = np.random.default_rng(0)
S = sps.csr_matrix((np.ones(n*deg, np.float32),
                    (rng.integers(0, n, n*deg), rng.integers(0, n, n*deg))),
                   shape=(n, n))
S.sum_duplicates()
print(f"n={n} nnz={S.nnz}", flush=True)
t0 = time.perf_counter()
plan = SPR.SpmvRoutePlan(S.indptr, S.indices, S.data, (n, n))
print(f"plan: {time.perf_counter()-t0:.1f}s  T={plan.gp.T} "
      f"rows_pp={plan.gp.rows_pp} R1={plan.gp.R1}", flush=True)
x = jnp.asarray(rng.standard_normal(n).astype(np.float32))

def timeit(f, *args, K=30, tag=""):
    y = f(*args)
    _ = float(np.asarray(jnp.sum(y)))          # compile+sync
    t0 = time.perf_counter()
    for _i in range(K):
        y = f(*args)
    _ = float(np.asarray(jnp.sum(y)))
    dt = (time.perf_counter() - t0) / K
    print(f"{tag}: {dt*1e3:.2f} ms", flush=True)
    return dt

# full pipeline
f_full = jax.jit(lambda v: SPR.spmv_route(v, plan))
dt = timeit(f_full, x, tag="full spmv")
print(f"rate: {S.nnz/dt/1e9:.3f} Gnnz/s (wall, incl dispatch)", flush=True)

# correctness
y = np.asarray(f_full(x))
want = S.astype(np.float64) @ np.asarray(x).astype(np.float64)
err = np.abs(y - want).max() / (np.abs(want).max() + 1e-30)
print(f"relerr: {err:.2e}", flush=True)

# stages
f_gather = jax.jit(lambda v: SPR.gather_products(v, plan.g))
timeit(f_gather, x, tag="gather")

gp = plan.gp
T2, R1, R2, rows_pp = gp.T, gp.R1, gp.R2, gp.rows_pp
prods = f_gather(x)
N_dst = T2 * SRT.TILE_R * 128
pf = jnp.pad(prods.reshape(-1), (0, N_dst - prods.size)).reshape(-1, 128)

k1 = functools.partial(SRT._phase_kernel, dists=gp.dists1, R=R1,
                       rows_in=SRT.TILE_R, rows_out=T2 * rows_pp)
cp = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
phase1 = pl.pallas_call(
    k1, grid=(T2,),
    in_specs=[pl.BlockSpec((SRT.TILE_R, 128), lambda t: (t, 0),
                           memory_space=pltpu.VMEM)] +
             [pl.BlockSpec((R1, 128), lambda t: (t, 0),
                           memory_space=pltpu.VMEM)] * 3,
    out_specs=pl.BlockSpec((T2 * rows_pp, 128), lambda t: (t, 0),
                           memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((T2 * T2 * rows_pp, 128), jnp.float32),
    compiler_params=cp)

def run_p1(v):
    with jax.enable_x64(False):
        return phase1(v, gp.ii1, gp.bits1, gp.io1)
f_p1 = jax.jit(run_p1)
timeit(f_p1, pf, tag="phase1")

mid = f_p1(pf)
mid4 = mid.reshape(T2, T2, rows_pp, 128)
k2 = functools.partial(SPR._phase2ext_kernel, dists=gp.dists2, R=R2,
                       rows_in=T2 * rows_pp, YT_ROWS=plan.YT_ROWS)
phase2 = pl.pallas_call(
    k2, grid=(T2,),
    in_specs=[pl.BlockSpec((T2, 1, rows_pp, 128), lambda t: (0, t, 0, 0),
                           memory_space=pltpu.VMEM)] +
             [pl.BlockSpec((R2, 128), lambda t: (t, 0),
                           memory_space=pltpu.VMEM)] * 3 +
             [pl.BlockSpec((SRT.TILE_R, 128), lambda t: (t, 0),
                           memory_space=pltpu.VMEM)] * 3,
    out_specs=pl.BlockSpec((plan.YT_ROWS, 128), lambda t: (t, 0),
                           memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((T2 * plan.YT_ROWS, 128), jnp.float32),
    compiler_params=cp)

def run_p2(v):
    with jax.enable_x64(False):
        return phase2(v, gp.ii2, gp.bits2, gp.io2,
                      plan.sel_lidx, plan.sel_bitsU, plan.sel_bitsD)
f_p2 = jax.jit(run_p2)
timeit(f_p2, mid4, tag="phase2")
