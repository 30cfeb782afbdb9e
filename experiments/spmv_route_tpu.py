"""Routing-engine SpMV on the real chip: correctness + rate."""
import sys, time
import numpy as np
import scipy.sparse as sps
import jax, jax.numpy as jnp
from graphblas_tpu.kernels import spmv_route as SPR

n = int(sys.argv[1]) if len(sys.argv) > 1 else 100000
deg = int(sys.argv[2]) if len(sys.argv) > 2 else 16
rng = np.random.default_rng(0)
S = sps.csr_matrix((np.ones(n*deg, np.float32),
                    (rng.integers(0, n, n*deg), rng.integers(0, n, n*deg))),
                   shape=(n, n))
S.sum_duplicates()
print(f"n={n} nnz={S.nnz}", flush=True)
t0 = time.perf_counter()
plan = SPR.SpmvRoutePlan(jnp.asarray(S.indptr, jnp.int32),
                         jnp.asarray(S.indices, jnp.int32),
                         jnp.asarray(S.data), (n, n))
print(f"plan: {time.perf_counter()-t0:.1f}s  gather_pad={plan.g.padded_frac:.2f} "
      f"T={plan.T} YT_ROWS={plan.YT_ROWS} route_T={plan.gp.T} "
      f"rows_pp={plan.gp.rows_pp} R1={plan.gp.R1}", flush=True)
x = rng.standard_normal(n).astype(np.float32)
t0 = time.perf_counter()
y = np.asarray(SPR.spmv_route(jnp.asarray(x), plan))
print(f"first run (compile): {time.perf_counter()-t0:.1f}s", flush=True)
want = S.astype(np.float64) @ x.astype(np.float64)
err = np.abs(y - want).max() / np.abs(want).max()
print(f"TPU relerr: {err:.2e}", flush=True)

# rate: chained runs (y has length n == x: feed back)
ITERS = 10
@jax.jit
def chained(xj):
    def body(i, v):
        return SPR.spmv_route(v, plan) * jnp.float32(1.0/deg)
    return jnp.sum(jax.lax.fori_loop(0, ITERS, body, xj))
with jax.enable_x64(False):
    r = float(np.asarray(chained(jnp.asarray(x))))
    t0 = time.perf_counter()
    r = float(np.asarray(chained(jnp.asarray(x))))
    dt = (time.perf_counter()-t0)/ITERS
print(f"spmv_route: {dt*1e3:.2f} ms -> {S.nnz/dt/1e9:.3f} Gnnz/s", flush=True)
