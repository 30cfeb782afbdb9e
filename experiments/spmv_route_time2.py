"""Engine SpMV steady-state timing without a giant chained jit: queue K
async dispatches back-to-back and sync once (dispatch is async; kernels
serialize on device)."""
import sys, time
import numpy as np
import scipy.sparse as sps
import jax, jax.numpy as jnp
from graphblas_tpu.kernels import spmv_route as SPR

n = int(sys.argv[1]); deg = 16
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
print(f"plan: {time.perf_counter()-t0:.1f}s", flush=True)
x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
y = SPR.spmv_route(x, plan)
print("compiled; sync:", float(jnp.sum(y)), flush=True)
f = jax.jit(lambda v: SPR.spmv_route(v, plan))
yy = f(x)
print("jitted once; sync:", float(np.asarray(jnp.sum(yy))), flush=True)
K = 30
t0 = time.perf_counter()
for _ in range(K):
    yy = f(x)
sres = float(np.asarray(jnp.sum(yy)))
dt = (time.perf_counter() - t0) / K
print(f"per-call (incl ~29ms dispatch): {dt*1e3:.2f} ms", flush=True)
# subtracting the measured dispatch floor gives the kernel-time bound
kt = dt - 0.0286
print(f"est kernel: {kt*1e3:.2f} ms/SpMV -> {S.nnz/kt/1e9:.3f} Gnnz/s",
      flush=True)
