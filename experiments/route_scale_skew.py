"""VERDICT r1 #2 demonstration: route SpMV at n=2^24 with zipf-skewed
columns (GAP-class scale and skew; x streams from HBM in windows)."""
import sys, time
import numpy as np
import scipy.sparse as sps
import jax, jax.numpy as jnp
from graphblas_tpu.kernels import spmv_route as SPR

n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 24
deg = int(sys.argv[2]) if len(sys.argv) > 2 else 8
K = int(sys.argv[3]) if len(sys.argv) > 3 else 20
rng = np.random.default_rng(0)
nnz0 = n * deg
print(f"building graph n={n} nnz~{nnz0/1e6:.0f}M (zipf cols)...", flush=True)
rows = rng.integers(0, n, nnz0)
# zipf-ish skewed columns mapped through a permutation
cols = (rng.zipf(1.5, nnz0) - 1) % n
perm = rng.permutation(n)
cols = perm[cols]
t0 = time.perf_counter()
S = sps.csr_matrix((np.ones(nnz0, np.float32), (rows, cols)), shape=(n, n))
S.sum_duplicates()
print(f"csr built {time.perf_counter()-t0:.0f}s nnz={S.nnz/1e6:.1f}M "
      f"colmax={np.bincount(S.indices).max()} "
      f"rowmax={np.diff(S.indptr).max()}", flush=True)
t0 = time.perf_counter()
cache = f"/tmp/skew_plan_{n}_{deg}.npz"
import os
plan = None
if os.path.exists(cache):
    try:
        plan = SPR.load_plan(cache)
    except Exception:
        plan = None
if plan is None:
    plan = SPR.SpmvRoutePlan(S.indptr, S.indices, S.data, (n, n))
    try:
        SPR.save_plan(plan, cache)
    except Exception:
        pass
print(f"plan: {time.perf_counter()-t0:.0f}s T={plan.gp.T} "
      f"rows_pp={plan.gp.rows_pp} R1={plan.gp.R1} Wv={plan.g.Wv} "
      f"m_sub-m={plan.m_sub-plan.m} "
      f"route_pad={plan.gp.T*plan.gp.R1*128/S.nnz:.2f}x", flush=True)
x = jnp.asarray((rng.standard_normal(n) * 1e-3).astype(np.float32))

@jax.jit
def chained(v, pln):
    def body(i, acc):
        return SPR.spmv_route(acc, pln) * jnp.float32(1e-4)
    return jax.lax.fori_loop(0, K, body, v)

y = chained(x, plan); _ = float(np.asarray(jnp.sum(y)))
print("compiled", flush=True)
for _ in range(2):
    t0 = time.perf_counter()
    y = chained(x, plan)
    _ = float(np.asarray(jnp.sum(y)))
    wall = time.perf_counter() - t0
    per = (wall - 0.0286) / K
    print(f"chained x{K}: {per*1e3:.2f} ms/SpMV = {S.nnz/per/1e9:.3f} Gnnz/s",
          flush=True)
y1 = np.asarray(jax.jit(lambda v, p: SPR.spmv_route(v, p))(x, plan))
want = S.astype(np.float64) @ np.asarray(x).astype(np.float64)
err = np.abs(y1 - want).max() / (np.abs(want).max() + 1e-30)
print(f"relerr: {err:.2e}", flush=True)
