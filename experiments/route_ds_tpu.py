"""fp64 double-single route executor on TPU at bench scale (n=2^20,
deg=16): rate vs the f32 engine and accuracy vs numpy f64."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import scipy.sparse as sps

from graphblas_tpu.kernels import spmv_route as SPRT

HERE = "/root/repo"
n = 1 << 20
deg = 16
rng = np.random.default_rng(0)
S = sps.csr_matrix(
    (np.ones(n * deg, np.float32),
     (rng.integers(0, n, n * deg), rng.integers(0, n, n * deg))),
    shape=(n, n))
S.sum_duplicates()
nnz = S.nnz
vals = rng.standard_normal(nnz)          # f64
S64 = sps.csr_matrix((vals, S.indices, S.indptr), shape=(n, n))

plan_path = os.path.join(HERE, ".bench_plan_ds.npz")
t0 = time.perf_counter()
plan = None
if os.path.exists(plan_path):
    try:
        plan = SPRT.load_plan(plan_path)
        if plan.m != n or plan.g.nnz != nnz or plan.g.val_lo is None:
            plan = None
    except Exception:
        plan = None
if plan is None:
    plan = SPRT.SpmvRoutePlan(S64.indptr, S64.indices, S64.data, (n, n))
    SPRT.save_plan(plan, plan_path)
print("plan: %.1fs" % (time.perf_counter() - t0), flush=True)
plan = SPRT.plan_to_device(plan)

x = rng.standard_normal(n)
xd = jnp.asarray(x)
K = 30


@jax.jit
def chained(v, pln):
    def body(i, acc):
        return SPRT.spmv_route_ds(acc, pln) * (1.0 / deg)
    return jax.lax.fori_loop(0, K, body, v)


t0 = time.perf_counter()
y1 = SPRT.spmv_route_ds(xd, plan)
_ = float(np.asarray(jnp.sum(y1)))
print("single (compile+run): %.2fs" % (time.perf_counter() - t0),
      flush=True)
# accuracy
want = S64 @ x
Sa = S64.copy()
Sa.data = np.abs(Sa.data)
scale = np.maximum(Sa @ np.abs(x), 1e-30)
serr = (np.abs(np.asarray(y1) - want) / scale).max()
print("scaled err vs f64: %.3e" % serr, flush=True)

y = chained(xd, plan)
_ = float(np.asarray(jnp.sum(y)))
t0 = time.perf_counter()
y = chained(xd, plan)
_ = float(np.asarray(jnp.sum(y)))
dt = (time.perf_counter() - t0 - 0.0286) / K
print("fp64 ds spmv: %.4f ms  %.3f Gnnz/s" % (dt * 1e3, nnz / dt / 1e9),
      flush=True)
