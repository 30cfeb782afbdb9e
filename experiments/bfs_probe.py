"""Localize the fused-BFS slowdown (BENCH_ALL r2: 4.9s/8 levels while one
routed SpMV is 4.4ms).  Times, on the real chip, with the plan
device-resident: (a) K-chained routed SpMV, (b) one jitted BFS body level
K-chained, (c) the full bfs_levels_fused call, (d) pagerank_fused.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u experiments/bfs_probe.py
"""

import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

SYNC_FLOOR_S = 0.0286


def sync(x):
    import jax.numpy as jnp
    return float(np.asarray(jnp.sum(x)))


def main():
    import jax
    import jax.numpy as jnp
    import scipy.sparse as sps

    import graphblas_tpu as gb
    from graphblas_tpu.algorithms import graph as GALG
    from graphblas_tpu.kernels import spmv_route as SPRT

    gb.init()
    n = 1 << 20
    deg = 16
    rng = np.random.default_rng(0)
    S = sps.csr_matrix(
        (np.ones(n * deg, np.float32),
         (rng.integers(0, n, n * deg), rng.integers(0, n, n * deg))),
        shape=(n, n))
    S.sum_duplicates()
    nnz = S.nnz
    print(f"n={n} nnz={nnz}", flush=True)

    A = gb.Matrix.from_scipy(S)
    At = A.to_format(gb.SPARSE, gb.COL)
    tplan_path = os.path.join(HERE, ".bench_plan_t.npz")
    t0 = time.perf_counter()
    tplan = None
    if os.path.exists(tplan_path):
        try:
            tplan = SPRT.load_plan(tplan_path)
            if tplan.g.nnz != nnz:
                tplan = None
        except Exception:
            tplan = None
    if tplan is None:
        ip = np.asarray(At.indptr)
        ix = np.asarray(At.indices)
        tplan = SPRT.SpmvRoutePlan(ip, ix, np.ones(nnz, np.float32), (n, n))
        SPRT.save_plan(tplan, tplan_path)
    print(f"plan ready {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    tplan = SPRT.plan_to_device(tplan)
    sync(tplan.g.val)
    print(f"plan device_put {time.perf_counter()-t0:.1f}s", flush=True)
    GALG._pattern_plans.clear()
    GALG._pattern_plans[(id(At.indptr), id(At.indices), At.shape)] = (
        At.indptr, At.indices, tplan)

    K = 50

    # (a) chained routed SpMV
    @jax.jit
    def chained(v, pln):
        def body(i, acc):
            return SPRT.spmv_route(acc, pln) * jnp.float32(1 / 16)
        return jax.lax.fori_loop(0, K, body, v)

    x0 = jnp.asarray((rng.standard_normal(n) * 1e-3).astype(np.float32))
    sync(chained(x0, tplan))
    t0 = time.perf_counter(); sync(chained(x0, tplan))
    dt = (time.perf_counter() - t0 - SYNC_FLOOR_S) / K
    print(f"(a) routed SpMV: {dt*1e3:.2f} ms/iter = {nnz/dt/1e9:.2f} Gnnz/s",
          flush=True)

    # (b) chained BFS body (kernel + elementwise, fixed K levels)
    @jax.jit
    def bfs_body_chained(levels, f, pln):
        def body(i, state):
            levels, f = state
            nxt = (SPRT.spmv_route(f, pln) > 0) & (levels < 0)
            levels = jnp.where(nxt, i + 1, levels)
            return levels, nxt.astype(jnp.float32)
        return jax.lax.fori_loop(0, K, body, (levels, f))

    lv0 = jnp.full((n,), jnp.int32(-1)).at[0].set(0)
    f0 = jnp.zeros((n,), jnp.float32).at[0].set(1.0)
    out = bfs_body_chained(lv0, f0, tplan); sync(out[0])
    t0 = time.perf_counter(); out = bfs_body_chained(lv0, f0, tplan)
    sync(out[0])
    dt = (time.perf_counter() - t0 - SYNC_FLOOR_S) / K
    print(f"(b) BFS body (fori): {dt*1e3:.2f} ms/level", flush=True)

    # (c) full fused BFS (while_loop, dynamic levels)
    lv = GALG.bfs_levels_fused(At, 0)
    nlv = int(np.asarray(lv).max()) + 1
    t0 = time.perf_counter()
    lv = GALG.bfs_levels_fused(At, 0)
    _ = int(np.asarray(lv).max())
    dt = time.perf_counter() - t0 - SYNC_FLOOR_S
    print(f"(c) bfs_levels_fused: {dt:.3f} s total, {nlv} levels, "
          f"{dt/nlv*1e3:.1f} ms/level", flush=True)

    # (d) pagerank_fused 20 iters
    r, it = GALG.pagerank_fused(At, tol=0.0, max_iter=20)
    sync(r)
    t0 = time.perf_counter()
    r, it = GALG.pagerank_fused(At, tol=0.0, max_iter=20)
    sync(r)
    dt = (time.perf_counter() - t0 - SYNC_FLOOR_S) / 20
    print(f"(d) pagerank_fused: {dt*1e3:.2f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
