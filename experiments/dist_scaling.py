"""Distributed scaling measurement on the virtual CPU mesh (VERDICT r1
#5e).  Virtual devices share one CPU, so wall time measures overhead, not
speedup; communication VOLUME is the meaningful metric and is computed
from the collective layout.  Prints a markdown table for PARITY.md."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
import time

import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import scipy.sparse as sps

import graphblas_tpu as gb
from graphblas_tpu import parallel as par

n, deg = 1 << 15, 8
rng = np.random.default_rng(0)
S = sps.csr_matrix((np.ones(n * deg, np.float32),
                    (rng.integers(0, n, n * deg),
                     rng.integers(0, n, n * deg))), shape=(n, n))
S.sum_duplicates()
A = gb.Matrix.from_scipy(S)
x = rng.standard_normal(n)

print(f"n={n} nnz={S.nnz}\n")
print("| ndev | mxv wall | vxm wall | bfs wall | mxv comm/dev | "
      "vxm comm/dev | bfs dense lvl | bfs sparse lvl |")
print("|---|---|---|---|---|---|---|---|")
for ndev in (1, 2, 4, 8):
    mesh = par.make_mesh(ndev)
    D = par.DistMatrix.from_matrix(A, mesh)

    def t(f, reps=3):
        f()
        t0 = time.perf_counter()
        for _ in range(reps):
            f()
        return (time.perf_counter() - t0) / reps

    t_mxv = t(lambda: np.asarray(par.dist_mxv(D, x)))
    t_vxm = t(lambda: np.asarray(par.dist_vxm(D, x)))
    t_bfs = t(lambda: np.asarray(par.dist_bfs_levels(D, 0)), reps=1)
    npad = D.ndev * D.rows_per
    gather = (ndev - 1) / ndev * npad * 8      # all_gather fp64 x
    allred = 2 * (ndev - 1) / ndev * npad * 8  # psum(all-reduce) partials
    bfs_dense = 2 * (ndev - 1) / ndev * npad * 4
    fcap = max(D.rows_per // 16, 128)
    bfs_sparse = (ndev - 1) / ndev * ndev * fcap * 4
    print(f"| {ndev} | {t_mxv*1e3:.1f} ms | {t_vxm*1e3:.1f} ms | "
          f"{t_bfs*1e3:.0f} ms | {gather/1e6:.2f} MB | "
          f"{allred/1e6:.2f} MB | {bfs_dense/1e6:.2f} MB | "
          f"{bfs_sparse/1e6:.3f} MB |")
