"""Compile + time the Pallas SpMV on the real TPU vs the XLA path."""

import time

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sps

import graphblas_tpu as gb
from graphblas_tpu.kernels import segment as K
from graphblas_tpu.kernels import spmv_pallas as SP

ITERS = 30


def chain_time(fn, x0, label, nnz):
    @jax.jit
    def loop(x):
        def body(i, x):
            return fn(x) * jnp.float32(0.125)
        return jnp.sum(jax.lax.fori_loop(0, ITERS, body, x))

    s = float(np.asarray(loop(x0)))
    t0 = time.perf_counter()
    s = float(np.asarray(loop(x0)))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{label:16s}: {dt*1e3:8.2f} ms  {nnz/dt/1e9:7.3f} Gnnz/s "
          f"(checksum {s:.3e})", flush=True)
    return dt


def main():
    n = 1 << 20
    deg = 16
    rng = np.random.default_rng(0)
    S = sps.csr_matrix(
        (np.ones(n * deg, np.float32),
         (rng.integers(0, n, n * deg), rng.integers(0, n, n * deg))),
        shape=(n, n))
    S.sum_duplicates()
    nnz = S.nnz
    print(f"n={n} nnz={nnz}")
    A = gb.Matrix.from_scipy(S)
    indptr, indices, values = A.indptr, A.indices, A.values
    x0 = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    rows = K.expand_rowids(indptr, nnz, n)

    def xla_spmv(x):
        return jax.ops.segment_sum(values * x[indices], rows, n,
                                   indices_are_sorted=True)
    chain_time(xla_spmv, x0, "xla segsum", nnz)

    def xla_scatter(x):
        return jnp.zeros(n, jnp.float32).at[rows].add(values * x[indices])
    chain_time(xla_scatter, x0, "xla scatter", nnz)

    p = SP.plan_for(indptr, indices, values, n)
    print(f"plan: nb={p.nb} cap={p.cap} pad_ratio={p.nb*p.cap/nnz:.2f}",
          flush=True)

    def pallas_spmv(x):
        return SP.spmv(indptr, indices, values, x, n)
    chain_time(pallas_spmv, x0, "pallas sliced-ELL", nnz)

    # correctness spot check
    y1 = np.asarray(xla_spmv(x0))
    y2 = np.asarray(pallas_spmv(x0))
    print("max err pallas vs xla:", np.abs(y1 - y2).max())


if __name__ == "__main__":
    main()
