"""Benchmark: SpMV (plus-times, fp32) throughput on the real TPU chip.

Metric: Gnnz/s on a uniform-random graph (n=2^20, avg degree 16, ~16.7M
edges) — the y=S*x headline workload of the reference
(GraphBLAS/demo/benchmark/dobench_results.txt).  Baseline anchor: the
reference does GAP-twitter SpMV at 0.61 Gnnz/s on a 20-core Xeon E5-2698 v4
(BASELINE.md), so vs_baseline = our_gnnz_per_s / 0.61.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

BASELINE_GNNZ_S = 0.61  # reference SpMV on 20-core Xeon (BASELINE.md)


def main():
    import jax
    import jax.numpy as jnp
    import graphblas_tpu as gb
    from graphblas_tpu.kernels import segment as K

    n = 1 << 20
    deg = 16
    rng = np.random.default_rng(0)
    rows = rng.integers(0, n, n * deg).astype(np.int32)
    cols = rng.integers(0, n, n * deg).astype(np.int32)
    import scipy.sparse as sps
    S = sps.csr_matrix((np.ones(n * deg, np.float32), (rows, cols)),
                       shape=(n, n))
    S.sum_duplicates()
    nnz = S.nnz

    A = gb.Matrix.from_scipy(S)
    Ar = A.to_orient(gb.ROW)
    indptr = Ar.indptr
    indices = Ar.indices
    values = Ar.values
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    @jax.jit
    def spmv(indptr, indices, values, x):
        rws = K.expand_rowids(indptr, nnz, n)
        return jax.ops.segment_sum(values * x[indices], rws, n,
                                   indices_are_sorted=True)

    # warmup / compile
    y = spmv(indptr, indices, values, x)
    y.block_until_ready()

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        y = spmv(indptr, indices, values, y / jnp.float32(deg))
    y.block_until_ready()
    dt = (time.perf_counter() - t0) / iters

    gnnz = nnz / dt / 1e9
    print(json.dumps({
        "metric": "spmv_plus_times_fp32_gnnz_per_s",
        "value": round(gnnz, 4),
        "unit": "Gnnz/s",
        "vs_baseline": round(gnnz / BASELINE_GNNZ_S, 3),
    }))


if __name__ == "__main__":
    main()
