"""Solo re-measurement of the data-movement rows with per-stage syncs
(run with nothing else on the host CPU)."""
import time

import numpy as np
import scipy.sparse as sps


def sync(x):
    import jax
    for leaf in jax.tree_util.tree_leaves(x):
        if hasattr(leaf, "ravel") and getattr(leaf, "size", 0):
            np.asarray(leaf.ravel()[:1])
            break


def stage(name, f, reps=3):
    sync(f())
    t0 = time.perf_counter()
    for _ in range(reps):
        sync(f())
    print(f"{name}: {(time.perf_counter()-t0)/reps*1e3:8.1f} ms", flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import graphblas_tpu as gb
    from graphblas_tpu.core.matrix import ROW, SPARSE
    from graphblas_tpu.core import semiring as SR
    from graphblas_tpu.algorithms import graph as GALG
    from graphblas_tpu.ops.transpose import logical_transpose

    gb.init()
    n = 1 << 20
    deg = 16
    rng = np.random.default_rng(0)
    S = sps.csr_matrix(
        (np.ones(n * deg, np.float32),
         (rng.integers(0, n, n * deg), rng.integers(0, n, n * deg))),
        shape=(n, n))
    S.sum_duplicates()
    A = gb.Matrix.from_scipy(S)
    At_log = logical_transpose(A)
    stage("transpose", lambda: At_log.to_format(SPARSE, ROW).values)
    At2 = At_log.to_format(SPARSE, ROW)
    stage("ewiseadd", lambda: gb.ewise_add(A, At2, gb.operators.PLUS).values)
    P = np.random.default_rng(42).permutation(n)
    Q = np.random.default_rng(43).permutation(n)
    stage("extract_perm", lambda: gb.extract(A, P, Q).values, reps=2)
    t0 = time.perf_counter()
    nt = GALG.triangle_count(A)
    print(f"tc cold-ish: {time.perf_counter()-t0:.2f} s ntri={nt}", flush=True)
    t0 = time.perf_counter()
    nt = GALG.triangle_count(A)
    print(f"tc warm:     {time.perf_counter()-t0:.2f} s", flush=True)
    t0 = time.perf_counter()
    nt = GALG.triangle_count(A)
    print(f"tc warm2:    {time.perf_counter()-t0:.2f} s", flush=True)


if __name__ == "__main__":
    main()
