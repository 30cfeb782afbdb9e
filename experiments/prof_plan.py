"""Profile the SpMV route-plan build (round-4 ask #4: 264.5 s -> <10 s).
GB_PLAN_DEBUG=1 prints per-stage host timers from spmv_route/_dbg."""
import time

import numpy as np
import scipy.sparse as sps


def main():
    import graphblas_tpu as gb
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
    t0 = time.perf_counter()
    plan = SPRT.SpmvRoutePlan(S.indptr, S.indices,
                              S.data.astype(np.float64), (n, n))
    print(f"plan build (f64, n=2^20, nnz={S.nnz}): "
          f"{time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    plan2 = SPRT.SpmvRoutePlan(S.indptr, S.indices, S.data, (n, n))
    print(f"plan build (f32, second run): {time.perf_counter()-t0:.1f}s",
          flush=True)


if __name__ == "__main__":
    main()
