"""Profile triangle-count + SpGEMM scale behavior (round-4 ask #1).

Runs TC at n in {2^18, 2^19, 2^20} with GB_SELL_DEBUG=1 stage timers,
cold then warm, printing the per-stage breakdown so the superlinear
term is attributable.  Usage:
    GB_SELL_DEBUG=1 PYTHONPATH=/root/repo python experiments/prof_tc.py [logn...]
"""
import os
import sys
import time

import numpy as np


def main():
    import graphblas_tpu as gb
    import scipy.sparse as sps
    from graphblas_tpu.algorithms import graph as GALG

    gb.init()
    logns = [int(a) for a in sys.argv[1:]] or [18, 19, 20]
    deg = 16
    for logn in logns:
        n = 1 << logn
        rng = np.random.default_rng(0)
        S = sps.csr_matrix(
            (np.ones(n * deg, np.float32),
             (rng.integers(0, n, n * deg), rng.integers(0, n, n * deg))),
            shape=(n, n))
        S.sum_duplicates()
        A = gb.Matrix.from_scipy(S)
        print(f"==== n=2^{logn} nnz={S.nnz} ====", flush=True)
        t0 = time.perf_counter()
        ntri = GALG.triangle_count(A)
        t_cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        ntri2 = GALG.triangle_count(A)
        t_warm = time.perf_counter() - t0
        print(f"TC n=2^{logn}: cold={t_cold:.2f}s warm={t_warm:.2f}s "
              f"ntri={ntri}", flush=True)
        if os.environ.get("PROF_SPGEMM"):
            from graphblas_tpu.core import semiring as SR
            t0 = time.perf_counter()
            C = gb.mxm(A, A, SR.PLUS_TIMES)
            cnnz = int(C.nvals)
            t_cold = time.perf_counter() - t0
            t0 = time.perf_counter()
            C = gb.mxm(A, A, SR.PLUS_TIMES)
            cnnz = int(C.nvals)
            t_warm = time.perf_counter() - t0
            print(f"SpGEMM n=2^{logn}: cold={t_cold:.2f}s "
                  f"warm={t_warm:.2f}s cnnz={cnnz}", flush=True)


if __name__ == "__main__":
    main()
