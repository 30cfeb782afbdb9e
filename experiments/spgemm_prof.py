"""Profile the fast SpGEMM tier stage-by-stage at a scaled-down version
of the bench config (n=2^18, deg=16 -> F ~ 67M products, 1/4 bench)."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
os.environ.setdefault("GB_SPGEMM_DEBUG", "1")

import jax
import jax.numpy as jnp
import scipy.sparse as sps

import graphblas_tpu as gb
from graphblas_tpu.core import semiring as SR
from graphblas_tpu.core.matrix import ROW, SPARSE, Matrix

gb.init()
n = 1 << int(os.environ.get("LOGN", 18))
deg = 16
rng = np.random.default_rng(0)
S = sps.csr_matrix(
    (np.ones(n * deg, np.float32),
     (rng.integers(0, n, n * deg), rng.integers(0, n, n * deg))),
    shape=(n, n))
S.sum_duplicates()
print("n", n, "nnz", S.nnz, "flops~", int((np.diff(S.indptr)**2).sum()))

A = Matrix.from_scipy(S)
sr = SR.PLUS_TIMES

t0 = time.perf_counter()
C = gb.mxm(A, A, sr)
C.values.block_until_ready()
t1 = time.perf_counter()
print("spgemm total %.2fs  cnnz=%d" % (t1 - t0, int(C.nvals)))
