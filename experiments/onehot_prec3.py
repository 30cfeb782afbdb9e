import numpy as np, scipy.sparse as sps
import jax.numpy as jnp
from graphblas_tpu.kernels import spmv_onehot

rng = np.random.default_rng(0)
n = m = 16384; deg = 3
nnz = m * deg
rows = rng.integers(0, m, nnz); cols = rng.integers(0, n, nnz)

def run(data, x, label):
    S = sps.csr_matrix((data, (rows, cols)), shape=(m, n))
    S.sum_duplicates()
    spmv_onehot._plan_cache.clear()
    y = np.asarray(spmv_onehot.spmv(jnp.asarray(S.indptr, jnp.int32),
                   jnp.asarray(S.indices, jnp.int32),
                   jnp.asarray(S.data), jnp.asarray(x), m))
    want = (S.astype(np.float64) @ x.astype(np.float64))
    err = np.abs(y - want).max()
    print(f"{label}: max abs err {err:.3e}")

ones = np.ones(nnz, np.float32)
xr = rng.standard_normal(n).astype(np.float32)
xi = rng.integers(-4, 5, n).astype(np.float32)
vr = rng.standard_normal(nnz).astype(np.float32)
run(ones, xr, "A=1, x random (tests gather precision) ")
run(vr, xi, "A random, x int (tests scatter precision)")
