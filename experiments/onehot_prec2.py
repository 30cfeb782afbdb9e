import numpy as np, scipy.sparse as sps
import jax.numpy as jnp
from graphblas_tpu.kernels import spmv_onehot

rng = np.random.default_rng(0)
n = m = 16384; deg = 3
nnz = m * deg
rows = rng.integers(0, m, nnz); cols = rng.integers(0, n, nnz)
# bf16-exact values: small integers
data = rng.integers(1, 8, nnz).astype(np.float32)
S = sps.csr_matrix((data, (rows, cols)), shape=(m, n))
S.sum_duplicates()
x = rng.integers(-4, 5, n).astype(np.float32)
y = np.asarray(spmv_onehot.spmv(jnp.asarray(S.indptr, jnp.int32), jnp.asarray(S.indices, jnp.int32),
               jnp.asarray(S.data), jnp.asarray(x), m))
want = (S.astype(np.float64) @ x.astype(np.float64))
err = np.abs(y - want)
print("INT test: max abs err:", err.max(), " nonzero-err rows:", (err > 0).sum())
