import numpy as np, scipy.sparse as sps
import jax.numpy as jnp
from graphblas_tpu.kernels import spmv_onehot

rng = np.random.default_rng(0)
n = m = 16384; deg = 3
nnz = m * deg
rows = rng.integers(0, m, nnz); cols = rng.integers(0, n, nnz)
S = sps.csr_matrix((rng.standard_normal(nnz).astype(np.float32), (rows, cols)), shape=(m, n))
S.sum_duplicates()
x = rng.standard_normal(n).astype(np.float32)
y = np.asarray(spmv_onehot.spmv(jnp.asarray(S.indptr, jnp.int32), jnp.asarray(S.indices, jnp.int32),
               jnp.asarray(S.data), jnp.asarray(x), m))
want64 = (S.astype(np.float64) @ x.astype(np.float64))
err = np.abs(y - want64)
scale = np.abs(want64).max()
print("max abs err:", err.max(), "scale:", scale)
bad = np.argsort(err)[-8:]
for i in bad:
    print(f"row {i}: got {y[i]:.6f} want {want64[i]:.6f} nnz_row={S.indptr[i+1]-S.indptr[i]}")
print("count err>1e-3:", (err > 1e-3).sum(), "of", m)
