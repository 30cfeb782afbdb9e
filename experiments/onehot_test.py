import numpy as np, scipy.sparse as sps
import jax.numpy as jnp
from graphblas_tpu.kernels import spmv_onehot

rng = np.random.default_rng(0)
for (n, m, deg) in [(1000, 900, 5), (16384, 16384, 3), (100000, 80000, 16)]:
    nnz = m * deg
    rows = rng.integers(0, m, nnz); cols = rng.integers(0, n, nnz)
    S = sps.csr_matrix((rng.standard_normal(nnz).astype(np.float32), (rows, cols)), shape=(m, n))
    S.sum_duplicates()
    x = rng.standard_normal(n).astype(np.float32)
    y = spmv_onehot.spmv(jnp.asarray(S.indptr, jnp.int32), jnp.asarray(S.indices, jnp.int32),
                         jnp.asarray(S.data), jnp.asarray(x), m)
    want = S @ x
    err = np.abs(np.asarray(y) - want).max() / (np.abs(want).max() + 1e-30)
    print(f"n={n} m={m} deg={deg}: relerr={err:.2e}", flush=True)
print("DONE")
