"""global_permute on the real chip: correctness + rate at ~2M elements."""
import time
import numpy as np
import jax, jax.numpy as jnp
from graphblas_tpu.kernels import static_route as SRT

rng = np.random.default_rng(0)
T = 8
n = T * SRT.TILE_R * 128 - 1234
perm = rng.permutation(n)
print(f"n={n} ({n/1e6:.2f}M), planning...")
t0 = time.perf_counter()
plan = SRT.GlobalPermutePlan(perm, n)
print(f"plan: {time.perf_counter()-t0:.1f}s  T={plan.T} rows_pp={plan.rows_pp} R1={plan.R1}")
x = rng.standard_normal(n).astype(np.float32)
xj = jnp.asarray(x)
out = np.asarray(SRT.global_permute(xj, plan))
print("TPU correct:", (out == x[perm]).all())

# rate: time repeated applications (chained: permute the permuted)
@jax.jit
def chained(xj, *arrs):
    import functools
    # rebuild closure arrays via plan (captured); just run 20x
    def body(i, v):
        return SRT.global_permute(v, plan)
    return jnp.sum(jax.lax.fori_loop(0, 20, body, xj))

with jax.enable_x64(False):
    r = float(np.asarray(chained(xj)))
    t0 = time.perf_counter()
    r = float(np.asarray(chained(xj)))
    dt = (time.perf_counter() - t0) / 20
print(f"global_permute: {dt*1e3:.2f} ms for {n/1e6:.2f}M elems "
      f"-> {n/dt/1e9:.2f} Gelem/s")
