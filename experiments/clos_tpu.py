"""tile_permute on the real chip: correctness + rate."""
import time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from graphblas_tpu.kernels import static_route as SRT

rng = np.random.default_rng(0)
R, L = 512, 128
N = R * L
perm = rng.permutation(N)
idx_in, dists, bits, idx_out = SRT.clos_route(perm, R, L)
x = rng.standard_normal((R, L)).astype(np.float32)

out = np.asarray(SRT.tile_permute(jnp.asarray(x), (idx_in, dists, bits, idx_out)))
want = x.reshape(-1)[perm].reshape(R, L)
print("tile_permute on TPU correct:", (out == want).all())

# rate: REPS applications inside one kernel
REPS = 2048
dists_t = tuple(int(d) for d in dists)
def kernel(x_ref, ii_ref, bits_ref, io_ref, y_ref):
    ii = ii_ref[:]; bt = bits_ref[:]; io = io_ref[:]
    def body(r, x):
        x1 = jnp.take_along_axis(x, ii, axis=1)
        x2 = SRT._benes_stages(x1, bt, dists_t, R)
        return jnp.take_along_axis(x2, io, axis=1)
    y_ref[:] = jax.lax.fori_loop(0, REPS, body, x_ref[:])
f = pl.pallas_call(kernel,
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*4,
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((R, L), jnp.float32))
import contextlib
ctx = jax.enable_x64(False)
ctx.__enter__()
fj = jax.jit(lambda *a: jnp.sum(f(*a)))
args = (jnp.asarray(x), jnp.asarray(idx_in), jnp.asarray(bits), jnp.asarray(idx_out))
r = float(np.asarray(fj(*args)))
t0 = time.perf_counter()
r = float(np.asarray(fj(*args)))
dt = time.perf_counter() - t0
print(f"tile_permute rate: {N*REPS/(dt-0.0286)/1e9:.2f} Gelem/s "
      f"(full arbitrary {R}x{L} permutation per element)")
