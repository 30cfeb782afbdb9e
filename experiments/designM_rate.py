import time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

rng = np.random.default_rng(0)
E = 1280
REPS = 4096

def kernel(hi_ref, lo_ref, rhi_ref, rlo_ref, val_ref, x_ref, y_ref):
    X = x_ref[:].astype(jnp.bfloat16)
    iota64 = jax.lax.broadcasted_iota(jnp.int32, (E, 64), 1).astype(jnp.float32)
    iota128 = jax.lax.broadcasted_iota(jnp.int32, (E, 128), 1).astype(jnp.float32)
    lo = lo_ref[:]; rhi = rhi_ref[:]; rlo = rlo_ref[:]; val = val_ref[:]
    ohl = jnp.maximum(0.0, 1.0 - jnp.abs(lo - iota128))
    ohr = jnp.maximum(0.0, 1.0 - jnp.abs(rhi - iota64)).astype(jnp.bfloat16)
    ohrl = jnp.maximum(0.0, 1.0 - jnp.abs(rlo - iota128))
    def body(r, acc):
        hi = jnp.mod(hi_ref[:] + r, 64.0)
        ohc = jnp.maximum(0.0, 1.0 - jnp.abs(hi - iota64)).astype(jnp.bfloat16)
        t1 = jax.lax.dot_general(ohc, X,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        g = jnp.sum(t1 * ohl, axis=1, keepdims=True)
        prod = g * val
        pb = (ohrl * prod).astype(jnp.bfloat16)
        y2 = jax.lax.dot_general(ohr, pb,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return acc + y2
    y_ref[:] = jax.lax.fori_loop(0, REPS, body, jnp.zeros((64,128), jnp.float32))

hi = jnp.asarray(rng.integers(0,64,(E,1)).astype(np.float32))
lo = jnp.asarray(rng.integers(0,128,(E,1)).astype(np.float32))
rhi = jnp.asarray(rng.integers(0,64,(E,1)).astype(np.float32))
rlo = jnp.asarray(rng.integers(0,128,(E,1)).astype(np.float32))
val = jnp.asarray(rng.standard_normal((E,1)).astype(np.float32))
x = jnp.asarray(rng.standard_normal((64,128)).astype(np.float32))

f = pl.pallas_call(kernel,
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*6,
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((64,128), jnp.float32))
fj = jax.jit(lambda *a: jnp.sum(f(*a)))
args = (hi, lo, rhi, rlo, val, x)
r = float(np.asarray(fj(*args)))
t0 = time.perf_counter()
r = float(np.asarray(fj(*args)))
dt = time.perf_counter()-t0
print(f"designM full (reps={REPS}): {dt*1e3:.2f} ms -> "
      f"{E*REPS/(dt-0.0286)/1e9:.3f} Ge/s (overhead-adj)")
