"""Does building the one-hots in bf16 arithmetic (inputs < 128, exactly
representable) run faster than f32? Measures the gather half."""
import time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

E = 1280
REPS = 16384

def mk(bf16):
    dt = jnp.bfloat16 if bf16 else jnp.float32
    def kernel(hi_ref, x_ref, y_ref):
        X = x_ref[:].astype(jnp.bfloat16)
        iota = jax.lax.broadcasted_iota(jnp.int32, (64, E), 0).astype(dt)
        h0 = hi_ref[:].astype(dt)
        dg = (((0,), (0,)), ((), ()))
        def body(r, acc):
            h = h0 + (r & 1).astype(dt)
            oh = jnp.maximum(dt(0), dt(1) - jnp.abs(h - iota)).astype(jnp.bfloat16)
            t1 = jax.lax.dot_general(X, oh, dg, preferred_element_type=jnp.float32)
            return acc + t1[0:64, 0:128]
        y_ref[:] = jax.lax.fori_loop(0, REPS, body, jnp.zeros((64,128), jnp.float32))
    rng = np.random.default_rng(0)
    hi = jnp.asarray(rng.integers(0,64,(1,E)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((64,128)).astype(np.float32))
    f = pl.pallas_call(kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((64,128), jnp.float32))
    return jax.jit(lambda a,b: jnp.sum(f(a,b))), (hi, x)

for bf16 in (False, True):
    fj, args = mk(bf16)
    r = float(np.asarray(fj(*args)))
    t0 = time.perf_counter()
    r = float(np.asarray(fj(*args)))
    dt_ = time.perf_counter()-t0
    print(f"bf16={bf16}: {dt_*1e3:8.2f} ms  {E*REPS/(dt_-0.0286)/1e9:6.2f} Ge/s")
