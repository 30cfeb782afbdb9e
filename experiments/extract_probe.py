"""Is a (cap,1) lane-extract + broadcast-compare loop fast when the source
is a VMEM-resident (cap,128) block? Compares against the (E,1)-input
microbench rate (1.37 Ge/s)."""
import time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

rng = np.random.default_rng(0)
CAP = 1280
NJ = 128
REPS = 32   # outer repeats of the whole j-loop

def kernel(ce_ref, x_ref, y_ref):
    X = x_ref[:].astype(jnp.bfloat16)
    iota64 = jax.lax.broadcasted_iota(jnp.int32, (CAP, 64), 1).astype(jnp.float32)
    iota128 = jax.lax.broadcasted_iota(jnp.int32, (CAP, 128), 1).astype(jnp.float32)
    dn = (((1,), (0,)), ((), ()))
    def jbody(j, acc):
        ce = ce_ref[:, pl.ds(j, 1)]
        chi = jnp.floor(ce * (1.0/128.0))
        clo = ce - 128.0 * chi
        ohc = jnp.maximum(0.0, 1.0 - jnp.abs(chi - iota64)).astype(jnp.bfloat16)
        t1 = jax.lax.dot_general(ohc, X, dn, preferred_element_type=jnp.float32)
        ohl = jnp.maximum(0.0, 1.0 - jnp.abs(clo - iota128))
        g = jnp.sum(t1 * ohl, axis=1, keepdims=True)
        return acc + jnp.sum(g)
    def rbody(r, acc):
        return jax.lax.fori_loop(0, NJ, jbody, acc)
    y_ref[0, 0] = jax.lax.fori_loop(0, REPS, rbody, 0.0)

ce = jnp.asarray(rng.integers(0, 8192, (CAP, NJ)).astype(np.float32))
x = jnp.asarray(rng.standard_normal((64, 128)).astype(np.float32))
f = pl.pallas_call(kernel,
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
    out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
    out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32))
fj = jax.jit(lambda a, b: f(a, b)[0, 0])
r = float(np.asarray(fj(ce, x)))
t0 = time.perf_counter()
r = float(np.asarray(fj(ce, x)))
dt = time.perf_counter() - t0
ne = CAP * NJ * REPS
print(f"lane-extract gather-half: {dt*1e3:.2f} ms  {ne/(dt-0.0286)/1e9:.3f} Ge/s (adj)")
