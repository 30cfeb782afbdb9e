import time, sys
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

rng = np.random.default_rng(0)

def timeit(fj, args, label, work):
    r = float(np.asarray(fj(*args)))
    t0 = time.perf_counter()
    r = float(np.asarray(fj(*args)))
    dt = time.perf_counter()-t0
    print(f"{label}: {dt*1e3:10.2f} ms  -> {work/dt/1e9:9.2f} G/s", flush=True)

E, S = 1280, 512

# 0) empty-ish kernel: overhead floor
def k0(x_ref, y_ref):
    y_ref[:] = x_ref[:] * 2.0
x0 = jnp.ones((8,128), jnp.float32)
f0 = pl.pallas_call(k0,
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((8,128), jnp.float32))
timeit(jax.jit(lambda a: jnp.sum(f0(a))), (x0,), "overhead floor            ", 1)

REPS = 1 << 18   # 262144
# 1) dim1 gather heavy
tab = jnp.asarray(rng.standard_normal((S,128)).astype(np.float32))
idx = jnp.asarray(rng.integers(0,128,(S,128)).astype(np.int32))
def k1(tab_ref, idx_ref, y_ref):
    t = tab_ref[:]; i0 = idx_ref[:]
    def body(r, acc):
        return acc + jnp.take_along_axis(t, (i0 + r) & 127, axis=1)
    y_ref[:] = jax.lax.fori_loop(0, REPS, body, jnp.zeros((S,128), jnp.float32))
f1 = pl.pallas_call(k1,
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((S,128), jnp.float32))
timeit(jax.jit(lambda a,b: jnp.sum(f1(a,b))), (tab,idx),
       f"dim1 gather S={S} reps={REPS}", S*128*REPS)

# 2) roll+select heavy
def k2(tab_ref, idx_ref, y_ref):
    m = idx_ref[:]
    def body(r, x):
        return jnp.where(m > (r & 63), pltpu.roll(x, 8, 0), x)
    y_ref[:] = jax.lax.fori_loop(0, REPS, body, tab_ref[:])
f2 = pl.pallas_call(k2,
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((S,128), jnp.float32))
timeit(jax.jit(lambda a,b: jnp.sum(f2(a,b))), (tab,idx),
       f"roll+select S={S} reps={REPS}", S*128*REPS)

# 3) onehot build + matmul heavy (Design M gather half)
R3 = 1 << 14
hi = jnp.asarray(rng.integers(0,64,(E,1)).astype(np.float32))
x64 = jnp.asarray(rng.standard_normal((64,128)).astype(np.float32))
def k3(hi_ref, x_ref, y_ref):
    X = x_ref[:].astype(jnp.bfloat16)
    h0 = hi_ref[:]
    iota = jax.lax.broadcasted_iota(jnp.int32, (E,64), 1).astype(jnp.float32)
    def body(r, acc):
        oh = jnp.maximum(0.0, 1.0 - jnp.abs((h0 + (r & 31)) - iota)).astype(jnp.bfloat16)
        t1 = jax.lax.dot_general(oh, X, dimension_numbers=(((1,),(0,)),((),())),
                                 preferred_element_type=jnp.float32)
        return acc + t1[0:64, :]
    y_ref[:] = jax.lax.fori_loop(0, R3, body, jnp.zeros((64,128), jnp.float32))
f3 = pl.pallas_call(k3,
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((64,128), jnp.float32))
timeit(jax.jit(lambda a,b: jnp.sum(f3(a,b))), (hi,x64),
       f"onehot+matmul E={E} reps={R3}", E*R3)
