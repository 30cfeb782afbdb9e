import time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

rng = np.random.default_rng(0)
E = 1280
REPS = 64

def run(kernel, args, outshape, label):
    f = pl.pallas_call(kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*len(args),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(outshape, jnp.float32))
    fj = jax.jit(lambda *a: jnp.sum(f(*a)))
    try:
        r = float(np.asarray(fj(*args)))
    except Exception as e:
        print(f"{label}: FAIL {str(e)[:80]}")
        return
    t0 = time.perf_counter()
    for _ in range(3):
        r = float(np.asarray(fj(*args)))
    dt = (time.perf_counter()-t0)/3
    print(f"{label}: {dt*1e3:9.3f} ms ({dt*1e6/REPS:8.1f} us/iter)")

hi = jnp.asarray(rng.integers(0,64,(E,1)).astype(np.float32))
x = jnp.asarray(rng.standard_normal((64,128)).astype(np.float32))
val = jnp.asarray(rng.standard_normal((E,1)).astype(np.float32))
hiw = jnp.asarray(rng.integers(0,64,(E,128)).astype(np.float32))

def kA(hi_ref, y_ref):
    def body(r, acc):
        iota = jax.lax.broadcasted_iota(jnp.int32, (E,64), 1).astype(jnp.float32)
        oh = jnp.maximum(0.0, 1.0 - jnp.abs((hi_ref[:]+r) - iota))
        return acc + jnp.sum(oh)
    y_ref[0,0] = jax.lax.fori_loop(0, REPS, body, 0.0)
run(kA, (hi,), (1,1), "A onehot(E,1)->(E,64) build only")

def kA2(hiw_ref, y_ref):
    def body(r, acc):
        iota = jax.lax.broadcasted_iota(jnp.int32, (E,128), 1).astype(jnp.float32)
        oh = jnp.maximum(0.0, 1.0 - jnp.abs((hiw_ref[:]+r) - iota))
        return acc + jnp.sum(oh)
    y_ref[0,0] = jax.lax.fori_loop(0, REPS, body, 0.0)
run(kA2, (hiw,), (1,1), "A2 onehot (E,128) no-broadcast  ")

def kB(hi_ref, x_ref, y_ref):
    X = x_ref[:].astype(jnp.bfloat16)
    def body(r, acc):
        iota = jax.lax.broadcasted_iota(jnp.int32, (E,64), 1).astype(jnp.float32)
        oh = jnp.maximum(0.0, 1.0 - jnp.abs((hi_ref[:]+r) - iota)).astype(jnp.bfloat16)
        t1 = jax.lax.dot_general(oh, X, dimension_numbers=(((1,),(0,)),((),())),
                                 preferred_element_type=jnp.float32)
        return acc + t1[0:64, :]
    y_ref[:] = jax.lax.fori_loop(0, REPS, body, jnp.zeros((64,128), jnp.float32))
run(kB, (hi, x), (64,128), "B onehot+matmul                 ")

def kC(hiw_ref, y_ref):
    def body(r, acc):
        g = jnp.sum(hiw_ref[:] * (hiw_ref[:]+r), axis=1, keepdims=True)
        return acc + jnp.sum(g)
    y_ref[0,0] = jax.lax.fori_loop(0, REPS, body, 0.0)
run(kC, (hiw,), (1,1), "C lane-reduce (E,128)->(E,1)    ")

def kD(hi_ref, y_ref):
    def body(r, acc):
        b = jnp.broadcast_to(hi_ref[:], (E,128)) + r
        return acc + jnp.sum(b)
    y_ref[0,0] = jax.lax.fori_loop(0, REPS, body, 0.0)
run(kD, (hi,), (1,1), "D broadcast (E,1)->(E,128) only ")
