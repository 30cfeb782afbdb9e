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
        print(f"{label}: FAIL {str(e)[:90]}")
        return
    t0 = time.perf_counter()
    for _ in range(3):
        r = float(np.asarray(fj(*args)))
    dt = (time.perf_counter()-t0)/3
    print(f"{label}: {dt*1e3:9.3f} ms ({dt*1e6/REPS:8.1f} us/iter)")

hi = jnp.asarray(rng.integers(0,64,(E,1)).astype(np.float32))
x = jnp.asarray(rng.standard_normal((64,128)).astype(np.float32))
ohpre = jnp.asarray((rng.integers(0,64,(E,))[:,None] ==
                     np.arange(64)[None,:]).astype(np.float32))

# A: onehot build only, vector out
def kA(hi_ref, y_ref):
    def body(r, acc):
        iota = jax.lax.broadcasted_iota(jnp.int32, (E,64), 1).astype(jnp.float32)
        oh = jnp.maximum(0.0, 1.0 - jnp.abs((hi_ref[:]+r) - iota))
        return acc + oh[0:8, :]
    y_ref[:] = jax.lax.fori_loop(0, REPS, body, jnp.zeros((8,64), jnp.float32))
run(kA, (hi,), (8,64), "A onehot build only             ")

# B2: matmul only (prebuilt f32 onehot -> bf16)
def kB2(oh_ref, x_ref, y_ref):
    X = x_ref[:].astype(jnp.bfloat16)
    def body(r, acc):
        oh = (oh_ref[:] * (1.0 + 1e-9 * r)).astype(jnp.bfloat16)
        t1 = jax.lax.dot_general(oh, X, dimension_numbers=(((1,),(0,)),((),())),
                                 preferred_element_type=jnp.float32)
        return acc + t1[0:64, :]
    y_ref[:] = jax.lax.fori_loop(0, REPS, body, jnp.zeros((64,128), jnp.float32))
run(kB2, (ohpre, x), (64,128), "B2 matmul only (E,64)@(64,128)  ")

# B3: matmul only, int-compare onehot prebuilt in bf16 via input
def kB3(oh_ref, x_ref, y_ref):
    X = x_ref[:].astype(jnp.bfloat16)
    oh = oh_ref[:].astype(jnp.bfloat16)
    def body(r, acc):
        t1 = jax.lax.dot_general(oh, X, dimension_numbers=(((1,),(0,)),((),())),
                                 preferred_element_type=jnp.float32)
        return acc + t1[0:64, :] * r
    y_ref[:] = jax.lax.fori_loop(0, REPS, body, jnp.zeros((64,128), jnp.float32))
run(kB3, (ohpre, x), (64,128), "B3 matmul hoistable             ")

# A3: broadcast only: (E,1) -> (E,64) add iota
def kA3(hi_ref, y_ref):
    iota = jax.lax.broadcasted_iota(jnp.int32, (E,64), 1).astype(jnp.float32)
    def body(r, acc):
        return acc + (hi_ref[:] + iota)[0:8, :]
    y_ref[:] = jax.lax.fori_loop(0, REPS, body, jnp.zeros((8,64), jnp.float32))
run(kA3, (hi,), (8,64), "A3 (E,1) broadcast+add iota      ")

# A4: same but from (E,128) input, slice to (E,64)? use wide input no bcast
hiw = jnp.asarray(rng.integers(0,64,(E,128)).astype(np.float32))
def kA4(hiw_ref, y_ref):
    iota = jax.lax.broadcasted_iota(jnp.int32, (E,128), 1).astype(jnp.float32)
    def body(r, acc):
        oh = jnp.maximum(0.0, 1.0 - jnp.abs((hiw_ref[:]+r) - iota))
        return acc + oh[0:8, :]
    y_ref[:] = jax.lax.fori_loop(0, REPS, body, jnp.zeros((8,128), jnp.float32))
run(kA4, (hiw,), (8,128), "A4 onehot from (E,128) wide      ")
