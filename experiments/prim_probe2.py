"""Throughput probes with in-kernel fori_loop (dispatch under the axon
tunnel costs ~2ms/call, so kernels must run >>2ms to measure)."""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(f, args, nelem, label, iters=5):
    fj = jax.jit(f)
    try:
        out = fj(*args)
        jax.block_until_ready(out)
    except Exception as e:
        print(f"{label}: FAIL {type(e).__name__}: {str(e)[:140]}")
        return None
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fj(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{label}: {dt*1e3:9.2f} ms  {nelem/dt/1e9:8.2f} Gelem/s")
    return out


def probe_dim1(S=512, reps=512):
    shape = (S, 128)

    def kernel(tab_ref, idx_ref, out_ref):
        def body(r, acc):
            g = jnp.take_along_axis(tab_ref[:], (idx_ref[:] + r) & 127,
                                    axis=1)
            return acc + g
        out_ref[:] = jax.lax.fori_loop(0, reps, body,
                                       jnp.zeros(shape, jnp.float32))

    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 128, shape).astype(np.int32))
    f = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32))
    run(lambda a, b: f(a, b), (tab, idx), S * 128 * reps,
        f"dim1_gather S={S} reps={reps}")


def probe_roll(S=512, reps=512):
    shape = (S, 128)

    def kernel(x_ref, m_ref, out_ref):
        def body(r, x):
            rolled = pltpu.roll(x, 8, 0)
            return jnp.where(m_ref[:] > (r & 7), rolled, x)
        out_ref[:] = jax.lax.fori_loop(0, reps, body, x_ref[:])

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    m = jnp.asarray(rng.integers(0, 8, shape).astype(np.int32))
    f = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32))
    run(lambda a, b: f(a, b), (x, m), S * 128 * reps,
        f"roll+select S={S} reps={reps}")


def probe_onehot_gather(Er=128, reps=64):
    """g[e] = X2[hi[e] (64), lo[e] (8)]: onehot64 bf16 matmul + 8 selects."""
    shape = (Er, 128)

    def kernel(x2_ref, hi_ref, lo_ref, out_ref):
        X2 = x2_ref[:].astype(jnp.bfloat16)      # (64, 8)
        lo = lo_ref[:]

        def body(r, acc):
            h = (hi_ref[:] + r) & 63
            oh = (h.reshape(Er * 128, 1) == jax.lax.broadcasted_iota(
                jnp.int32, (Er * 128, 64), 1)).astype(jnp.bfloat16)
            t1 = jax.lax.dot_general(
                oh, X2, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).reshape(Er, 128, 8)
            g = jnp.zeros(shape, jnp.float32)
            for t in range(8):
                g = g + jnp.where(lo == t, t1[:, :, t], 0.0)
            return acc + g
        out_ref[:] = jax.lax.fori_loop(0, reps, body,
                                       jnp.zeros(shape, jnp.float32))

    rng = np.random.default_rng(0)
    X2 = jnp.asarray(rng.standard_normal((64, 8)).astype(np.float32))
    hi = jnp.asarray(rng.integers(0, 64, shape).astype(np.int32))
    lo = jnp.asarray(rng.integers(0, 8, shape).astype(np.int32))
    f = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32))
    out = run(lambda a, b, c: f(a, b, c), (X2, hi, lo), Er * 128 * reps,
              f"onehot2lv_gather Er={Er} reps={reps}")
    if out is not None:
        X2n, hin, lon = (np.asarray(v) for v in (X2, hi, lo))
        want = sum(X2n[(hin + r) & 63, lon].astype(np.float32)
                   for r in range(reps))
        ok = np.allclose(np.asarray(out), want, rtol=3e-2, atol=3e-2)
        print(f"   ok={ok}")


def probe_onehot_scatter(Er=64, RB=256, reps=64):
    def kernel(prod_ref, lrow_ref, out_ref):
        E = Er * 128
        p = prod_ref[:].reshape(E, 1).astype(jnp.bfloat16)

        def body(r, acc):
            lr = ((lrow_ref[:] + r) & (RB - 1)).reshape(E, 1)
            oh = (lr == jax.lax.broadcasted_iota(
                jnp.int32, (E, RB), 1)).astype(jnp.bfloat16)
            return acc + jax.lax.dot_general(
                oh, p, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        out_ref[:] = jax.lax.fori_loop(0, reps, body,
                                       jnp.zeros((RB, 1), jnp.float32))

    rng = np.random.default_rng(0)
    shape = (Er, 128)
    prod = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    lrow = jnp.asarray(rng.integers(0, RB, shape).astype(np.int32))
    f = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((RB, 1), jnp.float32))
    run(lambda a, b: f(a, b), (prod, lrow), Er * 128 * reps,
        f"onehot_scatter Er={Er} RB={RB} reps={reps}")


if __name__ == "__main__":
    import sys
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("dim1", "all"):
        probe_dim1()
    if which in ("roll", "all"):
        probe_roll()
    if which in ("og", "all"):
        probe_onehot_gather()
    if which in ("os", "all"):
        probe_onehot_scatter()
