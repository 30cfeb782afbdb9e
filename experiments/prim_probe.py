"""Probe the candidate SpMV building-block primitives on the real chip.

1. dim1 dynamic_gather: out[s,l] = tab[s, idx[s,l]] (per-sublane lane
   shuffle) for various sublane counts S.
2. roll+select butterfly stage throughput on (S, 128) tiles (the sublane
   routing primitive for static permutations).
3. two-level one-hot gather: g[e] = X[c>>3 (64), c&7 (8)] via
   onehot64 @ X(64,8) matmul + 8-way select — per-entry cost ~90 VPU ops.
4. one-hot MXU row-scatter (the current spmv kernel's accumulate) with
   proper amortization.

All kernels loop `reps` times inside the kernel to amortize dispatch.
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ITERS = 20


def bench(f, *args, nelem=0, label=""):
    fj = jax.jit(f)
    try:
        out = np.asarray(fj(*args))
    except Exception as e:
        print(f"{label}: FAIL {type(e).__name__}: {str(e)[:110]}")
        return None
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fj(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{label}: {dt*1e6:9.1f} us  {nelem/dt/1e9:8.2f} Gelem/s")
    return np.asarray(out)


def probe_dim1(S, reps=64):
    """Lane shuffle per sublane: out[s,l] = tab[s, idx[s,l]]."""
    shape = (S, 128)

    def kernel(tab_ref, idx_ref, out_ref):
        tab = tab_ref[:]
        idx = idx_ref[:]
        acc = jnp.zeros(shape, jnp.float32)
        for r in range(reps):
            g = jnp.take_along_axis(tab, (idx + r) % 128, axis=1)
            acc = acc + g
        out_ref[:] = acc

    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 128, shape).astype(np.int32))
    f = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32))
    out = bench(lambda t, i: f(t, i), tab, idx, nelem=S * 128 * reps,
                label=f"dim1_gather S={S:5d} reps={reps}")
    if out is not None:
        tabn, idxn = np.asarray(tab), np.asarray(idx)
        want = sum(tabn[np.arange(S)[:, None], (idxn + r) % 128]
                   for r in range(reps))
        print(f"   ok={np.allclose(out, want, rtol=1e-4)}")


def probe_butterfly(S, stages=14, reps=8):
    """roll+select butterfly: per stage out = where(mask, roll(x, k), x)."""
    shape = (S, 128)

    def kernel(x_ref, m_ref, out_ref):
        x = x_ref[:]
        for r in range(reps):
            for st in range(stages):
                k = 1 << (st % 7)
                rolled = pltpu.roll(x, k, 0)
                x = jnp.where(m_ref[:] > st, rolled, x)
        out_ref[:] = x

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    m = jnp.asarray(rng.integers(0, stages, shape).astype(np.int32))
    f = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32))
    bench(lambda a, b: f(a, b), x, m, nelem=S * 128 * reps,
          label=f"butterfly S={S:5d} st={stages} reps={reps}")


def probe_onehot_gather(E, reps=8):
    """Two-level gather from a 512-table: g = onehot64(hi) @ X(64,8),
    select by lo3.  E entries laid out (E//128, 128)."""
    Er = E // 128
    shape = (Er, 128)

    def kernel(x2_ref, hi_ref, lo_ref, out_ref):
        X2 = x2_ref[:]          # (64, 8)
        hi = hi_ref[:]          # (Er, 128) int32 < 64
        lo = lo_ref[:]          # (Er, 128) int32 < 8
        acc = jnp.zeros(shape, jnp.float32)
        for r in range(reps):
            h = (hi + r) % 64
            # onehot64 matmul: (Er*?) too big as one matmul; do per 8-row
            # chunk?  First try whole-tile reshape: (Er,128,64) onehot is
            # huge.  Instead: bf16 one-hot via compare in fp:
            # g1[s,l,t] = sum_i (h==i) * X2[i,t]  -> do as 64 selects? too
            # many.  Use matmul on flattened entries:
            oh = (h[..., None] ==
                  jax.lax.broadcasted_iota(jnp.int32, (Er, 128, 64), 2)
                  ).astype(jnp.bfloat16)
            t1 = jax.lax.dot_general(
                oh.reshape(Er * 128, 64), X2.astype(jnp.bfloat16),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).reshape(Er, 128, 8)
            g = jnp.zeros(shape, jnp.float32)
            for t in range(8):
                g = g + jnp.where(lo == t, t1[:, :, t], 0.0)
            acc = acc + g
        out_ref[:] = acc

    rng = np.random.default_rng(0)
    X2 = jnp.asarray(rng.standard_normal((64, 8)).astype(np.float32))
    hi = jnp.asarray(rng.integers(0, 64, shape).astype(np.int32))
    lo = jnp.asarray(rng.integers(0, 8, shape).astype(np.int32))
    f = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32))
    out = bench(lambda a, b, c: f(a, b, c), X2, hi, lo, nelem=E * reps,
                label=f"onehot2lv_gather E={E:7d} reps={reps}")
    if out is not None:
        X2n, hin, lon = (np.asarray(v) for v in (X2, hi, lo))
        want = sum(X2n[(hin + r) % 64, lon] for r in range(reps))
        print(f"   ok={np.allclose(out, want, rtol=1e-2, atol=1e-2)}")


def probe_onehot_scatter(E, RB=256, reps=8):
    """acc[r] += sum_e prod[e] * (lrow[e]==r) via MXU."""
    def kernel(prod_ref, lrow_ref, out_ref):
        prod = prod_ref[:]   # (E//128, 128) -> flatten
        lrow = lrow_ref[:]
        acc = jnp.zeros((RB, 8), jnp.float32)
        Ef = prod.shape[0] * 128
        p1 = prod.reshape(Ef // 8, 8)
        for r in range(reps):
            lr = (lrow + r) % RB
            oh = (lr.reshape(Ef, 1) ==
                  jax.lax.broadcasted_iota(jnp.int32, (Ef, RB), 1)
                  ).astype(jnp.bfloat16)
            acc = acc + jax.lax.dot_general(
                oh, p1.reshape(Ef, 8).astype(jnp.bfloat16),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        out_ref[:] = acc

    rng = np.random.default_rng(0)
    shape = (E // 128, 128)
    prod = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    lrow = jnp.asarray(rng.integers(0, RB, shape).astype(np.int32))
    f = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((RB, 8), jnp.float32))
    bench(lambda a, b: f(a, b), prod, lrow, nelem=E * reps,
          label=f"onehot_scatter E={E:7d} RB={RB} reps={reps}")


def main():
    print(jax.devices())
    for S in (8, 64, 256, 1024):
        probe_dim1(S)
    for S in (64, 256, 1024):
        probe_butterfly(S)
    probe_onehot_gather(128 * 128)
    probe_onehot_gather(128 * 512, reps=4)
    probe_onehot_scatter(128 * 64)
    probe_onehot_scatter(128 * 256, reps=4)


if __name__ == "__main__":
    main()
