"""Probe tpu.dynamic_gather (via take_along_axis) in Pallas: correctness,
supported table sizes, and throughput.  This decides the SpMV gather design:
XLA's generic gather runs at ~0.12 Gelem/s (scalar rate), so a vector gather
is the only route to HBM-bound SpMV."""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ITERS = 50


def probe_dim0(table_rows, idx_shape, reps=8):
    """out[s,l] = tab[idx[s,l], l] — gather along sublanes, per lane."""
    def kernel(tab_ref, idx_ref, out_ref):
        tab = tab_ref[:]
        acc = jnp.zeros(idx_ref.shape, jnp.float32)
        idx = idx_ref[:]
        for r in range(reps):
            g = jnp.take_along_axis(tab, (idx + r) % table_rows, axis=0)
            acc = acc + g
        out_ref[:] = acc

    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.standard_normal((table_rows, 128)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, table_rows, idx_shape).astype(np.int32))

    f = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(idx_shape, jnp.float32),
    )
    fj = jax.jit(lambda t, i: f(t, i))
    try:
        out = np.asarray(fj(tab, idx))
    except Exception as e:
        print(f"dim0 rows={table_rows} idx={idx_shape}: FAIL {type(e).__name__}: {str(e)[:100]}")
        return
    # correctness (r=0 term only checked via full sum)
    want = sum(np.asarray(tab)[(np.asarray(idx) + r) % table_rows,
                               np.arange(128)[None, :]] for r in range(reps))
    ok = np.allclose(out, want, rtol=1e-5)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fj(tab, idx)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / ITERS
    nel = np.prod(idx_shape) * reps
    print(f"dim0 rows={table_rows:7d} idx={idx_shape} reps={reps}: ok={ok} "
          f"{dt*1e6:8.1f} us  {nel/dt/1e9:7.2f} Gelem/s")


def main():
    print(jax.devices())
    for rows in (8, 64, 512, 8192):
        probe_dim0(rows, (256, 128))
    # big batch
    probe_dim0(8192, (2048, 128), reps=4)
    probe_dim0(8192, (8192, 128), reps=2)


if __name__ == "__main__":
    main()
