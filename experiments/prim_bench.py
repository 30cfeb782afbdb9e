"""Measure TPU primitive throughputs relevant to SpMV.

Methodology for the axon remote tunnel: block_until_ready does not actually
wait, and any np.asarray of a big array pays a bulk transfer.  So each
benchmark chains ITERS iterations inside ONE jitted lax.fori_loop (data
dependencies prevent hoisting) and transfers a single scalar at the end.
Dev tool, not shipped API."""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 30


def run(name, make_loop, work_per_iter, unit="Gel/s", scale=1e9):
    loop = jax.jit(make_loop)
    s = float(np.asarray(loop()))  # compile + warmup (1 full run)
    t0 = time.perf_counter()
    s = float(np.asarray(loop()))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:18s}: {dt*1e3:9.3f} ms/iter  "
          f"{work_per_iter/dt/scale:8.2f} {unit}", flush=True)


def main():
    n = 1 << 20
    nnz = n * 16
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, n, nnz).astype(np.int32))
    rows = jnp.asarray(np.sort(rng.integers(0, n, nnz)).astype(np.int32))
    vals = jnp.asarray(rng.standard_normal(nnz).astype(np.float32))
    x0 = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    def chain_scalar(body):
        # body: x (n,) -> (x', contribution scalar)
        def loop():
            def f(i, carry):
                x, acc = carry
                x2, c = body(x)
                return (x2, acc + c)
            (_, acc) = jax.lax.fori_loop(0, ITERS, f, (x0, jnp.float32(0)))
            return acc
        return loop

    # calibrate: empty-ish loop
    run("noop chain", chain_scalar(lambda x: (x, jnp.float32(0))), 0)

    run("stream 64MB", chain_scalar(
        lambda x: ((lambda v: (x + v[0], v[0]))(  # noqa
            (vals * 2.0)[:1]))), 2 * vals.nbytes, "GB/s")

    def gather_body(x):
        g = vals * x[idx]
        s = jnp.sum(g) * jnp.float32(1e-30)
        return x + s, s
    run("gather+mult 16M", chain_scalar(gather_body), nnz)

    def seg_body(x):
        y = jax.ops.segment_sum(vals * x[idx], rows, n,
                                indices_are_sorted=True)
        return y, y[0]
    run("spmv segsum", chain_scalar(seg_body), nnz, "Gnnz/s")

    def scat_body(x):
        y = jnp.zeros(n, jnp.float32).at[rows].add(vals * x[idx])
        return y, y[0]
    run("spmv scatter", chain_scalar(scat_body), nnz, "Gnnz/s")

    def sort_body(x):
        k = (x[:nnz // 16] * 100).astype(jnp.int32)
        s = jnp.sort(idx + k[0])
        return x + s[0] * jnp.float32(1e-30), jnp.float32(0)
    run("sort 16M i32", chain_scalar(sort_body), nnz)

    a0 = jnp.asarray(rng.standard_normal((4096, 4096)).astype(np.float32))

    def mm_loop():
        def f(i, a):
            return a @ a0 * jnp.float32(1e-3)
        out = jax.lax.fori_loop(0, ITERS, f, a0)
        return out[0, 0]
    run("matmul 4k f32", mm_loop, 2 * 4096**3, "TFLOP/s", 1e12)


if __name__ == "__main__":
    main()
