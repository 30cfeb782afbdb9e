"""Microbenchmark the axon tunnel: sync latency, H2D/D2H bandwidth,
and device-side primitive rates at bench scale.  Round-4 glue diagnosis."""
import time

import numpy as np
import jax
import jax.numpy as jnp


def t(f, reps=5):
    f()  # warm
    t0 = time.perf_counter()
    for _ in range(reps):
        f()
    return (time.perf_counter() - t0) / reps


def main():
    dev = jax.devices()[0]
    print("device:", dev, flush=True)

    # sync latency: tiny scalar roundtrip
    one = jnp.ones(())
    lat = t(lambda: float(np.asarray(one)), reps=20)
    print(f"sync latency: {lat*1e3:.1f} ms", flush=True)

    # H2D bandwidth
    for mb in (8, 64, 256):
        x = np.random.default_rng(0).standard_normal(mb << 17).astype(np.float32)  # mb MB
        dt = t(lambda: jax.device_put(x).block_until_ready(), reps=3)
        print(f"H2D {mb} MB: {dt*1e3:.0f} ms = {mb/dt:.0f} MB/s", flush=True)

    # D2H bandwidth
    for mb in (8, 64, 256):
        xd = jnp.zeros((mb << 18,), jnp.float32)
        xd.block_until_ready()
        dt = t(lambda: np.asarray(xd), reps=3)
        print(f"D2H {mb} MB: {dt*1e3:.0f} ms = {mb/dt:.0f} MB/s", flush=True)

    # device primitive rates at 2^25 elements
    N = 1 << 25
    k = jnp.arange(N, dtype=jnp.int64)
    v = jnp.ones((N,), jnp.float32)
    key2 = (k * 2654435761) % (1 << 40)

    srt = jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=1))
    r = srt(key2, v); jax.block_until_ready(r)
    dt = t(lambda: jax.block_until_ready(srt(key2, v)), reps=3)
    print(f"lax.sort 2^25 i64+f32 payload: {dt*1e3:.0f} ms = {N/dt/1e6:.0f} Me/s", flush=True)

    cs = jax.jit(lambda a: jnp.cumsum(a))
    r = cs(v); r.block_until_ready()
    dt = t(lambda: cs(v).block_until_ready(), reps=3)
    print(f"cumsum 2^25 f32: {dt*1e3:.0f} ms = {N/dt/1e6:.0f} Me/s", flush=True)

    idx32 = (jnp.arange(N, dtype=jnp.int32) * 40503) % N
    g = jax.jit(lambda a, i: a[i])
    r = g(v, idx32); r.block_until_ready()
    dt = t(lambda: g(v, idx32).block_until_ready(), reps=3)
    print(f"random gather 2^25: {dt*1e3:.0f} ms = {N/dt/1e6:.0f} Me/s", flush=True)

    sc = jax.jit(lambda a, i: jnp.zeros((N,), jnp.float32).at[i].add(a))
    r = sc(v, idx32); r.block_until_ready()
    dt = t(lambda: jax.block_until_ready(sc(v, idx32)), reps=3)
    print(f"random scatter-add 2^25: {dt*1e3:.0f} ms = {N/dt/1e6:.0f} Me/s", flush=True)


if __name__ == "__main__":
    main()
