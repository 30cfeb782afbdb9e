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

    # sync latency: tiny computed-scalar roundtrip (a fresh computation
    # each rep; a constant array may be served from a host-side cache)
    base = jnp.ones((128,))
    add = jax.jit(lambda x, s: jnp.sum(x) * s)
    add(base, 1.0)
    lat = t(lambda: float(np.asarray(add(base, np.random.rand()))), reps=20)
    print(f"sync latency (computed): {lat*1e3:.1f} ms", flush=True)

    # H2D bandwidth
    for mb in (8, 64, 256):
        x = np.random.default_rng(0).standard_normal(mb << 17).astype(np.float32)  # mb MB
        dt = t(lambda: jax.device_put(x).block_until_ready(), reps=3)
        print(f"H2D {mb} MB: {dt*1e3:.0f} ms = {mb/dt:.0f} MB/s", flush=True)

    # D2H bandwidth (freshly computed arrays — constants may be cached)
    mk = jax.jit(lambda s: jnp.full((1 << 21,), s, jnp.float32))
    for mb in (8, 64):
        f = jax.jit(lambda s: jnp.full((mb << 18,), s, jnp.float32) * s)
        np.asarray(f(1.0))
        dt = t(lambda: np.asarray(f(np.random.rand())), reps=3)
        print(f"D2H {mb} MB: {dt*1e3:.0f} ms = {mb/dt:.0f} MB/s", flush=True)

    # device primitive rates at 2^25 elements (int32-safe arithmetic)
    N = 1 << 25
    v = jnp.ones((N,), jnp.float32)
    key2 = ((jnp.arange(N, dtype=jnp.int32) * jnp.int32(40503))
            % jnp.int32(1 << 30)).astype(jnp.int64)

    def dsync(x):
        # block_until_ready is NOT a real sync under the tunnel; fetch one
        # element to force the producer chain
        np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])

    srt = jax.jit(lambda a, b, s: jax.lax.sort((a + s, b), num_keys=1))
    dsync(srt(key2, v, 0))
    dt = t(lambda: dsync(srt(key2, v, np.random.randint(100))), reps=3)
    print(f"lax.sort 2^25 i64+f32 payload: {dt*1e3:.0f} ms = {N/dt/1e6:.0f} Me/s", flush=True)

    cs = jax.jit(lambda a, s: jnp.cumsum(a * s))
    dsync(cs(v, 1.0))
    dt = t(lambda: dsync(cs(v, np.random.rand())), reps=3)
    print(f"cumsum 2^25 f32: {dt*1e3:.0f} ms = {N/dt/1e6:.0f} Me/s", flush=True)

    idx32 = (jnp.arange(N, dtype=jnp.int32) * jnp.int32(40503)) % N
    g = jax.jit(lambda a, i, s: a[i] * s)
    dsync(g(v, idx32, 1.0))
    dt = t(lambda: dsync(g(v, idx32, np.random.rand())), reps=3)
    print(f"random gather 2^25: {dt*1e3:.0f} ms = {N/dt/1e6:.0f} Me/s", flush=True)

    sc = jax.jit(lambda a, i, s: jnp.zeros((N,), jnp.float32).at[i].add(a * s))
    dsync(sc(v, idx32, 1.0))
    dt = t(lambda: dsync(sc(v, idx32, np.random.rand())), reps=3)
    print(f"random scatter-add 2^25: {dt*1e3:.0f} ms = {N/dt/1e6:.0f} Me/s", flush=True)


if __name__ == "__main__":
    main()
