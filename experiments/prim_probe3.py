"""Round-3 primitive probes for the SpGEMM redesign: 2D row-gather
(take axis 0), elementwise gather/scatter, cummax int64 vs int32,
segment_sum, and the sort_reduce kernel in isolation."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp


def _sync(o):
    # axon: block_until_ready lies; a host transfer is the only real sync
    leaves = jax.tree_util.tree_leaves(o)
    np.asarray(jnp.sum(leaves[0].ravel()[:8].astype(jnp.float32)))


def bench(fn, *args, iters=5):
    o = fn(*args)
    _sync(o)
    t0 = time.perf_counter()
    for _ in range(iters):
        o = fn(*args)
        _sync(o)
    return (time.perf_counter() - t0) / iters


n = 1 << 20
E = 1 << 24            # gathered rows / elements
rng = np.random.default_rng(0)

# measure the sync floor and subtract it from every reading
_z = jnp.zeros(8, jnp.float32)
_f0 = jax.jit(lambda a: a + 1)
_sync(_f0(_z))
_t0 = time.perf_counter()
for _ in range(20):
    _sync(_f0(_z))
FLOOR = (time.perf_counter() - _t0) / 20
print(f"sync floor: {FLOOR*1e3:.1f} ms")
_bench_raw = bench


def bench(fn, *args, iters=5):
    return max(_bench_raw(fn, *args, iters=iters) - FLOOR, 1e-9)
idx = jnp.asarray(rng.integers(0, n, E).astype(np.int32))

for W in (8, 16, 32):
    tbl = jnp.asarray(rng.integers(0, n, (n, W)).astype(np.int32))
    f = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
    dt = bench(f, tbl, idx)
    print(f"row-gather (n,{W}) int32 x {E} rows: {dt*1e3:.1f} ms  "
          f"{E/dt/1e9:.2f} Grows/s  {E*W/dt/1e9:.2f} Ge/s  "
          f"{E*W*4/dt/1e9:.1f} GB/s")

# int64 rows (packed idx+val)
tbl64 = jnp.asarray(rng.integers(0, n, (n, 16)).astype(np.int64))
f = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
dt = bench(f, tbl64, idx)
print(f"row-gather (n,16) int64: {dt*1e3:.1f} ms  {E*16*8/dt/1e9:.1f} GB/s")

# elementwise gather
flat = jnp.asarray(rng.integers(0, n, n).astype(np.int32))
f = jax.jit(lambda t, i: t[i])
dt = bench(f, flat, idx)
print(f"elem gather x {E}: {dt*1e3:.1f} ms  {E/dt/1e9:.3f} Ge/s")

# elementwise scatter-set (like direct placement)
big = jnp.zeros((E,), jnp.int32)
didx = jnp.asarray(rng.permutation(E).astype(np.int32))
src = jnp.asarray(rng.integers(0, n, E).astype(np.int32))
f = jax.jit(lambda b, d, s: b.at[d].set(s, mode="drop"))
dt = bench(f, big, didx, src, iters=2)
print(f"elem scatter-set x {E}: {dt*1e3:.1f} ms  {E/dt/1e9:.3f} Ge/s")

# scatter with int64 index + monotone-ish indices (real placement is near
# monotone)
didx_m = jnp.asarray(np.sort(rng.integers(0, E, E)).astype(np.int64))
f2 = jax.jit(lambda b, d, s: b.at[d].set(s, mode="drop"))
dt = bench(f2, big, didx_m, src, iters=2)
print(f"elem scatter-set monotone int64 x {E}: {dt*1e3:.1f} ms  "
      f"{E/dt/1e9:.3f} Ge/s")

# cummax int64 vs int32 at D=2^24
x64 = jnp.asarray(rng.integers(0, 1 << 60, E).astype(np.int64))
x32 = jnp.asarray(rng.integers(0, 1 << 30, E).astype(np.int32))
f = jax.jit(lambda a: jax.lax.cummax(a, axis=0))
print(f"cummax int64 x {E}: {bench(f, x64)*1e3:.1f} ms")
print(f"cummax int32 x {E}: {bench(f, x32)*1e3:.1f} ms")
f = jax.jit(lambda a: jnp.cumsum(a, axis=0))
print(f"cumsum int32 x {E}: {bench(f, x32)*1e3:.1f} ms")

# sort_reduce kernel alone at C=512 on 2^24 slots
from graphblas_tpu.kernels import sortreduce as SRD
from graphblas_tpu.core import monoid as M
keys = jnp.asarray(rng.integers(0, n, (E // 128, 128)).astype(np.int32))
vals = jnp.ones((E // 128, 128), jnp.float32)


def f(k, v):
    return SRD.sort_reduce_rows(k, v, 512, M.PLUS)


dt = bench(f, keys, vals, iters=3)
print(f"sort_reduce C=512 x {E} slots: {dt*1e3:.1f} ms  "
      f"{E/dt/1e9:.2f} Ge/s")
