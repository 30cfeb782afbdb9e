"""Round-4 primitive shootout for the data-movement redesign:
packed-int64-key sort vs 2-key int32 sort; scatter-add histogram vs
sorted segment-sum; int64 div/mod cost; repeat/expand_rowids cost."""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import graphblas_tpu as gb   # enables x64 + cache
    gb.init()

    def sync(x):
        for leaf in jax.tree_util.tree_leaves(x):
            np.asarray(leaf.ravel()[:1])
            break

    def t(f, reps=3):
        sync(f())
        t0 = time.perf_counter()
        for _ in range(reps):
            sync(f())
        return (time.perf_counter() - t0) / reps * 1e3

    n = 1 << 20
    nnz = 16 * n
    rng = np.random.default_rng(0)
    cols = jnp.asarray(rng.integers(0, n, nnz).astype(np.int32))
    rows = jnp.asarray(np.repeat(np.arange(n, dtype=np.int32), 16))
    vals = jnp.asarray(rng.standard_normal(nnz).astype(np.float32))
    vb = jax.lax.bitcast_convert_type(vals, jnp.int32)
    key64 = cols.astype(jnp.int64) * n + rows.astype(jnp.int64)
    key64.block_until_ready()

    f1 = jax.jit(lambda c, r, v, s: jax.lax.sort(
        (c + s, r, v), num_keys=2))
    print(f"2-key int32 sort+payload 16.7M: {t(lambda: f1(cols, rows, vb, np.int32(0))):.0f} ms", flush=True)

    f2 = jax.jit(lambda k, v, s: jax.lax.sort((k + s, v), num_keys=1))
    print(f"int64-key sort+payload 16.7M:   {t(lambda: f2(key64, vb, np.int64(0))):.0f} ms", flush=True)

    f2b = jax.jit(lambda c, r, v, s: jax.lax.sort(
        (((c + s).astype(jnp.int64) * n + r.astype(jnp.int64)), v),
        num_keys=1))
    print(f"make_key + int64 sort 16.7M:    {t(lambda: f2b(cols, rows, vb, np.int32(0))):.0f} ms", flush=True)

    f3 = jax.jit(lambda c, s: jnp.zeros((n,), jnp.int64).at[c + s].add(
        1, mode="drop"))
    print(f"scatter-add histogram 16.7M->1M: {t(lambda: f3(cols, np.int32(0))):.0f} ms", flush=True)

    scols = jnp.sort(cols)
    scols.block_until_ready()
    f4 = jax.jit(lambda c, s: jax.ops.segment_sum(
        jnp.ones(c.shape[0], jnp.int32), c + s, n,
        indices_are_sorted=True))
    print(f"sorted segment-sum 16.7M->1M:   {t(lambda: f4(scols, np.int32(0))):.0f} ms", flush=True)

    f5 = jax.jit(lambda k, s: ((k + s) // n, (k + s) % n))
    print(f"int64 div+mod by {n}: {t(lambda: f5(key64, np.int64(0))):.0f} ms", flush=True)

    nv = 999983   # non-pow2 divisor
    f6 = jax.jit(lambda k, s: ((k + s) // nv, (k + s) % nv))
    print(f"int64 div+mod by {nv} (non-pow2): {t(lambda: f6(key64, np.int64(0))):.0f} ms", flush=True)

    ip = jnp.asarray(np.arange(0, nnz + 16, 16, dtype=np.int64))
    from graphblas_tpu.kernels import segment as K
    f7 = jax.jit(lambda p, s: K.expand_rowids(p + s, nnz, n))
    print(f"expand_rowids 16.7M: {t(lambda: f7(ip, np.int64(0))):.0f} ms", flush=True)

    f8 = jax.jit(lambda v, i, s: v[i + s])
    idx = jnp.asarray(rng.integers(0, nnz, nnz).astype(np.int32))
    print(f"random gather 16.7M f32: {t(lambda: f8(vals, idx, np.int32(0))):.0f} ms", flush=True)


if __name__ == "__main__":
    main()
