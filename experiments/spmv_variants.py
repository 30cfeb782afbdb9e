"""SpMV design-space micro-benchmark on the real TPU chip.

Times (a) the primitive costs — random gather, sorted segment-sum — and
(b) full SpMV variants, to find where y = A @ x time actually goes:

  xla_seg    gather + segment_sum (current XLA substrate)
  xla_ell    ELL layout: (n, K) gathers + dense axis-1 sum (scatter-free)
  pallas     current sliced-ELL Pallas kernel
  pallas_t   Pallas kernel with different TILE

Each timed as ITERS dependency-chained runs inside one jitted fori_loop.
"""

import time

import numpy as np

ITERS = 20


def timed(fn, *args):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chained(*a):
        def body(i, carry):
            y = fn(*a[:-1], carry)
            return y * jnp.float32(1e-6) + a[-1] * 0  # keep shape/dtype
        return jnp.sum(jax.lax.fori_loop(0, ITERS, body, a[-1]))

    r = float(np.asarray(chained(*args)))  # compile+run
    t0 = time.perf_counter()
    r = float(np.asarray(chained(*args)))
    return (time.perf_counter() - t0) / ITERS


def main():
    import jax
    import jax.numpy as jnp
    import scipy.sparse as sps

    n = 1 << 20
    deg = 16
    rng = np.random.default_rng(0)
    rows = rng.integers(0, n, n * deg).astype(np.int32)
    cols = rng.integers(0, n, n * deg).astype(np.int32)
    S = sps.csr_matrix((np.ones(n * deg, np.float32), (rows, cols)),
                       shape=(n, n))
    S.sum_duplicates()
    nnz = S.nnz
    print(f"n={n} nnz={nnz}")

    indptr = jnp.asarray(S.indptr, jnp.int32)
    indices = jnp.asarray(S.indices, jnp.int32)
    values = jnp.asarray(S.data, jnp.float32)
    x0 = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    rowids = jnp.asarray(
        np.repeat(np.arange(n, dtype=np.int32), np.diff(S.indptr)))

    # --- primitive: random gather ------------------------------------------
    def raw_gather(idx, x):
        return jax.ops.segment_sum(x[idx][:n] * 0 + x[idx][:n], jnp.arange(n, dtype=jnp.int32), n)  # placeholder

    # simpler: time gather alone (reduce to keep one output)
    def gather_only(idx, x):
        return x[idx]

    @jax.jit
    def chained_gather(idx, x):
        def body(i, x):
            g = x[idx]
            return x + g[:n] * jnp.float32(1e-9)
        return jnp.sum(jax.lax.fori_loop(0, ITERS, body, x))
    _ = float(np.asarray(chained_gather(indices, x0)))
    t0 = time.perf_counter()
    _ = float(np.asarray(chained_gather(indices, x0)))
    t = (time.perf_counter() - t0) / ITERS
    print(f"gather_only      {t*1e3:8.2f} ms  {nnz/t/1e9:6.2f} Gelem/s")

    # --- primitive: sorted segment_sum -------------------------------------
    prod0 = values * x0[indices]

    @jax.jit
    def chained_seg(prod, x):
        def body(i, x):
            y = jax.ops.segment_sum(prod + x[:nnz] * 0, rowids, n,
                                    indices_are_sorted=True)
            return x + y * jnp.float32(1e-9)
        return jnp.sum(jax.lax.fori_loop(0, ITERS, body, x))
    pp = jnp.pad(prod0, (0, 0))
    _ = float(np.asarray(chained_seg(pp, x0)))
    t0 = time.perf_counter()
    _ = float(np.asarray(chained_seg(pp, x0)))
    t = (time.perf_counter() - t0) / ITERS
    print(f"segsum_only      {t*1e3:8.2f} ms  {nnz/t/1e9:6.2f} Gelem/s")

    # --- variant: XLA gather + segment_sum ----------------------------------
    def xla_seg(x):
        return jax.ops.segment_sum(values * x[indices], rowids, n,
                                   indices_are_sorted=True)
    t = timed(lambda x: xla_seg(x), x0)
    print(f"xla_seg          {t*1e3:8.2f} ms  {nnz/t/1e9:6.2f} Gnnz/s")

    # --- variant: ELL scatter-free ------------------------------------------
    K = int(np.diff(S.indptr).max())
    Kpad = -(-K // 8) * 8
    ell_cols = np.zeros((n, Kpad), np.int32)
    ell_vals = np.zeros((n, Kpad), np.float32)
    d = np.diff(S.indptr)
    # rowwise fill
    mask = np.arange(Kpad)[None, :] < d[:, None]
    ell_cols[mask] = S.indices
    ell_vals[mask] = S.data
    ec = jnp.asarray(ell_cols)
    ev = jnp.asarray(ell_vals)
    print(f"ELL K={K} pad={Kpad} waste={n*Kpad/nnz:.2f}x")

    def xla_ell(x):
        return jnp.sum(ev * x[ec], axis=1)
    t = timed(lambda x: xla_ell(x), x0)
    print(f"xla_ell          {t*1e3:8.2f} ms  {nnz/t/1e9:6.2f} Gnnz/s")

    # --- variant: current Pallas kernel -------------------------------------
    from graphblas_tpu.kernels import spmv_pallas
    t = timed(lambda x: spmv_pallas.spmv(indptr, indices, values, x, n), x0)
    print(f"pallas_ell       {t*1e3:8.2f} ms  {nnz/t/1e9:6.2f} Gnnz/s")


if __name__ == "__main__":
    main()
