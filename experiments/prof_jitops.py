"""Hypothesis test (round-4): sparse-op glue is per-eager-op dispatch
latency through the tunnel.  Times the SAME reorient pipeline eagerly vs
as one jitted call, and a fully-jitted eWiseAdd core."""
import time

import numpy as np
import scipy.sparse as sps


def sync(x):
    import jax
    import numpy as np
    for leaf in jax.tree_util.tree_leaves(x):
        if hasattr(leaf, "ravel") and getattr(leaf, "size", 0):
            np.asarray(leaf.ravel()[:1])
            break


def t(f, reps=3):
    sync(f())
    t0 = time.perf_counter()
    for _ in range(reps):
        sync(f())
    return (time.perf_counter() - t0) / reps


def main():
    import jax
    import jax.numpy as jnp
    import graphblas_tpu as gb
    from graphblas_tpu.core.matrix import INDEX, ROW, SPARSE
    from graphblas_tpu.kernels import segment as K
    from graphblas_tpu.ops.transpose import logical_transpose

    gb.init()
    n = 1 << 20
    deg = 16
    rng = np.random.default_rng(0)
    S = sps.csr_matrix(
        (np.ones(n * deg, np.float32),
         (rng.integers(0, n, n * deg), rng.integers(0, n, n * deg))),
        shape=(n, n))
    S.sum_duplicates()
    A = gb.Matrix.from_scipy(S)
    At = logical_transpose(A)
    nnz = S.nnz

    print(f"eager reorient: {t(lambda: At.to_format(SPARSE, ROW).values)*1e3:.0f} ms",
          flush=True)

    nvec, veclen = n, n

    @jax.jit
    def reorient_jit(indptr, indices, values):
        rows = K.expand_rowids(indptr, nnz, nvec)
        # orientation flip: sort by (col, row)
        keys = indices.astype(jnp.int64) * veclen + rows.astype(jnp.int64)
        skeys, svals = K.sort_with_payload(keys, values)
        svec = (skeys // veclen).astype(jnp.int32)
        sidx = (skeys % veclen).astype(jnp.int32)
        counts = jnp.zeros((nvec,), jnp.int64).at[svec].add(1, mode="drop")
        indptr2 = jnp.concatenate([jnp.zeros(1, jnp.int64),
                                   jnp.cumsum(counts)]).astype(INDEX)
        return indptr2, sidx, svals

    print(f"jitted reorient: {t(lambda: reorient_jit(A.indptr, A.indices, A.values))*1e3:.0f} ms",
          flush=True)

    # fully-jitted eWiseAdd core (two sorted key streams -> merged CSR)
    At2 = At.to_format(SPARSE, ROW)
    from graphblas_tpu.ops.masker import _keys_of
    ak, av = _keys_of(A)
    bk, bv = _keys_of(At2)
    sync(ak), sync(bk)

    @jax.jit
    def ewadd_jit(ak, av, bk, bv):
        ukeys, uav, ubv, a_in, b_in = K.union_merge(
            ak, av, bk, bv, key_bound=n * n)
        both = a_in & b_in
        zv = jnp.where(both, uav + ubv, jnp.where(a_in, uav, ubv))
        svec = (ukeys // veclen).astype(jnp.int32)
        sidx = (ukeys % veclen).astype(jnp.int32)
        counts = jnp.zeros((nvec,), jnp.int64).at[svec].add(1, mode="drop")
        indptr2 = jnp.concatenate([jnp.zeros(1, jnp.int64),
                                   jnp.cumsum(counts)])
        return indptr2, sidx, zv

    # NOTE union_merge has a host sync inside (int(ng)) -> cannot jit as is;
    # time the phase1 + finish split instead
    from graphblas_tpu.kernels.segment import _merge_ride_phase1, _ride_encode

    bitsA, _ = _ride_encode(av)
    bitsB, _ = _ride_encode(bv)

    @jax.jit
    def ew_phase1(ak, ba, bk, bb):
        return _merge_ride_phase1(ak, ba, bk, bb, 32)

    r = ew_phase1(ak, bitsA, bk, bitsB)
    ng = int(r[0])
    print(f"ew phase1 (1 jit): {t(lambda: ew_phase1(ak, bitsA, bk, bitsB))*1e3:.0f} ms, ng={ng}",
          flush=True)

    ngb = ng  # exact-shape finish (bucketing would pad)

    @jax.jit
    def ew_finish(sk, sp):
        sk = sk[:ngb]
        pk = sp[:ngb]
        LOW = jnp.int64((1 << 32) - 1)
        ua = jax.lax.bitcast_convert_type((pk & LOW).astype(jnp.uint32), jnp.float32)
        ub = jax.lax.bitcast_convert_type((pk >> 32).astype(jnp.uint32), jnp.float32)
        a_in = (sk & 1) == 1
        b_in = (sk & 2) == 2
        keys = sk >> 2
        zv = jnp.where(a_in & b_in, ua + ub, jnp.where(a_in, ua, ub))
        svec = (keys // veclen).astype(jnp.int32)
        sidx = (keys % veclen).astype(jnp.int32)
        counts = jnp.zeros((nvec,), jnp.int64).at[svec].add(1, mode="drop")
        indptr2 = jnp.concatenate([jnp.zeros(1, jnp.int64),
                                   jnp.cumsum(counts)])
        return indptr2, sidx, zv

    _, sk, sp, _ = ew_phase1(ak, bitsA, bk, bitsB)
    print(f"ew finish (1 jit): {t(lambda: ew_finish(sk, sp))*1e3:.0f} ms",
          flush=True)


if __name__ == "__main__":
    main()
