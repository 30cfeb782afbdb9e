"""Stage-level profile of the five losing data-movement rows (round-4
ask #3): eWiseAdd, transpose(reorient), extract(perm), SpMSpV, plus the
primitives under them, with a device sync between stages so every stage
is attributed exactly.  Run on the real TPU."""
import time

import numpy as np
import scipy.sparse as sps


def sync(x):
    """True sync: under the axon tunnel block_until_ready returns before
    remote completion; fetching one element forces the producer chain."""
    import jax
    import jax.numpy as jnp
    for leaf in jax.tree_util.tree_leaves(x):
        if hasattr(leaf, "ravel") and getattr(leaf, "size", 0):
            np.asarray(leaf.ravel()[:1])
            break
    return x


def stage(name, f, reps=3):
    out = f()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f()
        sync(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"  {name}: {dt*1e3:8.1f} ms", flush=True)
    return out


def main():
    import jax
    import jax.numpy as jnp
    import graphblas_tpu as gb
    from graphblas_tpu.core.matrix import ROW, SPARSE
    from graphblas_tpu.kernels import segment as K
    from graphblas_tpu.ops.masker import _keys_of

    gb.init()
    n = 1 << 20
    deg = 16
    rng = np.random.default_rng(0)
    S = sps.csr_matrix(
        (np.ones(n * deg, np.float32),
         (rng.integers(0, n, n * deg), rng.integers(0, n, n * deg))),
        shape=(n, n))
    S.sum_duplicates()
    nnz = S.nnz
    A = gb.Matrix.from_scipy(S)
    print(f"n=2^20 nnz={nnz}", flush=True)

    # ---- transpose: reorient internals ---------------------------------
    print("transpose (to_format SPARSE/ROW of A'):", flush=True)
    from graphblas_tpu.ops.transpose import logical_transpose
    At_log = logical_transpose(A)
    T1 = stage("full reorient", lambda: At_log.to_format(SPARSE, ROW).values)
    At2 = At_log.to_format(SPARSE, ROW)

    # primitives under reorient
    a = At_log
    rows, cols = a._coords()
    keys = K.make_key(cols, rows, n)  # orient flip
    sync(keys)
    stage("  make_key+coords", lambda: K.make_key(*a._coords()[::-1], n))
    skv = stage("  sort_with_payload",
                lambda: K.sort_with_payload(keys, a._vals_expanded())[0])

    # ---- eWiseAdd -------------------------------------------------------
    print("eWiseAdd C = A + A':", flush=True)
    stage("op total", lambda: gb.ewise_add(A, At2, gb.operators.PLUS).values)
    ak, avals = _keys_of(A)
    bk, bvals = _keys_of(At2)
    sync(ak); sync(bk)
    stage("  keys_of(A) uncached",
          lambda: K.make_key(*A._coords(), n))
    um = stage("  union_merge", lambda: K.union_merge(
        ak, avals, bk, bvals, key_bound=n * n)[0])

    # ---- extract perm ---------------------------------------------------
    print("extract C = A(p, q):", flush=True)
    P = np.random.default_rng(42).permutation(n)
    Q = np.random.default_rng(43).permutation(n)
    stage("op total", lambda: gb.extract(A, P, Q).values, reps=1)

    # ---- SpMSpV ----------------------------------------------------------
    print("SpMSpV y = x*A (1% dense x):", flush=True)
    from graphblas_tpu.core import semiring as SR
    xi = np.arange(0, n, 100, dtype=np.int64)
    xv = (1e-3 * (xi % 97 + 1)).astype(np.float32)
    xs = gb.Vector.from_coo(xi, xv, n)
    stage("op total", lambda: gb.vxm(xs, A, SR.PLUS_TIMES).values, reps=5)


if __name__ == "__main__":
    main()
