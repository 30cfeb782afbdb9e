"""User-defined types/operators/semirings demo — the reference's
gauss_demo / wildtype_demo analog (user-defined algebra without any JIT
machinery: operators are traced callables)."""

import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import jax

if __name__ == "__main__":
    import jax.numpy as jnp
    import numpy as np

    import graphblas_tpu as gb

    gb.init()

    # shortest-path semiring: min-plus over fp32
    A = gb.Matrix.from_coo([0, 0, 1, 2], [1, 2, 2, 3],
                           [1.0, 4.0, 1.0, 1.0], (4, 4))
    d = gb.Vector.from_dense(np.array([0.0, np.inf, np.inf, np.inf]))
    for _ in range(3):
        step = gb.vxm(d, A, gb.semiring.MIN_PLUS)
        d = gb.ewise_add(d, step, gb.operators.MIN)
    dv, _ = d.to_dense_1d()
    print("min-plus distances from 0:", np.asarray(dv))  # [0, 1, 2, 3]

    # a user-defined semiring: log-sum-exp "tropical softmax"
    lse = gb.make_monoid(
        gb.binary_op(lambda x, y: jnp.logaddexp(x, y), "logaddexp"),
        identity=-np.inf)
    sr = gb.make_semiring(lse, gb.operators.PLUS, "LSE_PLUS")
    B = gb.Matrix.from_dense(np.log(np.ones((3, 3)) / 3))
    v = gb.Vector.from_dense(np.log(np.ones(3) / 3))
    w = gb.mxv(B, v, sr)
    wv, _ = w.to_dense_1d()
    print("log-sum-exp mxv:", np.asarray(wv))

    # user-defined unary op via apply
    clip01 = gb.unary_op(lambda x: jnp.clip(x, 0.0, 1.0), "clip01")
    C = gb.apply(gb.Matrix.from_dense(np.array([[-1.0, 0.5], [2.0, 0.1]])),
                 clip01)
    print("clipped:\n", C.to_scipy().toarray())
